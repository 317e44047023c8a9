"""XLA CPU collective-timeout flags — pure-env helper, no jax import.

XLA's CPU collective rendezvous spin-waits with a 20 s warn / 40 s
hard-abort timeout; on a host with fewer cores than virtual devices the
scheduler can starve one device thread past 40 s and the whole process
SIGABRTs (reproduced on a 1-core VM: the (4,2) spatial dry-run leg died at
op 583; with these raised it completes). Harmless on real multi-chip
hardware — the virtual-device path only ever runs on CPU.

Shared by tests/conftest.py, __graft_entry__._ensure_cpu_devices, and any
multihost worker (which must APPEND to XLA_FLAGS, not overwrite — this
helper appends). Must be called BEFORE the XLA backend initializes.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform

CPU_COLLECTIVE_FLAGS = (
    ("--xla_cpu_collective_timeout_seconds", 1200),
    ("--xla_cpu_collective_call_warn_stuck_timeout_seconds", 600),
    ("--xla_cpu_collective_call_terminate_timeout_seconds", 1200),
)


def ensure_cpu_collective_timeouts() -> None:
    """Append the raised collective timeouts to XLA_FLAGS (idempotent)."""
    flags = os.environ.get("XLA_FLAGS", "")
    for flag, v in CPU_COLLECTIVE_FLAGS:
        if flag not in flags:
            flags += f" {flag}={v}"
    os.environ["XLA_FLAGS"] = flags


def host_isa_fingerprint() -> str:
    """Short stable hash of this host's CPU ISA feature set."""
    feats = _platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


def pin_cpu_compile_cache() -> None:
    """Redirect the persistent XLA compile cache to a host-fingerprinted dir.

    XLA's persistent-cache key does NOT cover the compile machine's CPU
    features: an XLA:CPU AOT result cached by a previous VM (the home dir
    outlives VM swaps in this environment) loads on a host with a different
    feature set with only an E-level log — "could lead to execution errors
    such as SIGILL" (observed 2026-08-19: entries compiled with the
    prefer-no-gather/-scatter pseudo-features loaded on a host without them;
    benign that time, but a real ISA difference would crash every CPU run,
    i.e. the whole test suite). TPU executables don't embed host ISA, so
    only CPU-forced entry points call this — the shared TPU cache (15-min
    train-step compiles over the tunnel) stays valid across VM changes.

    Call AFTER forcing ``jax_platforms=cpu``; idempotent. No-op when the
    cache is disabled (``CYCLEGAN_TPU_NO_COMPILE_CACHE``).
    """
    import jax

    base = jax.config.jax_compilation_cache_dir
    if not base:
        return
    suffix = f"-cpu-{host_isa_fingerprint()}"
    if not base.endswith(suffix):
        jax.config.update("jax_compilation_cache_dir", base + suffix)


def maybe_pin_cpu_compile_cache() -> None:
    """Pin the compile cache iff the RESOLVED backend is CPU.

    The mechanism-level companion to :func:`pin_cpu_compile_cache` for call
    sites that do not force a platform themselves: a run launched without
    ``--platform cpu`` on a host where jax falls back to CPU (tunnel down, or
    a plain CPU box) must still get the ISA-fingerprinted cache dir, or it
    shares stale XLA:CPU AOT entries across VM swaps. Touching
    ``jax.default_backend()`` initializes the backend — call this only from
    funnels that are about to use devices anyway (it adds no new hang risk
    there; the tunnel's hang mode would hit the very next device use).
    Must run BEFORE the funnel's first compile (config is read per-compile,
    so post-backend-init updates still take effect).

    When NO backend can initialize (e.g. the axon sitecustomize pins
    ``jax_platforms=axon,cpu`` and the tunnel is down — an explicit platform
    list does NOT fall back), ``default_backend()`` raises; that failure
    belongs to the caller's own first device use, not to cache pinning, so
    it is swallowed here.
    """
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError:
        return
    if backend == "cpu":
        pin_cpu_compile_cache()
