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

import os

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
