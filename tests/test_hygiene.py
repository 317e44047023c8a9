"""Framework hygiene: the shipped package must not depend on torch (torch is
a test/tools-only oracle), and the profiler/observability path must produce
artifacts."""

import json
import subprocess
import sys


def test_package_never_imports_torch():
    """Import every cyclegan_tpu module in a clean interpreter with torch
    masked out — the TPU framework must be torch-free."""
    code = r"""
import sys
sys.modules["torch"] = None  # poison: any `import torch` raises ImportError
import importlib, pkgutil
import cyclegan_tpu
bad = []
for mod in pkgutil.walk_packages(cyclegan_tpu.__path__, "cyclegan_tpu."):
    try:
        importlib.import_module(mod.name)
    except ImportError as e:
        if "torch" in str(e):
            bad.append(mod.name)
        else:
            raise
assert not bad, f"torch imports in: {bad}"
print("OK")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]


def test_metrics_logger_writes_jsonl(tmp_path):
    from cyclegan_tpu.utils.observability import MetricsLogger

    logger = MetricsLogger(str(tmp_path))
    logger.log(step=1, epoch=0, metrics={"loss": 1.5}, steps_per_sec=2.0)
    logger.log(step=2, epoch=0, metrics={"loss": 1.2})
    logger.close()
    lines = (tmp_path / "train_metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["step"] == 1 and rec["loss"] == 1.5 and rec["steps_per_sec"] == 2.0


def test_profiler_produces_trace(tmp_path):
    import jax.numpy as jnp

    from cyclegan_tpu.utils.observability import StepProfiler

    prof = StepProfiler(str(tmp_path), start=0, stop=1)
    prof.maybe_start(0)
    jnp.zeros((8, 8)).sum().block_until_ready()
    prof.maybe_stop(1)
    prof.finish()
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files), "no trace artifacts written"


def test_cpu_compile_cache_is_host_fingerprinted():
    """CPU-forced runs must not share XLA:CPU AOT cache entries across hosts
    with different ISA feature sets (stale entries can SIGILL — see
    cpuflags.pin_cpu_compile_cache). conftest pins the suffix for the whole
    suite; re-pinning must be idempotent. (The maybe_pin variant is
    covered implicitly: conftest forces cpu, so both spell the same pin.)"""
    import os

    import jax

    from cyclegan_tpu.utils.cpuflags import (
        host_isa_fingerprint, pin_cpu_compile_cache)

    if os.environ.get("CYCLEGAN_TPU_NO_COMPILE_CACHE"):
        import pytest

        pytest.skip("compile cache disabled by CYCLEGAN_TPU_NO_COMPILE_CACHE"
                    " — nothing to fingerprint")
    fp = host_isa_fingerprint()
    assert len(fp) == 10 and fp == host_isa_fingerprint()
    d1 = jax.config.jax_compilation_cache_dir
    assert d1 and d1.endswith(f"-cpu-{fp}")
    pin_cpu_compile_cache()
    assert jax.config.jax_compilation_cache_dir == d1


def test_maybe_pin_swallows_backend_init_failure(monkeypatch):
    """With the sitecustomize's explicit jax_platforms=axon,cpu and the
    tunnel down, default_backend() RAISES (an explicit platform list does
    not fall back). maybe_pin must not be the raiser — the caller's own
    first device use owns that failure."""
    import jax

    from cyclegan_tpu.utils import cpuflags

    before = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(jax, "default_backend",
                        lambda: (_ for _ in ()).throw(
                            RuntimeError("Unable to initialize backend")))
    cpuflags.maybe_pin_cpu_compile_cache()  # must not raise
    assert jax.config.jax_compilation_cache_dir == before
