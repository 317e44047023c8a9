"""Verified suppression of XLA:CPU AOT feature-mismatch warnings
(VERDICT round-4 weak #2 / next-round item 3).

Background (verified 2026-08-19 on this host): jaxlib 0.9.0's CPU compiler
embeds the LLVM x86 TUNING pseudo-features ``+prefer-no-gather`` /
``+prefer-no-scatter`` in every cached AOT result, while the loader's host
feature detection never reports them — so every SAME-HOST persistent-cache
hit logs the cpu_aot_loader "could lead to execution errors such as SIGILL"
E-line. The ISA fingerprint (cpuflags.pin_cpu_compile_cache) was doing its
job; the warning was spurious. cpuflags.classify_aot_mismatch PROVES a
line benign (missing set is tuning-only) before AotWarningFilter drops it;
a REAL missing ISA feature passes through, evicts the cache dir, and fails
the dry-run.
"""

import os
import subprocess
import sys
from pathlib import Path

from cyclegan_tpu.utils.cpuflags import AotWarningFilter, classify_aot_mismatch

ROOT = Path(__file__).resolve().parent.parent

_TMPL = ("E0819 16:55:54.272983 11820 cpu_aot_loader.cc:210] Loading XLA:CPU "
         "AOT result. Target machine feature {feat} is not  supported on the "
         "host machine. Machine type used for XLA:CPU compilation doesn't "
         "match the machine type for execution. Compile machine features: "
         "[{compile}] vs host machine features: [{host}]. This could lead to "
         "execution errors such as SIGILL.")


def _line(feat, compile_feats, host_feats):
    return _TMPL.format(feat=feat, compile=",".join(compile_feats),
                        host=",".join(host_feats))


def test_classify_benign_tuning_only():
    line = _line("+prefer-no-gather",
                 ["+64bit", "+avx2", "+avx512f", "+prefer-no-gather",
                  "+prefer-no-scatter", "-amx-fp16"],
                 ["64bit", "avx2", "avx512f"])
    assert classify_aot_mismatch(line) == "benign"


def test_classify_real_isa_missing():
    # avx512f required by the compile machine but absent on the host — the
    # exact cross-VM SIGILL hazard the fingerprint exists to prevent.
    line = _line("+avx512f",
                 ["+64bit", "+avx2", "+avx512f", "+prefer-no-gather"],
                 ["64bit", "avx2"])
    assert classify_aot_mismatch(line) == "real"


def test_classify_unparseable_mismatch_is_real():
    # Fail safe: a line CLAIMING a mismatch that we cannot verify benign
    # must surface.
    line = ("cpu_aot_loader.cc:210] Machine type used for XLA:CPU "
            "compilation doesn't match the machine type for execution.")
    assert classify_aot_mismatch(line) == "real"


def test_classify_unrelated_lines_pass():
    assert classify_aot_mismatch("E0819 something else entirely") is None
    assert classify_aot_mismatch("") is None


def test_filter_passthrough_and_eviction(tmp_path):
    """End-to-end through the fd machinery in a subprocess: benign lines are
    swallowed (with a summary), real lines pass through and evict the cache
    dir, ordinary stderr is untouched."""
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "entry").write_bytes(b"stale")
    script = r"""
import os, sys
sys.path.insert(0, %(root)r)
from cyclegan_tpu.utils.cpuflags import AotWarningFilter

BENIGN = %(benign)r
REAL = %(real)r
with AotWarningFilter(evict_dir=%(cache)r) as f:
    os.write(2, b"plain stderr line\n")
    os.write(2, (BENIGN + "\n").encode())
    os.write(2, (REAL + "\n").encode())
    os.write(2, b"another plain line\n")
print("BENIGN", f.benign_count, "REAL", len(f.real_mismatches))
"""
    benign = _line("+prefer-no-gather",
                   ["+64bit", "+prefer-no-gather"], ["64bit"])
    real = _line("+avx512f", ["+64bit", "+avx512f"], ["64bit"])
    r = subprocess.run(
        [sys.executable, "-c", script % {
            "root": str(ROOT), "benign": benign, "real": real,
            "cache": str(cache)}],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert "BENIGN 1 REAL 1" in r.stdout
    assert "plain stderr line" in r.stderr
    assert "another plain line" in r.stderr
    # The benign line is gone; the real one survives; the summary appears.
    assert r.stderr.count("Machine type used for") == 1
    assert "+avx512f" in r.stderr
    assert "suppressed 1 verified-benign" in r.stderr
    assert "evicted" in r.stderr
    assert not (cache / "entry").exists(), "stale cache entry must be evicted"


def test_same_host_cache_hit_is_clean(tmp_path):
    """The observed production symptom, reproduced and fixed: compile into a
    fresh cache dir, then reload in a new process under the filter — stderr
    must carry ZERO mismatch lines (this jaxlib warns on every same-host hit
    without the filter; the first run of this pair proves that)."""
    cache = str(tmp_path / "xla")
    os.makedirs(cache, exist_ok=True)
    body = r"""
import sys
sys.path.insert(0, %(root)r)
import jax
# Import BEFORE pointing the cache at the test dir: the package __init__
# re-points jax_compilation_cache_dir to its own default on first import.
from cyclegan_tpu.utils.cpuflags import AotWarningFilter

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", %(cache)r)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
with AotWarningFilter(evict_dir=%(cache)r) as f:
    print(jax.jit(lambda x: x @ x)(jnp.ones((64, 64))).sum())
assert not f.real_mismatches, f.real_mismatches
print("HIT_SUPPRESSED", f.benign_count)
""" % {"root": str(ROOT), "cache": cache}
    first = subprocess.run([sys.executable, "-c", body],
                           capture_output=True, text=True, timeout=300,
                           env={**os.environ, "JAX_PLATFORMS": ""})
    assert first.returncode == 0, first.stderr
    second = subprocess.run([sys.executable, "-c", body],
                            capture_output=True, text=True, timeout=300,
                            env={**os.environ, "JAX_PLATFORMS": ""})
    assert second.returncode == 0, second.stderr
    assert "Machine type used for" not in second.stderr
    # Cache survives (benign suppression must NOT evict).
    assert os.path.isdir(cache) and os.listdir(cache)


def test_cli_wraps_dispatch_in_filter(monkeypatch):
    """main() runs the dispatch inside cpu_aot_stderr_filter() so CPU CLI
    runs never spew the verified-benign cpu_aot_loader E-lines (round-5
    session 3). The distributed-pending path is covered separately by
    tests/test_distributed_init.py (no backend touch before init)."""
    import cyclegan_tpu.main as main_mod
    from cyclegan_tpu.utils import cpuflags

    events = []

    class Recorder:
        def __enter__(self):
            events.append("enter")
            return self

        def __exit__(self, *exc):
            events.append("exit")
            return False

    monkeypatch.setattr(cpuflags, "cpu_aot_stderr_filter", lambda: Recorder())
    monkeypatch.setattr(main_mod, "_dispatch",
                        lambda a, c: events.append("dispatch"))
    main_mod.main(["--testing", "--dataset", "synthetic"])
    assert events == ["enter", "dispatch", "exit"]
