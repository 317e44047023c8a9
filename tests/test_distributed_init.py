"""maybe_initialize via the cfg path (round-2 advisor, high severity).

The round-2 bug: gating on ``jax.process_count()`` initialized the XLA
backend BEFORE ``jax.distributed.initialize``, which then always raised —
the ``--coordinator_address`` CLI path could never start. The fix gates only
on a backend-touch-free probe. This test drives the REAL cfg path in a fresh
subprocess (where, like a real launch, no JAX call has happened yet).
"""

import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import sys
sys.path.insert(0, %(root)r)
import jax

jax.config.update("jax_platforms", "cpu")
from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache
pin_cpu_compile_cache()

from cyclegan_tpu.parallel.distributed import maybe_initialize
from cyclegan_tpu.utils.config import Config

cfg = Config(coordinator_address=sys.argv[1], num_processes=1, process_id=0)
# Must not raise: initialize() must run before anything touches the backend.
multi = maybe_initialize(cfg)
assert multi is False, "1-process run must report single-process"
assert jax.process_count() == 1
# Idempotent: a second call (backend now initialized) is a no-op.
assert maybe_initialize(cfg) is False
print("MAYBE_INIT_OK", flush=True)
""" % {"root": str(ROOT)}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_maybe_initialize_cfg_path():
    coord = f"localhost:{_free_port()}"
    r = subprocess.run([sys.executable, "-c", _SCRIPT, coord],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"subprocess failed:\n{r.stdout}\n{r.stderr}"
    assert "MAYBE_INIT_OK" in r.stdout


def test_initialized_probe_is_backend_free():
    """_initialized() must not touch the XLA backend (that's the bug class);
    verified by probing in a fresh subprocess and initializing AFTER."""
    script = r"""
import sys
sys.path.insert(0, %(root)r)
import jax

jax.config.update("jax_platforms", "cpu")
from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache
pin_cpu_compile_cache()
from cyclegan_tpu.parallel.distributed import _initialized

assert _initialized() is False
# If the probe had initialized the backend, this would raise.
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=1, process_id=0)
assert _initialized() is True
print("PROBE_OK", flush=True)
""" % {"root": str(ROOT)}
    coord = f"localhost:{_free_port()}"
    r = subprocess.run([sys.executable, "-c", script, coord],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"subprocess failed:\n{r.stdout}\n{r.stderr}"
    assert "PROBE_OK" in r.stdout


def test_main_cli_distributed_launch(tmp_path):
    """The REAL main() path with --coordinator_address (round-4 advisor,
    high): main()'s compile-cache pin used to call jax.default_backend()
    before runner reached distributed.maybe_initialize, so every
    multi-process CLI run raised 'must be called before any JAX calls'.
    main() now defers the pin via distributed_launch_pending."""
    coord = f"localhost:{_free_port()}"
    r = subprocess.run(
        [sys.executable, "-m", "cyclegan_tpu.main", "--training",
         "--dataset", "synthetic", "--model", "supervised",
         "--max_steps", "1", "--platform", "cpu", "--no_bf16",
         "--dataset_size", "2", "--batch_size", "1", "--epochs", "1",
         "--crop_height", "32", "--crop_width", "32", "--ngf", "4",
         "--coordinator_address", coord, "--num_processes", "1",
         "--process_id", "0",
         "--checkpoint_dir", str(tmp_path / "ckpt"),
         "--results_dir", str(tmp_path / "res")],
        capture_output=True, text=True, timeout=600, cwd=str(ROOT))
    assert r.returncode == 0, f"main() distributed launch failed:\n{r.stdout}\n{r.stderr}"
    assert "must be called before any JAX calls" not in r.stderr
