"""TPU-native semi-supervised CycleGAN segmentation framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of
``arnab39/Semi-supervised-segmentation-cycleGAN`` (paper: "Revisiting CycleGAN for
semi-supervised segmentation", arXiv:1908.11569), designed TPU-first:

- NHWC layout everywhere (XLA's preferred conv layout on TPU).
- All hot-path compute lives inside single jitted train steps (G+D update fused
  into one XLA program), with bf16 compute / fp32 params mixed precision.
- Data parallelism via ``jax.sharding.Mesh`` + NamedSharding; XLA inserts the
  ICI collectives for gradient sync.
- Pallas kernels for the fused instance-norm blocks (see ``cyclegan_tpu.kernels``).

Reference layer map and component inventory: see SURVEY.md at the repo root.
(The reference mount was empty in this environment; parity targets derive from
SURVEY.md [B]/[M]/[P] provenance and are validated against a torch-CPU
re-derivation in tests/.)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first compile of the fused G+D train step
# is slow (minutes over the axon TPU tunnel); subsequent runs hit disk.
# Disable with CYCLEGAN_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("CYCLEGAN_TPU_NO_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("CYCLEGAN_TPU_COMPILE_CACHE",
                        _os.path.expanduser("~/.cache/cyclegan_tpu_xla")))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
