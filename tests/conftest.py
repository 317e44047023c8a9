"""Test config: run everything on CPU with 8 virtual devices.

NOTE: in this environment an `axon` sitecustomize force-sets
``jax_platforms=axon,cpu`` (the tunneled TPU), overriding the JAX_PLATFORMS
env var — so platform selection must go through jax.config *after* import,
*before* backend init. Parity tests use torch-CPU as the oracle
(SURVEY.md §4 "multi-device without a cluster").
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
