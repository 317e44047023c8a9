"""Test config: run everything on CPU with 8 virtual devices.

NOTE: in this environment an `axon` sitecustomize force-sets
``jax_platforms=axon,cpu`` (the tunneled TPU), overriding the JAX_PLATFORMS
env var — so platform selection must go through jax.config *after* import,
*before* backend init. Parity tests use torch-CPU as the oracle
(SURVEY.md §4 "multi-device without a cluster").
"""

import os

# XLA's CPU collective rendezvous hard-aborts the process if any virtual
# device thread takes >40 s to reach a collective — routine scheduler
# starvation when 8 virtual devices share a 1-core CI VM. Must be set
# before backend init (the helper imports no jax).
from cyclegan_tpu.utils.cpuflags import (
    ensure_cpu_collective_timeouts, pin_cpu_compile_cache)

ensure_cpu_collective_timeouts()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
# Host-fingerprinted CPU cache dir: a stale XLA:CPU AOT entry from a
# previous VM's ISA could SIGILL the suite (see cpuflags docstring).
pin_cpu_compile_cache()
