"""Parallelism (SURVEY.md §2 "Parallelism strategies").

The reference's only strategy is single-process ``nn.DataParallel``; the
TPU-native replacement is a 1-D ``jax.sharding.Mesh`` over the ICI with the
batch sharded on the ``data`` axis and params replicated — XLA inserts the
``psum`` gradient all-reduce inside the single jitted train step.
"""

from cyclegan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate_state,
    jit_step,
    select_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate_state",
    "jit_step",
    "select_step",
]
