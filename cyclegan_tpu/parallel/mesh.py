"""Device mesh + sharding helpers (TPU-native DP — SURVEY.md §2/§7 item 6).

One jitted train step runs SPMD across the mesh: batches are sharded on the
``data`` axis, train state is replicated, and XLA compiles the gradient
all-reduce onto the ICI. No NCCL/process groups — this replaces the
reference's ``nn.DataParallel`` wholesale.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devs)} visible")
        devs = devs[:num_devices]
    import numpy as np

    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Host numpy batch -> device arrays sharded on the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def jit_step(step_fn: Callable, *, donate_state: bool = True) -> Callable:
    """jit a (state, batch, ...) -> (state, metrics) step for SPMD execution.

    Shardings propagate from the inputs ("computation follows data"): place
    the state with :func:`replicate_state` and batches with
    :func:`shard_batch` and XLA derives the internal collectives (the grad
    psum over the data axis) automatically. State is donated so optimizer
    buffers update in place in HBM.
    """
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())


def replicate_state(state: Any, mesh: Mesh) -> Any:
    rep = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)
