"""Device mesh + sharding helpers (TPU-native parallelism — SURVEY.md §2/§7).

Two composable axes:

- ``data``: batch sharding (the reference's only strategy, via
  ``nn.DataParallel``) — XLA emits the ICI ``psum`` for gradient sync.
- ``spatial``: optional spatial partitioning of the image H axis for crops too
  large for one chip's HBM (512x256+ at large batch). XLA SPMD inserts the
  conv halo exchanges and the cross-device reductions for instance-norm
  statistics automatically — no manual collectives. (The Pallas fused
  instance-norm assumes a full spatial plane per device, so set
  CYCLEGAN_TPU_PALLAS=off when spatial_shards > 1.)

One jitted train step runs SPMD across the mesh: batches sharded, train state
replicated. No NCCL/process groups.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(num_devices: int | None = None, *, spatial: int = 1,
              devices=None) -> Mesh:
    """(data, spatial) mesh over the first ``num_devices`` devices.

    ``spatial`` splits the device count: dp = num_devices // spatial.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devs)} visible")
        devs = devs[:num_devices]
    n = len(devs)
    if n % spatial != 0:
        raise ValueError(f"{n} devices not divisible by spatial={spatial}")
    arr = np.array(devs).reshape(n // spatial, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4, *,
                   stacked: bool = False) -> NamedSharding:
    """Batch dim on ``data``; H dim on ``spatial`` for rank>=3 arrays.

    ``stacked``: arrays carry a leading steps-per-call axis (multi-step
    scan batching) — replicated, with data/spatial shifted one dim right.
    """
    if stacked:
        if ndim >= 4:
            spec = P(None, DATA_AXIS, SPATIAL_AXIS)
        elif ndim >= 2:
            spec = P(None, DATA_AXIS)
        else:
            spec = P()
        return NamedSharding(mesh, spec)
    if ndim >= 3:
        spec = P(DATA_AXIS, SPATIAL_AXIS)
    elif ndim >= 1:
        spec = P(DATA_AXIS)
    else:
        spec = P()
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, *, leading_stack: bool = False) -> Any:
    """Host batch -> device arrays sharded on (data[, spatial]).

    Single-process: a plain ``device_put``. Multi-process (fleet DP): each
    process holds only its row-shard of the global batch (see Loader's
    ``process_shard``); ``jax.make_array_from_process_local_data`` assembles
    the global array across hosts — process p's rows land on process p's
    devices, so no cross-host data movement happens on the input path.

    ``leading_stack``: batch arrays carry a leading steps-per-call axis
    (multi-step scan batching, ``Config.steps_per_call``).
    """
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                batch_sharding(mesh, np.ndim(x), stacked=leading_stack),
                np.asarray(x)), batch)
    return jax.tree.map(
        lambda x: jax.device_put(
            x, batch_sharding(mesh, np.ndim(x), stacked=leading_stack)),
        batch)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    rep = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def select_step(trainer, steps_per_call: int = 1,
                grad_accum: int = 1) -> Callable:
    """The trainer step for a (steps_per_call, grad_accum) setting: the
    plain ``train_step``; ``multi_step`` (K optimizer steps per device
    call); or ``accum_step`` (ONE update accumulated over K microbatches —
    ``Config.grad_accum``). Both stacked forms take leading-K batch stacks
    (pair with ``shard_batch(..., leading_stack=True)``) and are mutually
    exclusive: one device call is either K updates or one K-microbatch
    update. One definition so the runner, bench, and dryrun can't
    diverge."""
    if steps_per_call > 1 and grad_accum > 1:
        raise ValueError(
            f"steps_per_call={steps_per_call} and grad_accum={grad_accum} "
            f"are mutually exclusive (both consume the leading batch-stack "
            f"axis)")
    if grad_accum > 1:
        return trainer.accum_step
    return trainer.train_step if steps_per_call <= 1 else trainer.multi_step


def jit_step(step_fn: Callable, *, donate_state: bool = True) -> Callable:
    """jit a (state, batch, ...) -> (state, metrics) step for SPMD execution.

    Shardings propagate from the inputs ("computation follows data"): place
    the state with :func:`replicate_state` and batches with
    :func:`shard_batch` and XLA derives the internal collectives (grad psum
    over ``data``, halo exchanges over ``spatial``) automatically. State is
    donated so optimizer buffers update in place in HBM.
    """
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
