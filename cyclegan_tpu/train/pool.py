"""Image-pool replay (reference ``utils.Sample_from_Pool`` — SURVEY.md §2).

Reference semantics, per incoming fake image:
- while the pool has fewer than ``max_size`` items: store the new image and
  return it;
- once full: with p=0.5 return the new image untouched, otherwise swap it with
  a uniformly random stored image (return the old, store the new).

The reference keeps the pool on the host (a Python list) — a device round-trip
per step. Here the pool is a device-resident ring buffer carried functionally
in the train state and updated inside the jitted step with PRNG-driven masked
writes (SURVEY.md §7 item 5: diverge in mechanism, not behavior). Items within
a batch are processed sequentially via ``lax.scan`` to preserve the
reference's sequential-update distribution exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class PoolState(NamedTuple):
    buffer: jax.Array  # (max_size, H, W, C)
    count: jax.Array   # () int32 — number of valid items


def init_pool(max_size: int, item_shape: tuple[int, ...], dtype=jnp.float32) -> PoolState:
    return PoolState(
        buffer=jnp.zeros((max_size,) + tuple(item_shape), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def pool_query(
    state: PoolState, items: jax.Array, rng: jax.Array
) -> tuple[PoolState, jax.Array]:
    """Push a batch of items through the pool; returns (new_state, outputs).

    ``items`` is (B, H, W, C); outputs have the same shape. jit-safe: all
    branches are mask-selects, the batch walk is a ``lax.scan``.
    """
    max_size = state.buffer.shape[0]
    items = items.astype(state.buffer.dtype)  # bf16 fakes into an fp32 buffer

    def step(carry, inp):
        buffer, count = carry
        item, key = inp
        k_use, k_idx = jax.random.split(key)
        not_full = count < max_size
        use_new = jax.random.uniform(k_use) > 0.5
        rand_idx = jax.random.randint(k_idx, (), 0, max_size)

        # Where the new item lands: append slot while filling, else the swap
        # slot (only actually written when swapping).
        write_idx = jnp.where(not_full, count, rand_idx)
        do_write = jnp.logical_or(not_full, jnp.logical_not(use_new))
        old = lax.dynamic_index_in_dim(buffer, write_idx, axis=0, keepdims=False)
        new_slot = jnp.where(do_write, item, old)
        buffer = lax.dynamic_update_index_in_dim(buffer, new_slot, write_idx, axis=0)

        out = jnp.where(jnp.logical_or(not_full, use_new), item, old)
        count = jnp.where(not_full, count + 1, count)
        return (buffer, count), out

    keys = jax.random.split(rng, items.shape[0])
    (buffer, count), outs = lax.scan(step, (state.buffer, state.count), (items, keys))
    return PoolState(buffer, count), outs
