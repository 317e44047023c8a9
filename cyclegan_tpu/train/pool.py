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


def pool_query_with_decisions(
    state: PoolState, items: jax.Array, use_new: jax.Array,
    rand_idx: jax.Array,
) -> tuple[PoolState, jax.Array]:
    """Decision-driven pool core: push a batch of items through the pool with
    the swap decisions SUPPLIED instead of PRNG-drawn.

    ``use_new``/``rand_idx`` are (B,) bool / (B,) int32 — one (keep-new?,
    swap-slot) decision per item. While the pool is filling both are ignored
    (the reference only draws them once full). This is the single source of
    the pool semantics — :func:`pool_query` derives its decisions from a PRNG
    key and delegates here — and the hook that makes the replay stream
    parity-testable end-to-end against a host-side torch pool fed the SAME
    injected decisions (tests/test_pool_parity.py).
    """
    max_size = state.buffer.shape[0]
    items = items.astype(state.buffer.dtype)  # bf16 fakes into an fp32 buffer

    def step(carry, inp):
        buffer, count = carry
        item, keep_new, idx = inp
        not_full = count < max_size

        # Where the new item lands: append slot while filling, else the swap
        # slot (only actually written when swapping).
        write_idx = jnp.where(not_full, count, idx)
        do_write = jnp.logical_or(not_full, jnp.logical_not(keep_new))
        old = lax.dynamic_index_in_dim(buffer, write_idx, axis=0, keepdims=False)
        new_slot = jnp.where(do_write, item, old)
        buffer = lax.dynamic_update_index_in_dim(buffer, new_slot, write_idx, axis=0)

        out = jnp.where(jnp.logical_or(not_full, keep_new), item, old)
        count = jnp.where(not_full, count + 1, count)
        return (buffer, count), out

    (buffer, count), outs = lax.scan(
        step, (state.buffer, state.count),
        (items, use_new.astype(jnp.bool_), rand_idx.astype(jnp.int32)))
    return PoolState(buffer, count), outs


def pool_query(
    state: PoolState, items: jax.Array, rng: jax.Array
) -> tuple[PoolState, jax.Array]:
    """Push a batch of items through the pool; returns (new_state, outputs).

    ``items`` is (B, H, W, C); outputs have the same shape. jit-safe: all
    branches are mask-selects, the batch walk is a ``lax.scan``. Decisions
    are drawn from ``rng`` (one (use-new?, swap-slot) pair per item) and fed
    to the decision-driven core above.
    """
    max_size = state.buffer.shape[0]
    b = items.shape[0]
    keys = jax.random.split(rng, b)
    # One split per key; [:, 0]/[:, 1] are the (use-new, swap-slot) streams.
    # This derivation is pinned by the golden curves — do not restructure.
    pairs = jax.vmap(jax.random.split)(keys)
    k_use, k_idx = pairs[:, 0], pairs[:, 1]
    use_new = jax.vmap(lambda k: jax.random.uniform(k) > 0.5)(k_use)
    rand_idx = jax.vmap(
        lambda k: jax.random.randint(k, (), 0, max_size))(k_idx)
    return pool_query_with_decisions(state, items, use_new, rand_idx)
