"""Checkpoint/resume (reference ``save_checkpoint``/``load_checkpoint`` —
SURVEY.md §3e) on Orbax.

Contract matches the reference: save every epoch under the checkpoint dir,
auto-resume from the latest on restart. The whole train state (all net
params, both optimizer states, pools, PRNG key, step) is one PyTree; Orbax
handles atomicity (the reference's atomic-overwrite of ``latest.ckpt``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 2):
        self._dir = os.path.abspath(directory)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, epoch: int, state: Any) -> None:
        self._mngr.save(epoch, args=ocp.args.StandardSave(state))

    def latest_epoch(self) -> int | None:
        return self._mngr.latest_step()

    def restore(self, state_template: Any, epoch: int | None = None) -> tuple[Any, int] | None:
        """Returns (state, next_epoch) or None if no checkpoint exists."""
        step = self._mngr.latest_step() if epoch is None else epoch
        if step is None:
            return None
        state_template = self._with_stored_pool_shapes(step, state_template)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        state = self._mngr.restore(step, args=ocp.args.StandardRestore(abstract))
        return state, step + 1

    def _with_stored_pool_shapes(self, step: int, template: Any) -> Any:
        """Replay-pool buffers are sized by ``cfg.pool_size``, which need not
        match the run that wrote the checkpoint (the reference doesn't
        checkpoint pools at all — SURVEY.md §3e). Restore them at the STORED
        shape/dtype so ``--testing``/resume works across pool_size or
        precision changes."""
        if not hasattr(template, "pool_img"):
            return template  # supervised state has no pools
        try:
            import jax.numpy as jnp

            with ocp.PyTreeCheckpointer() as c:
                meta = c.metadata(os.path.join(self._dir, str(step), "default"))
            tree = getattr(meta, "item_metadata", meta)

            def fix(pool, name):
                node = tree[name]["buffer"]
                shape, dtype = tuple(node.shape), node.dtype
                if (shape, dtype) != (pool.buffer.shape, pool.buffer.dtype):
                    pool = pool._replace(buffer=jnp.zeros(shape, dtype))
                return pool

            return template._replace(
                pool_img=fix(template.pool_img, "pool_img"),
                pool_lab=fix(template.pool_lab, "pool_lab"))
        except Exception:
            return template  # metadata unavailable — use the template as-is

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
