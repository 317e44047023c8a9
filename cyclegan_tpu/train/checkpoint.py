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
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(directory),
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
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        state = self._mngr.restore(step, args=ocp.args.StandardRestore(abstract))
        return state, step + 1

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
