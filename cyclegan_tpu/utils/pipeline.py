"""Depth-bounded async inference pipeline (dispatch k+1 before fetching k).

JAX dispatch is asynchronous: enqueueing the next batch on the device before
fetching the current batch's results lets the device compute batch k+1 while
the host decodes inputs and colorizes/writes batch k's PNGs. Results are
consumed strictly in submission order, so outputs are bit-identical to the
serial loop — only the fetch point moves. Shared by the directory-serving
loop (cyclegan_tpu.serve.run_serve) and the test/inference path
(train.runner.run_test) so the depth semantics stay single-sourced.

Depth knob for A/B: ``CYCLEGAN_TPU_INFER_DEPTH`` (default 1;
0 = serial fetch-per-batch).
"""

from __future__ import annotations

import os
from typing import Any, Callable


def infer_depth() -> int:
    """The configured pipeline depth (max in-flight device calls)."""
    return max(0, int(os.environ.get("CYCLEGAN_TPU_INFER_DEPTH", "1")))


class InferencePipeline:
    """Order-preserving bounded queue of in-flight device results.

    ``put(payload, device_result)`` enqueues an async device result with its
    host-side payload (filenames, batch metadata, ...); whenever more than
    ``depth`` results are pending, the oldest is fetched (``jax.device_get``
    → np.asarray) and handed to ``consume(payload, fetched)``. ``flush()``
    drains everything — call it after the submission loop.
    """

    def __init__(self, consume: Callable[[Any, Any], None],
                 depth: int | None = None) -> None:
        import jax
        import numpy as np

        self._consume = consume
        self._get = lambda dev: np.asarray(jax.device_get(dev))
        self.depth = infer_depth() if depth is None else max(0, depth)
        self._pending: list[tuple[Any, Any]] = []

    def put(self, payload: Any, device_result: Any) -> None:
        self._pending.append((payload, device_result))
        self._drain(self.depth)

    def flush(self) -> None:
        self._drain(0)

    def _drain(self, limit: int) -> None:
        while len(self._pending) > limit:
            payload, dev = self._pending.pop(0)
            self._consume(payload, self._get(dev))
