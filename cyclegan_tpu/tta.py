"""Test-time augmentation: horizontal-flip logit averaging.

Beyond the reference (whose eval is a single forward — SURVEY.md §3c):
``--eval_flip true`` averages each image's logits with the width-mirrored
logits of its horizontal flip before the argmax — the standard
segmentation TTA that exploits the task's left/right symmetry for
fractions of a point of mIoU at exactly 2x eval compute. Composes with
``--eval_resize tile`` (the flip wraps the whole overlap-averaged canvas)
and with standalone artifact serving (``--serve_flip``, logits-head
artifacts only — an argmax head can't be averaged).

TPU-shaped: the flip is a reversed static slice XLA fuses into the input
load of the first conv; both forwards live in ONE jitted program, so the
scheduler sees a single 2x-batch-shaped workload rather than two calls.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

LogitsFn = Callable[[Any, jax.Array], jax.Array]


def flip_avg(logits_fn: LogitsFn) -> LogitsFn:
    """Wrap a ``(params, NHWC images) -> (N, H, W, K) logits`` fn with
    horizontal-flip TTA: ``0.5 * (f(x) + hflip(f(hflip(x))))``.

    Accumulates in f32 — bf16-compute configs emit bf16 logits and the
    average would otherwise round before the argmax (same rule as
    eval_tile's overlap accumulator).
    """

    def fn(params: Any, images: jax.Array) -> jax.Array:
        straight = logits_fn(params, images)
        mirrored = logits_fn(params, images[:, :, ::-1, :])[:, :, ::-1, :]
        return 0.5 * (straight.astype(jnp.float32)
                      + mirrored.astype(jnp.float32))

    return fn
