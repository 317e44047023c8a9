"""Tiled (sliding-window) high-resolution evaluation.

Beyond the reference, whose eval squashes every validation image down to
the training crop (SURVEY.md §2 data row; docs/PARITY.md "eval
resolution"): ``--eval_resize tile`` evaluates on a FIXED larger canvas
(``--resize_height/--resize_width``) by sliding the training-crop window
over it with 50% overlap, averaging logits where windows overlap, and
scoring the argmax at canvas resolution. The standard trick for scoring
high-resolution corpora (e.g. Cityscapes 2:1 frames) with a crop-trained
net.

TPU-shaped by construction: the canvas is one static shape, the window
grid is static Python (no dynamic control flow under jit), and all windows
of an image run as ONE batched model call (P·B windows — large, MXU-
friendly). Overlap-averaging uses static-slice scatter-adds that XLA fuses.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from cyclegan_tpu.train import metrics


def window_positions(size: int, win: int, stride: int) -> list[int]:
    """Static window offsets covering [0, size): regular stride, last
    window pinned to the end so the canvas edge is always covered."""
    if size <= win:
        return [0]
    pos = list(range(0, size - win + 1, stride))
    if pos[-1] != size - win:
        pos.append(size - win)
    return pos


def tiled_logits(logits_fn: Callable[[Any, jax.Array], jax.Array],
                 params: Any, images: jax.Array,
                 crop_hw: tuple[int, int], *,
                 overlap: float = 0.5) -> jax.Array:
    """(B, H, W, C) canvas images -> (B, H, W, K) overlap-averaged logits.

    ``logits_fn(params, windows)`` is applied once to the (P*B, ch, cw, C)
    stack of all windows. Raises if the canvas is smaller than the window.
    """
    b, h, w, _ = images.shape
    ch, cw = crop_hw
    if h < ch or w < cw:
        raise ValueError(f"canvas {h}x{w} smaller than the window {ch}x{cw}")
    sy = max(int(round(ch * (1.0 - overlap))), 1)
    sx = max(int(round(cw * (1.0 - overlap))), 1)
    ys = window_positions(h, ch, sy)
    xs = window_positions(w, cw, sx)
    wins = jnp.concatenate(
        [images[:, y:y + ch, x:x + cw, :] for y in ys for x in xs], axis=0)
    logits = logits_fn(params, wins)  # (P*B, ch, cw, K)
    k = logits.shape[-1]
    # Accumulate in f32: bf16-compute configs emit bf16 logits, and the
    # overlap sum would otherwise round before the average.
    acc = jnp.zeros((b, h, w, k), jnp.float32)
    cnt = jnp.zeros((h, w, 1), jnp.float32)
    i = 0
    for y in ys:
        for x in xs:
            acc = acc.at[:, y:y + ch, x:x + cw, :].add(
                logits[i * b:(i + 1) * b].astype(jnp.float32))
            cnt = cnt.at[y:y + ch, x:x + cw, :].add(1.0)
            i += 1
    return acc / cnt


def tiled_predict(trainer, params: Any, images: jax.Array,
                  crop_hw: tuple[int, int], *,
                  overlap: float = 0.5) -> jax.Array:
    """Canvas images -> (B, H, W) int label map via tiled logits."""
    return jnp.argmax(
        tiled_logits(trainer.logits, params, images, crop_hw,
                     overlap=overlap), axis=-1)


def tiled_eval_step(trainer, params: Any, batch: dict,
                    crop_hw: tuple[int, int], *,
                    overlap: float = 0.5) -> jax.Array:
    """Confusion-matrix contribution of one canvas batch; jit me (the
    tile-mode drop-in for ``trainer.eval_step``)."""
    pred = tiled_predict(trainer, params, batch["image"], crop_hw,
                         overlap=overlap)
    return metrics.confusion_matrix(
        pred, batch["label"], trainer.num_classes,
        ignore_index=trainer.ignore_index)
