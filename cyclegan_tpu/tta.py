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


def parse_scales(spec: str | None) -> tuple[float, ...] | None:
    """``"0.75,1.0,1.25"`` -> (0.75, 1.0, 1.25); None/empty -> None."""
    if not spec:
        return None
    scales = tuple(float(s) for s in str(spec).split(",") if s.strip())
    if not scales or any(s <= 0 for s in scales):
        raise ValueError(f"bad eval_scales {spec!r} (comma-separated "
                         f"positive floats, e.g. '0.75,1.0,1.25')")
    return scales


def snapped_dims(h: int, w: int, scale: float, *, snap: int = 4) -> tuple[int, int]:
    """The static (H, W) :func:`scale_avg` actually runs ``scale`` at.

    Shared with the pre-flight validators (serve.py, runner tile mode) so
    a configuration is rejected with the same arithmetic the jitted
    program will use — the two must never diverge.
    """
    hs = max(int(round(h * scale / snap)) * snap, snap)
    ws = max(int(round(w * scale / snap)) * snap, snap)
    return hs, ws


def validate_tile_scales(canvas_hw: tuple[int, int], window_hw: tuple[int, int],
                         scales: tuple[float, ...] | None, *,
                         snap: int = 4) -> None:
    """Raise early if any TTA scale shrinks a tile-mode canvas below the
    sliding window — otherwise the failure surfaces only at the first
    eval trace (after a full training epoch, before its checkpoint save).
    """
    if not scales:
        return
    ch, cw = canvas_hw
    wh, ww = window_hw
    for s in scales:
        hs, ws = snapped_dims(ch, cw, s, snap=snap)
        if hs < wh or ws < ww:
            raise ValueError(
                f"eval/serve scale {s} shrinks the {ch}x{cw} canvas to "
                f"{hs}x{ws}, smaller than the {wh}x{ww} sliding window — "
                f"raise the canvas (--resize_height/width or "
                f"--serve_canvas_height/width) or drop the scale")


def scale_avg(logits_fn: LogitsFn, scales: tuple[float, ...], *,
              snap: int = 4) -> LogitsFn:
    """Multi-scale TTA: run ``logits_fn`` at each image scale, bilinearly
    resize the logits back to the native grid, and average (f32) — the
    standard segmentation eval protocol (PSPNet/DeepLab-style), composing
    with :func:`flip_avg` (wrap flip first: each scale is then
    flip-averaged, i.e. the average runs over scales x {id, mirror}).

    Scaled dims snap to multiples of ``snap`` (default 4 — the ResNet
    generators' down/upsample pair only round-trips /4 shapes; tile-mode
    canvases only need to stay >= the crop window). Every scale is a
    STATIC shape, so each compiles once into the same jitted eval program.
    """
    if not scales:
        raise ValueError("scale_avg needs at least one scale")

    def fn(params: Any, images: jax.Array) -> jax.Array:
        b, h, w, c = images.shape
        acc = None
        for s in scales:
            hs, ws = snapped_dims(h, w, s, snap=snap)
            if (hs, ws) == (h, w):
                lo = logits_fn(params, images).astype(jnp.float32)
            else:
                xs = jax.image.resize(images, (b, hs, ws, c), "linear")
                lo = logits_fn(params, xs).astype(jnp.float32)
                lo = jax.image.resize(lo, (b, h, w, lo.shape[-1]), "linear")
            acc = lo if acc is None else acc + lo
        return acc / len(scales)

    return fn
