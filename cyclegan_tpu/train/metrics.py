"""Segmentation metrics (reference ``scores()``-style eval — SURVEY.md §2).

Confusion-matrix accumulation as a jitted bincount; derived metrics: overall
pixel accuracy, mean per-class accuracy, per-class IoU, mIoU, frequency-
weighted IoU — the `_fast_hist` family the reference computes in numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(
    pred: jax.Array, label: jax.Array, num_classes: int, *, ignore_index: int | None = 255
) -> jax.Array:
    """(num_classes, num_classes) histogram; rows = ground truth, cols = pred."""
    # uint8 inputs (e.g. uint8-output serving artifacts) would overflow the
    # label*num_classes+pred flattening below; index math runs in int32.
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    if ignore_index is not None:
        valid = (label != ignore_index) & (label < num_classes)
    else:
        valid = label < num_classes
    idx = jnp.where(valid, label * num_classes + pred, num_classes * num_classes)
    hist = jnp.bincount(idx, length=num_classes * num_classes + 1)[:-1]
    return hist.reshape(num_classes, num_classes)


def scores(hist: jax.Array) -> dict[str, jax.Array]:
    """Derive the reference's metric dict from an accumulated confusion matrix."""
    hist = hist.astype(jnp.float64) if hist.dtype == jnp.int64 else hist.astype(jnp.float32)
    tp = jnp.diag(hist)
    gt_total = hist.sum(axis=1)
    pred_total = hist.sum(axis=0)
    union = gt_total + pred_total - tp

    pixel_acc = tp.sum() / jnp.maximum(hist.sum(), 1)
    class_acc = tp / jnp.maximum(gt_total, 1)
    present = gt_total > 0
    mean_acc = jnp.sum(jnp.where(present, class_acc, 0.0)) / jnp.maximum(present.sum(), 1)
    iou = tp / jnp.maximum(union, 1)
    valid_iou = union > 0
    miou = jnp.sum(jnp.where(valid_iou, iou, 0.0)) / jnp.maximum(valid_iou.sum(), 1)
    freq = gt_total / jnp.maximum(hist.sum(), 1)
    fwiou = jnp.sum(jnp.where(valid_iou, freq * iou, 0.0))
    return {
        "pixel_acc": pixel_acc,
        "mean_acc": mean_acc,
        "miou": miou,
        "fwiou": fwiou,
        "per_class_iou": iou,
    }
