"""Losses (reference: nn.MSELoss / nn.L1Loss / nn.CrossEntropyLoss in
``model.py`` — SURVEY.md §3a).

LSGAN adversarial = MSE against constant 0/1 targets; cycle consistency = L1;
supervised segmentation = pixel cross-entropy (optionally masking an ignore
index — VOC's 255 border label). All reductions are means in fp32, matching
torch's default ``reduction='mean'``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lsgan_loss(scores: jax.Array, target_is_real: bool) -> jax.Array:
    """MSE against an all-ones (real) or all-zeros (fake) target map."""
    scores = scores.astype(jnp.float32)
    target = jnp.ones_like(scores) if target_is_real else jnp.zeros_like(scores)
    return jnp.mean(jnp.square(scores - target))


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int | None = 255,
) -> jax.Array:
    """Pixel cross-entropy, NHWC logits vs (N, H, W) int labels.

    Matches ``torch.nn.CrossEntropyLoss(ignore_index=...)``: the mean is taken
    over non-ignored pixels only.
    """
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    if ignore_index is not None:
        valid = labels != ignore_index
        safe_labels = jnp.where(valid, labels, 0)
    else:
        valid = jnp.ones(labels.shape, dtype=bool)
        safe_labels = labels
    # Select the label logit with a one-hot contraction instead of
    # take_along_axis: per-element gathers (and their scatter VJPs) are
    # TPU-hostile — the gather alone measured 1.5 ms/step in the 256² train
    # step profile, vs ~µs for the masked reduction. Same math.
    # CYCLEGAN_TPU_CE=gather restores the gather form for A/B.
    import os

    if os.environ.get("CYCLEGAN_TPU_CE") == "gather":
        picked = jnp.take_along_axis(
            log_probs, safe_labels[..., None], axis=-1)[..., 0]
    else:
        onehot = jax.nn.one_hot(safe_labels, logits.shape[-1],
                                dtype=log_probs.dtype)
        picked = jnp.sum(log_probs * onehot, axis=-1)
    picked = jnp.where(valid, picked, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(picked) / count
