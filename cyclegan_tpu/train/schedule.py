"""LR schedule (reference ``utils.LambdaLR`` — SURVEY.md §2 "Utilities").

Reference factor: ``1 - max(0, epoch + offset - decay_epoch) /
(epochs - decay_epoch)`` — constant LR until ``decay_epoch``, then linear
decay to 0 at ``epochs``. Stepped per EPOCH in the reference (SURVEY.md §3a);
we keep epoch granularity by mapping step -> epoch with a static
steps_per_epoch, so the whole schedule stays inside the jitted update.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lambda_lr_factor(epoch, *, epochs: int, offset: int, decay_epoch: int):
    """The reference's per-epoch multiplicative LR factor (jit-safe)."""
    e = jnp.asarray(epoch, jnp.float32)
    num = jnp.maximum(0.0, e + offset - decay_epoch)
    # Guard epochs == decay_epoch (no decay window -> constant LR).
    denom = max(epochs - decay_epoch, 1)
    # Clamp at 0: training past `epochs` must not turn the LR negative
    # (the reference never runs past `epochs`, but gradient ascent is never
    # the right failure mode).
    return jnp.maximum(0.0, 1.0 - num / float(denom))


def make_lambda_lr(
    base_lr: float,
    *,
    epochs: int,
    decay_epoch: int,
    steps_per_epoch: int,
    offset: int = 0,
) -> optax.Schedule:
    """optax schedule over steps reproducing LambdaLR's per-epoch staircase."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.int32) // steps_per_epoch
        return base_lr * lambda_lr_factor(
            epoch, epochs=epochs, offset=offset, decay_epoch=decay_epoch
        )

    return schedule


def make_adam(
    schedule: optax.Schedule,
    *,
    b1: float = 0.5,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam with the reference's betas=(0.5, 0.999) (SURVEY.md §3a).

    optax's ``scale_by_adam`` matches torch.optim.Adam's update (eps added
    after the sqrt of the bias-corrected second moment) — parity is asserted
    in tests/test_losses_parity.py::TestAdamParity.
    """
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(schedule),
    )
