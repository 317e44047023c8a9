"""Supervised segmentation trainer (reference ``supervised_model`` —
SURVEY.md §2/§3d): one generator as the seg net, pixel CE loss, Adam with the
LambdaLR decay, per-epoch validation (mIoU / pixel-acc), checkpoint/resume.

The whole G update is one jitted, donated step; evaluation accumulates a
jitted confusion matrix.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from cyclegan_tpu.models import define_Gen
from cyclegan_tpu.train import losses, metrics, schedule
from cyclegan_tpu.utils.config import Config


class SupervisedState(NamedTuple):
    params: Any
    opt_state: optax.OptState
    rng: jax.Array
    step: jax.Array


class SupervisedTrainer:
    """Owns module + optimizer defs; all state flows functionally."""

    def __init__(self, cfg: Config, num_classes: int, in_channels: int,
                 steps_per_epoch: int):
        self.cfg = cfg
        self.num_classes = num_classes
        self.in_channels = in_channels
        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        self.model = define_Gen(
            output_nc=num_classes, ngf=cfg.ngf, netG=cfg.gen_net, norm=cfg.norm,
            use_dropout=cfg.use_dropout, head="none", dtype=dtype,
            remat=cfg.remat)
        self.tx = schedule.make_adam(
            schedule.make_lambda_lr(
                cfg.lr, epochs=cfg.epochs, decay_epoch=cfg.decay_epoch,
                steps_per_epoch=steps_per_epoch))
        self.ignore_index = 255

    def init_state(self, rng: jax.Array) -> SupervisedState:
        dummy = jnp.zeros(
            (1, self.cfg.crop_height, self.cfg.crop_width, self.in_channels),
            jnp.float32)
        k_init, k_state = jax.random.split(rng)
        params = self.model.init(k_init, dummy)
        return SupervisedState(
            params=params,
            opt_state=self.tx.init(params),
            rng=k_state,
            step=jnp.zeros((), jnp.int32),
        )

    def train_step(self, state: SupervisedState, batch: dict
                   ) -> tuple[SupervisedState, dict]:
        """(state, batch) -> (state, metrics); jit/donate me.

        Runs the net in train mode (``deterministic=False`` — torch
        ``.train()``): dropout active when configured, batch norm on batch
        statistics with running averages recorded (the ``batch_stats``
        collection is threaded through the state; its grads are identically
        zero, so the Adam step is a no-op on it and the EMA update below is
        authoritative).
        """
        rng, k_drop = jax.random.split(state.rng)
        rngs = {"dropout": k_drop} if self.cfg.use_dropout else None
        has_bn = "batch_stats" in state.params

        def loss_fn(params):
            if has_bn:
                logits, upd = self.model.apply(
                    params, batch["image"], deterministic=False, rngs=rngs,
                    mutable=["batch_stats"])
            else:
                logits = self.model.apply(
                    params, batch["image"], deterministic=False, rngs=rngs)
                upd = {}
            loss = losses.cross_entropy_loss(
                logits, batch["label"], ignore_index=self.ignore_index)
            return loss, jax.lax.stop_gradient(upd)

        (loss, stats_upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if has_bn:
            params = {**params, **stats_upd}
        return (
            SupervisedState(params, opt_state, rng, state.step + 1),
            {"ce_loss": loss},
        )

    def multi_step(self, state: SupervisedState, batches: dict
                   ) -> tuple[SupervisedState, dict]:
        """K chained steps in one program (``Config.steps_per_call``);
        ``batches`` carries a leading K axis. Returns last step's metrics."""
        state, ms = jax.lax.scan(self.train_step, state, batches)
        return state, jax.tree.map(lambda x: x[-1], ms)

    def accum_step(self, state: SupervisedState, batches: dict
                   ) -> tuple[SupervisedState, dict]:
        """ONE optimizer update accumulated over K stacked microbatches
        (``Config.grad_accum``; leading-K batch stacks like
        :meth:`multi_step`). Grads are microbatch-mean averaged — identical
        to the K*B batch when every microbatch has the same CE valid-pixel
        count (the standard accumulation convention otherwise); batch-norm
        running stats chain sequentially (torch semantics of K separate
        forwards). Peak activation memory = one microbatch's — each
        microbatch's forward+backward lives inside its ``lax.scan``
        iteration. Equivalence asserted by tests/test_grad_accum.py."""
        K = jax.tree.leaves(batches)[0].shape[0]
        rng, k_drop = jax.random.split(state.rng)
        dkeys = jax.random.split(k_drop, K)
        has_bn = "batch_stats" in state.params

        def loss_fn(params, batch, k):
            rngs = {"dropout": k} if self.cfg.use_dropout else None
            if has_bn:
                logits, upd = self.model.apply(
                    params, batch["image"], deterministic=False, rngs=rngs,
                    mutable=["batch_stats"])
            else:
                logits = self.model.apply(
                    params, batch["image"], deterministic=False, rngs=rngs)
                upd = {}
            loss = losses.cross_entropy_loss(
                logits, batch["label"], ignore_index=self.ignore_index)
            return loss, jax.lax.stop_gradient(upd)

        def micro(carry, xs):
            gsum, params_c, lsum = carry
            batch_i, k_i = xs
            (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_c, batch_i, k_i)
            if has_bn:
                params_c = {**params_c, **upd}
            return (jax.tree.map(jnp.add, gsum, grads), params_c,
                    lsum + loss), None

        init = (jax.tree.map(jnp.zeros_like, state.params), state.params,
                jnp.zeros((), jnp.float32))
        (gsum, params_c, lsum), _ = jax.lax.scan(micro, init, (batches, dkeys))
        updates, opt_state = self.tx.update(
            jax.tree.map(lambda x: x / K, gsum), state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if has_bn:
            params = {**params, "batch_stats": params_c["batch_stats"]}
        return (SupervisedState(params, opt_state, rng, state.step + 1),
                {"ce_loss": lsum / K})

    def logits(self, params: Any, image: jax.Array) -> jax.Array:
        """Raw class logits (the segmentation head; tiled eval hooks here)."""
        return self.model.apply(params, image)

    def eval_step(self, params: Any, batch: dict) -> jax.Array:
        """Confusion-matrix contribution of one batch; jit me."""
        pred = jnp.argmax(self.logits(params, batch["image"]), axis=-1)
        return metrics.confusion_matrix(
            pred, batch["label"], self.num_classes,
            ignore_index=self.ignore_index)

    def predict(self, params: Any, image: jax.Array) -> jax.Array:
        return jnp.argmax(self.logits(params, image), axis=-1)
