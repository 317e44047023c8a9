"""Semi-supervised CycleGAN trainer (reference ``semisuper_cycleGAN`` —
SURVEY.md §2/§3a).

The reference's hot loop (G step, pool query, D step) compiles to ONE jitted
XLA program per train step:

G phase (D params held constant — grads are taken only w.r.t. the G pytrees,
the functional equivalent of the reference's ``set_grad(D, False)``):
  fake_lab  = softmax(G_i2l(unlab_img))        # continuous label bridge
  fake_img  = G_l2i(onehot(real_lab))
  adv       = MSE(D_lab(fake_lab), 1) + MSE(D_img(fake_img), 1)
  cycle_img = L1(G_l2i(fake_lab), unlab_img) * lamda
  cycle_lab = CE(G_i2l(fake_img), real_lab) * lamda_lab   # label-side cycle
  sup       = CE(G_i2l(lab_img), lab_gt)                  # labeled subset

Pool phase: detached fakes go through the device-resident replay pools
(cyclegan_tpu.train.pool).

D phase:
  0.5 * [MSE(D_img(real_img), 1) + MSE(D_img(pool_fake_img), 0)]
  0.5 * [MSE(D_lab(onehot(real_lab)), 1) + MSE(D_lab(pool_fake_lab), 0)]

Assumption notes ([M]/[P] provenance — reference mount empty, SURVEY.md §0):
the label-side cycle uses CE against the original label map (paper
arXiv:1908.11569 formulates the label cycle as a CE term); the label->image
generator consumes one-hot GT labels and softmax predictions (the
"softmax-label bridge", SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from cyclegan_tpu.models import define_Dis, define_Gen
from cyclegan_tpu.train import losses, metrics, schedule
from cyclegan_tpu.train.pool import (
    PoolState, init_pool, pool_query, pool_query_with_decisions)
from cyclegan_tpu.utils.config import Config


class CycleGANState(NamedTuple):
    g_i2l: Any          # G: image -> label logits (the segmentation net)
    g_l2i: Any          # G: label probs -> image
    d_img: Any          # D on the image domain
    d_lab: Any          # D on the label-prob domain
    g_opt: optax.OptState
    d_opt: optax.OptState
    pool_img: PoolState  # replay buffer of fake images
    pool_lab: PoolState  # replay buffer of fake label maps
    rng: jax.Array
    step: jax.Array


class CycleGANTrainer:
    def __init__(self, cfg: Config, num_classes: int, in_channels: int,
                 steps_per_epoch: int):
        self.cfg = cfg
        self.num_classes = num_classes
        self.in_channels = in_channels
        dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        self.G_i2l = define_Gen(num_classes, cfg.ngf, cfg.gen_net, cfg.norm,
                                cfg.use_dropout, head="none", dtype=dtype,
                                remat=cfg.remat)
        self.G_l2i = define_Gen(in_channels, cfg.ngf, cfg.gen_net, cfg.norm,
                                cfg.use_dropout, head="tanh", dtype=dtype,
                                remat=cfg.remat)
        self.D_img = define_Dis(cfg.ndf, cfg.dis_net, cfg.n_layers_D, cfg.norm,
                                dtype=dtype)
        self.D_lab = define_Dis(cfg.ndf, cfg.dis_net, cfg.n_layers_D, cfg.norm,
                                dtype=dtype)
        lr = schedule.make_lambda_lr(
            cfg.lr, epochs=cfg.epochs, decay_epoch=cfg.decay_epoch,
            steps_per_epoch=steps_per_epoch)
        self.g_tx = schedule.make_adam(lr)
        self.d_tx = schedule.make_adam(lr)
        self.ignore_index = 255
        self.lamda = cfg.lamda
        self.lamda_lab = cfg.lamda if cfg.lamda_lab is None else cfg.lamda_lab

    def init_state(self, rng: jax.Array) -> CycleGANState:
        cfg = self.cfg
        h, w, c = cfg.crop_height, cfg.crop_width, self.in_channels
        k = jax.random.split(rng, 5)
        img = jnp.zeros((1, h, w, c), jnp.float32)
        lab_probs = jnp.zeros((1, h, w, self.num_classes), jnp.float32)
        g_i2l = self.G_i2l.init(k[0], img)
        g_l2i = self.G_l2i.init(k[1], lab_probs)
        d_img = self.D_img.init(k[2], img)
        d_lab = self.D_lab.init(k[3], lab_probs)
        # Pools hold detached fakes only — store in the compute dtype (the
        # label pool at 256x256x21 would be 275 MB in fp32 at pool size 50).
        pool_dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
        return CycleGANState(
            g_i2l=g_i2l, g_l2i=g_l2i, d_img=d_img, d_lab=d_lab,
            g_opt=self.g_tx.init((g_i2l, g_l2i)),
            d_opt=self.d_tx.init((d_img, d_lab)),
            pool_img=init_pool(cfg.pool_size, (h, w, c), pool_dtype),
            pool_lab=init_pool(cfg.pool_size, (h, w, self.num_classes),
                               pool_dtype),
            rng=k[4], step=jnp.zeros((), jnp.int32),
        )

    def _onehot(self, labels: jax.Array) -> jax.Array:
        oh = jax.nn.one_hot(
            jnp.where(labels == self.ignore_index, 0, labels), self.num_classes)
        return oh * (labels != self.ignore_index)[..., None]

    def _apply(self, model, params_or_store, x, k=None, name=None):
        """Train-mode apply (torch ``.train()`` — SURVEY.md §3a): dropout
        active when configured (fresh mask per forward, reference
        semantics); batch norm on batch statistics with running averages
        recorded. When ``name`` selects a net from a ``store`` dict, the
        store entry is replaced with the updated ``batch_stats`` — chaining
        EMAs across same-net applies (grads through them are identically
        zero — Adam is a no-op on stats; the write-back in the step is
        authoritative)."""
        store = params_or_store if name is not None else None
        params = store[name] if store is not None else params_or_store
        use_k = self.cfg.use_dropout and k is not None
        rngs = {"dropout": k} if use_k else None
        if "batch_stats" in params:
            y, upd = model.apply(params, x, deterministic=False,
                                 rngs=rngs, mutable=["batch_stats"])
            if store is not None:
                store[name] = {**params, **jax.lax.stop_gradient(upd)}
            return y
        return model.apply(params, x, deterministic=False, rngs=rngs)

    def _g_loss(self, g_params, d_img, d_lab, batch, real_lab_oh, dkeys):
        """G-phase total loss (reference G step, SURVEY.md §3a).

        ``aux`` carries the fakes (for the pool/D phase) and the updated
        ``bn``/``d_bn`` batch-stat collections. D params are
        differentiation constants (functional ``set_grad(D, False)``) but
        their batch-stat EMAs ARE recorded — the reference's
        every-train-mode-forward semantics; the D phase starts from them.

        Same-network applications are concatenated along batch (``fuse``):
        instance norm is per-sample, so this is mathematically identical to
        separate applies (asserted by the torch trajectory-parity tests)
        but feeds the MXU 2x-larger conv batches and halves the
        kernel-launch count — a TPU-first restructuring the reference's
        sequential torch calls can't express. Disabled for the (off-spec)
        batch-norm option, whose statistics would couple the concatenated
        halves.
        """
        _apply = self._apply
        fuse = self.cfg.norm != "batch"
        b = batch["unlab_image"].shape[0]
        gs = {"g_i2l": g_params[0], "g_l2i": g_params[1]}
        d_stats = {"d_img": d_img, "d_lab": d_lab}
        if fuse:
            seg_out = _apply(
                self.G_i2l, gs,
                jnp.concatenate([batch["unlab_image"], batch["lab_image"]]),
                dkeys[0], name="g_i2l")
            fake_lab = jax.nn.softmax(seg_out[:b], axis=-1)
            sup_logits = seg_out[b:]
            l2i_out = _apply(
                self.G_l2i, gs,
                jnp.concatenate([real_lab_oh, fake_lab]), dkeys[1],
                name="g_l2i")
            fake_img, rec_img = l2i_out[:b], l2i_out[b:]
        else:
            fake_lab = jax.nn.softmax(
                _apply(self.G_i2l, gs, batch["unlab_image"], dkeys[0],
                       name="g_i2l"), axis=-1)
            sup_logits = None  # applied AFTER the label cycle (below):
            # the reference's G_i2l forward order is unlab -> fake_img
            # (cycle) -> lab_img (sup), and batch-norm's EMA is
            # order-sensitive. Loss values are order-independent (train
            # mode normalizes with per-forward batch stats).
            fake_img = _apply(self.G_l2i, gs, real_lab_oh, dkeys[1],
                              name="g_l2i")
            rec_img = _apply(self.G_l2i, gs, fake_lab, dkeys[2],
                             name="g_l2i")
        # adversarial (LSGAN) — grads flow to G through the D applies;
        # the D stat updates go into d_stats.
        adv_lab = losses.lsgan_loss(
            _apply(self.D_lab, d_stats, fake_lab, name="d_lab"), True)
        adv_img = losses.lsgan_loss(
            _apply(self.D_img, d_stats, fake_img, name="d_img"), True)
        # cycles
        cyc_img = losses.l1_loss(rec_img, batch["unlab_image"]) * self.lamda
        rec_lab_logits = _apply(self.G_i2l, gs, fake_img, dkeys[3],
                                name="g_i2l")
        cyc_lab = losses.cross_entropy_loss(
            rec_lab_logits, batch["lab_label"],
            ignore_index=self.ignore_index) * self.lamda_lab
        # supervised CE on the labeled subset
        if sup_logits is None:
            sup_logits = _apply(self.G_i2l, gs, batch["lab_image"],
                                dkeys[4], name="g_i2l")
        sup = losses.cross_entropy_loss(
            sup_logits, batch["lab_label"], ignore_index=self.ignore_index)
        total = adv_lab + adv_img + cyc_img + cyc_lab + sup
        aux = {
            "g_adv": adv_lab + adv_img, "g_cycle_img": cyc_img,
            "g_cycle_lab": cyc_lab, "g_sup": sup, "g_total": total,
            "fake_lab": fake_lab, "fake_img": fake_img,
            "bn": {n: t["batch_stats"] for n, t in gs.items()
                   if "batch_stats" in t},
            "d_bn": {n: t["batch_stats"] for n, t in d_stats.items()
                     if "batch_stats" in t},
        }
        return total, aux

    def _d_loss(self, d_params, batch, real_lab_oh, pooled_fake_img,
                pooled_fake_lab):
        """D-phase loss on real inputs vs pooled fakes (reference D step,
        SURVEY.md §3a): 0.5·[MSE(D(real),1) + MSE(D(pool_fake),0)] per D.
        Same batch-concat ``fuse`` restructuring as :meth:`_g_loss`."""
        _apply = self._apply
        fuse = self.cfg.norm != "batch"
        b = batch["unlab_image"].shape[0]
        ds = {"d_img": d_params[0], "d_lab": d_params[1]}
        if fuse:
            s_img = _apply(self.D_img, ds, jnp.concatenate(
                [batch["unlab_image"], pooled_fake_img.astype(
                    batch["unlab_image"].dtype)]), name="d_img")
            d_img_loss = 0.5 * (losses.lsgan_loss(s_img[:b], True)
                                + losses.lsgan_loss(s_img[b:], False))
            s_lab = _apply(self.D_lab, ds, jnp.concatenate(
                [real_lab_oh, pooled_fake_lab.astype(real_lab_oh.dtype)]),
                name="d_lab")
            d_lab_loss = 0.5 * (losses.lsgan_loss(s_lab[:b], True)
                                + losses.lsgan_loss(s_lab[b:], False))
        else:
            d_img_loss = 0.5 * (
                losses.lsgan_loss(_apply(self.D_img, ds,
                                         batch["unlab_image"],
                                         name="d_img"), True)
                + losses.lsgan_loss(_apply(self.D_img, ds,
                                           pooled_fake_img,
                                           name="d_img"), False))
            d_lab_loss = 0.5 * (
                losses.lsgan_loss(_apply(self.D_lab, ds, real_lab_oh,
                                         name="d_lab"), True)
                + losses.lsgan_loss(_apply(self.D_lab, ds,
                                           pooled_fake_lab,
                                           name="d_lab"), False))
        total = d_img_loss + d_lab_loss
        return total, {"d_img": d_img_loss, "d_lab": d_lab_loss,
                       "d_total": total,
                       "bn": {n: t["batch_stats"] for n, t in ds.items()
                              if "batch_stats" in t}}

    def train_step(self, state: CycleGANState, batch: dict
                   ) -> tuple[CycleGANState, dict]:
        """One alternating G/D update as a single functional step.

        ``batch``: lab_image (B,H,W,C), lab_label (B,H,W) int, unlab_image
        (B,H,W,C). jit/donate me.
        """
        real_lab_oh = self._onehot(batch["lab_label"])
        # Dropout: fresh masks per forward call (reference semantics); inert
        # when use_dropout is off.
        rng0, *dkeys = jax.random.split(state.rng, 6)

        (_, aux), g_grads = jax.value_and_grad(self._g_loss, has_aux=True)(
            (state.g_i2l, state.g_l2i), state.d_img, state.d_lab, batch,
            real_lab_oh, dkeys)
        g_updates, g_opt = self.g_tx.update(
            g_grads, state.g_opt, (state.g_i2l, state.g_l2i))
        g_i2l, g_l2i = optax.apply_updates((state.g_i2l, state.g_l2i), g_updates)
        g_bn = aux.pop("bn")
        if "g_i2l" in g_bn:
            g_i2l = {**g_i2l, "batch_stats": g_bn["g_i2l"]}
        if "g_l2i" in g_bn:
            g_l2i = {**g_l2i, "batch_stats": g_bn["g_l2i"]}

        # D running stats advanced by the G-phase D forwards: the D phase
        # STARTS from them (the reference's BatchNorm records every
        # train-mode forward). No-op under instance norm (no batch_stats).
        g_d_bn = aux.pop("d_bn")
        d_img_in = ({**state.d_img, "batch_stats": g_d_bn["d_img"]}
                    if "d_img" in g_d_bn else state.d_img)
        d_lab_in = ({**state.d_lab, "batch_stats": g_d_bn["d_lab"]}
                    if "d_lab" in g_d_bn else state.d_lab)

        # Pool phase: detached fakes through the replay buffers.
        # pool_size=0 bypasses replay (fresh fakes go straight to D) — used by
        # deterministic parity tests; the reference default is 50.
        rng, k_img, k_lab = jax.random.split(rng0, 3)
        fake_img = jax.lax.stop_gradient(aux.pop("fake_img"))
        fake_lab = jax.lax.stop_gradient(aux.pop("fake_lab"))
        _pool_keys = ("pool_use_new_img", "pool_idx_img",
                      "pool_use_new_lab", "pool_idx_lab")
        _n_pool_keys = sum(k in batch for k in _pool_keys)
        if _n_pool_keys not in (0, len(_pool_keys)):
            raise ValueError(
                "injected pool decisions require all four batch keys "
                f"{_pool_keys}; got only "
                f"{[k for k in _pool_keys if k in batch]}")
        if self.cfg.pool_size > 0 and _n_pool_keys == len(_pool_keys):
            # Injected swap decisions (key presence is static at trace time;
            # production batches never carry these). Makes the pool-ACTIVE
            # trajectory deterministic and parity-testable against a torch
            # host pool fed the same decisions (tests/test_pool_parity.py).
            pool_img, pooled_fake_img = pool_query_with_decisions(
                state.pool_img, fake_img, batch["pool_use_new_img"],
                batch["pool_idx_img"])
            pool_lab, pooled_fake_lab = pool_query_with_decisions(
                state.pool_lab, fake_lab, batch["pool_use_new_lab"],
                batch["pool_idx_lab"])
        elif self.cfg.pool_size > 0:
            pool_img, pooled_fake_img = pool_query(state.pool_img, fake_img, k_img)
            pool_lab, pooled_fake_lab = pool_query(state.pool_lab, fake_lab, k_lab)
        else:
            pool_img, pooled_fake_img = state.pool_img, fake_img
            pool_lab, pooled_fake_lab = state.pool_lab, fake_lab

        (_, d_aux), d_grads = jax.value_and_grad(self._d_loss, has_aux=True)(
            (d_img_in, d_lab_in), batch, real_lab_oh, pooled_fake_img,
            pooled_fake_lab)
        d_updates, d_opt = self.d_tx.update(
            d_grads, state.d_opt, (d_img_in, d_lab_in))
        d_img_p, d_lab_p = optax.apply_updates((d_img_in, d_lab_in), d_updates)
        d_bn = d_aux.pop("bn")
        if "d_img" in d_bn:
            d_img_p = {**d_img_p, "batch_stats": d_bn["d_img"]}
        if "d_lab" in d_bn:
            d_lab_p = {**d_lab_p, "batch_stats": d_bn["d_lab"]}

        new_state = CycleGANState(
            g_i2l=g_i2l, g_l2i=g_l2i, d_img=d_img_p, d_lab=d_lab_p,
            g_opt=g_opt, d_opt=d_opt, pool_img=pool_img, pool_lab=pool_lab,
            rng=rng, step=state.step + 1)
        aux.update(d_aux)
        return new_state, aux

    def multi_step(self, state: CycleGANState, batches: dict
                   ) -> tuple[CycleGANState, dict]:
        """K chained train steps in ONE compiled program.

        ``batches`` carries a leading steps-per-call axis: image arrays
        (K, B, H, W, C), labels (K, B, H, W) — ``lax.scan`` threads the
        train state through K alternating G/D updates, amortizing per-step
        launch/dispatch and letting XLA schedule across step boundaries
        (the batch-1 step is scheduling-limited — docs/KERNELS.md).
        Returns the LAST step's metrics (matches the runner's log cadence).
        """
        state, ms = jax.lax.scan(self.train_step, state, batches)
        return state, jax.tree.map(lambda x: x[-1], ms)

    def accum_step(self, state: CycleGANState, batches: dict
                   ) -> tuple[CycleGANState, dict]:
        """ONE alternating G/D update accumulated over K stacked microbatches
        (``Config.grad_accum``; ``batches`` carries a leading K axis like
        :meth:`multi_step`).

        Effective batch K*B at ONE microbatch's activation memory: every
        microbatch's forward+backward lives inside its ``lax.scan``
        iteration, so the backward-pass activation footprint — the peak-HBM
        driver that pushes large single-call batches into XLA's
        rematerialization regime (BASELINE.md b32 attribution) — never
        exceeds a single microbatch's.

        Semantics vs one :meth:`train_step` on the concatenated K*B batch
        (asserted by tests/test_grad_accum.py):
        - losses/grads: identical — means of equal-size microbatch means —
          when every microbatch has the same CE valid-pixel count
          (otherwise the standard torch-convention microbatch-mean
          averaging);
        - pools: queried once per MICROBATCH (K sequential queries per
          update), so the replay stream differs from a single K*B query;
        - batch norm: per-microbatch statistics, running stats chained
          sequentially (torch semantics of K separate forwards).
        """
        K = jax.tree.leaves(batches)[0].shape[0]
        oh_all = self._onehot(batches["lab_label"])        # (K, B, H, W, C)
        rng, k_drop, k_pool = jax.random.split(state.rng, 3)
        dkeys = jax.random.split(k_drop, (K, 5))
        pkeys = jax.random.split(k_pool, (K, 2))
        zeros_of = lambda tree: jax.tree.map(jnp.zeros_like, tree)  # noqa: E731
        fsum = lambda: jnp.zeros((), jnp.float32)  # noqa: E731

        # --- G phase: grads accumulate against FIXED params; batch-stat
        # EMAs (G's and the G-phase D forwards') chain through the carry.
        g_p0 = (state.g_i2l, state.g_l2i)

        def g_micro(carry, xs):
            gsum, g_i2l_c, g_l2i_c, d_img_c, d_lab_c, msum = carry
            batch_i, oh_i, keys_i = xs
            (_, aux), grads = jax.value_and_grad(self._g_loss, has_aux=True)(
                (g_i2l_c, g_l2i_c), d_img_c, d_lab_c, batch_i, oh_i, keys_i)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            g_bn, d_bn = aux.pop("bn"), aux.pop("d_bn")
            if "g_i2l" in g_bn:
                g_i2l_c = {**g_i2l_c, "batch_stats": g_bn["g_i2l"]}
            if "g_l2i" in g_bn:
                g_l2i_c = {**g_l2i_c, "batch_stats": g_bn["g_l2i"]}
            if "d_img" in d_bn:
                d_img_c = {**d_img_c, "batch_stats": d_bn["d_img"]}
            if "d_lab" in d_bn:
                d_lab_c = {**d_lab_c, "batch_stats": d_bn["d_lab"]}
            fakes = (jax.lax.stop_gradient(aux.pop("fake_img")),
                     jax.lax.stop_gradient(aux.pop("fake_lab")))
            return (gsum, g_i2l_c, g_l2i_c, d_img_c, d_lab_c,
                    jax.tree.map(jnp.add, msum, aux)), fakes

        g_metric0 = {k: fsum() for k in
                     ("g_adv", "g_cycle_img", "g_cycle_lab", "g_sup",
                      "g_total")}
        init_g = (zeros_of(g_p0), state.g_i2l, state.g_l2i, state.d_img,
                  state.d_lab, g_metric0)
        (gsum, g_i2l_c, g_l2i_c, d_img_in, d_lab_in, g_msum), fakes = \
            jax.lax.scan(g_micro, init_g, (batches, oh_all, dkeys))
        fake_imgs, fake_labs = fakes                       # (K, B, H, W, C)
        g_updates, g_opt = self.g_tx.update(
            jax.tree.map(lambda x: x / K, gsum), state.g_opt, g_p0)
        g_i2l, g_l2i = optax.apply_updates(g_p0, g_updates)
        if "batch_stats" in g_i2l_c:
            g_i2l = {**g_i2l, "batch_stats": g_i2l_c["batch_stats"]}
        if "batch_stats" in g_l2i_c:
            g_l2i = {**g_l2i, "batch_stats": g_l2i_c["batch_stats"]}

        # --- Pool phase: K sequential per-microbatch queries.
        if self.cfg.pool_size > 0:
            def pool_micro(pools, xs):
                p_img, p_lab = pools
                f_img, f_lab, ks = xs
                p_img, out_img = pool_query(p_img, f_img, ks[0])
                p_lab, out_lab = pool_query(p_lab, f_lab, ks[1])
                return (p_img, p_lab), (out_img, out_lab)

            (pool_img, pool_lab), (pooled_imgs, pooled_labs) = jax.lax.scan(
                pool_micro, (state.pool_img, state.pool_lab),
                (fake_imgs, fake_labs, pkeys))
        else:
            pool_img, pool_lab = state.pool_img, state.pool_lab
            pooled_imgs, pooled_labs = fake_imgs, fake_labs

        # --- D phase: starts from the G-phase-updated D running stats.
        d_p0 = (d_img_in, d_lab_in)

        def d_micro(carry, xs):
            dsum, d_img_c, d_lab_c, msum = carry
            batch_i, oh_i, pf_img, pf_lab = xs
            (_, daux), grads = jax.value_and_grad(self._d_loss, has_aux=True)(
                (d_img_c, d_lab_c), batch_i, oh_i, pf_img, pf_lab)
            dsum = jax.tree.map(jnp.add, dsum, grads)
            d_bn = daux.pop("bn")
            if "d_img" in d_bn:
                d_img_c = {**d_img_c, "batch_stats": d_bn["d_img"]}
            if "d_lab" in d_bn:
                d_lab_c = {**d_lab_c, "batch_stats": d_bn["d_lab"]}
            return (dsum, d_img_c, d_lab_c,
                    jax.tree.map(jnp.add, msum, daux)), None

        d_metric0 = {k: fsum() for k in ("d_img", "d_lab", "d_total")}
        init_d = (zeros_of(d_p0), d_img_in, d_lab_in, d_metric0)
        (dsum, d_img_c, d_lab_c, d_msum), _ = jax.lax.scan(
            d_micro, init_d, (batches, oh_all, pooled_imgs, pooled_labs))
        d_updates, d_opt = self.d_tx.update(
            jax.tree.map(lambda x: x / K, dsum), state.d_opt, d_p0)
        d_img_p, d_lab_p = optax.apply_updates(d_p0, d_updates)
        if "batch_stats" in d_img_c:
            d_img_p = {**d_img_p, "batch_stats": d_img_c["batch_stats"]}
        if "batch_stats" in d_lab_c:
            d_lab_p = {**d_lab_p, "batch_stats": d_lab_c["batch_stats"]}

        new_state = CycleGANState(
            g_i2l=g_i2l, g_l2i=g_l2i, d_img=d_img_p, d_lab=d_lab_p,
            g_opt=g_opt, d_opt=d_opt, pool_img=pool_img, pool_lab=pool_lab,
            rng=rng, step=state.step + 1)
        return new_state, {k: v / K for k, v in
                           {**g_msum, **d_msum}.items()}

    def logits(self, g_i2l_params: Any, image: jax.Array) -> jax.Array:
        """Raw class logits of the i2l generator (tiled eval hooks here)."""
        return self.G_i2l.apply(g_i2l_params, image)

    def eval_step(self, g_i2l_params: Any, batch: dict) -> jax.Array:
        pred = jnp.argmax(self.logits(g_i2l_params, batch["image"]), axis=-1)
        return metrics.confusion_matrix(
            pred, batch["label"], self.num_classes, ignore_index=self.ignore_index)

    def predict(self, g_i2l_params: Any, image: jax.Array) -> jax.Array:
        return jnp.argmax(self.logits(g_i2l_params, image), axis=-1)

    def generate_image(self, g_l2i_params: Any, labels: jax.Array) -> jax.Array:
        """label map -> synthesized image (sample-dump path, SURVEY.md §3a)."""
        return self.G_l2i.apply(g_l2i_params, self._onehot(labels))
