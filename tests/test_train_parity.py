"""Multi-step training-loop parity vs torch (SURVEY.md §4 "Integration" /
the [B] 'match the reference bit-for-bit on fixed seeds' requirement):
identical weights + identical pre-materialized batches through BOTH full
semi-sup CycleGAN train loops (jax jitted step vs torch-CPU reference
semantics), comparing per-step losses and final params.

Pool replay is bypassed on both sides (pool_size=0 / no pool in the torch
step) so the trajectories are RNG-free and deterministic.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parity_utils import make_cyclegan_pair, make_fixed_batch  # noqa: E402

from tools.torch_reference import train_step as torch_step  # noqa: E402

N_CLASSES, SIZE, NGF, NDF, NB = 5, 32, 8, 8, 2
STEPS = 3

# cfg knobs shared by every leg in this file (LR schedule far from its
# decay region so the 3–30-step trajectories see a constant LR).
PAIR_KW = dict(n_classes=N_CLASSES, size=SIZE, ngf=NGF, ndf=NDF,
               n_blocks=NB, pool_size=0, epochs=200, decay_epoch=100,
               steps_per_epoch=1000)


def test_three_step_cyclegan_parity():
    tmodels, t_opts, trainer, state = make_cyclegan_pair(**PAIR_KW)
    (lab_img_t, lab_lab_t, unlab_img_t, lab_oh_t), batch = \
        make_fixed_batch(N_CLASSES, SIZE)
    step_jit = jax.jit(trainer.train_step, donate_argnums=0)

    for s in range(STEPS):
        state, m = step_jit(state, batch)
        torch_step(tmodels, t_opts,
                   (lab_img_t, lab_lab_t, unlab_img_t, lab_oh_t))

    # Compare a forward pass of the trained G_i2l on the labeled image.
    with torch.no_grad():
        ref_logits = tmodels[0](lab_img_t).numpy()
    got_logits = np.asarray(
        trainer.G_i2l.apply(state.g_i2l, batch["lab_image"])
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_logits, ref_logits, atol=2e-3)

    # And the discriminator on the real image.
    with torch.no_grad():
        ref_d = tmodels[2](unlab_img_t).numpy()
    got_d = np.asarray(
        trainer.D_img.apply(state.d_img, batch["unlab_image"])
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_d, ref_d, atol=2e-3)


def test_thirty_step_curve_parity():
    """Long-horizon G-loss CURVE parity in CI (VERDICT r3 item 2 — the
    strongest semantic guarantee used to live only in the manual
    tools/cyclegan_parity_run.py re-run): 30 alternating steps, per-step
    G-loss trajectories within the measured f32 envelope (the 50-step tool
    run measures mean 0.31% / max 1.4%), plus final-forward closeness."""
    tmodels, t_opts, trainer, state = make_cyclegan_pair(**PAIR_KW)
    (lab_img_t, lab_lab_t, unlab_img_t, lab_oh_t), batch = \
        make_fixed_batch(N_CLASSES, SIZE)
    step_jit = jax.jit(trainer.train_step, donate_argnums=0)

    j_curve, t_curve = [], []
    for _ in range(30):
        state, m = step_jit(state, batch)
        j_curve.append(float(m["g_total"]))
        tm = torch_step(tmodels, t_opts,
                        (lab_img_t, lab_lab_t, unlab_img_t, lab_oh_t))
        # torch step metrics are computed during the update from pre-update
        # params — same convention as the jax metrics dict.
        t_curve.append(tm["g_total"])

    j, t = np.array(j_curve), np.array(t_curve)
    rel = np.abs(j - t) / np.maximum(np.abs(t), 1e-6)
    assert rel.mean() < 0.01, (rel.mean(), list(rel))
    assert rel.max() < 0.02, (rel.max(), list(rel))

    # After 30 chaotic GAN steps elementwise logit closeness is not a
    # meaningful pin (f32 noise amplifies exponentially; the 3-step test
    # above owns the tight-forward guarantee). What must survive is the
    # PREDICTION: both trained segmenters label the same pixels the same
    # way (the tool's mIoU-delta certification, in-suite).
    with torch.no_grad():
        ref_pred = tmodels[0](lab_img_t).argmax(1).numpy()
    got_pred = np.asarray(jnp.argmax(
        trainer.G_i2l.apply(state.g_i2l, batch["lab_image"]), -1))
    # Measured 0.915 (the input is pure noise, so logits are near-uniform
    # and argmax flips on tiny drift; a semantic break drops this to ~1/N
    # ≈ 0.2). Protocol-scale certification is the tool's mIoU delta.
    agreement = (got_pred == ref_pred).mean()
    assert agreement > 0.85, f"argmax agreement {agreement:.3f}"


@pytest.mark.parametrize("leg", ["acdc", "unet_pixel", "batch_norm"])
def test_three_step_parity_config_legs(leg):
    """3-step trajectory parity for the non-flagship config families
    (tools/cyclegan_parity_run.py owns the 50-step versions):

    - acdc: 1-channel grayscale images, 4 classes (SURVEY.md §2 data row,
      the ACDC cardiac-MRI config [B config 4]).
    - unet_pixel: UnetGenerator + PixelDiscriminator zoo pairing
      (SURVEY.md §2 generator/discriminator rows).
    - batch_norm: norm='batch' end-to-end — BatchNorm EMAs recorded during
      the G phase's D forwards and threaded into the D phase (the
      full-step stat parity lives in test_batchnorm_parity.py; this pins
      the multi-step TRAJECTORY).
    """
    n_classes, ch = (4, 1) if leg == "acdc" else (N_CLASSES, 3)
    tmodels, t_opts, trainer, state = make_cyclegan_pair(
        **{**PAIR_KW, "n_classes": n_classes},
        channels=ch,
        gen_net="unet" if leg == "unet_pixel" else "resnet",
        dis_net="pixel" if leg == "unet_pixel" else "patch",
        norm="batch" if leg == "batch_norm" else "instance")
    (lab_img_t, lab_lab_t, unlab_img_t, lab_oh_t), batch = \
        make_fixed_batch(n_classes, SIZE, channels=ch)
    step_jit = jax.jit(trainer.train_step, donate_argnums=0)

    for _ in range(STEPS):
        state, m = step_jit(state, batch)
        tm = torch_step(tmodels, t_opts,
                        (lab_img_t, lab_lab_t, unlab_img_t, lab_oh_t))
        # Per-step loss parity (pre-update convention on both sides).
        np.testing.assert_allclose(float(m["g_total"]), tm["g_total"],
                                   rtol=2e-3)
        np.testing.assert_allclose(float(m["d_total"]), tm["d_total"],
                                   rtol=1e-2, atol=1e-3)

    # Final forward of the trained segmenter (eval mode on both sides —
    # under norm=batch this also exercises the trained running stats).
    tmodels[0].eval()
    with torch.no_grad():
        ref_logits = tmodels[0](lab_img_t).numpy()
    got_logits = np.asarray(
        trainer.G_i2l.apply(state.g_i2l, batch["lab_image"])
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_logits, ref_logits, atol=5e-3)
