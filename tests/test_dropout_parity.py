"""Dropout cross-framework parity (VERDICT r3 item 4 / SURVEY.md §2
generator row ``use_dropout``).

torch's convention is INVERTED dropout: at train time keep-mask ~
Bernoulli(1-p), kept values scaled by 1/(1-p), eval is identity. A flax
convention mismatch (e.g. eval-time scaling) would silently skew every
``--use_dropout`` run. Three proof layers:

1. CONVENTION pin, both frameworks: train-mode nonzeros == x/(1-p),
   eval == identity.
2. ResBlock forward+grad with an INJECTED mask: the flax block's dropout
   mask (recovered via capture_intermediates) applied in a torch mirror
   block gives identical outputs and input-gradients.
3. U-Net middle level (where the reference places dropout): same injected-
   mask equality through the lrelu/conv/IN -> submodule -> relu/deconv/IN
   -> dropout -> concat chain.

Torch-mirror pitfall (found building this test, round 4): this image's
torch build (2.13.0+cpu) computes WRONG ``nn.InstanceNorm2d``/
``F.instance_norm`` input-gradients when the incoming cotangent
(grad_output) is NON-CONTIGUOUS — e.g. a ``from_numpy(arr.transpose(...))``
view flowing backward (verified: module grad diverges 4.7 from both the
manual (h-mu)/sqrt(var+eps) autograd AND f64 finite differences; contiguous
cotangents agree to 1e-15). Every numpy->torch transpose here goes through
``np.ascontiguousarray``. The parity oracles are unaffected (their IN
cotangents come from conv/relu backwards, which are contiguous) — the
50-step trajectory parity would have caught it otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from cyclegan_tpu.models.generators import _UnetBlock
from cyclegan_tpu.ops.blocks import ResidualBlock

P = 0.5


def test_dropout_convention_pinned_both_frameworks():
    x = np.random.default_rng(0).standard_normal((2, 8, 8, 4)).astype(np.float32)

    # torch: inverted scaling at train, identity at eval.
    xt = torch.from_numpy(x)
    yt = tF.dropout(xt, P, training=True)
    kept = yt != 0
    np.testing.assert_allclose(yt[kept].numpy(),
                               (xt[kept] / (1 - P)).numpy(), rtol=1e-6)
    assert 0.2 < kept.float().mean().item() < 0.8
    np.testing.assert_array_equal(
        tF.dropout(xt, P, training=False).numpy(), x)

    # flax: the same convention.
    import flax.linen as nn
    drop = nn.Dropout(rate=P)
    yj = drop.apply({}, jnp.asarray(x), deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    yj = np.asarray(yj)
    kept = yj != 0
    np.testing.assert_allclose(yj[kept], x[kept] / (1 - P), rtol=1e-6)
    assert 0.2 < kept.mean() < 0.8
    np.testing.assert_array_equal(
        np.asarray(drop.apply({}, jnp.asarray(x), deterministic=True)), x)


class _FixedMask(torch.nn.Module):
    """torch inverted-dropout with an injected keep-mask (NCHW)."""

    def __init__(self, mask_nchw: torch.Tensor):
        super().__init__()
        self.mask = mask_nchw

    def forward(self, x):
        return x * self.mask / (1 - P)


def _recover_mask(intermediates) -> np.ndarray:
    """The flax Dropout layer's keep-mask from captured intermediates
    (its output is input*mask/(1-p)).

    Positions where the dropout INPUT is exactly 0 (about half the entries
    when the input is post-ReLU, as in the ResBlock) are unrecoverable from
    the output — and irrelevant: the forward is 0 under either mask value,
    and the cotangent reaching such a position is killed by the ReLU
    backward (output 0 ⇒ pre-activation ≤ 0 ⇒ dReLU = 0) in both
    frameworks, so the torch mirror may use any value there. They are
    reported as dropped; keep-rate sanity checks must therefore be taken
    over the nonzero-INPUT positions only (see the call sites)."""
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    outs = [v for path, v in flat if "Dropout_0" in str(path)]
    assert len(outs) == 1, [str(p) for p, _ in flat]
    return np.asarray(outs[0] != 0)


def test_resblock_dropout_injected_mask_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8, 8, 6)).astype(np.float32)

    block = ResidualBlock(features=6, use_dropout=True)
    params = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)},
        jnp.asarray(x), deterministic=False)
    key = jax.random.PRNGKey(7)
    out_f, inter = block.apply(
        params, jnp.asarray(x), deterministic=False,
        rngs={"dropout": key}, capture_intermediates=True,
        mutable=["intermediates"])
    mask = _recover_mask(inter["intermediates"])      # (1, H, W, C)

    # torch mirror with the flax weights and the SAME mask.
    w0 = np.asarray(params["params"]["ConvBlock_0"]["kernel"])
    b0 = np.asarray(params["params"]["ConvBlock_0"]["bias"])
    w1 = np.asarray(params["params"]["ConvBlock_1"]["kernel"])
    b1 = np.asarray(params["params"]["ConvBlock_1"]["bias"])
    conv0 = torch.nn.Conv2d(6, 6, 3)
    conv1 = torch.nn.Conv2d(6, 6, 3)
    with torch.no_grad():
        conv0.weight.copy_(torch.from_numpy(w0.transpose(3, 2, 0, 1)))
        conv0.bias.copy_(torch.from_numpy(b0))
        conv1.weight.copy_(torch.from_numpy(w1.transpose(3, 2, 0, 1)))
        conv1.bias.copy_(torch.from_numpy(b1))
    drop = _FixedMask(torch.from_numpy(np.ascontiguousarray(
        mask.transpose(0, 3, 1, 2).astype(np.float32))))
    inorm = torch.nn.InstanceNorm2d(6)

    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))).requires_grad_(True)
    h = torch.relu(inorm(conv0(tF.pad(xt, (1, 1, 1, 1), "reflect"))))
    # Keep-rate sanity over RECOVERABLE positions only: the dropout input
    # here is post-ReLU, so ~half the entries are exactly 0 and their mask
    # value is unknowable (and irrelevant — _recover_mask docstring).
    nz = h.detach().numpy().transpose(0, 2, 3, 1) != 0
    keep_rate = mask[nz].mean()
    assert 0.2 < keep_rate < 0.8, keep_rate
    h = drop(h)
    out_t = xt + inorm(conv1(tF.pad(h, (1, 1, 1, 1), "reflect")))

    np.testing.assert_allclose(
        np.asarray(out_f).transpose(0, 3, 1, 2),
        out_t.detach().numpy(), atol=2e-5)

    # Gradients w.r.t. the input flow through the masked path identically.
    def loss_f(xx):
        return jnp.sum(block.apply(params, xx, deterministic=False,
                                   rngs={"dropout": key}) ** 2)

    g_f = np.asarray(jax.grad(loss_f)(jnp.asarray(x)))
    (out_t ** 2).sum().backward()
    np.testing.assert_allclose(g_f.transpose(0, 3, 1, 2),
                               xt.grad.numpy(), atol=2e-4)


def test_unet_level_dropout_injected_mask_parity():
    """Middle U-Net block (the reference's dropout site): lrelu -> down-conv
    -> IN -> [innermost submodule] -> relu -> up-deconv -> IN -> dropout ->
    concat, vs a torch mirror fed the recovered mask."""
    rng = np.random.default_rng(5)
    C_OUT, C_IN = 4, 8
    x = rng.standard_normal((1, 8, 8, C_OUT)).astype(np.float32)

    inner = _UnetBlock(outer_nc=C_IN, inner_nc=C_IN, innermost=True)
    block = _UnetBlock(outer_nc=C_OUT, inner_nc=C_IN, submodule=inner,
                       use_dropout=True)
    params = block.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(9)},
        jnp.asarray(x), deterministic=False)
    key = jax.random.PRNGKey(11)
    out_f, inter = block.apply(
        params, jnp.asarray(x), deterministic=False,
        rngs={"dropout": key}, capture_intermediates=True,
        mutable=["intermediates"])
    mask = _recover_mask(inter["intermediates"])
    # Dropout input here is post-InstanceNorm (continuous, a.s. nonzero),
    # so the plain mean IS the keep rate — unlike the post-ReLU ResBlock.
    assert 0.2 < mask.mean() < 0.8

    p = params["params"]
    sub = p["submodule"]

    def t_conv(w_key, b_key, tree, transpose):
        w = np.asarray(tree[w_key])
        b = np.asarray(tree[b_key])
        wt = w.transpose(2, 3, 0, 1) if transpose else w.transpose(3, 2, 0, 1)
        return torch.from_numpy(wt.copy()), torch.from_numpy(b)

    down_w, down_b = t_conv("down_kernel", "down_bias", p, False)
    up_w, up_b = t_conv("up_kernel", "up_bias", p, True)
    sdown_w, sdown_b = t_conv("down_kernel", "down_bias", sub, False)
    sup_w, sup_b = t_conv("up_kernel", "up_bias", sub, True)
    inorm = torch.nn.InstanceNorm2d(C_IN)

    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))).requires_grad_(True)
    h = tF.conv2d(tF.leaky_relu(xt, 0.2), down_w, down_b,
                  stride=2, padding=1)
    h = inorm(h)
    # innermost submodule: lrelu -> conv -> relu -> deconv -> IN -> concat
    s = tF.conv2d(tF.leaky_relu(h, 0.2), sdown_w, sdown_b,
                  stride=2, padding=1)
    s = tF.conv_transpose2d(torch.relu(s), sup_w, sup_b,
                            stride=2, padding=1)
    s = torch.nn.InstanceNorm2d(C_IN)(s)
    h = torch.cat([h, s], 1)
    # back in the middle block: relu -> deconv -> IN -> dropout -> concat
    h = tF.conv_transpose2d(torch.relu(h), up_w, up_b,
                            stride=2, padding=1)
    h = torch.nn.InstanceNorm2d(C_OUT)(h)
    h = _FixedMask(torch.from_numpy(np.ascontiguousarray(
        mask.transpose(0, 3, 1, 2).astype(np.float32))))(h)
    out_t = torch.cat([xt, h], 1)

    np.testing.assert_allclose(
        np.asarray(out_f).transpose(0, 3, 1, 2),
        out_t.detach().numpy(), atol=2e-5)

    def loss_f(xx):
        return jnp.sum(block.apply(params, xx, deterministic=False,
                                   rngs={"dropout": key}) ** 2)

    g_f = np.asarray(jax.grad(loss_f)(jnp.asarray(x)))
    (out_t ** 2).sum().backward()
    np.testing.assert_allclose(g_f.transpose(0, 3, 1, 2),
                               xt.grad.numpy(), atol=2e-4)


def test_cli_use_dropout_smoke(tmp_path):
    """--use_dropout true drives the full CLI train loop (fresh dropout
    masks per forward inside the jitted step) without NaNs or shape breaks."""
    from cyclegan_tpu.main import main as cli_main

    cli_main(["--training", "--dataset", "synthetic", "--max_steps", "2",
              "--platform", "cpu", "--no_bf16", "--gen_net", "resnet_6blocks",
              "--ngf", "4", "--ndf", "4", "--crop_height", "16",
              "--crop_width", "16", "--batch_size", "2", "--pool_size", "2",
              "--use_dropout", "true", "--epochs", "2", "--decay_epoch", "1",
              "--num_devices", "1",
              "--results_dir", str(tmp_path / "res"),
              "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert (tmp_path / "ckpt").exists()
