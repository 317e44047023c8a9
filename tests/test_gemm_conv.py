"""im2col-GEMM 7x7 conv path (round-2 TPU perf work, docs/KERNELS.md):
values and grads must match the reflect_pad + lax.conv path exactly (same
math, different association)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.ops import functional as F


def _ref(x, w, b):
    return F.conv2d(F.reflect_pad(x, (w.shape[0] - 1) // 2), w, b)


@pytest.mark.parametrize("k,cin,cout,hw", [
    (7, 3, 64, 32),    # G_l2i/G_i2l stem (image side)
    (7, 21, 64, 24),   # G_l2i stem (label side)
    (7, 64, 21, 24),   # G_i2l head
    (7, 64, 3, 24),    # G_l2i head
    (3, 8, 8, 16),     # generic odd kernel
])
def test_forward_matches_conv(k, cin, cout, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, k, cin, cout)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    got = F.conv2d_reflect_gemm(x, w, b)
    want = _ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 20, 20, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 5, 9)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.normal(size=(9,)), jnp.float32)

    def loss(fn, x, w, b):
        return jnp.sum(jnp.sin(fn(x, w, b)))

    g_got = jax.grad(lambda *a: loss(F.conv2d_reflect_gemm, *a),
                     argnums=(0, 1, 2))(x, w, b)
    g_want = jax.grad(lambda *a: loss(_ref, *a), argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=2e-5, atol=2e-5)


def test_convblock_routes_by_env(monkeypatch):
    """CYCLEGAN_TPU_CONV7=on forces the GEMM path anywhere; outputs match
    the default path."""
    from cyclegan_tpu.ops.blocks import ConvBlock

    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 16, 16, 3)),
                    jnp.float32)
    blk = ConvBlock(features=12, kernel=7, pad=3, pad_mode="reflect",
                    norm="instance", act="relu")
    params = blk.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CYCLEGAN_TPU_CONV7", "off")
    y_off = blk.apply(params, x)
    monkeypatch.setenv("CYCLEGAN_TPU_CONV7", "on")
    y_on = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               rtol=1e-5, atol=1e-5)
