"""Pallas weight-grad kernel for trunk 3x3 convs (kernels/conv_dw.py):
values must match the XLA conv VJP (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.kernels.conv_dw import conv_dw, supported
from cyclegan_tpu.ops import functional as F


def test_dw_matches_xla_vjp():
    rng = np.random.default_rng(0)
    n, h, w_, c = 2, 8, 8, 128
    xp = jnp.asarray(rng.normal(size=(n, h + 2, w_ + 2, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
    dy = jnp.asarray(rng.normal(size=(n, h, w_, c)), jnp.float32)

    def f(xp, w):
        return jnp.sum(F.conv2d(xp, w, None, stride=1, padding=0) * dy)

    want_dxp, want_dw = jax.grad(f, argnums=(0, 1))(xp, w)
    got_dw = conv_dw(xp, dy, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw),
                               rtol=1e-4, atol=1e-4)


def test_custom_vjp_full_chain():
    rng = np.random.default_rng(1)
    n, h, w_, c = 1, 6, 6, 128
    x = jnp.asarray(rng.normal(size=(n, h, w_, c)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)

    def ref(x, w):
        return jnp.sum(jnp.sin(F.conv2d(F.reflect_pad(x, 1), w, None)))

    def fused(x, w):
        return jnp.sum(jnp.sin(F.conv2d_valid_dw_fused(F.reflect_pad(x, 1), w)))

    y_r = ref(x, w)
    y_f = fused(x, w)
    np.testing.assert_allclose(float(y_f), float(y_r), rtol=1e-5)
    g_r = jax.grad(ref, argnums=(0, 1))(x, w)
    g_f = jax.grad(fused, argnums=(0, 1))(x, w)
    for a, e in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gates():
    assert supported((1, 66, 66, 256), (1, 64, 64, 256), 2)      # 256-trunk bf16
    assert not supported((1, 66, 66, 64), (1, 64, 64, 64), 2)    # small C
    assert not supported((1, 258, 258, 256), (1, 256, 256, 256), 2)  # VMEM
