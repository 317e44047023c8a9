"""ResidualBlock forward megakernel vs the XLA composition (interpret mode),
and vs the actual Flax ResidualBlock module."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.kernels.resblock import (
    residual_block_fused, residual_block_reference, supported)


def _params(key, c):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return (0.02 * jax.random.normal(k1, (3, 3, c, c)),
            0.01 * jax.random.normal(k2, (c,)),
            0.02 * jax.random.normal(k3, (3, 3, c, c)),
            0.01 * jax.random.normal(k4, (c,)))


def test_matches_xla_composition():
    c = 16
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 12, c))
    w1, b1, w2, b2 = _params(jax.random.PRNGKey(1), c)
    got = residual_block_fused(x, w1, b1, w2, b2, 1e-5, True)
    ref = residual_block_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_matches_flax_module():
    from cyclegan_tpu.ops.blocks import ResidualBlock

    c = 8
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 10, c))
    blk = ResidualBlock(c, norm="instance")
    params = blk.init(jax.random.PRNGKey(3), x)
    p = params["params"]
    got = residual_block_fused(
        x,
        p["ConvBlock_0"]["kernel"], p["ConvBlock_0"]["bias"],
        p["ConvBlock_1"]["kernel"], p["ConvBlock_1"]["bias"],
        1e-5, True)
    ref = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_bf16():
    c = 8
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, c)).astype(jnp.bfloat16)
    w1, b1, w2, b2 = [a.astype(jnp.bfloat16) for a in _params(jax.random.PRNGKey(5), c)]
    got = residual_block_fused(x, w1, b1, w2, b2, 1e-5, True)
    ref = residual_block_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.05)


def test_supported_shapes():
    # Calibrated on v5e: the 256-crop trunk plane (64,64,256) needs ~20 MB
    # of Mosaic stack and OOMs the 16 MB VMEM; the 128-crop trunk fits.
    assert supported((1, 32, 32, 256), 2)
    assert not supported((1, 64, 64, 256), 2)
    assert not supported((1, 256, 256, 64), 2)


def test_gradients_match_xla():
    """Custom-VJP Pallas backward vs jax autodiff of the XLA composition."""
    c = 16
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 12, 12, c))
    w1, b1, w2, b2 = _params(jax.random.PRNGKey(7), c)

    def loss_fused(x, w1, w2):
        return jnp.sum(jnp.sin(residual_block_fused(x, w1, b1, w2, b2, 1e-5, True)))

    def loss_ref(x, w1, w2):
        return jnp.sum(jnp.sin(residual_block_reference(x, w1, b1, w2, b2)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for a, b, name in zip(gf, gr, ("dx", "dw1", "dw2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=name)


def test_bias_grads_are_zero():
    """Per-channel bias before IN cancels -> exactly zero gradient."""
    c = 8
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, c))
    w1, b1, w2, b2 = _params(jax.random.PRNGKey(9), c)

    def loss_ref(b1, b2):
        return jnp.sum(residual_block_reference(x, w1, b1, w2, b2) ** 2)

    g1, g2 = jax.grad(loss_ref, argnums=(0, 1))(b1, b2)
    np.testing.assert_allclose(np.asarray(g1), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), 0, atol=1e-4)
