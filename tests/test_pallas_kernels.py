"""Pallas fused instance-norm kernel vs the XLA reference path (interpret
mode on CPU; the same kernel compiles on TPU). Checks forward values and the
custom-VJP gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.kernels.instance_norm import instance_norm_act, supported_shape
from cyclegan_tpu.ops import functional as F


def ref_norm_act(x, act, skip=None):
    y = F.instance_norm(x)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "leaky":
        y = F.leaky_relu(y, 0.2)
    return y if skip is None else y + skip


@pytest.mark.parametrize("act", ["none", "relu", "leaky"])
class TestForward:
    def test_matches_xla(self, act):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16)) * 3 + 1
        got = instance_norm_act(x, None, 1e-5, act, True)
        ref = ref_norm_act(x, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_with_skip(self, act):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(k1, (2, 4, 4, 8))
        s = jax.random.normal(k2, (2, 4, 4, 8))
        got = instance_norm_act(x, s, 1e-5, act, True)
        ref = ref_norm_act(x, act, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("act", ["none", "relu", "leaky"])
class TestGrad:
    def test_dx_matches_xla(self, act):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 8)) * 2

        def f_pallas(x):
            return jnp.sum(jnp.sin(instance_norm_act(x, None, 1e-5, act, True)))

        def f_ref(x):
            return jnp.sum(jnp.sin(ref_norm_act(x, act)))

        g_pallas = jax.grad(f_pallas)(x)
        g_ref = jax.grad(f_ref)(x)
        np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                                   atol=1e-4)

    def test_dskip_passthrough(self, act):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (1, 4, 4, 8))
        s = jax.random.normal(k2, (1, 4, 4, 8))

        def f(s):
            return jnp.sum(instance_norm_act(x, s, 1e-5, act, True) * 2.0)

        g = jax.grad(f)(s)
        np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones_like(g), atol=1e-6)


class TestSupportedShape:
    def test_small_ok(self):
        assert supported_shape((1, 64, 64, 256), 4)

    def test_huge_spatial_falls_back(self):
        # 1024x1024x64 fp32 = 256 MB per channel-tile-64 — cannot tile.
        assert not supported_shape((1, 1024, 1024, 64), 4)

    def test_non_4d(self):
        assert not supported_shape((64, 64), 4)


class TestBlockIntegration:
    def test_convblock_interpret_matches_off(self, monkeypatch):
        """ConvBlock with the kernel enabled (interpret) == kernel disabled."""
        from cyclegan_tpu.ops.blocks import ConvBlock

        x = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 10, 4))
        blk = ConvBlock(8, kernel=3, pad=1, pad_mode="reflect",
                        norm="instance", act="relu")
        params = blk.init(jax.random.PRNGKey(5), x)
        monkeypatch.setenv("CYCLEGAN_TPU_PALLAS", "off")
        ref = blk.apply(params, x)
        monkeypatch.setenv("CYCLEGAN_TPU_PALLAS", "interpret")
        got = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_resblock_skip_fusion_matches(self, monkeypatch):
        from cyclegan_tpu.ops.blocks import ResidualBlock

        x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 8))
        blk = ResidualBlock(8, norm="instance")
        params = blk.init(jax.random.PRNGKey(7), x)
        monkeypatch.setenv("CYCLEGAN_TPU_PALLAS", "off")
        ref = blk.apply(params, x)
        monkeypatch.setenv("CYCLEGAN_TPU_PALLAS", "interpret")
        got = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
