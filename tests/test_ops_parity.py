"""Torch-CPU parity tests for the functional ops layer (SURVEY.md §4 "Unit").

Same weights injected into both frameworks; outputs asserted close in fp32.
Layout bridge: torch NCHW/OIHW <-> jax NHWC/HWIO.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

from cyclegan_tpu.ops import functional as F

ATOL = 2e-5


def t2j_act(x: torch.Tensor) -> jnp.ndarray:
    """NCHW torch tensor -> NHWC jax array."""
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2n_act(x: jnp.ndarray) -> np.ndarray:
    """NHWC jax array -> NCHW numpy."""
    return np.asarray(x).transpose(0, 3, 1, 2)


def rand(shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


class TestReflectPad:
    @pytest.mark.parametrize("pad", [1, 3])
    def test_matches_torch(self, pad):
        x = rand((2, 3, 8, 8))
        ref = tF.pad(x, (pad,) * 4, mode="reflect")
        got = F.reflect_pad(t2j_act(x), pad)
        np.testing.assert_allclose(j2n_act(got), ref.numpy(), atol=ATOL)


class TestConv2d:
    @pytest.mark.parametrize("k,s,p", [(7, 1, 0), (3, 2, 1), (4, 2, 1), (4, 1, 1), (1, 1, 0)])
    def test_matches_torch(self, k, s, p):
        x = rand((2, 3, 16, 16), seed=1)
        w = rand((5, 3, k, k), seed=2) * 0.1  # OIHW
        b = rand((5,), seed=3)
        ref = tF.conv2d(x, w, b, stride=s, padding=p)
        w_j = jnp.asarray(w.numpy().transpose(2, 3, 1, 0))  # OIHW -> HWIO
        got = F.conv2d(t2j_act(x), w_j, jnp.asarray(b.numpy()), stride=s, padding=p)
        np.testing.assert_allclose(j2n_act(got), ref.numpy(), atol=ATOL)


class TestConvTranspose:
    @pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0)])
    def test_matches_torch(self, k, s, p, op):
        x = rand((2, 6, 8, 8), seed=4)
        w = rand((6, 4, k, k), seed=5) * 0.1  # torch convtranspose: (I, O, kH, kW)
        b = rand((4,), seed=6)
        ref = tF.conv_transpose2d(x, w, b, stride=s, padding=p, output_padding=op)
        # (I, O, kH, kW) -> HWIO with I = input channels
        w_j = jnp.asarray(w.numpy().transpose(2, 3, 0, 1))
        got = F.conv2d_transpose(
            t2j_act(x), w_j, jnp.asarray(b.numpy()),
            stride=s, padding=p, output_padding=op,
        )
        assert got.shape[1] == ref.shape[2] and got.shape[2] == ref.shape[3]
        np.testing.assert_allclose(j2n_act(got), ref.numpy(), atol=ATOL)


class TestInstanceNorm:
    def test_matches_torch_no_affine(self):
        x = rand((2, 4, 8, 8), seed=7)
        ref = tF.instance_norm(x, eps=1e-5)
        got = F.instance_norm(t2j_act(x))
        np.testing.assert_allclose(j2n_act(got), ref.numpy(), atol=ATOL)

    def test_matches_torch_affine(self):
        x = rand((2, 4, 8, 8), seed=8)
        scale = rand((4,), seed=9)
        bias = rand((4,), seed=10)
        ref = tF.instance_norm(x, weight=scale, bias=bias, eps=1e-5)
        got = F.instance_norm(
            t2j_act(x), jnp.asarray(scale.numpy()), jnp.asarray(bias.numpy())
        )
        np.testing.assert_allclose(j2n_act(got), ref.numpy(), atol=ATOL)


class TestLeakyRelu:
    def test_matches_torch(self):
        x = rand((2, 3, 4, 4), seed=11)
        ref = tF.leaky_relu(x, 0.2)
        got = F.leaky_relu(t2j_act(x), 0.2)
        np.testing.assert_allclose(j2n_act(got), ref.numpy(), atol=ATOL)
