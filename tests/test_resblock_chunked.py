"""Chunked ResidualBlock kernel (kernels/resblock_chunked.py — the round-3
megakernel candidate, VERDICT r2 item 1): interpret-mode numerics vs the XLA
composition, forward and backward, including the halo/fold edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cyclegan_tpu.kernels.resblock import residual_block_reference
from cyclegan_tpu.kernels.resblock_chunked import (
    residual_block_chunked, residual_block_chunked_fwd)


def _mk(n, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return (f(n, h, w, c), f(3, 3, c, c) * 0.1, f(c) * 0.1,
            f(3, 3, c, c) * 0.1, f(c) * 0.1)


@pytest.mark.parametrize("shape,hc", [
    ((1, 8, 8, 8), 4),     # 2 chunks
    ((2, 16, 8, 8), 4),    # batch > 1, 4 chunks
    ((1, 12, 16, 8), 6),   # W != H
    ((1, 8, 8, 8), 8),     # single chunk (both folds in one chunk)
])
def test_forward_matches_reference(shape, hc):
    x, w1, b1, w2, b2 = _mk(*shape)
    y, vhat, stats = residual_block_chunked_fwd(
        x, w1, b1, w2, b2, hc=hc, interpret=True)
    ref = residual_block_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # vhat residual = IN1(conv1(pad(x)))
    from cyclegan_tpu.ops import functional as F

    u = F.conv2d(F.reflect_pad(x, 1), w1, b1)
    vr = F.instance_norm(u, eps=1e-5)
    np.testing.assert_allclose(np.asarray(vhat), np.asarray(vr),
                               rtol=1e-4, atol=1e-5)
    assert stats.shape == (shape[0], 4, shape[3])


@pytest.mark.parametrize("shape,hc", [
    ((1, 8, 8, 8), 4),
    ((2, 16, 8, 8), 4),
    ((1, 12, 16, 8), 6),
])
def test_backward_matches_autodiff(shape, hc):
    x, w1, b1, w2, b2 = _mk(*shape, seed=1)
    rng = np.random.default_rng(2)
    dy = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss_k(args):
        return jnp.vdot(residual_block_chunked(*args, 1e-5, hc, True), dy)

    def loss_r(args):
        return jnp.vdot(residual_block_reference(*args), dy)

    gk = jax.grad(loss_k)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_r)((x, w1, b1, w2, b2))
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gk, gr):
        if name in ("db1", "db2"):
            # pre-IN bias cancels: kernel returns exact zeros, autodiff ~0
            assert float(jnp.abs(a).max()) == 0.0
            np.testing.assert_allclose(np.asarray(b), 0, atol=1e-4)
            continue
        denom = float(jnp.abs(b).max()) + 1e-8
        rel = float(jnp.abs(a - b).max()) / denom
        assert rel < 1e-5, f"{name} diverged: max-rel {rel}"
