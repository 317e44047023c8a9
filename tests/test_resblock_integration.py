"""Megakernel trunk integration: full generator forward + all-param grads
match the normal path (CYCLEGAN_TPU_RESBLOCK=interpret vs off)."""

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.models import define_Gen


def test_generator_with_megakernel_trunk(monkeypatch):
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    m = define_Gen(output_nc=4, ngf=8, netG="resnet_6blocks", head="none")
    params = m.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return jnp.sum(m.apply(p, x) ** 2)

    monkeypatch.setenv("CYCLEGAN_TPU_RESBLOCK", "off")
    ref_y = m.apply(params, x)
    ref_g = jax.grad(loss)(params)
    monkeypatch.setenv("CYCLEGAN_TPU_RESBLOCK", "interpret")
    got_y = m.apply(params, x)
    got_g = jax.grad(loss)(params)

    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), atol=2e-5)
    for a, b in zip(jax.tree.leaves(got_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_megakernel_skips_unsupported(monkeypatch):
    """Dropout / non-instance norm / channel-mismatch fall back cleanly."""
    monkeypatch.setenv("CYCLEGAN_TPU_RESBLOCK", "interpret")
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3))
    m = define_Gen(output_nc=4, ngf=8, netG="resnet_6blocks", head="none",
                   use_dropout=True)
    params = m.init({"params": jax.random.PRNGKey(3),
                     "dropout": jax.random.PRNGKey(4)}, x)
    y = m.apply(params, x)  # dropout blocks use the normal path
    assert y.shape == (1, 16, 16, 4)
