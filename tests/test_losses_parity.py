"""Loss/optimizer/schedule parity vs torch (SURVEY.md §4 "Loss/optimizer
parity")."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from cyclegan_tpu.train import losses, schedule

ATOL = 1e-5


def rand(shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


class TestLosses:
    def test_lsgan_real_fake(self):
        x = rand((2, 14, 14, 1), seed=0)
        ref_real = tF.mse_loss(x, torch.ones_like(x)).item()
        ref_fake = tF.mse_loss(x, torch.zeros_like(x)).item()
        xj = jnp.asarray(x.numpy())
        assert abs(float(losses.lsgan_loss(xj, True)) - ref_real) < ATOL
        assert abs(float(losses.lsgan_loss(xj, False)) - ref_fake) < ATOL

    def test_l1(self):
        a, b = rand((2, 8, 8, 3), 1), rand((2, 8, 8, 3), 2)
        ref = tF.l1_loss(a, b).item()
        got = float(losses.l1_loss(jnp.asarray(a.numpy()), jnp.asarray(b.numpy())))
        assert abs(got - ref) < ATOL

    def test_cross_entropy_with_ignore(self):
        g = torch.Generator().manual_seed(3)
        logits = torch.randn(2, 21, 16, 16, generator=g)  # NCHW
        labels = torch.randint(0, 21, (2, 16, 16), generator=g)
        labels[0, :4, :4] = 255
        ref = tF.cross_entropy(logits, labels, ignore_index=255).item()
        got = float(losses.cross_entropy_loss(
            jnp.asarray(logits.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(labels.numpy()), ignore_index=255))
        assert abs(got - ref) < 1e-4

    def test_cross_entropy_no_ignore(self):
        g = torch.Generator().manual_seed(4)
        logits = torch.randn(2, 4, 8, 8, generator=g)
        labels = torch.randint(0, 4, (2, 8, 8), generator=g)
        ref = tF.cross_entropy(logits, labels).item()
        got = float(losses.cross_entropy_loss(
            jnp.asarray(logits.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(labels.numpy()), ignore_index=None))
        assert abs(got - ref) < 1e-4


class TestLambdaLR:
    def test_factor_table_matches_reference_formula(self):
        """Reference: 1 - max(0, e + offset - decay) / (epochs - decay)."""
        epochs, decay = 200, 100
        for e in [0, 50, 99, 100, 150, 199]:
            expected = 1.0 - max(0, e + 0 - decay) / (epochs - decay)
            got = float(schedule.lambda_lr_factor(
                e, epochs=epochs, offset=0, decay_epoch=decay))
            assert abs(got - expected) < 1e-6, e

    def test_step_schedule_staircase(self):
        sched = schedule.make_lambda_lr(2e-4, epochs=4, decay_epoch=2,
                                        steps_per_epoch=10)
        tol = 1e-10
        assert abs(float(sched(0)) - 2e-4) < tol
        assert abs(float(sched(19)) - 2e-4) < tol         # epoch 1 constant
        assert abs(float(sched(25)) - 2e-4 * 1.0) < tol   # epoch 2: 1 - 0/2
        assert abs(float(sched(35)) - 2e-4 * 0.5) < tol   # epoch 3: 1 - 1/2


class TestAdamParity:
    def test_one_adam_step_matches_torch(self):
        """Same grads + params through optax chain and torch.optim.Adam."""
        import optax

        w0 = rand((8, 8), seed=5)
        grad = rand((8, 8), seed=6)
        lr, betas = 2e-4, (0.5, 0.999)

        wt = w0.clone().requires_grad_(True)
        opt = torch.optim.Adam([wt], lr=lr, betas=betas)
        wt.grad = grad.clone()
        for _ in range(3):
            opt.step()

        tx = schedule.make_adam(lambda _: lr, b1=betas[0], b2=betas[1])
        params = jnp.asarray(w0.numpy())
        state = tx.init(params)
        g = jnp.asarray(grad.numpy())
        for _ in range(3):
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(),
                                   atol=1e-6)


def test_ce_onehot_and_gather_variants_identical(monkeypatch):
    """The TPU-optimized one-hot CE and the gather form (CYCLEGAN_TPU_CE=
    gather) are the same function."""
    import numpy as np

    from cyclegan_tpu.train.losses import cross_entropy_loss

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 21)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 21, size=(2, 8, 8)))
    labels = labels.at[0, 0, 0].set(255)  # ignore pixel
    a = float(cross_entropy_loss(logits, labels))
    monkeypatch.setenv("CYCLEGAN_TPU_CE", "gather")
    b = float(cross_entropy_loss(logits, labels))
    np.testing.assert_allclose(a, b, rtol=1e-6)
