"""Weight initializers matching the reference's ``init_weights`` semantics.

The reference initializes Conv/ConvTranspose weights from N(0, 0.02), norm
scales from N(1, 0.02) and all biases to zero (SURVEY.md §2 "weight init
(normal, std 0.02)"). The reference's ``init_network`` additionally did
``.cuda()`` + ``nn.DataParallel`` — device placement is intentionally NOT done
here: on TPU, sharding is external to the model (SURVEY.md §1 TPU-native
mapping, L2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_kernel_init(std: float = 0.02):
    """N(0, std) initializer for conv kernels (any layout)."""

    def init(key: jax.Array, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def norm_scale_init(std: float = 0.02):
    """N(1, std) initializer for affine norm scales (batch-norm option)."""

    def init(key: jax.Array, shape, dtype=jnp.float32):
        return 1.0 + std * jax.random.normal(key, shape, dtype)

    return init
