"""NN op blocks (reference layer L1 — SURVEY.md §1, `arch/ops.py` equivalents).

Functional primitives live in :mod:`cyclegan_tpu.ops.functional`; Flax modules
wrapping them live in :mod:`cyclegan_tpu.ops.blocks`. The functional layer is the
seam where Pallas fused kernels are swapped in (``cyclegan_tpu.kernels``).
"""

from cyclegan_tpu.ops.functional import (
    conv2d,
    conv2d_transpose,
    instance_norm,
    reflect_pad,
)
from cyclegan_tpu.ops.blocks import (
    ConvBlock,
    DeconvBlock,
    InstanceNorm,
    ResidualBlock,
    get_norm,
)
from cyclegan_tpu.ops.init import conv_kernel_init, norm_scale_init

__all__ = [
    "conv2d",
    "conv2d_transpose",
    "instance_norm",
    "reflect_pad",
    "ConvBlock",
    "DeconvBlock",
    "InstanceNorm",
    "ResidualBlock",
    "get_norm",
    "conv_kernel_init",
    "norm_scale_init",
]
