"""Pallas TPU kernels for the hot fused blocks (SURVEY.md §2 TPU-native
mapping: "reflect-pad conv, instance-norm, transposed-conv fused as Pallas
kernels").

The convolutions themselves are left to XLA (they map straight onto the MXU);
what XLA does *not* fuse well is the instance-norm's two-pass reduction over
the conv output — it materializes the activation to HBM, reads it for the
stats reduction, then reads it again for the normalize. The Pallas kernel
here does stats + normalize + activation (+ residual add) in ONE HBM
round-trip per direction, with a custom VJP whose backward is also a single
fused pass.
"""

from cyclegan_tpu.kernels.instance_norm import instance_norm_act

__all__ = ["instance_norm_act"]
