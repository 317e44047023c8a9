"""Flax modules for the reference's op blocks (SURVEY.md §2, `arch/ops.py`).

Equivalents of ``conv_norm_relu`` / ``dconv_norm_relu`` / ``ResidualBlock`` /
``get_norm_layer``, built on the NHWC functional primitives. Params are fp32;
``dtype`` selects the compute precision (bf16 on TPU for the MXU path).

There is no ``set_grad`` equivalent: freezing D during the G step is expressed
functionally (grads are taken only w.r.t. the G params pytree) — see
cyclegan_tpu/train/cyclegan.py.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cyclegan_tpu.ops import functional as F
from cyclegan_tpu.ops.init import conv_kernel_init

Dtype = Any


def _pallas_mode() -> str:
    """off (default) | auto (Pallas on TPU) | interpret (CI).

    Default is OFF because the A/B on real v5e hardware (2026-08-16, 256x256
    b1 full train step) measured 16.90 steps/s with XLA's fused
    reduce+normalize vs 8.51 steps/s with the Pallas kernel — the pallas_call
    materialization boundary costs more than the saved reduction read at these
    shapes. The kernel stays available for A/B and for shapes where it wins;
    see ROADMAP.md for the redesign notes.
    """
    return os.environ.get("CYCLEGAN_TPU_PALLAS", "off")


def _fence(env: str, batch: int) -> bool:
    """Shared optimization-barrier gate: auto (default) = on-TPU only, and
    only for small per-step batches (static shape). The space-to-batch conv
    pathology the fences fix is a small-batch phenomenon; at batch >= 8 the
    barriers instead block XLA's buffer reuse/remat and sent the 256² b32
    config 11.7 GB over HBM (measured OOM)."""
    mode = os.environ.get(env, "auto")
    if mode == "off":
        return False
    if mode == "on":
        return True
    if not isinstance(batch, int):
        # Symbolic batch (jax.export shape polymorphism): `batch <= 4` is
        # inconclusive, and a serving artifact must run at any batch —
        # take the plain XLA path.
        return False
    return (mode == "auto" and batch <= 4
            and jax.default_backend() == "tpu")


_pallas_self_check: bool | None = None


def _pallas_ok() -> bool:
    """One-time probe: compile + run the fused kernel on a tiny shape on the
    current backend. If the TPU toolchain rejects it, auto mode silently
    falls back to the XLA path instead of failing the whole program."""
    global _pallas_self_check
    if _pallas_self_check is None:

        def probe() -> bool:
            from cyclegan_tpu.kernels.instance_norm import instance_norm_act

            x = jnp.ones((1, 8, 8, 128), jnp.float32)
            y = jax.jit(
                lambda v: instance_norm_act(v, None, 1e-5, "relu", False))(x)
            jax.block_until_ready(y)
            return bool(jnp.isfinite(y).all())

        try:
            # The probe usually fires while an outer train step is being
            # traced; JAX trace state is thread-local, so a worker thread
            # gives a clean eager context to really compile + run the kernel.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as ex:
                _pallas_self_check = ex.submit(probe).result(timeout=1800)
        except Exception:
            _pallas_self_check = False
    return _pallas_self_check


def fused_norm_act(x: jax.Array, norm: str, act: str,
                   skip: jax.Array | None = None) -> jax.Array | None:
    """Try the fused Pallas instance-norm(+act)(+skip) kernel.

    Returns None when not applicable (non-instance norm, kernel disabled,
    wrong backend, or shape too large for VMEM tiling) — caller falls back to
    the unfused XLA path.
    """
    if norm != "instance":
        return None
    mode = _pallas_mode()
    if mode == "off":
        return None
    interpret = mode == "interpret"
    if not interpret and (jax.default_backend() != "tpu" or not _pallas_ok()):
        return None
    from cyclegan_tpu.kernels.instance_norm import (
        instance_norm_act, supported_shape)
    if not supported_shape(x.shape, x.dtype.itemsize):
        return None
    return instance_norm_act(x, skip, 1e-5, act, interpret)


class InstanceNorm(nn.Module):
    """InstanceNorm2d-equivalent (biased var, eps=1e-5, no running stats).

    ``affine=False`` by default to match the reference's
    ``get_norm_layer('instance')`` (SURVEY.md §2).
    """

    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = bias = None
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
        return F.instance_norm(x, scale, bias, eps=self.eps)


def get_norm(norm: str) -> Callable[[], Optional[nn.Module]]:
    """Norm-layer selector (reference ``get_norm_layer`` — SURVEY.md §2).

    Returns a zero-arg factory; 'none' yields None (caller skips the layer).
    'batch' is ``torch.nn.BatchNorm2d`` semantics: affine, eps 1e-5, running
    stats with momentum 0.1 (flax momentum 0.9 — new = 0.9·old + 0.1·batch);
    batch statistics in training (``deterministic=False``), running averages
    at eval. The stats live in the ``batch_stats`` collection, threaded
    through the trainers. One documented divergence from torch: the running
    variance EMA uses the biased batch variance (flax convention) where
    torch feeds the unbiased one — a (N·H·W)/(N·H·W−1) factor on the EMA
    inputs only; normalization itself matches.
    """
    if norm == "instance":
        return lambda: InstanceNorm(affine=False)
    if norm == "batch":
        return lambda: nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32)
    if norm == "none":
        return lambda: None
    raise ValueError(f"unknown norm: {norm!r} (expected instance|batch|none)")


class ConvBlock(nn.Module):
    """[reflect|zero]-pad -> conv -> norm -> activation.

    Reference ``conv_norm_relu`` (SURVEY.md §2): reflect padding for generator
    blocks, zero padding for the PatchGAN; activation is relu / leaky(0.2) /
    none.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 0
    pad_mode: str = "reflect"  # reflect | zero
    norm: str = "instance"
    act: str = "relu"  # relu | leaky | none
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array | None = None,
                 params_only: bool = False, deterministic: bool = True):
        """``skip`` is added after norm+act (fused into the Pallas kernel on
        TPU — the ResidualBlock tail). ``params_only=True`` declares and
        returns (kernel, bias) without computing — used by the fused
        whole-ResidualBlock kernel to reuse this module's param tree.
        ``deterministic`` is torch's train/eval mode: False during training
        (batch-norm uses batch statistics and records running averages —
        callers must make ``batch_stats`` mutable then)."""
        w = self.param(
            "kernel",
            conv_kernel_init(0.02),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if params_only:
            return w, b
        if self.pad_mode == "reflect":
            if self._use_gemm_conv(x.shape[-1]):
                bwd = ("xla" if os.environ.get("CYCLEGAN_TPU_CONV7")
                       == "fwdgemm" else "gemm")
                x = F.conv2d_reflect_gemm(x, w, b, compute_dtype=self.dtype,
                                          bwd=bwd)
            else:
                # Fence the generator convs from XLA's fusion choices
                # (CYCLEGAN_TPU_BARRIER7 for kernel>=5, CYCLEGAN_TPU_BARRIER3
                # for the 3x3 trunk; auto|on|off, auto = TPU only so CPU
                # parity/golden numerics keep their exact fusion behavior).
                # The 256²b1 device profile showed these convs rewritten by
                # the space-to-batch pass and fused with pads/norms into
                # layout-churning loops ~10x slower than the conv alone.
                # Measured end-to-end on v5e 256x256 b1: 16.95 -> 19.43
                # steps/s fencing the 7x7s, -> 22.76 also fencing the 3x3s.
                fence = _fence("CYCLEGAN_TPU_BARRIER7" if self.kernel >= 5
                               else "CYCLEGAN_TPU_BARRIER3", x.shape[0])
                x = F.reflect_pad(x, self.pad)
                if fence:
                    x = jax.lax.optimization_barrier(x)
                cd = self.dtype
                if self._use_dw_fused(x.shape):
                    # Pallas weight-grad path for the trunk 3x3 convs
                    # (CYCLEGAN_TPU_DW3; kernels/conv_dw.py).
                    y = F.conv2d_valid_dw_fused(x.astype(cd), w.astype(cd))
                    x = y + b.astype(y.dtype) if b is not None else y
                else:
                    x = F.conv2d(x, w, b, stride=self.stride, padding=0,
                                 compute_dtype=cd)
                if fence:
                    x = jax.lax.optimization_barrier(x)
        else:
            # Fence the zero-pad (downsample/PatchGAN) convs too
            # (CYCLEGAN_TPU_BARRIER_SD=auto|on|off): measured 24.43 vs 22.41
            # steps/s at 256x256 b1 with/without on v5e.
            fence = _fence("CYCLEGAN_TPU_BARRIER_SD", x.shape[0])
            if fence:
                x = jax.lax.optimization_barrier(x)
            x = F.conv2d(x, w, b, stride=self.stride, padding=self.pad, compute_dtype=self.dtype)
            if fence:
                x = jax.lax.optimization_barrier(x)
        skip = skip.astype(x.dtype) if skip is not None else None
        fused = fused_norm_act(x, self.norm, self.act, skip=skip)
        if fused is not None:
            return fused
        norm_layer = get_norm(self.norm)()
        if isinstance(norm_layer, nn.BatchNorm):
            x = norm_layer(x, use_running_average=deterministic)
        elif norm_layer is not None:
            x = norm_layer(x)
        if self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "leaky":
            x = F.leaky_relu(x, 0.2)
        return x if skip is None else x + skip

    def _use_dw_fused(self, xp_shape) -> bool:
        """Route the trunk 3x3 convs through the Pallas weight-grad VJP
        (CYCLEGAN_TPU_DW3=auto|on|off; default off until its hardware A/B
        lands). auto = TPU only, small batch (the XLA dw conv is only
        pathological there)."""
        mode = os.environ.get("CYCLEGAN_TPU_DW3", "off")
        if mode == "off":
            return False
        if mode not in ("on", "auto"):
            return False
        if mode == "auto" and (jax.default_backend() != "tpu"
                               or xp_shape[0] > 4):
            return False
        return F.use_dw_fused(xp_shape, self.features, self.kernel,
                              self.stride, jnp.dtype(self.dtype).itemsize)

    def _use_gemm_conv(self, cin: int) -> bool:
        """im2col-GEMM routing for the 7x7 stem/head convs
        (CYCLEGAN_TPU_CONV7=auto|on|off). auto = TPU only: it is a pure-XLA
        rewrite with identical math but a different accumulation order, so
        CPU parity/golden numerics stay byte-stable unless forced with
        'on'. Only stride-1 'same' geometry qualifies."""
        if self.stride != 1 or 2 * self.pad != self.kernel - 1 or self.kernel < 5:
            return False
        # Modes: off/auto (default — every GEMM variant lost its hardware
        # A/B, docs/KERNELS.md ledger) | on (everywhere) | head (TPU,
        # C_in >= 32) | fwdgemm (TPU; GEMM forward, XLA backward).
        mode = os.environ.get("CYCLEGAN_TPU_CONV7", "off")
        if mode == "on":
            return True
        if jax.default_backend() != "tpu":
            return False
        if mode == "fwdgemm":
            return True
        return mode == "head" and cin >= 32


class DeconvBlock(nn.Module):
    """Transposed conv (torch geometry) -> norm -> ReLU.

    Reference ``dconv_norm_relu`` (SURVEY.md §2): k=3, s=2, p=1, op=1 doubles
    the spatial dims.
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    norm: str = "instance"
    act: str = "relu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        w = self.param(
            "kernel",
            conv_kernel_init(0.02),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        fence = _fence("CYCLEGAN_TPU_BARRIER_SD", x.shape[0])
        if fence:
            x = jax.lax.optimization_barrier(x)
        x = F.conv2d_transpose(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            compute_dtype=self.dtype,
        )
        if fence:
            x = jax.lax.optimization_barrier(x)
        fused = fused_norm_act(x, self.norm, self.act)
        if fused is not None:
            return fused
        norm_layer = get_norm(self.norm)()
        if isinstance(norm_layer, nn.BatchNorm):
            x = norm_layer(x, use_running_average=deterministic)
        elif norm_layer is not None:
            x = norm_layer(x)
        if self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "leaky":
            x = F.leaky_relu(x, 0.2)
        return x


class ResidualBlock(nn.Module):
    """[refpad1, conv3x3, IN, ReLU, (dropout), refpad1, conv3x3, IN] + x.

    Reference ``ResidualBlock`` (SURVEY.md §3b).
    """

    features: int
    norm: str = "instance"
    use_dropout: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cb0 = ConvBlock(
            self.features, kernel=3, pad=1, pad_mode="reflect", norm=self.norm,
            act="relu", dtype=self.dtype,
        )
        cb1 = ConvBlock(
            self.features, kernel=3, pad=1, pad_mode="reflect", norm=self.norm,
            act="none", dtype=self.dtype,
        )
        mega = self._try_megakernel(cb0, cb1, x)
        if mega is not None:
            return mega
        h = cb0(x, deterministic=deterministic)
        if self.use_dropout:
            h = nn.Dropout(rate=0.5, deterministic=deterministic)(h)
        return cb1(h, skip=x, deterministic=deterministic)

    def _try_megakernel(self, cb0, cb1, x):
        """Whole-block Pallas kernel (CYCLEGAN_TPU_RESBLOCK=off|auto|
        interpret; docs/KERNELS.md). Same param tree — the ConvBlocks only
        declare their weights. Measured history at 128x128 b1 (full step,
        v5e): pre-fence XLA 61.8 < fused 66.9 steps/s (auto was default);
        with the conv fusion fences the XLA path reaches 82.7 vs 68.5 fused
        — the fences fix the pathology the megakernel was compensating for,
        so the default is OFF again. `supported()` restricts the kernel to
        shapes where the fusion fits VMEM."""
        mode = os.environ.get("CYCLEGAN_TPU_RESBLOCK", "off")
        if mode == "off" or self.norm != "instance" or self.use_dropout:
            return None
        if x.shape[-1] != self.features:
            return None
        interpret = mode == "interpret"
        if not interpret and jax.default_backend() != "tpu":
            return None
        w1, b1 = cb0(x, params_only=True)
        w2, b2 = cb1(x, params_only=True)
        d = self.dtype
        if mode == "chunked":
            # Round-3 H-tiled halo-DMA variant (kernels/resblock_chunked.py):
            # fits ANY trunk shape incl. 256-crop. Measured-and-rejected
            # isolated (fwd+bwd 0.73x/0.61x vs XLA at the 256/128 trunk
            # shapes — docs/KERNELS.md round-3 ledger); kept for A/B.
            from cyclegan_tpu.kernels.resblock_chunked import (
                residual_block_chunked)

            hc = int(os.environ.get("CYCLEGAN_TPU_RESBLOCK_HC", "8"))
            if x.shape[1] % hc:
                return None
            return residual_block_chunked(
                x.astype(d), w1.astype(d), b1.astype(d), w2.astype(d),
                b2.astype(d), 1e-5, hc, False)
        from cyclegan_tpu.kernels.resblock import residual_block_fused, supported

        if not supported(x.shape, jnp.dtype(self.dtype).itemsize):
            return None
        return residual_block_fused(
            x.astype(d), w1.astype(d), b1.astype(d), w2.astype(d),
            b2.astype(d), 1e-5, interpret)
