"""Serving export: checkpoint -> portable StableHLO artifact.

Beyond the reference (whose deployment story ends at ``--testing`` PNG dumps,
SURVEY.md §3c): the trained segmentation predictor (or the label->image
generator) is exported with ``jax.export`` into a self-contained, versioned
StableHLO module — weights embedded as constants, batch dimension symbolic —
that a serving host deserializes and runs WITHOUT this package, its configs,
or its checkpoint format. Multi-platform lowering (cpu+tpu by default) means
one artifact serves both a CPU canary and the TPU fleet.

Artifact layout: ``<out>`` is the serialized ``jax.export.Exported`` blob;
``<out>.json`` is a manifest (model family, input spec, class count, palette
availability, jax version) for the serving side's admission checks.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Sequence

import jax
import jax.export
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.data.datasets import class_names

DEFAULT_PLATFORMS = ("cpu", "tpu")


def _batch_dim(batch: int | str):
    """An int for a fixed batch, or a symbolic-dimension name (e.g. ``"b"``)
    for batch-polymorphic serving (one compile per distinct batch size on
    the serving host, no re-export)."""
    if isinstance(batch, str):
        (batch,) = jax.export.symbolic_shape(f"({batch},)")
    return batch


def export_closed(fn, params: Any, spec: jax.ShapeDtypeStruct,
                  platforms: Sequence[str] = DEFAULT_PLATFORMS
                  ) -> jax.export.Exported:
    """Export ``fn(params, x)`` as ``x -> y`` with the weights embedded as
    module constants (a self-contained serving artifact)."""
    params = jax.device_get(params)  # embed host constants, not live buffers
    closed = jax.jit(lambda x: fn(params, x))
    return jax.export.export(closed, platforms=list(platforms))(spec)


def uint8_input(fn):
    """Wrap an image-fed ``fn(params, x)`` to take raw uint8 pixels and run
    the ``[-1, 1]`` normalization (transforms.normalize) on-device, so
    serving hosts ship 1 byte/pixel instead of 4.

    The normalization is a 256-entry constant lookup whose entries are
    computed by the host ``normalize`` itself — bit-exact with a float32
    export by construction (a naive on-device ``x/127.5 - 1`` is NOT:
    XLA's algebraic simplifier rewrites divide-by-constant into multiply,
    a 1-ulp difference that flips near-tie argmaxes). Asserted byte-exact
    in tests/test_serve.py / test_http_serve.py."""
    from cyclegan_tpu.data.transforms import normalize

    lut = jnp.asarray(normalize(np.arange(256, dtype=np.uint8)))
    return lambda p, x: fn(p, lut[x.astype(jnp.int32)])


def uint8_output(fn):
    """Cast an ``fn(params, x) -> int class map`` to uint8 on-device. Class
    maps carry values < num_classes <= 255, so the cast is lossless; the
    serving host fetches 1 byte/pixel instead of int32's 4 (every consumer
    in serve/http_serve already re-casts to uint8 for PNG/palette work)."""
    return lambda p, x: fn(p, x).astype(jnp.uint8)


def export_predictor(predict_fn, params: Any, *, height: int, width: int,
                     in_channels: int, batch: int | str = "b",
                     platforms: Sequence[str] = DEFAULT_PLATFORMS,
                     dtype=jnp.float32) -> jax.export.Exported:
    """Export ``predict_fn(params, image)`` (NHWC float image -> int label
    map) with the weights embedded."""
    spec = jax.ShapeDtypeStruct(
        (_batch_dim(batch), height, width, in_channels), dtype)
    return export_closed(predict_fn, params, spec, platforms)


def save_artifact(path: str, exported: jax.export.Exported,
                  manifest: dict | None = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    info = {
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exported.calling_convention_version,
    }
    info.update(manifest or {})
    with open(path + ".json", "w") as f:
        json.dump(info, f, indent=2, sort_keys=True)


def load_artifact(path: str):
    """Deserialize an exported module; returns a callable (``.call`` is
    jit-composable — a serving host can wrap it in its own ``jax.jit``)."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported


QUANT_MIN_SIZE = 4096  # leaves smaller than this stay fp32 (biases, norms)


def quantize_weights(params: Any, *, min_size: int = QUANT_MIN_SIZE,
                     mode: str = "int8") -> Any:
    """Weight-only quantization for serving artifacts.

    ``mode="int8"``: symmetric per-output-channel int8 of the large
    (>= ``min_size`` elements, rank >= 2) float leaves — the conv /
    conv-transpose kernels that dominate artifact size and serving-time HBM
    weight traffic. Quantized leaves become ``{"__q8__": int8 array,
    "scale": (cout,) fp32}`` subtrees. ~4x smaller; <=scale/2 per-weight
    rounding.

    ``mode="bf16"``: the same leaves stored as bfloat16 (``{"__bf16__":
    array}``). ~2x smaller; worst-case relative error <= 2^-8 per weight
    (round-to-nearest with bf16's 7 stored mantissa bits; bf16 keeps
    fp32's exponent) — the conservative choice when int8's rounding is a
    concern.

    Either way, small leaves (biases, norm scales/offsets) stay fp32: they
    are numerically sensitive and contribute nothing to size, and
    :func:`dequantize_weights` folds the wrapped subtrees back. This is
    weight-ONLY quantization: compute still runs in the model's float dtype
    after an on-the-fly dequant (cheap elementwise op per weight read).
    Error/size/serving bounds asserted in tests/test_export_quantized.py.
    """
    if mode not in ("int8", "bf16"):
        raise ValueError(f"unknown quantization mode {mode!r} (int8|bf16)")

    def q(leaf):
        x = np.asarray(leaf)
        if (x.ndim < 2 or x.size < min_size
                or not np.issubdtype(x.dtype, np.floating)):
            return leaf
        if mode == "bf16":
            return {"__bf16__": np.asarray(jnp.asarray(x, jnp.bfloat16))}
        flat = x.reshape(-1, x.shape[-1]).astype(np.float64)
        scale = np.max(np.abs(flat), axis=0) / 127.0
        scale = np.where(scale == 0.0, 1.0, scale)
        qv = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
        return {"__q8__": qv, "scale": scale.astype(np.float32)}

    return jax.tree.map(q, jax.device_get(params))


def _is_quantized(node) -> bool:
    return isinstance(node, dict) and ("__q8__" in node or "__bf16__" in node)


# Staged (jitted) so that tracing dequantize_weights under jax.export keeps
# the int8/bf16 arrays as module constants with the upcast(+scale) as ops —
# an eager numpy op would constant-fold back to fp32 constants and the
# artifact would not shrink (verified: 591 KB folded vs 150 KB staged for a
# 3x3x128x128 kernel).
_deq_q8 = jax.jit(lambda q, s: jnp.asarray(q, jnp.float32) * s)
_deq_bf16 = jax.jit(lambda q: jnp.asarray(q, jnp.float32))


def dequantize_weights(qparams: Any):
    """Inverse of :func:`quantize_weights`; jit-safe (runs inside the
    exported module, so the artifact carries quantized constants and
    upcasts at call time)."""
    def deq(n):
        if not _is_quantized(n):
            return n
        if "__bf16__" in n:
            return _deq_bf16(n["__bf16__"])
        return _deq_q8(n["__q8__"], n["scale"])

    return jax.tree.map(deq, qparams, is_leaf=_is_quantized)


def export_savedmodel(fn, params: Any, spec: jax.ShapeDtypeStruct,
                      out_dir: str, *, batch: int | str = "b",
                      platforms: Sequence[str] = DEFAULT_PLATFORMS,
                      manifest: dict | None = None) -> str:
    """Export ``fn(params, x)`` as a TensorFlow SavedModel (TF-Serving /
    ``tf.saved_model.load`` compatible) — the same natively-serialized
    StableHLO as the ``.shlo`` artifact, wrapped in a ``serving_default``
    signature via ``jax2tf.convert(native_serialization=True)``.

    Use this head when the serving fleet speaks TF-Serving; use the
    ``.shlo`` artifact for JAX serving hosts (cyclegan_tpu.serve). The
    math is identical either way: jax2tf native serialization embeds the
    jax.export StableHLO module, TF only provides the container and
    runtime dispatch.

    ``spec`` carries the NON-batch dims; ``batch`` is an int for a fixed
    batch or a name for a polymorphic batch dimension (TF side: dim 0 =
    None).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    params = jax.device_get(params)
    poly = None
    tf_batch: int | None = batch if isinstance(batch, int) else None
    if tf_batch is None:
        dims = ", ".join(["_"] * (len(spec.shape) - 1))
        poly = [f"({batch}, {dims})"]
    # Native serialization is jax2tf's default (and only maintained) mode;
    # passing the flag explicitly is deprecated.
    tf_fn = jax2tf.convert(
        lambda x: fn(params, x), polymorphic_shapes=poly,
        native_serialization_platforms=tuple(platforms))
    module = tf.Module()
    module.serve = tf.function(
        tf_fn, autograph=False,
        input_signature=[tf.TensorSpec((tf_batch,) + tuple(spec.shape[1:]),
                                       tf.as_dtype(np.dtype(spec.dtype)),
                                       name="input")])
    tf.saved_model.save(
        module, out_dir,
        signatures={"serving_default": module.serve})
    info = {"format": "tf_saved_model", "jax_version": jax.__version__,
            "tf_version": tf.__version__,
            "platforms": list(platforms),
            "input_shape": [tf_batch] + list(spec.shape[1:]),
            "input_dtype": str(np.dtype(spec.dtype))}
    info.update(manifest or {})
    with open(os.path.join(out_dir, "cyclegan_tpu_manifest.json"), "w") as f:
        json.dump(info, f, indent=2, sort_keys=True)
    return out_dir


def run_export(cfg, out_path: str, *, semisupervised: bool = True,
               what: str = "segment", batch: int | str = "b",
               platforms: Sequence[str] = DEFAULT_PLATFORMS,
               fmt: str = "shlo", quantize: str | None = None,
               input_dtype: str = "float32") -> str:
    """CLI entry (``python -m cyclegan_tpu.main --export out.shlo ...``):
    restore the latest checkpoint for ``cfg`` and export the requested head.

    ``what``: ``segment`` (image -> int32 label map, the serving path),
    ``logits`` (image -> float class logits — for serving hosts that
    ensemble, calibrate, threshold, or tile downstream), or ``generate``
    (label map -> synthesized image, the l2i GAN head; semi-supervised
    checkpoints only).

    ``fmt``: ``shlo`` (self-contained jax.export blob — the
    cyclegan_tpu.serve path) or ``savedmodel`` (TF SavedModel directory
    for TF-Serving fleets; same natively-serialized StableHLO inside).

    ``quantize``: ``int8`` embeds the conv kernels as int8 + per-channel
    scales (~4x smaller artifact), ``bf16`` as bfloat16 (~2x smaller,
    tighter error bound); weight-only either way
    (:func:`quantize_weights`), same serving interface.

    ``input_dtype``: ``"uint8"`` (segment/logits heads) takes raw shaped
    pixels and runs the ``[-1, 1]`` normalization ON-DEVICE — serving
    hosts ship 1 byte/pixel instead of 4 (4x less host->device traffic;
    the bench-host serving bound after the palette-PNG switch). The f32
    divide is bit-identical wherever it runs, so outputs match a float32
    artifact exactly. The serve/HTTP paths read the dtype from the
    artifact signature and skip the host-side normalize automatically.
    """
    from cyclegan_tpu.train.checkpoint import restore_for_inference

    trainer, state, num_classes, in_ch = restore_for_inference(
        cfg, semisupervised=semisupervised)
    h, w = cfg.crop_hw

    if input_dtype not in ("float32", "uint8"):
        raise ValueError(
            f"unknown input_dtype {input_dtype!r} (float32|uint8)")
    if what in ("segment", "logits"):
        params = state.g_i2l if semisupervised else state.params
        fn = trainer.predict if what == "segment" else trainer.logits
        item_shape, item_dtype = (h, w, in_ch), jnp.float32
        if what == "segment" and num_classes <= 255:
            fn = uint8_output(fn)  # 1-byte class maps off the device
        if input_dtype == "uint8":
            fn = uint8_input(fn)
            item_dtype = jnp.uint8
    elif what == "generate":
        if not semisupervised:
            raise ValueError("--export_what generate needs a semi-supervised "
                             "checkpoint (the l2i generator)")
        if input_dtype == "uint8":
            raise ValueError("--export_input uint8 applies to the image-fed "
                             "segment/logits heads; the generate head "
                             "already consumes int32 label maps")
        fn, params = trainer.generate_image, state.g_l2i
        item_shape, item_dtype = (h, w), jnp.int32
    else:
        raise ValueError(f"unknown export head {what!r}")

    manifest = {
        "head": what, "dataset": cfg.dataset, "gen_net": cfg.gen_net,
        "num_classes": num_classes,
        # Self-describing artifact: serving hosts label per-class scores
        # and /info responses without knowing the dataset convention.
        "class_names": list(class_names(cfg.dataset, num_classes)),
        "trained_steps": int(np.asarray(jax.device_get(state.step)).max()),
    }
    if input_dtype == "uint8":
        manifest["input_dtype"] = "uint8"
    if quantize:
        params = quantize_weights(params, mode=quantize)  # validates mode
        inner = fn
        fn = lambda p, x: inner(dequantize_weights(p), x)  # noqa: E731
        manifest["quantize"] = f"{quantize}_weight_only"
    if fmt == "savedmodel":
        spec = jax.ShapeDtypeStruct((1,) + item_shape, item_dtype)
        export_savedmodel(fn, params, spec, out_path, batch=batch,
                          platforms=platforms, manifest=manifest)
        print(f"exported {what} head -> SavedModel {out_path} "
              f"(platforms={list(platforms)}, batch={batch})", flush=True)
        return out_path
    if fmt != "shlo":
        raise ValueError(f"unknown export format {fmt!r} (shlo|savedmodel)")
    spec = jax.ShapeDtypeStruct((_batch_dim(batch),) + item_shape, item_dtype)
    exported = export_closed(fn, params, spec, platforms)
    save_artifact(out_path, exported, manifest=manifest)
    print(f"exported {what} head -> {out_path} "
          f"(platforms={list(platforms)}, batch={batch})", flush=True)
    return out_path
