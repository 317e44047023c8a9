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


def run_export(cfg, out_path: str, *, semisupervised: bool = True,
               what: str = "segment", batch: int | str = "b",
               platforms: Sequence[str] = DEFAULT_PLATFORMS) -> str:
    """CLI entry (``python -m cyclegan_tpu.main --export out.shlo ...``):
    restore the latest checkpoint for ``cfg`` and export the requested head.

    ``what``: ``segment`` (image -> int32 label map, the serving path),
    ``logits`` (image -> float class logits — for serving hosts that
    ensemble, calibrate, threshold, or tile downstream), or ``generate``
    (label map -> synthesized image, the l2i GAN head; semi-supervised
    checkpoints only).
    """
    from cyclegan_tpu.train.checkpoint import restore_for_inference

    trainer, state, num_classes, in_ch = restore_for_inference(
        cfg, semisupervised=semisupervised)
    h, w = cfg.crop_hw

    if what in ("segment", "logits"):
        params = state.g_i2l if semisupervised else state.params
        fn = trainer.predict if what == "segment" else trainer.logits
        exported = export_predictor(
            fn, params, height=h, width=w, in_channels=in_ch,
            batch=batch, platforms=platforms)
    elif what == "generate":
        if not semisupervised:
            raise ValueError("--export_what generate needs a semi-supervised "
                             "checkpoint (the l2i generator)")
        spec = jax.ShapeDtypeStruct((_batch_dim(batch), h, w), jnp.int32)
        exported = export_closed(trainer.generate_image, state.g_l2i, spec,
                                 platforms)
    else:
        raise ValueError(f"unknown export head {what!r}")

    save_artifact(out_path, exported, manifest={
        "head": what, "dataset": cfg.dataset, "gen_net": cfg.gen_net,
        "num_classes": num_classes,
        "trained_steps": int(np.asarray(jax.device_get(state.step)).max()),
    })
    print(f"exported {what} head -> {out_path} "
          f"(platforms={list(platforms)}, batch={batch})", flush=True)
    return out_path
