"""Standalone serving consumer for exported StableHLO artifacts.

Completes the deployment story begun by ``cyclegan_tpu.export``: load a
``.shlo`` artifact (weights embedded, batch-polymorphic) plus its JSON
manifest, stream a directory of images through the predictor, write
colorized PNGs, and optionally score against ground-truth masks. Needs
ONLY the artifact — no checkpoint, no trainer construction, no framework
state. The reference's deployment path ends at ``--testing`` PNG dumps
from a live checkpoint (SURVEY.md §3c); this serves the same outputs from
a self-contained compiled artifact on any host with a matching backend.

CLI: ``python -m cyclegan_tpu.main --serve model.shlo --serve_input imgs/
--serve_output preds/ [--serve_gt masks/]
[--serve_canvas_height H --serve_canvas_width W]`` (the canvas flags
enable tiled high-resolution serving from a logits-head artifact).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

import jax
import numpy as np

from cyclegan_tpu.data.datasets import class_names
from cyclegan_tpu.data.palette import encode_colormap, save_prediction_png
from cyclegan_tpu.data.transforms import eval_transform
from cyclegan_tpu.export import load_artifact
from cyclegan_tpu.train import metrics as metrics_lib
from cyclegan_tpu.utils.pipeline import InferencePipeline

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _list_images(directory: str) -> list[str]:
    names = sorted(n for n in os.listdir(directory)
                   if n.lower().endswith(IMG_EXTS))
    if not names:
        raise FileNotFoundError(f"no images ({'/'.join(IMG_EXTS)}) "
                                f"in {directory}")
    stems: dict[str, str] = {}
    for n in names:
        s = os.path.splitext(n)[0]
        if s in stems:
            # Outputs and GT masks are keyed by stem; a collision would
            # silently overwrite one prediction and double-count scores.
            raise ValueError(
                f"duplicate image stem {s!r} in {directory} "
                f"({stems[s]} vs {n}) — output PNGs and GT masks are "
                f"matched by stem; rename one")
        stems[s] = n
    return names


def _load_image(path: str, hw: tuple[int, int], in_channels: int,
                eval_resize: str, input_dtype: str = "float32") -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("L" if in_channels == 1 else "RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[..., None]
    # uint8-input artifacts normalize on-device; ship raw shaped pixels.
    img, _ = eval_transform(arr, None, crop_hw=hw, mode=eval_resize,
                            normalize_img=input_dtype != "uint8")
    return img


def _load_mask(path: str, hw: tuple[int, int], num_classes: int,
               eval_resize: str) -> np.ndarray:
    """GT mask -> (H, W) int class indices. P-mode and grayscale PNGs carry
    indices directly; RGB-encoded masks go through the palette codec."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim == 3:
        arr = encode_colormap(arr, num_classes)
    _, lab = eval_transform(np.zeros(arr.shape[:2] + (1,), np.uint8),
                            arr.astype(np.int32), crop_hw=hw,
                            mode=eval_resize)
    return lab


def _chunks(seq: list, n: int) -> Iterable[list]:
    for i in range(0, len(seq), n):
        yield seq[i:i + n]


def build_predictor(artifact_path: str, *,
                    eval_resize: str = "resize",
                    canvas_hw: tuple[int, int] | None = None,
                    data_parallel: bool = False, flip: bool = False,
                    scales: tuple[float, ...] | None = None):
    """Load a ``.shlo`` artifact and assemble its batched predictor.

    Returns ``(predict_batch, info)`` where ``predict_batch`` maps an
    ``(N, H, W, C)`` float batch (already ``eval_transform``-shaped at
    ``info['load_hw']``) to ``(N, H, W)`` class indices, with all the TTA /
    tiling / DP options of :func:`run_serve` baked in, and ``info`` carries
    ``load_hw``, ``in_channels``, ``num_classes``, ``head``, ``window_hw``
    and the manifest. Shared by directory serving (:func:`run_serve`) and
    the HTTP endpoint (cyclegan_tpu.http_serve)."""
    # Library funnel for every serving path (run_serve, the HTTP endpoint,
    # direct callers): a CPU-resolved host must get the ISA-fingerprinted
    # compile cache before the first artifact call compiles.
    from cyclegan_tpu.utils.cpuflags import maybe_pin_cpu_compile_cache

    maybe_pin_cpu_compile_cache()
    if eval_resize not in ("resize", "center_crop"):
        # "tile" as an eval_resize value is the framework-eval spelling;
        # serving spells it --serve_canvas_height/width (needs the logits
        # head, checked below).
        raise ValueError(
            f"--serve supports eval_resize resize|center_crop, got "
            f"{eval_resize!r} (for tiled serving pass --serve_canvas_height/"
            f"--serve_canvas_width with a logits-head artifact)")
    exported = load_artifact(artifact_path)
    manifest = {}
    if os.path.exists(artifact_path + ".json"):
        with open(artifact_path + ".json") as f:
            manifest = json.load(f)
    head = manifest.get("head", "segment")
    if head not in ("segment", "logits"):
        raise ValueError(
            f"artifact head is {head!r}; --serve drives the image->label "
            f"segment or logits head (the generate head consumes label maps "
            f"— call load_artifact() directly for custom drivers)")
    in_shape = exported.in_avals[0].shape  # (b|B, H, W, C), b symbolic
    h, w, c = int(in_shape[1]), int(in_shape[2]), int(in_shape[3])
    num_classes = int(manifest.get("num_classes", 21))
    # The artifact signature is the source of truth for the input dtype
    # (uint8-input artifacts normalize on-device — export.run_export).
    input_dtype = np.dtype(exported.in_avals[0].dtype).name
    if scales and input_dtype == "uint8":
        raise ValueError(
            "--serve_scales resamples the input canvas in float; "
            "multi-scale TTA needs a float32-input artifact "
            "(this one takes uint8)")

    call = jax.jit(exported.call)
    if flip and head != "logits":
        raise ValueError(
            "--serve_flip averages LOGITS of the image and its mirror; "
            "export with --export_what logits (this artifact's head is "
            f"{head!r})")
    if scales and canvas_hw is None:
        raise ValueError(
            "--serve_scales needs tiled serving (--serve_canvas_height/"
            "--serve_canvas_width + a logits-head artifact): the "
            "artifact's window is fixed-shape, so multi-scale works by "
            "re-tiling rescaled canvases")
    if canvas_hw is not None:
        if head != "logits":
            raise ValueError(
                "tiled serving averages window LOGITS; export with "
                "--export_what logits (this artifact's head is "
                f"{head!r})")
        import jax.numpy as jnp

        from cyclegan_tpu.eval_tile import tiled_logits

        ch, cw = canvas_hw
        if ch < h or cw < w:
            raise ValueError(f"serve canvas {ch}x{cw} smaller than the "
                             f"artifact window {h}x{w}")

        def batch_logits(_, x):
            return tiled_logits(lambda _p, wins: call(wins), None, x, (h, w))

        load_hw = (ch, cw)
    elif head == "logits":
        import jax.numpy as jnp

        def batch_logits(_, x):
            return call(x)

        load_hw = (h, w)
    else:
        batch_logits = None
        predict_batch = call
        load_hw = (h, w)
    if batch_logits is not None:
        if flip:
            from cyclegan_tpu.tta import flip_avg

            batch_logits = flip_avg(batch_logits)
        if scales:
            from cyclegan_tpu.tta import scale_avg, validate_tile_scales

            validate_tile_scales(canvas_hw, (h, w), tuple(scales))
            batch_logits = scale_avg(batch_logits, tuple(scales))
        logits_fn = batch_logits
        predict_batch = jax.jit(
            lambda x: jnp.argmax(logits_fn(None, x), axis=-1))

    if data_parallel and len(jax.devices()) > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.asarray(jax.devices()), ("dp",))
        shard = NamedSharding(mesh, PartitionSpec("dp"))
        n_dev = len(jax.devices())
        inner = predict_batch

        def predict_batch(x):  # noqa: F811 — DP wrapper over the same fn
            b = x.shape[0]
            pad = (-b) % n_dev
            if pad:
                x = np.concatenate(
                    [x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            return inner(jax.device_put(x, shard))[:b]

    info = {"load_hw": load_hw, "window_hw": (h, w), "in_channels": c,
            "num_classes": num_classes, "head": head, "manifest": manifest,
            "eval_resize": eval_resize, "input_dtype": input_dtype}
    return predict_batch, info


def run_serve(artifact_path: str, input_dir: str, output_dir: str, *,
              batch_size: int = 8, gt_dir: str | None = None,
              eval_resize: str = "resize",
              canvas_hw: tuple[int, int] | None = None,
              data_parallel: bool = False, flip: bool = False,
              scales: tuple[float, ...] | None = None) -> dict:
    """Run the segment (or logits) head of an exported artifact over
    ``input_dir``.

    Writes ``<stem>_pred.png`` (VOC-palette colorized) per input image into
    ``output_dir``; when ``gt_dir`` holds same-stem masks, accumulates the
    confusion matrix and writes ``scores.json``. Returns the summary dict.

    ``canvas_hw``: tiled high-resolution serving — load images at this
    fixed canvas and slide the artifact's crop-size window over it with
    50% overlap, averaging logits (cyclegan_tpu.eval_tile; windows ride
    the artifact's batch-polymorphic dim). Requires a ``logits``-head
    artifact (``--export_what logits``): argmax heads can't be averaged.

    ``data_parallel``: shard each serving batch over ALL local devices
    (1-axis ``jax.sharding.Mesh``; the exported module compiles SPMD via
    sharding propagation — batchwise ops need no collectives). Ragged
    batches are zero-padded to a device multiple and the padding dropped.
    One process only; multi-host serving is a fleet of independent hosts.

    ``flip``: horizontal-flip TTA (cyclegan_tpu.tta) — average each
    image's logits with the mirrored logits of its flip before the
    argmax. Requires a ``logits``-head artifact (argmax heads can't be
    averaged); composes with ``canvas_hw`` (the flip wraps the whole
    tiled canvas) and ``data_parallel``.

    ``scales``: multi-scale TTA (tta.scale_avg) — logits at each canvas
    scale resized back and averaged. Requires ``canvas_hw`` (tiled)
    serving: the artifact's window is fixed-shape, so only re-tiling a
    rescaled canvas can feed it; every scaled canvas must stay >= the
    window. Composes with ``flip`` (average over scales x mirror).
    """
    predict_batch, info = build_predictor(
        artifact_path, eval_resize=eval_resize, canvas_hw=canvas_hw,
        data_parallel=data_parallel, flip=flip, scales=scales)
    load_hw, c = info["load_hw"], info["in_channels"]
    num_classes = info["num_classes"]
    in_dtype = info["input_dtype"]

    names = _list_images(input_dir)
    os.makedirs(output_dir, exist_ok=True)
    hist = None
    scored = 0
    t0 = time.perf_counter()
    # Async dispatch/drain mechanics live in utils.pipeline (shared with
    # runner.run_test): enqueue chunk k+1 before fetching chunk k so the
    # device computes the next batch while the host decodes/writes PNGs.
    def _consume(chunk: list[str], pred) -> None:
        nonlocal hist, scored
        for name, p in zip(chunk, pred):
            stem = os.path.splitext(name)[0]
            save_prediction_png(
                p.astype(np.uint8),
                os.path.join(output_dir, f"{stem}_pred.png"))
            if gt_dir is None:
                continue
            mask_path = os.path.join(gt_dir, stem + ".png")
            if not os.path.exists(mask_path):
                continue
            lab = _load_mask(mask_path, load_hw, num_classes, eval_resize)
            hh = np.asarray(metrics_lib.confusion_matrix(
                p, lab, num_classes))
            hist = hh if hist is None else hist + hh
            scored += 1

    pipe = InferencePipeline(_consume)
    for chunk in _chunks(names, max(batch_size, 1)):
        batch = np.stack([
            _load_image(os.path.join(input_dir, n), load_hw, c, eval_resize,
                        in_dtype)
            for n in chunk])
        pipe.put(chunk, predict_batch(batch))
    pipe.flush()

    elapsed = time.perf_counter() - t0
    out = {"images": len(names), "scored": scored,
           "output_dir": os.path.abspath(output_dir),
           # End-to-end serving rate (decode + predict + colorize + write;
           # includes the first batch's compile — long runs amortize it).
           "elapsed_s": round(elapsed, 3),
           "img_per_s": round(len(names) / elapsed, 3) if elapsed else None}
    if hist is not None:
        s = metrics_lib.scores(hist)
        out.update({k: float(v) for k, v in s.items() if np.ndim(v) == 0})
        # Per-class IoU keyed by class name (reference scores() table).
        # Newer artifacts embed their class_names; older manifests fall back
        # to the dataset-convention table (or class_{i}).
        cls_names = info["manifest"].get("class_names")
        if not cls_names or len(cls_names) != num_classes:
            cls_names = class_names(info["manifest"].get("dataset", ""),
                                    num_classes)
        out["per_class_iou"] = {
            n: float(v)
            for n, v in zip(cls_names, np.asarray(s["per_class_iou"]))}
        with open(os.path.join(output_dir, "scores.json"), "w") as f:
            json.dump({k: v for k, v in out.items() if k != "output_dir"},
                      f, indent=2, sort_keys=True)
    print(f"served {len(names)} images -> {output_dir}"
          + (f"; scores over {scored}: "
             + json.dumps({k: round(v, 4) for k, v in out.items()
                           if isinstance(v, float)})
             if scored else ""), flush=True)
    return out
