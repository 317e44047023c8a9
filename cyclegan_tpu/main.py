"""CLI entry (reference `main.py` — SURVEY.md §2 "CLI entry"): argparse ->
dispatch train/test; selects dataset and model (supervised vs semi-sup).

Flag names mirror the reference's surface (``--training``, ``--testing``,
``--dataset``, ``--epochs``, ``--decay_epoch``, ``--batch_size``, ``--lr``,
``--lamda``, ``--crop_height``/``--crop_width``, ``--ngf``/``--ndf``,
``--gen_net``/``--dis_net``, ``--norm``, ``--checkpoint_dir``,
``--results_dir``). ``--gpu_ids`` becomes ``--num_devices`` (mesh size).

Usage:
  python -m cyclegan_tpu.main --training --dataset synthetic --epochs 2
  python -m cyclegan_tpu.main --training --model supervised --dataset voc2012 \
      --data_root /data/VOC2012
  python -m cyclegan_tpu.main --testing --dataset synthetic
  python -m cyclegan_tpu.main --training --preset voc_semisup_256 --data_root ...
"""

from __future__ import annotations

import argparse
import dataclasses

from cyclegan_tpu.utils.config import Config, preset


def get_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="TPU-native semi-supervised CycleGAN segmentation")
    p.add_argument("--training", action="store_true")
    p.add_argument("--testing", action="store_true")
    p.add_argument("--model", choices=["supervised", "semisupervised"],
                   default="semisupervised")
    p.add_argument("--preset", type=str, default=None,
                   help="one of the benchmark presets (see utils.config.PRESETS)")
    p.add_argument("--max_steps", type=int, default=None,
                   help="stop after N optimizer steps (smoke runs)")
    p.add_argument("--export", type=str, default=None, metavar="PATH",
                   help="export the latest checkpoint as a self-contained "
                        "StableHLO serving artifact (see cyclegan_tpu.export)")
    p.add_argument("--export_what", choices=["segment", "logits", "generate"],
                   default="segment")
    p.add_argument("--export_batch", type=str, default="b",
                   help="fixed batch size (int) or a symbolic dim name for "
                        "batch-polymorphic serving (default 'b')")
    p.add_argument("--export_platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--export_quantize", choices=["int8", "bf16"],
                   default=None,
                   help="weight-only quantization of the exported artifact: "
                        "int8 = per-channel scales, ~4x smaller; bf16 = "
                        "~2x smaller with a tighter error bound; both "
                        "dequantize on the fly inside the module")
    p.add_argument("--export_input", choices=["float32", "uint8"],
                   default="float32",
                   help="uint8 = artifact takes raw shaped pixels and "
                        "normalizes on-device (4x less host->device input "
                        "traffic; segment/logits heads; serve/HTTP hosts "
                        "detect it from the artifact signature)")
    p.add_argument("--export_format", choices=["shlo", "savedmodel"],
                   default="shlo",
                   help="shlo = self-contained jax.export blob (the --serve "
                        "path); savedmodel = TF SavedModel directory for "
                        "TF-Serving fleets (same StableHLO inside)")
    p.add_argument("--serve", type=str, default=None, metavar="ARTIFACT",
                   help="run an exported .shlo artifact over a directory of "
                        "images (standalone — no checkpoint needed; see "
                        "cyclegan_tpu.serve)")
    p.add_argument("--serve_input", type=str, default=None, metavar="DIR",
                   help="input image directory for --serve")
    p.add_argument("--serve_output", type=str, default=None, metavar="DIR",
                   help="prediction PNG output directory for --serve "
                        "(default: results_dir)")
    p.add_argument("--serve_gt", type=str, default=None, metavar="DIR",
                   help="optional ground-truth mask directory (same stems, "
                        ".png) — enables mIoU/pixel-acc scoring")
    p.add_argument("--serve_batch", type=int, default=8,
                   help="serving batch size (batch-polymorphic artifacts "
                        "compile once per distinct size)")
    p.add_argument("--serve_canvas_height", type=int, default=None,
                   help="tiled high-res serving: load images at this fixed "
                        "canvas and slide the artifact's window over it "
                        "with logit averaging (needs --export_what logits)")
    p.add_argument("--serve_canvas_width", type=int, default=None)
    p.add_argument("--serve_dp", action="store_true",
                   help="shard each serving batch over all local devices "
                        "(data-parallel SPMD inference; ragged batches are "
                        "padded to a device multiple)")
    p.add_argument("--serve_flip", action="store_true",
                   help="horizontal-flip TTA at serving: average each "
                        "image's logits with its mirror's (needs a "
                        "logits-head artifact; --eval_flip true implies it)")
    p.add_argument("--serve_http", type=int, default=None, metavar="PORT",
                   help="serve the artifact as an HTTP endpoint on PORT "
                        "instead of over a directory (GET /healthz, /info; "
                        "POST /predict — cyclegan_tpu.http_serve)")
    p.add_argument("--serve_host", type=str, default="127.0.0.1",
                   help="bind address for --serve_http (default loopback; "
                        "use 0.0.0.0 behind a load balancer)")
    p.add_argument("--serve_http_batch", type=int, default=8,
                   help="adaptive micro-batching cap for --serve_http: "
                        "concurrent requests queued behind an in-flight "
                        "device call coalesce into one batched call of up "
                        "to this many images (1 disables; power-of-two "
                        "buckets are pre-compiled at startup)")
    p.add_argument("--serve_scales", type=str, default=None,
                   help="multi-scale TTA at serving, e.g. '0.75,1.0,1.25' "
                        "(needs tiled serving: --serve_canvas_height/width "
                        "+ a logits-head artifact; --eval_scales implies it)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu, tpu) — needed because "
                        "this environment's sitecustomize overrides JAX_PLATFORMS")
    p.add_argument("--gpu_ids", type=str, default=None,
                   help="reference-compat alias: '0,1,2' selects 3 devices "
                        "(maps to --num_devices; TPU chips, not GPUs)")
    for name, arg_type in config_flag_types().items():
        if name == "bf16":
            p.add_argument("--no_bf16", dest="bf16", action="store_false",
                           default=None)
            continue
        if arg_type is bool:
            p.add_argument(f"--{name}",
                           type=lambda s: s.lower() in ("1", "true"),
                           default=None)
        else:
            p.add_argument(f"--{name}", type=arg_type, default=None)
    return p.parse_args(argv)


def config_flag_types() -> dict[str, type]:
    """Explicit Config-field -> argparse-type table, synthesized from the
    dataclass ANNOTATIONS (``typing.get_type_hints`` resolves the
    ``from __future__ import annotations`` strings; ``Optional[X]``/
    ``X | None`` unwraps to ``X``). A new field with an unsupported
    annotation fails LOUDLY at parser construction instead of silently
    parsing as int (the round-3 fragility: None-default fields fell back to
    a hand-maintained name->type dict)."""
    import types
    import typing

    hints = typing.get_type_hints(Config)
    out: dict[str, type] = {}
    for f in dataclasses.fields(Config):
        t = hints[f.name]
        if typing.get_origin(t) in (typing.Union, types.UnionType):
            non_none = [a for a in typing.get_args(t)
                        if a is not type(None)]
            if len(non_none) != 1:
                raise TypeError(
                    f"Config.{f.name}: can't synthesize a CLI flag for "
                    f"union annotation {t!r}")
            t = non_none[0]
        if t not in (int, float, str, bool):
            raise TypeError(
                f"Config.{f.name}: can't synthesize a CLI flag for "
                f"annotation {t!r} (supported: int, float, str, bool and "
                f"their Optionals)")
        out[f.name] = t
    return out


def build_config(args: argparse.Namespace) -> Config:
    cfg = preset(args.preset) if args.preset else Config()
    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(Config)
        if getattr(args, f.name, None) is not None
    }
    if getattr(args, "gpu_ids", None) and "num_devices" not in overrides:
        overrides["num_devices"] = len(
            [g for g in args.gpu_ids.split(",") if g.strip() != ""])
    return cfg.replace(**overrides)


def main(argv=None) -> None:
    args = get_args(argv)
    cfg = build_config(args)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    # Stale XLA:CPU AOT cache entries from another VM's ISA can SIGILL.
    # Pinning keys off the RESOLVED backend (not just --platform cpu) so a
    # run that silently falls back to CPU — tunnel down, plain CPU box —
    # is covered too (cpuflags.maybe_pin_cpu_compile_cache docstring).
    # When a multi-process TRAINING launch is configured, the pin MUST wait:
    # touching jax.default_backend() here initializes XLA before
    # jax.distributed.initialize(), which then always raises (round-4
    # advisor, high). distributed.maybe_initialize pins right after init
    # instead. Only the training paths ever call maybe_initialize, so
    # every other dispatch (--testing/--export/--serve) still pins here —
    # deferring for those would skip the pin entirely and reopen the
    # cross-VM SIGILL hazard (round-5 review).
    import os

    from cyclegan_tpu.parallel.distributed import distributed_launch_pending
    from cyclegan_tpu.utils.cpuflags import cpu_aot_stderr_filter

    if (args.training and not (args.serve or args.export or args.testing)
            and distributed_launch_pending(cfg, os.environ)):
        # distributed.maybe_initialize pins right after init; workers keep
        # raw stderr (multi-process debugging beats cosmetic filtering).
        _dispatch(args, cfg)
        return
    # Pins the cache AND silences the verified-benign cpu_aot_loader spam
    # iff the resolved backend is CPU; passes real mismatches through and
    # evicts the stale cache dir (cpuflags.cpu_aot_stderr_filter).
    with cpu_aot_stderr_filter():
        _dispatch(args, cfg)


def _dispatch(args, cfg) -> None:
    from cyclegan_tpu.train import runner  # deferred: jax init is slow

    if args.serve:
        if not (args.serve_input or args.serve_http):
            raise SystemExit("--serve needs --serve_input DIR "
                             "(or --serve_http PORT for the endpoint)")
        from cyclegan_tpu import serve as serve_lib

        canvas = None
        if args.serve_canvas_height or args.serve_canvas_width:
            if not (args.serve_canvas_height and args.serve_canvas_width):
                raise SystemExit("pass BOTH --serve_canvas_height and "
                                 "--serve_canvas_width")
            canvas = (args.serve_canvas_height, args.serve_canvas_width)
        # A training config with eval_resize=tile maps to canvas serving;
        # the image-load convention on the canvas is a plain resize.
        resize = "resize" if (cfg.eval_resize == "tile" and canvas) \
            else cfg.eval_resize
        from cyclegan_tpu.tta import parse_scales

        if args.serve_http:
            from cyclegan_tpu.http_serve import run_http_serve

            run_http_serve(
                args.serve, host=args.serve_host, port=args.serve_http,
                eval_resize=resize, canvas_hw=canvas,
                flip=args.serve_flip or cfg.eval_flip,
                max_batch=args.serve_http_batch,
                data_parallel=args.serve_dp,
                scales=parse_scales(args.serve_scales or cfg.eval_scales))
            return
        serve_lib.run_serve(
            args.serve, args.serve_input,
            args.serve_output or cfg.results_dir,
            batch_size=args.serve_batch, gt_dir=args.serve_gt,
            eval_resize=resize, canvas_hw=canvas,
            data_parallel=args.serve_dp,
            flip=args.serve_flip or cfg.eval_flip,
            scales=parse_scales(args.serve_scales or cfg.eval_scales))
    elif args.export:
        from cyclegan_tpu import export as export_lib

        batch = (int(args.export_batch) if args.export_batch.isdigit()
                 else args.export_batch)
        export_lib.run_export(
            cfg, args.export, semisupervised=args.model == "semisupervised",
            what=args.export_what, batch=batch,
            platforms=tuple(s.strip() for s in args.export_platforms.split(",")
                            if s.strip()),
            fmt=args.export_format, quantize=args.export_quantize,
            input_dtype=args.export_input)
    elif args.testing:
        runner.run_test(cfg, semisupervised=args.model == "semisupervised")
    elif args.training:
        if args.model == "supervised":
            runner.run_supervised(cfg, max_steps=args.max_steps)
        else:
            runner.run_cyclegan(cfg, max_steps=args.max_steps)
    else:
        raise SystemExit("pass --training or --testing")


if __name__ == "__main__":
    main()
