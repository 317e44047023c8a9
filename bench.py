"""Benchmark: semi-sup CycleGAN train steps/sec at 256x256 (BASELINE.json
headline metric), run on the default JAX platform (the real TPU chip under
the driver).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline = our steps/sec divided by the torch-CPU reference-semantics step
throughput (tools/torch_reference.py) at the same size/batch, measured on this
machine and recorded below (re-measure with --measure-baseline). Target >= 8x
(BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time

# Measured on this machine via `python tools/torch_reference.py --steps 3
# --size 256 --batch 1` (see BASELINE.md "Measured results").
TORCH_CPU_BASELINE_SPS = None  # filled after first measurement; see below
try:
    with open(__file__.replace("bench.py", "BASELINE_MEASURED.json")) as f:
        TORCH_CPU_BASELINE_SPS = json.load(f).get("torch_cpu_steps_per_sec")
except (FileNotFoundError, json.JSONDecodeError):
    pass


def measure_jax(size: int, batch: int, steps: int, warmup: int, *,
                width: int | None = None, channels: int = 3,
                classes: int = 21, gen_net: str = "resnet_9blocks",
                remat: bool = False, scan: int = 1,
                grad_accum: int = 1) -> float:
    import jax

    from cyclegan_tpu.parallel import (
        make_mesh, replicate_state, shard_batch, jit_step, select_step)
    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    h, w = size, width or size
    cfg = Config(dataset="synthetic", gen_net=gen_net,
                 crop_height=h, crop_width=w, batch_size=batch,
                 bf16=True, epochs=200, decay_epoch=100, remat=remat,
                 steps_per_call=scan, grad_accum=grad_accum)
    trainer = CycleGANTrainer(cfg, num_classes=classes, in_channels=channels,
                              steps_per_epoch=100)
    mesh = make_mesh(1)
    state = replicate_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    step = jit_step(select_step(trainer, scan, grad_accum))

    rng = jax.random.PRNGKey(1)
    # One leading stack axis for either stacked form (they are mutually
    # exclusive — parallel.select_step enforces it).
    stack = scan if scan > 1 else grad_accum
    lead = () if stack <= 1 else (stack,)
    batch_d = shard_batch(
        {
            "lab_image": jax.random.uniform(rng, lead + (batch, h, w, channels),
                                            minval=-1, maxval=1),
            "lab_label": jax.random.randint(rng, lead + (batch, h, w), 0, classes),
            "unlab_image": jax.random.uniform(rng, lead + (batch, h, w, channels),
                                              minval=-1, maxval=1),
        },
        mesh,
        leading_stack=stack > 1,
    )
    for _ in range(warmup):
        state, m = step(state, batch_d)
    # Materialize (don't trust block_until_ready over the tunnel); with
    # --warmup 0 there is no `m` yet — sync on a state leaf instead.
    jax.device_get(m if warmup else jax.tree.leaves(state.g_i2l)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch_d)
    # Steps chain through the donated state; fetching the last metrics (and a
    # param leaf) forces the whole chain to have executed.
    jax.device_get(m)
    jax.device_get(jax.tree.leaves(state.g_i2l)[0])
    # Optimizer steps per second: scan runs K updates per call; grad_accum
    # runs ONE (each consuming grad_accum*batch images — images/s scales
    # by the effective batch).
    return steps * max(scan, 1) / (time.perf_counter() - t0)


def measure_jax_pipeline(size: int, batch: int, steps: int, warmup: int, *,
                         loader_kind: str = "native",
                         gen_net: str = "resnet_9blocks") -> dict:
    """steps/sec with the REAL input pipeline feeding the chip (VERDICT.md
    round-1 item 3): synthetic corpus -> Loader (thread prefetch + C++ pixel
    kernels) or GrainLoader -> shard_batch -> jitted step, using the runner's
    actual path: persistent loaders + zip epoch pairing (VERDICT r2 item 4).
    Measures the end-to-end rate AND the pure-host batch production rate so
    input-bound configs are visible."""
    import jax

    from cyclegan_tpu.data.datasets import make_dataset, split_labeled
    from cyclegan_tpu.data.loader import Loader, paired_iterator
    from cyclegan_tpu.parallel import make_mesh, replicate_state, shard_batch, jit_step
    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", gen_net=gen_net,
                 crop_height=size, crop_width=size, batch_size=batch,
                 bf16=True, epochs=200, decay_epoch=100)
    n_items = max(4 * batch * (steps + warmup) // 7, 16)
    ds = make_dataset("synthetic", size=n_items)
    # Larger-than-crop synthetic sources so crop/flip/normalize do real work.
    ds.synthetic_size_hw = (size + 64, size + 64)
    lab_ds, unlab_ds = split_labeled(ds, 0.5, seed=0)
    if loader_kind == "grain":
        from cyclegan_tpu.data.grain_loader import GrainLoader

        mk = lambda d, s: GrainLoader(d, batch_size=batch,
                                      crop_hw=(size, size), train=True, seed=s)
    elif loader_kind == "native":
        mk = lambda d, s: Loader(d, batch_size=batch, crop_hw=(size, size),
                                 train=True, seed=s, prefetch=8)
    else:
        raise ValueError(f"unknown loader {loader_kind!r} (native|grain)")
    lab_loader, unlab_loader = mk(lab_ds, 0), mk(unlab_ds, 1)
    trainer = CycleGANTrainer(cfg, 21, 3, steps_per_epoch=100)
    mesh = make_mesh(1)
    state = replicate_state(trainer.init_state(jax.random.PRNGKey(0)), mesh)
    step = jit_step(trainer.train_step)

    def stream():
        # The runner's shape: loaders built ONCE, zip-paired per epoch
        # (epoch ends at the shorter stream — reference semantics).
        e = 0
        while True:
            for lab_b, unlab_b in paired_iterator(lab_loader, unlab_loader,
                                                  e, mode="zip"):
                yield {"lab_image": lab_b["image"],
                       "lab_label": lab_b["label"],
                       "unlab_image": unlab_b["image"]}
            e += 1

    # Host-only rate: how fast can the pipeline produce batches?
    it = stream()
    for _ in range(2):
        next(it)  # warm caches
    t0 = time.perf_counter()
    host_batches = max(steps // 2, 4)
    for _ in range(host_batches):
        next(it)
    host_rate = host_batches / (time.perf_counter() - t0)

    # End-to-end: pipeline feeds the jitted step with 2-deep device prefetch.
    it = stream()
    m = None
    q = []
    for _ in range(warmup):
        q.append(shard_batch(next(it), mesh))
        if len(q) >= 2:
            state, m = step(state, q.pop(0))
    if m is not None:
        jax.device_get(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        q.append(shard_batch(next(it), mesh))
        if len(q) >= 2:
            state, m = step(state, q.pop(0))
    while q:
        state, m = step(state, q.pop(0))
    jax.device_get(m)
    e2e = steps / (time.perf_counter() - t0)
    return {"steps_per_sec_e2e": e2e, "host_batches_per_sec": host_rate}


def measure_jax_supervised(size: int, batch: int, steps: int, warmup: int, *,
                           gen_net: str = "resnet_6blocks",
                           classes: int = 21, scan: int = 1,
                           grad_accum: int = 1) -> float:
    """BASELINE config 1: supervised-only CE seg step (the minimum slice).

    ``scan``/``grad_accum`` mirror the semi-sup bench: steps_per_call
    batches K optimizer updates into one device program (the dispatch-
    overhead amortizer — at ~3–4 ms/step this config is the most dispatch-
    bound in the suite), grad_accum folds K microbatches into one update.
    """
    import jax

    from cyclegan_tpu.parallel import (
        make_mesh, replicate_state, shard_batch, jit_step, select_step)
    from cyclegan_tpu.train.supervised import SupervisedTrainer
    from cyclegan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", gen_net=gen_net, crop_height=size,
                 crop_width=size, batch_size=batch, bf16=True,
                 epochs=100, decay_epoch=50,
                 steps_per_call=scan, grad_accum=grad_accum)
    tr = SupervisedTrainer(cfg, classes, 3, steps_per_epoch=100)
    mesh = make_mesh(1)
    state = replicate_state(tr.init_state(jax.random.PRNGKey(0)), mesh)
    step = jit_step(select_step(tr, scan, grad_accum))
    rng = jax.random.PRNGKey(1)
    stack = scan if scan > 1 else grad_accum
    lead = () if stack <= 1 else (stack,)
    batch_d = shard_batch({
        "image": jax.random.uniform(rng, lead + (batch, size, size, 3),
                                    minval=-1, maxval=1),
        "label": jax.random.randint(rng, lead + (batch, size, size), 0,
                                    classes),
    }, mesh, leading_stack=stack > 1)
    m = None
    for _ in range(warmup):
        state, m = step(state, batch_d)
    jax.device_get(m if m is not None else jax.tree.leaves(state.params)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch_d)
    jax.device_get(m)
    jax.device_get(jax.tree.leaves(state.params)[0])
    return steps * max(scan, 1) / (time.perf_counter() - t0)


def measure_jax_inference(size: int, batch: int, steps: int, warmup: int, *,
                          classes: int = 21,
                          gen_net: str = "resnet_9blocks") -> float:
    """Inference/test-path throughput (SURVEY.md §3c): segmentation forward
    + argmax, images/sec."""
    import jax

    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", gen_net=gen_net, crop_height=size,
                 crop_width=size, batch_size=batch, bf16=True)
    tr = CycleGANTrainer(cfg, classes, 3, steps_per_epoch=1)
    state = tr.init_state(jax.random.PRNGKey(0))
    predict = jax.jit(tr.predict)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3),
                           minval=-1, maxval=1)
    p = None
    for _ in range(warmup):
        p = predict(state.g_i2l, x)
    jax.device_get(p.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        p = predict(state.g_i2l, x)
    jax.device_get(p.ravel()[0])
    return steps * batch / (time.perf_counter() - t0)


def _probe_tpu(timeout_s: int = 120) -> bool:
    """Probe the tunnel in a SUBPROCESS with a hard timeout. The axon
    tunnel has two failure modes: fast RuntimeError ("Backend 'axon' is
    not in the list of known backends") and a silent HANG inside
    jax.devices() (observed 40+ min with ~0 CPU) — only a bounded
    subprocess survives the second."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and "cpu" not in r.stdout.strip().lower()


def _resolve_platform(retries: int = 8, wait_s: int = 45) -> str:
    """TPU if the axon tunnel registers, else CPU. The tunnel flaps with
    multi-minute outages; retry ~10 min (fast-failure mode) before giving
    up — a CPU fallback records a meaningless number if this is the
    round's official bench run, so patience is cheap. Each attempt is a
    bounded subprocess probe (120 s cap — the tunnel's second failure mode
    is a silent hang) followed by the in-process registration only once a
    probe succeeds; worst-case hang-mode wall is ~21 min."""
    import time as _time

    import jax

    for attempt in range(retries):
        if _probe_tpu():
            try:
                return jax.devices()[0].platform
            except RuntimeError:
                pass  # flapped between probe and registration
        if attempt < retries - 1:
            _time.sleep(wait_s)
    jax.config.update("jax_platforms", "cpu")
    from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache

    pin_cpu_compile_cache()
    return "cpu-fallback"


def _is_transient_tpu_error(exc: BaseException) -> bool:
    """The axon tunnel's third failure mode (after fast-RuntimeError and
    silent hang): a mid-run "TPU backend error (Internal)" / UNAVAILABLE
    from a live backend. Observed 2026-08-19; a 60 s-backoff retry in a
    fresh process succeeded. Match tunnel-shaped signatures only — bare
    "internal"/"backend"/"connection" also appear in deterministic XLA
    errors, and classifying those as transient costs two full re-exec
    probe ladders (~an hour) before the real error surfaces. main()
    additionally gates on the run having resolved to a TPU platform."""
    s = repr(exc).lower()
    return any(k in s for k in
               ("tpu backend error", "unavailable", "deadline exceeded",
                "socket closed", "connection reset", "connection refused",
                "failed to connect"))


def _reexec_with_backoff(attempt: int, wait_s: int = 60) -> None:
    """Re-exec bench.py with a fresh backend (an in-process retry can't
    recover a wedged tunnel client). Preserves argv; bounds via --_attempt."""
    import os
    import sys

    argv = [a for i, a in enumerate(sys.argv[1:])
            if a != "--_attempt" and not a.startswith("--_attempt=")
            and (i == 0 or sys.argv[1:][i - 1] != "--_attempt")]
    time.sleep(wait_s)
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)]
             + argv + ["--_attempt", str(attempt + 1)])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256, help="crop height")
    ap.add_argument("--width", type=int, default=None,
                    help="crop width (default: square); 512x256 Cityscapes "
                         "config = --size 256 --width 512")
    ap.add_argument("--channels", type=int, default=3,
                    help="input channels (1 = ACDC grayscale config)")
    ap.add_argument("--classes", type=int, default=21)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--measure-baseline", action="store_true",
                    help="re-measure the torch-CPU denominator (slow)")
    ap.add_argument("--pipeline", action="store_true",
                    help="feed the step through the real Loader (host "
                         "pipeline + C++ pixel kernels) instead of "
                         "device-resident synthetic tensors")
    ap.add_argument("--supervised", action="store_true",
                    help="BASELINE config 1: supervised-only CE step "
                         "(ResNet-6) instead of the full semi-sup system")
    ap.add_argument("--gen_net", default=None,
                    help="generator family (resnet_9blocks|resnet_6blocks|"
                         "unet_128|unet_256); default resnet_9blocks, or "
                         "resnet_6blocks for --supervised (config 1)")
    ap.add_argument("--inference", action="store_true",
                    help="test-path throughput: seg forward + argmax img/s")
    ap.add_argument("--loader", default="native", choices=["native", "grain"],
                    help="input pipeline backend for --pipeline mode")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize generator trunks (large-batch HBM "
                         "relief; the round-3 b32 attribution found XLA's "
                         "own remat pass firing at b32)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches accumulated per optimizer step "
                         "(effective batch grad_accum*batch at one "
                         "microbatch's activation memory)")
    ap.add_argument("--scan", type=int, default=1,
                    help="steps per device call (lax.scan multi-step "
                         "batching; amortizes launch/scheduling at small "
                         "batch)")
    ap.add_argument("--_attempt", type=int, default=0, help=argparse.SUPPRESS)
    args = ap.parse_args()

    try:
        _dispatch(args)
    except Exception as exc:
        # Never re-exec a CPU(-fallback) run: its failures are deterministic
        # (no tunnel in the path), and a retry would just repeat the ~10-min
        # probe ladder before failing identically.
        on_tpu = "cpu" not in (_RESOLVED_PLATFORM or "cpu")
        if args._attempt < 2 and on_tpu and _is_transient_tpu_error(exc):
            import sys
            import traceback

            traceback.print_exc()
            print(f"bench: transient TPU error, re-exec attempt "
                  f"{args._attempt + 1} after 60 s backoff", file=sys.stderr)
            _reexec_with_backoff(args._attempt)
        raise


_RESOLVED_PLATFORM: str | None = None  # set by _dispatch for main()'s
# transient-retry gate (re-exec only makes sense for tunnel-backed runs)


def _dispatch(args) -> None:
    global _RESOLVED_PLATFORM
    platform = _RESOLVED_PLATFORM = _resolve_platform()
    # Resolve the family per mode ONLY when not explicitly requested (an
    # explicit --gen_net is always honored — advisor r3).
    gen_net = args.gen_net or (
        "resnet_6blocks" if args.supervised else "resnet_9blocks")
    if platform == "cpu-fallback":
        # TPU tunnel down: bound wall time (CPU compile of the full ResNet-9
        # step takes ~20 min) — shrink to a clearly-labeled degraded config.
        args.steps, args.warmup = 2, 1
        args.size, args.width = 128, None
        gen_net = "resnet_6blocks"

    def _tag(default: str) -> str:
        """Metric-name suffix naming the generator family when non-default."""
        return "" if gen_net == default else f"_{gen_net}"

    if args.inference:
        ips = measure_jax_inference(args.size, args.batch, args.steps,
                                    args.warmup, classes=args.classes,
                                    gen_net=gen_net)
        print(json.dumps({
            "metric": f"inference_images_per_sec_{args.size}x{args.size}"
                      f"_b{args.batch}{_tag('resnet_9blocks')}",
            "value": round(ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "platform": platform,
        }))
        return

    if args.supervised:
        sps = measure_jax_supervised(args.size, args.batch, args.steps,
                                     args.warmup, classes=args.classes,
                                     gen_net=gen_net, scan=args.scan,
                                     grad_accum=args.grad_accum)
        print(json.dumps({
            "metric": f"supervised_train_steps_per_sec_{args.size}x"
                      f"{args.size}_b{args.batch}{_tag('resnet_6blocks')}"
                      f"{f'_scan{args.scan}' if args.scan > 1 else ''}"
                      f"{f'_ga{args.grad_accum}' if args.grad_accum > 1 else ''}",
            "value": round(sps, 4),
            "unit": "steps/sec/chip",
            "vs_baseline": None,
            "platform": platform,
        }))
        return

    if args.pipeline:
        r = measure_jax_pipeline(args.size, args.batch, args.steps,
                                 args.warmup, loader_kind=args.loader,
                                 gen_net=gen_net)
        loader_tag = "" if args.loader == "native" else f"_{args.loader}"
        print(json.dumps({
            "metric": f"cyclegan_pipeline_steps_per_sec_{args.size}x"
                      f"{args.size}_b{args.batch}{_tag('resnet_9blocks')}"
                      f"{loader_tag}",
            "value": round(r["steps_per_sec_e2e"], 4),
            "unit": "steps/sec/chip",
            "vs_baseline": None,
            "platform": platform,
            "host_batches_per_sec": round(r["host_batches_per_sec"], 2),
        }))
        return

    baseline = TORCH_CPU_BASELINE_SPS
    if args.measure_baseline or baseline is None:
        from tools.torch_reference import measure as torch_measure

        baseline = torch_measure(args.size, args.batch, steps=2, warmup=1)
        with open(__file__.replace("bench.py", "BASELINE_MEASURED.json"), "w") as f:
            json.dump({"torch_cpu_steps_per_sec": baseline, "size": args.size,
                       "batch": args.batch}, f)

    sps = measure_jax(args.size, args.batch, args.steps, args.warmup,
                      width=args.width, channels=args.channels,
                      classes=args.classes, gen_net=gen_net,
                      remat=args.remat, scan=args.scan,
                      grad_accum=args.grad_accum)
    w = args.width or args.size
    # The torch-CPU denominator was measured at 256x256 b1 rgb with the
    # PLAIN step — only report a ratio when the config matches it exactly
    # (no scan/remat variants).
    comparable = (args.size == w == 256 and args.batch == 1
                  and args.channels == 3 and args.classes == 21
                  and gen_net == "resnet_9blocks"
                  and args.scan <= 1 and args.grad_accum <= 1
                  and not args.remat)
    variant = (f"{_tag('resnet_9blocks')}"
               f"{f'_scan{args.scan}' if args.scan > 1 else ''}"
               f"{f'_ga{args.grad_accum}' if args.grad_accum > 1 else ''}"
               f"{'_remat' if args.remat else ''}")
    result = {
        "metric": f"cyclegan_train_steps_per_sec_{args.size}x{w}"
                  f"_b{args.batch}{variant}",
        "value": round(sps, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(sps / baseline, 3) if (baseline and comparable) else None,
        "platform": platform,
    }
    if platform == "cpu-fallback":
        result["note"] = ("TPU tunnel unavailable; degraded CPU config "
                          "(resnet_6blocks 128x128). Real-TPU reference: "
                          "24.15-25.08 steps/s at 256x256 b1 = ~507x baseline "
                          "(BASELINE.md round-3 refresh, 2026-08-17)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
