"""Attribute a jax.profiler device trace to model regions.

Joins the XLA-Ops timeline of a trace produced by
``tools/profile_tpu.py --trace DIR`` against the op metadata of the
compiled step's optimized HLO (``jitted.lower(...).compile().as_text()``),
then aggregates device time per model region (trunk/stem/head/D/...).

This is how the round-2 perf work found the space-to-batch conv pathology
(docs/KERNELS.md). Usage:

  python tools/profile_tpu.py --steps 10 --trace /tmp/trace
  python tools/dump_hlo.py --out /tmp/step.hlo        # or any as_text dump
  python tools/attribute_trace.py /tmp/trace /tmp/step.hlo [--steps 10]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys


def load_trace_ops(trace_dir: str) -> list[dict]:
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(files)[-1]) as fh:
        data = json.load(fh)
    # device pid: process named like /device:TPU:0
    pids = {e["pid"] for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))}
    tids = {(e["pid"], e["tid"]) for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == "XLA Ops"}
    return [e for e in data["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") in pids
            and (e["pid"], e["tid"]) in tids]


def load_hlo_metadata(hlo_path: str) -> dict[str, str]:
    pat = re.compile(r"%?([a-zA-Z0-9_.\-]+) = .*?metadata=\{op_name=\"([^\"]+)\"")
    meta = {}
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                meta[m.group(1)] = m.group(2)
    return meta


def region(op_name: str | None) -> str:
    if op_name is None:
        return "unattributed"
    s = "bwd" if "transpose(jvp" in op_name else "fwd"
    for key, label in (("ResidualBlock", "trunk"), ("ConvBlock_0", "stem"),
                       ("ConvBlock_3", "head"), ("DeconvBlock", "ups"),
                       ("ConvBlock", "downs"), ("Discriminator", "D"),
                       ("NLayer", "D")):
        if key in op_name:
            return f"{label} {s}"
    if any(k in op_name for k in ("softmax", "one_hot", "take_along", "log")):
        return "losses"
    return "misc"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("hlo")
    ap.add_argument("--steps", type=int, default=10,
                    help="traced step count (for ms/step)")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    ev = load_trace_ops(args.trace_dir)
    meta = load_hlo_metadata(args.hlo)
    total = sum(e["dur"] for e in ev)
    agg = collections.Counter()
    per_op = collections.Counter()
    for e in ev:
        op = meta.get(e["name"])
        agg[region(op)] += e["dur"]
        per_op[(e["name"], (op or "")[:90])] += e["dur"]

    print(f"{len(ev)} device ops, {total/1e3:.1f} ms total, "
          f"{total/1e3/args.steps:.2f} ms/step\n")
    for name, d in agg.most_common():
        print(f"{d/1e3/args.steps:8.2f} ms/step ({100*d/total:5.1f}%)  {name}")
    print(f"\ntop {args.top} ops:")
    for (n, op), d in per_op.most_common(args.top):
        print(f"{d/1e3/args.steps:8.2f} ms/step  {n[:30]:32s} {op}")


if __name__ == "__main__":
    main()
