"""Summarize a training run's metrics JSONL for the soak protocol
(VERDICT r4 item 2): sustained steps/s, stall inventory, loss health, and
the checkpoint/resume evidence, as one JSON line for BASELINE.md.

The runner's logged ``steps_per_sec`` is the EPOCH-CUMULATIVE average —
one compile or checkpoint stall dilutes every later reading of the epoch.
Sustained throughput here is computed from consecutive rows' wall-clock
``t`` deltas instead (rate = Δstep / Δt per log interval), with the
slowest intervals reported separately as stalls (compile, mid-epoch
device_get+Orbax commits).

Run: python tools/soak_summary.py RESULTS_DIR [CKPT_DIR]
"""

from __future__ import annotations

import json
import math
import os
import sys


def summarize(results_dir: str, ckpt_dir: str | None = None,
              stall_threshold_s: float = 10.0) -> dict:
    # Accept either the results directory or the metrics file itself.
    path = results_dir if os.path.isfile(results_dir) \
        else os.path.join(results_dir, "train_metrics.jsonl")
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    if not rows:
        raise SystemExit(f"no metric rows in {path}")
    losses = {}
    bad = 0
    for r in rows:
        for k, v in r.items():
            if k in ("t", "step", "epoch", "steps_per_sec"):
                continue
            if isinstance(v, (int, float)):
                if not math.isfinite(v):
                    bad += 1
                losses.setdefault(k, []).append(v)
    # Instantaneous per-interval rates from wall-clock deltas. `t` resets
    # when a run restarts (resume), so negative deltas split the phases.
    inst, stalls = [], []
    for a, b in zip(rows, rows[1:]):
        dt = b["t"] - a["t"]
        dstep = b["step"] - a["step"]
        if dt <= 0 or dstep <= 0:
            continue  # phase boundary (resume) or non-monotonic step reset
        if dt >= stall_threshold_s:
            stalls.append({"epoch": b.get("epoch"), "step": b.get("step"),
                           "seconds": round(dt, 1)})
        else:
            inst.append(dstep / dt)
    out = {
        "rows": len(rows),
        "epochs_seen": sorted({r.get("epoch") for r in rows}),
        "nonfinite_values": bad,
        "stalls_over_threshold": stalls,
    }
    if inst:
        inst_sorted = sorted(inst)
        out["sustained_steps_per_sec"] = {
            "min": round(inst_sorted[0], 2),
            "p50": round(inst_sorted[len(inst) // 2], 2),
            "p90": round(inst_sorted[int(len(inst) * 0.9)], 2),
            "max": round(inst_sorted[-1], 2),
            "n_intervals": len(inst)}
    for k in ("g_total", "d_total", "g_sup"):
        if k in losses:
            v = losses[k]
            out[f"{k}_first"] = round(v[0], 3)
            out[f"{k}_last"] = round(v[-1], 3)
            out[f"{k}_max"] = round(max(v), 3)
    if ckpt_dir and os.path.isdir(ckpt_dir):
        epochs = sorted(d for d in os.listdir(ckpt_dir) if d.isdigit())
        mid = os.path.join(ckpt_dir, "mid")
        mids = sorted(d for d in os.listdir(mid) if d.isdigit()) \
            if os.path.isdir(mid) else []
        out["epoch_ckpts"] = epochs
        out["mid_ckpts"] = mids
    return out


if __name__ == "__main__":
    ckpt = sys.argv[2] if len(sys.argv) > 2 else None
    print(json.dumps(summarize(sys.argv[1], ckpt)))
