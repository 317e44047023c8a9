"""Summarize a training run's metrics JSONL for the soak protocol
(VERDICT r4 item 2): sustained steps/s, loss finiteness/health, and the
checkpoint/resume inventory, as one JSON line for BASELINE.md.

Run: python tools/soak_summary.py RESULTS_DIR [CKPT_DIR]
"""

from __future__ import annotations

import json
import math
import os
import sys


def summarize(results_dir: str, ckpt_dir: str | None = None) -> dict:
    path = os.path.join(results_dir, "train_metrics.jsonl")
    rows = [json.loads(ln) for ln in open(path) if ln.strip()]
    if not rows:
        raise SystemExit(f"no metric rows in {path}")
    losses = {}
    bad = 0
    for r in rows:
        for k, v in r.get("metrics", r).items():
            if isinstance(v, (int, float)):
                if not math.isfinite(v):
                    bad += 1
                losses.setdefault(k, []).append(v)
    sps = [r["steps_per_sec"] for r in rows
           if isinstance(r.get("steps_per_sec"), (int, float))]
    # Drop each epoch's first log interval (epoch timer restarts include
    # validation/checkpoint stalls and the compile on interval 1).
    seen_epochs, sustained = set(), []
    for r in rows:
        e = r.get("epoch")
        if isinstance(r.get("steps_per_sec"), (int, float)):
            if e in seen_epochs:
                sustained.append(r["steps_per_sec"])
            seen_epochs.add(e)
    use = sustained or sps
    out = {
        "rows": len(rows),
        "final_step": rows[-1].get("step"),
        "epochs_seen": sorted({r.get("epoch") for r in rows}),
        "nonfinite_values": bad,
        "steps_per_sec": {
            "min": round(min(use), 2), "max": round(max(use), 2),
            "mean": round(sum(use) / len(use), 2),
            "last": round(use[-1], 2), "n": len(use)},
    }
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
