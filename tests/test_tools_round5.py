"""Round-5 measurement tools: soak summarizer + HTTP load bench.

These are the harnesses behind BASELINE.md's round-5 soak and HTTP tables;
they must stay correct or the recorded numbers become unreproducible.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from tools.soak_summary import summarize

ROOT = Path(__file__).resolve().parent.parent


def _row(t, step, epoch, g=10.0, sps=5.0):
    return {"t": t, "step": step, "epoch": epoch, "g_total": g,
            "d_total": 1.0, "g_sup": 2.0, "steps_per_sec": sps}


def test_soak_summary_rates_stalls_and_phase_reset(tmp_path):
    """Instantaneous rates come from wall-clock deltas; intervals >= the
    stall threshold are inventoried instead of polluting the rate stats;
    a resume (t reset across processes) splits phases instead of producing
    a bogus negative-dt interval."""
    rows = [
        _row(10.0, 25, 0),
        _row(11.0, 50, 0),            # 25 steps/s
        _row(13.5, 75, 0),            # 10 steps/s
        _row(113.5, 100, 0, g=12.0),  # 100 s -> a stall (checkpoint save)
        _row(114.5, 125, 0),          # 25 steps/s
        # resume: new process, t restarts BELOW the previous value
        _row(5.0, 25, 1),
        _row(6.0, 50, 1, g=9.0),      # 25 steps/s
    ]
    res = tmp_path / "out"
    res.mkdir()
    with open(res / "train_metrics.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    s = summarize(str(res))
    assert s["rows"] == 7
    assert s["nonfinite_values"] == 0
    assert s["stalls_over_threshold"] == [
        {"epoch": 0, "step": 100, "seconds": 100.0}]
    rates = s["sustained_steps_per_sec"]
    # 4 clean intervals: 25, 10, 25, 25 (the stall and the phase reset
    # are excluded).
    assert rates["n_intervals"] == 4
    assert rates["min"] == 10.0 and rates["max"] == 25.0
    assert s["g_total_first"] == 10.0 and s["g_total_last"] == 9.0
    assert s["g_total_max"] == 12.0
    # The metrics file itself is accepted in place of its directory.
    assert summarize(str(res / "train_metrics.jsonl")) == s


def test_soak_summary_flags_nonfinite(tmp_path):
    res = tmp_path / "out"
    res.mkdir()
    with open(res / "train_metrics.jsonl", "w") as f:
        f.write(json.dumps(_row(1.0, 25, 0)) + "\n")
        f.write(json.dumps(dict(_row(2.0, 50, 0), g_total=float("nan")))
                + "\n")
    assert summarize(str(res))["nonfinite_values"] == 1


@pytest.fixture(scope="module")
def tiny_artifact(tmp_path_factory):
    from cyclegan_tpu import export as export_lib
    from cyclegan_tpu.train.cyclegan import CycleGANTrainer
    from cyclegan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=8,
                 ndf=8, bf16=False, crop_height=24, crop_width=24,
                 batch_size=1)
    tr = CycleGANTrainer(cfg, 21, 3, steps_per_epoch=1)
    st = tr.init_state(jax.random.PRNGKey(0))
    spec = jax.ShapeDtypeStruct(
        (export_lib._batch_dim("b"), 24, 24, 3), jnp.float32)
    ex = export_lib.export_closed(export_lib.uint8_output(tr.predict),
                                  st.g_i2l, spec, platforms=("cpu",))
    path = tmp_path_factory.mktemp("art") / "seg.shlo"
    export_lib.save_artifact(str(path), ex, manifest={
        "head": "segment", "num_classes": 21, "dataset": "synthetic",
        "gen_net": "resnet_6blocks"})
    return str(path)


def test_miou_parity_platform_knob():
    """--platform cpu (the default, CI-safe path) still pins jax to CPU and
    reports the platform it actually ran on — including the '=' argparse
    form, which the original argv-peek implementation silently mishandled
    (it left the platform at CPU while argparse believed 'default')."""
    r = subprocess.run(
        [sys.executable, "tools/miou_parity_run.py", "--steps", "2",
         "--size", "32", "--batch", "1", "--n_blocks", "1",
         "--platform=cpu"],
        capture_output=True, text=True, timeout=600, cwd=str(ROOT))
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["jax_platform"] == "cpu"
    assert abs(out["delta"]) <= 0.5  # the protocol gate, vacuously tiny here
    # A bad value is argparse's clean error.
    r = subprocess.run(
        [sys.executable, "tools/miou_parity_run.py", "--platform", "gpu"],
        capture_output=True, text=True, timeout=120, cwd=str(ROOT))
    assert r.returncode == 2 and "invalid choice" in r.stderr


def test_http_bench_cli(tiny_artifact):
    """The load bench drives the real endpoint end-to-end and reports a
    complete JSON record (req/s, percentiles, realized batch size)."""
    r = subprocess.run(
        [sys.executable, "tools/http_bench.py", tiny_artifact,
         "--clients", "3", "--requests", "4", "--max_batch", "4",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=str(ROOT))
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["clients"] == 3 and out["requests_per_client"] == 4
    assert out["req_per_s"] > 0
    assert out["latency_ms"]["p50"] <= out["latency_ms"]["p99"]
    assert 1.0 <= out["mean_batch"] <= 4.0
