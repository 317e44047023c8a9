"""Smoke coverage for bench.py — the driver-run benchmark artifact.

The driver executes ``python bench.py`` at the end of every round and
records its single JSON line; a crash there loses the round's official
number. These tests drive every measurement function at tiny shapes on
CPU (conftest forces the platform) and pin the one-JSON-line contract of
``main()`` with the platform probe stubbed out, so a refactor that breaks
an argument path or the output schema fails here first.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


@pytest.mark.slow
def test_measure_jax_semisup_variants():
    # Plain, scan-batched, and grad-accum forms of the headline metric all
    # execute and report a positive optimizer-steps/sec rate.
    for kw in ({}, {"scan": 2}, {"grad_accum": 2}):
        sps = bench.measure_jax(32, 1, steps=1, warmup=0, classes=4,
                                gen_net="resnet_6blocks", **kw)
        assert sps > 0, kw


def test_measure_jax_supervised_variants():
    for kw in ({}, {"scan": 2}, {"grad_accum": 2}):
        sps = bench.measure_jax_supervised(32, 1, steps=2, warmup=1,
                                           classes=4, **kw)
        assert sps > 0, kw


def test_measure_jax_inference():
    ips = bench.measure_jax_inference(32, 2, steps=2, warmup=1, classes=4,
                                      gen_net="resnet_6blocks")
    assert ips > 0


@pytest.mark.slow
def test_measure_jax_pipeline_reports_both_rates():
    r = bench.measure_jax_pipeline(32, 1, steps=2, warmup=1,
                                   gen_net="resnet_6blocks")
    assert r["steps_per_sec_e2e"] > 0
    assert r["host_batches_per_sec"] > 0


def _run_main(monkeypatch, capsys, argv):
    monkeypatch.setattr(bench, "_resolve_platform", lambda: "cpu")
    monkeypatch.setattr(sys, "argv", ["bench.py"] + argv)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1, "bench.py must print exactly ONE JSON line"
    return json.loads(lines[0])


def test_main_supervised_json_contract(monkeypatch, capsys):
    d = _run_main(monkeypatch, capsys,
                  ["--supervised", "--size", "32", "--classes", "4",
                   "--steps", "2", "--warmup", "1", "--scan", "2"])
    assert set(d) >= {"metric", "value", "unit", "vs_baseline", "platform"}
    assert d["metric"] == "supervised_train_steps_per_sec_32x32_b1_scan2"
    assert d["value"] > 0
    assert d["vs_baseline"] is None  # denominator is the 256^2 b1 config only


def test_main_inference_json_contract(monkeypatch, capsys):
    d = _run_main(monkeypatch, capsys,
                  ["--inference", "--size", "32", "--classes", "4",
                   "--gen_net", "resnet_6blocks", "--steps", "2",
                   "--warmup", "1"])
    assert d["metric"] == "inference_images_per_sec_32x32_b1_resnet_6blocks"
    assert d["unit"] == "images/sec/chip"


def test_transient_error_triggers_bounded_reexec(monkeypatch):
    # A mid-run tunnel "Internal" error on a TPU-resolved run must re-exec
    # with --_attempt+1 (fresh backend); a third failure must propagate.
    recorded = {}

    def tpu_then_boom(a):
        bench._RESOLVED_PLATFORM = "tpu"
        raise RuntimeError("INTERNAL: TPU backend error")

    monkeypatch.setattr(bench, "_dispatch", tpu_then_boom)
    monkeypatch.setattr(bench, "_reexec_with_backoff",
                        lambda attempt, wait_s=60: recorded.update(
                            attempt=attempt) or (_ for _ in ()).throw(
                            SystemExit(0)))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--size", "32"])
    with pytest.raises(SystemExit):
        bench.main()
    assert recorded["attempt"] == 0

    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--size", "32", "--_attempt", "2"])
    with pytest.raises(RuntimeError, match="INTERNAL"):
        bench.main()  # retry budget exhausted -> raises, no re-exec

    # Non-transient errors propagate immediately, no re-exec.
    monkeypatch.setattr(bench, "_dispatch",
                        lambda a: (_ for _ in ()).throw(ValueError("shape")))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--size", "32"])
    with pytest.raises(ValueError):
        bench.main()

    # A CPU(-fallback) run never re-execs: no tunnel in the path means the
    # failure is deterministic, and the retry would only repeat the ~10-min
    # probe ladder. Same error text as the TPU case — only the platform
    # gate differs.
    def cpu_then_boom(a):
        bench._RESOLVED_PLATFORM = "cpu-fallback"
        raise RuntimeError("INTERNAL: TPU backend error")

    monkeypatch.setattr(bench, "_dispatch", cpu_then_boom)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--size", "32"])
    with pytest.raises(RuntimeError, match="INTERNAL"):
        bench.main()

    # Deterministic XLA errors that merely CONTAIN scary words ("internal",
    # "backend") are not transient-matched (the narrow signature list).
    assert not bench._is_transient_tpu_error(
        RuntimeError("INTERNAL: during compilation"))
    assert not bench._is_transient_tpu_error(
        RuntimeError("no backend found"))
    assert bench._is_transient_tpu_error(
        RuntimeError("UNAVAILABLE: socket closed"))


def test_reexec_strips_prior_attempt_flag(monkeypatch):
    calls = {}
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--size", "32", "--_attempt", "1"])
    monkeypatch.setattr(bench.time, "sleep", lambda s: calls.update(slept=s))

    def fake_execv(exe, argv):
        calls["argv"] = argv
        raise SystemExit(0)

    import os

    monkeypatch.setattr(os, "execv", fake_execv)
    with pytest.raises(SystemExit):
        bench._reexec_with_backoff(1)
    assert calls["slept"] == 60
    tail = calls["argv"][2:]  # [python, bench.py, ...]
    assert tail == ["--size", "32", "--_attempt", "2"]


@pytest.mark.slow
def test_vs_baseline_only_for_plain_flagship_config(monkeypatch, capsys):
    # A non-flagship semisup variant must not claim a ratio against the
    # 256^2 b1 torch-CPU denominator (CLAUDE.md invariant).
    monkeypatch.setattr(bench, "TORCH_CPU_BASELINE_SPS", 0.05)
    d = _run_main(monkeypatch, capsys,
                  ["--size", "32", "--classes", "4", "--gen_net",
                   "resnet_6blocks", "--steps", "1", "--warmup", "0",
                   "--scan", "2"])
    assert d["metric"] == "cyclegan_train_steps_per_sec_32x32_b1_resnet_6blocks_scan2"
    assert d["vs_baseline"] is None
