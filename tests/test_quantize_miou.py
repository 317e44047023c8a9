"""Quantized-artifact METRIC cost is measured, not just bounded
(VERDICT r4 item 6): the same trained checkpoint exported f32 /
bf16-quantized / int8-quantized and served over the same fixture val set
must land within a documented mIoU budget of the f32 artifact.

Full-scale numbers (300 steps, 64², 21 classes) live in BASELINE.md round 5
via tools/quantize_miou_run.py; this CI leg runs the same pipeline at a
smaller scale (measured deltas there: 0.0000 for both modes — weight-only
quantization of instance-norm conv stacks is argmax-invariant at these
magnitudes, consistent with test_export_quantized.py's per-pixel agreement).
"""

import pytest

from tools.quantize_miou_run import train_and_measure


@pytest.mark.slow
def test_quantized_artifacts_hold_miou(tmp_path):
    res = train_and_measure(steps=40, size=32, ngf=8, batch=4, classes=21,
                            workdir=str(tmp_path))
    # Trained floor: the synthetic fixture's 300-step protocol level is
    # ~0.033 mIoU / 0.69 pixel-acc (untrained nets score ~0.007 / ~0.01) —
    # the deltas below are only meaningful on a trained checkpoint.
    assert res["miou_f32"] > 0.02 and res["pixel_acc_f32"] > 0.5, res
    # Documented budget: bf16 rounding is <= 2^-8 relative per weight and
    # int8 <= max|w|/254 per channel; on the fixture set both measure 0.0000
    # — the gate leaves headroom for seed drift without hiding a real break.
    assert abs(res["delta_bf16"]) <= 0.005, res
    assert abs(res["delta_int8"]) <= 0.01, res
    # The size wins that motivate quantization must hold too.
    assert res["bytes_bf16"] < 0.62 * res["bytes_f32"]
    assert res["bytes_int8"] < 0.40 * res["bytes_f32"]


@pytest.mark.slow
def test_existing_checkpoint_path_matches_freshly_trained(tmp_path):
    """checkpoint_dir= skips training and measures an EXISTING checkpoint
    (how the converged-soak numbers in BASELINE.md round 5 were produced):
    pointing it at the checkpoint the training path just wrote must yield
    byte-identical artifacts, hence identical scores."""
    first = train_and_measure(steps=8, size=32, ngf=8, batch=4, classes=21,
                              workdir=str(tmp_path / "a"))
    again = train_and_measure(steps=0, size=32, ngf=8, batch=4, classes=21,
                              workdir=str(tmp_path / "b"),
                              checkpoint_dir=str(tmp_path / "a" / "ckpt"))
    assert again["checkpoint"] and again["steps"] is None
    for k in ("miou_f32", "miou_bf16", "miou_int8",
              "pixel_acc_f32", "pixel_acc_bf16", "pixel_acc_int8"):
        assert again[k] == first[k], (k, first[k], again[k])
    for k in ("bytes_f32", "bytes_bf16", "bytes_int8"):
        # The manifest sidecar embeds config paths (results/work dirs differ
        # between the two invocations), so sizes differ by the path-string
        # delta only — the weights are identical (scores above are equal).
        assert abs(again[k] - first[k]) < 100, (k, first[k], again[k])
