"""Confusion-matrix / scores tests vs a straightforward numpy re-derivation
(the reference's `_fast_hist`-style eval — SURVEY.md §2 "Eval metrics")."""

import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.train import metrics


def _np_hist(pred, label, n, ignore=255):
    valid = (label != ignore) & (label < n)
    return np.bincount(
        n * label[valid].astype(int) + pred[valid].astype(int), minlength=n * n
    ).reshape(n, n)


class TestConfusionMatrix:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pred = rng.integers(0, 5, (2, 16, 16))
        label = rng.integers(0, 5, (2, 16, 16))
        label[0, :2] = 255
        ref = _np_hist(pred, label, 5)
        got = np.asarray(metrics.confusion_matrix(
            jnp.asarray(pred), jnp.asarray(label), 5))
        np.testing.assert_array_equal(got, ref)

    def test_uint8_inputs_do_not_overflow(self):
        """uint8 preds/labels (uint8-output serving artifacts, palette-PNG
        mask reads) must histogram identically to int32 — the flattening
        label*n+pred exceeds 255 and must not wrap."""
        rng = np.random.default_rng(3)
        pred = rng.integers(0, 21, (2, 16, 16)).astype(np.uint8)
        label = rng.integers(0, 21, (2, 16, 16)).astype(np.uint8)
        label[0, :2] = 255
        got = np.asarray(metrics.confusion_matrix(
            jnp.asarray(pred), jnp.asarray(label), 21))
        np.testing.assert_array_equal(got, _np_hist(pred, label, 21))

    def test_perfect_prediction(self):
        label = np.random.default_rng(1).integers(0, 4, (8, 8))
        hist = metrics.confusion_matrix(jnp.asarray(label), jnp.asarray(label), 4)
        s = metrics.scores(hist)
        assert float(s["pixel_acc"]) == 1.0
        assert float(s["miou"]) == 1.0

    def test_scores_known_values(self):
        # 2-class: gt [0,0,1,1], pred [0,1,1,1]
        hist = metrics.confusion_matrix(
            jnp.asarray([0, 1, 1, 1]), jnp.asarray([0, 0, 1, 1]), 2,
            ignore_index=None)
        s = metrics.scores(hist)
        assert abs(float(s["pixel_acc"]) - 0.75) < 1e-6
        # IoU class0 = 1/2, class1 = 2/3 -> mIoU = 7/12
        assert abs(float(s["miou"]) - 7 / 12) < 1e-6

    def test_absent_class_excluded_from_miou(self):
        hist = metrics.confusion_matrix(
            jnp.asarray([0, 0]), jnp.asarray([0, 0]), 3, ignore_index=None)
        s = metrics.scores(hist)
        assert float(s["miou"]) == 1.0  # classes 1,2 absent -> excluded
