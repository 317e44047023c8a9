"""Cross-loader stream equivalence (VERDICT r2 item 4).

The native Loader and the GrainLoader must feed the SAME training data for
the same --seed: identical epoch permutation (np.random.default_rng((seed,
epoch))), identical per-(seed, epoch, position) augment RNG, identical
row-sharding in multi-process runs. Without this, `--loader grain` would
silently train on a different stream and the golden-curve/bit-identity
guarantees would be native-only.
"""

import numpy as np

from cyclegan_tpu.data.datasets import make_dataset
from cyclegan_tpu.data.grain_loader import GrainLoader
from cyclegan_tpu.data.loader import Loader


def _epoch_batches(loader, e):
    return list(loader.epoch(e))


def test_train_stream_identical():
    ds = make_dataset("synthetic", size=10)
    kw = dict(batch_size=4, crop_hw=(32, 32), train=True, seed=7)
    nat = _epoch_batches(Loader(ds, **kw), 0)
    grn = _epoch_batches(GrainLoader(ds, **kw), 0)
    assert len(nat) == len(grn) == 2
    for a, b in zip(nat, grn):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])
    # and on a later epoch (different permutation + augment draws)
    nat1 = _epoch_batches(Loader(ds, **kw), 3)
    grn1 = _epoch_batches(GrainLoader(ds, **kw), 3)
    np.testing.assert_array_equal(nat1[0]["image"], grn1[0]["image"])
    assert not np.array_equal(nat[0]["image"], nat1[0]["image"])


def test_eval_stream_identical():
    ds = make_dataset("synthetic", split="val", size=5)
    kw = dict(batch_size=2, crop_hw=(32, 32), train=False, drop_last=False)
    nat = _epoch_batches(Loader(ds, **kw), 0)
    grn = _epoch_batches(GrainLoader(ds, **kw), 0)
    assert len(nat) == len(grn) == 3
    for a, b in zip(nat, grn):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_grain_process_shards_assemble_to_native_global_batch():
    """2-process grain row-shards concatenate to the single-process native
    global batch — the multi-host contract, loader-independent."""
    ds = make_dataset("synthetic", size=8)
    kw = dict(batch_size=4, crop_hw=(24, 24), train=True, seed=3)
    full = _epoch_batches(Loader(ds, **kw), 0)
    s0 = _epoch_batches(GrainLoader(ds, process_shard=(0, 2), **kw), 0)
    s1 = _epoch_batches(GrainLoader(ds, process_shard=(1, 2), **kw), 0)
    assert len(full) == len(s0) == len(s1)
    for f, a, b in zip(full, s0, s1):
        np.testing.assert_array_equal(
            f["image"], np.concatenate([a["image"], b["image"]]))
        np.testing.assert_array_equal(
            f["label"], np.concatenate([a["label"], b["label"]]))


def test_grain_empty_final_shard_pads():
    """A process whose rows fall entirely in final-batch padding still yields
    steps_per_epoch() batches (all-pad, ignore-label)."""
    ds = make_dataset("synthetic", split="val", size=3)
    kw = dict(batch_size=4, crop_hw=(16, 16), train=False, drop_last=False)
    s1 = _epoch_batches(GrainLoader(ds, process_shard=(1, 2), **kw), 0)
    assert len(s1) == 1
    assert s1[0]["image"].shape == (2, 16, 16, 3)
    assert np.all(s1[0]["label"][1] == 255)


def test_grain_worker_count_invariance():
    """worker_count must not change the stream: grain runs operations
    inside each worker, so batching lives OUTSIDE the pipeline (an
    in-pipeline gp.Batch would group worker-local subsequences — caught as
    a 73% batch mismatch during round 3)."""
    ds = make_dataset("synthetic", size=8)
    kw = dict(batch_size=4, crop_hw=(32, 32), train=True, seed=7)
    nat = _epoch_batches(Loader(ds, **kw), 0)
    w2 = _epoch_batches(GrainLoader(ds, num_workers=2, **kw), 0)
    assert len(nat) == len(w2)
    for a, b in zip(nat, w2):
        np.testing.assert_array_equal(a["image"], np.asarray(b["image"]))
        np.testing.assert_array_equal(a["label"], np.asarray(b["label"]))


def test_eval_center_crop_mode():
    """--eval_resize center_crop: aspect-preserving resize + center crop."""
    from cyclegan_tpu.data.transforms import eval_transform

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 80, 3), np.uint8)
    lab = rng.integers(0, 21, (40, 80), np.uint8)
    out, lout = eval_transform(img, lab, crop_hw=(32, 32), mode="center_crop")
    assert out.shape == (32, 32, 3) and lout.shape == (32, 32)
    # shorter side (H) resized to 32 => width 64, center crop cols 16:48
    import PIL.Image as Image

    ref = np.asarray(Image.fromarray(img).resize((64, 32), Image.BILINEAR))
    np.testing.assert_allclose(out, ref[:, 16:48].astype(np.float32) / 127.5 - 1)
    nat = Loader(make_dataset("synthetic", split="val", size=2),
                 batch_size=2, crop_hw=(16, 16), train=False,
                 drop_last=False, eval_mode="center_crop")
    grn = GrainLoader(make_dataset("synthetic", split="val", size=2),
                      batch_size=2, crop_hw=(16, 16), train=False,
                      drop_last=False, eval_mode="center_crop")
    a, b = next(nat.epoch(0)), next(grn.epoch(0))
    np.testing.assert_array_equal(a["image"], b["image"])
