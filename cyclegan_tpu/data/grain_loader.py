"""Grain-backed input pipeline (the [B] north-star names "a tf.data/Grain
loader feeding device-resident batches"; SURVEY.md §1 L3).

Drop-in alternative to :class:`cyclegan_tpu.data.loader.Loader` built on
``grain.python.DataLoader``, and — since round 3 — **stream-equivalent** to
it (VERDICT r2 item 4): the epoch permutation comes from the same
``np.random.default_rng((seed, epoch))`` draw, augment RNG is seeded per
``(seed, epoch, global_position)``, and multi-host sharding slices batch
*rows* exactly like Loader. The same ``--seed`` therefore trains on the
bit-identical global batch stream under either ``--loader`` and any process
count (asserted by tests/test_loader_equivalence.py). Grain contributes the
worker-process execution engine, not the sampling semantics: the order and
positions are precomputed per epoch and grain runs a sequential sampler over
them.

Select with ``Config.loader = "grain"`` (default "native").
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

import grain.python as gp

from cyclegan_tpu.data.datasets import SegmentationDataset
from cyclegan_tpu.data.transforms import eval_transform, train_transform


class _EpochSource(gp.RandomAccessDataSource):
    """One epoch's precomputed (dataset index, global position) sequence."""

    def __init__(self, ds: SegmentationDataset, order: np.ndarray,
                 positions: np.ndarray):
        self._ds = ds
        self._order = order
        self._positions = positions

    def __len__(self) -> int:
        return len(self._order)

    def __getitem__(self, idx: int):
        img, lab = self._ds.get(int(self._order[idx]))
        return {"image": img, "label": lab, "pos": int(self._positions[idx])}


class _Transform(gp.MapTransform):
    """Deterministic map: augment RNG keyed by (seed, epoch, position) — the
    same contract as Loader._sample_rng, NOT grain's per-record RNG (which
    would give a different training stream per loader backend)."""

    def __init__(self, crop_hw, train, resize_hw, seed, epoch,
                 eval_mode="resize"):
        self._crop_hw = crop_hw
        self._train = train
        self._resize_hw = resize_hw
        self._seed = seed
        self._epoch = epoch
        self._eval_mode = eval_mode

    def map(self, record):
        img, lab = record["image"], record["label"]
        if self._train:
            rng = np.random.default_rng(
                (self._seed, self._epoch, record["pos"]))
            img, lab = train_transform(img, lab, crop_hw=self._crop_hw,
                                       rng=rng, resize_hw=self._resize_hw)
        else:
            img, lab = eval_transform(img, lab, crop_hw=self._crop_hw,
                                      mode=self._eval_mode)
        out = {"image": img}
        if lab is not None:
            out["label"] = lab.astype(np.int32)
        return out


class GrainLoader:
    """Epoch-aware batch iterator matching Loader's interface and stream."""

    def __init__(
        self,
        ds: SegmentationDataset,
        *,
        batch_size: int,
        crop_hw: tuple[int, int],
        train: bool = True,
        seed: int = 0,
        resize_hw: tuple[int, int] | None = None,
        drop_last: bool = True,
        num_workers: int = 0,
        shard_by_process: bool = False,
        process_shard: tuple[int, int] | None = None,
        eval_mode: str = "resize",
    ):
        self.ds = ds
        self.batch_size = batch_size  # GLOBAL batch size (all processes)
        self.crop_hw = crop_hw
        self.train = train
        self.seed = seed
        self.resize_hw = resize_hw
        if eval_mode not in ("resize", "center_crop"):
            raise ValueError(
                f"unknown eval_mode {eval_mode!r} (resize|center_crop)")
        self.eval_mode = eval_mode
        self.drop_last = drop_last
        self.num_workers = num_workers
        if shard_by_process and process_shard is None:
            import jax

            process_shard = (jax.process_index(), jax.process_count())
        p, count = process_shard or (0, 1)
        if batch_size % count:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"process_count {count}")
        self._proc, self._nproc = p, count
        self._rows = batch_size // count  # per-process batch rows
        self._epoch = 0

    def steps_per_epoch(self) -> int:
        """Batches per epoch (global semantics, identical to Loader)."""
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int | None = None) -> Iterator[dict]:
        """Iterate one epoch; deterministic given (seed, epoch) and — for the
        assembled global batch — identical to Loader's for any process count."""
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        rng = np.random.default_rng((self.seed, e))
        idxs = (rng.permutation(len(self.ds)) if self.train
                else np.arange(len(self.ds)))
        nb = self.steps_per_epoch()
        lo = self._proc * self._rows  # this process's rows within each batch
        order, positions = [], []
        for k in range(nb):
            glob = idxs[k * self.batch_size + lo:
                        k * self.batch_size + lo + self._rows]
            order.append(glob)
            positions.append(np.arange(k * self.batch_size + lo,
                                       k * self.batch_size + lo + len(glob)))
        order = (np.concatenate(order) if order
                 else np.zeros((0,), np.int64))
        positions = (np.concatenate(positions) if positions
                     else np.zeros((0,), np.int64))
        if len(order) == 0:
            # A process whose row range is entirely final-batch padding:
            # grain's IndexSampler rejects num_records=0, so skip it and
            # emit the all-pad batches directly (matches Loader).
            for _ in range(nb):
                yield self._pad_batch(self._empty_batch())
            return
        sampler = gp.IndexSampler(
            num_records=len(order),
            shuffle=False,  # order/sharding precomputed above
            seed=0,
            num_epochs=1,
            shard_options=gp.NoSharding(),
        )
        loader = gp.DataLoader(
            data_source=_EpochSource(self.ds, order, positions),
            sampler=sampler,
            # NOTE: batching happens HERE, not via gp.Batch — grain runs
            # operations inside each worker process, so an in-pipeline
            # Batch would group worker-LOCAL record subsequences and the
            # stream would differ per worker_count. Records come back in
            # deterministic global order (grain's round-robin reassembly);
            # stacking them here keeps the stream identical for any
            # worker_count (tests/test_loader_equivalence.py).
            operations=[
                _Transform(self.crop_hw, self.train, self.resize_hw,
                           self.seed, e, self.eval_mode),
            ],
            worker_count=self.num_workers,
        )
        yielded = 0
        buf: list = []

        def emit(records):
            out = {"image": np.stack([r["image"] for r in records])}
            if all("label" in r for r in records):
                out["label"] = np.stack([r["label"] for r in records])
            return out

        for rec in loader:
            buf.append(rec)
            if len(buf) == self._rows:
                yield self._pad_batch(emit(buf))
                yielded += 1
                buf = []
        if buf:
            yield self._pad_batch(emit(buf))
            yielded += 1
            buf = []
        # A process whose row range falls entirely inside the padding of a
        # short final eval batch gets nothing from grain — emit all-pad
        # batches so every process yields steps_per_epoch() batches.
        while yielded < nb:
            yield self._pad_batch(self._empty_batch())
            yielded += 1

    def _empty_batch(self) -> dict:
        from cyclegan_tpu.data.loader import empty_batch

        return empty_batch(self.crop_hw, self.ds.in_channels)

    def _pad_batch(self, batch: dict) -> dict:
        from cyclegan_tpu.data.loader import pad_batch

        return pad_batch(batch, self._rows)
