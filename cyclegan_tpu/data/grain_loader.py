"""Grain-backed input pipeline (the [B] north-star names "a tf.data/Grain
loader feeding device-resident batches"; SURVEY.md §1 L3).

Drop-in alternative to :class:`cyclegan_tpu.data.loader.Loader` built on
``grain.python.DataLoader``: deterministic per-epoch shuffling via
IndexSampler, the same crop/flip/normalize transform (numpy path — per-record
parallelism comes from grain worker processes instead of the batch-level C++
kernels), and optional multi-process workers + multi-host sharding
(ShardByJaxProcess) for fleet runs.

Select with ``Config.loader = "grain"`` (default "native").
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

import grain.python as gp

from cyclegan_tpu.data.datasets import SegmentationDataset
from cyclegan_tpu.data.transforms import eval_transform, train_transform


class _Source(gp.RandomAccessDataSource):
    """SegmentationDataset as a grain RandomAccessDataSource."""

    def __init__(self, ds: SegmentationDataset):
        self._ds = ds

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx: int):
        img, lab = self._ds.get(int(idx))
        return {"image": img, "label": lab}


class _Transform(gp.RandomMapTransform):
    def __init__(self, crop_hw, train, resize_hw=None):
        self._crop_hw = crop_hw
        self._train = train
        self._resize_hw = resize_hw

    def random_map(self, record, rng: np.random.Generator):
        img, lab = record["image"], record["label"]
        if self._train:
            img, lab = train_transform(img, lab, crop_hw=self._crop_hw,
                                       rng=rng, resize_hw=self._resize_hw)
        else:
            img, lab = eval_transform(img, lab, crop_hw=self._crop_hw)
        out = {"image": img}
        if lab is not None:
            out["label"] = lab.astype(np.int32)
        return out


class GrainLoader:
    """Epoch-aware batch iterator matching Loader's interface."""

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
    ):
        self.ds = ds
        self.batch_size = batch_size  # GLOBAL batch size (all processes)
        self.crop_hw = crop_hw
        self.train = train
        self.seed = seed
        self.resize_hw = resize_hw
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
        """Batches per epoch (global semantics — same on every process).

        Record sharding gives each process ~n/P records batched into
        rows=B/P, so every process yields the same count: it is the min over
        processes when n isn't divisible.
        """
        n = len(self.ds) // self._nproc
        return n // self._rows if self.drop_last else -(-n // self._rows)

    def epoch(self, epoch: int | None = None) -> Iterator[dict]:
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        shard = (gp.ShardOptions(shard_index=self._proc,
                                 shard_count=self._nproc, drop_remainder=True)
                 if self._nproc > 1 else gp.NoSharding())
        sampler = gp.IndexSampler(
            num_records=len(self.ds),
            shuffle=self.train,
            # distinct deterministic stream per (seed, epoch), like Loader
            seed=(self.seed * 100_003 + e) % (2 ** 31),
            num_epochs=1,
            shard_options=shard,
        )
        loader = gp.DataLoader(
            data_source=_Source(self.ds),
            sampler=sampler,
            operations=[
                _Transform(self.crop_hw, self.train, self.resize_hw),
                gp.Batch(batch_size=self._rows,
                         drop_remainder=self.drop_last),
            ],
            worker_count=self.num_workers,
        )
        for batch in loader:
            yield self._pad_batch(dict(batch))

    def _pad_batch(self, batch: dict) -> dict:
        """Pad a short final eval batch to the per-process row count with
        ignore-label rows (mirrors Loader._pad_batch): keeps every batch the
        same static shape so the eval step compiles once and mesh sharding
        always applies."""
        n = batch["image"].shape[0]
        if n == self._rows:
            return batch
        pad = self._rows - n
        img_pad = np.zeros((pad,) + batch["image"].shape[1:], batch["image"].dtype)
        batch["image"] = np.concatenate([batch["image"], img_pad])
        if "label" in batch:
            lab_pad = np.full((pad,) + batch["label"].shape[1:], 255,
                              batch["label"].dtype)
            batch["label"] = np.concatenate([batch["label"], lab_pad])
        return batch
