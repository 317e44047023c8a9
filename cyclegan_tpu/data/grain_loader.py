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
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.crop_hw = crop_hw
        self.train = train
        self.seed = seed
        self.resize_hw = resize_hw
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.shard_by_process = shard_by_process
        self._epoch = 0

    def steps_per_epoch(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int | None = None) -> Iterator[dict]:
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        shard = (gp.ShardByJaxProcess(drop_remainder=True)
                 if self.shard_by_process else gp.NoSharding())
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
                gp.Batch(batch_size=self.batch_size,
                         drop_remainder=self.drop_last),
            ],
            worker_count=self.num_workers,
        )
        for batch in loader:
            yield dict(batch)
