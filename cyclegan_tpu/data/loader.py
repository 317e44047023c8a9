"""Batch loader with background prefetch (reference DataLoader equivalent).

The reference uses torch DataLoader worker processes (SURVEY.md §3a "PROCESS
BOUNDARY"). Here: a thread-pool prefetcher producing fixed-shape numpy batches
that the train loop transfers to device while the previous step computes —
host->HBM transfer overlaps with the jitted step because JAX dispatch is
async.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from cyclegan_tpu.data import native
from cyclegan_tpu.data.datasets import SegmentationDataset
from cyclegan_tpu.data.transforms import (
    draw_train_params, eval_transform, train_transform)


class Loader:
    """Shuffling, epoch-aware batch iterator with a prefetch thread.

    Yields dict batches of fixed shapes:
      image: (B, H, W, C) float32 in [-1, 1]
      label: (B, H, W) int32 (only when the dataset has labels)
    """

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
        prefetch: int = 4,
    ):
        self.ds = ds
        self.batch_size = batch_size
        self.crop_hw = crop_hw
        self.train = train
        self.seed = seed
        self.resize_hw = resize_hw
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0

    def steps_per_epoch(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _make_batch(self, idxs: np.ndarray, rng: np.random.Generator) -> dict:
        if self.train and native.available():
            return self._make_batch_native(idxs, rng)
        imgs, labs = [], []
        for i in idxs:
            img, lab = self.ds.get(int(i))
            if self.train:
                img, lab = train_transform(
                    img, lab, crop_hw=self.crop_hw, rng=rng, resize_hw=self.resize_hw)
            else:
                img, lab = eval_transform(img, lab, crop_hw=self.crop_hw)
            imgs.append(img)
            if lab is not None:
                labs.append(lab.astype(np.int32))
        batch = {"image": np.stack(imgs)}
        if labs:
            batch["label"] = np.stack(labs)
        return self._pad_batch(batch)

    def _pad_batch(self, batch: dict) -> dict:
        """Pad a short final eval batch to batch_size with ignore-label rows
        (255 is masked by the CE loss and the confusion matrix) — keeps every
        batch the same static shape so XLA compiles the eval step once."""
        n = batch["image"].shape[0]
        if n == self.batch_size:
            return batch
        pad = self.batch_size - n
        img_pad = np.zeros((pad,) + batch["image"].shape[1:], batch["image"].dtype)
        batch["image"] = np.concatenate([batch["image"], img_pad])
        if "label" in batch:
            lab_pad = np.full((pad,) + batch["label"].shape[1:], 255,
                              batch["label"].dtype)
            batch["label"] = np.concatenate([batch["label"], lab_pad])
        return batch

    def _make_batch_native(self, idxs: np.ndarray, rng: np.random.Generator) -> dict:
        """Fused C++ crop+flip+normalize path — bit-identical to the numpy
        path (same RNG parameter stream, pixel work in native code)."""
        imgs, labs, tops, lefts, flips = [], [], [], [], []
        for i in idxs:
            img, lab = self.ds.get(int(i))
            img, lab, top, left, flip = draw_train_params(
                img, lab, crop_hw=self.crop_hw, rng=rng, resize_hw=self.resize_hw)
            imgs.append(img)
            labs.append(lab)
            tops.append(top)
            lefts.append(left)
            flips.append(flip)
        tops = np.asarray(tops, np.int32)
        lefts = np.asarray(lefts, np.int32)
        flips = np.asarray(flips, np.uint8)
        batch = {"image": native.crop_flip_normalize_batch(
            imgs, tops, lefts, flips, self.crop_hw)}
        if all(lb is not None for lb in labs):
            batch["label"] = native.crop_flip_label_batch(
                labs, tops, lefts, flips, self.crop_hw)
        return batch

    def epoch(self, epoch: int | None = None) -> Iterator[dict]:
        """Iterate one epoch; deterministic given (seed, epoch)."""
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        rng = np.random.default_rng((self.seed, e))
        idxs = rng.permutation(len(self.ds)) if self.train else np.arange(len(self.ds))
        nb = self.steps_per_epoch()
        batches = [idxs[k * self.batch_size:(k + 1) * self.batch_size] for k in range(nb)]
        if not self.drop_last and len(self.ds) % self.batch_size:
            batches = batches or []
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            for b in batches:
                if stop.is_set():
                    return
                q.put(self._make_batch(b, rng))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
            # Unblock a worker stuck in q.put() after an early consumer exit
            # (max_steps runs) so the thread can observe `stop` and die.
            try:
                q.get_nowait()
            except queue.Empty:
                pass

    def forever(self) -> Iterator[dict]:
        e = 0
        while True:
            yield from self.epoch(e)
            e += 1


def paired_iterator(labeled: Loader, unlabeled: Loader, epoch: int) -> Iterator[tuple[dict, dict]]:
    """zip(labeled, unlabeled) for one epoch, cycling the shorter labeled
    stream (the reference zips loaders — SURVEY.md §3a; we cycle the labeled
    loader so the epoch length is set by the unlabeled stream)."""
    lab_stream = _cycle(labeled, epoch)
    for unlab_batch in unlabeled.epoch(epoch):
        yield next(lab_stream), unlab_batch


def _cycle(loader: Loader, epoch: int) -> Iterator[dict]:
    sub = 0
    while True:
        yield from loader.epoch(epoch * 1000 + sub)
        sub += 1
