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


def empty_batch(crop_hw: tuple[int, int], in_channels: int) -> dict:
    """All-pad local batch (a process whose row range falls entirely in the
    padding of a short final eval batch). Shared by Loader and GrainLoader."""
    ch, cw = crop_hw
    return {"image": np.zeros((0, ch, cw, in_channels), np.float32),
            "label": np.zeros((0, ch, cw), np.int32)}


def pad_batch(batch: dict, rows: int) -> dict:
    """Pad a short final eval batch to ``rows`` with ignore-label rows (255
    is masked by the CE loss and the confusion matrix) — keeps every batch
    the same static shape so XLA compiles the eval step once. Shared by
    Loader and GrainLoader (their streams must stay bit-identical)."""
    n = batch["image"].shape[0]
    if n == rows:
        return batch
    pad = rows - n
    img_pad = np.zeros((pad,) + batch["image"].shape[1:], batch["image"].dtype)
    batch["image"] = np.concatenate([batch["image"], img_pad])
    if "label" in batch:
        lab_pad = np.full((pad,) + batch["label"].shape[1:], 255,
                          batch["label"].dtype)
        batch["label"] = np.concatenate([batch["label"], lab_pad])
    return batch


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
            # Fail FAST: a bad value would otherwise raise inside the
            # prefetch worker thread, which dies without queueing its
            # sentinel and deadlocks the consumer at first validation.
            raise ValueError(
                f"unknown eval_mode {eval_mode!r} (resize|center_crop)")
        self.eval_mode = eval_mode
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        # Multi-host DP: (process_index, process_count). Each process builds
        # only its contiguous row-slice of every global batch; augment RNG is
        # seeded per (seed, epoch, global_sample_position), so the assembled
        # global batch is BIT-IDENTICAL for any process count (asserted by
        # tests/test_multihost.py).
        p, count = process_shard or (0, 1)
        if batch_size % count:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"process_count {count}")
        self._proc, self._nproc = p, count
        self._rows = batch_size // count  # rows this process materializes

    def steps_per_epoch(self) -> int:
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _sample_rng(self, epoch: int, position: int) -> np.random.Generator:
        """Augment RNG for one sample, keyed by its GLOBAL epoch position —
        independent of batching and process sharding."""
        return np.random.default_rng((self.seed, epoch, position))

    def _make_batch(self, idxs: np.ndarray, positions: np.ndarray,
                    epoch: int) -> dict:
        if self.train and native.available():
            return self._make_batch_native(idxs, positions, epoch)
        imgs, labs = [], []
        for i, pos in zip(idxs, positions):
            img, lab = self.ds.get(int(i))
            if self.train:
                img, lab = train_transform(
                    img, lab, crop_hw=self.crop_hw,
                    rng=self._sample_rng(epoch, int(pos)),
                    resize_hw=self.resize_hw)
            else:
                img, lab = eval_transform(img, lab, crop_hw=self.crop_hw,
                                          mode=self.eval_mode)
            imgs.append(img)
            if lab is not None:
                labs.append(lab.astype(np.int32))
        batch = {"image": np.stack(imgs)} if imgs else self._empty_batch()
        if labs:
            batch["label"] = np.stack(labs)
        return self._pad_batch(batch)

    def _empty_batch(self) -> dict:
        return empty_batch(self.crop_hw, self.ds.in_channels)

    def _pad_batch(self, batch: dict) -> dict:
        return pad_batch(batch, self._rows)

    def _make_batch_native(self, idxs: np.ndarray, positions: np.ndarray,
                           epoch: int) -> dict:
        """Fused C++ crop+flip+normalize path — bit-identical to the numpy
        path (same RNG parameter stream, pixel work in native code)."""
        imgs, labs, tops, lefts, flips = [], [], [], [], []
        for i, pos in zip(idxs, positions):
            img, lab = self.ds.get(int(i))
            img, lab, top, left, flip = draw_train_params(
                img, lab, crop_hw=self.crop_hw,
                rng=self._sample_rng(epoch, int(pos)),
                resize_hw=self.resize_hw)
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
        """Iterate one epoch; deterministic given (seed, epoch) and — for the
        assembled global batch — independent of process sharding."""
        e = self._epoch if epoch is None else epoch
        self._epoch = e + 1
        rng = np.random.default_rng((self.seed, e))
        idxs = rng.permutation(len(self.ds)) if self.train else np.arange(len(self.ds))
        nb = self.steps_per_epoch()
        lo = self._proc * self._rows  # this process's rows within each batch
        jobs = []
        for k in range(nb):
            glob = idxs[k * self.batch_size + lo:
                        k * self.batch_size + lo + self._rows]
            pos = np.arange(k * self.batch_size + lo,
                            k * self.batch_size + lo + len(glob))
            jobs.append((glob, pos))
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            for b, pos in jobs:
                if stop.is_set():
                    return
                q.put(self._make_batch(b, pos, e))
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


def paired_iterator(
    labeled: Loader, unlabeled: Loader, epoch: int, *, mode: str = "zip"
) -> Iterator[tuple[dict, dict]]:
    """Pair the labeled and unlabeled streams for one epoch.

    ``mode="zip"`` (default — reference semantics, SURVEY.md §3a line 149:
    ``zip(labeled_loader, unlabeled_loader)``): the epoch ends when the
    SHORTER stream is exhausted — at labeled fraction < 1/2 that is the
    labeled stream, so labeled data never repeats within an epoch and
    epochs-per-LR-decay / checkpoint cadence match the reference.

    ``mode="cycle"`` (opt-in, ``--pairing cycle``): epoch length is set by
    the unlabeled stream; the labeled stream cycles with fresh shuffles.
    More unlabeled coverage per epoch, but diverges from reference epoch
    accounting.
    """
    if mode == "zip":
        lab_it, unlab_it = iter(labeled.epoch(epoch)), iter(unlabeled.epoch(epoch))
        try:
            yield from zip(lab_it, unlab_it)
        finally:
            # Explicitly close the longer stream so its prefetch thread dies
            # now, not at GC time.
            for it in (lab_it, unlab_it):
                if hasattr(it, "close"):
                    it.close()
        return
    if mode != "cycle":
        raise ValueError(f"unknown pairing mode {mode!r} (expected zip|cycle)")
    lab_stream = _cycle(labeled, epoch)
    for unlab_batch in unlabeled.epoch(epoch):
        yield next(lab_stream), unlab_batch


def paired_steps_per_epoch(labeled: Loader, unlabeled: Loader, mode: str = "zip") -> int:
    """Epoch length that :func:`paired_iterator` will produce."""
    if mode == "zip":
        return min(labeled.steps_per_epoch(), unlabeled.steps_per_epoch())
    return unlabeled.steps_per_epoch()


def _cycle(loader: Loader, epoch: int) -> Iterator[dict]:
    sub = 0
    while True:
        yield from loader.epoch(epoch * 1000 + sub)
        sub += 1
