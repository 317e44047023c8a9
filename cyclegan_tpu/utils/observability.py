"""Observability (SURVEY.md §5: tracing/profiling, debug, metrics logging).

The reference has stdout loss prints only; here:
- structured JSON-lines metrics log next to stdout,
- optional ``jax.profiler`` trace of a step window (``--profile_dir``),
- NaN checking (``--debug_nans``) via jax's built-in nan-debugger,
- steps/sec as a first-class per-log metric (the [B] north-star unit).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import numpy as np


class MetricsLogger:
    """Prints human-readable lines, appends JSON-lines, and (optionally)
    writes TensorBoard scalars when CYCLEGAN_TPU_TENSORBOARD=1 and TF is
    importable (SURVEY.md §5 'optional TensorBoard via TF')."""

    def __init__(self, log_dir: str | None, *, prefix: str = "train"):
        self._file = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, f"{prefix}_metrics.jsonl"),
                              "a", buffering=1)
            if os.environ.get("CYCLEGAN_TPU_TENSORBOARD"):
                try:
                    import tensorflow as tf  # heavy import — opt-in only

                    self._tb = tf.summary.create_file_writer(
                        os.path.join(log_dir, "tb"))
                except ImportError:
                    pass
        self._t0 = time.perf_counter()

    def log(self, *, step: int, epoch: int, metrics: dict[str, Any],
            steps_per_sec: float | None = None) -> None:
        scalars = {k: float(v) for k, v in metrics.items() if np.ndim(v) == 0}
        parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(scalars.items()))
        sps = f" steps/sec={steps_per_sec:.3f}" if steps_per_sec else ""
        print(f"[epoch {epoch} step {step}] {parts}{sps}", flush=True)
        if self._file is not None:
            rec = {"t": round(time.perf_counter() - self._t0, 3), "step": step,
                   "epoch": epoch, **scalars}
            if steps_per_sec is not None:
                rec["steps_per_sec"] = round(steps_per_sec, 4)
            self._file.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, v, step=step)
                if steps_per_sec is not None:
                    tf.summary.scalar("steps_per_sec", steps_per_sec, step=step)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


class StepProfiler:
    """Traces steps [start, stop) of training into a TensorBoard-readable
    profile via jax.profiler (the reference has no profiling at all)."""

    def __init__(self, profile_dir: str | None, start: int = 10, stop: int = 15):
        self.dir = profile_dir
        self.start_step = start
        self.stop_step = stop
        self._active = False
        self._done = False

    def maybe_start(self, step: int) -> None:
        # >= (not ==): with steps_per_call > 1 the step counter advances in
        # strides and can skip the exact start step.
        if (self.dir and not self._active and not self._done
                and step >= self.start_step):
            jax.profiler.start_trace(self.dir)
            self._active = True

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True  # one trace window per run

    def finish(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def enable_debug_flags(debug_nans: bool = False) -> None:
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
