"""Utilities (reference `utils.py` / L5 — SURVEY.md §1).

Note what moved where relative to the reference:
- ``cuda(xs)`` -> ``jax.device_put`` with shardings (cyclegan_tpu.parallel)
- ``LambdaLR`` -> cyclegan_tpu.train.schedule
- ``Sample_from_Pool`` -> cyclegan_tpu.train.pool
- ``save/load_checkpoint`` -> cyclegan_tpu.train.checkpoint (Orbax)
- metric helpers -> cyclegan_tpu.train.metrics
"""

from cyclegan_tpu.utils.config import Config, PRESETS, preset

__all__ = ["Config", "PRESETS", "preset"]
