"""Data pipeline (reference layer L3, `data_utils.py` — SURVEY.md §2).

Pure-numpy/PIL transforms with injectable RNG (SURVEY.md §7 "hard parts":
random draws must be injectable for parity testing), fixed output shapes per
config (XLA needs static shapes), labeled/unlabeled/val splits with fixed
seeds, and a synthetic dataset fallback so every config runs without data on
disk.
"""

from cyclegan_tpu.data.palette import (
    voc_colormap,
    encode_colormap,
    decode_colormap,
    palette_image,
    save_prediction_png,
    one_hot,
)
from cyclegan_tpu.data.datasets import make_dataset, SegmentationDataset
from cyclegan_tpu.data.loader import Loader, paired_iterator

__all__ = [
    "voc_colormap",
    "encode_colormap",
    "decode_colormap",
    "palette_image",
    "save_prediction_png",
    "one_hot",
    "make_dataset",
    "SegmentationDataset",
    "Loader",
    "paired_iterator",
]
