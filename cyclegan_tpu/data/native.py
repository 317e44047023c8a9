"""ctypes bindings for the native data kernels (native/cgtpu_data.cpp).

Builds the shared library on first use (``make -C native``) and caches the
handle; every entry point has a numpy fallback so the pipeline works without
a toolchain. The native path is bit-identical to the numpy path: RNG
parameter draws stay in Python, only pixel work crosses the boundary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcgtpu_data.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_failed = False

_u8pp = ctypes.POINTER(ctypes.c_char_p)  # placeholder, replaced below
_c_u8p = ctypes.POINTER(ctypes.c_uint8)


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("CYCLEGAN_TPU_NO_NATIVE"):
            _lib_failed = True
            return None
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, check=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.cgtpu_version.restype = ctypes.c_int
            assert lib.cgtpu_version() == 1
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def crop_flip_normalize_batch(
    imgs: list[np.ndarray], tops: np.ndarray, lefts: np.ndarray,
    flips: np.ndarray, crop_hw: tuple[int, int],
) -> np.ndarray:
    """Fused crop+flip+normalize over a batch of HWC uint8 images."""
    ch, cw = crop_hw
    c = imgs[0].shape[2]
    n = len(imgs)
    lib = _load()
    if lib is None:
        out = np.empty((n, ch, cw, c), np.float32)
        for i, img in enumerate(imgs):
            crop = img[tops[i]:tops[i] + ch, lefts[i]:lefts[i] + cw]
            if flips[i]:
                crop = crop[:, ::-1]
            out[i] = crop.astype(np.float32) / 127.5 - 1.0
        return out

    imgs = [np.ascontiguousarray(im) for im in imgs]
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in imgs])
    hs = np.array([im.shape[0] for im in imgs], np.int32)
    ws = np.array([im.shape[1] for im in imgs], np.int32)
    out = np.empty((n, ch, cw, c), np.float32)
    lib.cgtpu_crop_flip_normalize_batch(
        ptrs,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(c),
        np.ascontiguousarray(tops, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int)),
        np.ascontiguousarray(lefts, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int)),
        np.ascontiguousarray(flips, np.uint8).ctypes.data_as(_c_u8p),
        ctypes.c_int(ch), ctypes.c_int(cw), ctypes.c_int(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def crop_flip_label_batch(
    labs: list[np.ndarray], tops: np.ndarray, lefts: np.ndarray,
    flips: np.ndarray, crop_hw: tuple[int, int],
) -> np.ndarray:
    ch, cw = crop_hw
    n = len(labs)
    lib = _load()
    if lib is None:
        out = np.empty((n, ch, cw), np.int32)
        for i, lab in enumerate(labs):
            crop = lab[tops[i]:tops[i] + ch, lefts[i]:lefts[i] + cw]
            if flips[i]:
                crop = crop[:, ::-1]
            out[i] = crop.astype(np.int32)
        return out

    labs = [np.ascontiguousarray(lb, np.uint8) for lb in labs]
    ptrs = (ctypes.c_void_p * n)(
        *[lb.ctypes.data_as(ctypes.c_void_p).value for lb in labs])
    hs = np.array([lb.shape[0] for lb in labs], np.int32)
    ws = np.array([lb.shape[1] for lb in labs], np.int32)
    out = np.empty((n, ch, cw), np.int32)
    lib.cgtpu_crop_flip_label_batch(
        ptrs,
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        np.ascontiguousarray(tops, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int)),
        np.ascontiguousarray(lefts, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int)),
        np.ascontiguousarray(flips, np.uint8).ctypes.data_as(_c_u8p),
        ctypes.c_int(ch), ctypes.c_int(cw), ctypes.c_int(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def one_hot(labels: np.ndarray, num_classes: int,
            ignore_index: int = 255) -> np.ndarray:
    """Native one-hot (N..., K); ignored pixels all-zero."""
    lib = _load()
    flat = np.ascontiguousarray(labels, np.int32).reshape(-1)
    if lib is None:
        from cyclegan_tpu.data.palette import one_hot as np_one_hot

        return np_one_hot(labels, num_classes, ignore_index=ignore_index)
    out = np.empty((flat.size, num_classes), np.float32)
    lib.cgtpu_one_hot(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(flat.size), ctypes.c_int(num_classes),
        ctypes.c_int(ignore_index),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(labels.shape + (num_classes,))
