"""ctypes bindings for the native C++ collator (native/collate.cpp).

Builds the shared library on first use (g++, cached next to the source);
every entry point has a pure-Python fallback so the framework runs on
hosts without a toolchain.  See native/collate.cpp for what runs where.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "collate.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libralf_collate.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

FLAG_SHUFFLE, FLAG_SORT_LABEL, FLAG_SORT_LEX = 1, 2, 4
TRANSFORM_FLAGS = {
    "shuffle": FLAG_SHUFFLE,
    "sort_label": FLAG_SORT_LABEL,
    "sort_lexicographic": FLAG_SORT_LEX,
}


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no toolchain / sandbox
        logger.warning("native collate build failed (%s); using python path", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = ctypes.CDLL(_LIB)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.ralf_collate_batch.argtypes = [
            i64p, f32p, f32p, f32p, f32p, u8p, i32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        ]
        lib.ralf_gather_neighbors.argtypes = [
            i64p, f32p, f32p, f32p, f32p, u8p, i64p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i64p, f32p, f32p, f32p, f32p, u8p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def collate_batch(layout_arrays: dict, transforms: list[str],
                  seed: int) -> Optional[dict]:
    """In-place native transforms+pad; None when the library is missing."""
    lib = get_lib()
    if lib is None:
        return None
    flags = 0
    for t in transforms:
        flags |= TRANSFORM_FLAGS.get(t, 0)
    label = np.ascontiguousarray(layout_arrays["label"], np.int64)
    cx = np.ascontiguousarray(layout_arrays["center_x"], np.float32)
    cy = np.ascontiguousarray(layout_arrays["center_y"], np.float32)
    w = np.ascontiguousarray(layout_arrays["width"], np.float32)
    h = np.ascontiguousarray(layout_arrays["height"], np.float32)
    lengths = np.ascontiguousarray(
        layout_arrays["mask"].sum(axis=1), np.int32
    )
    B, S = label.shape
    mask = np.zeros((B, S), np.uint8)
    lib.ralf_collate_batch(label, cx, cy, w, h, mask, lengths, B, S, flags,
                           np.uint64(seed))
    return {"label": label, "center_x": cx, "center_y": cy, "width": w,
            "height": h, "mask": mask.astype(bool)}


def gather_neighbors(gallery: dict, indices: np.ndarray) -> Optional[dict]:
    """[B, K] gallery indices -> {k: [B, K, S]} via one native call."""
    lib = get_lib()
    if lib is None:
        return None
    g_label = np.ascontiguousarray(gallery["label"], np.int64)
    g_cx = np.ascontiguousarray(gallery["center_x"], np.float32)
    g_cy = np.ascontiguousarray(gallery["center_y"], np.float32)
    g_w = np.ascontiguousarray(gallery["width"], np.float32)
    g_h = np.ascontiguousarray(gallery["height"], np.float32)
    g_mask = np.ascontiguousarray(gallery["mask"], np.uint8)
    idx = np.ascontiguousarray(indices, np.int64)
    B, K = idx.shape
    S = g_label.shape[1]
    out = {
        "label": np.empty((B, K, S), np.int64),
        "center_x": np.empty((B, K, S), np.float32),
        "center_y": np.empty((B, K, S), np.float32),
        "width": np.empty((B, K, S), np.float32),
        "height": np.empty((B, K, S), np.float32),
    }
    o_mask = np.empty((B, K, S), np.uint8)
    lib.ralf_gather_neighbors(
        g_label, g_cx, g_cy, g_w, g_h, g_mask, idx.reshape(-1), B, K, S,
        out["label"].reshape(B * K, S), out["center_x"].reshape(B * K, S),
        out["center_y"].reshape(B * K, S), out["width"].reshape(B * K, S),
        out["height"].reshape(B * K, S), o_mask.reshape(B * K, S),
    )
    out["mask"] = o_mask.astype(bool)
    return out
