"""ctypes bindings for the native host-pipeline core (graceful fallback).

Build once with ``make -C eda_tpu/data/_native`` (or ``build()`` below); all
entry points fall back to numpy implementations when the shared library is
absent, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libeda_native.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile the native library. Returns True on success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64 = ctypes.c_int64
    lib.morton_keys.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.radix_argsort_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), i64, ctypes.POINTER(ctypes.c_int32),
    ]
    lib.ply_decode_vertices.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64,
        ctypes.POINTER(i64), ctypes.POINTER(i64),
        ctypes.POINTER(ctypes.c_int32), i64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.prepare_scene.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, ctypes.POINTER(ctypes.c_double),
        i64, ctypes.c_uint64, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def morton_argsort(xyz: np.ndarray, cell_size: float = 0.2) -> np.ndarray:
    """Morton-key argsort of (N, 3) points; native radix sort when built."""
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    if lib is None:
        from eda_tpu.data.presort import morton_keys_np

        return np.argsort(morton_keys_np(xyz, cell_size), kind="stable").astype(
            np.int32
        )
    keys = np.empty(n, np.int32)
    lib.morton_keys(
        _ptr(xyz, ctypes.c_float), n, cell_size, -50.0, _ptr(keys, ctypes.c_int32)
    )
    order = np.empty(n, np.int32)
    lib.radix_argsort_u32(
        _ptr(keys.view(np.uint32), ctypes.c_uint32), n, _ptr(order, ctypes.c_int32)
    )
    return order


_KIND = {"u": 0, "i": 1, "f": 2}


def ply_decode(
    raw: bytes, count: int, stride: int, layout: list
) -> np.ndarray:
    """Decode a binary PLY vertex block to (count, n_props) float32.

    layout: list of (byte_offset, byte_size, kind_char) per property where
    kind_char is numpy dtype.kind ('u', 'i', 'f').
    """
    lib = _load()
    n_props = len(layout)
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.frombuffer(raw, np.uint8, count=count * stride)
    offs = np.array([l[0] for l in layout], np.int64)
    sizes = np.array([l[1] for l in layout], np.int64)
    kinds = np.array([_KIND[l[2]] for l in layout], np.int32)
    out = np.empty((count, n_props), np.float32)
    lib.ply_decode_vertices(
        _ptr(buf, ctypes.c_uint8), count, stride,
        _ptr(offs, ctypes.c_int64), _ptr(sizes, ctypes.c_int64),
        _ptr(kinds, ctypes.c_int32), n_props,
        _ptr(out, ctypes.c_float),
    )
    return out


def prepare_scene(
    xyz: np.ndarray,
    keep_n: int,
    seed: int,
    align: Optional[np.ndarray] = None,
    cell_size: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused downsample + axis-align + Morton sort.

    Returns (sorted_xyz (keep_n, 3), src_rows (keep_n,)) where src_rows maps
    each output slot to its source vertex (for gathering colors/labels).
    The downsample reproduces ``np.random.RandomState(seed).choice(n, keep_n,
    replace=n < keep_n)`` bit-for-bit (MT19937 + numpy's legacy shuffle in
    the C++ core), so the native and Python packing paths select identical
    points for the reference's seed-1184 draw.
    """
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    if lib is None:
        rs = np.random.RandomState(seed % (2**31))
        rows = rs.choice(len(xyz), keep_n, replace=len(xyz) < keep_n)
        pts = xyz[rows]
        if align is not None:
            mat = np.asarray(align, np.float64).reshape(4, 4)
            pts = (np.c_[pts, np.ones(len(pts))] @ mat.T)[:, :3].astype(np.float32)
        order = morton_argsort(pts, cell_size)
        return pts[order], rows[order].astype(np.int32)
    out_xyz = np.empty((keep_n, 3), np.float32)
    src = np.empty(keep_n, np.int32)
    mat = (
        np.ascontiguousarray(align, np.float64)
        if align is not None
        else None
    )
    lib.prepare_scene(
        _ptr(xyz, ctypes.c_float), len(xyz),
        _ptr(mat, ctypes.c_double) if mat is not None else None,
        keep_n, seed, cell_size, -50.0,
        _ptr(out_xyz, ctypes.c_float), _ptr(src, ctypes.c_int32),
    )
    return out_xyz, src
