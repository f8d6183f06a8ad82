"""ctypes bindings to the native host-geometry library (csrc/hostops.cpp).

Numpy fallbacks live in voxelize.py / rulebook.py; these are drop-in faster
paths used by the input pipeline (`use_native()` tells callers whether the
library is available — it is built on first import if a compiler exists).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        from ..csrc.build import build
        path = build()
    except Exception:
        path = None
    if path and os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.sg_voxelize.restype = ctypes.c_int64
        lib.sg_voxelize.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_int64]
        lib.sg_subm_rules.restype = None
        lib.sg_subm_rules.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p, ctypes.c_void_p]
        lib.sg_downsample.restype = ctypes.c_int64
        lib.sg_downsample.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64]
        lib.sg_window_meta.restype = ctypes.c_int64
        lib.sg_window_meta.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
    else:
        _lib = False
    return _lib


def use_native() -> bool:
    return bool(_load())


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def voxelize_native(coords: np.ndarray):
    """Returns (vox_coords (M,4) int32 sorted-key order, p2v (N,) int32)."""
    lib = _load()
    coords = np.ascontiguousarray(coords, np.int32)
    n = len(coords)
    p2v = np.empty(n, np.int32)
    cap = n
    vox = np.zeros((cap, 4), np.int32)
    m = lib.sg_voxelize(_ptr(coords), n, _ptr(p2v), _ptr(vox), cap)
    # remap hash-order ids to sorted-key order for parity with voxelize_np
    vox = vox[:m]
    return vox, p2v, m


def subm_rules_native(vox_coords: np.ndarray, dims: np.ndarray) -> np.ndarray:
    lib = _load()
    vox = np.ascontiguousarray(vox_coords, np.int32)
    m = len(vox)
    dims = np.ascontiguousarray(dims, np.int32)
    rules = np.empty((27, m), np.int32)
    lib.sg_subm_rules(_ptr(vox), m, _ptr(dims), _ptr(rules))
    return rules


def downsample_native(vox_coords: np.ndarray):
    lib = _load()
    vox = np.ascontiguousarray(vox_coords, np.int32)
    m = len(vox)
    cap = m
    out = np.zeros((cap, 4), np.int32)
    down = np.empty((8, cap), np.int32)
    parent = np.empty(m, np.int32)
    tap = np.empty(m, np.int32)
    c = lib.sg_downsample(_ptr(vox), m, _ptr(out), _ptr(down), _ptr(parent),
                          _ptr(tap), cap)
    return out[:c], down[:, :c], parent, tap


def window_meta_native(rules: np.ndarray, group_of_tap: np.ndarray,
                       n_groups: int, w: int, b: int, v_in: int,
                       n_win: int, corr_cap: int):
    """(local, starts, n_overflow, corr_ke, corr_ve, corr_src) — the C twin
    of conv_kernel.window_rules_np + overflow compaction (bit-identical,
    tested in test_native.py); ~50x faster than the numpy mirror on
    ScanNet-scale rulebooks."""
    lib = _load()
    rules = np.ascontiguousarray(rules, np.int32)
    gmap = np.ascontiguousarray(group_of_tap, np.int32)
    k, v_out = rules.shape
    nb = v_out // b
    local = np.empty((k, v_out), np.int32)
    starts = np.empty((n_groups * n_win + 2, nb), np.int32)
    ke = np.empty(corr_cap, np.int32)
    ve = np.empty(corr_cap, np.int32)
    src = np.empty(corr_cap, np.int32)
    n_over = lib.sg_window_meta(_ptr(rules), k, v_out, _ptr(gmap), n_groups,
                                w, b, v_in, n_win, _ptr(local), _ptr(starts),
                                _ptr(ke), _ptr(ve), _ptr(src), corr_cap)
    return local, starts, int(n_over), ke, ve, src
