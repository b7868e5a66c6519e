"""Native (C++) runtime components, loaded via ctypes.

Currently: the BVH builder (bvh_builder.cpp).  Compiled lazily with the
system toolchain into a per-user cache; all callers fall back to the
pure-numpy implementations when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB = None
_TRIED = False


def _build_lib() -> Optional[str]:
    src = os.path.join(_HERE, "bvh_builder.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "glome_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, f"libglome_bvh_{tag}.so")
    if os.path.exists(out):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", out + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return out
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.glome_build_bvh.restype = ctypes.c_int32
        lib.glome_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def build_bvh_native(bmin: np.ndarray, bmax: np.ndarray, leaf_max: int):
    """C++ BVH build; returns the BvhFlat field arrays or None on
    failure (caller falls back to the numpy builder)."""
    lib = get_lib()
    if lib is None:
        return None
    P = int(bmin.shape[0])
    cap_nodes = 4 * P + 8
    cap_order = 4 * P + 8
    bmin = np.ascontiguousarray(bmin, dtype=np.float64)
    bmax = np.ascontiguousarray(bmax, dtype=np.float64)
    nb_min = np.empty((cap_nodes, 3), dtype=np.float32)
    nb_max = np.empty((cap_nodes, 3), dtype=np.float32)
    ls = np.empty(cap_nodes, dtype=np.int32)
    lc = np.empty(cap_nodes, dtype=np.int32)
    sk = np.empty(cap_nodes, dtype=np.int32)
    order = np.empty(cap_order, dtype=np.int32)
    n_order = ctypes.c_int32(0)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    M = lib.glome_build_bvh(
        ptr(bmin, ctypes.c_double), ptr(bmax, ctypes.c_double),
        P, int(leaf_max),
        ptr(nb_min, ctypes.c_float), ptr(nb_max, ctypes.c_float),
        ptr(ls, ctypes.c_int32), ptr(lc, ctypes.c_int32),
        ptr(sk, ctypes.c_int32), ptr(order, ctypes.c_int32),
        cap_nodes, cap_order, ctypes.byref(n_order))
    if M < 0:
        return None
    return (nb_min[:M].copy(), nb_max[:M].copy(), ls[:M].copy(),
            lc[:M].copy(), sk[:M].copy(), order[:n_order.value].copy())
