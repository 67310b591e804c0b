"""
Native (C++) host-side tier: build + ctypes loading.

The shared object is built on first use with the system compiler and
cached next to the sources; everything degrades gracefully to the
pure-numpy implementations when no compiler is available.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.realpath(__file__))
_SRC = os.path.join(_DIR, "healpix.cpp")
_SO = os.path.join(_DIR, "_healpix_native.so")

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library, or return None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.lb2pix_nest.argtypes = [ctypes.c_int64, f64p, f64p,
                                    ctypes.c_int64, i64p]
        lib.lb2pix_nest.restype = None
        lib.dustmap_lookup.argtypes = [f64p, f64p, ctypes.c_int64,
                                       i64p, ctypes.c_int64, i64p,
                                       i64p, i64p, i64p]
        lib.dustmap_lookup.restype = None
        _lib = lib
    except Exception as err:  # pragma: no cover - environment dependent
        sys.stderr.write(f"brutus_tpu.native: falling back to numpy "
                         f"({type(err).__name__}: {err})\n")
        _lib = None
    return _lib


def lb2pix_nest(nside, l, b):
    """Native `lb2pix`; returns None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    l = np.ascontiguousarray(l, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    out = np.empty(l.shape, dtype=np.int64)
    lib.lb2pix_nest(int(nside), l, b, l.size, out)
    return out


def dustmap_lookup(l, b, nsides, level_offsets, hp_sorted, data_idx):
    """Native multi-resolution dust-map row lookup (or None)."""
    lib = load()
    if lib is None:
        return None
    l = np.ascontiguousarray(l, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    nsides = np.ascontiguousarray(nsides, dtype=np.int64)
    level_offsets = np.ascontiguousarray(level_offsets, dtype=np.int64)
    hp_sorted = np.ascontiguousarray(hp_sorted, dtype=np.int64)
    data_idx = np.ascontiguousarray(data_idx, dtype=np.int64)
    out = np.empty(l.shape, dtype=np.int64)
    lib.dustmap_lookup(l, b, l.size, nsides, len(nsides), level_offsets,
                       hp_sorted, data_idx, out)
    return out


__all__ = ["load", "lb2pix_nest", "dustmap_lookup"]
