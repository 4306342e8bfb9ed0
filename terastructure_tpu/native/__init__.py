"""ctypes bindings for the native ingest core (bedops.cpp).

Importing this module raises ImportError if the library is not built —
callers (data/bed.py, data/pack.py) fall back to numpy. Build once with:

    python -m terastructure_tpu.native.build
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_bedops.so")

if not os.path.exists(_SO) or (
    os.path.getmtime(_SO)
    < os.path.getmtime(os.path.join(os.path.dirname(_SO), "bedops.cpp"))
):
    # Auto-build on first import (or stale .so); failure -> ImportError so
    # callers fall back to the numpy path.
    try:
        from terastructure_tpu.native.build import build

        build(verbose=False)
    except Exception as e:  # g++ missing, compile error, ...
        raise ImportError(f"native bedops build failed: {e}") from e

try:
    _lib = ctypes.CDLL(_SO)
except OSError as e:
    # A stale/incompatible .so (e.g. built on another platform) must surface
    # as ImportError so callers fall back to the numpy path.
    raise ImportError(f"native bedops load failed: {e}") from e
_lib.bed_translate.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
_lib.pack2bit.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
_lib.unpack2bit.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_int64]
_lib.gather_groups.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ctypes.c_void_p, ctypes.c_int64]


def bed_translate(raw: np.ndarray, inverse: bool = False) -> np.ndarray:
    """Translate PLINK-coded packed bytes to our code space (or back)."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty_like(raw)
    _lib.bed_translate(
        raw.ctypes.data, out.ctypes.data, raw.size, int(inverse))
    return out


def pack2bit(x: np.ndarray) -> np.ndarray:
    """(rows, n) int8 genotypes -> (rows, ceil(n/4)) packed bytes."""
    x = np.ascontiguousarray(x, dtype=np.int8)
    rows, n = x.shape
    out = np.empty((rows, (n + 3) // 4), dtype=np.uint8)
    _lib.pack2bit(x.ctypes.data, out.ctypes.data, rows, n)
    return out


def unpack2bit(packed: np.ndarray, n: int) -> np.ndarray:
    """(rows, w) packed bytes -> (rows, n) int8 genotypes."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    rows, w = packed.shape
    if n > 4 * w:
        raise ValueError(f"n={n} exceeds capacity of {w} bytes")
    out = np.empty((rows, n), dtype=np.int8)
    _lib.unpack2bit(packed.ctypes.data, out.ctypes.data, rows, w, n)
    return out


def gather_groups(packed: np.ndarray, starts: np.ndarray, g: int,
                  out: np.ndarray) -> None:
    """Copy len(starts) groups of g consecutive rows (wrapping at L) of a
    C-contiguous packed (L, W) matrix into out (len(starts)*g, Wp>=W),
    threaded memcpy. Columns [W, Wp) of `out` are left untouched."""
    l, w = packed.shape
    wp = out.shape[1]
    if (not packed.flags.c_contiguous or not out.flags.c_contiguous
            or out.shape[0] != len(starts) * g or wp < w):
        raise ValueError("gather_groups: bad buffer shapes/contiguity")
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    _lib.gather_groups(packed.ctypes.data, l, w,
                       starts.ctypes.data, len(starts), g,
                       out.ctypes.data, wp)
