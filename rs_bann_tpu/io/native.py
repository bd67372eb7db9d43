"""ctypes binding to the native bed codec (native/bedops.cpp).

Builds the shared library on first use if the toolchain is available;
every entry point has a NumPy fallback, so the package works without it.
The native path matters at genome scale: threaded decode + count-based
column stats over the packed bytes, no intermediate f32 materialization.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger("rs_bann_tpu")

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libbedops.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # pragma: no cover
            log.debug("native bedops build failed (%s); using numpy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:  # pragma: no cover
        log.debug("native bedops load failed (%s); using numpy fallback", e)
        return None
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.bed_decode.argtypes = [u8, i64, i64, i64, f32]
    lib.bed_col_stats.argtypes = [u8, i64, i64, i64, f32, f32]
    lib.bed_submatrix_std.argtypes = [u8, i64, i64, i64p, i64, f32, f32, f32]
    lib.bed_pack.argtypes = [f32, i64, i64, u8]
    lib.bedops_version.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode(data: np.ndarray, n: int) -> np.ndarray:
    """[m, bytes_per_col] uint8 -> [m, n] f32."""
    lib = _load()
    data = np.ascontiguousarray(data, np.uint8)
    m, bpc = data.shape
    if lib is None:
        from .bed import decode_bed_bytes

        return decode_bed_bytes(data, n)
    out = np.empty((m, n), np.float32)
    lib.bed_decode(_u8p(data), m, bpc, n, _f32p(out))
    return out


def col_stats(data: np.ndarray, n: int):
    """Per-marker (means, population stds) over packed columns."""
    lib = _load()
    data = np.ascontiguousarray(data, np.uint8)
    m, bpc = data.shape
    if lib is None:
        from .bed import decode_bed_bytes

        full = decode_bed_bytes(data, n)
        return full.mean(axis=1).astype(np.float32), full.std(axis=1).astype(
            np.float32
        )
    means = np.empty(m, np.float32)
    stds = np.empty(m, np.float32)
    lib.bed_col_stats(_u8p(data), m, bpc, n, _f32p(means), _f32p(stds))
    return means, stds


def submatrix_std(
    data: np.ndarray, n: int, ixs, means: np.ndarray, stds: np.ndarray
) -> np.ndarray:
    """[n, len(ixs)] standardized columns."""
    lib = _load()
    data = np.ascontiguousarray(data, np.uint8)
    ixs = np.ascontiguousarray(ixs, np.int64)
    if lib is None:
        raw = decode(data[ixs], n).T
        sd = stds[ixs]
        return (raw - means[ixs]) * np.where(sd > 0, 1.0 / np.where(sd > 0, sd, 1), 0.0)
    out = np.empty((n, ixs.shape[0]), np.float32)
    lib.bed_submatrix_std(
        _u8p(data),
        data.shape[1],
        n,
        ixs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ixs.shape[0],
        _f32p(np.ascontiguousarray(means, np.float32)),
        _f32p(np.ascontiguousarray(stds, np.float32)),
        _f32p(out),
    )
    return out


def pack(vals: np.ndarray) -> np.ndarray:
    """[m, n] genotypes {0,1,2} -> [m, ceil(n/4)] packed uint8."""
    lib = _load()
    vals = np.ascontiguousarray(vals, np.float32)
    m, n = vals.shape
    if lib is None:
        from .bed import pack_genotypes

        return pack_genotypes(vals)
    out = np.zeros((m, (n + 3) // 4), np.uint8)
    lib.bed_pack(_f32p(vals), m, n, _u8p(out))
    return out
