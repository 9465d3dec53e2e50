"""Space-filling-curve keys for the spatial repartition (O1).

The reference offers ``--spatial_sorting hilbert|morton|geohash|none``
(dask_geopandas spatial_shuffle, ``constants.py:17-25``); the engine
computes the same family of keys as vectorized numpy and range-partitions
on them.  All return fixed-width hex strings so lexicographic order ==
curve order regardless of column type inference.
"""
from __future__ import annotations

import numpy as np

ORDER = 16  # 16 bits per axis -> 32-bit keys (plenty for partitioning)


def _quantize(lat: np.ndarray, lon: np.ndarray, bits: int = ORDER):
    n = 1 << bits
    x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return x, y


def _spread(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_key(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Z-order key as an 8-hex string."""
    x, y = _quantize(lat, lon)
    code = (_spread(x) << np.uint64(1)) | _spread(y)
    return np.array([format(int(c), "08x") for c in code], dtype=str)


def hilbert_key(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Hilbert-curve key (order 16) as an 8-hex string — the classic
    xy→d transform, vectorized over the batch."""
    x, y = _quantize(lat, lon)
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = 1 << (ORDER - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant (classic xy2d): when ry==0, reflect if rx==1,
        # then swap axes
        reflect = (ry == 0) & (rx == 1)
        x = np.where(reflect, s - 1 - x, x)
        y = np.where(reflect, s - 1 - y, y)
        swap = ry == 0
        nx = np.where(swap, y, x)
        ny = np.where(swap, x, y)
        x, y = nx, ny
        s >>= 1
    return np.array([format(int(c), "08x") for c in d], dtype=str)
