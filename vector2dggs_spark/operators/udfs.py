"""Vectorized pandas-UDF factories over the DGGS kernels.

Every UDF here is Arrow-batched (`pandas_udf`) — numpy kernels over whole
Series, never per-row Python (BASELINE.json input_hint requirement)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import Backend


def point_to_cell_udf(backend: Backend, res: int):
    """(lat double, lon double) -> cell string.

    Backends exposing ``point_to_cell_pa`` (h3) get an Arrow-native UDF:
    float64 batches arrive zero-copy as numpy and the token column is
    built directly as a pyarrow StringArray from offsets+data buffers —
    no pandas Series and no per-row Python string objects on either
    side of the boundary (guide §4.2; measured 1.59 -> 1.23 s on the
    10M-point headline encode).  Other backends keep the pandas path."""
    fast = getattr(backend, "point_to_cell_pa", None)
    if fast is not None:

        @F.arrow_udf("string")
        def _audf(lat: pa.Array, lon: pa.Array) -> pa.Array:
            return fast(
                lat.to_numpy(zero_copy_only=False),
                lon.to_numpy(zero_copy_only=False),
                res,
            )

        return _audf

    @F.pandas_udf("string")
    def _udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(backend.point_to_cell(lat.to_numpy(), lon.to_numpy(), res))

    return _udf


def grid_disk_udf(backend: Backend, res: int, k: int):
    """cell string -> array<string> of its (2k+1)^2-ish disk neighbors."""

    @F.pandas_udf("array<string>")
    def _udf(cells: pd.Series) -> pd.Series:
        if cells.empty:
            return pd.Series([], dtype=object)
        disk = backend.grid_disk(cells.to_numpy(dtype=str), res, k)
        return pd.Series(list(disk))

    return _udf


def grid_annulus_udf(backend: Backend, res: int, k: int, k_inner: int):
    """cell string -> array<string> of disk(k) \\ disk(k_inner) — the kNN
    annulus expansion's NEW cells, in ONE vectorized UDF call (square
    grids build the Chebyshev frame directly; others fall back to two
    disks + setdiff — Backend.grid_annulus).  May contain duplicates at
    pole clips: callers apply array_distinct, like the disk path."""

    @F.pandas_udf("array<string>")
    def _udf(cells: pd.Series) -> pd.Series:
        if cells.empty:
            return pd.Series([], dtype=object)
        arr = cells.to_numpy(dtype=str)
        if hasattr(backend, "grid_annulus"):
            ann = backend.grid_annulus(arr, res, k, k_inner)
        else:
            # NOT dead code: h3/s2/a5 backends are duck-typed (they do
            # not subclass Backend) and lack the grid_annulus hook
            # (exercised by q17's h3 kNN when rings go past 1)
            outer = backend.grid_disk(arr, res, k)
            inner = backend.grid_disk(arr, res, k_inner)
            ann = [np.setdiff1d(o, i) for o, i in zip(outer, inner)]
        return pd.Series([list(a) for a in ann])

    return _udf


def cell_center_udf(backend: Backend, res: int):
    """cell string -> struct<lat double, lon double> of the cell center."""

    @F.pandas_udf("lat double, lon double")
    def _udf(cells: pd.Series) -> pd.DataFrame:
        lat, lon = backend.cell_center(cells.to_numpy(dtype=str), res)
        return pd.DataFrame({"lat": lat, "lon": lon})

    return _udf


def cell_point_wkb_udf(backend: Backend, res: int):
    """cell string -> WKB point of its center (GeoParquet point mode, S7)."""

    @F.pandas_udf("binary")
    def _udf(cells: pd.Series) -> pd.Series:
        lat, lon = backend.cell_center(cells.to_numpy(dtype=str), res)
        n = len(lat)
        buf = np.zeros((n, 21), dtype=np.uint8)
        buf[:, 0] = 1
        buf[:, 1] = 1  # type=Point little-endian
        xy = np.stack([lon, lat], axis=1).astype("<f8")
        buf[:, 5:] = xy.view(np.uint8).reshape(n, 16)
        return pd.Series([b.tobytes() for b in buf])

    return _udf
