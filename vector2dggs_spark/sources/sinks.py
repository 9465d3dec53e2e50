"""GeoParquet sink (S7) — Hive-partitioned output with a WKB ``geometry``
column (cell center point or cell boundary polygon) and GeoParquet 1.1.0
``geo`` schema metadata.

Spark cannot attach custom Parquet schema metadata at write time, so the
``geo`` footer is added in a pyarrow post-pass per output file, mirroring
the reference's per-partition writer + metadata merge
(``/root/reference/vector2dggs/common.py:201-316`` and ``:332-381``).
At cluster scale the post-pass parallelizes trivially per file; here it
runs driver-side over the (one-file-per-partition) layout.
"""
from __future__ import annotations

import json
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from vector2dggs_spark.plans.pipeline import IndexResult

# minimal PROJJSON for EPSG:4326 (public registry definition)
EPSG_4326_PROJJSON = {
    "$schema": "https://proj.org/schemas/v0.7/projjson.schema.json",
    "type": "GeographicCRS",
    "name": "WGS 84",
    "datum_ensemble": {
        "name": "World Geodetic System 1984 ensemble",
        "members": [],
        "ellipsoid": {
            "name": "WGS 84",
            "semi_major_axis": 6378137,
            "inverse_flattening": 298.257223563,
        },
        "accuracy": "2.0",
    },
    "coordinate_system": {
        "subtype": "ellipsoidal",
        "axis": [
            {"name": "Geodetic latitude", "abbreviation": "Lat", "direction": "north", "unit": "degree"},
            {"name": "Geodetic longitude", "abbreviation": "Lon", "direction": "east", "unit": "degree"},
        ],
    },
    "id": {"authority": "EPSG", "code": 4326},
}


def _point_wkb(lon: np.ndarray, lat: np.ndarray) -> list[bytes]:
    n = len(lon)
    buf = np.zeros((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 5:] = np.stack([lon, lat], 1).astype("<f8").view(np.uint8).reshape(n, 16)
    return [b.tobytes() for b in buf]


def _polygon_wkb(rings: np.ndarray) -> list[bytes]:
    """(n, m, 2) closed rings -> WKB polygons."""
    out = []
    m = rings.shape[1]
    head = struct.pack("<BII", 1, 3, 1)
    for ring in rings:
        out.append(head + struct.pack("<I", m) + np.ascontiguousarray(ring, dtype="<f8").tobytes())
    return out


def geometry_udf(backend, res: int, mode: str):
    """cell -> WKB geometry, vectorized (point: cell center; polygon:
    cell boundary — reference cell_to_point / cell_to_polygon)."""

    @F.pandas_udf("binary")
    def _udf(cells: pd.Series) -> pd.Series:
        arr = cells.to_numpy(dtype=str)
        if mode == "point":
            lat, lon = backend.cell_center(arr, res)
            return pd.Series(_point_wkb(lon, lat))
        rings = backend.cell_boundary(arr, res)
        return pd.Series(_polygon_wkb(rings))

    return _udf


def write_geoparquet(
    result: IndexResult,
    output: str,
    mode: str = "point",
    compression: str = "snappy",
    overwrite: bool = False,
) -> None:
    if mode not in ("point", "polygon"):
        raise ValueError("geo mode must be 'point' or 'polygon'")
    geom = geometry_udf(result.backend, result.resolution, mode)
    df = result.cells.withColumn("geometry", geom(F.col(result.cell_col)))
    (
        df.repartition(F.col(result.parent_col))
        .sortWithinPartitions(result.cell_col)
        .write.mode("overwrite" if overwrite else "errorifexists")
        .option("compression", compression)
        .partitionBy(result.parent_col)
        .parquet(output)
    )
    attach_geo_metadata(output, mode, compression=compression)


def _wkb_bounds(wkb_col) -> tuple[float, float, float, float]:
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for b in wkb_col:
        buf = memoryview(b)
        gtype = struct.unpack_from("<I", buf, 1)[0]
        if gtype == 1:
            x, y = struct.unpack_from("<2d", buf, 5)
            xs = np.array([x])
            ys = np.array([y])
        else:
            npts = struct.unpack_from("<I", buf, 9)[0]
            arr = np.frombuffer(buf, dtype="<f8", count=2 * npts, offset=13).reshape(-1, 2)
            xs, ys = arr[:, 0], arr[:, 1]
        minx = min(minx, xs.min())
        miny = min(miny, ys.min())
        maxx = max(maxx, xs.max())
        maxy = max(maxy, ys.max())
    return float(minx), float(miny), float(maxx), float(maxy)


def attach_geo_metadata(output: str, mode: str, compression: str = "snappy") -> int:
    """Rewrite each data file's footer with GeoParquet 1.1.0 ``geo``
    metadata (bbox + geometry_types per file), preserving the requested
    compression codec (the round-1 version silently re-encoded to
    snappy, discarding --compression)."""
    gtype = "Point" if mode == "point" else "Polygon"
    n = 0
    for root, _dirs, files in os.walk(output):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            path = os.path.join(root, fn)
            table = pq.read_table(path)
            if "geometry" not in table.column_names:
                continue
            bbox = _wkb_bounds(table.column("geometry").to_pylist())
            geo_meta = {
                "version": "1.1.0",
                "primary_column": "geometry",
                "columns": {
                    "geometry": {
                        "encoding": "WKB",
                        "crs": EPSG_4326_PROJJSON,
                        "geometry_types": [gtype],
                        "bbox": list(bbox),
                    }
                },
            }
            meta = dict(table.schema.metadata or {})
            meta[b"geo"] = json.dumps(geo_meta).encode()
            pq.write_table(
                table.replace_schema_metadata(meta), path, compression=compression
            )
            n += 1
    return n
