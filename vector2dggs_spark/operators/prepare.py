"""Geometry preparation stage — the reference's "rewrite" pipeline
(``common.py:634-742``: bisection, antimeridian fix, double explode,
drop conditions) as ONE Arrow-vectorized ``mapInPandas`` stage.

Input : (doc_id string, span_idx int, wkt string)
Output: (doc_id string, part_uid string, geom_type string, wkb binary,
         minx, miny, maxx, maxy double, sort_key string)

* ``part_uid`` identifies one single-part piece (doc#span#part#piece) —
  the stable feature-part key that replaces pandas index bookkeeping.
* ``sort_key`` is a space-filling-curve key (geohash of the bbox
  center) used for the optional spatial repartition (O1,
  reference common.py:822-830).
* Null/empty/unparseable and unsupported-type geometries are dropped
  (P3/P4, common.py:728-742); the drop count is observable via the
  engine metrics (A6) because the stage emits rows only for survivors.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vector2dggs_spark.dggs import Backend, geohash as _gh
from vector2dggs_spark.geometry import kernels as gk
from vector2dggs_spark.geometry import wkt as gw

PREPARED_SCHEMA = (
    "doc_id string, part_uid string, geom_type string, wkb binary, "
    "minx double, miny double, maxx double, maxy double, sort_key string"
)

SORT_KEY_PRECISION = 8


def prepare(
    geoms: DataFrame,
    backend: Backend,
    cut_threshold_deg2: float | None,
    sort_method: str = "geohash",
    source_crs=None,
    cut_crs=None,
    cut_threshold_units2: float | None = None,
) -> DataFrame:
    """Parse + clean + explode + (antimeridian) + bisect, batch at a time.

    ``sort_method``: geohash | morton | hilbert (SFC key for the later
    range repartition, O1) — "none" also accepted (key still computed
    cheaply; the pipeline just skips the repartition).

    ``source_crs``: EPSG code of the input coordinates; reprojected to
    EPSG:4326 right after parsing (reference G1/G5).  ``cut_crs`` +
    ``cut_threshold_units2``: katana runs in the projected cut CRS with
    the threshold in that CRS's squared units (the reference's
    ``-c``/``--cut_crs`` semantics, common.py:529-579); otherwise
    bisection stays in 4326 degrees with ``cut_threshold_deg2``."""
    geodesic = backend.geodesic
    thr = cut_threshold_deg2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _prepare_batch(
                pdf, geodesic, thr, sort_method, source_crs, cut_crs, cut_threshold_units2
            )
            if out is not None:
                yield out

    return geoms.mapInPandas(run, schema=PREPARED_SCHEMA)


def _sort_key(lat: np.ndarray, lon: np.ndarray, method: str) -> np.ndarray:
    if method in ("geohash", "none"):
        return _gh.encode(lat, lon, SORT_KEY_PRECISION)
    from vector2dggs_spark.functions import sfc

    if method == "morton":
        return sfc.morton_key(lat, lon)
    if method == "hilbert":
        return sfc.hilbert_key(lat, lon)
    raise ValueError(f"unknown spatial sort method {method!r}")


_POINT_RE = r"^\s*POINT\s*\(\s*(-?[0-9.eE+]+)\s+(-?[0-9.eE+]+)\s*\)\s*$"


def _prepare_points_fast(pdf: pd.DataFrame, sort_method: str):
    """Vectorized fast path for plain POINT WKT (the dominant geometry
    class at web scale): regex-extract coords, build fixed-width WKB with
    one numpy pass — no per-row parser, no katana (points never bisect).
    Returns (fast_frame_or_None, remainder_pdf)."""
    wkt_s = pdf["wkt"].astype("string")
    m = wkt_s.str.extract(_POINT_RE)
    hit = m[0].notna() & m[1].notna()
    if not hit.any():
        return None, pdf
    sub = pdf[hit]
    lon = m.loc[hit, 0].astype(np.float64).to_numpy()
    lat = m.loc[hit, 1].astype(np.float64).to_numpy()
    n = len(lon)
    buf = np.zeros((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1] = 1
    buf[:, 5:] = np.stack([lon, lat], 1).astype("<f8").view(np.uint8).reshape(n, 16)
    clat = np.clip(lat, -90.0, 89.999999)
    clon = np.clip(lon, -180.0, 179.999999)
    fast = pd.DataFrame(
        {
            "doc_id": sub["doc_id"].to_numpy(),
            "part_uid": sub["doc_id"].astype(str)
            + "#"
            + sub["span_idx"].astype(str)
            + "#0#0",
            "geom_type": "Point",
            "wkb": list(buf.tobytes()[i * 21 : (i + 1) * 21] for i in range(n)),
            "minx": lon,
            "miny": lat,
            "maxx": lon,
            "maxy": lat,
            "sort_key": _sort_key(clat, clon, sort_method),
        }
    )
    return fast, pdf[~hit]


def _prepare_batch(
    pdf: pd.DataFrame,
    geodesic: bool,
    thr: float | None,
    sort_method: str = "geohash",
    source_crs=None,
    cut_crs=None,
    thr_units2: float | None = None,
):
    src = cut = None
    if source_crs not in (None, 4326, "EPSG:4326", "epsg:4326"):
        from vector2dggs_spark.geometry import crs as _crs

        src = _crs.get_crs(source_crs)
    if cut_crs not in (None, 4326, "EPSG:4326", "epsg:4326"):
        from vector2dggs_spark.geometry import crs as _crs

        cut = _crs.get_crs(cut_crs)
    if src is None:
        fast, pdf = _prepare_points_fast(pdf, sort_method)
    else:
        fast = None  # projected input: all rows take the parsed path
    doc_ids: list[str] = []
    uids: list[str] = []
    gtypes: list[str] = []
    wkbs: list[bytes] = []
    boxes: list[tuple[float, float, float, float]] = []
    for doc_id, span_idx, wkt_text in zip(pdf["doc_id"], pdf["span_idx"], pdf["wkt"]):
        geom = gw.parse_wkt(wkt_text)  # None for null/EMPTY/garbage (P3)
        if geom is None:
            continue
        if src is not None:  # reproject source CRS -> EPSG:4326 (G1/G5)
            from vector2dggs_spark.geometry.crs import transform_geom

            try:
                geom = transform_geom(geom, src.inverse)
            except ValueError:
                continue  # unsupported type for transform: drop (P4)
        # antimeridian gate: planar backends need the split
        # (reference common.py:712-722; vectorindexer.py:14-19)
        if not geodesic and gk.crosses_antimeridian(geom):
            fixed = []
            for single in gk.explode(geom):
                fixed.extend(gk.split_antimeridian(single))
            singles = fixed
        else:
            singles = gk.explode(geom)  # double explode + type filter (G6/P4)
        for part_idx, single in enumerate(singles):
            if cut is not None and thr_units2 and single[0] == "Polygon":
                # reference semantics: bisect in the projected cut CRS
                # (threshold in CRS units²), pieces back to 4326
                from vector2dggs_spark.geometry.crs import transform_geom

                proj = transform_geom(single, cut.forward)
                pieces = [
                    transform_geom(p, cut.inverse)
                    for p in gk.katana_geom(proj, thr_units2)
                ]
            else:
                pieces = (
                    gk.katana_geom(single, thr) if thr and thr > 0 else [single]
                )  # G3 bisection
            for piece_idx, piece in enumerate(pieces):
                doc_ids.append(doc_id)
                uids.append(f"{doc_id}#{span_idx}#{part_idx}#{piece_idx}")
                gtypes.append(piece[0])
                wkbs.append(gw.to_wkb(piece))
                boxes.append(gk.geom_bbox(piece))
    if not doc_ids:
        return fast
    bb = np.array(boxes, dtype=np.float64).reshape(-1, 4)
    cx = np.clip((bb[:, 0] + bb[:, 2]) / 2.0, -180.0, 179.999999)
    cy = np.clip((bb[:, 1] + bb[:, 3]) / 2.0, -90.0, 89.999999)
    sort_key = _sort_key(cy, cx, sort_method)
    slow = pd.DataFrame(
        {
            "doc_id": doc_ids,
            "part_uid": uids,
            "geom_type": gtypes,
            "wkb": wkbs,
            "minx": bb[:, 0],
            "miny": bb[:, 1],
            "maxx": bb[:, 2],
            "maxy": bb[:, 3],
            "sort_key": sort_key,
        }
    )
    if fast is None:
        return slow
    return pd.concat([fast, slow], ignore_index=True)
