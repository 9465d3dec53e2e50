"""DGGS backend registry — the engine analog of the reference's
``indexerfactory.py:5-31`` (plain strategy objects, no lazy imports needed
since all cell math is self-contained numpy).

Uniform surface per backend (SURVEY.md §2.4/C19):

* ``point_to_cell(lat, lon, res) -> np.ndarray[str]`` — vectorized
* ``polyfill(rings, res)`` / ``linetrace(coords, res)`` — per geometry
* ``parent(cells, parent_res)`` — vectorized
* ``parent_expr(col, res, parent_res)`` — **native Spark Column** where the
  cell-ID scheme allows (prefix substring for geohash/rHP, bit math for
  H3) so the secondary index never leaves the JVM
* ``compact`` / ``children_at_res`` / ``designated_child`` /
  ``get_resolution`` — compaction kit (reference vectorindexer.py:124-196)
* ``grid_disk(cells, res, k)`` — kNN ring expansion primitive (J3)
* ``cell_center(cells, res)`` — for GeoParquet point output & kNN bounds
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import geohash as _gh
from vector2dggs_spark.dggs import rhp as _rhp

DEFAULT_PARENT_OFFSET = 6  # reference constants.py:48


def cap_bbox(lat, lon, w):
    """CONSERVATIVE lat/lon bounding box of a spherical cap of angular
    radius ``w`` degrees around each (lat, lon) center — the exact
    cap-bbox construction: max |Δlon| = asin(sin w / cos lat) when the
    cap excludes the pole, full longitude range (and the pole itself)
    otherwise.  Backends whose cells fit inside such a cap get a truly
    conservative ``cell_bbox`` from this; the naive ``lon ± w`` version
    under-covers by 1/cos(lat) at high latitudes, which breaks the
    adaptive-cover superset invariant now that the cover's edge test is
    exact (round-5 code review).

    Returned longitude bounds are UNWRAPPED (lon ± dlon may exceed
    ±180): callers comparing them against [-180, 180] geometry
    (``cover._classify``) require input polygons already cut at the
    antimeridian — the engine-wide precondition (prepare's antimeridian
    split, G4); see ``adaptive_cover``'s docstring (ADVICE r05)."""
    import numpy as _np

    lat = _np.atleast_1d(_np.asarray(lat, dtype=_np.float64))
    lon = _np.atleast_1d(_np.asarray(lon, dtype=_np.float64))
    polar = (_np.abs(lat) + w) >= 90.0
    wr = _np.radians(w)
    with _np.errstate(invalid="ignore", divide="ignore"):
        sin_d = _np.sin(wr) / _np.cos(_np.radians(lat))
    dlon = _np.degrees(_np.arcsin(_np.clip(sin_d, -1.0, 1.0)))
    lat_lo = _np.where(polar & (lat < 0), -90.0, _np.maximum(lat - w, -90.0))
    lat_hi = _np.where(polar & (lat > 0), 90.0, _np.minimum(lat + w, 90.0))
    lon_lo = _np.where(polar, -180.0, lon - dlon)
    lon_hi = _np.where(polar, 180.0, lon + dlon)
    return lat_lo, lon_lo, lat_hi, lon_hi


class Backend:
    name: str
    min_res: int
    max_res: int
    geodesic: bool

    def col_name(self, res: int) -> str:
        """Zero-padded column naming (reference common.py:400, F1)."""
        return f"{self.name}_{res:02d}"

    def default_parent_res(self, res: int) -> int:
        """reference constants.py:37-47."""
        return max(self.min_res, res - DEFAULT_PARENT_OFFSET)

    def default_cut_threshold_deg2(self, parent_res: int) -> float:
        """Katana threshold in deg² ≈ one parent cell's bbox (the role of
        the reference's area-table-derived default, common.py:565-577)."""
        w = self.cell_width_deg(parent_res)
        return w * w

    def ring_guarantee_deg(self, res: int, r: int) -> float:
        """Lower bound on the distance to any point outside grid-disk(r)
        of the cell containing a query point.  Conservative default for
        hex-ish grids; square-grid backends override with the tight
        bound (kNN termination, SURVEY.md J3)."""
        return max(r - 1, 0) * 0.8 * self.cell_width_deg(res)

    def grid_annulus(self, cells, res, k, k_inner):
        """disk(k) \\ disk(k_inner) per cell (kNN annulus expansion,
        J3).  Generic fallback = two disks + setdiff; square-grid
        backends override with direct frame construction."""
        outer = self.grid_disk(cells, res, k)
        inner = self.grid_disk(cells, res, k_inner)
        return [np.setdiff1d(o, i) for o, i in zip(outer, inner)]

    def native_point_cells(self, df, lat: str, lon: str, res: int,
                           keep_cols: list[str], out: str = "cell"):
        """Pure-JVM point encode over a DataFrame, or None when this
        backend's point path belongs on the Arrow kernel instead.

        The pipeline consults this hook for its zero-Python POINT
        branch; keeping the decision per backend keeps the rationale
        with the backend (e.g. H3 measured 5x FASTER on the Arrow
        numpy kernel than on its layered-SQL formulation — the SQL is
        its oracle, not its hot path — so H3 returns None here)."""
        return None

    def native_point_keys(self, df, lat: str, lon: str, res: int,
                          keep_cols: list[str], out: str = "key"):
        """Pure-JVM int64 CELL-IDENTITY key for equi-joins, or None.

        NOT the Morton cell code: a join key only needs to identify
        the cell, so square-grid backends emit the packed quantized
        coordinates ``(x << lat_bits) | y`` — one multiply-add.  The
        Morton spread chain doubles its expression tree per stage, and
        Catalyst's join-key isnotnull pushdown SUBSTITUTES that whole
        tree into a pre-join Filter (measured: the code-keyed join ran
        1.75x SLOWER than the string-keyed one at 32M targets; the
        packed-coordinate key is what makes int keys actually win)."""
        return None

    def native_disk_keys(self, df, lat: str, lon: str, res: int, k: int,
                         keep_cols: list[str], out: str = "key",
                         k_inner: int = 0):
        """Pure-JVM Chebyshev-disk(k) cell-identity keys around each
        point's cell (one row per (point, disk cell)), or None.  Pairs
        with ``native_point_keys`` so cover+refine joins (range_join)
        and the kNN ring loop run with zero Python and int64 join keys.
        ``k_inner > 0`` emits only the ANNULUS disk(k) \\ disk(k_inner)
        (kNN's incremental round shape)."""
        return None

    def native_rect_keys(self, df, lat0: str, lon0: str, lat1: str,
                         lon1: str, res: int, keep_cols: list[str],
                         out: str = "key"):
        """Pure-JVM covering-cell keys for axis-aligned rects (one row
        per (rect, cell)), or None; pairs with ``native_point_keys`` /
        ``native_disk_keys`` for polygon-polygon cover joins."""
        return None


class GeohashBackend(Backend):
    name = "geohash"
    min_res = _gh.MIN_RES
    max_res = _gh.MAX_RES
    geodesic = _gh.GEODESIC
    min_siblings = 32  # complete sibling set size (compaction fast path)
    # "astar" = reference-parity geometry-aware bidirectional A*
    # (traversal.py); "supercover" = cheaper vectorized every-cell-crossed
    linetrace_mode = "astar"

    def point_to_cell(self, lat, lon, res):
        return _gh.encode(lat, lon, res)

    def polyfill(self, rings, res):
        return _gh.polyfill(rings, res)

    def linetrace(self, coords, res):
        return _gh.linetrace(coords, res, mode=self.linetrace_mode)

    def parent(self, cells, parent_res):
        return _gh.parent(cells, parent_res)

    def parent_expr(self, col: Column, res: int, parent_res: int) -> Column:
        return F.substring(col, 1, parent_res)

    def compact(self, cells):
        return _gh.compact(set(cells))

    def get_resolution(self, cell: str) -> int:
        return len(cell)

    def children_at_res(self, cell: str, target_res: int):
        if target_res <= len(cell):
            return [cell]
        return _gh.children(cell, target_res)

    def designated_child(self, cell: str, res: int) -> str:
        """reference geohashvectorindexer.py:166-180 (pad with '0')."""
        return cell + "0" * (res - len(cell))

    def grid_disk(self, cells, res, k):
        return _gh.grid_disk(cells, res, k)

    def grid_annulus(self, cells, res, k, k_inner):
        return _gh.grid_annulus(cells, res, k, k_inner)

    def cell_center(self, cells, res=None):
        if res is None:
            res = len(np.atleast_1d(np.asarray(cells, dtype=str))[0])
        return _gh.decode_center(cells, res)

    def cell_width_deg(self, res: int) -> float:
        dlat, dlon = _gh.cell_dims(res)
        return min(dlat, dlon)

    def cell_bbox(self, cells, res):
        return _gh.decode_bbox(cells, res)

    def ring_guarantee_deg(self, res: int, r: int) -> float:
        """Tight square-grid bound: cells Chebyshev-distance > r are
        separated by at least r axis cell-widths."""
        dlat, dlon = _gh.cell_dims(res)
        return r * min(dlat, dlon)

    def native_point_cells(self, df, lat, lon, res, keep_cols, out="cell"):
        from vector2dggs_spark.functions.sqlgen import geohash_col

        return df.select(*keep_cols, geohash_col(lat, lon, res).alias(out))

    @staticmethod
    def _xy_bits(res: int) -> tuple[int, int]:
        total = 5 * res
        lon_bits = (total + 1) // 2
        return lon_bits, total - lon_bits

    def _quantized_xy(self, df, lat, lon, res, keep_cols):
        from pyspark.sql import functions as F

        from vector2dggs_spark.functions import sqlgen as S

        lon_bits, lat_bits = self._xy_bits(res)
        return df.select(
            *keep_cols,
            F.expr(S.quantize_sql(lon, 180.0, 360.0, lon_bits)).alias("__gx"),
            F.expr(S.quantize_sql(lat, 90.0, 180.0, lat_bits)).alias("__gy"),
        )

    def native_point_keys(self, df, lat, lon, res, keep_cols, out="key"):
        from pyspark.sql import functions as F

        lon_bits, lat_bits = self._xy_bits(res)
        q = self._quantized_xy(df, lat, lon, res, keep_cols)
        return q.select(
            *keep_cols,
            F.expr(f"(__gx << {lat_bits}) | __gy").alias(out),
        )

    def native_rect_keys(self, df, lat0, lon0, lat1, lon1, res, keep_cols,
                         out="key"):
        """Packed int64 keys of every res-``res`` cell COVERING each
        row's axis-aligned [lon0..lon1]x[lat0..lat1] rect (one row per
        (rect, cell)) — the native cover side of polygon-polygon joins
        (``operators.joins.rect_join``).  Same key space as
        ``native_point_keys``; pure codegen ``sequence()`` explodes on
        the quantized corner ranges.  Rects must not cross the
        antimeridian (lon0 <= lon1; the fixtures and the reference's
        cut-at-180 preprocessing guarantee it)."""
        from pyspark.sql import functions as F

        from vector2dggs_spark.functions import sqlgen as S

        lon_bits, lat_bits = self._xy_bits(res)
        q = df.select(
            *keep_cols,
            F.expr(S.quantize_sql(lon0, 180.0, 360.0, lon_bits)).alias("__gx0"),
            F.expr(S.quantize_sql(lon1, 180.0, 360.0, lon_bits)).alias("__gx1"),
            F.expr(S.quantize_sql(lat0, 90.0, 180.0, lat_bits)).alias("__gy0"),
            F.expr(S.quantize_sql(lat1, 90.0, 180.0, lat_bits)).alias("__gy1"),
        )
        return (
            q.select(
                *keep_cols, "__gy0", "__gy1",
                F.explode(F.sequence(F.col("__gx0"), F.col("__gx1"))).alias("__gx"),
            )
            .select(
                *keep_cols, "__gx",
                F.explode(F.sequence(F.col("__gy0"), F.col("__gy1"))).alias("__gy"),
            )
            .select(
                *keep_cols,
                F.expr(f"(__gx << {lat_bits}) | __gy").alias(out),
            )
        )

    def native_disk_keys(self, df, lat, lon, res, k, keep_cols, out="key",
                         k_inner=0):
        """Chebyshev frame on the quantized grid: ±k offsets on (x, y),
        longitude wraps (pmod), latitude rows beyond the poles are
        dropped (no such cell).  ``k_inner > 0`` keeps only offsets with
        Chebyshev norm > k_inner (the kNN annulus).  Falls back (None)
        if the frame could self-overlap after the wrap (absurdly coarse
        res vs k).

        Offsets come as a literal struct array for small disks (the
        range_join regime, fewest plan nodes) and as a codegen
        ``sequence()`` cross-explode for large/annulus frames (kNN's
        doubling rings reach k=64: a 16k-literal array would bloat the
        plan tree where two sequence explodes stay O(1) plan size)."""
        from pyspark.sql import functions as F

        lon_bits, lat_bits = self._xy_bits(res)
        n_lon, n_lat = 1 << lon_bits, 1 << lat_bits
        if 2 * k + 1 >= n_lon:
            return None
        q = self._quantized_xy(df, lat, lon, res, keep_cols)
        if k <= 4 and k_inner == 0:
            offs = F.array(*[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx in range(-k, k + 1) for dy in range(-k, k + 1)
            ])
            e = (
                q.select(*keep_cols, "__gx", "__gy", F.explode(offs).alias("__o"))
                .select(
                    *keep_cols,
                    F.expr(f"pmod(__gx + __o.dx, {n_lon})").alias("__gx"),
                    (F.col("__gy") + F.col("__o.dy")).alias("__gy"),
                )
            )
        else:
            e = (
                q.select(
                    *keep_cols, "__gx", "__gy",
                    F.explode(F.sequence(F.lit(-k), F.lit(k))).alias("__dx"),
                )
                .select(
                    *keep_cols, "__gx", "__gy", "__dx",
                    F.explode(F.sequence(F.lit(-k), F.lit(k))).alias("__dy"),
                )
                .where(
                    F.greatest(F.abs(F.col("__dx")), F.abs(F.col("__dy")))
                    > F.lit(k_inner)
                    if k_inner > 0 else F.lit(True)
                )
                .select(
                    *keep_cols,
                    F.expr(f"pmod(__gx + __dx, {n_lon})").alias("__gx"),
                    (F.col("__gy") + F.col("__dy")).alias("__gy"),
                )
            )
        return (
            e.where((F.col("__gy") >= 0) & (F.col("__gy") < n_lat))
            .select(
                *keep_cols,
                F.expr(f"(__gx << {lat_bits}) | __gy").alias(out),
            )
        )

    def cell_boundary(self, cells, res):
        """(n, m, 2) [lon, lat] closed rings — geohash cells are lat/lon
        rectangles."""
        minlat, minlon, maxlat, maxlon = _gh.decode_bbox(cells, res)
        n = len(minlat)
        ring = np.empty((n, 5, 2))
        ring[:, 0] = np.stack([minlon, minlat], 1)
        ring[:, 1] = np.stack([maxlon, minlat], 1)
        ring[:, 2] = np.stack([maxlon, maxlat], 1)
        ring[:, 3] = np.stack([minlon, maxlat], 1)
        ring[:, 4] = ring[:, 0]
        return ring


class RhpBackend(Backend):
    name = "rhp"
    min_res = _rhp.MIN_RES
    max_res = _rhp.MAX_RES
    geodesic = _rhp.GEODESIC
    min_siblings = 9

    def point_to_cell(self, lat, lon, res):
        return _rhp.point_to_cell(lat, lon, res)

    def polyfill(self, rings, res):
        return _rhp.polyfill(rings, res)

    def linetrace(self, coords, res):
        return _rhp.linetrace(coords, res)

    def parent(self, cells, parent_res):
        return _rhp.parent(cells, parent_res)

    def parent_expr(self, col: Column, res: int, parent_res: int) -> Column:
        # rHP cell strings are face letter + digits: parent = prefix of
        # length parent_res + 1 (reference rhpvectorindexer.py:52-57)
        return F.substring(col, 1, parent_res + 1)

    def compact(self, cells):
        return _rhp.compact(set(cells))

    def native_point_cells(self, df, lat, lon, res, keep_cols, out="cell"):
        from vector2dggs_spark.functions.sqlgen import rhp_cells_df

        return rhp_cells_df(df, lat, lon, res, keep_cols, out=out)

    def get_resolution(self, cell: str) -> int:
        return len(cell) - 1

    def children_at_res(self, cell: str, target_res: int):
        if target_res <= len(cell) - 1:
            return [cell]
        return _rhp.children(cell, target_res)

    def designated_child(self, cell: str, res: int) -> str:
        """rhealpixdggs rhp_to_center_child: append center digit '4'."""
        return cell + "4" * (res - (len(cell) - 1))

    def grid_disk(self, cells, res, k):
        return _rhp.grid_disk(cells, res, k)

    def cell_center(self, cells, res):
        return _rhp.cell_center(cells)

    def cell_width_deg(self, res: int) -> float:
        return _rhp.cell_width_deg(res)

    def ring_guarantee_deg(self, res: int, r: int) -> float:
        """Angular-step disks (rhp.grid_disk samples at width/2): the
        provably-covered radius is r·(width/2) minus one width each for
        the query offset and candidate cell reach."""
        return max(r / 2.0 - 2.0, 0.0) * _rhp.cell_width_deg(res)

    def cell_bbox(self, cells, res):
        """CONSERVATIVE lat/lon bounds of the exact cell shape: every
        planar edge is densified and inverse-projected (equatorial-zone
        edges are axis-aligned in lon/lat so corners would suffice, but
        polar-zone extremes fall mid-edge), padded by a sliver of the
        cell width for the residual sampling gap, and pole-containing
        cap cells extend to the pole itself.  The old center±halfwidth
        approximation UNDER-covered (up to ~6% of the cell width at
        mid-latitudes), which broke the adaptive-cover superset contract
        the moment the cover's edge test became exact."""
        import numpy as _np

        cells = _np.atleast_1d(_np.asarray(cells, dtype=str))
        face, u, v, r = _rhp.cell_to_uv(cells)
        x0, ytop = _rhp._face_origin(face)
        side = (_np.pi / 2.0) / (3**r)
        cx = x0 + u * (_np.pi / 2.0)
        cy = ytop - v * (_np.pi / 2.0)
        K = 9
        t = _np.linspace(-0.5, 0.5, K)
        full = _np.full(K, 0.5)
        lon_s, lat_s = [], []
        for dx, dy in ((t, -full), (full, t), (t, full), (-full, t)):
            lon, lat = _rhp.unproject(
                cx[:, None] + dx[None, :] * side,
                cy[:, None] + dy[None, :] * side,
            )
            lon_s.append(lon)
            lat_s.append(lat)
        lon = _np.concatenate(lon_s, axis=1)
        lat = _np.concatenate(lat_s, axis=1)
        pad = _np.degrees(side) * 0.02
        lat_lo = lat.min(axis=1) - pad
        lat_hi = lat.max(axis=1) + pad
        lon_lo = lon.min(axis=1) - pad
        lon_hi = lon.max(axis=1) + pad
        # cap cells containing a pole: the interior extreme is the pole
        for ctr, is_north in ((_rhp._NORTH_CENTER, True), (_rhp._SOUTH_CENTER, False)):
            at_pole = (
                (_np.abs(cx - ctr[0]) <= side / 2.0)
                & (_np.abs(cy - ctr[1]) <= side / 2.0)
            )
            if at_pole.any():
                lon_lo = _np.where(at_pole, -180.0, lon_lo)
                lon_hi = _np.where(at_pole, 180.0, lon_hi)
                if is_north:
                    lat_hi = _np.where(at_pole, 90.0, lat_hi)
                else:
                    lat_lo = _np.where(at_pole, -90.0, lat_lo)
        return (
            _np.maximum(lat_lo, -90.0),
            lon_lo,
            _np.minimum(lat_hi, 90.0),
            lon_hi,
        )

    def cell_boundary(self, cells, res):
        """(n, 5, 2) [lon, lat] rings: planar cell-square corners
        inverse-projected to the sphere (exact rHEALPix cell shape)."""
        import numpy as _np

        face, u, v, r = _rhp.cell_to_uv(_np.atleast_1d(cells))
        x0, ytop = _rhp._face_origin(face)
        side = (_np.pi / 2.0) / (3**r)
        half = 0.5
        cx = x0 + u * (_np.pi / 2.0)
        cy = ytop - v * (_np.pi / 2.0)
        n = len(face)
        ring = _np.empty((n, 5, 2))
        for idx, (du, dv) in enumerate([(-half, -half), (half, -half), (half, half), (-half, half)]):
            lon, lat = _rhp.unproject(cx + du * side, cy + dv * side)
            ring[:, idx, 0] = lon
            ring[:, idx, 1] = lat
        ring[:, 4] = ring[:, 0]
        return ring


_REGISTRY: dict[str, Backend] = {}


def register(backend: Backend) -> None:
    _REGISTRY[backend.name] = backend


_LAZY = {
    "h3": ("vector2dggs_spark.dggs.h3backend", "H3Backend"),
    "s2": ("vector2dggs_spark.dggs.s2backend", "S2Backend"),
    "a5": ("vector2dggs_spark.dggs.a5backend", "A5Backend"),
}


def get_backend(name: str) -> Backend:
    """Lazy-loads heavy backends: h3's table derivation only runs in
    workers that actually index with h3 (a geohash/rhp pipeline never
    pays the import)."""
    if name not in _REGISTRY and name in _LAZY:
        import importlib

        mod, cls = _LAZY[name]
        register(getattr(importlib.import_module(mod), cls)())
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown DGGS {name!r}; available: {sorted(set(_REGISTRY) | set(_LAZY))}"
        ) from None


def available() -> list[str]:
    return sorted(set(_REGISTRY) | set(_LAZY))


register(GeohashBackend())
register(RhpBackend())
