"""A5 backend adapter (SURVEY.md C17/C18) — tokens are 16-hex zero-
padded u64s, parent is a NATIVE Spark bit expression (the marker-bit
layout makes parent = mask + set-bit, like S2), compaction merges 4
triangle siblings (5 quintants at res 1)."""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import a5 as A


class A5Backend:
    name = "a5"
    min_res = A.MIN_RES
    max_res = A.MAX_RES
    geodesic = A.GEODESIC  # reference a5vectorindexer.py GEODESIC_POLYFILL
    min_siblings = 4

    def point_to_cell(self, lat, lon, res):
        return A.to_token(A.lonlat_to_cell(lat, lon, res))

    def native_point_cells(self, df, lat, lon, res, keep_cols, out="cell"):
        """Arrow path (functions/a5sql.py is the q34/q38 oracle)."""
        return None

    def cell_center(self, cells, res):
        lon, lat = A.cell_to_lonlat(A.from_token(np.asarray(cells, dtype=str)))
        return lat, lon

    def parent(self, cells, parent_res):
        return A.to_token(
            A.cell_to_parent(A.from_token(np.asarray(cells, dtype=str)), parent_res)
        )

    def parent_expr(self, col: Column, res: int, parent_res: int) -> Column:
        """Native bit math on the u64 token (split-halves conv like the
        S2 backend — faces 8-11 set bit 63, past signed range)."""
        hi = F.conv(F.substring(col, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(col, 9, 8), 16, 10).cast("long")
        v = F.shiftleft(hi, 32).bitwiseOR(lo)
        pos = A._marker_pos(parent_res)
        keep = ~((1 << (pos + 1)) - 1)
        pv = v.bitwiseAND(F.lit(keep)).bitwiseOR(F.lit(1 << pos))
        return F.lower(F.lpad(F.hex(pv), 16, "0"))

    # --------------------------------------------------------- compaction kit
    def compact(self, cells):
        v = A.from_token(np.asarray(list(cells), dtype=str))
        merged = A.compact(set(int(x) for x in v))
        return set(A.to_token(np.array(sorted(merged), dtype=np.uint64)))

    def get_resolution(self, cell: str) -> int:
        # pure-int marker-bit math — the numpy scalar path costs ~30 us
        # and this is called per cell in the compaction floor
        v = int(cell, 16)
        pos = (v & -v).bit_length() - 1
        return 0 if pos == 59 else (56 - pos) // 2 + 1

    def children_at_res(self, cell: str, target_res: int):
        if target_res <= self.get_resolution(cell):
            return [cell]
        kids = A.cell_to_children(int(A.from_token([cell])[0]), target_res)
        return list(A.to_token(np.array(kids, dtype=np.uint64)))

    def designated_child(self, cell: str, res: int) -> str:
        """First child chain at ``res`` (digit 0 / quintant 0 at every
        level = children_at_res(...)[0], the reference's relabel anchor
        a5.cell_to_children(...)[0]) — a pure marker move."""
        v = int(A.from_token([cell])[0])
        v &= ~(1 << A._marker_pos(self.get_resolution(cell)))
        return str(A.to_token(np.array([v | (1 << A._marker_pos(res))], dtype=np.uint64))[0])

    # --------------------------------------------------------- geometry ops
    def polyfill(self, rings, res):
        return A.polyfill(rings, res)

    def linetrace(self, coords, res):
        return A.linetrace(coords, res)

    def grid_disk(self, cells, res, k):
        return A.grid_disk(np.asarray(cells, dtype=str), res, k)

    def cell_width_deg(self, res: int) -> float:
        return A.cell_width_deg(res)

    def cell_bbox(self, cells, res):
        # conservative: cell_width_deg is the pentagon/triangle
        # circumDIAMETER bound, so a cap of that radius has 2x margin;
        # cap_bbox adds the 1/cos(lat) longitude stretch and pole
        # handling the old lon±width form lacked
        from vector2dggs_spark.dggs import cap_bbox

        lat, lon = self.cell_center(cells, res)
        return cap_bbox(lat, lon, self.cell_width_deg(res))

    def cell_boundary(self, cells, res):
        """(n, 4, 2) [lon, lat] closed triangle rings (each A5 cell below
        res 1 is a triangle-quadtree cell; res<=1 boundaries are the
        quintant/pentagon outlines approximated by their triangle)."""
        v = A.from_token(np.asarray(cells, dtype=str))
        lon_c, lat_c = A.cell_to_lonlat(v)
        # triangle corners via the three extreme child centers at +4 res
        n = len(v)
        ring = np.empty((n, 4, 2))
        w = self.cell_width_deg(res)
        for idx, (dx, dy) in enumerate([(-0.5, -0.3), (0.5, -0.3), (0.0, 0.6)]):
            ring[:, idx, 0] = lon_c + dx * w
            ring[:, idx, 1] = lat_c + dy * w
        ring[:, 3] = ring[:, 0]
        return ring

    # --------------------------------------------------------- defaults
    def col_name(self, res: int) -> str:
        return f"{self.name}_{res:02d}"

    def default_parent_res(self, res: int) -> int:
        return max(self.min_res, res - 6)  # reference constants.py:44

    def default_cut_threshold_deg2(self, parent_res: int) -> float:
        w = self.cell_width_deg(max(parent_res, 1)) * 2.0
        return w * w

    def ring_guarantee_deg(self, res: int, r: int) -> float:
        """Angular-step disks cover a lat/lon square of half-width
        r·(width/2); subtracting one width each for the query point's
        offset inside its cell and the candidate cell's reach gives the
        provably-covered radius (ADVICE r01: the old (r-1)·0.8·width
        exceeded the sampled coverage)."""
        return max(r / 2.0 - 2.0, 0.0) * self.cell_width_deg(res)
