"""S2 backend adapter (SURVEY.md C9-C12) — tokens are hex with trailing
zeros stripped, parent is a native Spark bit expression on the u64
(token right-padded to 16 hex, split-halves conv to dodge signed-cast
overflow), compaction anchors on the first (minimum-position) child."""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import s2 as S


class S2Backend:
    name = "s2"
    min_res = S.MIN_RES
    max_res = S.MAX_RES
    geodesic = S.GEODESIC
    min_siblings = 4

    def point_to_cell(self, lat, lon, res):
        return S.to_token(S.latlng_to_cell(lat, lon, res))

    def native_point_cells(self, df, lat, lon, res, keep_cols, out="cell"):
        """Arrow path (same huge-branchy-SQL economics as H3 — the
        layered SQL in sqlgen.s2_select_sql is the q31/q37 oracle)."""
        return None

    def cell_center(self, cells, res):
        return S.cell_to_latlng(S.from_token(np.asarray(cells, dtype=str)))

    def parent(self, cells, parent_res):
        return S.to_token(S.parent(S.from_token(np.asarray(cells, dtype=str)), parent_res))

    def parent_expr(self, col: Column, res: int, parent_res: int) -> Column:
        """Native bit math.  u64 ids exceed signed range for faces 4-5,
        so the 16-hex token parses as two 32-bit halves recombined with
        shifts (two's-complement wrap gives the right bit pattern)."""
        padded = F.rpad(col, 16, "0")
        hi = F.conv(F.substring(padded, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(padded, 9, 8), 16, 10).cast("long")
        v = F.shiftleft(hi, 32).bitwiseOR(lo)
        lsb = 1 << (2 * (S.MAX_RES - parent_res))
        pv = v.bitwiseAND(F.lit(~(2 * lsb - 1))).bitwiseOR(F.lit(lsb))
        # back to token: 16-hex zero-padded, strip trailing zeros
        hx = F.lower(F.lpad(F.hex(pv), 16, "0"))
        return F.regexp_replace(hx, "0+$", "")

    # --------------------------------------------------------- compaction kit
    def compact(self, cells):
        v = S.from_token(np.asarray(list(cells), dtype=str))
        return set(S.to_token(np.array(sorted(S.compact(set(v.tolist()))), dtype=np.uint64)))

    def get_resolution(self, cell: str) -> int:
        # pure-int lsb math (token -> level) — the numpy scalar
        # get_level() path costs ~75 us/call and this is called per
        # cell in the compaction floor (q59 profile)
        v = int(cell.ljust(16, "0"), 16)
        return S.MAX_RES - ((v & -v).bit_length() - 1) // 2

    def children_at_res(self, cell: str, target_res: int):
        if target_res <= self.get_resolution(cell):
            return [cell]
        kids = S.children(int(S.from_token([cell])[0]), target_res)
        return list(S.to_token(np.array(kids, dtype=np.uint64)))

    def designated_child(self, cell: str, res: int) -> str:
        """First child at res (minimum position id) — the deterministic
        relabel anchor, matching the reference's 'first child' role."""
        v = int(S.from_token([cell])[0])
        cur = self.get_resolution(cell)
        for lv in range(cur + 1, res + 1):
            lsb = 1 << (2 * (S.MAX_RES - lv))
            old = v & ((~v) + 1)
            v = v - old + lsb
        return str(S.to_token(np.array([v], dtype=np.uint64))[0])

    # --------------------------------------------------------- geometry ops
    def polyfill(self, rings, res):
        return S.polyfill(rings, res)

    def linetrace(self, coords, res):
        return S.linetrace(coords, res)

    def grid_disk(self, cells, res, k):
        return S.grid_disk(np.asarray(cells, dtype=str), res, k)

    def cell_width_deg(self, res: int) -> float:
        return S.cell_width_deg(res)

    def cell_bbox(self, cells, res):
        # conservative: an S2 cell's angular circumradius is under
        # 0.65x the nominal width (max diagonal/2 with the quadratic
        # transform's shrinkage), so a cap of radius cell_width always
        # contains it; cap_bbox adds the 1/cos(lat) longitude stretch
        # and pole handling the old lon±width form lacked
        from vector2dggs_spark.dggs import cap_bbox

        lat, lon = self.cell_center(cells, res)
        return cap_bbox(lat, lon, self.cell_width_deg(res))

    def cell_boundary(self, cells, res):
        """(n, 5, 2) [lon, lat] rings from the cell's exact ST bounds."""
        v = S.from_token(np.asarray(cells, dtype=str))
        face, s_lo, t_lo, s_hi, t_hi = S.cell_bounds_st(v)
        n = len(face)
        ring = np.empty((n, 5, 2))
        for idx, (ss, tt) in enumerate([(s_lo, t_lo), (s_hi, t_lo), (s_hi, t_hi), (s_lo, t_hi)]):
            u, w = S._st_to_uv(ss), S._st_to_uv(tt)
            x, y, z = S._face_uv_to_xyz(face, u, w)
            r = np.sqrt(x * x + y * y + z * z)
            ring[:, idx, 1] = np.degrees(np.arcsin(np.clip(z / r, -1, 1)))
            ring[:, idx, 0] = np.degrees(np.arctan2(y, x))
        ring[:, 4] = ring[:, 0]
        return ring

    # --------------------------------------------------------- defaults
    def col_name(self, res: int) -> str:
        return f"{self.name}_{res:02d}"

    def default_parent_res(self, res: int) -> int:
        return max(self.min_res, res - 6)

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
