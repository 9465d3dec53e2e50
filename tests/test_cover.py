"""Adaptive mixed-level region covers (RegionCoverer analog)."""
import numpy as np
import pytest

from vector2dggs_spark.dggs import get_backend
from vector2dggs_spark.operators.cover import adaptive_cover

POLY = np.array([
    [-176.6, -44.4], [-175.4, -44.2], [-175.2, -43.4],
    [-176.0, -43.0], [-176.8, -43.6], [-176.6, -44.4],
])


@pytest.mark.parametrize("dggs,fine_res", [
    ("geohash", 6), ("rhp", 6), ("s2", 12), ("h3", 7), ("a5", 10),
])
def test_cover_is_superset_within_budget(dggs, fine_res):
    """Every center-inside polyfill cell at a finer resolution has an
    ancestor in the cover, and the cover respects max_cells."""
    b = get_backend(dggs)
    cov = adaptive_cover(b, [POLY], max_cells=64)
    assert 0 < len(cov) <= 64
    levels = sorted({b.get_resolution(str(c)) for c in cov})
    covset = set(cov.tolist())
    fine = np.asarray(b.polyfill([POLY], fine_res), dtype=str)
    assert len(fine)
    for c in fine:
        assert any(
            b.parent(np.array([c]), lv)[0] in covset
            for lv in levels
            if lv <= fine_res
        ), (dggs, c)


def test_cover_mixed_levels_and_budget_scaling():
    """A bigger budget refines the boundary finer (strictly more cells,
    deeper max level) while interior stays coarse (mixed levels)."""
    b = get_backend("s2")
    small = adaptive_cover(b, [POLY], max_cells=16)
    big = adaptive_cover(b, [POLY], max_cells=128)
    assert len(small) <= 16 and len(big) <= 128
    assert len(big) > len(small)
    lv_small = {b.get_resolution(str(c)) for c in small}
    lv_big = {b.get_resolution(str(c)) for c in big}
    assert max(lv_big) >= max(lv_small)
    assert len(lv_big) > 1  # genuinely mixed-resolution


POLY_HI = np.array([
    [100.0, 72.0], [103.5, 72.3], [104.0, 74.5],
    [101.2, 75.2], [99.8, 73.6], [100.0, 72.0],
])


@pytest.mark.parametrize("dggs", ["geohash", "rhp", "s2", "h3", "a5"])
def test_cover_superset_at_high_latitude(dggs):
    """Round-5 code review: cell_bbox implementations that ignore the
    1/cos(lat) longitude stretch under-cover at high latitudes, and the
    exact edge test no longer hides it — a boundary edge crossing the
    uncovered lobe of a cell dropped that cell and every fine cell
    under it.  Same superset property as the mid-latitude test, at
    72-75°N; the fine resolution is the cover's own deepest level so
    every polyfill cell must find an equal-or-coarser ancestor."""
    b = get_backend(dggs)
    cov = adaptive_cover(b, [POLY_HI], max_cells=64)
    assert 0 < len(cov) <= 64
    levels = sorted({b.get_resolution(str(c)) for c in cov})
    fine_res = max(levels)
    covset = set(cov.tolist())
    fine = np.asarray(b.polyfill([POLY_HI], fine_res), dtype=str)
    assert len(fine)
    for c in fine:
        assert any(
            b.parent(np.array([c]), lv)[0] in covset
            for lv in levels
            if lv <= fine_res
        ), (dggs, c)


def test_cap_bbox_contains_sampled_circle():
    """cap_bbox vs a densely sampled great-circle cap boundary at
    benign, high-latitude, and pole-containing centers."""
    from vector2dggs_spark.dggs import cap_bbox

    for clat, clon, w in ((10.0, 20.0, 2.0), (-44.0, -176.0, 1.5),
                          (74.0, 100.0, 3.0), (-81.0, 5.0, 4.0)):
        lat_lo, lon_lo, lat_hi, lon_hi = [
            float(np.atleast_1d(v)[0]) for v in cap_bbox(clat, clon, w)
        ]
        az = np.linspace(0, 2 * np.pi, 721)
        wr, phi = np.radians(w), np.radians(clat)
        sl = np.sin(phi) * np.cos(wr) + np.cos(phi) * np.sin(wr) * np.cos(az)
        lat = np.degrees(np.arcsin(np.clip(sl, -1, 1)))
        lon = clon + np.degrees(np.arctan2(
            np.sin(az) * np.sin(wr) * np.cos(phi),
            np.cos(wr) - np.sin(phi) * sl,
        ))
        assert (lat >= lat_lo - 1e-9).all() and (lat <= lat_hi + 1e-9).all()
        assert (lon >= lon_lo - 1e-9).all() and (lon <= lon_hi + 1e-9).all()
    # pole-containing cap -> full longitude range + the pole itself
    lat_lo, lon_lo, lat_hi, lon_hi = [
        float(np.atleast_1d(v)[0]) for v in cap_bbox(89.0, 33.0, 2.0)
    ]
    assert lat_hi == 90.0 and lon_lo == -180.0 and lon_hi == 180.0


def test_seg_box_hit_exact():
    """Liang-Barsky classification: crossing, containment, touch, and —
    the case the old edge-bbox overlap test got wrong — a box inside a
    diagonal edge's bounding rectangle but off the segment itself."""
    from vector2dggs_spark.operators.cover import _seg_box_hit

    # one diagonal segment (0,0)->(10,10)
    sx0, sy0 = np.array([0.0]), np.array([0.0])
    sx1, sy1 = np.array([10.0]), np.array([10.0])

    def hit(lox, hix, loy, hiy):
        return bool(
            _seg_box_hit(
                sx0, sy0, sx1, sy1,
                np.array([lox]), np.array([hix]),
                np.array([loy]), np.array([hiy]),
            )[0, 0]
        )

    assert hit(4.0, 6.0, 4.0, 6.0)          # crosses through the box
    assert hit(-1.0, 11.0, -1.0, 11.0)      # segment inside the box
    assert hit(5.0, 6.0, 5.0, 5.5)          # clipped corner
    assert not hit(7.0, 9.0, 1.0, 3.0)      # inside the edge's bounding
    assert not hit(1.0, 3.0, 7.0, 9.0)      # rect but off the segment
    assert hit(5.0, 7.0, 3.0, 5.0)          # corner touch (x=5,y=5)
    assert not hit(11.0, 12.0, 11.0, 12.0)  # beyond the endpoint
    # axis-parallel segments (p == 0 slabs)
    v0, v1 = np.array([2.0]), np.array([2.0])
    assert bool(_seg_box_hit(v0, np.array([1.0]), v1, np.array([8.0]),
                             np.array([1.5]), np.array([2.5]),
                             np.array([3.0]), np.array([4.0]))[0, 0])
    assert not bool(_seg_box_hit(v0, np.array([1.0]), v1, np.array([8.0]),
                                 np.array([3.0]), np.array([4.0]),
                                 np.array([3.0]), np.array([4.0]))[0, 0])


def test_cover_superset_with_nonconvex_hole():
    """ADVICE r04 (medium): vertex/edge classification must include
    hole rings.  A thin strip of material jutting into a large hole
    crosses cells whose 5 sample points (corners + center) all land in
    the hole; with outer-ring-only tests those cells were dropped at
    classification and every fine cell inside the strip lost its only
    ancestor — breaking the documented superset invariant."""
    outer = np.array(
        [[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0], [0.0, 0.0]]
    )
    # hole = (1,1)-(7,7) square MINUS a 0.1-deg-wide strip of material
    # x in [3.95, 4.05], y in [3, 7] hanging down from the top material
    hole = np.array(
        [[1.0, 1.0], [7.0, 1.0], [7.0, 7.0], [4.05, 7.0], [4.05, 3.0],
         [3.95, 3.0], [3.95, 7.0], [1.0, 7.0], [1.0, 1.0]]
    )
    b = get_backend("geohash")
    cov = adaptive_cover(b, [outer, hole], max_cells=256, max_res=4)
    covset = set(cov.tolist())
    levels = sorted({b.get_resolution(str(c)) for c in cov})
    fine = np.asarray(b.polyfill([outer, hole], 4), dtype=str)
    lat_lo, lon_lo, lat_hi, lon_hi = b.cell_bbox(fine, 4)
    cx = (np.atleast_1d(lon_lo) + np.atleast_1d(lon_hi)) / 2.0
    cy = (np.atleast_1d(lat_lo) + np.atleast_1d(lat_hi)) / 2.0
    strip = fine[(cx > 3.9) & (cx < 4.1) & (cy > 3.0) & (cy < 7.0)]
    assert len(strip)  # the notch really contains fine material cells
    for c in strip:
        assert any(
            b.parent(np.array([c]), lv)[0] in covset
            for lv in levels
            if lv <= 4
        ), c


def test_cover_deterministic():
    b = get_backend("geohash")
    a = adaptive_cover(b, [POLY], max_cells=64)
    c = adaptive_cover(b, [POLY], max_cells=64)
    assert a.tolist() == c.tolist()


def test_cover_tiny_polygon_single_cellish():
    """A polygon much smaller than one cell still gets a valid cover."""
    tiny = np.array([
        [-176.600, -44.400], [-176.599, -44.400],
        [-176.599, -44.399], [-176.600, -44.399], [-176.600, -44.400],
    ])
    b = get_backend("geohash")
    cov = adaptive_cover(b, [tiny], max_cells=8)
    assert 1 <= len(cov) <= 8
    fine = np.asarray(b.polyfill([tiny], 8), dtype=str)
    levels = sorted({b.get_resolution(str(c)) for c in cov})
    covset = set(cov.tolist())
    for c in fine:
        assert any(b.parent(np.array([c]), lv)[0] in covset for lv in levels if lv <= 8)
