"""Geohash cell math vs published reference encodings."""
import numpy as np
import pytest

from vector2dggs_spark.dggs import geohash as gh
from vector2dggs_spark.dggs import geohash as G

# Published vectors: Wikipedia "Geohash" article + original geohash.org
# examples — public knowledge, exact.
KNOWN = [
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (42.605, -5.603, 5, "ezs42"),
    (37.8324, 112.5584, 9, "ww8p1r4t8"),
    (48.669, -4.329, 5, "gbsuv"),
]


@pytest.mark.parametrize("lat,lon,prec,expected", KNOWN)
def test_encode_known_vectors(lat, lon, prec, expected):
    assert gh.encode([lat], [lon], prec)[0] == expected


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 500)
    lon = rng.uniform(-179.9, 179.9, 500)
    for prec in (1, 4, 7, 12):
        cells = gh.encode(lat, lon, prec)
        clat, clon = gh.decode_center(cells, prec)
        dlat, dlon = gh.cell_dims(prec)
        assert np.all(np.abs(clat - lat) <= dlat / 2 + 1e-9)
        assert np.all(np.abs(clon - lon) <= dlon / 2 + 1e-9)
        # re-encoding the center gives the same cell
        assert np.array_equal(gh.encode(clat, clon, prec), cells)


def test_parent_prefix():
    cells = gh.encode([57.64911], [10.40744], 9)
    assert gh.parent(cells, 4)[0] == "u4pr"
    assert gh.parent(cells, 9)[0] == cells[0]


def test_children_and_compact_inverse():
    kids = gh.children("ezs4", 6)
    assert len(kids) == 32 * 32
    assert all(k.startswith("ezs4") for k in kids)
    assert gh.compact(set(kids)) == {"ezs4"}
    # partial single-level sibling set does not compact
    one_level = gh.children("ezs4", 5)
    assert gh.compact(set(one_level[:-1])) == set(one_level[:-1])


def test_compact_mixed_depth_fixpoint():
    # all grandchildren of "7" -> "7" in two merge rounds
    kids = gh.children("7", 3)
    assert gh.compact(set(kids)) == {"7"}


def test_grid_disk():
    cells = gh.encode([42.0], [-5.0], 6)
    disk1 = gh.grid_disk(cells, 6, 1)
    assert disk1.shape == (1, 9)
    assert cells[0] in disk1[0]
    assert len(set(disk1[0])) == 9
    # neighbors are one cell-step away
    lat0, lon0 = gh.decode_center(cells, 6)
    dlat, dlon = gh.cell_dims(6)
    nlat, nlon = gh.decode_center(disk1[0], 6)
    assert np.all(np.abs(nlat - lat0[0]) <= dlat + 1e-9)
    assert np.all(np.abs(nlon - lon0[0]) <= dlon + 1e-9)


def test_grid_disk_antimeridian_wrap():
    cells = gh.encode([0.0], [179.999], 4)
    disk = gh.grid_disk(cells, 4, 1)
    lons = gh.decode_center(disk[0], 4)[1]
    assert (lons > 170).any() and (lons < -170).any()


def test_polyfill_center_inside_semantics():
    # 1x1 degree square: every precision-4 cell center inside is reported
    ring = np.array([[10.0, 50.0], [11.0, 50.0], [11.0, 51.0], [10.0, 51.0], [10.0, 50.0]])
    cells = gh.polyfill([ring], 4)
    assert len(cells) > 0
    clat, clon = gh.decode_center(cells, 4)
    assert np.all((clon > 10.0) & (clon < 11.0) & (clat > 50.0) & (clat < 51.0))
    # exhaustive: no cell center inside the box is missing
    dlat, dlon = gh.cell_dims(4)
    n_expect = 0
    lat_q0 = int(np.ceil((50.0 + 90.0) / dlat - 0.5))
    lats = []
    q = lat_q0
    while -90.0 + (q + 0.5) * dlat < 51.0:
        lats.append(q)
        q += 1
    lon_q0 = int(np.ceil((10.0 + 180.0) / dlon - 0.5))
    lons = []
    q = lon_q0
    while -180.0 + (q + 0.5) * dlon < 11.0:
        lons.append(q)
        q += 1
    n_expect = len(lats) * len(lons)
    assert len(cells) == n_expect


def test_polyfill_hole():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    hole = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]])
    with_hole = set(gh.polyfill([outer, hole], 4))
    without = set(gh.polyfill([outer], 4))
    removed = without - with_hole
    assert removed
    clat, clon = gh.decode_center(np.array(sorted(removed)), 4)
    assert np.all((clon > 1.0) & (clon < 3.0) & (clat > 1.0) & (clat < 3.0))


def test_linetrace_connected_and_dedup():
    coords = np.array([[10.0, 50.0], [10.5, 50.2], [10.5, 50.2], [11.0, 49.8]])
    cells = gh.linetrace(coords, 5)
    assert len(cells) == len(set(cells))  # dedup (O5)
    # endpoints' cells present
    ends = gh.encode([50.0, 49.8], [10.0, 11.0], 5)
    assert set(ends) <= set(cells)
    # chain is 8-connected: successive grid cells differ by <=1 step
    lat_q, lon_q = gh.decode_int(cells, 5)
    pts = sorted(zip(lon_q.tolist(), lat_q.tolist()))
    # every cell has at least one 8-neighbor in the set (connectivity)
    s = set(pts)
    for x, y in pts:
        if len(pts) == 1:
            break
        assert any(
            (x + dx, y + dy) in s for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
        )


# ------------------------------------------------------------- A* linetrace
def test_linetrace_astar_straight_equals_supercover():
    """On an axis-aligned segment the optimal A* path IS the supercover."""
    c = np.array([[-176.5, -44.1], [-176.3, -44.1]])
    assert set(G.linetrace_astar(c, 6)) == set(G.linetrace_supercover(c, 6))


def test_linetrace_astar_skips_corner_cells():
    """Diagonal: the A* path legitimately skips corner-touched cells the
    supercover includes (the reference-parity distinction, VERDICT C14)."""
    c = np.array([[-176.5, -44.2], [-176.3, -44.0]])
    a = set(G.linetrace_astar(c, 6))
    s = set(G.linetrace_supercover(c, 6))
    assert a <= s and len(a) < len(s)
    ends = set(G.encode(c[:, 1], c[:, 0], 6))
    assert ends <= a


@pytest.mark.parametrize(
    "prec,seg",
    [
        # sub-degree segment at fixture precision (round-2 coverage)
        (5, ((-176.48, -44.18), (-176.33, -44.04))),
        # multi-degree segment at a coarse precision: the round-2 squared
        # heuristic was inadmissible here (ADVICE r02 — cell width ~1.4°,
        # segment spans ~8°) and could terminate on a suboptimal path
        (3, ((-176.5, -44.2), (-169.0, -40.5))),
        # long diagonal at precision 4 crossing many cells
        (4, ((-176.6, -44.4), (-172.0, -43.0))),
    ],
)
def test_linetrace_astar_cost_optimal_vs_dijkstra(prec, seg):
    """Independent oracle: the A* meeting path cost equals the true
    minimum path cost from a plain Dijkstra over the same step costs
    (1 + w·perp-distance), so the bidirectional termination is sound."""
    import heapq

    w = 1.0
    dlat, dlon = G.cell_dims(prec)
    nx, ny = int(round(360 / dlon)), int(round(180 / dlat))

    def cell_of(lon, lat):
        return (int((lon + 180) / dlon), int((lat + 90) / dlat))

    def cost(c):
        lon = (c[0] + 0.5) * dlon - 180
        lat = (c[1] + 0.5) * dlat - 90
        return 1.0 + w * G._pt_seg_dist(lon, lat, seg[0], seg[1])

    s, e = cell_of(*seg[0]), cell_of(*seg[1])
    dist = {s: 0.0}
    heap = [(0.0, s)]
    while heap:
        d, cur = heapq.heappop(heap)
        if cur == e:
            break
        if d > dist.get(cur, float("inf")):
            continue
        for nb in G._cell_grid_neighbors(cur[0], cur[1], nx, ny):
            nd = d + cost(nb)
            if nd < dist.get(nb, float("inf")):
                dist[nb] = nd
                heapq.heappush(heap, (nd, nb))
    optimal = dist[e]

    path = G._astar_segment_cells(
        seg[0][0] + 180, seg[0][1] + 90, seg[1][0] + 180, seg[1][1] + 90,
        seg, dlat, dlon, w,
    )
    got = sum(cost(c) for c in path if c != s)
    assert abs(got - optimal) < 1e-9, (got, optimal)


def test_backend_linetrace_mode_plumbing():
    from vector2dggs_spark.dggs import get_backend

    b = get_backend("geohash")
    assert b.linetrace_mode == "astar"
    c = np.array([[-176.5, -44.2], [-176.3, -44.0]])
    assert set(b.linetrace(c, 6)) == set(G.linetrace_astar(c, 6))


def test_supercover_is_exact_vs_slab_intersection():
    """The column-interval supercover equals the brute-force 'segment
    intersects the closed cell box' rasterization (no sampling misses —
    the round-3 dense-sample version could skip corner slivers)."""
    import numpy as np

    def brute(x0, y0, x1, y1):
        out = set()
        for ix in range(int(np.floor(min(x0, x1))), int(np.floor(max(x0, x1))) + 1):
            for iy in range(int(np.floor(min(y0, y1))), int(np.floor(max(y0, y1))) + 1):
                dx, dy = x1 - x0, y1 - y0
                t0, t1 = 0.0, 1.0
                ok = True
                for p, d, lo, hi in ((x0, dx, ix, ix + 1), (y0, dy, iy, iy + 1)):
                    if d == 0:
                        if p < lo or p > hi:
                            ok = False
                            break
                    else:
                        ta, tb = (lo - p) / d, (hi - p) / d
                        if ta > tb:
                            ta, tb = tb, ta
                        t0, t1 = max(t0, ta), min(t1, tb)
                        if t0 > t1:
                            ok = False
                            break
                if ok:
                    out.add((ix, iy))
        return out

    rng = np.random.default_rng(11)
    for _ in range(400):
        x0, y0 = rng.uniform(-5, 5, 2)
        x1, y1 = x0 + rng.uniform(-8, 8), y0 + rng.uniform(-8, 8)
        assert {tuple(r) for r in G._segment_cells(x0, y0, x1, y1)} == brute(x0, y0, x1, y1)
    for seg in [(0.5, 0.5, 0.5, 7.3), (0.2, 0.3, 9.7, 0.3), (1.1, 1.1, 1.1, 1.1)]:
        assert {tuple(r) for r in G._segment_cells(*seg)} == brute(*seg)
