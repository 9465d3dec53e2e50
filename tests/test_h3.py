"""H3 cell math: published test vectors + internal consistency.

The two latlng→cell vectors are from the public H3 documentation
(h3geo.org quickstart / API docs) — they exercise the derived base-cell
tables, fold rotations, digit generation, and bit layout end-to-end."""
import numpy as np
import pytest

from vector2dggs_spark.dggs import get_backend
from vector2dggs_spark.dggs import h3core as H


def test_published_vectors():
    # h3geo.org quickstart: (37.7752702151959257, -122.418307270836565) res 9
    v = H.latlng_to_cell([37.7752702151959257], [-122.418307270836565], 9)
    assert H.to_token(v)[0] == "8928308280fffff"
    # h3 API docs example: res 5
    v5 = H.latlng_to_cell([37.3615593], [-122.0553238], 5)
    assert H.to_token(v5)[0] == "85283473fffffff"


def test_bit_layout():
    v = int(H.from_token(["8928308280fffff"])[0])
    assert (v >> 59) & 15 == 1  # mode
    assert (v >> 52) & 15 == 9  # res
    assert (v >> 45) & 127 == 20  # SF base cell
    assert H.get_resolution([v])[0] == 9


def test_parent_child_bit_ops():
    v = H.from_token(["8928308280fffff"])
    p = H.cell_to_parent(v, 5)
    assert H.get_resolution(p)[0] == 5
    assert H.to_token(p)[0] == "85283083fffffff"
    # center child of the parent back down
    cc = H.cell_to_center_child(p, 7)
    assert H.get_resolution(cc)[0] == 7
    assert H.to_token(H.cell_to_parent(cc, 5))[0] == H.to_token(p)[0]


def test_roundtrip_encode_center_reencode():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85, 85, 2000)
    lon = rng.uniform(-180, 180, 2000)
    for res in (0, 2, 5, 9, 12):
        cells = H.latlng_to_cell(lat, lon, res)
        clat, clon = H.cell_to_latlng(cells)
        again = H.latlng_to_cell(clat, clon, res)
        assert np.array_equal(cells, again), f"res {res}"


def test_hierarchy_consistency():
    """A cell's center must encode to its bit-parent at res-1 (aperture-7
    children never stick their CENTERS outside the parent), and the naive
    point-hierarchy holds for the vast majority of points (it is not
    exact in real H3 either — children overhang parent boundaries)."""
    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 1000)
    lon = rng.uniform(-180, 180, 1000)
    from vector2dggs_spark.dggs.h3core.tables import IS_PENTAGON

    for res in (1, 4, 8):
        fine = H.latlng_to_cell(lat, lon, res + 1)
        clat, clon = H.cell_to_latlng(fine)
        via_center = H.latlng_to_cell(clat, clon, res)
        # exact everywhere, pentagon base cells included (round 2:
        # derived sector tables replace the old leading-K limitation)
        bp = H.cell_to_parent(fine, res)
        assert np.array_equal(bp, via_center), f"res {res}"
        assert (~IS_PENTAGON[H.base_cell(fine)]).mean() > 0.85
        coarse = H.latlng_to_cell(lat, lon, res)
        agree = (bp == coarse).mean()
        assert agree > 0.85, (res, agree)


def test_children_partition():
    v = int(H.latlng_to_cell([-43.9], [-176.4], 6)[0])
    kids = H.cell_to_children(v, 7)
    assert len(kids) == 7
    # children centers encode back to themselves and parent to v
    kv = np.array(kids, dtype=np.uint64)
    lat, lon = H.cell_to_latlng(kv)
    assert np.array_equal(H.latlng_to_cell(lat, lon, 7), kv)
    assert np.all(H.cell_to_parent(kv, 6) == v)


def test_pentagon_flags():
    assert int(H.IS_PENTAGON.sum()) == 12 if hasattr(H, "IS_PENTAGON") else True
    from vector2dggs_spark.dggs.h3core.tables import IS_PENTAGON

    assert sorted(np.nonzero(IS_PENTAGON)[0].tolist()) == [
        4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117,
    ]


def test_compact_roundtrip():
    v = int(H.latlng_to_cell([-44.0], [-176.3], 4)[0])
    kids = H.cell_to_children(v, 6)
    assert H.compact_cells(kids) == {v}
    one = H.cell_to_children(v, 5)
    assert H.compact_cells(one[:-1]) == set(one[:-1])


def test_neighbors_and_disk():
    c = H.latlng_to_cell([-44.0], [-176.4], 7)
    nb = H.neighbors(c)
    assert len(set(nb[0].tolist())) == 6
    # neighbors are mutual
    for n in nb[0]:
        back = H.neighbors(np.array([n], dtype=np.uint64))
        assert int(c[0]) in set(back[0].tolist())
    disk1 = H.grid_disk(c, 1)[0]
    assert len(disk1) == 7
    disk2 = H.grid_disk(c, 2)[0]
    assert len(disk2) == 19  # 1 + 6 + 12


def test_neighbors_across_face_edge():
    """Cells straddling an icosahedron edge still get 6 mutual neighbors."""
    # face boundary between faces: pick a point near an icosa edge midpoint
    from vector2dggs_spark.dggs.h3core.tables import FACE_CENTER_GEO

    latm = np.degrees((FACE_CENTER_GEO[0, 0] + FACE_CENTER_GEO[4, 0]) / 2)
    lonm = np.degrees((FACE_CENTER_GEO[0, 1] + FACE_CENTER_GEO[4, 1]) / 2)
    c = H.latlng_to_cell([latm], [lonm], 6)
    disk = H.grid_disk(c, 2)[0]
    assert len(disk) == 19


def test_backend_registered_and_polyfill():
    b = get_backend("h3")
    ring = np.array(
        [[-176.5, -44.2], [-176.3, -44.2], [-176.3, -44.0], [-176.5, -44.0], [-176.5, -44.2]]
    )
    cells = b.polyfill([ring], 7)
    assert len(cells) > 10
    lat, lon = b.cell_center(cells, 7)
    assert np.all((lon > -176.5) & (lon < -176.3) & (lat > -44.2) & (lat < -44.0))
    # parent tokens
    p = b.parent(cells, 3)
    assert all(len(t) == 15 for t in p)


def test_backend_linetrace_connected():
    b = get_backend("h3")
    coords = np.array([[-176.5, -44.2], [-176.35, -44.05], [-176.3, -44.15]])
    cells = b.linetrace(coords, 7)
    assert len(cells) == len(set(cells))
    ends = b.point_to_cell(coords[:, 1], coords[:, 0], 7)
    assert set(ends) <= set(cells)
    # chain connectivity via neighbors
    vs = H.from_token(np.asarray(cells, dtype=str))
    nbs = H.neighbors(vs)
    cellset = set(vs.tolist())
    for idx in range(len(vs)):
        if len(vs) > 1:
            assert cellset & set(nbs[idx].tolist()) - {int(vs[idx])}


def test_parent_expr_native(spark):
    b = get_backend("h3")
    import pandas as pd

    toks = b.point_to_cell(
        np.linspace(-44.3, -43.8, 50), np.linspace(-176.55, -176.25, 50), 9
    )
    df = spark.createDataFrame(pd.DataFrame({"h3_09": toks}))
    from pyspark.sql import functions as F

    out = df.withColumn("h3_03", b.parent_expr(F.col("h3_09"), 9, 3)).toPandas()
    expected = b.parent(toks, 3)
    assert list(out["h3_03"]) == list(expected)


def test_grid_path_cells():
    """gridPathCells: connected chain of neighbors including endpoints."""
    a = int(H.latlng_to_cell([-44.2], [-176.5], 8)[0])
    b = int(H.latlng_to_cell([-44.0], [-176.25], 8)[0])
    path = H.grid_path_cells(a, b)
    assert path[0] == a or a in path
    assert b in path
    # chain connectivity: each consecutive pair are grid neighbors
    for u, v in zip(path[:-1], path[1:]):
        nb = set(H.neighbors(np.array([u], dtype=np.uint64))[0].tolist())
        assert int(v) in nb, (format(int(u), "x"), format(int(v), "x"))
    # degenerate path: same cell
    assert list(H.grid_path_cells(a, a)) == [a]


# ---------------------------------------------------------------- pentagons
def _pentagon_res0(bc: int) -> int:
    return int(H.MODE_CELL | (np.uint64(bc) << np.uint64(45)) | np.uint64((1 << 45) - 1))


def test_pentagon_children_roundtrip_all12():
    """Every canonical descendant of every pentagon base cell decodes to
    a unique center that re-encodes to itself (encode = decode⁻¹)."""
    from vector2dggs_spark.dggs.h3core.tables import PENTAGON_CELLS

    for bc in sorted(PENTAGON_CELLS):
        for res in (1, 2, 3):
            kids = np.array(H.cell_to_children(_pentagon_res0(bc), res), dtype=np.uint64)
            assert len(kids) == 1 + 5 * (7**res - 1) // 6  # pentagon count
            lat, lon = H.cell_to_latlng(kids)
            assert len({(round(a, 7), round(b, 7)) for a, b in zip(lat, lon)}) == len(kids)
            assert np.array_equal(H.latlng_to_cell(lat, lon, res), kids), (bc, res)


def test_pentagon_coverage_and_canonical_form():
    """Dense random points around each icosahedron vertex: every point in
    a pentagon base cell encodes to a canonical child (never a leading-K
    digit, always within cell_to_children's enumeration)."""
    from vector2dggs_spark.dggs.h3core.tables import BASE_CENTER_GEO, PENTAGON_CELLS

    rng = np.random.default_rng(11)
    for bc in sorted(PENTAGON_CELLS):
        kids = set(H.cell_to_children(_pentagon_res0(bc), 4))
        clat, clon = BASE_CENTER_GEO[bc]  # radians
        ang = rng.uniform(0, 2 * np.pi, 1500)
        rad = np.radians(rng.uniform(0.01, 7.5, 1500))
        sla = np.arcsin(np.clip(np.sin(clat) * np.cos(rad) + np.cos(clat) * np.sin(rad) * np.cos(ang), -1, 1))
        slo = clon + np.arctan2(np.sin(ang) * np.sin(rad) * np.cos(clat), np.cos(rad) - np.sin(clat) * np.sin(sla))
        cells = H.latlng_to_cell(np.degrees(sla), np.degrees(slo), 4)
        mine = H.base_cell(cells) == bc
        assert mine.sum() > 200  # sampling sanity
        lead = H._leading_nonzero_digit(cells[mine], 4)
        assert (lead != 1).all(), f"bc {bc}: leading-K (non-canonical) cell emitted"
        assert all(int(c) in kids for c in cells[mine]), f"bc {bc}: cell outside children cover"


def test_pentagon_sector_tables_structure():
    """Derived sector tables: 5 faces per pentagon, home face identity
    rotation, exactly one K-gap face pair (ccw/cw), matching the
    published H3 deleted-subsequence structure."""
    from vector2dggs_spark.dggs.h3core import _pent_tables
    from vector2dggs_spark.dggs.h3core.tables import HOME_FACE, PENTAGON_CELLS

    PT = _pent_tables()
    for bc in sorted(PENTAGON_CELLS):
        faces = np.nonzero(PT["corner_axis"][bc] >= 0)[0]
        assert len(faces) == 5
        assert PT["rot"][bc, HOME_FACE[bc]] == 0
        kf = PT["kfix"][bc][faces]
        assert sorted(kf.tolist()) == [-1, 0, 0, 0, 1]


def test_pentagon_compact():
    """Pentagon children compact back to the pentagon (6 siblings merge
    at the pentagon level, 7 elsewhere)."""
    from vector2dggs_spark.dggs.h3core.tables import PENTAGON_CELLS

    for bc in sorted(PENTAGON_CELLS)[:3]:
        v = _pentagon_res0(bc)
        kids = H.cell_to_children(v, 2)
        assert H.compact_cells(kids) == {v}


def test_sql_formulation_matches_numpy_kernel(spark):
    """The layered Spark-SQL H3 encode (functions/h3sql.py — the native
    pipeline point path AND the q33 DuckDB oracle formulation) must
    agree with the numpy kernel token-for-token on a global grid
    (~10% of points land in pentagon base cells, so the K-sector fix
    path is exercised), at odd and even resolutions."""
    import numpy as np

    from vector2dggs_spark.dggs import h3core as H
    from vector2dggs_spark.functions.h3sql import h3_cells_df

    lats = np.arange(-86.9, 87.0, 4.3)
    lons = np.arange(-178.7, 180.0, 6.7)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    glat, glon = glat.ravel(), glon.ravel()
    df = spark.createDataFrame(
        [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(zip(glat, glon))],
        "id long, la double, lo double",
    )
    for res in (2, 9, 13):
        expected = H.to_token(H.latlng_to_cell(glat, glon, res))
        got = {r["id"]: r["cell"] for r in h3_cells_df(df, "la", "lo", res, ["id"]).collect()}
        mismatch = [(i, expected[i], got[i]) for i in range(len(expected)) if got[i] != expected[i]]
        assert not mismatch, f"res {res}: {mismatch[:5]}"


def test_sql_encode_is_wholestage_codegen(spark):
    from vector2dggs_spark.functions.h3sql import h3_cells_df

    df = spark.range(10).selectExpr(
        "id", "cast(id as double) / 10.0 AS la", "cast(id as double) AS lo"
    )
    plan = h3_cells_df(df, "la", "lo", 9, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "*(1) Project" in plan
