"""rHEALPix-style backend: projection identities + cell semantics."""
import numpy as np

from vector2dggs_spark.dggs import rhp


def test_projection_roundtrip_global():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.5, 89.5, 2000)
    lon = rng.uniform(-180.0, 179.99, 2000)
    x, y = rhp.project(lon, lat)
    lon2, lat2 = rhp.unproject(x, y)
    assert np.allclose(lat2, lat, atol=1e-8)
    # lon undefined at poles; compare modulo wrap
    dlon = np.abs(np.mod(lon2 - lon + 180.0, 360.0) - 180.0)
    assert np.all(dlon < 1e-8)


def test_projection_equal_area_property():
    # HEALPix is equal-area: planar area of a lat band == sphere fraction.
    # Sample: band |authalic lat| < phi0 occupies 2/3 of sphere area and
    # maps to 4 squares' middle band of height 2*(3pi/8)*(2/3) = pi/2...
    # check y(phi0) == pi/4 exactly (sphere mode).
    x, y = rhp.project(np.array([0.0]), np.degrees(np.array([np.arcsin(2 / 3)])), authalic=False)
    assert np.isclose(y[0], np.pi / 4)


def test_face_assignment():
    # equatorial faces O..R from west to east
    cells = rhp.point_to_cell(np.zeros(4), np.array([-135.0, -45.0, 45.0, 135.0]), 0)
    assert cells.tolist() == ["O", "P", "Q", "R"]
    assert rhp.point_to_cell([89.9], [10.0], 0)[0] == "N"
    assert rhp.point_to_cell([-89.9], [10.0], 0)[0] == "S"


def test_cell_roundtrip_center():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-179.9, 179.9, 500)
    for res in (1, 3, 6):
        cells = rhp.point_to_cell(lat, lon, res)
        assert all(len(c) == res + 1 for c in cells)
        clat, clon = rhp.cell_center(cells)
        # center must encode back to the same cell
        again = rhp.point_to_cell(clat, clon, res)
        assert np.array_equal(again, cells)


def test_digit_order_row_major_top_left():
    # Face P spans lon [-90, 0], lat band; at res 1 digit 0 is the
    # top-left (NW) subcell, digit 8 bottom-right (SE).
    nw = rhp.point_to_cell([35.0], [-85.0], 1)[0]
    se = rhp.point_to_cell([-35.0], [-5.0], 1)[0]
    assert nw == "P0"
    assert se == "P8"


def test_parent_prefix_and_children():
    c = rhp.point_to_cell([10.0], [20.0], 6)
    p = rhp.parent(c, 2)[0]
    assert c[0].startswith(p)
    kids = rhp.children("Q4", 3)
    assert len(kids) == 81
    assert rhp.compact(set(kids)) == {"Q4"}
    one = rhp.children("Q4", 2)
    assert rhp.compact(set(one[:-1])) == set(one[:-1])


def test_polyfill_center_inside():
    ring = np.array([[-176.6, -44.4], [-176.2, -44.4], [-176.2, -43.9], [-176.6, -43.9], [-176.6, -44.4]])
    cells = rhp.polyfill([ring], 5)
    assert len(cells) > 0
    clat, clon = rhp.cell_center(cells)
    assert np.all((clon > -176.6) & (clon < -176.2) & (clat > -44.4) & (clat < -43.9))
    # every returned cell unique
    assert len(set(cells)) == len(cells)
    # consistency: centers of returned cells re-encode to themselves and
    # any cell whose center is inside is in the set (spot check by
    # sampling points and checking their cells' centers)
    rng = np.random.default_rng(3)
    slat = rng.uniform(-44.39, -43.91, 300)
    slon = rng.uniform(-176.59, -176.21, 300)
    scells = rhp.point_to_cell(slat, slon, 5)
    sclat, sclon = rhp.cell_center(scells)
    inside = (sclon > -176.6) & (sclon < -176.2) & (sclat > -44.4) & (sclat < -43.9)
    assert set(scells[inside]) <= set(cells)


def test_polyfill_polar_cap():
    ring = np.array([[-30.0, 87.0], [30.0, 87.0], [30.0, 89.5], [-30.0, 89.5], [-30.0, 87.0]])
    cells = rhp.polyfill([ring], 4)
    assert len(cells) > 0
    assert all(c.startswith("N") for c in cells)


def test_linetrace_dedup_and_endpoints():
    coords = np.array([[-176.5, -44.2], [-176.3, -44.0], [-176.25, -44.3]])
    cells = rhp.linetrace(coords, 5)
    assert len(cells) == len(set(cells))
    ends = rhp.point_to_cell(coords[:, 1], coords[:, 0], 5)
    assert set(ends) <= set(cells)


def test_grid_disk_contains_self_and_neighbors():
    c = rhp.point_to_cell([-44.0], [-176.4], 5)
    disk = rhp.grid_disk(c, 5, 1)
    assert c[0] in disk[0]
    # round 2: the disk samples at width/2 (oversampling so shrunken
    # cells can't fall between samples), so ring 2 spans one full cell
    # width in every direction — all 8 neighbors must appear there
    disk2 = rhp.grid_disk(c, 5, 2)
    assert len(set(disk2[0])) >= 9


def test_native_sql_encode_matches_numpy_kernel(spark):
    """The layered Spark-SQL rHP point encode (functions/sqlgen.py —
    native pipeline path AND the q30 DuckDB oracle formulation) must
    agree with the production numpy kernel cell-for-cell on a global
    grid spanning all six faces, both caps, and every cap quadrant."""
    from vector2dggs_spark.functions.sqlgen import rhp_cells_df

    lats = np.arange(-87.3, 88.0, 3.7)
    lons = np.arange(-179.1, 180.0, 5.3)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    glat, glon = glat.ravel(), glon.ravel()
    for res in (1, 4, 7):
        expected = rhp.point_to_cell(glat, glon, res)
        df = spark.createDataFrame(
            [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(zip(glat, glon))],
            "id long, lat double, lon double",
        )
        got = {
            r["id"]: r["cell"]
            for r in rhp_cells_df(df, "lat", "lon", res, ["id"]).collect()
        }
        mismatch = [(i, expected[i], got[i]) for i in range(len(expected)) if got[i] != expected[i]]
        assert not mismatch, f"res {res}: {mismatch[:5]}"


def test_native_sql_encode_is_wholestage_codegen(spark):
    """The native rHP point path must stay inside WholeStageCodegen —
    no Python, no BatchEvalPython/ArrowEvalPython in the plan."""
    from vector2dggs_spark.functions.sqlgen import rhp_cells_df

    df = spark.range(10).selectExpr(
        "id", "cast(id as double) / 10.0 AS lat", "cast(id as double) AS lon"
    )
    plan = rhp_cells_df(df, "lat", "lon", 6, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    # '*(n)' prefixes mark operators fused into WholeStageCodegen
    assert "*(1) Project" in plan
