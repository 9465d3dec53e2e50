"""A5 pentagonal backend (SURVEY.md C17/C18): structural invariants of
the dodecahedron/quintant/aperture-4 construction, the reference's A5
test scenario shape (tests/classes/a5.py runs the full pipeline at a
fine res with parent offset), and the native parent expression."""
import numpy as np

from vector2dggs_spark.dggs import a5 as A
from vector2dggs_spark.dggs import get_backend


def test_faces_partition_sphere():
    rng = np.random.default_rng(1)
    lat = rng.uniform(-90, 90, 2000)
    lon = rng.uniform(-180, 180, 2000)
    c = A.lonlat_to_cell(lat, lon, 0)
    assert np.all(A.get_resolution(c) == 0)
    assert len(np.unique(c)) == 12  # every dodecahedron face reached
    # res 1: 60 quintants
    q = A.lonlat_to_cell(lat, lon, 1)
    assert len(np.unique(q)) == 60


def test_token_roundtrip_and_levels():
    rng = np.random.default_rng(2)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    for res in (0, 1, 5, 13, 17, 29):
        cells = A.lonlat_to_cell(lat, lon, res)
        assert np.all(A.get_resolution(cells) == res)
        toks = A.to_token(cells)
        assert all(len(t) == 16 for t in toks)
        assert np.array_equal(A.from_token(toks), cells)
        lon_c, lat_c = A.cell_to_lonlat(cells)
        assert np.array_equal(A.lonlat_to_cell(lat_c, lon_c, res), cells)


def test_parent_hierarchy_exact():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-85, 85, 500)
    lon = rng.uniform(-180, 180, 500)
    fine = A.lonlat_to_cell(lat, lon, 14)
    # aperture-4 nesting is exact (triangle quadtree nests perfectly)
    for res in (13, 8, 2, 1, 0):
        assert np.array_equal(A.cell_to_parent(fine, res), A.lonlat_to_cell(lat, lon, res))


def test_children_partition_and_compact():
    c = int(A.lonlat_to_cell([-44.0], [-176.4], 8)[0])
    kids = A.cell_to_children(c, 10)
    assert len(kids) == 16
    kv = np.array(kids, dtype=np.uint64)
    assert np.all(A.get_resolution(kv) == 10)
    assert np.all(A.cell_to_parent(kv, 8) == c)
    lon, lat = A.cell_to_lonlat(kv)
    assert np.array_equal(A.lonlat_to_cell(lat, lon, 10), kv)
    assert len({(round(a, 9), round(b, 9)) for a, b in zip(lon, lat)}) == 16
    assert A.compact(set(kids)) == {c}
    # quintant level: 5 siblings merge
    r0 = int(A.cell_to_parent([c], 0)[0])
    assert len(A.cell_to_children(r0, 1)) == 5
    assert A.compact(A.cell_to_children(r0, 2)) == {r0}
    # incomplete sibling sets stay put
    one = A.cell_to_children(c, 9)
    assert A.compact(one[:-1]) == set(one[:-1])


def test_area_aperture4():
    """Cell counts quadruple per level (reference constants.py
    A5_CELL_AREA_M2_BY_LEVEL divides by 4) below res 1."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(-20, 20, 20000)
    lon = rng.uniform(-20, 20, 20000)
    n3 = len(np.unique(A.lonlat_to_cell(lat, lon, 3)))
    n4 = len(np.unique(A.lonlat_to_cell(lat, lon, 4)))
    assert 3.0 < n4 / n3 < 5.0


def test_backend_polyfill_and_parent_expr(spark):
    b = get_backend("a5")
    ring = np.array(
        [[-176.5, -44.2], [-176.3, -44.2], [-176.3, -44.0], [-176.5, -44.0], [-176.5, -44.2]]
    )
    cells = b.polyfill([ring], 12)
    assert len(cells) > 10
    lat, lon = b.cell_center(cells, 12)
    assert np.all((lon > -176.5) & (lon < -176.3) & (lat > -44.2) & (lat < -44.0))
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"a5_12": list(cells)}))
    got = df.withColumn("a5_06", b.parent_expr(F.col("a5_12"), 12, 6)).toPandas()
    assert list(got["a5_06"]) == list(b.parent(np.asarray(cells), 6))


def test_backend_pipeline_e2e(spark):
    """Reference tests/classes/a5.py shape: full pipeline run with
    res 17 / default parent offset, overwrite-style rerun equivalence."""
    from vector2dggs_spark import index
    from vector2dggs_spark.sources.documents import documents_df

    docs = documents_df(spark, 150, seed=13)
    r = index(spark, docs, dggs="a5", resolution=17, parent_res=11)
    rows = r.cells.limit(500).collect()
    assert rows
    b = get_backend("a5")
    for row in rows[:50]:
        assert b.get_resolution(row["a5_17"]) == 17
        assert row["a5_11"] == str(b.parent([row["a5_17"]], 11)[0])


def test_backend_compaction_kit(spark):
    b = get_backend("a5")
    cell = str(A.to_token(A.lonlat_to_cell([-44.0], [-176.4], 9))[0])
    kids = b.children_at_res(cell, 11)
    assert len(kids) == 16
    assert b.compact(kids) == {cell}
    assert b.designated_child(cell, 11) == b.children_at_res(cell, 11)[0]
    assert b.get_resolution(cell) == 9


def test_sql_formulation_matches_numpy_kernel(spark):
    """The layered Spark-SQL A5 encode (functions/a5sql.py — the q34
    DuckDB oracle formulation) must agree with the numpy kernel
    token-for-token on a global grid covering all 12 faces."""
    import numpy as np

    from vector2dggs_spark.dggs import a5 as A
    from vector2dggs_spark.functions.a5sql import a5_select_sql

    lats = np.arange(-86.9, 87.0, 4.3)
    lons = np.arange(-178.7, 180.0, 6.7)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    glat, glon = glat.ravel(), glon.ravel()
    df = spark.createDataFrame(
        [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(zip(glat, glon))],
        "id long, la double, lo double",
    )
    df.createOrReplaceTempView("__a5pts")
    for res in (2, 14):
        expected = A.to_token(A.lonlat_to_cell(glat, glon, res))
        sql = a5_select_sql("SELECT id, la, lo FROM __a5pts", "la", "lo", res, ["id"])
        got = {r["id"]: r["cell"] for r in spark.sql(sql).collect()}
        mismatch = [i for i in range(len(expected)) if got[i] != expected[i]]
        assert not mismatch, f"res {res}: {mismatch[:5]}"
