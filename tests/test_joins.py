"""Join operators (J1-J4): correctness vs brute-force oracles."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector2dggs_spark import get_backend, index
from vector2dggs_spark.operators.compaction import compact_cells_df
from vector2dggs_spark.operators.joins import (
    assign_tiles,
    broadcast_compact_join,
    cell_join,
    knn,
)
from vector2dggs_spark.sources.documents import documents_df, extract_media, tile_centers

RES = 6


@pytest.fixture(scope="module")
def docs(spark):
    df = documents_df(spark, 250, seed=7).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def result(spark, docs):
    r = index(spark, docs, dggs="geohash", resolution=RES, parent_res=3)
    r.cells.cache().count()
    return r


def _split_types(spark, docs, result):
    geom_kind = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "geometry")
        .select("doc_id", F.col("s.text").alias("wkt"))
        .where(F.col("wkt").isNotNull())
        .withColumn("is_point", F.col("wkt").startswith("POINT"))
        .withColumn("is_poly", F.col("wkt").startswith("POLY"))
    )
    return geom_kind


def test_cell_join_point_in_polygon(spark, docs, result):
    """J1: points joined to polygons on shared cell == PIP at cell modality."""
    kinds = _split_types(spark, docs, result)
    pts = result.cells.join(kinds.where("is_point"), "doc_id").select(
        F.col("doc_id").alias("pt_doc"), F.col(result.cell_col)
    )
    polys = result.cells.join(kinds.where("is_poly"), "doc_id").select(
        F.col("doc_id").alias("poly_doc"), F.col(result.cell_col)
    )
    joined = cell_join(pts, polys, result.cell_col).select("pt_doc", "poly_doc").distinct()
    got = {(r["pt_doc"], r["poly_doc"]) for r in joined.collect()}
    # oracle: same equi-join in pandas
    pts_pd = pts.toPandas()
    polys_pd = polys.toPandas()
    exp = set(
        pts_pd.merge(polys_pd, on=result.cell_col)[["pt_doc", "poly_doc"]]
        .drop_duplicates()
        .itertuples(index=False, name=None)
    )
    assert got == exp and got


def test_cell_join_salted_matches_plain(spark, result):
    a = result.cells.select(F.col("doc_id").alias("a_doc"), result.cell_col)
    b = result.cells.select(F.col("doc_id").alias("b_doc"), result.cell_col)
    plain = cell_join(a, b, result.cell_col, salt=0).groupBy().count().collect()[0][0]
    salted = cell_join(a, b, result.cell_col, salt=4).groupBy().count().collect()[0][0]
    auto = cell_join(a, b, result.cell_col).groupBy().count().collect()[0][0]
    assert plain == salted == auto


def test_cell_join_auto_salts_hot_key(spark):
    """salt=None auto-detects a 90%-hot key via the bounded-prefix probe
    and returns exactly the forced-plain rows; salt=0 keeps the
    single-join plan (no probe, no union)."""
    left = spark.range(20_000).selectExpr(
        "case when id % 10 < 9 then 'HOT' else concat('c', id % 500) end AS cell",
        "id AS l_id",
    )
    right = spark.range(5_000).selectExpr(
        "case when id < 50 then 'HOT' else concat('c', id % 500) end AS cell",
        "id AS r_id",
    )
    agg = lambda df: df.groupBy().agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum(F.xxhash64("cell", "l_id", "r_id").cast("decimal(30,0)")).alias("h"),
    ).collect()[0]
    plain = agg(cell_join(left, right, "cell", salt=0))
    auto = agg(cell_join(left, right, "cell"))
    assert (plain["n"], plain["h"]) == (auto["n"], auto["h"])
    # the auto plan must actually have salted: its plan contains the
    # hot/cold union (a plain join has no Union node)
    auto_df = cell_join(left, right, "cell")
    assert "Union" in auto_df._jdf.queryExecution().executedPlan().toString()
    plain_df = cell_join(left, right, "cell", salt=0)
    assert "Union" not in plain_df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_compact_join_membership(spark, docs, result):
    """J2: point matches compacted polygon iff it matched the uncompacted
    cell set (compaction preserves coverage at >= parent_res)."""
    backend = get_backend("geohash")
    kinds = _split_types(spark, docs, result)
    pts = result.cells.join(kinds.where("is_point"), "doc_id").select(
        "doc_id", result.cell_col
    )
    polys_raw = result.cells.join(kinds.where("is_poly"), "doc_id").select(
        F.col("doc_id").alias("poly_id"), F.col(result.cell_col)
    )
    compacted = compact_cells_df(
        polys_raw, backend, RES, result.parent_res, result.cell_col, id_col="poly_id"
    )
    got = broadcast_compact_join(
        pts, compacted, backend, RES, result.parent_res, result.cell_col
    )
    got_pairs = {(r["doc_id"], r["poly_id"]) for r in got.collect()}
    # oracle: raw equi-join (uncompacted)
    exp = {
        (r["doc_id"], r["poly_id"])
        for r in pts.join(polys_raw, result.cell_col).select("doc_id", "poly_id").collect()
    }
    assert got_pairs == exp and got_pairs


def test_knn_exact_vs_bruteforce(spark):
    rng = np.random.default_rng(42)
    n_t, n_q, k = 400, 30, 5
    t = pd.DataFrame(
        {
            "target_id": [f"t{i:04d}" for i in range(n_t)],
            "lat": rng.uniform(-44.4, -43.7, n_t),
            "lon": rng.uniform(-176.6, -176.2, n_t),
        }
    )
    q = pd.DataFrame(
        {
            "query_id": [f"q{i:03d}" for i in range(n_q)],
            "lat": rng.uniform(-44.4, -43.7, n_q),
            "lon": rng.uniform(-176.6, -176.2, n_q),
        }
    )
    backend = get_backend("geohash")
    got = knn(
        spark.createDataFrame(q), spark.createDataFrame(t), backend, res=6, k=k
    ).toPandas()
    # brute force oracle
    d2 = (q["lat"].to_numpy()[:, None] - t["lat"].to_numpy()[None, :]) ** 2 + (
        q["lon"].to_numpy()[:, None] - t["lon"].to_numpy()[None, :]
    ) ** 2
    for qi, qid in enumerate(q["query_id"]):
        order = np.lexsort((t["target_id"].to_numpy(), d2[qi]))[:k]
        exp_ids = [t["target_id"][j] for j in order]
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub["target_id"].tolist() == exp_ids, qid
    assert len(got) == n_q * k


def test_assign_tiles_equijoin_golden(spark, docs, result):
    """J4: tile assignment == equi-join on parent cell (FIXTURES.md §5)."""
    backend = get_backend("geohash")
    out = assign_tiles(result.cells, docs, backend, result.parent_res, result.parent_col)
    got = {(r["doc_id"], r["media_ref"]) for r in out.select("doc_id", "media_ref").collect()}
    # golden: compute tile parent cells in pandas, equi-join
    tiles = tile_centers(extract_media(docs)).drop("doc_id").toPandas()
    tiles["pc"] = backend.point_to_cell(
        tiles["tile_lat"].to_numpy(), tiles["tile_lon"].to_numpy(), result.parent_res
    )
    cells_pd = result.cells.select("doc_id", result.parent_col).toPandas()
    exp = set(
        cells_pd.merge(tiles, left_on=result.parent_col, right_on="pc")[
            ["doc_id", "media_ref"]
        ].itertuples(index=False, name=None)
    )
    assert got == exp and got


def test_bucketed_cell_join_is_shuffle_free(spark, result):
    """J1 co-location: joining two bucketed cell tables plans ZERO
    exchanges (the write-once shuffle is amortized across every
    downstream join) and returns exactly the plain-join rows."""
    import re

    from vector2dggs_spark.operators.joins import (
        bucketed_cell_join,
        write_bucketed_cells,
    )

    cells = result.cells
    left = cells.select("geohash_06", "doc_id")
    right = cells.select("geohash_06", F.col("doc_id").alias("r_doc"))
    write_bucketed_cells(left, "t_bleft", "geohash_06", buckets=8)
    write_bucketed_cells(right, "t_bright", "geohash_06", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_cell_join(spark, "t_bleft", "t_bright", "geohash_06")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert not re.search(r"Exchange (hash|range)partitioning", plan), plan
        got = j.count()
        exp = left.join(right, "geohash_06").count()
        assert got == exp > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bleft")
        spark.sql("DROP TABLE IF EXISTS t_bright")


@pytest.mark.parametrize("dggs", ["geohash", "rhp", "h3", "s2", "a5"])
def test_knn_haversine_matches_brute_force_high_lat(spark, dggs):
    """metric='haversine' must return the true great-circle top-k.  At
    lat ~62° a degree of longitude is less than half a degree of
    latitude, so the planar ranking genuinely differs — this exercises
    the per-query meter-space termination bound, not just the formula.
    Parameterized over ALL FIVE backends (round 5): the brute-force
    oracle is grid-free, so exactness pins each backend's grid_disk /
    grid_annulus / ring_guarantee_deg triple under the ring loop."""
    rng = np.random.default_rng(8)
    n_t, n_q, k = 300, 20, 4
    t = pd.DataFrame({
        "target_id": [f"t{i:04d}" for i in range(n_t)],
        "lat": rng.uniform(61.0, 63.0, n_t),
        "lon": rng.uniform(5.0, 9.0, n_t),
    })
    q = pd.DataFrame({
        "query_id": [f"q{i:03d}" for i in range(n_q)],
        "lat": rng.uniform(61.2, 62.8, n_q),
        "lon": rng.uniform(5.5, 8.5, n_q),
    })
    b = get_backend(dggs)
    res = next(r for r in range(b.min_res, b.max_res + 1)
               if b.cell_width_deg(r) <= 0.4)
    got = knn(
        spark.createDataFrame(q), spark.createDataFrame(t),
        b, res=res, k=k, metric="haversine",
    ).toPandas()

    def hav(lat1, lon1, lat2, lon2):
        p = np.pi / 180.0
        a = (np.sin((lat2 - lat1) * p / 2) ** 2
             + np.cos(lat1 * p) * np.cos(lat2 * p) * np.sin((lon2 - lon1) * p / 2) ** 2)
        return 2 * np.arcsin(np.sqrt(a)) * 6371008.8

    d = hav(q["lat"].to_numpy()[:, None], q["lon"].to_numpy()[:, None],
            t["lat"].to_numpy()[None, :], t["lon"].to_numpy()[None, :])
    diverged = 0
    for qi, qid in enumerate(q["query_id"]):
        order = np.lexsort((t["target_id"].to_numpy(), d[qi]))[:k]
        exp_ids = [t["target_id"][j] for j in order]
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub["target_id"].tolist() == exp_ids, qid
        # sanity that this scenario distinguishes the metrics
        d2 = ((q["lat"][qi] - t["lat"]) ** 2 + (q["lon"][qi] - t["lon"]) ** 2).to_numpy()
        planar = [t["target_id"][j] for j in np.lexsort((t["target_id"].to_numpy(), d2))[:k]]
        if planar != exp_ids:
            diverged += 1
    assert diverged > 0, "fixture failed to distinguish haversine from planar"
    assert len(got) == n_q * k


@pytest.mark.parametrize("dggs", ["geohash", "rhp", "h3", "s2", "a5"])
def test_range_join_haversine_matches_brute_force_high_lat(spark, dggs):
    """range_join metric='haversine' returns EXACTLY the pairs within
    the meter radius — at lat ~62° the lon shrinkage makes the
    degree→meter guarantee conversion (worst-latitude bound) do real
    work.  Parameterized over ALL FIVE backends: the brute-force
    oracle is grid-free, so exactness here pins each backend's
    grid_disk + ring_guarantee_deg pair (a disk that under-covers or a
    bound that overstates its guarantee would drop true pairs).  Also
    pins that the planar pair set genuinely differs."""
    from vector2dggs_spark.operators.joins import range_join

    rng = np.random.default_rng(11)
    n_t, n_q = 400, 25
    t = pd.DataFrame({
        "target_id": [f"t{i:04d}" for i in range(n_t)],
        "lat": rng.uniform(61.0, 63.0, n_t),
        "lon": rng.uniform(5.0, 9.0, n_t),
    })
    q = pd.DataFrame({
        "query_id": [f"q{i:03d}" for i in range(n_q)],
        "lat": rng.uniform(61.2, 62.8, n_q),
        "lon": rng.uniform(5.5, 8.5, n_q),
    })
    radius_m = 20_000.0
    b = get_backend(dggs)
    res = next(r for r in range(b.min_res, b.max_res + 1)
               if b.cell_width_deg(r) <= 0.4)
    got = range_join(
        spark.createDataFrame(q), spark.createDataFrame(t),
        b, res=res, radius=radius_m, metric="haversine",
    ).toPandas()

    def hav(lat1, lon1, lat2, lon2):
        p = np.pi / 180.0
        a = (np.sin((lat2 - lat1) * p / 2) ** 2
             + np.cos(lat1 * p) * np.cos(lat2 * p) * np.sin((lon2 - lon1) * p / 2) ** 2)
        return 2 * np.arcsin(np.sqrt(a)) * 6371008.8

    d = hav(q["lat"].to_numpy()[:, None], q["lon"].to_numpy()[:, None],
            t["lat"].to_numpy()[None, :], t["lon"].to_numpy()[None, :])
    exp = {(q["query_id"][i], t["target_id"][j])
           for i, j in zip(*np.nonzero(d <= radius_m))}
    assert {(r.query_id, r.target_id) for r in got.itertuples()} == exp
    assert len(exp) > 0
    # the same radius as a planar degree disk would give a different set
    d2 = np.sqrt((q["lat"].to_numpy()[:, None] - t["lat"].to_numpy()[None, :]) ** 2
                 + (q["lon"].to_numpy()[:, None] - t["lon"].to_numpy()[None, :]) ** 2)
    planar = {(q["query_id"][i], t["target_id"][j])
              for i, j in zip(*np.nonzero(d2 <= radius_m / 111_195.0))}
    assert planar != exp


def test_range_join_uncoverable_radius_raises(spark):
    """A radius the guarantee cannot cover within max_ring must fail
    loudly at plan time, not silently drop far pairs."""
    from vector2dggs_spark.operators.joins import range_join

    pts = pd.DataFrame({"pid": ["a"], "lat": [0.0], "lon": [0.0]})
    df = spark.createDataFrame(pts)
    with pytest.raises(ValueError, match="not coverable"):
        range_join(df.withColumnRenamed("pid", "query_id"),
                   df.withColumnRenamed("pid", "target_id"),
                   get_backend("geohash"), res=6, radius=30.0,
                   metric="planar", max_ring=4)


def test_knn_releases_per_round_caches(spark):
    """ADVICE r02: after knn returns, executor storage must hold exactly
    one extra cached dataset (the returned result) — not one per ring
    round; repeated knn calls in one session must not accumulate."""
    rng = np.random.default_rng(3)
    q = pd.DataFrame({
        "query_id": [f"q{i}" for i in range(10)],
        "lat": rng.uniform(-44.4, -43.7, 10),
        "lon": rng.uniform(-176.6, -176.2, 10),
    })
    t = pd.DataFrame({
        "target_id": [f"t{i}" for i in range(200)],
        "lat": rng.uniform(-44.4, -43.7, 200),
        "lon": rng.uniform(-176.6, -176.2, 200),
    })
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out = knn(spark.createDataFrame(q), spark.createDataFrame(t),
              get_backend("geohash"), res=6, k=3)
    assert out.count() == 30
    after = jsc.getPersistentRDDs().size()
    assert after <= before + 1, f"kNN leaked caches: {before} -> {after}"
    out.unpersist()


def test_knn_rhp_matches_brute_force(spark):
    """kNN exactness for an angular-step-disk backend (rhp): ring
    expansion with the round-2 conservative guarantee must equal brute
    force (ADVICE r01: the old bound could under-cover)."""
    import numpy as np
    import pandas as pd

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import knn

    rng = np.random.default_rng(17)
    q = pd.DataFrame({
        "query_id": [f"q{i}" for i in range(25)],
        "lat": rng.uniform(-44.35, -44.05, 25),
        "lon": rng.uniform(-176.55, -176.25, 25),
    })
    t = pd.DataFrame({
        "target_id": [f"t{i}" for i in range(400)],
        "lat": rng.uniform(-44.4, -44.0, 400),
        "lon": rng.uniform(-176.6, -176.2, 400),
    })
    got = knn(
        spark.createDataFrame(q), spark.createDataFrame(t),
        get_backend("rhp"), res=8, k=4,
    ).toPandas()
    # brute force in pandas
    d2 = (q["lat"].to_numpy()[:, None] - t["lat"].to_numpy()[None, :]) ** 2 + (
        q["lon"].to_numpy()[:, None] - t["lon"].to_numpy()[None, :]
    ) ** 2
    for qi, qid in enumerate(q["query_id"]):
        order = np.lexsort((t["target_id"].to_numpy(), d2[qi]))[:4]
        want = set(t["target_id"].to_numpy()[order])
        have = set(got[got.query_id == qid].target_id)
        assert have == want, (qid, have, want)


def test_knn_geohash_runs_fully_native(spark, monkeypatch):
    """Round 5: the square-grid kNN loop runs on packed int64 keys with
    codegen disk/annulus explodes — NO Python cell UDF may be built.
    Poison every UDF constructor joins.py could fall back to; a sparse
    fixture forces multiple rings so the annulus branch is exercised
    too.  Exactness vs brute force is still asserted so the native
    rewrite can't silently change results."""
    import vector2dggs_spark.operators.joins as J

    def _poisoned(*a, **k):
        raise AssertionError("geohash kNN must not build a Python cell UDF")

    monkeypatch.setattr(J, "point_to_cell_udf", _poisoned)
    monkeypatch.setattr(J, "grid_disk_udf", _poisoned)
    monkeypatch.setattr(J, "grid_annulus_udf", _poisoned)

    rng = np.random.default_rng(11)
    n_t, n_q, k = 60, 12, 3  # sparse: ring 1 cannot finish every query
    t = pd.DataFrame({
        "target_id": [f"t{i:03d}" for i in range(n_t)],
        "lat": rng.uniform(-44.4, -43.7, n_t),
        "lon": rng.uniform(-176.6, -176.2, n_t),
    })
    q = pd.DataFrame({
        "query_id": [f"q{i:03d}" for i in range(n_q)],
        "lat": rng.uniform(-44.4, -43.7, n_q),
        "lon": rng.uniform(-176.6, -176.2, n_q),
    })
    got = knn(
        spark.createDataFrame(q), spark.createDataFrame(t),
        get_backend("geohash"), res=7, k=k,
    ).toPandas()
    d2 = (q["lat"].to_numpy()[:, None] - t["lat"].to_numpy()[None, :]) ** 2 + (
        q["lon"].to_numpy()[:, None] - t["lon"].to_numpy()[None, :]
    ) ** 2
    for qi, qid in enumerate(q["query_id"]):
        order = np.lexsort((t["target_id"].to_numpy(), d2[qi]))[:k]
        exp_ids = [t["target_id"][j] for j in order]
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub["target_id"].tolist() == exp_ids, qid
    assert len(got) == n_q * k


def _rect_frames(rng, n_a, n_b):
    def mk(n, prefix, dx):
        cx = rng.uniform(-176.6, -176.2, n) + dx
        cy = rng.uniform(-44.4, -43.7, n)
        w = rng.uniform(0.001, 0.02, n)
        h = rng.uniform(0.001, 0.02, n)
        return pd.DataFrame({
            "rid": [f"{prefix}{i:03d}" for i in range(n)],
            "x0": cx - w / 2, "y0": cy - h / 2,
            "x1": cx + w / 2, "y1": cy + h / 2,
        })
    return mk(n_a, "a", 0.0), mk(n_b, "b", 0.0005)


def test_rect_join_matches_brute_force(spark):
    """rect_join returns EXACTLY the overlapping (a, b) rect pairs —
    including rects spanning several covering cells and pairs whose
    only shared cell contains just a corner of the intersection.  A
    boundary-touch case is planted explicitly (closed-bounds
    convention)."""
    from vector2dggs_spark.operators.joins import rect_join

    rng = np.random.default_rng(23)
    a, b = _rect_frames(rng, 260, 240)
    # planted exact boundary touch: b-rect's left edge == a-rect's right edge
    a.loc[0, ["x0", "y0", "x1", "y1"]] = [-176.5, -44.0, -176.49, -43.99]
    b.loc[0, ["x0", "y0", "x1", "y1"]] = [-176.49, -44.0, -176.48, -43.99]
    got = rect_join(
        spark.createDataFrame(a).withColumnRenamed("rid", "id_a"),
        spark.createDataFrame(b).withColumnRenamed("rid", "id_b"),
        get_backend("geohash"), res=7,
    ).toPandas()
    ov = (
        (a["x0"].to_numpy()[:, None] <= b["x1"].to_numpy()[None, :])
        & (b["x0"].to_numpy()[None, :] <= a["x1"].to_numpy()[:, None])
        & (a["y0"].to_numpy()[:, None] <= b["y1"].to_numpy()[None, :])
        & (b["y0"].to_numpy()[None, :] <= a["y1"].to_numpy()[:, None])
    )
    exp = {(a["rid"][i], b["rid"][j]) for i, j in zip(*np.nonzero(ov))}
    assert {(r.id_a, r.id_b) for r in got.itertuples()} == exp
    assert ("a000", "b000") in exp  # the planted touch survived
    assert len(exp) > 50


def test_rect_join_plan_is_equijoin(spark):
    """The cover+refine plan must propose candidates through a hash
    EQUI-join on the cell key — never a cartesian / nested-loop plan
    (the thing that dies first at 100 TB)."""
    from vector2dggs_spark.operators.joins import rect_join

    rng = np.random.default_rng(5)
    a, b = _rect_frames(rng, 30, 30)
    out = rect_join(
        spark.createDataFrame(a).withColumnRenamed("rid", "id_a"),
        spark.createDataFrame(b).withColumnRenamed("rid", "id_b"),
        get_backend("geohash"), res=7,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
    # the whole cover runs JVM-native: no Python evaluation anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rect_join_unsupported_backend_raises(spark):
    """Backends without a native rect cover fail loudly at plan time
    with the documented compose-path message."""
    from vector2dggs_spark.operators.joins import rect_join

    rng = np.random.default_rng(1)
    a, b = _rect_frames(rng, 3, 3)
    with pytest.raises(NotImplementedError, match="polyfill"):
        rect_join(
            spark.createDataFrame(a).withColumnRenamed("rid", "id_a"),
            spark.createDataFrame(b).withColumnRenamed("rid", "id_b"),
            get_backend("h3"), res=7,
        )


def _st_frames(rng, n):
    # points on a small window; timestamps across ~3 days in micros
    return pd.DataFrame({
        "pid": [f"p{i:04d}" for i in range(n)],
        "lat": rng.uniform(-44.4, -43.9, n),
        "lon": rng.uniform(-176.6, -176.1, n),
        "t_us": rng.integers(1_704_000_000_000_000, 1_704_260_000_000_000, n),
    })


def test_st_range_join_matches_brute_force(spark):
    """Spatio-temporal range_join == brute-force (dist AND |dt|), and
    each qualifying pair appears EXACTLY once (the single-target-key
    argument that lets the operator skip distinct)."""
    from vector2dggs_spark.operators.joins import range_join

    rng = np.random.default_rng(11)
    pts = _st_frames(rng, 400)
    radius, dt_us = 0.05, 3_600_000_000  # +/- 1 h
    q = pts.iloc[:60].rename(columns={"pid": "query_id"})
    t = pts.rename(columns={"pid": "target_id"})
    got = range_join(
        spark.createDataFrame(q), spark.createDataFrame(t),
        get_backend("geohash"), res=5, radius=radius,
        t_col="t_us", dt_us=dt_us,
    ).toPandas()
    # brute force
    dla = q["lat"].to_numpy()[:, None] - t["lat"].to_numpy()[None, :]
    dlo = q["lon"].to_numpy()[:, None] - t["lon"].to_numpy()[None, :]
    dts = t["t_us"].to_numpy()[None, :] - q["t_us"].to_numpy()[:, None]
    ok = (dla * dla + dlo * dlo <= radius * radius) & (np.abs(dts) <= dt_us)
    exp = {(q["query_id"].iloc[i], t["target_id"].iloc[j]): int(dts[i, j])
           for i, j in zip(*np.nonzero(ok))}
    pairs = list(zip(got.query_id, got.target_id))
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    assert dict(zip(pairs, got.delta_us.astype(int))) == exp
    assert len(exp) > 60  # non-trivial scenario (incl. self-matches)


def test_st_range_join_plan_and_validation(spark):
    """The temporal variant stays an equi-join (cell AND bucket in the
    key) with zero Python; bad parameter combos raise."""
    from vector2dggs_spark.operators.joins import range_join

    rng = np.random.default_rng(3)
    pts = _st_frames(rng, 50)
    q = spark.createDataFrame(pts.iloc[:10].rename(columns={"pid": "query_id"}))
    t = spark.createDataFrame(pts.rename(columns={"pid": "target_id"}))
    out = range_join(q, t, get_backend("geohash"), res=5, radius=0.05,
                     t_col="t_us", dt_us=3_600_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "__bkt" in plan  # time bucket participates in the join key
    with pytest.raises(ValueError, match="together"):
        range_join(q, t, get_backend("geohash"), res=5, radius=0.05,
                   t_col="t_us")
    with pytest.raises(ValueError, match="positive"):
        range_join(q, t, get_backend("geohash"), res=5, radius=0.05,
                   t_col="t_us", dt_us=0)


def test_rect_contains_join_semi_anti_brute(spark):
    """rect_contains_join semi/anti == brute-force point-in-any-rect
    (closed bounds), the two modes partition the input, and all input
    columns survive."""
    from vector2dggs_spark.operators.joins import rect_contains_join

    rng = np.random.default_rng(17)
    n_p, n_z = 500, 40
    pts = pd.DataFrame({
        "point_id": [f"p{i:04d}" for i in range(n_p)],
        "lat": rng.uniform(-44.4, -43.9, n_p),
        "lon": rng.uniform(-176.6, -176.1, n_p),
        "tag": rng.integers(0, 9, n_p),
    })
    _, z = _rect_frames(rng, 1, n_z)
    z = z.rename(columns={"rid": "id_r"})
    # planted exact boundary touch: a point ON a zone edge counts as inside
    pts.loc[0, ["lat", "lon"]] = [float(z["y0"][0]), float(z["x0"][0])]
    inside = (
        (pts["lon"].to_numpy()[:, None] >= z["x0"].to_numpy()[None, :])
        & (pts["lon"].to_numpy()[:, None] <= z["x1"].to_numpy()[None, :])
        & (pts["lat"].to_numpy()[:, None] >= z["y0"].to_numpy()[None, :])
        & (pts["lat"].to_numpy()[:, None] <= z["y1"].to_numpy()[None, :])
    ).any(axis=1)
    exp_in = set(pts["point_id"][inside])
    sp, sz = spark.createDataFrame(pts), spark.createDataFrame(z)
    be = get_backend("geohash")
    semi = rect_contains_join(sp, sz, be, res=7, how="semi").toPandas()
    anti = rect_contains_join(sp, sz, be, res=7, how="anti").toPandas()
    assert set(semi.point_id) == exp_in
    assert set(anti.point_id) == set(pts["point_id"]) - exp_in
    assert sorted(semi.columns) == sorted(pts.columns)  # originals survive
    assert "p0000" in exp_in  # the planted boundary touch
    assert 0 < len(exp_in) < n_p
    with pytest.raises(ValueError, match="semi|anti"):
        rect_contains_join(sp, sz, be, res=7, how="inner")
    with pytest.raises(NotImplementedError, match="polyfill"):
        rect_contains_join(sp, sz, get_backend("h3"), res=7)
