"""Extra benchmarks for optimization work (guide §1.4) — NOT the driver
contract; bench.py stays the frozen measurement.

Isolates each headline query with the noop sink (times computation, not
collect/sink), labels jobs, and optionally dumps formatted plans.

Usage:
  python bench_extra.py [query ...]        # all or a subset by name
  PLANS_DIR=plans/r06 TAG=before python bench_extra.py   # also dump plans

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_RUNS (min-of-N, default 3).
Prints one JSON line {"queries": {name: sec}, ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

N_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
PLANS_DIR = os.environ.get("PLANS_DIR")
TAG = os.environ.get("TAG", "before")


def main() -> None:
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from vector2dggs_spark.session import get_spark

    spark = get_spark(cores=cpus, app="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from bench import BENCH_DOCS, ensure_bench_docs
    from vector2dggs_spark import get_backend, index
    from vector2dggs_spark.entrypoints import PTS, QUERIES, load_views
    from vector2dggs_spark.functions import sqlgen as G
    from vector2dggs_spark.operators.joins import cell_join, knn

    load_views(spark, sf_dir)
    docs = spark.read.parquet(ensure_bench_docs(spark, BENCH_DOCS))

    times: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, mk, action=noop, warm=True):
        """mk() -> DataFrame (fresh plan per run); action(df) executes it."""
        if only and name not in only:
            return
        sc.setJobDescription(name)
        if PLANS_DIR:
            df = mk()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            os.makedirs(PLANS_DIR, exist_ok=True)
            with open(os.path.join(PLANS_DIR, f"{name}_{TAG}.txt"), "w") as f:
                f.write(plan)
        if warm:
            action(mk())
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            action(mk())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        sc.setJobDescription(None)
        print(f"{name}: {best:.3f}s", file=sys.stderr)

    # --- mirrors of bench.py's timed sections, noop-isolated ---
    gh9 = G.geohash_select_sql(PTS, "lat", "lon", 9, ["point_id"], out="cell")
    timed("point_index_native_r9", lambda: spark.sql(
        f"SELECT substring(cell, 1, 3) AS parent, count(*) AS n FROM ({gh9}) __c GROUP BY 1"))

    rhp9 = G.rhp_select_sql(PTS, "lat", "lon", 9, ["point_id"], out="cell")
    timed("point_index_rhp_native_r9", lambda: spark.sql(
        f"SELECT substring(cell, 1, 4) AS parent, count(*) AS n FROM ({rhp9}) __c GROUP BY 1"))

    from vector2dggs_spark.dggs import get_backend as _gb
    from vector2dggs_spark.operators.udfs import point_to_cell_udf

    h3_src = G.derived_points_global_sql("range(0, 10000000)", "id")
    h3_enc = point_to_cell_udf(_gb("h3"), 9)
    timed("point_index_h3_arrow_r9", lambda: (
        spark.sql(h3_src)
        .select(h3_enc("lat", "lon").alias("cell"))
        .select(F.substring("cell", 1, 5).alias("p"))
        .groupBy("p").count()))

    timed("pipeline_docs_r6", lambda: index(
        spark, docs, dggs="geohash", resolution=6, parent_res=3).cells)

    cells = index(spark, docs, dggs="geohash", resolution=6, parent_res=3).cells.cache()
    cells.count()
    pts_cells = spark.sql(G.geohash_select_sql(PTS, "lat", "lon", 6, [], out="geohash_06"))
    timed("spatial_join", lambda: pts_cells.join(cells, "geohash_06"))

    pts = spark.sql(PTS)
    timed("knn_200x_k5", lambda: knn(
        pts.where(F.col("point_id") < 200).withColumnRenamed("point_id", "query_id"),
        pts.withColumnRenamed("point_id", "target_id"),
        get_backend("geohash"), res=6, k=5))

    hot_left = spark.range(200_000).selectExpr(
        "case when id % 10 < 9 then 'HOTCELL' else concat('c', id % 20000) end AS geohash_06",
        "id AS l_id")
    hot_right = spark.range(2_000_000).selectExpr(
        "case when id < 1000 then 'HOTCELL' else concat('c', id % 20000) end AS geohash_06",
        "id AS r_id")

    def _skew_act(df):
        df.agg(F.sum(F.xxhash64("geohash_06", "l_id", "r_id").cast("double"))).collect()

    timed("skew_join_plain",
          lambda: cell_join(hot_left, hot_right, "geohash_06"), action=_skew_act)
    timed("skew_join_salted",
          lambda: cell_join(hot_left, hot_right, "geohash_06", salt=32), action=_skew_act)

    timed("compaction", lambda: index(
        spark, docs, dggs="geohash", resolution=6, parent_res=3, compact=True).cells)

    timed("minhash_lsh", lambda: QUERIES["q12_minhash_lsh_pairs"][0](spark, sf_dir))
    timed("ann_cosine", lambda: QUERIES["q13_ann_cosine_topk"][0](spark, sf_dir))

    cells.unpersist()
    print(json.dumps({"queries": times, "runs": N_RUNS,
                      "sf_dir": sf_dir, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
