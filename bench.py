"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>, "cells_per_sec": ..., ...}

The headline metric is cell-IDs emitted/sec (BASELINE.md): the sum of
cells produced by the native point-index path and the full interleaved-
documents pipeline, divided by their wall time.  Scaling-efficiency
evidence (local[8] vs local[32]) is produced by scripts/scaling_bench.py
into BENCH/BASELINE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))


def _bench_docs_path(n: int) -> str:
    return f"/tmp/v2dggs_bench/docs_n{n}_seed42.parquet"


def ensure_bench_docs(spark, n: int) -> str:
    """Materialize the synthesized interleaved docs once; reuse across
    parallelism levels so scaling runs see identical input."""
    path = _bench_docs_path(n)
    marker = path + "/_SUCCESS"
    if not os.path.exists(marker):
        from vector2dggs_spark.sources.documents import documents_df

        documents_df(spark, n, seed=42).repartition(32).write.mode("overwrite").parquet(path)
    return path


def run_bench(spark, sf_dir: str) -> dict:
    from vector2dggs_spark import get_backend, index
    from vector2dggs_spark.entrypoints import PTS, load_views
    from vector2dggs_spark.functions import sqlgen as G
    from vector2dggs_spark.operators.joins import knn

    times: dict[str, float] = {}
    counts: dict[str, int] = {}

    # the sandbox host shows sporadic multi-second interference windows
    # (documented with raw arrays in BENCH/BASELINE.md); each query is
    # therefore timed as the MIN of BENCH_RUNS runs — the steady-state
    # number a dedicated cluster would show, robust to one bad window
    n_runs = int(os.environ.get("BENCH_RUNS", "2"))

    def timed(name, fn):
        best = None
        out = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        counts[name] = out
        return out

    load_views(spark, sf_dir)
    docs_path = ensure_bench_docs(spark, BENCH_DOCS)
    docs = spark.read.parquet(docs_path)

    # 1. native point index at res 9 (pure WholeStageCodegen SQL,
    # staged lateral-alias form keeps parse/codegen linear)
    gh9 = G.geohash_select_sql(PTS, "lat", "lon", 9, ["point_id"], out="cell")
    timed(
        "point_index_native_r9",
        lambda: spark.sql(
            f"SELECT substring(cell, 1, 3) AS parent, count(*) AS n FROM "
            f"({gh9}) __c GROUP BY 1"
        ).agg(F.sum("n")).collect()[0][0],
    )

    # 1b. native rHP point index at res 9 (round 3: the second backend
    # whose point path is pure JVM — layered HEALPix projection SQL)
    rhp9 = G.rhp_select_sql(PTS, "lat", "lon", 9, ["point_id"], out="cell")
    timed(
        "point_index_rhp_native_r9",
        lambda: spark.sql(
            f"SELECT substring(cell, 1, 4) AS parent, count(*) AS n FROM "
            f"({rhp9}) __c GROUP BY 1"
        ).agg(F.sum("n")).collect()[0][0],
    )

    # 1c. H3 point index at res 9 — the BASELINE.json headline metric
    # verbatim ("H3 cell-IDs emitted/sec at resolution 9").  This runs
    # the PRODUCTION path: the vectorized numpy kernel over Arrow
    # batches, measured at 5.9M pts/s — 5x faster than the layered-SQL
    # formulation, which defeats JVM codegen (fused: the generated
    # method blows past HotSpot's huge-method JIT limit; un-fused: one
    # UnsafeRow materialization per layer) and is therefore kept as the
    # q33 ORACLE, not the hot path.  Fresh plan per run: re-collecting
    # one DataFrame lets the DAGScheduler skip the completed shuffle map
    # stage entirely (measured 0.04 s "runs" — a benchmarking trap).
    from vector2dggs_spark.dggs import get_backend as _gb
    from vector2dggs_spark.operators.udfs import point_to_cell_udf

    h3_n = 10_000_000
    # SAME formulas as the q30-q38 oracle corpus (the helper is
    # parameterized by table) — the headline is measured on points the
    # correctness gate covers
    h3_src = G.derived_points_global_sql(f"range(0, {h3_n})", "id")
    h3_enc = point_to_cell_udf(_gb("h3"), 9)

    def _h3_run():
        return (
            spark.sql(h3_src)
            .select(h3_enc("lat", "lon").alias("cell"))
            .select(F.substring("cell", 1, 5).alias("p"))
            .groupBy("p").count()
            .agg(F.sum("count")).collect()[0][0]
        )

    _h3_run()  # untimed Python-worker / Arrow warm-up
    timed("point_index_h3_arrow_r9", _h3_run)

    # 2. full interleaved-documents pipeline (polygons + lines + points).
    # Timed runs build FRESH plans before any cache exists (Spark's cache
    # manager matches canonicalized plans, so timing a cached DataFrame
    # would measure a cache read); the cache for the downstream join/kNN
    # entries is populated afterwards, untimed.
    timed(
        "pipeline_docs_r6",
        lambda: index(spark, docs, dggs="geohash", resolution=6, parent_res=3).cells.count(),
    )
    r = index(spark, docs, dggs="geohash", resolution=6, parent_res=3)
    cells = r.cells.cache()
    cells.count()

    # 3. spatial cell join: point cells x polygon cells
    pts_cells = spark.sql(
        G.geohash_select_sql(PTS, "lat", "lon", 6, [], out="geohash_06")
    )
    timed(
        "spatial_join",
        lambda: pts_cells.join(cells, "geohash_06").count(),
    )

    # 4. kNN ring expansion: 200 queries vs derived points
    pts = spark.sql(PTS)
    timed(
        "knn_200x_k5",
        lambda: knn(
            pts.where(F.col("point_id") < 200).withColumnRenamed("point_id", "query_id"),
            pts.withColumnRenamed("point_id", "target_id"),
            get_backend("geohash"),
            res=6,
            k=5,
        ).count(),
    )

    # (Sparse multi-round kNN annulus-vs-fulldisk comparison lives in
    # scripts/knn_annulus_bench.py — interleaved median-of-5 at sf0.01:
    # annulus 32.3s vs full-disk 35.4s plus deterministic scored-
    # candidate counts; it runs ~30s per mode, too heavy for this smoke
    # suite, and single runs on this host are noise-dominated.)

    # 4b. hot-cell skew in the regime salting is FOR: one cell holds 90%
    # of the left side, the right side is too big to broadcast, and the
    # action does per-row work — the hot key's single reduce task
    # dominates a plain join.  cell_join(salt=) detects hot keys on a
    # sample, salts ONLY them (deterministic xxhash salt), broadcasts
    # the replicated hot-right slice, and unions the plain cold join.
    # (Round-1 blanket salting was 3.7× SLOWER than plain; the round-2
    # targeted form measures ~1.6× FASTER here and falls back to a plain
    # join on unskewed inputs.)
    from vector2dggs_spark.operators.joins import cell_join

    hot_left = spark.range(200_000).selectExpr(
        "case when id % 10 < 9 then 'HOTCELL' else concat('c', id % 20000) end AS geohash_06",
        "id AS l_id",
    )
    hot_right = spark.range(2_000_000).selectExpr(
        "case when id < 1000 then 'HOTCELL' else concat('c', id % 20000) end AS geohash_06",
        "id AS r_id",
    )

    def _skew_act(df):
        return df.agg(
            F.sum(F.xxhash64("geohash_06", "l_id", "r_id").cast("double"))
        ).collect()

    # steady-state comparison: warm each strategy once (plan + broadcast
    # + codegen), then time — the point is the join strategy, not JVM
    # warmup noise
    _skew_act(cell_join(hot_left, hot_right, "geohash_06"))
    timed("skew_join_plain", lambda: _skew_act(cell_join(hot_left, hot_right, "geohash_06")))
    _skew_act(cell_join(hot_left, hot_right, "geohash_06", salt=32))
    timed(
        "skew_join_salted",
        lambda: _skew_act(cell_join(hot_left, hot_right, "geohash_06", salt=32)),
    )

    # 5. compaction over the pipeline output
    rc = index(spark, docs, dggs="geohash", resolution=6, parent_res=3, compact=True)
    timed("compaction", lambda: rc.cells.count())

    # 6. minhash-LSH candidate pairs over documents
    from vector2dggs_spark.entrypoints import QUERIES

    timed("minhash_lsh", lambda: QUERIES["q12_minhash_lsh_pairs"][0](spark, sf_dir).count())

    # 7. ANN cosine top-k over embeddings
    timed("ann_cosine", lambda: QUERIES["q13_ann_cosine_topk"][0](spark, sf_dir).count())

    cells.unpersist()
    indexed_cells = counts["point_index_native_r9"] + counts["pipeline_docs_r6"]
    index_time = times["point_index_native_r9"] + times["pipeline_docs_r6"]
    h3_cps = round(h3_n / max(times["point_index_h3_arrow_r9"], 1e-9), 1)
    return {
        "metric": "headline suite wall time (cells/sec in cells_per_sec)",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": _sf_from_dir(sf_dir),
        "cells_emitted": int(indexed_cells),
        "cells_per_sec": round(indexed_cells / max(index_time, 1e-9), 1),
        "h3_cells_per_sec_r9": h3_cps,
        "bench_docs": BENCH_DOCS,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from vector2dggs_spark.session import get_spark

    spark = get_spark(cores=cpus, app="bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = run_bench(spark, sf_dir)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
