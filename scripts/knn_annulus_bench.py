"""Sparse multi-round kNN: annulus vs full-disk expansion (VERDICT r03 #5).

The annulus mode joins only ``disk(r) \\ disk(r_prev)`` per round and
ranks new candidates against the carried top-k; the full-disk control
re-joins and re-ranks the whole disk.  The join volume relation is
structural (annulus ⊂ disk, carried rows = k per pending query); this
harness measures what that buys in wall time, in the regime the
optimization exists for: sparse targets forcing ring >= 4 with most
queries terminating via the ring guarantee (when queries instead
exhaust ``max_ring``, the full-disk fallback dominates both modes and
the comparison is meaningless — measured and documented in
BENCH/BASELINE.md round 4).

Interleaved repetitions (annulus/full alternating) with a warm-up pass
per mode, median reported — single runs on this host are interference-
dominated (BENCH/BASELINE.md protocol).

Usage: python scripts/knn_annulus_bench.py [reps]
Reference result (2026-08-17, sf0.01-derived corpus, 1000 queries x 200
targets, res 7, local[32]): annulus median 32.3s [29.5, 33.7, 32.6,
32.3, 30.1] vs full-disk 35.4s [35.4, 35.6, 33.9, 35.4, 32.9].
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.entrypoints import PTS, load_views
    from vector2dggs_spark.operators.joins import knn

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_views(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    pts = spark.sql(PTS).cache()
    pts.count()
    targets = pts.where(F.col("point_id") % 50 == 0).withColumnRenamed(
        "point_id", "target_id"
    )
    queries = pts.where(F.col("point_id") < 1000).withColumnRenamed(
        "point_id", "query_id"
    )

    def run(ann: bool) -> int:
        return knn(
            queries, targets, get_backend("geohash"), res=7, k=5, annulus=ann
        ).count()

    rows = {ann: run(ann) for ann in (True, False)}  # warm-up
    assert rows[True] == rows[False], "annulus changed the result!"
    times: dict[bool, list[float]] = {True: [], False: []}
    for _ in range(reps):
        for ann in (True, False):
            t0 = time.perf_counter()
            run(ann)
            times[ann].append(time.perf_counter() - t0)
    for ann in (True, False):
        label = "annulus " if ann else "fulldisk"
        print(
            f"{label}: median {statistics.median(times[ann]):.1f}s "
            f"runs {[round(t, 1) for t in times[ann]]} rows {rows[ann]}"
        )


if __name__ == "__main__":
    main()
