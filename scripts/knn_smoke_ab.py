"""Interleaved A/B of the BENCH smoke kNN scenario (knn_200x_k5 at
sf0.1) with annulus on vs off — settles VERDICT r04 #3 (the +32% r04
smoke move the round the loop was rewritten): measurement, not a shrug.

Interleaving (A B A B ...) cancels the host's slow-drift interference;
per-mode stats are median and min over N pairs.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main():
    from vector2dggs_spark import get_backend
    from vector2dggs_spark.entrypoints import PTS, load_views
    from vector2dggs_spark.operators.joins import knn
    from vector2dggs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_RUNS", "5"))
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app="knn_smoke_ab")
    spark.sparkContext.setLogLevel("ERROR")
    load_views(spark, sf_dir)
    pts = spark.sql(PTS)
    q = pts.where(F.col("point_id") < 200).withColumnRenamed("point_id", "query_id")
    t = pts.withColumnRenamed("point_id", "target_id")
    b = get_backend("geohash")

    def run(annulus: bool) -> float:
        t0 = time.perf_counter()
        cnt = knn(q, t, b, res=6, k=5, annulus=annulus).count()
        dt = time.perf_counter() - t0
        return dt, cnt

    # warm both paths once (plan/codegen/python-worker warmup, untimed)
    run(True); run(False)
    on, off = [], []
    for i in range(n):
        dt_on, c_on = run(True)
        dt_off, c_off = run(False)
        assert c_on == c_off, (c_on, c_off)
        on.append(dt_on); off.append(dt_off)
        print(f"pair {i}: annulus_on {dt_on:.3f}s  annulus_off {dt_off:.3f}s  rows {c_on}", flush=True)
    for name, xs in (("annulus_on", on), ("annulus_off", off)):
        print(f"{name}: median {statistics.median(xs):.3f}s min {min(xs):.3f}s all {[round(x,3) for x in xs]}")


if __name__ == "__main__":
    main()
