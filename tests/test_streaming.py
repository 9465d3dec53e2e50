"""Structured Streaming incremental indexing: batch parity for point
documents + incremental pickup of new files with exactly-once sink."""
import os

from pyspark.sql import functions as F

from vector2dggs_spark import index
from vector2dggs_spark.sources.documents import documents_df
from vector2dggs_spark.streaming.incremental import stream_index_points


def _point_docs(spark, n, seed):
    docs = documents_df(spark, n, seed=seed)
    pts = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "geometry") & F.col("s.text").startswith("POINT"))
        .select("doc_id")
        .distinct()
    )
    return docs.join(pts, "doc_id")


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    docs = _point_docs(spark, 200, seed=9).cache()
    docs.write.parquet(in_dir)

    q = stream_index_points(spark, in_dir, out_dir, cp, dggs="geohash", resolution=6)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    batch = index(spark, docs, dggs="geohash", resolution=6).cells
    g = {(r["doc_id"], r["geohash_06"], r["geohash_01"]) for r in got.collect()}
    b = {(r["doc_id"], r["geohash_06"], r["geohash_01"]) for r in batch.collect()}
    assert g == b and g

    # incremental: new file appears -> only the delta is appended
    more = _point_docs(spark, 80, seed=31).withColumn(
        "doc_id", F.concat(F.lit("x"), F.col("doc_id"))
    )
    more.write.mode("append").parquet(in_dir)
    q2 = stream_index_points(spark, in_dir, out_dir, cp, dggs="geohash", resolution=6)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(g) + more.join(
        spark.read.parquet(in_dir), "doc_id", "left_semi"
    ).select("doc_id").distinct().count()
    # Hive layout preserved by the streaming sink
    assert any(d.startswith("geohash_01=") for d in os.listdir(out_dir))


def test_stateful_running_counts_resume(spark, tmp_path):
    """applyInPandasWithState: per-cell totals accumulate across separate
    query runs through the persisted state store (checkpoint recovery)."""
    from vector2dggs_spark.streaming.stateful import streaming_cell_counts

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    d1 = _point_docs(spark, 120, seed=2).cache()
    d1.write.parquet(in_dir)
    q = streaming_cell_counts(spark, in_dir, out_dir, cp, dggs="geohash", resolution=4)
    q.awaitTermination(120)

    d2 = _point_docs(spark, 90, seed=77).withColumn(
        "doc_id", F.concat(F.lit("y"), F.col("doc_id"))
    ).cache()
    d2.write.mode("append").parquet(in_dir)
    q2 = streaming_cell_counts(spark, in_dir, out_dir, cp, dggs="geohash", resolution=4)
    q2.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir)
        .groupBy("cell")
        .agg(F.max("total").alias("total"))
        .toPandas()
        .set_index("cell")["total"]
        .to_dict()
    )
    # expected: batch totals from ALL docs (state carried across runs)
    both = d1.unionByName(d2)
    exp = index(spark, both, dggs="geohash", resolution=4).cells
    exp_counts = {
        r["geohash_04"]: r["n"]
        for r in exp.groupBy("geohash_04").agg(F.count("*").alias("n")).collect()
    }
    assert got == exp_counts and got
