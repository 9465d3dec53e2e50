"""Structured Streaming: greedy MinHash-LSH near-dup removal.

The streaming twin of contract query q39 (greedy LSH dedup): every
4x4-banded MinHash bucket is owned by the smallest ``(event_time,
doc_id)`` ever seen in it; a document is KEPT iff it wins all four of
its buckets.  Chains collapse transitively — a document that lost a
bucket still owns its other buckets, so later members of the same
near-dup cluster are dropped too.

Implementation: ``foreachBatch`` against a winners state table (the
standard pattern for cross-batch custom state that needs joins):

* per micro-batch, bucket winners = min over (state ∪ batch) — a small
  equi-join, never all-pairs;
* kept batch docs are appended to the output; the state table is
  rewritten with the merged winners, pruned to the event-time horizon so
  state stays bounded by ingest-rate x horizon;
* a processed-batch-id marker makes replays after a crash idempotent
  (the winners merge itself is naturally idempotent: a replayed doc
  ties with its own state entry and still wins).

Determinism contract (same as the watermarked exact dedup): within a
micro-batch the outcome is a pure function of the data; across batches
the earlier-ARRIVING batch's docs own their buckets, so batch parity
with ``batch_lsh_dedup`` holds when arrival order respects event time
(the windowed-dedup module documents the same boundary).

Signatures are the q12/q39 fold — native Spark SQL expressions, no
Python in the signature path.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vector2dggs_spark.entrypoints import _MH_P, _MH_PERMS

_SCHEMA = "doc_id string, text string, event_time timestamp"


def band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, event_time, band, bv) — the q12/q39 banded MinHash
    signature as native DataFrame ops (16 permutation mins in ONE
    aggregate fold, 4 bands of 4).  Docs with <3 tokens emit no rows."""
    inits = ", ".join(f"'m{j}', cast({_MH_P} as bigint)" for j in range(len(_MH_PERMS)))
    steps = ", ".join(
        f"'m{j}', least(acc.m{j}, (h * {a} + {b}) % {_MH_P})"
        for j, (a, b) in enumerate(_MH_PERMS)
    )
    shingles = (
        "transform(sequence(1, size(toks) - 2), i -> "
        "cast(conv(substring(md5(concat_ws(' ', slice(toks, i, 3))), 1, 12), 16, 10) as bigint))"
    )
    bv = (
        "CASE band "
        + " ".join(
            f"WHEN {i} THEN concat_ws('|', mm.m{4*i}, mm.m{4*i+1}, mm.m{4*i+2}, mm.m{4*i+3})"
            for i in range(4)
        )
        + " END"
    )
    return (
        docs.selectExpr("doc_id", "event_time", "split(text, ' ') AS toks")
        .where(F.expr("size(toks) >= 3"))
        .selectExpr("doc_id", "event_time", f"{shingles} AS hs")
        .selectExpr(
            "doc_id", "event_time",
            f"aggregate(hs, named_struct({inits}), (acc, h) -> named_struct({steps})) AS mm",
        )
        .selectExpr(
            "doc_id", "event_time", "explode(array(0, 1, 2, 3)) AS band", "mm"
        )
        .selectExpr("doc_id", "event_time", "band", f"{bv} AS bv")
    )


def _winner() -> F.Column:
    return F.min_by(
        F.struct("doc_id", "event_time"), F.struct("event_time", "doc_id")
    ).alias("w")


def batch_lsh_dedup(docs: DataFrame) -> DataFrame:
    """Batch greedy LSH dedup over a (doc_id, text, event_time) corpus —
    q39 semantics with (event_time, doc_id) bucket ordering; the parity
    oracle for the streaming operator under in-order arrival."""
    bands = band_rows(docs)
    winners = bands.groupBy("band", "bv").agg(_winner())
    kept_banded = (
        bands.join(winners, ["band", "bv"])
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("w.doc_id") == F.col("doc_id"), 1).otherwise(0)
            ).alias("won"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("won") == F.col("n"))
        .select("doc_id")
    )
    short = docs.selectExpr("doc_id", "split(text, ' ') AS toks").where(
        F.expr("size(toks) < 3")
    ).select("doc_id")
    return kept_banded.unionByName(short)


def stream_lsh_dedup_documents(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    horizon: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streamed (doc_id, text, event_time) parquet -> kept documents
    parquet, greedy-LSH semantics with bounded winner state."""
    horizon_expr = f"INTERVAL {horizon}"
    winners_path = os.path.join(state_dir, "winners")
    marker_path = os.path.join(state_dir, "last_batch.json")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        if os.path.exists(marker_path):
            with open(marker_path) as f:
                if json.load(f).get("batch_id") == batch_id:
                    return  # replay of an already-applied batch
        bands = band_rows(batch_df).cache()
        have_state = os.path.exists(os.path.join(winners_path, "_SUCCESS"))
        if have_state:
            state = sp.read.parquet(winners_path)
            all_rows = bands.select(
                "band", "bv", "doc_id", "event_time"
            ).unionByName(
                state.select("band", "bv", F.col("w.doc_id"), F.col("w.event_time"))
            )
        else:
            all_rows = bands.select("band", "bv", "doc_id", "event_time")
        winners = all_rows.groupBy("band", "bv").agg(_winner()).cache()

        kept = (
            bands.join(winners, ["band", "bv"])
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.when(F.col("w.doc_id") == F.col("doc_id"), 1).otherwise(0)
                ).alias("won"),
                F.count(F.lit(1)).alias("n"),
            )
            .where(F.col("won") == F.col("n"))
            .select("doc_id")
        )
        short = batch_df.selectExpr("doc_id", "split(text, ' ') AS toks").where(
            F.expr("size(toks) < 3")
        ).select("doc_id")
        out = batch_df.join(kept.unionByName(short), "doc_id")
        out.write.mode("append").parquet(output_dir)

        # merge + horizon-prune the winner state (bounded like a
        # watermark: buckets older than max(event_time) - horizon can
        # no longer collide with in-horizon data we would keep)
        hi = winners.agg(F.max("w.event_time").alias("m")).collect()[0]["m"]
        pruned = winners.where(
            F.col("w.event_time") >= F.expr(f"timestamp'{hi}' - {horizon_expr}")
        ) if hi is not None else winners
        tmp = winners_path + ".tmp"
        pruned.write.mode("overwrite").parquet(tmp)
        sp.read.parquet(tmp).write.mode("overwrite").parquet(winners_path)
        with open(marker_path, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        bands.unpersist()
        winners.unpersist()

    docs = spark.readStream.schema(_SCHEMA).parquet(input_dir)
    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
