"""Structured Streaming: END-TO-END near-dup cluster maintenance.

Composes the two streaming dedup operators into the full pipeline a
training-data system actually runs: documents stream in, banded MinHash
buckets index them (``lsh_dedup.band_rows`` — the q12/q39 signature),
and cluster assignments are MAINTAINED incrementally
(``cc_maintain.CCMaintainProcessor``), converging after every batch to
exactly the q42 batch clustering over all documents seen so far.

The key reduction — bucket STARS, not bucket cliques: q42 clusters are
the connected components of "shares at least one band bucket" pairs,
i.e. a clique per bucket.  A clique and a star centered on any member
have the same connected components, so each batch only emits one edge
per (doc, bucket) — ``doc → bucket owner`` (the minimum
``(event_time, doc_id)`` ever seen in that bucket, the same owner the
greedy dedup keeps) — plus one ``old_owner → new_owner`` edge when a
batch dethrones a bucket's owner.  Edge volume is O(batch × bands),
never O(bucket²).

State:

* bucket winners — hash-partitioned on ``pbh`` exactly like
  ``lsh_dedup`` (partition-pruned reads, dynamic-partition-overwrite
  writes, atomic marker);
* the union-find forest — ``cc_maintain``'s partition-pruned state.

Crash safety by WRITE ORDER: edges are derived from the PRE-batch
winners state and applied to the CC state FIRST (its own marker makes
that idempotent), then the winners table is overwritten, then the
winners marker lands.  A crash between CC-apply and winners-write
replays edge derivation against the old winners state (same edges); a
crash between winners-write and marker replays against the NEW state —
the ``doc → owner`` edges it emits are a subset of what the first
attempt already applied (min is idempotent), and the dethronement edge
it can no longer see was already applied before the winners write.
Either way the forest converges to the no-crash clustering (pinned in
pytest).

No horizon pruning here, deliberately: the greedy KEEP/DROP twin
(``lsh_dedup``) prunes winners to an event-time horizon because an
expired bucket can no longer change kept-ness; cluster MEMBERSHIP is
forever — expiring a bucket would disconnect components linked through
it.  Bounding cluster state requires a cluster-expiry policy (an
application decision), not a silent horizon.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vector2dggs_spark.streaming.cc_maintain import CCMaintainProcessor
from vector2dggs_spark.streaming.lsh_dedup import _SCHEMA, _winner, band_rows
from vector2dggs_spark.streaming.state import (
    ensure_bucket_count,
    have_partitioned_state,
    read_marker,
    write_marker,
)


class NearDupClusterProcessor:
    """``foreachBatch`` body: documents batch -> maintained clusters."""

    def __init__(self, state_dir: str, n_state_buckets: int = 64):
        self.winners_path = os.path.join(state_dir, "winners")
        self.marker_path = os.path.join(state_dir, "last_batch.json")
        self.n = n_state_buckets
        ensure_bucket_count(state_dir, n_state_buckets)
        self.cc = CCMaintainProcessor(
            os.path.join(state_dir, "cc"), n_state_buckets=n_state_buckets
        )

    def _marker(self) -> dict:
        return read_marker(self.marker_path)

    def _write_marker(self, batch_id: int) -> None:
        write_marker(self.marker_path, batch_id=batch_id)

    def _have_state(self) -> bool:
        return have_partitioned_state(self.winners_path, "pbh")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        if self._marker().get("batch_id") == batch_id:
            return  # replay of a fully-applied batch
        bands = winners = None
        try:
            bands = band_rows(batch_df).withColumn(
                "pbh", F.pmod(F.xxhash64("band", "bv"), F.lit(self.n))
            ).cache()
            touched = [r["pbh"] for r in bands.select("pbh").distinct().collect()]
            if not touched:
                self.cc(
                    sp.createDataFrame([], "u string, v string"), batch_id
                )
                self._write_marker(batch_id)
                return
            batch_rows = bands.select("pbh", "band", "bv", "doc_id", "event_time")
            state = None
            if self._have_state():
                sp.catalog.refreshByPath(self.winners_path)
                state = (
                    sp.read.parquet(self.winners_path)
                    .where(F.col("pbh").isin(touched))
                    .select(
                        "pbh", "band", "bv",
                        F.col("w.doc_id").alias("doc_id"),
                        F.col("w.event_time").alias("event_time"),
                    )
                )
                all_rows = batch_rows.unionByName(state)
            else:
                all_rows = batch_rows
            winners = all_rows.groupBy("pbh", "band", "bv").agg(_winner()).cache()
            winners.count()  # materialize BEFORE overwriting the source

            # star edges: every batch doc -> its bucket's (new) owner
            star = (
                bands.join(winners, ["band", "bv"])
                .select(
                    F.col("doc_id").alias("u"),
                    F.col("w.doc_id").alias("v"),
                )
                .where(F.col("u") != F.col("v"))
            )
            # dethronement edges: old owner -> new owner where changed
            if state is not None:
                dethroned = (
                    state.select("band", "bv", F.col("doc_id").alias("old_owner"))
                    .join(winners, ["band", "bv"])
                    .select(
                        F.col("old_owner").alias("u"),
                        F.col("w.doc_id").alias("v"),
                    )
                    .where(F.col("u") != F.col("v"))
                )
                edges = star.unionByName(dethroned)
            else:
                edges = star
            # CC FIRST (idempotent via its own marker), winners second:
            # see module docstring for the crash-order argument
            self.cc(edges.distinct(), batch_id)
            (
                winners.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("pbh")
                .parquet(self.winners_path)
            )
            self._write_marker(batch_id)
        finally:
            for df in (bands, winners):
                if df is not None:
                    df.unpersist()

    def clusters(self, sp: SparkSession) -> DataFrame:
        """(node, component) for every document that ever shared a
        bucket; singletons are absent (union with the doc universe the
        way q42 does, if needed)."""
        return self.cc.resolve(sp)


def stream_near_dup_clusters(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    available_now: bool = True,
    n_state_buckets: int = 64,
) -> StreamingQuery:
    """Streamed (doc_id, text, event_time) parquet -> maintained
    near-dup clusters (read back via ``NearDupClusterProcessor.clusters``)."""
    process = NearDupClusterProcessor(state_dir, n_state_buckets=n_state_buckets)
    docs = spark.readStream.schema(_SCHEMA).parquet(input_dir)
    writer = (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
