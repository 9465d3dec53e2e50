"""Structured Streaming: exact near-dup removal on a document stream.

A training-data ingest pipeline deduplicates BEFORE expensive downstream
stages; this module runs the batch exact-dedup semantics (q07/q08: md5
fingerprint of whitespace-normalized lowercased text) over a stream with
bounded state, in two variants:

* ``stream_dedup_documents`` — ``dropDuplicatesWithinWatermark``: keeps
  the FIRST-PROCESSED row per fingerprint (lowest latency, one row out
  as soon as one arrives).  Arrival order is an ingest property, so
  which duplicate survives is only deterministic when arrival follows
  event time; the batch keep-min-event-time query is its oracle ONLY
  under in-order, single-partition ingest (a code-review repro showed
  they diverge when a later-event_time duplicate arrives first).
* ``stream_dedup_documents_windowed`` — deterministic variant: group by
  (event-time window, fingerprint) and keep the min-(event_time,
  doc_id) row, emitted when the watermark closes the window.  Output is
  a pure function of the data, independent of arrival order and
  partitioning, so ``batch_dedup_documents_windowed`` matches it
  row-for-row on ANY shuffling of the input.  Duplicates farther apart
  than one window are handled by the batch dedup over the accumulated
  corpus, as usual.

State stays bounded in both: fingerprints (or windows) older than the
watermark are evicted, so state ~ ingest-rate x horizon, not corpus
size.  The reference is a pure batch CLI (SURVEY.md §2.9); this module
is part of the engine's training-pipeline extensions.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_SCHEMA = "doc_id string, text string, event_time timestamp"


def fingerprint_expr() -> F.Column:
    """The q08 contract fingerprint: md5 of lowercased text with runs of
    spaces collapsed — shared by batch and streaming."""
    return F.md5(F.lower(F.regexp_replace(F.col("text"), " +", " ")))


def stream_dedup_documents(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Streamed (doc_id, text, event_time) parquet files -> deduplicated
    parquet (exactly-once file sink), FIRST-ARRIVAL semantics.

    Keeps the first PROCESSED row per fingerprint; later duplicates
    within the watermark horizon are dropped, and the state store evicts
    fingerprints older than the watermark.  Which duplicate survives
    depends on arrival order — use the windowed variant when the output
    must be a deterministic function of the data alone.
    """
    docs = spark.readStream.schema(_SCHEMA).parquet(input_dir)
    deduped = (
        docs.withColumn("fingerprint", fingerprint_expr())
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _windowed_keep_first(docs: DataFrame, window: str) -> DataFrame:
    """Shared batch/streaming plan: per (event-time window, fingerprint)
    keep the row with the smallest (event_time, doc_id)."""
    keep = F.min_by(
        F.struct("doc_id", "text", "event_time"),
        F.struct("event_time", "doc_id"),
    ).alias("__keep")
    return (
        docs.withColumn("fingerprint", fingerprint_expr())
        .groupBy(F.window("event_time", window), "fingerprint")
        .agg(keep)
        .select(
            F.col("__keep.doc_id").alias("doc_id"),
            F.col("__keep.text").alias("text"),
            F.col("__keep.event_time").alias("event_time"),
            "fingerprint",
        )
    )


def stream_dedup_documents_windowed(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Deterministic streamed dedup: min-(event_time, doc_id) per
    (window, fingerprint), emitted when the watermark finalizes the
    window — row-for-row equal to ``batch_dedup_documents_windowed`` on
    the same data regardless of arrival order or partitioning."""
    docs = spark.readStream.schema(_SCHEMA).parquet(input_dir)
    deduped = _windowed_keep_first(
        docs.withWatermark("event_time", watermark), window
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_dedup_documents_windowed(docs: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of the windowed streaming dedup — the SAME plan, so
    parity is by construction, not by luck of arrival order."""
    return _windowed_keep_first(docs, window)


def batch_dedup_documents(docs: DataFrame) -> DataFrame:
    """Global batch keep-first (min event_time, doc_id tiebreak) across
    the WHOLE corpus.  Oracle for ``stream_dedup_documents`` only under
    in-order single-partition arrival; the windowed pair above is the
    order-independent parity surface."""
    from pyspark.sql import Window as W

    return (
        docs.withColumn("fingerprint", fingerprint_expr())
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("fingerprint").orderBy("event_time", "doc_id")
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
