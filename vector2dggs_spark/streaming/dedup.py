"""Structured Streaming: exact near-dup removal on a document stream.

A training-data ingest pipeline deduplicates BEFORE expensive downstream
stages; this operator runs the batch exact-dedup semantics (q07/q08:
md5 fingerprint of whitespace-normalized lowercased text, keep-first)
over a stream with bounded state:

* fingerprint is computed with the same native expression as the batch
  contract query (q08), so batch and streaming agree row-for-row,
* ``dropDuplicatesWithinWatermark`` keeps one row per fingerprint while
  the state store only retains fingerprints inside the event-time
  watermark — at 100-TB ingest the dedup state cannot grow without
  bound (the standard watermarked-dedup design; duplicates farther
  apart than the watermark are handled by the batch dedup that runs on
  the accumulated corpus).

The reference is a pure batch CLI (SURVEY.md §2.9); this module is part
of the engine's training-pipeline extensions.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


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
    parquet (exactly-once file sink).

    Keeps the FIRST arrival of each fingerprint; later duplicates within
    the watermark horizon are dropped, and the state store evicts
    fingerprints older than the watermark so state stays bounded by
    ingest-rate x watermark, not corpus size.
    """
    schema = "doc_id string, text string, event_time timestamp"
    docs = spark.readStream.schema(schema).parquet(input_dir)
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


def batch_dedup_documents(docs: DataFrame) -> DataFrame:
    """Batch analog with identical semantics (keep-first by event_time,
    doc_id tiebreak) — the parity oracle for the streaming operator."""
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
