"""Structured Streaming: incremental point indexing.

The reference is a pure batch CLI (SURVEY.md §2.9) and the north rule's
resumability is met by batch checkpoints (plans/checkpoint.py).  This
module additionally exposes the point-index operator as a streaming
query — new document files appearing under a directory are indexed
incrementally into the same Hive-partitioned layout, with streaming
checkpointing giving exactly-once file-sink semantics.  Geometry parsing
and cell encode run as the same vectorized kernels/exprs as the batch
path, so batch and streaming results are identical for point documents.
"""
from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vector2dggs_spark.dggs import get_backend
from vector2dggs_spark.operators.prepare import _POINT_RE  # shared regex
from vector2dggs_spark.operators.udfs import point_to_cell_udf
from vector2dggs_spark.sources.documents import DOCUMENTS_SCHEMA


def stream_index_points(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    dggs: str = "geohash",
    resolution: int = 6,
    parent_res: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """documents parquet files under ``input_dir`` (streamed) ->
    Hive-partitioned cell parquet under ``output_dir``.

    ``available_now=True`` drains the current backlog and stops (the
    batch-parity mode used in tests); ``False`` keeps tailing.
    """
    backend = get_backend(dggs)
    if parent_res is None:
        parent_res = backend.default_parent_res(resolution)
    cell_col = backend.col_name(resolution)
    parent_col = backend.col_name(parent_res)

    docs = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    geoms = (
        docs.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "geometry")
        .select("doc_id", F.col("span.text").alias("wkt"))
    )
    pat = _POINT_RE.strip("^$")
    pts = (
        geoms.where(F.col("wkt").rlike("^\\s*POINT"))
        .select(
            "doc_id",
            F.regexp_extract("wkt", pat, 1).cast("double").alias("lon"),
            F.regexp_extract("wkt", pat, 2).cast("double").alias("lat"),
        )
        .where(F.col("lon").isNotNull() & F.col("lat").isNotNull())
    )
    cell = point_to_cell_udf(backend, resolution)
    cells = pts.select(
        cell("lat", "lon").alias(cell_col), "doc_id"
    ).withColumn(parent_col, backend.parent_expr(F.col(cell_col), resolution, parent_res))

    writer = (
        cells.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(parent_col)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
