"""Custom stateful streaming operator: running per-cell document counts.

Demonstrates the ``applyInPandasWithState`` pattern for stateful DGGS
aggregation over the document stream — state (per-cell running total)
lives in the streaming state store and survives restarts via the
checkpoint, so an interrupted ingestion resumes with correct totals
(the streaming analog of the batch per-partition lineage)."""
from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vector2dggs_spark.dggs import get_backend
from vector2dggs_spark.operators.prepare import _POINT_RE
from vector2dggs_spark.operators.udfs import point_to_cell_udf
from vector2dggs_spark.sources.documents import DOCUMENTS_SCHEMA

OUTPUT_SCHEMA = "cell string, total bigint"
STATE_SCHEMA = "total bigint"


def _update(key, pdfs, state: GroupState):
    new = 0
    for pdf in pdfs:
        new += len(pdf)
    total = (state.get[0] if state.exists else 0) + new
    state.update((total,))
    yield pd.DataFrame({"cell": [key[0]], "total": [total]})


def streaming_cell_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    dggs: str = "geohash",
    resolution: int = 5,
    available_now: bool = True,
) -> StreamingQuery:
    """documents stream -> running (cell, total) counts (file sinks require append mode; each batch appends the refreshed totals for the cells it touched)."""
    backend = get_backend(dggs)
    cell_udf = point_to_cell_udf(backend, resolution)
    docs = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    pat = _POINT_RE.strip("^$")
    pts = (
        docs.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "geometry")
        .select("doc_id", F.col("span.text").alias("wkt"))
        .where(F.col("wkt").rlike("^\\s*POINT"))
        .select(
            "doc_id",
            F.regexp_extract("wkt", pat, 1).cast("double").alias("lon"),
            F.regexp_extract("wkt", pat, 2).cast("double").alias("lat"),
        )
        .where(F.col("lon").isNotNull())
        .select(cell_udf("lat", "lon").alias("cell"), "doc_id")
    )
    counts = pts.groupBy("cell").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        counts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
