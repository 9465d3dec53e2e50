"""Event-time windowed cell aggregation with late-data watermarking.

The third streaming shape the engine ships (next to incremental
indexing and the custom stateful operator): tumbling event-time windows
of per-cell activity with a watermark bounding how late events may
arrive — Structured Streaming's canonical late-data handling
(``withWatermark`` + ``window()`` + append mode, so a window only
emits once the watermark passes its end and later-than-watermark rows
are dropped, state stays bounded).

At 100-TB stream scale the aggregation is a standard partial-agg +
shuffle on (window, cell); the cell encode stays native Spark SQL for
geohash (WholeStageCodegen) and an Arrow UDF otherwise.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import Backend


def windowed_cell_counts(
    events: DataFrame,
    backend: Backend,
    resolution: int,
    time_col: str = "event_time",
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> DataFrame:
    """(…, lat, lon, event_time) stream -> per-(window, cell) counts.

    Append-mode semantics: a (window, cell) row is emitted exactly once,
    when the watermark passes the window end; events arriving later than
    ``watermark`` behind the max seen event time are dropped (bounded
    state — the reference has no streaming story; this is the engine's
    north-rule addition)."""
    if backend.name == "geohash":
        from vector2dggs_spark.functions.sqlgen import geohash_col

        cell = geohash_col("lat", "lon", resolution)
    else:
        from vector2dggs_spark.operators.udfs import point_to_cell_udf

        cell = point_to_cell_udf(backend, resolution)("lat", "lon")
    return (
        events.withColumn("cell", cell)
        .withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell",
            "n",
        )
    )
