"""Structured Streaming: geofence alerting (stream-static spatial join).

The batch engine's ``rect_contains_join`` answers "which points fall in
a zone" (q71); the streaming twin answers it CONTINUOUSLY: a feed of
position fixes joins a STATIC zone table and emits one alert row per
(fix, zone) containment.  The reference is batch-only (SURVEY.md §2.9);
this extends its spatial join (J1) the way the other streaming modules
extend dedup/rollup.

Shape: the zone layer explodes once to covering cells
(``Backend.native_rect_keys``) and is broadcast; each streamed fix
computes its single cell key (``native_point_keys`` — pure codegen, no
Python in the stream) and hash-joins the cover; an exact bounds filter
refines.  A fix has ONE cell key and a zone's cover holds each cell at
most once, so a (fix, zone) pair matches at most one candidate row — no
stream-side dedup state is needed at all, which is what makes this plan
viable unbounded: zero stateful operators, exactly-once via the file
sink + checkpoint.

At scale: the static side is |zones| x cells-per-zone rows — broadcast
is the right plan for fleets of thousands of fences; for continent-
scale fence sets drop the broadcast hint and let AQE shuffle the
stream (the join stays an equi-join on the cell key either way).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vector2dggs_spark.dggs import Backend, get_backend

FIXES_SCHEMA = StructType(
    [
        StructField("point_id", LongType(), False),
        StructField("ts", TimestampType(), True),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
    ]
)

ZONES_SCHEMA = StructType(
    [
        StructField("id_r", StringType(), False),
        StructField("x0", DoubleType(), False),
        StructField("y0", DoubleType(), False),
        StructField("x1", DoubleType(), False),
        StructField("y1", DoubleType(), False),
    ]
)


def _zone_cover(zones: DataFrame, backend: Backend, res: int) -> DataFrame:
    nrk = getattr(backend, "native_rect_keys", None)
    cover = nrk and nrk(
        zones.select(
            F.col("id_r").alias("__idr"),
            F.col("x0").alias("__rx0"), F.col("y0").alias("__ry0"),
            F.col("x1").alias("__rx1"), F.col("y1").alias("__ry1"),
        ),
        "__ry0", "__rx0", "__ry1", "__rx1", res,
        ["__idr", "__rx0", "__ry0", "__rx1", "__ry1"], out="__cell",
    )
    if cover is None:
        raise NotImplementedError(
            f"geofence alerting needs a native rect cover for backend "
            f"{backend.name!r}; compose polyfill + cell_join for "
            f"non-square-grid backends"
        )
    return cover


def geofence_alerts(
    fixes: DataFrame, zones: DataFrame, backend: Backend, res: int,
    broadcast_zones: bool = True,
) -> DataFrame:
    """(fix, zone) containment alerts — works on a static OR streaming
    ``fixes`` frame (the plan contains no stateful operator).  Returns
    (point_id, ts, lat, lon, id_r)."""
    npk = getattr(backend, "native_point_keys", None)
    if npk is None:
        raise NotImplementedError(
            f"geofence alerting needs native point keys for backend "
            f"{backend.name!r}"
        )
    cover = _zone_cover(zones, backend, res)
    if broadcast_zones:
        cover = F.broadcast(cover)
    keyed = npk(fixes, "lat", "lon", res,
                ["point_id", "ts", "lat", "lon"], out="__cell")
    return (
        keyed.join(cover, "__cell")
        .where(
            (F.col("lon") >= F.col("__rx0")) & (F.col("lon") <= F.col("__rx1"))
            & (F.col("lat") >= F.col("__ry0")) & (F.col("lat") <= F.col("__ry1"))
        )
        .select("point_id", "ts", "lat", "lon", F.col("__idr").alias("id_r"))
    )


def stream_geofence_alerts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    zones: DataFrame,
    dggs: str = "geohash",
    resolution: int = 7,
    available_now: bool = True,
) -> StreamingQuery:
    """Position-fix parquet files under ``input_dir`` (streamed) ->
    alert parquet under ``output_dir``, exactly-once via the file sink
    checkpoint.  ``available_now=True`` drains the backlog and stops
    (the batch-parity mode used in tests); ``False`` keeps tailing."""
    fixes = spark.readStream.schema(FIXES_SCHEMA).parquet(input_dir)
    alerts = geofence_alerts(fixes, zones, get_backend(dggs), resolution)
    writer = (
        alerts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
