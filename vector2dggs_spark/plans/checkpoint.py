"""Checkpointing, per-partition lineage and metrics — the engine's
resumability layer (north rule: "checkpointed per-partition with lineage
and metrics so any failed tile batch resumes idempotently").

Maps to the reference's staged temp-dir design
(``/root/reference/vector2dggs/common.py:832-866``): each stage boundary
materializes to Parquet with a manifest; re-running with the same
fingerprint reuses the materialized stage instead of recomputing, and a
single parent-cell partition can be recomputed and overwritten
idempotently via dynamic partition overwrite.
"""
from __future__ import annotations

import json
import os
import shutil
import time
import warnings
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"
LINEAGE = "_LINEAGE.json"


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST)


def stage_checkpoint(
    df: DataFrame,
    checkpoint_dir: str,
    stage: str,
    fingerprint: str,
    metrics: dict | None = None,
) -> DataFrame:
    """Materialize ``df`` at a stage boundary, or reuse a prior run.

    The manifest records the stage fingerprint (config + input identity),
    row count, and caller metrics.  A matching manifest short-circuits
    recomputation — the batch analog of streaming state recovery.
    """
    spark = df.sparkSession
    stage_dir = os.path.join(checkpoint_dir, stage)
    mpath = _manifest_path(stage_dir)
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        if m.get("fingerprint") == fingerprint:
            return spark.read.parquet(os.path.join(stage_dir, "data"))
        shutil.rmtree(stage_dir, ignore_errors=True)
    data_dir = os.path.join(stage_dir, "data")
    df.write.mode("overwrite").parquet(data_dir)
    out = spark.read.parquet(data_dir)
    manifest = {
        "stage": stage,
        "fingerprint": fingerprint,
        "rows": out.count(),  # metadata-only count from parquet footers
        "written_at": time.time(),
        "metrics": metrics or {},
    }
    os.makedirs(stage_dir, exist_ok=True)
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    return out


def read_manifest(checkpoint_dir: str, stage: str) -> dict | None:
    mpath = _manifest_path(os.path.join(checkpoint_dir, stage))
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)


# ------------------------------------------------------------------ metrics
def drop_ratio_metric(n_before: int, n_after: int, what: str) -> dict:
    """Reference common.py:136-154: log % dropped, warn when >= 1%."""
    dropped = n_before - n_after
    pct = 100.0 * dropped / n_before if n_before else 0.0
    if pct >= 1.0:
        warnings.warn(f"{what}: dropped {dropped} of {n_before} ({pct:.2f}%)")
    return {"what": what, "before": n_before, "after": n_after, "dropped_pct": round(pct, 4)}


# ------------------------------------------------------------------ lineage
LINEAGE_DATA = "_lineage"


def write_lineage(
    cells: DataFrame, output: str, parent_col: str, config: dict
) -> dict:
    """Per-parent-cell row counts + config — the partition-level lineage
    record for the partitioned output (north rule).

    The per-partition counts are written as a Spark JSON *dataset*
    (``output/_lineage``), never collected to the driver: at fine parent
    resolutions the partition map is itself big data (a driver-side dict
    was the round-1 OOM hazard).  Only the O(1) summary (config, total)
    lands in the driver-side ``_LINEAGE.json``."""
    from pyspark.sql import Observation

    obs = Observation()
    counts = (
        cells.groupBy(parent_col)
        .agg(F.count("*").alias("n"))
        .observe(obs, F.sum("n").alias("t"), F.count(F.lit(1)).alias("p"))
    )
    counts.write.mode("overwrite").json(os.path.join(output, LINEAGE_DATA))
    totals = obs.get  # filled by the write action — no extra pass
    lineage = {
        "parent_col": parent_col,
        "lineage_data": LINEAGE_DATA,
        "n_partitions": int(totals["p"] or 0),
        "total_rows": int(totals["t"] or 0),
        "config": config,
        "written_at": time.time(),
    }
    with open(os.path.join(output, LINEAGE), "w") as f:
        json.dump(lineage, f, indent=2)
    return lineage


def verify_lineage(spark: SparkSession, output: str, max_report: int = 1000) -> dict:
    """Re-count each Hive partition and diff against the lineage dataset
    — the diff is a JOIN, not a driver-side loop; only the mismatching
    rows (capped at ``max_report``) are collected.
    Returns {partition: (expected, actual)} for mismatches (empty = OK)."""
    with open(os.path.join(output, LINEAGE)) as f:
        lineage = json.load(f)
    parent_col = lineage["parent_col"]
    try:
        # explicit schema: an empty lineage dataset (zero-row run) or a
        # legacy output must report a diff, not crash schema inference
        expected = (
            spark.read.schema(f"`{parent_col}` string, n long")
            .json(os.path.join(output, lineage.get("lineage_data", LINEAGE_DATA)))
            .select(F.col(parent_col).cast("string").alias("__p"), F.col("n").alias("expected"))
        )
    except Exception:  # _lineage directory missing entirely (pre-round-2 output)
        expected = spark.createDataFrame([], "__p string, expected long")
    try:
        df = spark.read.parquet(output)
        actual = df.groupBy(
            F.col(parent_col).cast("string").alias("__p")
        ).agg(F.count("*").alias("actual"))
    except Exception:  # dataset unreadable/empty -> everything is missing
        actual = spark.createDataFrame([], "__p string, actual long")
    diff = (
        expected.join(actual, "__p", "full_outer")
        .where(
            ~(F.coalesce(F.col("expected"), F.lit(0)) == F.coalesce(F.col("actual"), F.lit(0)))
        )
        .limit(max_report)
    )
    return {
        r["__p"]: (int(r["expected"] or 0), int(r["actual"] or 0))
        for r in diff.collect()
    }


def repair_partition(
    cells: DataFrame, output: str, parent_col: str, parent_value: str, compression: str = "snappy"
) -> None:
    """Idempotently recompute and overwrite ONE parent-cell partition
    (the 'failed tile batch resumes idempotently' path): dynamic
    partition overwrite replaces exactly the targeted Hive directory."""
    spark = cells.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            cells.where(F.col(parent_col) == parent_value)
            .repartition(1)
            .sortWithinPartitions(cells.columns[0])
            .write.mode("overwrite")
            .option("compression", compression)
            .partitionBy(parent_col)
            .parquet(output)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


# ------------------------------------------------------------------ wrapper
@dataclass
class CheckpointedRun:
    cells: DataFrame
    manifests: dict
    spans: DataFrame | None = None  # keep_spans="exploded" companion


def index_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    checkpoint_dir: str,
    fingerprint: str,
    **index_kwargs,
) -> CheckpointedRun:
    """``pipeline.index`` with stage boundaries materialized under
    ``checkpoint_dir`` — re-running with the same fingerprint resumes
    from the latest completed stage.

    Accepts the same configuration surface as ``pipeline.index`` (CRS
    reprojection, projected katana, spatial sort, keep_spans) and folds
    every option into the stage fingerprint: a checkpoint written under
    one CRS/sort config can never silently serve a run with another
    (ADVICE r02 high — the old path dropped --source_crs and parsed
    projected meters as degrees).  Unknown kwargs raise instead of being
    ignored."""
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.compaction import compact_cells_df
    from vector2dggs_spark.operators.polyfill import index_cells
    from vector2dggs_spark.operators.prepare import prepare
    from vector2dggs_spark.sources.documents import extract_geometries

    known = {
        "dggs", "resolution", "parent_res", "compact", "cut_threshold_deg2",
        "source_crs", "cut_crs", "cut_threshold_units2", "spatial_sort",
        "keep_spans", "partitions", "linetrace_mode",
    }
    unknown = set(index_kwargs) - known
    if unknown:
        raise ValueError(
            f"index_checkpointed: unsupported options {sorted(unknown)} "
            f"(supported: {sorted(known)})"
        )
    from vector2dggs_spark.plans.pipeline import resolve_backend

    dggs = index_kwargs.get("dggs", "geohash")
    resolution = index_kwargs.get("resolution", 6)
    linetrace_mode = index_kwargs.get("linetrace_mode")
    backend = resolve_backend(dggs, linetrace_mode)
    parent_res = index_kwargs.get("parent_res") or backend.default_parent_res(resolution)
    cut = index_kwargs.get("cut_threshold_deg2")
    if cut is None:
        cut = backend.default_cut_threshold_deg2(parent_res)
    source_crs = index_kwargs.get("source_crs")
    cut_crs = index_kwargs.get("cut_crs")
    cut_units2 = index_kwargs.get("cut_threshold_units2")
    if cut_crs is not None and cut_units2 is None:
        cut_units2 = cut * (111_320.0**2)  # mirror pipeline.index default
    spatial_sort = index_kwargs.get("spatial_sort", "geohash")
    if spatial_sort not in ("geohash", "morton", "hilbert", "none"):
        raise ValueError(f"unknown spatial_sort {spatial_sort!r}")
    for code in (source_crs, cut_crs):
        if code not in (None, 4326, "EPSG:4326"):
            from vector2dggs_spark.geometry.crs import get_crs

            get_crs(code)  # fail fast at plan time
    fp = (
        f"{fingerprint}|{dggs}|r{resolution}|p{parent_res}|c{cut}"
        f"|crs{source_crs}|cut{cut_crs}:{cut_units2}|s{spatial_sort}"
        + (f"|lt{linetrace_mode}" if linetrace_mode is not None else "")
    )

    from pyspark.sql import Observation

    m_prev = read_manifest(checkpoint_dir, "prepare")
    if m_prev and m_prev.get("fingerprint") == fp:
        # stage reuse: no action runs, so reuse the recorded metrics too
        prepared = spark.read.parquet(os.path.join(checkpoint_dir, "prepare", "data"))
        metrics = m_prev.get("metrics") or {}
    else:
        # input-feature count via observe(): piggybacks on the
        # prepare-stage write action instead of a separate full count
        # job over the inputs (SURVEY A6)
        obs_in = Observation()
        geoms = extract_geometries(docs).observe(obs_in, F.count(F.lit(1)).alias("n"))
        prepared = prepare(
            geoms,
            backend,
            cut,
            sort_method=spatial_sort,
            source_crs=source_crs,
            cut_crs=cut_crs,
            cut_threshold_units2=cut_units2,
        )
        prepared = stage_checkpoint(prepared, checkpoint_dir, "prepare", fp)
        n_geoms = int(obs_in.get["n"] or 0)
        # surviving-feature count: a column-pruned scan of the
        # materialized stage parquet (one column of the checkpoint, not
        # a pipeline recompute)
        n_kept = int(
            prepared.select(F.substring_index("part_uid", "#", 2).alias("f"))
            .distinct()
            .count()
        )
        metrics = drop_ratio_metric(n_geoms, n_kept, "prepare")
        m_cur = read_manifest(checkpoint_dir, "prepare")
        if m_cur is not None:
            m_cur["metrics"] = metrics
            with open(_manifest_path(os.path.join(checkpoint_dir, "prepare")), "w") as f:
                json.dump(m_cur, f, indent=2)

    partitions = index_kwargs.get("partitions")
    if spatial_sort != "none":
        # same hash-prefix shuffle as pipeline.index (range sampling over
        # a parquet stage is safe but still a second scan)
        nparts = partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        prepared = prepared.repartition(
            nparts,
            F.substring("sort_key", 1, 4),
            F.pmod(F.xxhash64("part_uid"), F.lit(8)),
        )
    elif partitions:
        prepared = prepared.repartition(partitions)
    cells = index_cells(prepared, backend, resolution)
    lines = cells.where(F.col("geom_type") == "LineString").dropDuplicates(["doc_id", "cell"])
    others = cells.where(F.col("geom_type") != "LineString")
    cells = others.unionByName(lines)
    cell_col = backend.col_name(resolution)
    parent_col = backend.col_name(parent_res)
    out = cells.select(F.col("cell").alias(cell_col), "doc_id").withColumn(
        parent_col, backend.parent_expr(F.col(cell_col), resolution, parent_res)
    )
    out = stage_checkpoint(out, checkpoint_dir, "cells", fp, metrics=metrics)

    if index_kwargs.get("compact"):
        out = compact_cells_df(out, backend, resolution, parent_res, cell_col)
        out = out.withColumn(parent_col, backend.parent_expr(F.col(cell_col), resolution, parent_res))
        out = stage_checkpoint(out, checkpoint_dir, "compacted", fp)

    spans_df = None
    keep_spans = index_kwargs.get("keep_spans")
    if keep_spans == "exploded":
        from vector2dggs_spark.operators.spans import explode_spans

        spans_df = explode_spans(docs)
    elif keep_spans:
        # keep-attributes analog — joined AFTER the checkpointed stages so
        # the materialized cell table stays narrow (pipeline.index parity)
        out = out.join(docs, "doc_id", "left")

    return CheckpointedRun(
        cells=out,
        manifests={
            s: read_manifest(checkpoint_dir, s)
            for s in ("prepare", "cells", "compacted")
            if read_manifest(checkpoint_dir, s)
        },
        spans=spans_df,
    )
