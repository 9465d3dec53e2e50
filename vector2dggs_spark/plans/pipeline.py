"""The end-to-end indexing pipeline — Spark restatement of the
reference's ``common.index`` (``/root/reference/vector2dggs/common.py:780-868``).

One linear DataFrame plan (SURVEY.md §3.1):

    documents ── extract geometry spans (native posexplode/filter)
      ─ prepare  (one mapInPandas: parse → explode → antimeridian → katana)
      ─ spatial repartition (SFC sort key — O1/O2)
      ─ index    (one mapInPandas: polyfill/linetrace/point → exploded cells)
      ─ line dedup (dropDuplicates — O5)
      ─ parent column (NATIVE expr: substring / bit math — C4/C8/C16)
      ─ [compaction: groupBy(doc).applyInPandas — A2]
      ─ [keep_spans: re-join spans by doc_id — keep-attributes analog]
      ─ repartition(parent) → write.partitionBy(parent) (S6/O3, one file
        per parent dir replaces the reference's merge pass S8)

Every reference thread/process/disk boundary is a Spark shuffle or a
narrow Arrow UDF stage; the driver never touches row data.
"""
from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import Backend, get_backend
from vector2dggs_spark.operators.compaction import compact_cells_df
from vector2dggs_spark.operators.polyfill import index_cells
from vector2dggs_spark.operators.prepare import prepare
from vector2dggs_spark.sources.documents import extract_geometries


@dataclass
class IndexResult:
    cells: DataFrame
    backend: Backend
    resolution: int
    parent_res: int
    cell_col: str
    parent_col: str
    # keep_spans="exploded": flat (doc_id, span_idx, kind, text,
    # media_ref, offset) companion — payload stays out of the cell join
    # and scans of it are column-pruned (operators/spans.py)
    spans: DataFrame | None = None


def resolve_backend(dggs: str, linetrace_mode: str | None = None) -> Backend:
    """get_backend + optional per-call LineString-traversal override
    ("astar" = reference parity, "supercover" = every crossed cell —
    q40's oracle-exact mode); copies the instance so the registry
    singleton (shared across concurrent pipelines) is never mutated.
    Shared by ``index`` and ``index_checkpointed``."""
    backend = get_backend(dggs)
    if linetrace_mode is None:
        return backend
    if not hasattr(type(backend), "linetrace_mode"):
        raise ValueError(
            f"backend {dggs!r} has a single linetrace algorithm; "
            "linetrace_mode is only configurable for geohash"
        )
    if linetrace_mode not in ("astar", "supercover"):
        raise ValueError(f"unknown linetrace_mode {linetrace_mode!r}")
    import copy

    backend = copy.copy(backend)
    backend.linetrace_mode = linetrace_mode
    return backend


def check_resolutions(backend: Backend, resolution: int, parent_res: int) -> None:
    """reference common.py:62-66."""
    if not (backend.min_res <= resolution <= backend.max_res):
        raise ValueError(
            f"resolution {resolution} out of range "
            f"[{backend.min_res}, {backend.max_res}] for {backend.name}"
        )
    if parent_res >= resolution:
        raise ValueError(
            f"parent resolution {parent_res} must be less than resolution {resolution}"
        )


def index(
    spark: SparkSession,
    docs: DataFrame,
    dggs: str = "geohash",
    resolution: int = 6,
    parent_res: int | None = None,
    compact: bool = False,
    keep_spans: bool | str = False,
    cut_threshold_deg2: float | None = None,
    spatial_sort: str = "geohash",
    partitions: int | None = None,
    source_crs=None,
    cut_crs=None,
    cut_threshold_units2: float | None = None,
    linetrace_mode: str | None = None,
) -> IndexResult:
    """documents (doc_id, spans) -> cell table
    (``{dggs}_{res:02}``, doc_id[, spans]) with parent secondary index.

    ``cut_threshold_deg2``: None → backend default (one parent-cell bbox,
    the reference's area-table default G2); 0 disables bisection (`-c 0`).
    ``spatial_sort``: 'geohash' | 'morton' | 'hilbert' | 'none' (O1 —
    the reference's --spatial_sorting choices).
    ``keep_spans``: True joins the full payload onto every cell row
    (reference keep-attributes); "exploded" instead returns a flat
    column-prunable companion on ``IndexResult.spans`` (scale path —
    operators/spans.py).
    ``source_crs``: EPSG code of the span WKT coordinates (reprojected
    to 4326 during prepare — reference G1/G5).  ``cut_crs`` +
    ``cut_threshold_units2``: run katana in a projected CRS with the
    threshold in CRS units² (reference ``--cut_crs``; defaults to the
    backend threshold converted to m² when only ``cut_crs`` is given).
    """
    backend = resolve_backend(dggs, linetrace_mode)
    if parent_res is None:
        parent_res = backend.default_parent_res(resolution)
    check_resolutions(backend, resolution, parent_res)
    if cut_threshold_deg2 is None:
        cut_threshold_deg2 = backend.default_cut_threshold_deg2(parent_res)
    if cut_crs is not None and cut_threshold_units2 is None:
        # degree threshold -> meters² (the role of the reference's
        # DEFAULT_AREA_THRESHOLD_M2 table, constants.py:183)
        cut_threshold_units2 = cut_threshold_deg2 * (111_320.0**2)
    # fail fast on unsupported CRS codes at plan time, not inside an
    # Arrow worker at action time
    for code in (source_crs, cut_crs):
        if code not in (None, 4326, "EPSG:4326"):
            from vector2dggs_spark.geometry.crs import get_crs

            get_crs(code)

    if spatial_sort not in ("geohash", "morton", "hilbert", "none"):
        raise ValueError(f"unknown spatial_sort {spatial_sort!r}")
    geoms = extract_geometries(docs)

    native_points = None
    encoded = None
    if source_crs in (None, 4326, "EPSG:4326"):
        # POINT spans (the dominant class at web scale) never leave the
        # JVM when the backend offers a native encode (Backend.
        # native_point_cells: bit-arithmetic SQL for geohash, layered
        # HEALPix projection for rHP; H3/S2/A5 return None — H3's
        # layered-SQL formulation measured 5x SLOWER than its Arrow
        # numpy kernel, see the hook's docstring, so those backends
        # keep their points on the Arrow path below).  The two branches
        # partition the rows, so no work is duplicated.
        from vector2dggs_spark.operators.prepare import _POINT_RE

        pat = _POINT_RE.strip("^$")
        is_point = F.col("wkt").isNotNull() & F.col("wkt").rlike(_POINT_RE)
        pts = (
            geoms.where(is_point)
            .select(
                "doc_id",
                "span_idx",
                F.regexp_extract("wkt", pat, 1).cast("double").alias("lon"),
                F.regexp_extract("wkt", pat, 2).cast("double").alias("lat"),
            )
        )
        encoded = backend.native_point_cells(
            pts, "lat", "lon", resolution, ["doc_id", "span_idx"], out="cell"
        )
    if encoded is not None:
        native_points = encoded.select(
            "doc_id",
            F.concat_ws("#", "doc_id", F.col("span_idx").cast("string"), F.lit("0"), F.lit("0")).alias("part_uid"),
            F.lit("Point").alias("geom_type"),
            "cell",
        )
        geoms = geoms.where(~F.coalesce(F.col("wkt").rlike(_POINT_RE), F.lit(False)))

    prepared = prepare(
        geoms,
        backend,
        cut_threshold_deg2,
        sort_method=spatial_sort,
        source_crs=source_crs,
        cut_crs=cut_crs,
        cut_threshold_units2=cut_threshold_units2,
    )

    if spatial_sort != "none":
        # spatially-coherent batches for the polyfill stage (reference
        # dask spatial_shuffle, O1) via HASH partitioning on a coarse
        # prefix of the SFC key.  repartitionByRange would be the exact
        # analog but its range sampling EXECUTES THE ARROW PREPARE STAGE
        # A SECOND TIME (UDF stages cannot be column-pruned for the
        # sampling pass) — measured as >half the pipeline wall time.
        # The 4-char prefix groups ~0.2°-scale blocks: same locality for
        # the vectorized polyfill batches, one shuffle, no resample.
        nparts = partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        # second key: deterministic splitter WITHIN a block, so one dense
        # ~0.2° block (urban data at 1000× scale) cannot pin an entire
        # Arrow task; locality per partition is preserved (all rows still
        # share the block prefix).  Splitter cardinality scales with the
        # partition count (8x nparts ≈ the guide's 20-100x more distinct
        # keys than partitions, §2.5): the r05 constant 8 left only
        # n_blocks x 8 keys and measured a 40x row imbalance across
        # polyfill tasks at bench scale (790 vs 19 rows; stage 1.07 s ->
        # 0.82 s with the scaled splitter, OPTIMIZATION_r06.md), and a
        # single dense block at cluster scale needs >= ~8 keys per
        # partition to spread regardless of block count.
        prepared = prepared.repartition(
            nparts,
            F.substring("sort_key", 1, 4),
            F.pmod(F.xxhash64("part_uid"), F.lit(8 * nparts)),
        )
    elif partitions:
        prepared = prepared.repartition(partitions)

    cells = index_cells(prepared, backend, resolution)

    # cross-part line dedup: (cell, feature) keep-first (O5).  Poly/point
    # rows keep duplicates across parts, exactly like the reference (only
    # linestring sub-results are deduped — h3vectorindexer.py:39).
    # Implemented as ONE dropDuplicates with a conditional key instead of
    # filter+union, which would recompute the whole upstream (scan + UDF
    # stages) twice — a 2x waste at scale.  Within a part, cells are
    # already unique for every geometry type, so keying non-line rows by
    # part_uid makes the dedup a no-op for them while line rows (keyed by
    # a constant) dedup across all their parts.
    # Applied BEFORE the native-point union: native POINT rows can never
    # be LineStrings, so keeping them out of the dedup spares the
    # dominant web-scale class its only shuffle (pure map-side plan).
    dedup_key = F.when(F.col("geom_type") == "LineString", F.lit("__line__")).otherwise(
        F.col("part_uid")
    )
    cells = cells.withColumn("__dk", dedup_key).dropDuplicates(
        ["doc_id", "__dk", "cell"]
    ).drop("__dk")

    if native_points is not None:
        cells = cells.unionByName(native_points)

    cell_col = backend.col_name(resolution)
    parent_col = backend.col_name(parent_res)
    out = cells.select(
        F.col("cell").alias(cell_col),
        "doc_id",
    ).withColumn(parent_col, backend.parent_expr(F.col(cell_col), resolution, parent_res))

    if compact:
        out = compact_cells_df(out, backend, resolution, parent_res, cell_col)
        # recompute parent for relabeled (coarser) cells: a compacted cell
        # is never coarser than parent_res, so the prefix/bit parent stays
        # valid — but lengths differ for prefix backends, so re-derive.
        out = out.withColumn(parent_col, backend.parent_expr(F.col(cell_col), resolution, parent_res))

    spans_df = None
    if keep_spans == "exploded":
        # scale path for wide-media corpora: the payload never enters
        # the cell join; consumers join/scan the flat companion with
        # real column pruning (operators/spans.py)
        from vector2dggs_spark.operators.spans import explode_spans

        spans_df = explode_spans(docs)
    elif keep_spans:
        # keep-attributes analog (reference common.py:629-631): every
        # (cell, doc) row carries the document's full span sequence.
        out = out.join(docs, "doc_id", "left")

    return IndexResult(
        out, backend, resolution, parent_res, cell_col, parent_col, spans_df
    )


AUTO_SINGLE_FILE_ROW_CAP = 20_000_000  # per-parent rows above which one
# file per dir would serialize a hot cell through a single write task


def write_partitioned(
    result: IndexResult,
    output: str,
    compression: str = "snappy",
    overwrite: bool = False,
    single_file_per_partition: bool | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Hive-partitioned Parquet sink (S6 + O3; replaces the reference's
    per-directory merge pass S8 by construction).

    ``single_file_per_partition``: True mirrors the reference's merged
    layout exactly (one file per parent dir); False lets tasks write in
    parallel with ``max_records_per_file`` bounding file sizes.  The
    default (None) AUTO-FLIPS: merged layout while the largest parent
    cell stays under AUTO_SINGLE_FILE_ROW_CAP rows, parallel layout
    above it — so the reference-parity default cannot serialize one hot
    parent through a single task at scale (VERDICT r01 #6).

    The auto probe (a ``groupBy(parent).count()`` max) runs ONLY when
    ``result.cells`` is already marked for caching (the CLI path): then
    it costs one cached-scan aggregate and the write reuses the cache.
    For an uncached plan the probe would execute the whole pipeline
    (scan + Arrow prepare + polyfill) twice (ADVICE r02 medium), so the
    default resolves to the parallel layout with a row cap — always
    safe, exactly one job at any scale.
    """
    df = result.cells
    if single_file_per_partition is None:
        lvl = df.storageLevel
        if lvl.useMemory or lvl.useDisk:
            top = (
                df.groupBy(result.parent_col)
                .count()
                .agg(F.max("count").alias("m"))
                .first()
            )
            single_file_per_partition = int(top["m"] or 0) <= AUTO_SINGLE_FILE_ROW_CAP
        else:
            single_file_per_partition = False
        if not single_file_per_partition and max_records_per_file is None:
            max_records_per_file = AUTO_SINGLE_FILE_ROW_CAP
    if single_file_per_partition:
        df = df.repartition(F.col(result.parent_col)).sortWithinPartitions(
            result.cell_col
        )
    writer = df.write.mode("overwrite" if overwrite else "errorifexists")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.option("compression", compression).partitionBy(result.parent_col).parquet(output)
