"""Cell-ID joins — the north-rule extensions built on reference semantics
(SURVEY.md §2.6).  The reference performs no joins itself; its output is
"designed to be joined on the DGGS cell ID" (README.md:121-123).  All
joins here are pure DataFrame + Arrow-UDF code: no per-row Python, no
driver-side row loops.

* J1 ``cell_join``        — spatial equi-join on cell ID (+ salting)
* J2 ``broadcast_compact_join`` — point ∈ compacted polygon cell set via
                             ancestor-chain explode + broadcast
* J3 ``knn``              — k-nearest-neighbors via cell-ring expansion
* J4 ``assign_tiles``     — raster↔vector tile assignment on parent cell
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import Backend
from vector2dggs_spark.operators.udfs import grid_disk_udf, point_to_cell_udf
from vector2dggs_spark.sources.documents import extract_media, tile_centers


# --------------------------------------------------------------------- J1
def cell_join(
    left: DataFrame,
    right: DataFrame,
    cell_col: str,
    how: str = "inner",
    broadcast_right: bool = False,
    salt: int | None = None,
) -> DataFrame:
    """Spatial join of two cell tables on the shared cell-ID column.

    Both sides must be indexed at the same resolution (J1).  For skewed
    cell distributions (hot parent cells), pass ``salt=N``: the left side
    gets a random salt 0..N-1 and the right side is replicated N ways, so
    one hot cell fans across N tasks (north-rule skew handling; AQE
    skew-join is also on by default in sessions from ``get_spark``).
    """
    if broadcast_right:
        return left.join(F.broadcast(right), cell_col, how)
    if salt:
        lk = left.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
        rk = right.crossJoin(
            F.broadcast(
                left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
            )
        )
        out = lk.join(rk, [cell_col, "__salt"], how).drop("__salt")
        return out
    return left.join(right, cell_col, how)


# --------------------------------------------------------------------- J2
def ancestor_chain(backend: Backend, cell: Column, res: int, parent_res: int) -> Column:
    """array<string> of [cell@res, parent@res-1, …, parent@parent_res] —
    native exprs only (prefix substring / bit math per backend)."""
    return F.array(
        *[backend.parent_expr(cell, res, r) for r in range(res, parent_res - 1, -1)]
    )


def broadcast_compact_join(
    point_cells: DataFrame,
    compacted_polys: DataFrame,
    backend: Backend,
    res: int,
    parent_res: int,
    cell_col: str,
    point_id: str = "doc_id",
    poly_id: str = "poly_id",
) -> DataFrame:
    """(point, polygon) containment pairs against *compacted* polygon cell
    sets (mixed resolutions ≥ parent_res).

    The point side explodes its ancestor chain (res → parent_res, native
    substring/bit exprs); the compacted side is broadcast.  A point
    matches a polygon iff its cell or any ancestor equals a compacted
    cell — exactly the membership semantics the compaction preserves.
    Returns distinct (point_id, poly_id).
    """
    pts = point_cells.select(
        point_id,
        F.explode(
            ancestor_chain(backend, F.col(cell_col), res, parent_res)
        ).alias("__anc"),
    )
    polys = compacted_polys.select(poly_id, F.col(cell_col).alias("__anc"))
    return pts.join(F.broadcast(polys), "__anc").select(point_id, poly_id).distinct()


# --------------------------------------------------------------------- J3
def sq_degree_dist(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Planar squared distance in degrees² — the kNN ranking metric.

    Chosen over haversine for the fixture window (sub-degree extents) so
    the DuckDB oracle reproduces ranks bit-for-bit; swap in haversine for
    global corpora."""
    return (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)


def knn(
    queries: DataFrame,
    targets: DataFrame,
    backend: Backend,
    res: int,
    k: int,
    query_id: str = "query_id",
    target_id: str = "target_id",
    max_ring: int = 64,
) -> DataFrame:
    """Exact k-nearest-neighbors via cell-ring expansion (J3).

    ``queries``/``targets``: (id, lat, lon).  Both sides are indexed to
    cells at ``res``; ring r joins each pending query's grid-disk(r)
    against the target cells; a query finishes when its k-th candidate
    distance is covered by the backend's ring guarantee radius
    (``Backend.ring_guarantee_deg``: tight Chebyshev bound for the
    square geohash grid, conservative (r−1)·0.8·width for hex grids), so
    the result is exact for every backend.  Driver loops over doubling
    ring radii; all data movement is joins — no collected rows.

    Returns (query_id, target_id, dist_sq, rank) with rank 1..k by
    (dist_sq, target_id) — deterministic under ties.
    """
    cell_udf = point_to_cell_udf(backend, res)
    q = queries.select(
        F.col(query_id).alias("__qid"),
        F.col("lat").alias("__qlat"),
        F.col("lon").alias("__qlon"),
    ).withColumn("__qcell", cell_udf("__qlat", "__qlon"))
    t = targets.select(
        F.col(target_id).alias("__tid"),
        F.col("lat").alias("__tlat"),
        F.col("lon").alias("__tlon"),
    ).withColumn("__cell", cell_udf("__tlat", "__tlon")).cache()

    pending = q.cache()
    found: DataFrame | None = None
    r = 1
    while r <= max_ring:
        disk = grid_disk_udf(backend, res, r)
        cand = (
            pending.withColumn("__cell", F.explode(disk("__qcell")))
            .join(t, "__cell")
            .select(
                "__qid",
                "__tid",
                sq_degree_dist(
                    F.col("__qlat"), F.col("__qlon"), F.col("__tlat"), F.col("__tlon")
                ).alias("dist_sq"),
            )
        )
        ranked = cand.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("__qid").orderBy(F.col("dist_sq"), F.col("__tid"))
            ),
        ).where(F.col("rank") <= k)
        guarantee = backend.ring_guarantee_deg(res, r) ** 2
        stats = ranked.groupBy("__qid").agg(
            F.count("*").alias("n"), F.max("dist_sq").alias("kth")
        )
        done_ids = stats.where((F.col("n") >= k) & (F.col("kth") <= guarantee)).select("__qid")
        newly_done = ranked.join(done_ids, "__qid")
        found = newly_done if found is None else found.unionByName(newly_done)
        pending = pending.join(done_ids, "__qid", "left_anti").cache()
        if pending.isEmpty():
            break
        r *= 2
    if pending is not None and not pending.isEmpty() and r > max_ring:
        # fallback: exhausted ring budget — take best-effort top-k found
        disk = grid_disk_udf(backend, res, max_ring)
        cand = (
            pending.withColumn("__cell", F.explode(disk("__qcell")))
            .join(t, "__cell")
            .select(
                "__qid",
                "__tid",
                sq_degree_dist(
                    F.col("__qlat"), F.col("__qlon"), F.col("__tlat"), F.col("__tlon")
                ).alias("dist_sq"),
            )
        )
        ranked = cand.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("__qid").orderBy(F.col("dist_sq"), F.col("__tid"))
            ),
        ).where(F.col("rank") <= k)
        found = ranked if found is None else found.unionByName(ranked)
    assert found is not None
    return found.select(
        F.col("__qid").alias(query_id),
        F.col("__tid").alias(target_id),
        "dist_sq",
        "rank",
    )


# --------------------------------------------------------------------- J4
def assign_tiles(
    cells: DataFrame,
    docs: DataFrame,
    backend: Backend,
    parent_res: int,
    parent_col: str,
) -> DataFrame:
    """Raster↔vector tile assignment: media tiles keyed by parent cell ↔
    vector cells keyed by parent cell (J4; partition-pruned by the Hive
    layout when ``cells`` is read from the partitioned sink).

    Returns (doc_id, cell table columns…, media_ref) for every vector
    cell row whose parent cell contains a media tile's center.
    """
    tiles = tile_centers(extract_media(docs)).select(
        "media_ref", F.col("tile_lat").alias("lat"), F.col("tile_lon").alias("lon")
    ).dropDuplicates(["media_ref"])
    cell_udf = point_to_cell_udf(backend, parent_res)
    tiles = tiles.select(
        "media_ref", cell_udf("lat", "lon").alias(parent_col)
    )
    return cells.join(F.broadcast(tiles), parent_col, "inner")
