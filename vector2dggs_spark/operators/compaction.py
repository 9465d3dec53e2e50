"""Cell-set compaction with a resolution floor — grouped-map pandas UDF.

Replicates the reference's ``compaction_common`` semantics exactly
(``/root/reference/vector2dggs/indexers/vectorindexer.py:124-196``):

1. per feature, compact its full cell set (complete-sibling merge),
2. re-expand any resulting cell coarser than ``parent_res`` into its
   children at ``parent_res`` (``_enforce_resolution_floor``,
   vectorindexer.py:105-122),
3. *uncompressable* rows (cell survived compaction) pass through,
4. each *compressable* coarse cell replaces exactly ONE original row —
   the row holding its designated child at ``res`` (geohash: '0'-padded
   child, rHP: center '4'-child, H3: center child), carrying that row's
   attributes; all other fine rows under the coarse cell are DROPPED
   (row count shrinks — the reference's semantic trap, SURVEY.md A2).

Features are compacted independently: overlapping features may emit the
same cell twice (reference README.md:127).  Spark-side this is a single
``groupBy(doc_id).applyInPandas`` — doc_id keys are high-cardinality and
uniform, so the shuffle is skew-free at any scale.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from vector2dggs_spark.dggs import Backend


def compact_cells_df(
    cells: DataFrame,
    backend: Backend,
    res: int,
    parent_res: int,
    cell_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Compaction over the (id, cell, ...) frame; schema-preserving.

    Fast path: a feature with fewer cells than one complete sibling set
    (``backend.min_siblings``) can never compact — those rows bypass the
    Python stage entirely via a JVM-side window count, so at web scale
    (points dominate: 1 cell/feature) the grouped-map UDF only ever sees
    the small fraction of features with dense cell sets."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    schema = cells.schema
    col_order = [f.name for f in schema.fields]
    min_sib = getattr(backend, "min_siblings", 2)

    counted = cells.withColumn("__n", F.count("*").over(W.partitionBy(id_col)))
    small = counted.where(F.col("__n") < min_sib).drop("__n")
    big = counted.where(F.col("__n") >= min_sib).drop("__n")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return compact_group(pdf, backend, res, parent_res, cell_col, id_col, col_order)

    compacted = big.groupBy(id_col).applyInPandas(run, schema=schema)
    return compacted.unionByName(small)


def compact_group(
    pdf: pd.DataFrame,
    backend: Backend,
    res: int,
    parent_res: int,
    cell_col: str,
    id_col: str,
    col_order: list[str],
) -> pd.DataFrame:
    """Pandas kernel — reference vectorindexer.py:124-196 re-expressed.

    Handles one or many features per call (grouped by id upstream)."""
    out_frames = []
    for _, grp in pdf.groupby(id_col, sort=False):
        original = set(grp[cell_col])
        compacted = set(backend.compact(original))
        # resolution floor (vectorindexer.py:105-122)
        floored: set[str] = set()
        for cell in compacted:
            if backend.get_resolution(cell) < parent_res:
                floored.update(backend.children_at_res(cell, parent_res))
            else:
                floored.add(cell)
        uncompressable = original & floored
        compressable = floored - original
        keep = grp[grp[cell_col].isin(uncompressable)]
        if compressable:
            # coarse cell -> its designated child at res; relabel that row
            mapping = {backend.designated_child(c, res): c for c in compressable}
            relabel = grp[grp[cell_col].isin(mapping)].copy()
            relabel[cell_col] = relabel[cell_col].map(mapping)
            out_frames.append(pd.concat([relabel, keep]))
        else:
            out_frames.append(keep)
    if not out_frames:
        return pdf.iloc[0:0][col_order]
    return pd.concat(out_frames, ignore_index=True)[col_order]
