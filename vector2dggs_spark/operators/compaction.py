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
    (points dominate: 1 cell/feature) the Python stage only ever sees
    the small fraction of features with dense cell sets.

    The Python stage is ``mapInPandas`` over the window's existing
    doc-hash partitioning (plus a local sort for contiguity), NOT
    ``groupBy().applyInPandas``: grouped-map invokes the UDF once per
    GROUP with one Arrow batch each, measured ~9 s for an IDENTITY
    function over 10k ~12-row groups at local[32] — per-group overhead
    dominated the q41/q59 compaction pipelines.  Here the kernel runs
    once per ~10k-row Arrow batch instead; features are kept intact
    across batch boundaries by sorting each partition on ``id_col`` and
    carrying the boundary feature's rows into the next batch (memory is
    O(batch + largest feature), same bound as grouped-map).  No new
    shuffle: the window already hash-partitioned rows by ``id_col``."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    schema = cells.schema
    col_order = [f.name for f in schema.fields]
    min_sib = getattr(backend, "min_siblings", 2)

    counted = cells.withColumn("__n", F.count("*").over(W.partitionBy(id_col)))
    small = counted.where(F.col("__n") < min_sib).drop("__n")
    big = counted.where(F.col("__n") >= min_sib).drop("__n")

    def run(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            tail = ids == ids[-1]  # the (possibly batch-straddling) last doc
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield compact_group(
                    body, backend, res, parent_res, cell_col, id_col, col_order
                )
        if carry is not None and len(carry):
            yield compact_group(
                carry, backend, res, parent_res, cell_col, id_col, col_order
            )

    compacted = big.sortWithinPartitions(id_col).mapInPandas(run, schema=schema)
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

    Handles one or many features per call (grouped by id upstream).

    One pass over numpy row positions instead of per-feature DataFrame
    slicing: the r05 form built grp/isin/concat frames PER FEATURE
    (~1 ms of pandas machinery each — 10.8 s of the q41 kernel at 10k
    features, vs 0.25 s of actual compact() work).  Row order, values
    and dtypes are identical: per feature, relabeled rows first then
    kept rows, features in order of first appearance, rows in input
    order within each — exactly the old concat([relabel, keep]) per
    ``groupby(sort=False)`` group."""
    import numpy as np

    if not len(pdf):
        return pdf.iloc[0:0][col_order]
    cells_arr = pdf[cell_col].to_numpy()
    codes, _ = pd.factorize(pdf[id_col], sort=False)  # appearance order
    order = np.argsort(codes, kind="stable")
    counts = np.bincount(codes)
    bounds = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])

    out_pos: list[int] = []
    relabel_at: list[int] = []  # positions into out_pos
    relabel_val: list[str] = []
    for g in range(len(counts)):
        idx = order[bounds[g]:bounds[g + 1]]
        vals = cells_arr[idx]
        original = set(vals)
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
        if compressable:
            # coarse cell -> its designated child at res; relabel that row
            mapping = {backend.designated_child(c, res): c for c in compressable}
            for p, v in zip(idx, vals):
                if v in mapping:
                    relabel_at.append(len(out_pos))
                    relabel_val.append(mapping[v])
                    out_pos.append(p)
        for p, v in zip(idx, vals):
            if v in uncompressable:
                out_pos.append(p)
    out = pdf.iloc[out_pos].reset_index(drop=True)
    if relabel_at:
        new_cells = out[cell_col].to_numpy().copy()
        new_cells[relabel_at] = relabel_val
        out[cell_col] = new_cells
    return out[col_order]
