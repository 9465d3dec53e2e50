"""Compaction-bounds parity suite — replicates the reference's exact
scenarios (`/root/reference/tests/classes/compaction.py:70-184`) against
our kernels and the Spark grouped-map operator."""
from itertools import product

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector2dggs_spark.dggs import get_backend
from vector2dggs_spark.dggs.geohash import ALPHABET
from vector2dggs_spark.operators.compaction import compact_group

DIGITS = "012345678"


class TestGeohashCompactionBounds:
    """parent_res=2, ancestor 's', cells = all grandchildren at res 3
    (compaction.py:77-122)."""

    parent_res = 2
    ancestor = "s"
    res = 3

    @pytest.fixture(scope="class")
    def backend(self):
        return get_backend("geohash")

    @pytest.fixture(scope="class")
    def cells(self):
        return {self.ancestor + a + b for a, b in product(sorted(ALPHABET), repeat=2)}

    def test_unbounded_compaction_would_exceed_parent_res(self, backend, cells):
        assert backend.compact(cells) == {self.ancestor}
        assert len(self.ancestor) < self.parent_res

    def test_children_at_res(self, backend):
        got = set(backend.children_at_res(self.ancestor, self.parent_res))
        assert got == {self.ancestor + a for a in ALPHABET}

    def test_floor_breaks_up_coarse_cells(self, backend):
        floored = set()
        for cell in backend.compact({self.ancestor}):
            if backend.get_resolution(cell) < self.parent_res:
                floored.update(backend.children_at_res(cell, self.parent_res))
            else:
                floored.add(cell)
        assert all(len(c) >= self.parent_res for c in floored)
        assert floored == {self.ancestor + a for a in ALPHABET}

    def test_compaction_respects_parent_res(self, backend, cells):
        dggs_col = f"geohash_{self.res:02}"
        pdf = pd.DataFrame(
            {"id": ["f1"] * len(cells), "attr": range(len(cells)), dggs_col: sorted(cells)}
        )
        out = compact_group(
            pdf, backend, self.res, self.parent_res, dggs_col, "id",
            ["id", "attr", dggs_col],
        )
        assert all(len(c) >= self.parent_res for c in out[dggs_col])
        # exact outcome: 32 rows, each a res-2 child of the ancestor,
        # relabeled from its designated '0'-padded child row
        assert sorted(out[dggs_col]) == sorted(self.ancestor + a for a in ALPHABET)
        designated = {self.ancestor + a + "0" for a in ALPHABET}
        attr_by_cell = dict(zip(pdf[dggs_col], pdf["attr"]))
        for _, row in out.iterrows():
            child = row[dggs_col] + "0"
            assert child in designated
            assert row["attr"] == attr_by_cell[child]


class TestRHPCompactionBounds:
    """parent_res=5, ancestor 'N0000', grandchildren at res 6
    (compaction.py:132-184)."""

    parent_res = 5
    ancestor = "N0000"
    res = 6

    @pytest.fixture(scope="class")
    def backend(self):
        return get_backend("rhp")

    @pytest.fixture(scope="class")
    def cells(self):
        return {self.ancestor + a + b for a, b in product(DIGITS, repeat=2)}

    def test_unbounded_compaction_would_exceed_parent_res(self, backend, cells):
        assert backend.compact(cells) == {self.ancestor}
        assert backend.get_resolution(self.ancestor) < self.parent_res

    def test_children_at_res(self, backend):
        got = set(backend.children_at_res(self.ancestor, self.parent_res))
        assert got == {self.ancestor + d for d in DIGITS}

    def test_compaction_respects_parent_res(self, backend, cells):
        dggs_col = f"rhp_{self.res:02}"
        pdf = pd.DataFrame(
            {"id": ["f1"] * len(cells), "attr": range(len(cells)), dggs_col: sorted(cells)}
        )
        out = compact_group(
            pdf, backend, self.res, self.parent_res, dggs_col, "id",
            ["id", "attr", dggs_col],
        )
        assert all(backend.get_resolution(c) >= self.parent_res for c in out[dggs_col])
        assert sorted(out[dggs_col]) == sorted(self.ancestor + d for d in DIGITS)
        # relabeled rows carried the center-'4' child's attributes
        attr_by_cell = dict(zip(pdf[dggs_col], pdf["attr"]))
        for _, row in out.iterrows():
            assert row["attr"] == attr_by_cell[row[dggs_col] + "4"]


def test_spark_compaction_operator(spark):
    """compact_cells_df: per-feature independence + row-shrink semantics
    + repeated cells across overlapping features (reference README.md:127)."""
    backend = get_backend("geohash")
    res, parent_res = 3, 2
    dggs_col = "geohash_03"
    kids_s = sorted(backend.children_at_res("s", 3))   # full cover -> compacts
    kids_partial = kids_s[:-1]                          # missing one -> mostly stays
    rows = [("f1", c) for c in kids_s] + [("f2", c) for c in kids_partial]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", dggs_col]))
    from vector2dggs_spark.operators.compaction import compact_cells_df

    out = compact_cells_df(df, backend, res, parent_res, dggs_col).toPandas()
    f1 = out[out.doc_id == "f1"][dggs_col]
    assert sorted(f1) == sorted("s" + a for a in ALPHABET)
    f2 = set(out[out.doc_id == "f2"][dggs_col])
    # f2: 31 complete siblings of 'sz*'-less tree compact to their parents,
    # the incomplete parent's 31 children stay at res 3
    assert all(len(c) >= parent_res for c in f2)
    incomplete_parent = kids_s[-1][:2]
    fine = {c for c in f2 if len(c) == 3}
    assert fine == {c for c in kids_partial if c.startswith(incomplete_parent)}
    coarse = {c for c in f2 if len(c) == 2}
    assert coarse == {"s" + a for a in ALPHABET if "s" + a != incomplete_parent}
    # overlapping features may repeat cells in the output
    both = set(f1) & coarse
    assert both


def test_spark_compaction_batch_boundary_carry(spark):
    """The mapInPandas compaction stage must keep a feature intact when
    its rows straddle Arrow batch boundaries: force tiny batches so
    every partition yields many batches, and check against the
    single-batch kernel ground truth."""
    backend = get_backend("geohash")
    res, parent_res = 3, 2
    dggs_col = "geohash_03"
    rows = []
    # 40 features, each a complete sibling set (32 cells) of a distinct
    # parent -> every feature compacts to exactly one coarse cell; with
    # 50-row batches every feature straddles at least one boundary
    parents = [a + b for a in "0123456789" for b in "0123"]
    for i, p in enumerate(parents):
        for c in sorted(backend.children_at_res(p, res)):
            rows.append((f"f{i:02d}", c))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", dggs_col]))
    from vector2dggs_spark.operators.compaction import compact_cells_df

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        out = compact_cells_df(df, backend, res, parent_res, dggs_col).toPandas()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = sorted(map(tuple, out[["doc_id", dggs_col]].itertuples(index=False)))
    exp = sorted((f"f{i:02d}", p) for i, p in enumerate(parents))
    assert got == exp
