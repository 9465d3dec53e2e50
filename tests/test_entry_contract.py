"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle must match DuckDB row-for-row (order-insensitive,
column-name-sorted) at sf0.001; rows-only entries must return rows."""
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from vector2dggs_spark.entrypoints import QUERIES, TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(repr(v))  # exact double identity
    if hasattr(v, "as_py"):
        v = v.as_py()
    return v


def _canon(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=repr)


ORACLE_QUERIES = [n for n, (_, sql) in QUERIES.items() if sql is not None]
ROWS_ONLY = [n for n, (_, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    fn, sql = QUERIES[name]
    got = fn(spark, SF_DIR).toPandas()
    exp = duck.execute(sql).fetchdf()
    gcols, grows = _canon(got)
    ecols, erows = _canon(exp)
    assert gcols == ecols, f"{name}: column mismatch {gcols} vs {ecols}"
    assert len(grows) == len(erows), f"{name}: row count {len(grows)} vs {len(erows)}"
    mismatches = [i for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{grows[mismatches[0]]} vs {erows[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn, _ = QUERIES[name]
    df = fn(spark, SF_DIR)
    assert df.count() > 0
    assert df.schema  # stable schema


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 14
