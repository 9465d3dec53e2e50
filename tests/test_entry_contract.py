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


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_multiprobe_ann_lifts_recall_over_single_bucket(spark, duck):
    """q29 probes the 9 Hamming<=1 buckets: its top-k must recall
    strictly more of the brute-force truth than single-bucket q21 on
    this fixture (mechanism check; absolute recall is data-dependent)."""
    brute = duck.execute("""
WITH d AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
q AS (SELECT vec_id AS query_id, de FROM d WHERE vec_id < 10),
s AS (SELECT q.query_id, d.vec_id,
      list_reduce([q.de[i]*d.de[i] for i in range(1, len(q.de)+1)], (a,b)->a+b)
      / (sqrt(list_reduce([q.de[i]*q.de[i] for i in range(1, len(q.de)+1)], (a,b)->a+b))
       * sqrt(list_reduce([d.de[i]*d.de[i] for i in range(1, len(d.de)+1)], (a,b)->a+b))) AS cs
      FROM q JOIN d ON q.query_id != d.vec_id)
SELECT query_id, vec_id FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, vec_id) rnk
  FROM s) WHERE rnk <= 5
""").fetchall()
    bset = set(map(tuple, brute))
    one = {(r["query_id"], r["vec_id"])
           for r in QUERIES["q21_ann_ivf_bucketed"][0](spark, SF_DIR).collect()}
    multi = {(r["query_id"], r["vec_id"])
             for r in QUERIES["q29_ann_ivf_multiprobe"][0](spark, SF_DIR).collect()}
    assert len(multi & bset) > len(one & bset)


@pytest.mark.parametrize(
    "name", ["q19_simhash_pairs", "q26_embedding_near_dup_lsh", "q12_minhash_lsh_pairs",
             "q29_ann_ivf_multiprobe", "q32_embedding_near_dup_arrow",
             "q49_repeated_window_dedup"]
)
def test_dedup_candidate_plans_are_equi_joins(spark, name):
    """VERDICT r02 #1/#2: LSH candidate generation must never execute as
    an all-pairs plan — the banded equi-join is the 100-TB shape."""
    fn, _ = QUERIES[name]
    plan = _executed_plan(fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: all-pairs plan"
    assert "CartesianProduct" not in plan, f"{name}: cartesian plan"


def test_cluster_size_is_not_a_window_over_cluster_id(spark):
    """VERDICT r04 #2: cluster sizes must come from a map-side-combinable
    groupBy joined back, never ``count(*) OVER (PARTITION BY
    cluster_id)`` — a mega-cluster (boilerplate component) would
    otherwise materialize in a single window task at corpus scale."""
    fn, _ = QUERIES["q42_dedup_clusters"]
    plan = _executed_plan(fn(spark, SF_DIR))
    for line in plan.splitlines():
        assert not ("Window" in line and "cluster_id" in line), line
    assert "HashAggregate" in plan  # sizes via partial-aggregating groupBy


def test_range_join_never_broadcasts_the_exploded_side(spark):
    """Job F's scale find: Catalyst's size estimate for the exploded
    query side predates the (2r+1)² grid-disk explode, so the default
    plan auto-broadcast a multi-million-row side (1.31x 8→32 measured).
    The operator must plan a shuffled hash join unless the caller opts
    into broadcast_queries."""
    fn, _ = QUERIES["q63_range_join"]
    plan = _executed_plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    # square-grid backends take the fully-native path: packed-coordinate
    # int64 join keys and a codegen Chebyshev disk — zero Python
    # anywhere in the operator (Backend.native_point_keys/disk_keys)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, marker


def test_dsir_lambda_table_broadcasts(spark):
    """q61: the per-bucket λ table is exactly 1024 rows, so the
    doc-gram → λ join must be a broadcast hash join; the only allowed
    nested-loop is the single-row totals CROSS JOIN (the q43/q46
    scalar-stats pattern), and nothing may go cartesian."""
    fn, _ = QUERIES["q61_dsir_importance"]
    plan = _executed_plan(fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # 1-row totals only


def test_lsh_near_dup_subset_and_recall_vs_brute_force(spark):
    """q26 (banded) ⊆ q20 (brute force) with pinned fixture recall: the
    exact-cosine post-filter guarantees no false positives; banding loses
    only pairs that share no band (theory: 1-(1-p^4)^16, p = 1-θ/π)."""
    lsh, _ = QUERIES["q26_embedding_near_dup_lsh"]
    brute, _ = QUERIES["q20_embedding_near_dup"]
    got = {(r["vec_a"], r["vec_b"]) for r in lsh(spark, SF_DIR).collect()}
    exp = {(r["vec_a"], r["vec_b"]) for r in brute(spark, SF_DIR).collect()}
    assert got <= exp
    assert len(got) >= 0.8 * len(exp), f"recall {len(got)}/{len(exp)} below pinned 0.8"


def test_contract_shape():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 14


def test_delta_dedup_exact_tier(spark):
    """q67's 'exact' tier never fires on the synthetic corpus (it has
    no FULL-TEXT duplicates — its planted dups are segment-level), so
    pin it on a constructed corpus: an incoming doc whose text appears
    verbatim in the existing corpus must be 'exact' (taking priority
    over 'near', which its identical signature also triggers), and the
    Spark and DuckDB renderings must agree on the constructed corpus
    too."""
    import pandas as pd

    from vector2dggs_spark.entrypoints import _delta_dedup_sql

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta epsilon",   # incoming, exact dup of 2
            "alpha beta gamma delta epsilon",   # existing
            "one two three four five six",      # incoming, unique
            "seven eight nine ten eleven",      # existing
        ],
        "lang": ["en"] * 4,
        "source": ["src0", "src9", "src1", "src9"],
        "n_chars": [30, 30, 27, 26],
    })
    spark.createDataFrame(docs).createOrReplaceTempView("documents")
    got = {r.doc_id: r.verdict
           for r in spark.sql(_delta_dedup_sql("spark")).collect()}
    assert got == {1: "exact", 3: "keep"}

    con = duckdb.connect()
    con.register("documents", docs)
    exp = dict(con.execute(_delta_dedup_sql("duckdb")).fetchall())
    assert exp == got


def test_mixture_rebalance_hits_exact_quotas(spark, duck):
    """q66's contract: per-source kept counts equal the integer quotas
    EXACTLY (min(count_s, (w_s * (N div 2)) div sum(w))), and the
    global ranks within a source are a permutation of 1..count_s — the
    two-level (source, bucket) rank composes to a correct global rank
    (the property that lets the exact-quota selection avoid a
    whole-source window partition at scale)."""
    from vector2dggs_spark.entrypoints import load_views

    load_views(spark, SF_DIR)
    fn, _ = QUERIES["q66_mixture_rebalance"]
    pdf = fn(spark, SF_DIR).toPandas()
    for src, grp in pdf.groupby("source"):
        assert (grp.kept == 1).sum() == grp.quota.iloc[0]
        assert sorted(grp.grank) == list(range(1, len(grp) + 1)), src
        # kept docs are exactly the quota smallest global ranks
        assert set(grp[grp.kept == 1].grank) == set(range(1, grp.quota.iloc[0] + 1))
