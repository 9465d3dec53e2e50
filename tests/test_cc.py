"""Connected components (large-star/small-star) — near-dup cluster
identification.  Oracle in pytest: sequential union-find; the q42
contract row additionally pins it against a DuckDB recursive CTE."""
import random

import pytest

from tests.union_find import brute as _brute

from vector2dggs_spark.operators.cc import connected_components




def test_cc_matches_union_find_random_graphs(spark):
    rng = random.Random(5)
    for trial in range(4):
        n = rng.choice([20, 100, 250])
        m = rng.randint(1, n * 2)
        pairs = [
            (f"d{rng.randrange(n):03d}", f"d{rng.randrange(n):03d}")
            for _ in range(m)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        if not pairs:
            continue
        df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == _brute(pairs), trial


def test_cc_signature_folds_into_lazy_checkpoint(spark, monkeypatch):
    """VERDICT r04 #6: the fixpoint-signature aggregation is the action
    that MATERIALIZES the small-star checkpoint (lazy localCheckpoint),
    so a round runs two jobs' worth of eager work, not three.  AQE makes
    absolute job counts unpinnable (75+ sub-jobs per run measured), so
    this pins the mechanism: the initial and small-star checkpoints are
    lazy (eager=False), the large-star checkpoint eager (its consumer
    reads it twice)."""
    from vector2dggs_spark.plans import iteration

    calls = []
    orig = iteration.IterState.checkpoint

    def spy(self, df, eager=True):
        calls.append(eager)
        return orig(self, df, eager)

    monkeypatch.setattr(iteration.IterState, "checkpoint", spy)
    pairs = [(f"c{i:02d}", f"c{i+1:02d}") for i in range(12)]
    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    out = connected_components(df)
    got = {r["node"]: r["component"] for r in out.collect()}
    out.unpersist()
    assert got == _brute(pairs)
    assert calls[0] is False            # initial sym checkpoint: lazy
    rest = calls[1:]
    assert len(rest) >= 2 and len(rest) % 2 == 0
    assert all(rest[i] is True for i in range(0, len(rest), 2))   # large
    assert all(rest[i] is False for i in range(1, len(rest), 2))  # small


def test_cc_chain_converges_in_log_rounds(spark):
    """A 300-node path is the worst diameter case: label propagation
    would need 300 rounds; star alternation must converge within the
    max_iter=30 O(log n) bound."""
    chain = [(f"c{i:04d}", f"c{i+1:04d}") for i in range(300)]
    df = spark.createDataFrame(chain, "doc_a string, doc_b string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert set(got.values()) == {"c0000"}
    assert len(got) == 301


def test_cc_releases_iteration_state(spark):
    """All intermediate round checkpoints are freed; only the converged
    edge set (which backs the lazy result) stays pinned."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    pairs = [(f"x{i}", f"x{i+1}") for i in range(50)] + [("y0", "y1")]
    df = spark.createDataFrame(pairs, "doc_a string, doc_b string")
    out = connected_components(df)
    assert out.count() == 53
    after = jsc.getPersistentRDDs().size()
    assert after <= before + 1, f"cc leaked iteration state: {before} -> {after}"


def test_cc_empty_and_single_edge(spark):
    df = spark.createDataFrame([("a", "b")], "doc_a string, doc_b string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a"}
    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    assert connected_components(empty).count() == 0
