"""Streaming cluster maintenance (incremental union-find state) — the
streaming twin of q42.  Oracle: after any prefix of batches, the
resolved state equals batch connected_components over the union of all
edges so far (component = min node id), regardless of how the stream
was split into batches."""
import os
import random

import pytest

from tests.union_find import brute as _brute

from vector2dggs_spark.streaming.cc_maintain import (
    CCMaintainProcessor,
    stream_cc_maintain,
)




def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "u string, v string")


def _resolved(proc, spark):
    return {r["node"]: r["component"]
            for r in proc.resolve(spark).collect()}


def test_cc_maintain_batch_parity_random_splits(spark, tmp_path):
    """Same edge set, three different batchings -> identical final
    clustering == the sequential union-find oracle, checked after EVERY
    batch prefix."""
    rng = random.Random(11)
    n = 120
    pairs = [(f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
             for _ in range(180)]
    pairs = [(a, b) for a, b in pairs if a != b]
    for trial, k in enumerate((1, 4, 9)):
        proc = CCMaintainProcessor(str(tmp_path / f"st{trial}"),
                                   n_state_buckets=8)
        step = -(-len(pairs) // k)
        seen = []
        for bi in range(k):
            chunk = pairs[bi * step:(bi + 1) * step]
            seen += chunk
            proc(_edges_df(spark, chunk), bi)
            assert _resolved(proc, spark) == _brute(seen), (trial, bi)


def test_cc_maintain_merges_components_across_batches(spark, tmp_path):
    """Clusters formed in separate batches merge when a bridging edge
    arrives later (the chain case per-pair logic gets wrong)."""
    proc = CCMaintainProcessor(str(tmp_path / "st"), n_state_buckets=4)
    proc(_edges_df(spark, [("a", "b")]), 0)
    proc(_edges_df(spark, [("c", "d")]), 1)
    assert _resolved(proc, spark) == {"a": "a", "b": "a", "c": "c", "d": "c"}
    proc(_edges_df(spark, [("b", "c")]), 2)
    assert _resolved(proc, spark) == {x: "a" for x in "abcd"}
    # and a later edge deep in the merged cluster stays a no-op
    proc(_edges_df(spark, [("d", "a")]), 3)
    assert _resolved(proc, spark) == {x: "a" for x in "abcd"}


def test_cc_maintain_incremental_state(spark, tmp_path):
    """A batch touching a few nodes rewrites ONLY the pnh partitions
    those upserts hash into; untouched partitions keep their exact file
    listing (the lsh_dedup incremental-state contract, applied to the
    union-find table)."""
    from pyspark.sql import functions as F

    st = str(tmp_path / "st")
    proc = CCMaintainProcessor(st, n_state_buckets=16)
    rng = random.Random(3)
    pairs = [(f"n{i:03d}", f"n{rng.randrange(120):03d}") for i in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]
    proc(_edges_df(spark, pairs), 0)
    parents = os.path.join(st, "parents")
    before = {p: sorted(os.listdir(os.path.join(parents, p)))
              for p in os.listdir(parents) if p.startswith("pnh=")}
    assert len(before) > 4  # spread over several buckets

    # batch 2: one fresh two-node component -> touches <= 2 buckets
    proc(_edges_df(spark, [("zz1", "zz2")]), 1)
    after = {p: sorted(os.listdir(os.path.join(parents, p)))
             for p in os.listdir(parents) if p.startswith("pnh=")}
    touched = {
        f"pnh={r['pnh']}"
        for r in spark.createDataFrame([("zz1",), ("zz2",)], "node string")
        .select(F.pmod(F.xxhash64("node"), F.lit(16)).cast("int").alias("pnh"))
        .collect()
    }
    untouched = set(before) - touched
    assert untouched
    for p in untouched:
        assert after[p] == before[p], p  # file listing unchanged
    assert _resolved(proc, spark)["zz2"] == "zz1"


def test_cc_maintain_crash_replay_converges(spark, tmp_path):
    """Crash between the state write and the marker write: the replay
    applies the batch against partially-updated state and must converge
    to the no-crash clustering (parent pointers only move toward
    smaller roots, so reapplication is idempotent)."""
    st = str(tmp_path / "st")
    proc = CCMaintainProcessor(st, n_state_buckets=8)
    proc(_edges_df(spark, [("a", "b"), ("c", "d"), ("e", "f")]), 0)

    class Crash(Exception):
        pass

    class CrashingProc(CCMaintainProcessor):
        def _write_marker(self, batch_id):
            raise Crash()

    bridge = [("b", "c"), ("f", "g")]
    crasher = CrashingProc(st, n_state_buckets=8)
    with pytest.raises(Crash):
        crasher(_edges_df(spark, bridge), 1)
    # replay with the healthy processor
    proc(_edges_df(spark, bridge), 1)
    exp = _brute([("a", "b"), ("c", "d"), ("e", "f")] + bridge)
    assert _resolved(proc, spark) == exp
    # full-replay of an applied batch is a marker no-op
    proc(_edges_df(spark, bridge), 1)
    assert _resolved(proc, spark) == exp


def test_cc_maintain_matches_q42_on_minhash_pairs(spark, tmp_path):
    """Integration with the real dedup pair graph: the q12 MinHash-LSH
    pairs streamed in three batches resolve to exactly the q42 batch
    clustering (connected_components over the full pair set)."""
    from vector2dggs_spark.entrypoints import QUERIES
    from vector2dggs_spark.operators.cc import connected_components

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    pairs_df = QUERIES["q12_minhash_lsh_pairs"][0](spark, sf)
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert pairs
    exp = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(pairs, "doc_a string, doc_b string")
        ).collect()
    }
    proc = CCMaintainProcessor(str(tmp_path / "st"), n_state_buckets=8)
    step = -(-len(pairs) // 3)
    for bi in range(3):
        chunk = [(str(a), str(b)) for a, b in pairs[bi * step:(bi + 1) * step]]
        if chunk:
            proc(_edges_df(spark, chunk), bi)
    got = _resolved(proc, spark)
    assert got == {str(k): str(v) for k, v in exp.items()}


def test_cc_maintain_rejects_changed_bucket_count(spark, tmp_path):
    """Round-5 code review: the bucket count is baked into the pnh
    partition layout; reopening existing state under a different count
    must fail loudly instead of silently prune-reading past rows."""
    st = str(tmp_path / "st")
    proc = CCMaintainProcessor(st, n_state_buckets=8)
    proc(_edges_df(spark, [("a", "b")]), 0)
    with pytest.raises(ValueError, match="n_state_buckets=8"):
        CCMaintainProcessor(st, n_state_buckets=16)
    proc2 = CCMaintainProcessor(st, n_state_buckets=8)  # same count: fine
    assert _resolved(proc2, spark) == {"a": "a", "b": "a"}


def test_cc_maintain_ignores_self_loops(spark, tmp_path):
    """Round-5 code review: a self-loop carries no connectivity and
    must not mint a singleton state row — batch parity with
    connected_components (whose _sym drops them) depends on it."""
    proc = CCMaintainProcessor(str(tmp_path / "st"), n_state_buckets=4)
    proc(_edges_df(spark, [("a", "a"), ("b", "c")]), 0)
    assert _resolved(proc, spark) == {"b": "b", "c": "b"}


def test_cc_maintain_streaming_end_to_end(spark, tmp_path):
    """The readStream wrapper: two availableNow passes over a growing
    pair directory maintain the same clustering as one batch CC."""
    in_dir = str(tmp_path / "in")
    cp = str(tmp_path / "cp")
    st = str(tmp_path / "st")
    b1 = [("x1", "x2"), ("y1", "y2")]
    _edges_df(spark, b1).coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_cc_maintain(spark, in_dir, cp, st, n_state_buckets=4)
    q.awaitTermination(180)
    b2 = [("x2", "y1"), ("z1", "z2")]
    _edges_df(spark, b2).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_cc_maintain(spark, in_dir, cp, st, n_state_buckets=4)
    q2.awaitTermination(180)
    proc = CCMaintainProcessor(st, n_state_buckets=4)
    assert _resolved(proc, spark) == _brute(b1 + b2)
