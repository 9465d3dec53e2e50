"""End-to-end streaming near-dup clustering (band_rows ∘ cc_maintain).

Oracle: the q42 construction — connected components of the bucket
CLIQUE graph ("two docs ever share a band bucket") over all documents
seen so far — computed here as a batch self-join + sequential
union-find.  The streaming operator only ever emits bucket STARS plus
dethronement edges; parity proves the reduction."""
import datetime as dt
import os

import pytest

from tests.union_find import brute as _brute

from vector2dggs_spark.streaming.lsh_dedup import band_rows
from vector2dggs_spark.streaming.near_dup_clusters import (
    NearDupClusterProcessor,
    stream_near_dup_clusters,
)

SCHEMA = "doc_id string, text string, event_time timestamp"
T0 = dt.datetime(2026, 1, 1, 12, 0, 0)

BASE = "the quick brown fox jumps over the lazy dog again and again"
NEAR = BASE + " extra"
FAR1 = "completely different words in this one with no overlap at all"
FAR2 = "yet another unrelated document with its own distinct shingles"
FAR3 = "fresh independent content entirely new and unlike the others here"


def _docs(spark, specs):
    return spark.createDataFrame(
        [(d, t, T0 + dt.timedelta(minutes=m)) for d, t, m in specs], SCHEMA
    )




def _clique_cc(spark, all_specs):
    """q42-style oracle: union-find over bucket-clique pairs.  Docs
    whose every bucket is a singleton never pair with anything and are
    absent — matching ``clusters()``, which returns only documents that
    ever shared a bucket (q42 unions the doc universe for singletons)."""
    bands = band_rows(_docs(spark, all_specs)).select("band", "bv", "doc_id")
    rows = [(r["band"], r["bv"], r["doc_id"]) for r in bands.collect()]
    buckets = {}
    for band, bv, d in rows:
        buckets.setdefault((band, bv), []).append(d)
    pairs = []
    for members in buckets.values():
        m = sorted(set(members))
        pairs += [(m[0], x) for x in m[1:]]
    return _brute(pairs)


def _resolved(proc, spark):
    return {r["node"]: r["component"] for r in proc.clusters(spark).collect()}


B1 = [("a", BASE, 0), ("b", FAR1, 1), ("c", NEAR, 2)]
B2 = [("d", BASE + " more", 10), ("e", FAR2, 11)]
B3 = [("f", NEAR + " extra", 20), ("g", FAR3, 21), ("h", BASE, 22)]


def test_near_dup_clusters_matches_batch_clique_cc(spark, tmp_path):
    proc = NearDupClusterProcessor(str(tmp_path / "st"), n_state_buckets=16)
    seen = []
    for bi, batch in enumerate((B1, B2, B3)):
        seen += batch
        proc(_docs(spark, batch), bi)
        got = _resolved(proc, spark)
        assert got == _clique_cc(spark, seen), bi
    # sanity on the fixture itself: the near-dup chain really clusters,
    # the unrelated docs never join it (all-singleton buckets -> absent)
    final = _resolved(proc, spark)
    assert final["a"] == final["c"] == final["d"] == final["f"] == final["h"]
    assert "b" not in final and "e" not in final and "g" not in final


def test_near_dup_clusters_dethronement_links_components(spark, tmp_path):
    """A later-arriving but EARLIER-event-time duplicate takes over its
    buckets; the old-owner -> new-owner edge must keep everything
    connected."""
    proc = NearDupClusterProcessor(str(tmp_path / "st"), n_state_buckets=8)
    proc(_docs(spark, [("x", BASE, 50), ("y", NEAR, 51)]), 0)
    # z predates x (event time) and duplicates it
    proc(_docs(spark, [("z", BASE, 1)]), 1)
    got = _resolved(proc, spark)
    assert got == _clique_cc(spark, [("x", BASE, 50), ("y", NEAR, 51), ("z", BASE, 1)])
    assert got["x"] == got["y"] == got["z"]


@pytest.mark.parametrize("crash_point", ["marker", "winners_write"])
def test_near_dup_clusters_crash_replay_converges(spark, tmp_path, crash_point):
    """Crashes at both gaps the write order leaves open — after the CC
    apply but before the winners overwrite, and after the overwrite but
    before the marker — must replay to the no-crash clustering."""
    st = str(tmp_path / "st")
    proc = NearDupClusterProcessor(st, n_state_buckets=8)
    proc(_docs(spark, B1), 0)

    class Crash(Exception):
        pass

    class Crasher(NearDupClusterProcessor):
        def _write_marker(self, batch_id):
            raise Crash()

    crasher = Crasher(st, n_state_buckets=8)
    if crash_point == "winners_write":
        # crash even earlier: right after the CC apply — simulate by
        # letting cc run, then raising before the winners overwrite
        orig_cc = crasher.cc

        class CCThenCrash:
            def __call__(self, edges, batch_id):
                orig_cc(edges, batch_id)
                raise Crash()

            def __getattr__(self, item):
                return getattr(orig_cc, item)

        crasher.cc = CCThenCrash()
    with pytest.raises(Crash):
        crasher(_docs(spark, B2), 1)
    proc(_docs(spark, B2), 1)  # healthy replay
    assert _resolved(proc, spark) == _clique_cc(spark, B1 + B2)


def test_near_dup_clusters_streaming_end_to_end(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    cp = str(tmp_path / "cp")
    st = str(tmp_path / "st")
    _docs(spark, B1).coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_near_dup_clusters(spark, in_dir, cp, st, n_state_buckets=8)
    q.awaitTermination(180)
    _docs(spark, B2).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_near_dup_clusters(spark, in_dir, cp, st, n_state_buckets=8)
    q2.awaitTermination(180)
    proc = NearDupClusterProcessor(st, n_state_buckets=8)
    assert _resolved(proc, spark) == _clique_cc(spark, B1 + B2)
