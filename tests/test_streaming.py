"""Structured Streaming incremental indexing: batch parity for point
documents + incremental pickup of new files with exactly-once sink."""
import os

import pytest

from pyspark.sql import functions as F

from vector2dggs_spark import index
from vector2dggs_spark.sources.documents import documents_df
from vector2dggs_spark.streaming.incremental import stream_index_points


def _point_docs(spark, n, seed):
    docs = documents_df(spark, n, seed=seed)
    pts = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where((F.col("s.kind") == "geometry") & F.col("s.text").startswith("POINT"))
        .select("doc_id")
        .distinct()
    )
    return docs.join(pts, "doc_id")


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    docs = _point_docs(spark, 200, seed=9).cache()
    docs.write.parquet(in_dir)

    q = stream_index_points(spark, in_dir, out_dir, cp, dggs="geohash", resolution=6)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    batch = index(spark, docs, dggs="geohash", resolution=6).cells
    g = {(r["doc_id"], r["geohash_06"], r["geohash_01"]) for r in got.collect()}
    b = {(r["doc_id"], r["geohash_06"], r["geohash_01"]) for r in batch.collect()}
    assert g == b and g

    # incremental: new file appears -> only the delta is appended
    more = _point_docs(spark, 80, seed=31).withColumn(
        "doc_id", F.concat(F.lit("x"), F.col("doc_id"))
    )
    more.write.mode("append").parquet(in_dir)
    q2 = stream_index_points(spark, in_dir, out_dir, cp, dggs="geohash", resolution=6)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == len(g) + more.join(
        spark.read.parquet(in_dir), "doc_id", "left_semi"
    ).select("doc_id").distinct().count()
    # Hive layout preserved by the streaming sink
    assert any(d.startswith("geohash_01=") for d in os.listdir(out_dir))


def test_stateful_running_counts_resume(spark, tmp_path):
    """applyInPandasWithState: per-cell totals accumulate across separate
    query runs through the persisted state store (checkpoint recovery)."""
    from vector2dggs_spark.streaming.stateful import streaming_cell_counts

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    d1 = _point_docs(spark, 120, seed=2).cache()
    d1.write.parquet(in_dir)
    q = streaming_cell_counts(spark, in_dir, out_dir, cp, dggs="geohash", resolution=4)
    q.awaitTermination(120)

    d2 = _point_docs(spark, 90, seed=77).withColumn(
        "doc_id", F.concat(F.lit("y"), F.col("doc_id"))
    ).cache()
    d2.write.mode("append").parquet(in_dir)
    q2 = streaming_cell_counts(spark, in_dir, out_dir, cp, dggs="geohash", resolution=4)
    q2.awaitTermination(120)

    got = (
        spark.read.parquet(out_dir)
        .groupBy("cell")
        .agg(F.max("total").alias("total"))
        .toPandas()
        .set_index("cell")["total"]
        .to_dict()
    )
    # expected: batch totals from ALL docs (state carried across runs)
    both = d1.unionByName(d2)
    exp = index(spark, both, dggs="geohash", resolution=4).cells
    exp_counts = {
        r["geohash_04"]: r["n"]
        for r in exp.groupBy("geohash_04").agg(F.count("*").alias("n")).collect()
    }
    assert got == exp_counts and got


def test_windowed_watermark_drops_late_data(spark, tmp_path):
    """Event-time windows + watermark: a window emits once the watermark
    passes its end; events later than the watermark are DROPPED (their
    window has already been finalized without them)."""
    import pandas as pd

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.streaming.windowed import windowed_cell_counts

    in_dir = str(tmp_path / "win_in")
    cp = str(tmp_path / "win_cp")
    os.makedirs(in_dir)
    schema = "event_time timestamp, lat double, lon double"

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_time", "lat", "lon"])
        pdf["event_time"] = pd.to_datetime(pdf["event_time"])
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # batch 1: three events in [10:00, 10:10) + one at 10:30 that pushes
    # the watermark to 10:25 (> window end), finalizing the first window
    write_batch("b1", [
        ("2026-01-01 10:01:00", -44.1, -176.4),
        ("2026-01-01 10:03:00", -44.1, -176.4),
        ("2026-01-01 10:08:00", -44.1, -176.4),
        ("2026-01-01 10:30:00", -44.2, -176.5),
    ])

    out_dir = str(tmp_path / "win_out")
    stream = spark.readStream.schema(schema).parquet(in_dir)
    agg = windowed_cell_counts(stream, get_backend("geohash"), 5)

    def run_available(_):
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir).toPandas()

    out1 = run_available("win1")
    first = out1[out1.window_start.astype(str).str.contains("10:00")]
    assert len(first) == 1 and int(first.iloc[0]["n"]) == 3  # window finalized

    # batch 2: one LATE event (10:02 — far behind the 10:25 watermark)
    # and one fresh event keeping the stream alive
    write_batch("b2", [
        ("2026-01-01 10:02:00", -44.1, -176.4),  # must be dropped
        ("2026-01-01 10:31:00", -44.2, -176.5),
    ])
    out2 = run_available("win2")
    # the file sink is cumulative: the finalized [10:00,10:10) window must
    # still be exactly the batch-1 emission — one row, n==3.  A re-emit
    # (2 rows) or a grown count (n==4) would mean the late event leaked
    # past the watermark.
    again = out2[out2.window_start.astype(str).str.contains("10:00")]
    assert len(again) == 1 and int(again.iloc[0]["n"]) == 3, again.to_string()


def test_streaming_dedup_matches_batch_and_bounds_state(spark, tmp_path):
    """Streamed exact dedup == batch keep-first on the same input;
    duplicates in a later micro-batch (within the watermark) are
    dropped across batches, proving the state store carries the
    fingerprints forward."""
    import datetime as dt

    from vector2dggs_spark.streaming.dedup import (
        batch_dedup_documents,
        stream_dedup_documents,
    )

    in_dir = str(tmp_path / "din")
    out_dir = str(tmp_path / "dout")
    cp = str(tmp_path / "dcp")
    os.makedirs(in_dir)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def rows(specs):
        return [(d, t, t0 + dt.timedelta(minutes=m)) for d, t, m in specs]

    schema = "doc_id string, text string, event_time timestamp"
    batch1 = spark.createDataFrame(
        rows([("a", "Hello  World", 0), ("b", "unique one", 1),
              ("c", "hello world", 2)]),  # c duplicates a (case/space-normalized)
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_dedup_documents(spark, in_dir, out_dir, cp, watermark="1 hour")
    q.awaitTermination(120)
    # second file: one cross-batch duplicate, one new doc
    batch2 = spark.createDataFrame(
        rows([("d", "HELLO WORLD", 10), ("e", "another new", 11)]), schema
    )
    batch2.coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_dedup_documents(spark, in_dir, out_dir, cp, watermark="1 hour")
    q2.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {"a", "b", "e"}  # c (same batch) and d (cross batch) dropped
    both = batch1.unionByName(spark.createDataFrame(
        rows([("d", "HELLO WORLD", 10), ("e", "another new", 11)]), schema))
    exp = {r["doc_id"] for r in batch_dedup_documents(both).collect()}
    assert got == exp


def test_streaming_dedup_windowed_is_arrival_order_independent(spark, tmp_path):
    """The windowed dedup pair must agree row-for-row even when a
    later-event_time duplicate ARRIVES first (the case where
    dropDuplicatesWithinWatermark keeps a different row — confirmed by
    the round-3 code review) and when the input is multi-partition."""
    import datetime as dt

    from vector2dggs_spark.streaming.dedup import (
        batch_dedup_documents_windowed,
        stream_dedup_documents_windowed,
    )

    in_dir = str(tmp_path / "win")
    out_dir = str(tmp_path / "wout")
    cp = str(tmp_path / "wcp")
    os.makedirs(in_dir)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "doc_id string, text string, event_time timestamp"

    def rows(specs):
        return [(d, t, t0 + dt.timedelta(minutes=m)) for d, t, m in specs]

    # 'late' (t+30) arrives BEFORE 'early' (t+0) — same fingerprint;
    # plus an in-order duplicate pair and a unique doc, multi-partition
    data = rows([
        ("late", "hello  world", 30), ("early", "Hello World", 0),
        ("u1", "unique one", 5),
        ("p1", "pair text", 10), ("p2", "PAIR  TEXT", 12),
    ])
    spark.createDataFrame(data, schema).repartition(4).write.mode("append").parquet(in_dir)
    q = stream_dedup_documents_windowed(
        spark, in_dir, out_dir, cp, window="1 hour", watermark="1 hour"
    )
    q.awaitTermination(120)
    # a far-future row pushes the watermark past the first window so the
    # finalized aggregates are emitted in append mode
    spark.createDataFrame(rows([("flush", "flush doc", 600)]), schema).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    q2 = stream_dedup_documents_windowed(
        spark, in_dir, out_dir, cp, window="1 hour", watermark="1 hour"
    )
    q2.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert "early" in got and "late" not in got  # min event_time wins
    assert "p1" in got and "p2" not in got
    batch = batch_dedup_documents_windowed(
        spark.createDataFrame(data, schema).repartition(3), window="1 hour"
    )
    exp = {r["doc_id"] for r in batch.collect()}
    # the flush row's own window is still open (not watermark-closed),
    # so the emitted set equals the batch result over the first window
    assert got == exp


def test_streaming_lsh_dedup_matches_batch_and_chains(spark, tmp_path):
    """Greedy streaming LSH dedup (winners state table): same kept set
    as the batch operator over the accumulated corpus; a cross-batch
    duplicate is dropped via the persisted bucket winners, and a doc
    chaining to a DROPPED doc's buckets is dropped too.  Replaying with
    no new data changes nothing (idempotent foreachBatch)."""
    import datetime as dt

    from vector2dggs_spark.streaming.lsh_dedup import (
        batch_lsh_dedup,
        stream_lsh_dedup_documents,
    )

    in_dir = str(tmp_path / "lin"); os.makedirs(in_dir)
    out_dir = str(tmp_path / "lout")
    cp = str(tmp_path / "lcp")
    st = str(tmp_path / "lstate")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    schema = "doc_id string, text string, event_time timestamp"

    def rows(specs):
        return [(d, t, t0 + dt.timedelta(minutes=m)) for d, t, m in specs]

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " extra"            # shares most shingles with base
    far = "completely different words in this one with no overlap at all"
    b1 = rows([("a", base, 0), ("b", far, 1), ("c", near, 2), ("s", "too short", 3)])
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_lsh_dedup_documents(spark, in_dir, out_dir, cp, st)
    q.awaitTermination(180)
    # cross-batch: d duplicates a; f chains off c (the DROPPED doc)
    b2 = rows([("d", base + " more", 10), ("e", "another unrelated corpus entry here", 11),
               ("f", near + " extra", 12)])
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_lsh_dedup_documents(spark, in_dir, out_dir, cp, st)
    q2.awaitTermination(180)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    both = spark.createDataFrame(b1 + b2, schema)
    exp = {r["doc_id"] for r in batch_lsh_dedup(both).collect()}
    assert got == exp
    assert "a" in got and "b" in got and "s" in got
    assert "c" not in got and "d" not in got
    # replay with no new data: output unchanged
    q3 = stream_lsh_dedup_documents(spark, in_dir, out_dir, cp, st)
    q3.awaitTermination(180)
    again = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert again == got


def test_streaming_lsh_dedup_incremental_state(spark, tmp_path):
    """VERDICT r03 #2: a micro-batch touching k state buckets rewrites
    ONLY those pbh partitions of the winners table (dynamic partition
    overwrite), and a simulated crash between the state write and the
    marker write recovers by replay with identical output and state."""
    import datetime as dt

    from vector2dggs_spark.streaming.lsh_dedup import (
        LshDedupProcessor,
        batch_lsh_dedup,
    )

    out_dir = str(tmp_path / "out")
    st = str(tmp_path / "state")
    schema = "doc_id string, text string, event_time timestamp"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def df(specs):
        return spark.createDataFrame(
            [(d, t, t0 + dt.timedelta(minutes=m)) for d, t, m in specs], schema
        )

    proc = LshDedupProcessor(out_dir, st, n_state_buckets=16)
    base = "the quick brown fox jumps over the lazy dog again and again"
    b1 = df([
        ("a", base, 0),
        ("b", "completely different words in this one with no overlap at all", 1),
        ("c", "yet another unrelated document with its own distinct shingles", 2),
    ])
    proc(b1, 0)
    winners = os.path.join(st, "winners")
    parts_before = {
        p: sorted(os.listdir(os.path.join(winners, p)))
        for p in os.listdir(winners)
        if p.startswith("pbh=")
    }
    assert len(parts_before) > 1  # multiple buckets populated

    # batch 2: one near-dup of a -> touches only a's band buckets
    b2 = df([("d", base + " extra", 10)])
    proc(b2, 1)
    parts_after = {
        p: sorted(os.listdir(os.path.join(winners, p)))
        for p in os.listdir(winners)
        if p.startswith("pbh=")
    }
    from vector2dggs_spark.streaming.lsh_dedup import band_rows
    from pyspark.sql import functions as F

    touched = {
        f"pbh={r['pbh']}"
        for r in band_rows(b2)
        .withColumn("pbh", F.pmod(F.xxhash64("band", "bv"), F.lit(16)))
        .select("pbh")
        .distinct()
        .collect()
    }
    untouched = set(parts_before) - touched
    assert untouched  # the test is vacuous if batch 2 touched everything
    for p in untouched:
        assert parts_after[p] == parts_before[p]  # file listing unchanged
    for p in touched:
        assert parts_after[p] != parts_before.get(p)  # rewritten

    # d lost a's buckets -> dropped
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {"a", "b", "c"}

    # crash between state write and marker write: batch 3 applies state,
    # then "crashes"; the replay must converge to the no-crash result
    class Crash(Exception):
        pass

    class CrashingProc(LshDedupProcessor):
        def _write_marker(self, batch_id, hi):
            raise Crash()

    b3 = df([("e", base + " more words", 20), ("f", "fresh independent content entirely new", 21)])
    crasher = CrashingProc(out_dir, st, n_state_buckets=16)
    with pytest.raises(Crash):
        crasher(b3, 2)
    # replay with the healthy processor
    proc(b3, 2)
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    all_docs = df([
        ("a", base, 0),
        ("b", "completely different words in this one with no overlap at all", 1),
        ("c", "yet another unrelated document with its own distinct shingles", 2),
        ("d", base + " extra", 10),
        ("e", base + " more words", 20),
        ("f", "fresh independent content entirely new", 21),
    ])
    exp = {r["doc_id"] for r in batch_lsh_dedup(all_docs).collect()}
    assert got2 == exp
    # no duplicate doc rows despite the replay
    rows = spark.read.parquet(out_dir).groupBy("doc_id").count().collect()
    assert all(r["count"] == 1 for r in rows)
    # second replay of the same batch is a no-op (marker short-circuit)
    proc(b3, 2)
    assert {r["doc_id"] for r in spark.read.parquet(out_dir).collect()} == got2


def test_streaming_lsh_dedup_crash_replay_with_pruning(spark, tmp_path):
    """Code-review r04: a crash between the (pruning) state write and
    the marker write must replay to the SAME kept set even when the
    crash batch's horizon pruning removed winners the kept decision
    depended on.  The cutoff is fixed before any state interaction and
    applied at state READ time, so first application and replay see the
    identical winner set."""
    import datetime as dt

    from vector2dggs_spark.streaming.lsh_dedup import LshDedupProcessor

    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    st_a = str(tmp_path / "st_a")
    st_b = str(tmp_path / "st_b")
    schema = "doc_id string, text string, event_time timestamp"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    base = "the quick brown fox jumps over the lazy dog again and again"

    def df(specs):
        return spark.createDataFrame(
            [(d, t, t0 + dt.timedelta(hours=h)) for d, t, h in specs], schema
        )

    b1 = df([("w", base, 0)])                       # winner at T0
    # batch 2 arrives 3h later (horizon 2h): w is OUT of horizon, so its
    # buckets must NOT drop d — and the decision must be identical
    # whether or not the batch is replayed after a crash
    b2 = df([("d", base + " extra", 3)])

    class Crash(Exception):
        pass

    class CrashingProc(LshDedupProcessor):
        def _write_marker(self, batch_id, hi):
            raise Crash()

    # run A: no crash
    pa = LshDedupProcessor(out_a, st_a, horizon="2 hours", n_state_buckets=8)
    pa(b1, 0)
    pa(b2, 1)
    kept_a = {r["doc_id"] for r in spark.read.parquet(out_a).collect()}

    # run B: batch 1 crashes after state write, replays; then batch 2
    # crashes after state write (pruning w), replays
    pb = LshDedupProcessor(out_b, st_b, horizon="2 hours", n_state_buckets=8)
    cb = CrashingProc(out_b, st_b, horizon="2 hours", n_state_buckets=8)
    with pytest.raises(Crash):
        cb(b1, 0)
    pb(b1, 0)
    with pytest.raises(Crash):
        cb(b2, 1)
    pb(b2, 1)
    kept_b = {r["doc_id"] for r in spark.read.parquet(out_b).collect()}

    assert kept_a == kept_b == {"w", "d"}  # out-of-horizon winner ignored
    rows = spark.read.parquet(out_b).groupBy("doc_id").count().collect()
    assert all(r["count"] == 1 for r in rows)


def test_streaming_geofence_alerts(spark, tmp_path):
    """Stream-static geofence join: alerts match the brute-force
    (fix, zone) containment set, the plan carries NO stateful operator
    (unbounded-viable), restart picks up only new files (exactly-once
    sink), and the batch twin agrees."""
    import numpy as np
    import pandas as pd

    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.streaming.geofence import (
        geofence_alerts,
        stream_geofence_alerts,
    )

    rng = np.random.default_rng(41)

    def mk_fixes(n, id0):
        return pd.DataFrame({
            "point_id": np.arange(id0, id0 + n, dtype=np.int64),
            "ts": pd.to_datetime("2024-03-01") + pd.to_timedelta(
                rng.integers(0, 86400, n), unit="s"),
            "lat": rng.uniform(-44.4, -43.9, n),
            "lon": rng.uniform(-176.6, -176.1, n),
        })

    n_z = 30
    cx = rng.uniform(-176.55, -176.15, n_z)
    cy = rng.uniform(-44.35, -43.95, n_z)
    w = rng.uniform(0.005, 0.05, n_z)
    h = rng.uniform(0.005, 0.05, n_z)
    zones_pd = pd.DataFrame({
        "id_r": [f"z{i:02d}" for i in range(n_z)],
        "x0": cx - w / 2, "y0": cy - h / 2,
        "x1": cx + w / 2, "y1": cy + h / 2,
    })
    zones = spark.createDataFrame(zones_pd)

    def brute(fx):
        hit = (
            (fx["lon"].to_numpy()[:, None] >= zones_pd["x0"].to_numpy()[None, :])
            & (fx["lon"].to_numpy()[:, None] <= zones_pd["x1"].to_numpy()[None, :])
            & (fx["lat"].to_numpy()[:, None] >= zones_pd["y0"].to_numpy()[None, :])
            & (fx["lat"].to_numpy()[:, None] <= zones_pd["y1"].to_numpy()[None, :])
        )
        return {(int(fx["point_id"].iloc[i]), zones_pd["id_r"][j])
                for i, j in zip(*np.nonzero(hit))}

    in_dir, out_dir, cp = (str(tmp_path / d) for d in ("in", "out", "cp"))
    f1 = mk_fixes(400, 0)
    spark.createDataFrame(f1).write.parquet(in_dir)

    q = stream_geofence_alerts(spark, in_dir, out_dir, cp, zones,
                               dggs="geohash", resolution=7)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).toPandas()
    pairs = list(zip(got.point_id.astype(int), got.id_r))
    assert len(pairs) == len(set(pairs))  # one alert per (fix, zone)
    assert set(pairs) == brute(f1)
    assert len(brute(f1)) > 20

    # the streaming plan must be stateless (no watermark/state store)
    be = get_backend("geohash")
    alerts = geofence_alerts(
        spark.readStream.schema(
            spark.read.parquet(in_dir).schema).parquet(in_dir),
        zones, be, 7)
    assert alerts.isStreaming
    logical = alerts._jdf.queryExecution().analyzed().toString()
    assert "StateStore" not in logical and "Deduplicate" not in logical

    # restart with a new file: only the delta lands (exactly-once)
    f2 = mk_fixes(150, 1000)
    spark.createDataFrame(f2).write.mode("append").parquet(in_dir)
    q2 = stream_geofence_alerts(spark, in_dir, out_dir, cp, zones,
                                dggs="geohash", resolution=7)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir).toPandas()
    assert set(zip(got2.point_id.astype(int), got2.id_r)) == brute(f1) | brute(f2)
    assert len(got2) == len(brute(f1)) + len(brute(f2))

    # batch twin on the same inputs agrees exactly
    allfx = spark.read.parquet(in_dir)
    batch = geofence_alerts(allfx, zones, be, 7).toPandas()
    assert set(zip(batch.point_id.astype(int), batch.id_r)) == brute(f1) | brute(f2)
