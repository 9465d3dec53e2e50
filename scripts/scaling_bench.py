"""Scaling-efficiency evidence: the identical job at local[8] vs
local[32] on the same input (BASELINE.md protocol — the sandbox proxy
for the north rule's N vs 4N executors).

Runs each parallelism level in a fresh subprocess (fresh JVM), warms the
JVM/codegen/Python workers with an untimed pass, then times:

  A. native point index: derived points from ``spark.range`` -> geohash
     res 9 cells -> parent rollup (pure WholeStageCodegen — the hot
     web-scale JVM path)
  B. interleaved point-documents pipeline: extract spans -> prepare ->
     index -> parent -> dedup (the Arrow-UDF path at web-scale shape,
     point documents dominating)

Writes BENCH/BASELINE.md with throughputs and efficiency = speedup / 4.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

N_POINTS = int(os.environ.get("SCALING_POINTS", "2000000000"))
# round 2: the pipeline got ~5x faster, so the 4M-doc job finishes in ~3s
# at 32 cores and fixed costs dominate the ratio; 64M keeps it CPU-bound
N_DOCS = int(os.environ.get("SCALING_DOCS", "64000000"))
# dedup family (round 3): corpora sized so the 32-core run stays in the
# several-second CPU-bound regime
N_TEXT = int(os.environ.get("SCALING_TEXT_DOCS", "600000"))
N_VECS = int(os.environ.get("SCALING_VECS", "1000000"))
N_EDGES = int(os.environ.get("SCALING_EDGES", "1000000"))
N_RJ = int(os.environ.get("SCALING_RJ_TARGETS", "32000000"))
N_KNN = int(os.environ.get("SCALING_KNN_TARGETS", "8000000"))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
cpus = int(sys.argv[1]); job = sys.argv[2]; n_points = int(sys.argv[3]); n_docs = int(sys.argv[4])
from vector2dggs_spark.session import get_spark
from vector2dggs_spark.functions import sqlgen as G
from pyspark.sql import functions as F
spark = get_spark(cores=cpus, app=f"scaling{cpus}")
spark.sparkContext.setLogLevel("ERROR")

def job_a(n):
    # integer-code cell representation (the engine scale design: strings
    # only at output boundaries); aggregate depends on cell VALUES so
    # Catalyst cannot eliminate the encode
    src = (f"SELECT id AS point_id, "
           f"({G.dlit(-44.4)} + (id % 700) * {G.dlit(0.001)}) AS lat, "
           f"({G.dlit(-176.6)} + ((id * 7) % 400) * {G.dlit(0.001)}) AS lon "
           f"FROM range(0, {n})")
    q = ("SELECT parent_code, count(*) AS n, min(code) AS mn, max(code) AS mx, "
         + G.geohash_token_sql("parent_code", 3) + " AS parent FROM ("
         + "SELECT code, code >> 30 AS parent_code FROM ("
         + G.geohash_code_select_sql(src, "lat", "lon", 9, ["point_id"], out="code")
         + ") cc) c GROUP BY 1")
    rows = spark.sql(q).collect()
    return sum(r["n"] for r in rows)

def median_of(fn, reps):
    # steady-state wall time: one untimed full warm-up pass (spawns and
    # warms every Python worker / codegen / JIT), then the median of
    # ``reps`` runs (the host shows sporadic multi-second interference
    # windows; the median rejects them)
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print("runs", [round(t, 2) for t in ts], file=sys.stderr)
    return sorted(ts)[len(ts) // 2]

def job_c(n):
    # MinHash-LSH near-dup (the q12 plan, unchanged) over a synthetic
    # text corpus with planted duplicate clusters: docs whose id ends in
    # 999 share their text with the preceding id, everything else unique.
    # All-native: word synthesis, shingle md5, 16-perm fold, band
    # equi-join — the exploded-band candidate join IS the scale shape
    # shared by q12/q19/q26.
    from vector2dggs_spark.entrypoints import _minhash_sql
    docs_path = f"/tmp/v2dggs_scaling/text_{n}.parquet"
    if not os.path.exists(docs_path + "/_SUCCESS"):
        base = "CASE WHEN id % 1000 = 999 THEN id - 1 ELSE id END"
        words = ("concat_ws(' ', transform(sequence(0, 19), i -> "
                 f"concat('w', pmod(({base}) * 2654435761 + i * 40503 "
                 "+ pmod(i * (" + base + "), 97), 5000))))")
        spark.range(n).selectExpr("cast(id as string) AS doc_id", f"{words} AS text") \
            .repartition(64).write.mode("overwrite").parquet(docs_path)
    spark.read.parquet(docs_path).createOrReplaceTempView("documents")
    return spark.sql(_minhash_sql("spark")).count()

def job_d(n):
    # hyperplane-banded embedding near-dup over synthetic 64-dim
    # vectors; ids ending in 99 repeat the previous vector with a small
    # deterministic perturbation.  Runs the q32 ARROW operator
    # (operators/embeddings.py): the pure-SQL q26 formulation's
    # interpreted higher-order folds were measured at 0.33 normalized
    # scaling efficiency (allocation/GC-bound at local[32]) — the numpy
    # matmul path is the production config.  SCALE CONFIG: 8 bands x 24
    # bits — the fixture's 16x4-bit banding collapses to 2^4=16 buckets
    # and the candidate join degenerates to O(n^2/16) past a few
    # thousand vectors (measured: >500 s at 24 k); 24-bit bands keep
    # random-pair collisions ~8n^2/2^25 (the standard practice: size
    # bands so candidates ~ true dups) while planted near-dups
    # (cos≈0.999, per-bit p≈0.97) retain recall 1-(1-p^24)^8 ≈ 0.995.
    from vector2dggs_spark.functions.textops import EMB_DIM
    from vector2dggs_spark.operators.embeddings import near_dup_lsh
    vec_path = f"/tmp/v2dggs_scaling/vecs_{n}.parquet"
    if not os.path.exists(vec_path + "/_SUCCESS"):
        base = "CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END"
        noise = "CASE WHEN id % 100 = 99 THEN cast(0.05 as double) ELSE cast(0.0 as double) END"
        # xxhash64-based components: properly decorrelated (the earlier
        # sin-hash corpus was heavily self-correlated — 6% of candidate
        # pairs passed cos>=0.38, nothing like a real embedding corpus)
        comp = (f"cast(pmod(xxhash64(({base}) * {EMB_DIM} + j), 20000) as double)"
                f" / 10000.0 - 1.0"
                f" + {noise} * sin(cast(id * 7 + j as double))")
        vecs = f"transform(sequence(0, {EMB_DIM - 1}), j -> cast({comp} as float))"
        spark.range(n).selectExpr("cast(id as string) AS vec_id", f"{vecs} AS embedding") \
            .repartition(64).write.mode("overwrite").parquet(vec_path)
    return near_dup_lsh(spark.read.parquet(vec_path), bands=8, bits=24).count()

def job_e(n):
    # connected components over a synthetic 50-chain / 1000-node-cluster
    # graph (operators/cc.py — the q42 operator at scale): chains give
    # nontrivial diameter (log-round alternation exercised), cluster
    # hubs bound component size so the answer is checkable
    from vector2dggs_spark.operators.cc import connected_components
    edges = spark.range(n).selectExpr(
        "format_string('n%09d', id) AS doc_a",
        "CASE WHEN id % 50 = 0 THEN format_string('n%09d', id - (id % 1000)) "
        "ELSE format_string('n%09d', id - 1) END AS doc_b")
    comp = connected_components(edges)
    n_comp = comp.select("component").distinct().count()
    assert n_comp == -(-n // 1000), n_comp  # ceil: last block may be partial
    return n_comp

def job_f(n):
    # fixed-radius spatial range join (q63 operator, round 5): n
    # targets vs n/20 queries on a 0.7x4.0-deg lattice, radius 0.002
    # deg at geohash res 7 (2 rings).  Cover + refine: native
    # WholeStageCodegen encode on BOTH sides (native_point_cells),
    # grid-disk explode on the small query side only, one hash
    # equi-join on cell, exact-distance filter (~248M result pairs at
    # 32M targets).  No driver loop - the plan-time ring count comes
    # from the backend guarantee bound.
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import range_join
    t = spark.range(n).selectExpr(
        "cast(id as string) AS target_id",
        f"({G.dlit(-44.4)} + (id % 700) * {G.dlit(0.001)}) AS lat",
        f"({G.dlit(-176.6)} + ((id * 7) % 4000) * {G.dlit(0.001)}) AS lon")
    q = spark.range(n // 20).selectExpr(
        "cast(id as string) AS query_id",
        f"({G.dlit(-44.35)} + (id % 650) * {G.dlit(0.001)}) AS lat",
        f"({G.dlit(-176.55)} + ((id * 11) % 3900) * {G.dlit(0.001)}) AS lon")
    return range_join(q, t, get_backend("geohash"), res=7, radius=0.002).count()


def job_g(n):
    # kNN ring expansion at scale (q06 operator, round 5 fully-native
    # path): n targets vs n/20 queries on a sparse lattice at geohash
    # res 7 (~0.35 targets/cell at every n — the lattice dims scale
    # with sqrt(n) so DENSITY, hence the ring-count regime, is
    # n-invariant), k=5 — most queries need ring 2, a tail needs ring
    # 4, so the doubling loop, the annulus explode and the
    # carried-top-k checkpoint all execute.  Both sides run
    # packed-coordinate int64 keys with codegen sequence-explode
    # disks: zero Python in any round.
    import math
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.joins import knn
    f = max(1, int(round(math.sqrt(n / 8_000_000))))
    # (id % A, (id div A) % B) walks the FULL A x B lattice before
    # repeating — the old (id % A, (id*7) % B) pair cycled jointly with
    # period lcm(A, B), stacking hundreds of targets on 0.5% of the
    # positions and forcing ring-64 explodes (measured: one 32M run
    # spilled >78 GB and died; the '~0.35 targets/cell' design claim
    # only holds with a bijective walk)
    t = spark.range(n).selectExpr(
        "cast(id as string) AS target_id",
        f"({G.dlit(-44.4)} + (id % {700 * f}) * {G.dlit(0.004)}) AS lat",
        f"({G.dlit(-176.6)} + ((id div {700 * f}) % {4000 * f}) * {G.dlit(0.004)}) AS lon")
    q = spark.range(n // 20).selectExpr(
        "cast(id as string) AS query_id",
        f"({G.dlit(-44.35)} + (id % {650 * f}) * {G.dlit(0.004)}) AS lat",
        f"({G.dlit(-176.55)} + ((id div {650 * f}) % {3900 * f}) * {G.dlit(0.004)}) AS lon")
    out = knn(q, t, get_backend("geohash"), res=7, k=5)
    n_rows = out.count()
    out.unpersist()
    assert n_rows == (n // 20) * 5, n_rows
    return n_rows

if job == "A":
    t = median_of(lambda: job_a(n_points), 3)
    print("RESULT" + json.dumps({"cpus": cpus, "job": "A", "t": t, "rows": n_points}))
elif job == "C":
    n = int(os.environ.get("SCALING_TEXT_DOCS", "600000"))
    t = median_of(lambda: job_c(n), 3)
    print("RESULT" + json.dumps({"cpus": cpus, "job": "C", "t": t, "rows": n}))
elif job == "D":
    n = int(os.environ.get("SCALING_VECS", "1000000"))
    t = median_of(lambda: job_d(n), 3)
    print("RESULT" + json.dumps({"cpus": cpus, "job": "D", "t": t, "rows": n}))
elif job == "E":
    n = int(os.environ.get("SCALING_EDGES", "1000000"))
    t = median_of(lambda: job_e(n), 3)
    print("RESULT" + json.dumps({"cpus": cpus, "job": "E", "t": t, "rows": n}))
elif job == "F":
    n = int(os.environ.get("SCALING_RJ_TARGETS", "32000000"))
    t = median_of(lambda: job_f(n), 3)
    print("RESULT" + json.dumps({"cpus": cpus, "job": "F", "t": t, "rows": n}))
elif job == "G":
    n = int(os.environ.get("SCALING_KNN_TARGETS", "8000000"))
    t = median_of(lambda: job_g(n), 3)
    print("RESULT" + json.dumps({"cpus": cpus, "job": "G", "t": t, "rows": n}))
else:
    # job B input: identical parquet for every parallelism level
    docs_path = f"/tmp/v2dggs_scaling/docs_native_{n_docs}.parquet"
    if not os.path.exists(docs_path + "/_SUCCESS"):
        from vector2dggs_spark.sources.documents import synthesize_documents_native
        synthesize_documents_native(spark, n_docs).repartition(64).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    from vector2dggs_spark import index
    t = median_of(lambda: index(spark, docs, dggs="geohash", resolution=9, parent_res=3, spatial_sort="none").cells.count(), 5)
    print("RESULT" + json.dumps({"cpus": cpus, "job": "B", "t": t, "rows": n_docs}))
spark.stop()
"""


def run(cpus: int, job: str) -> dict:
    # one JVM per (job, parallelism): job A's allocation storm must not
    # pollute job B's heap/GC state
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), job, str(N_POINTS), str(N_DOCS)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in out.stderr.splitlines():
        if line.startswith("runs"):
            print(f"  [{job}@{cpus}] {line}", file=sys.stderr)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def _burn(q, dur):
    import numpy as np

    t_end = time.perf_counter() + dur
    n = 0
    x = np.arange(200000, dtype=np.uint64)
    while time.perf_counter() < t_end:
        y = x
        for shift, mask in ((16, 0x0000FFFF0000FFFF), (8, 0x00FF00FF00FF00FF),
                            (4, 0x0F0F0F0F0F0F0F0F), (2, 0x3333333333333333),
                            (1, 0x5555555555555555)):
            y = (y | (y << np.uint64(shift))) & np.uint64(mask)
        n += len(x)
    q.put(n)


def machine_ceiling() -> float:
    """This host's achievable 8->32-process speedup for embarrassingly
    parallel bit math (frequency scaling / power limits cap it well
    below 4x): the fair denominator for local-mode efficiency."""
    def measure(nproc, dur=6.0):
        q = mp.Queue()
        ps = [mp.Process(target=_burn, args=(q, dur)) for _ in range(nproc)]
        [p.start() for p in ps]
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        return total / dur

    return measure(32) / measure(8)


JOB_ROWS = {"A": N_POINTS, "B": N_DOCS, "C": N_TEXT, "D": N_VECS, "E": N_EDGES,
            "F": N_RJ, "G": N_KNN}
JOB_DESC = {
    "A": f"A. native point index (geohash r9, {N_POINTS:,} pts, WholeStageCodegen)",
    "B": f"B. point-documents pipeline ({N_DOCS:,} interleaved docs, r9, Arrow-UDF path)",
    "C": f"C. MinHash-LSH near-dup (q12 plan, {N_TEXT:,} synthetic text docs, native SQL)",
    "D": f"D. hyperplane-LSH embedding near-dup (q32 Arrow path, {N_VECS:,} 64-dim vectors, 8x24-bit bands)",
    "E": f"E. connected components (large/small-star, {N_EDGES:,} edges, 1000-node planted clusters)",
    "F": f"F. fixed-radius range join (q63, {N_RJ:,} targets vs {N_RJ // 20:,} queries, ~248M pairs)",
    "G": f"G. kNN ring expansion (q06 native path, {N_KNN:,} targets vs {N_KNN // 20:,} queries, k=5, multi-round)",
}
JOB_UNIT = {"A": "pts/s", "B": "cells/s", "C": "docs/s", "D": "vecs/s", "E": "edges/s",
            "F": "targets/s", "G": "targets/s"}


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jobs = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["A", "B", "C", "D"])
    ceiling = machine_ceiling()
    results = {}
    for c in (8, 32):
        results[c] = {"cpus": c}
        for j in jobs:
            results[c][f"t{j}"] = run(c, j)["t"]
    thr = {j: {c: JOB_ROWS[j] / results[c][f"t{j}"] for c in (8, 32)} for j in jobs}
    eff = {j: (thr[j][32] / thr[j][8]) / 4.0 for j in jobs}
    norm = {j: (thr[j][32] / thr[j][8]) / ceiling for j in jobs}
    rows = "\n".join(
        f"| {JOB_DESC[j]} | {thr[j][8]:,.0f} {JOB_UNIT[j]} ({results[8][f't{j}']:.2f}s) "
        f"| {thr[j][32]:,.0f} {JOB_UNIT[j]} ({results[32][f't{j}']:.2f}s) "
        f"| {thr[j][32]/thr[j][8]:.2f}x | {eff[j]:.2f} | **{norm[j]:.2f}** |"
        for j in jobs
    )
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling efficiency (local[8] vs local[32])

Protocol (BASELINE.md): identical job, identical input, fresh JVM per
parallelism level, untimed warm-up pass (codegen/JIT/Python workers),
only the master differs.  Efficiency = (throughput@32 / throughput@8)/4;
target >= 0.8 (BASELINE.json north rule, sandbox proxy for N vs 4N
executors).

This host's own 8->32 ceiling for embarrassingly parallel processes is
**{ceiling:.2f}x** (frequency/power scaling — measured with independent
busy-loop processes doing the same bit math; an ideal 4x is physically
unattainable at local[32] on this box).  "norm. eff." divides the
engine's speedup by that measured ceiling — the number comparable to
the north rule's >= 0.8 on a constant-clock cluster.

| job | local[8] | local[32] | speedup | raw eff (/4) | norm. eff (/{ceiling:.2f}) |
|---|---|---|---|---|---|
{rows}

Raw: {json.dumps(results)}

Notes
- Job A is the dominant web-scale path (point documents as native
  columnar expressions): zero Python, one shuffle with map-side partial
  aggregation.
- Job B covers the full engine dataflow (span explode -> prepare
  mapInPandas with vectorized POINT fast path -> index mapInPandas ->
  native parent -> single-pass dedup).
- Jobs C/D are the LLM-dedup family at scale shape: per-row signature
  work (shingle md5 + 16-perm fold / 64 hyperplane folds) + the
  exploded-band (band_idx, band_val) EQUI-join for candidates — the
  same plan q12/q19/q26 run; corpora carry planted duplicate clusters.
- local[N] shares one JVM, page cache and memory bus, so this is a
  conservative proxy for multi-executor scale-out.
"""
    # a subset run must not clobber the full evidence doc (a re-run of
    # just job D used to silently truncate the table to one row)
    suffix = "" if jobs == ["A", "B", "C", "D"] else "_" + "".join(jobs)
    with open(os.path.join(repo, "BENCH", f"BASELINE_generated{suffix}.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": eff, "norm": norm, "ceiling": ceiling,
                      "thr": thr}))


if __name__ == "__main__":
    main()
