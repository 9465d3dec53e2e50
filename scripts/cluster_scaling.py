"""Multi-process scaling evidence for the Arrow paths (VERDICT r03 #7).

Rounds 2-3 measured the H3 Arrow point path and the q32 Arrow embedding
near-dup at 0.38-0.78 normalized efficiency going local[8] -> local[32],
and argued (from flat per-stage profiles) that the ceiling is the single
JVM's shared Arrow pipe + in-process shuffle bus, not the plan shape.
This harness tests that argument directly: the SAME job at the SAME
total core count on a real Spark standalone cluster, split across 1
worker process vs 2/4 worker processes on this host.

* If the paths were plan-bound (e.g. a serialized stage), extra worker
  processes would not help: time(2x4) >= time(1x8).
* If they are process-bound (one Python-worker pool / Arrow IPC pipe /
  shuffle manager per executor saturating), 2 executors at the same
  core budget should run FASTER or equal, because each brings its own
  pipe pool — the sandbox analog of adding machines.

Usage: python scripts/cluster_scaling.py [total_cores]
Starts its own master + workers (pure `java -cp pyspark/jars/*`
`deploy.master.Master` / `deploy.worker.Worker` — the pip wheel ships
the jars but not sbin), runs each topology in a fresh driver process,
prints one JSON line per (job, topology) and a summary.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pyspark

SPARK_HOME = os.path.dirname(pyspark.__file__)
JAVA = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
MASTER_URL = "spark://127.0.0.1:7077"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import SparkSession, functions as F

total = int(sys.argv[1]); per_exec = int(sys.argv[2]); job = sys.argv[3]
spark = (
    SparkSession.builder.master(os.environ["MASTER_URL"])
    .appName(f"cluster-scaling-{job}-{total}c-{per_exec}pe")
    .config("spark.cores.max", str(total))
    .config("spark.executor.cores", str(per_exec))
    .config("spark.executor.memory", "12g")
    .config("spark.sql.shuffle.partitions", str(max(total * 2, 16)))
    .config("spark.executorEnv.PYTHONPATH", os.environ["REPO"])
    .config("spark.executorEnv.OMP_NUM_THREADS", "1")
    .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from vector2dggs_spark.functions import sqlgen as G

def job_h():
    # the bench headline H3 Arrow point path (same corpus formulas)
    from vector2dggs_spark.dggs import get_backend
    from vector2dggs_spark.operators.udfs import point_to_cell_udf
    n = 10_000_000
    src = G.derived_points_global_sql(f"range(0, {n})", "id")
    enc = point_to_cell_udf(get_backend("h3"), 9)
    return (
        spark.sql(src)
        .select(enc("lat", "lon").alias("cell"))
        .select(F.substring("cell", 1, 5).alias("p"))
        .groupBy("p").count().agg(F.sum("count")).collect()[0][0]
    )

def job_d():
    # q32 Arrow embedding near-dup, scaling_bench job D config
    from vector2dggs_spark.functions.textops import EMB_DIM
    from vector2dggs_spark.operators.embeddings import near_dup_lsh
    n = int(os.environ.get("SCALING_VECS", "1000000"))
    vec_path = f"/tmp/v2dggs_scaling/vecs_{n}.parquet"
    if not os.path.exists(vec_path + "/_SUCCESS"):
        base = "CASE WHEN id % 100 = 99 THEN id - 1 ELSE id END"
        noise = "CASE WHEN id % 100 = 99 THEN cast(0.05 as double) ELSE cast(0.0 as double) END"
        comp = (f"cast(pmod(xxhash64(({base}) * {EMB_DIM} + j), 20000) as double)"
                f" / 10000.0 - 1.0"
                f" + {noise} * sin(cast(id * 7 + j as double))")
        vecs = f"transform(sequence(0, {EMB_DIM - 1}), j -> cast({comp} as float))"
        spark.range(n).selectExpr("cast(id as string) AS vec_id", f"{vecs} AS embedding") \
            .repartition(64).write.mode("overwrite").parquet(vec_path)
    return near_dup_lsh(spark.read.parquet(vec_path), bands=8, bits=24).count()

fn = job_h if job == "H" else job_d
fn()  # untimed warm-up (executor launch + Arrow/codegen)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
print("RESULT" + json.dumps({"job": job, "total": total, "per_exec": per_exec,
                             "runs": [round(t, 2) for t in ts],
                             "median": sorted(ts)[1]}))
spark.stop()
"""


def _spawn(cls: str, args: list[str], log: str) -> subprocess.Popen:
    cmd = [JAVA, "-Xmx2g", "-cp", os.path.join(SPARK_HOME, "jars", "*"), cls] + args
    env = dict(
        os.environ,
        SPARK_HOME=SPARK_HOME,  # ExecutorRunner builds the executor
        SPARK_SCALA_VERSION="2.13",  # command from these (pip wheel has
        PYSPARK_PYTHON=sys.executable,  # jars/ but no assembly dirs)
    )
    return subprocess.Popen(
        cmd, stdout=open(log, "w"), stderr=subprocess.STDOUT, env=env
    )


class Cluster:
    def __init__(self):
        self.procs: list[subprocess.Popen] = []

    def start_master(self):
        self.procs.append(
            _spawn(
                "org.apache.spark.deploy.master.Master",
                ["--host", "127.0.0.1", "--port", "7077", "--webui-port", "8089"],
                "/tmp/cluster_master.log",
            )
        )
        time.sleep(6)

    def start_workers(self, n: int, cores: int, mem: str = "20g"):
        for i in range(n):
            self.procs.append(
                _spawn(
                    "org.apache.spark.deploy.worker.Worker",
                    [MASTER_URL, "--cores", str(cores), "--memory", mem,
                     "--work-dir", f"/tmp/spark_work_{i}",
                     "--webui-port", str(8190 + i)],
                    f"/tmp/cluster_worker_{i}.log",
                )
            )
        time.sleep(8)

    def stop_workers(self):
        for p in self.procs[1:]:
            p.terminate()
        for p in self.procs[1:]:
            p.wait(timeout=30)
        self.procs = self.procs[:1]
        time.sleep(3)

    def shutdown(self):
        for p in self.procs:
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=30)
            except Exception:
                p.kill()


def run_driver(total: int, per_exec: int, job: str) -> dict:
    env = dict(
        os.environ,
        REPO=REPO,
        MASTER_URL=MASTER_URL,
        PYSPARK_PYTHON=sys.executable,
    )
    out = subprocess.run(
        [sys.executable, "-c", DRIVER, str(total), str(per_exec), job],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(f"driver failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    topologies = [(1, total), (2, total // 2), (4, total // 4)]
    cluster = Cluster()
    results = []
    try:
        cluster.start_master()
        for n_workers, cores in topologies:
            if cores * n_workers != total or cores == 0:
                continue
            cluster.start_workers(n_workers, cores)
            for job in ("H", "D"):
                res = run_driver(total, cores, job)
                res["workers"] = n_workers
                results.append(res)
                print(json.dumps(res), flush=True)
            cluster.stop_workers()
    finally:
        cluster.shutdown()
    print("SUMMARY")
    for r in results:
        print(f"  job {r['job']}: {r['workers']}x{r['per_exec']}c -> "
              f"median {r['median']:.2f}s runs {r['runs']}")


if __name__ == "__main__":
    main()
