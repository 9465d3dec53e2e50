"""Structured Streaming: incremental near-dup CLUSTER maintenance.

The streaming twin of contract query q42 (connected components of the
near-dup pair graph, ``operators/cc.py``): micro-batches of new pairs
``(u, v)`` arrive — e.g. from the streaming LSH band join — and the
operator maintains cluster assignments for every node seen so far,
converging after each batch to exactly what the batch operator would
compute over the union of all edges (component id = min node id; the
batch-parity pytest oracle).

A batch recomputation is O(all edges) per micro-batch; the scalable
shape is a **union-find forest as a state table**:

* state = ``(node, parent)`` rows, hash-partitioned on
  ``pnh = pmod(xxhash64(node), n_state_buckets)`` — the same
  partition-pruned incremental-state pattern as
  ``streaming/lsh_dedup.py`` (VERDICT r03 #2);
* FIND: the batch's endpoint set is resolved to roots by an iterative
  partition-pruned equi-join (chase ``parent`` until ``parent ==
  node``); per iteration only the partitions the current frontier
  hashes into are scanned.  Depth stays small because every batch
  path-compresses the nodes it touched (their rows are rewritten to
  point directly at the new root);
* UNION: batch edges projected onto roots form a root graph of
  O(batch) size; the existing distributed large-star/small-star
  operator (:func:`~vector2dggs_spark.operators.cc.connected_components`)
  collapses it, and union-by-min (link the larger root under the
  smaller) keeps the invariant *every root is the minimum node id of
  its component so far* — which is what makes the final assignment
  independent of how the stream was batched;
* WRITE: upserted rows (batch nodes compressed + superseded roots
  re-pointed) are merged into their ``pnh`` partitions with dynamic
  partition overwrite — per-batch state I/O is O(touched partitions),
  never O(state);
* crash safety: an atomic batch-id marker makes full replays no-ops,
  and a replay after a PARTIAL state write converges to the same
  forest because parent pointers only ever move toward smaller roots
  (union is idempotent/commutative under the min-root invariant; a
  find on partially-updated state just starts closer to the fixpoint).
  Pinned by the crash-replay pytest.

Readout: :func:`resolve` materializes ``(node, component)`` by
iterated pointer-doubling joins (O(log depth) passes) — the offline
view used by the parity oracle and by downstream keep-one-per-cluster
jobs.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vector2dggs_spark.streaming.state import (
    ensure_bucket_count,
    have_partitioned_state,
    read_marker,
    write_marker,
)

_SCHEMA = "u string, v string"


def _pnh(col: str, n: int) -> F.Column:
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


class CCMaintainProcessor:
    """The ``foreachBatch`` body, exposed as a class so tests can drive
    micro-batches directly (including crash-at-any-point replays)."""

    def __init__(self, state_dir: str, n_state_buckets: int = 64,
                 max_find_iter: int = 200):
        self.parents_path = os.path.join(state_dir, "parents")
        self.marker_path = os.path.join(state_dir, "last_batch.json")
        self.n = n_state_buckets
        self.max_find_iter = max_find_iter
        # the bucket count is baked into the partition layout; opening
        # existing state under a different count would silently corrupt
        # it (round-5 code review) — pin it on first use, validate after
        ensure_bucket_count(state_dir, n_state_buckets)

    # ---------------------------------------------------------- state
    def _have_state(self) -> bool:
        # dynamic partition overwrite leaves no root _SUCCESS: state
        # exists iff any pnh= partition dir does (lsh_dedup lesson)
        return have_partitioned_state(self.parents_path, "pnh")

    def _state(self, sp: SparkSession) -> DataFrame:
        # the session-shared file-status cache survives our own dynamic
        # partition overwrite of this path; without the invalidation a
        # post-overwrite read can list replaced files (FAILED_READ_FILE)
        sp.catalog.refreshByPath(self.parents_path)
        return sp.read.parquet(self.parents_path)

    def _marker(self) -> dict:
        return read_marker(self.marker_path)

    def _write_marker(self, batch_id: int) -> None:
        write_marker(self.marker_path, batch_id=batch_id)

    # ----------------------------------------------------------- find
    def _find_roots(self, sp: SparkSession, nodes: DataFrame) -> DataFrame:
        """(node) -> (node, root): chase parent pointers through the
        state table with per-iteration partition pruning.  Nodes absent
        from the state are their own roots.

        One hop per pass over the (small) frontier — pointer DOUBLING
        is not available here because intermediate hops live in the
        state table, not the frontier.  Depth stays small in practice
        (every batch path-compresses the nodes it touches; a chain only
        deepens while a node goes untouched across dethronements), and
        ``max_find_iter`` (default 200) bounds pathological streams
        with a clear error instead of a wrong answer.  Every cached
        intermediate is released on every exit path — a leaked cached
        state scan would serve stale file listings to a later batch."""
        cur = nodes.select("node", F.col("node").alias("cur")).cache()
        cur.count()
        have = self._have_state()
        try:
            for _ in range(self.max_find_iter):
                if not have:
                    break
                hot = [r["pnh"] for r in
                       cur.select(_pnh("cur", self.n).alias("pnh")).distinct().collect()]
                st = self._state(sp).where(F.col("pnh").isin(hot)) \
                    .select(F.col("node").alias("cur"), "parent")
                step = cur.join(st, "cur", "left").select(
                    "node", F.coalesce("parent", "cur").alias("nxt"),
                    (F.col("parent").isNotNull() & (F.col("parent") != F.col("cur")))
                    .alias("moved"),
                ).cache()
                n_moved = step.where("moved").count()
                prev = cur
                cur = step.select("node", F.col("nxt").alias("cur")).cache()
                cur.count()
                prev.unpersist()
                step.unpersist()
                if n_moved == 0:
                    break
            else:
                raise RuntimeError(
                    f"find did not terminate in {self.max_find_iter} pointer chases"
                )
            out = cur.select("node", F.col("cur").alias("root")).cache()
            out.count()
            return out  # cached + materialized; caller unpersists
        finally:
            cur.unpersist()

    # ---------------------------------------------------------- batch
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from vector2dggs_spark.operators.cc import connected_components

        sp = batch_df.sparkSession
        if self._marker().get("batch_id") == batch_id:
            return  # replay of a fully-applied batch
        edges = (
            batch_df.select(F.col("u"), F.col("v"))
            .where(F.col("u").isNotNull() & F.col("v").isNotNull())
            # self-loops carry no connectivity and must not mint
            # singleton state rows — the batch operator's _sym drops
            # them too, and resolve() parity depends on matching that
            .where(F.col("u") != F.col("v"))
            .distinct()
            .cache()
        )
        roots = comp = ups = merged = None
        # unpersist on EVERY exit: a crashed attempt must not leave
        # cached plans behind — the replay builds IDENTICAL plans and
        # the CacheManager would canonical-plan-match them to the
        # leftovers (stale data and, worse, stale file listings over
        # the overwritten state path)
        try:
            if edges.isEmpty():
                self._write_marker(batch_id)
                return
            nodes = (
                edges.select(F.col("u").alias("node"))
                .unionByName(edges.select(F.col("v").alias("node")))
                .distinct()
            )
            roots = self._find_roots(sp, nodes)  # cached + materialized

            # root graph: batch edges projected onto current roots; the
            # distributed CC operator collapses it (O(batch) nodes,
            # O(log) rounds); component = min root = min node so far
            ru = roots.withColumnRenamed("node", "u").withColumnRenamed("root", "ru")
            rv = roots.withColumnRenamed("node", "v").withColumnRenamed("root", "rv")
            redges = (
                edges.join(ru, "u").join(rv, "v")
                .select(F.col("ru").alias("doc_a"), F.col("rv").alias("doc_b"))
                .where(F.col("doc_a") != F.col("doc_b"))
            )
            if redges.isEmpty():
                rmap = roots.select(
                    F.col("root").alias("old_root"), F.col("root").alias("new_root")
                ).distinct()
            else:
                comp = connected_components(redges)  # persisted by operator
                rmap = (
                    roots.select(F.col("root").alias("old_root")).distinct()
                    .join(comp.withColumnRenamed("node", "old_root"),
                          "old_root", "left")
                    .select(
                        "old_root",
                        F.coalesce("component", "old_root").alias("new_root"),
                    )
                )

            # upserts: batch nodes path-compressed to their new root,
            # plus superseded roots re-pointed (not always batch nodes)
            compressed = (
                roots.join(rmap, roots["root"] == rmap["old_root"])
                .select("node", F.col("new_root").alias("parent"))
            )
            repointed = (
                rmap.where(F.col("old_root") != F.col("new_root"))
                .select(F.col("old_root").alias("node"),
                        F.col("new_root").alias("parent"))
            )
            ups = (
                compressed.unionByName(repointed)
                .groupBy("node").agg(F.min("parent").alias("parent"))
                .withColumn("pnh", _pnh("node", self.n))
                .cache()
            )
            touched = [r["pnh"] for r in ups.select("pnh").distinct().collect()]

            # merge-rewrite ONLY the touched pnh partitions: keep their
            # non-upserted rows, replace/insert the upserted ones
            if self._have_state():
                keep = (
                    self._state(sp).where(F.col("pnh").isin(touched))
                    .join(ups.select("node"), "node", "left_anti")
                    .select("pnh", "node", "parent")
                )
                merged = keep.unionByName(ups.select("pnh", "node", "parent"))
            else:
                merged = ups.select("pnh", "node", "parent")
            # materialize BEFORE the overwrite: the merge reads the very
            # partitions the dynamic overwrite replaces, and a lazy plan
            # re-scanning them mid-write hits deleted files
            merged = merged.cache()
            merged.count()
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("pnh")
                .parquet(self.parents_path)
            )
            self._write_marker(batch_id)
        finally:
            for df in (edges, roots, ups, merged, comp):
                if df is not None:
                    df.unpersist()

    # -------------------------------------------------------- readout
    def resolve(self, sp: SparkSession, max_iter: int = 50) -> DataFrame:
        """Materialized (node, component) over the whole forest —
        pointer-chasing joins until every pointer is a root (O(log
        depth) full passes; offline view, used by the parity oracle and
        keep-one-per-cluster downstream jobs).

        The result is an eager ``localCheckpoint``: fully materialized,
        with NO plan reference to the state files and NO CacheManager
        entry.  Both properties matter — a cached plan over the state
        path left behind by one resolve would be canonical-plan-matched
        by the NEXT resolve after an overwrite and replay a stale file
        listing (FAILED_READ_FILE), and a lazy plan would re-list files
        the next batch replaces.  Blocks are freed when the returned
        frame is garbage-collected (ContextCleaner)."""
        if not self._have_state():
            return sp.createDataFrame([], "node string, component string")
        cur = self._state(sp).select("node", F.col("parent").alias("comp")).cache()
        cur.count()
        try:
            for _ in range(max_iter):
                # TRUE pointer doubling: look pointers up in the
                # CURRENT mapping (a self-join), so every pass squares
                # the chase depth — O(log depth) passes even on streams
                # whose untouched chains grew one hop per dethronement
                # (round-5 code review: the earlier static parent-table
                # lookup chased one hop per pass)
                look = cur.select(
                    F.col("node").alias("comp"), F.col("comp").alias("nxt")
                )
                step = cur.join(look, "comp", "left").select(
                    "node", F.coalesce("nxt", "comp").alias("comp2"),
                    (F.col("nxt").isNotNull() & (F.col("nxt") != F.col("comp")))
                    .alias("moved"),
                ).cache()
                n_moved = step.where("moved").count()
                prev = cur
                cur = step.select("node", F.col("comp2").alias("comp")).cache()
                cur.count()
                prev.unpersist()
                step.unpersist()
                if n_moved == 0:
                    break
            else:
                raise RuntimeError(
                    f"resolve did not terminate in {max_iter} passes"
                )
            return cur.select("node", F.col("comp").alias("component")) \
                .localCheckpoint(eager=True)
        finally:
            cur.unpersist()


def stream_cc_maintain(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    available_now: bool = True,
    n_state_buckets: int = 64,
) -> StreamingQuery:
    """Streamed (u, v) pair parquet -> maintained union-find state under
    ``state_dir`` (read it back with ``CCMaintainProcessor.resolve``)."""
    process = CCMaintainProcessor(state_dir, n_state_buckets=n_state_buckets)
    pairs = spark.readStream.schema(_SCHEMA).parquet(input_dir)
    writer = (
        pairs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
