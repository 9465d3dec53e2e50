"""Lineage truncation for iterative driver loops (kNN ring expansion,
connected components, and any future fixpoint operator)."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IterState:
    """Per-round lineage truncation for iterative driver loops.

    Spark logical plans have no cycle detection: an iteration whose new
    state references the previous round's plan TWICE (e.g. kNN's
    ``pending`` via ``done_ids(ranked(pending))`` and directly) doubles
    the plan tree per round — exponential analysis/string-rendering cost
    even when every intermediate is persisted (persist caches data, not
    the plan).  ``localCheckpoint(eager=True)`` replaces the plan with a
    leaf over executor-stored partitions; this wrapper records exactly
    which RDD ids each checkpoint pinned so ``release()`` can free them
    deterministically on exit (localCheckpoint is not CacheManager-
    managed, so ``DataFrame.unpersist`` cannot)."""

    def __init__(self, spark: SparkSession):
        self._jsc = spark.sparkContext._jsc.sc()
        self._groups: list[set[int]] = []  # RDD ids per checkpoint call

    def _live(self) -> set[int]:
        out = set()
        it = self._jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    def checkpoint(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """``eager=False`` marks the plan for checkpointing but lets the
        CALLER's next action materialize it — folding the checkpoint job
        into an aggregation the loop runs anyway (e.g. the CC fixpoint
        fingerprint) saves one job per round.  The caller must run that
        action before the checkpointed frame is consumed twice and
        before ``release`` frees this frame's inputs.  Tracking works
        for lazy checkpoints because ``localCheckpoint`` registers its
        persistence (``getPersistentRDDs``) at mark time, not at
        materialization."""
        before = self._live()
        ck = df.localCheckpoint(eager=eager)
        self._groups.append(self._live() - before)
        return ck

    def release(self, keep_last: int = 0) -> None:
        """Free the pinned checkpoint blocks.  ``keep_last=n`` keeps the
        n most recent checkpoints alive — for loops whose RESULT is a
        lazy view over the final round's state (e.g. connected
        components returns projections of the converged edge set)."""
        drop = self._groups[: len(self._groups) - keep_last] if keep_last else self._groups
        mine = set().union(*drop) if drop else set()
        it = self._jsc.getPersistentRDDs().iterator()
        rdds = []
        while it.hasNext():
            kv = it.next()
            if kv._1() in mine:
                rdds.append(kv._2())
        for rdd in rdds:
            rdd.unpersist(False)
        self._groups = self._groups[len(self._groups) - keep_last :] if keep_last else []
