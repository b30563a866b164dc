"""Distributed running totals — the two-phase prefix sum.

A rank-ordered cumulative sum is the textbook scale trap: expressed as a
single window (``SUM(x) OVER (ORDER BY ...)`` with no PARTITION BY) Spark
plans an Exchange SinglePartition and funnels the entire input through one
task.  Fine on a bounded axis (calendar days, a dim seed); a cliff on any
data-sized grain (parts, documents, users).

``running_total`` computes the same value in two parallel phases:

1. ``repartitionByRange`` on the rank order gives globally-ordered
   partitions; each computes its LOCAL running total in parallel.
2. The per-partition grand totals (one row per partition — bounded by the
   chosen fan-out, never by the data) get a predecessor-sum window and are
   broadcast back, shifting every partition by the sum of its predecessors.

Row placement across range boundaries can vary run to run; every row's
GLOBAL prefix sum cannot, provided the order is TOTAL (callers must break
ties down to a key).  Addition is whatever exact type the caller sums —
BIGINT or DECIMAL end-to-end stays oracle-exact.

The one remaining partition-less window runs over ≤ ``num_ranges`` rows
(the per-partition totals), which is why the plan gate in
``tests/test_plan_shapes.py`` whitelists it: its input cardinality is fixed
by the plan, not the data.

First proven in ``queries/text_pipeline.py`` (``corpus_token_budget``);
extracted here round 6 to also fix the ``pareto_abc_parts`` cumulative
share (VERDICT r05 "What's wrong" #1) and for any future ranked-cume shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_pfx_pid"
_LOCAL = "_pfx_local"
_TOT = "_pfx_tot"
_OFF = "_pfx_off"


def running_total(
    df: DataFrame,
    order: list[Column],
    value: Column | str,
    out: str,
    num_ranges: int | None = None,
    durable: bool = False,
) -> DataFrame:
    """Add column ``out`` = sum of ``value`` over all rows ≤ current row in
    the TOTAL order given by ``order`` (callers MUST include a tiebreak
    key — without one the range boundaries between equal keys are
    sampler-dependent and the two consuming branches could disagree).
    Two-phase: per-range-partition local cumsum + broadcast offset shift —
    never a single-partition pass over the data.

    ``num_ranges`` defaults to the cluster parallelism so phase 1 uses
    every core; correctness is independent of the choice.

    Barrier durability: the default consistency barrier is
    ``localCheckpoint`` — its blocks are NOT recomputable, so on a real
    cluster losing an executor mid-query turns a task retry into a job
    failure (acceptable on local[*] and for short queries; the query is a
    pure function, so the retry is "re-run it").  Pass ``durable=True``
    for long cluster jobs: the barrier becomes a replicated
    ``persist(MEMORY_AND_DISK_2)``, which survives a single executor loss.
    A persisted plan is an equally valid barrier here because the range
    exchange's partitioner (the sampled boundaries) is fixed in the
    physical plan before either branch runs; a recomputed block re-reads
    the same shuffle output with the same boundaries.

    With ``durable=True`` the persisted plan is exposed on the result as
    ``result.prefix_barrier`` — call ``result.prefix_barrier.unpersist()``
    after the consuming action, or the replicated cached blocks live for
    the app lifetime (calling ``.unpersist()`` on the RESULT is a no-op:
    the returned join DataFrame was never itself persisted).
    """
    value_col = F.col(value) if isinstance(value, str) else value
    if num_ranges is None:
        num_ranges = df.sparkSession.sparkContext.defaultParallelism
    # The lazy checkpoint is load-bearing twice over: (a) the local-cumsum
    # and per-partition-totals branches both consume `ranked` — without a
    # materialization barrier each branch re-runs the range exchange with
    # its own boundary sample, and a boundary row could land in different
    # _pfx_pid values per branch (offsets would then shift the wrong rows);
    # (b) it computes the upstream (scan + aggregate) once instead of per
    # branch.
    ranked = df.repartitionByRange(num_ranges, *order).withColumn(
        _PID, F.spark_partition_id()
    )
    if durable:
        from pyspark import StorageLevel

        ranked = ranked.persist(StorageLevel.MEMORY_AND_DISK_2)
    else:
        ranked = ranked.localCheckpoint(eager=False)
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranked.withColumn(_LOCAL, F.sum(value_col).over(w_in))
    # one row per range partition; this window's input is ≤ num_ranges rows
    totals = local.groupBy(_PID).agg(F.sum(value_col).alias(_TOT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        _OFF, F.coalesce(F.sum(_TOT).over(w_off), F.lit(0))
    ).select(_PID, _OFF)
    result = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.col(_LOCAL) + F.col(_OFF))
        .drop(_PID, _LOCAL, _OFF)
    )
    if durable:
        result.prefix_barrier = ranked  # caller unpersists after consuming
    return result
