"""CPU-spread helper for compute-bound per-row stages (shingling,
payload digests, media decode) whose input may arrive as a single
split.

The gate must be CHEAP and the target must be SIZE-AWARE:

- probing ``df.rdd.getNumPartitions()`` builds an RDD-conversion plan
  and serializes the query through it — measured 6.5x on
  ``payload_stats`` at sf0.1 (round-2 regression);
- repartitioning a small input to ``defaultParallelism`` is its own
  regression: each post-shuffle partition feeds a separate Arrow
  python-worker pipe, so 32 partitions of 150 rows pay 32 worker
  spin-ups for microseconds of work each — measured 2.3s vs 0.33s on
  5k docs (round-3 finding).

So: count the scan's input files via the FileIndex (no job, no RDD)
and take the plan-statistics size estimate (catalog/file metadata, no
job either). Spread only when the data is big enough to keep every
target task busy — one task per ``bytes_per_task`` of input, capped at
``defaultParallelism``. A 100 TB corpus saturates the cap; a 5 MB
fixture stays in its one split. One big splittable file undercounts
splits, which errs toward spreading — the safe direction for a
CPU-bound stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_for_cpu"]

# One Python-worker task per this many input bytes. Sized so worker
# startup (~50 ms) is <1% of the per-task decode work at typical
# CPU-bound throughput (~100 MB/s -> 32 MB ~ 300 ms of compute).
_BYTES_PER_TASK = 32 << 20


def spread_for_cpu(df: DataFrame, bytes_per_task: int = _BYTES_PER_TASK) -> DataFrame:
    """Round-robin repartition ``df`` for a CPU-bound Python stage iff
    its scan has both fewer files than cores AND enough bytes that the
    extra tasks do real work (plan-stats size probe; never forces an
    RDD conversion, never launches a job)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source (in-memory relation, stream)
        return df
    if n_files >= target:
        return df
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        size = 0
    n = min(target, max(1, size // bytes_per_task))
    return df.repartition(n) if n > n_files else df
