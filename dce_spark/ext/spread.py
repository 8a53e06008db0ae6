"""CPU-spread helper for compute-bound per-row stages (shingling,
payload digests, media decode) whose input may arrive as a single
split.

The gate must be CHEAP: probing ``df.rdd.getNumPartitions()`` builds
an RDD-conversion plan and serializes the query through it — measured
6.5x on ``payload_stats`` at sf0.1 (round-2 regression). Instead we
count the scan's input files via the FileIndex and, when needed, read
the plan-statistics size estimate — neither launches a job.

Two spread modes, because the per-partition overhead differs by ~two
orders of magnitude depending on WHERE the compute runs:

- **JVM expression stages** (``bytes_per_task=None``, default):
  shingling/hashing via built-in expressions. Extra partitions cost
  only task scheduling (~ms); leaving a corpus in one split serializes
  seconds of CPU. Spread to ``defaultParallelism`` whenever the scan
  has fewer files than cores. (Round-3 lesson: size-gating this mode
  left 5k docs in ONE task and tripled the dedup family at sf0.1.)
- **Python stages** (``bytes_per_task=<bytes>``): ``mapInPandas``
  work pays an Arrow python-worker spin-up PER PARTITION (~50-100 ms
  each), so 32 partitions of 150 rows cost more than the work itself
  — measured 2.3s vs 0.33s on 5k docs (round-3 finding). Gate the
  fan-out on the plan-stats size: one task per ``bytes_per_task``,
  capped at ``defaultParallelism``. A 100 TB input saturates the cap;
  a 5 MB fixture stays in its one split.

One big splittable file undercounts splits, which errs toward
spreading — the safe direction for a CPU-bound stage.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

__all__ = ["spread_for_cpu"]


def spread_for_cpu(
    df: DataFrame, bytes_per_task: Optional[int] = None
) -> DataFrame:
    """Round-robin repartition ``df`` for a CPU-bound stage iff its
    scan has fewer files than cores — unconditionally for JVM
    expression work (``bytes_per_task=None``), size-gated for Python
    stages (see module docstring). Never forces an RDD conversion,
    never launches a job."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source (in-memory relation, stream)
        return df
    if n_files >= target:
        return df
    if bytes_per_task is None:
        return df.repartition(target)
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        size = 0
    n = min(target, max(1, size // bytes_per_task))
    return df.repartition(n) if n > n_files else df
