"""CPU-spread helper for compute-bound per-row stages (shingling,
payload digests) whose input may arrive as a single split.

The gate must be CHEAP: probing ``df.rdd.getNumPartitions()`` builds an
RDD-conversion plan and serializes the query through it — measured 6.5x
on ``payload_stats`` at sf0.1 (round-2 regression).  Instead we count
the scan's input files via the FileIndex (no job, no RDD): a corpus
small enough to live in fewer files than cores is exactly the case
where an explicit round-robin repartition is needed; at real data
sizes ``spark.sql.files.maxPartitionBytes`` already yields at least one
split per core and the repartition is skipped.  One big splittable file
undercounts splits, which only errs toward spreading — the safe
direction for a CPU-bound stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_for_cpu"]


def spread_for_cpu(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to ``defaultParallelism`` iff its
    scan reads fewer files than there are cores (cheap FileIndex probe;
    never forces an RDD conversion)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file source (in-memory relation, stream)
        n_files = 0
    return df.repartition(target) if n_files < target else df
