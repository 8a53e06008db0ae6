"""Bucketed co-located joins: pay the shuffle ONCE at write time, then
join shuffle-free forever after.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides on the key. Writing both tables bucketed (hash-partitioned into
N files) and sorted by the join key makes every later join on that key
a zero-exchange sort-merge join: bucket i of the left table joins only
bucket i of the right, already co-located. This is the standard layout
decision for tables that are repeatedly joined on a stable key
(orders⋈lineitem on orderkey, events⋈users on user_id), and the batch
counterpart of Kafka partitioning.

The reference has no storage layer (it validates one table per run),
so this is a pure extension — but it is the piece that makes the
TPC-H-style joins in the catalog sustainable when both sides are big.
`tests/test_bucketing.py` asserts the no-Exchange plan mechanically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and by default sorted) table.

    ``num_buckets`` must match on both sides of a co-located join; size
    it so one bucket of the bigger table fits an executor's memory at
    the target scale (100 TB / 64k buckets ≈ 1.5 GB). Sorting by the
    key lets single-file buckets skip the join-time sort too.
    """
    w = df.write.format(format).mode(mode).bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``key``. With matching bucket counts
    Catalyst plans a sort-merge join with NO Exchange on either side —
    the shuffle was paid at write time."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
