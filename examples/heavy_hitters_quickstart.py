#!/usr/bin/env python
"""Streaming heavy-hitters walkthrough: bounded-state hot-key
monitoring with :func:`dce_spark.streaming.streaming_heavy_hitters`.

Streams the events table file-by-file through the lossy-counting
sketch and prints the keys above a support threshold with their
[count, count + delta] bracket — state stays O(1/epsilon) per shard
no matter how many distinct users the stream carries.

    python examples/heavy_hitters_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.data import load_table  # noqa: E402
from dce_spark.streaming import streaming_heavy_hitters  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("heavy-hitters-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        src_dir = os.path.join(tmp, "src")
        # stage the batch table as a file stream (2 files -> 2 batches)
        load_table(spark, sf_dir, "events").select(
            F.col("user_id").cast("string").alias("k")
        ).repartition(2).write.parquet(src_dir)

        stream = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        q = (
            streaming_heavy_hitters(stream, "k", epsilon=0.005, n_shards=8)
            .writeStream.format("memory")
            .queryName("hh")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        # latest report per key; heavy iff count + delta >= support * shard_n
        support = 0.01
        latest = spark.sql(
            """SELECT k, count, delta, shard_n FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY k ORDER BY shard_n DESC) AS rn FROM hh)
               WHERE rn = 1"""
        )
        heavy = latest.filter(
            F.col("count") + F.col("delta") >= support * F.col("shard_n")
        ).orderBy(F.desc("count"))
        print(f"hot users (support {support:.1%} of their shard):")
        for r in heavy.limit(15).collect():
            print(
                f"  user {r['k']}: count in [{r['count']}, "
                f"{r['count'] + r['delta']}] of {r['shard_n']} shard events"
            )
        print(f"tracked entries: {latest.count()} "
              f"(vs distinct keys in stream: unbounded at scale)")
    spark.stop()


if __name__ == "__main__":
    main()
