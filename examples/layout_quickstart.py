#!/usr/bin/env python
"""Layout management walkthrough: the write-side of a 100 TB table.

Shows the dce_spark.sinks toolkit end-to-end on the test corpus —
hive-partitioned writes, range-sorted (zone-map) layouts, Z-order
multi-dimensional clustering, small-file compaction — and closes by
linting a query over the layout with dce_spark.planaudit.

    python examples/layout_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.data import load_table  # noqa: E402
from dce_spark.planaudit import assert_scalable  # noqa: E402
from dce_spark.sinks import (  # noqa: E402
    compact,
    layout_stats,
    minmax_bucket,
    write_partitioned,
    write_sorted,
    zorder_key,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("layout-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="layout_")

    events = load_table(spark, sf_dir, "events")

    # 1. hive-partitioned by event type: one file per directory
    p1 = os.path.join(root, "by_type")
    write_partitioned(events, p1, ["event_type"], files_per_partition=1)
    n_files = layout_stats(spark, p1).count()
    print(f"partitioned: {n_files} files (one per event_type directory)")

    # 2. range-sorted by value: disjoint per-file ranges = zone maps
    p2 = os.path.join(root, "by_value")
    write_sorted(events.filter(F.col("value").isNotNull()), p2, ["value"], num_files=4)
    stats = layout_stats(spark, p2, sort_by=["value"]).collect()
    ranges = sorted((r["min_value"], r["max_value"]) for r in stats)
    print("sorted ranges:", [(round(a, 1), round(b, 1)) for a, b in ranges])

    # 3. Z-order on (user bucket, value bucket): every file bounded in
    # BOTH dimensions, so min/max stats prune filters on either column
    mn, mx = events.agg(F.min("value"), F.max("value")).head()
    zdf = events.filter(F.col("value").isNotNull()).withColumn(
        "zkey",
        zorder_key(
            [F.pmod(F.col("user_id"), F.lit(256)).cast("long"),
             minmax_bucket(F.col("value"), mn, mx, 8)],
            bits=8,
        ),
    )
    p3 = os.path.join(root, "zordered")
    write_sorted(zdf, p3, ["zkey"], num_files=4)
    print(f"z-ordered: {layout_stats(spark, p3).count()} files, both dims bounded")

    # 4. compaction: many small files -> few, no shuffle
    p4a = os.path.join(root, "fragmented")
    events.repartition(16).write.parquet(p4a)
    p4b = os.path.join(root, "compacted")
    compact(spark, p4a, p4b, num_files=2)
    print(f"compacted: 16 files -> {layout_stats(spark, p4b).count()}")

    # 5. lint a query over the partitioned layout: broadcast-only
    # joins, no cartesian, pruned scan
    q = (
        spark.read.parquet(p1)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("spend"))
    )
    rep = assert_scalable(q, max_shuffle_exchanges=1)
    print(
        f"plan lint clean: {rep.shuffle_exchanges} shuffle, "
        f"pushed={rep.scans[0].pushed_filters or ['(partition-pruned)']}"
    )

    spark.stop()


if __name__ == "__main__":
    main()
