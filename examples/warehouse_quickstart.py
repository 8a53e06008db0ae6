#!/usr/bin/env python
"""Warehouse-maintenance + training-matrix walkthrough
(:mod:`dce_spark.ext.warehouse`): the four jobs a lakehouse runs on
every ingest cycle, each in its shuffle-minimal Spark shape.

1. CDC compaction — latest version per key (the batch MERGE INTO),
   one struct-max aggregate.
2. SCD type-2 history — per-user validity intervals of the changing
   attribute, one shuffle.
3. Point-in-time feature backfill — leakage-free features for every
   purchase label from the user's strictly-earlier 7-day history,
   via a range window (never a label self-join).
4. Last-click attribution — the as-of lookup as a packed-int64
   running window max.

    python examples/warehouse_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.data import load_table  # noqa: E402
from dce_spark.ext.warehouse import (  # noqa: E402
    last_event_attribution,
    last_write_wins,
    pit_window_features,
    scd2_intervals,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("warehouse-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")

    print("== 1. CDC last-write-wins compaction (user, event_type) ==")
    compacted = last_write_wins(
        ev, ["user_id", "event_type"], ["ts", "event_id"], ["value"]
    )
    compacted.orderBy(F.desc("n_versions")).show(5, truncate=False)

    print("== 2. SCD2 history: event_type versions per user ==")
    hist = scd2_intervals(ev, "user_id", "event_type", "ts", "event_id")
    hist.groupBy("user_id").agg(
        F.max("version_no").alias("n_versions"),
        F.sum("n_rows").alias("n_events"),
    ).orderBy(F.desc("n_versions")).show(5)
    print("current (open) rows per type:")
    hist.filter(F.col("valid_to").isNull()).groupBy("event_type").count().show()

    print("== 3. Point-in-time features for purchase labels ==")
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        F.col("value").cast("double").alias("v"),
    )
    feats = pit_window_features(base, "user_id", "es", "v", horizon_s=604800)
    labels = feats.filter(F.col("event_type") == "purchase")
    labels.select(
        "event_id", "pit_n_prior", "pit_sum_value", "pit_last_gap_s"
    ).show(5)
    labels.agg(
        F.count(F.lit(1)).alias("n_labels"),
        F.round(F.avg("pit_n_prior"), 2).alias("avg_prior_events"),
        F.sum(F.col("pit_last_gap_s").isNull().cast("long")).alias(
            "cold_start_labels"
        ),
    ).show()

    print("== 4. Last-click attribution (1-hour window) ==")
    attr = last_event_attribution(
        ev, "user_id", "ts", "event_id", F.col("event_type") == "click",
        window_s=3600,
    ).filter(F.col("event_type") == "purchase")
    attr.agg(
        F.count(F.lit(1)).alias("purchases"),
        F.sum(F.col("attr_source_id").isNotNull().cast("long")).alias(
            "attributed"
        ),
        F.round(F.avg("attr_gap_s"), 1).alias("avg_gap_s"),
    ).show()

    print("== 5. The same ops LIVE: streaming upsert + online PIT ==")
    import tempfile

    from dce_spark.streaming import (
        streaming_last_write_wins,
        streaming_pit_features,
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        cols = ev.select("user_id", "event_type", "ts", "event_id", "value")
        # two micro-batches split by time: state carries across them
        cols.filter(F.dayofmonth("ts") <= 15).coalesce(1).write.parquet(
            os.path.join(src, "b0")
        )
        cols.filter(F.dayofmonth("ts") > 15).coalesce(1).write.parquet(
            os.path.join(src, "b1")
        )
        stream = (
            spark.readStream.schema(cols.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        q1 = (
            streaming_last_write_wins(stream, ["user_id", "event_type"])
            .writeStream.format("memory")
            .queryName("live_compacted")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ck1"))
            .trigger(availableNow=True)
            .start()
        )
        q1.awaitTermination(120)
        print("upsert emissions (one per touched key per micro-batch):")
        spark.sql(
            "SELECT count(*) AS emissions, count(DISTINCT user_id) AS users "
            "FROM live_compacted"
        ).show()

        q2 = (
            streaming_pit_features(stream, ["user_id"])
            .writeStream.format("memory")
            .queryName("live_features")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        print("online features == the batch backfill, row for row:")
        spark.sql(
            "SELECT count(*) AS rows_served, "
            "round(avg(pit_n_prior), 2) AS avg_prior FROM live_features"
        ).show()

    spark.stop()


if __name__ == "__main__":
    main()
