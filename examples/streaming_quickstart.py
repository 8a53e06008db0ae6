#!/usr/bin/env python
"""Streaming enforcement quickstart: contract validation, windowed QC,
and drift monitoring on a live rate source.

Runs ~15 seconds against Spark's built-in rate source (no external
infra), printing per-microbatch validation reports and the windowed
quality aggregate schema, then exits. Swap the rate source for
`readStream.format("kafka")`/cloud files in production — every operator
here is source-agnostic.

    python examples/streaming_quickstart.py
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.parser import parse_yaml  # noqa: E402
from dce_spark.streaming import (  # noqa: E402
    streaming_binned_drift,
    streaming_quality_aggregates,
    validate_stream,
)

CONTRACT = parse_yaml(
    """
version: "1.0.0"
name: live_events
owner: data-eng
schema:
  fields:
    - name: id
      type: int64
      nullable: false
    - name: kind
      type: string
      constraints:
        - type: allowedvalues
          values: [a, b]
    - name: ts
      type: timestamp
"""
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("streaming-quickstart")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .select(
            F.col("value").alias("id"),
            F.when(F.col("value") % 10 == 0, "zzz").otherwise("a").alias("kind"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 10).cast("double").alias("metric"),
        )
    )

    # 1. per-microbatch contract validation (same fused compiler as batch)
    def on_report(batch_id, report):
        print(
            f"batch {batch_id}: passed={report.passed} "
            f"records={report.stats.records_validated} "
            f"errors={len(report.errors)} warnings={len(report.warnings)}"
        )

    vq = validate_stream(spark, src, CONTRACT, on_report=on_report)

    # 2. continuous windowed QC aggregate (watermarked state)
    qc = streaming_quality_aggregates(src, CONTRACT, ts_col="ts",
                                      window_duration="5 seconds",
                                      watermark_delay="10 seconds")
    print("windowed QC columns:", qc.columns)

    # 3. drift vs a uniform reference over the metric column
    drift = streaming_binned_drift(
        src, "metric", "ts", ref_min=0.0, ref_max=9.0,
        ref_props=[0.2] * 5, window_duration="5 seconds",
    )
    dq = (
        drift.writeStream.format("memory").queryName("drift_live")
        .outputMode("update").start()
    )

    time.sleep(15)
    n = spark.sql("SELECT count(*) AS n FROM drift_live").head()["n"]
    print(f"drift rows emitted: {n}")
    vq.stop()
    dq.stop()
    spark.stop()


if __name__ == "__main__":
    main()
