"""Structured Streaming contract enforcement (extension; SURVEY §2.9)."""

import time

from pyspark.sql import Row, functions as F

from dce_spark.parser import parse_yaml
from dce_spark.streaming import streaming_quality_aggregates, validate_stream

CONTRACT = parse_yaml(
    """
version: "1.0.0"
name: stream_events
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


def test_validate_stream_per_batch(spark, tmp_path):
    reports = {}

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            F.col("value").alias("id"),
            F.when(F.col("value") % 10 == 0, "zzz").otherwise("a").alias("kind"),
            F.col("timestamp").alias("ts"),
        )
    )
    q = validate_stream(
        spark,
        src,
        CONTRACT,
        on_report=lambda bid, rep: reports.setdefault(bid, rep),
        checkpointLocation=str(tmp_path / "ckpt"),
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            done = [r for r in reports.values() if r.stats.records_validated > 0]
            if done:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert done, "no non-empty micro-batch validated within 60s"
    rep = done[0]
    # every 10th row violates allowed-values -> report fails
    assert not rep.passed
    names = {c.name for c in rep.checks}
    assert "constraints.allowedvalues:kind" in names


def test_streaming_quality_aggregates_plan(spark):
    # plan-level check: the windowed aggregate compiles and is streaming
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.col("value").alias("id"),
            F.lit("a").alias("kind"),
            F.col("timestamp").alias("ts"),
        )
    )
    out = streaming_quality_aggregates(src, CONTRACT, ts_col="ts")
    assert out.isStreaming
    cols = set(out.columns)
    assert {"window_start", "window_end", "n_rows", "nulls_id", "viol_kind_0"} <= cols


def test_batch_equivalence_of_quality_aggregates(spark):
    # the same aggregate expressions over a static frame give the counts
    from datetime import datetime

    df = spark.createDataFrame(
        [
            Row(id=1, kind="a", ts=datetime(2024, 1, 1, 0, 0, 10)),
            Row(id=None, kind="zzz", ts=datetime(2024, 1, 1, 0, 0, 20)),
        ]
    )
    from dce_spark.checks.constraints import violation_expr

    kind_check = CONTRACT.schema.fields[1].constraints[0]
    agg = df.agg(
        F.sum(F.col("id").isNull().cast("long")).alias("nulls_id"),
        F.sum(violation_expr(F.col("kind"), kind_check).cast("long")).alias("viol"),
    ).collect()[0]
    assert agg["nulls_id"] == 1 and agg["viol"] == 1
