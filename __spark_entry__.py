"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship workload: a full data contract
(schema + constraints + completeness/uniqueness/freshness + custom SQL
+ ML checks) validated over the sf0.001 events table in ONE fused
aggregation pass + a handful of grouped jobs, returning the per-check
results as a DataFrame.

``queries()`` / ``oracle_sql()`` expose the named operator catalog from
dce_spark/queries.py — one entry per SURVEY.md §2 operator plus the
training-data-pipeline extensions — each paired with DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dce_spark import queries as Q
from dce_spark import validate_df
from dce_spark.data import load_table

_FLAGSHIP_CONTRACT = """
version: "1.0.0"
name: events
owner: data-eng
description: flagship contract over the synthetic events stream

schema:
  format: parquet
  location: /root/testdata/sf0.001/events.parquet
  fields:
    - name: event_id
      type: int64
      nullable: false
    - name: ts
      type: timestamp
      nullable: false
    - name: user_id
      type: int64
      nullable: false
    - name: event_type
      type: string
      nullable: false
      constraints:
        - type: allowedvalues
          values: [view, click, purchase, signup, error]
    - name: value
      type: float64
      constraints:
        - type: range
          min: -1000000
          max: 1000000
    - name: props
      type: string

quality_checks:
  completeness:
    threshold: 0.99
    fields: [event_id, ts, user_id, event_type]
  uniqueness:
    fields: [event_id]
  freshness:
    max_delay: 1w
    metric: ts
  custom_checks:
    - name: no_negative_event_ids
      definition: "SELECT COUNT(*) FROM data WHERE event_id < 0"
      severity: error
  ml_checks:
    class_balance:
      label_field: event_type
      max_proportion: 0.95
    target_leakage:
      target_field: value
      feature_fields: [user_id]
      max_correlation: 0.99
"""

_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("severity", T.StringType(), False),
        T.StructField("field", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
    ]
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datetime import datetime, timezone

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    report = validate_df(
        spark,
        df,
        _FLAGSHIP_CONTRACT,
        now=datetime(2024, 2, 1, tzinfo=timezone.utc),
    )
    rows = [
        (c.name, c.category, c.passed, c.severity, c.field, c.message)
        for c in report.checks
    ]
    return spark.createDataFrame(rows, schema=_REPORT_SCHEMA)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ ext)."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return Q.oracle_sql()
