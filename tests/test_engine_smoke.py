"""End-to-end smoke: a realistic contract over the events table."""

from datetime import datetime, timezone

from dce_spark import parse_contract_yaml, validate_df
from dce_spark.data import load_table

CONTRACT = """
version: "1.0.0"
name: events
owner: data-eng
description: synthetic events stream

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
      constraints:
        - type: pattern
          regex: "^\\\\{.*"

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
    - name: boolean_protocol
      definition: "SELECT COUNT(*) = 0 FROM data WHERE user_id < 0"
      severity: warning
"""

NOW = datetime(2024, 2, 1, tzinfo=timezone.utc)


def test_contract_passes_on_events(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    report = validate_df(spark, df, CONTRACT, now=NOW)
    assert report.errors == []
    assert report.passed
    assert report.stats.records_validated == df.count()
    cats = report.by_category()
    assert set(cats) >= {"schema", "constraints", "quality", "custom"}
    # every check individually passed
    assert all(c.passed for c in report.checks), [
        (c.name, c.message) for c in report.checks if not c.passed
    ]


def test_stale_is_warning_unless_strict(spark, sf_dir):
    """Reference severity routing (datafusion_engine.rs:88-104): a quality
    failure is a WARNING in non-strict mode — the report stays passed and
    the CLI would exit 0; strict mode promotes it to an error."""
    df = load_table(spark, sf_dir, "events")
    stale_now = datetime(2025, 1, 1, tzinfo=timezone.utc)
    report = validate_df(spark, df, CONTRACT, now=stale_now)
    fresh = [c for c in report.checks if c.name.startswith("quality.freshness")]
    assert len(fresh) == 1 and not fresh[0].passed
    assert report.passed  # non-strict: warning, not error
    assert any("stale" in w for w in report.warnings)
    assert not report.errors

    strict = validate_df(spark, df, CONTRACT, now=stale_now, strict=True)
    assert not strict.passed
    assert any("stale" in e for e in strict.errors)


def test_strict_constraint_failure_does_not_suppress_later_stages(spark, sf_dir):
    """Strict mode early-exits on SCHEMA failures only; after a constraint
    failure the quality/ML/custom stages still run (the reference gates its
    early exit on schema errors, datafusion_engine.rs:132-134)."""
    bad = CONTRACT.replace(
        "values: [view, click, purchase, signup, error]",
        "values: [view, click]",
    )
    df = load_table(spark, sf_dir, "events")
    report = validate_df(spark, df, bad, now=NOW, strict=True)
    assert not report.passed  # constraint violations are errors
    cats = {c.category for c in report.checks}
    assert {"constraints", "quality", "custom"} <= cats


def test_schema_only_runs_no_quality(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    report = validate_df(spark, df, CONTRACT, schema_only=True)
    assert report.passed
    assert all(c.category == "schema" for c in report.checks)


def test_validate_batch_arrow_and_pandas(spark):
    """Arrow-native entry points: pyarrow RecordBatch/Table and pandas
    frames validate identically to the Spark-DataFrame path (reference
    validate_batch/validate_batches parity)."""
    import pandas as pd
    import pyarrow as pa

    from dce_spark import validate_batch, validate_batches

    contract = """
version: "1.0.0"
name: t
owner: o
schema:
  fields:
    - name: id
      type: int64
      nullable: false
    - name: v
      type: float64
quality_checks:
  completeness:
    threshold: 0.99
    fields: [id]
"""
    tbl = pa.table({"id": [1, 2, 3], "v": [1.0, 2.0, None]})
    rep = validate_batch(spark, tbl, contract)
    assert rep.passed and rep.stats.records_validated == 3

    rb = tbl.to_batches()[0]
    rep2 = validate_batch(spark, rb, contract)
    assert rep2.passed and rep2.stats.records_validated == 3

    pdf = pd.DataFrame({"id": [4, 5], "v": [0.5, 0.25]})
    rep3 = validate_batches(spark, [tbl, pdf], contract)
    assert rep3.passed and rep3.stats.records_validated == 5


def test_validate_partitions_incremental(spark, tmp_path):
    """Per-partition incremental validation over a hive layout: the bad
    day fails alone, `since` limits the frontier, and each run's scan
    is partition-pruned."""
    from pyspark.sql import functions as F

    from dce_spark import validate_partitions
    from dce_spark.sinks import write_partitioned

    contract = """
version: "1.0.0"
name: daily
owner: o
schema:
  fields:
    - name: id
      type: int64
      nullable: false
    - name: v
      type: float64
      constraints:
        - type: range
          min: 0
          max: 100
    - name: day
      type: date
"""
    rows = [(i, 1.0 * i, "2024-01-01") for i in range(10)]
    rows += [(100 + i, 1.0 * i, "2024-01-02") for i in range(10)]
    rows += [(200 + i, 999.0, "2024-01-03") for i in range(10)]  # range violations
    df = spark.createDataFrame(rows, schema="id long, v double, day string")
    out = str(tmp_path / "daily")
    write_partitioned(df, out, ["day"], files_per_partition=1)

    back = spark.read.parquet(out)
    import datetime as _dt

    d1, d2, d3 = (_dt.date(2024, 1, i) for i in (1, 2, 3))
    reports = validate_partitions(spark, back, contract, "day")
    assert sorted(reports) == [d1, d2, d3]  # hive layout types the dir value
    assert reports[d1].passed and reports[d2].passed
    assert not reports[d3].passed
    assert all(r.stats.records_validated == 10 for r in reports.values())

    inc = validate_partitions(spark, back, contract, "day", since=d2)
    assert sorted(inc) == [d3]

    # the per-partition scan is pruned at the FileIndex
    plan = (
        back.filter(F.col("day") == "2024-01-03")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(day" in plan


def test_report_to_df_sink(spark, tmp_path):
    """ValidationReport.to_df: the report sink as a typed DataFrame,
    persistable as a partitioned audit table."""
    from dce_spark import validate_df
    from dce_spark.sinks import write_partitioned

    contract = """
version: "1.0.0"
name: t
owner: o
schema:
  fields:
    - name: id
      type: int64
      nullable: false
"""
    df = spark.createDataFrame([(1,), (2,)], "id long")
    rep = validate_df(spark, df, contract)
    out = rep.to_df(spark)
    from pyspark.sql import functions as F
    assert out.count() == len(rep.checks) > 0
    assert set(out.columns) == {"name", "category", "passed", "severity", "field", "message"}
    assert all(r["passed"] for r in out.collect())

    # report history as a partitioned table
    dated = out.withColumn("run_date", F.lit("2024-01-01"))
    write_partitioned(dated, str(tmp_path / "audit"), ["run_date"])
    back = spark.read.parquet(str(tmp_path / "audit"))
    assert back.count() == out.count()


def test_validate_partitions_since_string_coercion(spark, tmp_path):
    """ADVICE r3 regression: the CLI passes --since as a STRING; the
    frontier filter must coerce in Spark (Catalyst cast) instead of
    raising TypeError on date- or int-typed partition columns."""
    from dce_spark import validate_partitions
    from dce_spark.sinks import write_partitioned

    contract = """
version: "1.0.0"
name: daily
owner: o
schema:
  fields:
    - name: id
      type: int64
    - name: day
      type: date
"""
    rows = [(i, f"2024-01-0{d}") for d in (1, 2, 3) for i in range(3)]
    df = spark.createDataFrame(rows, schema="id long, day string")
    out = str(tmp_path / "daily_s")
    write_partitioned(df, out, ["day"], files_per_partition=1)
    back = spark.read.parquet(out)  # hive layout types `day` as DATE

    import datetime as _dt

    inc = validate_partitions(spark, back, contract, "day", since="2024-01-02")
    assert sorted(inc) == [_dt.date(2024, 1, 3)]

    # int-typed partition column with a string frontier
    contract_i = contract.replace("name: day\n      type: date",
                                  "name: part\n      type: int32")
    df2 = spark.createDataFrame(
        [(i, p) for p in (1, 2, 3) for i in range(3)], "id long, part int"
    )
    out2 = str(tmp_path / "daily_i")
    write_partitioned(df2, out2, ["part"], files_per_partition=1)
    inc2 = validate_partitions(
        spark, spark.read.parquet(out2), contract_i, "part", since="2"
    )
    assert sorted(inc2) == [3]


def test_validate_df_approx_distinct_kwarg(spark):
    """ADVICE r3 regression: approx_distinct threads through the public
    api.validate_df (and therefore validate_partitions / the CLI's
    --partition-col mode) into the HLL uniqueness path."""
    from dce_spark import validate_df

    contract = """
version: "1.0.0"
name: u
owner: o
schema:
  fields:
    - name: id
      type: int64
quality_checks:
  uniqueness:
    fields: [id]
"""
    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    rep = validate_df(spark, df, contract, approx_distinct=True)
    assert rep.passed
    assert any(c.category == "quality" for c in rep.checks)
