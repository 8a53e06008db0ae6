"""Source readers: the same tiny table through Parquet, CSV, NDJSON
(FIXTURES.md §4; mirrors tests/file_format_validation_test.rs), plus
contract-driven loading, sampling, schema inference, and per-day
uniqueness scope.
"""

import json

import pytest
from pyspark.sql import Row

from dce_spark import validate_df
from dce_spark.parser import parse_yaml
from dce_spark.sources import infer_contract_schema, load_source, sample

CONTRACT_TMPL = """
version: "1.0.0"
name: tiny
owner: me
schema:
  format: {fmt}
  location: {loc}
  fields:
    - name: id
      type: int64
      nullable: false
    - name: name
      type: string
      nullable: true
quality_checks:
  completeness:
    threshold: 0.5
    fields: [name]
"""

ROWS = [Row(id=1, name="a"), Row(id=2, name=None), Row(id=3, name="c")]


@pytest.fixture(scope="module")
def paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("formats")
    df = spark.createDataFrame(ROWS)
    pq = str(base / "t.parquet")
    df.write.parquet(pq)
    csv = str(base / "t.csv")
    df.write.option("header", "true").csv(csv)
    nd = str(base / "t.json")
    df.write.json(nd)
    orc = str(base / "t.orc")
    df.write.orc(orc)
    return {"parquet": pq, "csv": csv, "json": nd, "orc": orc}


# orc is a built-in Spark source: the reference declares it but falls
# back to schema-only (validate.rs:88-98) — here it validates for real
@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_read_and_validate_each_format(spark, paths, fmt):
    contract = parse_yaml(CONTRACT_TMPL.format(fmt=fmt, loc=paths[fmt]))
    from dce_spark.sources import load_contract_source

    df = load_contract_source(spark, contract)
    assert df.count() == 3
    report = validate_df(spark, df, contract)
    assert report.passed, report.errors
    # declared schema respected for text formats (no inference drift)
    assert dict(df.dtypes)["id"] == "bigint"


def test_unsupported_format_raises(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        load_source(spark, "carrier-pigeon", "/tmp/x")


def test_sample_head_semantics(spark, paths):
    df = load_source(spark, "parquet", paths["parquet"])
    assert sample(df, 2).count() == 2
    assert sample(df, None).count() == 3


def test_infer_contract_schema(spark, paths):
    schema = infer_contract_schema(spark, "parquet", paths["parquet"])
    by_name = {f.name: f for f in schema.fields}
    assert by_name["id"].type == "int64"
    assert by_name["name"].type == "string"
    assert schema.location == paths["parquet"]


def test_per_day_uniqueness_scope(spark):
    from datetime import datetime

    contract = """
version: "1.0.0"
name: t
owner: me
schema:
  fields:
    - {name: k, type: int64}
    - {name: ts, type: timestamp}
quality_checks:
  uniqueness:
    fields: [k]
    scope: "per_day:ts"
"""
    same_day = spark.createDataFrame(
        [
            Row(k=1, ts=datetime(2024, 1, 1, 1)),
            Row(k=1, ts=datetime(2024, 1, 1, 2)),  # dup within day
            Row(k=2, ts=datetime(2024, 1, 1, 3)),
        ]
    )
    r = validate_df(spark, same_day, contract)
    checks = {c.name: c for c in r.checks}
    assert not checks["quality.uniqueness[per_day]:k"].passed
    cross_day = spark.createDataFrame(
        [
            Row(k=1, ts=datetime(2024, 1, 1, 1)),
            Row(k=1, ts=datetime(2024, 1, 2, 2)),  # same key, different day: OK
        ]
    )
    r2 = validate_df(spark, cross_day, contract)
    checks2 = {c.name: c for c in r2.checks}
    assert checks2["quality.uniqueness[per_day]:k"].passed
