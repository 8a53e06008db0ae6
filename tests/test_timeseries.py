"""As-of join unit semantics + validate_dfs API."""

from datetime import datetime

from pyspark.sql import Row

from dce_spark import validate_dfs
from dce_spark.ext.timeseries import asof_join


def ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_asof_join_basic(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", t=ts(9), seq=1, px=10.0),
            Row(sym="A", t=ts(11), seq=3, px=12.0),
            Row(sym="B", t=ts(10), seq=2, px=20.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", t=ts(10), seq=10),  # after 9:00 quote -> 10.0
            Row(sym="A", t=ts(12), seq=11),  # after 11:00 quote -> 12.0
            Row(sym="B", t=ts(9), seq=12),  # before any B quote -> null
            Row(sym="C", t=ts(9), seq=13),  # no quotes at all -> null
        ]
    )
    out = {
        r["seq"]: r["last_px"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="t", right_ts="t",
            right_value="px", tiebreak="seq", value_alias="last_px",
        ).collect()
    }
    assert out == {10: 10.0, 11: 12.0, 12: None, 13: None}


def test_asof_join_strictly_before_on_tie(spark):
    # same timestamp: tiebreak decides; right row with higher tiebreak
    # does NOT match (strictly-earlier semantics)
    quotes = spark.createDataFrame([Row(sym="A", t=ts(10), seq=5, px=1.0)])
    trades = spark.createDataFrame(
        [Row(sym="A", t=ts(10), seq=4), Row(sym="A", t=ts(10), seq=6)]
    )
    out = {
        r["seq"]: r["v"]
        for r in asof_join(
            trades, quotes, on="sym", left_ts="t", right_ts="t",
            right_value="px", tiebreak="seq", value_alias="v",
        ).collect()
    }
    assert out == {4: None, 6: 1.0}


def test_validate_dfs_union(spark):
    contract = """
version: "1"
name: t
owner: me
schema:
  fields:
    - {name: id, type: int64, nullable: false}
quality_checks:
  uniqueness:
    fields: [id]
"""
    a = spark.createDataFrame([Row(id=1), Row(id=2)])
    b = spark.createDataFrame([Row(id=2), Row(id=3)])  # dup across frames
    report = validate_dfs(spark, [a, b], contract)
    assert report.stats.records_validated == 4
    checks = {c.name: c for c in report.checks}
    assert checks["quality.uniqueness:id"].observed["duplicates"] == 1
