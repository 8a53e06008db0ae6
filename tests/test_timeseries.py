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


def test_asof_join_tolerance_boundary(spark):
    """tolerance semantics: a match EXACTLY tolerance old is still
    fresh (>=); one microsecond older is NULL; rows with no prior
    match stay NULL; tolerance=None keeps stale matches (backwards
    compatible)."""
    L = [
        Row(k=1, ts=datetime(2024, 1, 1, 12, 0, 0), lid=10),  # fresh (30m)
        Row(k=1, ts=datetime(2024, 1, 1, 14, 30, 0), lid=11),  # exactly 2h
        Row(k=2, ts=datetime(2024, 1, 1, 12, 0, 0), lid=20),  # stale (3h)
        Row(k=2, ts=datetime(2024, 1, 1, 12, 0, 0, 1), lid=21),  # 3h + 1us
        Row(k=3, ts=datetime(2024, 1, 1, 12, 0, 0), lid=30),  # no prior
    ]
    R = [
        Row(k=1, ts=datetime(2024, 1, 1, 11, 30, 0), rid=100),
        Row(k=1, ts=datetime(2024, 1, 1, 12, 30, 0), rid=101),
        Row(k=2, ts=datetime(2024, 1, 1, 9, 0, 0), rid=200),
    ]
    left = spark.createDataFrame(L).withColumnRenamed("lid", "tb")
    right = spark.createDataFrame(R).withColumnRenamed("rid", "tb")

    def run(tol):
        out = asof_join(
            left.selectExpr("k", "ts", "tb", "tb AS lid"),
            right.selectExpr("k", "ts", "tb", "tb AS rid"),
            on="k", left_ts="ts", right_ts="ts",
            right_value="rid", tiebreak="tb", tolerance=tol,
        )
        return {r["lid"]: r["asof_value"] for r in out.collect()}

    tol = run("2 HOURS")
    assert tol[10] == 100        # 30m old: fresh
    assert tol[11] == 101        # exactly 2h old: still fresh (>=)
    assert tol[20] is None       # 3h old: stale
    assert tol[21] is None       # 3h + 1us: stale
    assert tol[30] is None       # no prior match
    none = run(None)
    assert none[20] == 200 and none[21] == 200  # stale kept without tolerance
    assert none[11] == 101 and none[30] is None
