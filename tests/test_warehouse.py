"""Unit tests for ext/warehouse — the CDC / SCD2 / point-in-time /
attribution operators' edge semantics on hand-built frames (the
staged round-9 catalog queries pin them against DuckDB oracles on the
real tables)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from dce_spark.ext.warehouse import (
    last_event_attribution,
    last_write_wins,
    pit_window_features,
    scd2_intervals,
)

TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(s):
    return TS0 + dt.timedelta(seconds=s)


def test_last_write_wins_picks_latest_and_counts_versions(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(10), i=1, v=1.0),
            Row(k="a", ts=_ts(30), i=2, v=3.0),
            Row(k="a", ts=_ts(20), i=3, v=2.0),
            Row(k="b", ts=_ts(5), i=4, v=9.0),
            # same ts as i=4: the higher tiebreak id wins
            Row(k="b", ts=_ts(5), i=5, v=7.0),
        ]
    )
    out = {
        r["k"]: (int(r["last_i"]), float(r["last_v"]), int(r["n_versions"]))
        for r in last_write_wins(df, ["k"], ["ts", "i"], ["v"]).collect()
    }
    assert out == {"a": (2, 3.0, 3), "b": (5, 7.0, 2)}


def test_scd2_single_attr_value_yields_one_open_interval(spark):
    df = spark.createDataFrame(
        [Row(k="u", a="x", ts=_ts(i), i=i) for i in range(4)]
    )
    rows = scd2_intervals(df, "k", "a", "ts", "i").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        int(r["version_no"]),
        r["a"],
        r["valid_from"],
        r["valid_to"],
        int(r["n_rows"]),
    ) == (1, "x", _ts(0), None, 4)


def test_scd2_reverting_value_opens_a_new_version(spark):
    # x -> y -> x is THREE versions, not two (type-2 keeps history)
    df = spark.createDataFrame(
        [
            Row(k="u", a="x", ts=_ts(0), i=0),
            Row(k="u", a="y", ts=_ts(10), i=1),
            Row(k="u", a="x", ts=_ts(20), i=2),
        ]
    )
    rows = sorted(
        scd2_intervals(df, "k", "a", "ts", "i").collect(),
        key=lambda r: int(r["version_no"]),
    )
    assert [(r["a"], r["valid_from"], r["valid_to"]) for r in rows] == [
        ("x", _ts(0), _ts(10)),
        ("y", _ts(10), _ts(20)),
        ("x", _ts(20), None),
    ]


def test_pit_features_exclude_same_second_and_horizon_edge(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, t=100, v=1.0),
            Row(k=1, t=200, v=2.0),
            # same second as the row below: must NOT be visible to it
            Row(k=1, t=300, v=4.0),
            Row(k=1, t=300, v=8.0),
            # exactly horizon seconds after t=100: 100 is still inside
            Row(k=1, t=100 + 250, v=16.0),
        ]
    )
    out = pit_window_features(df, "k", "t", "v", horizon_s=250)
    got = {
        (int(r["t"]), float(r["v"])): (
            int(r["pit_n_prior"]),
            float(r["pit_sum_value"]),
            None if r["pit_last_gap_s"] is None else int(r["pit_last_gap_s"]),
        )
        for r in out.collect()
    }
    assert got[(100, 1.0)] == (0, 0.0, None)
    assert got[(200, 2.0)] == (1, 1.0, 100)
    # the two t=300 rows see ONLY t=100 (outside: 300-250=50<=100 ok,
    # inside) and t=200 — never each other
    assert got[(300, 4.0)] == (2, 3.0, 100)
    assert got[(300, 8.0)] == (2, 3.0, 100)
    # t=350: window [100, 349] -> sees 100, 200, 300, 300
    assert got[(350, 16.0)] == (4, 15.0, 50)


def test_attribution_window_boundary_and_source_choice(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(0), i=1, et="click"),
            Row(k=1, ts=_ts(50), i=2, et="click"),
            # exactly window_s after the last click: still attributed
            Row(k=1, ts=_ts(150), i=3, et="purchase"),
            # 101 s after the last click: outside the 100 s window
            Row(k=1, ts=_ts(151), i=4, et="purchase"),
            # no prior click at all for this user
            Row(k=2, ts=_ts(10), i=5, et="purchase"),
        ]
    )
    out = last_event_attribution(
        df, "k", "ts", "i", F.col("et") == "click", window_s=100
    )
    got = {
        int(r["i"]): (
            None if r["attr_source_id"] is None else int(r["attr_source_id"]),
            None if r["attr_gap_s"] is None else int(r["attr_gap_s"]),
        )
        for r in out.filter(F.col("et") == "purchase").collect()
    }
    assert got == {3: (2, 100), 4: (None, None), 5: (None, None)}
