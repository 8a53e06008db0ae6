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


# ---------------------------------------------------------------------
# Randomized equivalence: the operators vs brute-force Python replays
# on adversarial frames (ties, same-second rows, singleton keys).
# Fixed seeds: deterministic, no flake.
# ---------------------------------------------------------------------


def _rand_events(seed, n_keys=5, n_rows=120):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        rows.append(
            Row(
                k=rng.randrange(n_keys),
                # coarse grid forces ts ties; id i breaks them
                ts=_ts(rng.randrange(20) * 10),
                i=i,
                et=rng.choice(["click", "purchase", "view"]),
                v=round(rng.uniform(-5, 5), 3),
            )
        )
    return rows


def test_lww_equals_window_formulation_randomized(spark):
    for seed in (1, 2, 3):
        rows = _rand_events(seed)
        df = spark.createDataFrame(rows)
        got = {
            (r["k"], r["et"]): (
                r["last_ts"], int(r["last_i"]), float(r["last_v"]),
                int(r["n_versions"]),
            )
            for r in last_write_wins(
                df, ["k", "et"], ["ts", "i"], ["v"]
            ).collect()
        }
        expect = {}
        for r in rows:
            key = (r.k, r.et)
            cur = expect.get(key)
            cand = (r.ts, r.i, r.v)
            n = (cur[3] if cur else 0) + 1
            best = cand if cur is None or cand > (cur[0], cur[1], cur[2]) \
                else (cur[0], cur[1], cur[2])
            expect[key] = (best[0], best[1], best[2], n)
        assert got == expect, f"seed {seed}"


def test_pit_features_equal_brute_force_randomized(spark):
    for seed in (11, 12):
        rows = _rand_events(seed, n_rows=80)
        base = [(r.k, r.i, int((r.ts - TS0).total_seconds()), r.v)
                for r in rows]
        df = spark.createDataFrame(
            [Row(k=k, i=i, t=t, v=v) for k, i, t, v in base]
        )
        out = pit_window_features(df, "k", "t", "v", horizon_s=40)
        got = {
            int(r["i"]): (
                int(r["pit_n_prior"]),
                round(float(r["pit_sum_value"]), 6),
                None if r["pit_last_gap_s"] is None
                else int(r["pit_last_gap_s"]),
            )
            for r in out.collect()
        }
        for k, i, t, _v in base:
            prior = [(t2, v2) for k2, i2, t2, v2 in base
                     if k2 == k and t - 40 <= t2 <= t - 1]
            q = sum(int(round(v2 * 1e6)) for _t2, v2 in prior)
            exp = (
                len(prior),
                round(q / 1e6, 6),
                (t - max(t2 for t2, _ in prior)) if prior else None,
            )
            assert got[i] == exp, f"seed {seed} row {i}"


def test_scd2_reconstructs_point_lookups_randomized(spark):
    """SCD2 correctness property: for any probe instant, the interval
    covering it carries the attr of the key's latest row at or before
    that instant."""
    for seed in (21, 22):
        rows = _rand_events(seed, n_rows=60)
        df = spark.createDataFrame(rows)
        iv = scd2_intervals(df, "k", "et", "ts", "i").collect()
        by_key = {}
        for r in iv:
            by_key.setdefault(r["k"], []).append(r)
        events = sorted(rows, key=lambda r: (r.ts, r.i))
        for probe in {r.ts for r in rows}:
            for k, ivs in by_key.items():
                latest = None
                for e in events:
                    if e.k == k and e.ts <= probe:
                        latest = e.et
                if latest is None:
                    continue
                hits = [
                    r for r in ivs
                    if r["valid_from"] <= probe
                    and (r["valid_to"] is None or probe < r["valid_to"])
                ]
                assert len(hits) == 1, f"seed {seed} {k} {probe}"
                assert hits[0]["et"] == latest, f"seed {seed} {k} {probe}"


def test_attribution_equals_brute_force_randomized(spark):
    for seed in (31, 32):
        rows = _rand_events(seed, n_rows=80)
        df = spark.createDataFrame(rows)
        out = last_event_attribution(
            df, "k", "ts", "i", F.col("et") == "click", window_s=30
        )
        got = {
            int(r["i"]): (
                None if r["attr_source_id"] is None
                else int(r["attr_source_id"]),
                None if r["attr_gap_s"] is None else int(r["attr_gap_s"]),
            )
            for r in out.collect()
        }
        by_key = {}
        for r in sorted(rows, key=lambda r: (r.ts, r.i)):
            es = int((r.ts - TS0).total_seconds())
            last = by_key.get(r.k)
            if last is not None and es - last[0] <= 30:
                exp = (last[1], es - last[0])
            else:
                exp = (None, None)
            assert got[r.i] == exp, f"seed {seed} row {r.i}"
            if r.et == "click":
                cand = (es, r.i)
                if last is None or cand > last:
                    by_key[r.k] = cand


def test_attribution_id_radix_guard_fires(spark):
    """A source row whose id breaches the packing radix must RAISE
    (round-8 ADVICE fix), not silently corrupt attributions; trigger
    rows with big ids stay un-guarded (they are never packed)."""
    import pytest

    df = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(0), i=15, et="click"),
            Row(k=1, ts=_ts(5), i=2, et="purchase"),
        ]
    )
    bad = last_event_attribution(
        df, "k", "ts", "i", F.col("et") == "click", window_s=100, id_radix=10
    )
    with pytest.raises(Exception) as exc:
        bad.collect()
    assert "id_radix" in str(exc.value) or "breaks the" in str(exc.value)
    # big id on a NON-source (trigger) row is fine: never packed
    ok = last_event_attribution(
        spark.createDataFrame(
            [
                Row(k=1, ts=_ts(0), i=3, et="click"),
                Row(k=1, ts=_ts(5), i=99, et="purchase"),
            ]
        ),
        "k", "ts", "i", F.col("et") == "click", window_s=100, id_radix=10,
    )
    row = {int(r["i"]): r for r in ok.collect()}
    assert int(row[99]["attr_source_id"]) == 3
