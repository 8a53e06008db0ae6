"""Round-9 STAGED queries: same parity harness as the live catalog
(exact column order, canonical dtypes, sorted-value compare) so
promotion in round 9 is a registration move, not new verification.
These are deliberately NOT in dce_spark.queries.QUERIES — the round-7
catalog froze at the driver-window rotation (the r1-r3 unchecked-tail
lesson, same protocol queries_staging_r5..r8 followed). Extra tests
prove the cohort's trickiest semantics by independent brute force.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r9 import STAGED_R9, staged_oracle

from conftest import SF_DIR
from test_oracle_parity import TABLES, compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED_R9))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R9[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    """The freeze: staged queries must stay OUT of the live catalog
    until round 9 rotates them into the driver window."""
    from dce_spark.queries import QUERIES

    assert not (set(STAGED_R9) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED_R9))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R9[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R9.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


def test_pit_features_brute_force(spark):
    """Point-in-time features recomputed row-at-a-time in Python over
    the collected table: for each purchase, count/sum/gap over the
    user's strictly-earlier-by-second events within 7 days."""
    from dce_spark.data import load_table

    ev = [
        (int(r["event_id"]), int(r["user_id"]), r["event_type"],
         int(r["es"]), float(r["v"]))
        for r in load_table(spark, SF_DIR, "events")
        .select(
            "event_id", "user_id", "event_type",
            F.unix_timestamp("ts").alias("es"),
            F.col("value").cast("double").alias("v"),
        )
        .collect()
    ]
    expect = {}
    for eid, uid, etype, es, _v in ev:
        if etype != "purchase":
            continue
        prior = [
            (es2, v2)
            for _e2, u2, _t2, es2, v2 in ev
            if u2 == uid and es - 604800 <= es2 <= es - 1
        ]
        qsum = sum(int(round(v2 * 1e6)) for _es2, v2 in prior)
        expect[eid] = (
            len(prior),
            round(float(qsum) / 1e6, 6),
            (es - max(es2 for es2, _ in prior)) if prior else None,
        )
    got = {
        int(r["event_id"]): (
            int(r["n_prior_7d"]),
            float(r["sum_value_7d"]),
            None if r["last_gap_s"] is None else int(r["last_gap_s"]),
        )
        for r in STAGED_R9["pit_features_events"].fn(spark, SF_DIR).collect()
    }
    assert got == expect


def test_scd2_intervals_tile_the_stream(spark):
    """SCD2 invariants: per user, version numbers are 1..k, intervals
    are ordered and contiguous (valid_to == next valid_from), exactly
    one open (NULL valid_to) row per user, and run event counts sum to
    the user's event count."""
    from dce_spark.data import load_table

    out = STAGED_R9["scd2_intervals_events"].fn(spark, SF_DIR).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(int(r["user_id"]), []).append(r)
    totals = {
        int(r["user_id"]): int(r["n"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(by_user) == set(totals)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: int(r["version_no"]))
        assert [int(r["version_no"]) for r in rows] == list(
            range(1, len(rows) + 1)
        )
        opens = [r for r in rows if r["valid_to_s"] is None]
        assert len(opens) == 1 and opens[0] is rows[-1]
        for a, b in zip(rows, rows[1:]):
            assert int(a["valid_to_s"]) == int(b["valid_from_s"])
            assert int(a["valid_from_s"]) <= int(a["valid_to_s"])
        assert sum(int(r["n_events"]) for r in rows) == totals[uid]
