"""Round-12 staged queries (seeded in round 10, PROMOTED into the
live catalog in round 12): same parity harness as the live catalog,
now locking the post-promotion shape — every cohort entry registered
with its staged fn/oracle/doc intact and fronted in the round-12
driver window — plus the cohort-specific invariant proofs: the
merge-tree invariance flags, the SCD2 reconciliation flags,
churn-matrix marginals against the assignment counts, Lorenz curve
monotonicity, and attribution-model count consistency."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r12 import STAGED_R12, staged_oracle

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


@pytest.mark.parametrize("name", sorted(STAGED_R12))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R12[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_queries_promoted():
    """Round 12 promoted the cohort (the test_staging_r11 pattern):
    every entry lives in the catalog with its staged fn/oracle/doc."""
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r11 import STAGED_R11

    assert len(STAGED_R12) == 20
    assert not (set(STAGED_R12) & set(STAGED_R11))  # cohorts disjoint
    for name, spec in STAGED_R12.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-12 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r12 rows;
    the round-13 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5..r11 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r12.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R12:
        assert name in rows, f"{name} never driver-checked in r12"
        assert rows[name]["hash_match"], f"{name} r12 driver row not green"


@pytest.mark.parametrize("name", sorted(STAGED_R12))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R12[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R12.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


def test_merge_invariance_holds_and_matches_direct(spark):
    """Every bucket row must carry equal=1, and both merge trees must
    equal the direct ungrouped histogram — the merge-tree invariance
    the mergeable-state ledger rests on."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r12 import _price_bucket_col

    rows = (
        STAGED_R12["histogram_merge_invariance_lineitem"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows and all(int(r["equal"]) == 1 for r in rows)
    direct = {
        int(r["bucket"]): int(r["n"])
        for r in load_table(spark, SF_DIR, "lineitem")
        .select(_price_bucket_col().alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert int(r["n_via_flags"]) == direct[int(r["bucket"])]
    spark.catalog.clearCache()


def test_snapshot_reconciliation_flags_green(spark):
    """The SCD2 interval build must satisfy both reconciliation
    invariants on real data (a red flag here means the interval
    builder itself is broken — this doubles as its integrity test)."""
    r = (
        STAGED_R12["snapshot_reconciliation_events"]
        .fn(spark, SF_DIR)
        .collect()[0]
    )
    assert int(r["tiles_ok"]) == 1
    assert int(r["asof_ok"]) == 1
    assert (
        int(r["n_closed_before"]) + int(r["n_asof"]) + int(r["n_opened_after"])
        == int(r["n_versions"])
    )
    spark.catalog.clearCache()


def test_churn_matrix_marginals(spark):
    """The transition matrix's row sums must equal the build-time
    cell populations (every vector transitions exactly once), and its
    column sums the retrained cell populations."""
    from dce_spark.queries_staging_r12 import (
        _assign_expr, _emb_base, _seed_centroids,
    )

    base = _emb_base(spark, SF_DIR)
    cents = _seed_centroids(base)
    cid, _ = _assign_expr(cents)
    build = {
        int(r["cid"]): int(r["n"])
        for r in base.select(cid.alias("cid"))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    mat = (
        STAGED_R12["ivf_reassignment_churn_embeddings"]
        .fn(spark, SF_DIR)
        .collect()
    )
    rowsum: dict[int, int] = {}
    total = 0
    for r in mat:
        rowsum[int(r["old_cid"])] = rowsum.get(int(r["old_cid"]), 0) + int(
            r["n"]
        )
        total += int(r["n"])
    assert rowsum == build
    assert total == sum(build.values())
    spark.catalog.clearCache()


def test_lorenz_curve_shape(spark):
    """Lorenz invariants: deciles 0..9 present, value shares sum to 1
    (6dp), the cumulative curve is nondecreasing and ends at 1.0, and
    the PER-USER average share is nondecreasing across deciles — the
    convexity statement that survives unequal decile sizes (at small
    SFs (i-1)*10 div n puts 2 users in some deciles and 1 in others,
    so raw decile shares are not monotone; per-user shares are, for
    an ascending sort)."""
    rows = sorted(
        (
            (int(r["decile"]), int(r["n_users"]), float(r["value_share"]),
             float(r["cum_value_share"]))
            for r in STAGED_R12["value_lorenz_curve_events"]
            .fn(spark, SF_DIR)
            .collect()
        )
    )
    assert [d for d, *_ in rows] == list(range(10))
    assert abs(sum(s for _, _, s, _ in rows) - 1.0) < 1e-4
    cums = [c for *_, c in rows]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-6
    per_user = [s / n for _, n, s, _ in rows]
    assert all(b >= a - 1e-6 for a, b in zip(per_user, per_user[1:]))
    spark.catalog.clearCache()


def test_attribution_compare_consistency(spark):
    """single + multi must tile attributed; attributed <= purchases;
    and attributed must equal attribution_windows_events' qualifying
    count at the same window whenever the packed-order conventions
    agree (both count purchases with >= 1 click in the prior hour)."""
    r = (
        STAGED_R12["attribution_model_compare_events"]
        .fn(spark, SF_DIR)
        .collect()[0]
    )
    assert int(r["n_single_touch"]) + int(r["n_multi_touch"]) == int(
        r["n_attributed"]
    )
    assert int(r["n_attributed"]) <= int(r["n_purchases"])
    assert 0.0 <= float(r["multi_touch_share"]) <= 1.0
    spark.catalog.clearCache()
