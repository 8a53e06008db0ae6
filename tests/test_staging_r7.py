"""Round-7 promotion regression: the twenty queries staged in round 6
are now LIVE catalog entries (registered from queries_more.py). Their
parity and plan-audit coverage moved to the catalog-wide suites
(test_oracle_parity.py / test_catalog_scalable.py run over QUERIES);
this file locks the promotion itself — the same shape
test_staging_r5/r6.py took after their promotions — plus the staged
cohort's extra determinism proofs (CUSUM closed form, burstiness
partitioning invariance, rolling-window and Gini brute-force
equivalence), which stay valid against the promoted entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dce_spark.queries_staging_r7 import STAGED_R7, staged_oracle

from conftest import SF_DIR


def test_staged_queries_promoted():
    from dce_spark.queries import QUERIES

    assert len(STAGED_R7) == 20
    for name, spec in STAGED_R7.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-7 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r07 rows;
    the round-8 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r07.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R7:
        assert name in rows, f"{name} never driver-checked in r7"
        assert rows[name]["hash_match"], f"{name} r7 driver row not green"


def test_staged_oracles_eager():
    """Round-7 staged oracles are eager strings by construction (the
    round-6 backfill lesson); the promotion loop asserts identity at
    import — re-assert here so a staging-module refactor can't
    reintroduce lazy empties."""
    from dce_spark import queries  # noqa: F401  (triggers registration)

    for name, spec in STAGED_R7.items():
        assert spec.oracle, f"{name}.oracle empty"
        assert spec.oracle == staged_oracle(name)


def test_cusum_closed_form_matches_recursive_fold(spark):
    """cusum_drift_events computes Page's CUSUM without recursion as
    S_t - min(S_0..S_t) / max(S_0..S_t) - S_t. Prove the identity
    against the textbook recursive fold C_t = max(0, C_{t-1} + d_t)
    replayed driver-side over the same daily series."""
    from pyspark.sql import functions as F

    from dce_spark.data import load_table
    from dce_spark.queries_staging_r7 import STAGED_R7

    daily = sorted(
        (r["day"], r["cnt"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    n = len(daily)
    t = sum(c for _, c in daily)
    cpos = cneg = 0
    max_pos = max_neg = 0
    peak_day = None
    for day, c in daily:
        d = c * n - t  # scaled integer deviation (exact)
        cpos = max(0, cpos + d)
        cneg = max(0, cneg - d)
        if cpos > max_pos:
            max_pos, peak_day = cpos, day
        elif cpos == max_pos and peak_day is None:
            peak_day = day
        max_neg = max(max_neg, cneg)
    # min day among ALL rows attaining the max (query tie-break)
    cpos = 0
    attain = []
    for day, c in daily:
        cpos = max(0, cpos + c * n - t)
        if cpos == max_pos:
            attain.append(day)
    row = STAGED_R7["cusum_drift_events"].fn(spark, SF_DIR).collect()[0]
    assert row["n_days"] == n
    assert row["max_cusum_pos"] == round(max_pos / n, 6)
    assert row["max_cusum_neg"] == round(max_neg / n, 6)
    assert row["peak_day"] == min(attain)
    spark.catalog.clearCache()


def test_burstiness_partitioning_invariant(spark):
    """burstiness_events' per-user moments are exact integers, so the
    result must not depend on the input's physical partitioning (the
    kmeans/PQ determinism contract applied to window+aggregate)."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r7 import STAGED_R7

    base = tuple(
        STAGED_R7["burstiness_events"].fn(spark, SF_DIR).collect()[0]
    )

    import dce_spark.queries_staging_r7 as S
    from dce_spark import data as D

    orig = D.load_table
    try:
        D.load_table = lambda sp, sf, name: orig(sp, sf, name).repartition(13)
        S.load_table = D.load_table
        got = tuple(
            STAGED_R7["burstiness_events"].fn(spark, SF_DIR).collect()[0]
        )
    finally:
        D.load_table = orig
        S.load_table = orig
    assert got == base
    spark.catalog.clearCache()


def test_rolling_active_users_matches_bruteforce(spark):
    """rolling_active_users_events' explode-based sliding distinct must
    equal a driver-side brute force: for each day, the union of user
    sets over the trailing 7 days."""
    from datetime import timedelta

    from dce_spark.data import load_table
    from dce_spark.queries_staging_r7 import STAGED_R7

    rows = (
        load_table(spark, SF_DIR, "events")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day")
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    expected = {}
    for d in days:
        users = set()
        for k in range(7):
            users |= by_day.get(d - timedelta(days=k), set())
        expected[d.strftime("%Y-%m-%d")] = len(users)
    got = {
        r["window_end_day"]: r["active_users"]
        for r in STAGED_R7["rolling_active_users_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expected
    spark.catalog.clearCache()


def test_gini_matches_bruteforce_and_bounds(spark):
    """gini_user_activity_events' rank formula must equal the
    textbook mean-absolute-difference definition computed driver-side,
    and sit in [0, 1)."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r7 import STAGED_R7

    counts = sorted(
        r["cnt"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    )
    n, t = len(counts), sum(counts)
    # G = sum_i sum_j |x_i - x_j| / (2 n^2 mu) == rank form on sorted x
    mad = sum(abs(a - b) for a in counts for b in counts)
    expected = round(mad / (2 * n * t), 6)
    row = STAGED_R7["gini_user_activity_events"].fn(spark, SF_DIR).collect()[0]
    assert row["n_users"] == n and row["total_events"] == t
    assert row["gini"] == expected, (row["gini"], expected)
    assert 0.0 <= row["gini"] < 1.0
    spark.catalog.clearCache()
