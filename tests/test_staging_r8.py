"""Round-8 promotion regression: the twenty queries staged in round 7
are now LIVE catalog entries (registered from queries_more.py). Their
parity and plan-audit coverage moved to the catalog-wide suites
(test_oracle_parity.py / test_catalog_scalable.py run over QUERIES);
this file locks the promotion itself — the same shape
test_staging_r5/r6/r7.py took after their promotions — plus the
staged cohort's extra determinism proofs (binseg exhaustive
brute-force, integer autocorrelation, reorder-depth sequential
replay, MMR greedy properties), which stay valid against the
promoted entries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dce_spark.queries_staging_r8 import STAGED_R8, staged_oracle

from conftest import SF_DIR


def test_staged_queries_promoted():
    from dce_spark.queries import QUERIES

    assert len(STAGED_R8) == 20
    for name, spec in STAGED_R8.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-8 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r08 rows;
    the round-9 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5..r7 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r08.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R8:
        assert name in rows, f"{name} never driver-checked in r8"
        assert rows[name]["hash_match"], f"{name} r8 driver row not green"


def test_staged_oracles_eager():
    """Round-8 staged oracles are eager strings by construction; the
    promotion loop asserts identity at import — re-assert here so a
    staging-module refactor can't reintroduce lazy empties."""
    from dce_spark import queries  # noqa: F401  (triggers registration)

    for name, spec in STAGED_R8.items():
        assert spec.oracle, f"{name}.oracle empty"
        assert spec.oracle == staged_oracle(name)


def test_promotion_survives_staging_first_import():
    """The r8 staging module bootstraps the catalog chain BEFORE
    defining STAGED_R8, so a staging-first import reaches the
    promotion loop with no entries at all (not even the r7 prefix
    case). The loop must bail and the tail hook must complete the
    catalog. The old in-suite form of this test could not exercise
    that order — module caching means whichever import order conftest
    already produced is the only one visible (round-8 ADVICE) — so
    prove the staging-first order in a fresh interpreter."""
    import subprocess
    import sys

    code = (
        "import dce_spark.queries_staging_r8\n"
        "from dce_spark.queries import QUERIES\n"
        "from dce_spark.queries_staging_r8 import STAGED_R8\n"
        "missing = set(STAGED_R8) - set(QUERIES)\n"
        "assert not missing, missing\n"
        "assert len(STAGED_R8) == 20\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


def test_binseg_matches_exhaustive_bruteforce(spark):
    """binseg_changepoint_events' prefix-sum argmax must equal a
    driver-side exhaustive scan over every split of the collected
    daily series (textbook SSE-reduction definition)."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r8 import STAGED_R8

    daily = sorted(
        (r["day"], r["n"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ns = [n for _, n in daily]
    k, t = len(ns), sum(ns)
    best = None
    for s in range(1, k):  # split after index s (1-based idx == s)
        sl = sum(ns[:s])
        score = round(sl * sl / s + (t - sl) * (t - sl) / (k - s), 9)
        if best is None or score > best[1]:
            best = (s, score)
    s, score = best
    sl = sum(ns[:s])
    row = STAGED_R8["binseg_changepoint_events"].fn(spark, SF_DIR).collect()[0]
    assert row["n_days"] == k
    assert row["split_day"] == daily[s - 1][0].strftime("%Y-%m-%d")
    assert row["left_mean"] == round(sl / s, 6)
    assert row["right_mean"] == round((t - sl) / (k - s), 6)
    # sse reduction equals the variance explained by the best split
    expected_red = sl * sl / s + (t - sl) * (t - sl) / (k - s) - t * t / k
    assert abs(row["sse_reduction"] - expected_red) < 1e-5
    spark.catalog.clearCache()


def test_autocorrelation_matches_integer_bruteforce(spark):
    """The scaled-integer autocorrelation must equal the textbook
    formula computed driver-side in exact Python ints."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r8 import STAGED_R8

    daily = sorted(
        (r["day"], r["n"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ns = [n for _, n in daily]
    k, t = len(ns), sum(ns)
    y = [k * n - t for n in ns]
    den = sum(v * v for v in y)
    got = {
        r["lag"]: (r["n_pairs"], r["autocorr"])
        for r in STAGED_R8["autocorrelation_daily_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    for lag in (1, 7):
        num = sum(y[i] * y[i + lag] for i in range(k - lag))
        assert got[lag][0] == k - lag
        assert got[lag][1] == round(num / den, 6), lag
    spark.catalog.clearCache()


def test_reorder_depth_matches_naive_driver_replay(spark):
    """The two-level (batch-partitioned) running max must equal a
    naive sequential replay over the arrival order — the scalability
    trick cannot change the answer."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r8 import STAGED_R8

    rows = sorted(
        (int(r["event_id"]), int(r["es"]))
        for r in load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.unix_timestamp(
                F.when(
                    F.col("event_id") % 7 == 0,
                    F.col("ts") - F.expr("INTERVAL 96 HOURS"),
                ).otherwise(F.col("ts"))
            ).alias("es"),
        )
        .collect()
    )
    hi = None
    depths = []
    for _, es in rows:
        hi = es if hi is None else max(hi, es)
        depths.append(hi - es)
    inv = [d for d in depths if d > 0]
    row = STAGED_R8["reorder_depth_events"].fn(spark, SF_DIR).collect()[0]
    assert row["n_events"] == len(depths)
    assert row["n_inverted"] == len(inv)
    assert row["max_depth_s"] == max(depths)
    spark.catalog.clearCache()


def test_mmr_selection_properties(spark):
    """MMR output must be 5 distinct members of the exact top-20 pool,
    led by the highest-similarity vector, with non-increasing scores
    after rank 1 (greedy argmax over a shrinking candidate set)."""
    from dce_spark.data import load_table
    from dce_spark.ext.similarity import cosine_topk
    from dce_spark.queries_staging_r8 import STAGED_R8

    emb = load_table(spark, SF_DIR, "embeddings")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    pool = cosine_topk(
        emb.filter(F.col("vec_id") != 0), qvec, k=20, round_digits=9
    ).collect()
    pool_ids = [int(r["vec_id"]) for r in pool]
    top1 = max(pool, key=lambda r: (r["cos_sim"], -r["vec_id"]))
    out = sorted(
        STAGED_R8["mmr_diversified_topk_embeddings"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: r["rank"],
    )
    ids = [int(r["vec_id"]) for r in out]
    assert len(ids) == len(set(ids)) == 5
    assert set(ids) <= set(pool_ids)
    assert ids[0] == int(top1["vec_id"])
    spark.catalog.clearCache()
