"""Round-8 STAGED queries: same parity harness as the live catalog
(exact column order, canonical dtypes, sorted-value compare) so
promotion in round 8 is a registration move, not new verification.
These are deliberately NOT in dce_spark.queries.QUERIES — the round-7
catalog froze at the driver-window rotation (the r1-r3 unchecked-tail
lesson, same protocol queries_staging_r5/r6/r7 followed in earlier
rounds). Extra tests prove the cohort's trickiest determinism claims
by independent brute force.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r8 import STAGED_R8, staged_oracle

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


@pytest.mark.parametrize("name", sorted(STAGED_R8))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R8[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    """The freeze: staged queries must stay OUT of the live catalog
    until round 8 rotates them into the driver window."""
    from dce_spark.queries import QUERIES

    assert not (set(STAGED_R8) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED_R8))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R8[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    """Every staged entry must carry a scale-reasoned doc and a
    non-empty eager oracle, and no staged name may collide with the
    live catalog or the current driver window — the invariants the
    round-8 promotion loop will rely on."""
    from dce_spark.queries import _DRIVER_WINDOW, QUERIES

    assert len(STAGED_R8) == 20
    for name, spec in STAGED_R8.items():
        assert len(spec.doc) > 80, name  # real doc, not a stub
        assert spec.oracle.strip().upper().startswith(("WITH", "SELECT")), name
        assert spec.oracle == staged_oracle(name), name
        assert name not in QUERIES, name
        assert name not in _DRIVER_WINDOW, name


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
