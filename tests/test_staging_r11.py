"""Round-11 promotion regression: the twenty queries staged in round
10 are now LIVE catalog entries (registered from queries_more.py).
Their parity and plan-audit coverage moved to the catalog-wide suites
(test_oracle_parity.py / test_catalog_scalable.py run over QUERIES);
this file locks the promotion itself — the same shape
test_staging_r5..r10.py took after their promotions — plus the staged
cohort's extra determinism proofs (merged-state == recomputed-state
for the mergeable family, snapshot classification replayed row-by-row
in Python, the quantile read-off bracketed by the exact quantile, the
centroid shift against a driver-side quantized replay), which stay
valid against the promoted entries."""

from __future__ import annotations

import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r11 import STAGED_R11, staged_oracle

from conftest import SF_DIR


def test_staged_queries_promoted():
    from dce_spark.queries import QUERIES

    assert len(STAGED_R11) == 20
    for name, spec in STAGED_R11.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-11 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r11 rows;
    the round-12 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5..r10 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r11.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R11:
        assert name in rows, f"{name} never driver-checked in r11"
        assert rows[name]["hash_match"], f"{name} r11 driver row not green"


def test_staged_oracles_eager():
    """Round-11 staged oracles are eager strings by construction; the
    promotion loop asserts identity at import — re-assert here so a
    staging-module refactor can't reintroduce lazy empties."""
    from dce_spark import queries  # noqa: F401  (triggers registration)

    for name, spec in STAGED_R11.items():
        assert spec.oracle, f"{name}.oracle empty"
        assert spec.oracle == staged_oracle(name)
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


def test_promotion_survives_staging_first_import():
    """The r11 staging module bootstraps the catalog chain BEFORE
    defining STAGED_R11, so a staging-first import reaches the
    promotion loop with no entries at all; the loop must bail and the
    tail hook must complete the catalog. Module caching means the
    in-suite import order is whatever conftest already produced
    (round-8 ADVICE), so prove the staging-first order in a fresh
    interpreter."""
    code = (
        "import dce_spark.queries_staging_r11\n"
        "from dce_spark.queries import QUERIES\n"
        "from dce_spark.queries_staging_r11 import STAGED_R11\n"
        "missing = set(STAGED_R11) - set(QUERIES)\n"
        "assert not missing, missing\n"
        "assert len(STAGED_R11) == 20\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


def test_merged_state_equals_recompute(spark):
    """The mergeable-family contract: the merged row (part_epoch = -1
    / event_type = '__all__') must equal a DIRECT global aggregation
    of the raw data, bit-for-bit — that equality is what lets the
    state merge replace the rescan."""
    from dce_spark.data import load_table

    prof = {
        int(r["part_epoch"]): r
        for r in STAGED_R11["mergeable_profile_lineitem"]
        .fn(spark, SF_DIR)
        .collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("l_quantity") * F.lit(100.0)).cast("long"))
            .cast("double")
            / F.lit(100.0)
        ).alias("sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        (
            F.sum(
                F.round(F.col("l_extendedprice") * F.lit(100.0)).cast("long")
            ).cast("double")
            / F.lit(100.0)
        ).alias("sum_price"),
    ).collect()[0]
    m = prof[-1]
    for c in ("n", "sum_qty", "min_qty", "max_qty", "sum_price"):
        assert m[c] == direct[c], c
    # and the merged row equals the sum/min/max of the visible states
    parts = [r for k, r in prof.items() if k != -1]
    assert m["n"] == sum(r["n"] for r in parts)
    assert m["min_qty"] == min(r["min_qty"] for r in parts)
    assert m["max_qty"] == max(r["max_qty"] for r in parts)

    mo = {
        r["event_type"]: r
        for r in STAGED_R11["moments_merge_events"].fn(spark, SF_DIR).collect()
    }
    assert mo["__all__"]["n"] == sum(
        r["n"] for t, r in mo.items() if t != "__all__"
    )
    spark.catalog.clearCache()


def test_histogram_quantile_read_off_brackets_exact(spark):
    """The merged-histogram quantile must bracket the exact quantile:
    the exact q-quantile of l_extendedprice lies inside the selected
    bucket's [lower_edge, upper_edge) — the bounded-error contract
    that makes the fixed-edge sketch usable as a quantile state."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r11 import _HIST_EDGES

    rows = {
        float(r["q"]): (int(r["bucket"]), int(r["cum_le"]), int(r["n_total"]))
        for r in STAGED_R11["histogram_quantile_merge_lineitem"]
        .fn(spark, SF_DIR)
        .collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    vals = sorted(
        float(r["l_extendedprice"])
        for r in li.select("l_extendedprice").collect()
    )
    import math

    for q, (bucket, cum, n) in rows.items():
        assert n == len(vals)
        assert cum >= math.ceil(q * n)
        exact = vals[math.ceil(q * n) - 1]  # the q-th order statistic
        lo = _HIST_EDGES[bucket - 1] if bucket > 0 else float("-inf")
        hi = _HIST_EDGES[bucket] if bucket < len(_HIST_EDGES) else float("inf")
        assert lo <= exact < hi, (q, bucket, exact)
    spark.catalog.clearCache()


def test_snapshot_diff_classification_brute_force(spark):
    """Replay the as-of classification row-by-row in Python over the
    collected interval table — exercising every branch (new /
    changed / unchanged) even when the data's natural churn collapses
    the query output to one class."""
    from dce_spark.queries_staging_r11 import _scd2_iv_epochs

    iv, tt = _scd2_iv_epochs(spark, SF_DIR)
    t = tt.collect()[0]
    t1, t2 = int(t["t1"]), int(t["t2"])
    by_user: dict[int, list] = {}
    for r in iv.collect():
        by_user.setdefault(int(r["user_id"]), []).append(
            (
                int(r["version_no"]),
                int(r["valid_from_s"]),
                None if r["valid_to_s"] is None else int(r["valid_to_s"]),
            )
        )

    def asof(rows, t):
        hits = [
            v for v, vf, vt in rows if vf <= t and (vt is None or vt > t)
        ]
        assert len(hits) <= 1
        return hits[0] if hits else None

    expect: dict[str, int] = {}
    for u, rows in by_user.items():
        v1, v2 = asof(rows, t1), asof(rows, t2)
        if v2 is None:
            continue  # key absent at both snapshots contributes nothing
        cls = (
            "new" if v1 is None else ("unchanged" if v1 == v2 else "changed")
        )
        expect[cls] = expect.get(cls, 0) + 1
    got = {
        r["change_class"]: int(r["n_users"])
        for r in STAGED_R11["scd2_snapshot_diff_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    # branch coverage for the classifier itself, independent of data
    assert asof([(1, 0, 10), (2, 10, None)], 5) == 1
    assert asof([(1, 0, 10), (2, 10, None)], 10) == 2
    assert asof([(1, 100, None)], 5) is None
    spark.catalog.clearCache()


def test_centroid_shift_driver_replay(spark):
    """Quantized replay: recompute one cell's half-centroids and L2
    shift in exact Python arithmetic from the collected assignments;
    must match the query to the 6dp it reports."""
    from dce_spark.queries_staging_r11 import (
        _assign_expr, _emb_base, _seed_centroids,
    )

    base = _emb_base(spark, SF_DIR)
    cents = _seed_centroids(base)
    cid, _d2, _ = _assign_expr(cents)
    rows = base.select(cid.alias("cid"), "h", "v").collect()
    sums: dict[tuple[int, int], list[int]] = {}
    counts: dict[tuple[int, int], int] = {}
    for r in rows:
        key = (int(r["cid"]), int(r["h"]))
        counts[key] = counts.get(key, 0) + 1
        s = sums.setdefault(key, [0] * 64)
        for i, x in enumerate(r["v"]):
            s[i] += round(float(x) * 1e9)
    got = {
        int(r["cid"]): (int(r["n_a"]), int(r["n_b"]), float(r["shift_l2"]))
        for r in STAGED_R11["centroid_shift_embeddings"]
        .fn(spark, SF_DIR)
        .collect()
    }
    for c in sorted({k for k, _ in counts}):
        na, nb = counts[(c, 0)], counts[(c, 1)]
        ma = [float(x) / 1e9 / na for x in sums[(c, 0)]]
        mb = [float(x) / 1e9 / nb for x in sums[(c, 1)]]
        acc = 0.0
        for a, b in zip(ma, mb):
            acc += (a - b) * (a - b)
        shift = round(acc**0.5, 6)
        assert got[c] == (na, nb, pytest.approx(shift, abs=2e-6)), c
    spark.catalog.clearCache()


def test_time_split_leakage_brute_force(spark):
    """Set replay of the midpoint split: train/eval/overlap user sets
    and the overlap share recomputed from the raw rows."""
    from dce_spark.queries_staging_r11 import _events_tt

    ev, tt = _events_tt(spark, SF_DIR)
    tmid = int(tt.collect()[0]["tmid"])
    rows = [
        (int(r["user_id"]), int(r["es"]))
        for r in ev.select(
            "user_id", F.unix_timestamp("ts").alias("es")
        ).collect()
    ]
    train = {u for u, es in rows if es <= tmid}
    evl = {u for u, es in rows if es > tmid}
    n_eval_events = sum(1 for _u, es in rows if es > tmid)
    n_overlap_events = sum(
        1 for u, es in rows if es > tmid and u in train
    )
    got = (
        STAGED_R11["time_split_leakage_events"].fn(spark, SF_DIR).collect()[0]
    )
    assert int(got["n_train_users"]) == len(train)
    assert int(got["n_eval_users"]) == len(evl)
    assert int(got["n_overlap_users"]) == len(train & evl)
    assert float(got["eval_share_overlap_users"]) == round(
        n_overlap_events / n_eval_events, 6
    )
    spark.catalog.clearCache()
