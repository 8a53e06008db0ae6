"""Round-9 promotion regression: the twenty queries staged in round 7
are now LIVE catalog entries (registered from queries_more.py). Their
parity and plan-audit coverage moved to the catalog-wide suites
(test_oracle_parity.py / test_catalog_scalable.py run over QUERIES);
this file locks the promotion itself — the same shape
test_staging_r5..r8.py took after their promotions — plus the staged
cohort's extra determinism proofs (PIT/attribution/decay brute
forces, SCD2 tiling, SemDeDup injected copies, ...), which stay valid
against the promoted entries.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r9 import STAGED_R9, staged_oracle

from conftest import SF_DIR


def test_staged_queries_promoted():
    from dce_spark.queries import QUERIES

    assert len(STAGED_R9) == 20
    for name, spec in STAGED_R9.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-9 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r09 rows;
    the round-10 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5..r8 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r09.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R9:
        assert name in rows, f"{name} never driver-checked in r9"
        assert rows[name]["hash_match"], f"{name} r9 driver row not green"


def test_staged_oracles_eager():
    """Round-9 staged oracles are eager strings by construction; the
    promotion loop asserts identity at import — re-assert here so a
    staging-module refactor can't reintroduce lazy empties."""
    from dce_spark import queries  # noqa: F401  (triggers registration)

    for name, spec in STAGED_R9.items():
        assert spec.oracle, f"{name}.oracle empty"
        assert spec.oracle == staged_oracle(name)


def test_promotion_survives_staging_first_import():
    """The r9 staging module bootstraps the catalog chain BEFORE
    defining STAGED_R9, so a staging-first import reaches the
    promotion loop with no entries at all; the loop must bail and the
    tail hook must complete the catalog. Module caching means the
    in-suite import order is whatever conftest already produced
    (round-8 ADVICE), so prove the staging-first order in a fresh
    interpreter."""
    code = (
        "import dce_spark.queries_staging_r9\n"
        "from dce_spark.queries import QUERIES\n"
        "from dce_spark.queries_staging_r9 import STAGED_R9\n"
        "missing = set(STAGED_R9) - set(QUERIES)\n"
        "assert not missing, missing\n"
        "assert len(STAGED_R9) == 20\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


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


def test_semdedup_prunes_exactly_the_injected_copies(spark):
    """On the dirtied view the ONLY cosine pairs >= 0.95 are
    (original, its injected perturbed copy) — measured: natural max
    pairwise cosine is ~0.5. So across cells the prune totals must
    account for every injected copy whose original landed in the same
    cell, and membership must equal corpus + 25."""
    from dce_spark.data import load_table

    out = STAGED_R9["semdedup_prune_embeddings"].fn(spark, SF_DIR).collect()
    n_corpus = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(int(r["n_members"]) for r in out) == n_corpus + 25
    assert sum(int(r["n_pruned"]) for r in out) == 25  # all copies
    for r in out:
        assert 0 <= int(r["n_pruned"]) <= int(r["n_members"])
    spark.catalog.clearCache()


def test_hard_negatives_brute_force(spark):
    """Replays probe selection and candidate ranking independently in
    Python over the collected table: quantized per-label centroids,
    exact-integer probe scores, 6dp cosine top-5."""
    import math

    from dce_spark.data import load_table
    from dce_spark.queries_staging_r9 import _HNM_K, _HNM_NPROBE

    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .collect()
    )
    vecs = {int(r["vec_id"]): ([float(x) for x in r["v"]], int(r["label"]))
            for r in rows}
    sums, counts = {}, {}
    for v, lbl in vecs.values():
        counts[lbl] = counts.get(lbl, 0) + 1
        s = sums.setdefault(lbl, [0] * 64)
        for i in range(64):
            s[i] += int(round(v[i] * 1e9))
    cents = {
        lbl: [float(s[i]) / 1e9 / counts[lbl] for i in range(64)]
        for lbl, s in sums.items()
    }
    expect = {}
    for qid in (0, 1, 2):
        qv, qlabel = vecs[qid]
        scored = sorted(
            (-sum(int(round(c[i] * qv[i] * 1e9)) for i in range(64)), lbl)
            for lbl, c in cents.items()
            if lbl != qlabel
        )[:_HNM_NPROBE]
        probe = {lbl for _s, lbl in scored}
        nq = math.sqrt(sum(x * x for x in qv))
        cand = []
        for vid, (v, lbl) in vecs.items():
            if lbl not in probe:
                continue
            dot = 0.0
            for i in range(64):
                dot += qv[i] * v[i]
            nv = math.sqrt(sum(x * x for x in v))
            cand.append((round(dot / (nq * nv), 6), vid, lbl))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rk, (cos, vid, lbl) in enumerate(cand[:_HNM_K], start=1):
            expect[(qid, rk)] = (vid, lbl, cos)
    got = {
        (int(r["qid"]), int(r["rank"])): (
            int(r["vec_id"]), int(r["neg_label"]), float(r["cos_sim"])
        )
        for r in STAGED_R9["hard_negative_mining_embeddings"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect


def test_contrastive_band_brute_force(spark):
    """Recomputes the mixture corpus, shingle sets, and the
    exact-integer band in plain Python; the returned pair set must
    match exactly."""
    from dce_spark.data import load_table

    docs = {
        int(r["doc_id"]): (r["text"], r["source"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "source")
        .collect()
    }
    corpus = dict(docs)
    for i in range(20):
        if i + 1 not in docs:
            continue
        wa, wb = docs[i][0].split(" "), docs[i + 1][0].split(" ")
        mix = wa[: (len(wa) + 1) // 2] + wb[: (len(wb) + 1) // 2]
        corpus[i + 2000000] = (" ".join(mix), docs[i][1])
    sh = {}
    for did, (text, _src) in corpus.items():
        toks = [t for t in __import__("re").split(r"\s+", text.lower()) if t]
        sh[did] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    ids = sorted(corpus)
    expect = {}
    for x, ia in enumerate(ids):
        for ib in ids[x + 1 :]:
            common = len(sh[ia] & sh[ib])
            un = len(sh[ia]) + len(sh[ib]) - common
            if un and 5 * common >= un and 10 * common < 7 * un:
                expect[(ia, ib)] = (
                    round(common / un, 6),
                    corpus[ia][1] == corpus[ib][1],
                )
    got = {
        (int(r["anchor"]), int(r["positive"])): (
            float(r["jaccard"]), bool(r["same_source"])
        )
        for r in STAGED_R9["contrastive_pair_mining_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    spark.catalog.clearCache()


def test_attribution_brute_force(spark):
    """Last-click attribution replayed row-at-a-time in Python: for
    each purchase, the latest click strictly earlier in (ts, event_id)
    row order, attributed iff within 3600 s."""
    from dce_spark.data import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id", "user_id", "event_type", "ts",
            F.unix_timestamp("ts").alias("es"),
        )
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(int(r["user_id"]), []).append(r)
    expect = {}
    for rs in by_user.values():
        rs.sort(key=lambda r: (r["ts"], int(r["event_id"])))
        last_click = None  # (es, event_id)
        for r in rs:
            if r["event_type"] == "purchase":
                es = int(r["es"])
                if last_click is not None and es - last_click[0] <= 3600:
                    expect[int(r["event_id"])] = (
                        True, last_click[1], es - last_click[0]
                    )
                else:
                    expect[int(r["event_id"])] = (False, None, None)
            if r["event_type"] == "click":
                cand = (int(r["es"]), int(r["event_id"]))
                # max over PACKED es*1e7+id == lexicographic (es, id)
                if last_click is None or cand > last_click:
                    last_click = cand
    got = {
        int(r["event_id"]): (
            bool(r["attributed"]),
            None if r["click_event_id"] is None else int(r["click_event_id"]),
            None if r["gap_s"] is None else int(r["gap_s"]),
        )
        for r in STAGED_R9["attribution_windows_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect


def test_norm_ladder_catches_each_stratum(spark):
    """The variant view is built so each rung catches a different
    stratum: raw bytes 0 groups, lowercasing the 10 case copies,
    whitespace collapsing those plus the 10 spacing copies."""
    out = {
        int(r["level"]): (int(r["n_groups"]), int(r["n_dup_docs"]))
        for r in STAGED_R9["normalized_dup_ladder_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert out[0] == (0, 0)
    assert out[1] == (10, 20)
    assert out[2] == (20, 40)


def test_cluster_margin_in_unit_interval(spark):
    out = STAGED_R9["cluster_margin_embeddings"].fn(spark, SF_DIR).collect()
    assert sum(int(r["n_members"]) for r in out) > 0
    for r in out:
        assert 0.0 <= float(r["min_margin"]) <= float(r["mean_margin"]) <= 1.0


def test_decay_score_brute_force(spark):
    """Exponential-decay score replayed in Python: each term is an
    exact mantissa shift (value / 2**days_ago), quantized at 1e6."""
    from dce_spark.data import load_table

    rows = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.date_trunc("day", "ts").alias("day"),
            F.col("value").cast("double").alias("v"),
        )
        .collect()
    )
    import math

    d0 = max(r["day"] for r in rows)

    def half_up(x):  # engine round(): half away from zero, not banker's
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    acc = {}
    for r in rows:
        d = min((d0 - r["day"]).days, 62)
        n, q = acc.get(int(r["user_id"]), (0, 0))
        acc[int(r["user_id"])] = (
            n + 1,
            q + half_up(float(r["v"]) / (1 << d) * 1e6),
        )
    expect = {u: (n, round(float(q) / 1e6, 6)) for u, (n, q) in acc.items()}
    got = {
        int(r["user_id"]): (int(r["n_events"]), float(r["decay_score"]))
        for r in STAGED_R9["decay_weighted_activity_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect


def test_rfm_segments_partition_customers(spark):
    """Eight possible codes, every customer in exactly one, and
    segment revenue sums to total customer revenue (cent-exact)."""
    from dce_spark.data import load_table

    out = STAGED_R9["rfm_segments_customers"].fn(spark, SF_DIR).collect()
    codes = {int(r["rfm_code"]) for r in out}
    assert codes <= {111, 112, 121, 122, 211, 212, 221, 222}
    orders = load_table(spark, SF_DIR, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(int(r["n_customers"]) for r in out) == n_cust
    total_cents = (
        orders.agg(
            F.sum(
                F.round(F.col("o_totalprice").cast("double") * 100).cast("long")
            ).alias("c")
        ).collect()[0]["c"]
    )
    got_cents = sum(int(round(float(r["total_monetary"]) * 100)) for r in out)
    assert got_cents == total_cents


def test_split_churn_matches_split_assign_margins(spark):
    """The churn table's from-margins must equal the production split
    assignment's totals (same hash, same thresholds)."""
    from dce_spark.queries import QUERIES

    churn = STAGED_R9["split_churn_documents"].fn(spark, SF_DIR).collect()
    margins = {}
    for r in churn:
        margins[r["split_from"]] = margins.get(r["split_from"], 0) + int(
            r["n_docs"]
        )
    assign = {}
    for r in QUERIES["split_assign_documents"].fn(spark, SF_DIR).collect():
        assign[r["split"]] = assign.get(r["split"], 0) + int(r["n_docs"])
    assert margins == assign
