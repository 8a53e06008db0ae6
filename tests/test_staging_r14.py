"""Round-14 staged queries (seeded in round 11, PROMOTED into the
live catalog in round 14): same parity harness as the live catalog,
now locking the post-promotion shape — every cohort entry registered
with its staged fn/oracle/doc intact and fronted in the round-14
driver window — plus cohort-specific determinism
proofs: the converged CC labels replayed with a Python union-find over
the collected pair list, the truncation curve replayed as k-hop BFS
minima, merged == recomputed asserted from the query's own equality
bits, epoch token balance and monotonicity, the interleave key
replayed in Python, the growth curve's monotone invariants, and the
freshness lag replayed from raw (user, batch) states."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r14 import (
    _KNUTH,
    _IMASK,
    _IMOD,
    _N_EPOCHS,
    STAGED_R14,
    _converged_labels,
    _epoch_map,
    _scored_docs,
    staged_oracle,
)
from dce_spark.queries_staging_r13 import _gram_pairs

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


@pytest.mark.parametrize("name", sorted(STAGED_R14))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R14[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_queries_promoted():
    """Round 14 promoted the cohort (the test_staging_r13 pattern):
    every entry lives in the catalog with its staged fn/oracle/doc."""
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r13 import STAGED_R13

    assert len(STAGED_R14) == 20
    assert not (set(STAGED_R14) & set(STAGED_R13))  # cohorts disjoint
    for name, spec in STAGED_R14.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-14 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r14 rows;
    the round-15 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5..r13 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r14.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R14:
        assert name in rows, f"{name} never driver-checked in r14"
        assert rows[name]["hash_match"], f"{name} r14 driver row not green"


@pytest.mark.parametrize("name", sorted(STAGED_R14))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R14[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R14.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


# ---------------------------------------------------------------------
# A. converged-fixpoint proofs
# ---------------------------------------------------------------------


def _union_find_components(pairs):
    """Exact components via union-find over the (a < b) pair list;
    returns {node: min_node_of_component}."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then label by component minimum (roots are set
    # to the min of the two roots at every union, so root == min id)
    return {v: find(v) for v in parent}


def test_converged_labels_are_union_find_components(spark):
    """The fixpoint loop must agree with an exact Python union-find:
    same label (= component min) for every node."""
    pair_rows = _gram_pairs(spark, SF_DIR).collect()
    pairs = [(int(r["a"]), int(r["b"])) for r in pair_rows]
    expect = _union_find_components(pairs)
    lbls, edges, rounds = _converged_labels(spark, SF_DIR)
    got = {int(r["v"]): int(r["lbl"]) for r in lbls.collect()}
    lbls.unpersist()
    edges.unpersist()
    assert got == expect
    assert 1 <= rounds <= 32
    spark.catalog.clearCache()


def test_truncation_error_is_monotone_and_terminal(spark):
    """Mislabel counts can only shrink with more rounds, label counts
    can only shrink, and each k-round mislabel count must equal the
    k-hop BFS-minimum replay."""
    pair_rows = _gram_pairs(spark, SF_DIR).collect()
    pairs = [(int(r["a"]), int(r["b"])) for r in pair_rows]
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    comp = _union_find_components(pairs)

    def khop_min(k):
        lab = {v: v for v in adj}
        for _ in range(k):
            lab = {
                v: min(
                    lab[v], min((lab[u] for u in adj[v]), default=lab[v])
                )
                for v in adj
            }
        return lab

    rows = {
        int(r["iter"]): (int(r["n_labels"]), int(r["n_mislabeled"]))
        for r in STAGED_R14["cc_truncation_error_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert sorted(rows) == [1, 2, 3]
    assert rows[1][1] >= rows[2][1] >= rows[3][1]
    assert rows[1][0] >= rows[2][0] >= rows[3][0]
    for k in (1, 2, 3):
        lab = khop_min(k)
        expect_mis = sum(1 for v in adj if lab[v] != comp[v])
        assert rows[k][1] == expect_mis, f"k={k}"
    spark.catalog.clearCache()


def test_fusion_nests_exact_groups(spark):
    """Identical texts share every shingle, so an exact-dup group can
    never straddle two converged components — every doc-with-an-edge
    whose normalized text equals another graph doc's text must share
    that doc's component."""
    from dce_spark.data import load_table

    lbls, edges, _ = _converged_labels(spark, SF_DIR)
    texts = {
        int(r["doc_id"]): r["norm"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.lower(F.col("text")).alias("norm"))
        .collect()
    }
    got = {int(r["v"]): int(r["lbl"]) for r in lbls.collect()}
    lbls.unpersist()
    edges.unpersist()
    by_text: dict[str, set[int]] = {}
    for v in got:
        by_text.setdefault(texts[v], set()).add(got[v])
    for norm, comps in by_text.items():
        assert len(comps) == 1, f"exact group split: {norm[:40]!r}"
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# B. ledger time-dimension proofs
# ---------------------------------------------------------------------


def test_merge_recompute_equality_bits_all_set(spark):
    rows = (
        STAGED_R14["ledger_merge_recompute_equality_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows and all(int(r["exact_match"]) == 1 for r in rows)
    spark.catalog.clearCache()


def test_growth_curve_monotone_and_terminal(spark):
    """Cumulative counts are non-decreasing across snapshots, and the
    final snapshot equals the raw table totals."""
    from dce_spark.data import load_table

    rows = sorted(
        STAGED_R14["ledger_growth_curve_events"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["snapshot"]),
    )
    assert [int(r["snapshot"]) for r in rows] == [0, 1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        for c in ("n_rows", "n_users", "n_types", "n_common"):
            assert int(a[c]) <= int(b[c]), c
    ev = load_table(spark, SF_DIR, "events")
    tot = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_type").alias("t"),
    ).collect()[0]
    last = rows[-1]
    assert int(last["n_rows"]) == int(tot["n"])
    assert int(last["n_users"]) == int(tot["u"])
    assert int(last["n_types"]) == int(tot["t"])
    spark.catalog.clearCache()


def test_compaction_histogram_partitions_users(spark):
    """The histogram partitions the user dimension exactly, and
    unchanged-commit counts complement presence counts to 5."""
    from dce_spark.data import load_table

    rows = (
        STAGED_R14["ledger_compaction_histogram_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(int(r["n_partitions"]) for r in rows) == n_users
    for r in rows:
        p, u = int(r["n_batches_present"]), int(r["n_unchanged_commits"])
        assert 1 <= p <= 5 and p + u == 5
    spark.catalog.clearCache()


def test_freshness_lag_replay(spark):
    """Replay per-snapshot lag aggregates from raw rows using the same
    exact integer cut arithmetic."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r13 import _NB

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es")
    )
    rows = [(int(r["user_id"]), int(r["es"])) for r in ev.collect()]
    mn = min(es for _, es in rows)
    mx = max(es for _, es in rows)
    w = (mx - mn + 1) // _NB
    per_ub: dict[tuple[int, int], int] = {}
    for u, es in rows:
        b = (es - mn) * _NB // (mx - mn + 1)
        k = (u, b)
        per_ub[k] = max(per_ub.get(k, -1), es)
    expect = {}
    for s in range(_NB):
        cut = mn + (mx - mn + 1) * (s + 1) // _NB
        best: dict[int, int] = {}
        for (u, b), m in per_ub.items():
            if b <= s:
                best[u] = max(best.get(u, -1), m)
        lags = [cut - m for m in best.values()]
        expect[s] = (
            len(lags),
            max(lags),
            sum(1 for x in lags if x > w),
        )
    got = {
        int(r["snapshot"]): (
            int(r["n_partitions"]),
            int(r["max_lag_s"]),
            int(r["n_lagging"]),
        )
        for r in STAGED_R14["ledger_freshness_lag_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# C. curriculum proofs
# ---------------------------------------------------------------------


def test_epoch_assignment_balanced_and_monotone(spark):
    """Epochs are non-decreasing in bucket order, start at 0, stay
    below _N_EPOCHS, and each epoch's token mass is within one
    bucket's granularity of the ideal equal split."""
    rows = sorted(
        STAGED_R14["curriculum_epoch_assignment_documents"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["bucket"]),
    )
    total = sum(int(r["tokens"]) for r in rows)
    max_bucket = max(int(r["tokens"]) for r in rows)
    epochs = [int(r["epoch"]) for r in rows]
    assert epochs[0] == 0
    assert all(0 <= e < _N_EPOCHS for e in epochs)
    assert all(a <= b for a, b in zip(epochs, epochs[1:]))
    per_epoch: dict[int, int] = {}
    for r in rows:
        per_epoch[int(r["epoch"])] = per_epoch.get(
            int(r["epoch"]), 0
        ) + int(r["tokens"])
    ideal = total / _N_EPOCHS
    for e, tok in per_epoch.items():
        assert abs(tok - ideal) <= max_bucket, (e, tok, ideal)
    spark.catalog.clearCache()


def test_interleave_replay(spark):
    """Replay the multiplicative-hash interleave in Python from the
    scored-docs frame: same top-5 per epoch, same key values."""
    scored = {
        int(r["doc_id"]): (int(r["bucket"]), int(r["score"]))
        for r in _scored_docs(spark, SF_DIR).collect()
    }
    emap = {
        int(r["bucket"]): int(r["epoch"])
        for r in _epoch_map(spark, SF_DIR).collect()
    }
    by_epoch: dict[int, list[tuple[int, int]]] = {}
    for doc, (bucket, _score) in scored.items():
        key = ((doc % _IMASK) * _KNUTH) % _IMOD
        by_epoch.setdefault(emap[bucket], []).append((key, doc))
    expect = set()
    for e, lst in by_epoch.items():
        for pos, (key, doc) in enumerate(sorted(lst)[:5], start=1):
            expect.add((e, pos, doc, key))
    got = {
        (
            int(r["epoch"]),
            int(r["position"]),
            int(r["doc_id"]),
            int(r["ikey"]),
        )
        for r in STAGED_R14["curriculum_interleave_order_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    spark.catalog.clearCache()


def test_pacing_curve_monotone(spark):
    """Unlocked docs/tokens/shares are non-decreasing in the cutoff."""
    rows = sorted(
        STAGED_R14["curriculum_pacing_curve_documents"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["max_score"]),
    )
    for a, b in zip(rows, rows[1:]):
        assert int(a["n_docs"]) <= int(b["n_docs"])
        assert int(a["tokens"]) <= int(b["tokens"])
        assert float(a["token_share"]) <= float(b["token_share"])
    spark.catalog.clearCache()
