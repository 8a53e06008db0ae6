"""Round-13 staged queries (seeded in round 11, PROMOTED into the
live catalog in round 13): same parity harness as the live catalog,
now locking the post-promotion shape — every cohort entry registered
with its staged fn/oracle/doc intact and fronted in the round-13
driver window — plus cohort-specific determinism
proofs: hash-min labels replayed as a k-hop BFS minimum in Python,
triangle counts replayed on the collected pair list, the
largest-remainder slots summing to exactly 1000, the greedy budget
being a quality-rank prefix, the LWW convergence ledger replayed
per key, and the open-session state replayed from raw events."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r13 import (
    STAGED_R13,
    _gram_pairs,
    staged_oracle,
)

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


@pytest.mark.parametrize("name", sorted(STAGED_R13))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R13[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_queries_promoted():
    """Round 13 promoted the cohort (the test_staging_r12 pattern):
    every entry lives in the catalog with its staged fn/oracle/doc."""
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r12 import STAGED_R12

    assert len(STAGED_R13) == 20
    assert not (set(STAGED_R13) & set(STAGED_R12))  # cohorts disjoint
    for name, spec in STAGED_R13.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-13 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r13 rows;
    the round-14 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5..r12 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r13.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R13:
        assert name in rows, f"{name} never driver-checked in r13"
        assert rows[name]["hash_match"], f"{name} r13 driver row not green"


@pytest.mark.parametrize("name", sorted(STAGED_R13))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R13[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R13.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


def _adjacency(spark):
    pairs = _gram_pairs(spark, SF_DIR).collect()
    adj: dict[int, set[int]] = {}
    for r in pairs:
        a, b = int(r["a"]), int(r["b"])
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj, {(int(r["a"]), int(r["b"])) for r in pairs}


def test_hashmin_labels_are_two_hop_minima(spark):
    """By induction, k synchronous hash-min rounds give every node the
    minimum node id within k hops — replay that definition directly
    with a 2-step BFS in Python and compare component sizes."""
    adj, _ = _adjacency(spark)
    labels = {}
    for v in adj:
        reach = {v} | adj[v]
        for u in list(adj[v]):
            reach |= adj[u]
        labels[v] = min(reach)
    sizes: dict[int, int] = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    expect = sorted(
        ((n, c) for c, n in sizes.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    got = [
        (int(r["n_nodes"]), int(r["component"]))
        for r in STAGED_R13["cc_hashmin_labels_documents"]
        .fn(spark, SF_DIR)
        .collect()
    ]
    assert sorted(got, key=lambda t: (-t[0], t[1])) == expect
    spark.catalog.clearCache()


def test_convergence_curve_monotone_and_bounded(spark):
    """Label counts can only shrink round over round, and once
    n_changed hits 0 it stays 0 (hash-min is monotone)."""
    rows = {
        int(r["iter"]): (int(r["n_labels"]), int(r["n_changed"]))
        for r in STAGED_R13["cc_convergence_curve_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert sorted(rows) == [1, 2, 3]
    assert rows[1][0] >= rows[2][0] >= rows[3][0]
    for k in (2, 3):
        if rows[k - 1][1] == 0:
            assert rows[k][1] == 0
    spark.catalog.clearCache()


def test_triangles_brute_force(spark):
    """Replay the oriented triangle count and wedge count in Python
    over the collected pair list."""
    adj, pairs = _adjacency(spark)
    tri = sum(
        1
        for (a, b) in pairs
        for c in adj[b]
        if b < c and (a, c) in pairs
    )
    wedges = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())
    got = (
        STAGED_R13["triangle_closure_documents"].fn(spark, SF_DIR).collect()[0]
    )
    assert int(got["n_triangles"]) == tri
    assert int(got["n_wedges"]) == wedges
    if wedges:
        assert float(got["closure"]) == round(3.0 * tri / wedges, 9)
    spark.catalog.clearCache()


def test_largest_remainder_sums_exactly(spark):
    """The Hamilton-rounded slot vector must sum to exactly 1000 and
    keep every source within one slot of its exact share."""
    rows = (
        STAGED_R13["sample_slots_largest_remainder_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    total_tokens = sum(int(r["tokens"]) for r in rows)
    assert sum(int(r["slots"]) for r in rows) == 1000
    for r in rows:
        exact = 1000 * int(r["tokens"]) / total_tokens
        assert abs(int(r["slots"]) - exact) < 1, r["source"]
        assert int(r["extra"]) in (0, 1)
    spark.catalog.clearCache()


def test_greedy_budget_is_quality_prefix(spark):
    """The greedy allocation must take sources whole in rank order,
    clip exactly one boundary source, and spend exactly the budget
    (3/5 of total tokens, which is below total so the budget binds)."""
    rows = sorted(
        STAGED_R13["token_budget_allocation_documents"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["rank"]),
    )
    total = sum(int(r["tokens"]) for r in rows)
    budget = 3 * total // 5
    assert sum(int(r["alloc_tokens"]) for r in rows) == budget
    clipped = [
        r for r in rows if 0 < int(r["alloc_tokens"]) < int(r["tokens"])
    ]
    assert len(clipped) <= 1
    seen_partial = False
    for r in rows:
        a, t = int(r["alloc_tokens"]), int(r["tokens"])
        if seen_partial:
            assert a == 0, r["source"]
        elif a < t:
            seen_partial = True
    spark.catalog.clearCache()


def test_epoch_schedule_spends_budget_under_cap(spark):
    """The capped-and-redistributed schedule must spend exactly the
    2x-corpus budget (headroom is ample at cap 3), never exceed the
    cap, and only top up in quality-rank order."""
    rows = sorted(
        STAGED_R13["epoch_repetition_schedule_documents"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["rank"]),
    )
    total = sum(int(r["tokens"]) for r in rows)
    assert sum(int(r["final_alloc"]) for r in rows) == 2 * total
    for r in rows:
        assert int(r["capped_alloc"]) <= 3 * int(r["tokens"])
        assert int(r["final_alloc"]) <= 3 * int(r["tokens"])
        assert int(r["final_alloc"]) >= int(r["capped_alloc"])
    # top-ups are a rank prefix: once a source gets less than its full
    # headroom, every later source gets no top-up at all
    partial_seen = False
    for r in rows:
        add = int(r["final_alloc"]) - int(r["capped_alloc"])
        headroom = 3 * int(r["tokens"]) - int(r["capped_alloc"])
        if partial_seen:
            assert add == 0, r["source"]
        elif add < headroom:
            partial_seen = True
    spark.catalog.clearCache()


def test_lww_convergence_replay(spark):
    """Replay the per-batch first-seen / winner-update / stale ledger
    in Python from the raw rows using the same exact (es, event_id)
    packing and batch arithmetic."""
    from dce_spark.queries_staging_r13 import _ID_RADIX, _NB
    from dce_spark.data import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es")
    )
    rows = ev.collect()
    mn = min(int(r["es"]) for r in rows)
    mx = max(int(r["es"]) for r in rows)
    per_kb: dict[tuple[int, int], int] = {}
    for r in rows:
        es, eid, u = int(r["es"]), int(r["event_id"]), int(r["user_id"])
        b = (es - mn) * _NB // (mx - mn + 1)
        p = es * _ID_RADIX + eid
        k = (u, b)
        per_kb[k] = max(per_kb.get(k, -1), p)
    expect = {
        b: [0, 0, 0, 0] for b in range(_NB)
    }  # keys, first, updates, stale
    by_user: dict[int, list[tuple[int, int]]] = {}
    for (u, b), p in per_kb.items():
        by_user.setdefault(u, []).append((b, p))
    for u, lst in by_user.items():
        prior = None
        for b, p in sorted(lst):
            expect[b][0] += 1
            if prior is None:
                expect[b][1] += 1
            elif p > prior:
                expect[b][2] += 1
            else:
                expect[b][3] += 1
            prior = max(prior, p) if prior is not None else p
    got = {
        int(r["batch"]): [
            int(r["n_keys_in_batch"]),
            int(r["n_first_seen"]),
            int(r["n_winner_updates"]),
            int(r["n_stale_batches"]),
        ]
        for r in STAGED_R13["lww_stream_convergence_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == {b: v for b, v in expect.items() if v[0] > 0}
    spark.catalog.clearCache()


def test_session_open_state_replay(spark):
    """Replay open-session counts at each cut from raw events: build
    sessions with the 30-min gap rule per user, then count sessions
    with start <= cut < end + gap."""
    from dce_spark.queries_staging_r13 import _NB, _SESS_GAP
    from dce_spark.data import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es")
    )
    rows = [
        (int(r["user_id"]), int(r["es"]), int(r["event_id"]))
        for r in ev.collect()
    ]
    mn = min(es for _, es, _ in rows)
    mx = max(es for _, es, _ in rows)
    cuts = [mn + (mx - mn + 1) * (b + 1) // _NB for b in range(4)]
    by_user: dict[int, list[int]] = {}
    for u, es, eid in sorted(rows, key=lambda t: (t[0], t[1], t[2])):
        by_user.setdefault(u, []).append(es)
    sessions = []
    for u, ess in by_user.items():
        start = prev = ess[0]
        for es in ess[1:]:
            if es - prev > _SESS_GAP:
                sessions.append((u, start, prev))
                start = es
            prev = es
        sessions.append((u, start, prev))
    expect = {}
    for i, c in enumerate(cuts):
        open_s = [
            (u, s, e) for (u, s, e) in sessions if s <= c < e + _SESS_GAP
        ]
        expect[i] = (len(open_s), len({u for u, _, _ in open_s}))
    got = {
        int(r["cut_idx"]): (
            int(r["n_open_sessions"]),
            int(r["n_open_users"]),
        )
        for r in STAGED_R13["session_open_state_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    spark.catalog.clearCache()


def test_attribution_cuts_invariants(spark):
    """Cross-batch attributions are a subset of attributions, which
    are a subset of purchases; batch ids cover [0, 5)."""
    rows = (
        STAGED_R13["attribution_stream_cuts_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    for r in rows:
        assert 0 <= int(r["batch"]) < 5
        assert (
            int(r["n_cross_batch"])
            <= int(r["n_attributed"])
            <= int(r["n_purchases"])
        )
    # batch 0 can have no earlier batch to attribute from
    b0 = [r for r in rows if int(r["batch"]) == 0]
    assert all(int(r["n_cross_batch"]) == 0 for r in b0)
    spark.catalog.clearCache()
