"""Round-15 staged queries (seeded in round 12, PROMOTED into the
live catalog in round 15): same parity harness as the live catalog,
now locking the post-promotion shape — every cohort entry registered
with its staged fn/oracle/doc intact and fronted in the round-15
driver window — plus cohort-specific determinism
proofs: the SEEDED incremental fixpoint replayed against a Python
union-find over the full pair list, frontier/savings partition
identities, prune-soundness (zero matches inside pruned groups,
claimed counts replayed from states), sweep monotonicity, the
compaction dominance inequality, exact per-epoch Hamilton slot sums,
cap-conservation per epoch, the per-cell interleave replayed in
Python, and the zero-sum rounding-drift identity."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r15 import (
    _JSLOTS,
    _NEW_BATCH,
    _Z_SWEEP_CENTS,
    _Z_THR_CENTS,
    STAGED_R15,
    _epoch_source_grid,
    _incremental_state,
    _pairs_batched,
    _release,
    _zone_states,
    staged_oracle,
)
from dce_spark.queries_staging_r14 import _IMASK, _IMOD, _KNUTH, _N_EPOCHS

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


@pytest.mark.parametrize("name", sorted(STAGED_R15))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R15[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_queries_promoted():
    """Round 15 promoted the cohort (the test_staging_r14 pattern):
    every entry lives in the catalog with its staged fn/oracle/doc."""
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r14 import STAGED_R14

    assert len(STAGED_R15) == 20
    assert not (set(STAGED_R15) & set(STAGED_R14))  # cohorts disjoint
    for name, spec in STAGED_R15.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_in_driver_window():
    """Promotion-round invariant: every promoted query sits in the
    ROUND-15 driver window, so each earns a driver-checked
    CORRECTNESS row the round it goes live (no unchecked tail)."""
    from dce_spark.queries import _DRIVER_WINDOW

    for name in STAGED_R15:
        assert name in _DRIVER_WINDOW, f"{name} promoted but not windowed"


@pytest.mark.parametrize("name", sorted(STAGED_R15))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R15[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R15.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


# ---------------------------------------------------------------------
# A. incremental-maintenance proofs
# ---------------------------------------------------------------------


def _union_find(pairs):
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
    return {v: find(v) for v in parent}


def test_incremental_fixpoint_equals_full_recompute(spark):
    """The correctness contract of the whole theme: the SEEDED
    re-convergence (committed base labels + delta) must equal an
    exact Python union-find over the FULL pair list — label reuse
    can never change the answer."""
    state = _incremental_state(spark, SF_DIR)
    pairsb, base_edges, full_edges, base_lbls, full_lbls = state
    pairs = [
        (int(r["a"]), int(r["b"]))
        for r in pairsb.select("a", "b").collect()
    ]
    base_pairs = [
        (int(r["a"]), int(r["b"]))
        for r in pairsb.filter(
            (F.col("ab") < _NEW_BATCH) & (F.col("bb") < _NEW_BATCH)
        )
        .select("a", "b")
        .collect()
    ]
    got_full = {
        int(r["v"]): int(r["lbl"]) for r in full_lbls.collect()
    }
    got_base = {
        int(r["v"]): int(r["lbl"]) for r in base_lbls.collect()
    }
    _release(*state)
    assert got_full == _union_find(pairs)
    assert got_base == _union_find(base_pairs)
    spark.catalog.clearCache()


def test_frontier_and_savings_partition_identities(spark):
    """Frontier + stable must partition nodes and components exactly;
    touched + stable pairs must partition the pair list; and the
    delta-pair count must match the edge-mix rows."""
    fr = (
        STAGED_R15["cc_reconverge_frontier_documents"]
        .fn(spark, SF_DIR)
        .collect()[0]
    )
    sv = (
        STAGED_R15["cc_incremental_savings_documents"]
        .fn(spark, SF_DIR)
        .collect()[0]
    )
    mix = {
        r["kind"]: int(r["n_pairs"])
        for r in STAGED_R15["cc_delta_edge_mix_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    pairsb = _pairs_batched(spark, SF_DIR)
    n_pairs = pairsb.count()
    n_nodes = (
        pairsb.select(F.col("a").alias("v"))
        .union(pairsb.select(F.col("b").alias("v")))
        .distinct()
        .count()
    )
    assert (
        int(fr["n_frontier_nodes"]) + int(fr["n_stable_nodes"]) == n_nodes
    )
    assert int(sv["n_pairs_touched"]) + int(sv["n_pairs_stable"]) == n_pairs
    assert int(sv["n_delta_pairs"]) == mix.get("old_new", 0) + mix.get(
        "new_new", 0
    )
    assert sum(mix.values()) == n_pairs
    # every delta pair lies inside a touched component
    assert int(sv["n_delta_pairs"]) <= int(sv["n_pairs_touched"])
    spark.catalog.clearCache()


def test_stability_audit_internally_consistent(spark):
    row = (
        STAGED_R15["cc_incremental_stability_documents"]
        .fn(spark, SF_DIR)
        .collect()[0]
    )
    assert int(row["n_relabeled"]) + int(row["n_stable"]) == int(
        row["n_old_nodes"]
    )
    # adding edges can only merge components, and the delta also adds
    # brand-new nodes/components — so full-component count is bounded
    # by base components plus the new nodes
    assert int(row["n_full_components"]) >= 1
    assert int(row["n_base_components"]) >= 1
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# B. pruning-economics proofs
# ---------------------------------------------------------------------


def test_prune_soundness_zero_matches_inside_pruned(spark):
    rows = (
        STAGED_R15["zone_prune_soundness_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    assert all(int(r["actual_matches_in_pruned"]) == 0 for r in rows)
    # non-vacuous at every tested SF: something was actually claimed
    assert sum(int(r["claimed_skipped_rows"]) for r in rows) > 0
    # claimed counts replay from the state table
    st = _zone_states(spark, SF_DIR)
    expect = (
        st.filter(F.col("zmax_cents") < _Z_THR_CENTS)
        .agg(F.sum("n"))
        .collect()[0][0]
        or 0
    )
    assert sum(int(r["claimed_skipped_rows"]) for r in rows) == int(expect)
    spark.catalog.clearCache()


def test_threshold_sweep_monotone(spark):
    rows = sorted(
        STAGED_R15["zone_prune_threshold_sweep_events"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["thr_cents"]),
    )
    assert [int(r["thr_cents"]) for r in rows] == _Z_SWEEP_CENTS
    for a, b in zip(rows, rows[1:]):
        assert int(a["n_states_prunable"]) <= int(b["n_states_prunable"])
        assert int(a["n_rows_skipped"]) <= int(b["n_rows_skipped"])
    spark.catalog.clearCache()


def test_time_cut_prunability_is_exactly_older_commits(spark):
    """The batch cut construction guarantees a commit is prunable for
    cut s exactly when its batch < s — replay from the state table."""
    st = _zone_states(spark, SF_DIR).collect()
    got = {
        int(r["snapshot_cut"]): (
            int(r["n_states_prunable"]),
            int(r["n_rows_skipped"]),
        )
        for r in STAGED_R15["zone_prune_time_cut_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    for s in (1, 2, 3, 4):
        older = [r for r in st if int(r["batch"]) < s]
        assert got[s] == (len(older), sum(int(r["n"]) for r in older)), s
    spark.catalog.clearCache()


def test_compaction_never_beats_per_commit_pruning(spark):
    rows = (
        STAGED_R15["zone_prune_compaction_tradeoff_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    for r in rows:
        assert int(r["rows_skipped_compacted"]) <= int(r["rows_skipped"])
        if int(r["compacted_prunable"]) == 1:
            # merged zone prunable => every commit zone was prunable
            assert int(r["n_prunable_states"]) == int(r["n_states"])
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# C. joint-allocation proofs
# ---------------------------------------------------------------------


def test_slots_sum_to_exactly_1000_per_epoch(spark):
    rows = (
        STAGED_R15["joint_slots_by_epoch_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    per_epoch: dict[int, int] = {}
    for r in rows:
        per_epoch[int(r["epoch"])] = per_epoch.get(int(r["epoch"]), 0) + int(
            r["slots"]
        )
    assert per_epoch and all(v == _JSLOTS for v in per_epoch.values())
    # Hamilton keeps every cell within one slot of its exact share
    grid = {
        (int(r["epoch"]), r["source"]): int(r["tokens"])
        for r in _epoch_source_grid(spark, SF_DIR).collect()
    }
    etok: dict[int, int] = {}
    for (e, _s), tok in grid.items():
        etok[e] = etok.get(e, 0) + tok
    for r in rows:
        exact = _JSLOTS * grid[(int(r["epoch"]), r["source"])] / etok[
            int(r["epoch"])
        ]
        assert abs(int(r["slots"]) - exact) < 1.0
    spark.catalog.clearCache()


def test_caps_conserve_epoch_budget(spark):
    """Redistribution must conserve the epoch's token budget exactly
    and never allocate beyond a source's own tokens."""
    rows = (
        STAGED_R15["joint_caps_redistribution_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    per_epoch_final: dict[int, int] = {}
    per_epoch_tokens: dict[int, int] = {}
    for r in rows:
        e = int(r["epoch"])
        per_epoch_final[e] = per_epoch_final.get(e, 0) + int(
            r["final_alloc"]
        )
        per_epoch_tokens[e] = per_epoch_tokens.get(e, 0) + int(r["tokens"])
        assert int(r["final_alloc"]) <= int(r["tokens"])
        assert int(r["capped_alloc"]) <= int(r["cap_tokens"])
    assert per_epoch_final == per_epoch_tokens
    spark.catalog.clearCache()


def test_joint_interleave_replay(spark):
    """Replay the per-(epoch, source) interleave heads in Python with
    the masked multiplicative-hash key."""
    from dce_spark.queries_staging_r14 import _epoch_map, _scored_docs

    emap = {
        int(r["bucket"]): int(r["epoch"])
        for r in _epoch_map(spark, SF_DIR).collect()
    }
    cells: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for r in _scored_docs(spark, SF_DIR).collect():
        doc = int(r["doc_id"])
        key = ((doc % _IMASK) * _KNUTH) % _IMOD
        cells.setdefault(
            (emap[int(r["bucket"])], r["source"]), []
        ).append((key, doc))
    expect = set()
    for (e, s), lst in cells.items():
        for pos, (key, doc) in enumerate(sorted(lst)[:3], start=1):
            expect.add((e, s, pos, doc, key))
    got = {
        (
            int(r["epoch"]),
            r["source"],
            int(r["position"]),
            int(r["doc_id"]),
            int(r["ikey"]),
        )
        for r in STAGED_R15["joint_interleave_heads_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    spark.catalog.clearCache()


def test_rounding_drift_sums_to_zero(spark):
    """Both allocations hand out exactly 1000 slots per epoch-or-
    corpus, so drift summed over sources must be zero."""
    rows = (
        STAGED_R15["joint_rounding_drift_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    assert sum(int(r["slot_drift"]) for r in rows) == 0
    assert sum(int(r["epoch_slots_total"]) for r in rows) == (
        _N_EPOCHS * _JSLOTS
    )
    spark.catalog.clearCache()
