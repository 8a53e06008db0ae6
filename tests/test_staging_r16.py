"""Round-16 STAGED queries (seeded in round 12, a round early — the
staging pipeline stays stocked two cohorts ahead): same parity harness
as the live catalog. Deliberately NOT in dce_spark.queries.QUERIES
(the freeze protocol of queries_staging_r5..r15), plus cohort-specific
determinism proofs: the band-union pair identity against the catalog's
LSH candidate pairs, index-growth terminality, the frozen-at-3
staleness identities against the admission summary, a Python replay of
the probe-cost curve, the cell-fill min identity, reallocation
conservation, a Python replay of the pick witness, the prune-algebra
boolean identities, composite soundness, and cost-curve monotonicity
with order-independent terminal steps."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r16 import (
    _JSLOTS,
    _NEW_BATCH,
    STAGED_R16,
    _bucket_batches,
    _cell_picks,
    _zone_flags,
    staged_oracle,
)
from dce_spark.queries_staging_r15 import _cell_slots

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


@pytest.mark.parametrize("name", sorted(STAGED_R16))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R16[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r13 import STAGED_R13
    from dce_spark.queries_staging_r14 import STAGED_R14
    from dce_spark.queries_staging_r15 import STAGED_R15

    assert len(STAGED_R16) == 20
    assert not (set(STAGED_R16) & set(QUERIES))
    assert not (set(STAGED_R16) & set(STAGED_R13))  # cohorts disjoint
    assert not (set(STAGED_R16) & set(STAGED_R14))
    assert not (set(STAGED_R16) & set(STAGED_R15))


@pytest.mark.parametrize("name", sorted(STAGED_R16))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R16[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R16.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


# ---------------------------------------------------------------------
# A. LSH admission-ledger proofs
# ---------------------------------------------------------------------


def test_band_union_equals_catalog_pairs(spark):
    """The union of per-band pairs must be exactly the catalog's
    MinHash-LSH candidate pair set (dedup_minhash_lsh_documents uses
    the same hashing convention) — the band decomposition partitions
    the same join, it doesn't change it."""
    from dce_spark.data import load_table
    from dce_spark.ext import dedup as X_dedup

    catalog_pairs = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in X_dedup.lsh_candidate_pairs(
            load_table(spark, SF_DIR, "documents"), num_hashes=8, bands=4
        ).collect()
    }
    bb = [
        (int(r["doc_id"]), int(r["band"]), r["bkey"])
        for r in _bucket_batches(spark, SF_DIR).collect()
    ]
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc, band, bkey in bb:
        buckets.setdefault((band, bkey), []).append(doc)
    band_pairs = set()
    for docs in buckets.values():
        docs = sorted(set(docs))
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                band_pairs.add((a, b))
    assert band_pairs == catalog_pairs
    spark.catalog.clearCache()


def test_index_growth_monotone_and_terminal(spark):
    rows = sorted(
        STAGED_R16["lsh_index_growth_documents"].fn(spark, SF_DIR).collect(),
        key=lambda r: int(r["snapshot"]),
    )
    assert [int(r["snapshot"]) for r in rows] == [0, 1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        for c in ("n_bucket_rows", "n_buckets", "n_docs"):
            assert int(a[c]) <= int(b[c]), c
    bb = _bucket_batches(spark, SF_DIR)
    assert int(rows[-1]["n_bucket_rows"]) == bb.count()
    assert int(rows[-1]["n_docs"]) == bb.select("doc_id").distinct().count()
    spark.catalog.clearCache()


def test_staleness_frozen_at_3_matches_admission(spark):
    """At frozen_at = 3 the later docs are exactly batch 4 and the
    frozen index equals the arrival index (batches <= 3), so the
    staleness row must agree with the admission summary and miss
    nothing."""
    stale = {
        int(r["frozen_at"]): r
        for r in STAGED_R16["lsh_index_staleness_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    adm = (
        STAGED_R16["lsh_admission_summary_documents"]
        .fn(spark, SF_DIR)
        .collect()[0]
    )
    r3 = stale[3]
    assert int(r3["n_missed"]) == 0
    assert int(r3["n_match_frozen"]) == int(r3["n_match_at_arrival"])
    assert int(r3["n_match_frozen"]) == int(adm["n_matched"])
    for r in stale.values():
        assert int(r["n_match_frozen"]) + int(r["n_missed"]) == int(
            r["n_match_at_arrival"]
        )
        assert int(r["n_match_at_arrival"]) <= int(r["n_later_docs"])
    spark.catalog.clearCache()


def test_probe_cost_curve_replay(spark):
    """Replay probe rows / index rows / collisions per batch from the
    collected bucket table in Python."""
    bb = [
        (int(r["doc_id"]), int(r["band"]), r["bkey"], int(r["dbatch"]))
        for r in _bucket_batches(spark, SF_DIR).collect()
    ]
    by_bucket: dict[tuple[int, str], list[int]] = {}
    for _doc, band, bkey, dbatch in bb:
        by_bucket.setdefault((band, bkey), []).append(dbatch)
    expect: dict[int, list[int]] = {}
    for b in range(1, 5):
        probe = sum(1 for _d, _bd, _bk, db in bb if db == b)
        index = sum(1 for _d, _bd, _bk, db in bb if db < b)
        coll = 0
        for batches in by_bucket.values():
            for db in batches:
                if db == b:
                    coll += sum(1 for o in batches if o < db)
        if probe:
            expect[b] = [probe, index, coll]
    got = {
        int(r["batch"]): [
            int(r["n_probe_rows"]),
            int(r["n_index_rows"]),
            int(r["n_collisions"]),
        ]
        for r in STAGED_R16["lsh_probe_cost_curve_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# B. sampler-execution proofs
# ---------------------------------------------------------------------


def test_cell_fill_is_min_of_slots_and_supply(spark):
    rows = (
        STAGED_R16["sampler_cell_fill_documents"].fn(spark, SF_DIR).collect()
    )
    assert rows
    for r in rows:
        assert int(r["n_picked"]) == min(int(r["slots"]), int(r["n_docs"]))
        assert int(r["shortfall"]) == int(r["slots"]) - int(r["n_picked"])
    spark.catalog.clearCache()


def test_reallocation_conserves_epoch_totals(spark):
    """final_picks per epoch must equal min(1000, epoch doc supply):
    the reallocation fills every grantable slot and never invents
    documents."""
    rows = (
        STAGED_R16["sampler_shortfall_reallocation_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    cells = _cell_slots(spark, SF_DIR).collect()
    docs_per_epoch: dict[int, int] = {}
    for c in cells:
        docs_per_epoch[int(c["epoch"])] = docs_per_epoch.get(
            int(c["epoch"]), 0
        ) + int(c["n_docs"])
    finals: dict[int, int] = {}
    for r in rows:
        finals[int(r["epoch"])] = finals.get(int(r["epoch"]), 0) + int(
            r["final_picks"]
        )
        assert int(r["final_picks"]) <= int(r["n_picked"]) + int(
            r["headroom"]
        )
    for e, tot in finals.items():
        assert tot == min(_JSLOTS, docs_per_epoch[e]), e
    spark.catalog.clearCache()


def test_pick_witness_replay(spark):
    """Replay the pick witness in Python from the picks frame inputs:
    same cells, same counts, same exact doc-id sums, same key ranges."""
    picks = _cell_picks(spark, SF_DIR).collect()
    expect: dict[tuple[int, str], list] = {}
    for r in picks:
        if int(r["picked"]) != 1:
            continue
        k = (int(r["epoch"]), r["source"])
        e = expect.setdefault(k, [0, 0, None, None])
        e[0] += 1
        e[1] += int(r["doc_id"])
        ik = int(r["ikey"])
        e[2] = ik if e[2] is None else min(e[2], ik)
        e[3] = ik if e[3] is None else max(e[3], ik)
    got = {
        (int(r["epoch"]), r["source"]): [
            int(r["n_picked"]),
            int(r["sum_doc_ids"]),
            int(r["min_ikey"]),
            int(r["max_ikey"]),
        ]
        for r in STAGED_R16["sampler_pick_witness_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == {k: list(v) for k, v in expect.items()}
    spark.catalog.clearCache()


def test_realized_mix_totals(spark):
    rows = (
        STAGED_R16["sampler_source_realized_mix_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    from dce_spark.queries_staging_r14 import _N_EPOCHS

    assert sum(int(r["planned_slots"]) for r in rows) == (
        _N_EPOCHS * _JSLOTS
    )
    cov = (
        STAGED_R16["sampler_epoch_coverage_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert sum(int(r["realized_picks"]) for r in rows) == sum(
        int(r["n_picked"]) for r in cov
    )
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# C. pruning-algebra proofs
# ---------------------------------------------------------------------


def test_algebra_identities(spark):
    rows = (
        STAGED_R16["prune_algebra_matrix_events"].fn(spark, SF_DIR).collect()
    )
    assert rows
    for r in rows:
        hi, rec = int(r["p_hi"]), int(r["p_rec"])
        assert int(r["and_skip"]) == (1 if hi or rec else 0)
        assert int(r["or_skip"]) == (1 if hi and rec else 0)
        assert int(r["or_skip"]) <= hi <= int(r["and_skip"])
    spark.catalog.clearCache()


def test_composite_soundness_zero_in_pruned(spark):
    rows = (
        STAGED_R16["prune_composite_soundness_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    assert all(int(r["actual_in_pruned"]) == 0 for r in rows)
    assert sum(int(r["claimed_skipped_rows"]) for r in rows) > 0
    spark.catalog.clearCache()


def test_cost_curves_monotone_and_order_independent_terminal(spark):
    rows = (
        STAGED_R16["prune_order_cost_curves_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    curves: dict[str, dict[int, tuple[int, int]]] = {}
    for r in rows:
        curves.setdefault(r["eval_order"], {})[int(r["step"])] = (
            int(r["n_states_remaining"]),
            int(r["n_rows_remaining"]),
        )
    assert set(curves) == {"hi_first", "rec_first"}
    zf = _zone_flags(spark, SF_DIR)
    totals = zf.agg(
        F.count(F.lit(1)).alias("s"), F.sum("n").alias("r")
    ).collect()[0]
    for order, steps in curves.items():
        assert steps[0] == (int(totals["s"]), int(totals["r"])), order
        for s in (0, 1):
            assert steps[s][0] >= steps[s + 1][0], (order, s)
            assert steps[s][1] >= steps[s + 1][1], (order, s)
    assert curves["hi_first"][2] == curves["rec_first"][2]
    spark.catalog.clearCache()


def test_synergy_partitions_states_and_rows(spark):
    rows = (
        STAGED_R16["prune_predicate_synergy_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    zf = _zone_flags(spark, SF_DIR)
    tot = zf.agg(
        F.count(F.lit(1)).alias("s"), F.sum("n").alias("r")
    ).collect()[0]
    assert sum(int(r["n_states"]) for r in rows) == int(tot["s"])
    assert sum(int(r["n_rows"]) for r in rows) == int(tot["r"])
    spark.catalog.clearCache()
