"""Round-19 STAGED queries (seeded in round 13, three rounds early —
the staging pipeline holds five cohorts as rounds 14..17 promote
banked inventory): same parity harness as the live catalog.
Deliberately NOT in dce_spark.queries.QUERIES (the freeze protocol of
queries_staging_r5..r18), plus cohort-specific determinism proofs:
batch-cell metrics summing to the r18 global grid, the per-batch
frontier replayed brute-force, the pick being the max-token frontier
cell, stale-pick cost non-negativity, carry-vs-rebuild write
amplification >= 1, compaction policy totals reconciling with the
sweep, wave-plan bounds, salt factors actually taming the hottest
key, and the adjusted-portfolio conservation identity."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r19 import (
    _REINDEX_WAVES,
    _SALT_FACTORS,
    STAGED_R19,
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


@pytest.mark.parametrize("name", sorted(STAGED_R19))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R19[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r16 import STAGED_R16
    from dce_spark.queries_staging_r17 import STAGED_R17
    from dce_spark.queries_staging_r18 import STAGED_R18

    assert len(STAGED_R19) == 20
    assert not (set(STAGED_R19) & set(QUERIES))
    assert not (set(STAGED_R19) & set(STAGED_R16))  # cohorts disjoint
    assert not (set(STAGED_R19) & set(STAGED_R17))
    assert not (set(STAGED_R19) & set(STAGED_R18))


@pytest.mark.parametrize("name", sorted(STAGED_R19))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R19[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R19.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


# ---------------------------------------------------------------------
# cohort-specific determinism proofs
# ---------------------------------------------------------------------


def test_batch_cells_sum_to_global_grid(spark):
    """Summing per-batch cell admissions over batches equals the r18
    GLOBAL grid (the same equivalence protocol the funnel mirrors
    lock, here for the calibration loop)."""
    from dce_spark.queries_staging_r18 import STAGED_R18

    bb = STAGED_R19["cal_cell_metrics_by_batch_documents"].fn(
        spark, SF_DIR
    )
    summed = {
        (int(r["q_lo"]), int(r["q_hi"]), int(r["floor_tok"])): (
            int(r["n"]),
            int(r["t"]),
        )
        for r in bb.groupBy("q_lo", "q_hi", "floor_tok")
        .agg(
            F.sum("n_admitted").alias("n"),
            F.sum("admitted_tokens").alias("t"),
        )
        .collect()
    }
    global_grid = {
        (int(r["q_lo"]), int(r["q_hi"]), int(r["floor_tok"])): (
            int(r["n_admitted"]),
            int(r["admitted_tokens"]),
        )
        for r in STAGED_R18["gate_grid_admission_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert summed == global_grid
    spark.catalog.clearCache()


def test_per_batch_frontier_brute_force(spark):
    """The windowed per-batch skyline equals the O(n^2) replay within
    every batch, and the pick is the max-token frontier cell under
    the full tie-break."""
    rows = (
        STAGED_R19["cal_frontier_by_batch_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    picks = {
        int(r["dbatch"]): (
            int(r["q_lo"]),
            int(r["q_hi"]),
            int(r["floor_tok"]),
        )
        for r in STAGED_R19["cal_pick_by_batch_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    by_batch: dict[int, list] = {}
    for r in rows:
        by_batch.setdefault(int(r["dbatch"]), []).append(r)
    assert set(by_batch) == set(range(5)) == set(picks)
    for b, rs in by_batch.items():
        assert len(rs) == 12
        cells = [
            (int(r["admitted_tokens"]), int(r["bias_num"]), r)
            for r in rs
        ]
        frontier = []
        for tok, bias, r in cells:
            dom = any(
                t2 >= tok and b2 <= bias and (t2 > tok or b2 < bias)
                for t2, b2, _ in cells
            )
            assert int(r["dominated"]) == (1 if dom else 0), (b, r)
            if not dom:
                frontier.append(r)
        best = sorted(
            frontier,
            key=lambda r: (
                -int(r["admitted_tokens"]),
                int(r["bias_num"]),
                int(r["q_lo"]),
                int(r["floor_tok"]),
            ),
        )[0]
        assert picks[b] == (
            int(best["q_lo"]),
            int(best["q_hi"]),
            int(best["floor_tok"]),
        )
    spark.catalog.clearCache()


def test_stale_pick_cost_nonnegative(spark):
    rows = (
        STAGED_R19["cal_stale_pick_cost_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == 5
    for r in rows:
        assert int(r["lost_tokens"]) >= 0
        assert int(r["lost_tokens"]) == int(r["tokens_own"]) - int(
            r["tokens_stale"]
        )
    # batch 0's own pick IS the stale pick: zero lost by definition
    b0 = [r for r in rows if int(r["dbatch"]) == 0][0]
    assert int(b0["lost_tokens"]) == 0
    spark.catalog.clearCache()


def test_carry_vs_rebuild_amplification(spark):
    rows = sorted(
        STAGED_R19["lsh_carry_vs_rebuild_bill_documents"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["commit_id"]),
    )
    cum_carry = 0
    cum_rebuild = 0
    for r in rows:
        cum_carry += int(r["append_rows"])
        assert int(r["index_rows"]) == cum_carry
        cum_rebuild += int(r["index_rows"])
        assert int(r["cum_rebuild_writes"]) == cum_rebuild
        assert float(r["write_amplification"]) >= 1.0
    spark.catalog.clearCache()


def test_compaction_totals_reconcile(spark):
    sweep = (
        STAGED_R19["lsh_compaction_policy_sweep_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    totals = {
        int(r["k"]): r
        for r in STAGED_R19["lsh_compaction_policy_totals_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert len(sweep) == 15 and set(totals) == {2, 3, 5}
    for k, t in totals.items():
        rows = [r for r in sweep if int(r["k"]) == k]
        assert sum(int(r["probe_cost_rows"]) for r in rows) == int(
            t["total_probe_cost_rows"]
        )
        assert sum(int(r["compact_rows"]) for r in rows) == int(
            t["total_compact_rows"]
        )
        assert int(t["total_cost_rows"]) == int(
            t["total_probe_cost_rows"]
        ) + int(t["total_compact_rows"])
        assert int(t["final_fragments"]) == (4 % k) + 1
    spark.catalog.clearCache()


def test_wave_plan_bounds(spark):
    rows = (
        STAGED_R19["lsh_reindex_wave_plan_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    total = sum(int(r["n_rows"]) for r in rows)
    wave_size = (total + _REINDEX_WAVES - 1) // _REINDEX_WAVES
    ordered = sorted(
        rows,
        key=lambda r: (-int(r["n_rows"]), r["band"], int(r["vintage"])),
    )
    cum = 0
    for r in ordered:
        cum += int(r["n_rows"])
        assert int(r["cum_rows"]) == cum
        assert int(r["wave"]) == (cum - 1) // wave_size
        assert 0 <= int(r["wave"]) < _REINDEX_WAVES + 1
    spark.catalog.clearCache()


def test_salt_actually_tames(spark):
    """The chosen factor meets the taming bound, and no smaller
    ladder factor does (or the fallback 8 is in force)."""
    rows = (
        STAGED_R19["skew_salt_requirement_tpch"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == 3
    for r in rows:
        f = int(r["salt_factor"])
        mx, mean = int(r["max_cnt"]), int(r["mean_rows"])
        assert f in _SALT_FACTORS
        if mx <= 2 * f * mean:
            for smaller in _SALT_FACTORS:
                if smaller < f:
                    assert mx > 2 * smaller * mean, r
        else:
            assert f == 8  # fallback: even the top cannot tame it
    spark.catalog.clearCache()


def test_adjusted_residual_conserves(spark):
    resid = (
        STAGED_R19["portfolio_salt_residual_tpch"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert len(resid) == 7
    for r in resid:
        assert int(r["saved_rows"]) + int(r["residual_rows"]) == int(
            r["daily_rows"]
        )
        assert 0 <= int(r["saved_rows"]) <= int(r["daily_rows"])
    spark.catalog.clearCache()


def test_adjusted_savings_never_exceed_naive(spark):
    """Salting only TAXES a layout (the clamp keeps net savings
    <= the unsalted probe+build), so every layout's adjusted daily
    savings are <= its naive savings."""
    from dce_spark.queries_staging_r18 import STAGED_R18

    naive = {
        r["layout"]: int(r["daily_saved"])
        for r in STAGED_R18["layout_roi_rank_tpch"]
        .fn(spark, SF_DIR)
        .collect()
    }
    adj = {
        r["layout"]: int(r["daily_saved_adj"])
        for r in STAGED_R19["portfolio_skew_adjusted_roi_tpch"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(adj) == set(naive)
    for layout, v in adj.items():
        assert 0 <= v <= naive[layout], layout
    spark.catalog.clearCache()


def test_hot_keys_are_top5(spark):
    rows = (
        STAGED_R19["skew_hot_keys_tpch"].fn(spark, SF_DIR).collect()
    )
    by_join: dict[str, list] = {}
    for r in rows:
        by_join.setdefault(r["join_name"], []).append(r)
    assert set(by_join) == {
        "lineitem_orders",
        "orders_customer",
        "lineitem_part",
    }
    for j, rs in by_join.items():
        assert len(rs) == 5
        rs.sort(key=lambda r: int(r["rnk"]))
        assert [int(r["rnk"]) for r in rs] == [1, 2, 3, 4, 5]
        cnts = [int(r["cnt"]) for r in rs]
        assert cnts == sorted(cnts, reverse=True)
    spark.catalog.clearCache()
