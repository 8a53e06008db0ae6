"""Round-18 STAGED queries (seeded in round 13, two rounds early — the
staging pipeline stays stocked as rounds 14/15 promote banked
cohorts): same parity harness as the live catalog. Deliberately NOT in
dce_spark.queries.QUERIES (the freeze protocol of
queries_staging_r5..r17), plus cohort-specific determinism proofs:
per-batch funnels summing to the global r17 funnel, gate-order
admitted-set commutation, the ledger/intra attribution partition with
the id-order protocol (no rejecting copy from a LATER batch), batch-0
PSI terms identically zero, the greedy portfolio replayed in Python,
realized <= additive coverage, the pareto frontier replayed
brute-force, nested-band marginal telescoping, and witness/admission
count consistency."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r18 import (
    STAGED_R18,
    _admission_frame,
    _cal_cells,
    _portfolio_frame,
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


@pytest.mark.parametrize("name", sorted(STAGED_R18))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R18[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r15 import STAGED_R15
    from dce_spark.queries_staging_r16 import STAGED_R16
    from dce_spark.queries_staging_r17 import STAGED_R17

    assert len(STAGED_R18) == 20
    assert not (set(STAGED_R18) & set(QUERIES))
    assert not (set(STAGED_R18) & set(STAGED_R15))  # cohorts disjoint
    assert not (set(STAGED_R18) & set(STAGED_R16))
    assert not (set(STAGED_R18) & set(STAGED_R17))


@pytest.mark.parametrize("name", sorted(STAGED_R18))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R18[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R18.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


# ---------------------------------------------------------------------
# cohort-specific determinism proofs
# ---------------------------------------------------------------------


def test_batch_funnels_sum_to_global(spark):
    """Summing the per-batch funnel over batches equals the r17
    GLOBAL funnel at every stage — the admission equivalence protocol
    (at-arrival flags == global flags) made a checked identity."""
    from dce_spark.queries_staging_r17 import STAGED_R17

    by_batch = STAGED_R18["gate_funnel_by_batch_documents"].fn(
        spark, SF_DIR
    )
    summed = {
        int(r["stage"]): (int(r["n_docs"]), int(r["tokens"]))
        for r in by_batch.groupBy("stage")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("tokens").alias("tokens"),
        )
        .collect()
    }
    global_f = {
        int(r["stage"]): (int(r["n_docs"]), int(r["tokens"]))
        for r in STAGED_R17["gate_funnel_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert summed == global_f
    spark.catalog.clearCache()


def test_gate_order_admitted_commutes(spark):
    """The admitted count is identical under both gate orders within
    every batch (gates commute on the terminal set), and the
    canonical order never evaluates fewer gates than its admitted
    docs require (evals >= 4 * admitted is NOT required — but evals
    >= admitted count per gate is: every admitted doc passed all 4)."""
    rows = (
        STAGED_R18["gate_order_cost_by_batch_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    by_batch: dict[int, dict[str, tuple[int, int]]] = {}
    for r in rows:
        by_batch.setdefault(int(r["dbatch"]), {})[r["gate_order"]] = (
            int(r["n_evals"]),
            int(r["n_admitted"]),
        )
    for b, d in by_batch.items():
        assert d["canonical"][1] == d["reversed"][1], b
        # an admitted doc is evaluated by all 4 gates under any order
        assert d["canonical"][0] >= 4 * d["canonical"][1], b
        assert d["reversed"][0] >= 4 * d["reversed"][1], b
    spark.catalog.clearCache()


def test_ledger_attribution_partitions_and_id_order(spark):
    """ledger + intra counts partition each gate's rejections per
    batch, and NO rejecting copy arrives from a LATER batch (the
    id-order protocol that makes the at-arrival gates equal the
    global ones)."""
    g = _admission_frame(spark, SF_DIR)
    # id-order protocol: src batches never exceed the doc's batch
    bad = g.filter(
        (F.col("exact_src_batch") > F.col("dbatch"))
        | (F.col("near_src_batch") > F.col("dbatch"))
    ).count()
    assert bad == 0
    rej = {
        int(r["dbatch"]): (int(r["ex"]), int(r["nr"]))
        for r in g.groupBy("dbatch")
        .agg(
            F.sum((F.col("g_exact") == 0).cast("long")).alias("ex"),
            F.sum((F.col("g_near") == 0).cast("long")).alias("nr"),
        )
        .collect()
    }
    attr = (
        STAGED_R18["gate_ledger_attribution_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    for r in attr:
        b = int(r["dbatch"])
        assert int(r["exact_ledger"]) + int(r["exact_intra"]) == rej[b][0]
        assert int(r["near_ledger"]) + int(r["near_intra"]) == rej[b][1]
    spark.catalog.clearCache()


def test_mix_drift_batch0_terms_zero(spark):
    """Batch 0 is its own PSI reference: every batch-0 term is
    exactly 0.0 (n_adm == n_ref by construction)."""
    rows = (
        STAGED_R18["gate_admitted_mix_drift_documents"]
        .fn(spark, SF_DIR)
        .filter(F.col("dbatch") == 0)
        .collect()
    )
    assert rows
    for r in rows:
        assert int(r["n_adm"]) == int(r["n_ref"])
        assert r["psi_term"] == 0.0
    spark.catalog.clearCache()


def test_novelty_cumsum_telescopes(spark):
    rows = sorted(
        STAGED_R18["gate_novelty_decay_documents"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["dbatch"]),
    )
    run = 0
    for r in rows:
        run += int(r["novel_tokens"])
        assert int(r["cum_novel_tokens"]) == run
        assert 0 <= int(r["n_novel"]) <= int(r["n_docs"])
    spark.catalog.clearCache()


def test_portfolio_greedy_replayed_in_python(spark):
    """The budget-prefix greedy replayed driver-side from the frame's
    own (saved, build) numbers: same ranking keys, same cumulative
    costs, same picked set."""
    rows = sorted(
        _portfolio_frame(spark, SF_DIR).collect(),
        key=lambda r: int(r["rnk"]),
    )
    ranked = sorted(
        rows,
        key=lambda r: (-(int(r["daily_saved"]) * 1_000_000
                         // int(r["build_rows"])), r["layout"]),
    )
    assert [r["layout"] for r in ranked] == [r["layout"] for r in rows]
    cum = 0
    for r in rows:
        assert int(r["roi_key"]) == (
            int(r["daily_saved"]) * 1_000_000 // int(r["build_rows"])
        )
        cum += int(r["build_rows"])
        assert int(r["cum_build_rows"]) == cum
        assert int(r["picked"]) == (
            1 if cum <= int(r["build_cap"]) else 0
        )
    # the cap binds: at least one layout picked, at least one not
    picked = {int(r["picked"]) for r in rows}
    assert picked == {0, 1}
    spark.catalog.clearCache()


def test_realized_never_exceeds_additive(spark):
    rows = (
        STAGED_R18["layout_portfolio_realized_tpch"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    for r in rows:
        assert 0 <= int(r["realized_saved"]) <= int(r["additive_saved"])
        assert int(r["redundant_rows"]) == int(r["additive_saved"]) - int(
            r["realized_saved"]
        )
        assert int(r["realized_saved"]) in (0, int(r["daily_rows"]))
    spark.catalog.clearCache()


def test_residual_conserves_the_bill(spark):
    """saved + residual == the family's full bill, per family."""
    resid = {
        r["family"]: r
        for r in STAGED_R18["layout_residual_bill_tpch"]
        .fn(spark, SF_DIR)
        .collect()
    }
    bill = {
        r["family"]: int(r["daily_rows"])
        for r in STAGED_R18["workload_shuffle_bill_tpch"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(resid) == set(bill)
    for f, r in resid.items():
        assert int(r["saved_rows"]) + int(r["residual_rows"]) == bill[f]
    spark.catalog.clearCache()


def test_pareto_frontier_brute_force(spark):
    """The window-computed skyline equals the O(n^2) Python replay
    over the 12 collected cells."""
    rows = (
        STAGED_R18["gate_pareto_frontier_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    cells = [
        (int(r["admitted_tokens"]), int(r["bias_num"]), r) for r in rows
    ]
    assert len(cells) == 12
    for tok, bias, r in cells:
        dom = any(
            (t2 >= tok and b2 <= bias and (t2 > tok or b2 < bias))
            for t2, b2, _r2 in cells
        )
        assert int(r["dominated"]) == (1 if dom else 0), r
        assert int(r["on_frontier"]) == (0 if dom else 1), r
    assert any(int(r["on_frontier"]) == 1 for _t, _b, r in cells)
    spark.catalog.clearCache()


def test_nested_band_marginals_telescope(spark):
    """Bands are nested, so marginals are non-negative and telescope:
    narrowest tokens + sum of marginals == widest tokens, per floor."""
    rows = (
        STAGED_R18["gate_grid_marginal_tokens_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    by_floor: dict[int, list] = {}
    for r in rows:
        by_floor.setdefault(int(r["floor_tok"]), []).append(r)
    assert set(by_floor) == {10, 20, 40}
    for f, rs in by_floor.items():
        rs.sort(key=lambda r: int(r["band_width"]))
        assert rs[0]["marginal_tokens"] is None
        total = int(rs[0]["admitted_tokens"])
        for r in rs[1:]:
            assert int(r["marginal_tokens"]) >= 0, (f, r)
            total += int(r["marginal_tokens"])
        assert total == int(rs[-1]["admitted_tokens"]), f
    spark.catalog.clearCache()


def test_witness_matches_admission_counts(spark):
    wit = {
        (int(r["q_lo"]), int(r["q_hi"]), int(r["floor_tok"])): r
        for r in STAGED_R18["gate_grid_witness_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    adm = {
        (int(r["q_lo"]), int(r["q_hi"]), int(r["floor_tok"])): int(
            r["n_admitted"]
        )
        for r in STAGED_R18["gate_grid_admission_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(wit) == set(adm) and len(wit) == 12
    for k, r in wit.items():
        assert int(r["n_admitted"]) == adm[k]
        if adm[k] > 0:
            assert int(r["id_min"]) <= int(r["id_max"])
            n, lo, hi = adm[k], int(r["id_min"]), int(r["id_max"])
            # id_sum is consistent with n ids inside [lo, hi]
            s = int(r["id_sum"])
            assert lo + hi <= s or n <= 2  # loose but real bound
            assert s >= lo * n - n and s <= hi * n
    spark.catalog.clearCache()


def test_cal_cells_grid_is_complete(spark):
    """Every doc appears in exactly 12 grid cells (4 bands x 3
    floors) — the explode is a constant multiply, not a filter."""
    cell = _cal_cells(spark, SF_DIR)
    per_doc = cell.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert per_doc.filter(F.col("n") != 12).count() == 0
    spark.catalog.clearCache()
