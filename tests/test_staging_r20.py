"""Round-20 STAGED queries (seeded in round 14, three rounds early —
the FINAL cohort of the 20-round plan, so rounds 15..19 stay
promotion-only): same parity harness as the live catalog.
Deliberately NOT in dce_spark.queries.QUERIES (the freeze protocol of
queries_staging_r5..r19), plus cohort-specific determinism proofs:
every invariant row's match flag asserted 1 (the whole point of the
theme), manifest token conservation replayed from the raw gate flags,
the delivery heads replayed in Python under the interleave key, the
power-of-2 shard identity replayed exactly, slot-utilization row
consistency, and the drift table's three synthetic drift rows
landing in exactly the right status classes."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r20 import (
    _IMASK,
    _IMOD,
    _KNUTH,
    _WSM,
    STAGED_R20,
    _man_docs,
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


@pytest.mark.parametrize("name", sorted(STAGED_R20))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R20[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r17 import STAGED_R17
    from dce_spark.queries_staging_r18 import STAGED_R18
    from dce_spark.queries_staging_r19 import STAGED_R19

    assert len(STAGED_R20) == 20
    assert not (set(STAGED_R20) & set(QUERIES))
    assert not (set(STAGED_R20) & set(STAGED_R17))  # cohorts disjoint
    assert not (set(STAGED_R20) & set(STAGED_R18))
    assert not (set(STAGED_R20) & set(STAGED_R19))


@pytest.mark.parametrize("name", sorted(STAGED_R20))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R20[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R20.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


# ---------------------------------------------------------------------
# B-theme: every invariant row's match flag must be 1 — the identities
# are theorems of the pipeline, so any 0 is a defect in one of the two
# derivations, not "drift"
# ---------------------------------------------------------------------

_FLAG_COLS = {
    "invariant_funnel_batch_sum_documents": "funnel_match",
    "invariant_merge_associativity_events": "assoc_match",
    "invariant_slots_hamilton_documents": "sum_match",
    "invariant_portfolio_marginals_tpch": "telescoping_match",
    "invariant_cc_fixpoint_documents": "fixpoint",
    "invariant_batch_cover_events": "cover_match",
    "invariant_grid_batch_sum_documents": "grid_match",
}


@pytest.mark.parametrize("name", sorted(_FLAG_COLS))
def test_invariant_flags_all_set(spark, name):
    col = _FLAG_COLS[name]
    rows = STAGED_R20[name].fn(spark, SF_DIR).collect()
    assert rows, name
    assert all(int(r[col]) == 1 for r in rows), (name, col)
    spark.catalog.clearCache()


def test_hamilton_bound_flag_also_set(spark):
    rows = (
        STAGED_R20["invariant_slots_hamilton_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert all(int(r["bound_match"]) == 1 for r in rows)
    assert all(int(r["n_bound_violations"]) == 0 for r in rows)
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# A-theme determinism proofs
# ---------------------------------------------------------------------


def test_manifest_conservation_replayed_from_gates(spark):
    """Replay the per-delivery admitted totals directly from the
    collected gate flags and compare to BOTH columns of the
    conservation row (which must also flag 1)."""
    from dce_spark.queries_staging_r18 import _admission_frame

    g = _admission_frame(spark, SF_DIR).collect()
    expect: dict[int, list[int]] = {}
    for r in g:
        adm = (
            int(r["g_exact"])
            * int(r["g_near"])
            * int(r["g_qual"])
            * int(r["g_len"])
        )
        e = expect.setdefault(int(r["dbatch"]), [0, 0])
        e[0] += adm
        e[1] += adm * int(r["ntok"])
    rows = (
        STAGED_R20["manifest_token_conservation_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    got = {
        int(r["dbatch"]): (
            int(r["n_admitted"]),
            int(r["n_manifest"]),
            int(r["tokens_admitted"]),
            int(r["tokens_manifest"]),
            int(r["conserved"]),
        )
        for r in rows
    }
    assert set(got) == set(expect)
    for b, (n, tok) in expect.items():
        assert got[b] == (n, n, tok, tok, 1), b
    spark.catalog.clearCache()


def test_delivery_heads_replay(spark):
    """Replay the first-3-per-(delivery, epoch) witness rows in Python
    from the admitted doc frame under the same interleave key."""
    docs = [
        (int(r["dbatch"]), int(r["epoch"]), int(r["doc_id"]), r["source"])
        for r in _man_docs(spark, SF_DIR).filter(F.col("adm") == 1).collect()
    ]
    by_cell: dict[tuple[int, int], list[tuple[int, int, str]]] = {}
    for b, e, d, s in docs:
        key = ((d % _IMASK) * _KNUTH) % _IMOD
        by_cell.setdefault((b, e), []).append((key, d, s))
    expect = set()
    for (b, e), lst in by_cell.items():
        for pos, (key, d, s) in enumerate(sorted(lst)[:3], start=1):
            expect.add((b, e, pos, d, s, key))
    got = {
        (
            int(r["dbatch"]),
            int(r["epoch"]),
            int(r["position"]),
            int(r["doc_id"]),
            r["source"],
            int(r["ikey"]),
        )
        for r in STAGED_R20["manifest_delivery_head_documents"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == expect
    spark.catalog.clearCache()


def test_write_shards_pow2_identity(spark):
    """shards_pow2 must be the smallest power of two >= raw_shards
    (and raw_shards the exact ceiling division) — replayed exactly."""
    rows = (
        STAGED_R20["manifest_write_shards_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    for r in rows:
        tokens, target = int(r["tokens"]), int(r["target_tokens"])
        raw = int(r["raw_shards"])
        assert target >= 1
        assert raw == (tokens + target - 1) // target
        p = 1
        while p < raw:
            p *= 2
        assert int(r["shards_pow2"]) == p, r
    spark.catalog.clearCache()


def test_slot_utilization_row_consistency(spark):
    """Per planned cell: picks = min(slots, supply), shortfall =
    max(0, slots - supply), and the binding label names the side
    that actually binds."""
    rows = (
        STAGED_R20["manifest_slot_utilization_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    for r in rows:
        slots, supply = int(r["slots"]), int(r["supply_docs"])
        assert int(r["n_picked"]) == min(slots, supply)
        assert int(r["shortfall"]) == max(0, slots - supply)
        assert r["binding"] == ("supply" if supply < slots else "slots")
    spark.catalog.clearCache()


def test_manifest_rows_delivery_slots_bounded(spark):
    """The per-delivery pro-rata slot share can never exceed the
    cell's quota, and summing tokens over deliveries must equal the
    cell_tokens column every row of the cell carries."""
    rows = (
        STAGED_R20["manifest_rows_documents"].fn(spark, SF_DIR).collect()
    )
    assert rows
    per_cell: dict[tuple[int, str], int] = {}
    for r in rows:
        per_cell[(int(r["epoch"]), r["source"])] = per_cell.get(
            (int(r["epoch"]), r["source"]), 0
        ) + int(r["tokens"])
    for r in rows:
        assert 0 <= int(r["delivery_slots"]) <= int(r["slots"])
        assert (
            per_cell[(int(r["epoch"]), r["source"])]
            == int(r["cell_tokens"])
        )
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# C-theme proofs
# ---------------------------------------------------------------------


def test_drift_statuses_match_literal_model(spark):
    """The drift table's status classes must replay the literal model
    exactly — including the three deliberate drift rows."""
    rows = {
        r["qname"]: (
            int(r["budget_exchanges"]),
            int(r["measured_exchanges"]),
            int(r["drift"]),
            r["status"],
            int(r["daily_excess_rows"]),
        )
        for r in STAGED_R20["wsm_budget_drift"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {q for q, *_ in _WSM}
    for q, _f, b, m, _r, _t in _WSM:
        got = rows[q]
        assert got[0] == b and got[1] == m and got[2] == m - b, q
        expect_status = (
            "regression" if m > b else "tight" if m == b else "headroom"
        )
        assert got[3] == expect_status, q
        if m <= b:
            assert got[4] == 0, q
        else:
            assert got[4] > 0, q
    regressions = {q for q, v in rows.items() if v[3] == "regression"}
    assert regressions == {
        "q9_product_type_profit",
        "heavy_hitters_batch_events",
    }
    assert {q for q, v in rows.items() if v[3] == "headroom"} == {
        "tfidf_top_terms_documents"
    }
    spark.catalog.clearCache()


def test_family_lorenz_monotone_and_terminal(spark):
    """Cumulative rows/share are non-decreasing in rank and the last
    row's cum_share is exactly 1.0 (the shares are ratios of the same
    integer total)."""
    rows = sorted(
        STAGED_R20["wsm_family_lorenz"].fn(spark, SF_DIR).collect(),
        key=lambda r: int(r["rnk"]),
    )
    assert rows
    assert [int(r["rnk"]) for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert int(a["cum_rows"]) <= int(b["cum_rows"])
        assert float(a["cum_share"]) <= float(b["cum_share"]) + 1e-12
        # ranked DESC by bill: each later family adds no more than
        # any earlier one
        assert int(a["daily_shuffled_rows"]) >= int(
            b["daily_shuffled_rows"]
        )
    assert float(rows[-1]["cum_share"]) == 1.0
    assert int(rows[-1]["cum_rows"]) == sum(
        int(r["daily_shuffled_rows"]) for r in rows
    )
    spark.catalog.clearCache()


def test_scan_bill_matches_live_counts(spark):
    """The per-table bill must price against the REAL live table
    counts — replayed via independent count() calls."""
    from dce_spark.data import load_table

    rows = {
        r["tbl"]: (int(r["n_rows"]), int(r["total_runs"]),
                   int(r["daily_scan_rows"]))
        for r in STAGED_R20["wsm_scan_bill_by_table"]
        .fn(spark, SF_DIR)
        .collect()
    }
    tables = {t for *_x, t in _WSM}
    assert set(rows) == tables
    for t in tables:
        n = load_table(spark, SF_DIR, t).count()
        runs = sum(r for q, f, b, m, r, tt in _WSM if tt == t)
        assert rows[t] == (n, runs, runs * n), t
    spark.catalog.clearCache()
