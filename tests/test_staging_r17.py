"""Round-17 STAGED queries (seeded in round 12, two rounds early — the
staging pipeline stays stocked two cohorts ahead as rounds 13/14
promote): same parity harness as the live catalog. Deliberately NOT in
dce_spark.queries.QUERIES (the freeze protocol of
queries_staging_r5..r16), plus cohort-specific determinism proofs:
funnel monotonicity with gate-order-commuting terminal sets,
per-source attribution partitions, the evolution grandfather three-way
partition, zero-bill compatible classes, monotone ledger debt, wave
bounds, executor-balance conservation, salt-curve monotonicity, and
the bucket-count occupancy identities."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r17 import (
    _CLASS_ROWS,
    _N_EXECUTORS,
    STAGED_R17,
    _gated_docs,
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


@pytest.mark.parametrize("name", sorted(STAGED_R17))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R17[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    from dce_spark.queries import QUERIES
    from dce_spark.queries_staging_r14 import STAGED_R14
    from dce_spark.queries_staging_r15 import STAGED_R15
    from dce_spark.queries_staging_r16 import STAGED_R16

    assert len(STAGED_R17) == 20
    assert not (set(STAGED_R17) & set(QUERIES))
    assert not (set(STAGED_R17) & set(STAGED_R14))  # cohorts disjoint
    assert not (set(STAGED_R17) & set(STAGED_R15))
    assert not (set(STAGED_R17) & set(STAGED_R16))


@pytest.mark.parametrize("name", sorted(STAGED_R17))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R17[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R17.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


# ---------------------------------------------------------------------
# A. gated-admission proofs
# ---------------------------------------------------------------------


def test_funnel_monotone_and_terminal_matches_flags(spark):
    rows = sorted(
        STAGED_R17["gate_funnel_documents"].fn(spark, SF_DIR).collect(),
        key=lambda r: int(r["stage"]),
    )
    assert [int(r["stage"]) for r in rows] == [0, 1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert int(a["n_docs"]) >= int(b["n_docs"])
        assert int(a["tokens"]) >= int(b["tokens"])
        assert int(b["rejected_here"]) == int(a["n_docs"]) - int(
            b["n_docs"]
        )
    g = _gated_docs(spark, SF_DIR)
    admitted = g.filter(
        "g_exact = 1 AND g_near = 1 AND g_qual = 1 AND g_len = 1"
    ).count()
    assert int(rows[-1]["n_docs"]) == admitted
    assert int(rows[0]["n_docs"]) == g.count()
    spark.catalog.clearCache()


def test_gate_orders_commute_on_terminal_set(spark):
    rows = (
        STAGED_R17["gate_order_cost_documents"].fn(spark, SF_DIR).collect()
    )
    terminal = {
        r["eval_order"]: (int(r["n_docs"]), int(r["tokens"]))
        for r in rows
        if int(r["stage"]) == 4
    }
    assert set(terminal) == {"dedup_first", "length_first"}
    assert terminal["dedup_first"] == terminal["length_first"]
    spark.catalog.clearCache()


def test_attribution_partitions_each_source(spark):
    rows = (
        STAGED_R17["gate_attribution_by_source_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert rows
    for r in rows:
        parts = (
            int(r["rej_exact_dup"])
            + int(r["rej_near_dup"])
            + int(r["rej_quality"])
            + int(r["rej_length"])
            + int(r["n_admitted"])
        )
        assert parts == int(r["n_docs"]), r["source"]
    spark.catalog.clearCache()


def test_failure_overlap_partitions_corpus(spark):
    rows = (
        STAGED_R17["gate_failure_overlap_documents"]
        .fn(spark, SF_DIR)
        .collect()
    )
    g = _gated_docs(spark, SF_DIR)
    assert sum(int(r["n_docs"]) for r in rows) == g.count()
    assert all(0 <= int(r["n_gates_failed"]) <= 4 for r in rows)
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# B. evolution-economics proofs
# ---------------------------------------------------------------------


def test_grandfather_three_way_partition(spark):
    from dce_spark.queries_staging_r14 import _type_batch_states

    total = int(
        _type_batch_states(spark, SF_DIR)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    rows = (
        STAGED_R17["evolution_grandfather_audit_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    assert len(rows) == len(_CLASS_ROWS)
    for r in rows:
        assert (
            int(r["rows_v1_grandfathered"])
            + int(r["rows_v2_from_states"])
            + int(r["rows_v2_rescan"])
            == total
        ), r["class"]
    spark.catalog.clearCache()


def test_compatible_classes_have_zero_bill(spark):
    rows = {
        r["class"]: r
        for r in STAGED_R17["evolution_rescan_bill_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    for name, _eff, n_missing in _CLASS_ROWS:
        r = rows[name]
        assert int(r["n_missing_families"]) == n_missing
        if n_missing == 0:
            assert int(r["rescan_rows"]) == 0, name
            assert int(r["n_states_rescan"]) == 0, name
        else:
            assert int(r["rescan_rows"]) > 0, name
    spark.catalog.clearCache()


def test_ledger_debt_monotone(spark):
    rows = sorted(
        STAGED_R17["evolution_ledger_debt_events"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["snapshot"]),
    )
    for a, b in zip(rows, rows[1:]):
        assert int(a["debt_rows"]) <= int(b["debt_rows"])
        assert int(a["debt_states"]) <= int(b["debt_states"])
        assert int(a["classes_in_debt"]) <= int(b["classes_in_debt"])
    spark.catalog.clearCache()


def test_waves_bounded_and_cover_rescans(spark):
    waves = (
        STAGED_R17["evolution_migration_waves_events"]
        .fn(spark, SF_DIR)
        .collect()
    )
    bill = {
        r["class"]: int(r["rescan_rows"])
        for r in STAGED_R17["evolution_rescan_bill_events"]
        .fn(spark, SF_DIR)
        .collect()
    }
    per_class: dict[str, int] = {}
    for r in waves:
        assert 0 <= int(r["wave"]) <= 2, r
        per_class[r["class"]] = per_class.get(r["class"], 0) + int(r["n"])
    for cls, tot in per_class.items():
        assert tot == bill[cls], cls
    spark.catalog.clearCache()


# ---------------------------------------------------------------------
# C. placement-planner proofs
# ---------------------------------------------------------------------


def test_shuffle_savings_baseline_and_dominance(spark):
    rows = {
        r["layout"]: r
        for r in STAGED_R17["placement_shuffle_savings"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert int(rows["none"]["rows_saved"]) == 0
    both = int(rows["bucket_orderkey_custkey"]["rows_saved"])
    assert both >= int(rows["bucket_orderkey"]["rows_saved"])
    assert both >= int(rows["bucket_custkey"]["rows_saved"])
    assert both == int(rows["bucket_orderkey"]["rows_saved"]) + int(
        rows["bucket_custkey"]["rows_saved"]
    )  # disjoint joins: savings add
    spark.catalog.clearCache()


def test_executor_balance_conserves_rows(spark):
    from dce_spark.data import load_table

    rows = (
        STAGED_R17["placement_executor_balance_orders"]
        .fn(spark, SF_DIR)
        .collect()
    )
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(int(r["rows_assigned"]) for r in rows) == n_orders
    parts = [int(r["n_partitions"]) for r in rows]
    assert max(parts) - min(parts) <= 1  # round-robin fills evenly
    assert len(rows) <= _N_EXECUTORS
    spark.catalog.clearCache()


def test_salt_curve_monotone(spark):
    rows = sorted(
        STAGED_R17["placement_salt_planning_lineitem"]
        .fn(spark, SF_DIR)
        .collect(),
        key=lambda r: int(r["salt_factor"]),
    )
    assert int(rows[0]["salt_factor"]) == 1
    assert float(rows[0]["reduction_share"]) == 0.0
    for a, b in zip(rows, rows[1:]):
        assert int(a["max_task_rows"]) >= int(b["max_task_rows"])
        assert float(a["reduction_share"]) <= float(b["reduction_share"])
    spark.catalog.clearCache()


def test_bucket_plan_occupancy_identities(spark):
    from dce_spark.data import load_table

    n = load_table(spark, SF_DIR, "lineitem").count()
    rows = (
        STAGED_R17["placement_bucket_count_plan_lineitem"]
        .fn(spark, SF_DIR)
        .collect()
    )
    for r in rows:
        assert int(r["buckets_used"]) <= int(r["n_buckets"])
        assert int(r["max_bucket_rows"]) >= int(r["mean_bucket_rows"])
        assert int(r["mean_bucket_rows"]) == n // int(r["n_buckets"])
        assert float(r["imbalance"]) >= 0.999999  # max >= exact mean
    spark.catalog.clearCache()
