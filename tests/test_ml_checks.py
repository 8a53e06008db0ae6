"""ML check matrix on an ml_dataset-shaped frame (FIXTURES.md §2;
mirrors the reference's ml.rs:633-1220 + datafusion_engine.rs:1586-2059).
"""

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from dce_spark import validate_df
from dce_spark.checks import ml as ml_checks
from dce_spark.contract import (
    ClassBalanceCheck,
    FeatureDriftCheck,
    NoOverlapCheck,
    NullRateByGroupCheck,
    TemporalSplitCheck,
)

BASE_TS = datetime(2024, 1, 1)


def make_ml_df(spark, *, overlap=False, inversion=False, imbalanced=False,
               drifted=False, leaky=False, sparse=False, n=2000):
    rng = random.Random(42)
    rows = []
    for i in range(n):
        split = "train" if i < n * 0.7 else ("val" if i < n * 0.85 else "test")
        label = ["a", "b", "c"][i % 3]
        if imbalanced:
            label = "a" if i % 50 else "b"
        entity = f"e{i}"
        if overlap and i >= n - 5:
            entity = f"e{i - int(n * 0.5)}"  # test entities colliding with train
        ts = BASE_TS + timedelta(hours=i)
        if inversion and split == "test" and i % 7 == 0:
            ts = BASE_TS  # test rows before train's max
        feat = rng.gauss(0, 1)
        feat_d = rng.gauss(2 if split == "test" and drifted else 0, 1)
        target = float(["a", "b", "c"].index(label))
        feat_l = target + rng.gauss(0, 0.01) if leaky else rng.gauss(0, 1)
        sp = None if (sparse and split == "test" and i % 3 == 0) else rng.random()
        rows.append(
            Row(row_id=i, split=split, entity_id=entity, ts=ts, label=label,
                feature_ok=feat, feature_drifted=feat_d, feature_leaky=feat_l,
                target=target, sparse_col=sp)
        )
    return spark.createDataFrame(rows)


def test_no_overlap_pass_fail(spark):
    check = NoOverlapCheck(split_field="split", key_fields=["entity_id"])
    ok = ml_checks.no_overlap_check(check, make_ml_df(spark))
    assert ok.passed
    bad = ml_checks.no_overlap_check(check, make_ml_df(spark, overlap=True))
    assert not bad.passed
    assert bad.observed["overlapping_keys"] > 0
    assert len(bad.observed["samples"]) <= 5


def test_temporal_split_pass_fail(spark):
    check = TemporalSplitCheck(
        split_field="split", timestamp_field="ts",
        split_order=["train", "val", "test"],
    )
    ok = ml_checks.temporal_split_check(check, make_ml_df(spark))
    assert ok.passed
    bad = ml_checks.temporal_split_check(check, make_ml_df(spark, inversion=True))
    assert not bad.passed


def test_temporal_split_two_way_default(spark):
    check = TemporalSplitCheck(split_field="split", timestamp_field="ts")
    assert ml_checks.temporal_split_check(check, make_ml_df(spark)).passed


def test_class_balance_pass_fail(spark):
    check = ClassBalanceCheck(label_field="label", max_proportion=0.5)
    ok = ml_checks.class_balance_check(check, make_ml_df(spark))
    assert ok.passed
    bad = ml_checks.class_balance_check(check, make_ml_df(spark, imbalanced=True))
    assert not bad.passed


def test_class_balance_min_proportion(spark):
    check = ClassBalanceCheck(
        label_field="label", max_proportion=0.99, min_proportion=0.1
    )
    bad = ml_checks.class_balance_check(check, make_ml_df(spark, imbalanced=True))
    assert not bad.passed  # 'b' class is ~2%


def test_null_rate_by_group(spark):
    check = NullRateByGroupCheck(
        group_field="split", check_fields=["sparse_col"], max_null_rate_diff=0.1
    )
    ok = ml_checks.null_rate_by_group_check(check, make_ml_df(spark))
    assert all(r.passed for r in ok)
    bad = ml_checks.null_rate_by_group_check(check, make_ml_df(spark, sparse=True))
    assert any(not r.passed for r in bad)


def test_feature_drift_psi(spark):
    check = FeatureDriftCheck(
        split_field="split", reference_split="train", current_split="test",
        feature_fields=["feature_ok", "feature_drifted"],
    )
    results = {r.field: r for r in ml_checks.feature_drift_check(check, make_ml_df(spark, drifted=True))}
    assert results["feature_ok"].passed, results["feature_ok"].observed
    assert not results["feature_drifted"].passed
    assert results["feature_drifted"].observed["psi"] > 0.2


def test_psi_formula():
    # identical distributions -> ~0; disjoint -> large
    assert ml_checks.psi([0.5, 0.5], [0.5, 0.5]) == pytest.approx(0.0, abs=1e-9)
    assert ml_checks.psi([1.0, 0.0], [0.0, 1.0]) > 10


def test_target_leakage_via_contract(spark):
    contract = """
version: "1"
name: ml
owner: me
schema:
  fields:
    - {name: row_id, type: int64}
    - {name: split, type: string}
    - {name: entity_id, type: string}
    - {name: ts, type: timestamp}
    - {name: label, type: string}
    - {name: feature_ok, type: float64}
    - {name: feature_drifted, type: float64}
    - {name: feature_leaky, type: float64}
    - {name: target, type: float64}
    - {name: sparse_col, type: float64}
quality_checks:
  ml_checks:
    target_leakage:
      target_field: target
      feature_fields: [feature_ok, feature_leaky]
      max_correlation: 0.95
"""
    report = validate_df(spark, make_ml_df(spark, leaky=True), contract)
    by_name = {c.name: c for c in report.checks}
    assert by_name["ml.target_leakage:feature_ok"].passed
    assert not by_name["ml.target_leakage:feature_leaky"].passed
    assert abs(by_name["ml.target_leakage:feature_leaky"].observed["correlation"]) > 0.95


def test_full_ml_contract_single_run(spark):
    """All six ML checks through the compiler in one validate_df call."""
    contract = """
version: "1"
name: ml
owner: me
schema:
  fields:
    - {name: row_id, type: int64}
    - {name: split, type: string}
    - {name: entity_id, type: string}
    - {name: ts, type: timestamp}
    - {name: label, type: string}
    - {name: feature_ok, type: float64}
    - {name: feature_drifted, type: float64}
    - {name: feature_leaky, type: float64}
    - {name: target, type: float64}
    - {name: sparse_col, type: float64}
quality_checks:
  ml_checks:
    no_overlap:
      split_field: split
      key_fields: [entity_id]
    temporal_split:
      split_field: split
      timestamp_field: ts
      split_order: [train, val, test]
    class_balance:
      label_field: label
      max_proportion: 0.5
    feature_drift:
      split_field: split
      reference_split: train
      current_split: test
      feature_fields: [feature_ok]
    target_leakage:
      target_field: target
      feature_fields: [feature_ok]
    null_rate_by_group:
      group_field: split
      check_fields: [sparse_col]
"""
    report = validate_df(spark, make_ml_df(spark), contract)
    assert report.passed, report.errors
    ml_names = [c.name for c in report.checks if c.category == "ml"]
    assert len(ml_names) == 6


def test_lm_split_leakage_guard_contract(spark):
    """examples/lm_split_contract.yml — the train/test leakage guard
    for the LM scoring ladder (round-6 verdict ask): build the split
    assignment table an LM pipeline would materialize from the REAL
    documents fixture (temporal split: train = ingested before the
    cutoff, score = after), validate it green, then prove both failure
    modes fire — a doc_id leaked into both splits trips no_overlap,
    and a score row ingested before the train boundary trips
    temporal_split. Runs strict: the reference routes quality/ML
    failures as warnings by default, but a leakage GATE must fail the
    pipeline."""
    import os

    from pyspark.sql import functions as F

    from dce_spark.data import load_table

    from conftest import SF_DIR

    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "lm_split_contract.yml"
    )
    contract = open(path).read()

    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    cutoff = 400  # deterministic 80/20 by pseudo-ingestion order
    split_tbl = docs.select(
        "doc_id",
        F.when(F.col("doc_id") < cutoff, F.lit("train"))
        .otherwise(F.lit("score"))
        .alias("split"),
        # stand-in ingestion clock: one minute per doc_id, so the
        # temporal boundary coincides with the id cutoff
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") * 60)
        .alias("ingest_ts"),
    )
    # strict: ML-check failures are warnings by default (the
    # reference's severity routing) — a leakage GATE must hard-fail
    report = validate_df(spark, split_tbl, contract, strict=True)
    assert report.passed, [e for e in report.errors]
    ml_names = [c.name for c in report.checks if c.category == "ml"]
    assert any("no_overlap" in n for n in ml_names), ml_names
    assert any("temporal_split" in n for n in ml_names), ml_names

    # failure mode 1: the same doc_id lands in BOTH splits
    leaked = split_tbl.unionByName(
        split_tbl.filter(F.col("doc_id") == 7).withColumn(
            "split", F.lit("score")
        )
    )
    rep_leak = validate_df(spark, leaked, contract, strict=True)
    assert not rep_leak.passed
    assert any(
        "no_overlap" in c.name and not c.passed for c in rep_leak.checks
    )

    # failure mode 2: a score row ingested BEFORE the train boundary
    backdated = split_tbl.withColumn(
        "ingest_ts",
        F.when(
            F.col("doc_id") == cutoff + 1,
            F.timestamp_seconds(F.lit(1_700_000_000)),
        ).otherwise(F.col("ingest_ts")),
    )
    rep_time = validate_df(spark, backdated, contract, strict=True)
    assert not rep_time.passed
    assert any(
        "temporal_split" in c.name and not c.passed for c in rep_time.checks
    )
