"""Contract compiler/executor: Contract + DataFrame -> ValidationReport.

Execution plan (contrast reference pipeline at engine.rs:141-200 /
datafusion_engine.rs:114-172, which issues one SQL statement per field
per check — O(fields x checks) scans):

  stage 0  presence + declared-type checks      (metadata only, 0 jobs)
  stage 1  ONE fused ``df.agg(...)`` scan covering nullability,
           constraints, completeness, uniqueness, freshness, and
           target-leakage correlation                      (1 job)
  stage 2  grouped ML checks (class balance, null-rate-by-group,
           temporal split, no-overlap, feature drift)  (1 job each)
  stage 3  custom SQL checks via spark.sql              (1 job each)

Pipeline-order semantics kept from the reference: strict mode stops
after *schema* errors only (engine.rs:234-237, datafusion_engine.rs:132-134
— constraint/quality failures never suppress later stages); schema_only
skips everything past stage 1's nullability portion; sample_size takes
the first N rows (LIMIT view semantics, file_reader.rs:60-70).

Severity routing matches the reference (datafusion_engine.rs:88-104 and
the engine.rs freshness routing): quality and ML check failures are
WARNINGS unless strict mode — the report stays ``passed`` and the CLI
exits 0; schema and constraint failures are always errors. Custom SQL
checks carry their own user-declared severity (engine.rs:119-127).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from datetime import datetime
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from .contract import Contract
from .report import CheckResult, Severity, ValidationReport, ValidationStats
from .checks import custom as custom_checks
from .checks import ml as ml_checks
from .checks import quality as quality_checks
from .checks import schema as schema_checks
from .checks.constraints import constraint_probes
from .checks.probe import AggProbe

__all__ = ["ValidationContext", "validate_df"]


@dataclass
class ValidationContext:
    """Options for one validation run (reference: validator.rs:88-100),
    plus an injectable clock for deterministic freshness."""

    strict: bool = False
    schema_only: bool = False
    sample_size: Optional[int] = None
    now: Optional[datetime] = None
    approx_distinct: bool = False  # HLL instead of exact COUNT(DISTINCT)
    metadata: dict[str, Any] = dc_field(default_factory=dict)


def _route_severity(result: CheckResult, strict: bool) -> CheckResult:
    """Quality/ML failures are warnings unless strict (reference:
    datafusion_engine.rs:88-104); schema/constraints stay errors; custom
    checks keep their user-declared severity (handled in checks/custom)."""
    if result.category in ("quality", "ml"):
        result.severity = Severity.ERROR if strict else Severity.WARNING
    return result


def _schema_failed(report: ValidationReport) -> bool:
    return any(not c.passed for c in report.checks if c.category == "schema")


def _run_fused(df: DataFrame, probes: list[AggProbe], need_total: bool) -> dict[str, Any]:
    exprs = []
    if need_total:
        exprs.append(quality_checks.total_expr())
    for p in probes:
        exprs.extend(p.exprs)
    if not exprs:
        return {}
    return df.agg(*exprs).collect()[0].asDict()


def validate_df(
    spark: SparkSession,
    df: DataFrame,
    contract: Contract,
    context: ValidationContext | None = None,
) -> ValidationReport:
    ctx = context or ValidationContext()
    t0 = time.monotonic()
    report = ValidationReport()

    def add_routed(result: CheckResult) -> None:
        """The one way quality/ML results enter the report: severity
        routed by strict mode (see _route_severity)."""
        report.add(_route_severity(result, ctx.strict), ctx.strict)

    # ---- stage 0: metadata-only schema checks (no Spark jobs)
    for r in schema_checks.presence_checks(contract, df):
        report.add(r, strict=ctx.strict)
    for r in schema_checks.type_checks(contract, df):
        report.add(r, strict=ctx.strict)

    if ctx.sample_size is not None:
        df = df.limit(ctx.sample_size)

    qc = contract.quality_checks
    ml = qc.ml_checks if qc else None

    # ---- build fused probes (nullability + nested-null value rules are
    # both schema-category and both ride the single fused scan)
    null_probes = schema_checks.nullability_probes(contract, df)
    fused: list[AggProbe] = list(null_probes)
    fused.extend(schema_checks.nested_null_probes(contract, df))
    schema_stage_errors = not all(c.passed for c in report.checks)

    if not ctx.schema_only and not (ctx.strict and schema_stage_errors):
        fused.extend(constraint_probes(contract, df))
        if qc:
            if qc.completeness:
                fused.extend(quality_checks.completeness_probes(qc.completeness, df))
            if qc.uniqueness and not (qc.uniqueness.scope or "").startswith("per_day"):
                p = quality_checks.uniqueness_probe(
                    qc.uniqueness, df, approx=ctx.approx_distinct
                )
                if p:
                    fused.append(p)
            if qc.freshness:
                p = quality_checks.freshness_probe(qc.freshness, df, now=ctx.now)
                if p:
                    fused.append(p)
        if ml and ml.target_leakage:
            fused.extend(ml_checks.target_leakage_probes(ml.target_leakage, df))

    # cache iff more than one data pass will run
    grouped_needed = bool(
        not ctx.schema_only
        and ml
        and (
            ml.class_balance
            or ml.null_rate_by_group
            or ml.temporal_split
            or ml.no_overlap
            or ml.feature_drift
        )
    ) or bool(not ctx.schema_only and qc and qc.custom_checks)
    cached = False
    if grouped_needed and fused:
        df = df.cache()
        cached = True

    # ---- stage 1: the single fused scan
    records = 0
    try:
        vals = _run_fused(df, fused, need_total=True)
        if vals:
            records = vals.get("__total__", 0) or 0
            # schema-stage probes (nullability) evaluate first: in strict
            # mode a schema failure suppresses the later stages' results,
            # matching the reference's early exit (engine.rs:234-237) —
            # the fused scan already paid for them, but the report must
            # not include them.
            schema_probes = [p for p in fused if p.category == "schema"]
            other_probes = [p for p in fused if p.category != "schema"]
            for p in schema_probes:
                report.add(p.evaluate(vals), strict=ctx.strict)
            if not (ctx.strict and _schema_failed(report)):
                for p in other_probes:
                    add_routed(p.evaluate(vals))
        elif not ctx.schema_only:
            records = df.count()

        # strict mode early-exits on SCHEMA failures only — constraint and
        # quality failures never suppress later stages (the reference still
        # runs quality/ML/custom after them, datafusion_engine.rs:132-134)
        strict_stop = ctx.strict and _schema_failed(report)
        fields_checked = {f for p in fused for f in p.fields}
        constraints_evaluated = sum(p.constraints for p in fused)

        # ---- stage 1b: scoped (grouped) quality checks
        if (
            qc
            and qc.uniqueness
            and (qc.uniqueness.scope or "").startswith("per_day")
            and not ctx.schema_only
            and not strict_stop
        ):
            # scope syntax: "per_day:<ts_column>"
            _, _, ts_col = qc.uniqueness.scope.partition(":")
            r = quality_checks.uniqueness_per_day_check(
                qc.uniqueness, df, ts_col.strip()
            )
            if r:
                add_routed(r)

        # ---- stage 2: grouped ML checks
        if ml and not ctx.schema_only and not strict_stop:
            if ml.class_balance:
                add_routed(ml_checks.class_balance_check(ml.class_balance, df))
            if ml.null_rate_by_group:
                for r in ml_checks.null_rate_by_group_check(ml.null_rate_by_group, df):
                    add_routed(r)
            if ml.temporal_split:
                add_routed(ml_checks.temporal_split_check(ml.temporal_split, df))
            if ml.no_overlap:
                add_routed(ml_checks.no_overlap_check(ml.no_overlap, df))
            if ml.feature_drift:
                for r in ml_checks.feature_drift_check(ml.feature_drift, df):
                    add_routed(r)

        # ---- stage 3: custom SQL checks
        if qc and qc.custom_checks and not ctx.schema_only and not strict_stop:
            for c in qc.custom_checks:
                report.add(
                    custom_checks.run_custom_check(
                        spark, df, c, contract_name=contract.name, strict=ctx.strict
                    ),
                    ctx.strict,
                )
    finally:
        if cached:
            df.unpersist()

    report.stats = ValidationStats(
        records_validated=records,
        fields_checked=len(fields_checked) if fused else 0,
        constraints_evaluated=constraints_evaluated if fused else 0,
        duration_ms=int((time.monotonic() - t0) * 1000),
    )
    return report
