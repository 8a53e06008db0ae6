"""Validation results: CheckResult, ValidationStats, ValidationReport.

Mirrors the reference report (crates/contracts_core/src/validator.rs:138-166)
but with *structured* per-check results instead of the reference's
substring-classification of error strings
(contracts-python/src/lib.rs:190-266) — each result carries its category,
field, observed metrics, and severity.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field as dc_field
from typing import Any, Optional

__all__ = ["Severity", "CheckResult", "ValidationStats", "ValidationReport"]


class Severity:
    ERROR = "error"
    WARNING = "warning"
    INFO = "info"


@dataclass
class CheckResult:
    """One named, inspectable check outcome."""

    name: str  # e.g. "completeness:event_id"
    category: str  # schema | constraints | quality | ml | custom
    passed: bool
    severity: str = Severity.ERROR
    field: Optional[str] = None
    observed: dict[str, Any] = dc_field(default_factory=dict)
    threshold: Optional[float] = None
    message: str = ""

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class ValidationStats:
    records_validated: int = 0
    fields_checked: int = 0
    constraints_evaluated: int = 0
    duration_ms: int = 0


@dataclass
class ValidationReport:
    passed: bool = True
    errors: list[str] = dc_field(default_factory=list)
    warnings: list[str] = dc_field(default_factory=list)
    checks: list[CheckResult] = dc_field(default_factory=list)
    stats: ValidationStats = dc_field(default_factory=ValidationStats)

    def add(self, result: CheckResult, strict: bool = False) -> None:
        """Route a check result into errors/warnings.

        Severity routing matches the reference (engine.rs:119-127):
        ``error`` -> errors; ``warning``/``info`` -> warnings; a check
        with no explicit severity that fails is an error when strict,
        else follows its default severity.
        """
        self.checks.append(result)
        if result.passed:
            return
        if result.severity == Severity.ERROR or (strict and result.severity is None):
            self.errors.append(result.message or result.name)
            self.passed = False
        else:
            self.warnings.append(result.message or result.name)

    def by_category(self) -> dict[str, list[CheckResult]]:
        out: dict[str, list[CheckResult]] = {}
        for c in self.checks:
            out.setdefault(c.category, []).append(c)
        return out

    def to_dict(self) -> dict[str, Any]:
        """Python-facing dict, shape-compatible with the reference's
        report dict (contracts-python/src/lib.rs:171-271)."""
        cats = {
            cat: {
                "passed": all(c.passed for c in results),
                "checks": [c.to_dict() for c in results],
            }
            for cat, results in self.by_category().items()
        }
        return {
            "passed": self.passed,
            "errors": list(self.errors),
            "warnings": list(self.warnings),
            "stats": asdict(self.stats),
            "checks": cats,
        }

    def to_json(self, indent: int | None = 2) -> str:
        return json.dumps(self.to_dict(), indent=indent, default=str)

    def to_df(self, spark):
        """One row per check as a typed DataFrame — the report SINK for
        pipelines that persist validation history as a table (write it
        with sinks.write_partitioned on run date and the audit trail is
        itself partition-pruned)."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("name", T.StringType(), False),
                T.StructField("category", T.StringType(), False),
                T.StructField("passed", T.BooleanType(), False),
                T.StructField("severity", T.StringType(), True),
                T.StructField("field", T.StringType(), True),
                T.StructField("message", T.StringType(), True),
            ]
        )
        rows = [
            (c.name, c.category, c.passed, c.severity, c.field, c.message)
            for c in self.checks
        ]
        return spark.createDataFrame(rows, schema=schema)
