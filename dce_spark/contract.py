"""Contract data model: the typed AST a contract file parses into.

Mirrors the reference model (crates/contracts_core/src/contract.rs:36-400)
as plain dataclasses. A Contract declares a schema (fields with types,
nullability, constraints), quality checks, ML checks, custom SQL checks,
and an SLA. The Spark engine compiles a Contract into DataFrame jobs
(see dce_spark/compiler.py) rather than per-field SQL strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Optional

from pyspark.sql import types as T

from .types import format_data_type, parse_data_type

__all__ = [
    "AllowedValuesConstraint",
    "RangeConstraint",
    "PatternConstraint",
    "Field",
    "Schema",
    "CompletenessCheck",
    "UniquenessCheck",
    "FreshnessCheck",
    "CustomCheck",
    "NoOverlapCheck",
    "TemporalSplitCheck",
    "ClassBalanceCheck",
    "FeatureDriftCheck",
    "TargetLeakageCheck",
    "NullRateByGroupCheck",
    "MlChecks",
    "QualityChecks",
    "SLA",
    "Contract",
    "ContractError",
]


class ContractError(ValueError):
    """Invalid contract definition."""


# --------------------------------------------------------------------------
# field constraints (reference: contract.rs constraint enum; validated by
# constraints.rs:69-283 row path and datafusion_engine.rs:347-422 SQL path)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class AllowedValuesConstraint:
    values: tuple[Any, ...]

    kind = "allowedvalues"


@dataclass(frozen=True)
class RangeConstraint:
    min: Optional[float] = None
    max: Optional[float] = None

    kind = "range"

    def __post_init__(self) -> None:
        if self.min is None and self.max is None:
            raise ContractError("range constraint requires min and/or max")


@dataclass(frozen=True)
class PatternConstraint:
    regex: str

    kind = "pattern"

    def __post_init__(self) -> None:
        if not self.regex:
            raise ContractError("pattern constraint requires a non-empty regex")


Constraint = AllowedValuesConstraint | RangeConstraint | PatternConstraint


@dataclass
class Field:
    """One declared column (reference: contract.rs:107-126)."""

    name: str
    type: str
    nullable: bool = True
    description: Optional[str] = None
    tags: list[str] = dc_field(default_factory=list)
    constraints: list[Constraint] = dc_field(default_factory=list)

    def spark_type(self) -> T.DataType:
        return parse_data_type(self.type)

    def to_struct_field(self) -> T.StructField:
        meta: dict[str, Any] = {}
        if self.description:
            meta["description"] = self.description
        if self.tags:
            meta["tags"] = list(self.tags)
        return T.StructField(self.name, self.spark_type(), self.nullable, metadata=meta)


@dataclass
class Schema:
    """Declared schema + physical binding (reference: contract.rs:91-100)."""

    fields: list[Field]
    format: str = "parquet"
    location: str = ""

    def to_struct_type(self) -> T.StructType:
        return T.StructType([f.to_struct_field() for f in self.fields])

    @staticmethod
    def from_struct_type(
        st: T.StructType, format: str = "parquet", location: str = ""
    ) -> "Schema":
        fields = [
            Field(
                name=f.name,
                type=format_data_type(f.dataType),
                nullable=f.nullable,
                description=(f.metadata or {}).get("description"),
                tags=list((f.metadata or {}).get("tags", [])),
            )
            for f in st.fields
        ]
        return Schema(fields=fields, format=format, location=location)


# --------------------------------------------------------------------------
# quality checks (reference: contract.rs:183-236)
# --------------------------------------------------------------------------


@dataclass
class CompletenessCheck:
    threshold: float
    fields: list[str]


@dataclass
class UniquenessCheck:
    fields: list[str]
    scope: Optional[str] = None  # parsed but inert in the reference too


@dataclass
class FreshnessCheck:
    max_delay: str  # duration string: "1h", "30m", "1d", ...
    metric: str


@dataclass
class CustomCheck:
    name: str
    definition: str  # SQL over view `data`
    severity: Optional[str] = None  # error | warning | info


# --------------------------------------------------------------------------
# ML checks (reference: contract.rs:239-372)
# --------------------------------------------------------------------------


@dataclass
class NoOverlapCheck:
    split_field: str
    key_fields: list[str]


@dataclass
class TemporalSplitCheck:
    split_field: str
    timestamp_field: str
    train_split: str = "train"
    test_split: str = "test"
    split_order: Optional[list[str]] = None


@dataclass
class ClassBalanceCheck:
    label_field: str
    max_proportion: float
    min_proportion: Optional[float] = None


@dataclass
class FeatureDriftCheck:
    split_field: str
    reference_split: str
    current_split: str
    feature_fields: list[str]
    num_bins: int = 10
    threshold: float = 0.2


@dataclass
class TargetLeakageCheck:
    target_field: str
    feature_fields: list[str]
    max_correlation: float = 0.95


@dataclass
class NullRateByGroupCheck:
    group_field: str
    check_fields: list[str]
    max_null_rate_diff: float = 0.1


@dataclass
class MlChecks:
    no_overlap: Optional[NoOverlapCheck] = None
    temporal_split: Optional[TemporalSplitCheck] = None
    class_balance: Optional[ClassBalanceCheck] = None
    feature_drift: Optional[FeatureDriftCheck] = None
    target_leakage: Optional[TargetLeakageCheck] = None
    null_rate_by_group: Optional[NullRateByGroupCheck] = None


@dataclass
class QualityChecks:
    completeness: Optional[CompletenessCheck] = None
    uniqueness: Optional[UniquenessCheck] = None
    freshness: Optional[FreshnessCheck] = None
    custom_checks: list[CustomCheck] = dc_field(default_factory=list)
    ml_checks: Optional[MlChecks] = None


@dataclass
class SLA:
    availability: Optional[float] = None
    response_time: Optional[str] = None
    penalties: Optional[str] = None


# --------------------------------------------------------------------------
# contract root (reference: contract.rs:36-57)
# --------------------------------------------------------------------------


@dataclass
class Contract:
    version: str
    name: str
    owner: str
    schema: Schema
    description: Optional[str] = None
    quality_checks: Optional[QualityChecks] = None
    sla: Optional[SLA] = None

    def validate_definition(self) -> list[str]:
        """Static (no-data) validation of the contract itself.

        Mirrors the reference's definition checks: non-empty identity
        fields, at least one schema field, unique field names, checks
        referencing declared fields, thresholds in range.
        """
        errors: list[str] = []
        if not self.version:
            errors.append("contract version must not be empty")
        if not self.name:
            errors.append("contract name must not be empty")
        if not self.owner:
            errors.append("contract owner must not be empty")
        if not self.schema.fields:
            errors.append("schema must declare at least one field")
        names = [f.name for f in self.schema.fields]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            errors.append(f"duplicate field names: {sorted(dupes)}")
        declared = set(names)

        # parse every type string now so bad types fail at definition time
        for f in self.schema.fields:
            try:
                f.spark_type()
            except ValueError as e:
                errors.append(f"field {f.name!r}: invalid type: {e}")

        qc = self.quality_checks
        if qc is None:
            return errors

        def check_fields(label: str, fields: list[str]) -> None:
            for fname in fields:
                if fname not in declared:
                    errors.append(f"{label} references undeclared field {fname!r}")

        if qc.completeness:
            if not 0.0 <= qc.completeness.threshold <= 1.0:
                errors.append("completeness threshold must be in [0, 1]")
            check_fields("completeness", qc.completeness.fields)
        if qc.uniqueness:
            if not qc.uniqueness.fields:
                errors.append("uniqueness requires at least one field")
            check_fields("uniqueness", qc.uniqueness.fields)
        if qc.freshness:
            check_fields("freshness", [qc.freshness.metric])
        for c in qc.custom_checks:
            if not c.name:
                errors.append("custom check requires a name")
            if not c.definition or "select" not in c.definition.lower():
                errors.append(f"custom check {c.name!r} must be a SELECT statement")
        ml = qc.ml_checks
        if ml:
            if ml.no_overlap:
                check_fields(
                    "no_overlap", [ml.no_overlap.split_field, *ml.no_overlap.key_fields]
                )
            if ml.temporal_split:
                check_fields(
                    "temporal_split",
                    [ml.temporal_split.split_field, ml.temporal_split.timestamp_field],
                )
            if ml.class_balance:
                check_fields("class_balance", [ml.class_balance.label_field])
                if not 0.0 < ml.class_balance.max_proportion <= 1.0:
                    errors.append("class_balance max_proportion must be in (0, 1]")
            if ml.feature_drift:
                check_fields(
                    "feature_drift",
                    [ml.feature_drift.split_field, *ml.feature_drift.feature_fields],
                )
                if ml.feature_drift.num_bins < 2:
                    errors.append("feature_drift num_bins must be >= 2")
            if ml.target_leakage:
                check_fields(
                    "target_leakage",
                    [ml.target_leakage.target_field, *ml.target_leakage.feature_fields],
                )
            if ml.null_rate_by_group:
                check_fields(
                    "null_rate_by_group",
                    [
                        ml.null_rate_by_group.group_field,
                        *ml.null_rate_by_group.check_fields,
                    ],
                )
        return errors
