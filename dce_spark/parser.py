"""Contract file parsing: YAML/TOML text -> Contract.

Mirrors the reference parser crate (crates/contracts_parser/src/lib.rs):
format autodetect by extension, YAML-first-then-TOML fallback for raw
strings, and strict-ish structural validation with readable errors.
"""

from __future__ import annotations

import tomllib
from pathlib import Path
from typing import Any

import yaml

from .contract import (
    AllowedValuesConstraint,
    ClassBalanceCheck,
    CompletenessCheck,
    Contract,
    ContractError,
    CustomCheck,
    FeatureDriftCheck,
    Field,
    FreshnessCheck,
    MlChecks,
    NoOverlapCheck,
    NullRateByGroupCheck,
    PatternConstraint,
    QualityChecks,
    RangeConstraint,
    Schema,
    SLA,
    TargetLeakageCheck,
    TemporalSplitCheck,
    UniquenessCheck,
)

__all__ = ["parse_yaml", "parse_toml", "parse_str", "parse_file", "contract_from_dict"]


def _req(d: dict[str, Any], key: str, ctx: str) -> Any:
    if key not in d:
        raise ContractError(f"missing required key {key!r} in {ctx}")
    return d[key]


def _parse_constraint(d: dict[str, Any], ctx: str):
    kind = str(_req(d, "type", ctx)).lower().replace("_", "")
    if kind in ("allowedvalues", "allowed"):
        return AllowedValuesConstraint(values=tuple(_req(d, "values", ctx)))
    if kind == "range":
        if "min" not in d and "max" not in d:
            raise ContractError(f"range constraint in {ctx} needs min and/or max")
        return RangeConstraint(min=d.get("min"), max=d.get("max"))
    if kind == "pattern":
        return PatternConstraint(regex=str(_req(d, "regex", ctx)))
    raise ContractError(f"unknown constraint type {kind!r} in {ctx}")


def _parse_field(d: dict[str, Any]) -> Field:
    name = str(_req(d, "name", "schema field"))
    ctx = f"field {name!r}"
    return Field(
        name=name,
        type=str(_req(d, "type", ctx)),
        nullable=bool(d.get("nullable", True)),
        description=d.get("description"),
        tags=list(d.get("tags", []) or []),
        constraints=[_parse_constraint(c, ctx) for c in (d.get("constraints") or [])],
    )


def _parse_ml_checks(d: dict[str, Any]) -> MlChecks:
    ml = MlChecks()
    if "no_overlap" in d and d["no_overlap"] is not None:
        v = d["no_overlap"]
        ml.no_overlap = NoOverlapCheck(
            split_field=str(_req(v, "split_field", "no_overlap")),
            key_fields=list(_req(v, "key_fields", "no_overlap")),
        )
    if "temporal_split" in d and d["temporal_split"] is not None:
        v = d["temporal_split"]
        ml.temporal_split = TemporalSplitCheck(
            split_field=str(_req(v, "split_field", "temporal_split")),
            timestamp_field=str(_req(v, "timestamp_field", "temporal_split")),
            train_split=str(v.get("train_split", "train")),
            test_split=str(v.get("test_split", "test")),
            split_order=list(v["split_order"]) if v.get("split_order") else None,
        )
    if "class_balance" in d and d["class_balance"] is not None:
        v = d["class_balance"]
        ml.class_balance = ClassBalanceCheck(
            label_field=str(_req(v, "label_field", "class_balance")),
            max_proportion=float(_req(v, "max_proportion", "class_balance")),
            min_proportion=(
                float(v["min_proportion"]) if v.get("min_proportion") is not None else None
            ),
        )
    if "feature_drift" in d and d["feature_drift"] is not None:
        v = d["feature_drift"]
        ml.feature_drift = FeatureDriftCheck(
            split_field=str(_req(v, "split_field", "feature_drift")),
            reference_split=str(_req(v, "reference_split", "feature_drift")),
            current_split=str(_req(v, "current_split", "feature_drift")),
            feature_fields=list(_req(v, "feature_fields", "feature_drift")),
            num_bins=int(v.get("num_bins", 10)),
            threshold=float(v.get("threshold", 0.2)),
        )
    if "target_leakage" in d and d["target_leakage"] is not None:
        v = d["target_leakage"]
        ml.target_leakage = TargetLeakageCheck(
            target_field=str(_req(v, "target_field", "target_leakage")),
            feature_fields=list(_req(v, "feature_fields", "target_leakage")),
            max_correlation=float(v.get("max_correlation", 0.95)),
        )
    if "null_rate_by_group" in d and d["null_rate_by_group"] is not None:
        v = d["null_rate_by_group"]
        ml.null_rate_by_group = NullRateByGroupCheck(
            group_field=str(_req(v, "group_field", "null_rate_by_group")),
            check_fields=list(_req(v, "check_fields", "null_rate_by_group")),
            max_null_rate_diff=float(v.get("max_null_rate_diff", 0.1)),
        )
    return ml


def contract_from_dict(d: dict[str, Any]) -> Contract:
    if not isinstance(d, dict):
        raise ContractError("contract root must be a mapping")
    schema_d = _req(d, "schema", "contract")
    schema = Schema(
        fields=[_parse_field(f) for f in _req(schema_d, "fields", "schema")],
        format=str(schema_d.get("format", "parquet")).lower(),
        location=str(schema_d.get("location", "")),
    )
    qc = None
    if d.get("quality_checks") is not None:
        q = d["quality_checks"]
        qc = QualityChecks(
            completeness=(
                CompletenessCheck(
                    threshold=float(_req(q["completeness"], "threshold", "completeness")),
                    fields=list(_req(q["completeness"], "fields", "completeness")),
                )
                if q.get("completeness")
                else None
            ),
            uniqueness=(
                UniquenessCheck(
                    fields=list(_req(q["uniqueness"], "fields", "uniqueness")),
                    scope=q["uniqueness"].get("scope"),
                )
                if q.get("uniqueness")
                else None
            ),
            freshness=(
                FreshnessCheck(
                    max_delay=str(_req(q["freshness"], "max_delay", "freshness")),
                    metric=str(_req(q["freshness"], "metric", "freshness")),
                )
                if q.get("freshness")
                else None
            ),
            custom_checks=[
                CustomCheck(
                    name=str(_req(c, "name", "custom check")),
                    definition=str(_req(c, "definition", "custom check")),
                    severity=c.get("severity"),
                )
                for c in (q.get("custom_checks") or [])
            ],
            ml_checks=_parse_ml_checks(q["ml_checks"]) if q.get("ml_checks") else None,
        )
    sla = None
    if d.get("sla") is not None:
        s = d["sla"]
        sla = SLA(
            availability=float(s["availability"]) if s.get("availability") is not None else None,
            response_time=s.get("response_time"),
            penalties=s.get("penalties"),
        )
    contract = Contract(
        version=str(_req(d, "version", "contract")),
        name=str(_req(d, "name", "contract")),
        owner=str(_req(d, "owner", "contract")),
        description=d.get("description"),
        schema=schema,
        quality_checks=qc,
        sla=sla,
    )
    errors = contract.validate_definition()
    if errors:
        raise ContractError("invalid contract: " + "; ".join(errors))
    return contract


def parse_yaml(text: str) -> Contract:
    try:
        data = yaml.safe_load(text)
    except yaml.YAMLError as e:
        raise ContractError(f"YAML parse error: {e}") from e
    return contract_from_dict(data)


def parse_toml(text: str) -> Contract:
    try:
        data = tomllib.loads(text)
    except tomllib.TOMLDecodeError as e:
        raise ContractError(f"TOML parse error: {e}") from e
    return contract_from_dict(data)


def parse_str(text: str) -> Contract:
    """YAML first, then TOML — matches the reference's Python-binding
    autodetect (contracts-python/src/lib.rs:274-279)."""
    try:
        return parse_yaml(text)
    except ContractError as yaml_err:
        try:
            return parse_toml(text)
        except ContractError:
            raise yaml_err


def parse_file(path: str | Path) -> Contract:
    p = Path(path)
    text = p.read_text()
    ext = p.suffix.lower()
    if ext in (".yml", ".yaml"):
        return parse_yaml(text)
    if ext == ".toml":
        return parse_toml(text)
    return parse_str(text)
