"""Schema checks: column presence, declared-type match, nullability.

Presence + type are pure metadata comparisons against ``df.schema`` —
zero Spark jobs (the reference runs a ``SELECT * LIMIT 0`` probe,
datafusion_engine.rs:258-286; Catalyst gives us the resolved schema for
free). Nullability compiles to null-count aggregate expressions fused
into the single-pass agg (reference issues one COUNT query per field,
datafusion_engine.rs:288-310).

Semantics kept from the reference: extra columns in the data are
tolerated (schema.rs:57-58); missing declared columns are errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..contract import Contract
from ..report import CheckResult, Severity
from .probe import AggProbe

__all__ = ["presence_checks", "type_checks", "nullability_probes"]


def presence_checks(contract: Contract, df: DataFrame) -> list[CheckResult]:
    actual = set(df.columns)
    results = []
    for f in contract.schema.fields:
        ok = f.name in actual
        results.append(
            CheckResult(
                name=f"schema.presence:{f.name}",
                category="schema",
                passed=ok,
                severity=Severity.ERROR,
                field=f.name,
                message="" if ok else f"required column '{f.name}' is missing from data",
            )
        )
    return results


def _type_compatible(declared: T.DataType, actual: T.DataType) -> bool:
    """Structural match, ignoring nullability flags (nullability is its
    own check) and tolerating the reference's documented widenings."""
    if isinstance(declared, T.ArrayType) and isinstance(actual, T.ArrayType):
        return _type_compatible(declared.elementType, actual.elementType)
    if isinstance(declared, T.MapType) and isinstance(actual, T.MapType):
        return _type_compatible(declared.keyType, actual.keyType) and _type_compatible(
            declared.valueType, actual.valueType
        )
    if isinstance(declared, T.StructType) and isinstance(actual, T.StructType):
        if [f.name for f in declared.fields] != [f.name for f in actual.fields]:
            return False
        return all(
            _type_compatible(d.dataType, a.dataType)
            for d, a in zip(declared.fields, actual.fields)
        )
    if type(declared) is type(actual):
        return True
    # tolerated widenings (the reference widens these on ingest,
    # datafusion_engine.rs:1534-1543)
    widenings = {
        (T.IntegerType, T.LongType),
        (T.FloatType, T.DoubleType),
        (T.DateType, T.TimestampType),
    }
    return (type(declared), type(actual)) in widenings


def type_checks(contract: Contract, df: DataFrame) -> list[CheckResult]:
    actual_types = {f.name: f.dataType for f in df.schema.fields}
    results = []
    for f in contract.schema.fields:
        if f.name not in actual_types:
            continue  # presence check already reported it
        declared = f.spark_type()
        actual = actual_types[f.name]
        ok = _type_compatible(declared, actual)
        results.append(
            CheckResult(
                name=f"schema.type:{f.name}",
                category="schema",
                passed=ok,
                severity=Severity.ERROR,
                field=f.name,
                observed={"declared": f.type, "actual": actual.simpleString()},
                message=(
                    ""
                    if ok
                    else f"column '{f.name}' declared {f.type} but data has "
                    f"{actual.simpleString()}"
                ),
            )
        )
    return results


def nullability_probes(contract: Contract, df: DataFrame) -> list[AggProbe]:
    """Null-count aggregate per declared non-nullable field present in
    the data. All probes fuse into the one-pass agg."""
    actual = set(df.columns)
    probes = []
    for f in contract.schema.fields:
        if f.nullable or f.name not in actual:
            continue
        alias = f"__null__{f.name}"
        expr = F.sum(F.col(f.name).isNull().cast("long")).alias(alias)

        def make_eval(fname: str, a: str):
            def evaluate(vals):
                nulls = vals[a] or 0
                return CheckResult(
                    name=f"schema.nullability:{fname}",
                    category="schema",
                    passed=nulls == 0,
                    severity=Severity.ERROR,
                    field=fname,
                    observed={"null_count": nulls},
                    message=(
                        ""
                        if nulls == 0
                        else f"non-nullable column '{fname}' contains {nulls} nulls"
                    ),
                )

            return evaluate

        probes.append(
            AggProbe(
                name=f"schema.nullability:{f.name}",
                category="schema",
                exprs=[expr],
                evaluate=make_eval(f.name, alias),
                fields=[f.name],
            )
        )
    return probes
