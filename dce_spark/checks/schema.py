"""Schema checks: column presence, declared-type match, nullability.

Presence + type are pure metadata comparisons against ``df.schema`` —
zero Spark jobs (the reference runs a ``SELECT * LIMIT 0`` probe,
datafusion_engine.rs:258-286; Catalyst gives us the resolved schema for
free). Nullability compiles to null-count aggregate expressions fused
into the single-pass agg (reference issues one COUNT query per field,
datafusion_engine.rs:288-310).

Semantics kept from the reference: extra columns in the data are
tolerated (schema.rs:57-58); missing declared columns are errors.

Nested-null value checks (reference schema.rs:117-178, its recursive
``type_matches``): when a declared type carries ``contains_null=false``
/ ``value_contains_null=false`` / a non-nullable struct field, the DATA
is checked — a row whose array holds a null element (etc., recursively
at any depth) counts as a violation. Compiles to ``exists``/``forall``
higher-order expressions fused into the same single-pass agg; a NULL at
the column level is NOT a violation here (that is the nullability
check's job), matching the reference's separation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..contract import Contract
from ..report import CheckResult, Severity
from .probe import AggProbe

__all__ = [
    "presence_checks",
    "type_checks",
    "nullability_probes",
    "nested_null_probes",
]


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
        (T.DateType, T.TimestampNTZType),
        # a declared `timestamp` accepts either physical representation:
        # parquet stores isAdjustedToUTC true/false and Spark surfaces the
        # latter as TIMESTAMP_NTZ, but the reference's type model carries a
        # single Timestamp kind regardless of tz annotation
        # (schema.rs type_matches ignores unit/tz), so both map to the same
        # declared type here.
        (T.TimestampType, T.TimestampNTZType),
        (T.TimestampNTZType, T.TimestampType),
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


def _has_null_flags(dt: T.DataType) -> bool:
    """Does this (possibly nested) declared type carry any
    contains_null=false / non-nullable-struct-field rule to enforce?"""
    if isinstance(dt, T.ArrayType):
        return (not dt.containsNull) or _has_null_flags(dt.elementType)
    if isinstance(dt, T.MapType):
        return (not dt.valueContainsNull) or _has_null_flags(dt.valueType)
    if isinstance(dt, T.StructType):
        return any((not f.nullable) or _has_null_flags(f.dataType) for f in dt.fields)
    return False


def _violation_expr(col: F.Column, dt: T.DataType):
    """Boolean Column: True iff the value violates some nested null rule
    of ``dt`` (recursive port of the reference's type_matches walk,
    schema.rs:130-177). None when the subtree declares no rules.
    A NULL container yields NULL -> callers coalesce to False."""
    parts = []
    if isinstance(dt, T.ArrayType):
        if not dt.containsNull:
            parts.append(F.exists(col, lambda x: x.isNull()))
        if _has_null_flags(dt.elementType):
            parts.append(
                F.exists(
                    col,
                    lambda x: F.coalesce(
                        _violation_expr(x, dt.elementType), F.lit(False)
                    ),
                )
            )
    elif isinstance(dt, T.MapType):
        vals = F.map_values(col)
        if not dt.valueContainsNull:
            parts.append(F.exists(vals, lambda v: v.isNull()))
        if _has_null_flags(dt.valueType):
            parts.append(
                F.exists(
                    vals,
                    lambda v: F.coalesce(
                        _violation_expr(v, dt.valueType), F.lit(False)
                    ),
                )
            )
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            sub = col.getField(f.name)
            if not f.nullable:
                parts.append(col.isNotNull() & sub.isNull())
            if _has_null_flags(f.dataType):
                parts.append(
                    F.coalesce(_violation_expr(sub, f.dataType), F.lit(False))
                )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out | p
    return out


def nested_null_probes(contract: Contract, df: DataFrame) -> list[AggProbe]:
    """Per declared field with nested null rules: count of rows whose
    VALUE violates a contains_null=false / value_contains_null=false /
    non-nullable-struct-field declaration. Fused into the one-pass agg;
    pure higher-order expressions (exists over array/map values), no
    shuffle beyond the shared aggregate."""
    actual_types = {f.name: f.dataType for f in df.schema.fields}
    probes = []
    for f in contract.schema.fields:
        if f.name not in actual_types:
            continue
        declared = f.spark_type()
        if not _has_null_flags(declared):
            continue
        # a structurally mismatched column (declared list, actual string;
        # declared struct field absent, ...) is the type check's finding —
        # building exists()/getField() against it would just crash the
        # fused agg with an AnalysisException
        if not _type_compatible(declared, actual_types[f.name]):
            continue
        col = F.col(f.name)
        viol = F.coalesce(_violation_expr(col, declared), F.lit(False))
        alias = f"__nested__{f.name}"
        expr = F.sum((col.isNotNull() & viol).cast("long")).alias(alias)

        def make_eval(fname: str, a: str, type_str: str):
            def evaluate(vals):
                n = vals[a] or 0
                return CheckResult(
                    name=f"schema.nested_nulls:{fname}",
                    category="schema",
                    passed=n == 0,
                    severity=Severity.ERROR,
                    field=fname,
                    observed={"violations": n},
                    message=(
                        ""
                        if n == 0
                        else f"column '{fname}' has {n} rows violating the "
                        f"nested null rules of {type_str}"
                    ),
                )

            return evaluate

        probes.append(
            AggProbe(
                name=f"schema.nested_nulls:{f.name}",
                category="schema",
                exprs=[expr],
                evaluate=make_eval(f.name, alias, f.type),
                fields=[f.name],
                aliases=[alias],
            )
        )
    return probes


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
                aliases=[alias],
            )
        )
    return probes
