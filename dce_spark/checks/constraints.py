"""Field constraints: allowed-values, numeric range, regex pattern.

Each compiles to a violation-count aggregate expression fused into the
single-pass agg. The reference issues one COUNT(*) query per
constraint (datafusion_engine.rs:347-422); semantics preserved:

- NULLs are skipped by every constraint (nullability is a separate
  check) — the ``IS NOT NULL AND`` guard in the reference SQL
  (constraints.rs:78-81).
- allowed-values compares the *string form* of the value
  (``CAST(c AS VARCHAR) NOT IN (...)``, datafusion_engine.rs:358-361).
- range compares ``CAST(c AS DOUBLE)`` (datafusion_engine.rs:373-392).
- pattern uses unanchored regex *search* (`rlike`), matching the
  reference's row path (`regex::is_match`, constraints.rs:252); its SQL
  path (`SIMILAR TO`) is anchored — a documented divergence in the
  reference itself. Callers anchor explicitly (e.g. ``^https?://``).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from ..contract import (
    AllowedValuesConstraint,
    Constraint,
    Contract,
    PatternConstraint,
    RangeConstraint,
)
from ..report import CheckResult, Severity
from .probe import AggProbe

__all__ = ["constraint_probes", "violation_expr"]


def _stringify(v: Any) -> str:
    # match Spark's CAST(x AS STRING) rendering for the common literals
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def violation_expr(col: Column, c: Constraint) -> Column:
    """Boolean column: True where the (non-null) value VIOLATES ``c``."""
    if isinstance(c, AllowedValuesConstraint):
        allowed = [_stringify(v) for v in c.values]
        return col.isNotNull() & ~col.cast("string").isin(allowed)
    if isinstance(c, RangeConstraint):
        d = col.cast("double")
        cond = F.lit(False)
        if c.min is not None:
            cond = cond | (d < float(c.min))
        if c.max is not None:
            cond = cond | (d > float(c.max))
        return col.isNotNull() & cond
    if isinstance(c, PatternConstraint):
        return col.isNotNull() & ~col.cast("string").rlike(c.regex)
    raise TypeError(f"unknown constraint {c!r}")


def constraint_probes(contract: Contract, df: DataFrame) -> list[AggProbe]:
    actual = set(df.columns)
    probes = []
    for f in contract.schema.fields:
        if f.name not in actual:
            continue
        for i, c in enumerate(f.constraints):
            alias = f"__con__{f.name}__{i}"
            expr = F.sum(violation_expr(F.col(f.name), c).cast("long")).alias(alias)
            desc = {
                AllowedValuesConstraint: lambda c: f"allowed_values{list(c.values)}",
                RangeConstraint: lambda c: f"range[{c.min}, {c.max}]",
                PatternConstraint: lambda c: f"pattern /{c.regex}/",
            }[type(c)](c)

            def make_eval(fname: str, a: str, kind: str, d: str):
                def evaluate(vals):
                    n = vals[a] or 0
                    return CheckResult(
                        name=f"constraints.{kind}:{fname}",
                        category="constraints",
                        passed=n == 0,
                        severity=Severity.ERROR,
                        field=fname,
                        observed={"violations": n},
                        message=(
                            ""
                            if n == 0
                            else f"column '{fname}' has {n} values violating {d}"
                        ),
                    )

                return evaluate

            probes.append(
                AggProbe(
                    name=f"constraints.{c.kind}:{f.name}",
                    category="constraints",
                    exprs=[expr],
                    evaluate=make_eval(f.name, alias, c.kind, desc),
                    constraints=1,
                    fields=[f.name],
                    aliases=[alias],
                )
            )
    return probes
