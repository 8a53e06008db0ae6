"""AggProbe: the unit of the fused single-pass aggregation.

Each row-local check compiles to a set of aliased aggregate Column
expressions plus an evaluator that turns the collected values into a
CheckResult. The compiler unions all probes' expressions into one
``df.agg(...)`` so the whole row-local portion of a contract costs a
single scan regardless of field/check count.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from pyspark.sql import Column

from ..report import CheckResult

__all__ = ["AggProbe"]


@dataclass
class AggProbe:
    """One check's contribution to the fused aggregation pass."""

    name: str
    category: str  # schema | constraints | quality | ml
    exprs: list[Column]
    # evaluate(values: dict alias -> value) -> CheckResult
    evaluate: Callable[[dict[str, Any]], CheckResult]
    # number of constraint evaluations this probe represents (for stats)
    constraints: int = 0
    fields: list[str] = dc_field(default_factory=list)
    # aliased output name of each expression in ``exprs``, in order.
    # The mergeable-state path (state.py) reads these to bind state
    # columns to merge rules — an explicit contract, since Column has
    # no portable alias accessor (the JVM plan string is not one and
    # ``_jc`` does not exist under Spark Connect).
    aliases: list[str] = dc_field(default_factory=list)
