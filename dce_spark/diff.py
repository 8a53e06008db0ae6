"""Contract diffing: classify schema/constraint evolution as breaking
or compatible.

The reference ships ``validate``/``check``/``init`` (contracts_cli
main.rs); the missing lifecycle verb is "can I ship this new contract
version?" — the schema-evolution gate every production data platform
runs in CI. ``diff_contracts`` compares two contract versions and
labels every change:

- **breaking for readers** (consumers of the data would break):
  field removed, type changed non-wideningly, allowed values loosened
  (consumers may pattern-match the old closed set), range widened.
- **breaking for writers** (producers of the data would break):
  required field added, nullable tightened to required, allowed
  values tightened, range narrowed, pattern changed.
- **compatible**: nullable field added, nullable loosened, type
  widened (int32->int64, float32->float64, decimal precision growth,
  element-wise for list/map/struct), description/tags/owner edits.

Widening follows the lattice Spark itself uses for safe upcasts
(``Cast.canUpCast``): integral types widen along
int8->int16->int32->int64, fractional along float32->float64,
integrals up to int32 widen into float64 exactly; int64->float64 is
lossy above 2^53 and therefore NOT a widening here.

Everything is pure dataclass comparison — no Spark session needed, so
the CLI verb runs in CI in milliseconds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

from .contract import (
    AllowedValuesConstraint,
    Contract,
    Field,
    PatternConstraint,
    RangeConstraint,
)
from .types import parse_data_type

__all__ = ["Change", "ContractDiff", "diff_contracts", "is_widening"]

BREAKING_READERS = "breaking-readers"
BREAKING_WRITERS = "breaking-writers"
COMPATIBLE = "compatible"


@dataclass(frozen=True)
class Change:
    kind: str  # field_removed | field_added | type_changed | ...
    field: str | None
    impact: str  # breaking-readers | breaking-writers | compatible
    detail: str


@dataclass
class ContractDiff:
    changes: list[Change]

    @property
    def breaking(self) -> list[Change]:
        return [c for c in self.changes if c.impact != COMPATIBLE]

    @property
    def is_breaking(self) -> bool:
        return bool(self.breaking)

    def to_dict(self) -> dict:
        return {
            "breaking": self.is_breaking,
            "changes": [
                {
                    "kind": c.kind,
                    "field": c.field,
                    "impact": c.impact,
                    "detail": c.detail,
                }
                for c in self.changes
            ],
        }


_INT_WIDTH = {"byte": 8, "short": 16, "integer": 32, "long": 64}
_FLOAT_WIDTH = {"float": 32, "double": 64}


def is_widening(old: T.DataType, new: T.DataType) -> bool:
    """True iff every value of ``old`` is exactly representable in
    ``new`` (Spark's safe-upcast lattice)."""
    if old == new:
        return True
    on, nn = old.typeName(), new.typeName()
    if on in _INT_WIDTH and nn in _INT_WIDTH:
        return _INT_WIDTH[on] <= _INT_WIDTH[nn]
    if on in _FLOAT_WIDTH and nn in _FLOAT_WIDTH:
        return _FLOAT_WIDTH[on] <= _FLOAT_WIDTH[nn]
    # integrals through int32 fit exactly in float64 (53-bit mantissa);
    # int64 does NOT (lossy above 2^53)
    if on in _INT_WIDTH and nn == "double":
        return _INT_WIDTH[on] <= 32
    if on in _INT_WIDTH and nn == "decimal":
        return _INT_WIDTH[on] <= 32 and new.precision - new.scale >= 10
    if on == "decimal" and nn == "decimal":
        return (
            new.scale >= old.scale
            and new.precision - new.scale >= old.precision - old.scale
        )
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return (
            is_widening(old.elementType, new.elementType)
            and (new.containsNull or not old.containsNull)
        )
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        return (
            is_widening(old.keyType, new.keyType)
            and is_widening(old.valueType, new.valueType)
            and (new.valueContainsNull or not old.valueContainsNull)
        )
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        new_by_name = {f.name: f for f in new.fields}
        if {f.name for f in old.fields} - set(new_by_name):
            return False  # nested field removed
        for of in old.fields:
            nf = new_by_name[of.name]
            if not is_widening(of.dataType, nf.dataType):
                return False
            if of.nullable and not nf.nullable:
                return False
        # any ADDED nested field must be nullable
        return all(
            f.nullable for f in new.fields if f.name not in {o.name for o in old.fields}
        )
    return False


def _constraint_changes(old: Field, new: Field) -> list[Change]:
    out: list[Change] = []

    def one(cls):
        o = next((c for c in old.constraints if isinstance(c, cls)), None)
        n = next((c for c in new.constraints if isinstance(c, cls)), None)
        return o, n

    o, n = one(AllowedValuesConstraint)
    if o and n:
        ov, nv = set(o.values), set(n.values)
        if nv - ov:
            out.append(Change(
                "allowed_values_loosened", old.name, BREAKING_READERS,
                f"new values admitted: {sorted(nv - ov)} (consumers matching "
                f"the old closed set will miss them)"))
        if ov - nv:
            out.append(Change(
                "allowed_values_tightened", old.name, BREAKING_WRITERS,
                f"values no longer allowed: {sorted(ov - nv)}"))
    elif o and not n:
        out.append(Change("allowed_values_dropped", old.name, BREAKING_READERS,
                          "closed value set removed"))
    elif n and not o:
        out.append(Change("allowed_values_added", old.name, BREAKING_WRITERS,
                          f"new closed set {sorted(set(n.values))}"))

    o, n = one(RangeConstraint)
    if o and n:
        o_min = o.min if o.min is not None else float("-inf")
        o_max = o.max if o.max is not None else float("inf")
        n_min = n.min if n.min is not None else float("-inf")
        n_max = n.max if n.max is not None else float("inf")
        if n_min > o_min or n_max < o_max:
            out.append(Change("range_narrowed", old.name, BREAKING_WRITERS,
                              f"[{o_min}, {o_max}] -> [{n_min}, {n_max}]"))
        if n_min < o_min or n_max > o_max:
            out.append(Change("range_widened", old.name, BREAKING_READERS,
                              f"[{o_min}, {o_max}] -> [{n_min}, {n_max}]"))
    elif o and not n:
        out.append(Change("range_dropped", old.name, BREAKING_READERS,
                          "range constraint removed"))
    elif n and not o:
        out.append(Change("range_added", old.name, BREAKING_WRITERS,
                          f"new range [{n.min}, {n.max}]"))

    o, n = one(PatternConstraint)
    if o and n and o.regex != n.regex:
        # regex implication is undecidable in general — conservatively
        # breaking both ways
        out.append(Change("pattern_changed", old.name, BREAKING_WRITERS,
                          f"{o.regex!r} -> {n.regex!r}"))
    elif o and not n:
        out.append(Change("pattern_dropped", old.name, BREAKING_READERS,
                          "pattern constraint removed"))
    elif n and not o:
        out.append(Change("pattern_added", old.name, BREAKING_WRITERS,
                          f"new pattern {n.regex!r}"))
    return out


def diff_contracts(old: Contract, new: Contract) -> ContractDiff:
    changes: list[Change] = []
    old_fields = {f.name: f for f in old.schema.fields}
    new_fields = {f.name: f for f in new.schema.fields}

    for name in old_fields:
        if name not in new_fields:
            changes.append(Change("field_removed", name, BREAKING_READERS,
                                  "consumers selecting this column break"))
    for name, nf in new_fields.items():
        if name not in old_fields:
            if nf.nullable:
                changes.append(Change("field_added", name, COMPATIBLE,
                                      "nullable column added"))
            else:
                changes.append(Change(
                    "required_field_added", name, BREAKING_WRITERS,
                    "existing producers do not supply this required column"))
            continue
        of = old_fields[name]
        if of.type != nf.type:
            ot, nt = parse_data_type(of.type), parse_data_type(nf.type)
            if is_widening(ot, nt):
                changes.append(Change("type_widened", name, COMPATIBLE,
                                      f"{of.type} -> {nf.type}"))
            else:
                changes.append(Change("type_changed", name, BREAKING_READERS,
                                      f"{of.type} -> {nf.type} (not a safe upcast)"))
        if of.nullable and not nf.nullable:
            changes.append(Change("nullable_tightened", name, BREAKING_WRITERS,
                                  "now required; producers emitting nulls break"))
        elif not of.nullable and nf.nullable:
            changes.append(Change(
                "nullable_loosened", name, COMPATIBLE,
                "consumers assuming non-null should treat this as advisory"))
        changes.extend(_constraint_changes(of, nf))
    return ContractDiff(changes=changes)
