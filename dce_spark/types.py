"""Contract type-string parser <-> Spark types.

Re-implements the reference's recursive-descent type parser
(reference: crates/contracts_core/src/datatype.rs:109-243) on top of
pyspark.sql.types. Accepts the same surface syntax:

- primitives: string, int32, int64, float32, float64, boolean,
  timestamp, date, time, decimal[(p,s)], uuid, binary
- aliases (case-insensitive): varchar|text -> string, int|integer -> int32,
  long|bigint -> int64, float -> float32, double -> float64,
  bool -> boolean, datetime -> timestamp
- complex: list<T> / array<T>, map<K,V>, struct<name:type,...>
- null flags (extension): ``list<T not null>`` (contains_null=false),
  ``map<K, V not null>`` (value_contains_null=false),
  ``struct<name:T not null, ...>`` (field nullable=false)

The reference's DataType model carries contains_null /
value_contains_null / struct-field nullable flags (datatype.rs:28-52)
and its row engine enforces them on values (schema.rs:117-178), but its
*string grammar* cannot express them — they are only reachable through
the Rust builder API. Our YAML-facing grammar adds the ``not null``
marker so contracts can declare the same rules; omitted, every flag
defaults to nullable exactly like the reference parser
(datatype.rs:128-130).

Unlike the reference (which widens int32->int64, float32->float64 and
collapses date/decimal/binary/uuid to strings when building Arrow data,
datatype mapping at datafusion_engine.rs:1534-1543), we map every type to
its faithful native Spark type.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = ["parse_data_type", "format_data_type", "TypeParseError"]


class TypeParseError(ValueError):
    """Raised when a contract type string cannot be parsed."""


_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "uuid": T.StringType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float32": T.FloatType(),
    "float": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "datetime": T.TimestampType(),
    "date": T.DateType(),
    # No TimeType in Spark (<4 parity); reference collapses time to string too.
    "time": T.StringType(),
    "binary": T.BinaryType(),
}

# canonical names for round-trip formatting
_CANONICAL: dict[str, str] = {
    "varchar": "string",
    "text": "string",
    "int": "int32",
    "integer": "int32",
    "long": "int64",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "bool": "boolean",
    "datetime": "timestamp",
}

_DEFAULT_DECIMAL = (38, 18)


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def error(self, msg: str) -> TypeParseError:
        return TypeParseError(f"{msg} at position {self.i} in type string {self.s!r}")

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def skip_ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def expect(self, ch: str) -> None:
        self.skip_ws()
        if self.peek() != ch:
            raise self.error(f"expected {ch!r}, found {self.peek()!r}")
        self.i += 1

    def ident(self) -> str:
        self.skip_ws()
        start = self.i
        while self.i < len(self.s) and (self.s[self.i].isalnum() or self.s[self.i] == "_"):
            self.i += 1
        if self.i == start:
            raise self.error("expected identifier")
        return self.s[start : self.i]

    def integer(self) -> int:
        self.skip_ws()
        start = self.i
        while self.i < len(self.s) and self.s[self.i].isdigit():
            self.i += 1
        if self.i == start:
            raise self.error("expected integer")
        return int(self.s[start : self.i])

    def try_not_null(self) -> bool:
        """Consume an optional ``not null`` marker; backtracks cleanly."""
        save = self.i
        self.skip_ws()
        try:
            if self.ident().lower() == "not":
                if self.ident().lower() == "null":
                    return True
        except TypeParseError:
            pass
        self.i = save
        return False

    def parse_type(self) -> T.DataType:
        name = self.ident().lower()
        if name in ("list", "array"):
            self.expect("<")
            elem = self.parse_type()
            contains_null = not self.try_not_null()
            self.expect(">")
            return T.ArrayType(elem, containsNull=contains_null)
        if name == "map":
            self.expect("<")
            key = self.parse_type()
            self.expect(",")
            val = self.parse_type()
            value_contains_null = not self.try_not_null()
            self.expect(">")
            return T.MapType(key, val, valueContainsNull=value_contains_null)
        if name == "struct":
            self.expect("<")
            fields = []
            while True:
                fname = self.ident()
                self.expect(":")
                ftype = self.parse_type()
                nullable = not self.try_not_null()
                fields.append(T.StructField(fname, ftype, nullable=nullable))
                self.skip_ws()
                if self.peek() == ",":
                    self.i += 1
                    continue
                break
            self.expect(">")
            return T.StructType(fields)
        if name == "decimal":
            self.skip_ws()
            if self.peek() == "(":
                self.i += 1
                p = self.integer()
                self.expect(",")
                s = self.integer()
                self.expect(")")
                return T.DecimalType(p, s)
            return T.DecimalType(*_DEFAULT_DECIMAL)
        if name in _PRIMITIVES:
            return _PRIMITIVES[name]
        raise self.error(f"unknown type name {name!r}")


def parse_data_type(s: str) -> T.DataType:
    """Parse a contract type string into a Spark ``DataType``.

    Case-insensitive, alias-aware, recursive (list/map/struct), with
    balanced-bracket validation — the same grammar the reference accepts.
    """
    if not s or not s.strip():
        raise TypeParseError("empty type string")
    p = _Parser(s.strip())
    dt = p.parse_type()
    p.skip_ws()
    if p.i != len(p.s):
        raise TypeParseError(
            f"trailing characters {p.s[p.i:]!r} after type in {s!r}"
        )
    return dt


def format_data_type(dt: T.DataType) -> str:
    """Render a Spark type back to canonical contract syntax (round-trips
    with :func:`parse_data_type`)."""
    if isinstance(dt, T.ArrayType):
        nn = "" if dt.containsNull else " not null"
        return f"list<{format_data_type(dt.elementType)}{nn}>"
    if isinstance(dt, T.MapType):
        nn = "" if dt.valueContainsNull else " not null"
        return f"map<{format_data_type(dt.keyType)},{format_data_type(dt.valueType)}{nn}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{format_data_type(f.dataType)}"
            + ("" if f.nullable else " not null")
            for f in dt.fields
        )
        return f"struct<{inner}>"
    if isinstance(dt, T.DecimalType):
        if (dt.precision, dt.scale) == _DEFAULT_DECIMAL:
            return "decimal"
        return f"decimal({dt.precision},{dt.scale})"
    mapping = {
        T.StringType(): "string",
        T.IntegerType(): "int32",
        T.LongType(): "int64",
        T.FloatType(): "float32",
        T.DoubleType(): "float64",
        T.BooleanType(): "boolean",
        T.TimestampType(): "timestamp",
        T.TimestampNTZType(): "timestamp_ntz",
        T.DateType(): "date",
        T.BinaryType(): "binary",
    }
    try:
        return mapping[dt]
    except KeyError:
        raise TypeParseError(f"cannot format Spark type {dt!r} as a contract type")
