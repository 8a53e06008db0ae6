"""Type-string parser round-trips (ports the reference test matrix,
datatype.rs:298-537)."""

import pytest
from pyspark.sql import types as T

from dce_spark.types import TypeParseError, format_data_type, parse_data_type


@pytest.mark.parametrize(
    "s,expected",
    [
        ("string", T.StringType()),
        ("STRING", T.StringType()),
        ("varchar", T.StringType()),
        ("text", T.StringType()),
        ("uuid", T.StringType()),
        ("int32", T.IntegerType()),
        ("int", T.IntegerType()),
        ("integer", T.IntegerType()),
        ("int64", T.LongType()),
        ("long", T.LongType()),
        ("bigint", T.LongType()),
        ("float32", T.FloatType()),
        ("float", T.FloatType()),
        ("float64", T.DoubleType()),
        ("double", T.DoubleType()),
        ("boolean", T.BooleanType()),
        ("bool", T.BooleanType()),
        ("timestamp", T.TimestampType()),
        ("datetime", T.TimestampType()),
        ("date", T.DateType()),
        ("binary", T.BinaryType()),
        ("decimal", T.DecimalType(38, 18)),
        ("decimal(18,4)", T.DecimalType(18, 4)),
        ("list<int64>", T.ArrayType(T.LongType())),
        ("array<int64>", T.ArrayType(T.LongType())),
        ("list<list<string>>", T.ArrayType(T.ArrayType(T.StringType()))),
        ("map<string,double>", T.MapType(T.StringType(), T.DoubleType())),
        (
            "struct<name:string,age:int32>",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("age", T.IntegerType()),
                ]
            ),
        ),
        (
            "map<string, list<struct<a:int64, b: double>>>",
            T.MapType(
                T.StringType(),
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("a", T.LongType()),
                            T.StructField("b", T.DoubleType()),
                        ]
                    )
                ),
            ),
        ),
    ],
)
def test_parse(s, expected):
    assert parse_data_type(s) == expected


@pytest.mark.parametrize(
    "s",
    ["", "  ", "list<", "list<int64", "map<string>", "struct<>", "frobnicate",
     "int32 extra", "list<int64>>"],
)
def test_parse_errors(s):
    with pytest.raises(TypeParseError):
        parse_data_type(s)


@pytest.mark.parametrize(
    "s",
    [
        "string",
        "int32",
        "int64",
        "float32",
        "float64",
        "boolean",
        "timestamp",
        "date",
        "binary",
        "decimal",
        "decimal(18,4)",
        "list<int64>",
        "map<string,float64>",
        "struct<name:string,age:int32>",
        "list<map<string,struct<a:int64>>>",
    ],
)
def test_round_trip(s):
    assert format_data_type(parse_data_type(s)) == s.replace(" ", "")


def test_round_trip_canonicalizes_aliases():
    assert format_data_type(parse_data_type("map<varchar,double>")) == "map<string,float64>"


# ---- `not null` nested flags (extension: the reference's DataType model
# carries these flags, datatype.rs:28-52, but its string grammar cannot
# express them — ours can; omitted they default to nullable)

@pytest.mark.parametrize(
    "s,expected",
    [
        ("list<string not null>", T.ArrayType(T.StringType(), containsNull=False)),
        ("array<int64 NOT NULL>", T.ArrayType(T.LongType(), containsNull=False)),
        ("list<string>", T.ArrayType(T.StringType(), containsNull=True)),
        (
            "map<string, int64 not null>",
            T.MapType(T.StringType(), T.LongType(), valueContainsNull=False),
        ),
        (
            "struct<a:int64 not null, b:string>",
            T.StructType(
                [
                    T.StructField("a", T.LongType(), nullable=False),
                    T.StructField("b", T.StringType(), nullable=True),
                ]
            ),
        ),
        (
            "list<struct<v:int64 not null>>",
            T.ArrayType(
                T.StructType([T.StructField("v", T.LongType(), nullable=False)]),
                containsNull=True,
            ),
        ),
    ],
)
def test_parse_not_null_flags(s, expected):
    assert parse_data_type(s) == expected


@pytest.mark.parametrize(
    "s",
    [
        "list<string not null>",
        "map<string,int64 not null>",
        "struct<a:int64 not null,b:string>",
        "list<struct<v:int64 not null> not null>",
    ],
)
def test_not_null_round_trip(s):
    assert format_data_type(parse_data_type(s)) == s


def test_not_alone_is_error():
    with pytest.raises(TypeParseError):
        parse_data_type("list<string not>")


def test_generated_nested_types_round_trip():
    """Hypothesis: format(parse(format(t))) is a fixpoint for randomly
    composed nested types (list/map/struct over all primitives with
    random not-null flags, depth <= 3) — the recursive-descent parser
    and printer must agree on the entire grammar, not just the
    hand-picked cases above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dce_spark.types import format_data_type, parse_data_type

    prims = st.sampled_from(
        ["string", "int32", "int64", "float32", "float64", "boolean",
         "timestamp", "date", "decimal(12,3)", "binary"]
    )

    def compound(children):
        field = st.tuples(
            st.sampled_from(["a", "b2", "x_y", "n0"]), children, st.booleans()
        )
        return st.one_of(
            st.tuples(children, st.booleans()).map(
                lambda t: f"list<{t[0]}{' not null' if t[1] else ''}>"
            ),
            st.tuples(prims, children, st.booleans()).map(
                lambda t: f"map<{t[0]}, {t[1]}{' not null' if t[2] else ''}>"
            ),
            st.lists(field, min_size=1, max_size=3, unique_by=lambda f: f[0]).map(
                lambda fs: "struct<"
                + ", ".join(
                    f"{n}:{t}{' not null' if nn else ''}" for n, t, nn in fs
                )
                + ">"
            ),
        )

    types = st.recursive(prims, compound, max_leaves=8)

    @settings(max_examples=200, deadline=None)
    @given(s=types)
    def run(s):
        dt = parse_data_type(s)
        printed = format_data_type(dt)
        # fixpoint: parsing the canonical form reproduces it exactly
        assert format_data_type(parse_data_type(printed)) == printed
        # and the canonical form denotes the same Spark type
        assert parse_data_type(printed) == dt

    run()


def test_schema_struct_type_round_trip_generated():
    """Schema.from_struct_type(to_struct_type(s)) is a fixpoint for
    schemas whose field types span the generated nested-type grammar —
    the contract model and the Spark schema can never drift."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dce_spark.contract import Schema
    from dce_spark.types import parse_data_type

    prims = st.sampled_from(
        ["string", "int64", "float64", "boolean", "timestamp",
         "decimal(10,2)", "list<int32>", "map<string, float32>",
         "struct<a:string, b:list<int64 not null>>"]
    )
    fields = st.lists(
        st.tuples(st.sampled_from(["f1", "g_2", "h3", "k"]), prims, st.booleans()),
        min_size=1, max_size=4,
        unique_by=lambda f: f[0],
    )

    @settings(max_examples=100, deadline=None)
    @given(fs=fields)
    def run(fs):
        import pyspark.sql.types as T

        struct = T.StructType(
            [T.StructField(n, parse_data_type(t), nullable) for n, t, nullable in fs]
        )
        schema = Schema.from_struct_type(struct)
        assert schema.to_struct_type() == struct
        # and once more through the string grammar
        schema2 = Schema.from_struct_type(schema.to_struct_type())
        assert schema2.to_struct_type() == struct

    run()
