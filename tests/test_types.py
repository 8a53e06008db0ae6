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
