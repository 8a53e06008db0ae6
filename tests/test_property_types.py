"""Property-based tests for the type-string parser (hypothesis)."""

import hypothesis.strategies as st
from hypothesis import given, settings

from dce_spark.types import format_data_type, parse_data_type

PRIMS = [
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
]

IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


def type_strings(depth: int = 3):
    base = st.sampled_from(PRIMS)
    return st.recursive(
        base,
        lambda inner: st.one_of(
            inner.map(lambda t: f"list<{t}>"),
            st.tuples(st.sampled_from(["string", "int64"]), inner).map(
                lambda kv: f"map<{kv[0]},{kv[1]}>"
            ),
            st.lists(
                st.tuples(IDENT, inner), min_size=1, max_size=3, unique_by=lambda kv: kv[0]
            ).map(lambda fs: "struct<" + ",".join(f"{n}:{t}" for n, t in fs) + ">"),
        ),
        max_leaves=8,
    )


@given(type_strings())
@settings(max_examples=200, deadline=None)
def test_parse_format_fixpoint(s):
    """format(parse(s)) is a fixpoint: parsing it again yields the same
    Spark type, and formatting is idempotent."""
    dt = parse_data_type(s)
    canon = format_data_type(dt)
    assert parse_data_type(canon) == dt
    assert format_data_type(parse_data_type(canon)) == canon


def nameless_type_strings():
    """Types without struct fields — field NAMES are case-sensitive, the
    type keywords are not."""
    base = st.sampled_from(PRIMS)
    return st.recursive(
        base,
        lambda inner: st.one_of(
            inner.map(lambda t: f"list<{t}>"),
            st.tuples(st.sampled_from(["string", "int64"]), inner).map(
                lambda kv: f"map<{kv[0]},{kv[1]}>"
            ),
        ),
        max_leaves=8,
    )


@given(nameless_type_strings())
@settings(max_examples=100, deadline=None)
def test_case_insensitive_keywords(s):
    assert parse_data_type(s.upper()) == parse_data_type(s)


@given(type_strings())
@settings(max_examples=100, deadline=None)
def test_whitespace_tolerant(s):
    spaced = s.replace(",", " , ").replace("<", "< ").replace(">", " >")
    assert parse_data_type(spaced) == parse_data_type(s)
