"""Oracle parity: every catalog query's Spark result must match its
DuckDB oracle — the same protocol the driver uses (row count, column
names, order-insensitive value comparison), at sf0.001 for speed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from dce_spark.queries import QUERIES

from conftest import SF_DIR

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    return v


def _row_key(row):
    return tuple(str(_normalize(v)) for v in row)


def compare(spark_df, duck_rel):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    s_rows = [
        _row_key([r[c] for c in s_cols]) for r in spark_df.collect()
    ]
    idx = {c: i for i, c in enumerate(duck_rel.columns)}
    d_rows = [
        _row_key([row[idx[c]] for c in s_cols]) for row in duck_rel.fetchall()
    ]
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted, d_sorted = sorted(s_rows), sorted(d_rows)
    mismatches = [
        (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
    ][:5]
    assert not mismatches, f"value mismatches (spark, duckdb): {mismatches}"


@pytest.mark.parametrize(
    "name", [n for n, s in QUERIES.items() if s.oracle is not None]
)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    spark_df = spec.fn(spark, SF_DIR)
    duck_rel = duck.sql(spec.oracle)
    compare(spark_df, duck_rel)


def test_all_queries_have_docs():
    for name, spec in QUERIES.items():
        assert spec.doc, f"{name} missing doc"
