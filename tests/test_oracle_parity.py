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


# Canonical dtype names for the Spark-vs-DuckDB schema compare. The
# driver's value-hash is TYPED (CORRECTNESS_r03: a value-identical
# window sum went red purely because DuckDB widened sum(BIGINT) to
# HUGEINT/int128), so parity must compare dtypes, not just names.
# Documented normalization: integer/float widths map to numpy-style
# names on both sides; DECIMAL(p,s) collapses to "decimal"; both
# TIMESTAMP flavors collapse to "timestamp". HUGEINT is an outright
# FAILURE — there is no Spark type it can match; the oracle must
# CAST(... AS BIGINT).
_SPARK_CANON = {
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "tinyint": "int8",
    "double": "float64",
    "float": "float32",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}
_DUCK_CANON = {
    "BIGINT": "int64",
    "INTEGER": "int32",
    "SMALLINT": "int16",
    "TINYINT": "int8",
    "DOUBLE": "float64",
    "FLOAT": "float32",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
}


def _canon_spark_type(dt: str) -> str:
    dt = dt.lower()
    for prefix, name in (("decimal", "decimal"), ("array", "list"),
                         ("map", "map"), ("struct", "struct")):
        if dt.startswith(prefix):
            return name
    return _SPARK_CANON.get(dt, dt)


def _canon_duck_type(t) -> str:
    s = str(t).upper()
    assert s != "HUGEINT", (
        "oracle column is HUGEINT (int128): DuckDB widened an integer "
        "SUM (window sums especially). Wrap it in CAST(... AS BIGINT) "
        "— the driver's typed value-hash diverges on int128 even when "
        "every value is identical (the CORRECTNESS_r03 red row)."
    )
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.endswith("[]") or s.startswith("LIST") or s.startswith("ARRAY"):
        return "list"
    if s.startswith("MAP"):
        return "map"
    if s.startswith("STRUCT"):
        return "struct"
    return _DUCK_CANON.get(s, s.lower())


def compare(spark_df, duck_rel):
    # exact ORDER, not sorted names — the driver compare is
    # order-sensitive (embedding_ivf_knn_join would have failed it)
    assert list(spark_df.columns) == list(duck_rel.columns), (
        f"column order mismatch: spark={spark_df.columns} "
        f"duckdb={duck_rel.columns}"
    )
    s_types = {c: _canon_spark_type(t) for c, t in spark_df.dtypes}
    d_types = {
        c: _canon_duck_type(t) for c, t in zip(duck_rel.columns, duck_rel.types)
    }
    mismatched_types = {
        c: (s_types[c], d_types[c]) for c in s_types if s_types[c] != d_types[c]
    }
    assert not mismatched_types, (
        f"dtype mismatch (spark, duckdb): {mismatched_types}"
    )
    s_cols = sorted(spark_df.columns)
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


def test_compare_rejects_swapped_columns(spark, duck):
    """The harness itself must fail on a column-ORDER mismatch — the
    defect class that hid embedding_ivf_knn_join's swap in round 3."""
    sdf = spark.createDataFrame([(1, 2.0)], "a long, b double")
    rel = duck.sql("SELECT 2.0 AS b, CAST(1 AS BIGINT) AS a")
    with pytest.raises(AssertionError, match="column order mismatch"):
        compare(sdf, rel)


def test_compare_rejects_uncast_hugeint(spark, duck):
    """The harness must fail on DuckDB integer widening: a window/
    grouped SUM over BIGINT comes back HUGEINT (int128) and the
    driver's typed hash diverges on value-identical results."""
    sdf = spark.createDataFrame([(1,)], "s long")
    rel = duck.sql("SELECT sum(CAST(1 AS BIGINT)) AS s")
    with pytest.raises(AssertionError, match="HUGEINT"):
        compare(sdf, rel)


def test_compare_rejects_dtype_mismatch(spark, duck):
    """int32-vs-int64 and float-vs-double disagreements must fail —
    they serialize differently under a typed hash."""
    sdf = spark.createDataFrame([(1,)], "a int")
    rel = duck.sql("SELECT CAST(1 AS BIGINT) AS a")
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare(sdf, rel)


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "window_running_total_orders",
        "sessionization_events",
        "bpe_merges_documents",
        "dedup_exact_documents",
        # round-5 representatives: sketch-backed, stateful-replay and
        # ANN paths all carry explicit determinism contracts
        "pq_recall_at_k_embeddings",
        "heavy_hitters_batch_events",
        "late_data_windows_events",
        "interp_logprob_documents",
    ],
)
def test_results_invariant_under_partitioning(spark, name):
    """The determinism conventions (quantized sums, unique tie-breaks,
    deterministic folds) must make results identical at ANY partition
    count — re-plan each representative query with shuffle.partitions
    1 and 7 and require byte-equal sorted rows."""
    spec = QUERIES[name]
    results = []
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("1", "7"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = spec.fn(spark, SF_DIR)
            results.append(sorted(tuple(str(v) for v in r) for r in df.collect()))
            spark.catalog.clearCache()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1]
    assert len(results[0]) > 0
