"""Test-data loading: the driver's synthetic TPC-H-ish tables.

Handles both timestamp layouts the driver has shipped: native parquet
TIMESTAMP(MICROS) (current — read directly as TIMESTAMP_NTZ, predicates
push down to the scan natively) and INT64 TIMESTAMP(NANOS) (older
datasets — Spark's vectorized reader rejects it, so we read with
``spark.sql.legacy.parquet.nanosAsLong`` and convert nanos -> native
TimestampType via exact integer division (``div``, not ``/`` — double
division loses precision above 2^53 nanos)).

Session timezone is pinned to UTC so epoch-second comparisons against
engines with naive timestamps (the DuckDB oracle) are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["configure", "load_table", "TS_COLUMNS", "TABLES"]

TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

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


def configure(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table; nano-timestamp columns become native
    TimestampType (microsecond precision, truncated)."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TS_COLUMNS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table with nano-timestamp columns left as raw
    int64 nanos. Predicates on the raw column push down to the parquet
    scan (row-group skipping); the converted TimestampType column from
    :func:`load_table` is a derived expression and cannot."""
    configure(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_nanos(iso_utc: str) -> int:
    """'YYYY-MM-DD[ HH:MM:SS]' (UTC) -> int64 nanos since epoch, for
    pushdown-friendly filters against raw nano-timestamp columns."""
    from datetime import datetime, timezone

    fmt = "%Y-%m-%d %H:%M:%S" if " " in iso_utc else "%Y-%m-%d"
    dt = datetime.strptime(iso_utc, fmt).replace(tzinfo=timezone.utc)
    return int(dt.timestamp()) * 1_000_000_000


def local_result(spark: SparkSession, out: DataFrame, *release: DataFrame):
    """Collect a bounded final frame into a local-relation DataFrame,
    releasing every frame in ``release`` on ALL paths (r16 ADVICE fix:
    the inline persist -> collect -> unpersist pattern leaked its
    persisted blocks for the rest of the session when the collect
    raised). Only for driver-bounded rollups — the _local_result
    convention of the staged graph queries, centralized in a leaf
    module so every staging cohort can import it without cycles."""
    try:
        rows = out.collect()
    finally:
        for fr in release:
            fr.unpersist()
    return spark.createDataFrame(rows, out.schema)
