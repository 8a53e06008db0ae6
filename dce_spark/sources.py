"""Data sources: bind a contract's declared (format, location) to a DataFrame.

Maps the reference's readers (file_reader.rs:20-73 for parquet/CSV/NDJSON,
contracts_iceberg for Iceberg catalogs) onto ``spark.read`` /
``spark.table``. Formats the reference declares but does not implement
(avro/orc/delta/hudi) are wired to the corresponding Spark readers and
will work wherever the runtime jars are present; otherwise callers fall
back to schema-only validation exactly like the reference CLI
(validate.rs:88-98).

Scale notes: every reader is a lazy scan — Catalyst pushes filters and
prunes columns into it. Sampling uses ``limit(n)`` (take-first), the
same LIMIT-view semantics as the reference (file_reader.rs:60-70).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .contract import Contract, Schema

__all__ = ["load_source", "load_contract_source", "iceberg_table", "sample"]

_FILE_FORMATS = {"parquet", "csv", "json", "ndjson", "avro", "orc", "delta"}


def load_source(
    spark: SparkSession,
    format: str,
    location: str,
    schema: Optional[T.StructType] = None,
) -> DataFrame:
    fmt = (format or "").lower()
    if fmt == "iceberg":
        return iceberg_table(spark, location)
    if fmt in ("json", "ndjson"):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(location)
    if fmt == "csv":
        reader = spark.read.option("header", "true")
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(location)
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt in _FILE_FORMATS:
        return spark.read.format(fmt).load(location)
    raise ValueError(
        f"unsupported format {format!r}; schema-only validation is still available"
    )


def load_contract_source(spark: SparkSession, contract: Contract) -> DataFrame:
    """Read the table a contract points at. CSV/JSON get the declared
    schema (types come from the contract, not inference) — stronger than
    the reference, which lets DataFusion infer (file_reader.rs:40-51)."""
    sch = contract.schema
    declared = sch.to_struct_type() if sch.format in ("csv", "json", "ndjson") else None
    return load_source(spark, sch.format, sch.location, schema=declared)


def iceberg_table(spark: SparkSession, location: str) -> DataFrame:
    """Load an Iceberg table via a configured Spark catalog.

    ``location`` accepts ``catalog.namespace.table`` or a warehouse path
    (``s3://wh/ns/table``). Catalog configuration (REST/Glue/HMS/hadoop
    -> spark.sql.catalog.* conf, env-var resolution, location parsing)
    lives in :mod:`dce_spark.iceberg`, which ports the reference's
    catalog layer (config.rs:10-57, validate.rs:137-218). Partition
    pruning and predicate pushdown come from the Iceberg Spark source
    automatically once bound.
    """
    from .iceberg import load_iceberg_table

    return load_iceberg_table(spark, location)


def sample(df: DataFrame, n: Optional[int]) -> DataFrame:
    """Take-first-N sampling (reference semantics: head, not random —
    dataset.rs:178-183)."""
    return df.limit(n) if n is not None else df


def infer_contract_schema(
    spark: SparkSession, format: str, location: str
) -> Schema:
    """``dce init`` support: build a contract Schema from a live table
    (reverse of validation; reference init.rs:10-89 does this from
    Iceberg metadata — here any readable source works)."""
    df = load_source(spark, format, location)
    return Schema.from_struct_type(df.schema, format=format, location=location)
