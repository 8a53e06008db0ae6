"""Write-side sinks: partitioned, range-sorted, and compacted layouts.

The reference's only sink is the validation report (contracts_cli
main.rs text/JSON output; docs/ARCHITECTURE.md:60-66) — dce-spark keeps
that (report.py / cli.py) and adds the write paths a 100 TB
training-data pipeline needs on the data side:

- :func:`write_partitioned` — hive-style ``partitionBy`` writes with
  per-partition-directory file-count control. The naive
  ``df.write.partitionBy(c)`` lets every upstream task write into every
  partition directory, producing ``tasks x partitions`` small files at
  cluster scale; repartitioning on the partition columns first makes
  each directory come from a bounded number of tasks.
- :func:`write_sorted` — ``repartitionByRange`` + ``sortWithinPartitions``
  so every output file covers a disjoint key range and is internally
  sorted: parquet writes min/max stats per row group, so point and
  range scans over the sort key prune to a handful of files
  (zone-map pruning) without any index service.
- :func:`compact` — small-file compaction with ``coalesce`` (no
  shuffle: bins existing splits into fewer tasks), the maintenance
  job that keeps a streaming/append table scannable.
- :func:`layout_stats` — per-file row counts + sort-key ranges of an
  existing layout, computed as ONE distributed aggregation over
  ``input_file_name()`` (never listing files on the driver).

Bucketed (pre-shuffled, join-colocated) writes live in
:mod:`dce_spark.ext.bucketing`.

Scale notes: all writers take ``max_records_per_file`` (maps to the
``maxRecordsPerFile`` writer option) as the row-level backstop against
oversized files; ``write_sorted``'s file count should be sized so one
file ~ one HDFS block / S3 part (128-512 MB). ``compact`` reads the
source layout lazily and coalesces — partition-local concatenation,
no shuffle, no driver materialization.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_partitioned",
    "write_sorted",
    "compact",
    "layout_stats",
    "zorder_key",
    "minmax_bucket",
]


def minmax_bucket(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Affine-bucketize a numeric column into ``[0, 2^bits)`` given its
    (pre-computed) min/max — the cheap linear quantizer feeding
    :func:`zorder_key`. Values at ``mx`` clamp into the top bucket;
    out-of-range values clamp at the edges (a stats-drifted row must
    not corrupt the interleave). Plain double arithmetic, so any
    engine reproduces the same buckets."""
    if not mx > mn:
        raise ValueError(f"need mx > mn, got [{mn}, {mx}]")
    nb = 1 << bits
    raw = F.floor((col.cast("double") - F.lit(float(mn)))
                  / F.lit(float(mx) - float(mn)) * F.lit(nb))
    return F.least(F.lit(nb - 1).cast("long"), F.greatest(F.lit(0).cast("long"),
                                                          raw.cast("long")))


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of pre-bucketed non-negative ints:
    bit i of column j lands at position ``i * n_cols + j``.

    Sorting/range-partitioning by this ONE key gives every output file
    a bounded hyper-rectangle in ALL participating dimensions at once —
    so parquet min/max stats prune selective filters on ANY of the
    columns, where a lexicographic sort only ever prunes its leading
    column. This is how multi-dimensional clustering ships in lakehouse
    table formats, expressed as a pure column expression: feed it to
    :func:`write_sorted` (``sort_by=[zorder_key(...)]`` via a named
    column).

    ``bits * len(cols)`` must fit in 63 bits. The disjoint bit
    positions make ``+`` equivalent to bitwise OR — and both stay in
    whole-stage codegen.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (use a plain sort for 1)")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds 63-bit key space")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    files_per_partition: int = 1,
    mode: str = "error",
    format: str = "parquet",
    max_records_per_file: Optional[int] = None,
) -> None:
    """Hive-partitioned write with a bounded file count per directory.

    ``files_per_partition=1`` repartitions on the partition columns so
    each partition value lands in exactly one task -> one file per
    directory. For hot partitions (one value >> others), raise
    ``files_per_partition``: a deterministic salt (xxhash64 of the full
    row, mod N) spreads each partition value over N tasks/files.
    ``max_records_per_file`` additionally splits any file that would
    exceed the row cap (writer-side, no extra shuffle).
    """
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    keys = [F.col(c) for c in partition_by]
    if files_per_partition == 1:
        out = df.repartition(*keys)
    else:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(files_per_partition))
        out = df.withColumn("__salt", salt).repartition(*keys, F.col("__salt"))
        out = out.drop("__salt")
    writer = out.write.mode(mode).format(format).partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: Sequence[str],
    num_files: int,
    mode: str = "error",
    format: str = "parquet",
    max_records_per_file: Optional[int] = None,
) -> None:
    """Range-partitioned, locally-sorted write (zone-map layout).

    ``repartitionByRange`` samples the sort key and assigns each output
    task a disjoint key range (one range shuffle); ``sortWithinPartitions``
    orders rows inside each task so parquet row-group min/max stats are
    tight. A later ``WHERE sort_key = x`` / ``BETWEEN`` scan prunes to
    the one file (and row group) whose range contains ``x`` — the same
    effect a clustered index gives, from layout alone. This is the
    cheap 1-D version of Z-ordering; for multi-key locality put the
    highest-selectivity key first in ``sort_by``.
    """
    if num_files < 1:
        raise ValueError("num_files must be >= 1")
    keys = [F.col(c) for c in sort_by]
    out = df.repartitionByRange(num_files, *keys).sortWithinPartitions(*keys)
    writer = out.write.mode(mode).format(format)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    num_files: int,
    format: str = "parquet",
    mode: str = "error",
) -> None:
    """Rewrite a many-small-files layout as ``num_files`` files.

    Uses ``coalesce`` (not ``repartition``): existing splits are binned
    into fewer tasks with NO shuffle — each output file is a
    concatenation of whole input splits, which is exactly what
    compaction wants. Writes to ``dest_path`` (never in place: Spark
    cannot overwrite a path mid-scan, and a failed in-place rewrite
    must not destroy the source — swap paths after success, as table
    formats do with atomic metadata commits).
    """
    if num_files < 1:
        raise ValueError("num_files must be >= 1")
    if src_path == dest_path:
        raise ValueError("compact writes to a new path; swap after success")
    df = spark.read.format(format).load(src_path)
    df.coalesce(num_files).write.mode(mode).format(format).save(dest_path)


def layout_stats(
    spark: SparkSession,
    path: str,
    sort_by: Optional[Sequence[str]] = None,
    format: str = "parquet",
) -> DataFrame:
    """Per-file stats of an existing layout: ``(file, rows[, min/max
    of each sort key])`` — one distributed aggregation grouped on
    ``input_file_name()``; nothing is listed or collected on the
    driver. Feed the result to a compaction policy (files below the
    target size) or a sortedness audit (overlapping key ranges =>
    layout degraded, re-cluster)."""
    df = spark.read.format(format).load(path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in sort_by or []:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .orderBy("file")
    )


def dataset_manifest(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Release manifest for a written dataset: per output file, the
    row count and an ORDER-INDEPENDENT content digest —
    ``bit_xor(xxhash64(columns...))`` over the file's rows — plus the
    per-file hash min/max as secondary fingerprints. The reproducible
    dataset-card primitive: re-running a pipeline must reproduce the
    manifest bit-for-bit (same rows per file, same digests), and two
    exports can be diffed file-by-file without reading either twice.

    One distributed aggregation grouped on ``input_file_name()`` —
    nothing listed or collected driver-side, so the manifest of a
    100 TB export is one scan. Caveats stated so they cannot
    surprise: xor cancels PAIRS of byte-identical rows inside one
    file (the row count changes in step, and hash_min/hash_max still
    move), and the digest covers the named ``columns`` (default: all,
    in schema order).
    """
    df = spark.read.format(format).load(path)
    cols = list(columns) if columns is not None else list(df.columns)
    h = F.xxhash64(*[F.col(c) for c in cols])
    return (
        df.select(F.input_file_name().alias("file"), h.alias("__h"))
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor("__h").alias("content_xor64"),
            F.min("__h").alias("hash_min"),
            F.max("__h").alias("hash_max"),
        )
        .orderBy("file")
    )
