"""Bucketed co-located joins: the written layout must make the join
plan exchange-free (the 100 TB fact-fact join story, asserted
mechanically like tests/test_plans.py)."""

import io
from contextlib import redirect_stdout

import pytest

from dce_spark.data import load_table
from dce_spark.ext.bucketing import bucketed_join, write_bucketed

from conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucket_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{warehouse}'")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "bucketdb.orders_b", "o_orderkey", num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bucketdb.lineitem_b",
        "o_orderkey",
        num_buckets=8,
    )
    yield "bucketdb.orders_b", "bucketdb.lineitem_b"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        # the whole point: the write-time bucketing replaces BOTH
        # join-side shuffles — no Exchange anywhere in the plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_correct(spark, bucketed_tables):
    from pyspark.sql import functions as F

    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_orderkey")
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("lk")
    )
    od = load_table(spark, SF_DIR, "orders").select(F.col("o_orderkey").alias("ok"))
    expected = li.join(od, li.lk == od.ok).count()
    assert joined.count() == expected


def test_bucketed_aggregation_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also rides the layout: no shuffle."""
    from pyspark.sql import functions as F

    left, _ = bucketed_tables
    plan = plan_of(
        spark.table(left).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    )
    assert "Exchange" not in plan


def test_ivf_cell_partition_pruning(spark, tmp_path_factory):
    """The ANN scale layout: corpus written partitioned by coarse cell
    (label stands in) -> a single-cell query scan must carry a
    PartitionFilters entry on the cell column, i.e. only that cell's
    files are read."""
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("ivf_cells") / "emb")
    load_table(spark, SF_DIR, "embeddings").write.partitionBy("label").parquet(path)
    df = spark.read.parquet(path)
    cell = df.filter(F.col("label") == 3).select("vec_id", "embedding")
    plan = plan_of(cell)
    assert "PartitionFilters" in plan
    assert "label" in [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    # and the non-partition columns are the only data read
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "embedding" in scan_schema and "label" not in scan_schema
