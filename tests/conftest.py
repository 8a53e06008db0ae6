import os

import pytest
from pyspark.sql import SparkSession

from dce_spark.data import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Fast tier (r16, VERDICT task 8): the full suite outruns the driver's
# VERIFY capture budget (~50 min), leaving tests_ok inconclusive.
# SPARK_GRAFT_SMOKE=1 keeps the conclusive gates — the catalog-wide
# oracle-parity sweep at sf0.001, the plan lints, and the entry smoke —
# and skips everything else, so a budgeted run ends in a pass/fail
# line instead of a truncation. The default (unset) runs everything.
_SMOKE_KEEP = {
    "test_oracle_parity.py",
    "test_catalog_scalable.py",
    "test_engine_smoke.py",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SMOKE") != "1":
        return
    skip = pytest.mark.skip(
        reason="SPARK_GRAFT_SMOKE=1: fast tier (oracle parity + plan lints)"
    )
    for item in items:
        if os.path.basename(str(item.fspath)) not in _SMOKE_KEEP:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("dce-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def load(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)
