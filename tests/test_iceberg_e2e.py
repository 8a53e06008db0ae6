"""Iceberg END-TO-END: real hadoop-catalog round-trip (reference
validator.rs:216-261), runnable wherever an ``iceberg-spark-runtime``
jar is available.

This environment has no network and ships no Iceberg jar, so the test
SKIPS with the exact fetch command; everything else about the Iceberg
path (catalog config, env resolution, URI parsing, graceful degrade)
is covered jar-free in tests/test_iceberg.py. The round-trip runs in a
subprocess because the suite's shared JVM was started without the jar
— ``spark.jars`` only takes effect at session launch.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

_ENV_JAR = os.environ.get("DCE_ICEBERG_JAR", "")
_CANDIDATES = [_ENV_JAR] if _ENV_JAR else []
_CANDIDATES += glob.glob("/root/jars/iceberg-spark-runtime-*.jar")
_CANDIDATES += glob.glob(
    os.path.expanduser("~/.ivy2/jars/org.apache.iceberg_iceberg-spark-runtime-*.jar")
)
JAR = next((j for j in _CANDIDATES if j and os.path.exists(j)), None)

FETCH = (
    "curl -LO https://repo1.maven.org/maven2/org/apache/iceberg/"
    "iceberg-spark-runtime-4.0_2.13/1.10.0/"
    "iceberg-spark-runtime-4.0_2.13-1.10.0.jar && "
    "export DCE_ICEBERG_JAR=$PWD/iceberg-spark-runtime-4.0_2.13-1.10.0.jar"
    "  (pick the artifact matching your Spark minor, e.g. ...-4.1_2.13)"
)

_SCRIPT = r"""
import json, sys
from pyspark.sql import SparkSession

jar, wh, repo = sys.argv[1:4]
sys.path.insert(0, repo)
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.jars", jar)
    .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.it.type", "hadoop")
    .config("spark.sql.catalog.it.warehouse", wh)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
(
    spark.range(10)
    .selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS v")
    .writeTo("it.db.t")
    .createOrReplace()
)

from dce_spark import validate_df
from dce_spark.iceberg import IcebergCatalogConfig, load_iceberg_table

cfg = IcebergCatalogConfig(catalog_type="hadoop", name="it", warehouse=wh)
df = load_iceberg_table(spark, "it.db.t", config=cfg)
contract = '''
version: "1.0.0"
name: t
owner: o
schema:
  fields:
    - name: id
      type: int64
      nullable: false
    - name: v
      type: float64
'''
rep = validate_df(spark, df, contract)
lim = load_iceberg_table(spark, "it.db.t", config=cfg, limit=3)
print(json.dumps({"passed": rep.passed, "rows": df.count(), "lim": lim.count()}))
"""


@pytest.mark.skipif(
    JAR is None,
    reason="iceberg-spark-runtime jar not found (no network in this env); "
    "fetch with: " + FETCH,
)
def test_iceberg_hadoop_catalog_roundtrip(tmp_path):
    """Write a real Iceberg table into a hadoop catalog, bind it back
    through dce_spark.iceberg (S5), validate it (full contract path),
    and exercise the limited scan (S6)."""
    script = tmp_path / "iceberg_e2e.py"
    script.write_text(_SCRIPT)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, str(script), JAR, str(tmp_path / "wh"), repo_root],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res == {"passed": True, "rows": 10, "lim": 3}
