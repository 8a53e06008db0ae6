"""Iceberg catalog layer: conf building, env resolution, URI/location
parsing (pure Python — reference config.rs:10-57, validate.rs:137-218),
plus the graceful no-jar fallback on a live session."""

import pytest

from dce_spark.iceberg import (
    IcebergCatalogConfig,
    IcebergConfigError,
    IcebergUnavailableError,
    TableRef,
    extract_warehouse_from_location,
    load_iceberg_table,
    parse_iceberg_location,
    parse_table_uri,
    resolve_env_config,
)


# ---- catalog conf building (reference config.rs builder + catalog.rs kinds)

def test_rest_catalog_conf():
    cfg = IcebergCatalogConfig(
        catalog_type="rest",
        name="lake",
        uri="http://localhost:8181",
        warehouse="s3://bucket/wh",
        properties={"io-impl": "org.apache.iceberg.aws.s3.S3FileIO"},
    )
    conf = cfg.spark_conf()
    assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.type"] == "rest"
    assert conf["spark.sql.catalog.lake.uri"] == "http://localhost:8181"
    assert conf["spark.sql.catalog.lake.warehouse"] == "s3://bucket/wh"
    assert conf["spark.sql.catalog.lake.io-impl"] == "org.apache.iceberg.aws.s3.S3FileIO"


def test_hms_catalog_conf_adds_thrift_scheme():
    cfg = IcebergCatalogConfig(
        catalog_type="hms", uri="127.0.0.1:9083", warehouse="s3://bucket/wh"
    )
    conf = cfg.spark_conf()
    assert conf["spark.sql.catalog.dce.type"] == "hive"
    assert conf["spark.sql.catalog.dce.uri"] == "thrift://127.0.0.1:9083"


def test_glue_catalog_conf_uses_catalog_impl():
    cfg = IcebergCatalogConfig(
        catalog_type="glue",
        warehouse="s3://bucket/wh",
        properties={"glue.id": "123456789012", "client.region": "eu-west-1"},
    )
    conf = cfg.spark_conf()
    assert (
        conf["spark.sql.catalog.dce.catalog-impl"]
        == "org.apache.iceberg.aws.glue.GlueCatalog"
    )
    assert "spark.sql.catalog.dce.type" not in conf
    assert conf["spark.sql.catalog.dce.glue.id"] == "123456789012"


def test_hadoop_catalog_conf():
    conf = IcebergCatalogConfig(catalog_type="hadoop", warehouse="/tmp/wh").spark_conf()
    assert conf["spark.sql.catalog.dce.type"] == "hadoop"
    assert conf["spark.sql.catalog.dce.warehouse"] == "/tmp/wh"


@pytest.mark.parametrize(
    "cfg",
    [
        IcebergCatalogConfig(catalog_type="nope", warehouse="x"),
        IcebergCatalogConfig(catalog_type="rest", warehouse="x"),  # no uri
        IcebergCatalogConfig(catalog_type="hms", warehouse="x"),  # no uri
        IcebergCatalogConfig(catalog_type="glue"),  # no warehouse
        IcebergCatalogConfig(catalog_type="rest", uri="u", warehouse=None),
        IcebergCatalogConfig(catalog_type="rest", uri="u", warehouse="w", name=""),
    ],
)
def test_invalid_configs_rejected(cfg):
    with pytest.raises(IcebergConfigError):
        cfg.validate()


# ---- table URI parsing (dotted) and location parsing (warehouse path)

def test_parse_table_uri_full():
    ref = parse_table_uri("lake.db.schema.events")
    assert ref == TableRef(catalog="lake", namespace=["db", "schema"], table="events")
    assert ref.qualified_name == "lake.db.schema.events"


def test_parse_table_uri_defaults_catalog():
    ref = parse_table_uri("db.events")
    assert ref == TableRef(catalog="dce", namespace=["db"], table="events")


@pytest.mark.parametrize("bad", ["", "events", " . . "])
def test_parse_table_uri_rejects(bad):
    with pytest.raises(IcebergConfigError):
        parse_table_uri(bad)


def test_parse_iceberg_location_s3():
    # validate.rs:192-218 examples, 1:1
    assert parse_iceberg_location("s3://warehouse/db/table") == (["db"], "table")


def test_parse_iceberg_location_dotted_namespace():
    assert parse_iceberg_location("/warehouse/db.schema/table") == (
        ["db", "schema"],
        "table",
    )


def test_parse_iceberg_location_rejects_short():
    with pytest.raises(IcebergConfigError):
        parse_iceberg_location("s3://just-a-bucket")


def test_extract_warehouse():
    assert (
        extract_warehouse_from_location("s3://bucket/wh/db/table") == "s3://bucket/wh"
    )
    assert extract_warehouse_from_location("s3://bucket") == "s3://bucket"
    assert extract_warehouse_from_location("/data/wh/db/table") == "/data/wh"


# ---- env-var resolution (validate.rs:137-165)

def test_resolve_env_primary_vars():
    cfg = resolve_env_config(
        env={"REST_CATALOG_URI": "http://c:8181", "WAREHOUSE": "s3://wh"}
    )
    assert cfg is not None and cfg.catalog_type == "rest"
    assert cfg.uri == "http://c:8181" and cfg.warehouse == "s3://wh"


def test_resolve_env_fallback_vars():
    cfg = resolve_env_config(
        env={"ICEBERG_REST_URI": "http://c2:8181", "ICEBERG_WAREHOUSE": "s3://wh2"}
    )
    assert cfg is not None
    assert cfg.uri == "http://c2:8181" and cfg.warehouse == "s3://wh2"


def test_resolve_env_warehouse_from_location():
    cfg = resolve_env_config(
        location="s3://bucket/wh/db/table", env={"REST_CATALOG_URI": "http://c:8181"}
    )
    assert cfg is not None and cfg.warehouse == "s3://bucket/wh"


def test_resolve_env_missing_uri_gives_none():
    assert resolve_env_config(env={"WAREHOUSE": "s3://wh"}) is None
    assert resolve_env_config(env={}) is None


# ---- graceful degradation on a live session without the runtime jar

def test_load_without_env_raises_guidance(spark):
    with pytest.raises(IcebergUnavailableError) as ei:
        load_iceberg_table(spark, "s3://wh/db/table", config=None)
    assert "Schema-only validation" in str(ei.value)


def test_load_without_jar_raises_unavailable(spark):
    cfg = IcebergCatalogConfig(
        catalog_type="hadoop", name="nojar_cat", warehouse="/tmp/nonexistent-wh"
    )
    with pytest.raises(IcebergUnavailableError) as ei:
        load_iceberg_table(spark, "nojar_cat.db.events", config=cfg)
    assert "schema-only" in str(ei.value).lower()


def test_cli_validate_iceberg_contract_falls_back_schema_only(tmp_path):
    """An iceberg-format contract with no catalog available must take the
    reference CLI's schema-only fallback path (validate.rs:88-98), not
    crash. Subprocess so the CLI's spark.stop() can't kill the shared
    test session."""
    import subprocess
    import sys

    contract = tmp_path / "c.yml"
    contract.write_text(
        """
version: "1.0.0"
name: icy
owner: me
schema:
  format: iceberg
  location: s3://wh/db/events
  fields:
    - {name: id, type: int64, nullable: false}
"""
    )
    r = subprocess.run(
        [sys.executable, "-m", "dce_spark.cli", "validate", str(contract)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0
    assert "schema-only" in r.stderr
    assert "OK" in r.stdout
