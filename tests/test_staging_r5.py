"""Round-5 STAGED queries: same parity harness as the live catalog
(exact column order, canonical dtypes, sorted-value compare) so
promotion in round 5 is a registration move, not new verification.
These are deliberately NOT in dce_spark.queries.QUERIES — the round-4
catalog froze at the driver-window rotation.
"""

from __future__ import annotations

import duckdb
import pytest

from dce_spark.queries_staging_r5 import STAGED, staged_oracle

from conftest import SF_DIR
from test_oracle_parity import TABLES, compare


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    """The freeze: staged queries must stay OUT of the live catalog
    until round 5 rotates them into the driver window."""
    from dce_spark.queries import QUERIES

    assert not (set(STAGED) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()
