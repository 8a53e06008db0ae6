"""Round-7 STAGED queries: same parity harness as the live catalog
(exact column order, canonical dtypes, sorted-value compare) so
promotion in round 7 is a registration move, not new verification.
These are deliberately NOT in dce_spark.queries.QUERIES — the round-6
catalog froze at the driver-window rotation (the r1-r3 unchecked-tail
lesson, same protocol queries_staging_r5/r6 followed in earlier
rounds).
"""

from __future__ import annotations

import duckdb
import pytest

from dce_spark.queries_staging_r7 import STAGED_R7, staged_oracle

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


@pytest.mark.parametrize("name", sorted(STAGED_R7))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R7[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    """The freeze: staged queries must stay OUT of the live catalog
    until round 7 rotates them into the driver window."""
    from dce_spark.queries import QUERIES

    assert not (set(STAGED_R7) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED_R7))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R7[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    """Every staged entry must carry a scale-reasoned doc and a
    non-empty eager oracle, and no staged name may collide with the
    live catalog or the current driver window — the invariants the
    round-7 promotion loop will rely on."""
    from dce_spark.queries import _DRIVER_WINDOW, QUERIES

    assert len(STAGED_R7) == 14
    for name, spec in STAGED_R7.items():
        assert len(spec.doc) > 80, name  # real doc, not a stub
        assert spec.oracle.strip().upper().startswith(("WITH", "SELECT")), name
        assert spec.oracle == staged_oracle(name), name
        assert name not in QUERIES, name
        assert name not in _DRIVER_WINDOW, name
