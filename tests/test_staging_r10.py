"""Round-10 STAGED queries (seeded in round 7 — the staging pipeline
runs a full round ahead): same parity harness as the live catalog.
These are deliberately NOT in dce_spark.queries.QUERIES (the freeze
protocol of queries_staging_r5..r9)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dce_spark.queries_staging_r10 import STAGED_R10, staged_oracle

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


@pytest.mark.parametrize("name", sorted(STAGED_R10))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_R10[name].fn(spark, SF_DIR)
    rel = duck.sql(staged_oracle(name))
    compare(sdf, rel)
    assert sdf.count() > 0  # non-vacuous
    spark.catalog.clearCache()


def test_staged_not_registered():
    from dce_spark.queries import QUERIES

    assert not (set(STAGED_R10) & set(QUERIES))


@pytest.mark.parametrize("name", sorted(STAGED_R10))
def test_staged_query_is_scalable(spark, name):
    from dce_spark.planaudit import assert_scalable

    assert_scalable(STAGED_R10[name].fn(spark, SF_DIR))
    spark.catalog.clearCache()


def test_staged_specs_well_formed():
    for name, spec in STAGED_R10.items():
        assert callable(spec.fn), name
        assert isinstance(spec.oracle, str) and spec.oracle.strip(), name
        assert staged_oracle(name) == spec.oracle
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


def test_semdedup_sweep_monotone_and_anchored(spark):
    """Prune counts must be non-increasing in the threshold, and the
    0.95 row must equal semdedup_prune_embeddings' total (25 injected
    copies at the suite SF)."""
    rows = {
        float(r["thr"]): int(r["n_pruned"])
        for r in STAGED_R10["semdedup_threshold_sweep_embeddings"]
        .fn(spark, SF_DIR)
        .collect()
    }
    thrs = sorted(rows)
    assert [rows[t] for t in thrs] == sorted(
        (rows[t] for t in thrs), reverse=True
    )
    assert rows[0.95] == 25
    spark.catalog.clearCache()


def test_triplet_margin_consistent_with_hard_negatives(spark):
    """The hardest negative behind each margin must be the rank-1 row
    of hard_negative_mining_embeddings (same probe cells, same cosine
    convention), and the positive must be at least the in-label floor
    of label_margin machinery: pos_cos >= neg_cos is NOT guaranteed —
    only consistency is."""
    from dce_spark.queries_staging_r9 import STAGED_R9

    hn = {
        int(r["qid"]): float(r["cos_sim"])
        for r in STAGED_R9["hard_negative_mining_embeddings"]
        .fn(spark, SF_DIR)
        .collect()
        if int(r["rank"]) == 1
    }
    tm = {
        int(r["qid"]): (float(r["neg_cos"]), float(r["pos_cos"]),
                        float(r["margin"]))
        for r in STAGED_R10["triplet_margin_embeddings"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(tm) == set(hn) == {0, 1, 2}
    for qid, (neg, pos, margin) in tm.items():
        assert neg == hn[qid]
        assert abs(margin - round(pos - neg, 6)) < 1e-12
