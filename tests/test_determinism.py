"""Determinism under parallelism — SCALING.md §9, checked mechanically.

Every catalog query must return bit-identical rows regardless of the
partition count, or results would flap between cluster sizes (and the
driver's correctness hashes would be meaningless). Re-run a
representative query per arithmetic family at a pathological shuffle
setting (2 partitions vs the suite's 4) and compare row-for-row.
"""

import pytest

from conftest import SF_DIR
from dce_spark.queries import QUERIES

# one per arithmetic discipline: quantized sums (q1), windowed shares
# (class balance), quantized chi-square terms, bit arithmetic (zorder),
# digest groupBy (exact dedup), HOF folds (char entropy), minhash
# banding (lsh pairs), double ratios rounded 6dp (jaccard)
NAMES = [
    "q1_pricing_summary",
    "class_balance_events",
    "chi_square_drift_events",
    "zorder_key_events",
    "dedup_exact_documents",
    "char_entropy_documents",
    "dedup_minhash_lsh_documents",
    "dedup_jaccard_documents",
    "outlier_counts_events",
    "kmeans_embeddings_2iter",
]


def _rows(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    cols = sorted(df.columns)
    out = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    spark.catalog.clearCache()
    return out


@pytest.mark.parametrize("name", NAMES)
def test_partition_count_invariance(spark, name):
    base = _rows(spark, name)
    assert base, f"{name} vacuous"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        skewed = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == skewed, f"{name} changed under repartitioning"
