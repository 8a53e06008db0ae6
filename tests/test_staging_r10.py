"""Round-10 promotion regression: the twenty queries staged in round 7
(and extended through rounds 8/9) are now LIVE catalog entries
(registered from queries_more.py). Their parity and plan-audit
coverage moved to the catalog-wide suites (test_oracle_parity.py /
test_catalog_scalable.py run over QUERIES); this file locks the
promotion itself — the same shape test_staging_r5..r9.py took after
their promotions — plus the staged cohort's extra determinism proofs
(SemDeDup threshold-sweep anchoring, triplet-margin consistency with
the round-9 hard-negative miner), which stay valid against the
promoted entries.
"""

from __future__ import annotations

import subprocess
import sys

from dce_spark.queries_staging_r10 import STAGED_R10, staged_oracle

from conftest import SF_DIR


def test_staged_queries_promoted():
    from dce_spark.queries import QUERIES

    assert len(STAGED_R10) == 20
    for name, spec in STAGED_R10.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These twenty sat in the ROUND-10 driver window (the
    promotion-round invariant) and earned green CORRECTNESS_r10 rows;
    the round-11 rotation then moved them out to make room for the
    next cohort. Lock the historical proof instead of the window slot
    (the test_staging_r5..r9 pattern)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r10.json"
    )
    rows = json.load(open(path))
    for name in STAGED_R10:
        assert name in rows, f"{name} never driver-checked in r10"
        assert rows[name]["hash_match"], f"{name} r10 driver row not green"


def test_round10_new_queries_driver_checked():
    """Round 10's own additions (the fixed-edge shape tests) were
    fronted the round they landed and earned green r10 rows; same
    historical-proof lock as the cohort."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r10.json"
    )
    rows = json.load(open(path))
    for name in ("ks_fixed_edges_events", "cvm_fixed_edges_events"):
        assert name in rows, f"{name} never driver-checked in r10"
        assert rows[name]["hash_match"], f"{name} r10 driver row not green"


def test_staged_oracles_eager():
    """Round-10 staged oracles are eager strings by construction; the
    promotion loop asserts identity at import — re-assert here so a
    staging-module refactor can't reintroduce lazy empties."""
    from dce_spark import queries  # noqa: F401  (triggers registration)

    for name, spec in STAGED_R10.items():
        assert spec.oracle, f"{name}.oracle empty"
        assert spec.oracle == staged_oracle(name)
        assert isinstance(spec.doc, str) and spec.doc.strip(), name


def test_promotion_survives_staging_first_import():
    """The r10 staging module bootstraps the catalog chain BEFORE
    defining STAGED_R10, so a staging-first import reaches the
    promotion loop with no entries at all; the loop must bail and the
    tail hook must complete the catalog. Module caching means the
    in-suite import order is whatever conftest already produced
    (round-8 ADVICE), so prove the staging-first order in a fresh
    interpreter."""
    code = (
        "import dce_spark.queries_staging_r10\n"
        "from dce_spark.queries import QUERIES\n"
        "from dce_spark.queries_staging_r10 import STAGED_R10\n"
        "missing = set(STAGED_R10) - set(QUERIES)\n"
        "assert not missing, missing\n"
        "assert len(STAGED_R10) == 20\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


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
