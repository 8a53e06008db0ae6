"""Round-5 promotion regression: the six queries staged in round 4
are now LIVE catalog entries (registered from queries_more.py). Their
parity and plan-audit coverage moved to the catalog-wide suites
(test_oracle_parity.py / test_catalog_scalable.py run over QUERIES);
this file only locks the promotion itself so a refactor can't silently
drop them back out of the registry.
"""

from __future__ import annotations

from dce_spark.queries_staging_r5 import STAGED, staged_oracle


def test_staged_queries_promoted():
    from dce_spark.queries import QUERIES

    for name, spec in STAGED.items():
        assert name in QUERIES, f"{name} lost from the live catalog"
        assert QUERIES[name].fn is spec.fn
        assert QUERIES[name].oracle == staged_oracle(name)
        assert QUERIES[name].doc  # doc string survives registration


def test_staged_queries_driver_checked():
    """These six sat in the ROUND-5 driver window (the promotion-round
    invariant) and earned green CORRECTNESS_r05 rows; the round-6
    rotation then moved them out to make room for the next cohort.
    Lock the historical proof instead: every name must have a green
    row in the committed round-5 artifact."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r05.json")
    rows = json.load(open(path))
    for name in STAGED:
        assert name in rows, f"{name} never driver-checked in r5"
        assert rows[name]["hash_match"], f"{name} r5 driver row not green"
