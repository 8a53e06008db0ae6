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


def test_staged_queries_in_driver_window():
    """Promotion without a driver row recreates the unchecked-tail
    problem (r1-r3 lesson): every promoted query must sit in the
    round-5 driver window."""
    from dce_spark.queries import _DRIVER_WINDOW

    for name in STAGED:
        assert name in _DRIVER_WINDOW, f"{name} promoted but not windowed"
