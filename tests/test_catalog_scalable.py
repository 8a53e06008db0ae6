"""Catalog-wide scale lint: EVERY queries() entry must pass
planaudit.assert_scalable — no CartesianProduct, no
BroadcastNestedLoopJoin, no row-at-a-time Python — except the
explicitly documented O(n^2) parity probes below.

The 22 hand-picked plan locks in test_plans.py pin specific shapes;
this sweep makes it impossible for a NEW catalog entry to land with a
cartesian/NLJ/row-Python plan unnoticed (the round-2
best_order_per_customer hazard class).
"""

from __future__ import annotations

import json
import os

import pytest

from dce_spark.planaudit import assert_scalable
from dce_spark.queries import QUERIES

from conftest import SF_DIR

_BUDGET_PATH = os.path.join(os.path.dirname(__file__), "..", "SHUFFLE_BUDGET.json")
_BUDGET_DOC = json.load(open(_BUDGET_PATH))
# broadcast-vs-shuffle decisions depend on input file sizes, so the
# committed budgets only bind at the scale factor they were generated
# at (the default tests SF); at any other SPARK_GRAFT_TEST_SF_DIR the
# sweep still lints shapes but skips the exchange-count cap.
_BUDGETS = _BUDGET_DOC["budgets"] if _BUDGET_DOC["sf_dir"] == SF_DIR else {}

# documented exact-parity probes whose SCALE TWINS are the production
# path (SCALING.md "perf-weak register"): each deliberately trades an
# O(n^2)/NLJ plan for bit-exact oracle parity, and each has a
# driver-green _approx/LSH twin. Keep this list <= 5 entries — a new
# NLJ belongs in a refactor, not here.
NLJ_WHITELIST = {
    "embedding_near_dup_pairs",  # brute-force all-pairs parity probe
    "embedding_knn_join",        # brute-force Q x N probe (IVF twin exists)
    "embedding_cosine_topk",     # single-query brute force (IVF twin exists)
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_query_is_scalable(spark, name):
    """Shape lint + shuffle budget: the exchange-count cap catches the
    quiet extra-shuffle regression the cartesian/NLJ lint cannot — at
    100 TB one more Exchange is a full network rewrite of the input.
    Raising a budget is allowed but must be an explicit edit to
    SHUFFLE_BUDGET.json (regenerate with scripts/shuffle_budget.py and
    record the reason in its _bumps map)."""
    df = QUERIES[name].fn(spark, SF_DIR)
    assert_scalable(
        df,
        allow_nlj=name in NLJ_WHITELIST,
        max_shuffle_exchanges=_BUDGETS.get(name),
    )
    spark.catalog.clearCache()


def test_every_catalog_query_has_a_shuffle_budget():
    """A new catalog entry must record its exchange count at landing
    time (python scripts/shuffle_budget.py), or the <= sweep silently
    never applies to it."""
    budgets = _BUDGET_DOC["budgets"]
    missing = sorted(set(QUERIES) - set(budgets))
    stale = sorted(set(budgets) - set(QUERIES))
    assert not missing, f"queries without a shuffle budget: {missing}"
    assert not stale, f"budget entries for unregistered queries: {stale}"
    for name in _BUDGET_DOC.get("_bumps", {}):
        assert name in budgets, f"_bumps references unknown query {name}"


def test_driver_window_invariants():
    """The correctness gate samples the FIRST 50 queries() entries:
    the window must contain exactly 50 existing, distinct names and
    be fronted verbatim — a silent drift here would burn a whole
    round's driver-proof budget."""
    from dce_spark.queries import _DRIVER_WINDOW, queries

    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    assert set(_DRIVER_WINDOW) <= set(QUERIES)
    assert list(queries())[:50] == _DRIVER_WINDOW


def test_no_unchecked_catalog_tail():
    """Every catalog query must be either already driver-green in a
    committed CORRECTNESS artifact or sitting in the CURRENT driver
    window — otherwise this round's rotation would leave a registered
    query no driver row ever checks (the r1-r3 unchecked-tail bug,
    made structurally impossible)."""
    import glob
    import json
    import os

    from dce_spark.queries import _DRIVER_WINDOW

    prev: set[str] = set()
    root = os.path.join(os.path.dirname(__file__), "..")
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        prev |= set(json.load(open(path)))
    uncovered = set(QUERIES) - prev - set(_DRIVER_WINDOW)
    assert not uncovered, (
        f"registered queries with no prior driver row and no window "
        f"slot: {sorted(uncovered)}"
    )


def _load_bench():
    """Load bench.py by file location (it is a repo-root script, not a
    package module) — shared by every bench-policy test here."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_bench_parity_probe_labels_consistent():
    """bench.py's PARITY_PROBES must stay in sync with reality: every
    benched NLJ-whitelisted query is labeled a probe, every labeled
    probe is actually benched and registered, and each md5/exact probe
    family ships its production twin in the same bench run (the twin
    is what the prod subtotal tracks)."""
    bench = _load_bench()

    benched = set(bench.BENCH_QUERIES)
    probes = set(bench.PARITY_PROBES)
    assert benched <= set(QUERIES)
    assert (NLJ_WHITELIST & benched) <= probes
    assert probes <= benched
    # each probe's production twin is benched too (fast variants are
    # added inside main(); they are named <family>_fast)
    twins = {
        "embedding_cosine_topk": "embedding_ivf_topk",
        "embedding_knn_join": "embedding_ivf_knn_join",
        "quantiles_lineitem": "quantiles_lineitem_approx",
    }
    for probe, twin in twins.items():
        assert twin in benched, (probe, twin)


def test_bench_exact_form_labels_consistent():
    """Round-9 tier (r8 verdict What's-wrong #2): every twinned exact
    form is labeled, registered, benched full-run-only, in exactly one
    tier, and its scale-safe twin is benched in the same run — catalog
    _approx twins directly, the non-oracle-pairable bucketed shape
    tests via EXTRA_BENCH_ENTRIES."""
    bench = _load_bench()

    exact = set(bench.EXACT_FORMS)
    benched = set(bench.BENCH_QUERIES)
    assert exact <= benched
    assert exact <= set(QUERIES)
    assert not (exact & bench.PARITY_PROBES)
    assert not (exact & set(bench.DRIVER_TIMED))
    catalog_twins = {
        "ntile_bins_lineitem": "ntile_bins_lineitem_approx",
        "grouped_quantiles_lineitem": "grouped_quantiles_lineitem_approx",
        # r12 admission: the per-type Gini's single-ordered-window
        # exact form, twinned by its fixed-edge decile Lorenz curve
        "value_gini_by_type_events": "value_lorenz_curve_events",
    }
    for form, twin in catalog_twins.items():
        assert form in exact, form
        assert twin in benched, (form, twin)
    for twin in ("ks_bucketed_weekday_events", "cvm_bucketed_split_events"):
        assert twin in bench.EXTRA_BENCH_ENTRIES, twin


def test_driver_timed_subset_policy():
    """Round-8 bench policy locks (VERDICT r7 asks #1/#3): the driver
    sentinel subset must stay small enough for >=3 passes inside the
    420 s driver budget under contention, contain no parity probes or
    unregistered names, and represent EVERY bench family — a family
    with no sentinel has no driver-visible regression signal."""
    bench = _load_bench()

    sub = bench.DRIVER_TIMED
    assert len(sub) == len(set(sub))
    assert 40 <= len(sub) <= 60, len(sub)
    assert set(sub) <= set(bench.BENCH_QUERIES)
    assert not (set(sub) & bench.PARITY_PROBES)
    assert not (set(sub) & bench.EXACT_FORMS)
    assert set(sub) <= set(QUERIES)
    # every bench family keeps a sentinel (bench.py's fam() lives
    # inside main(), so anchor one known member per family instead)
    anchors = {
        "tpch": "q1_pricing_summary",
        "window": "window_topn_customers_per_segment",
        # analytics/drift: psi_total rotated out in r11 — the PSI
        # trend sentinels are psi_value_drift + the r11 occupancy PSI
        "analytics": "corr_matrix_lineitem",
        "dedup": "dedup_minhash_lsh_capped",
        "embedding": "embedding_ivf_topk",
        "text": "text_stats_documents",
        # sampling: split_assign rotated out in r14 — the token-
        # bucketed assignment trend moved to its r14 curriculum
        # derivative curriculum_epoch_assignment (asserted below);
        # stratified_sample anchors the family
        "sampling": "stratified_sample_documents",
        "multimodal": "multimodal_payload_stats",
        "timeseries": "sessionization_events",
        "streaming": "heavy_hitters_batch_events",
        # warehouse: scd2_intervals rotated out in r11 for its
        # snapshot-diff derivative
        "warehouse": "scd2_snapshot_diff_events",
        # round-15 classifier families (VERDICT r14 advice nit #1:
        # cc_/ledger_/curriculum_ left the analytics catch-all):
        # each anchored by its r15 sentinel
        "graph": "cc_touched_components_documents",
        "ledger": "zone_prune_matrix_events",
        "curriculum": "joint_slots_by_epoch_documents",
    }
    for fam, name in anchors.items():
        assert name in sub, f"family {fam} lost its sentinel ({name})"
    # the newest round's additions are always sentinelled (round-15
    # rotation: cc_converged_components / ledger_growth_curve /
    # curriculum_epoch_assignment rotated out for their r15
    # same-family derivatives — seeded re-convergence, the
    # zone-prune matrix, the joint per-epoch Hamilton slots;
    # incremental_validation stays — it is the CLI --state-ledger
    # product path)
    for name in (
        "cc_touched_components_documents",
        "zone_prune_matrix_events",
        "joint_slots_by_epoch_documents",
        "coord_drift_sweep_embeddings",
        "attribution_model_compare_events",
        "l_diversity_profile_events",
        "incremental_validation_orders",
        "centroid_shift_embeddings",
        "scd2_snapshot_diff_events",
        "watermark_drop_matrix_events",
        "token_budget_allocation_documents",
    ):
        assert name in sub
