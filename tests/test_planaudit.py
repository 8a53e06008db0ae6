"""planaudit: the machine-checkable scale discipline as a public API."""

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR, load
from dce_spark.planaudit import PlanLintError, assert_scalable, audit
from dce_spark.queries import QUERIES


def test_audit_reads_star_join_shape(spark):
    rep = audit(QUERIES["q5_nation_revenue"].fn(spark, SF_DIR))
    assert rep.joins.get("BroadcastHashJoin", 0) >= 3  # dims broadcast
    assert not rep.cartesian_like
    # the region filter reaches a scan
    assert any(
        any("r_name" in f for f in s.pushed_filters) for s in rep.scans
    )
    assert rep.codegen_spans >= 1
    assert rep.row_python_stages == 0


def test_audit_counts_shuffles_and_pruning(spark):
    df = load(spark, SF_DIR, "lineitem").groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("s")
    )
    rep = audit(df)
    assert rep.shuffle_exchanges == 1  # one hash exchange for the agg
    (scan,) = rep.scans
    assert set(scan.read_columns) == {"l_returnflag", "l_quantity"}
    assert_scalable(df, max_shuffle_exchanges=1, max_scan_columns=2)


def test_assert_scalable_rejects_cartesian(spark):
    a = load(spark, SF_DIR, "nation")
    b = load(spark, SF_DIR, "region")
    cross = a.crossJoin(b.hint("shuffle_replicate_nl"))
    with pytest.raises(PlanLintError, match="CartesianProduct"):
        assert_scalable(cross)


def test_assert_scalable_nlj_allowlist(spark):
    probe = QUERIES["embedding_near_dup_pairs"].fn(spark, SF_DIR)
    rep = audit(probe)
    assert rep.joins.get("BroadcastNestedLoopJoin", 0) == 1
    with pytest.raises(PlanLintError, match="BroadcastNestedLoopJoin"):
        assert_scalable(probe)
    assert_scalable(probe, allow_nlj=True)  # the documented parity probe


def test_assert_scalable_flags_row_python_udf(spark):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    df = load(spark, SF_DIR, "nation").select(slow(F.col("n_nationkey")))
    with pytest.raises(PlanLintError, match="BatchEvalPython"):
        assert_scalable(df)
    assert_scalable(df, allow_row_python=True)


def test_audit_sees_arrow_python_stage(spark):
    from dce_spark.ext.multimodal import attach_payload, payload_stats

    df = attach_payload(load(spark, SF_DIR, "documents"), "text")
    rep = audit(payload_stats(df, "doc_id"))
    assert rep.arrow_python_stages == 1
    assert rep.row_python_stages == 0


def test_round3_operators_plan_shapes(spark):
    """Scale-shape locks for the round-3 additions, via the public
    linter: no cartesian products anywhere; joins broadcast; Python
    only as Arrow batches."""
    # zorder: pure map-side expressions after the 1-row min/max agg
    rep = assert_scalable(QUERIES["zorder_key_events"].fn(spark, SF_DIR))
    assert not rep.joins and rep.shuffle_exchanges == 0
    (scan,) = rep.scans
    assert set(scan.read_columns) == {"event_id", "user_id", "value"}

    # MAD outlier probes: k-row stats joined back by broadcast only
    for name in ("outlier_counts_events", "outlier_counts_events_approx"):
        rep = assert_scalable(QUERIES[name].fn(spark, SF_DIR))
        assert set(rep.joins) == {"BroadcastHashJoin"}, (name, rep.joins)

    # chi-square: margins via windows over the tiny cell table — the
    # only data-sized shuffle is the contingency groupBy
    rep = assert_scalable(QUERIES["chi_square_drift_events"].fn(spark, SF_DIR))
    assert not rep.joins

    # skew profile: one per-key shuffle; the 1-row totals aggregate
    # cross-joins back as a broadcast NLJ whose build side is scalar —
    # the one legitimate NLJ shape, explicitly allowlisted
    rep = assert_scalable(
        QUERIES["key_skew_profile_events"].fn(spark, SF_DIR), allow_nlj=True
    )
    assert rep.joins == {"BroadcastNestedLoopJoin": 1}

    # header metadata: two Arrow stages (synthesize, parse), no joins,
    # never row-at-a-time
    rep = assert_scalable(QUERIES["multimodal_header_meta"].fn(spark, SF_DIR))
    assert rep.arrow_python_stages == 2 and rep.row_python_stages == 0
    assert not rep.joins

    # corr matrix: ONE scan reading exactly the 4 numeric columns
    rep = assert_scalable(QUERIES["corr_matrix_lineitem"].fn(spark, SF_DIR))
    (scan,) = rep.scans
    assert set(scan.read_columns) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    }


def test_estimate_and_script_plan_shapes(spark):
    """Round-3 additions, continued: the Jaccard estimator joins only
    on equality (bucket key + signature lookups), never all-pairs; the
    script detector is join-free map-side + one groupBy."""
    rep = assert_scalable(
        QUERIES["minhash_jaccard_estimate_documents"].fn(spark, SF_DIR)
    )
    assert not rep.cartesian_like
    assert rep.joins.get("CartesianProduct") is None

    rep = assert_scalable(QUERIES["script_detect_documents"].fn(spark, SF_DIR))
    assert not rep.joins and rep.shuffle_exchanges == 1

    rep = assert_scalable(QUERIES["dedup_simhash_pairs_documents"].fn(spark, SF_DIR))
    assert not rep.cartesian_like and rep.row_python_stages == 0


def test_audit_executed_adaptive_plan_not_double_counted(spark):
    """Auditing an already-executed df must see the FINAL adaptive
    plan only: the formatted explain then prints Final + Initial plan
    copies with distinct node ids, which used to double every
    join/exchange count and break the scalar-BNLJ exemption (found
    when the staged-query sweep audited collected frames)."""
    df = QUERIES["unigram_logprob_documents"].fn(spark, SF_DIR)
    before = audit(df)
    df.collect()  # finalize the adaptive plan
    after = audit(df)
    assert after.joins == before.joins
    # the FINAL plan may legitimately have FEWER exchanges/scans (AQE
    # exchange reuse); what must never happen is the ~2x inflation of
    # parsing both plan copies
    assert after.shuffle_exchanges <= before.shuffle_exchanges
    assert len(after.scans) <= len(before.scans)
    assert after.scalar_bnlj == before.scalar_bnlj
    assert_scalable(df)  # the scalar crossJoin exemption still holds
    spark.catalog.clearCache()
