"""Physical-plan assertions — the scale story, checked mechanically.

These lock in the properties that make the operators viable at 100 TB:
filters reaching the parquet scan, column pruning, broadcast joins for
dims, top-k without a global sort, and the contract compiler's
single-scan fusion.
"""

import io
from contextlib import redirect_stdout

import pytest

from dce_spark.queries import QUERIES

from conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_predicates_pushed_to_scan(spark):
    plan = plan_of(QUERIES["q6_revenue_delta"].fn(spark, SF_DIR))
    assert "PushedFilters" in plan
    # the raw-nanos shipdate bound and both numeric bounds reach the scan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.02)" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_q6_column_pruning(spark):
    plan = plan_of(QUERIES["q6_revenue_delta"].fn(spark, SF_DIR))
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # only the 4 referenced columns are read, not all 11
    for col in ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]:
        assert col in scan_schema
    for col in ["l_comment", "l_orderkey", "l_partkey", "l_returnflag"]:
        assert col not in scan_schema


def test_q3_broadcasts_customer(spark):
    plan = plan_of(QUERIES["q3_top_revenue_orders"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the selective segment filter is pushed into the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q5_broadcasts_dims(spark):
    plan = plan_of(QUERIES["q5_nation_revenue"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_topk_uses_take_ordered(spark):
    plan = plan_of(QUERIES["topk_orders_by_price"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no global sort


def test_cosine_topk_no_shuffle_of_corpus(spark):
    plan = plan_of(QUERIES["embedding_cosine_topk"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan  # map-side only


def test_fused_contract_is_single_aggregate(spark):
    """The whole row-local check battery compiles to ONE aggregation over
    ONE scan — the core efficiency claim vs the reference's
    O(fields x checks) statements."""
    from dce_spark import parse_contract_yaml
    from dce_spark.checks import quality as Q
    from dce_spark.checks import schema as S
    from dce_spark.checks.constraints import constraint_probes
    from dce_spark.data import load_table

    contract = parse_contract_yaml(
        """
version: "1"
name: events
owner: me
schema:
  fields:
    - {name: event_id, type: int64, nullable: false}
    - {name: user_id, type: int64, nullable: false}
    - name: event_type
      type: string
      constraints:
        - {type: allowedvalues, values: [view, click, purchase, signup, error]}
    - name: value
      type: float64
      constraints:
        - {type: range, min: -1000000, max: 1000000}
quality_checks:
  completeness:
    threshold: 0.9
    fields: [event_id, user_id, event_type, value]
  uniqueness:
    fields: [event_id]
"""
    )
    df = load_table(spark, SF_DIR, "events")
    probes = (
        S.nullability_probes(contract, df)
        + constraint_probes(contract, df)
        + Q.completeness_probes(contract.quality_checks.completeness, df)
        + [Q.uniqueness_probe(contract.quality_checks.uniqueness, df)]
    )
    exprs = [Q.total_expr()]
    for p in probes:
        exprs.extend(p.exprs)
    plan = plan_of(df.agg(*exprs))
    # one scan of the parquet file ("Location:" appears once per scan node)
    assert plan.count("Location:") == 1
    # no join, no window, no extra shuffle beyond the aggregate's own
    assert "Join" not in plan and "Window" not in plan


def test_jaccard_no_cartesian(spark):
    plan = plan_of(QUERIES["dedup_jaccard_documents"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # inverted-index equi-join only
    spark.catalog.clearCache()


def test_lsh_no_cartesian(spark):
    plan = plan_of(QUERIES["dedup_minhash_lsh_documents"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_range_bucket_join_is_hash_join(spark):
    """Aligned interval buckets must join via a computed-index
    broadcast HASH join, not a nested-loop over the bucket list (10
    interpreted predicate evals per fact row — 9x slower at sf0.1 and
    pure per-row constant at 100 TB)."""
    plan = plan_of(QUERIES["range_bucket_join_events"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_bucket_cap_stays_equi_join(spark):
    """The hot-bucket cap (max_bucket_size) must not change the join
    shape: still a bucket-key equi-join, with the window count reusing
    the same (band, bkey) partitioning — no cartesian, no NLJ."""
    from dce_spark.data import load_table
    from dce_spark.ext.dedup import lsh_candidate_pairs

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(lsh_candidate_pairs(docs, num_hashes=8, bands=4,
                                       max_bucket_size=50))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()


def test_embedding_lsh_no_cartesian(spark):
    """The bucketed near-dup scale path must never degenerate into an
    all-pairs plan: candidates meet only via the band-bucket equi-join."""
    plan = plan_of(QUERIES["embedding_near_dup_lsh"].fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    spark.catalog.clearCache()  # the operator persists its bucket table


def test_aqe_splits_skewed_join(spark):
    """SCALING.md claims AQE handles skewed joins at runtime — prove it:
    a join where one key holds 20x the rows must show
    SortMergeJoin(skew=true) in the FINAL adaptive plan (thresholds
    lowered so the split triggers at test size). Note count()/write()
    spawn separate query executions; the final plan must be read from
    the SAME Dataset after collect()."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("p")
        )
        cold = spark.range(10_000).select(
            (F.col("id") % 100 + 1).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("p"),
        )
        right = spark.range(101).select(F.col("id").alias("k"), F.lit("d").alias("n"))
        j = hot.union(cold).join(right, "k").groupBy().count()
        assert j.collect()[0]["count"] == 210_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_tpch_batch2_single_big_join(spark):
    """q7/q8/q21's only non-broadcast join is lineitem-orders (or the
    ol-od self-pair in q21): exactly one SortMergeJoin, every dim path a
    BroadcastHashJoin."""
    import re

    for name in ["q7_volume_shipping", "q8_market_share", "q21_waiting_suppliers"]:
        plan = plan_of(QUERIES[name].fn(spark, SF_DIR))
        smj_nodes = set(re.findall(r"\((\d+)\) SortMergeJoin", plan))
        assert len(smj_nodes) == 1, (name, smj_nodes)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_q10_take_ordered_topk(spark):
    plan = plan_of(QUERIES["q10_returned_items"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # top-20, never a global sort


def test_q16_anti_join_broadcast(spark):
    plan = plan_of(QUERIES["q16_supplier_count_by_part"].fn(spark, SF_DIR))
    # NOT IN compiled to a broadcast anti join, not a shuffled subquery
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan


def test_q20_semi_join(spark):
    plan = plan_of(QUERIES["q20_promotion_suppliers"].fn(spark, SF_DIR))
    assert "LeftSemi" in plan  # IN-subquery never materializes per row


def test_curation_gate_zero_exchanges(spark):
    """The whole keep/drop sweep is ONE projection over the scan."""
    plan = plan_of(QUERIES["curation_decisions_documents"].fn(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_repetition_signals_zero_exchanges(spark):
    plan = plan_of(QUERIES["repetition_signals_documents"].fn(spark, SF_DIR))
    assert "Exchange" not in plan


def test_stratified_sample_map_side_only(spark):
    plan = plan_of(QUERIES["stratified_sample_documents"].fn(spark, SF_DIR))
    assert "Exchange" not in plan  # sampling 100 TB = one scan, no shuffle


def test_pack_assign_single_bucket_exchange(spark):
    """Sequence packing shuffles ONCE on the bucket key for the window
    cumsum; no global (single-partition) sort anywhere."""
    import re

    plan = plan_of(QUERIES["pack_assign_documents"].fn(spark, SF_DIR))
    ex_nodes = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(ex_nodes) == 1, ex_nodes
    assert "hashpartitioning" in plan
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_funnel_and_incremental_dedup_no_cartesian(spark):
    """The composed funnel and the batch-vs-corpus dedup never fall back
    to all-pairs shapes: every join is hash- or broadcast-based."""
    for name in ["corpus_survivors_documents", "dedup_incremental_documents"]:
        plan = plan_of(QUERIES[name].fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_salted_join_carries_salt_key_and_matches_unsalted(spark):
    """ext/skew.salted_equi_join: the physical join must key on
    (join col, __salt) — i.e. the hot key's rows hash to n_salts
    reducers, not one — and the result must equal the plain join.
    Broadcast is disabled so the shuffle keys are visible in the
    exchange; AQE skew-join (test_aqe_splits_skewed_join) is the
    zero-code sibling mechanism."""
    from pyspark.sql import functions as F

    from dce_spark.ext.skew import salted_equi_join

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.range(20_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("n")
        )
        j = salted_equi_join(
            fact, dim, on="k", n_salts=8, salt_by=F.xxhash64(F.col("v"))
        )
        out = j.groupBy().agg(
            F.count(F.lit(1)).alias("rows"), F.sum("n").alias("sn")
        )
        plan = plan_of(out)
        # the exchange/join must carry the salt alongside the key
        assert "__salt" in plan
        assert "hashpartitioning(k" in plan and "__salt" in plan.split(
            "hashpartitioning(k", 1
        )[1][:80]
        expected = (
            fact.join(dim, "k")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("rows"), F.sum("n").alias("sn"))
            .collect()[0]
        )
        got = out.collect()[0]
        assert (got["rows"], got["sn"]) == (expected["rows"], expected["sn"])
        # the hot key's fact rows really spread over all 8 salt values
        from dce_spark.ext.skew import _SALT

        spread = (
            fact.withColumn(
                _SALT, F.pmod(F.xxhash64(F.col("v")), F.lit(8)).cast("int")
            )
            .filter(F.col("k") == 0)
            .select(_SALT)
            .distinct()
            .count()
        )
        assert spread == 8
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_salted_join_equivalence_randomized(spark):
    """salted_equi_join == plain join on randomized data for inner AND
    left joins, including null join keys (null fact keys match nothing
    in both forms; left preserves them) and dim keys absent from the
    fact and vice versa."""
    import random

    from pyspark.sql import Row, functions as F

    from dce_spark.ext.skew import salted_equi_join

    rnd = random.Random(11)
    fact_rows = [
        Row(
            k=(None if rnd.random() < 0.05 else rnd.randrange(30)),
            v=i,
        )
        for i in range(2000)
    ]
    dim_rows = [Row(k=k, n=k * 7) for k in range(0, 40, 2)]  # gaps + extras
    fact = spark.createDataFrame(fact_rows)
    dim = spark.createDataFrame(dim_rows)

    for how in ("inner", "left"):
        got = (
            salted_equi_join(
                fact, dim, on="k", n_salts=5,
                salt_by=F.xxhash64(F.col("v")), how=how,
            )
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n").alias("sn"),
                F.sum("v").alias("sv"),
            )
            .collect()[0]
        )
        want = (
            fact.join(dim, "k", how)
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n").alias("sn"),
                F.sum("v").alias("sv"),
            )
            .collect()[0]
        )
        assert tuple(got) == tuple(want), how

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_equi_join(fact, dim, on="k", n_salts=0)
    with _pytest.raises(ValueError):
        salted_equi_join(fact, dim, on="k", how="full")


def test_salted_join_default_salt_spreads_hot_key(spark):
    """The DEFAULT salt (no salt_by) must spread a hot key's rows
    across all n_salts values, not collapse them onto one — the old
    default hashed the join key itself, paying the dim replication for
    zero mitigation. Default = xxhash64 over every fact column, so any
    varying non-key column spreads the rows; equivalence with the
    plain join must also hold under the default."""
    from pyspark.sql import functions as F

    from dce_spark.ext.skew import _SALT, salted_equi_join

    # hot key 0 on half the rows; v varies per row
    fact = spark.range(4000).select(
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(F.col("id") % 20)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("n")
    )
    j = salted_equi_join(fact, dim, on="k", n_salts=8)
    got = j.groupBy().agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n").alias("sn")
    ).collect()[0]
    want = fact.join(dim, "k").groupBy().agg(
        F.count(F.lit(1)).alias("rows"), F.sum("n").alias("sn")
    ).collect()[0]
    assert tuple(got) == tuple(want)
    # replay the default salt expression: the hot key occupies all 8
    spread = (
        fact.withColumn(
            _SALT,
            F.pmod(F.xxhash64(F.col("k"), F.col("v")), F.lit(8)).cast("int"),
        )
        .filter(F.col("k") == 0)
        .select(_SALT)
        .distinct()
        .count()
    )
    assert spread == 8
