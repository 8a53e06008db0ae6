"""ext/stats.py — the round-8 two-sample shape-test extraction.

The library ops' ORACLE parity is covered by the catalog-wide sweep
(ks_test_events, cvm_split_distance_events, ks_weekday_weekend_events
all route through them); this file proves the statistics themselves by
independent driver-side brute force in exact Python arithmetic, plus
the bucketed scale twin's error bound against the exact operator.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dce_spark.data import load_table
from dce_spark.ext.stats import (
    cvm_two_sample,
    cvm_two_sample_bucketed,
    ks_two_sample,
    ks_two_sample_bucketed,
)

from conftest import SF_DIR


def _split_values(spark):
    return (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("split"),
            F.col("value").cast("double").alias("value"),
        )
    )


def _pooled_steps(rows):
    """Driver-side pooled ECDF over distinct values: list of
    (pooled multiplicity, cum0, cum1) in value order, plus totals."""
    from collections import Counter

    c0, c1 = Counter(), Counter()
    for s, v in rows:
        (c0 if s == 0 else c1)[v] += 1
    n0, n1 = sum(c0.values()), sum(c1.values())
    steps, a, b = [], 0, 0
    for v in sorted(set(c0) | set(c1)):
        a += c0[v]
        b += c1[v]
        steps.append((c0[v] + c1[v], a, b))
    return steps, n0, n1


def test_ks_matches_driver_bruteforce(spark):
    v = _split_values(spark)
    rows = [(int(r["split"]), float(r["value"])) for r in v.collect()]
    steps, n0, n1 = _pooled_steps(rows)
    expect = round(max(abs(a / n0 - b / n1) for _, a, b in steps), 9)
    row = ks_two_sample(v).collect()[0]
    assert (row["n0"], row["n1"]) == (n0, n1)
    assert row["ks_stat"] == expect
    spark.catalog.clearCache()


def test_cvm_matches_driver_bruteforce(spark):
    """Replay the quantized integral form exactly: per-step int64
    contributions, closing scale factor in the operator's op order."""
    v = _split_values(spark)
    rows = [(int(r["split"]), float(r["value"])) for r in v.collect()]
    steps, n0, n1 = _pooled_steps(rows)
    acc = 0
    for w, a, b in steps:
        d = a / n0 - b / n1
        acc += round(w * d * d * 1e9)
    nn = float(n0 + n1)
    expect = round(acc / 1e9 * n0 / nn * n1 / nn, 9)
    row = cvm_two_sample(v).collect()[0]
    assert (row["n0"], row["n1"]) == (n0, n1)
    assert row["cvm_stat"] == pytest.approx(expect, abs=2e-9)
    spark.catalog.clearCache()


def test_near_identical_splits_read_as_null(spark):
    """Null calibration: when the two splits see (near-)identical
    multisets — value = floor(event_id / 2) against an event_id-parity
    split over dense ids, so every value appears once per split up to
    one straggler — KS must sit at its minimal resolvable step and CvM
    in the null band (both statistics read 'no drift')."""
    v = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.pmod(F.col("event_id"), F.lit(2)).alias("split"),
            (F.col("event_id") / F.lit(2)).cast("long")
            .cast("double")
            .alias("value"),
        )
    )
    row_ks = ks_two_sample(v).collect()[0]
    row_cvm = cvm_two_sample(v).collect()[0]
    assert row_ks["ks_stat"] <= 1.0 / min(row_ks["n0"], row_ks["n1"]) + 1e-9
    assert row_cvm["cvm_stat"] < 0.51  # the classical null band
    spark.catalog.clearCache()


def test_bucketed_ks_tracks_exact(spark):
    """The 100 TB twin: bucketed KS must never exceed the exact KS
    (coarsening ECDFs can only shrink the max gap) and must sit
    within the largest-bucket-mass bound of it."""
    v = _split_values(spark)
    exact = ks_two_sample(v).collect()[0]["ks_stat"]
    n_buckets = 256
    approx = ks_two_sample_bucketed(v, n_buckets=n_buckets).collect()[0][
        "ks_stat"
    ]
    assert approx <= exact + 1e-9
    # GK-sketch rank error (accuracy=10000 -> ~1e-4) + bucket mass
    assert exact - approx <= 3.0 / n_buckets + 1e-3
    spark.catalog.clearCache()


def test_bucketed_ks_constant_column_degenerates(spark):
    """A constant value column collapses every sketch edge to one
    value; after dedup the splits are [-inf, c, inf] and the
    Bucketizer path must still produce KS = 0 (one populated bucket)
    instead of crashing on non-increasing splits."""
    v = (
        load_table(spark, SF_DIR, "events")
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("split"),
            F.lit(1.0).alias("value"),
        )
    )
    row = ks_two_sample_bucketed(v, n_buckets=64).collect()[0]
    assert row["ks_stat"] == 0.0
    spark.catalog.clearCache()


def test_bucketed_ks_edge_cases_match_exact_twin(spark):
    """Code-review r8 fixes, pinned: (a) NaN rows must not crash the
    Bucketizer path — handleInvalid='keep' routes them to the trailing
    bucket, where the exact op's NaN-sorts-last window also puts them,
    so the twins agree; (b) empty input returns an empty frame like
    the exact twin; (c) n_buckets=1 (no interior edges) falls back to
    the exact form."""
    from pyspark.sql import Row

    rows = [
        Row(split=i % 2, value=float(v))
        for i, v in enumerate((1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    ] + [Row(split=0, value=float("nan")), Row(split=1, value=float("nan"))]
    v = spark.createDataFrame(rows)
    exact = ks_two_sample(v).collect()[0]
    approx = ks_two_sample_bucketed(v, n_buckets=4).collect()[0]
    assert (approx["n0"], approx["n1"]) == (exact["n0"], exact["n1"])
    assert approx["ks_stat"] <= exact["ks_stat"] + 1e-9

    empty = v.filter(F.col("split") == 2)
    assert ks_two_sample_bucketed(empty, n_buckets=16).collect() == []
    assert ks_two_sample(empty).collect() == []

    one_bucket = ks_two_sample_bucketed(
        v.filter(~F.isnan("value")), n_buckets=1
    ).collect()[0]
    exact_clean = ks_two_sample(v.filter(~F.isnan("value"))).collect()[0]
    assert one_bucket["ks_stat"] == exact_clean["ks_stat"]
    spark.catalog.clearCache()


def test_bucketed_cvm_tracks_exact(spark):
    """The round-9 CvM scale twin (r8 verdict item 4): the bucketed
    statistic must sit within the largest-bucket-mass bound of the
    exact one, pinned at two bucket widths so the error genuinely
    shrinks with n_buckets (the docstring's claim, not just a single
    lucky width)."""
    v = _split_values(spark)
    exact = cvm_two_sample(v).collect()[0]["cvm_stat"]
    errs = {}
    for n_buckets in (64, 256):
        row = cvm_two_sample_bucketed(v, n_buckets=n_buckets).collect()[0]
        errs[n_buckets] = abs(exact - row["cvm_stat"])
        # GK-sketch rank error (accuracy=10000 -> ~1e-4) + bucket mass
        assert errs[n_buckets] <= 3.0 / n_buckets + 1e-3, n_buckets
    assert errs[256] <= errs[64] + 1e-3
    spark.catalog.clearCache()


def test_bucketed_cvm_edge_cases_match_exact_twin(spark):
    """The KS-twin edge matrix, replayed for the CvM face: NaN rows
    route to the trailing bucket where the exact op's NaN-sorts-last
    window also puts them; empty input returns an empty frame; a
    single bucket falls back to the exact form."""
    from pyspark.sql import Row

    rows = [
        Row(split=i % 2, value=float(v))
        for i, v in enumerate((1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    ] + [Row(split=0, value=float("nan")), Row(split=1, value=float("nan"))]
    v = spark.createDataFrame(rows)
    exact = cvm_two_sample(v).collect()[0]
    approx = cvm_two_sample_bucketed(v, n_buckets=4).collect()[0]
    assert (approx["n0"], approx["n1"]) == (exact["n0"], exact["n1"])
    assert abs(approx["cvm_stat"] - exact["cvm_stat"]) <= 3.0 / 4 + 1e-9

    empty = v.filter(F.col("split") == 2)
    assert cvm_two_sample_bucketed(empty, n_buckets=16).collect() == []

    one_bucket = cvm_two_sample_bucketed(
        v.filter(~F.isnan("value")), n_buckets=1
    ).collect()[0]
    exact_clean = cvm_two_sample(v.filter(~F.isnan("value"))).collect()[0]
    assert one_bucket["cvm_stat"] == exact_clean["cvm_stat"]
    spark.catalog.clearCache()


def test_bad_split_raises(spark):
    """Round-8 ADVICE: a split value outside {0, 1} (or NULL) must
    RAISE — the old behavior dropped the row from both ECDFs and
    silently biased the statistic."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    from pyspark.sql import Row
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("split", LongType(), True),
        StructField("value", DoubleType(), True),
    ])
    for bad in (2, None):
        rows = [Row(split=0, value=1.0), Row(split=1, value=2.0),
                Row(split=bad, value=3.0)]
        v = spark.createDataFrame(rows, schema)
        for op in (ks_two_sample, cvm_two_sample):
            with pytest.raises(
                (Py4JJavaError, SparkRuntimeException), match="0/1"
            ):
                op(v).collect()
    spark.catalog.clearCache()


def test_empty_split_raises(spark):
    """Round-8 ADVICE: one populated split used to flow through
    Spark's non-ANSI divide into a silent NULL stat; now it raises."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    from pyspark.sql import Row

    errs = (Py4JJavaError, SparkRuntimeException)
    v = spark.createDataFrame(
        [Row(split=0, value=1.0), Row(split=0, value=2.0)]
    )
    for op in (ks_two_sample, cvm_two_sample):
        with pytest.raises(errs, match="split is empty"):
            op(v).collect()
    with pytest.raises(errs, match="split is empty"):
        ks_two_sample_bucketed(v, n_buckets=8).collect()
    spark.catalog.clearCache()


def test_library_ops_are_scalable(spark):
    """Plan lint on the library faces themselves (the catalog sweep
    covers the registered wrappers): no cartesian, no NLJ, no
    row-at-a-time Python."""
    from dce_spark.planaudit import assert_scalable

    v = _split_values(spark)
    assert_scalable(ks_two_sample(v))
    assert_scalable(cvm_two_sample(v))
    assert_scalable(ks_two_sample_bucketed(v, n_buckets=64))
    assert_scalable(cvm_two_sample_bucketed(v, n_buckets=64))
    assert_scalable(ks_two_sample_bucketed(v, edges=[10.0, 50.0, 200.0]))
    assert_scalable(cvm_two_sample_bucketed(v, edges=[10.0, 50.0, 200.0]))
    spark.catalog.clearCache()


def test_fixed_edges_match_driver_bruteforce(spark):
    """The round-10 fixed-edge face: with explicit boundaries the
    bucket id is the deterministic boolean sum over `value >= edge`,
    so a driver-side replay must match BIT-FOR-BIT (not just within a
    bound — this face is what the catalog oracle-pairs)."""
    edges = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]
    v = _split_values(spark)
    rows = [
        (int(r["split"]), float(sum(r["value"] >= e for e in edges)))
        for r in v.collect()
    ]
    steps, n0, n1 = _pooled_steps(rows)
    exp_ks = round(max(abs(a / n0 - b / n1) for _, a, b in steps), 9)
    acc = 0
    for w, a, b in steps:
        d = a / n0 - b / n1
        acc += round(w * d * d * 1e9)
    nn = float(n0 + n1)
    exp_cvm = round(acc / 1e9 * n0 / nn * n1 / nn, 9)
    ks = ks_two_sample_bucketed(v, edges=edges).collect()[0]
    cvm = cvm_two_sample_bucketed(v, edges=edges).collect()[0]
    assert (ks["n0"], ks["n1"]) == (n0, n1)
    assert ks["ks_stat"] == exp_ks
    assert cvm["cvm_stat"] == pytest.approx(exp_cvm, abs=2e-9)
    # and the fixed-edge KS can never exceed the exact KS (coarsening)
    exact = ks_two_sample(v).collect()[0]["ks_stat"]
    assert ks["ks_stat"] <= exact + 1e-9
    spark.catalog.clearCache()


def test_fixed_edges_validation_raises(spark):
    """Edges must be non-empty, finite, strictly increasing — a
    repeated or descending boundary silently merging buckets would
    bias the statistic, so it raises at CALL time (ValueError, no
    Spark job)."""
    v = _split_values(spark)
    for bad in ([], [1.0, 1.0], [2.0, 1.0], [0.0, float("inf")],
                [float("nan")]):
        with pytest.raises(ValueError, match="edges"):
            ks_two_sample_bucketed(v, edges=bad)
        with pytest.raises(ValueError, match="edges"):
            cvm_two_sample_bucketed(v, edges=bad)


def test_bucketed_guard_runs_before_null_filter(spark):
    """Round-9 ADVICE pin: a contract-violating split on a NULL-value
    row used to be silently discarded by the bucketed twins (the NULL
    filter ran first) where the exact twins raise. The guard now sits
    inside the value expression ahead of the filter, so BOTH bucketed
    faces raise exactly like the exact twin — on the sketch face the
    eager edge-collect job surfaces it at call time."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    from pyspark.sql import Row
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    errs = (Py4JJavaError, SparkRuntimeException)
    schema = StructType([
        StructField("split", LongType(), True),
        StructField("value", DoubleType(), True),
    ])
    for bad in (2, None):
        rows = [Row(split=0, value=1.0), Row(split=1, value=2.0),
                Row(split=bad, value=None)]
        v = spark.createDataFrame(rows, schema)
        with pytest.raises(errs, match="0/1"):
            ks_two_sample_bucketed(v, edges=[1.5]).collect()
        with pytest.raises(errs, match="0/1"):
            cvm_two_sample_bucketed(v, edges=[1.5]).collect()
        with pytest.raises(errs, match="0/1"):
            ks_two_sample_bucketed(v, n_buckets=8).collect()
    # sanity: with a VALID split the NULL-value row is still just
    # filtered (the documented twin divergence on null VALUES stays)
    ok = spark.createDataFrame(
        [Row(split=0, value=1.0), Row(split=1, value=2.0),
         Row(split=1, value=None)], schema,
    )
    row = ks_two_sample_bucketed(ok, edges=[1.5]).collect()[0]
    assert (row["n0"], row["n1"]) == (1, 1)
    spark.catalog.clearCache()


def test_randomized_adversarial_multisets(spark):
    """Fixed-seed randomized equivalence (the test_warehouse
    convention — deterministic, no flake): heavy ties, negatives,
    tiny and lopsided splits. The operators must match the exact
    driver-side statistics on every frame."""
    import random

    from pyspark.sql import Row

    for seed in (7, 23, 91):
        rng = random.Random(seed)
        n = rng.randint(8, 120)
        # draw from a tiny value domain to force heavy ties, with a
        # lopsided split probability
        p1 = rng.choice((0.15, 0.5, 0.85))
        rows = [
            Row(
                split=1 if rng.random() < p1 else 0,
                value=float(rng.choice((-2.5, -1.0, 0.0, 0.25, 3.0))),
            )
            for _ in range(n)
        ]
        # ensure both splits are populated (the documented contract)
        rows[0] = Row(split=0, value=rows[0].value)
        rows[1] = Row(split=1, value=rows[1].value)
        v = spark.createDataFrame(rows)
        steps, n0, n1 = _pooled_steps([(r.split, r.value) for r in rows])
        exp_ks = round(max(abs(a / n0 - b / n1) for _, a, b in steps), 9)
        acc = 0
        for w, a, b in steps:
            d = a / n0 - b / n1
            acc += round(w * d * d * 1e9)
        nn = float(n0 + n1)
        exp_cvm = round(acc / 1e9 * n0 / nn * n1 / nn, 9)
        ks = ks_two_sample(v).collect()[0]
        cvm = cvm_two_sample(v).collect()[0]
        assert (ks["n0"], ks["n1"]) == (n0, n1), seed
        assert ks["ks_stat"] == exp_ks, seed
        assert cvm["cvm_stat"] == pytest.approx(exp_cvm, abs=2e-9), seed
    spark.catalog.clearCache()


def test_fixed_edge_nan_top_bucket(spark):
    """Round-10 ADVICE #2 pin: on the FIXED-EDGE face a NaN value
    passes the isNotNull filter and every `value >= edge` comparison
    (Spark's NaN-greatest ordering; DuckDB agrees, so oracle parity
    holds) — it lands in the TOP bucket, merged with large reals.
    Replacing each NaN by a finite value above the last edge must
    therefore leave the statistic bit-identical."""
    from pyspark.sql import Row

    edges = [1.0, 2.0, 4.0]
    with_nan = spark.createDataFrame(
        [Row(split=0, value=0.5), Row(split=0, value=3.0),
         Row(split=1, value=1.5), Row(split=1, value=float("nan"))]
    )
    imputed = spark.createDataFrame(
        [Row(split=0, value=0.5), Row(split=0, value=3.0),
         Row(split=1, value=1.5), Row(split=1, value=99.0)]
    )
    for op in (ks_two_sample_bucketed, cvm_two_sample_bucketed):
        a = op(with_nan, edges=edges).collect()[0]
        b = op(imputed, edges=edges).collect()[0]
        assert a == b, op.__name__
    # and the sketch face gives NaN its own TRAILING bucket — still
    # above everything (the documented faces-differ-on-the-last-step
    # divergence): the statistic must match the exact operator's
    # NaN-sorts-highest treatment here because no large real shares
    # the top step in this fixture
    s = ks_two_sample_bucketed(with_nan, n_buckets=4).collect()[0]
    e = ks_two_sample(with_nan).collect()[0]
    assert (s["n0"], s["n1"]) == (e["n0"], e["n1"]) == (2, 2)
    spark.catalog.clearCache()


def test_bucketed_on_null_raise_mode(spark):
    """Round-10 verdict item 7 (the compiler-boundary guard): with
    on_null='raise' a NULL value fails loudly with a named error on
    BOTH bucketed faces, instead of being silently filtered into the
    documented twin divergence; valid frames are unaffected
    (bit-identical to the default mode)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException
    from pyspark.sql import Row
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    errs = (Py4JJavaError, SparkRuntimeException)
    schema = StructType([
        StructField("split", LongType(), True),
        StructField("value", DoubleType(), True),
    ])
    dirty = spark.createDataFrame(
        [Row(split=0, value=1.0), Row(split=1, value=2.0),
         Row(split=1, value=None)], schema,
    )
    with pytest.raises(errs, match="on_null"):
        ks_two_sample_bucketed(dirty, edges=[1.5], on_null="raise").collect()
    with pytest.raises(errs, match="on_null"):
        cvm_two_sample_bucketed(
            dirty, edges=[1.5], on_null="raise"
        ).collect()
    with pytest.raises(errs, match="on_null"):
        ks_two_sample_bucketed(dirty, n_buckets=8, on_null="raise").collect()
    clean = spark.createDataFrame(
        [Row(split=0, value=1.0), Row(split=0, value=3.0),
         Row(split=1, value=2.0)], schema,
    )
    for op in (ks_two_sample_bucketed, cvm_two_sample_bucketed):
        assert (
            op(clean, edges=[1.5], on_null="raise").collect()
            == op(clean, edges=[1.5]).collect()
        ), op.__name__
    with pytest.raises(ValueError, match="on_null"):
        ks_two_sample_bucketed(clean, edges=[1.5], on_null="drop")
    spark.catalog.clearCache()


def test_fixed_edge_oracle_raises_on_empty_split():
    """Round-10 ADVICE #1 pin: the fixed-edge KS/CvM DuckDB oracles
    now mirror ext.stats._guarded_total — on degenerate data where one
    split is empty they RAISE a named error (as the Spark side does)
    instead of emitting NULL/inf, so the driver would surface the
    documented contract violation, not an opaque hash mismatch."""
    import duckdb

    from dce_spark.queries_r10 import _CVM_FIXED_ORACLE, _KS_FIXED_ORACLE

    con = duckdb.connect()
    # weekday-only timestamps -> the weekend split is empty
    con.execute(
        "CREATE VIEW events AS SELECT TIMESTAMP '2024-01-01 00:00:00' "
        "+ INTERVAL (i) HOUR AS ts, CAST(1 + i AS DOUBLE) AS value "
        "FROM range(12) t(i)"
    )
    for sql in (_KS_FIXED_ORACLE, _CVM_FIXED_ORACLE):
        with pytest.raises(duckdb.Error, match="one split is empty"):
            con.sql(sql).fetchall()
    con.close()
