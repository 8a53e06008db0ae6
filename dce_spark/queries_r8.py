"""Round-8 catalog additions: the two-sample shape-test capstone of
the drift ladder, built on the round-8 ``ext/stats.py`` extraction
(the round-7 verdict ask — KS machinery as a first-class library op;
``ks_test_events`` and the staged ``ks_acctbal_segments`` now call the
same operator these queries do).

- ``ks_weekday_weekend_events`` — exact two-sample KS between the
  weekday and weekend value distributions: the SHAPE companion to
  ``dow_seasonality_events``' volume baseline (volume seasonality says
  weekends are quieter; this asks whether weekend traffic is also a
  different KIND of traffic, which decides whether the drift detectors
  need weekday-conditioned references).
- ``cvm_split_distance_events`` — two-sample Cramer-von Mises on the
  same hash split ``ks_test_events`` tests: KS alarms on one sharp
  localized ECDF gap, CvM integrates many small broad ones; running
  both on the SAME split gives the null-calibrated pair a drift
  monitor needs before it can rank real segment comparisons.

Registered from queries_more.py and FRONTED in ``_DRIVER_WINDOW`` the
same round they land (the r1-r3 unchecked-tail lesson).

Shared determinism conventions as dce_spark/queries.py: ECDFs over
distinct values, exact int64 cumulative counts, quantized-exact 1e9
contribution sums (CvM), one documented double-op order mirrored
token-for-token by the oracle, 9dp final rounding. Both queries are
extension surface beyond the reference's operator set (SURVEY.md §2
"beyond" families; the reference's drift rungs are the binned /
categorical ones — see ``ext/stats.py``'s module docstring).

Scale shape: both run the single ordered window over DISTINCT values
(the documented exactness parity-probe caveat); the 100 TB path is
``ext.stats.ks_two_sample_bucketed`` — same formula over
percentile_approx buckets, equivalence-pinned in
``tests/test_ext_stats.py``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .data import load_table
from .ext.stats import cvm_two_sample, ks_two_sample
from .queries import register

# =====================================================================
# 1. Weekday-vs-weekend value-distribution KS
# =====================================================================

# DuckDB dayofweek() is 0=Sunday..6=Saturday; Spark's dayofweek() is
# 1..7, so the Spark side applies the established -1 shift
# (dow_seasonality_events convention) and both engines test IN (0, 6).
_KS_WEEKEND_ORACLE = """WITH v AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS split,
         CAST(value AS DOUBLE) AS value
  FROM events WHERE value IS NOT NULL
), cells AS (
  SELECT value,
         sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
  FROM v GROUP BY value
), tot AS (
  SELECT sum(c0) AS n0, sum(c1) AS n1 FROM cells
), ecdf AS (
  SELECT sum(c0) OVER (ORDER BY value) AS cum0,
         sum(c1) OVER (ORDER BY value) AS cum1
  FROM cells
)
SELECT round(max(abs(CAST(cum0 AS DOUBLE) / t.n0
                   - CAST(cum1 AS DOUBLE) / t.n1)), 9) AS ks_stat,
       CAST(t.n0 AS BIGINT) AS n0, CAST(t.n1 AS BIGINT) AS n1
FROM ecdf, tot t GROUP BY t.n0, t.n1"""


@register(
    "ks_weekday_weekend_events",
    _KS_WEEKEND_ORACLE,
    "calendar-conditioned drift: exact two-sample KS between the "
    "WEEKDAY and WEEKEND `value` distributions — "
    "dow_seasonality_events established the volume baseline (weekly "
    "period in counts); this is the SHAPE question on the same axis: "
    "is weekend traffic a different kind of traffic, or just less of "
    "the same? If the split is real, every reference-window drift "
    "detector on this stream needs weekday-conditioned references or "
    "it will alarm on the calendar. Calls the first-class "
    "ext.stats.ks_two_sample operator (round-8 extraction): ECDFs at "
    "distinct values so ties step once, exact int64 cumulative "
    "counts, one double division per step, 9dp. The ordered "
    "cumulative window over distinct values keeps the documented "
    "single-task exactness-probe caveat — at 100 TB run "
    "ks_two_sample_bucketed (same formula over percentile_approx "
    "buckets, ECDF table bounded at n_buckets rows).",
)
def ks_weekday_weekend_events(spark, sf_dir):
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when((F.dayofweek("ts") - 1).isin(0, 6), 1)
            .otherwise(0)
            .alias("split"),
            F.col("value").cast("double").alias("value"),
        )
    )
    return ks_two_sample(v)


# =====================================================================
# 2. Cramer-von Mises distance on the hash split
# =====================================================================

_CVM_SPLIT_ORACLE = """WITH v AS (
  SELECT user_id % 2 AS split, CAST(value AS DOUBLE) AS value
  FROM events WHERE value IS NOT NULL
), cells AS (
  SELECT value,
         sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
  FROM v GROUP BY value
), tot AS (
  SELECT sum(c0) AS n0, sum(c1) AS n1 FROM cells
), ecdf AS (
  SELECT CAST(c0 + c1 AS BIGINT) AS w,
         sum(c0) OVER (ORDER BY value) AS cum0,
         sum(c1) OVER (ORDER BY value) AS cum1
  FROM cells
)
SELECT round(CAST(sum(CAST(round(w * (CAST(cum0 AS DOUBLE) / t.n0
                                    - CAST(cum1 AS DOUBLE) / t.n1)
                                   * (CAST(cum0 AS DOUBLE) / t.n0
                                    - CAST(cum1 AS DOUBLE) / t.n1)
                                   * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 * t.n0 / (t.n0 + t.n1) * t.n1 / (t.n0 + t.n1), 9)
         AS cvm_stat,
       CAST(t.n0 AS BIGINT) AS n0, CAST(t.n1 AS BIGINT) AS n1
FROM ecdf, tot t GROUP BY t.n0, t.n1"""


@register(
    "cvm_split_distance_events",
    _CVM_SPLIT_ORACLE,
    "distribution test, integrated form: two-sample CRAMER-VON MISES "
    "distance between the same user-id hash splits ks_test_events "
    "compares — KS reports the single worst ECDF gap (sharp localized "
    "shifts), CvM integrates the squared gap over the whole pooled "
    "sample (broad small shifts KS under-weights). Running both on "
    "one content-free split gives a drift monitor its null-calibrated "
    "statistic pair: real segment comparisons are ranked against "
    "these. Calls the first-class ext.stats.cvm_two_sample operator "
    "(round-8 extraction), tie-robust pooled-ECDF integral form "
    "T = n0*n1/N^2 * sum_x (c0+c1)*(F0-F1)^2: per-step contributions "
    "are non-negative doubles quantized at 1e9 into exact int64 "
    "partial sums (chi_square_drift convention — addition commutes, "
    "partial-agg order cannot matter), closing scale factor applied "
    "once in oracle-mirrored op order, 9dp. Same distinct-value "
    "ordered-window probe caveat and bucketed 100 TB path as the KS "
    "face.",
)
def cvm_split_distance_events(spark, sf_dir):
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("split"),
            F.col("value").cast("double").alias("value"),
        )
    )
    return cvm_two_sample(v)
