"""Round-10 catalog additions: the FIXED-EDGE face of the bucketed
shape tests (the round-9 verdict's item 4 — "a bucketed form whose
boundaries are explicit becomes DuckDB-checkable bit-for-bit").

The sketch-bucketed twins (``ks/cvm_two_sample_bucketed`` with
``percentile_approx`` edges) are the 100 TB path but can only be
equivalence-BOUNDED against their exact forms: DuckDB's exact
quantiles legitimately disagree with the GK sketch's edges, so no
oracle row existed for the bucketed code path. With EXPLICIT edges
the bucket id is the deterministic boolean sum
``sum_i (value >= edge_i)`` — a pure map-side codegen expression both
engines compute bit-identically — so the bucketed ECDF machinery
itself (bucket cells -> ordered cumulative window -> guarded divide)
finally gets a driver-checked oracle row instead of only a bound.

- ``ks_fixed_edges_events`` — bucketed two-sample KS between the
  weekday and weekend `value` distributions over 8 fixed log-spaced
  buckets: the production drift-monitor form of
  ``ks_weekday_weekend_events`` (same split, same formula), with the
  ordered window bounded at 8 steps instead of one step per distinct
  double — metadata at any corpus scale.
- ``cvm_fixed_edges_events`` — the integrated (Cramer-von Mises)
  statistic over the same fixed buckets and split, completing the
  oracle-paired bucketed pair.

Registered from queries_more.py and FRONTED in ``_DRIVER_WINDOW`` the
same round they land (the r1-r3 unchecked-tail lesson).

Conventions: bucket ids via the boolean sum above (NULL values
filtered first — they carry no bucket); per-bucket cells with exact
int64 per-split counts; the SAME ``ext.stats`` ECDF/divide/quantize
op order as the exact forms, mirrored token-for-token by the oracles;
9dp final rounding. Fixed edges trade the sketch face's
data-adaptive boundaries for oracle-exactness — a drift MONITOR wants
fixed boundaries anyway (stable across reference and current windows;
the PSI lesson, reference ``contracts_validator/src/ml.rs:436-452``).

Scale shape: one parquet scan, map-side bucket expression inside
whole-stage codegen, 8-cell aggregate (partial map-side combine), an
8-row ordered window (pure metadata), 1-row broadcast totals. No
sketch job, no collect beyond the 1-row result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .data import load_table
from .queries import register

# 8 fixed log-spaced buckets over the events.value domain
# (~[0, 500] at every SF; the testdata generator's lognormal-ish
# spread): boundaries chosen round so the oracle literals are exact
# doubles in both engines.
_FIXED_EDGES = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]

_EDGE_SUM_SQL = " + ".join(
    f"CAST((CAST(value AS DOUBLE) >= {e}) AS INT)" for e in _FIXED_EDGES
)

# DuckDB dayofweek() is 0=Sunday..6=Saturday; Spark's dayofweek() is
# 1..7, so the Spark side applies the established -1 shift
# (dow_seasonality_events / ks_weekday_weekend_events convention) and
# both engines test IN (0, 6).
_FIXED_CELLS_SQL = f"""WITH v AS (
  SELECT CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS split,
         {_EDGE_SUM_SQL} AS bucket
  FROM events WHERE value IS NOT NULL
), cells AS (
  SELECT bucket,
         sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
  FROM v GROUP BY bucket
), tot AS (
  -- guarded divisors, mirroring ext.stats._guarded_total: the Spark
  -- side raises a named assert_true error when one split is empty
  -- (the statistic is undefined over one sample); without this CASE
  -- the oracle would instead emit NULL/inf on degenerate data and the
  -- driver would surface an opaque hash mismatch rather than the
  -- documented contract violation (round-10 ADVICE #1)
  SELECT CASE WHEN sum(c0) = 0 OR sum(c1) = 0
              THEN CAST(error('ext.stats: one split is empty') AS BIGINT)
              ELSE CAST(sum(c0) AS BIGINT) END AS n0,
         CASE WHEN sum(c0) = 0 OR sum(c1) = 0
              THEN CAST(error('ext.stats: one split is empty') AS BIGINT)
              ELSE CAST(sum(c1) AS BIGINT) END AS n1
  FROM cells
)"""

_KS_FIXED_ORACLE = (
    _FIXED_CELLS_SQL
    + """, ecdf AS (
  SELECT sum(c0) OVER (ORDER BY bucket) AS cum0,
         sum(c1) OVER (ORDER BY bucket) AS cum1
  FROM cells
)
SELECT round(max(abs(CAST(cum0 AS DOUBLE) / t.n0
                   - CAST(cum1 AS DOUBLE) / t.n1)), 9) AS ks_stat,
       CAST(t.n0 AS BIGINT) AS n0, CAST(t.n1 AS BIGINT) AS n1
FROM ecdf, tot t GROUP BY t.n0, t.n1"""
)

_CVM_FIXED_ORACLE = (
    _FIXED_CELLS_SQL
    + """, ecdf AS (
  SELECT CAST(c0 + c1 AS BIGINT) AS w,
         sum(c0) OVER (ORDER BY bucket) AS cum0,
         sum(c1) OVER (ORDER BY bucket) AS cum1
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
)


def _weekend_split_values(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.when((F.dayofweek("ts") - 1).isin(0, 6), 1)
            .otherwise(0)
            .alias("split"),
            F.col("value").cast("double").alias("value"),
        )
    )


@register(
    "ks_fixed_edges_events",
    _KS_FIXED_ORACLE,
    "calendar-conditioned drift, PRODUCTION form: bucketed two-sample "
    "KS between the weekday and weekend `value` distributions over 8 "
    "FIXED log-spaced buckets — the same split and formula as "
    "ks_weekday_weekend_events, with the ordered ECDF window bounded "
    "at 8 steps instead of one per distinct double (metadata at any "
    "corpus scale; no exactness-probe caveat). Explicit edges make "
    "the bucketed code path oracle-checkable bit-for-bit: the bucket "
    "id is the boolean sum over `value >= edge` comparisons, a pure "
    "map-side codegen expression both engines compute identically "
    "(the round-9 verdict's fixed-edge ask — the sketch-edged twin "
    "ks_two_sample_bucketed is equivalence-bounded only). A drift "
    "monitor wants fixed boundaries anyway: stable across reference "
    "and current windows, the PSI convention. Calls "
    "ext.stats.ks_two_sample_bucketed(edges=...): bucket cells with "
    "exact int64 per-split counts, one double division per step, "
    "guarded empty-split divide, 9dp.",
)
def ks_fixed_edges_events(spark, sf_dir):
    from .ext.stats import ks_two_sample_bucketed

    return ks_two_sample_bucketed(
        _weekend_split_values(spark, sf_dir), edges=_FIXED_EDGES
    )


@register(
    "cvm_fixed_edges_events",
    _CVM_FIXED_ORACLE,
    "calendar-conditioned drift, integrated PRODUCTION form: bucketed "
    "two-sample Cramer-von Mises over the same weekday/weekend split "
    "and 8 fixed buckets as ks_fixed_edges_events — KS reports the "
    "single worst bucketed-ECDF gap, CvM integrates the squared gap "
    "over the pooled bucket masses (broad small shifts KS "
    "under-weights), so the pair gives the monitor its "
    "null-calibrated statistic duo on the bounded bucketed path. "
    "Oracle-paired bit-for-bit via the explicit-edge boolean-sum "
    "binning (the sketch-edged cvm_two_sample_bucketed twin is "
    "equivalence-bounded only). Calls "
    "ext.stats.cvm_two_sample_bucketed(edges=...): tie-robust pooled-"
    "ECDF integral T = n0*n1/N^2 * sum_x (c0+c1)*(F0-F1)^2, per-step "
    "contributions quantized at 1e9 into exact int64 partial sums "
    "(addition commutes — partial-agg order cannot matter), closing "
    "scale factor applied once in oracle-mirrored op order, 9dp.",
)
def cvm_fixed_edges_events(spark, sf_dir):
    from .ext.stats import cvm_two_sample_bucketed

    return cvm_two_sample_bucketed(
        _weekend_split_values(spark, sf_dir), edges=_FIXED_EDGES
    )
