"""ROUND-19 STAGED catalog queries — seeded in round 13 (built three
rounds early: with r14..r18 staged, rounds 14..17 are promotion-only
and the pipeline holds five cohorts of inventory), NOT registered
(same freeze protocol as queries_staging_r5..r18). Round 19 promotes
them.

The three themes are the in-code ROUND-19 candidate seeds
(queries.py plan comment), each composing proven machinery:

CALIBRATION x DRIFT CLOSED LOOP — the r18 calibration grid re-run PER
r15 ARRIVAL BATCH: per-delivery cell metrics (admitted mass + the
exact-integer source bias, both within-batch), the per-batch pareto
frontier (the r18 two-window skyline, partitioned by batch), the
deterministic per-batch PICK (max tokens on the frontier, bias then
cell-key tie-breaks), pick churn across deliveries, frontier
entry/exit churn, the exact cross-multiplied re-calibration alarm on
the production cell, and the token cost of serving every delivery
with the STALE batch-0 pick. This is the r12 drift-monitor protocol
applied to the tuner itself: the gates do not move — the input does,
and these rows say when the calibration must.

- ``cal_cell_metrics_by_batch_documents`` — per (batch, cell):
  admitted docs/tokens + within-batch bias.
- ``cal_frontier_by_batch_documents`` — the per-batch skyline flags.
- ``cal_pick_by_batch_documents`` — the rank-1 frontier cell per
  batch (fully tie-broken).
- ``cal_pick_churn_documents`` — did the pick move vs the previous
  delivery (lagged cell keys + moved flag).
- ``cal_frontier_churn_documents`` — per batch: frontier size and
  cells entering/leaving vs the previous delivery.
- ``cal_recalibration_alarm_documents`` — the production cell's
  bias growth vs batch 0 as an exact cross-multiplied >25% flag,
  OR-ed with pick movement.
- ``cal_stale_pick_cost_documents`` — per batch: tokens under the
  batch-optimal pick vs under the frozen batch-0 pick (lost tokens
  >= 0 by construction — the frontier always contains the max-token
  cell).

LSH-INDEX LIFECYCLE COSTING — the r16 admission ledger's GROWTH
turned into build/maintain ECONOMICS (the r17 evolution-economics
protocol applied to the dedup index; the r16 cohort owns admission /
staleness / probe-cost — this one owns the bills): carry-vs-rebuild
append bills per commit, compact-every-k policy sweeps (fragments,
probe amplification, compaction cost) with per-policy totals, the
signature-computation bill (shingle counts — the CPU side), an
index-schema evolution priced with grandfathered vintages, and the
bounded-wave re-index plan (the r17 migration-waves convention).

- ``lsh_carry_vs_rebuild_bill_documents`` — per commit: append rows
  vs rebuild-from-scratch rows, both cumulative, the cheaper flag.
- ``lsh_compaction_policy_sweep_documents`` — per (commit, k):
  fragments, probe-amplification rows, compaction rows.
- ``lsh_compaction_policy_totals_documents`` — per k: the policy
  decision rollup.
- ``lsh_signature_bill_documents`` — per commit: exact shingle
  counts signed incrementally vs re-signed on rebuild.
- ``lsh_reindex_grandfather_documents`` — an index-schema evolution
  at a literal commit: old-schema vs new-schema bucket rows per
  commit and the dual-probe penalty window.
- ``lsh_reindex_wave_plan_documents`` — the old-schema vintages
  re-indexed in bounded waves (exact cumulative cuts).

PORTFOLIO x SKEW INTERACTION — the r18 layout portfolio re-priced
under measured key skew: exact per-join key profiles (rows, distinct
keys, max key count, the r17 8x-mean alarm), the minimum salt factor
in {1,2,4,8} that tames the hottest key, the salted-join price list
(saving net of the (f-1) x build replication overhead, clamped at 0 —
the r13 clamp convention), the skew-adjusted ROI re-rank vs the naive
ranking, the re-run budget-prefix greedy, the top-5 hot keys per
join, and the skew-adjusted residual bill.

- ``skew_key_profile_tpch`` — per workload join key: the exact skew
  profile + alarm.
- ``skew_salt_requirement_tpch`` — the minimum taming salt factor.
- ``portfolio_salted_join_price_tpch`` — per (join, salt): net saved
  rows per run and the replication overhead.
- ``portfolio_skew_adjusted_roi_tpch`` — per layout: skew-adjusted
  savings, ROI key, new rank vs naive rank.
- ``portfolio_skew_adjusted_prefix_tpch`` — the greedy prefix re-run
  on adjusted ROI (same cap), with changed-pick flags.
- ``skew_hot_keys_tpch`` — the top-5 hottest key values per join.
- ``portfolio_salt_residual_tpch`` — per family: the daily bill
  under the skew-adjusted portfolio.

tests/test_staging_r19.py runs these through the SAME compare harness
as the live catalog at the suite's SF. Every query verified against
its DuckDB oracle at sf0.001 + sf0.01 + sf0.1 before commit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table

# the r18 admission frame (gate flags + arrival batches + dup-copy
# batches), calibration grid constants, workload/layout literals and
# the portfolio chain; the r15 batch count; the r17 join literals
from .queries_staging_r15 import _DNB
from .queries_staging_r17 import _JOINS, _LAYOUTS, _Q_HI, _Q_LO
from .queries_staging_r18 import (
    _ADM_CTE,
    _CAL_BANDS,
    _CAL_FLOORS,
    _JOIN_TABLES,
    _LAYOUT_TABLES,
    _PORTFOLIO_CTES,
    _WL_CTES,
    _WORKLOAD,
    _admission_frame,
    _cover_frame,
    _lit_frame,
    _portfolio_frame,
    _priced_workload,
    _wl_counts,
)
from .queries_staging_r13 import _QUALITY_FLOOR

STAGED_R19: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R19[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R19[name].oracle


# =====================================================================
# A. Calibration x drift closed loop
# =====================================================================

# per-(batch, cell, source) admission counts -> per-(batch, cell)
# metrics with the within-batch exact bias. The r18 _CAL_CTE grid with
# the batch axis KEPT (r18's cell CTE drops it).
_CALB_CTE = (
    _ADM_CTE
    + f""", grid1 AS (
  SELECT g.*,
         unnest([{", ".join(str(lo) for lo, _hi in _CAL_BANDS)}])
           AS q_lo,
         unnest([{", ".join(str(hi) for _lo, hi in _CAL_BANDS)}])
           AS q_hi
  FROM gb g
), grid AS (
  SELECT g1.*, unnest([{", ".join(str(f) for f in _CAL_FLOORS)}])
           AS floor_tok
  FROM grid1 g1
), cellb AS (
  SELECT CAST(q_lo AS BIGINT) AS q_lo, CAST(q_hi AS BIGINT) AS q_hi,
         CAST(floor_tok AS BIGINT) AS floor_tok,
         dbatch, doc_id, source, ntok,
         g_exact * g_near
           * (CASE WHEN mw BETWEEN q_lo AND q_hi THEN 1 ELSE 0 END)
           * (CASE WHEN ntok >= floor_tok THEN 1 ELSE 0 END) AS adm
  FROM grid
), cs AS (
  SELECT dbatch, q_lo, q_hi, floor_tok, source,
         CAST(sum(adm) AS BIGINT) AS adm_s,
         CAST(sum(adm * ntok) AS BIGINT) AS tok_s,
         CAST(count(*) AS BIGINT) AS corp_s
  FROM cellb GROUP BY 1, 2, 3, 4, 5
), cs2 AS (
  SELECT cs.*,
         sum(adm_s) OVER (PARTITION BY dbatch, q_lo, q_hi, floor_tok)
           AS a,
         sum(corp_s) OVER (PARTITION BY dbatch, q_lo, q_hi, floor_tok)
           AS t
  FROM cs
), cmetrics AS (
  SELECT dbatch, q_lo, q_hi, floor_tok,
         CAST(max(a) AS BIGINT) AS n_admitted,
         CAST(sum(tok_s) AS BIGINT) AS admitted_tokens,
         CAST(max(t) AS BIGINT) AS batch_docs,
         CAST(sum(abs(adm_s * t - corp_s * a)) AS BIGINT) AS bias_num
  FROM cs2 GROUP BY 1, 2, 3, 4
)"""
)


def _cal_metrics_by_batch(spark, sf_dir):
    """The Spark mirror of _CALB_CTE's ``cmetrics``: per (arrival
    batch, grid cell) — admitted docs/tokens and the within-batch
    exact cross-multiplied bias. One admission pass, the constant 12x
    grid explode, a two-level key-bounded aggregate (keys now carry
    the batch)."""
    g = _admission_frame(spark, sf_dir)
    bands = g.select(
        "doc_id",
        "source",
        "ntok",
        "mw",
        "dbatch",
        "g_exact",
        "g_near",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lo).cast("long").alias("q_lo"),
                        F.lit(hi).cast("long").alias("q_hi"),
                    )
                    for lo, hi in _CAL_BANDS
                ]
            )
        ).alias("band"),
    ).select("*", "band.q_lo", "band.q_hi")
    grid = bands.select(
        "doc_id",
        "source",
        "ntok",
        "mw",
        "dbatch",
        "g_exact",
        "g_near",
        "q_lo",
        "q_hi",
        F.explode(
            F.array(*[F.lit(f).cast("long") for f in _CAL_FLOORS])
        ).alias("floor_tok"),
    )
    adm = (
        F.col("g_exact")
        * F.col("g_near")
        * ((F.col("mw") >= F.col("q_lo")) & (F.col("mw") <= F.col("q_hi")))
        .cast("long")
        * (F.col("ntok") >= F.col("floor_tok")).cast("long")
    )
    cellb = grid.select(
        "dbatch",
        "q_lo",
        "q_hi",
        "floor_tok",
        "source",
        "ntok",
        adm.cast("long").alias("adm"),
    )
    cs = cellb.groupBy(
        "dbatch", "q_lo", "q_hi", "floor_tok", "source"
    ).agg(
        F.sum("adm").cast("long").alias("adm_s"),
        F.sum(F.col("adm") * F.col("ntok"))
        .cast("long")
        .alias("tok_s"),
        F.count(F.lit(1)).cast("long").alias("corp_s"),
    )
    w = Window.partitionBy("dbatch", "q_lo", "q_hi", "floor_tok")
    cs2 = cs.withColumn("a", F.sum("adm_s").over(w)).withColumn(
        "t", F.sum("corp_s").over(w)
    )
    return cs2.groupBy("dbatch", "q_lo", "q_hi", "floor_tok").agg(
        F.max("a").cast("long").alias("n_admitted"),
        F.sum("tok_s").cast("long").alias("admitted_tokens"),
        F.max("t").cast("long").alias("batch_docs"),
        F.sum(
            F.abs(
                F.col("adm_s") * F.col("t")
                - F.col("corp_s") * F.col("a")
            )
        )
        .cast("long")
        .alias("bias_num"),
    )


# the per-batch skyline + fully tie-broken pick, shared SQL suffix
_CALB_FRONTIER = (
    _CALB_CTE
    + """, dom AS (
  SELECT c.*,
         min(bias_num) OVER (PARTITION BY dbatch ORDER BY
           admitted_tokens
           RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS minb_higher,
         min(bias_num) OVER (PARTITION BY dbatch, admitted_tokens)
           AS minb_same
  FROM cmetrics c
), flags AS (
  SELECT dbatch, q_lo, q_hi, floor_tok, admitted_tokens, bias_num,
         CAST(CASE WHEN coalesce(minb_higher <= bias_num, FALSE)
                        OR bias_num > minb_same
                   THEN 1 ELSE 0 END AS BIGINT) AS dominated
  FROM dom
), picks AS (
  SELECT dbatch, q_lo, q_hi, floor_tok, admitted_tokens, bias_num
  FROM (
    SELECT f.*, row_number() OVER (PARTITION BY dbatch ORDER BY
             admitted_tokens DESC, bias_num, q_lo, floor_tok) AS rn
    FROM flags f WHERE dominated = 0
  ) WHERE rn = 1
)"""
)


def _cal_flags(spark, sf_dir):
    cm = _cal_metrics_by_batch(spark, sf_dir)
    w_higher = (
        Window.partitionBy("dbatch")
        .orderBy("admitted_tokens")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_same = Window.partitionBy("dbatch", "admitted_tokens")
    dom = cm.withColumn(
        "minb_higher", F.min("bias_num").over(w_higher)
    ).withColumn("minb_same", F.min("bias_num").over(w_same))
    dominated = (
        F.coalesce(
            F.col("minb_higher") <= F.col("bias_num"), F.lit(False)
        )
        | (F.col("bias_num") > F.col("minb_same"))
    ).cast("long")
    return dom.select(
        "dbatch",
        "q_lo",
        "q_hi",
        "floor_tok",
        "admitted_tokens",
        "bias_num",
        dominated.alias("dominated"),
    )


def _cal_picks(spark, sf_dir):
    flags = _cal_flags(spark, sf_dir)
    w = Window.partitionBy("dbatch").orderBy(
        F.desc("admitted_tokens"),
        F.asc("bias_num"),
        F.asc("q_lo"),
        F.asc("floor_tok"),
    )
    return (
        flags.filter(F.col("dominated") == 0)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dbatch",
            "q_lo",
            "q_hi",
            "floor_tok",
            "admitted_tokens",
            "bias_num",
        )
    )


_CALM_ORACLE = (
    _CALB_CTE
    + """
SELECT dbatch, q_lo, q_hi, floor_tok, n_admitted, admitted_tokens,
       batch_docs, bias_num
FROM cmetrics"""
)


@stage(
    "cal_cell_metrics_by_batch_documents",
    _CALM_ORACLE,
    "calibration x drift: the raw LOOP TELEMETRY — per (arrival "
    "batch, grid cell): admitted docs/tokens and the within-batch "
    "exact cross-multiplied source bias (the r18 bias form with the "
    "batch axis kept). Every downstream row of this theme derives "
    "from this table. Shape: one admission pass, the constant 12x "
    "grid explode, a two-level (batch, cell, source)-keyed "
    "aggregate — 60 output rows at any corpus size.",
)
def cal_cell_metrics_by_batch_documents(spark, sf_dir):
    return _cal_metrics_by_batch(spark, sf_dir)


_CALF_ORACLE = (
    _CALB_FRONTIER
    + """
SELECT dbatch, q_lo, q_hi, floor_tok, admitted_tokens, bias_num,
       dominated,
       CAST(1 - dominated AS BIGINT) AS on_frontier
FROM flags"""
)


@stage(
    "cal_frontier_by_batch_documents",
    _CALF_ORACLE,
    "calibration x drift: the PER-BATCH pareto frontier — the r18 "
    "two-window integer skyline partitioned by arrival batch: which "
    "(band, floor) cells are undominated on (tokens up, bias down) "
    "WITHIN each delivery. Frontier membership moving across batches "
    "is the first sign the calibration no longer fits the input. "
    "Shape: two metadata windows over the 60-row metrics table.",
)
def cal_frontier_by_batch_documents(spark, sf_dir):
    flags = _cal_flags(spark, sf_dir)
    return flags.select(
        "*", (1 - F.col("dominated")).cast("long").alias("on_frontier")
    )


_CALP_ORACLE = (
    _CALB_FRONTIER
    + """
SELECT dbatch, q_lo, q_hi, floor_tok, admitted_tokens, bias_num
FROM picks"""
)


@stage(
    "cal_pick_by_batch_documents",
    _CALP_ORACLE,
    "calibration x drift: THE PICK per delivery — the rank-1 "
    "frontier cell per batch under the deterministic order (tokens "
    "DESC, bias ASC, q_lo ASC, floor ASC): the cell a per-delivery "
    "auto-calibrator would choose. Fully tie-broken so both engines "
    "pick the same cell bit-for-bit. Shape: one row_number window "
    "over the per-batch frontier rows.",
)
def cal_pick_by_batch_documents(spark, sf_dir):
    return _cal_picks(spark, sf_dir)


_CALC_ORACLE = (
    _CALB_FRONTIER
    + """
SELECT dbatch, q_lo, q_hi, floor_tok,
       lag(q_lo) OVER (ORDER BY dbatch) AS prev_q_lo,
       lag(q_hi) OVER (ORDER BY dbatch) AS prev_q_hi,
       lag(floor_tok) OVER (ORDER BY dbatch) AS prev_floor_tok,
       CAST(CASE WHEN lag(q_lo) OVER (ORDER BY dbatch) IS NULL THEN 0
                 WHEN q_lo = lag(q_lo) OVER (ORDER BY dbatch)
                  AND q_hi = lag(q_hi) OVER (ORDER BY dbatch)
                  AND floor_tok = lag(floor_tok) OVER (ORDER BY dbatch)
                 THEN 0 ELSE 1 END AS BIGINT) AS pick_moved
FROM picks"""
)


@stage(
    "cal_pick_churn_documents",
    _CALC_ORACLE,
    "calibration x drift: PICK CHURN — per delivery: this batch's "
    "pick, the previous delivery's pick (lagged cell keys), and the "
    "moved flag (batch 0 defines the reference and counts as not "
    "moved). A moving pick IS the re-calibration signal; a stable "
    "pick under drifting input means the frontier is robust where it "
    "matters. Shape: three lag windows over the 5-row pick table.",
)
def cal_pick_churn_documents(spark, sf_dir):
    picks = _cal_picks(spark, sf_dir).select(
        "dbatch", "q_lo", "q_hi", "floor_tok"
    )
    w = Window.orderBy("dbatch")
    lagged = (
        picks.withColumn("prev_q_lo", F.lag("q_lo").over(w))
        .withColumn("prev_q_hi", F.lag("q_hi").over(w))
        .withColumn("prev_floor_tok", F.lag("floor_tok").over(w))
    )
    moved = (
        F.when(F.col("prev_q_lo").isNull(), F.lit(0))
        .when(
            (F.col("q_lo") == F.col("prev_q_lo"))
            & (F.col("q_hi") == F.col("prev_q_hi"))
            & (F.col("floor_tok") == F.col("prev_floor_tok")),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .cast("long")
    )
    return lagged.select(
        "dbatch",
        "q_lo",
        "q_hi",
        "floor_tok",
        "prev_q_lo",
        "prev_q_hi",
        "prev_floor_tok",
        moved.alias("pick_moved"),
    )


_CALFC_ORACLE = (
    _CALB_FRONTIER
    + """, hist AS (
  SELECT q_lo, q_hi, floor_tok, dbatch,
         CAST(1 - dominated AS BIGINT) AS onf,
         lag(CAST(1 - dominated AS BIGINT)) OVER (
           PARTITION BY q_lo, q_hi, floor_tok ORDER BY dbatch)
           AS prev_onf
  FROM flags
)
SELECT dbatch,
       CAST(sum(onf) AS BIGINT) AS frontier_size,
       CAST(sum(CASE WHEN onf = 1 AND coalesce(prev_onf, 0) = 0
                      AND prev_onf IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_entered,
       CAST(sum(CASE WHEN onf = 0 AND coalesce(prev_onf, 0) = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_left
FROM hist GROUP BY 1"""
)


@stage(
    "cal_frontier_churn_documents",
    _CALFC_ORACLE,
    "calibration x drift: FRONTIER CHURN — per delivery: frontier "
    "size plus the cells that entered and left vs the previous "
    "delivery (batch 0 has no churn by definition — entries require "
    "a previous observation). High churn with a stable pick means "
    "the frontier's tail is noisy; churn AT the top is the alarm. "
    "Shape: one lag window per cell history (12 series of 5), one "
    "5-row rollup.",
)
def cal_frontier_churn_documents(spark, sf_dir):
    flags = _cal_flags(spark, sf_dir)
    w = Window.partitionBy("q_lo", "q_hi", "floor_tok").orderBy(
        "dbatch"
    )
    hist = flags.select(
        "dbatch",
        "q_lo",
        "q_hi",
        "floor_tok",
        (1 - F.col("dominated")).cast("long").alias("onf"),
    ).withColumn("prev_onf", F.lag("onf").over(w))
    return hist.groupBy("dbatch").agg(
        F.sum("onf").cast("long").alias("frontier_size"),
        F.sum(
            (
                (F.col("onf") == 1)
                & F.col("prev_onf").isNotNull()
                & (F.coalesce(F.col("prev_onf"), F.lit(0)) == 0)
            ).cast("long")
        )
        .cast("long")
        .alias("n_entered"),
        F.sum(
            (
                (F.col("onf") == 0)
                & (F.coalesce(F.col("prev_onf"), F.lit(0)) == 1)
            ).cast("long")
        )
        .cast("long")
        .alias("n_left"),
    )


_CALA_ORACLE = (
    _CALB_FRONTIER
    + f""", prod AS (
  SELECT dbatch, n_admitted, admitted_tokens, batch_docs, bias_num
  FROM cmetrics
  WHERE q_lo = {_Q_LO} AND q_hi = {_Q_HI}
    AND floor_tok = {_QUALITY_FLOOR}
), ref AS (
  SELECT p.*,
         first_value(bias_num) OVER (ORDER BY dbatch) AS bias_ref,
         first_value(n_admitted) OVER (ORDER BY dbatch) AS a_ref,
         first_value(batch_docs) OVER (ORDER BY dbatch) AS t_ref
  FROM prod p
), pk AS (
  SELECT dbatch,
         CAST(CASE WHEN lag(q_lo) OVER (ORDER BY dbatch) IS NULL
                   THEN 0
                   WHEN q_lo = lag(q_lo) OVER (ORDER BY dbatch)
                    AND q_hi = lag(q_hi) OVER (ORDER BY dbatch)
                    AND floor_tok =
                        lag(floor_tok) OVER (ORDER BY dbatch)
                   THEN 0 ELSE 1 END AS BIGINT) AS pick_moved
  FROM picks
)
SELECT r.dbatch, r.bias_num, r.n_admitted, r.batch_docs,
       CAST(r.bias_ref AS BIGINT) AS bias_ref,
       CAST(CASE WHEN 4 * r.bias_num * (r.a_ref * r.t_ref)
                      > 5 * r.bias_ref
                          * (r.n_admitted * r.batch_docs)
                 THEN 1 ELSE 0 END AS BIGINT) AS bias_alarm,
       pk.pick_moved,
       CAST(CASE WHEN pk.pick_moved = 1
                      OR 4 * r.bias_num * (r.a_ref * r.t_ref)
                         > 5 * r.bias_ref
                             * (r.n_admitted * r.batch_docs)
                 THEN 1 ELSE 0 END AS BIGINT) AS recalibrate
FROM ref r JOIN pk ON pk.dbatch = r.dbatch"""
)


@stage(
    "cal_recalibration_alarm_documents",
    _CALA_ORACLE,
    "calibration x drift: the RE-CALIBRATION ALARM — per delivery: "
    "the PRODUCTION cell's within-batch bias vs its batch-0 "
    "reference, compared as the exact cross-multiplied >25% growth "
    "test 4*bias_b*(a0*t0) > 5*bias_0*(a_b*t_b) (normalized bias "
    "shares compared without a single division — both sides exact "
    "int64), OR-ed with pick movement. Fires on batch 0 only if the "
    "pick is degenerate (it cannot be — reference equals itself). "
    "Shape: window arithmetic over two 5-row tables.",
)
def cal_recalibration_alarm_documents(spark, sf_dir):
    cm = _cal_metrics_by_batch(spark, sf_dir)
    prod = cm.filter(
        (F.col("q_lo") == _Q_LO)
        & (F.col("q_hi") == _Q_HI)
        & (F.col("floor_tok") == _QUALITY_FLOOR)
    ).select("dbatch", "n_admitted", "admitted_tokens", "batch_docs",
             "bias_num")
    w = Window.orderBy("dbatch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = (
        prod.withColumn("bias_ref", F.first("bias_num").over(w))
        .withColumn("a_ref", F.first("n_admitted").over(w))
        .withColumn("t_ref", F.first("batch_docs").over(w))
    )
    picks = _cal_picks(spark, sf_dir).select(
        "dbatch", "q_lo", "q_hi", "floor_tok"
    )
    wp = Window.orderBy("dbatch")
    pk = picks.select(
        "dbatch",
        F.when(F.lag("q_lo").over(wp).isNull(), F.lit(0))
        .when(
            (F.col("q_lo") == F.lag("q_lo").over(wp))
            & (F.col("q_hi") == F.lag("q_hi").over(wp))
            & (F.col("floor_tok") == F.lag("floor_tok").over(wp)),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("pick_moved"),
    )
    grown = (
        F.lit(4) * F.col("bias_num") * (F.col("a_ref") * F.col("t_ref"))
        > F.lit(5)
        * F.col("bias_ref")
        * (F.col("n_admitted") * F.col("batch_docs"))
    )
    return ref.join(pk, "dbatch").select(
        "dbatch",
        "bias_num",
        "n_admitted",
        "batch_docs",
        F.col("bias_ref").cast("long").alias("bias_ref"),
        grown.cast("long").alias("bias_alarm"),
        "pick_moved",
        (grown | (F.col("pick_moved") == 1))
        .cast("long")
        .alias("recalibrate"),
    )


_CALS_ORACLE = (
    _CALB_FRONTIER
    + """, stale AS (
  SELECT q_lo, q_hi, floor_tok FROM picks WHERE dbatch = 0
), own AS (
  SELECT dbatch, admitted_tokens AS tokens_own, bias_num AS bias_own
  FROM picks
), st AS (
  SELECT c.dbatch, c.admitted_tokens AS tokens_stale,
         c.bias_num AS bias_stale
  FROM cmetrics c
  JOIN stale s ON s.q_lo = c.q_lo AND s.q_hi = c.q_hi
              AND s.floor_tok = c.floor_tok
)
SELECT o.dbatch, o.tokens_own, st.tokens_stale,
       CAST(o.tokens_own - st.tokens_stale AS BIGINT) AS lost_tokens,
       o.bias_own, st.bias_stale
FROM own o JOIN st ON st.dbatch = o.dbatch"""
)


@stage(
    "cal_stale_pick_cost_documents",
    _CALS_ORACLE,
    "calibration x drift: the STALE-CALIBRATION BILL — per delivery: "
    "admitted tokens under the batch-optimal pick vs under the "
    "FROZEN batch-0 pick, and both cells' bias. lost_tokens >= 0 by "
    "construction (the max-token cell is always on the frontier, so "
    "the per-batch pick admits at least as much as any fixed cell) — "
    "the exact price of not re-calibrating, the number the alarm "
    "row's threshold should be tuned against. Shape: the 5-row pick "
    "table joined to the 60-row metrics table on cell keys.",
)
def cal_stale_pick_cost_documents(spark, sf_dir):
    cm = _cal_metrics_by_batch(spark, sf_dir)
    picks = _cal_picks(spark, sf_dir)
    stale = (
        picks.filter(F.col("dbatch") == 0)
        .select("q_lo", "q_hi", "floor_tok")
    )
    st = cm.join(
        F.broadcast(stale), ["q_lo", "q_hi", "floor_tok"]
    ).select(
        "dbatch",
        F.col("admitted_tokens").alias("tokens_stale"),
        F.col("bias_num").alias("bias_stale"),
    )
    own = picks.select(
        "dbatch",
        F.col("admitted_tokens").alias("tokens_own"),
        F.col("bias_num").alias("bias_own"),
    )
    return own.join(st, "dbatch").select(
        "dbatch",
        "tokens_own",
        "tokens_stale",
        (F.col("tokens_own") - F.col("tokens_stale"))
        .cast("long")
        .alias("lost_tokens"),
        "bias_own",
        "bias_stale",
    )


# =====================================================================
# B. LSH-index lifecycle costing
# =====================================================================

# the r16 bucket-batch frame (md5-minhash band buckets keyed by the
# r15 arrival batches) is the ONE substrate; this theme prices its
# growth. r16 owns admission/staleness/probe-cost; this cohort owns
# the build/maintain bills.
from .queries_staging_r16 import _LSHB_CTE, _bucket_batches

_COMPACT_KS = [2, 3, 5]  # compact-every-k policy sweep
_EVO_COMMIT = 2  # index-schema evolution takes effect at this commit
_REINDEX_WAVES = 4  # bounded-wave re-index plan targets ~4 waves

_LSHC_CTE = (
    _LSHB_CTE
    + """, growth AS (
  SELECT CAST(dbatch AS BIGINT) AS commit_id,
         CAST(count(*) AS BIGINT) AS append_rows
  FROM bb GROUP BY 1
), cumg AS (
  SELECT commit_id, append_rows,
         CAST(sum(append_rows) OVER (ORDER BY commit_id) AS BIGINT)
           AS index_rows
  FROM growth
)"""
)


def _growth_frame(spark, sf_dir):
    """(commit_id, append_rows, index_rows) — the Spark mirror of
    _LSHC_CTE's ``cumg``: per-commit appended bucket rows and the
    cumulative index size. One bucket-frame aggregate to 5 rows, one
    metadata running sum."""
    bb = _bucket_batches(spark, sf_dir)
    growth = bb.groupBy(
        F.col("dbatch").cast("long").alias("commit_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("append_rows"))
    w = Window.orderBy("commit_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return growth.withColumn(
        "index_rows", F.sum("append_rows").over(w).cast("long")
    )


_LCB_ORACLE = (
    _LSHC_CTE
    + """
SELECT commit_id, append_rows, index_rows,
       CAST(sum(index_rows) OVER (ORDER BY commit_id) AS BIGINT)
         AS cum_rebuild_writes,
       round(CAST(sum(index_rows) OVER (ORDER BY commit_id) AS DOUBLE)
             / index_rows, 9) AS write_amplification
FROM cumg"""
)


@stage(
    "lsh_carry_vs_rebuild_bill_documents",
    _LCB_ORACLE,
    "LSH lifecycle: the CARRY-VS-REBUILD WRITE BILL — per commit: "
    "rows appended by carrying the index forward, the index size "
    "(which is also the one-shot rebuild bill at that commit), the "
    "cumulative writes a rebuild-EVERY-commit policy would have paid, "
    "and its write amplification over carrying. Carrying always "
    "writes each row once; rebuilding rewrites history every commit — "
    "this row is the exact price of that simplicity. Shape: one "
    "bucket-frame aggregate to 5 rows, two metadata running sums.",
)
def lsh_carry_vs_rebuild_bill_documents(spark, sf_dir):
    g = _growth_frame(spark, sf_dir)
    w = Window.orderBy("commit_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return g.withColumn(
        "cum_rebuild_writes", F.sum("index_rows").over(w).cast("long")
    ).select(
        "commit_id",
        "append_rows",
        "index_rows",
        "cum_rebuild_writes",
        F.round(
            F.col("cum_rebuild_writes").cast("double")
            / F.col("index_rows"),
            9,
        ).alias("write_amplification"),
    )


_LCP_ORACLE = (
    _LSHC_CTE
    + f""", swept AS (
  SELECT c.*, unnest([{", ".join(str(k) for k in _COMPACT_KS)}]) AS k
  FROM cumg c
)
SELECT commit_id, CAST(k AS BIGINT) AS k,
       CAST((commit_id % k) + 1 AS BIGINT) AS fragments,
       CAST(append_rows * ((commit_id % k) + 1) AS BIGINT)
         AS probe_cost_rows,
       CAST(CASE WHEN commit_id > 0 AND commit_id % k = 0
                 THEN index_rows ELSE 0 END AS BIGINT)
         AS compact_rows
FROM swept"""
)


@stage(
    "lsh_compaction_policy_sweep_documents",
    _LCP_ORACLE,
    "LSH lifecycle: the COMPACT-EVERY-k POLICY SWEEP — per (commit, "
    "k in {2,3,5}): live index fragments under the policy "
    "((commit mod k) + 1 — compaction resets the count), the probe "
    "amplification the delivery pays (its bucket rows probe every "
    "fragment), and the compaction rows rewritten when the policy "
    "fires. The state-ledger compaction question (dce compact's "
    "cadence) asked of the dedup index, answered in exact rows. "
    "Shape: the 5-row growth table x a 3-literal map-side explode.",
)
def lsh_compaction_policy_sweep_documents(spark, sf_dir):
    g = _growth_frame(spark, sf_dir)
    swept = g.select(
        "*",
        F.explode(
            F.array(*[F.lit(k).cast("long") for k in _COMPACT_KS])
        ).alias("k"),
    )
    frags = (F.col("commit_id") % F.col("k") + 1).cast("long")
    return swept.select(
        "commit_id",
        "k",
        frags.alias("fragments"),
        (F.col("append_rows") * frags)
        .cast("long")
        .alias("probe_cost_rows"),
        F.when(
            (F.col("commit_id") > 0)
            & (F.col("commit_id") % F.col("k") == 0),
            F.col("index_rows"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("compact_rows"),
    )


_LCT_ORACLE = (
    _LSHC_CTE
    + f""", swept AS (
  SELECT c.*, unnest([{", ".join(str(k) for k in _COMPACT_KS)}]) AS k
  FROM cumg c
), priced AS (
  SELECT commit_id, k,
         append_rows * ((commit_id % k) + 1) AS probe_cost,
         CASE WHEN commit_id > 0 AND commit_id % k = 0
              THEN index_rows ELSE 0 END AS compact_rows
  FROM swept
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(sum(probe_cost) AS BIGINT) AS total_probe_cost_rows,
       CAST(sum(compact_rows) AS BIGINT) AS total_compact_rows,
       CAST(sum(probe_cost) + sum(compact_rows) AS BIGINT)
         AS total_cost_rows,
       CAST(max(({_DNB - 1} % k) + 1) AS BIGINT) AS final_fragments
FROM priced GROUP BY 1"""
)


@stage(
    "lsh_compaction_policy_totals_documents",
    _LCT_ORACLE,
    "LSH lifecycle: the POLICY DECISION ROLLUP — per compact-every-k "
    "policy: total probe amplification paid, total compaction rows "
    "rewritten, the combined bill, and the fragment count left at "
    "the horizon. Small k buys cheap probes with frequent rewrites; "
    "large k the reverse — this 3-row table is where the knee is "
    "read off. Shape: the policy sweep rolled up to one row per k.",
)
def lsh_compaction_policy_totals_documents(spark, sf_dir):
    sweep = lsh_compaction_policy_sweep_documents(spark, sf_dir)
    return sweep.groupBy("k").agg(
        F.sum("probe_cost_rows").cast("long").alias(
            "total_probe_cost_rows"
        ),
        F.sum("compact_rows").cast("long").alias("total_compact_rows"),
        (F.sum("probe_cost_rows") + F.sum("compact_rows"))
        .cast("long")
        .alias("total_cost_rows"),
        F.max(
            (F.lit(_DNB - 1) % F.col("k") + 1).cast("long")
        ).alias("final_fragments"),
    )


_LSB_ORACLE = (
    _ADM_CTE
    + """, per AS (
  SELECT dbatch AS commit_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN ntok >= 3 THEN ntok - 2 ELSE 0 END)
              AS BIGINT) AS shingles_incremental
  FROM gb GROUP BY 1
)
SELECT commit_id, n_docs, shingles_incremental,
       CAST(sum(shingles_incremental) OVER (ORDER BY commit_id)
            AS BIGINT) AS shingles_rebuild
FROM per"""
)


@stage(
    "lsh_signature_bill_documents",
    _LSB_ORACLE,
    "LSH lifecycle: the SIGNATURE-COMPUTATION BILL — per commit: "
    "docs delivered and the exact word-3-gram shingle count "
    "(greatest(0, ntok - 2), the _band_buckets shingle convention) "
    "the signer must hash. Carrying signs each delivery once; a "
    "rebuild re-signs the whole corpus — the cumulative column is "
    "that bill. This is the CPU side of carry-vs-rebuild (the write "
    "side is the bucket-row bill). Shape: one admission-frame "
    "aggregate to 5 rows, one running sum.",
)
def lsh_signature_bill_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    per = g.groupBy(F.col("dbatch").alias("commit_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("ntok") >= 3, F.col("ntok") - 2).otherwise(0)
        )
        .cast("long")
        .alias("shingles_incremental"),
    )
    w = Window.orderBy("commit_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.withColumn(
        "shingles_rebuild",
        F.sum("shingles_incremental").over(w).cast("long"),
    )


_LGF_ORACLE = (
    _LSHC_CTE
    + f""", snap AS (
  SELECT g.commit_id, g.append_rows,
         unnest(range(g.commit_id, {_DNB})) AS s
  FROM growth g
)
SELECT CAST(s AS BIGINT) AS snapshot,
       CAST(sum(CASE WHEN commit_id < {_EVO_COMMIT}
                     THEN append_rows ELSE 0 END) AS BIGINT)
         AS old_schema_rows,
       CAST(sum(CASE WHEN commit_id >= {_EVO_COMMIT}
                     THEN append_rows ELSE 0 END) AS BIGINT)
         AS new_schema_rows,
       CAST(CASE WHEN s >= {_EVO_COMMIT}
                  AND sum(CASE WHEN commit_id < {_EVO_COMMIT}
                               THEN append_rows ELSE 0 END) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS dual_probe
FROM snap GROUP BY s"""
)


@stage(
    "lsh_reindex_grandfather_documents",
    _LGF_ORACLE,
    "LSH lifecycle: SCHEMA EVOLUTION with grandfathered vintages — "
    "the index hashing changes at a literal commit (the r17 "
    "evolution-economics protocol applied to the index): per "
    "snapshot, bucket rows still living under the OLD schema vs the "
    "NEW, and the dual-probe window (every admission must probe both "
    "tables while old rows remain). The quantity the re-index wave "
    "plan below drains to zero. Shape: the 5-row growth table, "
    "map-side sequence expansion to snapshots (the r14 convention — "
    "an equi-groupable explode, never a range join), one aggregate.",
)
def lsh_reindex_grandfather_documents(spark, sf_dir):
    g = _growth_frame(spark, sf_dir)
    snap = g.select(
        "commit_id",
        "append_rows",
        F.explode(
            F.sequence(
                F.col("commit_id"), F.lit(_DNB - 1).cast("long")
            )
        ).alias("snapshot"),
    )
    old_rows = F.sum(
        F.when(
            F.col("commit_id") < _EVO_COMMIT, F.col("append_rows")
        ).otherwise(0)
    ).cast("long")
    new_rows = F.sum(
        F.when(
            F.col("commit_id") >= _EVO_COMMIT, F.col("append_rows")
        ).otherwise(0)
    ).cast("long")
    return snap.groupBy("snapshot").agg(
        old_rows.alias("old_schema_rows"),
        new_rows.alias("new_schema_rows"),
        (
            (F.max("snapshot") >= _EVO_COMMIT)
            & (old_rows > 0)
        )
        .cast("long")
        .alias("dual_probe"),
    )


_LWP_ORACLE = (
    _LSHB_CTE
    + f""", old_units AS (
  SELECT CAST(dbatch AS BIGINT) AS vintage, band,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM bb WHERE dbatch < {_EVO_COMMIT}
  GROUP BY 1, 2
), tot AS (
  SELECT o.*, CAST(sum(n_rows) OVER () AS BIGINT) AS total_rows
  FROM old_units o
), ranked AS (
  SELECT t.*,
         CAST(sum(n_rows) OVER (ORDER BY n_rows DESC, band, vintage)
              AS BIGINT) AS cum_rows
  FROM tot t
)
SELECT vintage, band, n_rows, cum_rows,
       CAST((cum_rows - 1) // ((total_rows + {_REINDEX_WAVES - 1})
                               // {_REINDEX_WAVES}) AS BIGINT) AS wave
FROM ranked"""
)


@stage(
    "lsh_reindex_wave_plan_documents",
    _LWP_ORACLE,
    "LSH lifecycle: the BOUNDED-WAVE RE-INDEX PLAN — the "
    "grandfathered old-schema bucket rows split into (vintage, band) "
    "work units and drained largest-first in ~4 bounded waves (exact "
    "cumulative cuts at ceil(total/4) — the r17 migration-waves "
    "convention applied to the index). The ops schedule that ends "
    "the dual-probe window without one unbounded rewrite. Shape: one "
    "bucket-frame aggregate to 8 unit rows, two metadata windows, "
    "pure integer cuts.",
)
def lsh_reindex_wave_plan_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    units = (
        bb.filter(F.col("dbatch") < _EVO_COMMIT)
        .groupBy(
            F.col("dbatch").cast("long").alias("vintage"), "band"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    w_tot = Window.partitionBy()
    w_cum = Window.orderBy(
        F.desc("n_rows"), F.asc("band"), F.asc("vintage")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = units.withColumn(
        "total_rows", F.sum("n_rows").over(w_tot).cast("long")
    ).withColumn("cum_rows", F.sum("n_rows").over(w_cum).cast("long"))
    wave_size = F.expr(
        f"(total_rows + {_REINDEX_WAVES - 1}) div {_REINDEX_WAVES}"
    )
    return ranked.select(
        "vintage",
        "band",
        "n_rows",
        "cum_rows",
        ((F.col("cum_rows") - 1) / wave_size)
        .cast("long")
        .alias("wave"),
    )


# =====================================================================
# C. Portfolio x skew interaction
# =====================================================================

_SALT_FACTORS = [1, 2, 4, 8]  # the r17 placement_salt_planning ladder

# exact per-join-key skew profiles + the minimum taming salt factor:
# a key is "tamed" when the hottest key's rows, split f ways, fit
# within 2x the mean key load (exact integer comparison)
_SKEW_SQL = """skew AS (
  SELECT 'lineitem_orders' AS join_name,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_cnt
  FROM (SELECT l_orderkey AS kk, count(*) AS c
        FROM lineitem GROUP BY 1)
  UNION ALL
  SELECT 'orders_customer', CAST(sum(c) AS BIGINT),
         CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT)
  FROM (SELECT o_custkey AS kk, count(*) AS c
        FROM orders GROUP BY 1)
  UNION ALL
  SELECT 'lineitem_part', CAST(sum(c) AS BIGINT),
         CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT)
  FROM (SELECT l_partkey AS kk, count(*) AS c
        FROM lineitem GROUP BY 1)
), salted AS (
  SELECT s.join_name, s.n_rows, s.n_keys, s.max_cnt,
         CAST(s.n_rows // s.n_keys AS BIGINT) AS mean_rows,
         CAST(coalesce(
           min(CASE WHEN s.max_cnt
                         <= 2 * f.f * (s.n_rows // s.n_keys)
                    THEN f.f END), 8) AS BIGINT) AS salt_factor
  FROM skew s CROSS JOIN (SELECT unnest([1, 2, 4, 8]) AS f) f
  GROUP BY 1, 2, 3, 4, 5
)"""

# the skew-adjusted portfolio chain, appended to the naive r18 chain
# so both rankings are visible to one query
_ADJ_CTES = (
    _PORTFOLIO_CTES
    + ", "
    + _SKEW_SQL
    + """, jprice AS (
  SELECT j.join_name, CAST(pp.n + bp.n AS BIGINT) AS join_rows,
         CAST(greatest(0, pp.n + bp.n
                          - (st.salt_factor - 1) * bp.n) AS BIGINT)
           AS join_saved_adj
  FROM joins j
  JOIN counts pp ON pp.tbl = j.probe_table
  JOIN counts bp ON bp.tbl = j.build_table
  JOIN salted st ON st.join_name = j.join_name
), saved_adj AS (
  SELECT c.layout,
         CAST(sum(w.runs * p.join_saved_adj * c.colocated) AS BIGINT)
           AS daily_saved_adj
  FROM cover c
  JOIN wl w ON w.join_name = c.join_name
  JOIN jprice p ON p.join_name = c.join_name
  GROUP BY 1
), ranked_adj AS (
  SELECT s.layout, s.daily_saved_adj, b.build_rows,
         CAST((s.daily_saved_adj * 1000000) // b.build_rows AS BIGINT)
           AS adj_roi_key,
         CAST(row_number() OVER (
           ORDER BY (s.daily_saved_adj * 1000000) // b.build_rows
                    DESC, s.layout) AS BIGINT) AS adj_rnk
  FROM saved_adj s JOIN builds b ON b.layout = s.layout
), prefix_adj AS (
  SELECT r.*, cap.build_cap,
         CAST(sum(r.build_rows) OVER (ORDER BY r.adj_rnk) AS BIGINT)
           AS cum_build_rows
  FROM ranked_adj r CROSS JOIN cap
), portfolio_adj AS (
  SELECT *, CAST(CASE WHEN cum_build_rows <= build_cap THEN 1 ELSE 0
                 END AS BIGINT) AS picked
  FROM prefix_adj
)"""
)


def _local(spark, df):
    """Materialize a metadata-scale frame (a few dozen rows at most)
    to a LocalTableScan — the r17 placement pattern: without this,
    every downstream reference re-executes the whole
    one-row-aggregate/literal chain as separate tiny jobs, and the
    composed portfolio queries pay tens of seconds of pure scheduling
    overhead at ANY data size."""
    return spark.createDataFrame(df.collect(), df.schema)


def _skew_frame(spark, sf_dir):
    """Per workload join key: exact (rows, distinct keys, max key
    count). One groupBy per key — the skew-statistics job itself; at
    100 TB this is the once-per-layout-decision stats pass, not a
    per-query cost."""
    out = None
    for jname, key, probe, _build in _JOINS:
        t = load_table(spark, sf_dir, probe)
        cnts = t.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        agg = cnts.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_cnt"),
        ).select(F.lit(jname).alias("join_name"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out


def _salted_frame(spark, sf_dir):
    """The skew frame + the minimum salt factor in {1,2,4,8} that
    tames the hottest key (max_cnt <= 2 * f * mean), fallback 8."""
    s = _skew_frame(spark, sf_dir).withColumn(
        "mean_rows", F.expr("n_rows div n_keys").cast("long")
    )
    swept = s.select(
        "*",
        F.explode(
            F.array(*[F.lit(f).cast("long") for f in _SALT_FACTORS])
        ).alias("f"),
    )
    return _local(
        spark,
        swept.groupBy(
            "join_name", "n_rows", "n_keys", "max_cnt", "mean_rows"
        ).agg(
            F.coalesce(
                F.min(
                    F.when(
                        F.col("max_cnt")
                        <= 2 * F.col("f") * F.col("mean_rows"),
                        F.col("f"),
                    )
                ),
                F.lit(8),
            )
            .cast("long")
            .alias("salt_factor")
        ),
    )


def _jprice_frame(spark, sf_dir):
    counts = _wl_counts(spark, sf_dir)
    rows = [
        F.struct(
            F.lit(j).alias("join_name"),
            F.lit(p).alias("probe_table"),
            F.lit(b).alias("build_table"),
        )
        for j, _k, p, b in _JOINS
    ]
    joins = _lit_frame(counts, rows)
    priced = (
        joins.join(
            F.broadcast(
                counts.select(
                    F.col("tbl").alias("probe_table"),
                    F.col("n").alias("probe_rows"),
                )
            ),
            "probe_table",
        )
        .join(
            F.broadcast(
                counts.select(
                    F.col("tbl").alias("build_table"),
                    F.col("n").alias("build_rows_j"),
                )
            ),
            "build_table",
        )
    )
    st = _salted_frame(spark, sf_dir).select("join_name", "salt_factor")
    return _local(spark, priced.join(F.broadcast(st), "join_name").select(
        "join_name",
        (F.col("probe_rows") + F.col("build_rows_j"))
        .cast("long")
        .alias("join_rows"),
        F.greatest(
            F.lit(0).cast("long"),
            (
                F.col("probe_rows")
                + F.col("build_rows_j")
                - (F.col("salt_factor") - 1) * F.col("build_rows_j")
            ).cast("long"),
        )
        .cast("long")
        .alias("join_saved_adj"),
    ))


def _adj_portfolio_frame(spark, sf_dir, jprice=None):
    """The Spark mirror of _ADJ_CTES' ``portfolio_adj``: the r18
    budget-prefix greedy re-run on SKEW-ADJUSTED savings (each join
    priced at its required salt factor's net saving). Same cap, same
    tie-breaks. Callers that already materialized the 3-row jprice
    frame pass it in so the skew chain runs once per query."""
    counts = _wl_counts(spark, sf_dir)
    priced = _priced_workload(spark, sf_dir)
    cover = _cover_frame(spark, sf_dir, counts)
    if jprice is None:
        jprice = _jprice_frame(spark, sf_dir)
    saved = (
        cover.join(
            F.broadcast(
                priced.select("family", "join_name", "runs")
            ),
            "join_name",
        )
        .join(F.broadcast(jprice), "join_name")
        .groupBy("layout")
        .agg(
            F.sum(
                F.col("runs")
                * F.col("join_saved_adj")
                * F.col("colocated")
            )
            .cast("long")
            .alias("daily_saved_adj")
        )
    )
    brows = [
        F.struct(F.lit(lname).alias("layout"), F.lit(t).alias("tbl"))
        for lname, tabs in _LAYOUT_TABLES
        for t in tabs
    ]
    builds = (
        _lit_frame(counts, brows)
        .join(F.broadcast(counts), "tbl")
        .groupBy("layout")
        .agg(F.sum("n").cast("long").alias("build_rows"))
    )
    ranked = (
        saved.join(builds, "layout")
        .withColumn(
            "adj_roi_key",
            F.expr("daily_saved_adj * 1000000 div build_rows").cast(
                "long"
            ),
        )
        .withColumn(
            "adj_rnk",
            F.row_number()
            .over(
                Window.orderBy(F.desc("adj_roi_key"), F.asc("layout"))
            )
            .cast("long"),
        )
    )
    cap = counts.agg(F.sum("n").cast("long").alias("build_cap"))
    w = Window.orderBy("adj_rnk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return _local(
        spark,
        ranked.crossJoin(F.broadcast(cap))
        .withColumn(
            "cum_build_rows",
            F.sum("build_rows").over(w).cast("long"),
        )
        .withColumn(
            "picked",
            (F.col("cum_build_rows") <= F.col("build_cap"))
            .cast("long"),
        ),
    )


_SKP_ORACLE = (
    "WITH "
    + _SKEW_SQL
    + """
SELECT join_name, n_rows, n_keys, max_cnt, mean_rows,
       CAST(CASE WHEN max_cnt > 8 * mean_rows THEN 1 ELSE 0 END
            AS BIGINT) AS skew_alarm
FROM salted"""
)


@stage(
    "skew_key_profile_tpch",
    _SKP_ORACLE,
    "portfolio x skew: the PER-KEY SKEW PROFILE — for each workload "
    "join key: exact rows, distinct keys, the hottest key's count, "
    "the integer mean key load, and the r17 8x-mean alarm. The "
    "statistics row every salt/layout decision below consumes. "
    "Shape: one groupBy per key column (the skew-stats pass itself), "
    "rolled to 3 rows.",
)
def skew_key_profile_tpch(spark, sf_dir):
    s = _skew_frame(spark, sf_dir).withColumn(
        "mean_rows", F.expr("n_rows div n_keys").cast("long")
    )
    return s.select(
        "join_name",
        "n_rows",
        "n_keys",
        "max_cnt",
        "mean_rows",
        (F.col("max_cnt") > 8 * F.col("mean_rows"))
        .cast("long")
        .alias("skew_alarm"),
    )


_SSR_ORACLE = (
    "WITH "
    + _SKEW_SQL
    + """
SELECT join_name, max_cnt, mean_rows, salt_factor FROM salted"""
)


@stage(
    "skew_salt_requirement_tpch",
    _SSR_ORACLE,
    "portfolio x skew: the MINIMUM TAMING SALT — per join: the "
    "smallest factor in {1,2,4,8} under which the hottest key's "
    "rows, split f ways, fit within 2x the mean key load (exact "
    "integer test; fallback 8 when even the ladder's top cannot tame "
    "it). This is the factor the adjusted pricing charges each "
    "co-located join. Shape: the 3-row skew profile x a 4-literal "
    "map-side explode, one conditional-min aggregate.",
)
def skew_salt_requirement_tpch(spark, sf_dir):
    return _salted_frame(spark, sf_dir).select(
        "join_name", "max_cnt", "mean_rows", "salt_factor"
    )


_SJP_ORACLE = (
    _WL_CTES
    + """, f AS (
  SELECT unnest([1, 2, 4, 8]) AS f
), jp AS (
  SELECT j.join_name, CAST(pp.n AS BIGINT) AS probe_rows,
         CAST(bp.n AS BIGINT) AS build_rows
  FROM joins j
  JOIN counts pp ON pp.tbl = j.probe_table
  JOIN counts bp ON bp.tbl = j.build_table
)
SELECT jp.join_name, CAST(f.f AS BIGINT) AS salt_factor,
       CAST(greatest(0, jp.probe_rows + jp.build_rows
                        - (f.f - 1) * jp.build_rows) AS BIGINT)
         AS saved_per_run,
       CAST((f.f - 1) * jp.build_rows AS BIGINT) AS overhead_per_run
FROM jp CROSS JOIN f"""
)


@stage(
    "portfolio_salted_join_price_tpch",
    _SJP_ORACLE,
    "portfolio x skew: the SALTED-JOIN PRICE LIST — per (workload "
    "join, salt factor): the net rows a co-located bucket layout "
    "still saves per run once the build side must be replicated "
    "salt-factor ways (greatest(0, probe + build - (f-1)*build) — "
    "the r13 clamp convention), and the replication overhead itself. "
    "Salting rescues the straggler but taxes the layout; this table "
    "is the tax schedule. Shape: 1-row counts x a 12-cell literal "
    "grid.",
)
def portfolio_salted_join_price_tpch(spark, sf_dir):
    counts = _wl_counts(spark, sf_dir)
    rows = [
        F.struct(
            F.lit(j).alias("join_name"),
            F.lit(p).alias("probe_table"),
            F.lit(b).alias("build_table"),
        )
        for j, _k, p, b in _JOINS
    ]
    jp = (
        _lit_frame(counts, rows)
        .join(
            F.broadcast(
                counts.select(
                    F.col("tbl").alias("probe_table"),
                    F.col("n").alias("probe_rows"),
                )
            ),
            "probe_table",
        )
        .join(
            F.broadcast(
                counts.select(
                    F.col("tbl").alias("build_table"),
                    F.col("n").alias("build_rows"),
                )
            ),
            "build_table",
        )
    )
    swept = jp.select(
        "join_name",
        "probe_rows",
        "build_rows",
        F.explode(
            F.array(*[F.lit(f).cast("long") for f in _SALT_FACTORS])
        ).alias("salt_factor"),
    )
    return swept.select(
        "join_name",
        "salt_factor",
        F.greatest(
            F.lit(0).cast("long"),
            (
                F.col("probe_rows")
                + F.col("build_rows")
                - (F.col("salt_factor") - 1) * F.col("build_rows")
            ).cast("long"),
        )
        .cast("long")
        .alias("saved_per_run"),
        ((F.col("salt_factor") - 1) * F.col("build_rows"))
        .cast("long")
        .alias("overhead_per_run"),
    )


_SAR_ORACLE = (
    _ADJ_CTES
    + """
SELECT a.layout, a.daily_saved_adj, a.build_rows, a.adj_roi_key,
       a.adj_rnk, r.rnk AS naive_rnk,
       CAST(a.adj_rnk - r.rnk AS BIGINT) AS rank_delta
FROM ranked_adj a JOIN ranked r ON r.layout = a.layout"""
)


@stage(
    "portfolio_skew_adjusted_roi_tpch",
    _SAR_ORACLE,
    "portfolio x skew: the SKEW-ADJUSTED ROI RE-RANK — per layout: "
    "daily savings with every covered join priced at its required "
    "salt's net saving, the adjusted exact ROI key, the adjusted "
    "rank, the naive r18 rank, and the rank delta. A layout whose "
    "value rides one skewed join falls down this table — the "
    "feedback the naive ranking cannot see. Shape: <= 5-row "
    "arithmetic over the two portfolio chains.",
)
def portfolio_skew_adjusted_roi_tpch(spark, sf_dir):
    adj = _adj_portfolio_frame(spark, sf_dir)
    naive = _local(
        spark,
        _portfolio_frame(spark, sf_dir).select(
            "layout", F.col("rnk").alias("naive_rnk")
        ),
    )
    return adj.join(F.broadcast(naive), "layout").select(
        "layout",
        "daily_saved_adj",
        "build_rows",
        "adj_roi_key",
        "adj_rnk",
        "naive_rnk",
        (F.col("adj_rnk") - F.col("naive_rnk"))
        .cast("long")
        .alias("rank_delta"),
    )


_SAP_ORACLE = (
    _ADJ_CTES
    + """
SELECT a.adj_rnk, a.layout, a.daily_saved_adj, a.build_rows,
       a.cum_build_rows, a.build_cap, a.picked,
       p.picked AS picked_naive,
       CAST(CASE WHEN a.picked <> p.picked THEN 1 ELSE 0 END
            AS BIGINT) AS pick_changed
FROM portfolio_adj a JOIN portfolio p ON p.layout = a.layout"""
)


@stage(
    "portfolio_skew_adjusted_prefix_tpch",
    _SAP_ORACLE,
    "portfolio x skew: the greedy PREFIX RE-RUN on adjusted ROI — "
    "same cap, same tie-breaks, adjusted ranking order — with each "
    "layout's naive picked flag and the changed-pick indicator. When "
    "a pick changes here, the skew statistics just overturned a "
    "storage decision — the loop this theme exists to close. Shape: "
    "<= 5-row windows over both chains.",
)
def portfolio_skew_adjusted_prefix_tpch(spark, sf_dir):
    adj = _adj_portfolio_frame(spark, sf_dir)
    naive = _local(
        spark,
        _portfolio_frame(spark, sf_dir).select(
            "layout", F.col("picked").alias("picked_naive")
        ),
    )
    return adj.join(F.broadcast(naive), "layout").select(
        "adj_rnk",
        "layout",
        "daily_saved_adj",
        "build_rows",
        "cum_build_rows",
        "build_cap",
        "picked",
        "picked_naive",
        (F.col("picked") != F.col("picked_naive"))
        .cast("long")
        .alias("pick_changed"),
    )


_SHK_ORACLE = """WITH hk AS (
  SELECT 'lineitem_orders' AS join_name,
         CAST(l_orderkey AS BIGINT) AS key_value,
         CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 2
  UNION ALL
  SELECT 'orders_customer', CAST(o_custkey AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM orders GROUP BY 2
  UNION ALL
  SELECT 'lineitem_part', CAST(l_partkey AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem GROUP BY 2
), tot AS (
  SELECT join_name, CAST(sum(cnt) AS BIGINT) AS n_rows
  FROM hk GROUP BY 1
), ranked AS (
  SELECT hk.*, row_number() OVER (PARTITION BY join_name
           ORDER BY cnt DESC, key_value) AS rnk
  FROM hk
)
SELECT r.join_name, r.key_value, r.cnt,
       CAST(r.rnk AS BIGINT) AS rnk,
       round(CAST(r.cnt AS DOUBLE) / t.n_rows, 9) AS row_share
FROM ranked r JOIN tot t ON t.join_name = r.join_name
WHERE r.rnk <= 5"""


@stage(
    "skew_hot_keys_tpch",
    _SHK_ORACLE,
    "portfolio x skew: the TOP-5 HOT KEYS per workload join — the "
    "specific key values the salt plan exists to split, with exact "
    "counts and row shares. A skew alarm names a column; this row "
    "names the culprits (and whether heat is one key or a tier). "
    "Shape: the per-key count frames, one top-k window per join "
    "partition (bounded k=5 — per-partition partial top-k + merge "
    "at scale), a 3-row totals join.",
)
def skew_hot_keys_tpch(spark, sf_dir):
    out = None
    for jname, key, probe, _build in _JOINS:
        t = load_table(spark, sf_dir, probe)
        cnts = t.groupBy(key).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        ).select(
            F.lit(jname).alias("join_name"),
            F.col(key).cast("long").alias("key_value"),
            "cnt",
        )
        out = cnts if out is None else out.unionByName(cnts)
    w = Window.partitionBy("join_name").orderBy(
        F.desc("cnt"), F.asc("key_value")
    )
    ranked = out.withColumn("rnk", F.row_number().over(w).cast("long"))
    tot = out.groupBy("join_name").agg(
        F.sum("cnt").cast("long").alias("n_rows")
    )
    return (
        ranked.filter(F.col("rnk") <= 5)
        .join(F.broadcast(tot), "join_name")
        .select(
            "join_name",
            "key_value",
            "cnt",
            "rnk",
            F.round(
                F.col("cnt").cast("double") / F.col("n_rows"), 9
            ).alias("row_share"),
        )
    )


_SRB_ORACLE = (
    _ADJ_CTES
    + """, jcov AS (
  SELECT c.join_name,
         CAST(CASE WHEN sum(c.colocated * p.picked) >= 1
                   THEN 1 ELSE 0 END AS BIGINT) AS covered
  FROM cover c JOIN portfolio_adj p ON p.layout = c.layout
  GROUP BY 1
)
SELECT w.family,
       CAST(sum(w.runs * jp.join_rows) AS BIGINT) AS daily_rows,
       CAST(sum(w.runs * jp.join_saved_adj * j.covered) AS BIGINT)
         AS saved_rows,
       CAST(sum(w.runs * jp.join_rows)
            - sum(w.runs * jp.join_saved_adj * j.covered) AS BIGINT)
         AS residual_rows
FROM wl w
JOIN jprice jp ON jp.join_name = w.join_name
JOIN jcov j ON j.join_name = w.join_name
GROUP BY 1"""
)


@stage(
    "portfolio_salt_residual_tpch",
    _SRB_ORACLE,
    "portfolio x skew: the SKEW-ADJUSTED RESIDUAL BILL — per query "
    "family under the adjusted picked portfolio: the full daily "
    "bill, rows actually saved (covered joins at their salted net "
    "price — replication overhead already netted out), and the "
    "residual. saved + residual == bill by construction (the "
    "conservation identity, test-locked). Shape: metadata joins over "
    "the adjusted chain.",
)
def portfolio_salt_residual_tpch(spark, sf_dir):
    priced = _priced_workload(spark, sf_dir)
    counts = _wl_counts(spark, sf_dir)
    cover = _cover_frame(spark, sf_dir, counts)
    jprice = _jprice_frame(spark, sf_dir)
    adj = _adj_portfolio_frame(spark, sf_dir, jprice=jprice)
    jcov = (
        cover.join(
            F.broadcast(adj.select("layout", "picked")), "layout"
        )
        .groupBy("join_name")
        .agg(
            (F.sum(F.col("colocated") * F.col("picked")) >= 1)
            .cast("long")
            .alias("covered")
        )
    )
    return (
        priced.select("family", "join_name", "runs")
        .join(F.broadcast(jprice), "join_name")
        .join(F.broadcast(jcov), "join_name")
        .groupBy("family")
        .agg(
            F.sum(F.col("runs") * F.col("join_rows"))
            .cast("long")
            .alias("daily_rows"),
            F.sum(
                F.col("runs")
                * F.col("join_saved_adj")
                * F.col("covered")
            )
            .cast("long")
            .alias("saved_rows"),
            (
                F.sum(F.col("runs") * F.col("join_rows"))
                - F.sum(
                    F.col("runs")
                    * F.col("join_saved_adj")
                    * F.col("covered")
                )
            )
            .cast("long")
            .alias("residual_rows"),
        )
    )
