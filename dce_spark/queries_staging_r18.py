"""ROUND-18 STAGED catalog queries — seeded in round 13 (built two
rounds early: with r14..r17 staged, rounds 14 and 15 stay
promotion-only and the pipeline holds four cohorts of inventory), NOT
registered (same freeze protocol as queries_staging_r5..r17).
Round 18 promotes them.

The three themes are the in-code ROUND-18 candidate seeds
(queries.py plan comment), each composing proven machinery:

ADMISSION-PIPELINE STREAMING MIRRORS — the r17 quality-gated funnel
run PER ARRIVAL BATCH with committed gate-state carryover: documents
arrive in the 5 exact-integer doc_id batches (the r15 convention), and
the exact-dup / LSH near-dup gates are evaluated against the
LEDGER-AT-ARRIVAL (batches <= mine). Because both dup gates reject
against a STRICTLY SMALLER doc_id (survivor = min doc_id per
lowercased text; near-dup mate = any bucket-sharing earlier id — the
r17 conventions verbatim) and batches are id-range cuts, the
at-arrival flags EQUAL the global flags — the ``streaming/upsert.py``
equivalence protocol applied to admission, which is what makes every
per-batch quantity here an oracle-able batch plan. The ledger-vs-intra
split is real time-axis information: WHICH batch held the copy that
rejected a doc.

- ``gate_funnel_by_batch_documents`` — the canonical cumulative
  funnel per arrival batch (docs + tokens per stage).
- ``gate_funnel_rates_by_batch_documents`` — per (batch, gate):
  docs reaching the gate in canonical order, docs passing, the
  conditional pass rate (the per-delivery funnel telemetry).
- ``gate_ledger_attribution_documents`` — per batch: dup rejections
  split LEDGER (copy committed by an earlier batch) vs INTRA (copy
  earlier in the same delivery) for both dup gates — the carryover
  face: how much of today's rejection the committed ledger paid for.
- ``gate_admitted_mix_drift_documents`` — per (batch, source): the
  admitted mix vs the BATCH-0 admitted mix as PSI terms (the
  mix_shift_under_caps convention) — drift of what survives the
  gates across deliveries.
- ``gate_novelty_decay_documents`` — per batch: docs/tokens passing
  BOTH dup gates and the cumulative novel-token curve (novelty decays
  as the ledger grows).
- ``gate_first_fail_by_batch_documents`` — first-failing-gate
  attribution per arrival batch (the r17 attribution x time axis).
- ``gate_order_cost_by_batch_documents`` — per batch: total gate
  evaluations under the canonical and reversed gate orders (the
  terminal admitted set commutes; the per-delivery work does not).

PLACEMENT x WORKLOAD FEEDBACK LOOP — the r17 layout x join coverage
joined with a MEASURED workload model: a literal table of recurring
query families, the workload joins each runs, and runs/day (the
SHUFFLE_BUDGET.json shape as module literals), priced in exact rows
from the live table counts. The planning loop the r17 placement
planner feeds: which families each candidate bucket layout
accelerates, the build-budget-capped greedy portfolio (ranked by
exact saved-rows-per-build-row), its realized vs additive coverage
(the union-dedup audit), break-even days, and the residual bill.

- ``workload_shuffle_bill_tpch`` — per family: daily shuffled rows
  under no bucketing (the bill to beat).
- ``layout_family_acceleration_tpch`` — per (layout, family): daily
  rows saved — the feedback matrix.
- ``layout_roi_rank_tpch`` — per layout: standalone daily savings,
  build rows, the exact ROI key (saved * 1e6 div build), and rank.
- ``layout_portfolio_prefix_tpch`` — the budget-prefix greedy
  portfolio: ROI-ranked cumulative build cost against the cap (one
  full rewrite of the workload's tables), picked flags.
- ``layout_portfolio_realized_tpch`` — per join: additive vs realized
  (union-deduped) savings of the picked portfolio — the
  double-count audit of the greedy's independence assumption.
- ``layout_breakeven_days_tpch`` — per layout: exact ceil-division
  days until cumulative saved rows repay the build.
- ``layout_residual_bill_tpch`` — per family: daily rows still
  shuffled under the picked portfolio.

GATE-CALIBRATION SWEEPS — the r17 quality band-pass and length floor
swept JOINTLY (the r10 lsh_calibration protocol applied to the whole
funnel): a 4-band x 3-floor literal grid (dup gates held at
canonical), admitted mass, per-source mix, an EXACT-INTEGER source
bias (sum over sources of |admitted_s * corpus_total - corpus_s *
admitted_total| — cross-multiplied shares, no doubles), the pareto
frontier as exact integer dominance (tokens up, bias down), marginal
tokens per band-widening step, and the per-cell reproducibility
witness (the r16 pick-witness convention).

- ``gate_grid_admission_documents`` — admitted docs/tokens per cell.
- ``gate_grid_source_share_documents`` — the per-cell admitted mix.
- ``gate_grid_bias_documents`` — the exact-integer source bias per
  cell.
- ``gate_pareto_frontier_documents`` — dominated/frontier flags per
  cell by exact (tokens, bias) dominance.
- ``gate_grid_marginal_tokens_documents`` — admitted-token marginal
  per band-widening step within each floor.
- ``gate_grid_witness_documents`` — per cell: admitted count, exact
  doc-id sum, and the admitted id range.

tests/test_staging_r18.py runs these through the SAME compare harness
as the live catalog at the suite's SF. Every query verified against
its DuckDB oracle at sf0.001 + sf0.01 + sf0.1 before commit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table
from .ext.dedup import _band_buckets

# the ONE md5-minhash SQL definition — the dedup_minhash_lsh_documents
# oracle convention (queries.py), reused so the near-dup gate cannot
# drift from the catalog's hashing
from .queries import _minhash_ctes

# arrival batches (r15), quality-gate constants and the canonical
# stage grid (r17), the length floor and PSI epsilon (r13)
from .queries_staging_r13 import _MIX_EPS, _QUALITY_FLOOR
from .queries_staging_r15 import _DNB, _doc_batches  # noqa: F401
from .queries_staging_r17 import (
    _JOINS,
    _LAYOUTS,
    _Q_HI,
    _Q_LO,
    _SURV_SQL,
    _surv_col,
)

STAGED_R18: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R18[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R18[name].oracle


# =====================================================================
# A. Admission-pipeline streaming mirrors
# =====================================================================

# the shared per-doc admission frame WITH the time axis: the r17
# _GATED_CTE flags + the r15 arrival-batch cut + the batch that holds
# each dup gate's rejecting copy. Batch of an id is a pure function of
# the id (an exact integer range cut), so the copy's batch is computed
# from the copy's id directly — no extra join.
_ADM_CTE = (
    "WITH "
    + _minhash_ctes()
    + f""", nd2 AS (
  SELECT b.doc_id, CAST(min(a.doc_id) AS BIGINT) AS mate
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id
  GROUP BY b.doc_id
), dbounds AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS dmn,
         CAST(max(doc_id) AS BIGINT) AS dmx
  FROM documents
), base AS (
  SELECT d.doc_id, d.source,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ntok,
         CAST(length(d.text) AS BIGINT) AS nch,
         CAST(min(d.doc_id) OVER (PARTITION BY lower(d.text))
              AS BIGINT) AS surv_id
  FROM documents d
), gb AS (
  SELECT b.doc_id, b.source, b.ntok,
         CAST((1000 * b.nch) // b.ntok AS BIGINT) AS mw,
         CAST(((b.doc_id - x.dmn) * {_DNB}) // (x.dmx - x.dmn + 1)
              AS BIGINT) AS dbatch,
         CAST(CASE WHEN b.doc_id = b.surv_id THEN 1 ELSE 0 END
              AS BIGINT) AS g_exact,
         CAST(CASE WHEN n.mate IS NULL THEN 1 ELSE 0 END
              AS BIGINT) AS g_near,
         CAST(CASE WHEN (1000 * b.nch) // b.ntok
                        BETWEEN {_Q_LO} AND {_Q_HI}
                   THEN 1 ELSE 0 END AS BIGINT) AS g_qual,
         CAST(CASE WHEN b.ntok >= {_QUALITY_FLOOR} THEN 1 ELSE 0 END
              AS BIGINT) AS g_len,
         CAST(((b.surv_id - x.dmn) * {_DNB}) // (x.dmx - x.dmn + 1)
              AS BIGINT) AS exact_src_batch,
         CASE WHEN n.mate IS NULL THEN NULL
              ELSE CAST(((n.mate - x.dmn) * {_DNB})
                        // (x.dmx - x.dmn + 1) AS BIGINT)
         END AS near_src_batch
  FROM base b
  CROSS JOIN dbounds x
  LEFT JOIN nd2 n ON n.doc_id = b.doc_id
)"""
)


def _admission_frame(spark, sf_dir):
    """The Spark mirror of _ADM_CTE's ``gb``: per-doc gate flags (the
    r17 single admission pass — one text-keyed window, one LSH-pruned
    bucket self-join, map-side scores) + the r15 arrival-batch cut +
    the batch holding each dup gate's rejecting copy. The copy's batch
    is the range-cut function applied to the copy's id (scalar bounds
    ride a 1-row broadcast), so the time axis costs no extra shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("doc_id").cast("long").alias("dmn"),
        F.max("doc_id").cast("long").alias("dmx"),
    )
    bb = _band_buckets(docs, "text", "doc_id", 3, 8, 4, fast=False)
    a, b = bb.alias("a"), bb.alias("b")
    nd = (
        a.join(
            b,
            (F.col("b.band") == F.col("a.band"))
            & (F.col("b.bkey") == F.col("a.bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("b.__id").alias("doc_id"))
        .agg(F.min(F.col("a.__id")).cast("long").alias("mate"))
    )
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
        F.length("text").cast("long").alias("nch"),
        F.lower(F.col("text")).alias("norm"),
    ).withColumn(
        "surv_id",
        F.min("doc_id").over(Window.partitionBy("norm")).cast("long"),
    )
    mw = F.expr("(1000 * nch) div ntok").cast("long")

    def bat(c: str):
        return F.expr(f"({c} - dmn) * {_DNB} div (dmx - dmn + 1)").cast(
            "long"
        )

    return (
        base.crossJoin(F.broadcast(bounds))
        .join(nd, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "ntok",
            mw.alias("mw"),
            bat("doc_id").alias("dbatch"),
            (F.col("doc_id") == F.col("surv_id"))
            .cast("long")
            .alias("g_exact"),
            F.col("mate").isNull().cast("long").alias("g_near"),
            ((mw >= _Q_LO) & (mw <= _Q_HI)).cast("long").alias("g_qual"),
            (F.col("ntok") >= _QUALITY_FLOOR)
            .cast("long")
            .alias("g_len"),
            bat("surv_id").alias("exact_src_batch"),
            F.when(F.col("mate").isNull(), F.lit(None).cast("long"))
            .otherwise(bat("mate"))
            .alias("near_src_batch"),
        )
    )


_GFB_ORACLE = (
    _ADM_CTE
    + f""", st AS (
  SELECT g.*, unnest([0, 1, 2, 3, 4]) AS stage FROM gb g
), surv AS (
  SELECT dbatch, stage, ntok, {_SURV_SQL} AS s FROM st
)
SELECT dbatch, CAST(stage AS BIGINT) AS stage,
       CAST(sum(s) AS BIGINT) AS n_docs,
       CAST(sum(s * ntok) AS BIGINT) AS tokens
FROM surv GROUP BY 1, 2"""
)


@stage(
    "gate_funnel_by_batch_documents",
    _GFB_ORACLE,
    "admission streaming mirror: the canonical r17 gate funnel PER "
    "ARRIVAL BATCH — surviving docs and tokens at each of the 5 "
    "cumulative stages, for each of the 5 deliveries. The per-batch "
    "flags equal the global ones because both dup gates reject "
    "against a strictly smaller doc_id (same-or-earlier batch under "
    "the id-range cut) — the upsert equivalence protocol applied to "
    "admission. Shape: one admission pass, a map-side 5-stage "
    "explode, one (batch, stage)-keyed aggregate; at 100 TB the "
    "explode multiplies rows by a constant 5 before the partial agg "
    "absorbs them map-side.",
)
def gate_funnel_by_batch_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    st = g.select(
        "dbatch",
        "ntok",
        "g_exact",
        "g_near",
        "g_qual",
        "g_len",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in range(5)])
        ).alias("stage"),
    ).withColumn("s", _surv_col())
    return st.groupBy("dbatch", "stage").agg(
        F.sum("s").cast("long").alias("n_docs"),
        F.sum(F.col("s") * F.col("ntok")).cast("long").alias("tokens"),
    )


_GATE_NAMES = ["exact_dup", "near_dup", "quality", "length"]

_GFR_ORACLE = (
    _ADM_CTE
    + """, st AS (
  SELECT g.*, unnest([1, 2, 3, 4]) AS gate FROM gb g
), r AS (
  SELECT dbatch, gate,
         CASE gate WHEN 1 THEN 'exact_dup' WHEN 2 THEN 'near_dup'
                   WHEN 3 THEN 'quality' ELSE 'length' END AS gate_name,
         CASE gate WHEN 1 THEN 1 WHEN 2 THEN g_exact
                   WHEN 3 THEN g_exact * g_near
                   ELSE g_exact * g_near * g_qual END AS reached,
         CASE gate WHEN 1 THEN g_exact WHEN 2 THEN g_exact * g_near
                   WHEN 3 THEN g_exact * g_near * g_qual
                   ELSE g_exact * g_near * g_qual * g_len END AS passed
  FROM st
)
SELECT dbatch, gate_name,
       CAST(sum(reached) AS BIGINT) AS n_in,
       CAST(sum(passed) AS BIGINT) AS n_pass,
       CASE WHEN sum(reached) = 0 THEN NULL
            ELSE round(CAST(sum(passed) AS DOUBLE) / sum(reached), 9)
       END AS pass_rate
FROM r GROUP BY 1, 2"""
)


@stage(
    "gate_funnel_rates_by_batch_documents",
    _GFR_ORACLE,
    "admission streaming mirror: per (arrival batch, gate) in "
    "canonical order — docs REACHING the gate (survivors of the "
    "earlier gates), docs passing it, and the conditional pass rate. "
    "The per-delivery funnel-rate telemetry an ingest dashboard "
    "plots: a quality regression in one delivery moves that batch's "
    "conditional rate even when the cumulative funnel still looks "
    "normal. Shape: map-side 4-gate explode over the admission "
    "frame, one (batch, gate) aggregate; the rate divides two exact "
    "int64 counts once, at the end.",
)
def gate_funnel_rates_by_batch_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    st = g.select(
        "dbatch",
        "g_exact",
        "g_near",
        "g_qual",
        "g_len",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in range(1, 5)])
        ).alias("gate"),
    )
    reached = (
        F.when(F.col("gate") == 1, F.lit(1))
        .when(F.col("gate") == 2, F.col("g_exact"))
        .when(F.col("gate") == 3, F.col("g_exact") * F.col("g_near"))
        .otherwise(
            F.col("g_exact") * F.col("g_near") * F.col("g_qual")
        )
        .cast("long")
    )
    passed = (
        F.when(F.col("gate") == 1, F.col("g_exact"))
        .when(F.col("gate") == 2, F.col("g_exact") * F.col("g_near"))
        .when(
            F.col("gate") == 3,
            F.col("g_exact") * F.col("g_near") * F.col("g_qual"),
        )
        .otherwise(
            F.col("g_exact")
            * F.col("g_near")
            * F.col("g_qual")
            * F.col("g_len")
        )
        .cast("long")
    )
    gate_name = (
        F.when(F.col("gate") == 1, F.lit("exact_dup"))
        .when(F.col("gate") == 2, F.lit("near_dup"))
        .when(F.col("gate") == 3, F.lit("quality"))
        .otherwise(F.lit("length"))
    )
    agg = (
        st.select(
            "dbatch",
            gate_name.alias("gate_name"),
            reached.alias("reached"),
            passed.alias("passed"),
        )
        .groupBy("dbatch", "gate_name")
        .agg(
            F.sum("reached").cast("long").alias("n_in"),
            F.sum("passed").cast("long").alias("n_pass"),
        )
    )
    return agg.select(
        "dbatch",
        "gate_name",
        "n_in",
        "n_pass",
        F.when(F.col("n_in") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.col("n_pass").cast("double") / F.col("n_in"), 9
            )
        )
        .alias("pass_rate"),
    )


_GLA_ORACLE = (
    _ADM_CTE
    + """
SELECT dbatch,
       CAST(sum(CASE WHEN g_exact = 0 AND exact_src_batch < dbatch
                     THEN 1 ELSE 0 END) AS BIGINT) AS exact_ledger,
       CAST(sum(CASE WHEN g_exact = 0 AND exact_src_batch = dbatch
                     THEN 1 ELSE 0 END) AS BIGINT) AS exact_intra,
       CAST(sum(CASE WHEN g_near = 0 AND near_src_batch < dbatch
                     THEN 1 ELSE 0 END) AS BIGINT) AS near_ledger,
       CAST(sum(CASE WHEN g_near = 0 AND near_src_batch = dbatch
                     THEN 1 ELSE 0 END) AS BIGINT) AS near_intra
FROM gb GROUP BY 1"""
)


@stage(
    "gate_ledger_attribution_documents",
    _GLA_ORACLE,
    "admission streaming mirror: the CARRYOVER split — per arrival "
    "batch, dup-gate rejections attributed to the COMMITTED LEDGER "
    "(the rejecting copy arrived in an earlier batch) vs INTRA-BATCH "
    "(the copy is earlier in the same delivery), for both the exact "
    "and the near-dup gate. This is the quantity that prices keeping "
    "the dedup ledger at all: ledger-attributed rejections are "
    "exactly the duplicates a from-scratch (ledger-less) ingest of "
    "that delivery would have ADMITTED. Shape: one admission pass, "
    "one 5-row batch-keyed aggregate; the copy's batch is an id "
    "range-cut function, no extra join.",
)
def gate_ledger_attribution_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    return g.groupBy("dbatch").agg(
        F.sum(
            (
                (F.col("g_exact") == 0)
                & (F.col("exact_src_batch") < F.col("dbatch"))
            ).cast("long")
        )
        .cast("long")
        .alias("exact_ledger"),
        F.sum(
            (
                (F.col("g_exact") == 0)
                & (F.col("exact_src_batch") == F.col("dbatch"))
            ).cast("long")
        )
        .cast("long")
        .alias("exact_intra"),
        F.sum(
            (
                (F.col("g_near") == 0)
                & (F.col("near_src_batch") < F.col("dbatch"))
            ).cast("long")
        )
        .cast("long")
        .alias("near_ledger"),
        F.sum(
            (
                (F.col("g_near") == 0)
                & (F.col("near_src_batch") == F.col("dbatch"))
            ).cast("long")
        )
        .cast("long")
        .alias("near_intra"),
    )


_GMD_ORACLE = (
    _ADM_CTE
    + f""", adm AS (
  SELECT dbatch, source FROM gb
  WHERE g_exact * g_near * g_qual * g_len = 1
), srcs AS (
  SELECT DISTINCT source FROM adm
), grid AS (
  SELECT s.source, unnest([0, 1, 2, 3, 4]) AS dbatch FROM srcs s
), cnt AS (
  SELECT g.source, CAST(g.dbatch AS BIGINT) AS dbatch,
         CAST(coalesce(c.n, 0) AS BIGINT) AS n_adm
  FROM grid g
  LEFT JOIN (
    SELECT dbatch, source, count(*) AS n FROM adm GROUP BY 1, 2
  ) c ON c.dbatch = g.dbatch AND c.source = g.source
), ref AS (
  SELECT source, n_adm AS n_ref FROM cnt WHERE dbatch = 0
), tot AS (
  SELECT c.dbatch, c.source, c.n_adm, r.n_ref,
         sum(c.n_adm) OVER (PARTITION BY c.dbatch) AS t_adm,
         sum(r.n_ref) OVER (PARTITION BY c.dbatch) AS t_ref
  FROM cnt c JOIN ref r ON r.source = c.source
)
SELECT dbatch, source, n_adm, CAST(n_ref AS BIGINT) AS n_ref,
       round((CAST(n_adm AS DOUBLE) / t_adm
              - CAST(n_ref AS DOUBLE) / t_ref)
             * ln((CAST(n_adm AS DOUBLE) / t_adm + {_MIX_EPS})
                  / (CAST(n_ref AS DOUBLE) / t_ref + {_MIX_EPS})), 6)
         AS psi_term
FROM tot"""
)


@stage(
    "gate_admitted_mix_drift_documents",
    _GMD_ORACLE,
    "admission streaming mirror: DRIFT OF THE ADMITTED MIX across "
    "deliveries — per (batch, source): admitted docs, the batch-0 "
    "reference count, and the PSI term of this batch's admitted "
    "share vs the batch-0 share (the mix_shift_under_caps term "
    "convention: counts stay exact int64, the one transcendental is "
    "rounded at 6dp per term; consumers sum terms per batch). The "
    "gates are fixed — movement here is the INPUT shifting under "
    "them, the signal that retunes the calibration grid. Shape: one "
    "admission pass, a (source x 5)-cell map-side grid explode over "
    "the distinct admitted sources, two metadata-scale window sums.",
)
def gate_admitted_mix_drift_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    adm = g.filter(
        F.col("g_exact")
        * F.col("g_near")
        * F.col("g_qual")
        * F.col("g_len")
        == 1
    ).select("dbatch", "source")
    cnt_raw = adm.groupBy("dbatch", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    grid = (
        adm.select("source")
        .distinct()
        .select(
            "source",
            F.explode(
                F.array(*[F.lit(s).cast("long") for s in range(5)])
            ).alias("dbatch"),
        )
    )
    cnt = grid.join(cnt_raw, ["dbatch", "source"], "left").select(
        "dbatch",
        "source",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_adm"),
    )
    ref = cnt.filter(F.col("dbatch") == 0).select(
        "source", F.col("n_adm").alias("n_ref")
    )
    w = Window.partitionBy("dbatch")
    tot = (
        cnt.join(ref, "source")
        .withColumn("t_adm", F.sum("n_adm").over(w))
        .withColumn("t_ref", F.sum("n_ref").over(w))
    )
    q = F.col("n_adm").cast("double") / F.col("t_adm")
    p = F.col("n_ref").cast("double") / F.col("t_ref")
    return tot.select(
        "dbatch",
        "source",
        "n_adm",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.round(
            (q - p)
            * F.log((q + F.lit(_MIX_EPS)) / (p + F.lit(_MIX_EPS))),
            6,
        ).alias("psi_term"),
    )


_GND_ORACLE = (
    _ADM_CTE
    + """, per AS (
  SELECT dbatch,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(g_exact * g_near) AS BIGINT) AS n_novel,
         CAST(sum(g_exact * g_near * ntok) AS BIGINT) AS novel_tokens
  FROM gb GROUP BY 1
)
SELECT dbatch, n_docs, n_novel, novel_tokens,
       round(CAST(n_novel AS DOUBLE) / n_docs, 9) AS novel_share,
       CAST(sum(novel_tokens) OVER (ORDER BY dbatch) AS BIGINT)
         AS cum_novel_tokens
FROM per"""
)


@stage(
    "gate_novelty_decay_documents",
    _GND_ORACLE,
    "admission streaming mirror: the NOVELTY DECAY curve — per "
    "arrival batch: docs and tokens passing BOTH dup gates (novel "
    "content), the novel share, and the cumulative novel-token "
    "curve. As the committed ledger grows, each delivery's novel "
    "share falls — the curve that says when a source is mined out "
    "and the ingest budget should move. Shape: one admission pass, "
    "one 5-row aggregate, one 5-row running-sum window.",
)
def gate_novelty_decay_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    per = g.groupBy("dbatch").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("g_exact") * F.col("g_near"))
        .cast("long")
        .alias("n_novel"),
        F.sum(F.col("g_exact") * F.col("g_near") * F.col("ntok"))
        .cast("long")
        .alias("novel_tokens"),
    )
    w = Window.orderBy("dbatch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per.select(
        "dbatch",
        "n_docs",
        "n_novel",
        "novel_tokens",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_docs"), 9
        ).alias("novel_share"),
        F.sum("novel_tokens").over(w).cast("long").alias(
            "cum_novel_tokens"
        ),
    )


_GFF_ORACLE = (
    _ADM_CTE
    + """
SELECT dbatch,
       CASE WHEN g_exact = 0 THEN 'exact_dup'
            WHEN g_near = 0 THEN 'near_dup'
            WHEN g_qual = 0 THEN 'quality'
            WHEN g_len = 0 THEN 'length'
            ELSE 'admitted' END AS first_fail,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS tokens
FROM gb GROUP BY 1, 2"""
)


@stage(
    "gate_first_fail_by_batch_documents",
    _GFF_ORACLE,
    "admission streaming mirror: FIRST-FAILING-GATE attribution per "
    "arrival batch (canonical order; 'admitted' = passed all four) — "
    "docs and tokens per (batch, verdict). The r17 per-source "
    "attribution crossed with the time axis: a delivery whose "
    "first-fail mass shifts from quality to near_dup is drifting "
    "toward an already-ingested corpus, not getting worse. Shape: "
    "one admission pass, one (5 x 5)-cell aggregate.",
)
def gate_first_fail_by_batch_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    ff = (
        F.when(F.col("g_exact") == 0, F.lit("exact_dup"))
        .when(F.col("g_near") == 0, F.lit("near_dup"))
        .when(F.col("g_qual") == 0, F.lit("quality"))
        .when(F.col("g_len") == 0, F.lit("length"))
        .otherwise(F.lit("admitted"))
    )
    return (
        g.select("dbatch", ff.alias("first_fail"), "ntok")
        .groupBy("dbatch", "first_fail")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("tokens"),
        )
    )


_GOC_ORACLE = (
    _ADM_CTE
    + """, st AS (
  SELECT g.*, unnest(['canonical', 'reversed']) AS gate_order FROM gb g
), ev AS (
  SELECT dbatch, gate_order,
         CASE WHEN gate_order = 'canonical'
              THEN 1 + g_exact + g_exact * g_near
                   + g_exact * g_near * g_qual
              ELSE 1 + g_len + g_len * g_qual
                   + g_len * g_qual * g_near END AS n_evals,
         g_exact * g_near * g_qual * g_len AS admitted
  FROM st
)
SELECT dbatch, gate_order,
       CAST(sum(n_evals) AS BIGINT) AS n_evals,
       CAST(sum(admitted) AS BIGINT) AS n_admitted
FROM ev GROUP BY 1, 2"""
)


@stage(
    "gate_order_cost_by_batch_documents",
    _GOC_ORACLE,
    "admission streaming mirror: GATE-ORDER ECONOMICS per delivery — "
    "total gate evaluations under the canonical (exact, near, "
    "quality, length) and reversed (length, quality, near, exact) "
    "orders, per arrival batch. The admitted count is order- "
    "invariant (gates commute on the terminal set — it appears once "
    "per order as the built-in invariant check); the work does not: "
    "cheap-first wins when the cheap gate rejects the most. Shape: "
    "one admission pass, a map-side 2-order explode, one (5 x 2) "
    "aggregate.",
)
def gate_order_cost_by_batch_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    st = g.select(
        "dbatch",
        "g_exact",
        "g_near",
        "g_qual",
        "g_len",
        F.explode(
            F.array(F.lit("canonical"), F.lit("reversed"))
        ).alias("gate_order"),
    )
    canon = (
        F.lit(1)
        + F.col("g_exact")
        + F.col("g_exact") * F.col("g_near")
        + F.col("g_exact") * F.col("g_near") * F.col("g_qual")
    )
    rev = (
        F.lit(1)
        + F.col("g_len")
        + F.col("g_len") * F.col("g_qual")
        + F.col("g_len") * F.col("g_qual") * F.col("g_near")
    )
    return (
        st.select(
            "dbatch",
            "gate_order",
            F.when(F.col("gate_order") == "canonical", canon)
            .otherwise(rev)
            .cast("long")
            .alias("n_evals"),
            (
                F.col("g_exact")
                * F.col("g_near")
                * F.col("g_qual")
                * F.col("g_len")
            )
            .cast("long")
            .alias("admitted"),
        )
        .groupBy("dbatch", "gate_order")
        .agg(
            F.sum("n_evals").cast("long").alias("n_evals"),
            F.sum("admitted").cast("long").alias("n_admitted"),
        )
    )


# =====================================================================
# B. Placement x workload feedback loop
# =====================================================================

# the recurring-query workload model: (family, workload join, runs per
# day) — the SHUFFLE_BUDGET.json shape as module literals, priced in
# exact rows from the live table counts. Joins are the r17 _JOINS.
_WORKLOAD = [
    ("pricing_rollup", "lineitem_orders", 48),
    ("late_shipments", "lineitem_orders", 12),
    ("order_lifecycle", "lineitem_orders", 6),
    ("order_lifecycle", "orders_customer", 6),
    ("customer_360", "orders_customer", 4),
    ("segment_revenue", "orders_customer", 24),
    ("part_margin", "lineitem_part", 6),
    ("promo_share", "lineitem_part", 18),
]

_WL_TABLES = ["customer", "orders", "lineitem", "part"]
_JOIN_TABLES = {j: (p, b) for j, _k, p, b in _JOINS}
# distinct tables a layout must rewrite bucketed (its build bill)
_LAYOUT_TABLES = [
    (lname, sorted({t for j in covered for t in _JOIN_TABLES[j]}))
    for lname, covered in _LAYOUTS
    if covered
]

_WL_COUNTS_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS n FROM {t}"
    for t in _WL_TABLES
)

_WL_CTES = f"""WITH counts AS (
  {_WL_COUNTS_SQL}
), wl AS (
  SELECT unnest([{", ".join(f"'{f}'" for f, _j, _r in _WORKLOAD)}])
           AS family,
         unnest([{", ".join(f"'{j}'" for _f, j, _r in _WORKLOAD)}])
           AS join_name,
         unnest([{", ".join(str(r) for _f, _j, r in _WORKLOAD)}])
           AS runs
), joins AS (
  SELECT unnest([{", ".join(f"'{j}'" for j, _k, _p, _b in _JOINS)}])
           AS join_name,
         unnest([{", ".join(f"'{p}'" for _j, _k, p, _b in _JOINS)}])
           AS probe_table,
         unnest([{", ".join(f"'{b}'" for _j, _k, _p, b in _JOINS)}])
           AS build_table
), priced AS (
  SELECT w.family, w.join_name, CAST(w.runs AS BIGINT) AS runs,
         CAST(pp.n + bp.n AS BIGINT) AS join_rows,
         CAST(w.runs * (pp.n + bp.n) AS BIGINT) AS daily_rows
  FROM wl w
  JOIN joins j ON j.join_name = w.join_name
  JOIN counts pp ON pp.tbl = j.probe_table
  JOIN counts bp ON bp.tbl = j.build_table
)"""

_COVER_VALUES = ", ".join(
    f"('{lname}', '{j}', {1 if j in covered else 0})"
    for lname, covered in _LAYOUTS
    for j, _k, _p, _b in _JOINS
)

_BUILD_VALUES = ", ".join(
    f"('{lname}', '{t}')" for lname, tabs in _LAYOUT_TABLES for t in tabs
)

# the portfolio chain (ROI ranking + budget-prefix greedy), shared by
# the rank / prefix / realized / residual faces. Cap = one full
# bucketed rewrite of the workload's tables (scale-free: it is itself
# a row count from the same statistics).
_PORTFOLIO_CTES = (
    _WL_CTES
    + f""", cover (layout, join_name, colocated) AS (
  VALUES {_COVER_VALUES}
), builds_map (layout, tbl) AS (
  VALUES {_BUILD_VALUES}
), saved AS (
  SELECT c.layout,
         CAST(sum(p.daily_rows * c.colocated) AS BIGINT) AS daily_saved
  FROM cover c JOIN priced p ON p.join_name = c.join_name
  GROUP BY 1
), builds AS (
  SELECT b.layout, CAST(sum(n.n) AS BIGINT) AS build_rows
  FROM builds_map b JOIN counts n ON n.tbl = b.tbl
  GROUP BY 1
), ranked AS (
  SELECT s.layout, s.daily_saved, b.build_rows,
         CAST((s.daily_saved * 1000000) // b.build_rows AS BIGINT)
           AS roi_key,
         CAST(row_number() OVER (
           ORDER BY (s.daily_saved * 1000000) // b.build_rows DESC,
                    s.layout) AS BIGINT) AS rnk
  FROM saved s JOIN builds b ON b.layout = s.layout
), cap AS (
  SELECT CAST(sum(n) AS BIGINT) AS build_cap FROM counts
), prefix AS (
  SELECT r.*, cap.build_cap,
         CAST(sum(r.build_rows) OVER (ORDER BY r.rnk) AS BIGINT)
           AS cum_build_rows
  FROM ranked r CROSS JOIN cap
), portfolio AS (
  SELECT *, CAST(CASE WHEN cum_build_rows <= build_cap THEN 1 ELSE 0
                 END AS BIGINT) AS picked
  FROM prefix
)"""
)


def _wl_counts(spark, sf_dir):
    counts = None
    for t in _WL_TABLES:
        agg = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .select(F.lit(t).alias("tbl"), "n")
        )
        counts = agg if counts is None else counts.unionByName(agg)
    return counts


def _lit_frame(counts, rows):
    """Literal rows as a map-side explode off a 1-row frame (the r17
    cover pattern — never a multi-row crossJoin)."""
    return (
        counts.limit(1)
        .select(F.explode(F.array(*rows)).alias("c"))
        .select("c.*")
    )


def _priced_workload(spark, sf_dir):
    """(family, join_name, runs, join_rows, daily_rows) — the Spark
    mirror of _WL_CTES' ``priced``: the literal workload model joined
    to four 1-row table counts. Pure metadata at any corpus size."""
    counts = _wl_counts(spark, sf_dir)
    rows = [
        F.struct(
            F.lit(f).alias("family"),
            F.lit(j).alias("join_name"),
            F.lit(r).cast("long").alias("runs"),
            F.lit(_JOIN_TABLES[j][0]).alias("probe_table"),
            F.lit(_JOIN_TABLES[j][1]).alias("build_table"),
        )
        for f, j, r in _WORKLOAD
    ]
    wl = _lit_frame(counts, rows)
    return (
        wl.join(
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
        .select(
            "family",
            "join_name",
            "runs",
            (F.col("probe_rows") + F.col("build_rows"))
            .cast("long")
            .alias("join_rows"),
            (
                F.col("runs")
                * (F.col("probe_rows") + F.col("build_rows"))
            )
            .cast("long")
            .alias("daily_rows"),
        )
    )


def _cover_frame(spark, sf_dir, counts):
    rows = [
        F.struct(
            F.lit(lname).alias("layout"),
            F.lit(j).alias("join_name"),
            F.lit(1 if j in covered else 0)
            .cast("long")
            .alias("colocated"),
        )
        for lname, covered in _LAYOUTS
        for j, _k, _p, _b in _JOINS
    ]
    return _lit_frame(counts, rows)


def _portfolio_frame(spark, sf_dir):
    """The Spark mirror of _PORTFOLIO_CTES' ``portfolio``: per
    non-trivial layout — standalone daily savings, build bill, exact
    ROI key, rank, the running build cost, the cap, and the
    budget-prefix picked flag. Everything is arithmetic over <= 5
    rows; the windows are metadata-scale."""
    counts = _wl_counts(spark, sf_dir)
    priced = _priced_workload(spark, sf_dir)
    cover = _cover_frame(spark, sf_dir, counts)
    saved = (
        cover.join(F.broadcast(priced), "join_name")
        .groupBy("layout")
        .agg(
            F.sum(F.col("daily_rows") * F.col("colocated"))
            .cast("long")
            .alias("daily_saved")
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
            "roi_key",
            F.expr("daily_saved * 1000000 div build_rows").cast("long"),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.desc("roi_key"), F.asc("layout")))
            .cast("long"),
        )
    )
    cap = counts.agg(F.sum("n").cast("long").alias("build_cap"))
    w = Window.orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ranked.crossJoin(F.broadcast(cap))
        .withColumn(
            "cum_build_rows",
            F.sum("build_rows").over(w).cast("long"),
        )
        .withColumn(
            "picked",
            (F.col("cum_build_rows") <= F.col("build_cap"))
            .cast("long"),
        )
    )


_WBILL_ORACLE = (
    _WL_CTES
    + """
SELECT family,
       CAST(count(*) AS BIGINT) AS n_joins,
       CAST(sum(daily_rows) AS BIGINT) AS daily_rows
FROM priced GROUP BY 1"""
)


@stage(
    "workload_shuffle_bill_tpch",
    _WBILL_ORACLE,
    "placement x workload: the DAILY SHUFFLE BILL per query family "
    "under no bucketing — the literal workload model (family, join, "
    "runs/day: the SHUFFLE_BUDGET.json shape as module literals) "
    "priced in exact rows from the live table counts (probe + build "
    "rows per run, the r17 pricing). This is the number every layout "
    "candidate is bidding against. Shape: four 1-row table counts "
    "joined to a literal explode — pure metadata at any corpus size.",
)
def workload_shuffle_bill_tpch(spark, sf_dir):
    priced = _priced_workload(spark, sf_dir)
    return priced.groupBy("family").agg(
        F.count(F.lit(1)).cast("long").alias("n_joins"),
        F.sum("daily_rows").cast("long").alias("daily_rows"),
    )


_WACCEL_ORACLE = (
    _WL_CTES
    + f""", cover (layout, join_name, colocated) AS (
  VALUES {_COVER_VALUES}
)
SELECT c.layout, p.family,
       CAST(sum(p.daily_rows * c.colocated) AS BIGINT) AS daily_saved
FROM cover c JOIN priced p ON p.join_name = c.join_name
GROUP BY 1, 2"""
)


@stage(
    "layout_family_acceleration_tpch",
    _WACCEL_ORACLE,
    "placement x workload: the FEEDBACK MATRIX — per (candidate "
    "layout, query family): daily shuffle rows the layout saves that "
    "family (covered joins x runs x exact row prices). The r17 "
    "coverage matrix was per JOIN; this rolls the workload dimension "
    "in, which is what turns a storage decision into a user-visible "
    "one (who gets faster). Shape: literal layout/workload rows "
    "joined to 1-row counts; a (5 x 7)-cell aggregate.",
)
def layout_family_acceleration_tpch(spark, sf_dir):
    counts = _wl_counts(spark, sf_dir)
    priced = _priced_workload(spark, sf_dir)
    cover = _cover_frame(spark, sf_dir, counts)
    return (
        cover.join(F.broadcast(priced), "join_name")
        .groupBy("layout", "family")
        .agg(
            F.sum(F.col("daily_rows") * F.col("colocated"))
            .cast("long")
            .alias("daily_saved")
        )
    )


_WROI_ORACLE = (
    _PORTFOLIO_CTES
    + """
SELECT layout, daily_saved, build_rows, roi_key, rnk FROM ranked"""
)


@stage(
    "layout_roi_rank_tpch",
    _WROI_ORACLE,
    "placement x workload: the ROI RANKING — per non-trivial layout: "
    "standalone daily saved rows across the whole workload, the "
    "build bill (one bucketed rewrite of every table the layout "
    "touches), and the exact integer ROI key saved-rows-per-build-"
    "row scaled by 1e6 (integer division — no doubles in the "
    "ranking), ranked descending with the layout name as the "
    "deterministic tie-break. Shape: <= 5-row arithmetic over the "
    "priced workload.",
)
def layout_roi_rank_tpch(spark, sf_dir):
    pf = _portfolio_frame(spark, sf_dir)
    return pf.select(
        "layout", "daily_saved", "build_rows", "roi_key", "rnk"
    )


_WPREFIX_ORACLE = (
    _PORTFOLIO_CTES
    + """
SELECT rnk, layout, daily_saved, build_rows, cum_build_rows,
       build_cap, picked
FROM portfolio"""
)


@stage(
    "layout_portfolio_prefix_tpch",
    _WPREFIX_ORACLE,
    "placement x workload: the BUDGET-PREFIX GREEDY portfolio — walk "
    "the ROI ranking, accumulate build bills, pick while the "
    "cumulative cost fits the cap (one full bucketed rewrite of the "
    "workload's four tables — scale-free, it is itself a row count "
    "from the same statistics). The prefix rule keeps the plan a "
    "pure window expression (the r13 clamp convention: exact "
    "integers, deterministic ties) instead of a driver-side loop. "
    "Shape: <= 5-row windows.",
)
def layout_portfolio_prefix_tpch(spark, sf_dir):
    pf = _portfolio_frame(spark, sf_dir)
    return pf.select(
        "rnk",
        "layout",
        "daily_saved",
        "build_rows",
        "cum_build_rows",
        "build_cap",
        "picked",
    )


_WREAL_ORACLE = (
    _PORTFOLIO_CTES
    + """, jbill AS (
  SELECT join_name, CAST(sum(daily_rows) AS BIGINT) AS daily_rows
  FROM priced GROUP BY 1
), jcover AS (
  SELECT c.join_name,
         CAST(sum(c.colocated * p.picked) AS BIGINT)
           AS n_picked_covering
  FROM cover c JOIN portfolio p ON p.layout = c.layout
  GROUP BY 1
)
SELECT j.join_name, j.daily_rows, c.n_picked_covering,
       CAST(j.daily_rows * c.n_picked_covering AS BIGINT)
         AS additive_saved,
       CAST(j.daily_rows * CASE WHEN c.n_picked_covering >= 1
                                THEN 1 ELSE 0 END AS BIGINT)
         AS realized_saved,
       CAST(j.daily_rows * c.n_picked_covering
            - j.daily_rows * CASE WHEN c.n_picked_covering >= 1
                                  THEN 1 ELSE 0 END AS BIGINT)
         AS redundant_rows
FROM jbill j JOIN jcover c ON c.join_name = j.join_name"""
)


@stage(
    "layout_portfolio_realized_tpch",
    _WREAL_ORACLE,
    "placement x workload: the REALIZED-COVERAGE AUDIT — per workload "
    "join: its daily bill, how many PICKED layouts cover it, the "
    "ADDITIVE savings claim the standalone ROI ranking implied "
    "(bill x covering count) vs the REALIZED savings (a join stops "
    "shuffling once — union, not sum), and the double-counted "
    "remainder. The greedy ranks layouts independently; this row is "
    "the honest price of that assumption. Shape: metadata joins over "
    "the portfolio chain.",
)
def layout_portfolio_realized_tpch(spark, sf_dir):
    counts = _wl_counts(spark, sf_dir)
    priced = _priced_workload(spark, sf_dir)
    cover = _cover_frame(spark, sf_dir, counts)
    pf = _portfolio_frame(spark, sf_dir)
    jbill = priced.groupBy("join_name").agg(
        F.sum("daily_rows").cast("long").alias("daily_rows")
    )
    jcover = (
        cover.join(
            F.broadcast(pf.select("layout", "picked")), "layout"
        )
        .groupBy("join_name")
        .agg(
            F.sum(F.col("colocated") * F.col("picked"))
            .cast("long")
            .alias("n_picked_covering")
        )
    )
    out = jbill.join(jcover, "join_name")
    realized = F.col("daily_rows") * (
        F.col("n_picked_covering") >= 1
    ).cast("long")
    additive = F.col("daily_rows") * F.col("n_picked_covering")
    return out.select(
        "join_name",
        "daily_rows",
        "n_picked_covering",
        additive.cast("long").alias("additive_saved"),
        realized.cast("long").alias("realized_saved"),
        (additive - realized).cast("long").alias("redundant_rows"),
    )


_WBREAK_ORACLE = (
    _PORTFOLIO_CTES
    + """
SELECT layout, daily_saved, build_rows,
       CASE WHEN daily_saved = 0 THEN NULL
            ELSE CAST((build_rows + daily_saved - 1) // daily_saved
                      AS BIGINT) END AS breakeven_days
FROM ranked"""
)


@stage(
    "layout_breakeven_days_tpch",
    _WBREAK_ORACLE,
    "placement x workload: BREAK-EVEN DAYS per layout — the exact "
    "ceiling division (build + saved - 1) div saved: days of "
    "workload until the saved shuffle rows repay the bucketed "
    "rewrite. NULL when the layout saves nothing (never repays). "
    "The one number that separates build-it-now from "
    "not-worth-the-write. Shape: <= 5-row arithmetic.",
)
def layout_breakeven_days_tpch(spark, sf_dir):
    pf = _portfolio_frame(spark, sf_dir)
    return pf.select(
        "layout",
        "daily_saved",
        "build_rows",
        F.when(F.col("daily_saved") == 0, F.lit(None).cast("long"))
        .otherwise(
            F.expr(
                "(build_rows + daily_saved - 1) div daily_saved"
            ).cast("long")
        )
        .alias("breakeven_days"),
    )


_WRESID_ORACLE = (
    _PORTFOLIO_CTES
    + """, jcov AS (
  SELECT c.join_name,
         CAST(CASE WHEN sum(c.colocated * p.picked) >= 1
                   THEN 1 ELSE 0 END AS BIGINT) AS covered
  FROM cover c JOIN portfolio p ON p.layout = c.layout
  GROUP BY 1
)
SELECT p.family,
       CAST(sum(p.daily_rows) AS BIGINT) AS daily_rows,
       CAST(sum(p.daily_rows * j.covered) AS BIGINT) AS saved_rows,
       CAST(sum(p.daily_rows * (1 - j.covered)) AS BIGINT)
         AS residual_rows
FROM priced p JOIN jcov j ON j.join_name = p.join_name
GROUP BY 1"""
)


@stage(
    "layout_residual_bill_tpch",
    _WRESID_ORACLE,
    "placement x workload: the RESIDUAL BILL — per query family "
    "after the picked portfolio lands: daily rows saved vs still "
    "shuffling (joins no picked layout co-locates). The loop-closing "
    "row: residuals feed the next round's candidate layouts exactly "
    "the way SHUFFLE_BUDGET regressions feed plan audits. Shape: "
    "metadata joins over the portfolio chain.",
)
def layout_residual_bill_tpch(spark, sf_dir):
    counts = _wl_counts(spark, sf_dir)
    priced = _priced_workload(spark, sf_dir)
    cover = _cover_frame(spark, sf_dir, counts)
    pf = _portfolio_frame(spark, sf_dir)
    jcov = (
        cover.join(
            F.broadcast(pf.select("layout", "picked")), "layout"
        )
        .groupBy("join_name")
        .agg(
            (F.sum(F.col("colocated") * F.col("picked")) >= 1)
            .cast("long")
            .alias("covered")
        )
    )
    return (
        priced.join(F.broadcast(jcov), "join_name")
        .groupBy("family")
        .agg(
            F.sum("daily_rows").cast("long").alias("daily_rows"),
            F.sum(F.col("daily_rows") * F.col("covered"))
            .cast("long")
            .alias("saved_rows"),
            F.sum(F.col("daily_rows") * (1 - F.col("covered")))
            .cast("long")
            .alias("residual_rows"),
        )
    )


# =====================================================================
# C. Gate-calibration sweeps
# =====================================================================

# the joint calibration grid: nested quality bands around the r17
# [_Q_LO, _Q_HI] production band x token-count floors (dup gates held
# at canonical). Nesting makes the band axis monotone, so marginals
# are non-negative by construction.
_CAL_BANDS = [(5300, 5700), (5100, 5900), (4900, 6100), (4700, 6300)]
_CAL_FLOORS = [10, 20, 40]

# grid explode + per-(cell, doc) admission flag, shared by the whole
# theme: a constant 12x map-side row multiply over the admission
# frame, absorbed by the partial aggregate that follows in each query
_CAL_CTE = (
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
), cell AS (
  SELECT CAST(q_lo AS BIGINT) AS q_lo, CAST(q_hi AS BIGINT) AS q_hi,
         CAST(floor_tok AS BIGINT) AS floor_tok,
         doc_id, source, ntok,
         g_exact * g_near
           * (CASE WHEN mw BETWEEN q_lo AND q_hi THEN 1 ELSE 0 END)
           * (CASE WHEN ntok >= floor_tok THEN 1 ELSE 0 END) AS adm
  FROM grid
)"""
)


def _cal_cells(spark, sf_dir):
    """The Spark mirror of _CAL_CTE's ``cell``: the admission frame
    exploded over the 4-band x 3-floor literal grid with the per-cell
    admission flag. Two map-side literal explodes (12x constant row
    multiply — never a crossJoin) ahead of each query's partial
    aggregate."""
    g = _admission_frame(spark, sf_dir)
    bands = g.select(
        "doc_id",
        "source",
        "ntok",
        "mw",
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
    return grid.select(
        "q_lo",
        "q_hi",
        "floor_tok",
        "doc_id",
        "source",
        "ntok",
        adm.cast("long").alias("adm"),
    )


_CADM_ORACLE = (
    _CAL_CTE
    + """
SELECT q_lo, q_hi, floor_tok,
       CAST(sum(adm) AS BIGINT) AS n_admitted,
       CAST(sum(adm * ntok) AS BIGINT) AS admitted_tokens
FROM cell GROUP BY 1, 2, 3"""
)


@stage(
    "gate_grid_admission_documents",
    _CADM_ORACLE,
    "gate calibration: ADMITTED MASS per (quality band, length floor) "
    "cell — docs and tokens surviving the full funnel with the dup "
    "gates held at canonical and the tunable gates swept over the "
    "4 x 3 literal grid. The raw material of every calibration "
    "decision downstream (bias, frontier, marginals). Shape: one "
    "admission pass, a constant 12x map-side grid explode, one "
    "12-cell aggregate — the explode is absorbed map-side by the "
    "partial agg at any corpus size.",
)
def gate_grid_admission_documents(spark, sf_dir):
    cell = _cal_cells(spark, sf_dir)
    return cell.groupBy("q_lo", "q_hi", "floor_tok").agg(
        F.sum("adm").cast("long").alias("n_admitted"),
        F.sum(F.col("adm") * F.col("ntok"))
        .cast("long")
        .alias("admitted_tokens"),
    )


_CSRC_ORACLE = (
    _CAL_CTE
    + """, pc AS (
  SELECT q_lo, q_hi, floor_tok, source,
         CAST(sum(adm) AS BIGINT) AS n_adm
  FROM cell GROUP BY 1, 2, 3, 4
), tc AS (
  SELECT pc.*, sum(n_adm) OVER (PARTITION BY q_lo, q_hi, floor_tok)
           AS t_adm
  FROM pc
)
SELECT q_lo, q_hi, floor_tok, source, n_adm,
       CASE WHEN t_adm = 0 THEN NULL
            ELSE round(CAST(n_adm AS DOUBLE) / t_adm, 9)
       END AS adm_share
FROM tc"""
)


@stage(
    "gate_grid_source_share_documents",
    _CSRC_ORACLE,
    "gate calibration: the ADMITTED MIX per grid cell — per (band, "
    "floor, source): admitted docs and the within-cell share. The "
    "distribution the bias scalar compresses; kept as a full table "
    "because WHERE the skew lands decides which sources to re-crawl. "
    "All (cell, source) combinations present (the grid explodes over "
    "every doc, admitted or not). Shape: one admission pass, the 12x "
    "grid explode, a (12 x sources) aggregate + one metadata window.",
)
def gate_grid_source_share_documents(spark, sf_dir):
    cell = _cal_cells(spark, sf_dir)
    pc = cell.groupBy("q_lo", "q_hi", "floor_tok", "source").agg(
        F.sum("adm").cast("long").alias("n_adm")
    )
    w = Window.partitionBy("q_lo", "q_hi", "floor_tok")
    return pc.withColumn("t_adm", F.sum("n_adm").over(w)).select(
        "q_lo",
        "q_hi",
        "floor_tok",
        "source",
        "n_adm",
        F.when(F.col("t_adm") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("n_adm").cast("double") / F.col("t_adm"), 9)
        )
        .alias("adm_share"),
    )


_CBIAS_ORACLE = (
    _CAL_CTE
    + """, s1 AS (
  SELECT q_lo, q_hi, floor_tok, source,
         CAST(sum(adm) AS BIGINT) AS adm_s,
         CAST(count(*) AS BIGINT) AS corp_s
  FROM cell GROUP BY 1, 2, 3, 4
), s2 AS (
  SELECT s1.*,
         sum(adm_s) OVER (PARTITION BY q_lo, q_hi, floor_tok) AS a,
         sum(corp_s) OVER (PARTITION BY q_lo, q_hi, floor_tok) AS t
  FROM s1
)
SELECT q_lo, q_hi, floor_tok,
       CAST(max(a) AS BIGINT) AS n_admitted,
       CAST(max(t) AS BIGINT) AS total_docs,
       CAST(sum(abs(adm_s * t - corp_s * a)) AS BIGINT) AS bias_num
FROM s2 GROUP BY 1, 2, 3"""
)


@stage(
    "gate_grid_bias_documents",
    _CBIAS_ORACLE,
    "gate calibration: the EXACT-INTEGER SOURCE BIAS per grid cell — "
    "sum over sources of |admitted_s x corpus_total - corpus_s x "
    "admitted_total|: the cross-multiplied form of the L1 distance "
    "between the admitted and corpus mixes, kept in int64 so the "
    "pareto dominance downstream needs no float tolerance (the "
    "lift-over-PMI trick: compare order-isomorphic rational forms, "
    "never transcendentals). Shape: one admission pass, the 12x grid "
    "explode, a two-level key-bounded aggregate.",
)
def gate_grid_bias_documents(spark, sf_dir):
    cell = _cal_cells(spark, sf_dir)
    s1 = cell.groupBy("q_lo", "q_hi", "floor_tok", "source").agg(
        F.sum("adm").cast("long").alias("adm_s"),
        F.count(F.lit(1)).cast("long").alias("corp_s"),
    )
    w = Window.partitionBy("q_lo", "q_hi", "floor_tok")
    s2 = s1.withColumn("a", F.sum("adm_s").over(w)).withColumn(
        "t", F.sum("corp_s").over(w)
    )
    return s2.groupBy("q_lo", "q_hi", "floor_tok").agg(
        F.max("a").cast("long").alias("n_admitted"),
        F.max("t").cast("long").alias("total_docs"),
        F.sum(
            F.abs(
                F.col("adm_s") * F.col("t")
                - F.col("corp_s") * F.col("a")
            )
        )
        .cast("long")
        .alias("bias_num"),
    )


_CPARETO_ORACLE = (
    _CAL_CTE
    + """, s1 AS (
  SELECT q_lo, q_hi, floor_tok, source,
         CAST(sum(adm) AS BIGINT) AS adm_s,
         CAST(sum(adm * ntok) AS BIGINT) AS tok_s,
         CAST(count(*) AS BIGINT) AS corp_s
  FROM cell GROUP BY 1, 2, 3, 4
), s2 AS (
  SELECT s1.*,
         sum(adm_s) OVER (PARTITION BY q_lo, q_hi, floor_tok) AS a,
         sum(corp_s) OVER (PARTITION BY q_lo, q_hi, floor_tok) AS t
  FROM s1
), ca AS (
  SELECT q_lo, q_hi, floor_tok,
         CAST(sum(tok_s) AS BIGINT) AS admitted_tokens,
         CAST(sum(abs(adm_s * t - corp_s * a)) AS BIGINT) AS bias_num
  FROM s2 GROUP BY 1, 2, 3
), dom AS (
  SELECT ca.*,
         min(bias_num) OVER (ORDER BY admitted_tokens
           RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS minb_higher,
         min(bias_num) OVER (PARTITION BY admitted_tokens)
           AS minb_same
  FROM ca
)
SELECT q_lo, q_hi, floor_tok, admitted_tokens, bias_num,
       CAST(CASE WHEN coalesce(minb_higher <= bias_num, FALSE)
                      OR bias_num > minb_same
                 THEN 1 ELSE 0 END AS BIGINT) AS dominated,
       CAST(CASE WHEN coalesce(minb_higher <= bias_num, FALSE)
                      OR bias_num > minb_same
                 THEN 0 ELSE 1 END AS BIGINT) AS on_frontier
FROM dom"""
)


@stage(
    "gate_pareto_frontier_documents",
    _CPARETO_ORACLE,
    "gate calibration: the PARETO FRONTIER over the grid — a cell is "
    "dominated when another cell admits at least as many tokens with "
    "at most the bias (strict somewhere); both axes are exact int64, "
    "so dominance is integer comparison, no float tolerance. The "
    "skyline is computed with two windows (min bias over strictly- "
    "higher-token cells via RANGE 1 FOLLOWING, min bias within the "
    "token tie) — never an O(cells^2) self-join. Shape: one "
    "admission pass, the 12x grid explode, two metadata windows over "
    "12 rows.",
)
def gate_pareto_frontier_documents(spark, sf_dir):
    cell = _cal_cells(spark, sf_dir)
    s1 = cell.groupBy("q_lo", "q_hi", "floor_tok", "source").agg(
        F.sum("adm").cast("long").alias("adm_s"),
        F.sum(F.col("adm") * F.col("ntok"))
        .cast("long")
        .alias("tok_s"),
        F.count(F.lit(1)).cast("long").alias("corp_s"),
    )
    w = Window.partitionBy("q_lo", "q_hi", "floor_tok")
    s2 = s1.withColumn("a", F.sum("adm_s").over(w)).withColumn(
        "t", F.sum("corp_s").over(w)
    )
    ca = s2.groupBy("q_lo", "q_hi", "floor_tok").agg(
        F.sum("tok_s").cast("long").alias("admitted_tokens"),
        F.sum(
            F.abs(
                F.col("adm_s") * F.col("t")
                - F.col("corp_s") * F.col("a")
            )
        )
        .cast("long")
        .alias("bias_num"),
    )
    w_higher = Window.orderBy("admitted_tokens").rangeBetween(
        1, Window.unboundedFollowing
    )
    w_same = Window.partitionBy("admitted_tokens")
    dom = ca.withColumn(
        "minb_higher", F.min("bias_num").over(w_higher)
    ).withColumn("minb_same", F.min("bias_num").over(w_same))
    dominated = (
        F.coalesce(
            F.col("minb_higher") <= F.col("bias_num"), F.lit(False)
        )
        | (F.col("bias_num") > F.col("minb_same"))
    ).cast("long")
    return dom.select(
        "q_lo",
        "q_hi",
        "floor_tok",
        "admitted_tokens",
        "bias_num",
        dominated.alias("dominated"),
        (1 - dominated).cast("long").alias("on_frontier"),
    )


_CMARG_ORACLE = (
    _CAL_CTE
    + """, ca AS (
  SELECT q_lo, q_hi, floor_tok,
         CAST(sum(adm * ntok) AS BIGINT) AS admitted_tokens
  FROM cell GROUP BY 1, 2, 3
)
SELECT floor_tok, q_lo, q_hi,
       CAST(q_hi - q_lo AS BIGINT) AS band_width,
       admitted_tokens,
       CAST(admitted_tokens - lag(admitted_tokens) OVER (
              PARTITION BY floor_tok ORDER BY q_hi - q_lo)
            AS BIGINT) AS marginal_tokens
FROM ca"""
)


@stage(
    "gate_grid_marginal_tokens_documents",
    _CMARG_ORACLE,
    "gate calibration: MARGINAL TOKENS per band-widening step — "
    "within each length floor, the admitted-token gain from widening "
    "the quality band one step (bands are NESTED, so the marginal is "
    "non-negative by construction; NULL at the narrowest band). The "
    "diminishing-returns curve that says where widening stops paying "
    "for the quality it costs. Shape: the 12-cell aggregate + one "
    "lag window per floor partition — metadata.",
)
def gate_grid_marginal_tokens_documents(spark, sf_dir):
    cell = _cal_cells(spark, sf_dir)
    ca = cell.groupBy("q_lo", "q_hi", "floor_tok").agg(
        F.sum(F.col("adm") * F.col("ntok"))
        .cast("long")
        .alias("admitted_tokens")
    )
    w = Window.partitionBy("floor_tok").orderBy(
        F.col("q_hi") - F.col("q_lo")
    )
    return ca.select(
        "floor_tok",
        "q_lo",
        "q_hi",
        (F.col("q_hi") - F.col("q_lo"))
        .cast("long")
        .alias("band_width"),
        "admitted_tokens",
        (
            F.col("admitted_tokens")
            - F.lag("admitted_tokens").over(w)
        )
        .cast("long")
        .alias("marginal_tokens"),
    )


_CWIT_ORACLE = (
    _CAL_CTE
    + """
SELECT q_lo, q_hi, floor_tok,
       CAST(sum(adm) AS BIGINT) AS n_admitted,
       CAST(sum(adm * doc_id) AS BIGINT) AS id_sum,
       CAST(min(CASE WHEN adm = 1 THEN doc_id END) AS BIGINT)
         AS id_min,
       CAST(max(CASE WHEN adm = 1 THEN doc_id END) AS BIGINT)
         AS id_max
FROM cell GROUP BY 1, 2, 3"""
)


@stage(
    "gate_grid_witness_documents",
    _CWIT_ORACLE,
    "gate calibration: the per-cell REPRODUCIBILITY WITNESS (the r16 "
    "pick-witness convention) — admitted count, exact doc-id sum, "
    "and the admitted id range per grid cell. Two calibration runs "
    "that agree on every witness row admitted the same documents "
    "with near-certainty, without shipping the doc lists. Shape: the "
    "12-cell aggregate, all columns exact int64.",
)
def gate_grid_witness_documents(spark, sf_dir):
    cell = _cal_cells(spark, sf_dir)
    return cell.groupBy("q_lo", "q_hi", "floor_tok").agg(
        F.sum("adm").cast("long").alias("n_admitted"),
        F.sum(F.col("adm") * F.col("doc_id"))
        .cast("long")
        .alias("id_sum"),
        F.min(F.when(F.col("adm") == 1, F.col("doc_id")))
        .cast("long")
        .alias("id_min"),
        F.max(F.when(F.col("adm") == 1, F.col("doc_id")))
        .cast("long")
        .alias("id_max"),
    )
