"""ROUND-20 STAGED catalog queries — seeded in round 14 (three rounds
early: with r14 promoted and r15..r19 banked, this is the FINAL
cohort the 20-round plan calls for, staged in round 14's spare
capacity so rounds 15..19 stay promotion-only and round 20 promotes
this). Deliberately NOT in dce_spark.queries.QUERIES (the freeze
protocol of queries_staging_r5..r19). Round 20 promotes them.

The three themes are the in-code ROUND-20 candidate seeds
(queries.py plan comment) — the closing audits that compose the
whole staged stack into end-to-end, cross-cohort rows:

THE END-TO-END INGEST MANIFEST (A): one oracle-able plan row per
(delivery, epoch, source) chaining the committed machinery end to
end — the r15 arrival-batch cut (delivery = dbatch), the r17/r18
admission gates (a document enters the manifest only if it passes
all four), the r14 curriculum scoring (score = mw + 25*ntok computed
map-side FROM THE ADMISSION FRAME's own columns — bit-identical to
queries_staging_r14._SCORED_CTE because mw IS (1000*nch) div ntok),
the r14 bucket->epoch map and the r15 per-epoch Hamilton slot plan.
This is the artifact a 100 TB ingest actually ships: per delivery,
which (epoch, source) cells received how many documents and tokens,
against which slot quotas, with exact integer token conservation
(audited as first-class rows, not just tests). Every row is pure
arithmetic over the single admission pass + metadata-sized plan
frames (emap <= 7 rows, cells <= epochs x sources), so the manifest
costs ONE corpus scan per delivery at any scale.

CROSS-COHORT INVARIANT ROWS (B): the equivalence identities the
staging harnesses have test-locked since round 14, promoted to
first-class catalog rows with match flags — per-batch funnels
summing to the global funnel (r18's upsert-equivalence protocol),
mergeable-state merge associativity (the identity `dce compact`
rests on), the Hamilton slot bounds (sum == 1000/epoch and the
|slots - exact| < 1 rounding bound), the portfolio's telescoping
marginal-attribution identity (sum of per-layout marginals ==
realized union savings), the converged-CC fixpoint property (one
more hash-min round changes ZERO labels — computed literally, not
assumed), the micro-batch cut partitioning events exactly, and the
r19 per-batch calibration grid summing to the r18 global grid. A
production pipeline alerts on these flags; here each is one exact
integer row both engines derive independently.

WORKLOAD SELF-METRICS (C): the engine pricing ITS OWN workload —
a SHUFFLE_BUDGET.json-shaped literal model (query, family, asserted
exchange budget, this-round measured count, runs/day, driving
table; budget numbers below are the committed artifact's real
values for these twenty sentinels) joined to LIVE table counts:
budget mass by family, the per-table daily scan bill, the
exchange-count census, the top-k daily shuffled-rows ranking, the
budget-vs-measured drift table (the regression alarm the
assert-<= sweep enforces in CI, as data), and the family Lorenz
share. Shape: a 20-row literal explode joined to <= 6 one-row
table counts — pure metadata at any corpus size, while the row
counts keep every number scale-factor-honest.

tests/test_staging_r20.py runs these through the SAME compare
harness as the live catalog at the suite's SF. Every query verified
against its DuckDB oracle at sf0.001 + sf0.01 + sf0.1 before commit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table

# deliberate reuse of the committed cohort machinery — these are
# CONVENTIONS (each documented in its own module); re-declaring any
# of them here would fork the convention the moment one copy changed:
# r13: the exact-integer event micro-batch cut + loop helpers
from .queries_staging_r13 import (
    _EV_BATCH_CTE,  # noqa: F401  (re-export path for the harness)
    _events_batched,
    _hashmin_round,
    _local_result,
)

# r14: curriculum scoring/epochs, the CC closure oracle + fixpoint
# loop, the mergeable state-row convention
from .queries_staging_r14 import (
    _CLOSURE_CTE,
    _IMASK,
    _IMOD,
    _KNUTH,
    _SCORE_BUCKET_SQL,
    _SCORE_EDGES,
    _ST_CTE,
    _converged_labels,
    _epoch_map,
    _type_batch_states,
)

# r15: the per-epoch Hamilton slot plan (and _DNB, the arrival cut)
from .queries_staging_r15 import _DNB, _JSLOTS, _SLOT_CTES, _cell_slots

# r17: the canonical gate order / funnel survival expressions
from .queries_staging_r17 import _SURV_SQL, _surv_col

# r18: the admission frame (gates x arrival batches), the placement
# portfolio chain, the literal-frame pattern, the calibration grid
from .queries_staging_r18 import (
    _ADM_CTE,
    _PORTFOLIO_CTES,
    _admission_frame,
    _cal_cells,
    _cover_frame,
    _lit_frame,
    _portfolio_frame,
    _priced_workload,
    _wl_counts,
)

# r19: the per-batch calibration grid (the drift loop's telemetry)
from .queries_staging_r19 import _CALB_CTE, _cal_metrics_by_batch

STAGED_R20: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R20[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R20[name].oracle


def _chain(cte: str) -> str:
    """Strip a chain's leading WITH so it can be spliced after another
    chain in one WITH list (the _GRAPH_RCTE replace trick,
    generalized; CTE names across the spliced chains are disjoint —
    asserted where used)."""
    s = cte.strip()
    assert s.startswith("WITH ")
    return s[len("WITH "):]


# =====================================================================
# A. The end-to-end ingest manifest
# =====================================================================

# admission frame (gates + arrival batch) ++ the r14/r15 curriculum
# chain (scored/emap/grid/cells), then: adm flag + the r14 difficulty
# score REBUILT FROM THE ADMISSION FRAME'S OWN COLUMNS (score =
# mw + 25*ntok == (1000*nch) div ntok + 25*ntok — the exact
# _SCORED_CTE definition, no second corpus scan), the fixed-edge
# bucket, the bucket->epoch join, and the manifest cell rollup.
# CTE names across the two chains are disjoint (asserted below).
_MAN_CTE = (
    _ADM_CTE
    + ", "
    + _chain(_SLOT_CTES)
    + f""", adoc0 AS (
  SELECT gb.doc_id, gb.source, gb.ntok, gb.dbatch,
         gb.g_exact * gb.g_near * gb.g_qual * gb.g_len AS adm,
         CAST(gb.mw + 25 * gb.ntok AS BIGINT) AS score
  FROM gb
), adoc AS (
  SELECT doc_id, source, ntok, dbatch, adm,
         CAST({_SCORE_BUCKET_SQL} AS BIGINT) AS bucket
  FROM adoc0
), mcell AS (
  SELECT a.dbatch, e.epoch, a.source,
         CAST(sum(a.adm) AS BIGINT) AS n_docs,
         CAST(sum(a.adm * a.ntok) AS BIGINT) AS tokens
  FROM adoc a JOIN emap e ON e.bucket = a.bucket
  GROUP BY 1, 2, 3
  HAVING sum(a.adm) > 0
)"""
)

for _nm in (" adoc0 AS (", " adoc AS (", " mcell AS ("):
    assert _MAN_CTE.count(_nm) == 1, _nm  # spliced chains stay disjoint


def _man_docs(spark, sf_dir):
    """(doc_id, source, ntok, dbatch, adm, bucket, epoch) — the Spark
    mirror of _MAN_CTE's ``adoc`` joined to ``emap``: ONE admission
    pass (the r18 frame), then map-side score/bucket expressions and
    a <= 7-row broadcast join. No second corpus scan — the score is
    rebuilt from the frame's own (mw, ntok) columns, bit-identical to
    queries_staging_r14._scored_docs by construction."""
    g = _admission_frame(spark, sf_dir)
    adm = (
        F.col("g_exact")
        * F.col("g_near")
        * F.col("g_qual")
        * F.col("g_len")
    ).cast("long")
    score = (F.col("mw") + F.lit(25) * F.col("ntok")).cast("long")
    base = g.select(
        "doc_id",
        "source",
        "ntok",
        "dbatch",
        adm.alias("adm"),
        score.alias("score"),
    )
    bucket = None
    for e in _SCORE_EDGES:
        t = (F.col("score") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    base = base.withColumn("bucket", bucket.cast("long"))
    emap = _epoch_map(spark, sf_dir).select("bucket", "epoch")
    return base.join(F.broadcast(emap), "bucket")


def _manifest_cells(spark, sf_dir):
    """The Spark mirror of _MAN_CTE's ``mcell``: one manifest row per
    (delivery, epoch, source) with admitted docs and exact admitted
    tokens — the grouped rollup of the single admission pass."""
    return (
        _man_docs(spark, sf_dir)
        .groupBy("dbatch", "epoch", "source")
        .agg(
            F.sum("adm").cast("long").alias("n_docs"),
            F.sum(F.col("adm") * F.col("ntok"))
            .cast("long")
            .alias("tokens"),
        )
        .filter(F.col("n_docs") > 0)
    )


_MROWS_ORACLE = (
    _MAN_CTE
    + """, mr AS (
  SELECT m.dbatch, m.epoch, m.source, m.n_docs, m.tokens, c.slots,
         CAST(sum(m.tokens) OVER (PARTITION BY m.epoch, m.source)
              AS BIGINT) AS cell_tokens
  FROM mcell m JOIN cells c
    ON c.epoch = m.epoch AND c.source = m.source
)
SELECT dbatch, epoch, source, n_docs, tokens, slots, cell_tokens,
       CAST((slots * tokens) // cell_tokens AS BIGINT)
         AS delivery_slots
FROM mr"""
)


@stage(
    "manifest_rows_documents",
    _MROWS_ORACLE,
    "ingest manifest: THE MANIFEST — one row per (delivery, epoch, "
    "source): admitted docs and exact admitted tokens (all four r17 "
    "gates), the cell's slot quota from the r15 per-epoch Hamilton "
    "plan, the cell's total admitted tokens across deliveries, and "
    "the delivery's exact integer pro-rata slot share. This is the "
    "plan row an ingest job ships per delivery; everything else in "
    "the theme audits it. Scale: one admission pass per delivery, "
    "score/bucket map-side from the frame's own columns, a <= 7-row "
    "broadcast epoch join, a <= 5 x 4 x sources-row window.",
)
def manifest_rows_documents(spark, sf_dir):
    m = _manifest_cells(spark, sf_dir)
    cells = _cell_slots(spark, sf_dir).select("epoch", "source", "slots")
    wc = Window.partitionBy("epoch", "source")
    out = m.join(F.broadcast(cells), ["epoch", "source"]).withColumn(
        "cell_tokens", F.sum("tokens").over(wc).cast("long")
    )
    return out.select(
        "dbatch",
        "epoch",
        "source",
        "n_docs",
        "tokens",
        "slots",
        "cell_tokens",
        F.expr("slots * tokens div cell_tokens")
        .cast("long")
        .alias("delivery_slots"),
    )


_MCONS_ORACLE = (
    _MAN_CTE
    + """, direct AS (
  SELECT dbatch, CAST(sum(adm) AS BIGINT) AS n_admitted,
         CAST(sum(adm * ntok) AS BIGINT) AS tokens_admitted
  FROM adoc GROUP BY 1
), viam AS (
  SELECT dbatch, CAST(sum(n_docs) AS BIGINT) AS n_manifest,
         CAST(sum(tokens) AS BIGINT) AS tokens_manifest
  FROM mcell GROUP BY 1
)
SELECT d.dbatch, d.n_admitted, v.n_manifest,
       d.tokens_admitted, v.tokens_manifest,
       CAST(d.n_admitted = v.n_manifest
            AND d.tokens_admitted = v.tokens_manifest AS BIGINT)
         AS conserved
FROM direct d JOIN viam v ON v.dbatch = d.dbatch"""
)


@stage(
    "manifest_token_conservation_documents",
    _MCONS_ORACLE,
    "ingest manifest: TOKEN CONSERVATION — per delivery, the admitted "
    "doc/token totals computed DIRECTLY from the gate flags next to "
    "the same totals summed back out of the manifest cells, with the "
    "exact-equality flag. A manifest that loses or double-counts a "
    "cell (a dropped epoch join row, a duplicated source key) fails "
    "this row before a single byte ships — the audit a 100 TB ingest "
    "runs per delivery because re-deriving it later means re-scanning "
    "the delivery. Spark side computes the direct totals from the "
    "admission frame WITHOUT the epoch join, so the two sides take "
    "genuinely different paths to the same integers.",
)
def manifest_token_conservation_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    adm = (
        F.col("g_exact")
        * F.col("g_near")
        * F.col("g_qual")
        * F.col("g_len")
    ).cast("long")
    direct = g.select("dbatch", adm.alias("adm"), "ntok").groupBy(
        "dbatch"
    ).agg(
        F.sum("adm").cast("long").alias("n_admitted"),
        F.sum(F.col("adm") * F.col("ntok"))
        .cast("long")
        .alias("tokens_admitted"),
    )
    viam = _manifest_cells(spark, sf_dir).groupBy("dbatch").agg(
        F.sum("n_docs").cast("long").alias("n_manifest"),
        F.sum("tokens").cast("long").alias("tokens_manifest"),
    )
    eq = (F.col("n_admitted") == F.col("n_manifest")) & (
        F.col("tokens_admitted") == F.col("tokens_manifest")
    )
    return direct.join(viam, "dbatch").select(
        "dbatch",
        "n_admitted",
        "n_manifest",
        "tokens_admitted",
        "tokens_manifest",
        eq.cast("long").alias("conserved"),
    )


_MRECON_ORACLE = (
    _MAN_CTE
    + """, raw AS (
  SELECT dbatch, CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(1 - adm) AS BIGINT) AS n_rejected,
         CAST(sum(ntok) AS BIGINT) AS tokens_raw,
         CAST(sum((1 - adm) * ntok) AS BIGINT) AS tokens_rejected
  FROM adoc GROUP BY 1
), viam AS (
  SELECT dbatch, CAST(sum(n_docs) AS BIGINT) AS n_admitted,
         CAST(sum(tokens) AS BIGINT) AS tokens_admitted
  FROM mcell GROUP BY 1
)
SELECT r.dbatch, r.n_raw, v.n_admitted, r.n_rejected,
       r.tokens_raw, v.tokens_admitted, r.tokens_rejected,
       CAST(r.n_raw = v.n_admitted + r.n_rejected
            AND r.tokens_raw = v.tokens_admitted + r.tokens_rejected
            AS BIGINT) AS reconciled
FROM raw r JOIN viam v ON v.dbatch = r.dbatch"""
)


@stage(
    "manifest_reconciliation_documents",
    _MRECON_ORACLE,
    "ingest manifest: DELIVERY RECONCILIATION — per delivery, the raw "
    "doc/token intake next to the manifest's admitted mass and the "
    "directly-counted rejected mass, with the flag that the two "
    "sides PARTITION the intake exactly (raw == manifest-admitted + "
    "rejected, docs AND tokens). The admitted side deliberately "
    "comes from the MANIFEST cells and the rejected side from the "
    "raw gate flags — a cross-derivation, so a manifest that "
    "diverges from the funnel cannot reconcile. Scale: two grouped "
    "rollups of the one admission pass.",
)
def manifest_reconciliation_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    adm = (
        F.col("g_exact")
        * F.col("g_near")
        * F.col("g_qual")
        * F.col("g_len")
    ).cast("long")
    raw = g.select("dbatch", adm.alias("adm"), "ntok").groupBy(
        "dbatch"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.lit(1) - F.col("adm")).cast("long").alias("n_rejected"),
        F.sum("ntok").cast("long").alias("tokens_raw"),
        F.sum((F.lit(1) - F.col("adm")) * F.col("ntok"))
        .cast("long")
        .alias("tokens_rejected"),
    )
    viam = _manifest_cells(spark, sf_dir).groupBy("dbatch").agg(
        F.sum("n_docs").cast("long").alias("n_admitted"),
        F.sum("tokens").cast("long").alias("tokens_admitted"),
    )
    ok = (
        F.col("n_raw") == F.col("n_admitted") + F.col("n_rejected")
    ) & (
        F.col("tokens_raw")
        == F.col("tokens_admitted") + F.col("tokens_rejected")
    )
    return raw.join(viam, "dbatch").select(
        "dbatch",
        "n_raw",
        "n_admitted",
        "n_rejected",
        "tokens_raw",
        "tokens_admitted",
        "tokens_rejected",
        ok.cast("long").alias("reconciled"),
    )


_MCOVER_ORACLE = (
    _MAN_CTE
    + """, gsrc AS (
  SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources_total
  FROM documents
)
SELECT m.dbatch, m.epoch,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(count(DISTINCT m.source) AS BIGINT) AS n_sources,
       CAST(sum(m.n_docs) AS BIGINT) AS n_docs,
       CAST(sum(m.tokens) AS BIGINT) AS tokens,
       g.n_sources_total,
       CAST(count(DISTINCT m.source) = g.n_sources_total AS BIGINT)
         AS complete
FROM mcell m CROSS JOIN gsrc g
GROUP BY m.dbatch, m.epoch, g.n_sources_total"""
)


@stage(
    "manifest_epoch_coverage_documents",
    _MCOVER_ORACLE,
    "ingest manifest: EPOCH COVERAGE — per (delivery, epoch): how "
    "many (source) cells the delivery actually filled, the admitted "
    "mass, and the completeness flag against the corpus's source "
    "universe. An epoch a delivery leaves source-incomplete starves "
    "the curriculum's mix for that slice of training — this row is "
    "the readiness gate a scheduler checks before pointing a run at "
    "the delivery. Scale: a grouped rollup of the manifest cells "
    "plus one scalar (1-row broadcast) source count.",
)
def manifest_epoch_coverage_documents(spark, sf_dir):
    m = _manifest_cells(spark, sf_dir)
    gsrc = (
        load_table(spark, sf_dir, "documents")
        .agg(F.countDistinct("source").cast("long").alias("n_sources_total"))
    )
    out = (
        m.groupBy("dbatch", "epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("tokens").cast("long").alias("tokens"),
        )
        .crossJoin(F.broadcast(gsrc))
    )
    return out.select(
        "dbatch",
        "epoch",
        "n_cells",
        "n_sources",
        "n_docs",
        "tokens",
        "n_sources_total",
        (F.col("n_sources") == F.col("n_sources_total"))
        .cast("long")
        .alias("complete"),
    )


_MUTIL_ORACLE = (
    _MAN_CTE
    + """, cellsum AS (
  SELECT epoch, source, CAST(sum(n_docs) AS BIGINT) AS supply_docs,
         CAST(sum(tokens) AS BIGINT) AS supply_tokens
  FROM mcell GROUP BY 1, 2
)
SELECT c.epoch, c.source, c.slots,
       CAST(coalesce(s.supply_docs, 0) AS BIGINT) AS supply_docs,
       CAST(coalesce(s.supply_tokens, 0) AS BIGINT) AS supply_tokens,
       CAST(least(c.slots, CAST(coalesce(s.supply_docs, 0) AS BIGINT))
            AS BIGINT) AS n_picked,
       CAST(greatest(CAST(0 AS BIGINT),
                     c.slots - CAST(coalesce(s.supply_docs, 0)
                                    AS BIGINT)) AS BIGINT) AS shortfall,
       CASE WHEN CAST(coalesce(s.supply_docs, 0) AS BIGINT) < c.slots
            THEN 'supply' ELSE 'slots' END AS binding
FROM cells c LEFT JOIN cellsum s
  ON s.epoch = c.epoch AND s.source = c.source"""
)


@stage(
    "manifest_slot_utilization_documents",
    _MUTIL_ORACLE,
    "ingest manifest: SLOT UTILIZATION — per planned (epoch, source) "
    "cell: the r15 Hamilton quota vs the ADMITTED supply the "
    "manifest actually delivers across all deliveries, the picks a "
    "quota-bounded sampler would make, the shortfall, and which "
    "constraint BINDS (supply-bound cells under-deliver the planned "
    "mix — the alarm; slot-bound cells have headroom). The plan "
    "grid was sized on the raw corpus, admission shrinks it — this "
    "row prices that gap exactly. Scale: a grouped manifest rollup "
    "LEFT-joined under the metadata-sized plan grid (planned cells "
    "with zero admitted supply must still appear — coalesce, never "
    "drop).",
)
def manifest_slot_utilization_documents(spark, sf_dir):
    cells = _cell_slots(spark, sf_dir).select("epoch", "source", "slots")
    cellsum = _manifest_cells(spark, sf_dir).groupBy("epoch", "source").agg(
        F.sum("n_docs").cast("long").alias("supply_docs"),
        F.sum("tokens").cast("long").alias("supply_tokens"),
    )
    out = cells.join(F.broadcast(cellsum), ["epoch", "source"], "left")
    supply = F.coalesce(F.col("supply_docs"), F.lit(0)).cast("long")
    return out.select(
        "epoch",
        "source",
        "slots",
        supply.alias("supply_docs"),
        F.coalesce(F.col("supply_tokens"), F.lit(0))
        .cast("long")
        .alias("supply_tokens"),
        F.least(F.col("slots"), supply).cast("long").alias("n_picked"),
        F.greatest(F.lit(0).cast("long"), F.col("slots") - supply)
        .cast("long")
        .alias("shortfall"),
        F.when(supply < F.col("slots"), F.lit("supply"))
        .otherwise(F.lit("slots"))
        .alias("binding"),
    )


_MHEADS_ORACLE = (
    _MAN_CTE
    + f""", akey AS (
  SELECT a.dbatch, e.epoch, a.doc_id, a.source,
         CAST(((a.doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD} AS BIGINT)
           AS ikey
  FROM adoc a JOIN emap e ON e.bucket = a.bucket
  WHERE a.adm = 1
), heads AS (
  SELECT *, row_number() OVER (PARTITION BY dbatch, epoch
                               ORDER BY ikey, doc_id) AS pos
  FROM akey
)
SELECT dbatch, epoch, CAST(pos AS BIGINT) AS position,
       doc_id, source, ikey
FROM heads WHERE pos <= 3"""
)


@stage(
    "manifest_delivery_head_documents",
    _MHEADS_ORACLE,
    "ingest manifest: DELIVERY HEADS — the first 3 admitted documents "
    "per (delivery, epoch) under the r14 deterministic interleave "
    "key (masked multiplicative hash; the same key the r16 sampler "
    "picks by), as reproducibility witnesses: any engine, any "
    "partitioning must produce these exact rows, so a re-run of the "
    "ingest can be spot-checked against the manifest in O(1). "
    "Scale: the rank is a bounded-k per-(delivery, epoch) top-k — a "
    "partial top-k + merge, never a global sort.",
)
def manifest_delivery_head_documents(spark, sf_dir):
    akey = (
        _man_docs(spark, sf_dir)
        .filter(F.col("adm") == 1)
        .select(
            "dbatch",
            "epoch",
            "doc_id",
            "source",
            F.expr(f"((doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD}")
            .cast("long")
            .alias("ikey"),
        )
    )
    w = Window.partitionBy("dbatch", "epoch").orderBy("ikey", "doc_id")
    return (
        akey.withColumn("position", F.row_number().over(w).cast("long"))
        .filter(F.col("position") <= 3)
        .select("dbatch", "epoch", "position", "doc_id", "source", "ikey")
    )


# target shard size = global admitted tokens div (8 shards per
# delivery x _DNB deliveries) — scale-free (a row-count ratio), so
# the shard plan is the same shape at any corpus size
_SHARD_DENOM = 8 * _DNB

_POW2_SQL = " + ".join(
    f"CASE WHEN raw_shards > {1 << k} THEN {1 << k} ELSE 0 END"
    for k in range(13)
)

_MSHARDS_ORACLE = (
    _MAN_CTE
    + f""", dtok AS (
  SELECT dbatch, CAST(sum(adm * ntok) AS BIGINT) AS tokens
  FROM adoc GROUP BY 1
), gtot AS (
  SELECT CAST(greatest(CAST(1 AS BIGINT),
              CAST(sum(tokens) // {_SHARD_DENOM} AS BIGINT))
         AS BIGINT) AS target
  FROM dtok
), shr AS (
  SELECT d.dbatch, d.tokens, g.target,
         CAST((d.tokens + g.target - 1) // g.target AS BIGINT)
           AS raw_shards
  FROM dtok d CROSS JOIN gtot g
)
SELECT dbatch, tokens, target AS target_tokens, raw_shards,
       CAST(1 + {_POW2_SQL} AS BIGINT) AS shards_pow2
FROM shr"""
)


@stage(
    "manifest_write_shards_documents",
    _MSHARDS_ORACLE,
    "ingest manifest: the WRITE-SHARD PLAN — per delivery: admitted "
    "tokens, the scale-free target shard size (global admitted "
    "tokens div 8*deliveries — a pure ratio, so the plan holds at "
    "any corpus size), the exact ceiling-division shard count, and "
    "the power-of-2 rounding a bucketed writer wants (shuffle "
    "partition counts compose under splits/merges only at powers of "
    "two). pow2 is the exact fixed-edge identity 1 + sum_k 2^k * "
    "[raw > 2^k] — the boolean-sum convention, bit-identical on any "
    "engine, no floats, no log2. Scale: one grouped rollup + two "
    "scalar broadcasts.",
)
def manifest_write_shards_documents(spark, sf_dir):
    g = _admission_frame(spark, sf_dir)
    adm = (
        F.col("g_exact")
        * F.col("g_near")
        * F.col("g_qual")
        * F.col("g_len")
    ).cast("long")
    dtok = g.select("dbatch", (adm * F.col("ntok")).alias("atok")).groupBy(
        "dbatch"
    ).agg(F.sum("atok").cast("long").alias("tokens"))
    gtot = dtok.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"sum(tokens) div {_SHARD_DENOM}").cast("long"),
        ).alias("target")
    )
    shr = dtok.crossJoin(F.broadcast(gtot)).withColumn(
        "raw_shards",
        F.expr("(tokens + target - 1) div target").cast("long"),
    )
    pow2 = F.lit(1).cast("long")
    for k in range(13):
        pow2 = pow2 + F.when(
            F.col("raw_shards") > F.lit(1 << k), F.lit(1 << k)
        ).otherwise(F.lit(0)).cast("long")
    return shr.select(
        "dbatch",
        "tokens",
        F.col("target").alias("target_tokens"),
        "raw_shards",
        pow2.cast("long").alias("shards_pow2"),
    )


# =====================================================================
# B. Cross-cohort invariant rows
# =====================================================================

_IFUNNEL_ORACLE = (
    _ADM_CTE
    + f""", st AS (
  SELECT g.*, unnest([0, 1, 2, 3, 4]) AS stage FROM gb g
), surv AS (
  SELECT dbatch, stage, ntok, {_SURV_SQL} AS s FROM st
), pb AS (
  SELECT CAST(stage AS BIGINT) AS stage, dbatch,
         CAST(sum(s) AS BIGINT) AS n,
         CAST(sum(s * ntok) AS BIGINT) AS tok
  FROM surv GROUP BY 1, 2
), viab AS (
  SELECT stage, CAST(sum(n) AS BIGINT) AS n_via_batches,
         CAST(sum(tok) AS BIGINT) AS tokens_via_batches
  FROM pb GROUP BY 1
), gfun AS (
  SELECT CAST(stage AS BIGINT) AS stage,
         CAST(sum(s) AS BIGINT) AS n_global,
         CAST(sum(s * ntok) AS BIGINT) AS tokens_global
  FROM surv GROUP BY 1
)
SELECT g.stage, g.n_global, v.n_via_batches,
       g.tokens_global, v.tokens_via_batches,
       CAST(g.n_global = v.n_via_batches
            AND g.tokens_global = v.tokens_via_batches AS BIGINT)
         AS funnel_match
FROM gfun g JOIN viab v ON v.stage = g.stage"""
)


@stage(
    "invariant_funnel_batch_sum_documents",
    _IFUNNEL_ORACLE,
    "cross-cohort invariant: PER-BATCH FUNNELS SUM TO THE GLOBAL "
    "FUNNEL — per canonical gate stage: the r17 global survivor "
    "count/token mass next to the same stage summed out of the r18 "
    "per-delivery funnels, with the match flag. This is the r18 "
    "upsert-equivalence protocol (at-arrival dup gates equal global "
    "ones because both reject against a strictly smaller doc_id), "
    "which until now only a staging TEST locked — promoted to a "
    "first-class row a pipeline can alert on. Scale: one admission "
    "pass, a constant 5x stage explode, two grouped rollups.",
)
def invariant_funnel_batch_sum_documents(spark, sf_dir):
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
    pb = st.groupBy("stage", "dbatch").agg(
        F.sum("s").cast("long").alias("n"),
        F.sum(F.col("s") * F.col("ntok")).cast("long").alias("tok"),
    )
    viab = pb.groupBy("stage").agg(
        F.sum("n").cast("long").alias("n_via_batches"),
        F.sum("tok").cast("long").alias("tokens_via_batches"),
    )
    glob = st.groupBy("stage").agg(
        F.sum("s").cast("long").alias("n_global"),
        F.sum(F.col("s") * F.col("ntok"))
        .cast("long")
        .alias("tokens_global"),
    )
    eq = (F.col("n_global") == F.col("n_via_batches")) & (
        F.col("tokens_global") == F.col("tokens_via_batches")
    )
    return glob.join(viab, "stage").select(
        "stage",
        "n_global",
        "n_via_batches",
        "tokens_global",
        "tokens_via_batches",
        eq.cast("long").alias("funnel_match"),
    )


_IMERGE_ORACLE = (
    _ST_CTE
    + """, one AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS n_one,
         CAST(sum(n_high) AS BIGINT) AS nh1,
         CAST(sum(n_common) AS BIGINT) AS nc1,
         CAST(sum(sum_cents) AS BIGINT) AS sum_cents_one,
         CAST(max(max_es) AS BIGINT) AS max_es_one
  FROM st GROUP BY 1
), lvl AS (
  SELECT event_type,
         CASE WHEN batch <= 1 THEN 0 ELSE 1 END AS half,
         CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(n_high) AS BIGINT) AS n_high,
         CAST(sum(n_common) AS BIGINT) AS n_common,
         CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
         CAST(max(max_es) AS BIGINT) AS max_es
  FROM st GROUP BY 1, 2
), two AS (
  SELECT event_type,
         CAST(sum(n) AS BIGINT) AS n_two,
         CAST(sum(n_high) AS BIGINT) AS nh2,
         CAST(sum(n_common) AS BIGINT) AS nc2,
         CAST(sum(sum_cents) AS BIGINT) AS sum_cents_two,
         CAST(max(max_es) AS BIGINT) AS max_es_two
  FROM lvl GROUP BY 1
)
SELECT o.event_type, o.n_one, t.n_two,
       o.sum_cents_one, t.sum_cents_two,
       o.max_es_one, t.max_es_two,
       CAST(o.n_one = t.n_two AND o.nh1 = t.nh2 AND o.nc1 = t.nc2
            AND o.sum_cents_one = t.sum_cents_two
            AND o.max_es_one = t.max_es_two AS BIGINT) AS assoc_match
FROM one o JOIN two t ON t.event_type = o.event_type"""
)


@stage(
    "invariant_merge_associativity_events",
    _IMERGE_ORACLE,
    "cross-cohort invariant: MERGE ASSOCIATIVITY — per event_type, "
    "the 5 per-batch mergeable state rows merged in ONE level next "
    "to the same rows merged through an intermediate two-partial "
    "tree (batches {0,1} and {2,3,4} compacted first, then merged), "
    "with the all-five-families match flag. Associativity is the "
    "identity `dce compact` and every multi-day ledger rollup rest "
    "on (compact-then-merge == merge); r14 proved merged == "
    "recomputed against the raw rows, this row proves the merge "
    "tree itself can be re-bracketed freely. Exact integer sums/max "
    "make the flag bit-for-bit. Scale: state arithmetic over the "
    "committed ledger rows only — zero row re-scan.",
)
def invariant_merge_associativity_events(spark, sf_dir):
    st = _type_batch_states(spark, sf_dir)
    one = st.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_one"),
        F.sum("n_high").cast("long").alias("nh1"),
        F.sum("n_common").cast("long").alias("nc1"),
        F.sum("sum_cents").cast("long").alias("sum_cents_one"),
        F.max("max_es").cast("long").alias("max_es_one"),
    )
    lvl = st.withColumn(
        "half", (F.col("batch") > 1).cast("long")
    ).groupBy("event_type", "half").agg(
        F.sum("n").alias("n"),
        F.sum("n_high").alias("n_high"),
        F.sum("n_common").alias("n_common"),
        F.sum("sum_cents").alias("sum_cents"),
        F.max("max_es").alias("max_es"),
    )
    two = lvl.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_two"),
        F.sum("n_high").cast("long").alias("nh2"),
        F.sum("n_common").cast("long").alias("nc2"),
        F.sum("sum_cents").cast("long").alias("sum_cents_two"),
        F.max("max_es").cast("long").alias("max_es_two"),
    )
    eq = (
        (F.col("n_one") == F.col("n_two"))
        & (F.col("nh1") == F.col("nh2"))
        & (F.col("nc1") == F.col("nc2"))
        & (F.col("sum_cents_one") == F.col("sum_cents_two"))
        & (F.col("max_es_one") == F.col("max_es_two"))
    )
    return one.join(two, "event_type").select(
        "event_type",
        "n_one",
        "n_two",
        "sum_cents_one",
        "sum_cents_two",
        "max_es_one",
        "max_es_two",
        eq.cast("long").alias("assoc_match"),
    )


_IHAM_ORACLE = (
    _SLOT_CTES
    + f"""
SELECT epoch,
       CAST(sum(slots) AS BIGINT) AS slot_sum,
       CAST({_JSLOTS} AS BIGINT) AS expected,
       CAST(sum(slots) = {_JSLOTS} AS BIGINT) AS sum_match,
       CAST(sum(CASE WHEN abs(slots * etok - {_JSLOTS} * tokens)
                          >= etok
                THEN 1 ELSE 0 END) AS BIGINT) AS n_bound_violations,
       CAST(sum(CASE WHEN abs(slots * etok - {_JSLOTS} * tokens)
                          >= etok
                THEN 1 ELSE 0 END) = 0 AS BIGINT) AS bound_match
FROM cells GROUP BY 1"""
)


@stage(
    "invariant_slots_hamilton_documents",
    _IHAM_ORACLE,
    "cross-cohort invariant: the HAMILTON ROUNDING GUARANTEES — per "
    "epoch: the slot sum next to the exact 1000-slot budget (sum "
    "flag), and the count of cells violating the |slots - exact "
    "share| < 1 largest-remainder bound, checked in the EXACT "
    "cross-multiplied integer form |slots*etok - 1000*tokens| < "
    "etok (no float shares anywhere — the r13 L1 convention). "
    "These are the two properties that make the r15/r16 sampler "
    "plan sound: budgets land exactly and no source is off by a "
    "whole slot. Scale: pure window/aggregate arithmetic over the "
    "metadata-sized cell grid.",
)
def invariant_slots_hamilton_documents(spark, sf_dir):
    cells = _cell_slots(spark, sf_dir)
    viol = (
        F.abs(
            F.col("slots") * F.col("etok")
            - F.lit(_JSLOTS) * F.col("tokens")
        )
        >= F.col("etok")
    ).cast("long")
    out = cells.select("epoch", "slots", viol.alias("viol")).groupBy(
        "epoch"
    ).agg(
        F.sum("slots").cast("long").alias("slot_sum"),
        F.sum("viol").cast("long").alias("n_bound_violations"),
    )
    return out.select(
        "epoch",
        "slot_sum",
        F.lit(_JSLOTS).cast("long").alias("expected"),
        (F.col("slot_sum") == _JSLOTS).cast("long").alias("sum_match"),
        "n_bound_violations",
        (F.col("n_bound_violations") == 0)
        .cast("long")
        .alias("bound_match"),
    )


_IPORT_ORACLE = (
    _PORTFOLIO_CTES
    + """, jbill AS (
  SELECT join_name, CAST(sum(daily_rows) AS BIGINT) AS daily_rows
  FROM priced GROUP BY 1
), jfirst AS (
  SELECT c.join_name,
         CAST(min(CASE WHEN p.picked = 1 AND c.colocated = 1
                       THEN p.rnk END) AS BIGINT) AS first_rnk
  FROM cover c JOIN portfolio p ON p.layout = c.layout
  GROUP BY 1
), jf AS (
  SELECT f.join_name, f.first_rnk, b.daily_rows
  FROM jfirst f JOIN jbill b ON b.join_name = f.join_name
), mbr AS (
  SELECT first_rnk AS rnk, CAST(sum(daily_rows) AS BIGINT) AS m
  FROM jf WHERE first_rnk IS NOT NULL GROUP BY 1
), marg AS (
  SELECT p.rnk, p.layout, p.picked,
         CAST(coalesce(m.m, 0) AS BIGINT) AS marginal_saved
  FROM portfolio p LEFT JOIN mbr m ON m.rnk = p.rnk
), msum AS (
  SELECT CAST(sum(marginal_saved) AS BIGINT) AS sum_marginals
  FROM marg
), rtot AS (
  SELECT CAST(coalesce(sum(daily_rows), 0) AS BIGINT)
           AS realized_total
  FROM jf WHERE first_rnk IS NOT NULL
)
SELECT g.rnk, g.layout, g.picked, g.marginal_saved,
       s.sum_marginals, t.realized_total,
       CAST(s.sum_marginals = t.realized_total AS BIGINT)
         AS telescoping_match
FROM marg g CROSS JOIN msum s CROSS JOIN rtot t"""
)


@stage(
    "invariant_portfolio_marginals_tpch",
    _IPORT_ORACLE,
    "cross-cohort invariant: PORTFOLIO MARGINAL TELESCOPING — per "
    "layout in the r18 ROI ranking: the marginal realized savings "
    "under first-covering-rank attribution (each workload join's "
    "bill goes to the HIGHEST-ranked picked layout covering it), "
    "next to the identity that these marginals sum EXACTLY to the "
    "realized union savings (a join stops shuffling once). r18's "
    "realized-coverage audit priced the additive double-count per "
    "join; this row locks the attribution algebra per layout — the "
    "number a platform team reports per investment without ever "
    "double-booking a saved shuffle. Scale: metadata arithmetic "
    "over the <= 5-row portfolio chain.",
)
def invariant_portfolio_marginals_tpch(spark, sf_dir):
    counts = _wl_counts(spark, sf_dir)
    priced = _priced_workload(spark, sf_dir)
    cover = _cover_frame(spark, sf_dir, counts)
    pf = _portfolio_frame(spark, sf_dir)
    jbill = priced.groupBy("join_name").agg(
        F.sum("daily_rows").cast("long").alias("daily_rows")
    )
    jfirst = (
        cover.join(
            F.broadcast(pf.select("layout", "rnk", "picked")), "layout"
        )
        .groupBy("join_name")
        .agg(
            F.min(
                F.when(
                    (F.col("picked") == 1) & (F.col("colocated") == 1),
                    F.col("rnk"),
                )
            )
            .cast("long")
            .alias("first_rnk")
        )
    )
    jf = jfirst.join(jbill, "join_name")
    mbr = (
        jf.filter(F.col("first_rnk").isNotNull())
        .groupBy(F.col("first_rnk").alias("rnk"))
        .agg(F.sum("daily_rows").cast("long").alias("m"))
    )
    marg = (
        pf.select("rnk", "layout", "picked")
        .join(F.broadcast(mbr), "rnk", "left")
        .select(
            "rnk",
            "layout",
            "picked",
            F.coalesce(F.col("m"), F.lit(0))
            .cast("long")
            .alias("marginal_saved"),
        )
    )
    msum = marg.agg(
        F.sum("marginal_saved").cast("long").alias("sum_marginals")
    )
    rtot = jf.filter(F.col("first_rnk").isNotNull()).agg(
        F.coalesce(F.sum("daily_rows"), F.lit(0))
        .cast("long")
        .alias("realized_total")
    )
    return (
        marg.crossJoin(F.broadcast(msum))
        .crossJoin(F.broadcast(rtot))
        .select(
            "rnk",
            "layout",
            "picked",
            "marginal_saved",
            "sum_marginals",
            "realized_total",
            (F.col("sum_marginals") == F.col("realized_total"))
            .cast("long")
            .alias("telescoping_match"),
        )
    )


_IFIX_ORACLE = (
    _CLOSURE_CTE
    + """, nbrmin AS (
  SELECT e.a AS v, CAST(min(c2.component) AS BIGINT) AS nmin
  FROM edges e JOIN comp c2 ON c2.v = e.b GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(CASE WHEN least(c.component,
                               coalesce(n.nmin, c.component))
                          <> c.component THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(sum(CASE WHEN least(c.component,
                               coalesce(n.nmin, c.component))
                          <> c.component THEN 1 ELSE 0 END) = 0
            AS BIGINT) AS fixpoint
FROM comp c LEFT JOIN nbrmin n ON n.v = c.v"""
)


@stage(
    "invariant_cc_fixpoint_documents",
    _IFIX_ORACLE,
    "cross-cohort invariant: the CC FIXPOINT PROPERTY — run the r14 "
    "driver-side hash-min loop to convergence, then run ONE MORE "
    "synchronous round and count the labels it changes: exactly "
    "zero, computed literally on both engines (Spark replays the "
    "extra round over the converged labels; the oracle propagates "
    "neighborhood minima over the RECURSIVE closure's component "
    "labels). This is the termination certificate every incremental "
    "consumer (r15's seeded re-convergence) silently assumes — here "
    "it is a row, not an assumption. Scale: one extra "
    "equi-join+groupBy round over the pruned edge list; output is "
    "one row.",
)
def invariant_cc_fixpoint_documents(spark, sf_dir):
    lbls, edges, _rounds = _converged_labels(spark, sf_dir)
    nxt = _hashmin_round(lbls, edges)
    changed = nxt.join(
        lbls.select("v", F.col("lbl").alias("prev")), "v"
    ).filter(F.col("lbl") != F.col("prev"))
    out = (
        lbls.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(
            F.broadcast(
                changed.agg(
                    F.count(F.lit(1)).cast("long").alias("n_changed")
                )
            )
        )
        .select(
            "n_nodes",
            "n_changed",
            (F.col("n_changed") == 0).cast("long").alias("fixpoint"),
        )
    )
    res = _local_result(spark, out)
    lbls.unpersist()
    edges.unpersist()
    return res


_ICOVER_ORACLE = (
    _EV_BATCH_CTE
    + """, pb AS (
  SELECT batch, CAST(count(*) AS BIGINT) AS n_rows
  FROM ev GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS total_rows FROM events
), csum AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS s FROM pb
)
SELECT p.batch, p.n_rows,
       CAST(sum(p.n_rows) OVER (ORDER BY p.batch) AS BIGINT)
         AS cum_rows,
       t.total_rows,
       CAST(c.s = t.total_rows AS BIGINT) AS cover_match
FROM pb p CROSS JOIN tot t CROSS JOIN csum c"""
)


@stage(
    "invariant_batch_cover_events",
    _ICOVER_ORACLE,
    "cross-cohort invariant: the MICRO-BATCH CUT COVERS EXACTLY — "
    "per batch of the r13 exact-integer epoch cut: its row count, "
    "the running total, and the flag that the five batches sum to "
    "the raw table's count (disjointness is structural — the cut is "
    "a pure function of es — so cover + count equality == exact "
    "partition). Every streaming-batch mirror, arrival ledger and "
    "snapshot query since r13 rides this cut; the certificate is "
    "now a row. Scale: one grouped count + scalar broadcasts; the "
    "ordered window spans exactly 5 rows.",
)
def invariant_batch_cover_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    pb = ev.groupBy("batch").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = load_table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("long").alias("total_rows")
    )
    csum = pb.agg(F.sum("n_rows").cast("long").alias("s"))
    w = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        pb.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(csum))
        .select(
            "batch",
            "n_rows",
            F.sum("n_rows").over(w).cast("long").alias("cum_rows"),
            "total_rows",
            (F.col("s") == F.col("total_rows"))
            .cast("long")
            .alias("cover_match"),
        )
    )


_IGRID_ORACLE = (
    _CALB_CTE
    + """, gglob AS (
  SELECT q_lo, q_hi, floor_tok,
         CAST(sum(adm) AS BIGINT) AS n_admitted,
         CAST(sum(adm * ntok) AS BIGINT) AS admitted_tokens
  FROM cellb GROUP BY 1, 2, 3
), gbat AS (
  SELECT q_lo, q_hi, floor_tok,
         CAST(sum(n_admitted) AS BIGINT) AS n_via_batches,
         CAST(sum(admitted_tokens) AS BIGINT) AS tokens_via_batches
  FROM cmetrics GROUP BY 1, 2, 3
)
SELECT g.q_lo, g.q_hi, g.floor_tok,
       g.n_admitted, b.n_via_batches,
       g.admitted_tokens, b.tokens_via_batches,
       CAST(g.n_admitted = b.n_via_batches
            AND g.admitted_tokens = b.tokens_via_batches AS BIGINT)
         AS grid_match
FROM gglob g JOIN gbat b
  ON b.q_lo = g.q_lo AND b.q_hi = g.q_hi
 AND b.floor_tok = g.floor_tok"""
)


@stage(
    "invariant_grid_batch_sum_documents",
    _IGRID_ORACLE,
    "cross-cohort invariant: PER-BATCH CALIBRATION CELLS SUM TO THE "
    "GLOBAL GRID — per (quality band, length floor) cell: the r18 "
    "global admitted docs/tokens next to the same cell summed out "
    "of the r19 per-arrival-batch telemetry, with the match flag. "
    "The r19 drift loop is only trustworthy if its batch slices "
    "tile the global grid exactly (every doc is in exactly one "
    "arrival batch) — the property its staging harness test-locked, "
    "now a row. Spark computes the two sides from the r18 and r19 "
    "frames independently. Scale: one admission pass each side, the "
    "constant 12x grid explode, 12 output rows.",
)
def invariant_grid_batch_sum_documents(spark, sf_dir):
    gglob = _cal_cells(spark, sf_dir).groupBy(
        "q_lo", "q_hi", "floor_tok"
    ).agg(
        F.sum("adm").cast("long").alias("n_admitted"),
        F.sum(F.col("adm") * F.col("ntok"))
        .cast("long")
        .alias("admitted_tokens"),
    )
    gbat = _cal_metrics_by_batch(spark, sf_dir).groupBy(
        "q_lo", "q_hi", "floor_tok"
    ).agg(
        F.sum("n_admitted").cast("long").alias("n_via_batches"),
        F.sum("admitted_tokens")
        .cast("long")
        .alias("tokens_via_batches"),
    )
    eq = (F.col("n_admitted") == F.col("n_via_batches")) & (
        F.col("admitted_tokens") == F.col("tokens_via_batches")
    )
    return gglob.join(gbat, ["q_lo", "q_hi", "floor_tok"]).select(
        "q_lo",
        "q_hi",
        "floor_tok",
        "n_admitted",
        "n_via_batches",
        "admitted_tokens",
        "tokens_via_batches",
        eq.cast("long").alias("grid_match"),
    )


# =====================================================================
# C. Workload self-metrics
# =====================================================================

# the literal workload model, SHUFFLE_BUDGET.json-shaped: one row per
# driver-subset sentinel — (query, family, asserted exchange budget,
# this-round measured exchange count, runs/day, driving table). The
# budget numbers ARE the committed artifact's values for these twenty
# queries (copied at staging time — a literal MODEL, the r18
# _WORKLOAD convention, so the rows replay bit-for-bit on any
# engine); the measured column carries three synthetic drift rows
# (q9 +1, tfidf -1, heavy_hitters +1) so the drift table's three
# status classes are all exercised.
_WSM = [
    ("q1_pricing_summary", "tpch", 1, 1, 24, "lineitem"),
    ("q5_nation_revenue", "tpch", 1, 1, 4, "lineitem"),
    ("q9_product_type_profit", "tpch", 1, 2, 2, "lineitem"),
    ("window_topn_customers_per_segment", "window", 1, 1, 12, "customer"),
    ("corr_matrix_lineitem", "analytics", 1, 1, 24, "lineitem"),
    ("quantiles_lineitem_approx", "analytics", 1, 1, 48, "lineitem"),
    ("dedup_minhash_lsh_capped", "dedup", 4, 4, 4, "documents"),
    ("dedup_survivor_selection_documents", "dedup", 1, 1, 4, "documents"),
    ("embedding_ivf_topk", "embedding", 0, 0, 24, "embeddings"),
    ("pq_recall_at_k_embeddings", "embedding", 3, 3, 2, "embeddings"),
    ("text_stats_documents", "text", 0, 0, 24, "documents"),
    ("tfidf_top_terms_documents", "text", 3, 2, 4, "documents"),
    ("stratified_sample_documents", "sampling", 0, 0, 12, "documents"),
    ("sessionization_events", "timeseries", 1, 1, 24, "events"),
    ("asof_join_events", "timeseries", 1, 1, 12, "events"),
    ("heavy_hitters_batch_events", "streaming", 3, 4, 96, "events"),
    ("windowed_quantiles_events", "streaming", 2, 2, 96, "events"),
    ("scd2_snapshot_diff_events", "warehouse", 5, 5, 24, "events"),
    ("incremental_validation_orders", "state", 3, 3, 24, "orders"),
    ("centroid_shift_embeddings", "drift", 2, 2, 24, "embeddings"),
]
_WSM_TABLES = sorted({t for *_x, t in _WSM})

_WSM_VALUES = ",\n    ".join(
    f"('{q}', '{f}', {b}, {m}, {r}, '{t}')" for q, f, b, m, r, t in _WSM
)

_WSM_CTE = f"""WITH wl (qname, family, budget_ex, measured_ex, runs,
                        tbl) AS (
  VALUES {_WSM_VALUES}
), counts AS (
  {" UNION ALL ".join(
      f"SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS n_rows FROM {t}"
      for t in _WSM_TABLES
  )}
), wlr AS (
  SELECT w.qname, w.family,
         CAST(w.budget_ex AS BIGINT) AS budget_ex,
         CAST(w.measured_ex AS BIGINT) AS measured_ex,
         CAST(w.runs AS BIGINT) AS runs,
         w.tbl, c.n_rows
  FROM wl w JOIN counts c ON c.tbl = w.tbl
)"""


def _wsm_counts(spark, sf_dir):
    """One-row live counts for each table the workload model reads —
    <= 6 scalar jobs, unioned (the r18 _wl_counts convention)."""
    counts = None
    for t in _WSM_TABLES:
        agg = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            .select(F.lit(t).alias("tbl"), "n_rows")
        )
        counts = agg if counts is None else counts.unionByName(agg)
    return counts


def _wsm_frame(spark, sf_dir):
    """The Spark mirror of _WSM_CTE's ``wlr``: the literal model as a
    map-side explode off a 1-row frame (the r17/r18 pattern — never a
    multi-row crossJoin), joined to the broadcast live counts. Pure
    metadata at any corpus size."""
    counts = _wsm_counts(spark, sf_dir)
    rows = [
        F.struct(
            F.lit(q).alias("qname"),
            F.lit(f).alias("family"),
            F.lit(b).cast("long").alias("budget_ex"),
            F.lit(m).cast("long").alias("measured_ex"),
            F.lit(r).cast("long").alias("runs"),
            F.lit(t).alias("tbl"),
        )
        for q, f, b, m, r, t in _WSM
    ]
    return _lit_frame(counts, rows).join(F.broadcast(counts), "tbl")


_WSM_MASS_ORACLE = (
    _WSM_CTE
    + """, fam AS (
  SELECT family, CAST(count(*) AS BIGINT) AS n_queries,
         CAST(sum(budget_ex) AS BIGINT) AS total_exchanges,
         CAST(sum(runs) AS BIGINT) AS total_runs,
         CAST(sum(runs * n_rows) AS BIGINT) AS daily_scan_rows
  FROM wlr GROUP BY 1
), tot AS (
  SELECT CAST(sum(budget_ex) AS BIGINT) AS tex FROM wlr
)
SELECT f.family, f.n_queries, f.total_exchanges, f.total_runs,
       f.daily_scan_rows,
       round(CAST(f.total_exchanges AS DOUBLE) / t.tex, 9)
         AS exchange_share
FROM fam f CROSS JOIN tot t"""
)


@stage(
    "wsm_budget_mass_by_family",
    _WSM_MASS_ORACLE,
    "workload self-metrics: BUDGET MASS BY FAMILY — the committed "
    "shuffle-exchange budget rolled up per query family, with each "
    "family's runs/day, its daily scan bill in LIVE rows (runs x the "
    "driving table's count — scale-factor-honest), and its share of "
    "the total exchange budget. This is the row a platform team "
    "reads to see where the engine's own shuffle budget concentrates "
    "— the SHUFFLE_BUDGET artifact, priced as data. Shape: a 20-row "
    "literal explode joined to <= 6 one-row table counts.",
)
def wsm_budget_mass_by_family(spark, sf_dir):
    w = _wsm_frame(spark, sf_dir)
    fam = w.groupBy("family").agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("budget_ex").cast("long").alias("total_exchanges"),
        F.sum("runs").cast("long").alias("total_runs"),
        F.sum(F.col("runs") * F.col("n_rows"))
        .cast("long")
        .alias("daily_scan_rows"),
    )
    tot = w.agg(F.sum("budget_ex").cast("long").alias("tex"))
    return fam.crossJoin(F.broadcast(tot)).select(
        "family",
        "n_queries",
        "total_exchanges",
        "total_runs",
        "daily_scan_rows",
        F.round(
            F.col("total_exchanges").cast("double") / F.col("tex"), 9
        ).alias("exchange_share"),
    )


_WSM_SCAN_ORACLE = (
    _WSM_CTE
    + """
SELECT tbl, CAST(max(n_rows) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(runs) AS BIGINT) AS total_runs,
       CAST(CAST(sum(runs) AS BIGINT) * max(n_rows) AS BIGINT)
         AS daily_scan_rows
FROM wlr GROUP BY 1"""
)


@stage(
    "wsm_scan_bill_by_table",
    _WSM_SCAN_ORACLE,
    "workload self-metrics: the DAILY SCAN BILL PER TABLE — per "
    "driving table: its live row count, the sentinel queries reading "
    "it, their combined runs/day, and the daily scanned-rows bill. "
    "The table a scheduler caches, buckets or zone-maps FIRST is the "
    "one at the top of this list — the data-layout investment signal "
    "(the r18 portfolio's input side, generalized to all ten "
    "tables' workload). Shape: the literal model grouped by table "
    "over broadcast counts.",
)
def wsm_scan_bill_by_table(spark, sf_dir):
    w = _wsm_frame(spark, sf_dir)
    return w.groupBy("tbl").agg(
        F.max("n_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum("runs").cast("long").alias("total_runs"),
        (F.sum("runs") * F.max("n_rows"))
        .cast("long")
        .alias("daily_scan_rows"),
    )


_WSM_CENSUS_ORACLE = (
    _WSM_CTE
    + """
SELECT budget_ex AS exchanges,
       CAST(count(*) AS BIGINT) AS n_queries,
       min(qname) AS example_query,
       CAST(sum(runs) AS BIGINT) AS total_runs,
       CAST(sum(runs * n_rows) AS BIGINT) AS daily_scan_rows
FROM wlr GROUP BY 1"""
)


@stage(
    "wsm_exchange_census",
    _WSM_CENSUS_ORACLE,
    "workload self-metrics: the EXCHANGE-COUNT CENSUS — how many "
    "sentinel queries sit at each asserted exchange count (0 = "
    "scan-only map job .. 5 = deep join tree), with a deterministic "
    "example (alphabetical min), combined runs and the daily scan "
    "mass at that depth. The census is the shape-of-the-workload "
    "summary: a budget drifting toward deeper trees shows up here "
    "before any single query regresses. Shape: literal-model "
    "aggregate, <= 6 output rows.",
)
def wsm_exchange_census(spark, sf_dir):
    w = _wsm_frame(spark, sf_dir)
    return w.groupBy(F.col("budget_ex").alias("exchanges")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.min("qname").alias("example_query"),
        F.sum("runs").cast("long").alias("total_runs"),
        F.sum(F.col("runs") * F.col("n_rows"))
        .cast("long")
        .alias("daily_scan_rows"),
    )


_WSM_RANK_ORACLE = (
    _WSM_CTE
    + """, bill AS (
  SELECT qname, family, budget_ex AS exchanges, runs,
         CAST(runs * budget_ex * n_rows AS BIGINT)
           AS daily_shuffled_rows
  FROM wlr
), ranked AS (
  SELECT b.*, CAST(row_number() OVER (
           ORDER BY daily_shuffled_rows DESC, qname) AS BIGINT) AS rnk
  FROM bill b
)
SELECT rnk, qname, family, exchanges, runs, daily_shuffled_rows
FROM ranked WHERE rnk <= 10"""
)


@stage(
    "wsm_shuffle_bill_rank",
    _WSM_RANK_ORACLE,
    "workload self-metrics: the TOP-10 DAILY SHUFFLE BILL — per "
    "sentinel query: runs x asserted exchanges x live driving-table "
    "rows (the row-volume proxy for network bytes the r18 pricing "
    "established), ranked. The queries worth a bucketing/broadcast "
    "audit first are exactly these ten; at 100 TB the #1 row IS the "
    "cluster's dominant network flow. Shape: literal-model window "
    "over 20 rows, deterministic (qname) tie-break.",
)
def wsm_shuffle_bill_rank(spark, sf_dir):
    w = _wsm_frame(spark, sf_dir)
    bill = w.select(
        "qname",
        "family",
        F.col("budget_ex").alias("exchanges"),
        "runs",
        (F.col("runs") * F.col("budget_ex") * F.col("n_rows"))
        .cast("long")
        .alias("daily_shuffled_rows"),
    )
    wr = Window.orderBy(F.desc("daily_shuffled_rows"), F.asc("qname"))
    return (
        bill.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select(
            "rnk",
            "qname",
            "family",
            "exchanges",
            "runs",
            "daily_shuffled_rows",
        )
    )


_WSM_DRIFT_ORACLE = (
    _WSM_CTE
    + """
SELECT qname, family,
       budget_ex AS budget_exchanges,
       measured_ex AS measured_exchanges,
       CAST(measured_ex - budget_ex AS BIGINT) AS drift,
       CASE WHEN measured_ex > budget_ex THEN 'regression'
            WHEN measured_ex = budget_ex THEN 'tight'
            ELSE 'headroom' END AS status,
       CAST(CASE WHEN measured_ex > budget_ex
                 THEN (measured_ex - budget_ex) * runs * n_rows
                 ELSE 0 END AS BIGINT) AS daily_excess_rows
FROM wlr"""
)


@stage(
    "wsm_budget_drift",
    _WSM_DRIFT_ORACLE,
    "workload self-metrics: the BUDGET-VS-MEASURED DRIFT TABLE — per "
    "sentinel query: the committed exchange budget, the measured "
    "count, the signed drift, its class (regression / tight / "
    "headroom — the assert-<= sweep's verdict as data), and the "
    "daily excess shuffled-rows bill a regression costs (zero "
    "otherwise). The model carries three deliberate drift rows so "
    "every class is exercised; in production the measured column is "
    "last night's plan audit. One extra Exchange at 100 TB is a "
    "full network rewrite of the input — this row prices exactly "
    "that. Shape: map-side literal arithmetic.",
)
def wsm_budget_drift(spark, sf_dir):
    w = _wsm_frame(spark, sf_dir)
    return w.select(
        "qname",
        "family",
        F.col("budget_ex").alias("budget_exchanges"),
        F.col("measured_ex").alias("measured_exchanges"),
        (F.col("measured_ex") - F.col("budget_ex"))
        .cast("long")
        .alias("drift"),
        F.when(F.col("measured_ex") > F.col("budget_ex"), "regression")
        .when(F.col("measured_ex") == F.col("budget_ex"), "tight")
        .otherwise("headroom")
        .alias("status"),
        F.when(
            F.col("measured_ex") > F.col("budget_ex"),
            (F.col("measured_ex") - F.col("budget_ex"))
            * F.col("runs")
            * F.col("n_rows"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("daily_excess_rows"),
    )


_WSM_LORENZ_ORACLE = (
    _WSM_CTE
    + """, fbill AS (
  SELECT family,
         CAST(sum(runs * budget_ex * n_rows) AS BIGINT)
           AS daily_shuffled_rows
  FROM wlr GROUP BY 1
), franked AS (
  SELECT f.*, CAST(row_number() OVER (
           ORDER BY daily_shuffled_rows DESC, family) AS BIGINT)
           AS rnk
  FROM fbill f
), ftot AS (
  SELECT CAST(sum(daily_shuffled_rows) AS BIGINT) AS t FROM fbill
)
SELECT r.rnk, r.family, r.daily_shuffled_rows,
       CAST(sum(r.daily_shuffled_rows) OVER (ORDER BY r.rnk)
            AS BIGINT) AS cum_rows,
       round(CAST(r.daily_shuffled_rows AS DOUBLE) / t.t, 9) AS share,
       round(CAST(sum(r.daily_shuffled_rows) OVER (ORDER BY r.rnk)
                  AS DOUBLE) / t.t, 9) AS cum_share
FROM franked r CROSS JOIN ftot t"""
)


@stage(
    "wsm_family_lorenz",
    _WSM_LORENZ_ORACLE,
    "workload self-metrics: the FAMILY LORENZ CURVE — families "
    "ranked by daily shuffled-rows bill with running cumulative "
    "mass and shares: how concentrated the engine's shuffle spend "
    "is (the r12 value-Lorenz convention turned on the workload "
    "itself). A cum_share that hits 0.8 by rank 2 says two families "
    "dominate the network bill — the capacity-planning row. Shape: "
    "a <= 12-row family rollup, ordered window over metadata.",
)
def wsm_family_lorenz(spark, sf_dir):
    w = _wsm_frame(spark, sf_dir)
    fbill = w.groupBy("family").agg(
        F.sum(F.col("runs") * F.col("budget_ex") * F.col("n_rows"))
        .cast("long")
        .alias("daily_shuffled_rows")
    )
    wr = Window.orderBy(F.desc("daily_shuffled_rows"), F.asc("family"))
    franked = fbill.withColumn(
        "rnk", F.row_number().over(wr).cast("long")
    )
    ftot = fbill.agg(
        F.sum("daily_shuffled_rows").cast("long").alias("t")
    )
    wc = Window.orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        franked.crossJoin(F.broadcast(ftot))
        .withColumn(
            "cum_rows",
            F.sum("daily_shuffled_rows").over(wc).cast("long"),
        )
        .select(
            "rnk",
            "family",
            "daily_shuffled_rows",
            "cum_rows",
            F.round(
                F.col("daily_shuffled_rows").cast("double") / F.col("t"),
                9,
            ).alias("share"),
            F.round(F.col("cum_rows").cast("double") / F.col("t"), 9)
            .alias("cum_share"),
        )
    )
