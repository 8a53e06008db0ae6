"""ROUND-17 STAGED catalog queries — seeded in round 12 (built TWO
rounds early: with r13..r16 staged, rounds 13 and 14 become
promotion-only and each stages one further cohort, keeping the
pipeline two ahead indefinitely), NOT registered (same freeze protocol
as queries_staging_r5..r16). Round 17 promotes them.

The three themes are the in-code ROUND-17 candidate seeds
(queries.py plan comment), each composing proven machinery:

QUALITY-GATED ADMISSION PIPELINES — the r16 admission decision
composed with deterministic quality gates into the multi-stage funnel
every pretraining ingest actually runs. Four exact gates in canonical
order: EXACT-DUP (survivor = min doc_id per lowercased text, the
dedup_exact convention), NEAR-DUP (no md5-MinHash/LSH candidate mate
with a smaller doc_id — the earlier-copy convention over
queries._minhash_ctes' band buckets), QUALITY (mean word length milli
(1000*nch) div ntok inside [5100, 5900] — the r14 difficulty-score
component as a band-pass), LENGTH (ntok >= 20, the r13 floor). All
integer-exact, so funnels, orders and attributions replay identically
on any engine.

- ``gate_funnel_documents`` — the canonical cumulative funnel.
- ``gate_order_cost_documents`` — survivors per stage under TWO gate
  orders (gates commute on the final set; the per-stage work does
  not — the evaluation-cost face).
- ``gate_failure_overlap_documents`` — docs/tokens by HOW MANY gates
  they fail (redundant vs complementary gates).
- ``gate_marginal_cost_documents`` — rows each gate processes vs the
  finally-admitted mass (where the pipeline's compute actually goes).
- ``gate_source_bias_documents`` — per-source PSI of the admitted
  mix vs the corpus mix (gates skew WHAT survives).
- ``gate_length_floor_postgate_documents`` — the r13 length-floor
  sweep RE-RUN downstream of the other three gates (floors tune
  differently after dedup).
- ``gate_attribution_by_source_documents`` — first-failing-gate
  attribution per source in canonical order.

CONTRACT-EVOLUTION ECONOMICS — dce_spark/diff.py's breaking/
compatible classes crossed with the state ledger (the r14 ledger time
axis): contract v2 takes effect from a per-class effective commit;
committed (partition, commit) states stay valid where their aliases
still cover v2 (and for grandfathered commits), and the re-validation
BILL — the rows that must rescan — is exact state arithmetic over the
ledger, never a row scan. Evolution classes are module literals
(required state families + effective commit), the ledger is the
r14-convention (event_type, batch) state table.

- ``evolution_alias_coverage_events`` — the class x required-family
  coverage matrix against the committed state families.
- ``evolution_rescan_bill_events`` — per class: states/rows that must
  rescan vs stay served from the ledger.
- ``evolution_migration_waves_events`` — the rescan work split into
  bounded waves (largest partitions first, exact cumulative cuts).
- ``evolution_wave_summary_events`` — rows/partitions per (class,
  wave): the ops schedule readout.
- ``evolution_grandfather_audit_events`` — per class: rows served
  under v1 (grandfathered), from valid v2 states, and rescanned.
- ``evolution_ledger_debt_events`` — the cumulative re-validation
  debt curve if evolutions land at successive commits.

REPLICATION / PLACEMENT PLANNER — bucket x broadcast x salt
economics for the TPC-H-shaped recurring join workload, as exact
arithmetic over table statistics (row counts, exact byte proxies via
octet_length) — the planning layer above ext/bucketing.py and
ext/skew.py, deciding which layout to BUILD before any job runs.

- ``placement_broadcast_matrix`` — the broadcast-vs-shuffle decision
  table per dimension table (exact byte proxies via strlen/
  octet_length + fixed widths).
- ``placement_layout_coverage`` — which recurring joins each
  candidate bucket layout co-locates, priced in probe+build rows.
- ``placement_shuffle_savings`` — rows that stop shuffling under
  each layout candidate vs the no-bucketing baseline.
- ``placement_executor_balance_orders`` — deterministic size-ranked
  round-robin assignment of monthly partitions to 8 executors, with
  the load-vs-ideal audit.
- ``placement_salt_planning_lineitem`` — max-task-rows curve for
  salt factors {1,2,4,8} on the l_suppkey join.
- ``placement_key_skew_alarm`` — top-key concentration per workload
  join key (which keys need the salt plan at all), exact-integer
  8x-mean alarm.
- ``placement_bucket_count_plan_lineitem`` — bucket-count selection:
  occupancy balance per candidate count.

tests/test_staging_r17.py runs these through the SAME compare harness
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
from .queries import _minhash_ctes
from .queries_staging_r13 import _NB, _QUALITY_FLOOR
from .queries_staging_r14 import _EV_BATCH_CTE  # noqa: F401 (re-export path)

STAGED_R17: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R17[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R17[name].oracle


# =====================================================================
# A. Quality-gated admission pipelines
# =====================================================================

_Q_LO = 5100  # quality band-pass on (1000 * nch) div ntok
_Q_HI = 5900
_GATES = ["exact_dup", "near_dup", "quality", "length"]  # canonical

# per-doc gate flags (1 = passes): the shared admission frame. The
# near-dup gate reuses the ONE md5-minhash band-bucket definition.
_GATED_CTE = (
    "WITH "
    + _minhash_ctes()
    + f""", nd AS (
  SELECT DISTINCT b.doc_id
  FROM bands a JOIN bands b
    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id
), base AS (
  SELECT d.doc_id, d.source,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ntok,
         CAST(length(d.text) AS BIGINT) AS nch,
         CASE WHEN d.doc_id = min(d.doc_id)
                             OVER (PARTITION BY lower(d.text))
              THEN 1 ELSE 0 END AS surv
  FROM documents d
), gated AS (
  SELECT b.doc_id, b.source, b.ntok,
         CAST(b.surv AS BIGINT) AS g_exact,
         CAST(CASE WHEN n.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
           AS g_near,
         CAST(CASE WHEN (1000 * b.nch) // b.ntok
                        BETWEEN {_Q_LO} AND {_Q_HI}
                   THEN 1 ELSE 0 END AS BIGINT) AS g_qual,
         CAST(CASE WHEN b.ntok >= {_QUALITY_FLOOR} THEN 1 ELSE 0 END
              AS BIGINT) AS g_len
  FROM base b LEFT JOIN nd n ON n.doc_id = b.doc_id
)"""
)


def _gated_docs(spark, sf_dir):
    """The Spark mirror of _GATED_CTE's ``gated``: per-doc pass flags
    for the four canonical gates. One text-keyed window (the
    dedup_exact shuffle), one bucket self-join (LSH-pruned), one
    map-side score — the same single admission pass a production
    funnel fuses."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
        F.length("text").cast("long").alias("nch"),
        F.lower(F.col("text")).alias("norm"),
    ).withColumn(
        "g_exact",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy("norm"))
        ).cast("long"),
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
        .select(F.col("b.__id").alias("doc_id"))
        .distinct()
        .withColumn("ndf", F.lit(1))
    )
    s = F.expr("(1000 * nch) div ntok")
    return (
        base.join(nd, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "ntok",
            "g_exact",
            F.when(F.col("ndf").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("g_near"),
            ((s >= _Q_LO) & (s <= _Q_HI)).cast("long").alias("g_qual"),
            (F.col("ntok") >= _QUALITY_FLOOR).cast("long").alias("g_len"),
        )
    )


# canonical-order survival expression per stage (SQL and the stage
# grid shared by funnel / marginal-cost)
_SURV_SQL = """CASE
           WHEN stage = 0 THEN 1
           WHEN stage = 1 THEN g_exact
           WHEN stage = 2 THEN g_exact * g_near
           WHEN stage = 3 THEN g_exact * g_near * g_qual
           ELSE g_exact * g_near * g_qual * g_len END"""


def _surv_col():
    return (
        F.when(F.col("stage") == 0, F.lit(1))
        .when(F.col("stage") == 1, F.col("g_exact"))
        .when(F.col("stage") == 2, F.col("g_exact") * F.col("g_near"))
        .when(
            F.col("stage") == 3,
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


def _staged_gated(spark, sf_dir):
    g = _gated_docs(spark, sf_dir)
    return g.select(
        "ntok",
        "g_exact",
        "g_near",
        "g_qual",
        "g_len",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in range(5)])
        ).alias("stage"),
    ).withColumn("s", _surv_col())


_G_FUNNEL_ORACLE = (
    _GATED_CTE
    + f""", st AS (
  SELECT g.*, unnest([0, 1, 2, 3, 4]) AS stage FROM gated g
), surv AS (
  SELECT stage, ntok, {_SURV_SQL} AS s FROM st
), agg AS (
  SELECT CAST(stage AS BIGINT) AS stage,
         CAST(sum(s) AS BIGINT) AS n_docs,
         CAST(sum(s * ntok) AS BIGINT) AS tokens
  FROM surv GROUP BY 1
)
SELECT stage, n_docs, tokens,
       CAST(coalesce(lag(n_docs) OVER (ORDER BY stage) - n_docs, 0)
            AS BIGINT) AS rejected_here
FROM agg"""
)


@stage(
    "gate_funnel_documents",
    _G_FUNNEL_ORACLE,
    "gated admission: the CANONICAL FUNNEL — docs and tokens "
    "surviving after each gate (exact-dup -> near-dup -> quality -> "
    "length), with the per-stage rejection count. The one-line "
    "answer to 'where does our corpus go?' that every ingest "
    "pipeline publishes per delivery; all four gates are exact "
    "integer predicates, so the funnel replays identically on any "
    "engine. Shape: one admission pass (text-keyed window + "
    "LSH-pruned bucket join + map-side score), then a 5-literal "
    "map-side stage explode and a 5-row lag window.",
)
def gate_funnel_documents(spark, sf_dir):
    st = _staged_gated(spark, sf_dir)
    agg = st.groupBy("stage").agg(
        F.sum("s").cast("long").alias("n_docs"),
        F.sum(F.col("s") * F.col("ntok")).cast("long").alias("tokens"),
    )
    w = Window.orderBy("stage")
    return agg.select(
        "stage",
        "n_docs",
        "tokens",
        F.coalesce(F.lag("n_docs").over(w) - F.col("n_docs"), F.lit(0))
        .cast("long")
        .alias("rejected_here"),
    )


_G_ORDER_ORACLE = (
    _GATED_CTE
    + f""", st AS (
  SELECT g.*, o.eval_order, s.stage
  FROM gated g
  CROSS JOIN (SELECT unnest(['dedup_first', 'length_first'])
              AS eval_order) o
  CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS stage) s
), surv AS (
  SELECT eval_order, stage, ntok,
         CASE WHEN eval_order = 'dedup_first' THEN {_SURV_SQL}
         ELSE CASE
           WHEN stage = 0 THEN 1
           WHEN stage = 1 THEN g_len
           WHEN stage = 2 THEN g_len * g_qual
           WHEN stage = 3 THEN g_len * g_qual * g_near
           ELSE g_len * g_qual * g_near * g_exact END
         END AS s
  FROM st
)
SELECT eval_order, CAST(stage AS BIGINT) AS stage,
       CAST(sum(s) AS BIGINT) AS n_docs,
       CAST(sum(s * ntok) AS BIGINT) AS tokens
FROM surv GROUP BY 1, 2"""
)


@stage(
    "gate_order_cost_documents",
    _G_ORDER_ORACLE,
    "gated admission: GATE-ORDER ECONOMICS — survivors per stage "
    "under dedup-first vs length-first evaluation. The gates commute "
    "on the FINAL set (stage-4 rows are identical, test-locked), but "
    "the per-stage populations differ, and each gate's COST is the "
    "rows reaching it: length and quality are map-side-cheap while "
    "the dedup gates pay a window and a join, so running cheap "
    "selective gates first shrinks what the expensive gates process "
    "— this query prices exactly that, on this corpus. Shape: one "
    "admission pass + a 10-cell map-side explode.",
)
def gate_order_cost_documents(spark, sf_dir):
    g = _gated_docs(spark, sf_dir)
    st = g.select(
        "ntok",
        "g_exact",
        "g_near",
        "g_qual",
        "g_len",
        F.explode(
            F.array(F.lit("dedup_first"), F.lit("length_first"))
        ).alias("eval_order"),
    ).select(
        "*",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in range(5)])
        ).alias("stage"),
    )
    rev = (
        F.when(F.col("stage") == 0, F.lit(1))
        .when(F.col("stage") == 1, F.col("g_len"))
        .when(F.col("stage") == 2, F.col("g_len") * F.col("g_qual"))
        .when(
            F.col("stage") == 3,
            F.col("g_len") * F.col("g_qual") * F.col("g_near"),
        )
        .otherwise(
            F.col("g_len")
            * F.col("g_qual")
            * F.col("g_near")
            * F.col("g_exact")
        )
        .cast("long")
    )
    s = F.when(
        F.col("eval_order") == "dedup_first", _surv_col()
    ).otherwise(rev)
    return (
        st.withColumn("s", s)
        .groupBy("eval_order", "stage")
        .agg(
            F.sum("s").cast("long").alias("n_docs"),
            F.sum(F.col("s") * F.col("ntok"))
            .cast("long")
            .alias("tokens"),
        )
    )


_G_OVERLAP_ORACLE = (
    _GATED_CTE
    + """
SELECT CAST(4 - g_exact - g_near - g_qual - g_len AS BIGINT)
         AS n_gates_failed,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS tokens
FROM gated GROUP BY 1"""
)


@stage(
    "gate_failure_overlap_documents",
    _G_OVERLAP_ORACLE,
    "gated admission: FAILURE OVERLAP — docs and tokens by how many "
    "of the four gates they fail. Mass at k=1 means the gates are "
    "COMPLEMENTARY (each catches its own population — dropping one "
    "loses real filtering); mass at k>=2 means overlap (a cheaper "
    "subset would admit nearly the same corpus). The k-histogram is "
    "the first question to ask before adding a fifth gate. Shape: "
    "one admission pass, a <= 5-row grouped count.",
)
def gate_failure_overlap_documents(spark, sf_dir):
    g = _gated_docs(spark, sf_dir)
    failed = (
        F.lit(4)
        - F.col("g_exact")
        - F.col("g_near")
        - F.col("g_qual")
        - F.col("g_len")
    ).cast("long")
    return g.groupBy(failed.alias("n_gates_failed")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").cast("long").alias("tokens"),
    )


_G_COST_ORACLE = (
    _GATED_CTE
    + f""", st AS (
  SELECT g.*, unnest([1, 2, 3, 4]) AS stage FROM gated g
), surv AS (
  SELECT stage, ntok, {_SURV_SQL} AS s_out,
         CASE
           WHEN stage = 1 THEN 1
           WHEN stage = 2 THEN g_exact
           WHEN stage = 3 THEN g_exact * g_near
           ELSE g_exact * g_near * g_qual END AS s_in
  FROM st
), agg AS (
  SELECT CAST(stage AS BIGINT) AS stage,
         CAST(sum(s_in) AS BIGINT) AS rows_in,
         CAST(sum(s_out) AS BIGINT) AS rows_out
  FROM surv GROUP BY 1
), adm AS (
  SELECT CAST(rows_out AS BIGINT) AS admitted FROM agg WHERE stage = 4
)
SELECT a.stage, a.rows_in, a.rows_out,
       CAST(sum(a.rows_in) OVER (ORDER BY a.stage) AS BIGINT)
         AS cum_rows_processed,
       round(CAST(sum(a.rows_in) OVER (ORDER BY a.stage) AS DOUBLE)
             / m.admitted, 9) AS processed_per_admitted
FROM agg a, adm m"""
)


@stage(
    "gate_marginal_cost_documents",
    _G_COST_ORACLE,
    "gated admission: MARGINAL COST — rows entering and leaving each "
    "gate (canonical order), the cumulative rows processed, and the "
    "running processed-per-finally-admitted-doc ratio. The last "
    "column is the pipeline's unit economics: how much gate work one "
    "admitted document costs, gate by gate — the number that decides "
    "whether a cheap pre-filter pays for itself at 100 TB. Exact "
    "integer counts until the final ratio; a 4-row window over the "
    "funnel aggregate.",
)
def gate_marginal_cost_documents(spark, sf_dir):
    g = _gated_docs(spark, sf_dir)
    st = g.select(
        "g_exact",
        "g_near",
        "g_qual",
        "g_len",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in (1, 2, 3, 4)])
        ).alias("stage"),
    )
    s_in = (
        F.when(F.col("stage") == 1, F.lit(1))
        .when(F.col("stage") == 2, F.col("g_exact"))
        .when(F.col("stage") == 3, F.col("g_exact") * F.col("g_near"))
        .otherwise(
            F.col("g_exact") * F.col("g_near") * F.col("g_qual")
        )
        .cast("long")
    )
    agg = st.withColumn("s_out", _surv_col()).withColumn(
        "s_in", s_in
    ).groupBy("stage").agg(
        F.sum("s_in").cast("long").alias("rows_in"),
        F.sum("s_out").cast("long").alias("rows_out"),
    )
    # admitted as a KEYLESS aggregate (planaudit exempts only <=1-row
    # aggregate builds from the BNLJ rule; a filtered frame is not
    # provably 1 row)
    adm = g.agg(
        F.sum(
            F.col("g_exact")
            * F.col("g_near")
            * F.col("g_qual")
            * F.col("g_len")
        )
        .cast("long")
        .alias("admitted")
    )
    w = Window.orderBy("stage")
    return (
        agg.crossJoin(F.broadcast(adm))
        .select(
            "stage",
            "rows_in",
            "rows_out",
            F.sum("rows_in").over(w).cast("long").alias(
                "cum_rows_processed"
            ),
            F.round(
                F.sum("rows_in").over(w).cast("double")
                / F.col("admitted"),
                9,
            ).alias("processed_per_admitted"),
        )
    )


_MIX_EPS = 1e-6  # the psi convention

_G_BIAS_ORACLE = (
    _GATED_CTE
    + f""", adm AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(g_exact * g_near * g_qual * g_len) AS BIGINT)
           AS n_admitted
  FROM gated GROUP BY source
), tots AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS td,
         CAST(sum(n_admitted) AS BIGINT) AS ta
  FROM adm
)
SELECT a.source, a.n_docs, a.n_admitted,
       round(CAST(a.n_docs AS DOUBLE) / t.td, 9) AS corpus_share,
       round(CAST(a.n_admitted AS DOUBLE) / t.ta, 9) AS admitted_share,
       round((CAST(a.n_admitted AS DOUBLE) / t.ta
              - CAST(a.n_docs AS DOUBLE) / t.td)
             * ln((CAST(a.n_admitted AS DOUBLE) / t.ta + {_MIX_EPS})
                  / (CAST(a.n_docs AS DOUBLE) / t.td + {_MIX_EPS})), 6)
         AS psi_term
FROM adm a, tots t"""
)


@stage(
    "gate_source_bias_documents",
    _G_BIAS_ORACLE,
    "gated admission: SOURCE BIAS — per source: corpus share vs "
    "admitted share and the PSI term between them (the established "
    "eps=1e-6 / 6dp convention). Quality gates are never neutral "
    "across sources — boilerplate-heavy crawls fail the near-dup and "
    "quality gates more — so the admitted mix silently drifts from "
    "the planned mix unless this row feeds back into the r13/r15 "
    "allocation planners. Shape: one admission pass, per-source "
    "aggregate, 1-row totals broadcast.",
)
def gate_source_bias_documents(spark, sf_dir):
    g = _gated_docs(spark, sf_dir)
    admit = (
        F.col("g_exact") * F.col("g_near") * F.col("g_qual") * F.col("g_len")
    )
    adm = g.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(admit).cast("long").alias("n_admitted"),
    )
    tots = adm.agg(
        F.sum("n_docs").cast("long").alias("td"),
        F.sum("n_admitted").cast("long").alias("ta"),
    )
    out = adm.crossJoin(F.broadcast(tots))
    p = F.col("n_docs").cast("double") / F.col("td")
    q = F.col("n_admitted").cast("double") / F.col("ta")
    return out.select(
        "source",
        "n_docs",
        "n_admitted",
        F.round(p, 9).alias("corpus_share"),
        F.round(q, 9).alias("admitted_share"),
        F.round(
            (q - p) * F.log((q + F.lit(_MIX_EPS)) / (p + F.lit(_MIX_EPS))),
            6,
        ).alias("psi_term"),
    )


_G_FLOORS = [5, 10, 20, 40, 80]

_G_FLOOR_ORACLE = (
    _GATED_CTE
    + f"""
SELECT CAST(fl.f AS BIGINT) AS floor_tokens,
       CAST(sum(CASE WHEN g_exact * g_near * g_qual = 1
                          AND ntok >= fl.f
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(sum(CASE WHEN g_exact * g_near * g_qual = 1
                          AND ntok >= fl.f
                     THEN ntok ELSE 0 END) AS BIGINT) AS admitted_tokens
FROM gated
CROSS JOIN (SELECT unnest([{", ".join(str(x) for x in _G_FLOORS)}])
            AS f) fl
GROUP BY fl.f"""
)


@stage(
    "gate_length_floor_postgate_documents",
    _G_FLOOR_ORACLE,
    "gated admission: the LENGTH-FLOOR TUNING CURVE RE-RUN DOWNSTREAM "
    "of the other three gates — admitted docs/tokens per candidate "
    "floor in {{5, 10, 20, 40, 80}} among docs already passing "
    "exact-dup, near-dup and quality. The r13 pre-gate sweep "
    "(length_floor_sweep_documents) tunes the floor on the raw "
    "corpus; dedup and quality REMOVE disproportionate mass from "
    "specific length bands, so the post-gate curve bends differently "
    "and the floor should be chosen HERE, at its actual position in "
    "the pipeline. Shape: one admission pass + a 5-literal map-side "
    "sweep.",
)
def gate_length_floor_postgate_documents(spark, sf_dir):
    g = _gated_docs(spark, sf_dir)
    pre = F.col("g_exact") * F.col("g_near") * F.col("g_qual") == 1
    swept = g.select(
        "ntok",
        pre.alias("pre_ok"),
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in _G_FLOORS])
        ).alias("floor_tokens"),
    )
    ok = F.col("pre_ok") & (F.col("ntok") >= F.col("floor_tokens"))
    return swept.groupBy("floor_tokens").agg(
        F.sum(ok.cast("long")).alias("n_admitted"),
        F.sum(F.when(ok, F.col("ntok")).otherwise(0))
        .cast("long")
        .alias("admitted_tokens"),
    )


_G_ATTR_ORACLE = (
    _GATED_CTE
    + """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN g_exact = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS rej_exact_dup,
       CAST(sum(CASE WHEN g_exact = 1 AND g_near = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS rej_near_dup,
       CAST(sum(CASE WHEN g_exact = 1 AND g_near = 1 AND g_qual = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS rej_quality,
       CAST(sum(CASE WHEN g_exact = 1 AND g_near = 1 AND g_qual = 1
                          AND g_len = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS rej_length,
       CAST(sum(g_exact * g_near * g_qual * g_len) AS BIGINT)
         AS n_admitted
FROM gated GROUP BY source"""
)


@stage(
    "gate_attribution_by_source_documents",
    _G_ATTR_ORACLE,
    "gated admission: FIRST-FAILING-GATE ATTRIBUTION per source "
    "(canonical order) — every document lands in exactly one bucket: "
    "rejected at its first failed gate, or admitted (the five counts "
    "partition n_docs, test-locked). The per-source rejection "
    "profile is the feedback a crawl operator actually reads: a "
    "source bleeding at near-dup needs its fetch frontier fixed, one "
    "bleeding at quality needs extraction fixes — same funnel, "
    "different remediation. Shape: one admission pass, one grouped "
    "aggregate.",
)
def gate_attribution_by_source_documents(spark, sf_dir):
    g = _gated_docs(spark, sf_dir)
    e, n, q, l = (
        F.col("g_exact"),
        F.col("g_near"),
        F.col("g_qual"),
        F.col("g_len"),
    )
    return g.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((e == 0).cast("long")).alias("rej_exact_dup"),
        F.sum(((e == 1) & (n == 0)).cast("long")).alias("rej_near_dup"),
        F.sum(((e == 1) & (n == 1) & (q == 0)).cast("long")).alias(
            "rej_quality"
        ),
        F.sum(
            ((e == 1) & (n == 1) & (q == 1) & (l == 0)).cast("long")
        ).alias("rej_length"),
        F.sum(e * n * q * l).cast("long").alias("n_admitted"),
    )


# =====================================================================
# B. Contract-evolution economics over the state ledger
# =====================================================================

# the committed state families of the r14-convention ledger (one row
# per (event_type, batch)): row count, two range-violation counters,
# the quantized value sum, the freshness max
_COMMITTED_FAMILIES = ["n", "n_high", "n_common", "sum_cents", "max_es"]

# evolution classes: (name, required state families under v2,
# effective commit). Families absent from the committed set force a
# rescan of every commit the evolution governs (>= effective); classes
# whose requirements are a SUBSET of the committed families are served
# from the ledger with zero rescan — dce_spark/diff.py's breaking vs
# compatible distinction, priced against the ledger.
_EVOLUTIONS = [
    ("add_range_check_200", ["n", "n_mid", "max_es"], 2),
    ("drop_freshness", ["n", "n_high", "n_common", "sum_cents"], 1),
    ("tighten_range_300_to_200", ["n", "n_mid"], 3),
    ("add_sum_check", ["n", "sum_cents"], 0),
    ("add_field_check", ["n", "n_newfield", "n_high"], 4),
]

# per-class scalars, precomputed from the two module literals so BOTH
# engines consume identical constants (the class list is contract
# metadata, not data — the data-grounded part is the ledger)
_CLASS_ROWS = [
    (name, eff, sum(1 for f in req if f not in _COMMITTED_FAMILIES))
    for name, req, eff in _EVOLUTIONS
]

_CLASS_SQL = (
    "SELECT unnest(["
    + ", ".join(f"'{n}'" for n, _e, _m in _CLASS_ROWS)
    + "]) AS class, unnest(["
    + ", ".join(str(e) for _n, e, _m in _CLASS_ROWS)
    + "]) AS eff, unnest(["
    + ", ".join(str(m) for _n, _e, m in _CLASS_ROWS)
    + "]) AS n_missing"
)

# the r14-convention state ledger (reuse its CTE verbatim)
from .queries_staging_r14 import _ST_CTE, _type_batch_states  # noqa: E402


def _class_col():
    """Map-side explode of the class literals over a frame — never a
    crossJoin of a literal frame (the planaudit rule)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("class"),
                    F.lit(e).cast("long").alias("eff"),
                    F.lit(m).cast("long").alias("n_missing"),
                )
                for n, e, m in _CLASS_ROWS
            ]
        )
    )


def _states_by_class(spark, sf_dir):
    """state rows x evolution classes, flagged: grandfathered
    (batch < eff), valid (>= eff, nothing missing), rescan (>= eff,
    families missing)."""
    st = _type_batch_states(spark, sf_dir)
    swept = st.select(
        "event_type", "batch", "n", _class_col().alias("c")
    ).select("event_type", "batch", "n", "c.class", "c.eff", "c.n_missing")
    governed = F.col("batch") >= F.col("eff")
    return swept.select(
        "*",
        (~governed).cast("long").alias("grandfathered"),
        (governed & (F.col("n_missing") == 0)).cast("long").alias("valid"),
        (governed & (F.col("n_missing") > 0)).cast("long").alias("rescan"),
    )


_EVO_SWEPT_CTE = (
    _ST_CTE
    + f""", cls AS (
  {_CLASS_SQL}
), swept AS (
  SELECT s.event_type, s.batch, s.n, c.class,
         CAST(c.eff AS BIGINT) AS eff,
         CAST(c.n_missing AS BIGINT) AS n_missing,
         CAST(CASE WHEN s.batch < c.eff THEN 1 ELSE 0 END AS BIGINT)
           AS grandfathered,
         CAST(CASE WHEN s.batch >= c.eff AND c.n_missing = 0
                   THEN 1 ELSE 0 END AS BIGINT) AS valid,
         CAST(CASE WHEN s.batch >= c.eff AND c.n_missing > 0
                   THEN 1 ELSE 0 END AS BIGINT) AS rescan
  FROM st s CROSS JOIN cls c
)"""
)


_EVO_BILL_ORACLE = (
    _EVO_SWEPT_CTE
    + """
SELECT class, CAST(max(eff) AS BIGINT) AS effective_commit,
       CAST(max(n_missing) AS BIGINT) AS n_missing_families,
       CAST(sum(rescan) AS BIGINT) AS n_states_rescan,
       CAST(sum(rescan * n) AS BIGINT) AS rescan_rows,
       CAST(sum((1 - rescan) * n) AS BIGINT) AS reusable_rows,
       round(CAST(sum(rescan * n) AS DOUBLE) / sum(n), 9)
         AS rescan_share
FROM swept GROUP BY class"""
)


@stage(
    "evolution_rescan_bill_events",
    _EVO_BILL_ORACLE,
    "contract evolution: the RE-VALIDATION BILL per evolution class — "
    "a v2 contract needing state families the ledger never computed "
    "forces a rescan of every commit it governs (>= its effective "
    "commit); compatible evolutions (required families a subset of "
    "the committed ones) are served entirely from the ledger. The "
    "bill prices diff.py's breaking/compatible verdict in ROWS "
    "against the actual ledger — the number a schema-review board "
    "should see next to every proposed contract change. Shape: a "
    "5-class map-side literal explode over the 25-row state table; "
    "pure metadata arithmetic.",
)
def evolution_rescan_bill_events(spark, sf_dir):
    sw = _states_by_class(spark, sf_dir)
    return sw.groupBy("class").agg(
        F.max("eff").cast("long").alias("effective_commit"),
        F.max("n_missing").cast("long").alias("n_missing_families"),
        F.sum("rescan").cast("long").alias("n_states_rescan"),
        F.sum(F.col("rescan") * F.col("n"))
        .cast("long")
        .alias("rescan_rows"),
        F.sum((F.lit(1) - F.col("rescan")) * F.col("n"))
        .cast("long")
        .alias("reusable_rows"),
        F.round(
            F.sum(F.col("rescan") * F.col("n")).cast("double")
            / F.sum("n"),
            9,
        ).alias("rescan_share"),
    )


_EVO_GRANDF_ORACLE = (
    _EVO_SWEPT_CTE
    + """
SELECT class,
       CAST(sum(grandfathered * n) AS BIGINT) AS rows_v1_grandfathered,
       CAST(sum(valid * n) AS BIGINT) AS rows_v2_from_states,
       CAST(sum(rescan * n) AS BIGINT) AS rows_v2_rescan,
       round(CAST(sum(grandfathered * n) AS DOUBLE) / sum(n), 9)
         AS grandfathered_share,
       round(CAST(sum(valid * n) AS DOUBLE) / sum(n), 9)
         AS from_states_share
FROM swept GROUP BY class"""
)


@stage(
    "evolution_grandfather_audit_events",
    _EVO_GRANDF_ORACLE,
    "contract evolution: the GRANDFATHER AUDIT — per class, the "
    "three-way partition of the ledger's rows: commits before the "
    "effective commit stay evaluated under v1 (grandfathered), "
    "governed commits with sufficient committed families are served "
    "from states under v2, and the remainder is the rescan. The "
    "three columns partition total rows exactly (test-locked) — the "
    "compliance answer to 'which data is certified under which "
    "contract version right now?'. Shape: metadata arithmetic over "
    "the class-swept state table.",
)
def evolution_grandfather_audit_events(spark, sf_dir):
    sw = _states_by_class(spark, sf_dir)
    tot = F.sum("n")
    return sw.groupBy("class").agg(
        F.sum(F.col("grandfathered") * F.col("n"))
        .cast("long")
        .alias("rows_v1_grandfathered"),
        F.sum(F.col("valid") * F.col("n"))
        .cast("long")
        .alias("rows_v2_from_states"),
        F.sum(F.col("rescan") * F.col("n"))
        .cast("long")
        .alias("rows_v2_rescan"),
        F.round(
            F.sum(F.col("grandfathered") * F.col("n")).cast("double")
            / tot,
            9,
        ).alias("grandfathered_share"),
        F.round(
            F.sum(F.col("valid") * F.col("n")).cast("double") / tot, 9
        ).alias("from_states_share"),
    )


_EVO_WAVES_ORACLE = (
    _EVO_SWEPT_CTE
    + """, work AS (
  SELECT class, event_type, batch, n FROM swept WHERE rescan = 1
), sized AS (
  SELECT *,
         CAST(coalesce(sum(n) OVER (PARTITION BY class
                       ORDER BY n DESC, event_type, batch
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST((sum(n) OVER (PARTITION BY class) + 2) // 3 AS BIGINT)
           AS wave_size
  FROM work
)
SELECT class, event_type, batch, n,
       CAST(cum_before // wave_size AS BIGINT) AS wave
FROM sized"""
)


@stage(
    "evolution_migration_waves_events",
    _EVO_WAVES_ORACLE,
    "contract evolution: the MIGRATION-WAVE SCHEDULE — each breaking "
    "class's rescan work split into <= 3 bounded waves, largest "
    "partitions first ((n DESC, type, batch) — the deterministic "
    "order), wave = cumulative-rows-before div ceil(total/3), all "
    "exact integers. Re-validating a 100 TB table under a new "
    "contract is an operation you schedule, not a query you run; "
    "this is the schedule, derived from the ledger alone. Shape: "
    "per-class windows over the rescan subset of the swept state "
    "table.",
)
def evolution_migration_waves_events(spark, sf_dir):
    sw = _states_by_class(spark, sf_dir)
    work = sw.filter(F.col("rescan") == 1).select(
        "class", "event_type", "batch", "n"
    )
    wc = Window.partitionBy("class")
    wo = Window.partitionBy("class").orderBy(
        F.desc("n"), "event_type", "batch"
    ).rowsBetween(Window.unboundedPreceding, -1)
    sized = work.select(
        "*",
        F.coalesce(F.sum("n").over(wo), F.lit(0))
        .cast("long")
        .alias("cum_before"),
        F.expr("(sum(n) OVER (PARTITION BY class) + 2) div 3")
        .cast("long")
        .alias("wave_size"),
    )
    return sized.select(
        "class",
        "event_type",
        "batch",
        "n",
        F.expr("cum_before div wave_size").cast("long").alias("wave"),
    )


# the same work/sized chain as the waves oracle, rolled up — the wave
# definition is shared CTE text, not string surgery
_EVO_WAVESUM_ORACLE = (
    _EVO_SWEPT_CTE
    + """, work AS (
  SELECT class, event_type, batch, n FROM swept WHERE rescan = 1
), sized AS (
  SELECT *,
         CAST(coalesce(sum(n) OVER (PARTITION BY class
                       ORDER BY n DESC, event_type, batch
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST((sum(n) OVER (PARTITION BY class) + 2) // 3 AS BIGINT)
           AS wave_size
  FROM work
)
SELECT class, CAST(cum_before // wave_size AS BIGINT) AS wave,
       CAST(count(*) AS BIGINT) AS n_states,
       CAST(sum(n) AS BIGINT) AS rows_rescanned
FROM sized GROUP BY 1, 2"""
)


@stage(
    "evolution_wave_summary_events",
    _EVO_WAVESUM_ORACLE,
    "contract evolution: the WAVE SUMMARY — per (class, wave): state "
    "rows and data rows scheduled, the readout an operator pastes "
    "into the migration ticket. Wave sizes are within one partition "
    "of each other by construction (largest-first fill against an "
    "exact ceil(total/3) quantum). Shape: the wave assignment's "
    "grouped rollup — metadata.",
)
def evolution_wave_summary_events(spark, sf_dir):
    waves = evolution_migration_waves_events(spark, sf_dir)
    return waves.groupBy("class", "wave").agg(
        F.count(F.lit(1)).alias("n_states"),
        F.sum("n").cast("long").alias("rows_rescanned"),
    )


_EVO_DEBT_ORACLE = (
    _EVO_SWEPT_CTE
    + f""", snap AS (
  SELECT sw.*, snaps.s
  FROM swept sw
  CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS s) snaps
)
SELECT CAST(s AS BIGINT) AS snapshot,
       CAST(sum(CASE WHEN rescan = 1 AND batch <= s THEN n ELSE 0 END)
            AS BIGINT) AS debt_rows,
       CAST(sum(CASE WHEN rescan = 1 AND batch <= s THEN 1 ELSE 0 END)
            AS BIGINT) AS debt_states,
       CAST(count(DISTINCT CASE WHEN rescan = 1 AND batch <= s
                                THEN class END) AS BIGINT)
         AS classes_in_debt
FROM snap GROUP BY 1"""
)


@stage(
    "evolution_ledger_debt_events",
    _EVO_DEBT_ORACLE,
    "contract evolution: the LEDGER DEBT CURVE — if every class's "
    "evolution lands at its effective commit and rescans are "
    "deferred, the cumulative re-validation debt (rows and states "
    "whose ledger entries are insufficient) as of each snapshot. A "
    "rising curve is unpaid migration debt compounding with every "
    "commit; the curve's slope per snapshot is the minimum rescan "
    "throughput that keeps the ledger current. Shape: a 5-snapshot "
    "map-side explode over the swept state table.",
)
def evolution_ledger_debt_events(spark, sf_dir):
    sw = _states_by_class(spark, sf_dir)
    snap = sw.select(
        "class",
        "batch",
        "n",
        "rescan",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in range(5)])
        ).alias("snapshot"),
    )
    in_debt = (F.col("rescan") == 1) & (F.col("batch") <= F.col("snapshot"))
    return snap.groupBy("snapshot").agg(
        F.sum(F.when(in_debt, F.col("n")).otherwise(0))
        .cast("long")
        .alias("debt_rows"),
        F.sum(in_debt.cast("long")).alias("debt_states"),
        F.countDistinct(
            F.when(in_debt, F.col("class"))
        ).alias("classes_in_debt"),
    )


_EVO_MATRIX_SQL = (
    "SELECT unnest(["
    + ", ".join(
        f"'{n}'" for n, req, _e in _EVOLUTIONS for _f in req
    )
    + "]) AS class, unnest(["
    + ", ".join(
        f"'{f}'" for _n, req, _e in _EVOLUTIONS for f in req
    )
    + "]) AS family, unnest(["
    + ", ".join(
        ("1" if f in _COMMITTED_FAMILIES else "0")
        for _n, req, _e in _EVOLUTIONS
        for f in req
    )
    + "]) AS available, unnest(["
    + ", ".join(
        str(e) for _n, req, e in _EVOLUTIONS for _f in req
    )
    + "]) AS eff"
)

_EVO_MATRIX_ORACLE = (
    _ST_CTE
    + f""", req AS (
  {_EVO_MATRIX_SQL}
), risk AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_rows FROM st
), perclass AS (
  SELECT r.class, CAST(sum(CASE WHEN s.batch >= r.eff THEN s.n
                                ELSE 0 END) AS BIGINT) AS governed_rows
  FROM (SELECT DISTINCT class, eff FROM req) r, st s
  GROUP BY r.class
)
SELECT q.class, q.family,
       CAST(q.available AS BIGINT) AS available,
       CAST(CASE WHEN q.available = 0 THEN p.governed_rows ELSE 0 END
            AS BIGINT) AS rows_at_risk
FROM req q JOIN perclass p ON p.class = q.class"""
)


@stage(
    "evolution_alias_coverage_events",
    _EVO_MATRIX_ORACLE,
    "contract evolution: the CLASS x FAMILY COVERAGE MATRIX — every "
    "state family each evolution class requires, whether the "
    "committed ledger provides it, and the governed rows at risk "
    "when it does not (the per-family face of the rescan bill: WHICH "
    "missing family is costing the rescan). The review-time "
    "artifact: adding the family to the ledger schema BEFORE the "
    "evolution lands turns its whole bill to zero. Shape: literal "
    "requirement rows joined to two metadata aggregates of the "
    "state table.",
)
def evolution_alias_coverage_events(spark, sf_dir):
    st = _type_batch_states(spark, sf_dir)
    req_structs = [
        F.struct(
            F.lit(n).alias("class"),
            F.lit(f).alias("family"),
            F.lit(1 if f in _COMMITTED_FAMILIES else 0)
            .cast("long")
            .alias("available"),
            F.lit(e).cast("long").alias("eff"),
        )
        for n, req, e in _EVOLUTIONS
        for f in req
    ]
    # governed rows per class: explode the class literals over the
    # state rows (map-side), aggregate
    perclass = (
        st.select("batch", "n", _class_col().alias("c"))
        .select("batch", "n", "c.class", "c.eff")
        .groupBy("class")
        .agg(
            F.sum(
                F.when(F.col("batch") >= F.col("eff"), F.col("n")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("governed_rows")
        )
    )
    req = (
        st.limit(1)
        .select(F.explode(F.array(*req_structs)).alias("q"))
        .select("q.class", "q.family", "q.available", "q.eff")
    )
    return req.join(F.broadcast(perclass), "class").select(
        "class",
        "family",
        "available",
        F.when(F.col("available") == 0, F.col("governed_rows"))
        .otherwise(0)
        .cast("long")
        .alias("rows_at_risk"),
    )


# =====================================================================
# C. Replication / placement planner over the TPC-H join workload
# =====================================================================

_N_EXECUTORS = 8  # placement target (the assignment is executor-count
# parametric; 8 keeps the audit readable at test SFs)
_BCAST_LIMIT = 10_000_000  # the classic 10 MB auto-broadcast bound

# per-dim byte proxy: octet_length of every VARCHAR column + 8 per
# fixed-width column — exact integers both engines compute identically
# (never CAST numerics to VARCHAR: formatting differs across engines)
_DIMS = [
    # (dim, varchar cols, n fixed-width cols, probe table)
    ("region", ["r_name"], 1, "nation"),
    ("nation", ["n_name"], 2, "customer"),
    ("customer", ["c_name", "c_mktsegment"], 3, "orders"),
    ("supplier", ["s_name"], 3, "lineitem"),
    ("part", ["p_name", "p_brand", "p_type"], 3, "lineitem"),
]

# the recurring equi-join workload and the candidate bucket layouts;
# a layout co-locates a join when BOTH sides are bucketed on its key
_JOINS = [
    ("lineitem_orders", "l_orderkey", "lineitem", "orders"),
    ("orders_customer", "o_custkey", "orders", "customer"),
    ("lineitem_part", "l_partkey", "lineitem", "part"),
]
_LAYOUTS = [
    ("none", []),
    ("bucket_orderkey", ["lineitem_orders"]),
    ("bucket_custkey", ["orders_customer"]),
    ("bucket_orderkey_custkey", ["lineitem_orders", "orders_customer"]),
    ("bucket_partkey", ["lineitem_part"]),
]


def _dim_bytes_sql(dim, varchars, n_fixed):
    # DuckDB byte length of a VARCHAR is strlen() (octet_length only
    # takes BLOB/BIT there); Spark's F.octet_length mirrors it
    oct_sum = " + ".join(
        [f"strlen({c})" for c in varchars] + [str(8 * n_fixed)]
    )
    return (
        f"SELECT '{dim}' AS dim_table, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(sum({oct_sum}) AS BIGINT) AS bytes_proxy FROM {dim}"
    )


_TABLE_COUNTS_SQL = " UNION ALL ".join(
    f"SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS n FROM {t}"
    for t in ["nation", "customer", "orders", "lineitem", "part"]
)

_PLACE_BCAST_ORACLE = (
    "WITH dims AS ("
    + " UNION ALL ".join(
        _dim_bytes_sql(d, vc, nf) for d, vc, nf, _p in _DIMS
    )
    + f"""), probes AS (
  {_TABLE_COUNTS_SQL}
), mapping AS (
  SELECT unnest([{", ".join(f"'{d}'" for d, _v, _n, _p in _DIMS)}])
           AS dim_table,
         unnest([{", ".join(f"'{p}'" for _d, _v, _n, p in _DIMS)}])
           AS probe_table
)
SELECT d.dim_table, d.n_rows, d.bytes_proxy,
       m.probe_table, p.n AS probe_rows,
       CAST(d.bytes_proxy * {_N_EXECUTORS} AS BIGINT)
         AS replicate_cost_bytes,
       CAST(p.n + d.n_rows AS BIGINT) AS shuffle_cost_rows,
       CAST(CASE WHEN d.bytes_proxy < {_BCAST_LIMIT} THEN 1 ELSE 0 END
            AS BIGINT) AS broadcastable
FROM dims d
JOIN mapping m ON m.dim_table = d.dim_table
JOIN probes p ON p.tbl = m.probe_table"""
)


@stage(
    "placement_broadcast_matrix",
    _PLACE_BCAST_ORACLE,
    "placement planner: the BROADCAST DECISION TABLE — per dimension "
    "table: rows, an exact byte proxy (octet_length of every VARCHAR "
    "+ 8 per fixed-width column; never numeric-to-string casts, "
    "whose formatting differs per engine), the replication cost at 8 "
    "executors, the shuffle cost it replaces (probe + build rows), "
    "and the classic 10 MB broadcastability verdict. This is the "
    "table Spark's auto-broadcast threshold is implicitly computing "
    "per query — materialized once from statistics so layout "
    "decisions (and spark.sql.autoBroadcastJoinThreshold overrides) "
    "are made deliberately. Shape: five 1-row aggregates unioned; "
    "metadata joins.",
)
def placement_broadcast_matrix(spark, sf_dir):
    dims = None
    for d, varchars, n_fixed, _p in _DIMS:
        t = load_table(spark, sf_dir, d)
        b = None
        for c in varchars:
            o = F.octet_length(F.col(c))
            b = o if b is None else b + o
        b = b + F.lit(8 * n_fixed)
        agg = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(b).cast("long").alias("bytes_proxy"),
        ).select(F.lit(d).alias("dim_table"), "n_rows", "bytes_proxy")
        dims = agg if dims is None else dims.unionByName(agg)
    probes = None
    for t in ["nation", "customer", "orders", "lineitem", "part"]:
        agg = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(t).alias("probe_table"), "n")
        )
        probes = agg if probes is None else probes.unionByName(agg)
    mapping = dims.select(
        "dim_table",
        "n_rows",
        "bytes_proxy",
        *[],
    ).withColumn(
        "probe_table",
        F.element_at(
            F.create_map(
                *[
                    x
                    for d, _v, _n, p in _DIMS
                    for x in (F.lit(d), F.lit(p))
                ]
            ),
            F.col("dim_table"),
        ),
    )
    return mapping.join(F.broadcast(probes), "probe_table").select(
        "dim_table",
        "n_rows",
        "bytes_proxy",
        "probe_table",
        F.col("n").alias("probe_rows"),
        (F.col("bytes_proxy") * _N_EXECUTORS)
        .cast("long")
        .alias("replicate_cost_bytes"),
        (F.col("n") + F.col("n_rows"))
        .cast("long")
        .alias("shuffle_cost_rows"),
        (F.col("bytes_proxy") < _BCAST_LIMIT)
        .cast("long")
        .alias("broadcastable"),
    )


_COVER_SQL_ROWS = ", ".join(
    f"('{lname}', '{jname}', {1 if jname in covered else 0})"
    for lname, covered in _LAYOUTS
    for jname, _k, _p, _b in _JOINS
)

_PLACE_COVER_ORACLE = f"""WITH probes AS (
  {_TABLE_COUNTS_SQL}
), joins AS (
  SELECT unnest([{", ".join(f"'{j}'" for j, _k, _p, _b in _JOINS)}])
    AS join_name,
         unnest([{", ".join(f"'{p}'" for _j, _k, p, _b in _JOINS)}])
    AS probe_table,
         unnest([{", ".join(f"'{b}'" for _j, _k, _p, b in _JOINS)}])
    AS build_table
), cover (layout, join_name, colocated) AS (
  VALUES {_COVER_SQL_ROWS}
)
SELECT c.layout, c.join_name,
       CAST(c.colocated AS BIGINT) AS colocated,
       pp.n AS probe_rows, bp.n AS build_rows,
       CAST(CASE WHEN c.colocated = 1 THEN 0 ELSE pp.n + bp.n END
            AS BIGINT) AS shuffled_rows
FROM cover c
JOIN joins j ON j.join_name = c.join_name
JOIN probes pp ON pp.tbl = j.probe_table
JOIN probes bp ON bp.tbl = j.build_table"""


@stage(
    "placement_layout_coverage",
    _PLACE_COVER_ORACLE,
    "placement planner: the LAYOUT x JOIN COVERAGE MATRIX — for each "
    "candidate bucket layout and each recurring workload join: is "
    "the join co-located (both sides bucketed on its key, the "
    "ext/bucketing zero-Exchange SMJ), and the rows that shuffle "
    "when it is not. Bucketing is a WRITE-time investment priced "
    "against a read workload; this matrix is the price list. Shape: "
    "literal layout/join rows joined to five 1-row table counts — "
    "pure metadata.",
)
def placement_layout_coverage(spark, sf_dir):
    probes = None
    for t in ["nation", "customer", "orders", "lineitem", "part"]:
        agg = (
            load_table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(t).alias("tbl"), "n")
        )
        probes = agg if probes is None else probes.unionByName(agg)
    probes = probes.persist()
    rows = [
        F.struct(
            F.lit(lname).alias("layout"),
            F.lit(jname).alias("join_name"),
            F.lit(1 if jname in covered else 0)
            .cast("long")
            .alias("colocated"),
            F.lit(p).alias("probe_table"),
            F.lit(b).alias("build_table"),
        )
        for lname, covered in _LAYOUTS
        for jname, _k, p, b in _JOINS
    ]
    cover = (
        probes.limit(1)
        .select(F.explode(F.array(*rows)).alias("c"))
        .select("c.*")
    )
    out = (
        cover.join(
            F.broadcast(
                probes.select(
                    F.col("tbl").alias("probe_table"),
                    F.col("n").alias("probe_rows"),
                )
            ),
            "probe_table",
        )
        .join(
            F.broadcast(
                probes.select(
                    F.col("tbl").alias("build_table"),
                    F.col("n").alias("build_rows"),
                )
            ),
            "build_table",
        )
        .select(
            "layout",
            "join_name",
            "colocated",
            "probe_rows",
            "build_rows",
            F.when(F.col("colocated") == 1, 0)
            .otherwise(F.col("probe_rows") + F.col("build_rows"))
            .cast("long")
            .alias("shuffled_rows"),
        )
    )
    res = out.collect()
    probes.unpersist()
    return spark.createDataFrame(res, out.schema)


_PLACE_SAVINGS_ORACLE = f"""WITH probes AS (
  {_TABLE_COUNTS_SQL}
), joins AS (
  SELECT unnest([{", ".join(f"'{j}'" for j, _k, _p, _b in _JOINS)}])
    AS join_name,
         unnest([{", ".join(f"'{p}'" for _j, _k, p, _b in _JOINS)}])
    AS probe_table,
         unnest([{", ".join(f"'{b}'" for _j, _k, _p, b in _JOINS)}])
    AS build_table
), cover (layout, join_name, colocated) AS (
  VALUES {_COVER_SQL_ROWS}
), priced AS (
  SELECT c.layout,
         CASE WHEN c.colocated = 1 THEN 0 ELSE pp.n + bp.n END AS sh
  FROM cover c
  JOIN joins j ON j.join_name = c.join_name
  JOIN probes pp ON pp.tbl = j.probe_table
  JOIN probes bp ON bp.tbl = j.build_table
), per_layout AS (
  SELECT layout, CAST(sum(sh) AS BIGINT) AS shuffled_rows
  FROM priced GROUP BY layout
), base AS (
  SELECT CAST(shuffled_rows AS BIGINT) AS b FROM per_layout
  WHERE layout = 'none'
)
SELECT p.layout, p.shuffled_rows,
       CAST(b.b - p.shuffled_rows AS BIGINT) AS rows_saved,
       round(CAST(b.b - p.shuffled_rows AS DOUBLE) / b.b, 9)
         AS saved_share
FROM per_layout p, base b"""


@stage(
    "placement_shuffle_savings",
    _PLACE_SAVINGS_ORACLE,
    "placement planner: SHUFFLE SAVINGS per layout candidate — total "
    "workload rows shuffled under each layout vs the no-bucketing "
    "baseline, and the saved share. The one-number-per-candidate "
    "ranking the layout decision actually uses (a layout is worth "
    "building when its saved shuffle, times the workload's run "
    "frequency, beats the bucketed-write cost). Shape: the coverage "
    "matrix rolled up to one row per layout — metadata.",
)
def placement_shuffle_savings(spark, sf_dir):
    cover = placement_layout_coverage(spark, sf_dir)
    per = cover.groupBy("layout").agg(
        F.sum("shuffled_rows").cast("long").alias("shuffled_rows")
    )
    # baseline as a KEYLESS aggregate (the planaudit <=1-row rule)
    base = cover.agg(
        F.sum(
            F.when(F.col("layout") == "none", F.col("shuffled_rows"))
            .otherwise(0)
        )
        .cast("long")
        .alias("b")
    )
    return per.crossJoin(F.broadcast(base)).select(
        "layout",
        "shuffled_rows",
        (F.col("b") - F.col("shuffled_rows"))
        .cast("long")
        .alias("rows_saved"),
        F.round(
            (F.col("b") - F.col("shuffled_rows")).cast("double")
            / F.col("b"),
            9,
        ).alias("saved_share"),
    )


_PLACE_EXEC_ORACLE = f"""WITH parts AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
), ranked AS (
  SELECT mon, n,
         row_number() OVER (ORDER BY n DESC, mon) AS rnk,
         CAST(sum(n) OVER () AS BIGINT) AS total
  FROM parts
), assigned AS (
  SELECT *, CAST((rnk - 1) % {_N_EXECUTORS} AS BIGINT) AS executor
  FROM ranked
)
SELECT executor,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(n) AS BIGINT) AS rows_assigned,
       round(CAST(sum(n) AS DOUBLE)
             / (CAST(max(total) AS DOUBLE) / {_N_EXECUTORS}), 9)
         AS load_vs_ideal
FROM assigned GROUP BY executor"""


@stage(
    "placement_executor_balance_orders",
    _PLACE_EXEC_ORACLE,
    "placement planner: EXECUTOR BALANCE — monthly orders partitions "
    "assigned to 8 executors by size-ranked round-robin (rank "
    "partitions by (rows DESC, month), executor = (rank-1) mod 8 — "
    "the deterministic cousin of LPT that both engines replay "
    "bit-for-bit), with each executor's load against the ideal "
    "total/8. The load_vs_ideal spread IS the straggler forecast: "
    "scheduling is balanced exactly when the biggest partitions are "
    "spread first, which the size-ranked order guarantees within one "
    "partition's granularity. Shape: one grouped count + a "
    "#partitions-row window — metadata.",
)
def placement_executor_balance_orders(spark, sf_dir):
    parts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mon"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "mon")
    ranked = parts.select(
        "mon",
        "n",
        F.row_number().over(w).alias("rnk"),
        F.sum("n").over(Window.partitionBy()).cast("long").alias("total"),
    )
    assigned = ranked.withColumn(
        "executor", ((F.col("rnk") - 1) % _N_EXECUTORS).cast("long")
    )
    return assigned.groupBy("executor").agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.sum("n").cast("long").alias("rows_assigned"),
        F.round(
            F.sum("n").cast("double")
            / (F.max("total").cast("double") / _N_EXECUTORS),
            9,
        ).alias("load_vs_ideal"),
    )


_SALT_FACTORS = [1, 2, 4, 8]

_PLACE_SALT_ORACLE = f"""WITH keyed AS (
  SELECT l_suppkey AS k, CAST(count(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1
), swept AS (
  SELECT k.cnt, f.f
  FROM keyed k
  CROSS JOIN (SELECT unnest([{", ".join(str(x) for x in _SALT_FACTORS)}])
              AS f) f
), tasks AS (
  SELECT f, CAST((cnt + f - 1) // f AS BIGINT) AS task_rows
  FROM swept
), base AS (
  SELECT CAST(max(cnt) AS BIGINT) AS m FROM keyed
)
SELECT CAST(t.f AS BIGINT) AS salt_factor,
       CAST(max(t.task_rows) AS BIGINT) AS max_task_rows,
       round(1.0 - CAST(max(t.task_rows) AS DOUBLE) / b.m, 9)
         AS reduction_share
FROM tasks t, base b
GROUP BY t.f, b.m"""


@stage(
    "placement_salt_planning_lineitem",
    _PLACE_SALT_ORACLE,
    "placement planner: the SALT-FACTOR CURVE — the biggest "
    "single-task row count on the l_suppkey join under salt factors "
    "{{1, 2, 4, 8}} (every key split k ways: task rows = "
    "ceil(cnt/k), exact integers), and the straggler reduction vs "
    "unsalted. The planning face of ext/skew.salted_equi_join: pick "
    "the smallest k whose curve flattens (more salt past that point "
    "buys nothing but dim-side replication). Shape: one grouped "
    "count, a 4-literal map-side sweep over key counts — metadata "
    "after the first aggregate.",
)
def placement_salt_planning_lineitem(spark, sf_dir):
    keyed = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    swept = keyed.select(
        "cnt",
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in _SALT_FACTORS])
        ).alias("salt_factor"),
    )
    base = keyed.agg(F.max("cnt").cast("long").alias("m"))
    tasks = swept.select(
        "salt_factor",
        F.expr("(cnt + salt_factor - 1) div salt_factor")
        .cast("long")
        .alias("task_rows"),
    )
    return (
        tasks.crossJoin(F.broadcast(base))
        .groupBy("salt_factor")
        .agg(
            F.max("task_rows").cast("long").alias("max_task_rows"),
            F.round(
                F.lit(1.0)
                - F.max("task_rows").cast("double") / F.max("m"),
                9,
            ).alias("reduction_share"),
        )
    )


_SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_suppkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
]

_PLACE_SKEW_ORACLE = (
    "WITH "
    + ", ".join(
        f"""k{i} AS (
  SELECT '{col}' AS join_key,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(max(cnt) AS BIGINT) AS max_key_rows
  FROM (SELECT {col}, CAST(count(*) AS BIGINT) AS cnt
        FROM {tbl} GROUP BY 1)
)"""
        for i, (tbl, col) in enumerate(_SKEW_KEYS)
    )
    + """
SELECT join_key, n_keys, n_rows, max_key_rows,
       round(CAST(max_key_rows AS DOUBLE) / n_rows, 9) AS top_key_share,
       CAST(CASE WHEN max_key_rows * n_keys > 8 * n_rows
                 THEN 1 ELSE 0 END AS BIGINT) AS skew_alarm
FROM ("""
    + " UNION ALL ".join(
        f"SELECT * FROM k{i}" for i in range(len(_SKEW_KEYS))
    )
    + ")"
)


@stage(
    "placement_key_skew_alarm",
    _PLACE_SKEW_ORACLE,
    "placement planner: the KEY-SKEW ALARM — per workload join key: "
    "distinct keys, the hottest key's row count and share, and the "
    "exact-integer alarm max_key_rows * n_keys > 8 * n_rows (the "
    "hottest key carries more than 8x the mean key's rows — the "
    "threshold AQE's skew-join split also reasons about). Keys that "
    "alarm here get the salt-factor plan; keys that don't never pay "
    "salting's dim replication. Shape: one grouped count per key "
    "column, 4 one-row aggregates unioned; the inequality stays in "
    "exact integers (no mean-as-double).",
)
def placement_key_skew_alarm(spark, sf_dir):
    out = None
    for tbl, col in _SKEW_KEYS:
        keyed = (
            load_table(spark, sf_dir, tbl)
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        agg = keyed.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.max("cnt").cast("long").alias("max_key_rows"),
        ).select(F.lit(col).alias("join_key"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out.select(
        "join_key",
        "n_keys",
        "n_rows",
        "max_key_rows",
        F.round(
            F.col("max_key_rows").cast("double") / F.col("n_rows"), 9
        ).alias("top_key_share"),
        (
            F.col("max_key_rows") * F.col("n_keys")
            > F.lit(8) * F.col("n_rows")
        )
        .cast("long")
        .alias("skew_alarm"),
    )


_BUCKET_COUNTS = [8, 16, 32, 64]

_PLACE_BWIDTH_ORACLE = f"""WITH swept AS (
  SELECT l_orderkey % b.b AS bucket, b.b
  FROM lineitem
  CROSS JOIN (SELECT unnest([{", ".join(str(x) for x in _BUCKET_COUNTS)}])
              AS b) b
), occ AS (
  SELECT b, bucket, CAST(count(*) AS BIGINT) AS n
  FROM swept GROUP BY 1, 2
)
SELECT CAST(b AS BIGINT) AS n_buckets,
       CAST(count(*) AS BIGINT) AS buckets_used,
       CAST(max(n) AS BIGINT) AS max_bucket_rows,
       CAST(sum(n) // b AS BIGINT) AS mean_bucket_rows,
       round(CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / b), 9)
         AS imbalance
FROM occ GROUP BY b"""


@stage(
    "placement_bucket_count_plan_lineitem",
    _PLACE_BWIDTH_ORACLE,
    "placement planner: the BUCKET-COUNT SELECTION CURVE — lineitem "
    "bucketed by l_orderkey mod b for candidate counts {{8, 16, 32, "
    "64}}: buckets actually used, the hottest bucket, the mean, and "
    "the max/mean imbalance. More buckets buy parallelism until "
    "imbalance (key-count granularity) dominates — the curve's knee "
    "is the count ext/bucketing.write_bucketed should be told. The "
    "modulo placement is deterministic and engine-identical (exact "
    "integers; production uses the hash-partitioner but its balance "
    "CURVE has the same shape and knee). Shape: a 4-literal map-side "
    "sweep + one grouped count per candidate.",
)
def placement_bucket_count_plan_lineitem(spark, sf_dir):
    swept = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in _BUCKET_COUNTS])
        ).alias("n_buckets"),
    ).select(
        "n_buckets",
        (F.col("l_orderkey") % F.col("n_buckets")).alias("bucket"),
    )
    occ = swept.groupBy("n_buckets", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    return occ.groupBy("n_buckets").agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.max("n").cast("long").alias("max_bucket_rows"),
        F.expr("sum(n) div n_buckets").cast("long").alias(
            "mean_bucket_rows"
        ),
        F.round(
            F.max("n").cast("double")
            / (F.sum("n").cast("double") / F.col("n_buckets")),
            9,
        ).alias("imbalance"),
    )
