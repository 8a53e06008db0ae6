"""ROUND-16 STAGED catalog queries — seeded in round 12 (built a round
early, the r11->r14 pattern: with r13/r14/r15 all staged, this keeps
the pipeline two cohorts ahead as rounds 13/14 promote), NOT
registered (same freeze protocol as queries_staging_r5..r15).
Round 16 promotes them.

The three themes are the in-code ROUND-16 candidate seeds
(queries.py plan comment), each composing proven machinery:

LSH-INDEX ADMISSION LEDGER — the r9 incremental-dedup index
(ext/dedup.save_lsh_index / match_against_lsh_index) crossed with the
r14/r15 ledger time axis. Documents arrive in the 5 exact-integer
doc_id batches (the r15 convention); the INDEX at commit s is the
md5-MinHash(8)/4-band bucket table over batches <= s (the ORACLE-ABLE
hashing convention of dedup_minhash_lsh_documents — queries.py's
_minhash_ctes is the one SQL definition, reused verbatim). Every
query is the ledger arithmetic an ingest pipeline actually runs:
index growth per commit, the admission decision for today's delivery,
bucket-skew (join-cost) evolution, what freezing the index costs in
missed duplicates, band redundancy, and the probe-cost curve.

- ``lsh_index_growth_documents`` — cumulative index size per commit.
- ``lsh_admission_summary_documents`` — today's delivery vs the
  committed index: matched (duplicate-suspect) vs novel docs.
- ``lsh_admission_matrix_documents`` — the same admission join per
  BAND: probe rows, collisions, hit docs.
- ``lsh_bucket_skew_commits_documents`` — bucket-size skew and the
  intra-bucket pair cost per commit snapshot.
- ``lsh_index_staleness_documents`` — duplicates MISSED per frozen
  index vintage (the re-index alarm, as exact arrival arithmetic).
- ``lsh_band_yield_documents`` — candidate pairs contributed per
  band, and pairs ONLY that band finds (band redundancy economics).
- ``lsh_probe_cost_curve_documents`` — per arrival batch: probe rows,
  index rows, and the join fan-out actually paid.

SAMPLER EXECUTION PLANS — the r15 joint (epoch, source) slot grids
turned into concrete, deterministic document PICKS: within each cell
the first ``slots`` documents by the masked multiplicative-hash
interleave key (the r14 ordering convention) are picked; everything
downstream audits the EXECUTION against the plan — cell fill and
shortfall, epoch coverage, shortfall reallocation, token yield vs the
slot-implied expectation, a compact replayable pick witness, and the
realized source mix. (Per-cell selection is a bounded-k top-k —
slots <= 1000 — so at scale it runs as per-partition partial top-k +
merge; the per-cell ranked window here is its exact oracle face.)

- ``sampler_cell_fill_documents`` — picks vs slots per cell, with the
  shortfall where the source ran out of documents.
- ``sampler_picks_head_documents`` — the first 2 picks per cell (the
  deterministic execution witness a resume audit replays).
- ``sampler_epoch_coverage_documents`` — planned vs picked per epoch.
- ``sampler_shortfall_reallocation_documents`` — unfilled slots
  re-granted greedily to cells with remaining documents.
- ``sampler_token_yield_documents`` — tokens actually picked vs the
  slot-implied expectation (doc-count slots are a token-share proxy;
  this measures the proxy error).
- ``sampler_pick_witness_documents`` — per cell: pick count, exact
  doc-id sum, and the picked key range (compact reproducibility
  fingerprint).
- ``sampler_source_realized_mix_documents`` — planned vs realized
  source shares after fill limits.

MULTI-PREDICATE PRUNING ALGEBRA — the r15 zone states under
COMPOSITE predicates: a state row is skippable for an AND query when
EITHER conjunct's zones prove it empty, and for an OR query only when
BOTH do. The cohort computes the algebra matrix, the per-predicate
short-circuit economics, the residual scan estimate, the composite
soundness audit (from rows), the predicate-synergy contingency, and
both short-circuit cost curves.

- ``prune_algebra_matrix_events`` — per (partition, commit): each
  atomic flag and the AND/OR composites.
- ``prune_shortcircuit_order_events`` — which conjunct to evaluate
  first (states pruned / rows skipped per predicate, ranked).
- ``prune_residual_scan_events`` — rows the AND query must still
  scan per partition after pruning.
- ``prune_composite_soundness_events`` — zero AND-query matches
  inside composite-pruned states, recomputed from rows.
- ``prune_predicate_synergy_events`` — the 2x2 contingency of the
  two conjuncts' flags (redundant vs complementary predicates).
- ``prune_order_cost_curves_events`` — cumulative states/rows
  remaining after each step, for BOTH evaluation orders.

tests/test_staging_r16.py runs these through the SAME compare harness
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

# the ONE md5-minhash SQL definition (toks/shingles/sigs/bands) — the
# dedup_minhash_lsh_documents oracle convention, reused so the hashing
# convention cannot drift between the catalog and this cohort
from .queries import _minhash_ctes

# arrival batches, zone states, slot cells: the r15 conventions
from .queries_staging_r13 import _NB
from .queries_staging_r14 import _IMASK, _IMOD, _KNUTH
from .queries_staging_r15 import (  # noqa: F401
    _DNB,
    _JSLOTS,
    _NEW_BATCH,
    _SLOT_CTES,
    _ZST_CTE,
    _Z_THR_CENTS,
    _cell_slots,
    _doc_batches,
    _epoch_source_grid,
    _zone_states,
)

STAGED_R16: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R16[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R16[name].oracle


# =====================================================================
# A. LSH-index admission ledger
# =====================================================================

# bucket rows with arrival batches: bands (doc_id, band, bkey) from
# the shared md5-minhash chain, joined to the r15 doc_id batch cut
_LSHB_CTE = (
    "WITH "
    + _minhash_ctes()
    + f""", dbounds AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS dmn,
         CAST(max(doc_id) AS BIGINT) AS dmx
  FROM documents
), db AS (
  SELECT doc_id,
         CAST(((doc_id - dmn) * {_DNB}) // (dmx - dmn + 1) AS BIGINT)
           AS dbatch
  FROM documents, dbounds
), bb AS (
  SELECT b.doc_id, b.band, b.bkey, d.dbatch
  FROM bands b JOIN db d ON d.doc_id = b.doc_id
)"""
)


def _bucket_batches(spark, sf_dir):
    """(doc_id, band, bkey, dbatch) — the Spark mirror of _LSHB_CTE's
    ``bb``: md5 LSH bucket rows (ext/dedup._band_buckets with
    fast=False, the oracle-able convention) joined to the arrival-batch
    map. One signature scan; 4 bucket rows per doc."""
    docs = load_table(spark, sf_dir, "documents")
    bb = _band_buckets(docs, "text", "doc_id", 3, 8, 4, fast=False)
    db = _doc_batches(spark, sf_dir)
    return bb.select(F.col("__id").alias("doc_id"), "band", "bkey").join(
        db, "doc_id"
    )


_LSH_GROWTH_ORACLE = (
    _LSHB_CTE
    + f""", expanded AS (
  SELECT doc_id, band, bkey,
         unnest(range(dbatch, {_DNB})) AS snapshot
  FROM bb
)
SELECT CAST(snapshot AS BIGINT) AS snapshot,
       CAST(count(*) AS BIGINT) AS n_bucket_rows,
       CAST(count(DISTINCT (band, bkey)) AS BIGINT) AS n_buckets,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM expanded GROUP BY 1"""
)


@stage(
    "lsh_index_growth_documents",
    _LSH_GROWTH_ORACLE,
    "LSH admission ledger: CUMULATIVE INDEX SIZE per commit — bucket "
    "rows, distinct buckets, and indexed docs after committing "
    "batches 0..s, for every snapshot s. The capacity-planning row of "
    "an incremental dedup index (ext/dedup.save_lsh_index): row count "
    "drives storage, distinct-bucket count drives join selectivity, "
    "and their ratio is the first skew smell. Shape: map-side "
    "sequence expansion of each bucket row to the snapshots that "
    "contain it (the r14 convention — an equi-groupable explode, "
    "never a range join), one grouped aggregate.",
)
def lsh_index_growth_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    expanded = bb.select(
        "doc_id",
        "band",
        "bkey",
        F.explode(
            F.sequence(F.col("dbatch"), F.lit(_DNB - 1).cast("long"))
        ).alias("snapshot"),
    )
    return expanded.groupBy("snapshot").agg(
        F.count(F.lit(1)).alias("n_bucket_rows"),
        F.countDistinct("band", "bkey").alias("n_buckets"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


_LSH_ADMIT_SUMMARY_ORACLE = (
    _LSHB_CTE
    + f""", hits AS (
  SELECT DISTINCT n.doc_id
  FROM bb n JOIN bb i ON i.band = n.band AND i.bkey = n.bkey
  WHERE n.dbatch = {_NEW_BATCH} AND i.dbatch < {_NEW_BATCH}
), newdocs AS (
  SELECT d.doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
  FROM documents d JOIN db ON db.doc_id = d.doc_id
  WHERE db.dbatch = {_NEW_BATCH}
)
SELECT CAST(count(*) AS BIGINT) AS n_new_docs,
       CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 9) AS matched_share,
       CAST(sum(CASE WHEN h.doc_id IS NULL THEN n.ntok ELSE 0 END)
            AS BIGINT) AS novel_tokens
FROM newdocs n LEFT JOIN hits h ON h.doc_id = n.doc_id"""
)


@stage(
    "lsh_admission_summary_documents",
    _LSH_ADMIT_SUMMARY_ORACLE,
    "LSH admission ledger: the ADMISSION DECISION for today's "
    "delivery — batch-4 docs sharing any (band, bucket) with the "
    "committed index (batches 0..3) are duplicate-suspects routed to "
    "verification; the rest are novel and admit directly with their "
    "token mass. This is the one-row ledger entry an ingest pipeline "
    "commits per delivery (ext/dedup.match_against_lsh_index is the "
    "join underneath). Scale: the probe join touches only the "
    "delivery's bucket rows against the stored index — never "
    "corpus x corpus.",
)
def lsh_admission_summary_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    newb = bb.filter(F.col("dbatch") == _NEW_BATCH)
    idx = bb.filter(F.col("dbatch") < _NEW_BATCH).select("band", "bkey")
    hits = (
        newb.join(idx, ["band", "bkey"])
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    newdocs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
        )
        .join(_doc_batches(spark, sf_dir), "doc_id")
        .filter(F.col("dbatch") == _NEW_BATCH)
    )
    j = newdocs.join(hits, "doc_id", "left")
    matched = F.coalesce("hit", F.lit(0))
    return j.agg(
        F.count(F.lit(1)).alias("n_new_docs"),
        F.sum(matched).cast("long").alias("n_matched"),
        F.sum(F.lit(1) - matched).cast("long").alias("n_novel"),
        F.round(
            F.sum(matched).cast("double") / F.count(F.lit(1)), 9
        ).alias("matched_share"),
        F.sum(F.when(F.col("hit").isNull(), F.col("ntok")).otherwise(0))
        .cast("long")
        .alias("novel_tokens"),
    )


_LSH_ADMIT_MATRIX_ORACLE = (
    _LSHB_CTE
    + f""", probe AS (
  SELECT doc_id, band, bkey FROM bb WHERE dbatch = {_NEW_BATCH}
), idx AS (
  SELECT doc_id, band, bkey FROM bb WHERE dbatch < {_NEW_BATCH}
), coll AS (
  SELECT p.band, p.doc_id, CAST(count(*) AS BIGINT) AS fanout
  FROM probe p JOIN idx i ON i.band = p.band AND i.bkey = p.bkey
  GROUP BY 1, 2
)
SELECT p.band,
       CAST(count(*) AS BIGINT) AS n_probe_rows,
       CAST(coalesce(sum(c.fanout), 0) AS BIGINT) AS n_collisions,
       CAST(count(DISTINCT CASE WHEN c.fanout IS NOT NULL
                                THEN p.doc_id END) AS BIGINT)
         AS n_hit_docs
FROM probe p LEFT JOIN coll c
  ON c.band = p.band AND c.doc_id = p.doc_id
GROUP BY p.band"""
)


@stage(
    "lsh_admission_matrix_documents",
    _LSH_ADMIT_MATRIX_ORACLE,
    "LSH admission ledger: the admission join PER BAND — probe rows, "
    "index collisions (the join fan-out actually paid), and distinct "
    "delivery docs each band flags. A band whose collision count "
    "dwarfs its hit-doc count is burning join work on hot buckets "
    "(the _cap_buckets knob); a band that flags nothing is wasted "
    "signature width. Four rows a week of deliveries turns into the "
    "banding-parameter tuning curve. Scale: band-keyed equi-join, "
    "grouped to 4 rows.",
)
def lsh_admission_matrix_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    probe = bb.filter(F.col("dbatch") == _NEW_BATCH).select(
        "doc_id", "band", "bkey"
    )
    idx = bb.filter(F.col("dbatch") < _NEW_BATCH).select("band", "bkey")
    coll = (
        probe.join(idx, ["band", "bkey"])
        .groupBy("band", "doc_id")
        .agg(F.count(F.lit(1)).alias("fanout"))
    )
    return (
        probe.join(coll, ["band", "doc_id"], "left")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_probe_rows"),
            F.coalesce(F.sum("fanout"), F.lit(0))
            .cast("long")
            .alias("n_collisions"),
            F.countDistinct(
                F.when(F.col("fanout").isNotNull(), F.col("doc_id"))
            ).alias("n_hit_docs"),
        )
    )


_LSH_SKEW_ORACLE = (
    _LSHB_CTE
    + f""", expanded AS (
  SELECT band, bkey, unnest(range(dbatch, {_DNB})) AS snapshot
  FROM bb
), bsz AS (
  SELECT snapshot, band, bkey, CAST(count(*) AS BIGINT) AS n
  FROM expanded GROUP BY 1, 2, 3
)
SELECT CAST(snapshot AS BIGINT) AS snapshot,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(max(n) AS BIGINT) AS max_bucket,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ge2,
       CAST(sum(CASE WHEN n >= 4 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ge4,
       CAST(sum(CASE WHEN n >= 8 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_ge8,
       CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS pair_cost
FROM bsz GROUP BY 1"""
)


@stage(
    "lsh_bucket_skew_commits_documents",
    _LSH_SKEW_ORACLE,
    "LSH admission ledger: BUCKET-SKEW EVOLUTION per commit — bucket "
    "count, the hottest bucket, fixed-edge occupancy counts "
    "(>=2/4/8, the boolean-sum convention), and the exact "
    "intra-bucket pair cost sum(n*(n-1) div 2): the self-join work a "
    "full dedup pass would pay at each vintage. A pair_cost curve "
    "bending upward faster than rows means duplicates are "
    "concentrating into hot buckets — the signal to turn the "
    "_cap_buckets knob or re-band BEFORE a scheduled full pass "
    "stalls. Scale: pure state arithmetic over (snapshot, bucket) "
    "counts.",
)
def lsh_bucket_skew_commits_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    expanded = bb.select(
        "band",
        "bkey",
        F.explode(
            F.sequence(F.col("dbatch"), F.lit(_DNB - 1).cast("long"))
        ).alias("snapshot"),
    )
    bsz = expanded.groupBy("snapshot", "band", "bkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    return bsz.groupBy("snapshot").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.sum((F.col("n") >= 2).cast("long")).alias("n_ge2"),
        F.sum((F.col("n") >= 4).cast("long")).alias("n_ge4"),
        F.sum((F.col("n") >= 8).cast("long")).alias("n_ge8"),
        F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("pair_cost"),
    )


_LSH_STALE_ORACLE = (
    _LSHB_CTE
    + f""", emb AS (
  SELECT n.doc_id, n.dbatch,
         CAST(min(i.dbatch) AS BIGINT) AS first_match_batch
  FROM bb n JOIN bb i
    ON i.band = n.band AND i.bkey = n.bkey AND i.dbatch < n.dbatch
  GROUP BY 1, 2
), arrivals AS (
  SELECT db.doc_id, db.dbatch, e.first_match_batch
  FROM db LEFT JOIN emb e ON e.doc_id = db.doc_id
  WHERE db.dbatch > 0
), swept AS (
  SELECT a.*, unnest(range(0, a.dbatch)) AS frozen_at
  FROM arrivals a
)
SELECT CAST(frozen_at AS BIGINT) AS frozen_at,
       CAST(count(*) AS BIGINT) AS n_later_docs,
       CAST(sum(CASE WHEN first_match_batch IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_match_at_arrival,
       CAST(sum(CASE WHEN first_match_batch <= frozen_at
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_match_frozen,
       CAST(sum(CASE WHEN first_match_batch > frozen_at
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missed
FROM swept GROUP BY 1"""
)


@stage(
    "lsh_index_staleness_documents",
    _LSH_STALE_ORACLE,
    "LSH admission ledger: WHAT FREEZING THE INDEX COSTS — for every "
    "frozen vintage s, among docs arriving after s: how many match "
    "a live index at their arrival (first matching index batch "
    "exists), how many the frozen index still catches (first match "
    "<= s), and how many duplicates it MISSES (first match after s: "
    "their nearest prior copy arrived after the freeze). n_missed "
    "as a share of matches is the re-index alarm in admission "
    "terms — the complement of the r11 embedding index_staleness "
    "monitor, for the dedup index. Shape: one bucket equi-join "
    "computes first_match_batch per doc; the vintage sweep is a "
    "map-side range expansion over doc rows (never a range join).",
)
def lsh_index_staleness_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    n, i = bb.alias("n"), bb.alias("i")
    emb = (
        n.join(
            i,
            (F.col("i.band") == F.col("n.band"))
            & (F.col("i.bkey") == F.col("n.bkey"))
            & (F.col("i.dbatch") < F.col("n.dbatch")),
        )
        .groupBy(F.col("n.doc_id").alias("doc_id"))
        .agg(F.min("i.dbatch").alias("first_match_batch"))
    )
    arrivals = (
        _doc_batches(spark, sf_dir)
        .filter(F.col("dbatch") > 0)
        .join(emb, "doc_id", "left")
    )
    swept = arrivals.select(
        "first_match_batch",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("dbatch") - 1)
        ).alias("frozen_at"),
    )
    fm = F.col("first_match_batch")
    return swept.groupBy("frozen_at").agg(
        F.count(F.lit(1)).alias("n_later_docs"),
        F.sum(fm.isNotNull().cast("long")).alias("n_match_at_arrival"),
        F.sum(
            F.when(fm <= F.col("frozen_at"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_match_frozen"),
        F.sum(F.when(fm > F.col("frozen_at"), 1).otherwise(0))
        .cast("long")
        .alias("n_missed"),
    )


_LSH_BAND_YIELD_ORACLE = (
    _LSHB_CTE
    + """, bpairs AS (
  SELECT DISTINCT a.band, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a JOIN bb b
    ON b.band = a.band AND b.bkey = a.bkey AND a.doc_id < b.doc_id
), spread AS (
  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_bands
  FROM bpairs GROUP BY 1, 2
)
SELECT p.band,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN s.n_bands = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pairs_unique,
       round(CAST(sum(CASE WHEN s.n_bands = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 9) AS unique_share
FROM bpairs p JOIN spread s
  ON s.doc_a = p.doc_a AND s.doc_b = p.doc_b
GROUP BY p.band"""
)


@stage(
    "lsh_band_yield_documents",
    _LSH_BAND_YIELD_ORACLE,
    "LSH admission ledger: BAND REDUNDANCY ECONOMICS — candidate "
    "pairs each band contributes, and the pairs ONLY that band finds "
    "(n_bands = 1 in the pair's band spread). High unique_share "
    "means every band pulls its weight (dropping one loses recall); "
    "near-zero means the bands are redundant and the index could "
    "halve its width for the same recall at half the storage and "
    "probe cost. This is the measured face of the banding S-curve "
    "the r10 lsh_calibration family models analytically. Scale: the "
    "pair list is bucket-join-pruned; the spread is one grouped "
    "count over it.",
)
def lsh_band_yield_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    a, b = bb.alias("a"), bb.alias("b")
    bpairs = (
        a.join(
            b,
            (F.col("b.band") == F.col("a.band"))
            & (F.col("b.bkey") == F.col("a.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.band").alias("band"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    spread = bpairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_bands")
    )
    uniq = (F.col("n_bands") == 1).cast("long")
    return (
        bpairs.join(spread, ["doc_a", "doc_b"])
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(uniq).alias("n_pairs_unique"),
            F.round(
                F.sum(uniq).cast("double") / F.count(F.lit(1)), 9
            ).alias("unique_share"),
        )
    )


_LSH_PROBE_COST_ORACLE = (
    _LSHB_CTE
    + f""", fan AS (
  SELECT n.dbatch AS batch, CAST(count(*) AS BIGINT) AS fanout
  FROM bb n JOIN bb i
    ON i.band = n.band AND i.bkey = n.bkey AND i.dbatch < n.dbatch
  GROUP BY 1
), probe AS (
  SELECT dbatch AS batch, CAST(count(*) AS BIGINT) AS n_probe_rows
  FROM bb WHERE dbatch > 0 GROUP BY 1
), isz AS (
  SELECT CAST(e.snapshot AS BIGINT) AS batch,
         CAST(count(*) AS BIGINT) AS n_index_rows
  FROM (SELECT unnest(range(dbatch + 1, {_DNB})) AS snapshot FROM bb) e
  GROUP BY 1
)
SELECT p.batch, p.n_probe_rows,
       CAST(coalesce(i.n_index_rows, 0) AS BIGINT) AS n_index_rows,
       CAST(coalesce(f.fanout, 0) AS BIGINT) AS n_collisions
FROM probe p
LEFT JOIN isz i ON i.batch = p.batch
LEFT JOIN fan f ON f.batch = p.batch"""
)


@stage(
    "lsh_probe_cost_curve_documents",
    _LSH_PROBE_COST_ORACLE,
    "LSH admission ledger: the PROBE-COST CURVE — per arrival batch: "
    "its probe rows, the index rows it probed against, and the "
    "collisions the join actually produced. fanout/probe_rows is the "
    "measured admission cost per delivery doc, and its trend against "
    "index growth says whether admission cost is staying flat "
    "(healthy hashing) or creeping with corpus size (hot buckets "
    "compounding — the curve save_lsh_index's sorted layout and "
    "_cap_buckets exist to bend down). Scale: one bucket equi-join "
    "with a batch-order filter, grouped to 4 rows; the index-size "
    "table is 4x5 metadata rows.",
)
def lsh_probe_cost_curve_documents(spark, sf_dir):
    bb = _bucket_batches(spark, sf_dir)
    n, i = bb.alias("n"), bb.alias("i")
    fan = (
        n.join(
            i,
            (F.col("i.band") == F.col("n.band"))
            & (F.col("i.bkey") == F.col("n.bkey"))
            & (F.col("i.dbatch") < F.col("n.dbatch")),
        )
        .groupBy(F.col("n.dbatch").alias("batch"))
        .agg(F.count(F.lit(1)).alias("fanout"))
    )
    probe = (
        bb.filter(F.col("dbatch") > 0)
        .groupBy(F.col("dbatch").alias("batch"))
        .agg(F.count(F.lit(1)).alias("n_probe_rows"))
    )
    # index size per probed batch via map-side sequence expansion —
    # a `ib < batch` theta join would plan as a nested-loop join.
    # Guard the last batch: Spark's sequence(5, 4) yields a DESCENDING
    # sequence where DuckDB's range(5, 5) is empty — the when() maps
    # it to NULL, which explode drops.
    isz = (
        bb.select(
            F.explode(
                F.when(
                    F.col("dbatch") < _DNB - 1,
                    F.sequence(
                        F.col("dbatch") + 1, F.lit(_DNB - 1).cast("long")
                    ),
                )
            ).alias("batch")
        )
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n_index_rows"))
    )
    return (
        probe.join(isz, "batch", "left")
        .join(fan, "batch", "left")
        .select(
            "batch",
            "n_probe_rows",
            F.coalesce("n_index_rows", F.lit(0))
            .cast("long")
            .alias("n_index_rows"),
            F.coalesce("fanout", F.lit(0))
            .cast("long")
            .alias("n_collisions"),
        )
    )


# =====================================================================
# B. Sampler execution plans over the (epoch, source) slot grid
# =====================================================================

# picks: within each (epoch, source) cell, the first `slots` documents
# by the masked interleave key — the r15 plan EXECUTED. The rank
# window is per-cell; slots <= 1000 bounds the selection, so at scale
# this is a per-partition partial top-k + merge (the window form is
# the exact oracle face).
_PICKS_CTES = (
    _SLOT_CTES
    + f""", keyed AS (
  SELECT e.epoch, s.source, s.doc_id, s.ntok,
         CAST(((s.doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD} AS BIGINT)
           AS ikey
  FROM scored s JOIN emap e ON e.bucket = s.bucket
), rankedp AS (
  SELECT k.*, row_number() OVER (PARTITION BY epoch, source
                                 ORDER BY ikey, doc_id) AS rnk
  FROM keyed k
), picks AS (
  SELECT r.epoch, r.source, r.doc_id, r.ntok, r.ikey,
         CAST(r.rnk AS BIGINT) AS rnk,
         c.slots, c.n_docs, c.etok,
         CAST(CASE WHEN r.rnk <= c.slots THEN 1 ELSE 0 END AS BIGINT)
           AS picked
  FROM rankedp r JOIN cells c
    ON c.epoch = r.epoch AND c.source = r.source
)"""
)


def _cell_picks(spark, sf_dir):
    """The Spark mirror of _PICKS_CTES' ``picks``: every document with
    its in-cell interleave rank, its cell's slot quota, and the picked
    flag. The cells frame is metadata-size (broadcast)."""
    from .queries_staging_r14 import _epoch_map, _scored_docs

    scored = _scored_docs(spark, sf_dir)
    emap = _epoch_map(spark, sf_dir).select("bucket", "epoch")
    keyed = scored.join(F.broadcast(emap), "bucket").select(
        "epoch",
        "source",
        "doc_id",
        "ntok",
        F.expr(f"((doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD}")
        .cast("long")
        .alias("ikey"),
    )
    w = Window.partitionBy("epoch", "source").orderBy("ikey", "doc_id")
    ranked = keyed.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )
    cells = _cell_slots(spark, sf_dir).select(
        "epoch", "source", "slots", "n_docs", "etok"
    )
    return ranked.join(F.broadcast(cells), ["epoch", "source"]).withColumn(
        "picked", (F.col("rnk") <= F.col("slots")).cast("long")
    )


_S_FILL_ORACLE = (
    _PICKS_CTES
    + """
SELECT epoch, source,
       CAST(max(slots) AS BIGINT) AS slots,
       CAST(max(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(picked) AS BIGINT) AS n_picked,
       CAST(max(slots) - sum(picked) AS BIGINT) AS shortfall
FROM picks GROUP BY 1, 2"""
)


@stage(
    "sampler_cell_fill_documents",
    _S_FILL_ORACLE,
    "sampler execution: CELL FILL — per (epoch, source): the plan's "
    "slot quota, the cell's document supply, the picks actually "
    "made (rank <= slots under the deterministic interleave), and "
    "the SHORTFALL where the source ran out of documents. A plan "
    "whose quotas exceed supply silently under-delivers its mix; "
    "this is the per-cell audit row that catches it at execution "
    "time, not after training. Scale: the rank is a bounded-k "
    "per-cell top-k; the audit is one grouped count.",
)
def sampler_cell_fill_documents(spark, sf_dir):
    p = _cell_picks(spark, sf_dir)
    return p.groupBy("epoch", "source").agg(
        F.max("slots").cast("long").alias("slots"),
        F.max("n_docs").cast("long").alias("n_docs"),
        F.sum("picked").cast("long").alias("n_picked"),
        (F.max("slots") - F.sum("picked")).cast("long").alias("shortfall"),
    )


_S_HEADS_ORACLE = (
    _PICKS_CTES
    + """
SELECT epoch, source, CAST(rnk AS BIGINT) AS position, doc_id, ikey
FROM picks WHERE picked = 1 AND rnk <= 2"""
)


@stage(
    "sampler_picks_head_documents",
    _S_HEADS_ORACLE,
    "sampler execution: the first 2 PICKS per cell — concrete "
    "doc_ids with their interleave keys, the execution witness a "
    "resumed or re-run training job replays bit-for-bit (same data, "
    "same plan, same key -> same first batches on any engine and "
    "any partitioning). Scale: per-cell top-2 windows, output "
    "bounded by 2 x cells.",
)
def sampler_picks_head_documents(spark, sf_dir):
    p = _cell_picks(spark, sf_dir)
    return (
        p.filter((F.col("picked") == 1) & (F.col("rnk") <= 2))
        .select(
            "epoch",
            "source",
            F.col("rnk").alias("position"),
            "doc_id",
            "ikey",
        )
    )


_S_COVER_ORACLE = (
    _PICKS_CTES
    + f"""
SELECT epoch,
       CAST({_JSLOTS} AS BIGINT) AS planned_slots,
       CAST(sum(picked) AS BIGINT) AS n_picked,
       CAST({_JSLOTS} - sum(picked) AS BIGINT) AS unfilled,
       round(CAST(sum(picked) AS DOUBLE) / {_JSLOTS}, 9) AS fill_share,
       CAST(count(*) AS BIGINT) AS n_epoch_docs,
       round(CAST(sum(picked) AS DOUBLE) / count(*), 9)
         AS picked_doc_share
FROM picks GROUP BY epoch"""
)


@stage(
    "sampler_epoch_coverage_documents",
    _S_COVER_ORACLE,
    "sampler execution: EPOCH COVERAGE — planned slots (exactly 1000 "
    "per epoch by the Hamilton rounding) vs picks delivered, the "
    "unfilled remainder, and what share of the epoch's documents the "
    "sample touches. unfilled > 0 means supply-constrained cells "
    "exist (see sampler_shortfall_reallocation for where the slots "
    "should go); picked_doc_share near 1 means the 'sample' is "
    "nearly the full epoch and sampling adds no variance reduction. "
    "Scale: a 4-row aggregate over the picks frame.",
)
def sampler_epoch_coverage_documents(spark, sf_dir):
    p = _cell_picks(spark, sf_dir)
    return p.groupBy("epoch").agg(
        F.lit(_JSLOTS).cast("long").alias("planned_slots"),
        F.sum("picked").cast("long").alias("n_picked"),
        (F.lit(_JSLOTS) - F.sum("picked")).cast("long").alias("unfilled"),
        F.round(F.sum("picked").cast("double") / _JSLOTS, 9).alias(
            "fill_share"
        ),
        F.count(F.lit(1)).alias("n_epoch_docs"),
        F.round(
            F.sum("picked").cast("double") / F.count(F.lit(1)), 9
        ).alias("picked_doc_share"),
    )


_S_REALLOC_ORACLE = (
    _SLOT_CTES
    + f""", fill AS (
  SELECT epoch, source, slots, n_docs,
         CAST(least(slots, n_docs) AS BIGINT) AS n_picked,
         CAST(n_docs - least(slots, n_docs) AS BIGINT) AS headroom
  FROM cells
), lo AS (
  SELECT *,
         CAST({_JSLOTS} - sum(n_picked) OVER (PARTITION BY epoch)
              AS BIGINT) AS leftover,
         CAST(coalesce(sum(n_docs - least(slots, n_docs))
                OVER (PARTITION BY epoch
                      ORDER BY n_docs - least(slots, n_docs) DESC, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS head_before
  FROM fill
)
SELECT epoch, source, slots, n_picked, headroom,
       CAST(greatest(CAST(0 AS BIGINT),
                     least(headroom, leftover - head_before))
            AS BIGINT) AS extra_grant,
       CAST(n_picked
            + greatest(CAST(0 AS BIGINT),
                       least(headroom, leftover - head_before))
            AS BIGINT) AS final_picks
FROM lo"""
)


@stage(
    "sampler_shortfall_reallocation_documents",
    _S_REALLOC_ORACLE,
    "sampler execution: SHORTFALL REALLOCATION — the slots that "
    "supply-constrained cells could not fill are re-granted within "
    "their epoch to cells with remaining documents, greedily in "
    "(headroom DESC, source ASC) order (the r13/r15 clamp "
    "convention: grant = clamp(leftover - headroom_before, 0, "
    "headroom)). The second-pass plan every real sampler needs: "
    "without it an under-supplied epoch silently trains on fewer "
    "tokens. Every column is exact integer arithmetic over cell "
    "rows — the reallocation replays identically on any engine. "
    "Scale: per-epoch windows over metadata rows.",
)
def sampler_shortfall_reallocation_documents(spark, sf_dir):
    cells = _cell_slots(spark, sf_dir)
    picked = F.least(F.col("slots"), F.col("n_docs"))
    fill = cells.select(
        "epoch",
        "source",
        "slots",
        "n_docs",
        picked.cast("long").alias("n_picked"),
        (F.col("n_docs") - picked).cast("long").alias("headroom"),
    )
    we = Window.partitionBy("epoch")
    wh = Window.partitionBy("epoch").orderBy(
        F.desc("headroom"), "source"
    ).rowsBetween(Window.unboundedPreceding, -1)
    lo = fill.select(
        "epoch",
        "source",
        "slots",
        "n_picked",
        "headroom",
        (F.lit(_JSLOTS) - F.sum("n_picked").over(we))
        .cast("long")
        .alias("leftover"),
        F.coalesce(F.sum("headroom").over(wh), F.lit(0))
        .cast("long")
        .alias("head_before"),
    )
    grant = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("headroom"), F.col("leftover") - F.col("head_before")),
    )
    return lo.select(
        "epoch",
        "source",
        "slots",
        "n_picked",
        "headroom",
        grant.alias("extra_grant"),
        (F.col("n_picked") + grant).cast("long").alias("final_picks"),
    )


_S_YIELD_ORACLE = (
    _PICKS_CTES
    + f"""
SELECT epoch,
       CAST(sum(CASE WHEN picked = 1 THEN ntok ELSE 0 END) AS BIGINT)
         AS picked_tokens,
       CAST((max(etok) * sum(picked)) // {_JSLOTS} AS BIGINT)
         AS expected_tokens,
       CAST(sum(CASE WHEN picked = 1 THEN ntok ELSE 0 END)
            - (max(etok) * sum(picked)) // {_JSLOTS} AS BIGINT)
         AS deviation_tokens,
       round((CAST(sum(CASE WHEN picked = 1 THEN ntok ELSE 0 END)
                   AS DOUBLE)
              - (max(etok) * sum(picked)) // {_JSLOTS})
             / max(etok), 9) AS deviation_share
FROM picks GROUP BY epoch"""
)


@stage(
    "sampler_token_yield_documents",
    _S_YIELD_ORACLE,
    "sampler execution: TOKEN YIELD vs the slot-implied expectation — "
    "slots are allocated on token shares but picked in DOCUMENT "
    "units, so the tokens a sample actually delivers deviate from "
    "slots/1000 of the epoch's tokens whenever document lengths are "
    "uneven across sources. The deviation (exact integers up to the "
    "final share) is the proxy error of doc-count slots; a pipeline "
    "that budgets training in tokens corrects its next plan by this "
    "row. Scale: a 4-row aggregate over the picks frame.",
)
def sampler_token_yield_documents(spark, sf_dir):
    p = _cell_picks(spark, sf_dir)
    ptok = F.sum(F.when(F.col("picked") == 1, F.col("ntok")).otherwise(0))
    expected = F.expr(f"max(etok) * sum(picked) div {_JSLOTS}")
    return p.groupBy("epoch").agg(
        ptok.cast("long").alias("picked_tokens"),
        expected.cast("long").alias("expected_tokens"),
        (ptok - expected).cast("long").alias("deviation_tokens"),
        F.round(
            (ptok - expected).cast("double") / F.max("etok"), 9
        ).alias("deviation_share"),
    )


_S_WITNESS_ORACLE = (
    _PICKS_CTES
    + """
SELECT epoch, source,
       CAST(count(*) AS BIGINT) AS n_picked,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_ids,
       CAST(min(ikey) AS BIGINT) AS min_ikey,
       CAST(max(ikey) AS BIGINT) AS max_ikey
FROM picks WHERE picked = 1 GROUP BY 1, 2"""
)


@stage(
    "sampler_pick_witness_documents",
    _S_WITNESS_ORACLE,
    "sampler execution: the PICK WITNESS — per cell: pick count, the "
    "exact sum of picked doc_ids, and the picked key range. A "
    "re-run of the same plan over the same data must reproduce this "
    "row bit-for-bit on any engine; committing the witness next to "
    "the sample makes 'did the sampler change under me?' a metadata "
    "diff instead of a data diff (the dedup-fingerprint idea applied "
    "to the sampler itself). Scale: one grouped aggregate over "
    "picked rows, output = cells.",
)
def sampler_pick_witness_documents(spark, sf_dir):
    p = _cell_picks(spark, sf_dir)
    return (
        p.filter(F.col("picked") == 1)
        .groupBy("epoch", "source")
        .agg(
            F.count(F.lit(1)).alias("n_picked"),
            F.sum("doc_id").cast("long").alias("sum_doc_ids"),
            F.min("ikey").alias("min_ikey"),
            F.max("ikey").alias("max_ikey"),
        )
    )


_S_MIX_ORACLE = (
    _PICKS_CTES
    + """, per_source AS (
  SELECT source,
         CAST(sum(CASE WHEN rnk = 1 THEN slots ELSE 0 END) AS BIGINT)
           AS planned_slots,
         CAST(sum(picked) AS BIGINT) AS realized_picks
  FROM picks GROUP BY source
), tots AS (
  SELECT CAST(sum(planned_slots) AS BIGINT) AS tp,
         CAST(sum(realized_picks) AS BIGINT) AS tr
  FROM per_source
)
SELECT s.source, s.planned_slots, s.realized_picks,
       round(CAST(s.planned_slots AS DOUBLE) / t.tp, 9) AS planned_share,
       round(CAST(s.realized_picks AS DOUBLE) / t.tr, 9)
         AS realized_share
FROM per_source s, tots t"""
)


@stage(
    "sampler_source_realized_mix_documents",
    _S_MIX_ORACLE,
    "sampler execution: PLANNED vs REALIZED SOURCE MIX — each "
    "source's slot total across epochs (counted once per cell via "
    "the rank-1 row) against the picks actually delivered, as "
    "shares of their respective totals. Supply-constrained cells "
    "bend the realized mix away from the plan toward document-rich "
    "sources — exactly the drift the mix planner promised to "
    "prevent, so this row closes the plan->execute->audit loop the "
    "r13 allocation family opened. Scale: one grouped aggregate "
    "over picks + a 1-row totals broadcast.",
)
def sampler_source_realized_mix_documents(spark, sf_dir):
    p = _cell_picks(spark, sf_dir)
    per_source = p.groupBy("source").agg(
        F.sum(F.when(F.col("rnk") == 1, F.col("slots")).otherwise(0))
        .cast("long")
        .alias("planned_slots"),
        F.sum("picked").cast("long").alias("realized_picks"),
    )
    tots = per_source.agg(
        F.sum("planned_slots").cast("long").alias("tp"),
        F.sum("realized_picks").cast("long").alias("tr"),
    )
    return per_source.crossJoin(F.broadcast(tots)).select(
        "source",
        "planned_slots",
        "realized_picks",
        F.round(F.col("planned_slots").cast("double") / F.col("tp"), 9)
        .alias("planned_share"),
        F.round(F.col("realized_picks").cast("double") / F.col("tr"), 9)
        .alias("realized_share"),
    )


# =====================================================================
# C. Multi-predicate pruning algebra over the zone-state ledger
# =====================================================================

_Z_LO_CENTS = 10000  # the "value <= 100" predicate's cents threshold
# the AND query under study: value >= 400 AND es >= cut_4 (the last
# snapshot cut); the OR query is the same pair disjoined. Predicate
# names are stable strings shared by the order/short-circuit queries.
_P_HI = "value_ge_400"
_P_REC = "es_ge_cut4"

# zone flags per state row: each TRUE flag is a PROOF the state's
# rows cannot match the predicate (skip is sound); the composites
# follow the algebra — AND skips when EITHER conjunct proves empty,
# OR only when BOTH do
_ZFLAG_CTE = (
    _ZST_CTE
    + f""", zf AS (
  SELECT event_type, batch, n, zmin_cents, zmax_cents,
         CAST(CASE WHEN zmax_cents < {_Z_THR_CENTS} THEN 1 ELSE 0 END
              AS BIGINT) AS p_hi,
         CAST(CASE WHEN zmax_es < mn + (mx - mn + 1) * {_NB - 1} // {_NB}
                   THEN 1 ELSE 0 END AS BIGINT) AS p_rec,
         CAST(CASE WHEN zmin_cents > {_Z_LO_CENTS} THEN 1 ELSE 0 END
              AS BIGINT) AS p_lo
  FROM zst
)"""
)


def _zone_flags(spark, sf_dir):
    """The Spark mirror of _ZFLAG_CTE's ``zf``: the three atomic
    prune flags per (event_type, batch) state row."""
    st = _zone_states(spark, sf_dir)
    cut = F.expr(f"mn + (mx - mn + 1) * {_NB - 1} div {_NB}")
    return st.select(
        "event_type",
        "batch",
        "n",
        "zmin_cents",
        "zmax_cents",
        (F.col("zmax_cents") < _Z_THR_CENTS).cast("long").alias("p_hi"),
        (F.col("zmax_es") < cut).cast("long").alias("p_rec"),
        (F.col("zmin_cents") > _Z_LO_CENTS).cast("long").alias("p_lo"),
    )


_P_ALGEBRA_ORACLE = (
    _ZFLAG_CTE
    + """
SELECT event_type, batch, n, p_hi, p_rec, p_lo,
       CAST(CASE WHEN p_hi = 1 OR p_rec = 1 THEN 1 ELSE 0 END AS BIGINT)
         AS and_skip,
       CAST(CASE WHEN p_hi = 1 AND p_rec = 1 THEN 1 ELSE 0 END AS BIGINT)
         AS or_skip
FROM zf"""
)


@stage(
    "prune_algebra_matrix_events",
    _P_ALGEBRA_ORACLE,
    "pruning algebra: the COMPOSITE PRUNE MATRIX — per (partition, "
    "commit) state row: the three atomic zone proofs (value >= 400 "
    "empty, es >= last-cut empty, value <= 100 empty) and the "
    "composites they imply: an AND query skips the state when EITHER "
    "conjunct's zones prove it empty (and_skip = p_hi OR p_rec); an "
    "OR query only when BOTH do (or_skip = p_hi AND p_rec). The "
    "algebra is what turns single-column zone maps into a predicate-"
    "TREE planner — the same rules Iceberg/parquet row-group filters "
    "apply, computed here over the committed validation ledger so "
    "the planner needs NO extra metadata store. Scale: three integer "
    "comparisons per metadata row.",
)
def prune_algebra_matrix_events(spark, sf_dir):
    zf = _zone_flags(spark, sf_dir)
    return zf.select(
        "event_type",
        "batch",
        "n",
        "p_hi",
        "p_rec",
        "p_lo",
        ((F.col("p_hi") == 1) | (F.col("p_rec") == 1))
        .cast("long")
        .alias("and_skip"),
        ((F.col("p_hi") == 1) & (F.col("p_rec") == 1))
        .cast("long")
        .alias("or_skip"),
    )


_P_ORDER_ORACLE = (
    _ZFLAG_CTE
    + f""", per_pred AS (
  SELECT p.name,
         CAST(sum(CASE WHEN p.name = '{_P_HI}' THEN zf.p_hi
                       ELSE zf.p_rec END) AS BIGINT) AS n_states_pruned,
         CAST(sum(CASE WHEN p.name = '{_P_HI}' THEN zf.p_hi * zf.n
                       ELSE zf.p_rec * zf.n END) AS BIGINT)
           AS n_rows_skipped
  FROM zf CROSS JOIN (SELECT unnest(['{_P_HI}', '{_P_REC}']) AS name) p
  GROUP BY p.name
)
SELECT name AS predicate, n_states_pruned, n_rows_skipped,
       CAST(row_number() OVER (ORDER BY n_rows_skipped DESC, name)
            AS BIGINT) AS eval_rank
FROM per_pred"""
)


@stage(
    "prune_shortcircuit_order_events",
    _P_ORDER_ORACLE,
    "pruning algebra: SHORT-CIRCUIT ORDER — per conjunct of the AND "
    "query: states its zones prune alone and rows that retires, "
    "ranked (rows DESC, name ASC). For an AND query the planner "
    "tests the most-selective proof first: every state it eliminates "
    "never pays the second comparison — trivial per state, decisive "
    "when the predicate tree is deep and the ledger is 10^5 rows. "
    "Shape: a 2-literal map-side explode over the flag table (the "
    "sweep convention), one grouped aggregate, a 2-row ranking "
    "window.",
)
def prune_shortcircuit_order_events(spark, sf_dir):
    zf = _zone_flags(spark, sf_dir)
    swept = zf.select(
        "n",
        "p_hi",
        "p_rec",
        F.explode(
            F.array(F.lit(_P_HI), F.lit(_P_REC))
        ).alias("predicate"),
    )
    flag = F.when(F.col("predicate") == _P_HI, F.col("p_hi")).otherwise(
        F.col("p_rec")
    )
    per = swept.groupBy("predicate").agg(
        F.sum(flag).cast("long").alias("n_states_pruned"),
        F.sum(flag * F.col("n")).cast("long").alias("n_rows_skipped"),
    )
    w = Window.orderBy(F.desc("n_rows_skipped"), "predicate")
    return per.select(
        "predicate",
        "n_states_pruned",
        "n_rows_skipped",
        F.row_number().over(w).cast("long").alias("eval_rank"),
    )


_P_RESIDUAL_ORACLE = (
    _ZFLAG_CTE
    + """
SELECT event_type,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN p_hi = 0 AND p_rec = 0 THEN n ELSE 0 END)
            AS BIGINT) AS n_rows_residual,
       CAST(count(*) AS BIGINT) AS n_states,
       CAST(sum(CASE WHEN p_hi = 0 AND p_rec = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_states_residual,
       round(CAST(sum(CASE WHEN p_hi = 0 AND p_rec = 0 THEN n ELSE 0 END)
                  AS DOUBLE) / sum(n), 9) AS residual_share
FROM zf GROUP BY event_type"""
)


@stage(
    "prune_residual_scan_events",
    _P_RESIDUAL_ORACLE,
    "pruning algebra: the RESIDUAL SCAN ESTIMATE — per partition, "
    "the rows and states the AND query must still read after "
    "composite pruning (neither conjunct's zones proved them empty). "
    "This number IS the query's I/O cost estimate, computed from the "
    "ledger before any file opens — the planner-facing product of "
    "the whole zone family: 'this query will scan 7% of the "
    "partition' as exact state arithmetic. Scale: one pass over "
    "metadata rows.",
)
def prune_residual_scan_events(spark, sf_dir):
    zf = _zone_flags(spark, sf_dir)
    residual = (F.col("p_hi") == 0) & (F.col("p_rec") == 0)
    return zf.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.when(residual, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_rows_residual"),
        F.count(F.lit(1)).alias("n_states"),
        F.sum(residual.cast("long")).alias("n_states_residual"),
        F.round(
            F.sum(F.when(residual, F.col("n")).otherwise(0)).cast("double")
            / F.sum("n"),
            9,
        ).alias("residual_share"),
    )


_P_SOUND_ORACLE = (
    _ZFLAG_CTE
    + f""", pruned AS (
  SELECT event_type, batch, n FROM zf WHERE p_hi = 1 OR p_rec = 1
), matches AS (
  SELECT e.event_type, e.batch
  FROM ev e
  WHERE CAST(round(e.value * 100.0) AS BIGINT) >= {_Z_THR_CENTS}
    AND e.es >= e.mn + (e.mx - e.mn + 1) * {_NB - 1} // {_NB}
), act AS (
  SELECT m.event_type,
         CAST(count(*) AS BIGINT) AS actual_matches_total,
         CAST(sum(CASE WHEN p.batch IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS actual_in_pruned
  FROM matches m LEFT JOIN pruned p
    ON p.event_type = m.event_type AND p.batch = m.batch
  GROUP BY m.event_type
), clm AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_pruned_states,
         CAST(sum(n) AS BIGINT) AS claimed_skipped_rows
  FROM pruned GROUP BY event_type
)
SELECT z.event_type,
       CAST(coalesce(c.n_pruned_states, 0) AS BIGINT) AS n_pruned_states,
       CAST(coalesce(c.claimed_skipped_rows, 0) AS BIGINT)
         AS claimed_skipped_rows,
       CAST(coalesce(a.actual_matches_total, 0) AS BIGINT)
         AS actual_matches_total,
       CAST(coalesce(a.actual_in_pruned, 0) AS BIGINT)
         AS actual_in_pruned
FROM (SELECT DISTINCT event_type FROM zf) z
LEFT JOIN clm c ON c.event_type = z.event_type
LEFT JOIN act a ON a.event_type = z.event_type"""
)


@stage(
    "prune_composite_soundness_events",
    _P_SOUND_ORACLE,
    "pruning algebra: the COMPOSITE SOUNDNESS AUDIT — recompute from "
    "rows how many actual AND-query matches (value >= 400 AND es >= "
    "last-cut) live inside states the composite rule pruned: must be "
    "zero, reported per partition rather than assumed (the r15 "
    "single-predicate audit extended to the algebra — a bug in the "
    "COMPOSITION rule, not just a corrupt zone, would surface here). "
    "The one deliberate row-scan of the family; everything else in "
    "the cohort trusts what this query periodically proves. Scale: "
    "one scan + an equi-join against the tiny pruned-state list.",
)
def prune_composite_soundness_events(spark, sf_dir):
    from .queries_staging_r13 import _events_batched

    zf = _zone_flags(spark, sf_dir)
    pruned = zf.filter(
        (F.col("p_hi") == 1) | (F.col("p_rec") == 1)
    ).select("event_type", "batch", "n")
    ev = _events_batched(spark, sf_dir)
    cents = F.round(F.col("value") * F.lit(100.0)).cast("long")
    cut = F.expr(f"mn + (mx - mn + 1) * {_NB - 1} div {_NB}")
    matches = ev.filter(
        (cents >= _Z_THR_CENTS) & (F.col("es") >= cut)
    ).select("event_type", "batch")
    act = (
        matches.join(
            pruned.select("event_type", "batch", F.lit(1).alias("inp")),
            ["event_type", "batch"],
            "left",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("actual_matches_total"),
            F.sum(F.coalesce("inp", F.lit(0)))
            .cast("long")
            .alias("actual_in_pruned"),
        )
    )
    clm = pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pruned_states"),
        F.sum("n").cast("long").alias("claimed_skipped_rows"),
    )
    types = zf.select("event_type").distinct()
    return (
        types.join(clm, "event_type", "left")
        .join(act, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_pruned_states", F.lit(0))
            .cast("long")
            .alias("n_pruned_states"),
            F.coalesce("claimed_skipped_rows", F.lit(0))
            .cast("long")
            .alias("claimed_skipped_rows"),
            F.coalesce("actual_matches_total", F.lit(0))
            .cast("long")
            .alias("actual_matches_total"),
            F.coalesce("actual_in_pruned", F.lit(0))
            .cast("long")
            .alias("actual_in_pruned"),
        )
    )


_P_SYNERGY_ORACLE = (
    _ZFLAG_CTE
    + """
SELECT p_hi, p_rec,
       CAST(count(*) AS BIGINT) AS n_states,
       CAST(sum(n) AS BIGINT) AS n_rows
FROM zf GROUP BY 1, 2"""
)


@stage(
    "prune_predicate_synergy_events",
    _P_SYNERGY_ORACLE,
    "pruning algebra: the PREDICATE SYNERGY contingency — state "
    "counts and row mass over the 2x2 grid of the two conjuncts' "
    "flags. Mass concentrated on the diagonal (both flags agree) "
    "means the predicates prune the SAME states — the second "
    "conjunct adds nothing and the AND composite is as strong as "
    "its best member; off-diagonal mass means they are "
    "COMPLEMENTARY and the composite prunes strictly more than "
    "either alone. The planner's reason to keep (or drop) a "
    "conjunct's zone columns from the ledger. Scale: one grouped "
    "count over metadata rows, <= 4 output rows.",
)
def prune_predicate_synergy_events(spark, sf_dir):
    zf = _zone_flags(spark, sf_dir)
    return zf.groupBy("p_hi", "p_rec").agg(
        F.count(F.lit(1)).alias("n_states"),
        F.sum("n").cast("long").alias("n_rows"),
    )


_P_CURVES_ORACLE = (
    _ZFLAG_CTE
    + """, swept AS (
  SELECT zf.*, o.eval_order, s.step
  FROM zf
  CROSS JOIN (SELECT unnest(['hi_first', 'rec_first']) AS eval_order) o
  CROSS JOIN (SELECT unnest([0, 1, 2]) AS step) s
), remaining AS (
  SELECT eval_order, step, n,
         CASE
           WHEN step = 0 THEN 1
           WHEN step = 2 THEN CASE WHEN p_hi = 0 AND p_rec = 0
                                   THEN 1 ELSE 0 END
           WHEN eval_order = 'hi_first'
             THEN CASE WHEN p_hi = 0 THEN 1 ELSE 0 END
           ELSE CASE WHEN p_rec = 0 THEN 1 ELSE 0 END
         END AS remains
  FROM swept
)
SELECT eval_order, CAST(step AS BIGINT) AS step,
       CAST(sum(remains) AS BIGINT) AS n_states_remaining,
       CAST(sum(remains * n) AS BIGINT) AS n_rows_remaining
FROM remaining GROUP BY 1, 2"""
)


@stage(
    "prune_order_cost_curves_events",
    _P_CURVES_ORACLE,
    "pruning algebra: BOTH SHORT-CIRCUIT COST CURVES — states and "
    "rows still in play after each evaluation step of the AND "
    "query, for hi-first and rec-first orders (step 0 = nothing "
    "applied, step 2 = both; step 2 is order-independent by "
    "construction, which the curves exhibit). The area between the "
    "two curves is what predicate ordering is worth on this ledger; "
    "emitting both keeps the query deterministic instead of "
    "computing a data-dependent argmax differently per engine. "
    "Shape: a 6-way map-side literal explode over metadata rows.",
)
def prune_order_cost_curves_events(spark, sf_dir):
    zf = _zone_flags(spark, sf_dir)
    swept = zf.select(
        "n",
        "p_hi",
        "p_rec",
        F.explode(
            F.array(F.lit("hi_first"), F.lit("rec_first"))
        ).alias("eval_order"),
    ).select(
        "n",
        "p_hi",
        "p_rec",
        "eval_order",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in (0, 1, 2)])
        ).alias("step"),
    )
    remains = (
        F.when(F.col("step") == 0, F.lit(1))
        .when(
            F.col("step") == 2,
            ((F.col("p_hi") == 0) & (F.col("p_rec") == 0)).cast("int"),
        )
        .when(
            F.col("eval_order") == "hi_first",
            (F.col("p_hi") == 0).cast("int"),
        )
        .otherwise((F.col("p_rec") == 0).cast("int"))
    )
    return (
        swept.withColumn("remains", remains)
        .groupBy("eval_order", "step")
        .agg(
            F.sum("remains").cast("long").alias("n_states_remaining"),
            F.sum(F.col("remains") * F.col("n"))
            .cast("long")
            .alias("n_rows_remaining"),
        )
    )
