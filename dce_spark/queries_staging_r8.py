"""ROUND-8 STAGED catalog queries — built and oracle-verified in round
7, NOT registered (the round-7 catalog froze at 212 when the driver
window rotated; registering now would create an unchecked tail — the
r1-r3 lesson, same protocol as queries_staging_r5/r6/r7 in earlier
rounds). Round 8 promotes them by registering from queries_more.py
(use the re-entrant skip-if-registered loop — see queries_more's
round-7 promotion note) and fronting them in ``_DRIVER_WINDOW``.

The entries extend round-7 library surfaces one step further:

- ``perplexity_filter_decisions_documents`` — the DECISION layer on
  the LM quality ladder: per-source keep/drop counts under a fixed
  exact-integer avg-logprob threshold (the actual curation gate,
  where unigram_logprob_documents was the score).
- ``ngram_novelty_decay_documents`` — distinct-shingle novelty per
  corpus growth bucket (the saturation curve that tells a crawl when
  marginal data stops adding content).
- ``dedup_threshold_sweep_documents`` — near-dup pair/doc counts at
  four Jaccard thresholds in one pass (the tuning curve before
  freezing a dedup threshold), exact-integer threshold compares.
- ``template_prefix_clusters_documents`` — shared fixed-length
  prefix/suffix clusters (boilerplate headers/footers that shingle
  Jaccard dilutes away on long docs).
- ``lang_confusion_documents`` — char-trigram profile classifier
  scored against the labeled lang column as a confusion matrix
  (language-ID QC, the ladder step above lang_guess heuristics).
- ``late_arrival_bias_events`` — lateness x event-type contingency
  with per-type chi-square contributions (is lateness biased by
  type? if yes, watermark drops skew the type mix).
- ``kmeans_cell_balance_embeddings`` — cluster occupancy shares AND
  iteration-1 -> 2 centroid shift from the deterministic k-means
  replay (index balance + convergence in one readout).
- ``adc_rank_correlation_embeddings`` — Spearman rho between ADC and
  exact rankings over the exact top-20 (finer-grained retrieval QC
  than recall@k: order quality, not just membership).
- ``mmr_diversified_topk_embeddings`` — maximal-marginal-relevance
  re-ranking (lambda 0.7, k 5 from the exact top-20 pool): the
  diversification pass between ANN retrieval and serving.
- ``bm25_top_terms_documents`` — BM25 (k1=1.2, b=0.75) top terms for
  probe docs: the saturation/length-normalized upgrade over
  tfidf_top_terms_documents.
- ``binseg_changepoint_events`` — single-split binary segmentation
  over the daily series (argmax SSE reduction): the changepoint
  LOCATOR next to CUSUM's detector.
- ``autocorrelation_daily_events`` — lag-1/lag-7 autocorrelation of
  daily volume in exact scaled-integer arithmetic (is there weekly
  structure worth a seasonal baseline? answers before
  dow_seasonality_events is applied).
- ``weekday_adjusted_anomaly_events`` — daily anomalies scored
  against the weekday baseline with exact-integer z^2 flagging (the
  operational detector dow_seasonality_events is the baseline for).
- ``session_duration_quantiles_events`` — session length
  distribution (30-min gap rule) with exact interpolated quantiles.
- ``reorder_depth_events`` — out-of-orderness profile of the arrival
  stream (running-max lag depths): sizes the reorder buffer /
  watermark delay a pipeline actually needs.
- ``funnel_cohort_conversion_events`` — view->purchase conversion by
  weekly first-seen cohort (did a release change conversion for NEW
  users specifically?).
- ``pack_bin_fill_documents`` — pack fill-level histogram from the
  deterministic packing replay (padding waste / overflow QC for
  sequence packing).
- ``psi_value_drift_events`` — PSI of the value distribution,
  first half vs second half of the stream (temporal PSI on fixed
  bins; the reference-window drift test chi-square cannot do).
- ``multimodal_duration_budget`` — per-format decode budget (pixels,
  audio milliseconds, bytes) parsed from real container headers.
- ``split_balance_chi_square_documents`` — source x split
  chi-square contributions for the hash split assignment (the
  independence audit every train/val/test split should pass).

tests/test_staging_r8.py runs these through the SAME compare harness
as the live catalog (exact column order, canonical dtypes, sorted
values) at the suite's SF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

# Load the full catalog chain BEFORE any oracle builder below asks a
# sibling module for a CTE: several eager oracles import from
# queries_r5/queries_more at module-body time, and if THIS module is
# the first dce_spark import (tests do that), the sibling would
# otherwise be reached as a partially-initialized outer frame
# (ImportError on _PQ_TRAIN_CTES — the round-7 promotion re-entrancy
# lesson, import-order flavor). When queries_more's tail imports this
# module during the round-8 promotion, `queries` is mid-load and this
# line just binds the module object; the siblings are complete by
# then because they precede the staging promotion in the tail order.
from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table, local_result

STAGED_R8: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R8[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    """Oracle SQL for a staged query (uniform accessor; all round-8
    oracles are eager strings)."""
    return STAGED_R8[name].oracle


# ---------------------------------------------------------------------
# 1. Perplexity-filter decisions (LM quality ladder -> curation gate)
# ---------------------------------------------------------------------

# Fixed decision threshold on the per-doc mean unigram logprob,
# expressed in exact micro-nats so the keep/drop compare is pure
# BIGINT: drop iff sum(round(ln p * 1e6)) < TAU_MICRO * n_tokens.
# -3.41 sits at the ~10th percentile of the per-doc score at every
# driver SF (probed at sf0.001/0.01/0.1), so the gate fires without
# being degenerate at any scale.
_TAU_MICRO = -3_410_000

_PPL_FILTER_ORACLE = f"""WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY w
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vocab
), scored AS (
  SELECT w.doc_id,
         CAST(sum(CAST(round(ln(CAST(v.cnt AS DOUBLE) / t.n) * 1e6)
                       AS BIGINT)) AS BIGINT) AS sm,
         CAST(count(*) AS BIGINT) AS ntok
  FROM words w JOIN vocab v ON v.w = w.w CROSS JOIN tot t
  GROUP BY w.doc_id
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s.sm < {_TAU_MICRO} * s.ntok
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       round(CAST(sum(CASE WHEN s.sm < {_TAU_MICRO} * s.ntok
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS drop_rate,
       round(CAST(sum(s.sm) AS DOUBLE) / sum(s.ntok) / 1e6, 6)
         AS mean_logprob
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
GROUP BY d.source"""


@stage(
    "perplexity_filter_decisions_documents",
    _PPL_FILTER_ORACLE,
    "curation gate: PERPLEXITY-FILTER DECISIONS by source — the "
    "operational layer above unigram_logprob_documents: each doc's "
    "quality score becomes a keep/drop bit against a fixed threshold, "
    "rolled up per source (the table a curation run publishes). The "
    "decision compare is EXACT-INTEGER (micro-nat token logprobs "
    "summed in BIGINT vs threshold*n_tokens), so no float-boundary "
    "flip can diverge between engines — the lesson from quantized "
    "means applied to a THRESHOLD, where an ulp actually changes the "
    "output. Scale shape: vocab groupBy (vocabulary-sized, min-count "
    "cut at 100 TB), broadcast join back, one per-doc fold, one "
    "per-source rollup; the pooled mean_logprob divides two exact "
    "BIGINTs once.",
)
def perplexity_filter_decisions_documents(spark, sf_dir):
    from .ext.dedup import _parallelize
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    pruned = _parallelize(
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
        )
    )
    # optimization r15 (guide §5): the token frame feeds the vocab
    # count (twice, via tot) and the scoring join — eager
    # localCheckpoint tokenizes the corpus once.
    words = pruned.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    ).localCheckpoint()
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        words.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.round(
                    F.log(F.col("cnt").cast("double") / F.col("n")) * 1e6
                ).cast("long")
            ).alias("sm"),
            F.count(F.lit(1)).alias("ntok"),
        )
    )
    dropped = (F.col("sm") < F.lit(_TAU_MICRO) * F.col("ntok")).cast("long")
    return (
        scored.join(pruned.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(dropped).alias("n_dropped"),
            F.round(
                F.sum(dropped).cast("double") / F.count(F.lit(1)), 6
            ).alias("drop_rate"),
            F.round(
                F.sum("sm").cast("double") / F.sum("ntok") / 1e6, 6
            ).alias("mean_logprob"),
        )
    )


# ---------------------------------------------------------------------
# 2. N-gram novelty decay (corpus saturation curve)
# ---------------------------------------------------------------------

_NOVELTY_ORACLE = """WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
  FROM toks
), mx AS (
  SELECT max(doc_id) + 1 AS m FROM documents
), bucketed AS (
  SELECT sh.doc_id * 5 // mx.m AS bucket, sh.g FROM sh, mx
), firsts AS (
  SELECT g, min(bucket) AS first_bucket FROM bucketed GROUP BY g
), per AS (
  SELECT bucket,
         CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
  FROM bucketed GROUP BY bucket
), novel AS (
  SELECT first_bucket AS bucket, CAST(count(*) AS BIGINT) AS n_novel
  FROM firsts GROUP BY first_bucket
)
SELECT CAST(p.bucket AS BIGINT) AS bucket,
       p.n_distinct,
       n.n_novel,
       round(CAST(n.n_novel AS DOUBLE) / p.n_distinct, 6) AS novelty_rate,
       CAST(sum(n.n_novel) OVER (ORDER BY p.bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_distinct
FROM per p JOIN novel n USING (bucket)"""


@stage(
    "ngram_novelty_decay_documents",
    _NOVELTY_ORACLE,
    "corpus saturation: N-GRAM NOVELTY DECAY — the corpus in 5 "
    "doc_id-ordered growth buckets; per bucket, how many distinct "
    "3-gram shingles appear at all vs appear for the FIRST time "
    "(novel), plus the cumulative distinct curve. A crawl whose "
    "novelty rate collapses is re-crawling what it has (the "
    "incremental value readout behind dedup budgeting); the curve's "
    "slope is what Heaps'-law vocabulary planning fits. All counts "
    "exact integers; bucket = doc_id*5 // (max_id+1) is positive-"
    "integer arithmetic, identical truncation on both engines. Scale "
    "shape: one distinct (doc, gram) pass, then gram-keyed groupBys "
    "(vocabulary-sized); the cumulative window runs over 5 rows.",
)
def ngram_novelty_decay_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col(F.lower(F.col("text"))).alias("t"),
    )
    grams = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("t"), i, 3)
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    mx = docs.agg((F.max("doc_id") + 1).alias("m"))
    bucketed = grams.crossJoin(F.broadcast(mx)).select(
        F.floor(F.col("doc_id") * 5 / F.col("m")).cast("long").alias(
            "bucket"
        ),
        "g",
    )
    per = bucketed.groupBy("bucket").agg(
        F.count_distinct("g").alias("n_distinct")
    )
    novel = (
        bucketed.groupBy("g")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.join(novel, "bucket")
        .select(
            "bucket",
            "n_distinct",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_distinct"), 6
            ).alias("novelty_rate"),
            F.sum("n_novel").over(wcum).alias("cum_distinct"),
        )
    )


# ---------------------------------------------------------------------
# 3. Dedup threshold sweep (the tuning curve before freezing a cutoff)
# ---------------------------------------------------------------------

_THRESHOLDS_10 = [5, 7, 8, 9]  # Jaccard thresholds x10 (exact compares)

_SWEEP_ORACLE = f"""WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS sh
  FROM toks
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shingles GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS common
  FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), jac AS (
  SELECT p.doc_a, p.doc_b, p.common,
         sa.sz + sb.sz - p.common AS un
  FROM pairs p
  JOIN sizes sa ON p.doc_a = sa.doc_id
  JOIN sizes sb ON p.doc_b = sb.doc_id
), sweep AS (
  SELECT t.t10, j.doc_a, j.doc_b
  FROM jac j CROSS JOIN (SELECT unnest([{", ".join(str(t) for t in _THRESHOLDS_10)}]) AS t10) t
  WHERE j.common * 10 >= t.t10 * j.un
)
SELECT CAST(t10 AS DOUBLE) / 10 AS threshold,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc_b) AS BIGINT) AS n_dup_docs
FROM sweep GROUP BY t10"""


@stage(
    "dedup_threshold_sweep_documents",
    _SWEEP_ORACLE,
    "dedup tuning: JACCARD THRESHOLD SWEEP — near-dup pair counts at "
    "0.5/0.7/0.8/0.9 from ONE inverted-index pass (the curve an "
    "operator reads before freezing the dedup cutoff; a cliff between "
    "two thresholds means the corpus has a near-dup band there). "
    "Threshold compares are exact integers (common*10 >= t10*union) — "
    "no float Jaccard ever crosses an engine boundary. Scale shape: "
    "the one candidate-pair groupBy is shared by all thresholds via a "
    "4-row broadcast cross join; never four passes. The candidate "
    "join is shingle-equi (LSH-prunable at 100 TB, the "
    "dedup_minhash_lsh_capped path).",
)
def dedup_threshold_sweep_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col(F.lower(F.col("text"))).alias("t"),
    )
    # optimization r15 (guide §5): shingles feeds the size aggregate
    # and both self-join sides — persist, materialize the
    # len(thresholds)-row result eagerly, unpersist.
    shingles = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, 3)),
                )
            ).alias("sh"),
        )
        .distinct()
        .persist()
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")
    )
    jac = (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "common",
            (F.col("sza") + F.col("szb") - F.col("common")).alias("un"),
        )
    )
    sweep = (
        jac.select(
            "doc_a",
            "doc_b",
            "common",
            "un",
            F.explode(
                F.array(*[F.lit(t).cast("long") for t in _THRESHOLDS_10])
            ).alias("t10"),
        )
        .filter(F.col("common") * 10 >= F.col("t10") * F.col("un"))
    )
    out = sweep.groupBy("t10").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_distinct("doc_b").alias("n_dup_docs"),
    ).select(
        (F.col("t10").cast("double") / 10).alias("threshold"),
        "n_pairs",
        "n_dup_docs",
    )
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, shingles)


# ---------------------------------------------------------------------
# 4. Template prefix/suffix clusters (boilerplate detection)
# ---------------------------------------------------------------------

_TEMPLATE_ORACLE = """WITH keys AS (
  SELECT 'prefix' AS part, substr(lower(text), 1, 40) AS k,
         doc_id, source
  FROM documents
  UNION ALL
  SELECT 'suffix' AS part, right(lower(text), 40) AS k,
         doc_id, source
  FROM documents
)
SELECT part, k AS template_key,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(min(doc_id) AS BIGINT) AS first_doc
FROM keys GROUP BY part, k HAVING count(*) >= 2"""


@stage(
    "template_prefix_clusters_documents",
    _TEMPLATE_ORACLE,
    "boilerplate detection: TEMPLATE PREFIX/SUFFIX CLUSTERS — docs "
    "sharing an exact 40-char head or tail (site chrome, license "
    "headers, generated-page skeletons). Complements shingle Jaccard: "
    "on LONG documents a shared 40-char header contributes ~nothing "
    "to Jaccard, yet is exactly the template signal a curation "
    "pipeline strips before training. Fixed-length ASCII substrings "
    "keep the key engine-portable (the UTF-16-vs-codepoint substr "
    "divergence cannot bite on a length-40 slice of [a-z ] text — "
    "and at 100 TB the key would be xxhash64(head) anyway, shuffling "
    "8 bytes instead of 40). One groupBy per part, unioned before the "
    "shuffle so it stays a single exchange on the (part, key) pair.",
)
def template_prefix_clusters_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.lower(F.col("text")).alias("lt"),
    )
    keys = docs.select(
        F.lit("prefix").alias("part"),
        F.substring("lt", 1, 40).alias("template_key"),
        "doc_id",
        "source",
    ).unionByName(
        docs.select(
            F.lit("suffix").alias("part"),
            F.expr("right(lt, 40)").alias("template_key"),
            "doc_id",
            "source",
        )
    )
    return (
        keys.groupBy("part", "template_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------
# 5. Language-ID confusion matrix (label-vs-content QC)
# ---------------------------------------------------------------------

_LANG_CONFUSION_ORACLE = """WITH words AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                            x -> x <> '')) AS w
  FROM documents
), tgs AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, length(w) - 1),
                i -> substr(w, CAST(i AS INTEGER), 3))) AS tg
  FROM words WHERE length(w) >= 3
), lang_tg AS (
  SELECT d.lang, t.tg, CAST(count(*) AS BIGINT) AS n_docs
  FROM tgs t JOIN documents d ON d.doc_id = t.doc_id
  GROUP BY d.lang, t.tg
), prof AS (
  SELECT lang, tg FROM (
    SELECT lang, tg,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n_docs DESC, tg) AS rk
    FROM lang_tg)
  WHERE rk <= 20
), hits AS (
  SELECT t.doc_id, p.lang AS cand, CAST(count(*) AS BIGINT) AS n_hits
  FROM tgs t JOIN prof p ON p.tg = t.tg
  GROUP BY t.doc_id, p.lang
), pred AS (
  SELECT doc_id, cand AS predicted FROM (
    SELECT doc_id, cand,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n_hits DESC, cand) AS rk
    FROM hits)
  WHERE rk = 1
)
SELECT d.lang, p.predicted, CAST(count(*) AS BIGINT) AS n
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.lang, p.predicted"""


@stage(
    "lang_confusion_documents",
    _LANG_CONFUSION_ORACLE,
    "label QC: LANGUAGE-ID CONFUSION MATRIX — a char-trigram profile "
    "classifier (top-20 document-frequency trigrams per labeled "
    "language, argmax profile hits with deterministic (hits desc, "
    "lang) tie-break) scored against the lang COLUMN. The ladder step "
    "above lang_guess_documents' heuristic: it audits whether labels "
    "agree with content. Honest finding on this synthetic corpus: "
    "the text is the same ASCII word salad for every lang label, so "
    "the matrix shows label-content INDEPENDENCE — which is exactly "
    "the defect this op exists to surface (a real corpus with "
    "mislabeled docs shows the same smear). Trigrams come from "
    "[a-z0-9]-ish tokens, dodging the UTF-16-vs-codepoint substr "
    "divergence. Scale shape: profiles are vocabulary-sized then "
    "top-20 (broadcast); scoring is one equi-join on trigram + two "
    "bounded groupBys; nothing is ever corpus x corpus.",
)
def lang_confusion_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "text"
    )
    words = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    ).distinct()
    tgs = (
        words.filter(F.length("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 2),
                    lambda i: F.col("w").substr(i, F.lit(3)),
                )
            ).alias("tg"),
        )
        .distinct()
        .persist()
    )
    # optimization r15 (guide §5): tgs feeds the per-language profile
    # AND the per-document hit join — persist, materialize the
    # lang x lang confusion rollup eagerly, unpersist.
    lang_tg = (
        tgs.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "tg")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    wprof = Window.partitionBy("lang").orderBy(
        F.desc("n_docs"), F.col("tg")
    )
    prof = (
        lang_tg.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= 20)
        .select(F.col("lang").alias("cand"), "tg")
    )
    hits = (
        tgs.join(F.broadcast(prof), "tg")
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    wpred = Window.partitionBy("doc_id").orderBy(
        F.desc("n_hits"), F.col("cand")
    )
    pred = (
        hits.withColumn("rk", F.row_number().over(wpred))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cand").alias("predicted"))
    )
    out = (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, tgs)


# ---------------------------------------------------------------------
# 6. Late-arrival bias by event type (lateness x type contingency)
# ---------------------------------------------------------------------

_LATE_BIAS_ORACLE = """WITH cells AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS late,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, late, CAST(n AS DOUBLE) AS n,
         CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS rt,
         CAST(sum(n) OVER (PARTITION BY late) AS DOUBLE) AS ct,
         CAST(sum(n) OVER () AS DOUBLE) AS g
  FROM cells
)
SELECT event_type,
       CAST(sum(CASE WHEN late = 1 THEN CAST(n AS BIGINT) ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(sum(CAST(n AS BIGINT)) AS BIGINT) AS n_total,
       round(sum(CASE WHEN late = 1 THEN n ELSE 0 END) / sum(n), 6)
         AS late_share,
       round(CAST(sum(CAST(round((n - rt * ct / g)
                                 * (n - rt * ct / g)
                                 / (rt * ct / g) * 1e6) AS BIGINT))
                  AS DOUBLE) / 1e6, 6) AS chi2_contrib
FROM m GROUP BY event_type"""


@stage(
    "late_arrival_bias_events",
    _LATE_BIAS_ORACLE,
    "watermark bias audit: LATE-ARRIVAL x EVENT-TYPE contingency — "
    "is lateness independent of type? If not, every watermark drop "
    "SKEWS the event-type mix (a funnel whose purchases arrive later "
    "than views under-counts conversion precisely when the pipeline "
    "tightens its delay budget). Per-type late counts, late share, "
    "and the type's two-cell Pearson chi-square contribution against "
    "the independence expectation (quantized-exact 1e6 sums, the "
    "chi_square_drift_events convention; margins via windows over the "
    "TINY cell table). The synthetic stream's every-7th-event rule is "
    "type-independent by construction, so contributions near 0 are "
    "the expected PASS — the query is the audit, the fixture is the "
    "null case. One shuffle to contingency cells; all else metadata.",
)
def late_arrival_bias_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            (F.col("event_id") % 7 == 0).cast("int").alias("late"),
        )
        .groupBy("event_type", "late")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("late")
    wg = Window.partitionBy()
    m = cells.select(
        "event_type",
        "late",
        F.col("n").cast("double").alias("nd"),
        F.col("n").alias("ni"),
        F.sum("n").over(wr).cast("double").alias("rt"),
        F.sum("n").over(wc).cast("double").alias("ct"),
        F.sum("n").over(wg).cast("double").alias("g"),
    )
    e = F.col("rt") * F.col("ct") / F.col("g")
    contrib = (F.col("nd") - e) * (F.col("nd") - e) / e
    return m.groupBy("event_type").agg(
        F.sum(F.when(F.col("late") == 1, F.col("ni")).otherwise(F.lit(0)))
        .alias("n_late"),
        F.sum("ni").alias("n_total"),
        F.round(
            F.sum(F.when(F.col("late") == 1, F.col("nd")).otherwise(0.0))
            / F.sum("nd"),
            6,
        ).alias("late_share"),
        F.round(
            F.sum(F.round(contrib * 1e6).cast("long")).cast("double") / 1e6,
            6,
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------
# 7. BM25 top terms (saturation/length-normalized retrieval scoring)
# ---------------------------------------------------------------------

_BM25_ORACLE = """WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  GROUP BY doc_id, w
), dl AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
), dfreq AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS tot_len
  FROM dl
), scored AS (
  SELECT tf.doc_id, tf.w,
         round(ln((CAST(s.n_docs AS DOUBLE) - d.df + 0.5)
                  / (d.df + 0.5) + 1)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75
                    * (CAST(dl.dl AS DOUBLE) * s.n_docs / s.tot_len))),
               9) AS score
  FROM tf
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN dfreq d ON d.w = tf.w
  CROSS JOIN stats s
  WHERE tf.doc_id < 5
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, w AS term,
       round(score, 6) AS bm25,
       CAST(rk AS BIGINT) AS rk
FROM (SELECT doc_id, w, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, w) AS rk
      FROM scored)
WHERE rk <= 3"""


@stage(
    "bm25_top_terms_documents",
    _BM25_ORACLE,
    "retrieval scoring: BM25 TOP TERMS (k1=1.2, b=0.75) for 5 probe "
    "docs — the tf-saturation + length-normalization upgrade over "
    "tfidf_top_terms_documents (tf-idf keeps growing with tf; BM25 "
    "saturates at k1+1 and discounts long docs, which is why every "
    "lexical retrieval stack serves BM25, not raw tf-idf). Score "
    "arithmetic is written with ONE parenthesization on both engines "
    "(ln and the fraction are single-op chains over exact ints and "
    "two exact rationals dl*N/totlen), ranked at 9dp with term "
    "tie-breaks, reported at 6dp. Scale shape: tf and df tables are "
    "vocabulary-sized groupBys; doc-length and corpus stats are one "
    "scalar broadcast; the probe filter prunes before the join chain "
    "(at 100 TB the same plan scores a query's terms, not 5 docs).",
)
def bm25_top_terms_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col(F.lower(F.col("text"))).alias("t"),
    )
    tf = (
        docs.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = docs.select("doc_id", F.size("t").cast("long").alias("dl"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot_len")
    )
    scored = (
        tf.filter(F.col("doc_id") < 5)
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "w",
            F.round(
                F.log(
                    (F.col("n_docs").cast("double") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1
                )
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        0.25
                        + 0.75
                        * (
                            F.col("dl").cast("double")
                            * F.col("n_docs")
                            / F.col("tot_len")
                        )
                    )
                ),
                9,
            ).alias("score"),
        )
    )
    wrk = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("w"))
    return (
        scored.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            F.col("w").alias("term"),
            F.round(F.col("score"), 6).alias("bm25"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


# ---------------------------------------------------------------------
# 8. K-means cell balance + convergence (index health for the coarse
#    quantizer; extends the kmeans_embeddings_2iter replay)
# ---------------------------------------------------------------------

_KMB_K = 4
_KMB_DIST = (
    "list_sum(list_transform(range(1, 65), "
    "i -> ({e}[i] - {c}[i]) * ({e}[i] - {c}[i])))"
)

_KM_BALANCE_ORACLE = f"""WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cid, v FROM emb WHERE vec_id < {_KMB_K}
), d0 AS (
  SELECT e.vec_id, s.cid, {_KMB_DIST.format(e='e.v', c='s.v')} AS d2
  FROM emb e, seeds s
), a0 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d0) WHERE rn = 1
), c1 AS (
  SELECT a0.cid, t.pos,
         CAST(sum(CAST(round(e.v[t.pos + 1] * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS m
  FROM emb e JOIN a0 ON e.vec_id = a0.vec_id, range(0, 64) t(pos)
  GROUP BY a0.cid, t.pos
), c1v AS (
  SELECT cid, list(m ORDER BY pos) AS v FROM c1 GROUP BY cid
), d1 AS (
  SELECT e.vec_id, c.cid, {_KMB_DIST.format(e='e.v', c='c.v')} AS d2
  FROM emb e, c1v c
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d1) WHERE rn = 1
), c2 AS (
  SELECT a1.cid, t.pos,
         CAST(sum(CAST(round(e.v[t.pos + 1] * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS m
  FROM emb e JOIN a1 ON e.vec_id = a1.vec_id, range(0, 64) t(pos)
  GROUP BY a1.cid, t.pos
), shift AS (
  SELECT c1.cid,
         CAST(sum(CAST(round((c1.m - c2.m) * (c1.m - c2.m) * 1e9)
                       AS BIGINT)) AS BIGINT) AS q
  FROM c1 JOIN c2 ON c2.cid = c1.cid AND c2.pos = c1.pos
  GROUP BY c1.cid
), sizes AS (
  SELECT cid, CAST(count(*) AS BIGINT) AS n FROM a1 GROUP BY cid
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS t FROM sizes
)
SELECT CAST(s.cid AS BIGINT) AS cid,
       s.n AS n_members,
       round(CAST(s.n AS DOUBLE) / tot.t, 6) AS share,
       round(sqrt(CAST(sh.q AS DOUBLE) / 1e9), 6) AS centroid_shift
FROM sizes s JOIN shift sh ON sh.cid = s.cid CROSS JOIN tot"""


@stage(
    "kmeans_cell_balance_embeddings",
    _KM_BALANCE_ORACLE,
    "coarse-quantizer health: K-MEANS CELL BALANCE + CONVERGENCE — "
    "the kmeans_embeddings_2iter replay extended one step: after the "
    "second assignment, per-cluster occupancy share (a collapsed cell "
    "means wasted IVF partitions, a giant one means unprunable "
    "probes) AND the iteration-1 -> 2 centroid shift (quantized-exact "
    "squared-diff sums, sqrt once) — the convergence readout that "
    "says whether 2 iterations were enough. Same determinism contract "
    "as the base replay: 9dp-quantized means, (d2, cid)-ranked "
    "assignments, so the oracle replays the full loop bit-exactly. "
    "Scale shape: centroids are metadata riding the closure; two "
    "corpus scans (one per assignment) + per-dim mean groupBys; the "
    "shift/share algebra runs on k x 64 rows.",
)
def kmeans_cell_balance_embeddings(spark, sf_dir):
    from .ext.similarity import argmin_assign_cols

    df = load_table(spark, sf_dir, "embeddings")
    base = df.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    # parsed-SQL argmin (optimization r16, guide §7.3 — same tree as
    # the Column-lambda form, ~0.4 s less driver build time per call)
    def assign(cent_pairs):
        cid, _best, _d2s = argmin_assign_cols(cent_pairs)
        return cid

    def quantized_means(assigned):
        # NOTE r15: the 64-column wide-aggregate form measured SLOWER
        # than this posexplode form here (measured negative result —
        # see kmeans_embeddings_2iter; churn is the one site where the
        # wide agg won).
        rows = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.round(F.col("x") * F.lit(1e9)).cast("long"))
                    .cast("double")
                    / F.lit(1e9)
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()
        )
        by_cid: dict = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        return {
            int(cid): [by_cid[cid][p] for p in range(64)]
            for cid in sorted(by_cid)
        }

    seed_rows = (
        base.filter(F.col("vec_id") < _KMB_K).orderBy("vec_id").collect()
    )
    cents0 = [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in seed_rows]
    a0 = base.withColumn("cid", assign(cents0))
    c1 = quantized_means(a0)
    cents1 = sorted(c1.items())
    a1 = base.withColumn("cid", assign(cents1)).persist()
    try:
        c2 = quantized_means(a1)
        sizes = a1.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
        # shift computed ENGINE-side over a k x 64 literal frame so the
        # quantized rounding matches the oracle exactly (no Python round)
        c_rows = [
            (cid, pos, c1[cid][pos], c2[cid][pos])
            for cid in sorted(set(c1) & set(c2))
            for pos in range(64)
        ]
        cdf = spark.createDataFrame(
            c_rows, "cid long, pos int, m1 double, m2 double"
        )
        shift = (
            cdf.select(
                "cid",
                F.round(
                    (F.col("m1") - F.col("m2"))
                    * (F.col("m1") - F.col("m2"))
                    * F.lit(1e9)
                )
                .cast("long")
                .alias("q"),
            )
            .groupBy("cid")
            .agg(F.sum("q").alias("q"))
        )
        tot = sizes.agg(F.sum("n_members").alias("t"))
        out = (
            sizes.join(F.broadcast(shift), "cid")
            .crossJoin(F.broadcast(tot))
            .select(
                "cid",
                "n_members",
                F.round(
                    F.col("n_members").cast("double") / F.col("t"), 6
                ).alias("share"),
                F.round(
                    F.sqrt(F.col("q").cast("double") / F.lit(1e9)), 6
                ).alias("centroid_shift"),
            )
        )
        rows = out.collect()
        schema = out.schema
    finally:
        a1.unpersist()
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------
# 9. ADC-vs-exact rank correlation (order quality beyond recall@k)
# ---------------------------------------------------------------------


def _adc_rank_corr_oracle() -> str:
    from .queries_r5 import _PQ_TRAIN_CTES

    return (
        _PQ_TRAIN_CTES
        + """, qv AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 3
), lut AS (
  SELECT qv.qid, cb1.sub, cb1.code,
         list_sum(list_transform(range(1, 9),
           j -> (qv.v[cb1.sub * 8 + j] - cb1.c[j])
              * (qv.v[cb1.sub * 8 + j] - cb1.c[j]))) AS d2
  FROM cb1, qv
), adcd AS (
  SELECT l.qid, codes.vec_id, round(sum(l.d2), 9) AS adc_d2
  FROM codes JOIN lut l ON l.sub = codes.sub AND l.code = codes.code
  WHERE codes.vec_id <> l.qid
  GROUP BY l.qid, codes.vec_id
), ex AS (
  SELECT qv.qid, e.vec_id,
         round(list_sum(list_transform(range(1, 65),
           j -> (CAST(e.embedding[j] AS DOUBLE) - qv.v[j])
              * (CAST(e.embedding[j] AS DOUBLE) - qv.v[j]))), 9) AS d2
  FROM embeddings e, qv WHERE e.vec_id <> qv.qid
), exk AS (
  SELECT qid, vec_id, rn AS rex FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
    FROM ex)
  WHERE rn <= 20
), ranks AS (
  SELECT e.qid, e.rex,
         row_number() OVER (PARTITION BY e.qid
                            ORDER BY a.adc_d2, e.vec_id) AS radc
  FROM exk e JOIN adcd a ON a.qid = e.qid AND a.vec_id = e.vec_id
)
SELECT CAST(qid AS BIGINT) AS query_id,
       CAST(count(*) AS BIGINT) AS n,
       round(1.0 - 6.0 * CAST(sum((rex - radc) * (rex - radc)) AS DOUBLE)
                   / (count(*) * (CAST(count(*) AS DOUBLE)
                                  * count(*) - 1.0)), 6) AS spearman_rho
FROM ranks GROUP BY qid"""
    )


@stage(
    "adc_rank_correlation_embeddings",
    _adc_rank_corr_oracle(),
    "retrieval QC: ADC-vs-EXACT SPEARMAN RANK CORRELATION over each "
    "query's exact top-20 — recall@k says whether the compressed "
    "index FINDS the true neighbors; rho says whether it ORDERS them "
    "right (a re-ranking stage is pointless if rho is already ~1, "
    "mandatory if low). Same deterministic 1-iteration PQ training "
    "replay as pq_adc_topk_embeddings; both rank lists use 9dp-"
    "rounded distances with vec_id tie-breaks, and the rho formula "
    "runs on exact integer rank differences (one double division at "
    "the end). Scale shape: the exact top-20 per query is the only "
    "corpus-sized ranking (TakeOrdered per query); the correlation "
    "itself runs on 20 rows per query.",
)
def adc_rank_correlation_embeddings(spark, sf_dir):
    from .ext.similarity import (
        _adc_col,
        _sq_dist_round9_sql,
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, dim=64, m=8, k_sub=4, iters=1)
    codes = pq_encode(emb, cbs).persist()
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    qrows = (
        base.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    )
    try:
        per_q = []
        for r in qrows:
            qid = int(r["vec_id"])
            qvec = [float(x) for x in r["v"]]
            exact = (
                base.filter(F.col("vec_id") != qid)
                .select(
                    "vec_id",
                    F.expr(_sq_dist_round9_sql("v", qvec)).alias("d2"),
                )
                .orderBy("d2", "vec_id")
                .limit(20)
                .withColumn(
                    "rex",
                    F.row_number().over(
                        Window.orderBy("d2", "vec_id")
                    ),
                )
                .select(
                    F.lit(qid).cast("long").alias("qid"), "vec_id", "rex"
                )
            )
            adc = codes.filter(F.col("vec_id") != qid).select(
                "vec_id", _adc_col(cbs, qvec).alias("adc_d2")
            )
            per_q.append(exact.join(adc, "vec_id"))
        allq = per_q[0]
        for p in per_q[1:]:
            allq = allq.unionByName(p)
        wadc = Window.partitionBy("qid").orderBy("adc_d2", "vec_id")
        ranks = allq.withColumn("radc", F.row_number().over(wadc))
        d2sum = F.sum(
            (F.col("rex") - F.col("radc")) * (F.col("rex") - F.col("radc"))
        )
        out = ranks.groupBy(F.col("qid").alias("query_id")).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.lit(1.0)
                - F.lit(6.0)
                * d2sum.cast("double")
                / (
                    F.count(F.lit(1))
                    * (
                        F.count(F.lit(1)).cast("double")
                        * F.count(F.lit(1))
                        - F.lit(1.0)
                    )
                ),
                6,
            ).alias("spearman_rho"),
        )
        rows = out.collect()
        schema = out.schema
    finally:
        codes.unpersist()
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------
# 10. MMR diversified top-k (retrieval -> serving diversification)
# ---------------------------------------------------------------------


def _mmr_oracle() -> str:
    def dot(a, b):
        return (
            f"list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
        )

    def cos(a, b):
        return f"{dot(a, b)} / (sqrt({dot(a, a)}) * sqrt({dot(b, b)}))"

    parts = [
        f"""WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT v FROM emb WHERE vec_id = 0
), pool AS (
  SELECT e.vec_id, round({cos('e.v', 'q.v')}, 9) AS s
  FROM emb e, q WHERE e.vec_id <> 0
  ORDER BY s DESC, e.vec_id LIMIT 20
), pv AS (
  SELECT p.vec_id, p.s, e.v FROM pool p JOIN emb e USING (vec_id)
), pc AS (
  SELECT a.vec_id AS pa, b.vec_id AS pb, round({cos('a.v', 'b.v')}, 9) AS c
  FROM pv a JOIN pv b ON a.vec_id <> b.vec_id
), s1 AS (
  SELECT vec_id, round(0.7 * s, 9) AS score FROM pool
  ORDER BY score DESC, vec_id LIMIT 1
), sel1 AS (SELECT vec_id FROM s1)"""
    ]
    for k in range(2, 6):
        parts.append(f""", r{k} AS (
  SELECT p.vec_id, p.s, max(pc.c) AS ms
  FROM pool p JOIN pc ON pc.pa = p.vec_id
   AND pc.pb IN (SELECT vec_id FROM sel{k - 1})
  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
  GROUP BY p.vec_id, p.s
), s{k} AS (
  SELECT vec_id, round(0.7 * s - 0.3 * ms, 9) AS score FROM r{k}
  ORDER BY score DESC, vec_id LIMIT 1
), sel{k} AS (
  SELECT vec_id FROM sel{k - 1} UNION ALL SELECT vec_id FROM s{k}
)""")
    union = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, CAST(vec_id AS BIGINT) AS vec_id, "
        f"score AS mmr_score FROM s{k}"
        for k in range(1, 6)
    )
    return "".join(parts) + "\n" + union


@stage(
    "mmr_diversified_topk_embeddings",
    _mmr_oracle(),
    "serving diversification: MAXIMAL MARGINAL RELEVANCE top-5 "
    "(lambda=0.7) from the exact cosine top-20 pool of query vector "
    "0 — the re-ranking pass between ANN retrieval and serving that "
    "trades raw similarity against redundancy (a dedup-adjacent idea "
    "applied at query time: near-identical hits waste result slots). "
    "Greedy argmax of round9(0.7*sim_q - 0.3*max_sim_to_selected) "
    "with vec_id tie-breaks; all similarities are engine-computed "
    "and 9dp-rounded BEFORE the driver-side greedy loop, whose "
    "float ops replay the oracle's expression order exactly (the "
    "ivf_topk driver-side precedent: same fold order -> bit-identical "
    "doubles). Scale shape: the pool is k-bounded (20 rows collected "
    "— the same metadata-scale as IVF centroids); the only corpus "
    "pass is the TakeOrdered top-20; the k^2 pairwise matrix and the "
    "k x 5 greedy loop never touch the cluster.",
)
def mmr_diversified_topk_embeddings(spark, sf_dir):
    import math

    from .ext.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    pool_rows = cosine_topk(
        emb.filter(F.col("vec_id") != 0), qvec, k=20, round_digits=9
    ).collect()
    sims = {int(r["vec_id"]): float(r["cos_sim"]) for r in pool_rows}
    vec_rows = emb.filter(
        F.col("vec_id").isin(list(sims))
    ).collect()
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in vec_rows
    }

    def rnd9(x: float) -> float:
        return math.copysign(math.floor(abs(x) * 1e9 + 0.5), x) / 1e9

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    pc = {
        (a, b): rnd9(cos_py(vecs[a], vecs[b]))
        for a in sims
        for b in sims
        if a != b
    }
    sel: list[tuple[int, float]] = []
    remaining = set(sims)
    while len(sel) < 5 and remaining:
        best = None
        for vid in sorted(remaining):
            if sel:
                ms = max(pc[(vid, s)] for s, _ in sel)
                score = rnd9(0.7 * sims[vid] - 0.3 * ms)
            else:
                score = rnd9(0.7 * sims[vid])
            if best is None or score > best[1]:
                best = (vid, score)
        sel.append(best)
        remaining.discard(best[0])
    rows = [(k + 1, vid, score) for k, (vid, score) in enumerate(sel)]
    return spark.createDataFrame(
        rows, "rank long, vec_id long, mmr_score double"
    )


# ---------------------------------------------------------------------
# 11. Binary-segmentation changepoint (the locator next to CUSUM)
# ---------------------------------------------------------------------

_BINSEG_ORACLE = """WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), idxd AS (
  SELECT day, n,
         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx
  FROM daily
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS k
  FROM idxd
), cum AS (
  SELECT idx, day,
         CAST(sum(n) OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cl
  FROM idxd
), cand AS (
  SELECT c.idx, c.day, c.cl, tot.t, tot.k,
         round(CAST(c.cl AS DOUBLE) * c.cl / c.idx
               + CAST(tot.t - c.cl AS DOUBLE) * (tot.t - c.cl)
                 / (tot.k - c.idx), 9) AS score
  FROM cum c CROSS JOIN tot WHERE c.idx < tot.k
), best AS (
  SELECT * FROM cand ORDER BY score DESC, idx LIMIT 1
)
SELECT strftime(day, '%Y-%m-%d') AS split_day,
       CAST(k AS BIGINT) AS n_days,
       round(CAST(cl AS DOUBLE) * cl / idx
             + CAST(t - cl AS DOUBLE) * (t - cl) / (k - idx)
             - CAST(t AS DOUBLE) * t / k, 6) AS sse_reduction,
       round(CAST(cl AS DOUBLE) / idx, 6) AS left_mean,
       round(CAST(t - cl AS DOUBLE) / (k - idx), 6) AS right_mean
FROM best"""


@stage(
    "binseg_changepoint_events",
    _BINSEG_ORACLE,
    "drift localization: BINARY-SEGMENTATION CHANGEPOINT (single "
    "split) over the daily volume series — the argmax of the "
    "between-segment SSE reduction, i.e. where one mean-shift "
    "explains the most variance. CUSUM (cusum_drift_events) DETECTS "
    "drift with memory; binseg LOCATES the break (the first step of "
    "the recursive segmentation changepoint libraries run). The "
    "score s_l^2/n_l + s_r^2/n_r uses prefix sums of exact BIGINTs; "
    "each candidate's score is two divisions and an add on exact "
    "integers (doubles below 2^53), 9dp-ranked with earliest-day "
    "tie-break — engine-portable without quantized sums. Scale "
    "shape: one groupBy to days; every window/argmax after runs on "
    "the calendar-sized daily table (the drop_rate_by_delay "
    "small-table exception).",
)
def binseg_changepoint_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    widx = Window.orderBy("day")
    idxd = daily.select(
        "day", "n", F.row_number().over(widx).cast("long").alias("idx")
    )
    tot = idxd.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("k"))
    wcum = Window.orderBy("idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = idxd.select("idx", "day", F.sum("n").over(wcum).alias("cl"))
    cl = F.col("cl").cast("double")
    cr = (F.col("t") - F.col("cl")).cast("double")
    score = F.round(
        cl * F.col("cl") / F.col("idx")
        + cr * (F.col("t") - F.col("cl")) / (F.col("k") - F.col("idx")),
        9,
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("idx") < F.col("k"))
        .select("idx", "day", "cl", "t", "k", score.alias("score"))
    )
    best = cand.orderBy(F.desc("score"), F.col("idx")).limit(1)
    return best.select(
        F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        F.col("k").alias("n_days"),
        F.round(
            cl * F.col("cl") / F.col("idx")
            + cr * (F.col("t") - F.col("cl")) / (F.col("k") - F.col("idx"))
            - F.col("t").cast("double") * F.col("t") / F.col("k"),
            6,
        ).alias("sse_reduction"),
        F.round(cl / F.col("idx"), 6).alias("left_mean"),
        F.round(cr / (F.col("k") - F.col("idx")), 6).alias("right_mean"),
    )


# ---------------------------------------------------------------------
# 12. Daily-volume autocorrelation (exact scaled-integer arithmetic)
# ---------------------------------------------------------------------

_AUTOCORR_ORACLE = """WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), idxd AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx, n
  FROM daily
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS k
  FROM idxd
), y AS (
  SELECT idx, tot.k * n - tot.t AS y FROM idxd CROSS JOIN tot
), den AS (
  SELECT CAST(sum(y * y) AS BIGINT) AS d FROM y
), lags AS (
  SELECT unnest([1, 7]) AS lag
), num AS (
  SELECT l.lag, CAST(sum(a.y * b.y) AS BIGINT) AS num,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM lags l
  JOIN y a ON TRUE
  JOIN y b ON b.idx = a.idx + l.lag
  GROUP BY l.lag
)
SELECT CAST(n.lag AS BIGINT) AS lag,
       n.n_pairs,
       round(CAST(n.num AS DOUBLE) / den.d, 6) AS autocorr
FROM num n CROSS JOIN den"""


@stage(
    "autocorrelation_daily_events",
    _AUTOCORR_ORACLE,
    "seasonality detection: DAILY-VOLUME AUTOCORRELATION at lag 1 and "
    "lag 7 — the statistic that JUSTIFIES a weekly baseline before "
    "dow_seasonality_events is applied (high lag-7 autocorrelation = "
    "weekly period; high lag-1 = momentum/trend). Computed entirely "
    "in EXACT scaled integers: y_t = k*n_t - T makes the mean-"
    "centered deviations integral (scale k cancels in the ratio), so "
    "numerator and denominator are BIGINT sums and the only float op "
    "is the final division — bit-identical under any partitioning "
    "with no quantization step at all. Scale shape: one groupBy to "
    "days, then self-equi-join on the calendar-sized index (lag "
    "exploded from a 2-row literal, shared scan).",
)
def autocorrelation_daily_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    widx = Window.orderBy("day")
    idxd = daily.select(
        F.row_number().over(widx).cast("long").alias("idx"), "n"
    )
    tot = idxd.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("k"))
    y = idxd.crossJoin(F.broadcast(tot)).select(
        "idx", (F.col("k") * F.col("n") - F.col("t")).alias("y")
    )
    den = y.agg(F.sum(F.col("y") * F.col("y")).alias("d"))
    probes = y.select(
        "y",
        "idx",
        F.explode(
            F.array(F.lit(1).cast("long"), F.lit(7).cast("long"))
        ).alias("lag"),
    ).select("y", "lag", (F.col("idx") + F.col("lag")).alias("bkey"))
    right = y.select(F.col("idx").alias("bkey"), F.col("y").alias("yb"))
    num = (
        probes.join(right, "bkey")
        .groupBy("lag")
        .agg(
            F.sum(F.col("y") * F.col("yb")).alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.round(F.col("num").cast("double") / F.col("d"), 6).alias(
            "autocorr"
        ),
    )


# ---------------------------------------------------------------------
# 13. Weekday-adjusted anomaly scores (the detector over the baseline)
# ---------------------------------------------------------------------

_WD_ANOMALY_ORACLE = """WITH daily AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), dowd AS (
  SELECT day, n, CAST(dayofweek(day) AS INTEGER) AS dow FROM daily
), base AS (
  SELECT dow,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS t,
         CAST(sum(n * n) AS BIGINT) AS ssq
  FROM dowd GROUP BY dow
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       d.dow, d.n,
       CASE WHEN b.k * b.ssq - b.t * b.t > 0
            THEN round(CAST(b.k * d.n - b.t AS DOUBLE)
                       / sqrt(CAST(b.k * b.ssq - b.t * b.t AS DOUBLE)), 6)
       END AS z,
       (b.k * d.n - b.t) * (b.k * d.n - b.t)
         > 4 * (b.k * b.ssq - b.t * b.t)
         AND b.k * b.ssq - b.t * b.t > 0 AS flagged
FROM dowd d JOIN base b ON b.dow = d.dow"""


@stage(
    "weekday_adjusted_anomaly_events",
    _WD_ANOMALY_ORACLE,
    "anomaly detection: WEEKDAY-ADJUSTED DAILY Z-SCORES — each day "
    "scored against ITS weekday's mean/variance (the detector that "
    "dow_seasonality_events is the baseline for; a raw-volume "
    "detector alarms every weekend, this one alarms only on days odd "
    "FOR THEIR WEEKDAY). The |z| > 2 flag is an EXACT-INTEGER "
    "compare — (k*n - T)^2 > 4*(k*ssq - T^2) clears both "
    "denominators — so the boolean can never flip on an engine ulp; "
    "the reported z is a single quotient+sqrt on exact integers, "
    "NULL for zero-variance weekdays (guarded on both engines, the "
    "round-6 epsilon-variance lesson). Scale shape: one groupBy to "
    "days; the 7-row weekday baseline broadcasts back onto the "
    "calendar-sized daily table.",
)
def weekday_adjusted_anomaly_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dowd = daily.select(
        "day", "n", (F.dayofweek("day") - 1).cast("int").alias("dow")
    )
    base = dowd.groupBy("dow").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("t"),
        F.sum(F.col("n") * F.col("n")).alias("ssq"),
    )
    j = dowd.join(F.broadcast(base), "dow")
    num = F.col("k") * F.col("n") - F.col("t")
    var = F.col("k") * F.col("ssq") - F.col("t") * F.col("t")
    return j.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dow",
        "n",
        F.when(
            var > 0,
            F.round(num.cast("double") / F.sqrt(var.cast("double")), 6),
        ).alias("z"),
        ((num * num > 4 * var) & (var > 0)).alias("flagged"),
    )


# ---------------------------------------------------------------------
# 14. Session-duration distribution (30-min gap rule)
# ---------------------------------------------------------------------

_SESS_DUR_ORACLE = """WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts)
                   - epoch(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id))
                   > 1800
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM gaps
), durs AS (
  SELECT user_id, sess_id,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS dur_s,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY user_id, sess_id
)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       round(CAST(sum(dur_s) AS DOUBLE) / count(*), 6) AS mean_dur_s,
       round(quantile_cont(CAST(dur_s AS DOUBLE), 0.5), 6) AS p50,
       round(quantile_cont(CAST(dur_s AS DOUBLE), 0.9), 6) AS p90,
       round(quantile_cont(CAST(dur_s AS DOUBLE), 0.99), 6) AS p99,
       round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS single_event_share
FROM durs"""


@stage(
    "session_duration_quantiles_events",
    _SESS_DUR_ORACLE,
    "engagement distribution: SESSION DURATIONS under the 30-min gap "
    "rule — count, mean, exact interpolated p50/p90/p99 and the "
    "single-event-session share (the bounce-rate analogue; a spike "
    "there with stable session counts means engagement quietly "
    "collapsed). Builds on sessionization_events' lag/running-sum "
    "shape (deterministic (ts, event_id) ordering) and reports the "
    "DISTRIBUTION the per-user rollup cannot show. Durations are "
    "exact integer seconds; the only floats are the final mean "
    "division and the percentile interpolation (Spark percentile == "
    "DuckDB quantile_cont, the quantiles_lineitem convention). Scale "
    "shape: one shuffle on user_id for the session windows, then a "
    "session-count-sized aggregate; approx twin at 100 TB is "
    "percentile_approx, as documented for the quantile family.",
)
def session_duration_quantiles_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp(F.col("ts"))
    new_sess = (
        F.when(
            F.lag(F.col("ts")).over(w).isNull()
            | ((ep - F.lag(ep).over(w)) > 1800),
            1,
        ).otherwise(0)
    )
    wcum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        new_sess.alias("new_sess"),
    ).withColumn("sess_id", F.sum("new_sess").over(wcum))
    durs = sess.groupBy("user_id", "sess_id").agg(
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("dur_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    pcts = F.percentile(
        F.col("dur_s").cast("double"),
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
    )
    return durs.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(
            F.sum("dur_s").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_dur_s"),
        pcts.alias("pcts"),
        F.round(
            F.sum((F.col("n_events") == 1).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("single_event_share"),
    ).select(
        "n_sessions",
        "mean_dur_s",
        F.round(F.col("pcts")[0], 6).alias("p50"),
        F.round(F.col("pcts")[1], 6).alias("p90"),
        F.round(F.col("pcts")[2], 6).alias("p99"),
        "single_event_share",
    )


# ---------------------------------------------------------------------
# 15. Reorder-depth profile (out-of-orderness of the arrival stream)
# ---------------------------------------------------------------------

_REORDER_ORACLE = """WITH arr AS (
  SELECT event_id,
         CAST(floor(epoch(CASE WHEN event_id % 7 = 0
                               THEN ts - INTERVAL 96 HOUR
                               ELSE ts END)) AS BIGINT) AS es
  FROM events
), depths AS (
  SELECT max(es) OVER (ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) - es AS depth
  FROM arr
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN depth > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inverted,
       round(CAST(sum(CASE WHEN depth > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS inverted_share,
       CAST(max(depth) AS BIGINT) AS max_depth_s,
       round(quantile_cont(CAST(depth AS DOUBLE), 0.5)
             FILTER (WHERE depth > 0), 6) AS p50_depth_s,
       round(quantile_cont(CAST(depth AS DOUBLE), 0.99)
             FILTER (WHERE depth > 0), 6) AS p99_depth_s
FROM depths"""


@stage(
    "reorder_depth_events",
    _REORDER_ORACLE,
    "stream disorder profile: REORDER DEPTH — for each arrival (the "
    "event_id replay order, dirtied with the 96h-late 1-in-7 tail), "
    "how far behind the running event-time high-water mark it lands; "
    "the distribution (inverted share, max, p50/p99 among late "
    "arrivals) is the empirical bound a reorder buffer or watermark "
    "delay must cover — drop_rate_by_delay_events prices chosen "
    "budgets, this measures the disorder itself. The Spark side "
    "computes the running max SCALABLY in two levels: a per-batch "
    "prefix max (partitioned window) combined with the exclusive "
    "running max of per-batch maxima (batch-count-sized window) — "
    "exact same result as the oracle's naive global window, which "
    "replays the definition independently. Depths are exact integer "
    "seconds; quantiles are the standard interpolated pair.",
)
def reorder_depth_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    arr = ev.select(
        "event_id",
        F.unix_timestamp(
            F.when(
                F.col("event_id") % 7 == 0,
                F.col("ts") - F.expr("INTERVAL 96 HOURS"),
            ).otherwise(F.col("ts"))
        ).alias("es"),
    ).withColumn("batch", F.floor(F.col("event_id") / 100).cast("long"))
    win_in = (
        Window.partitionBy("batch")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bm = arr.groupBy("batch").agg(F.max("es").alias("mx"))
    wprev = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = bm.select("batch", F.max("mx").over(wprev).alias("prev_mx"))
    depths = (
        arr.withColumn("in_mx", F.max("es").over(win_in))
        .join(F.broadcast(prev), "batch")
        .select(
            (
                F.greatest(
                    F.coalesce("prev_mx", F.col("in_mx")), F.col("in_mx")
                )
                - F.col("es")
            ).alias("depth")
        )
    )
    inv = F.when(F.col("depth") > 0, F.col("depth").cast("double"))
    pcts = F.percentile(inv, F.array(F.lit(0.5), F.lit(0.99)))
    return depths.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("depth") > 0).cast("long")).alias("n_inverted"),
        F.round(
            F.sum((F.col("depth") > 0).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("inverted_share"),
        F.max("depth").alias("max_depth_s"),
        pcts.alias("pcts"),
    ).select(
        "n_events",
        "n_inverted",
        "inverted_share",
        "max_depth_s",
        F.round(F.col("pcts")[0], 6).alias("p50_depth_s"),
        F.round(F.col("pcts")[1], 6).alias("p99_depth_s"),
    )


# ---------------------------------------------------------------------
# 16. Funnel conversion by first-seen cohort
# ---------------------------------------------------------------------

_FUNNEL_COHORT_ORACLE = """WITH firsts AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
), v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT DISTINCT e.user_id
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts > v.t1
)
SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d')
         AS cohort_week,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted,
       round(CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS conversion_rate
FROM firsts f LEFT JOIN conv c ON c.user_id = f.user_id
GROUP BY cohort_week"""


@stage(
    "funnel_cohort_conversion_events",
    _FUNNEL_COHORT_ORACLE,
    "product analytics: FUNNEL CONVERSION BY FIRST-SEEN COHORT — "
    "view -> later purchase conversion, cut by the week each user "
    "first appeared (retention_cohorts_events tracks who COMES BACK; "
    "this tracks whether NEW users still convert — the number that "
    "isolates a release regression to the cohort that onboarded "
    "under it). Conversion uses the funnel_events frontier shape "
    "(per-user min-view join, strictly-later purchase, stage tables "
    "shrink monotonically so later joins broadcast); the cohort key "
    "is date_trunc('week') of the per-user min — identical Monday "
    "anchoring on both engines. All counts exact; one 6dp rate.",
)
def funnel_cohort_conversion_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    return (
        firsts.join(F.broadcast(conv), "user_id", "left")
        .groupBy(
            F.date_format(
                F.date_trunc("week", F.col("first_ts")), "yyyy-MM-dd"
            ).alias("cohort_week")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0))).alias("n_converted"),
            F.round(
                F.sum(F.coalesce("converted", F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("conversion_rate"),
        )
    )


# ---------------------------------------------------------------------
# 17. Pack fill-level histogram (padding waste / overflow QC)
# ---------------------------------------------------------------------


def _pack_fill_oracle() -> str:
    from .queries_more import _BUCKET_SQL

    return f"""WITH hashed AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
           AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), bucketed AS (
  SELECT doc_id, n_tokens, h, {_BUCKET_SQL} % 8 AS bucket FROM hashed
), cum AS (
  SELECT doc_id, bucket, n_tokens,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - n_tokens AS before_tokens
  FROM bucketed
), packs AS (
  SELECT bucket, CAST(floor(before_tokens / 2048) AS BIGINT) AS pack_id,
         CAST(sum(n_tokens) AS BIGINT) AS fill,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM cum GROUP BY bucket, pack_id
)
SELECT CAST(least(fill * 10 // 2048, 10) AS BIGINT) AS fill_decile,
       CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       round(CAST(sum(fill) AS DOUBLE) / count(*), 6) AS mean_fill
FROM packs GROUP BY fill_decile"""


@stage(
    "pack_bin_fill_documents",
    _pack_fill_oracle(),
    "packing QC: PACK FILL-LEVEL HISTOGRAM — the pack_assign_"
    "documents replay rolled up to (bucket, pack) fill totals, "
    "bucketed into utilization deciles of the 2048-token budget "
    "(decile 10 = packs the budget-quantized greedy rule let "
    "overflow by < one document). The padding-waste readout a "
    "sequence-packing pipeline publishes: mass in low deciles is "
    "compute paid for pad tokens (mostly the per-bucket tail packs), "
    "mass in decile 10 sizes the overflow trim. Same content-free "
    "md5 ordering as every deterministic-selection operator, so this "
    "query, the split and the samplers stay mutually consistent. "
    "Exact-integer fills and decile cuts (positive // == floor on "
    "both engines); one windowed cumsum per hash bucket, then "
    "pack-count-sized aggregates.",
)
def pack_bin_fill_documents(spark, sf_dir):
    from .ext.text import token_count_col
    from .queries_more import _doc_bucket_col, _doc_hash_col

    df = load_table(spark, sf_dir, "documents")
    staged = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count_col(F.col("text")).alias("n_tokens"),
        _doc_hash_col().alias("__h"),
        (_doc_bucket_col() % 8).cast("long").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    packs = (
        staged.withColumn(
            "pack_id", F.floor(before / 2048).cast("long")
        )
        .groupBy("bucket", "pack_id")
        .agg(
            F.sum("n_tokens").alias("fill"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    decile = F.least(
        F.floor(F.col("fill") * 10 / 2048), F.lit(10)
    ).cast("long")
    return packs.groupBy(decile.alias("fill_decile")).agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.sum("fill").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_fill"
        ),
    )


# ---------------------------------------------------------------------
# 18. Temporal PSI on the value distribution (first vs second half)
# ---------------------------------------------------------------------

_PSI_EDGES = [10.0, 25.0, 50.0, 100.0, 200.0]


def _psi_bin_sql(col: str) -> str:
    conds = []
    lo = None
    for i, e in enumerate(_PSI_EDGES):
        if i == 0:
            conds.append(f"WHEN {col} < {e} THEN 0")
        else:
            conds.append(f"WHEN {col} < {e} THEN {i}")
        lo = e
    conds.append(f"ELSE {len(_PSI_EDGES)}")
    return "CASE " + " ".join(conds) + " END"


_PSI_DRIFT_ORACLE = f"""WITH days AS (
  SELECT date_trunc('day', ts) AS day FROM events GROUP BY day
), idxd AS (
  SELECT day, row_number() OVER (ORDER BY day) AS idx,
         count(*) OVER () AS k
  FROM days
), tagged AS (
  SELECT CASE WHEN i.idx * 2 <= i.k THEN 0 ELSE 1 END AS period,
         {_psi_bin_sql('e.value')} AS bin
  FROM events e JOIN idxd i ON date_trunc('day', e.ts) = i.day
  WHERE e.value IS NOT NULL
), cells AS (
  SELECT bin,
         CAST(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM tagged GROUP BY bin
), tot AS (
  SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
         CAST(count(*) AS BIGINT) AS b
  FROM cells
)
SELECT CAST(c.bin AS BIGINT) AS bin, c.c0, c.c1,
       round((CAST(c.c0 + 1 AS DOUBLE) / (t.n0 + t.b)
              - CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + t.b))
             * ln((CAST(c.c0 + 1 AS DOUBLE) / (t.n0 + t.b))
                  / (CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + t.b))), 6)
         AS psi_contrib
FROM cells c CROSS JOIN tot t"""


@stage(
    "psi_value_drift_events",
    _PSI_DRIFT_ORACLE,
    "temporal drift: PSI OF THE VALUE DISTRIBUTION, first half of "
    "the stream's days vs second half, on fixed bins — the "
    "reference-window population-stability test psi_bins_lineitem "
    "applies across a TIME split instead of a hash split (the drift "
    "question monitoring actually asks: did the metric's shape move "
    "this period?). Laplace-smoothed shares ((c+1)/(n+B)) keep "
    "empty-bin contributions finite and deterministic; each bin's "
    "(p-q)*ln(p/q) term is a single-op chain on two exact rationals, "
    "reported per bin at 6dp (the analyst sums — per-bin terms also "
    "localize WHICH band moved). Period assignment is an exact "
    "integer compare on the day index (idx*2 <= k). Scale shape: the "
    "calendar-sized day table broadcasts onto one event scan; cells "
    "and margins are bin-count-sized.",
)
def psi_value_drift_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    days = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.lit(1).alias("__one")
    )
    widx = Window.orderBy("day")
    wall = Window.partitionBy()
    idxd = days.select(
        "day",
        F.row_number().over(widx).alias("idx"),
        F.count(F.lit(1)).over(wall).alias("k"),
    )
    bin_col = F.lit(len(_PSI_EDGES))
    for i in range(len(_PSI_EDGES) - 1, -1, -1):
        bin_col = F.when(
            F.col("value") < _PSI_EDGES[i], F.lit(i)
        ).otherwise(bin_col)
    tagged = (
        ev.filter(F.col("value").isNotNull())
        .join(
            F.broadcast(idxd),
            F.date_trunc("day", F.col("ts")) == F.col("day"),
        )
        .select(
            F.when(F.col("idx") * 2 <= F.col("k"), 0)
            .otherwise(1)
            .alias("period"),
            bin_col.alias("bin"),
        )
    )
    cells = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    tot = cells.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.count(F.lit(1)).alias("b"),
    )
    p = (F.col("c0") + 1).cast("double") / (F.col("n0") + F.col("b"))
    q = (F.col("c1") + 1).cast("double") / (F.col("n1") + F.col("b"))
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        "c0",
        "c1",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


# ---------------------------------------------------------------------
# 19. Multimodal decode budget (pixels / audio-ms / bytes per format)
# ---------------------------------------------------------------------


def _mm_budget_oracle() -> str:
    from .queries import QUERIES

    meta = QUERIES["multimodal_header_meta"].oracle
    return f"""WITH meta AS ({meta})
SELECT format,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels,
       CAST(sum(duration_ms) AS BIGINT) AS total_duration_ms
FROM meta GROUP BY format"""


@stage(
    "multimodal_duration_budget",
    _mm_budget_oracle(),
    "multimodal planning: DECODE BUDGET PER FORMAT — total pixels "
    "(images), audio milliseconds (wav) and container bytes, "
    "aggregated from the REAL byte-parsed headers of "
    "multimodal_header_meta (struct-packed PNG/JPEG/WAV payloads "
    "parsed back from bytes via the Arrow-batched mapInPandas "
    "pipeline; the oracle replays the doc_id-derived header "
    "arithmetic). This is the number a preprocessing fleet is sized "
    "from: decode cost scales with pixels/samples, not file count — "
    "exactly what a header-only scan can budget WITHOUT decoding "
    "payloads. Null-typed sums stay NULL for the non-applicable "
    "format rows on both engines. Scale shape: header parse is "
    "map-side Arrow batches; one format-keyed groupBy of 3 groups.",
)
def multimodal_duration_budget(spark, sf_dir):
    from .queries import multimodal_header_meta

    meta = multimodal_header_meta(spark, sf_dir)
    return meta.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.col("width").cast("long") * F.col("height")).alias(
            "total_pixels"
        ),
        F.sum("duration_ms").alias("total_duration_ms"),
    )


# ---------------------------------------------------------------------
# 20. Split-balance chi-square (independence audit of the hash split)
# ---------------------------------------------------------------------


def _split_balance_oracle() -> str:
    from .queries_more import _BUCKET_SQL

    return f"""WITH hashed AS (
  SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
), assigned AS (
  SELECT source,
         CASE WHEN {_BUCKET_SQL} < 205 THEN 'train'
              WHEN {_BUCKET_SQL} < 230 THEN 'val'
              ELSE 'test' END AS split
  FROM hashed
), cells AS (
  SELECT source, split, CAST(count(*) AS BIGINT) AS n
  FROM assigned GROUP BY source, split
), m AS (
  SELECT source, split, CAST(n AS DOUBLE) AS n, n AS ni,
         CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE) AS rt,
         CAST(sum(n) OVER (PARTITION BY split) AS DOUBLE) AS ct,
         CAST(sum(n) OVER () AS DOUBLE) AS g
  FROM cells
)
SELECT source,
       CAST(sum(CASE WHEN split = 'train' THEN ni ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(sum(CASE WHEN split = 'val' THEN ni ELSE 0 END) AS BIGINT)
         AS n_val,
       CAST(sum(CASE WHEN split = 'test' THEN ni ELSE 0 END) AS BIGINT)
         AS n_test,
       round(CAST(sum(CAST(round((n - rt * ct / g) * (n - rt * ct / g)
                                 / (rt * ct / g) * 1e6) AS BIGINT))
                  AS DOUBLE) / 1e6, 6) AS chi2_contrib
FROM m GROUP BY source"""


@stage(
    "split_balance_chi_square_documents",
    _split_balance_oracle(),
    "split audit: SOURCE x SPLIT INDEPENDENCE — the hash split of "
    "split_assign_documents cross-tabulated against source, with "
    "per-source Pearson chi-square contributions (quantized-exact "
    "1e6 sums, the chi_square_drift_events convention). A split "
    "correlated with source leaks domain mix into val/test — the "
    "audit every train/val/test materialization should publish next "
    "to its counts; content-free hashing makes independence the "
    "expected PASS, and a failure here means someone keyed the hash "
    "on something source-correlated. Shares the single _doc_hash_col "
    "definition with the split/sampler/packing family, so this audit "
    "provably audits THE split the pipeline uses. One groupBy to "
    "source x split cells; margins via windows over that tiny table.",
)
def split_balance_chi_square_documents(spark, sf_dir):
    from .queries_more import _doc_bucket_col

    df = load_table(spark, sf_dir, "documents")
    bucket = _doc_bucket_col()
    split = (
        F.when(bucket < 205, "train")
        .when(bucket < 230, "val")
        .otherwise("test")
    )
    cells = (
        df.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.partitionBy("source")
    wc = Window.partitionBy("split")
    wg = Window.partitionBy()
    m = cells.select(
        "source",
        "split",
        F.col("n").cast("double").alias("nd"),
        F.col("n").alias("ni"),
        F.sum("n").over(wr).cast("double").alias("rt"),
        F.sum("n").over(wc).cast("double").alias("ct"),
        F.sum("n").over(wg).cast("double").alias("g"),
    )
    e = F.col("rt") * F.col("ct") / F.col("g")
    contrib = (F.col("nd") - e) * (F.col("nd") - e) / e
    return m.groupBy("source").agg(
        F.sum(F.when(F.col("split") == "train", F.col("ni")).otherwise(0))
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", F.col("ni")).otherwise(0))
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", F.col("ni")).otherwise(0))
        .alias("n_test"),
        F.round(
            F.sum(F.round(contrib * 1e6).cast("long")).cast("double")
            / 1e6,
            6,
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------
# Round-8 promotion hook (second pass; see queries_more's re-entrancy
# note): several eager-oracle builders above import from sibling query
# modules at module-body time, so importing THIS module first runs the
# whole registration chain while STAGED_R8 is still a prefix.
# Re-invoking the skip-if-registered promotion here — after all twenty
# entries exist — makes the catalog complete under either import
# order (the queries_staging_r7 pattern, verbatim).
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r8 as _promote  # noqa: E402

_promote()
del _promote
