"""ROUND-9 STAGED catalog queries — built and oracle-verified in round
7 (ahead of schedule: the round-8 cohort was already staged when these
were written), NOT registered (the round-7 catalog froze at 212 when
the driver window rotated; registering now would create an unchecked
tail — the r1-r3 lesson, same protocol as queries_staging_r5..r8).
Round 9 promotes them by registering from queries_more.py (re-entrant
skip-if-registered loop) and fronting them in ``_DRIVER_WINDOW``.

The cohort opens operator families the catalog does not have yet:

- ``cdc_last_write_wins_events`` — CDC compaction: latest version per
  (user_id, event_type) key as ONE shuffle-side aggregate (struct-max
  argmax), the batch mirror of a MERGE INTO / upsert sink.
- ``scd2_intervals_events`` — slowly-changing-dimension type-2
  history build: per-user runs of equal event_type become validity
  intervals [valid_from, valid_to) with NULL for the current row —
  the dimension-maintenance face of the same CDC surface.
- ``robust_scaling_stats_events`` — median/IQR scaling stats per
  event_type + Tukey-fence outlier shares: the train/serve feature
  normalization export (robust to the heavy tails that break
  mean/std scaling).
- ``pit_features_events`` — POINT-IN-TIME feature backfill: for every
  purchase event, counts/quantized sums/recency over the user's
  strictly-earlier events within a 7-day range window — the
  leakage-free training-matrix assembly shape (window rangeBetween,
  no self-join).
- ``dup_ngram_span_documents`` — substring-dedup approximation (the
  Lee et al. exact-substring idea in n-gram form): per document, the
  longest run of CONSECUTIVE 8-gram positions whose n-gram also
  appears in another document (gaps-and-islands over the inverted
  index).
- ``semdedup_prune_embeddings`` — SemDeDup: k-means cells from the
  deterministic 2-iteration replay, then within-cell cosine near-dup
  pruning (keep-min-id), reported as per-cell prune rates. Pairs only
  ever meet INSIDE a cell — the cluster-then-prune shape that makes
  embedding dedup tractable at corpus scale.
- ``hard_negative_mining_embeddings`` — contrastive-training data
  mining: for each probe query, the top-5 nearest vectors drawn ONLY
  from the nprobe nearest FOREIGN-label IVF cells (hard negatives:
  close in embedding space, different label).
- ``contrastive_pair_mining_documents`` — anchor/positive pair mining
  for contrastive text training: same-source document pairs whose
  shingle Jaccard sits in a mid band (exact-integer threshold
  compares) — related but not near-duplicate.

tests/test_staging_r9.py runs these through the SAME compare harness
as the live catalog (exact column order, canonical dtypes, sorted
values) at the suite's SF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

# Import-order note (same as queries_staging_r8): bind the full catalog
# chain first so any oracle builder that asks a sibling module for a
# CTE never reaches a partially-initialized frame.
from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table
from .queries import _qsum, _qsum_sql

STAGED_R9: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R9[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    """Oracle SQL for a staged query (uniform accessor; all round-9
    oracles are eager strings)."""
    return STAGED_R9[name].oracle


# ---------------------------------------------------------------------
# 1. CDC compaction: last-write-wins per key
# ---------------------------------------------------------------------

_CDC_LWW_ORACLE = """WITH ranked AS (
  SELECT user_id, event_type, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_versions
  FROM events
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch_s,
       round(CAST(value AS DOUBLE), 6) AS last_value,
       CAST(n_versions AS BIGINT) AS n_versions
FROM ranked WHERE rn = 1"""


@stage(
    "cdc_last_write_wins_events",
    _CDC_LWW_ORACLE,
    "CDC compaction / upsert mirror: the LATEST version per "
    "(user_id, event_type) key under last-write-wins ordering "
    "(ts DESC, event_id DESC as the deterministic tiebreak) plus the "
    "superseded-version count — the batch equivalent of a MERGE INTO "
    "sink compacting a change stream. The Spark side is ONE "
    "groupBy(key).agg(max(struct(ts, event_id, value))) — struct max "
    "orders lexicographically, so the argmax rides a single shuffle-"
    "side aggregate with map-side partials instead of the oracle's "
    "full window sort; at 100 TB that is the difference between "
    "shuffling every version and shuffling one partial per key per "
    "mapper.",
)
def cdc_last_write_wins_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    latest = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    ).alias("w")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(latest, F.count(F.lit(1)).alias("n_versions"))
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "event_type",
            F.unix_timestamp(F.col("w.ts")).alias("last_epoch_s"),
            F.round(F.col("w.value").cast("double"), 6).alias("last_value"),
            F.col("n_versions").cast("long").alias("n_versions"),
        )
    )


# ---------------------------------------------------------------------
# 2. SCD2 history build: validity intervals from a change stream
# ---------------------------------------------------------------------

_SCD2_ORACLE = """WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, ts, event_id,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM ordered
), intervals AS (
  SELECT user_id, run_id, min(event_type) AS event_type,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from_s,
         CAST(count(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(run_id AS BIGINT) AS version_no,
       event_type,
       valid_from_s,
       lead(valid_from_s) OVER (PARTITION BY user_id
                                ORDER BY run_id) AS valid_to_s,
       n_events
FROM intervals"""


@stage(
    "scd2_intervals_events",
    _SCD2_ORACLE,
    "SCD type-2 dimension build: compress each user's event stream "
    "into validity intervals — one row per RUN of equal consecutive "
    "event_type (deterministic (ts, event_id) ordering), with "
    "valid_from = the run's first event, valid_to = the next run's "
    "first event (NULL marks the current row), version_no the 1-based "
    "change counter, and the run's event count. This is the "
    "dimension-maintenance operator a warehouse MERGE pipeline runs "
    "on every CDC batch; the gaps-and-islands shape (lag -> running "
    "sum -> group -> lead) is all windows over ONE user_id "
    "partitioning, so the whole history build costs a single shuffle.",
)
def scd2_intervals_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = ev.select(
        "user_id", "event_type", "ts", "event_id", chg.alias("chg")
    ).withColumn("run_id", F.sum("chg").over(wcum))
    intervals = runs.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.unix_timestamp(F.min("ts")).alias("valid_from_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("run_id")
    return intervals.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("run_id").cast("long").alias("version_no"),
        "event_type",
        "valid_from_s",
        F.lead("valid_from_s").over(wl).alias("valid_to_s"),
        F.col("n_events").cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------
# 3. Robust scaling stats (median/IQR + Tukey fences)
# ---------------------------------------------------------------------

_ROBUST_ORACLE = """WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         quantile_cont(CAST(value AS DOUBLE), 0.25) AS q1,
         quantile_cont(CAST(value AS DOUBLE), 0.5) AS med,
         quantile_cont(CAST(value AS DOUBLE), 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       any_value(s.n) AS n,
       round(any_value(s.med), 6) AS median,
       round(any_value(s.q3) - any_value(s.q1), 6) AS iqr,
       CAST(sum(CASE WHEN CAST(e.value AS DOUBLE)
                          < s.q1 - 1.5 * (s.q3 - s.q1)
                       OR CAST(e.value AS DOUBLE)
                          > s.q3 + 1.5 * (s.q3 - s.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(CAST(sum(CASE WHEN CAST(e.value AS DOUBLE)
                                < s.q1 - 1.5 * (s.q3 - s.q1)
                             OR CAST(e.value AS DOUBLE)
                                > s.q3 + 1.5 * (s.q3 - s.q1)
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / any_value(s.n), 6) AS outlier_share
FROM events e JOIN stats s ON s.event_type = e.event_type
GROUP BY e.event_type"""


@stage(
    "robust_scaling_stats_events",
    _ROBUST_ORACLE,
    "train/serve feature normalization export: per event_type the "
    "MEDIAN and IQR (the robust-scaler parameters — immune to the "
    "heavy tails that poison mean/std scaling) plus Tukey-fence "
    "outlier counts (outside q1/q3 -/+ 1.5*IQR). Quantiles are exact "
    "interpolated (Spark percentile == DuckDB quantile_cont, the "
    "quantiles_lineitem convention); fence comparisons use the "
    "UNROUNDED double quantiles so both engines test the identical "
    "IEEE values, and only the published stats are rounded. Scale "
    "shape: one grouped quantile pass (5 groups), stats broadcast "
    "back onto the scan for the fence count — at 100 TB the exact "
    "quantile swaps for percentile_approx exactly as documented for "
    "the quantile family.",
)
def robust_scaling_stats_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    pcts = F.percentile(
        F.col("v"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), pcts.alias("p")
    ).select(
        "event_type",
        "n",
        F.col("p")[0].alias("q1"),
        F.col("p")[1].alias("med"),
        F.col("p")[2].alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        (F.col("v") < F.col("q1") - F.lit(1.5) * iqr)
        | (F.col("v") > F.col("q3") + F.lit(1.5) * iqr)
    ).cast("long")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("q3") - F.first("q1"), 6).alias("iqr"),
            F.sum(out).alias("n_outliers"),
            F.round(
                F.sum(out).cast("double") / F.first("n"), 6
            ).alias("outlier_share"),
        )
    )


# ---------------------------------------------------------------------
# 4. Point-in-time feature backfill (leakage-free training matrix)
# ---------------------------------------------------------------------

_PIT_ORACLE = f"""WITH base AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(value AS DOUBLE) AS v
  FROM events
), feat AS (
  SELECT event_id, event_type,
         count(*) OVER w AS n_prior_7d,
         sum(CAST(round(v * 1000000.0) AS BIGINT)) OVER w AS qsum,
         es - max(es) OVER w AS last_gap_s
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY es
               RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(n_prior_7d AS BIGINT) AS n_prior_7d,
       round(CAST(coalesce(qsum, 0) AS DOUBLE) / 1000000.0, 6)
         AS sum_value_7d,
       CAST(last_gap_s AS BIGINT) AS last_gap_s
FROM feat WHERE event_type = 'purchase'"""


@stage(
    "pit_features_events",
    _PIT_ORACLE,
    "POINT-IN-TIME feature backfill — the leakage-free training-matrix "
    "assembly every supervised pipeline needs: for each purchase "
    "(label) event, the user's activity count, quantized-exact value "
    "sum, and seconds-since-last-event over events STRICTLY EARLIER "
    "(by whole seconds) within a 7-day horizon. Implemented as ONE "
    "window rangeBetween(-604800, -1) over epoch seconds — no "
    "self-join, no per-label scan: the features for every candidate "
    "row materialize in a single pass and the label filter prunes "
    "afterwards, which is exactly how a feature store backfills years "
    "of labels. The range frame excludes SAME-second rows on both "
    "engines (strict point-in-time: a feature computed in the label's "
    "own second is already leakage at serving time). Scale shape: one "
    "shuffle on user_id; state per user is the 7-day ring the range "
    "frame slides.",
)
def pit_features_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp(F.col("ts"))
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        es.alias("es"),
        F.col("value").cast("double").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-604800, -1)
    )
    feat = base.select(
        "event_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_prior_7d"),
        F.sum(F.round(F.col("v") * F.lit(1e6)).cast("long"))
        .over(w)
        .alias("qsum"),
        (F.col("es") - F.max("es").over(w)).alias("last_gap_s"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("n_prior_7d").cast("long").alias("n_prior_7d"),
        F.round(
            F.coalesce(F.col("qsum"), F.lit(0)).cast("double") / F.lit(1e6), 6
        ).alias("sum_value_7d"),
        F.col("last_gap_s").cast("long").alias("last_gap_s"),
    )


# ---------------------------------------------------------------------
# 5. Longest duplicated n-gram span (substring-dedup approximation)
# ---------------------------------------------------------------------

_NGRAM_N = 8

_DUP_SPAN_ORACLE = f"""WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= {_NGRAM_N}
), gpos AS (
  SELECT doc_id, w, unnest(range(0, len(w) - {_NGRAM_N - 1})) AS pos
  FROM words
), grams AS (
  SELECT doc_id, pos,
         array_to_string(w[pos + 1 : pos + {_NGRAM_N}], ' ') AS ng
  FROM gpos
), shared AS (
  SELECT ng FROM grams GROUP BY ng HAVING count(DISTINCT doc_id) >= 2
), flagged AS (
  SELECT g.doc_id, g.pos,
         CASE WHEN s.ng IS NULL THEN 0 ELSE 1 END AS dup
  FROM grams g LEFT JOIN shared s ON s.ng = g.ng
), islands AS (
  SELECT doc_id, pos - row_number() OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS grp
  FROM flagged WHERE dup = 1
), runs AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
  FROM islands GROUP BY doc_id, grp
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_ngrams,
         CAST(sum(dup) AS BIGINT) AS n_dup_ngrams
  FROM flagged GROUP BY doc_id
)
SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
       p.n_ngrams,
       p.n_dup_ngrams,
       CAST(coalesce(max(r.run_len), 0) AS BIGINT) AS max_dup_run
FROM per_doc p LEFT JOIN runs r ON r.doc_id = p.doc_id
GROUP BY p.doc_id, p.n_ngrams, p.n_dup_ngrams"""


@stage(
    "dup_ngram_span_documents",
    _DUP_SPAN_ORACLE,
    "substring-dedup approximation (the exact-substring dedup idea of "
    "Lee et al.'s 'Deduplicating Training Data' in n-gram form): per "
    "document, how much of it exists verbatim elsewhere — the count "
    "of 8-gram positions whose n-gram appears in ANOTHER document, "
    "and the LONGEST CONSECUTIVE run of such positions (a run of r "
    "duplicated 8-grams = a shared span of r+7 words, the thing you "
    "clip rather than drop the whole document for). Shapes: inverted "
    "index on the n-gram string (documents only meet on shared "
    "grams), cross-doc sharing via count(DISTINCT doc_id) >= 2, then "
    "gaps-and-islands (pos - row_number) per document for the spans. "
    "Scale: the n-gram table is the same size class as the shingle "
    "tables the dedup family already shuffles; at 100 TB the gram "
    "string is replaced by its xxhash64 (the dedup_*_fast convention) "
    "to shrink the shuffle 5-10x.",
)
def dup_ngram_span_documents(spark, sf_dir):
    n = _NGRAM_N
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).filter(F.size("w") >= n)
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {n}), "
                f"i -> array_join(slice(w, i + 1, {n}), ' '))"
            )
        ).alias("pos", "ng"),
    )
    shared = (
        grams.groupBy("ng")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ng")
    )
    flagged = grams.join(
        shared.withColumn("__dup", F.lit(1)), "ng", "left"
    ).select(
        "doc_id", "pos", F.coalesce(F.col("__dup"), F.lit(0)).alias("dup")
    )
    wisl = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        flagged.filter(F.col("dup") == 1)
        .select(
            "doc_id", (F.col("pos") - F.row_number().over(wisl)).alias("grp")
        )
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg(F.max("run_len").alias("max_run"))
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum("dup").alias("n_dup_ngrams"),
    )
    return per_doc.join(runs, "doc_id", "left").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_dup_ngrams").cast("long").alias("n_dup_ngrams"),
        F.coalesce(F.col("max_run"), F.lit(0)).cast("long").alias(
            "max_dup_run"
        ),
    )
