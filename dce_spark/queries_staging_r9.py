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
    from .ext.warehouse import last_write_wins

    ev = load_table(spark, sf_dir, "events")
    out = last_write_wins(
        ev, ["user_id", "event_type"], ["ts", "event_id"], ["value"]
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        F.unix_timestamp(F.col("last_ts")).alias("last_epoch_s"),
        F.round(F.col("last_value").cast("double"), 6).alias("last_value"),
        F.col("n_versions").cast("long").alias("n_versions"),
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
    from .ext.warehouse import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    iv = scd2_intervals(ev, "user_id", "event_type", "ts", "event_id")
    return iv.select(
        F.col("user_id").cast("long").alias("user_id"),
        "version_no",
        "event_type",
        F.unix_timestamp(F.col("valid_from")).alias("valid_from_s"),
        F.unix_timestamp(F.col("valid_to")).alias("valid_to_s"),
        F.col("n_rows").alias("n_events"),
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
    from .ext.warehouse import pit_window_features

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp(F.col("ts")).alias("es"),
        F.col("value").cast("double").alias("v"),
    )
    feat = pit_window_features(
        base, "user_id", "es", "v", horizon_s=604800, quantum=1e6
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("pit_n_prior").cast("long").alias("n_prior_7d"),
        F.round(F.col("pit_sum_value"), 6).alias("sum_value_7d"),
        F.col("pit_last_gap_s").cast("long").alias("last_gap_s"),
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
    # optimization r16 (guide §2.4): the cross-doc sharing flag is a
    # window over the gram partition — ONE shuffle of the gram table
    # instead of the former groupBy(ng)+join-back (which shuffled the
    # gram table twice and computed the posexplode once per side).
    # size(collect_set(doc_id)) >= 2 is exactly the old
    # count(DISTINCT doc_id) >= 2 predicate; measured 1.7 -> 0.8 s on
    # the sf0.1 flag kernel, identical rows.
    # optimization r15 (guide §5): ``flagged`` feeds both the runs
    # window and the per-doc counts; unpersisted, each reference
    # recomputed the corpus posexplode and the shared-gram flag.
    # Eager localCheckpoint materializes the narrow frame once (its
    # blocks are freed with the reference; the per-doc output is not
    # driver-collectable at scale, so no _local_result here).
    wng = Window.partitionBy("ng")
    flagged = grams.select(
        "doc_id",
        "pos",
        (F.size(F.collect_set("doc_id").over(wng)) >= 2)
        .cast("int")
        .alias("dup"),
    ).localCheckpoint()
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


# ---------------------------------------------------------------------
# 6. SemDeDup: k-means cells + within-cell cosine pruning
# ---------------------------------------------------------------------

_SEMDEDUP_THR = 0.95


def _semdedup_oracle() -> str:
    from .queries import _DIRTY_EMB_SQL
    from .queries_more import _KM_DIST, _KM_K

    return f"""WITH {_DIRTY_EMB_SQL}, e AS (
  SELECT vec_id, embedding AS v FROM dirty
), seeds AS (
  SELECT vec_id AS cid, v FROM e WHERE vec_id < {_KM_K}
), d0 AS (
  SELECT e.vec_id, s.cid, {_KM_DIST.format(e='e.v', c='s.v')} AS d2
  FROM e, seeds s
), a0 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d0) WHERE rn = 1
), c1 AS (
  SELECT a0.cid, t.pos,
         CAST(sum(CAST(round(e.v[t.pos + 1] * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS m
  FROM e JOIN a0 ON e.vec_id = a0.vec_id, range(0, 64) t(pos)
  GROUP BY a0.cid, t.pos
), c1v AS (
  SELECT cid, list(m ORDER BY pos) AS v FROM c1 GROUP BY cid
), d1 AS (
  SELECT e.vec_id, c.cid, {_KM_DIST.format(e='e.v', c='c.v')} AS d2
  FROM e, c1v c
), cells AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d1) WHERE rn = 1
), pruned AS (
  SELECT DISTINCT cb.vec_id
  FROM cells ca JOIN cells cb
    ON ca.cid = cb.cid AND ca.vec_id < cb.vec_id
  JOIN e ea ON ea.vec_id = ca.vec_id
  JOIN e eb ON eb.vec_id = cb.vec_id
  WHERE round(list_sum(list_transform(range(1, 65),
                i -> ea.v[i] * eb.v[i]))
          / (sqrt(list_sum(list_transform(range(1, 65),
                i -> ea.v[i] * ea.v[i])))
           * sqrt(list_sum(list_transform(range(1, 65),
                i -> eb.v[i] * eb.v[i])))), 6) >= {_SEMDEDUP_THR}
)
SELECT CAST(c.cid AS BIGINT) AS cid,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN p.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_pruned,
       round(CAST(sum(CASE WHEN p.vec_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
             / count(*), 6) AS prune_rate
FROM cells c LEFT JOIN pruned p ON p.vec_id = c.vec_id
GROUP BY c.cid"""


@stage(
    "semdedup_prune_embeddings",
    _semdedup_oracle(),
    "SemDeDup (Abbas et al.): embedding-space dedup made tractable by "
    "CLUSTER-THEN-PRUNE — k-means cells from the deterministic "
    "2-iteration replay (kmeans_embeddings_2iter's exact protocol: "
    "seed vectors, quantized-exact mean update, lowest-cid argmin "
    "ties), then within each cell prune every vector that has a "
    "LOWER-ID neighbor at cosine >= 0.95 (keep-min-id, the "
    "dedup_exact convention), reported as per-cell membership and "
    "prune rates over the dirtied view (25 injected perturbed copies "
    "so pruning is non-vacuous). Pairs only ever meet INSIDE a cell — "
    "the quadratic term is bounded by the largest cell, which is the "
    "entire point of SemDeDup at corpus scale (k grows with n so "
    "cells stay bounded); the cell equi-join never degenerates into a "
    "cross join. Scale: 2 corpus scans for the k-means replay, one "
    "cell-keyed self-join for the prune pass.",
)
def semdedup_prune_embeddings(spark, sf_dir):
    from .ext.similarity import argmin_assign_cols, semdedup_pair_cosines
    from .queries import _dirty_embeddings
    from .queries_more import _KM_K

    df = _dirty_embeddings(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    base = df.select("vec_id", F.col("embedding").alias("v"))

    # argmin with lowest-cid ties — the kmeans_embeddings_2iter shape
    # verbatim (array of d2 exprs, array_min + array_position), built
    # as parsed SQL (optimization r16, guide §7.3: the Column-lambda
    # build cost ~0.4 s of py4j round-trips per assignment)
    def assign(cent_pairs):
        cid, _best, _d2s = argmin_assign_cols(cent_pairs)
        return cid

    seed_rows = base.filter(F.col("vec_id") < _KM_K).orderBy("vec_id").collect()
    cents = [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in seed_rows]
    cid0 = assign(cents)
    # NOTE r15: the 64-column wide-aggregate form measured SLOWER than
    # this posexplode form here (see kmeans_embeddings_2iter note —
    # measured negative result; churn is the one site where it won).
    c1_rows = (
        base.withColumn("cid", cid0)
        .select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.round(F.col("x") * F.lit(1e9)).cast("long")).cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    by_cid: dict = {}
    for r in c1_rows:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
    cents1 = [
        (int(cid), [by_cid[cid][p] for p in range(64)]) for cid in sorted(by_cid)
    ]
    cells = base.select(
        "vec_id", "v", assign(cents1).alias("cid")
    ).persist()
    cells.count()  # materialize: reused by both sides of the self-join
    # within-cell pair cosines via the salted exploding-join kernel
    # (optimization r16, guide §2.5/§3.3) — identical pair set and 6dp
    # values, parallelism no longer capped at the k distinct cells
    pruned = (
        semdedup_pair_cosines(cells, len(cents1))
        .filter(F.col("cos") >= F.lit(_SEMDEDUP_THR))
        .select(F.col("ib").alias("vec_id"))
        .distinct()
        .withColumn("__p", F.lit(1))
    )
    return (
        cells.join(pruned, "vec_id", "left")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce(F.col("__p"), F.lit(0))).alias("n_pruned"),
        )
        .select(
            F.col("cid").cast("long").alias("cid"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("n_pruned").cast("long").alias("n_pruned"),
            F.round(
                F.col("n_pruned").cast("double") / F.col("n_members"), 6
            ).alias("prune_rate"),
        )
    )


# ---------------------------------------------------------------------
# 7. Hard-negative mining (contrastive training data)
# ---------------------------------------------------------------------

_HNM_NPROBE = 2
_HNM_K = 5

_HNM_ORACLE = f"""WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cent AS (
  SELECT label, CAST(t.pos AS BIGINT) AS pos,
         CAST(sum(CAST(round(v[t.pos + 1] * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / CAST(count(*) AS DOUBLE) AS c
  FROM e, range(0, 64) t(pos)
  GROUP BY label, t.pos
), qv AS (
  SELECT vec_id AS qid, label AS qlabel, v FROM e WHERE vec_id < 3
), cs AS (
  SELECT qv.qid, cent.label,
         sum(CAST(round(cent.c * qv.v[cent.pos + 1] * 1000000000.0)
                  AS BIGINT)) AS score
  FROM cent JOIN qv ON cent.label <> qv.qlabel
  GROUP BY qv.qid, cent.label
), probe AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, label) AS rk
    FROM cs)
  WHERE rk <= {_HNM_NPROBE}
), cand AS (
  SELECT q.qid, e.vec_id, e.label AS neg_label,
         round(list_sum(list_transform(range(1, 65),
                 i -> q.v[i] * e.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> q.v[i] * q.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65),
                 i -> e.v[i] * e.v[i])))), 6) AS cos_sim
  FROM probe p
  JOIN qv q ON q.qid = p.qid
  JOIN e ON e.label = p.label
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(rk AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id,
       neg_label,
       cos_sim
FROM (
  SELECT qid, vec_id, neg_label, cos_sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_sim DESC, vec_id) AS rk
  FROM cand)
WHERE rk <= {_HNM_K}"""


@stage(
    "hard_negative_mining_embeddings",
    _HNM_ORACLE,
    "contrastive-training data mining: for each probe query "
    "(vec_id < 3), the top-5 HARD NEGATIVES — nearest vectors by "
    "cosine drawn ONLY from the nprobe=2 nearest FOREIGN-label IVF "
    "cells (close in embedding space, guaranteed different label: the "
    "pairs that actually move a contrastive loss). Cell ranking uses "
    "the EXACT-INTEGER quantized dot score (sum of "
    "round(c*q*1e9) int64 terms) against the quantized per-label "
    "centroids, so probe selection is bit-deterministic on both "
    "engines with no float-sum ordering hazard; candidate ranking is "
    "the established 6dp in-order cosine. Scale shape: centroids are "
    "a k-row metadata pull (one wide aggregate per label), probes "
    "resolve driver-side, candidates arrive through a label equi-join "
    "(broadcast probe dim) — never a corpus cross join; this is the "
    "ivf_topk search shape pointed at the training-data problem.",
)
def hard_negative_mining_embeddings(spark, sf_dir):
    from .ext.similarity import dot_col

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    # per-label quantized centroids: ONE wide aggregate, 64 int64 sums
    # + count per label (the pca_top_direction wide-agg shape)
    sum_terms = ", ".join(
        f"sum(cast(round(get(v, {i}) * 1e9) as bigint)) as s{i}"
        for i in range(64)
    )
    cent_rows = (
        emb.groupBy("label")
        .agg(F.expr(f"struct({sum_terms}, count(*) as n)").alias("r"))
        .collect()
    )
    cents = {
        int(r["label"]): [
            float(r["r"][f"s{i}"]) / 1e9 / float(int(r["r"]["n"]))
            for i in range(64)
        ]
        for r in cent_rows
    }
    q_rows = emb.filter(F.col("vec_id") < 3).collect()
    probes = []  # (qid, neg_label, qvec)
    for qr in sorted(q_rows, key=lambda r: int(r["vec_id"])):
        qid, qlabel = int(qr["vec_id"]), int(qr["label"])
        qv = [float(x) for x in qr["v"]]
        scored = []
        for lbl, c in cents.items():
            if lbl == qlabel:
                continue
            # exact-integer quantized dot — replays the oracle's cs CTE
            score = sum(
                int(round(c[i] * qv[i] * 1e9)) for i in range(64)
            )
            scored.append((-score, lbl))
        for _negscore, lbl in sorted(scored)[:_HNM_NPROBE]:
            probes.append((qid, lbl, qv))
    probe_df = spark.createDataFrame(
        probes, "qid long, label long, qv array<double>"
    )
    cos = F.round(
        dot_col(F.col("qv"), F.col("v"))
        / (
            F.sqrt(dot_col(F.col("qv"), F.col("qv")))
            * F.sqrt(dot_col(F.col("v"), F.col("v")))
        ),
        6,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.col("vec_id"))
    return (
        emb.join(F.broadcast(probe_df), "label")
        .select(
            "qid",
            "vec_id",
            F.col("label").alias("neg_label"),
            cos.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _HNM_K)
        .select("qid", "rank", "vec_id", "neg_label", "cos_sim")
    )


# ---------------------------------------------------------------------
# 8. Contrastive anchor/positive pair mining (mid-band Jaccard)
# ---------------------------------------------------------------------

# Deterministic partial-overlap fixture: the natural corpus is bimodal
# (near-dups at ~0.99 Jaccard, background at ~0.03 — measured), so a
# mid-band miner needs injected MIXTURES: for doc_id < 20, a synthetic
# document whose words are the first half of doc i followed by the
# first half of doc i+1 (re-keyed +2000000, source of parent a). Both
# engines build the identical text from the identical raw words —
# the _dirty_documents / _dirty_embeddings convention, partial-overlap
# flavor.
_MIX_CORPUS_SQL = """mixes AS (
  SELECT a.doc_id + 2000000 AS doc_id,
         array_to_string(
           list_slice(string_split(a.text, ' '), 1,
                      CAST(floor((len(string_split(a.text, ' ')) + 1) / 2)
                           AS BIGINT))
           || list_slice(string_split(b.text, ' '), 1,
                         CAST(floor((len(string_split(b.text, ' ')) + 1) / 2)
                              AS BIGINT)),
           ' ') AS text,
         a.source
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id < 20
), corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL SELECT doc_id, text, source FROM mixes
)"""

_CONTRASTIVE_ORACLE = f"""WITH {_MIX_CORPUS_SQL}, toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM corpus
), shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                               i -> array_to_string(list_slice(t, i, i + 2),
                                                    ' '))) AS sh
  FROM toks
), sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shingles GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(count(*) AS BIGINT) AS common
  FROM shingles a JOIN shingles b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), banded AS (
  SELECT p.ia, p.ib, p.common,
         sa.sz + sb.sz - p.common AS un
  FROM pairs p JOIN sizes sa ON p.ia = sa.doc_id
               JOIN sizes sb ON p.ib = sb.doc_id
  WHERE 5 * p.common >= sa.sz + sb.sz - p.common
    AND 10 * p.common < 7 * (sa.sz + sb.sz - p.common)
)
SELECT CAST(bd.ia AS BIGINT) AS anchor,
       CAST(bd.ib AS BIGINT) AS positive,
       round(CAST(bd.common AS DOUBLE) / bd.un, 6) AS jaccard,
       ca.source = cb.source AS same_source
FROM banded bd
JOIN corpus ca ON ca.doc_id = bd.ia
JOIN corpus cb ON cb.doc_id = bd.ib"""


@stage(
    "contrastive_pair_mining_documents",
    _CONTRASTIVE_ORACLE,
    "anchor/positive pair mining for contrastive text training: "
    "document pairs whose word-3gram Jaccard sits in the MID BAND "
    "[0.2, 0.7) — related enough to be positives, distinct enough "
    "that they are not near-duplicates (those the dedup family "
    "removes). Band membership is decided by EXACT-INTEGER compares "
    "(5*common >= union, 10*common < 7*union — the "
    "dedup_threshold_sweep convention: no float boundary can flip an "
    "engine). Runs over the corpus + injected deterministic MIXTURES "
    "(half of doc i + half of doc i+1 for doc_id < 20), because the "
    "natural corpus is bimodal (~0.99 near-dups vs ~0.03 background, "
    "measured) and a mid-band miner must be proven on pairs that "
    "actually exist. Same inverted-index equi-join as the Jaccard "
    "dedup family — documents only meet on shared shingles; at 100 TB "
    "the shingle string swaps for xxhash64 (the _fast convention).",
)
def contrastive_pair_mining_documents(spark, sf_dir):
    from .ext.dedup import _shingle_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    half = F.expr(
        "slice(split(text, ' '), 1, "
        "cast(floor((size(split(text, ' ')) + 1) / 2) as int))"
    )
    a = docs.filter(F.col("doc_id") < 20).select(
        F.col("doc_id"), half.alias("ha"), F.col("source")
    )
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), half.alias("hb")
    )
    mixes = a.join(b, "doc_id").select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.array_join(F.concat(F.col("ha"), F.col("hb")), " ").alias("text"),
        "source",
    )
    corpus = docs.unionByName(mixes)
    sh = _shingle_table(corpus, "text", "doc_id", 3).distinct().persist()
    sh.count()
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    pa, pb = sh.alias("a"), sh.alias("b")
    common = (
        pa.join(
            pb,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .groupBy(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    un = F.col("sz_a") + F.col("sz_b") - F.col("common")
    banded = (
        common.join(
            F.broadcast(
                sizes.select(F.col("__id").alias("ia"), F.col("sz").alias("sz_a"))
            ),
            "ia",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("__id").alias("ib"), F.col("sz").alias("sz_b"))
            ),
            "ib",
        )
        .filter(
            (F.lit(5) * F.col("common") >= un)
            & (F.lit(10) * F.col("common") < F.lit(7) * un)
        )
        .select("ia", "ib", "common", un.alias("un"))
    )
    src = corpus.select("doc_id", "source")
    return (
        banded.join(
            F.broadcast(src.select(F.col("doc_id").alias("ia"),
                                   F.col("source").alias("src_a"))),
            "ia",
        )
        .join(
            F.broadcast(src.select(F.col("doc_id").alias("ib"),
                                   F.col("source").alias("src_b"))),
            "ib",
        )
        .select(
            F.col("ia").cast("long").alias("anchor"),
            F.col("ib").cast("long").alias("positive"),
            F.round(F.col("common").cast("double") / F.col("un"), 6).alias(
                "jaccard"
            ),
            (F.col("src_a") == F.col("src_b")).alias("same_source"),
        )
    )


# ---------------------------------------------------------------------
# 9. Last-click attribution windows
# ---------------------------------------------------------------------

# (es, event_id) packed into ONE BIGINT so the as-of "latest click
# before me" resolves as a window max of a scalar — max over a STRUCT
# is not portable to the oracle's window functions. es ~ 1.7e9 and
# event_id < 1e7 at every tested SF, so es * 1e7 + event_id < 2^63.
_ATTR_ORACLE = """WITH base AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es, ts
  FROM events
), lasts AS (
  SELECT event_id, event_type, es,
         max(CASE WHEN event_type = 'click'
                  THEN es * 10000000 + event_id END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS packed
  FROM base
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       (packed IS NOT NULL AND es - packed // 10000000 <= 3600)
         AS attributed,
       CASE WHEN packed IS NOT NULL AND es - packed // 10000000 <= 3600
            THEN packed % 10000000 END AS click_event_id,
       CASE WHEN packed IS NOT NULL AND es - packed // 10000000 <= 3600
            THEN es - packed // 10000000 END AS gap_s
FROM lasts WHERE event_type = 'purchase'"""


@stage(
    "attribution_windows_events",
    _ATTR_ORACLE,
    "last-click attribution: for every purchase, the user's MOST "
    "RECENT click strictly earlier in (ts, event_id) row order, "
    "attributed iff it happened within the 1-hour window — the "
    "marketing-attribution join every conversion pipeline runs. "
    "Implemented without a self-join: (epoch_s, event_id) packs into "
    "one BIGINT (es*1e7 + id, exact integer order = (es, id) lexical "
    "order), so 'latest qualifying click before me' is a single "
    "running window MAX over the user's ordered stream — the same "
    "union-sort as-of shape as watermark_state_rows, here as pure "
    "integer arithmetic both engines replay exactly. Scale: one "
    "shuffle on user_id, no join, no second scan.",
)
def attribution_windows_events(spark, sf_dir):
    from .ext.warehouse import last_event_attribution

    ev = load_table(spark, sf_dir, "events")
    out = last_event_attribution(
        ev,
        "user_id",
        "ts",
        "event_id",
        F.col("event_type") == "click",
        window_s=3600,
    )
    return out.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("attr_source_id").isNotNull().alias("attributed"),
        F.col("attr_source_id").alias("click_event_id"),
        F.col("attr_gap_s").alias("gap_s"),
    )


# ---------------------------------------------------------------------
# 10. Normalization-ladder duplicate rates
# ---------------------------------------------------------------------

# Deterministic variant view: case-perturbed copies (doc_id < 10,
# re-keyed +3000000) and whitespace-perturbed copies (10 <= doc_id
# < 20, re-keyed +4000000) — the _dirty_documents convention, but the
# copies are NOT byte-identical, so each normalization level catches a
# different stratum: raw text catches nothing, lowercasing catches the
# case copies, whitespace collapsing catches both.
_VARIANT_DOCS_SQL = """variants AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000, upper(text) FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT doc_id + 4000000, replace(text, ' ', '  ')
  FROM documents WHERE doc_id >= 10 AND doc_id < 20
)"""

_NORM_LADDER_ORACLE = f"""WITH {_VARIANT_DOCS_SQL}, keys AS (
  SELECT doc_id, 0 AS level, text AS k FROM variants
  UNION ALL
  SELECT doc_id, 1, lower(text) FROM variants
  UNION ALL
  SELECT doc_id, 2, trim(regexp_replace(lower(text), '[[:space:]]+', ' ', 'g'))
  FROM variants
), groups AS (
  SELECT level, k, CAST(count(*) AS BIGINT) AS cnt
  FROM keys GROUP BY level, k
)
SELECT CAST(level AS BIGINT) AS level,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
         AS n_dup_docs
FROM groups GROUP BY level"""


@stage(
    "normalized_dup_ladder_documents",
    _NORM_LADDER_ORACLE,
    "dedup sensitivity ladder: exact-duplicate group/document counts "
    "at THREE normalization levels in one pass — raw bytes, "
    "lowercased, lowercased + whitespace-collapsed — the measurement "
    "that tells a curation pipeline how much 'exact' dedup is leaving "
    "on the table for want of normalization (case and formatting "
    "variants dominate real crawl dup mass). Runs over a variant view "
    "with injected case-perturbed and whitespace-perturbed copies so "
    "every rung catches a different stratum (0 / 10 / 20 groups by "
    "construction). Spark computes all three levels from ONE scan via "
    "posexplode of the three keys, then a single (level, key) "
    "aggregate — at 100 TB each key is replaced by xxhash64(key) so "
    "the shuffle carries 8-byte digests (the dedup_exact convention).",
)
def normalized_dup_ladder_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = (
        docs.unionByName(
            docs.filter(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.upper(F.col("text")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(
                (F.col("doc_id") >= 10) & (F.col("doc_id") < 20)
            ).select(
                (F.col("doc_id") + 4000000).alias("doc_id"),
                F.regexp_replace(F.col("text"), " ", "  ").alias("text"),
            )
        )
    )
    keys = variants.select(
        F.posexplode(
            F.array(
                F.col("text"),
                F.lower(F.col("text")),
                F.trim(
                    F.regexp_replace(
                        F.lower(F.col("text")), r"\s+", " "
                    )
                ),
            )
        ).alias("level", "k")
    )
    return (
        keys.groupBy("level", "k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("level")
        .agg(
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_groups"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_dup_docs"),
        )
        .select(
            F.col("level").cast("long").alias("level"),
            "n_groups",
            "n_dup_docs",
        )
    )


# ---------------------------------------------------------------------
# 11. k-means assignment margins (clustering-confidence QC)
# ---------------------------------------------------------------------


def _cluster_margin_oracle() -> str:
    from .queries_more import _KM_DIST, _KM_K

    return f"""WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cid, v FROM e WHERE vec_id < {_KM_K}
), d0 AS (
  SELECT e.vec_id, s.cid, {_KM_DIST.format(e='e.v', c='s.v')} AS d2
  FROM e, seeds s
), a0 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d0) WHERE rn = 1
), c1 AS (
  SELECT a0.cid, t.pos,
         CAST(sum(CAST(round(e.v[t.pos + 1] * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS m
  FROM e JOIN a0 ON e.vec_id = a0.vec_id, range(0, 64) t(pos)
  GROUP BY a0.cid, t.pos
), c1v AS (
  SELECT cid, list(m ORDER BY pos) AS v FROM c1 GROUP BY cid
), d1 AS (
  SELECT e.vec_id, c.cid, {_KM_DIST.format(e='e.v', c='c.v')} AS d2
  FROM e, c1v c
), ranked AS (
  SELECT vec_id, cid, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM d1
), m AS (
  SELECT b.vec_id, b.cid,
         (s.d2 - b.d2) / s.d2 AS margin
  FROM ranked b JOIN ranked s
    ON s.vec_id = b.vec_id AND b.rn = 1 AND s.rn = 2
)
SELECT CAST(cid AS BIGINT) AS cid,
       CAST(count(*) AS BIGINT) AS n_members,
       round(CAST(sum(CAST(round(margin * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / count(*), 6) AS mean_margin,
       round(min(margin), 6) AS min_margin
FROM m GROUP BY cid"""


@stage(
    "cluster_margin_embeddings",
    _cluster_margin_oracle(),
    "clustering-confidence QC: per k-means cell, the ASSIGNMENT "
    "MARGIN distribution — (d2_second_best - d2_best) / d2_second_best "
    "for every vector under the deterministic 2-iteration replay "
    "(kmeans_embeddings_2iter's exact protocol). Near-zero margins "
    "mean boundary-straddling vectors: the cells are unstable, IVF "
    "recall will be nprobe-sensitive, and SemDeDup pruning misses "
    "cross-cell near-dups — this is the one number that predicts all "
    "three. Mean margin is a quantized-exact sum (1e6) so the replay "
    "hash-matches; min is order-free. Scale shape: the same "
    "corpus-scan + k-literal-centroid distance array as every k-means "
    "operator; margins add array sorting of k doubles per row, no "
    "extra shuffle.",
)
def cluster_margin_embeddings(spark, sf_dir):
    from .ext.similarity import argmin_assign_cols
    from .queries_more import _KM_K

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    seed_rows = base.filter(F.col("vec_id") < _KM_K).orderBy("vec_id").collect()
    cents = [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in seed_rows]

    # parsed-SQL argmin (optimization r16, guide §7.3 — same tree as
    # the Column-lambda form, ~0.4 s less driver build time)
    def assign_expr(cent_pairs):
        cid, best, d2s = argmin_assign_cols(cent_pairs)
        return d2s, best, cid

    _d2s0, _b0, cid0 = assign_expr(cents)
    # NOTE r15: the 64-column wide-aggregate form measured SLOWER than
    # this posexplode form here (see kmeans_embeddings_2iter note —
    # measured negative result; churn is the one site where it won).
    c1_rows = (
        base.withColumn("cid", cid0)
        .select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.round(F.col("x") * F.lit(1e9)).cast("long")).cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    by_cid: dict = {}
    for r in c1_rows:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
    cents1 = [
        (int(cid), [by_cid[cid][p] for p in range(64)]) for cid in sorted(by_cid)
    ]
    d2s, best, cid1 = assign_expr(cents1)
    srt = F.sort_array(d2s)
    margin = (F.element_at(srt, 2) - F.element_at(srt, 1)) / F.element_at(
        srt, 2
    )
    return (
        base.select(cid1.alias("cid"), margin.alias("margin"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum(F.round(F.col("margin") * F.lit(1e6)).cast("long"))
                .cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)),
                6,
            ).alias("mean_margin"),
            F.round(F.min("margin"), 6).alias("min_margin"),
        )
        .select(
            F.col("cid").cast("long").alias("cid"),
            F.col("n_members").cast("long").alias("n_members"),
            "mean_margin",
            "min_margin",
        )
    )


# ---------------------------------------------------------------------
# 12. Corpus length drift: PSI per source vs the global mix
# ---------------------------------------------------------------------

_LEN_EDGES = [150, 250, 350, 450]
_LEN_B = len(_LEN_EDGES) + 1


def _len_bin_cases(col: str) -> list[str]:
    """One exact-integer CASE per bin (c0..c4)."""
    out = []
    for i in range(_LEN_B):
        if i == 0:
            cond = f"{col} < {_LEN_EDGES[0]}"
        elif i == len(_LEN_EDGES):
            cond = f"{col} >= {_LEN_EDGES[-1]}"
        else:
            cond = f"{col} >= {_LEN_EDGES[i - 1]} AND {col} < {_LEN_EDGES[i]}"
        out.append(cond)
    return out


def _length_psi_oracle() -> str:
    conds = _len_bin_cases("n_chars")
    cells = ", ".join(
        f"CAST(sum(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
        for i, c in enumerate(conds)
    )
    gcells = ", ".join(
        f"CAST(sum(c{i}) AS BIGINT) AS g{i}" for i in range(_LEN_B)
    )
    # explicit in-order term sum: identical IEEE evaluation order on
    # both engines (never a group-sum over ln terms)
    terms = " + ".join(
        f"((CAST(s.c{i} + 1 AS DOUBLE) / (s.n + {_LEN_B})"
        f" - CAST(g.g{i} + 1 AS DOUBLE) / (g.n + {_LEN_B}))"
        f" * ln((CAST(s.c{i} + 1 AS DOUBLE) / (s.n + {_LEN_B}))"
        f" / (CAST(g.g{i} + 1 AS DOUBLE) / (g.n + {_LEN_B}))))"
        for i in range(_LEN_B)
    )
    return f"""WITH src AS (
  SELECT source, {cells}, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY source
), g AS (
  SELECT {gcells}, CAST(sum(n) AS BIGINT) AS n FROM src
)
SELECT s.source, s.n AS n_docs,
       round({terms}, 6) AS length_psi
FROM src s CROSS JOIN g"""


@stage(
    "length_psi_by_source_documents",
    _length_psi_oracle(),
    "corpus-mix drift: PSI of each source's DOCUMENT LENGTH "
    "distribution against the global mix on fixed n_chars bins — the "
    "per-source twin of psi_value_drift_events, answering the "
    "curation question 'which feed changed shape' rather than 'did "
    "the stream change'. Bin counts are dense per-source conditional "
    "sums (never a sparse (source, bin) grid with missing rows), "
    "Laplace-smoothed (c+1)/(n+B); the five (p-q)ln(p/q) terms are "
    "summed in EXPLICIT written order in one expression on both "
    "engines, so no group-sum reordering can move the 6dp result. "
    "Scale shape: one scan into a 20-row per-source aggregate, global "
    "margins via a 1-row broadcast.",
)
def length_psi_by_source_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    conds = _len_bin_cases("n_chars")
    cells = [
        F.sum(F.when(F.expr(c), 1).otherwise(0)).cast("long").alias(f"c{i}")
        for i, c in enumerate(conds)
    ]
    src = docs.groupBy("source").agg(
        *cells, F.count(F.lit(1)).alias("n")
    )
    g = src.agg(
        *[F.sum(f"c{i}").alias(f"g{i}") for i in range(_LEN_B)],
        F.sum("n").alias("gn"),
    )
    psi = None
    for i in range(_LEN_B):
        p = (F.col(f"c{i}") + 1).cast("double") / (F.col("n") + _LEN_B)
        q = (F.col(f"g{i}") + 1).cast("double") / (F.col("gn") + _LEN_B)
        term = (p - q) * F.log(p / q)
        psi = term if psi is None else psi + term
    return src.crossJoin(F.broadcast(g)).select(
        "source",
        F.col("n").alias("n_docs"),
        F.round(psi, 6).alias("length_psi"),
    )


# ---------------------------------------------------------------------
# 13. Markov entropy of the event-type transition structure
# ---------------------------------------------------------------------

_MARKOV_ORACLE = """WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
), trans AS (
  SELECT prev AS from_state, event_type AS to_state,
         CAST(count(*) AS BIGINT) AS nij
  FROM seq WHERE prev IS NOT NULL
  GROUP BY prev, event_type
)
SELECT from_state,
       CAST(sum(nij) AS BIGINT) AS n_trans,
       CAST(count(*) AS BIGINT) AS n_targets,
       round(ln(CAST(sum(nij) AS DOUBLE))
             - sum(CAST(nij AS DOUBLE) * ln(CAST(nij AS DOUBLE)))
               / CAST(sum(nij) AS DOUBLE), 6) AS entropy_nats
FROM trans GROUP BY from_state"""


@stage(
    "markov_entropy_rate_events",
    _MARKOV_ORACLE,
    "behavioral predictability QC: per from-state SHANNON ENTROPY of "
    "the event-type transition distribution (the Markov-chain row "
    "entropies of event_transition_matrix_events) — near-zero rows "
    "mean deterministic flows (bot traffic, instrumentation loops); "
    "rising row entropy across snapshots means the funnel structure "
    "is dissolving. Uses the char_entropy identity "
    "ln(N) - sum(c*ln c)/N over the transition COUNT table (25 cells "
    "max), so the heavy lifting is one lag window + one tiny "
    "aggregate; counts are exact integers and only the final identity "
    "runs in doubles at 6dp. Scale: one shuffle on user_id for the "
    "lag, then a states^2-sized table.",
)
def markov_entropy_rate_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy(
        F.col("prev").alias("from_state"),
        F.col("event_type").alias("to_state"),
    ).agg(F.count(F.lit(1)).alias("nij"))
    n = F.sum("nij").cast("double")
    return trans.groupBy("from_state").agg(
        F.sum("nij").cast("long").alias("n_trans"),
        F.count(F.lit(1)).cast("long").alias("n_targets"),
        F.round(
            F.log(n)
            - F.sum(F.col("nij").cast("double") * F.log(F.col("nij").cast("double")))
            / n,
            6,
        ).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------
# 14. Winsorized scaling stats (clip-bounds export)
# ---------------------------------------------------------------------

_WINSOR_ORACLE = """WITH stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         quantile_cont(CAST(value AS DOUBLE), 0.01) AS p01,
         quantile_cont(CAST(value AS DOUBLE), 0.99) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       any_value(s.n) AS n,
       round(any_value(s.p01), 6) AS p01,
       round(any_value(s.p99), 6) AS p99,
       round(CAST(sum(CAST(round(
               CASE WHEN CAST(e.value AS DOUBLE) < s.p01 THEN s.p01
                    WHEN CAST(e.value AS DOUBLE) > s.p99 THEN s.p99
                    ELSE CAST(e.value AS DOUBLE) END * 1000000.0)
             AS BIGINT)) AS DOUBLE) / 1000000.0 / any_value(s.n), 6)
         AS winsorized_mean,
       CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) < s.p01
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) > s.p99
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
FROM events e JOIN stats s ON s.event_type = e.event_type
GROUP BY e.event_type"""


@stage(
    "winsorized_stats_events",
    _WINSOR_ORACLE,
    "feature preprocessing export: per event_type the p01/p99 CLIP "
    "BOUNDS and the winsorized mean — what a serving pipeline applies "
    "when outliers must be bounded but rows must not be dropped "
    "(complement of robust_scaling_stats_events' fences, which count "
    "rather than clamp). Quantiles exact interpolated; each clamped "
    "value is the same IEEE double on both engines, so the "
    "quantized-exact (1e6) mean hash-matches; clip counts are strict "
    "compares against the unrounded bounds. Scale: one grouped "
    "quantile pass, bounds broadcast back onto the scan.",
)
def winsorized_stats_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    pcts = F.percentile(F.col("v"), F.array(F.lit(0.01), F.lit(0.99)))
    stats = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), pcts.alias("p"))
        .select(
            "event_type", "n",
            F.col("p")[0].alias("p01"), F.col("p")[1].alias("p99"),
        )
    )
    clamped = (
        F.when(F.col("v") < F.col("p01"), F.col("p01"))
        .when(F.col("v") > F.col("p99"), F.col("p99"))
        .otherwise(F.col("v"))
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.round(F.first("p01"), 6).alias("p01"),
            F.round(F.first("p99"), 6).alias("p99"),
            F.round(
                F.sum(F.round(clamped * F.lit(1e6)).cast("long")).cast("double")
                / F.lit(1e6)
                / F.first("n"),
                6,
            ).alias("winsorized_mean"),
            F.sum((F.col("v") < F.col("p01")).cast("long")).alias(
                "n_clipped_low"
            ),
            F.sum((F.col("v") > F.col("p99")).cast("long")).alias(
                "n_clipped_high"
            ),
        )
    )


# ---------------------------------------------------------------------
# 15. Split-assignment churn between hash salts
# ---------------------------------------------------------------------

_HEX_POS_R9 = "strpos('0123456789abcdef', {c}) - 1"


def _bucket_sql_r9(h: str) -> str:
    return (
        f"(({_HEX_POS_R9.format(c=f'substr({h}, 1, 1)')}) * 16 + "
        f"({_HEX_POS_R9.format(c=f'substr({h}, 2, 1)')}))"
    )


def _split_case_sql(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < 205 THEN 'train' "
        f"WHEN {bucket} < 230 THEN 'val' ELSE 'test' END"
    )


_SPLIT_CHURN_ORACLE = f"""WITH hashed AS (
  SELECT md5(CAST(doc_id AS VARCHAR)) AS ha,
         md5(CAST(doc_id AS VARCHAR) || ':2') AS hb
  FROM documents
), assigned AS (
  SELECT {_split_case_sql(_bucket_sql_r9('ha'))} AS split_from,
         {_split_case_sql(_bucket_sql_r9('hb'))} AS split_to
  FROM hashed
)
SELECT split_from, split_to,
       CAST(count(*) AS BIGINT) AS n_docs
FROM assigned GROUP BY split_from, split_to"""


@stage(
    "split_churn_documents",
    _SPLIT_CHURN_ORACLE,
    "split reproducibility audit: the full from x to transition table "
    "between the production hash-split (md5(doc_id), the "
    "split_assign_documents convention) and a RE-SALTED assignment "
    "(md5(doc_id || ':2')) — off-diagonal mass is exactly the set of "
    "documents whose split membership a salt change would churn "
    "(train->test leakage in any system that caches model state "
    "across the change). Deterministic md5 bucketing on both engines; "
    "one scan, one 9-cell aggregate. The operational rule this "
    "quantifies: NEVER change the salt mid-project — expected "
    "off-diagonal is ~2 * p_train*p_val*... of the corpus, i.e. most "
    "of it.",
)
def split_churn_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")

    def bucket(h):
        return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")

    def split(b):
        return (
            F.when(b < 205, "train").when(b < 230, "val").otherwise("test")
        )

    ha = F.md5(F.col("doc_id").cast("string").cast("binary"))
    hb = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":2")).cast("binary")
    )
    return (
        docs.select(
            split(bucket(ha)).alias("split_from"),
            split(bucket(hb)).alias("split_to"),
        )
        .groupBy("split_from", "split_to")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------
# 16. Label x split independence audit (embeddings)
# ---------------------------------------------------------------------

_LABEL_SPLIT_ORACLE = f"""WITH assigned AS (
  SELECT CAST(label AS BIGINT) AS label,
         {_split_case_sql(_bucket_sql_r9("md5(CAST(vec_id AS VARCHAR))"))}
           AS split
  FROM embeddings
), cells AS (
  SELECT label, split, CAST(count(*) AS BIGINT) AS n
  FROM assigned GROUP BY label, split
), margins AS (
  SELECT c.label, c.split, c.n,
         sum(c.n) OVER (PARTITION BY c.label) AS row_tot,
         sum(c.n) OVER (PARTITION BY c.split) AS col_tot,
         sum(c.n) OVER () AS tot
  FROM cells c
)
SELECT label, split, n,
       round(CAST(row_tot AS DOUBLE) * col_tot / tot, 6) AS expected,
       round((n - CAST(row_tot AS DOUBLE) * col_tot / tot)
             * (n - CAST(row_tot AS DOUBLE) * col_tot / tot)
             / (CAST(row_tot AS DOUBLE) * col_tot / tot), 6)
         AS chi2_contrib
FROM margins"""


@stage(
    "label_split_balance_embeddings",
    _LABEL_SPLIT_ORACLE,
    "supervised-split audit: label x split contingency for the hash "
    "split over embeddings, with per-cell expected counts and "
    "chi-square contributions — the CLASS-balance independence check "
    "(does any label concentrate in val/test?) that "
    "split_balance_chi_square_documents runs for sources; a skewed "
    "cell here means eval metrics measure the split, not the model. "
    "Counts are exact integers, expected/chi2 are single-expression "
    "rational arithmetic rounded at 6dp. Scale: one scan, a "
    "labels x 3 cell table, window margins over it.",
)
def label_split_balance_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 2),
        16, 10,
    ).cast("int")
    split = F.when(b < 205, "train").when(b < 230, "val").otherwise("test")
    cells = (
        emb.select(F.col("label").cast("long").alias("label"),
                   split.alias("split"))
        .groupBy("label", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.partitionBy("label")
    wc = Window.partitionBy("split")
    wt = Window.partitionBy()
    exp = (
        F.sum("n").over(wr).cast("double")
        * F.sum("n").over(wc)
        / F.sum("n").over(wt)
    )
    return cells.select(
        "label",
        "split",
        F.col("n").cast("long").alias("n"),
        F.round(exp, 6).alias("expected"),
        F.round((F.col("n") - exp) * (F.col("n") - exp) / exp, 6).alias(
            "chi2_contrib"
        ),
    )


# ---------------------------------------------------------------------
# 17. Recency-decay-weighted activity score
# ---------------------------------------------------------------------

_DECAY_ORACLE = """WITH anchor AS (
  SELECT max(date_trunc('day', ts)) AS d0 FROM events
), scored AS (
  SELECT e.user_id,
         CAST(round(CAST(e.value AS DOUBLE)
                    / CAST((CAST(1 AS BIGINT) << least(
                        CAST(datediff('day', date_trunc('day', e.ts), a.d0)
                             AS BIGINT), 62)) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS qterm
  FROM events e CROSS JOIN anchor a
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(qterm) AS DOUBLE) / 1000000.0, 6) AS decay_score
FROM scored GROUP BY user_id"""


@stage(
    "decay_weighted_activity_events",
    _DECAY_ORACLE,
    "recency-weighted user activity: sum of value * 2^(-days_ago) "
    "per user, anchored at the stream's last day — the exponential-"
    "decay engagement feature ranking models use (yesterday counts "
    "double vs the day before). Half-life-of-one-day weights are "
    "NEGATIVE POWERS OF TWO, so each weighted term is an EXACT "
    "mantissa shift of the value (1 / (1 << d), never pow()) — "
    "bit-identical on both engines — and the quantized 1e6 sum is "
    "order-free. days_ago is clamped at 62 to keep the shift in "
    "int64 range (weight underflows to ~2^-62, far below the 1e-6 "
    "quantum, so the clamp is value-invisible). Scale: the anchor is "
    "a 1-row broadcast onto one scan, then a per-user aggregate.",
)
def decay_weighted_activity_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.date_trunc("day", F.col("ts"))).alias("d0"))
    d = F.least(
        F.datediff(F.col("d0"), F.date_trunc("day", F.col("ts"))).cast("long"),
        F.lit(62),
    )
    # weight = 1 / (1 << d): the SQL shiftleft takes a column exponent
    # (the PySpark wrapper only takes a literal)
    qterm = F.expr(
        "cast(round(cast(value as double)"
        " / cast(shiftleft(cast(1 as bigint), cast(__d as int)) as double)"
        " * 1000000.0) as bigint)"
    )
    return (
        ev.crossJoin(F.broadcast(anchor))
        .withColumn("__d", d)
        .select("user_id", qterm.alias("qterm"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum("qterm").cast("double") / F.lit(1e6), 6
            ).alias("decay_score"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("n_events").cast("long").alias("n_events"),
            "decay_score",
        )
    )


# ---------------------------------------------------------------------
# 18. Hourly concentration (Herfindahl index) per event type
# ---------------------------------------------------------------------

_HHI_ORACLE = """WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, h
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(CAST(sum(n * n) AS DOUBLE)
             / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) AS DOUBLE)), 6)
         AS hourly_hhi
FROM hourly GROUP BY event_type"""


@stage(
    "hourly_hhi_events",
    _HHI_ORACLE,
    "load-concentration QC: the HERFINDAHL INDEX of each event type's "
    "hourly volume — sum of squared hourly shares, 1/n_hours for a "
    "perfectly flat load, 1.0 for a single burst hour. The capacity-"
    "planning twin of gini_user_activity (which measures USER "
    "concentration): a type whose HHI spikes is batching or botting, "
    "and its partitions will skew at the same ratio. Computed as "
    "exact-integer sum(n^2) / sum(n)^2 with ONE final double "
    "division — no float accumulation at all. Scale: one "
    "(type, hour)-grouped scan, then a calendar-sized rollup.",
)
def hourly_hhi_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("n_events"),
        F.round(
            F.sum(F.col("n") * F.col("n")).cast("double")
            / (F.sum("n").cast("double") * F.sum("n").cast("double")),
            6,
        ).alias("hourly_hhi"),
    )


# ---------------------------------------------------------------------
# 19. Session abandonment stages (30-min gap rule)
# ---------------------------------------------------------------------

_ABANDON_ORACLE = """WITH gaps AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN epoch(ts)
                   - epoch(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id))
                   > 1800
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM gaps
), stages AS (
  SELECT user_id, sess_id,
         CASE WHEN max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
              THEN 'purchase'
              WHEN max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
              THEN 'click'
              WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
              THEN 'view'
              ELSE 'other' END AS stage
  FROM sess GROUP BY user_id, sess_id
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM stages)
SELECT s.stage, CAST(count(*) AS BIGINT) AS n_sessions,
       round(CAST(count(*) AS DOUBLE) / any_value(t.n), 6) AS share
FROM stages s CROSS JOIN tot t GROUP BY s.stage"""


@stage(
    "session_abandonment_events",
    _ABANDON_ORACLE,
    "funnel abandonment at SESSION grain: each 30-min-gap session "
    "classified by the FURTHEST funnel stage it reached "
    "(purchase > click > view > other) and the share of sessions "
    "ending at each — funnel_events answers 'did the user ever "
    "convert', this answers 'which stage do individual visits die "
    "at', the number a checkout change actually moves. Reuses the "
    "sessionization lag/running-sum shape (deterministic "
    "(ts, event_id) ordering); stage election is three exact max "
    "flags per session. Scale: one shuffle on user_id, then "
    "session-count-sized aggregates and a 1-row total broadcast.",
)
def session_abandonment_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp(F.col("ts"))
    new_sess = F.when(
        F.lag(F.col("ts")).over(w).isNull()
        | ((ep - F.lag(ep).over(w)) > 1800),
        1,
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id", "event_type", "ts", "event_id",
        new_sess.alias("new_sess"),
    ).withColumn("sess_id", F.sum("new_sess").over(wcum))
    flag = lambda t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    stages = sess.groupBy("user_id", "sess_id").agg(
        flag("purchase").alias("fp"),
        flag("click").alias("fc"),
        flag("view").alias("fv"),
    ).select(
        F.when(F.col("fp") == 1, "purchase")
        .when(F.col("fc") == 1, "click")
        .when(F.col("fv") == 1, "view")
        .otherwise("other")
        .alias("stage")
    )
    tot = stages.agg(F.count(F.lit(1)).alias("tn"))
    return (
        stages.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "stage",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.round(
                F.col("n_sessions").cast("double") / F.col("tn"), 6
            ).alias("share"),
        )
    )


# ---------------------------------------------------------------------
# 20. RFM customer segmentation (orders)
# ---------------------------------------------------------------------

_RFM_ORACLE = """WITH cust AS (
  SELECT o_custkey,
         CAST(datediff('day', max(o_orderdate),
              (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS recency_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0)
                       AS BIGINT)) AS DOUBLE) / 100.0 AS monetary
  FROM orders GROUP BY o_custkey
), bounds AS (
  SELECT quantile_cont(CAST(recency_d AS DOUBLE), 0.5) AS r50,
         quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f50,
         quantile_cont(monetary, 0.5) AS m50
  FROM cust
), coded AS (
  SELECT (CASE WHEN CAST(c.recency_d AS DOUBLE) <= b.r50
               THEN 2 ELSE 1 END) * 100
         + (CASE WHEN CAST(c.frequency AS DOUBLE) > b.f50
                 THEN 2 ELSE 1 END) * 10
         + (CASE WHEN c.monetary > b.m50 THEN 2 ELSE 1 END) AS rfm_code,
         c.monetary
  FROM cust c CROSS JOIN bounds b
)
SELECT CAST(rfm_code AS BIGINT) AS rfm_code,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(CAST(round(monetary * 100.0) AS BIGINT)) AS DOUBLE)
             / 100.0, 6) AS total_monetary
FROM coded GROUP BY rfm_code"""


@stage(
    "rfm_segments_customers",
    _RFM_ORACLE,
    "RFM customer segmentation over orders: per-customer RECENCY "
    "(days since last order vs the dataset horizon), FREQUENCY "
    "(order count) and MONETARY (cent-quantized revenue), each split "
    "at its exact interpolated median into a high/low digit — eight "
    "segments from 111 (cold, rare, small) to 222 (the "
    "keep-them-happy quadrant), with customer counts and segment "
    "revenue. Median splits rather than quintiles keep every "
    "boundary a single documented compare (recency ties at <= so the "
    "fresher side is 'high'). Scale: one orders scan into a "
    "per-customer aggregate, 1-row bounds broadcast, 8-row rollup.",
)
def rfm_segments_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    horizon = orders.agg(F.max("o_orderdate").alias("hz"))
    cust = (
        orders.crossJoin(F.broadcast(horizon))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("hz"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_d"),
            F.count(F.lit(1)).alias("frequency"),
            (
                F.sum(
                    F.round(F.col("o_totalprice").cast("double") * 100).cast(
                        "long"
                    )
                ).cast("double")
                / F.lit(100.0)
            ).alias("monetary"),
        )
    )
    bounds = cust.agg(
        F.percentile(F.col("recency_d").cast("double"), F.lit(0.5)).alias("r50"),
        F.percentile(F.col("frequency").cast("double"), F.lit(0.5)).alias("f50"),
        F.percentile(F.col("monetary"), F.lit(0.5)).alias("m50"),
    )
    code = (
        F.when(F.col("recency_d").cast("double") <= F.col("r50"), 2)
        .otherwise(1)
        * 100
        + F.when(F.col("frequency").cast("double") > F.col("f50"), 2)
        .otherwise(1)
        * 10
        + F.when(F.col("monetary") > F.col("m50"), 2).otherwise(1)
    )
    return (
        cust.crossJoin(F.broadcast(bounds))
        .select(code.alias("rfm_code"), "monetary")
        .groupBy("rfm_code")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.round(F.col("monetary") * 100).cast("long")).cast(
                    "double"
                )
                / F.lit(100.0),
                6,
            ).alias("total_monetary"),
        )
        .select(
            F.col("rfm_code").cast("long").alias("rfm_code"),
            F.col("n_customers").cast("long").alias("n_customers"),
            "total_monetary",
        )
    )


# ---------------------------------------------------------------------
# Round-9 promotion hook (second pass; see queries_more's re-entrancy
# note): this module bootstraps the catalog chain BEFORE defining
# STAGED_R9, so importing THIS module first runs the whole
# registration chain while STAGED_R9 is still empty. Re-invoking the
# skip-if-registered promotion here — after all twenty entries exist —
# makes the catalog complete under either import order (the
# queries_staging_r8 pattern, verbatim).
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r9 as _promote  # noqa: E402

_promote()
del _promote
