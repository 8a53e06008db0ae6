"""ROUND-7 STAGED catalog queries — built and oracle-verified in round
6, NOT registered (the round-6 catalog froze at 186 when the driver
window rotated; registering now would create an unchecked tail — the
r1-r3 lesson, same protocol as queries_staging_r5/r6 in earlier
rounds). Round 7 promotes them by registering from queries_more.py and
fronting them in ``_DRIVER_WINDOW``.

The entries extend round-6 library surfaces one step further:

- ``duplicate_ngram_rate_documents`` — fraction of 4-gram/8-gram
  occurrences that are corpus-level repeats (the memorization /
  boilerplate metric pretraining curation tracks per shard).
- ``zipf_slope_documents`` — least-squares slope of ln(freq) vs
  ln(rank) over the top word ranks (corpus-health: natural text sits
  near -1; OCR garbage and templated spam bend the curve).
- ``oov_rate_by_source_documents`` — per-source out-of-vocabulary
  token rate against a min-count vocabulary cut (the operational face
  of the 100 TB vocab-cut guidance in interp_logprob's docstring).
- ``embedding_norm_outliers`` — vector-norm mean/std and 2-sigma
  outlier count (embedding-space health; collapsed or exploded norms
  are the first symptom of a bad encoder export).
- ``session_gap_sensitivity_events`` — session counts at THREE gap
  thresholds in one pass (the parameter sweep an analyst runs before
  freezing sessionization's gap).
- ``cusum_drift_events`` — CUSUM changepoint statistic over the daily
  event-volume series (drift detection with memory, complementing the
  memoryless chi-square/KS checks).
- ``drop_rate_by_delay_events`` — late-data drop rate as a function
  of watermark delay (1h/4h/24h) over the dirtied arrival stream —
  the tuning curve for choosing a delay budget.
- ``minhash_band_stability_documents`` — candidate-pair overlap
  between two INDEPENDENT MinHash families (banding stability: low
  Jaccard between the two candidate sets means the banding is noise-
  dominated, not similarity-dominated).
- ``multimodal_aspect_hist`` — aspect-ratio histogram from parsed
  payload headers (layout QC for an image corpus without decoding).
- ``funnel_time_to_convert_events`` — per-user view->purchase
  conversion latency quantiles (the funnel's time dimension).
- ``opq_reconstruction_error_embeddings`` — PQ reconstruction MSE
  with vs without the OPQ-lite rotation at equal code size (the
  quantization-error face of pq_opq_recall_embeddings).
- ``ivf_pq_recall_embeddings`` — recall@10 of the COMBINED IVF + PQ
  pipeline (coarse cell probe, then ADC within probed cells) vs exact
  search: the full billion-vector serving path, quality-checked
  end-to-end.
- ``kn_discount_logprob_documents`` — interpolated Kneser-Ney bigram
  LM (absolute discounting + continuation probability), completing
  the smoothing ladder add-1 -> Jelinek-Mercer -> KN.
- ``burstiness_events`` — per-user inter-arrival burstiness
  (sigma-mu)/(sigma+mu): the bot/cron-traffic signal volume checks
  cannot see.
- ``minhash_calibration_documents`` — signature-agreement estimate vs
  exact Jaccard per agreement level (the table that justifies the
  verification-free estimate path).
- ``lsh_degree_hist_documents`` — candidate-graph degree distribution
  (boilerplate hubs surface here before clustering runs).
- ``rolling_active_users_events`` — exact 7-day sliding-window
  distinct users (dedup to user-days first, then a bounded explode).
- ``gini_user_activity_events`` — Gini coefficient of per-user event
  counts (the engagement-concentration number behind salting calls).
- ``label_margin_confusion_embeddings`` — silhouette-lite centroid
  margin rolled into a label confusion matrix.
- ``source_shingle_containment_documents`` — cross-source shingle-set
  containment matrix (mirror/syndication detection at source level).

tests/test_staging_r7.py runs these through the SAME compare harness
as the live catalog (exact column order, canonical dtypes, sorted
values) at the suite's SF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from .data import load_table, local_result

STAGED_R7: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R7[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    """Oracle SQL for a staged query (uniform accessor; all round-7
    oracles are eager strings — the round-6 promotion backfills taught
    us to avoid empty dataclass fields)."""
    return STAGED_R7[name].oracle


# ---------------------------------------------------------------------
# 1. Duplicate n-gram rate (memorization / boilerplate metric)
# ---------------------------------------------------------------------

_TOKS_CTE = """toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
)"""


def _grams_sql(n: int) -> str:
    if n == 1:
        return "SELECT 1 AS n, unnest(t) AS g FROM toks"
    return (
        f"SELECT {n} AS n, unnest(list_transform("
        f"range(1, greatest(len(t) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice(t, i, i + {n - 1}), ' '))) AS g "
        f"FROM toks WHERE len(t) >= {n}"
    )


@stage(
    "duplicate_ngram_rate_documents",
    f"""WITH {_TOKS_CTE}, allg AS (
  {_grams_sql(4)}
  UNION ALL
  {_grams_sql(8)}
), counts AS (
  SELECT n, g, count(*) AS c FROM allg GROUP BY n, g
)
SELECT CAST(n AS INTEGER) AS n,
       CAST(sum(c) AS BIGINT) AS total_ngrams,
       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_ngrams,
       round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
             / sum(c), 6) AS dup_rate
FROM counts GROUP BY n""",
    "curation metric: DUPLICATE N-GRAM RATE — the fraction of 4-gram "
    "and 8-gram OCCURRENCES whose gram appears more than once in the "
    "corpus (the memorization/boilerplate statistic tracked per shard "
    "in pretraining pipelines; rising 8-gram dup rate means template "
    "text or crawl echoes surviving dedup). One tokenize+explode pass "
    "per n, a count aggregate on the gram, then a metadata-sized "
    "rollup — the ngram_diversity shape with a duplication rollup. "
    "Exact BIGINT occurrence counts; the single rate division rounds "
    "at 6dp. At 100 TB the gram count table shuffles hashed grams "
    "once; no join, no window, map-side combine does the heavy "
    "lifting.",
)
def duplicate_ngram_rate_documents(spark, sf_dir):
    from .ext.text import tokens_col

    toks = load_table(spark, sf_dir, "documents").select(
        tokens_col(F.lower(F.col("text"))).alias("t")
    )

    def grams(n):
        g = F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, n)),
            )
        )
        return toks.filter(F.size("t") >= n).select(
            F.lit(n).alias("n"), g.alias("g")
        )

    counts = (
        grams(4)
        .unionByName(grams(8))
        .groupBy("n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dup = F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
    return counts.groupBy("n").agg(
        F.sum("c").alias("total_ngrams"),
        dup.alias("dup_ngrams"),
        F.round(dup.cast("double") / F.sum("c"), 6).alias("dup_rate"),
    ).select(
        F.col("n").cast("int").alias("n"),
        "total_ngrams",
        "dup_ngrams",
        "dup_rate",
    )


# ---------------------------------------------------------------------
# 2. Zipf slope (corpus-health statistic)
# ---------------------------------------------------------------------

_ZIPF_TOP = 100


@stage(
    "zipf_slope_documents",
    f"""WITH {_TOKS_CTE}, freq AS (
  SELECT g AS w, count(*) AS c
  FROM (SELECT unnest(t) AS g FROM toks) GROUP BY g
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk
  FROM freq
), pts AS (
  SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
  FROM ranked WHERE rk <= {_ZIPF_TOP}
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sx,
         CAST(sum(CAST(round(y * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sy,
         CAST(sum(CAST(round(x * y * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sxy,
         CAST(sum(CAST(round(x * x * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_ranks,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS zipf_intercept
FROM s""",
    "corpus health: ZIPF SLOPE — least-squares slope of ln(freq) vs "
    f"ln(rank) over the top {_ZIPF_TOP} word ranks (freq-desc, "
    "word-lexicographic tie-break, so the rank assignment is engine- "
    "portable). Natural language sits near -1; OCR garbage, templated "
    "spam and synthetic filler bend the slope, making this a one-row "
    "per-shard drift signal. Determinism: per-point ln values are "
    "IEEE-identical on both engines (same rank/count inputs), and the "
    "four regression sums are int64-quantized at 1e9 before the "
    "closed-form slope, so aggregation order cannot flip a bit "
    "(the kmeans/PQ convention applied to regression). Scale shape: "
    "one word-count shuffle, a top-rank window over a 100-row slice, "
    "one scalar output row.",
)
def zipf_slope_documents(spark, sf_dir):
    from .ext.text import tokens_col

    words = load_table(spark, sf_dir, "documents").select(
        F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    rk = F.row_number().over(Window.orderBy(F.desc("c"), F.col("w")))
    pts = (
        freq.withColumn("rk", rk)
        .filter(F.col("rk") <= _ZIPF_TOP)
        .select(
            F.log(F.col("rk").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )

    def qsum(col):
        return (
            F.sum(F.round(col * F.lit(1e9)).cast("long")).cast("double")
            / F.lit(1e9)
        )

    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        qsum(F.col("x")).alias("sx"),
        qsum(F.col("y")).alias("sy"),
        qsum(F.col("x") * F.col("y")).alias("sxy"),
        qsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "zipf_intercept"
        ),
    )


# ---------------------------------------------------------------------
# 3. OOV rate by source (min-count vocabulary cut, operationalized)
# ---------------------------------------------------------------------

_OOV_MIN_COUNT = 5


@stage(
    "oov_rate_by_source_documents",
    f"""WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), words AS (
  SELECT source, unnest(t) AS w FROM toks
), vocab AS (
  SELECT w, count(*) AS c FROM words GROUP BY w
)
SELECT words.source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE vocab.c < {_OOV_MIN_COUNT}) AS BIGINT)
         AS n_oov,
       round(CAST(count(*) FILTER (WHERE vocab.c < {_OOV_MIN_COUNT})
                  AS DOUBLE) / count(*), 6) AS oov_rate
FROM words JOIN vocab USING (w)
GROUP BY words.source""",
    "data-mix QC: per-source OUT-OF-VOCABULARY rate against a "
    f"min-count-{_OOV_MIN_COUNT} corpus vocabulary — the operational "
    "face of the vocab-cut guidance documented on interp_logprob "
    "(at 100 TB the LM count tables are cut at a min count; this "
    "query says WHICH ingestion source pays that cut, i.e. which "
    "source is mojibake/OCR-garbage heavy). Token-key equi-join of "
    "the word stream onto its own count table (both sides shuffle "
    "once on the word hash), exact BIGINT counts, one 6dp rate per "
    "source.",
)
def oov_rate_by_source_documents(spark, sf_dir):
    from .ext.text import tokens_col

    # optimization r15 (guide §5): the token frame feeds the vocab
    # count and the final join — eager localCheckpoint tokenizes once.
    words = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    ).localCheckpoint()
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    oov = F.sum(
        (F.col("c") < _OOV_MIN_COUNT).cast("long")
    )
    return (
        words.join(vocab, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            oov.alias("n_oov"),
            F.round(oov.cast("double") / F.count(F.lit(1)), 6).alias(
                "oov_rate"
            ),
        )
    )


# ---------------------------------------------------------------------
# 4. Embedding norm outliers (encoder-export health)
# ---------------------------------------------------------------------


@stage(
    "embedding_norm_outliers",
    """WITH e AS (
  SELECT vec_id,
         sqrt(list_sum(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
  FROM embeddings
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(nm * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
           / count(*) AS mean_nm,
         CAST(sum(CAST(round(nm * nm * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
           / count(*) AS mean_nm2
  FROM e
)
SELECT s.n AS n_vectors,
       round(s.mean_nm, 6) AS mean_norm,
       round(sqrt(greatest(0.0, s.mean_nm2 - s.mean_nm * s.mean_nm)), 6)
         AS std_norm,
       CAST((SELECT count(*) FROM e, s
             WHERE abs(e.nm - s.mean_nm)
                   > 2 * sqrt(greatest(0.0,
                                       s.mean_nm2 - s.mean_nm * s.mean_nm))
                     + 1e-9)
            AS BIGINT) AS n_outliers_2sigma
FROM s""",
    "embedding QC: VECTOR-NORM distribution — mean, std and 2-sigma "
    "(+1e-9 absolute tolerance, so an exactly-normalized corpus with "
    "std 0 reports ZERO outliers instead of flagging float dust) "
    "outlier count of the L2 norms (quantized-exact first and second "
    "moments, so both engines compute the identical mean/std before "
    "the outlier comparison). Collapsed norms (std ~ 0) or heavy "
    "outlier mass are the first symptom of a bad encoder export or a "
    "normalization bug upstream of every ANN operator in this "
    "catalog. Scale shape: one narrow map pass for the norms, one "
    "fused scalar aggregate, one broadcast-scalar recheck pass for "
    "the outlier count — no shuffle wider than a single row.",
)
def embedding_norm_outliers(spark, sf_dir):
    from .ext.similarity import dot_col

    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the corpus scan/aggregate runs once.
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.sqrt(dot_col(F.col("embedding"), F.col("embedding"))).alias("nm"),
    ).localCheckpoint()

    def qmean(col):
        return (
            F.sum(F.round(col * F.lit(1e9)).cast("long")).cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1))
        )

    s = e.agg(
        F.count(F.lit(1)).alias("n"),
        qmean(F.col("nm")).alias("mean_nm"),
        qmean(F.col("nm") * F.col("nm")).alias("mean_nm2"),
    )
    # quantized moments of a near-constant norm series can land an
    # epsilon-negative variance — clamp (both sides clamp identically)
    std = F.sqrt(
        F.greatest(
            F.lit(0.0),
            F.col("mean_nm2") - F.col("mean_nm") * F.col("mean_nm"),
        )
    )
    flagged = (
        e.crossJoin(F.broadcast(s))
        .filter(
            F.abs(F.col("nm") - F.col("mean_nm")) > 2 * std + F.lit(1e-9)
        )
        .agg(F.count(F.lit(1)).alias("n_outliers_2sigma"))
    )
    return (
        s.crossJoin(F.broadcast(flagged))
        .select(
            F.col("n").alias("n_vectors"),
            F.round(F.col("mean_nm"), 6).alias("mean_norm"),
            F.round(std, 6).alias("std_norm"),
            "n_outliers_2sigma",
        )
    )


# ---------------------------------------------------------------------
# 5. Session-gap sensitivity sweep
# ---------------------------------------------------------------------

_GAPS_S = [900, 1800, 3600]


@stage(
    "session_gap_sensitivity_events",
    f"""WITH o AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), per AS (
  SELECT g.gap_s,
         CAST(count(DISTINCT o.user_id) AS BIGINT) AS n_users,
         CAST(count(*) FILTER (WHERE o.gap IS NULL OR o.gap > g.gap_s)
              AS BIGINT) AS n_sessions
  FROM o, (SELECT unnest([{", ".join(str(g) for g in _GAPS_S)}]) AS gap_s) g
  GROUP BY g.gap_s
)
SELECT CAST(gap_s AS BIGINT) AS gap_s, n_users, n_sessions,
       round(CAST(n_sessions AS DOUBLE) / n_users, 6) AS sessions_per_user
FROM per""",
    "sessionization tuning: SESSION COUNT at three inactivity-gap "
    f"thresholds ({', '.join(str(g) for g in _GAPS_S)}s) in ONE pass — "
    "the sweep an analyst runs before freezing the gap parameter "
    "(session counts are highly gap-sensitive near the inter-arrival "
    "median; far from it the curve flattens). A session starts where "
    "the per-user gap to the previous event exceeds the threshold "
    "(first event = NULL gap = always a start), so n_sessions = "
    "count of starts. One per-user window pass computes the gaps; the "
    "three thresholds then share it via a 3-row explode — parameter "
    "sweeps at 100 TB must reuse the expensive shuffle, not rerun it. "
    "Ties broken by event_id; gaps on floor-seconds (the "
    "sessionization_events convention).",
)
def session_gap_sensitivity_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp(F.col("ts"))
    gaps = ev.select(
        "user_id",
        (ep - F.lag(ep).over(w)).alias("gap"),
    )
    swept = gaps.select(
        "user_id",
        "gap",
        F.explode(F.array(*[F.lit(g) for g in _GAPS_S])).alias("gap_s"),
    )
    return (
        swept.groupBy("gap_s")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.sum(
                (F.col("gap").isNull() | (F.col("gap") > F.col("gap_s")))
                .cast("long")
            ).alias("n_sessions"),
        )
        .select(
            F.col("gap_s").cast("long").alias("gap_s"),
            "n_users",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double") / F.col("n_users"), 6
            ).alias("sessions_per_user"),
        )
    )


# ---------------------------------------------------------------------
# 6. CUSUM changepoint statistic over daily volumes
# ---------------------------------------------------------------------


@stage(
    "cusum_drift_events",
    """WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY strftime(ts, '%Y-%m-%d')
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS t
  FROM daily
), cs AS (
  SELECT day,
         sum(cnt * tot.n - tot.t) OVER (ORDER BY day) AS s
  FROM daily, tot
), cu AS (
  SELECT day,
         s - least(CAST(0 AS HUGEINT), min(s) OVER (ORDER BY day)) AS cpos,
         greatest(CAST(0 AS HUGEINT), max(s) OVER (ORDER BY day)) - s AS cneg
  FROM cs
)
SELECT (SELECT n FROM tot) AS n_days,
       round(CAST(max(cpos) AS DOUBLE) / (SELECT n FROM tot), 6)
         AS max_cusum_pos,
       round(CAST(max(cneg) AS DOUBLE) / (SELECT n FROM tot), 6)
         AS max_cusum_neg,
       (SELECT day FROM cu ORDER BY cpos DESC, day LIMIT 1) AS peak_day
FROM cu""",
    "drift detection WITH MEMORY: CUSUM changepoint statistic over "
    "the daily event-volume series — running cumulative deviation "
    "from the mean, reset at its own running minimum (the classic "
    "Page CUSUM, computed exactly as S_t - min(S_0..S_t) so no "
    "recursion is needed: one cumulative sum + one running min). "
    "Complements the MEMORYLESS chi-square/KS drift checks: a slow "
    "1%/day volume leak never trips a per-window test but integrates "
    "into a CUSUM peak. Determinism: deviations are scaled by n "
    "(cnt*n - total) so the whole series stays in EXACT integers "
    "until the final /n at round-6; peak day tie-breaks "
    "lexicographically. Scale shape: the daily rollup is the only "
    "data-sized aggregate; the CUSUM window runs over #days rows "
    "(metadata-sized).",
)
def cusum_drift_events(spark, sf_dir):
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the corpus scan/aggregate runs once.
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cnt").alias("t")
    )
    w = Window.orderBy("day")
    cs = (
        daily.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n",
            F.sum(F.col("cnt") * F.col("n") - F.col("t")).over(w).alias("s"),
        )
    )
    cu = cs.select(
        "day",
        "n",
        (
            F.col("s")
            - F.least(F.lit(0).cast("long"), F.min("s").over(w))
        ).alias("cpos"),
        (
            F.greatest(F.lit(0).cast("long"), F.max("s").over(w))
            - F.col("s")
        ).alias("cneg"),
    )
    # keyless (scalar) aggregate build so the totals-attachment BNLJ is
    # provably <= 1 broadcast row (planaudit's scalar_bnlj exemption);
    # peak day = min day among rows at the max (exact tie-break) — an
    # orderBy().limit(1) branch would be a TakeOrdered build the linter
    # cannot prove scalar
    stats = cu.agg(
        F.max("cpos").alias("mp"),
        F.max("cneg").alias("mn"),
        F.max("n").alias("nn"),
    )
    return (
        cu.crossJoin(F.broadcast(stats))
        .filter(F.col("cpos") == F.col("mp"))
        .agg(
            F.max("nn").alias("n_days"),
            F.round(
                F.max("mp").cast("double") / F.max("nn"), 6
            ).alias("max_cusum_pos"),
            F.round(
                F.max("mn").cast("double") / F.max("nn"), 6
            ).alias("max_cusum_neg"),
            F.min("day").alias("peak_day"),
        )
    )


# ---------------------------------------------------------------------
# 7. Late-data drop rate as a function of watermark delay
# ---------------------------------------------------------------------

_DELAYS_S = [3600, 14400, 86400]


@stage(
    "drop_rate_by_delay_events",
    f"""WITH arr AS (
  SELECT CAST(floor(epoch(CASE WHEN event_id % 7 = 0
                               THEN ts - INTERVAL 96 HOUR
                               ELSE ts END)) AS BIGINT) AS es,
         CAST(event_id // 100 AS BIGINT) AS batch
  FROM events
), bm AS (
  SELECT batch, max(es) AS mx FROM arr GROUP BY batch
), wm AS (
  SELECT batch,
         max(mx) OVER (ORDER BY batch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           AS wm_raw
  FROM bm
), flags AS (
  SELECT d.delay_s,
         CASE WHEN w.wm_raw IS NULL
              OR (a.es // 3600) * 3600 + 3600 > w.wm_raw - d.delay_s
              THEN 1 ELSE 0 END AS ok
  FROM arr a JOIN wm w USING (batch)
  CROSS JOIN (SELECT unnest([{", ".join(str(d) for d in _DELAYS_S)}])
              AS delay_s) d
)
SELECT CAST(delay_s AS BIGINT) AS delay_s,
       CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(sum(ok) AS BIGINT) AS n_accepted,
       round(1.0 - CAST(sum(ok) AS DOUBLE) / count(*), 6) AS drop_rate
FROM flags GROUP BY delay_s""",
    "watermark tuning: LATE-DATA DROP RATE as a function of the delay "
    f"budget ({', '.join(str(d) for d in _DELAYS_S)}s) over the "
    "dirtied arrival stream (every 7th event 96h late, batches of 100 "
    "— the late_data_windows_events fixture). For each candidate "
    "delay the lag-2 late-events watermark rule (pinned against real "
    "streams in tests/test_streaming.py, tumbling AND sliding) is "
    "replayed against 1h tumbling windows; the output is the tuning "
    "curve an operator reads to pick the smallest delay with an "
    "acceptable loss — state size grows linearly with delay, so this "
    "is a cost/completeness trade. One pass builds the per-batch "
    "watermark table (broadcast, #batches rows); the 3-delay sweep "
    "shares the single arrivals scan via a 3-row cross join — never "
    "three scans. All integer arithmetic (floor-seconds, integer "
    "window ends) except the final 6dp rate.",
)
def drop_rate_by_delay_events(spark, sf_dir):
    arr = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.unix_timestamp(
                F.when(
                    F.col("event_id") % 7 == 0,
                    F.col("ts") - F.expr("INTERVAL 96 HOURS"),
                ).otherwise(F.col("ts"))
            ).alias("es"),
        )
        .withColumn("batch", F.floor(F.col("event_id") / 100).cast("long"))
    )
    bm = arr.groupBy("batch").agg(F.max("es").alias("mx"))
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -2)
    wm = bm.select("batch", F.max("mx").over(w).alias("wm_raw"))
    wend = (F.floor(F.col("es") / 3600) * 3600 + 3600).cast("long")
    flags = (
        arr.join(F.broadcast(wm), "batch")
        .select(
            wend.alias("wend"),
            "wm_raw",
            F.explode(
                F.array(*[F.lit(d).cast("long") for d in _DELAYS_S])
            ).alias("delay_s"),
        )
        .select(
            "delay_s",
            (
                F.col("wm_raw").isNull()
                | (F.col("wend") > F.col("wm_raw") - F.col("delay_s"))
            )
            .cast("int")
            .alias("ok"),
        )
    )
    return flags.groupBy("delay_s").agg(
        F.count(F.lit(1)).alias("n_arrived"),
        F.sum("ok").alias("n_accepted"),
        F.round(
            F.lit(1.0) - F.sum("ok").cast("double") / F.count(F.lit(1)), 6
        ).alias("drop_rate"),
    )


# ---------------------------------------------------------------------
# 8. Funnel time-to-convert (latency histogram, scale-safe)
# ---------------------------------------------------------------------

_LAT_EDGES = [60, 600, 3600, 86400]  # 1m, 10m, 1h, 1d


@stage(
    "funnel_time_to_convert_events",
    f"""WITH v AS (
  SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS v_es
  FROM events WHERE event_type = 'view' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS p_es
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= v.v_es
  GROUP BY e.user_id
), lat AS (
  SELECT p.user_id, p.p_es - v.v_es AS lat_s FROM p JOIN v USING (user_id)
), b AS (
  SELECT CASE WHEN lat_s < {_LAT_EDGES[0]} THEN 'lt_1m'
              WHEN lat_s < {_LAT_EDGES[1]} THEN 'lt_10m'
              WHEN lat_s < {_LAT_EDGES[2]} THEN 'lt_1h'
              WHEN lat_s < {_LAT_EDGES[3]} THEN 'lt_1d'
              ELSE 'ge_1d' END AS bucket,
         lat_s
  FROM lat
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(min(lat_s) AS BIGINT) AS min_s,
       CAST(max(lat_s) AS BIGINT) AS max_s,
       round(CAST(sum(lat_s) AS DOUBLE) / count(*), 6) AS mean_s
FROM b GROUP BY bucket""",
    "funnel analytics, the TIME dimension: per converting user, the "
    "latency from FIRST view to the first purchase at-or-after it "
    "(floor-seconds, the sessionization convention), rolled into "
    "fixed latency buckets (1m/10m/1h/1d) with exact min/max and a "
    "mean per bucket. funnel_events counts WHO converts; this says "
    "HOW FAST — the pair of numbers a growth analyst actually reads "
    "together. Deliberately a HISTOGRAM, not exact quantiles: exact "
    "latency quantiles need a global sort of all converters (the "
    "quantiles_lineitem parity-probe shape); fixed buckets are one "
    "groupBy — the scale-safe production form, with min/max/mean "
    "preserving the tails inside each bucket. Integer seconds "
    "throughout; the one division rounds 6dp.",
)
def funnel_time_to_convert_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(es).alias("v_es"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", es.alias("p_es"))
        .join(v, "user_id")
        .filter(F.col("p_es") >= F.col("v_es"))
        .groupBy("user_id")
        .agg(F.min("p_es").alias("p_es"), F.min("v_es").alias("v_es"))
    )
    lat = p.select((F.col("p_es") - F.col("v_es")).alias("lat_s"))
    bucket = (
        F.when(F.col("lat_s") < _LAT_EDGES[0], F.lit("lt_1m"))
        .when(F.col("lat_s") < _LAT_EDGES[1], F.lit("lt_10m"))
        .when(F.col("lat_s") < _LAT_EDGES[2], F.lit("lt_1h"))
        .when(F.col("lat_s") < _LAT_EDGES[3], F.lit("lt_1d"))
        .otherwise(F.lit("ge_1d"))
    )
    return (
        lat.select(bucket.alias("bucket"), "lat_s")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("lat_s").alias("min_s"),
            F.max("lat_s").alias("max_s"),
            F.round(
                F.sum("lat_s").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_s"),
        )
    )


# ---------------------------------------------------------------------
# 9. MinHash banding stability (two independent hash families)
# ---------------------------------------------------------------------


def _band_stability_oracle() -> str:
    from .queries import (
        _MINHASH_PAIRS_SELECT,
        _SHINGLE_CTE,
        _minhash_band_selects,
        _minhash_hash_aggs,
    )

    chain = _SHINGLE_CTE.strip()[len("WITH "):]
    pairs_b = _MINHASH_PAIRS_SELECT.replace(
        "FROM bands a JOIN bands b", "FROM bands2 a JOIN bands2 b"
    )
    assert "bands2 a JOIN bands2 b" in pairs_b  # both sides swapped
    return f"""WITH {chain}, sigs AS (
  SELECT doc_id,
         {_minhash_hash_aggs()}
  FROM shingles GROUP BY doc_id
), sigs2 AS (
  SELECT doc_id,
         {_minhash_hash_aggs(seed_offset=8)}
  FROM shingles GROUP BY doc_id
), bands AS (
{_minhash_band_selects()}
), bands2 AS (
{_minhash_band_selects(sigs_rel="sigs2")}
), pa AS (
{_MINHASH_PAIRS_SELECT}
), pb AS (
{pairs_b}
)
SELECT CAST((SELECT count(*) FROM pa) AS BIGINT) AS n_pairs_a,
       CAST((SELECT count(*) FROM pb) AS BIGINT) AS n_pairs_b,
       CAST((SELECT count(*) FROM pa JOIN pb USING (doc_a, doc_b))
            AS BIGINT) AS n_common,
       round(CAST((SELECT count(*) FROM pa JOIN pb USING (doc_a, doc_b))
                  AS DOUBLE)
             / ((SELECT count(*) FROM pa) + (SELECT count(*) FROM pb)
                - (SELECT count(*) FROM pa JOIN pb USING (doc_a, doc_b))),
             6) AS candidate_jaccard
FROM (SELECT 1)"""


@stage(
    "minhash_band_stability_documents",
    _band_stability_oracle(),
    "dedup tuning: BANDING STABILITY — run the SAME MinHash-LSH "
    "pipeline twice with two INDEPENDENT hash families (seeds 0-7 vs "
    "8-15; ext/dedup.minhash_signatures' seed_offset) and measure the "
    "Jaccard overlap of the two candidate-pair sets. High overlap "
    "means candidates are similarity-driven (real near-dups surface "
    "under any family); low overlap means the banding operates in its "
    "noise regime (s-curve too flat at the corpus's similarity "
    "profile) and bands/rows need retuning BEFORE trusting recall "
    "numbers from any single family. The oracle reuses the one "
    "hash-agg and band-key SQL definition with a shifted seed range, "
    "so the two families cannot drift. Scale shape: two signature "
    "aggregates over ONE shared shingle table, two bucket self-joins "
    "(each the standard LSH equi-join), a pair-key join for the "
    "intersection — all hash-partitioned, nothing quadratic.",
)
def minhash_band_stability_documents(spark, sf_dir):
    from .ext.dedup import lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    pa = lsh_candidate_pairs(docs)
    pb = lsh_candidate_pairs(docs, seed_offset=8)
    na = pa.agg(F.count(F.lit(1)).alias("n_pairs_a"))
    nb = pb.agg(F.count(F.lit(1)).alias("n_pairs_b"))
    nc = pa.join(pb, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_pairs_a",
            "n_pairs_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("n_pairs_a")
                    + F.col("n_pairs_b")
                    - F.col("n_common")
                ),
                6,
            ).alias("candidate_jaccard"),
        )
    )


# ---------------------------------------------------------------------
# 10. Multimodal aspect-ratio histogram (header-parse composition)
# ---------------------------------------------------------------------


@stage(
    "multimodal_aspect_hist",
    """WITH img AS (
  SELECT CASE CAST(doc_id % 3 AS INTEGER)
              WHEN 0 THEN 'png' ELSE 'jpeg' END AS format,
         CAST(16 + doc_id % 512 AS BIGINT) AS w,
         CAST(16 + (doc_id * 7) % 512 AS BIGINT) AS h
  FROM documents WHERE doc_id % 3 < 2
), r AS (
  SELECT format, (w * 10000) // h AS ratio_bp FROM img
), b AS (
  SELECT format,
         CASE WHEN ratio_bp < 9000 THEN 'portrait'
              WHEN ratio_bp <= 11111 THEN 'square'
              ELSE 'landscape' END AS aspect_class,
         ratio_bp
  FROM r
)
SELECT format, aspect_class,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(min(ratio_bp) AS BIGINT) AS min_ratio_bp,
       CAST(max(ratio_bp) AS BIGINT) AS max_ratio_bp
FROM b GROUP BY format, aspect_class""",
    "multimodal QC: ASPECT-RATIO histogram of an image corpus WITHOUT "
    "decoding a single pixel — payloads are synthesized as byte-valid "
    "PNG/JPEG containers (the multimodal_header_meta generator), "
    "parse_media_headers reads width/height back FROM THE BYTES, and "
    "the ratio (integer basis points, w*10000//h) rolls into "
    "portrait/square/landscape classes per format. This is the "
    "layout-QC prefilter a vision-data pipeline runs before paying "
    "for decode (extreme ratios are banners/scrollbars/scan strips — "
    "drop candidates). The oracle replays the generator arithmetic, "
    "so a parser bit-offset bug breaks the match exactly as in "
    "multimodal_header_meta. Scale shape: Arrow-batched header parse "
    "(bounded bytes per row), integer ratio math, one small groupBy.",
)
def multimodal_aspect_hist(spark, sf_dir):
    from typing import Iterator as _It

    import pandas as _pd

    from .ext import multimodal as X_mm

    df = load_table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 3 < 2
    )

    def synth(batches: "_It[_pd.DataFrame]"):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                kind = ("png", "jpeg", "wav")[i % 3]
                payloads.append(
                    X_mm.synthesize_payload(
                        kind, width=16 + i % 512, height=16 + (i * 7) % 512
                    )
                )
                ids.append(i)
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                }
            )

    payloads = df.mapInPandas(synth, "doc_id long, payload binary")
    meta = X_mm.parse_media_headers(payloads, "doc_id")
    ratio = F.floor(
        F.col("width").cast("long") * 10000 / F.col("height")
    ).cast("long")
    b = meta.select(
        "format",
        ratio.alias("ratio_bp"),
    ).select(
        "format",
        F.when(F.col("ratio_bp") < 9000, F.lit("portrait"))
        .when(F.col("ratio_bp") <= 11111, F.lit("square"))
        .otherwise(F.lit("landscape"))
        .alias("aspect_class"),
        "ratio_bp",
    )
    return b.groupBy("format", "aspect_class").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.min("ratio_bp").alias("min_ratio_bp"),
        F.max("ratio_bp").alias("max_ratio_bp"),
    )


# ---------------------------------------------------------------------
# 11. OPQ reconstruction error (the quantization-error face of the
#     round-6 rotation)
# ---------------------------------------------------------------------


def _opq_recon_oracle() -> str:
    from .queries_r6 import _ROTATION_REPLAY_CTES, _pq_train_ctes6

    # total reconstruction error per pipeline: the assigned 9dp argmin
    # distance summed quantized-exact over every (vector, subspace)
    def recon(p: str) -> str:
        d2 = (
            "round(list_sum(list_transform(range(1, 9), "
            f"j -> ({p}sv.v[j] - {p}cb1.c[j]) * ({p}sv.v[j] - {p}cb1.c[j]))), 9)"
        )
        return f""", {p}assigned AS (
  SELECT d2 FROM (
    SELECT {d2} AS d2,
           row_number() OVER (
             PARTITION BY {p}sv.vec_id, {p}sv.sub
             ORDER BY {d2}, {p}cb1.code) AS rn
    FROM {p}sv JOIN {p}cb1 ON {p}cb1.sub = {p}sv.sub)
  WHERE rn = 1
), {p}tot AS (
  SELECT CAST(sum(CAST(round(d2 * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS t,
         CAST(count(*) AS BIGINT) AS n
  FROM {p}assigned
)"""

    return (
        """WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings
)"""
        + _ROTATION_REPLAY_CTES
        + _pq_train_ctes6("e", "p")
        + _pq_train_ctes6("xr", "r")
        + recon("p")
        + recon("r")
        + """
SELECT CAST(ptot.n / 8 AS BIGINT) AS n_vectors,
       round(ptot.t / (ptot.n / 8), 6) AS mse_pq,
       round(rtot.t / (rtot.n / 8), 6) AS mse_opq,
       round((ptot.t - rtot.t) / ptot.t * 100, 6) AS improvement_pct
FROM ptot, rtot"""
    )


@stage(
    "opq_reconstruction_error_embeddings",
    _opq_recon_oracle(),
    "similarity QC: PQ RECONSTRUCTION MSE with vs without the OPQ-lite "
    "rotation at EQUAL code size — the quantization-error face of "
    "pq_opq_recall_embeddings (recall@k is the retrieval outcome; MSE "
    "is the cause, and it moves monotonically with the variance the "
    "rotation packs into quantizable subspaces, so it is the SHARPER "
    "regression signal for the transform). Same deterministic replay "
    "stack: the shared rotation CTEs (power iterations, Householder "
    "pair, variance-snake permutation) feed the same 1-iteration PQ "
    "train; each assigned 9dp argmin distance is summed "
    "quantized-exact, so both engines produce identical totals before "
    "the two 6dp divisions. Scale shape: train/encode are the PQ "
    "operators' own shapes twice over; the error rollup is one scalar "
    "aggregate per pipeline.",
)
def opq_reconstruction_error_embeddings(spark, sf_dir):
    from .ext.similarity import (
        _pq_subvecs,
        _sq_dist_round9_sql,
        opq_fit_apply,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")

    def recon_total(df, cbs, vec_col):
        sv = _pq_subvecs(df, vec_col, "vec_id", m=8, sub_dim=8)
        d2_parts = []
        for s, cb in enumerate(cbs):
            arr = (
                "array("
                + ", ".join(_sq_dist_round9_sql("svec", c) for c in cb)
                + ")"
            )
            d2_parts.append(f"WHEN sub = {s} THEN array_min({arr})")
        d2_expr = F.expr("CASE " + " ".join(d2_parts) + " END")
        return sv.select(d2_expr.alias("d2")).agg(
            (
                F.sum(F.round(F.col("d2") * F.lit(1e9)).cast("long"))
                .cast("double")
                / F.lit(1e9)
            ).alias("t"),
            F.count(F.lit(1)).alias("n"),
        )

    # optimization r16 (guide §2.6, overlap independent jobs): the
    # plain-PQ train shares nothing with the OPQ chain until the final
    # join; running it on a driver thread hides its two collect jobs
    # behind the OPQ fit's longer job sequence. Deterministic either
    # way — each chain depends only on its own inputs.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        plain_fut = pool.submit(
            pq_train, emb, dim=64, m=8, k_sub=4, iters=1
        )
        # fused fit+apply: rotated table from the fit's own cached stages
        # (persisted eagerly; callers clearCache — see pq_opq_recall)
        rot, xr = opq_fit_apply(emb, dim=64, m=8)
        rcbs = pq_train(xr, dim=64, m=8, k_sub=4, iters=1, vec_col="vec")
        cbs = plain_fut.result()
    ptot = recon_total(emb, cbs, "embedding")
    rtot = recon_total(xr, rcbs, "vec").select(
        F.col("t").alias("rt"), F.col("n").alias("rn")
    )
    return ptot.crossJoin(F.broadcast(rtot)).select(
        (F.col("n") / 8).cast("long").alias("n_vectors"),
        F.round(F.col("t") / (F.col("n") / 8), 6).alias("mse_pq"),
        F.round(F.col("rt") / (F.col("rn") / 8), 6).alias("mse_opq"),
        F.round(
            (F.col("t") - F.col("rt")) / F.col("t") * 100, 6
        ).alias("improvement_pct"),
    )


# ---------------------------------------------------------------------
# 12. IVF + PQ combined recall (the full serving pipeline, end to end)
# ---------------------------------------------------------------------

_IVFPQ_NPROBE = 2


def _ivfpq_oracle() -> str:
    from .queries_r6 import _adc_topk_ctes, _pq_train_ctes6

    return (
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings
), cent AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(t.pos AS BIGINT) AS pos,
         CAST(sum(CAST(round(CAST(embedding[t.pos + 1] AS DOUBLE) * 1e9)
                       AS BIGINT)) AS DOUBLE) / 1e9
           / CAST(count(*) AS DOUBLE) AS c
  FROM embeddings, range(0, 64) t(pos)
  GROUP BY label, t.pos
), qv AS (
  SELECT vec_id AS qid, x AS v FROM e WHERE vec_id < 3
), cs AS (
  SELECT qv.qid, cent.label,
         round(sum(cent.c * qv.v[cent.pos + 1])
               / (sqrt(sum(cent.c * cent.c))
                  * sqrt(sum(qv.v[cent.pos + 1] * qv.v[cent.pos + 1]))),
               6) AS cell_cos
  FROM cent, qv GROUP BY qv.qid, cent.label
), probe AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cell_cos DESC, label) AS rk
    FROM cs)
  WHERE rk <= {_IVFPQ_NPROBE}
)"""
        + _pq_train_ctes6("e", "p")
        + _adc_topk_ctes("p", "qv").replace(
            f""", padck AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adc_d2, vec_id) AS rn
    FROM padcd)
  WHERE rn <= 10
)""",
            f""", pcand AS (
  SELECT a.qid, a.vec_id, a.adc_d2
  FROM padcd a
  JOIN e ON e.vec_id = a.vec_id
  JOIN probe ON probe.qid = a.qid AND probe.label = e.label
), padck AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adc_d2, vec_id) AS rn
    FROM pcand)
  WHERE rn <= 10
)""",
        )
        + """, ex AS (
  SELECT qv.qid, e.vec_id,
         round(list_sum(list_transform(range(1, 65),
           j -> (e.x[j] - qv.v[j]) * (e.x[j] - qv.v[j]))), 9) AS d2
  FROM e, qv WHERE e.vec_id <> qv.qid
), exk AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
    FROM ex)
  WHERE rn <= 10
), ncand AS (
  SELECT probe.qid, CAST(count(*) AS BIGINT) AS n_candidates
  FROM probe JOIN e ON e.label = probe.label
  WHERE e.vec_id <> probe.qid
  GROUP BY probe.qid
)
SELECT CAST(exk.qid AS BIGINT) AS query_id,
       max(ncand.n_candidates) AS n_candidates,
       round(CAST(count(padck.vec_id) AS DOUBLE) / 10, 6) AS recall_at_10
FROM exk
JOIN ncand ON ncand.qid = exk.qid
LEFT JOIN padck ON padck.qid = exk.qid AND padck.vec_id = exk.vec_id
GROUP BY exk.qid"""
    )


@stage(
    "ivf_pq_recall_embeddings",
    _ivfpq_oracle(),
    "similarity QC: the FULL SERVING PIPELINE quality-checked end to "
    f"end — IVF coarse probe (top-{_IVFPQ_NPROBE} cells by round-6 "
    "centroid cosine, label tie-break; cells = per-label quantized-"
    "mean centroids, the save_ivfpq_index layout) restricts the "
    "candidate set, then PQ ADC distances rank ONLY the probed "
    "cells' codes, and the top-10 is scored against the exact "
    "squared-L2 top-10 over the whole corpus. This is the number a "
    "billion-vector deployment actually serves at (ivf_recall and "
    "pq_recall each isolate ONE approximation; real recall loss "
    "compounds), reported per query with the probed candidate count "
    "— the cost side of the same trade. Composes the proven cent / "
    "PQ-train / ADC / exact CTE stacks; every ranking is 9dp-or-"
    "round-6 with id tie-breaks. Scale shape: probing reads "
    f"~{_IVFPQ_NPROBE}/n_cells of a cell-partitioned corpus, ADC is "
    "a lookup-table scan over codes, and the exact pass is the "
    "sampled-query recall harness, never production.",
)
def ivf_pq_recall_embeddings(spark, sf_dir):
    import math

    from .ext.similarity import (
        _adc_col,
        _sq_dist_round9_sql,
        pq_encode,
        pq_train,
    )
    from .queries import _ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    embd = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    cents = _ivf_centroids(spark, sf_dir)
    cbs = pq_train(emb, dim=64, m=8, k_sub=4, iters=1)
    codes = pq_encode(emb, cbs).join(
        embd.select("vec_id", "label"), "vec_id"
    )

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a))
            * math.sqrt(sum(x * x for x in b))
        )

    qrows = sorted(
        embd.filter(F.col("vec_id") < 3).collect(), key=lambda r: r["vec_id"]
    )
    adc_parts, ex_structs, cand_parts = [], [], []
    for r in qrows:
        qid = int(r["vec_id"])
        q = [float(x) for x in r["emb"]]
        ranked = sorted(
            cents, key=lambda lbl: (-round(cos_py(cents[lbl], q), 6), lbl)
        )
        probe = [int(c) for c in ranked[:_IVFPQ_NPROBE]]
        cand = codes.filter(
            F.col("label").isin(probe) & (F.col("vec_id") != qid)
        )
        adc_parts.append(
            cand.select(
                F.lit(qid).cast("long").alias("query_id"),
                "vec_id",
                _adc_col(cbs, q).alias("d"),
            )
        )
        cand_parts.append(
            cand.agg(
                F.lit(qid).cast("long").alias("query_id"),
                F.count(F.lit(1)).alias("n_candidates"),
            )
        )
        ex_structs.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.expr(_sq_dist_round9_sql("emb", q)).alias("d"),
            )
        )
    from functools import reduce

    w = Window.partitionBy("query_id").orderBy("d", "vec_id")
    adck = (
        reduce(lambda a, b: a.unionByName(b), adc_parts)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id", F.lit(1).alias("hit"))
    )
    ncand = reduce(lambda a, b: a.unionByName(b), cand_parts)
    exk = (
        embd.select(
            "vec_id", F.explode(F.array(*ex_structs)).alias("s")
        )
        .select(
            "vec_id",
            F.col("s.query_id").alias("query_id"),
            F.col("s.d").alias("d"),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "vec_id")
    )
    return (
        exk.join(adck, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.lit(10),
                6,
            ).alias("recall_at_10")
        )
        .join(F.broadcast(ncand), "query_id")
        .select("query_id", "n_candidates", "recall_at_10")
    )


# ---------------------------------------------------------------------
# 13. Interpolated Kneser-Ney bigram LM (absolute discounting +
#     continuation probability — the smoothing family step past JM)
# ---------------------------------------------------------------------

_KN_D = 0.75


@stage(
    "kn_discount_logprob_documents",
    f"""WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         unnest(list_slice(t, 2, len(t))) AS w2
  FROM toks WHERE len(t) >= 2
), c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt2 FROM bg GROUP BY w1, w2
), ctx AS (
  SELECT w1, CAST(sum(cnt2) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS n1f
  FROM c2 GROUP BY w1
), bwd AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM c2 GROUP BY w2
), tt AS (
  SELECT CAST(count(*) AS BIGINT) AS bt FROM c2
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(ln((CAST(c2.cnt2 AS DOUBLE) - {_KN_D}) / ctx.c1
                    + {_KN_D} * ctx.n1f / ctx.c1
                      * (CAST(bwd.n1b AS DOUBLE) / tt.bt)))
             / count(*), 6) AS avg_logprob
FROM bg
JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
JOIN ctx ON ctx.w1 = bg.w1
JOIN bwd ON bwd.w2 = bg.w2
CROSS JOIN tt
GROUP BY bg.doc_id""",
    "training-data op: interpolated KNESER-NEY bigram LM score "
    f"(absolute discount D={_KN_D}) — each doc's mean "
    "ln(max(c(w1,w2)-D,0)/c(w1.) + D*N1+(w1,.)/c(w1.) * "
    "P_cont(w2)), where the CONTINUATION probability P_cont(w2) = "
    "N1+(.,w2)/|bigram types| counts how many distinct contexts a "
    "word follows rather than how often it occurs — the insight that "
    "makes KN the default n-gram smoother ('Francisco' is frequent "
    "but only ever follows 'San', so its continuation mass is tiny). "
    "Completes the smoothing ladder add-1 -> Jelinek-Mercer -> KN "
    "(bigram_logprob / interp_logprob / this). Self-trained, so every "
    "scored bigram has c2 >= 1 > D and the max() never binds — the "
    "discounted term stays strictly positive. Scale shape: identical "
    "to interp_logprob — count tables equi-joined back onto the "
    "bigram stream on token keys, a 1-row type-count broadcast, one "
    "groupBy per doc; all counts exact BIGINT (context totals from "
    "the bigram table itself, so c1 = sum of its group's cnt2 by "
    "construction), one 6dp-rounded mean of ln terms per doc.",
)
def kn_discount_logprob_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.lower(F.col("text"))).alias("t")
    )
    bg = (
        docs.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    # optimization r15 (guide §5): c2 feeds the forward/backward
    # continuation tables, the bigram total AND the final join — each
    # reference re-ran the corpus bigram explode (5 passes). Eager
    # localCheckpoints compute bg and c2 once.
    bg = bg.localCheckpoint()
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt2"))
        .localCheckpoint()
    )
    ctx = c2.groupBy("w1").agg(
        F.sum("cnt2").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    bwd = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    tt = c2.agg(F.count(F.lit(1)).alias("bt"))
    p = (
        (F.col("cnt2").cast("double") - F.lit(_KN_D)) / F.col("c1")
        + F.lit(_KN_D)
        * F.col("n1f")
        / F.col("c1")
        * (F.col("n1b").cast("double") / F.col("bt"))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(ctx, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(tt))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(F.log(p)) / F.count(F.lit(1)), 6).alias(
                "avg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------
# 14. Per-user burstiness (temporal-pattern QC over inter-arrivals)
# ---------------------------------------------------------------------

_BURSTY_MIN_EVENTS = 5


@stage(
    "burstiness_events",
    f"""WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
), per AS (
  SELECT user_id,
         CAST(count(gap) AS BIGINT) AS n,
         CAST(sum(gap) AS BIGINT) AS sg,
         CAST(sum(gap * gap) AS BIGINT) AS sg2
  FROM g GROUP BY user_id
  HAVING count(gap) >= {_BURSTY_MIN_EVENTS}
), b AS (
  SELECT (sqrt(greatest(0.0,
            CAST(sg2 AS DOUBLE) / n
            - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n)))
          - CAST(sg AS DOUBLE) / n)
         / (sqrt(greatest(0.0,
              CAST(sg2 AS DOUBLE) / n
              - (CAST(sg AS DOUBLE) / n) * (CAST(sg AS DOUBLE) / n)))
            + CAST(sg AS DOUBLE) / n) AS bsc
  FROM per WHERE sg > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(sum(CAST(round(bsc * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 / count(*), 6) AS mean_burstiness,
       CAST(count(*) FILTER (WHERE bsc > 0.2) AS BIGINT) AS n_bursty,
       CAST(count(*) FILTER (WHERE bsc < -0.2) AS BIGINT) AS n_regular
FROM b""",
    "temporal-pattern QC: per-user BURSTINESS of inter-arrival gaps — "
    "B = (sigma - mu)/(sigma + mu) in [-1, 1]: +1 = maximally bursty "
    "(bot bursts, scraping), 0 = Poisson, negative = pacemaker-"
    "regular (cron/heartbeat traffic wearing a user id). The "
    "aggregate counts how much of the user base sits in each regime "
    f"(|B| > 0.2 cutoffs, >= {_BURSTY_MIN_EVENTS} gaps per user) — "
    "an abuse/automation signal the per-day volume checks cannot "
    "see. Determinism: gaps are floor-second INTEGERS (the "
    "sessionization convention), so each user's moment sums are "
    "exact BIGINTs and both engines derive bit-identical mu/sigma "
    "before the clamped sqrt; the corpus mean quantizes per-user "
    "scores at 1e9 (the established convention for sums of doubles). "
    "Scale shape: one per-user window pass for gaps, one per-user "
    "aggregate, one scalar rollup — no joins, no driver state.",
)
def burstiness_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp(F.col("ts"))
    g = ev.select("user_id", (ep - F.lag(ep).over(w)).alias("gap"))
    per = (
        g.groupBy("user_id")
        .agg(
            F.count("gap").alias("n"),
            F.sum("gap").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).alias("sg2"),
        )
        .filter(
            (F.col("n") >= _BURSTY_MIN_EVENTS) & (F.col("sg") > 0)
        )
    )
    mu = F.col("sg").cast("double") / F.col("n")
    sd = F.sqrt(
        F.greatest(
            F.lit(0.0), F.col("sg2").cast("double") / F.col("n") - mu * mu
        )
    )
    b = per.select(((sd - mu) / (sd + mu)).alias("bsc"))
    return b.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.sum(F.round(F.col("bsc") * F.lit(1e9)).cast("long"))
            .cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1)),
            6,
        ).alias("mean_burstiness"),
        F.sum((F.col("bsc") > 0.2).cast("long")).alias("n_bursty"),
        F.sum((F.col("bsc") < -0.2).cast("long")).alias("n_regular"),
    )


# ---------------------------------------------------------------------
# 15. MinHash estimator calibration (estimate vs exact, per bucket)
# ---------------------------------------------------------------------


def _minhash_calibration_oracle() -> str:
    from .queries import (
        _MINHASH_PAIRS_SELECT,
        _minhash_band_selects,
        _minhash_ctes,
    )

    assert _minhash_band_selects  # shared-definition imports stay honest
    agree = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(8)
    )
    return f"""WITH {_minhash_ctes()}, pairs AS (
{_MINHASH_PAIRS_SELECT}
), sz AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
  FROM shingles GROUP BY doc_id
), inter AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_int
  FROM pairs p
  JOIN shingles a ON a.doc_id = p.doc_a
  JOIN shingles b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY p.doc_a, p.doc_b
), scored AS (
  SELECT CAST(({agree}) AS INTEGER) AS agree8,
         CAST(i.n_int AS DOUBLE)
           / (za.n_sh + zb.n_sh - i.n_int) AS exact_j
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.doc_a
  JOIN sigs sb ON sb.doc_id = p.doc_b
  JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  JOIN sz za ON za.doc_id = p.doc_a
  JOIN sz zb ON zb.doc_id = p.doc_b
)
SELECT agree8,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(sum(CAST(round(exact_j * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 / count(*), 6) AS mean_exact_jaccard,
       round(CAST(sum(CAST(round(abs(CAST(agree8 AS DOUBLE) / 8 - exact_j)
                                 * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 / count(*), 6) AS mean_abs_err
FROM scored GROUP BY agree8"""


@stage(
    "minhash_calibration_documents",
    _minhash_calibration_oracle(),
    "dedup estimator QC: MINHASH CALIBRATION — for every LSH candidate "
    "pair, the 8-hash signature-agreement estimate vs the EXACT "
    "3-shingle Jaccard, rolled up per agreement level (0..8 matching "
    "minima): pair count, mean exact Jaccard, mean absolute estimator "
    "error. This is the table that justifies (or revokes) the "
    "verification-free scale path minhash_jaccard_estimate relies on: "
    "E[agree/8] = J only holds if the hash family behaves — a biased "
    "bucket (mean exact far from agree/8) means the banding or "
    "hashing drifted and exact verification must stay on. Exact "
    "intersections come from the inverted-index join (candidates "
    "only, never all pairs); every count is exact BIGINT, per-pair "
    "doubles are exact rationals, and the two means quantize at 1e9 "
    "(the established sum convention). Scale: candidate-pair-sized "
    "joins on doc-id/shingle keys; the rollup is <= 9 rows.",
)
def minhash_calibration_documents(spark, sf_dir):
    from .ext import dedup as X_dedup

    df = load_table(spark, sf_dir, "documents")
    # optimization r15 (guide §5): sh is referenced 3x (sizes + both
    # intersection sides), sigs 2x, pairs 2x — unpersisted, the md5
    # minhash/shingle pipelines re-ran once per reference. Persist all
    # three, materialize the <=9-row rollup eagerly, unpersist.
    sh = X_dedup._shingle_table(df, "text", "doc_id", 3).persist()
    sigs = X_dedup.minhash_signatures(df, num_hashes=8).persist()
    pairs = X_dedup.lsh_candidate_pairs(df, num_hashes=8, bands=4).persist()
    sz = sh.groupBy(F.col("__id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    inter = (
        pairs.join(
            sh.select(F.col("__id").alias("doc_a"), F.col("sh").alias("sha")),
            "doc_a",
        )
        .join(
            sh.select(F.col("__id").alias("doc_b"), F.col("sh").alias("shb")),
            "doc_b",
        )
        .filter(F.col("sha") == F.col("shb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    agree = sum(
        (F.col(f"ha{i}") == F.col(f"hb{i}")).cast("int") for i in range(8)
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"h{i}").alias(f"ha{i}") for i in range(8)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"h{i}").alias(f"hb{i}") for i in range(8)],
    )
    exact_j = F.col("n_int").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_int")
    )
    scored = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"])
        .join(sz.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .select(
            agree.alias("agree8"),
            exact_j.alias("exact_j"),
        )
    )

    def qmean(col):
        return F.round(
            F.sum(F.round(col * F.lit(1e9)).cast("long")).cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1)),
            6,
        )

    out = scored.groupBy("agree8").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        qmean(F.col("exact_j")).alias("mean_exact_jaccard"),
        qmean(
            F.abs(F.col("agree8").cast("double") / F.lit(8) - F.col("exact_j"))
        ).alias("mean_abs_err"),
    )
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, sh, sigs, pairs)


# ---------------------------------------------------------------------
# 16. LSH candidate-graph degree distribution (hub detection QC)
# ---------------------------------------------------------------------


def _lsh_degree_oracle() -> str:
    from .queries import _MINHASH_PAIRS_SELECT, _minhash_ctes

    return f"""WITH {_minhash_ctes()}, pairs AS (
{_MINHASH_PAIRS_SELECT}
), deg AS (
  SELECT d, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT doc_a AS d FROM pairs
    UNION ALL
    SELECT doc_b AS d FROM pairs
  ) GROUP BY d
)
SELECT CAST(degree AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree"""


@stage(
    "lsh_degree_hist_documents",
    _lsh_degree_oracle(),
    "dedup graph QC: DEGREE DISTRIBUTION of the MinHash-LSH candidate "
    "graph — how many near-dup candidates each document touches. The "
    "complement to pagerank_dedup_graph (which scores WHICH docs are "
    "hubs) and dedup_cluster_size_hist (component sizes): a heavy "
    "degree tail is the earliest symptom of boilerplate/template text "
    "flooding the buckets, and it appears BEFORE clustering is run — "
    "the signal that decides whether _cap_buckets' hot-bucket cap "
    "must tighten. Composition: the candidate-pair operator, one "
    "union-all explode of the two pair endpoints, two metadata-sized "
    "groupBys; exact BIGINT throughout, no new scale surface.",
)
def lsh_degree_hist_documents(spark, sf_dir):
    from .ext.dedup import lsh_candidate_pairs

    pairs = lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), num_hashes=8, bands=4
    )
    deg = (
        pairs.select(F.col("doc_a").alias("d"))
        .unionAll(pairs.select(F.col("doc_b").alias("d")))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------
# 17. Rolling 7-day active users (sliding-window cardinality)
# ---------------------------------------------------------------------


@stage(
    "rolling_active_users_events",
    """WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), bounds AS (
  SELECT min(day) AS lo, max(day) AS hi FROM d
), pairs AS (
  SELECT DISTINCT d.user_id, d.day + CAST(k.i AS INTEGER) AS wend
  FROM d, range(0, 7) k(i), bounds
  WHERE d.day + CAST(k.i AS INTEGER) BETWEEN bounds.lo AND bounds.hi
)
SELECT strftime(wend, '%Y-%m-%d') AS window_end_day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
FROM pairs GROUP BY wend""",
    "engagement metric: ROLLING 7-DAY ACTIVE USERS — for every day in "
    "the observed range, the count of distinct users active in the "
    "7-day window ENDING that day (the WAU-style number product "
    "dashboards track; tumbling windows systematically undercount it "
    "because week boundaries split streaks). Sliding-window DISTINCT "
    "cannot reuse tumbling partials — the standard exact shape is the "
    "one here: dedup to (user, day) FIRST (the big cardinality drop), "
    "then a bounded 7-way day explode and one distinct-count per "
    "window end. The 7x expansion applies to the deduped day-level "
    "table, never the raw event stream; at 100 TB that table is "
    "users x days, and the final count shuffles (user, wend) pairs "
    "once. Exact BIGINTs; day arithmetic in DATE type on both "
    "engines, output as ISO strings.",
)
def rolling_active_users_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the corpus scan/aggregate runs once.
    d = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct().localCheckpoint()
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    pairs = (
        d.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(6))
            ).alias("i"),
            "day",
            "lo",
            "hi",
        )
        .select(
            "user_id", F.date_add(F.col("day"), F.col("i")).alias("wend"),
            "lo", "hi",
        )
        .filter((F.col("wend") >= F.col("lo")) & (F.col("wend") <= F.col("hi")))
    )
    return (
        pairs.groupBy("wend")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .select(
            F.date_format("wend", "yyyy-MM-dd").alias("window_end_day"),
            "active_users",
        )
    )


# ---------------------------------------------------------------------
# 18. Gini coefficient of user activity (engagement concentration)
# ---------------------------------------------------------------------


@stage(
    "gini_user_activity_events",
    """WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
), rk AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt, user_id) AS r,
         count(*) OVER () AS n, sum(cnt) OVER () AS t
  FROM per
)
SELECT CAST(max(n) AS BIGINT) AS n_users,
       CAST(max(t) AS BIGINT) AS total_events,
       round((2.0 * CAST(sum(r * cnt) AS DOUBLE)
              - (CAST(max(n) AS DOUBLE) + 1) * CAST(max(t) AS DOUBLE))
             / (CAST(max(n) AS DOUBLE) * CAST(max(t) AS DOUBLE)), 6)
         AS gini
FROM rk""",
    "engagement concentration: GINI COEFFICIENT over per-user event "
    "counts — 0 = perfectly even engagement, ->1 = a handful of users "
    "(bots, scrapers, celebrity accounts) generate everything. The "
    "single-number companion to key_skew_profile (which profiles the "
    "join-key histogram) and pareto_revenue_share (the revenue "
    "analogue over parts): this is the statistic that says whether "
    "per-user sampling or hot-key salting is even worth configuring. "
    "Exact rank formula G = (2*sum(r*c) - (n+1)*T) / (n*T) with "
    "ranks ascending by (count, user_id) — every sum is an exact "
    "BIGINT before the one 6dp division, so the ranking window (the "
    "pareto precedent: one shuffle over the per-user COUNT table, "
    "data-sized but orders smaller than the event stream) is the "
    "only heavy step.",
)
def gini_user_activity_events(spark, sf_dir):
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("cnt", "user_id")
    rk = per.select(
        "cnt", F.row_number().over(w).alias("r")
    )
    return rk.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cnt").alias("total_events"),
        F.round(
            (
                F.lit(2.0) * F.sum(F.col("r") * F.col("cnt")).cast("double")
                - (F.count(F.lit(1)).cast("double") + F.lit(1))
                * F.sum("cnt").cast("double")
            )
            / (
                F.count(F.lit(1)).cast("double")
                * F.sum("cnt").cast("double")
            ),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------
# 19. Label-centroid margin + confusion (cluster-separation QC)
# ---------------------------------------------------------------------


def _label_margin_oracle() -> str:
    return """WITH cent AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(t.pos AS BIGINT) AS pos,
         CAST(sum(CAST(round(CAST(embedding[t.pos + 1] AS DOUBLE) * 1e9)
                       AS BIGINT)) AS DOUBLE) / 1e9
           / CAST(count(*) AS DOUBLE) AS c
  FROM embeddings, range(0, 64) t(pos)
  GROUP BY label, t.pos
), centl AS (
  SELECT label, list(c ORDER BY pos) AS cl FROM cent GROUP BY label
), ev AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings
), cos AS (
  -- in-order list folds mirror Spark's cosine_col exactly (a GROUP BY
  -- sum aggregates in arbitrary order and flips the 6dp rounding on
  -- boundary values): dot = x[j]*cl[j] in index order, denominator =
  -- sqrt(x.x) * sqrt(cl.cl) in that operand order
  SELECT ev.vec_id, ev.label, centl.label AS clabel,
         round(list_sum(list_transform(range(1, 65),
                 j -> ev.x[j] * centl.cl[j]))
               / (sqrt(list_sum(list_transform(ev.x, v -> v * v)))
                  * sqrt(list_sum(list_transform(centl.cl, v -> v * v)))),
               6) AS cs
  FROM ev, centl
), own AS (
  SELECT vec_id, label, cs AS own_cs FROM cos WHERE label = clabel
), other AS (
  SELECT vec_id, clabel AS nearest_other, cs AS other_cs FROM (
    SELECT vec_id, clabel, cs,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cs DESC, clabel) AS rn
    FROM cos WHERE label <> clabel)
  WHERE rn = 1
)
SELECT own.label, other.nearest_other,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(CAST(sum(CAST(round((own.own_cs - other.other_cs) * 1e9)
                          AS BIGINT)) AS DOUBLE) / 1e9 / count(*), 9)
         AS mean_margin
FROM own JOIN other USING (vec_id)
GROUP BY own.label, other.nearest_other"""


@stage(
    "label_margin_confusion_embeddings",
    _label_margin_oracle(),
    "embedding-space QC: LABEL-CENTROID MARGIN + CONFUSION — for each "
    "vector, round-6 cosine to its OWN label centroid minus cosine to "
    "the nearest FOREIGN centroid (the silhouette-lite separation "
    "margin), rolled up per (label, nearest_other) pair: a confusion "
    "matrix over centroid geometry. Negative mean margin on a cell "
    "means that label's members sit closer to another label's center "
    "than their own — the labeling/encoder-drift signal read before "
    "trusting label-partitioned IVF cells or per-label sampling. "
    "Centroids are the quantized per-label means "
    "(embedding_centroids_by_label machinery, metadata-sized and "
    "broadcast as literals); per-vector work is k cosine folds + a "
    "masked argmax with label tie-break; margins quantize at 1e9 "
    "before the per-cell mean (rounded 9dp - a 6dp round would sit "
    "exactly on half boundaries for even cells over the 1e-6 grid). One scan, one small groupBy — no "
    "pairwise anything.",
)
def label_margin_confusion_embeddings(spark, sf_dir):
    from .ext.similarity import _as_literal_array, cosine_col
    from .queries import _ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)
    labels = sorted(cents)
    coss = F.array(
        *[
            F.round(
                cosine_col(F.col("embedding"), _as_literal_array(cents[l])), 6
            )
            for l in labels
        ]
    )
    lbl_arr = F.array(*[F.lit(int(l)).cast("long") for l in labels])
    base = emb.select(
        F.col("label").cast("long").alias("label"), coss.alias("cs")
    )
    # mask own label to -2.0, then linear argmax with lowest-label ties
    masked = F.transform(
        F.sequence(F.lit(0), F.lit(len(labels) - 1)),
        lambda i: F.when(
            F.element_at(lbl_arr, i.cast("int") + 1) == F.col("label"),
            F.lit(-2.0),
        ).otherwise(F.element_at(F.col("cs"), i.cast("int") + 1)),
    )
    staged = base.withColumn("mk", masked)
    own_idx = (
        F.array_position(lbl_arr, F.col("label")).cast("int")
    )
    best = F.array_max(F.col("mk"))
    nearest = F.element_at(
        lbl_arr, F.array_position(F.col("mk"), best).cast("int")
    )
    margin = F.element_at(F.col("cs"), own_idx) - best
    return (
        staged.select(
            "label",
            nearest.alias("nearest_other"),
            margin.alias("margin"),
        )
        .groupBy("label", "nearest_other")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            # round-9, NOT round-6: margins sit on the 1e-6 grid, so a
            # 2-member cell's mean lands EXACTLY on a 5e-7 boundary and
            # the engines' half-rules disagree (bit-level noise decides);
            # at 9dp the quotient's decimals fit and no boundary exists
            F.round(
                F.sum(F.round(F.col("margin") * F.lit(1e9)).cast("long"))
                .cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1)),
                9,
            ).alias("mean_margin"),
        )
    )


# ---------------------------------------------------------------------
# 20. Cross-source shingle containment (data-mix contamination matrix)
# ---------------------------------------------------------------------


@stage(
    "source_shingle_containment_documents",
    """WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), ssh AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                               i -> array_to_string(list_slice(t, i, i + 2),
                                                    ' '))) AS sh
  FROM toks
), sz AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_sh FROM ssh GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, i.n_shared,
       round(CAST(i.n_shared AS DOUBLE) / least(za.n_sh, zb.n_sh), 6)
         AS containment
FROM inter i
JOIN sz za ON za.source = i.source_a
JOIN sz zb ON zb.source = i.source_b""",
    "data-mix QC: CROSS-SOURCE SHINGLE CONTAINMENT matrix — for every "
    "source pair, the shared distinct word-3gram count and the "
    "containment ratio (shared / smaller side's shingle set). High "
    "containment between two ingestion sources means one republishes "
    "the other (mirror sites, syndication, crawl echoes) — the "
    "source-level signal that per-document near-dup pair counts "
    "(cross_source_dup_rate) only show after pair explosion, here "
    "computed directly on SET overlap. Scale shape: dedup to "
    "(source, shingle) FIRST — the source-level distinct collapse is "
    "enormous — then a shingle-key equi-join whose output is bounded "
    "by sources^2 per shingle, never documents^2; exact BIGINT "
    "counts, one 6dp ratio.",
)
def source_shingle_containment_documents(spark, sf_dir):
    from .ext.dedup import _shingle_table

    docs = load_table(spark, sf_dir, "documents")
    # optimization r15 (guide §5): sh feeds the size aggregate AND
    # both self-join sides — unpersisted, the corpus shingle pipeline
    # ran once per reference. Persist, materialize the sources²-bounded
    # result eagerly, unpersist.
    sh = _shingle_table(
        docs.select(F.col("source").alias("doc_id"), "text"),
        "text",
        "doc_id",
        3,
    ).select(F.col("__id").alias("source"), "sh").distinct().persist()
    sz = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("source").alias("source_a"), "sh")
    b = sh.select(F.col("source").alias("source_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        inter.join(
            sz.select(F.col("source").alias("source_a"), F.col("n_sh").alias("na")),
            "source_a",
        )
        .join(
            sz.select(F.col("source").alias("source_b"), F.col("n_sh").alias("nb")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least(F.col("na"), F.col("nb")),
                6,
            ).alias("containment"),
        )
    )
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, sh)


# ---------------------------------------------------------------------
# Round-7 promotion hook (second pass; see queries_more's re-entrancy
# note): several eager-oracle builders above import from .queries at
# module-body time, so importing THIS module first runs the whole
# registration chain while STAGED_R7 is still a prefix. Re-invoking
# the skip-if-registered promotion here — after all twenty entries
# exist — makes the catalog complete under either import order.
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r7 as _promote  # noqa: E402

_promote()
del _promote
