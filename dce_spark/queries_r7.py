"""Round-7 catalog additions: tokenizer fertility (the per-source
cost metric of a learned BPE vocabulary), PQ codebook balance (ANN
index health), day-of-week seasonality (the drift ladder's seasonal
baseline), the event-type transition matrix (sequence analysis), and
two watermark-economics queries over the dirtied arrival stream
(arrival-delay quantiles, streaming state-rows cost). Registered from
queries_more.py and FRONTED in ``_DRIVER_WINDOW`` the same round they
land — the r1-r3 lesson: a query registered after the driver gate
rotates is an unchecked tail.

Shared determinism conventions as dce_spark/queries.py: quantized or
9dp-rounded float ranking with unique tie-breaks, epoch seconds for
timestamps, round(6) for float-accumulated outputs, exact BIGINT for
counts. Reference parity anchors cited per-query; everything here is
extension surface beyond the reference's operator set (SURVEY.md §2
"beyond" families).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .data import load_table
from .queries import register
from .queries_more import _BPE_N_MERGES, _bpe_cte
from .queries_r5 import _PQ_TRAIN_CTES

# =====================================================================
# 1. Tokenizer fertility by source (BPE ladder -> operational cost)
# =====================================================================

_FERTILITY_ORACLE = (
    _bpe_cte(_BPE_N_MERGES, keep_word=True)
    + f""", usage AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT source,
               unnest(list_filter(string_split_regex(lower(text),
                 '[[:space:]]+'), x -> x <> '')) AS w
        FROM documents)
  WHERE regexp_matches(w, '^[a-z0-9]+$')
  GROUP BY source, w
)
SELECT source,
       CAST(sum(u.cnt) AS BIGINT) AS n_words,
       CAST(sum(u.cnt * len(s.syms)) AS BIGINT) AS n_tokens,
       round(CAST(sum(u.cnt * len(s.syms)) AS DOUBLE)
             / sum(u.cnt), 6) AS fertility
FROM usage u JOIN s{_BPE_N_MERGES} s USING (w)
GROUP BY source"""
)


@register(
    "tokenizer_fertility_documents",
    _FERTILITY_ORACLE,
    "tokenizer economics: FERTILITY (BPE tokens emitted per word) by "
    "source, under the corpus-trained 3-merge vocabulary — the number "
    "that prices a source's contribution to the token budget (high-"
    "fertility sources burn context window and training FLOPs per "
    "word; a fertility jump after a tokenizer retrain is a regression "
    "signal). Completes the BPE ladder pair_counts -> merges -> "
    "apply with its per-source OPERATIONAL readout. Scale shape: "
    "training folds over the distinct-word table (vocabulary-bounded, "
    "bpe_merges_documents pattern); the per-(source, word) usage "
    "table joins word -> token-length map-side after one corpus "
    "groupBy — the corpus text is read once, and the join key space "
    "is the vocabulary, not the corpus.",
)
def tokenizer_fertility_documents(spark, sf_dir):
    from .ext.text import bpe_merge_fold, bpe_train, bpe_words, tokens_col

    docs = load_table(spark, sf_dir, "documents")
    usage = (
        docs.select(
            "source", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
        )
        .filter(F.col("w").rlike("^[a-z0-9]+$"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges, final = bpe_train(bpe_words(docs), _BPE_N_MERGES)
    final.unpersist()
    syms = F.split(F.col("w"), "")
    for left, right, _ in merges:
        syms = bpe_merge_fold(syms, left, right)
    toks = usage.select("source", "cnt", F.size(syms).alias("ntok"))
    return toks.groupBy("source").agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.col("cnt") * F.col("ntok")).alias("n_tokens"),
        F.round(
            F.sum(F.col("cnt") * F.col("ntok")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("fertility"),
    )


# =====================================================================
# 2. PQ codebook balance (ANN index health)
# =====================================================================

_PQ_BALANCE_ORACLE = (
    _PQ_TRAIN_CTES
    + """
SELECT CAST(sub AS INTEGER) AS sub,
       CAST(code AS INTEGER) AS code,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(CAST(count(*) AS DOUBLE)
             / sum(count(*)) OVER (PARTITION BY sub), 6) AS share
FROM codes GROUP BY sub, code"""
)


@register(
    "pq_codebook_balance_embeddings",
    _PQ_BALANCE_ORACLE,
    "similarity QC: PQ CODEBOOK BALANCE — per (subspace, code) "
    "assignment counts and within-subspace share under the same "
    "deterministic 1-iteration training replay as "
    "pq_adc_topk_embeddings. This is the index-health number next to "
    "reconstruction error and recall@k: a subspace whose mass "
    "collapses onto one code carries ~0 bits, so equal code size "
    "buys no discrimination there (the symptom OPQ's rotation "
    "exists to fix — see pq_opq_recall_embeddings). Scale shape: "
    "assignment is a map-side expression against driver-side "
    "codebook metadata (m x k_sub floats); one vocabulary-free "
    "groupBy on (sub, code) — 32 output rows at any corpus size; "
    "the within-subspace share reuses the same aggregate via a "
    "partition window over those 32 rows.",
)
def pq_codebook_balance_embeddings(spark, sf_dir):
    from .ext.similarity import _pq_assign_col, _pq_subvecs, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, dim=64, m=8, k_sub=4, iters=1)
    sv = _pq_subvecs(emb, "embedding", "vec_id", m=8, sub_dim=8)
    per = (
        sv.select(
            F.col("sub").cast("int").alias("sub"),
            _pq_assign_col("svec", "sub", cbs).cast("int").alias("code"),
        )
        .groupBy("sub", "code")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )
    wsub = Window.partitionBy("sub")
    return per.select(
        "sub",
        "code",
        "n_vectors",
        F.round(
            F.col("n_vectors").cast("double")
            / F.sum("n_vectors").over(wsub),
            6,
        ).alias("share"),
    )


# =====================================================================
# 3. Day-of-week seasonality (drift ladder's seasonal baseline)
# =====================================================================


@register(
    "dow_seasonality_events",
    """WITH daily AS (
         SELECT date_trunc('day', ts) AS day,
                CAST(count(*) AS BIGINT) AS n
         FROM events GROUP BY day
       ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM daily)
       SELECT CAST(dayofweek(day) AS INTEGER) AS dow,
              CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(n) AS BIGINT) AS n_events,
              round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS mean_daily,
              round(CAST(sum(n) AS DOUBLE) / max(t.t), 6) AS share
       FROM daily CROSS JOIN tot t GROUP BY dow""",
    "drift ladder baseline: DAY-OF-WEEK SEASONALITY profile — events "
    "per weekday (0=Sunday, both engines' convention after Spark's "
    "dayofweek()-1 shift), mean daily volume and share of total. "
    "Volume-drift detectors (chi_square_drift_events, "
    "cusum_drift_events) alarm on raw daily counts; real traffic has "
    "a weekly period, so the operational detector compares each day "
    "against ITS weekday baseline — this query computes that "
    "baseline. Scale shape: one groupBy to day granularity (the "
    "daily table is calendar-sized, metadata at any corpus scale), "
    "then a 7-row re-aggregate with a scalar broadcast total; all "
    "arithmetic exact-integer until the final 6dp divisions.",
)
def dow_seasonality_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the corpus scan/aggregate runs once.
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint()
    tot = daily.agg(F.sum("n").alias("t"))
    return (
        daily.crossJoin(F.broadcast(tot))
        .select(
            (F.dayofweek("day") - 1).cast("int").alias("dow"), "n", "t"
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("n_events"),
            F.round(F.sum("n").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_daily"
            ),
            F.round(F.sum("n").cast("double") / F.max("t"), 6).alias(
                "share"
            ),
        )
    )


# =====================================================================
# 4. Event-type transition matrix (first-order sequence analysis)
# =====================================================================


@register(
    "event_transition_matrix_events",
    """WITH o AS (
         SELECT event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev
         FROM events
       ), c AS (
         SELECT prev AS prev_type, event_type AS curr_type,
                CAST(count(*) AS BIGINT) AS n
         FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
       )
       SELECT prev_type, curr_type, n,
              round(CAST(n AS DOUBLE)
                    / sum(n) OVER (PARTITION BY prev_type), 6) AS prob
       FROM c""",
    "sequence analysis: first-order EVENT-TYPE TRANSITION MATRIX — "
    "per-user consecutive event pairs (deterministic (ts, event_id) "
    "ordering, the sessionization_events convention) counted into a "
    "Markov transition table with row-normalized probabilities. The "
    "behavioral fingerprint funnel_events cannot see: funnels check "
    "one prescribed path, the transition matrix surfaces ALL paths "
    "(bot loops show as near-1.0 self-transitions; a broken checkout "
    "shows as a vanished view->purchase cell). Scale shape: one "
    "shuffle on user_id for the lag window, one #types^2-bounded "
    "groupBy, and the row normalization is a partition window over "
    "that metadata-sized matrix — no second pass over events.",
)
def event_transition_matrix_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = (
        o.groupBy(
            F.col("prev").alias("prev_type"),
            F.col("event_type").alias("curr_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wprev = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "curr_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wprev), 6).alias(
            "prob"
        ),
    )


# =====================================================================
# 5. Arrival-delay quantiles (watermark tuning: the delay distribution)
# =====================================================================

# Deterministic synthetic arrival delay, identical on both engines in
# exact BIGINT arithmetic: a Knuth-multiplicative spread over [0, 2h)
# plus the 96h-late tail every 7th event (the late_data fixture).
_DELAY_SQL = (
    "(event_id * 2654435761) % 7200"
    " + CASE WHEN event_id % 7 = 0 THEN 345600 ELSE 0 END"
)


@register(
    "arrival_delay_quantiles_events",
    f"""WITH d AS (
  SELECT event_type, CAST({_DELAY_SQL} AS DOUBLE) AS delay_s
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(delay_s, 0.5), 6) AS p50,
       round(quantile_cont(delay_s, 0.9), 6) AS p90,
       round(quantile_cont(delay_s, 0.99), 6) AS p99
FROM d GROUP BY event_type""",
    "watermark tuning: ARRIVAL-DELAY QUANTILES per event type over "
    "the synthetic arrival stream (Knuth-multiplicative 0-2h spread "
    "+ the 96h-late 1-in-7 tail — deterministic BIGINT arithmetic, "
    "so both engines derive the identical delay multiset). "
    "drop_rate_by_delay_events answers 'what does delay budget D "
    "drop?'; this is the other axis an operator reads first: 'how "
    "late IS the data, and is lateness type-dependent?' (a p99 far "
    "above p90 means a heavy tail no finite budget fully covers). "
    "Exact interpolated quantiles (Spark percentile == DuckDB "
    "quantile_cont, the quantiles_lineitem convention) evaluated as "
    "ONE percentile aggregate per group buffering the column once; "
    "scale path is percentile_approx's mergeable sketch, the "
    "documented quantiles_lineitem_approx twin.",
)
def arrival_delay_quantiles_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    delay = (
        (F.col("event_id") * F.lit(2654435761)) % F.lit(7200)
        + F.when(F.col("event_id") % 7 == 0, F.lit(345600)).otherwise(
            F.lit(0)
        )
    ).cast("double")
    pcts = F.percentile(
        F.col("delay_s"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        ev.select("event_type", delay.alias("delay_s"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), pcts.alias("pcts"))
        .select(
            "event_type",
            "n",
            F.round(F.col("pcts")[0], 6).alias("p50"),
            F.round(F.col("pcts")[1], 6).alias("p90"),
            F.round(F.col("pcts")[2], 6).alias("p99"),
        )
    )


# =====================================================================
# 6. Streaming state-rows cost per watermark delay budget
# =====================================================================

_DELAYS_S7 = [3600, 14400, 86400]

_STATE_ROWS_ORACLE = f"""WITH arr AS (
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
), wins AS (
  SELECT (es // 3600) * 3600 + 3600 AS wend, min(batch) AS fb
  FROM arr GROUP BY 1
), dl AS (
  SELECT unnest([{", ".join(str(d) for d in _DELAYS_S7)}]) AS delay_s
), qual AS (
  SELECT dl.delay_s, w.wend, w.fb
  FROM wins w CROSS JOIN dl JOIN wm f ON f.batch = w.fb
  WHERE f.wm_raw IS NULL OR f.wm_raw < w.wend + dl.delay_s
), opened AS (
  SELECT q.delay_s, q.wend, CAST(count(*) AS BIGINT) AS open_batches
  FROM qual q JOIN wm b
    ON b.batch >= q.fb
   AND (b.wm_raw IS NULL OR b.wm_raw < q.wend + q.delay_s)
  GROUP BY q.delay_s, q.wend
)
SELECT CAST(delay_s AS BIGINT) AS delay_s,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(open_batches) AS BIGINT) AS state_row_steps,
       CAST(max(open_batches) AS BIGINT) AS max_open_batches
FROM opened GROUP BY delay_s"""


@register(
    "watermark_state_rows_events",
    _STATE_ROWS_ORACLE,
    "watermark tuning, the COST side: for each delay budget "
    f"({', '.join(str(d) for d in _DELAYS_S7)}s), how many 1h-window "
    "state rows the streaming aggregation holds, integrated over "
    "batch steps (state_row_steps), plus window count and the "
    "longest residency — the memory bill that "
    "drop_rate_by_delay_events' completeness curve trades against "
    "(state grows with delay; together they price the trade). Same "
    "dirtied arrival fixture and lag-2 watermark rule, replayed "
    "batch-by-batch. A window occupies state from its first ACCEPTED "
    "arrival until the watermark passes wend + delay; with a "
    "monotone watermark that residency is one contiguous batch "
    "interval, so the Spark side computes each window's close point "
    "with a union-sort AS-OF lookup (probes = wend + delay, marks = "
    "the per-batch watermark series) instead of a window-x-batch "
    "range join — the oracle replays the range-join formulation "
    "independently, a stronger cross-check than mirroring the trick. "
    "Scale shape: the only event-sized passes are the two groupBys "
    "(per-batch max, per-window min); everything after runs on "
    "batch-count + window-count rows (metadata-sized), where the "
    "single-partition as-of sort is the documented small-table "
    "exception, same as the watermark series itself.",
)
def watermark_state_rows_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    arr = (
        ev.select(
            "event_id",
            F.unix_timestamp(
                F.when(
                    F.col("event_id") % 7 == 0,
                    F.col("ts") - F.expr("INTERVAL 96 HOURS"),
                ).otherwise(F.col("ts"))
            ).alias("es"),
        )
        .withColumn("batch", F.floor(F.col("event_id") / 100).cast("long"))
        # optimization r15 (guide §5): arr feeds the batch maxes AND
        # the window rollup — checkpoint so events is scanned once.
        .localCheckpoint()
    )
    bm = arr.groupBy("batch").agg(F.max("es").alias("mx"))
    wwm = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -2)
    wm = bm.select("batch", F.max("mx").over(wwm).alias("wm_raw"))
    wins = (
        arr.select(
            ((F.floor(F.col("es") / 3600)) * 3600 + 3600)
            .cast("long")
            .alias("wend"),
            "batch",
        )
        .groupBy("wend")
        .agg(F.min("batch").alias("fb"))
    )
    qual = (
        wins.join(F.broadcast(wm), wins["fb"] == wm["batch"])
        .select(
            "wend",
            "fb",
            "wm_raw",
            F.explode(
                F.array(*[F.lit(d).cast("long") for d in _DELAYS_S7])
            ).alias("delay_s"),
        )
        .filter(
            F.col("wm_raw").isNull()
            | (F.col("wm_raw") < F.col("wend") + F.col("delay_s"))
        )
        .select("delay_s", "wend", "fb")
    )
    # as-of lookup: close batch = first batch whose watermark reaches
    # wend + delay. Probes sort before marks at equal key (probe desc)
    # so an exactly-equal watermark closes the window (>= semantics).
    probes = qual.select(
        (F.col("wend") + F.col("delay_s")).alias("key"),
        F.lit(1).alias("probe"),
        "delay_s",
        "fb",
        F.lit(None).cast("long").alias("batch"),
    )
    marks = wm.filter(F.col("wm_raw").isNotNull()).select(
        F.col("wm_raw").alias("key"),
        F.lit(0).alias("probe"),
        F.lit(None).cast("long").alias("delay_s"),
        F.lit(None).cast("long").alias("fb"),
        "batch",
    )
    wasof = Window.orderBy(
        F.col("key").asc(), F.col("probe").desc()
    ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cut = (
        probes.unionByName(marks)
        .withColumn("close_b", F.min("batch").over(wasof))
        .filter(F.col("probe") == 1)
    )
    bmax1 = bm.agg((F.max("batch") + 1).alias("bmax1"))
    opened = cut.crossJoin(F.broadcast(bmax1)).select(
        "delay_s",
        (F.coalesce("close_b", "bmax1") - F.col("fb")).alias(
            "open_batches"
        ),
    )
    return opened.groupBy("delay_s").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("open_batches").alias("state_row_steps"),
        F.max("open_batches").alias("max_open_batches"),
    )
