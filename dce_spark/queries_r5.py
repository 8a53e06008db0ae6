"""Round-5 catalog additions: ANN retrieval quality, skew-mitigated
joins, interpolated LM scoring, watermark/late-data semantics, and the
lossy-counting batch replay. Registered from queries_more.py (after
the round-4 staging promotion) and FRONTED in ``_DRIVER_WINDOW`` the
same round they land — the r1-r3 lesson: a query registered after the
driver gate rotates is an unchecked tail.

Shared determinism conventions as dce_spark/queries.py: quantized or
9dp-rounded float ranking with unique tie-breaks, epoch seconds for
timestamps, round(6) for float-accumulated outputs, exact BIGINT for
counts.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .data import load_table
from .queries import register
from .queries_staging_r5 import _PQ_D2

# =====================================================================
# 1. PQ recall@k — retrieval quality of the ADC path vs exact search
# =====================================================================

# Shared training replay (identical to pq_adc_topk_embeddings through
# the `codes` CTE): per-subspace 1-iteration k-means, seeds = the
# first 4 vectors' subvectors, 9dp-rounded (d2, code)-ranked
# assignments, quantized-exact centroid means.
_PQ_TRAIN_CTES = f"""
WITH sv AS (
  SELECT vec_id, s.sub,
         list_transform(range(1, 9),
           j -> CAST(embedding[s.sub * 8 + j] AS DOUBLE)) AS v
  FROM embeddings, (SELECT unnest(range(0, 8)) AS sub) s
), seeds AS (
  SELECT sub, vec_id AS code, v AS c FROM sv WHERE vec_id < 4
), a0 AS (
  SELECT vec_id, sub, v, code FROM (
    SELECT sv.vec_id, sv.sub, sv.v, seeds.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub
             ORDER BY {_PQ_D2.format(cb="seeds")}, seeds.code) AS rn
    FROM sv JOIN seeds ON seeds.sub = sv.sub)
  WHERE rn = 1
), mu AS (
  SELECT sub, code, jj.j,
         CAST(sum(CAST(round(v[jj.j] * 1e9) AS BIGINT)) AS DOUBLE)
           / 1e9 / count(*) AS mu
  FROM a0, (SELECT unnest(range(1, 9)) AS j) jj
  GROUP BY sub, code, jj.j
), cb1 AS (
  SELECT sub, code, list(mu ORDER BY j) AS c FROM mu GROUP BY sub, code
), codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT sv.vec_id, sv.sub, cb1.code,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub
             ORDER BY {_PQ_D2.format(cb="cb1")}, cb1.code) AS rn
    FROM sv JOIN cb1 ON cb1.sub = sv.sub)
  WHERE rn = 1
)"""

_PQ_RECALL_ORACLE = (
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
), adck AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adc_d2, vec_id) AS rn
    FROM adcd)
  WHERE rn <= 10
), ex AS (
  SELECT qv.qid, e.vec_id,
         round(list_sum(list_transform(range(1, 65),
           j -> (CAST(e.embedding[j] AS DOUBLE) - qv.v[j])
              * (CAST(e.embedding[j] AS DOUBLE) - qv.v[j]))), 9) AS d2
  FROM embeddings e, qv WHERE e.vec_id <> qv.qid
), exk AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn
    FROM ex)
  WHERE rn <= 10
)
SELECT CAST(exk.qid AS BIGINT) AS query_id,
       round(CAST(count(adck.vec_id) AS DOUBLE) / 10, 6) AS recall_at_10
FROM exk LEFT JOIN adck
  ON adck.qid = exk.qid AND adck.vec_id = exk.vec_id
GROUP BY exk.qid"""
)


@register(
    "pq_recall_at_k_embeddings",
    _PQ_RECALL_ORACLE,
    "similarity QC: PQ RECALL@10 — for each of 3 query vectors, the "
    "overlap between the ADC top-10 (compressed codes + lookup "
    "tables) and the EXACT squared-L2 top-10, as a fraction. This is "
    "the number an ANN user actually tunes m/k_sub/nprobe against: "
    "reconstruction error (pq_reconstruction_error_embeddings) says "
    "how lossy the codes are, recall@k says whether retrieval still "
    "finds the true neighbors. Same deterministic 1-iteration "
    "training replay as pq_adc_topk_embeddings; both rankings use "
    "9dp-rounded distances with vec_id tie-breaks so the top-10 sets "
    "are engine-portable. Scale shape: training/encode are the PQ "
    "operators' own shapes; per query the ADC pass is a zero-shuffle "
    "scan + TakeOrdered and the exact pass is the brute-force "
    "baseline over the SAME corpus — the recall harness is "
    "O(n_queries * corpus), run on a sampled query set (3 here), "
    "never on the full query log.",
)
def pq_recall_at_k_embeddings(spark, sf_dir):
    from .ext.similarity import (
        _adc_col,
        _sq_dist_round9_sql,
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    embd = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    cbs = pq_train(emb, dim=64, m=8, k_sub=4, iters=1)
    codes = pq_encode(emb, cbs)
    qrows = sorted(
        embd.filter(F.col("vec_id") < 3).collect(), key=lambda r: r["vec_id"]
    )
    # ONE scan per side: each query contributes a (query_id, distance)
    # struct, exploded and ranked per query — same (d, vec_id) order as
    # pq_topk's TakeOrdered, so the top-10 sets are identical, but 3
    # ADC scans + 3 exact scans collapse into 2 jobs. The per-query
    # window partitions on query_id: fine for a SAMPLED query set (the
    # only shape a recall harness runs at scale).
    adc_structs, ex_structs = [], []
    for r in qrows:
        qid = int(r["vec_id"])
        q = [float(x) for x in r["emb"]]
        adc_structs.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                _adc_col(cbs, q).alias("d"),
            )
        )
        ex_structs.append(
            F.struct(
                F.lit(qid).cast("long").alias("query_id"),
                F.expr(_sq_dist_round9_sql("emb", q)).alias("d"),
            )
        )

    def topk_per_query(df, structs):
        e = (
            df.select("vec_id", F.explode(F.array(*structs)).alias("s"))
            .select("vec_id", F.col("s.query_id").alias("query_id"), F.col("s.d").alias("d"))
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        w = Window.partitionBy("query_id").orderBy("d", "vec_id")
        return (
            e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("query_id", "vec_id")
        )

    adc_all = topk_per_query(codes, adc_structs)
    ex_all = topk_per_query(embd, ex_structs)
    return (
        ex_all.join(
            adc_all.withColumn("hit", F.lit(1)), ["query_id", "vec_id"], "left"
        )
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.lit(10),
                6,
            ).alias("recall_at_10")
        )
    )


# =====================================================================
# 2. Salted hot-key join (skew mitigation as a catalog operator)
# =====================================================================


@register(
    "skew_salted_join_events",
    """WITH f AS (
         SELECT CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS uid,
                event_type
         FROM events
       ), d AS (
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev
         FROM events GROUP BY user_id
       )
       SELECT f.event_type,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(d.n_ev) AS BIGINT) AS sum_dim_ev
       FROM f JOIN d ON d.user_id = f.uid
       GROUP BY f.event_type""",
    "skew mitigation: fact-to-dim equi-join over a DELIBERATELY hot "
    "key (half of all events remapped onto user 0 — the "
    "sentinel-id/celebrity-user shape) executed through "
    "ext/skew.salted_equi_join: the fact side carries a deterministic "
    "8-way salt (xxhash64 of event_id), the dim side is replicated "
    "once per salt, and the join key becomes (uid, salt) — so the hot "
    "key's rows spread over 8 reducers instead of stalling one. "
    "Result is provably identical to the unsalted join (the oracle "
    "runs the plain join); tests/test_plans.py locks the salted "
    "physical shape, and AQE skew-join remains the zero-code "
    "alternative for sort-merge plans past its size thresholds. At "
    "100 TB raise n_salts toward the hot key's row share divided by "
    "a healthy partition size.",
)
def skew_salted_join_events(spark, sf_dir):
    from .ext.skew import salted_equi_join

    ev = load_table(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        "event_id",
        "event_type",
    )
    dim = ev.groupBy(F.col("user_id").alias("uid")).agg(
        F.count(F.lit(1)).alias("n_ev")
    )
    joined = salted_equi_join(
        fact, dim, on="uid", n_salts=8, salt_by=F.xxhash64(F.col("event_id"))
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_ev").alias("sum_dim_ev"),
    )


# =====================================================================
# 3. Interpolated bigram/unigram LM score (Jelinek–Mercer smoothing)
# =====================================================================

_INTERP_LAMBDA = 0.7

_INTERP_ORACLE = f"""WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY w
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t FROM vocab
), bg AS (
  SELECT doc_id,
         unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         unnest(list_slice(t, 2, len(t))) AS w2
  FROM toks WHERE len(t) >= 2
), c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt2 FROM bg GROUP BY w1, w2
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(ln({_INTERP_LAMBDA} * (CAST(c2.cnt2 AS DOUBLE) / u1.cnt)
                    + {1 - _INTERP_LAMBDA:.1f} * (CAST(u2.cnt AS DOUBLE) / tot.t)))
             / count(*), 6) AS avg_logprob
FROM bg
JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
JOIN vocab u1 ON u1.w = bg.w1
JOIN vocab u2 ON u2.w = bg.w2
CROSS JOIN tot
GROUP BY bg.doc_id"""


@register(
    "interp_logprob_documents",
    _INTERP_ORACLE,
    "training-data op: INTERPOLATED bigram/unigram LM score "
    "(Jelinek-Mercer, lambda=0.7) — each doc's mean "
    "ln(0.7 * P_mle(w2|w1) + 0.3 * P_uni(w2)) under the corpus's own "
    "counts: the standard KenLM-style backoff shape for perplexity "
    "filtering of pretraining corpora, smoother than add-1 "
    "(bigram_logprob_documents) because unseen-context mass comes "
    "from the unigram distribution instead of a uniform V floor. "
    "Aggregation shapes: vocabulary and bigram count tables, "
    "equi-joined back onto the doc bigram stream (three joins on "
    "token keys — at 100 TB the count tables get min-count cuts and "
    "the joins broadcast the surviving vocab); the corpus token total "
    "rides a 1-row broadcast. ln/mean are float-accumulated -> "
    "round(6), the unigram_logprob convention.",
)
def interp_logprob_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens_col(F.lower(F.col("text"))).alias("t")
    ).filter(F.size("t") >= 2)
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # optimization r15 (guide §5): bg is reused by the count table and
    # the final join; vocab by both unigram sides and the total —
    # eager localCheckpoints compute each corpus pass once.
    bg = bg.localCheckpoint()
    words = docs.select(
        F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    tot = vocab.agg(F.sum("cnt").alias("t"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    p = F.lit(_INTERP_LAMBDA) * (
        F.col("cnt2").cast("double") / F.col("cnt1")
    ) + F.lit(1 - _INTERP_LAMBDA) * (F.col("cnt_w2").cast("double") / F.col("t"))
    return (
        bg.join(c2, ["w1", "w2"])
        .join(
            vocab.select(F.col("w").alias("w1"), F.col("cnt").alias("cnt1")),
            "w1",
        )
        .join(
            vocab.select(F.col("w").alias("w2"), F.col("cnt").alias("cnt_w2")),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(F.log(p)) / F.count(F.lit(1)), 6).alias(
                "avg_logprob"
            ),
        )
    )


# =====================================================================
# 4. Watermark / late-data semantics, batch mirror
# =====================================================================

_LATE_SHIFT_HOURS = 96
_LATE_DELAY = "1 HOUR"
_LATE_BATCH_ROWS = 100


@register(
    "late_data_windows_events",
    f"""WITH arr AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0
              THEN ts - INTERVAL {_LATE_SHIFT_HOURS} HOUR
              ELSE ts END AS ets,
         CAST(event_id // {_LATE_BATCH_ROWS} AS BIGINT) AS batch
  FROM events
), bm AS (
  SELECT batch, max(ets) AS mx
  FROM arr GROUP BY batch
), wm AS (
  SELECT batch,
         max(mx) OVER (ORDER BY batch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           - INTERVAL {_LATE_DELAY} AS wm
  FROM bm
), flags AS (
  SELECT date_trunc('hour', a.ets) AS wstart,
         CASE WHEN w.wm IS NULL
              OR date_trunc('hour', a.ets) + INTERVAL 1 HOUR > w.wm
              THEN 1 ELSE 0 END AS ok
  FROM arr a JOIN wm w ON w.batch = a.batch
)
SELECT CAST(floor(epoch(wstart)) AS BIGINT) AS window_epoch,
       CAST(count(*) AS BIGINT) AS n_arrived,
       CAST(sum(ok) AS BIGINT) AS n_accepted
FROM flags GROUP BY wstart""",
    "streaming semantics, batch mirror: WATERMARK late-data policy "
    "over an arrival stream with injected stragglers (every 7th event "
    f"time-shifted {_LATE_SHIFT_HOURS}h back; arrival order = "
    f"event_id, micro-batches of {_LATE_BATCH_ROWS}). Replays "
    "Structured Streaming's exact rule for a 1h-tumbling-window "
    f"aggregation under withWatermark('{_LATE_DELAY.lower()}'): since "
    "Spark 3.4 the LATE-EVENTS watermark lags the EVICTION watermark "
    "by one batch (eventTimeWatermarkForLateEvents vs ForEviction), "
    "so batch b's rows are filtered against max event-time over "
    "batches <= b-2 minus the delay (pinned empirically against a "
    "real update-mode stream), and a row is ACCEPTED iff its window "
    "END is still above that lagged watermark. Output: per window, "
    "arrivals vs accepted. tests/test_streaming.py replays the same "
    "batches through a real readStream + withWatermark and asserts "
    "the identical accepted set. Scale shape: per-batch max is one "
    "tiny aggregate, the watermark table is #batches rows (window "
    "over it is metadata-sized) broadcast back onto arrivals; no "
    "global sort of the stream itself.",
)
def late_data_windows_events(spark, sf_dir):
    arr = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.when(
                F.col("event_id") % 7 == 0,
                F.col("ts") - F.expr(f"INTERVAL {_LATE_SHIFT_HOURS} HOURS"),
            )
            .otherwise(F.col("ts"))
            .alias("ets"),
        )
        .withColumn(
            "batch", F.floor(F.col("event_id") / _LATE_BATCH_ROWS).cast("long")
        )
    )
    # (Spark tracks watermarks at ms precision; the mirror keeps full
    # microseconds on both sides — the sub-ms difference can only
    # matter if a window boundary falls inside the truncated band of
    # the batch max, which continuous event times make a measure-zero
    # edge. The paired streaming test tolerates it the same way.)
    bm = arr.groupBy("batch").agg(F.max("ets").alias("mx"))
    # -2: the late-events watermark lags one batch behind eviction
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -2)
    wm = bm.select(
        "batch",
        (F.max("mx").over(w) - F.expr(f"INTERVAL {_LATE_DELAY}")).alias("wm"),
    )
    wstart = F.date_trunc("hour", F.col("ets"))
    ok = (
        F.col("wm").isNull()
        | (wstart + F.expr("INTERVAL 1 HOUR") > F.col("wm"))
    ).cast("int")
    return (
        arr.join(F.broadcast(wm), "batch")
        .select(wstart.alias("wstart"), ok.alias("ok"))
        .groupBy("wstart")
        .agg(
            F.count(F.lit(1)).alias("n_arrived"),
            F.sum("ok").alias("n_accepted"),
        )
        .select(
            F.unix_timestamp("wstart").alias("window_epoch"),
            "n_arrived",
            "n_accepted",
        )
    )


# =====================================================================
# 5. Heavy hitters: lossy-counting batch replay vs exact counts
# =====================================================================

_HH_SUPPORT = 0.005
_HH_EPSILON = 0.0025


@register(
    "heavy_hitters_batch_events",
    f"""WITH f AS (
  SELECT CASE WHEN event_id % 5 = 0 THEN 0 ELSE user_id END AS uid
  FROM events
), exact AS (
  SELECT uid, CAST(count(*) AS BIGINT) AS exact_cnt FROM f GROUP BY uid
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM f
)
SELECT CAST(uid AS BIGINT) AS user_id, exact_cnt, TRUE AS sketch_ok
FROM exact CROSS JOIN tot
WHERE exact_cnt >= ceiling({_HH_SUPPORT} * n)""",
    "streaming sketch, batch replay: Manku-Motwani LOSSY COUNTING "
    "(streaming.lossy_count_batch — the exact fold the stateful "
    "streaming operator runs) over a dirtied hot-key stream (every "
    "5th event remapped to user 0), verified against exact counts "
    f"through its own guarantees: every key at support >= "
    f"{_HH_SUPPORT} of total traffic must be tracked "
    "(no-false-negative), with sketch count <= exact <= sketch count "
    f"+ delta, at epsilon = {_HH_EPSILON}. The oracle lists the "
    "exact-count heavy keys with sketch_ok TRUE — any eviction or "
    "bound violation surfaces as a row/value mismatch. Scale shape: "
    "one shuffle onto hash shards, per-shard state is sketch-sized "
    "(O(1/eps * log(eps*n))) not cardinality-sized; the exact side "
    "here is the verification harness, not the production path.",
)
def heavy_hitters_batch_events(spark, sf_dir):
    from .streaming.heavyhitters import lossy_count_batch

    f = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 5 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        "event_id",
    )
    cand = lossy_count_batch(
        f, key_col="uid", order_col="event_id", epsilon=_HH_EPSILON,
        n_shards=8, batch_rows=1000,
    ).select(
        F.col("uid").cast("long").alias("uid"), "count", "delta"
    )
    exact = f.groupBy("uid").agg(F.count(F.lit(1)).alias("exact_cnt"))
    tot = f.agg(F.count(F.lit(1)).alias("n"))
    heavy = exact.crossJoin(F.broadcast(tot)).filter(
        F.col("exact_cnt") >= F.ceil(F.lit(_HH_SUPPORT) * F.col("n"))
    )
    ok = (
        F.col("count").isNotNull()
        & (F.col("count") <= F.col("exact_cnt"))
        & (F.col("count") + F.col("delta") >= F.col("exact_cnt"))
    )
    return heavy.join(cand, "uid", "left").select(
        F.col("uid").alias("user_id"),
        "exact_cnt",
        ok.alias("sketch_ok"),
    )
