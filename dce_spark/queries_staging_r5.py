"""ROUND-5 STAGED catalog queries — built and oracle-verified in round
4, NOT yet registered (the round-4 catalog froze at 153 when the
driver window rotated; registering these would create an unchecked
tail, the r1-r3 lesson). Round 5 promotes them by moving the
``@stage`` registrations into queries_more.py (or importing this
module from queries.py) and fronting them in ``_DRIVER_WINDOW``.

Each entry exercises a round-4 library operator end-to-end against a
DuckDB oracle:

- ``bpe_encode_documents`` — the trained 3-merge tokenizer applied to
  every document (Arrow-UDF encoder), per-doc token totals.
- ``semantic_decontamination_embeddings`` — cross-set hyperplane-LSH
  near pairs over a dirtied view with injected paraphrase leaks
  (recall 1.0 by construction for same-direction vectors: every sign
  bit agrees, so every band collides).
- ``pq_adc_topk_embeddings`` — 1-iteration PQ training + ADC top-10,
  oracle replays the per-subspace k-means and the lookup-table scan.
- ``bigram_logprob_documents`` — add-1-smoothed bigram LM quality
  score, the conditional upgrade over unigram_logprob_documents.
- ``pq_reconstruction_error_embeddings`` — per-(subspace, code)
  compression-quality report from the same training replay.
- ``windowed_quantiles_events`` — per-day sketch quantiles with
  adaptive rank-guarantee verdicts (batch mirror of
  streaming.windowed_value_quantiles).

tests/test_staging_r5.py runs these through the SAME compare harness
as the live catalog (exact column order, canonical dtypes, sorted
values) at the suite's SF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import functions as F

from .data import load_table

STAGED: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---------------------------------------------------------------------
# 1. BPE encode over documents
# ---------------------------------------------------------------------

_BPE_N = 3


def _bpe_fold_sql(list_expr: str, m: str) -> str:
    """One greedy merge pass (rule held in CTE ``m``) applied to a
    symbol-list SQL expression — identical semantics to
    ext/text.bpe_merge_fold (see queries_more._bpe_cte)."""
    return (
        f"string_split(list_reduce({list_expr}, (acc, x) -> "
        f"CASE WHEN list_extract(string_split(acc, chr(30)), -1) = {m}.l "
        f"AND x = {m}.r THEN acc || {m}.r "
        f"ELSE acc || chr(30) || x END), chr(30))"
    )


def _bpe_encode_oracle() -> str:
    from .queries_more import _bpe_cte

    chars = (
        "list_transform(range(1, length(w) + 1), "
        "i -> substr(w, CAST(i AS INTEGER), 1))"
    )
    enc = chars
    for k in range(1, _BPE_N + 1):
        enc = _bpe_fold_sql(enc, f"m{k}")
    return (
        _bpe_cte(_BPE_N)
        + f""", doc_words AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text),
           '[[:space:]]+'), x -> x <> '')) AS w
  FROM documents
), dw AS (
  SELECT doc_id, w FROM doc_words WHERE regexp_matches(w, '^[a-z0-9]+$')
), enc AS (
  SELECT doc_id, {enc} AS syms
  FROM dw, m1, m2, m3
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_unique
FROM (SELECT doc_id, unnest(syms) AS tok FROM enc)
GROUP BY doc_id"""
    )


@stage(
    "bpe_encode_documents",
    "",  # oracle resolved lazily (needs queries_more import)
    "tokenizer: ENCODE every document with the corpus-trained 3-merge "
    "BPE vocabulary (ext/text.bpe_encode, the Arrow-UDF production "
    "path) and report per-doc token totals. Training is the same "
    "distributed loop as bpe_merges_documents; encoding is one "
    "Arrow-batched map pass + one groupBy on doc_id. The oracle "
    "replays training as the shared _bpe_cte chain, then re-encodes "
    "each word with three correlated list_reduce folds.",
)
def bpe_encode_documents(spark, sf_dir):
    from .ext.text import bpe_encode, bpe_train, bpe_words

    docs = load_table(spark, sf_dir, "documents")
    merges, final = bpe_train(bpe_words(docs), _BPE_N)
    final.unpersist()
    toks = bpe_encode(docs, merges)
    return (
        toks.select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_unique"),
        )
    )


# ---------------------------------------------------------------------
# 2. Semantic decontamination over a dirtied embedding view
# ---------------------------------------------------------------------

_DECON_COS = (
    "round(list_sum(list_transform(range(1, 65), i -> c.e[i] * b.be[i]))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> c.e[i] * c.e[i])))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> b.be[i] * b.be[i])))), 6)"
)

_DECON_ORACLE = f"""
WITH bench AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5
), corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE vec_id >= 5
  UNION ALL
  SELECT vec_id + 10000,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.0001)
  FROM bench
), b AS (
  SELECT vec_id AS bench_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS be
  FROM bench
)
SELECT corpus_id, bench_id, cos_sim FROM (
  SELECT CAST(c.vec_id AS BIGINT) AS corpus_id,
         CAST(b.bench_id AS BIGINT) AS bench_id,
         {_DECON_COS} AS cos_sim
  FROM corpus c, b
) WHERE cos_sim >= 0.99"""


@stage(
    "semantic_decontamination_embeddings",
    _DECON_ORACLE,
    "decontamination at the EMBEDDING level: corpus vectors within "
    "cosine 0.99 of any benchmark vector (vec_id < 5 stands in as the "
    "benchmark), over a dirtied view with 5 injected paraphrase leaks "
    "(benchmark vectors scaled by 1.0001 — same direction, cosine "
    "1.0). Catches the leakage n-gram decontamination cannot: "
    "paraphrases share no shingles but land next to the benchmark in "
    "embedding space. The Spark side runs the hyperplane-LSH cross-set "
    "operator (never broadcasts or cross-joins either side; recall "
    "1.0 here because identical-direction vectors agree on every sign "
    "bit); the oracle brute-forces the tiny bench x corpus cosine "
    "matrix. The de-vacuization convention of the dedup probes: both "
    "engines construct the identical injected view.",
)
def semantic_decontamination_embeddings(spark, sf_dir):
    from .ext.similarity import semantic_decontamination

    emb = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    bench = emb.filter(F.col("vec_id") < 5).select("vec_id", emb_d.alias("embedding"))
    leaks = bench.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001)).alias("embedding"),
    )
    corpus = (
        emb.filter(F.col("vec_id") >= 5)
        .select("vec_id", emb_d.alias("embedding"))
        .unionByName(leaks)
    )
    return semantic_decontamination(corpus, bench, threshold=0.99)


# ---------------------------------------------------------------------
# 3. PQ + ADC top-k
# ---------------------------------------------------------------------

_PQ_D2 = (
    "round(list_sum(list_transform(range(1, 9), "
    "j -> (sv.v[j] - {cb}.c[j]) * (sv.v[j] - {cb}.c[j]))), 9)"
)

_PQ_ORACLE = f"""
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
), q AS (
  SELECT sub, v FROM sv WHERE vec_id = 0
), lut AS (
  SELECT cb1.sub, cb1.code,
         list_sum(list_transform(range(1, 9),
           j -> (q.v[j] - cb1.c[j]) * (q.v[j] - cb1.c[j]))) AS d2
  FROM cb1 JOIN q ON q.sub = cb1.sub
), adc AS (
  SELECT codes.vec_id, round(sum(lut.d2), 9) AS adc_d2
  FROM codes JOIN lut ON lut.sub = codes.sub AND lut.code = codes.code
  GROUP BY codes.vec_id
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, adc_d2 FROM (
  SELECT *, row_number() OVER (ORDER BY adc_d2, vec_id) AS rn FROM adc)
WHERE rn <= 10"""


@stage(
    "pq_adc_topk_embeddings",
    _PQ_ORACLE,
    "similarity: product-quantization ANN end-to-end — train m=8 / "
    "k_sub=4 codebooks (ONE deterministic k-means iteration, seeds = "
    "the first 4 vectors' subvectors), compress every vector to 8 "
    "codes, ADC top-10 for query vec 0. All assignments rank "
    "9dp-rounded squared distances with (d2, code) tie-breaks and the "
    "codebook update uses quantized-exact means, so the oracle's "
    "per-subspace k-means replay is engine-portable — the same "
    "determinism contract as kmeans_embeddings_2iter. Scale shape: "
    "assignment/encode/ADC are map-side expressions; the only "
    "driver-side data is the m x k_sub codebook.",
)
def pq_adc_topk_embeddings(spark, sf_dir):
    from .ext.similarity import pq_encode, pq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, dim=64, m=8, k_sub=4, iters=1)
    codes = pq_encode(emb, cbs)
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    return pq_topk(codes, cbs, q, k=10)


def staged_oracle(name: str) -> str:
    """Oracle SQL for a staged query (lazy for the bpe one: its CTE
    builder lives in queries_more)."""
    if name == "bpe_encode_documents":
        return _bpe_encode_oracle()
    return STAGED[name].oracle


# ---------------------------------------------------------------------
# 4. Bigram LM log-probability (perplexity-filter upgrade)
# ---------------------------------------------------------------------

_BIGRAM_ORACLE = """WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY w
), v AS (
  SELECT CAST(count(*) AS BIGINT) AS vsize FROM vocab
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
       round(sum(ln((CAST(c2.cnt2 AS DOUBLE) + 1)
                    / (CAST(u.cnt AS DOUBLE) + v.vsize))) / count(*), 6)
         AS avg_logprob
FROM bg
JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
JOIN vocab u ON u.w = bg.w1
CROSS JOIN v
GROUP BY bg.doc_id"""


@stage(
    "bigram_logprob_documents",
    _BIGRAM_ORACLE,
    "training-data op: BIGRAM LM log-probability quality score — each "
    "doc's mean ln P(w2|w1) under the corpus's own add-1-smoothed "
    "bigram model, the conditional upgrade over "
    "unigram_logprob_documents (a doc of common words in gibberish "
    "ORDER scores low here but fine there). Aggregations: bigram and "
    "unigram count tables (vocabulary-sized), then equi-joins back "
    "onto the doc bigram stream and one per-doc fold; the vocab-size "
    "scalar rides a 1-row broadcast. Counts and joins are exact ints; "
    "ln and the mean are float by nature -> round(6), the "
    "unigram_logprob convention. At 100 TB the bigram table gets a "
    "min-count cut exactly like the unigram vocab.",
)
def bigram_logprob_documents(spark, sf_dir):
    from .ext.text import tokens_col

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens_col(F.lower(F.col("text"))).alias("t"))
        .filter(F.size("t") >= 2)
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # optimization r15 (guide §5): bg feeds the bigram-count table AND
    # the final per-doc join, vocab feeds its own size and the unigram
    # join — unpersisted, each reference re-ran a corpus explode (4
    # corpus passes). Eager localCheckpoints compute each once
    # (per-doc output, so no driver collect).
    bg = bg.localCheckpoint()
    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens_col(F.lower(F.col("text")))).alias("w"))
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    vsize = vocab.agg(F.count(F.lit(1)).alias("vsize"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    logp = F.log(
        (F.col("cnt2").cast("double") + 1)
        / (F.col("cnt").cast("double") + F.col("vsize"))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(vocab.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(logp) / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------
# 5. PQ reconstruction error (compression QC)
# ---------------------------------------------------------------------

_PQ_RECON_ORACLE = f"""
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
), assigned AS (
  SELECT sub, code, d2 FROM (
    SELECT sv.sub, cb1.code, {_PQ_D2.format(cb="cb1")} AS d2,
           row_number() OVER (
             PARTITION BY sv.vec_id, sv.sub
             ORDER BY {_PQ_D2.format(cb="cb1")}, cb1.code) AS rn
    FROM sv JOIN cb1 ON cb1.sub = sv.sub)
  WHERE rn = 1
)
SELECT CAST(sub AS INTEGER) AS sub, CAST(code AS INTEGER) AS code,
       CAST(count(*) AS BIGINT) AS n_members,
       round(CAST(sum(CAST(round(d2 * 1e9) AS BIGINT)) AS DOUBLE)
             / 1e9 / count(*), 6) AS mean_d2
FROM assigned GROUP BY sub, code"""


@stage(
    "pq_reconstruction_error_embeddings",
    _PQ_RECON_ORACLE,
    "similarity QC: PQ RECONSTRUCTION ERROR per (subspace, code) — the "
    "compression-quality report that decides whether a codebook is "
    "trained enough before committing a 16-32x-smaller vector store. "
    "Same 1-iteration training replay as pq_adc_topk_embeddings; the "
    "assigned distance is the 9dp-rounded argmin the assignment "
    "already ranks, and per-cell means use the quantized-exact sum so "
    "accumulation order cannot flip a digit. Map-side assignment + one "
    "32-cell groupBy.",
)
def pq_reconstruction_error_embeddings(spark, sf_dir):
    from .ext.similarity import _pq_subvecs, _sq_dist_round9_sql, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, dim=64, m=8, k_sub=4, iters=1)
    sv = _pq_subvecs(emb, "embedding", "vec_id", m=8, sub_dim=8)

    # one parsed SQL expression per output column: nested HOF Column
    # construction costs ~100ms of py4j round-trips per distance fold
    # (see ext/similarity._sq_dist_round9_sql)
    code_parts, d2_parts = [], []
    for s, cb in enumerate(cbs):
        arr = "array(" + ", ".join(_sq_dist_round9_sql("svec", c) for c in cb) + ")"
        code_parts.append(
            f"WHEN sub = {s} THEN "
            f"CAST(array_position({arr}, array_min({arr})) - 1 AS INT)"
        )
        d2_parts.append(f"WHEN sub = {s} THEN array_min({arr})")
    code_expr = F.expr("CASE " + " ".join(code_parts) + " END")
    d2_expr = F.expr("CASE " + " ".join(d2_parts) + " END")

    return (
        sv.select(
            F.col("sub").cast("int").alias("sub"),
            code_expr.alias("code"),
            d2_expr.alias("d2"),
        )
        .groupBy("sub", "code")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum(F.round(F.col("d2") * F.lit(1e9)).cast("long")).cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1)),
                6,
            ).alias("mean_d2"),
        )
    )


# ---------------------------------------------------------------------
# 6. Per-day quantile verdicts (windowed monitoring, batch mirror)
# ---------------------------------------------------------------------

# rank tolerance must scale with the window: a fixed 0.01 is tighter
# than ONE rank step once a window holds < 100 rows (per-day windows at
# sf0.001 hold ~30), and DuckDB's t-digest interpolates between order
# statistics. Both engines apply the identical formula to the identical
# n, so the verdicts stay portable.
_WQ_TOL = "greatest(0.01, 2.5 / count(*))"


def _wq_rank_ok_sql(val: str, q: float) -> str:
    le = (
        f"CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) <= {val} "
        f"THEN 1 ELSE 0 END) AS DOUBLE) / count(*)"
    )
    lt = (
        f"CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) < {val} "
        f"THEN 1 ELSE 0 END) AS DOUBLE) / count(*)"
    )
    return f"({le} >= {q} - {_WQ_TOL} AND {lt} <= {q} + {_WQ_TOL})"


_WQ_ORACLE = f"""
WITH g AS (
  SELECT date_trunc('day', ts) AS day,
         approx_quantile(CAST(value AS DOUBLE), 0.5) AS v50,
         approx_quantile(CAST(value AS DOUBLE), 0.95) AS v95
  FROM events WHERE value IS NOT NULL GROUP BY day
)
SELECT CAST(floor(epoch(g.day)) AS BIGINT) AS day_epoch,
       CAST(count(*) AS BIGINT) AS n,
       {_wq_rank_ok_sql('g.v50', 0.5)} AS p50_ok,
       {_wq_rank_ok_sql('g.v95', 0.95)} AS p95_ok
FROM events e JOIN g ON date_trunc('day', e.ts) = g.day
WHERE e.value IS NOT NULL
GROUP BY g.day"""


@stage(
    "windowed_quantiles_events",
    _WQ_ORACLE,
    "windowed monitoring, batch mirror of "
    "streaming.windowed_value_quantiles: per-day p50/p95 of `value` "
    "via the mergeable percentile_approx sketch, each verdict "
    "self-verified against the day's true rank interval (the "
    "quantiles_lineitem_approx convention — engine sketches differ, "
    "rank guarantees are portable). Two shuffles on the day key, "
    "sketch state bounded per window; the streaming form adds only a "
    "watermark.",
)
def windowed_quantiles_events(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("value").cast("double").alias("v"),
        )
    )
    g = df.groupBy("day").agg(
        F.percentile_approx(
            F.col("v"), F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("ap")
    )
    j = df.join(F.broadcast(g), "day")
    n = F.count(F.lit(1))
    tol = F.greatest(F.lit(0.01), F.lit(2.5) / n.cast("double"))
    checks = []
    for i, (q, alias) in enumerate([(0.5, "p50_ok"), (0.95, "p95_ok")]):
        le = F.sum((F.col("v") <= F.col("ap")[i]).cast("long")).cast(
            "double"
        ) / n.cast("double")
        lt = F.sum((F.col("v") < F.col("ap")[i]).cast("long")).cast(
            "double"
        ) / n.cast("double")
        checks.append(
            ((le >= F.lit(q) - tol) & (lt <= F.lit(q) + tol)).alias(alias)
        )
    return (
        j.groupBy("day")
        .agg(n.alias("n"), *checks)
        .select(
            F.unix_timestamp("day").alias("day_epoch"),
            "n",
            "p50_ok",
            "p95_ok",
        )
    )
