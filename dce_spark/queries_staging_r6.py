"""ROUND-6 catalog queries — built and oracle-verified in round 5
while the round-5 catalog was frozen at 164, PROMOTED in round 6: the
loop at the bottom of queries_more.py registers all twenty and
``_DRIVER_WINDOW`` fronts them, so every entry gets a driver
CORRECTNESS row the same round it becomes live (the r1-r3
unchecked-tail lesson; identical protocol to queries_staging_r5.py's
round-5 promotion). This module remains the single source of truth
for fn + oracle + doc.

The entries extend round-5 library surfaces one step further:

- ``ivf_recall_vs_nprobe_embeddings`` — the IVF tuning curve:
  recall@10 vs nprobe (1..3), the companion to round-5's PQ recall.
- ``trigram_backoff_logprob_documents`` — stupid-backoff trigram LM
  scored on a HELD-OUT split (train on even doc_ids, score odd), so
  the backoff chain actually fires on unseen n-grams.
- ``vocab_coverage_documents`` — top-p vocabulary coverage (how many
  types cover 90/95/99% of token mass), the vocabulary-truncation
  statistic for tokenizer sizing.
- ``pack_efficiency_documents`` — fill/overflow report per bucket for
  the sequence-packing layout (pack_assign_documents' QC face).
- ``dedup_cluster_size_hist_documents`` — cluster-size histogram over
  the LSH connected components (dedup_clusters_documents' QC face).
- ``covariance_topvec_embeddings`` — top principal direction by two
  deterministic power-iteration steps (the kmeans determinism
  contract applied to PCA; building block for OPQ/whitening).
- ``source_js_divergence_documents`` — per-source Jensen-Shannon
  divergence from the corpus unigram distribution (data-mixing
  outlier signal; closed-form handling of absent words).
- ``sliding_window_counts_events`` — native F.window(length, slide)
  sliding windows cross-checked against an arithmetic oracle.
- ``asof_tolerance_join_events`` — as-of join with a freshness
  tolerance (stale matches NULL out; the market-data semantics).
- ``dedup_survivor_selection_documents`` — keep-longest survivor
  policy over the near-dup clusters (the curation decision dedup
  feeds).
- ``pca_variance_share_embeddings`` — top-eigenvalue variance share
  (the embedding-space collapse/anisotropy metric).
- ``pagerank_dedup_graph_documents`` — 2-iteration PageRank over the
  LSH candidate graph (boilerplate-hub detection, a signal connected
  components cannot give).
- ``heavy_hitters_global_support_events`` — the cross-shard
  global-support threshold derivation as running code (global N from
  the sketch's own per-shard totals).
- ``multimodal_payload_dedup`` — byte-identical media dedup through
  the binary-payload plumbing (digest-only shuffle, keep-min-id).
- ``cross_source_dup_rate_documents`` — near-dup pair matrix by
  source pair (ingestion-vs-data-mix contamination signal).
- ``constraint_violation_samples_events`` — first-5 offending rows
  per failed constraint (the debugging face of checks).
- ``gap_fill_daily_events`` — calendar-spine resample with explicit
  zero-filled missing days.
- ``lsh_precision_documents`` — candidate precision of the LSH bands
  (the tuning companion to banding recall).
- ``rare_token_ratio_documents`` — per-doc fraction of corpus-rare
  tokens (mojibake/OCR-garbage detector; the operational face of
  min-count vocab cuts).
- ``pareto_revenue_share_lineitem`` — revenue concentration (ABC /
  Pareto front over parts, exact int basis points).

tests/test_staging_r6.py runs these through the SAME compare harness
as the live catalog (exact column order, canonical dtypes, sorted
values) at the suite's SF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from .data import load_table, local_result

STAGED_R6: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R6[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---------------------------------------------------------------------
# 1. IVF recall@10 vs nprobe (the tuning curve)
# ---------------------------------------------------------------------

# list-ordered cosine (the embedding_cosine_topk convention): in-order
# list_sum mirrors Spark's aggregate fold; round(6) + id tie-breaks
# make the top-10 sets engine-portable.
_R6_COS = (
    "round(list_sum(list_transform(range(1, 65),"
    " i -> CAST(e.embedding[i] AS DOUBLE) * qv.v[i]))"
    " / (sqrt(list_sum(list_transform(range(1, 65),"
    " i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65),"
    " i -> qv.v[i] * qv.v[i])))), 6)"
)

_IVF_RECALL_ORACLE = f"""
WITH cent AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(t.pos AS BIGINT) AS pos,
         CAST(sum(CAST(round(CAST(embedding[t.pos + 1] AS DOUBLE) * 1e9)
                       AS BIGINT)) AS DOUBLE) / 1e9
           / CAST(count(*) AS DOUBLE) AS c
  FROM embeddings, range(0, 64) t(pos)
  GROUP BY label, t.pos
), qv AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 3
), cs AS (
  SELECT qv.qid, cent.label,
         round(sum(cent.c * qv.v[cent.pos + 1])
               / (sqrt(sum(cent.c * cent.c))
                  * sqrt(sum(qv.v[cent.pos + 1] * qv.v[cent.pos + 1]))),
               6) AS cell_cos
  FROM cent, qv GROUP BY qv.qid, cent.label
), ranked AS (
  SELECT qid, label,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cell_cos DESC, label) AS rk
  FROM cs
), np AS (
  SELECT unnest([1, 2, 3]) AS nprobe
), cosims AS (
  SELECT qv.qid, e.vec_id, e.label, {_R6_COS} AS cos_sim
  FROM embeddings e, qv WHERE e.vec_id <> qv.qid
), exk AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY cos_sim DESC, vec_id) AS rn
    FROM cosims)
  WHERE rn <= 10
), ivfk AS (
  SELECT nprobe, qid, vec_id FROM (
    SELECT np.nprobe, c.qid, c.vec_id,
           row_number() OVER (PARTITION BY np.nprobe, c.qid
                              ORDER BY c.cos_sim DESC, c.vec_id) AS rn
    FROM cosims c
    JOIN ranked r ON r.qid = c.qid AND r.label = c.label
    CROSS JOIN np
    WHERE r.rk <= np.nprobe)
  WHERE rn <= 10
), hits AS (
  SELECT i.nprobe, i.qid, CAST(count(*) AS BIGINT) AS hit
  FROM ivfk i JOIN exk x ON x.qid = i.qid AND x.vec_id = i.vec_id
  GROUP BY i.nprobe, i.qid
)
SELECT CAST(np.nprobe AS INTEGER) AS nprobe,
       round(CAST(sum(coalesce(h.hit, 0)) AS DOUBLE) / 30, 6) AS mean_recall
FROM np CROSS JOIN qv
LEFT JOIN hits h ON h.nprobe = np.nprobe AND h.qid = qv.qid
GROUP BY np.nprobe"""


@stage(
    "ivf_recall_vs_nprobe_embeddings",
    _IVF_RECALL_ORACLE,
    "similarity QC: the IVF TUNING CURVE — recall@10 against exact "
    "search for nprobe = 1, 2, 3 (mean over 3 query vectors), the "
    "companion to pq_recall_at_k_embeddings on the coarse-quantizer "
    "axis: nprobe is the knob that trades files touched (~nprobe / "
    "n_cells of a cell-partitioned corpus) for recall, and this is "
    "the number you read while turning it. Cells = per-label "
    "quantized-mean centroids (the embedding_centroids_by_label "
    "machinery); cell ranking, candidate top-10 and exact top-10 all "
    "use round-6 cosine with id tie-breaks, so both engines derive "
    "identical sets. Scale shape: centroids are metadata-sized and "
    "driver-held, each probe is a cell-filtered TakeOrdered scan, and "
    "the exact pass exists only because a recall harness needs ground "
    "truth — sampled queries, never the full log.",
)
def ivf_recall_vs_nprobe_embeddings(spark, sf_dir):
    import math

    from .ext.similarity import cosine_topk
    from .queries import _ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cents = _ivf_centroids(spark, sf_dir)

    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
        )

    qrows = sorted(
        emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    ivf_parts, ex_parts = [], []
    for r in qrows:
        qid = int(r["vec_id"])
        q = [float(x) for x in r["embedding"]]
        ranked = sorted(cents, key=lambda lbl: (-round(cos_py(cents[lbl], q), 6), lbl))
        rest = emb.filter(F.col("vec_id") != qid)
        ex_parts.append(
            cosine_topk(rest, q, k=10).select(
                F.lit(qid).cast("long").alias("qid"), "vec_id"
            )
        )
        for nprobe in (1, 2, 3):
            cells = [int(c) for c in ranked[:nprobe]]
            ivf_parts.append(
                cosine_topk(rest.filter(F.col("label").isin(cells)), q, k=10).select(
                    F.lit(nprobe).cast("int").alias("nprobe"),
                    F.lit(qid).cast("long").alias("qid"),
                    "vec_id",
                )
            )
    from functools import reduce

    ivf_all = reduce(lambda a, b: a.unionByName(b), ivf_parts)
    ex_all = reduce(lambda a, b: a.unionByName(b), ex_parts)
    return (
        ivf_all.join(ex_all.withColumn("hit", F.lit(1)), ["qid", "vec_id"], "left")
        .groupBy("nprobe")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double") / F.lit(30),
                6,
            ).alias("mean_recall")
        )
    )


# ---------------------------------------------------------------------
# 2. Stupid-backoff trigram LM on a held-out split
# ---------------------------------------------------------------------

_TRI_ORACLE = """WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), train AS (
  SELECT t FROM toks WHERE doc_id % 2 = 0
), c1 AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(t) AS w FROM train) GROUP BY w
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t FROM c1
), c2 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_slice(t, 1, len(t) - 1)) AS w1,
               unnest(list_slice(t, 2, len(t))) AS w2
        FROM train WHERE len(t) >= 2)
  GROUP BY w1, w2
), c3 AS (
  SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(list_slice(t, 1, len(t) - 2)) AS w1,
               unnest(list_slice(t, 2, len(t) - 1)) AS w2,
               unnest(list_slice(t, 3, len(t))) AS w3
        FROM train WHERE len(t) >= 3)
  GROUP BY w1, w2, w3
), tg AS (
  SELECT doc_id,
         unnest(list_slice(t, 1, len(t) - 2)) AS w1,
         unnest(list_slice(t, 2, len(t) - 1)) AS w2,
         unnest(list_slice(t, 3, len(t))) AS w3
  FROM toks WHERE doc_id % 2 = 1 AND len(t) >= 3
), scored AS (
  SELECT tg.doc_id,
         CASE
           WHEN c3.cnt IS NOT NULL
             THEN CAST(c3.cnt AS DOUBLE) / c12.cnt
           WHEN c23.cnt IS NOT NULL
             THEN 0.4 * (CAST(c23.cnt AS DOUBLE) / u2.cnt)
           WHEN u3.cnt IS NOT NULL
             THEN 0.16 * (CAST(u3.cnt AS DOUBLE) / tot.t)
           ELSE 0.16 * (0.5 / tot.t)
         END AS s
  FROM tg
  LEFT JOIN c3 ON c3.w1 = tg.w1 AND c3.w2 = tg.w2 AND c3.w3 = tg.w3
  LEFT JOIN c2 c12 ON c12.w1 = tg.w1 AND c12.w2 = tg.w2
  LEFT JOIN c2 c23 ON c23.w1 = tg.w2 AND c23.w2 = tg.w3
  LEFT JOIN c1 u2 ON u2.w = tg.w2
  LEFT JOIN c1 u3 ON u3.w = tg.w3
  CROSS JOIN tot
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       round(sum(ln(s)) / count(*), 6) AS avg_logprob
FROM scored GROUP BY doc_id"""


@stage(
    "trigram_backoff_logprob_documents",
    _TRI_ORACLE,
    "training-data op: STUPID-BACKOFF trigram LM score on a HELD-OUT "
    "split — counts from even doc_ids, scores for odd doc_ids, so the "
    "backoff chain (trigram MLE -> 0.4 x bigram -> 0.16 x unigram -> "
    "0.16 x 0.5/T floor) actually fires on unseen n-grams instead of "
    "degenerating to the trigram branch (scoring the corpus it was "
    "counted on always hits c3 > 0 — the round-5 interp_logprob "
    "lesson taken one step further). This split-eval shape is the "
    "honest perplexity filter for pretraining data. Aggregation "
    "shapes: three count tables from the train split, five equi-joins "
    "back onto the scored trigram stream, 1-row token-total "
    "broadcast; ln/mean float-accumulated -> round(6). At 100 TB the "
    "count tables get min-count cuts and the surviving vocab "
    "broadcasts.",
)
def trigram_backoff_logprob_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col(F.lower(F.col("text"))).alias("t")
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)

    def ngrams(df, n, with_doc=False):
        cols = [
            F.expr(f"slice(t, {i + 1}, size(t) - {n - 1})").alias(f"w{i + 1}")
            for i in range(n)
        ]
        z = F.explode(F.arrays_zip(*cols)).alias("g")
        sel = (["doc_id"] if with_doc else []) + [
            F.col(f"g.w{i + 1}").alias(f"w{i + 1}") for i in range(n)
        ]
        return df.filter(F.size("t") >= n).select(*([z] if not with_doc else ["doc_id", z])).select(*sel)

    # optimization r15 (guide §5): c1 is read by the total + two
    # unigram backoff sides, c2 by both bigram sides — unpersisted,
    # every reference re-ran a full training-corpus n-gram explode.
    # Eager localCheckpoints compute each count table once (per-doc
    # output downstream, so no driver collect).
    c1 = (
        train.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    tot = c1.agg(F.sum("cnt").alias("t"))
    c2 = (
        ngrams(train, 2)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    c3 = (
        ngrams(train, 3)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tg = ngrams(docs.filter(F.col("doc_id") % 2 == 1), 3, with_doc=True)

    j = (
        tg.join(
            c3.select("w1", "w2", "w3", F.col("cnt").alias("c3")),
            ["w1", "w2", "w3"],
            "left",
        )
        .join(
            c2.select(
                F.col("w1"), F.col("w2"), F.col("cnt").alias("c12")
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            c2.select(
                F.col("w1").alias("w2"),
                F.col("w2").alias("w3"),
                F.col("cnt").alias("c23"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(c1.select(F.col("w").alias("w2"), F.col("cnt").alias("u2")), "w2", "left")
        .join(c1.select(F.col("w").alias("w3"), F.col("cnt").alias("u3")), "w3", "left")
        .crossJoin(F.broadcast(tot))
    )
    s = (
        F.when(F.col("c3").isNotNull(), F.col("c3").cast("double") / F.col("c12"))
        .when(
            F.col("c23").isNotNull(),
            F.lit(0.4) * (F.col("c23").cast("double") / F.col("u2")),
        )
        .when(
            F.col("u3").isNotNull(),
            F.lit(0.16) * (F.col("u3").cast("double") / F.col("t")),
        )
        .otherwise(F.lit(0.16) * (F.lit(0.5) / F.col("t")))
    )
    return (
        j.select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.sum(F.log("s")) / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------
# 3. Top-p vocabulary coverage
# ---------------------------------------------------------------------

_VOCAB_COV_ORACLE = """WITH words AS (
  SELECT unnest(list_filter(string_split_regex(lower(text),
           '[[:space:]]+'), x -> x <> '')) AS w
  FROM documents
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY w
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS n_types
  FROM vocab
), cum AS (
  SELECT sum(cnt) OVER (ORDER BY cnt DESC, w
                        ROWS UNBOUNDED PRECEDING) AS cm,
         row_number() OVER (ORDER BY cnt DESC, w) AS rk
  FROM vocab
)
SELECT CAST(coverage_p AS DOUBLE) AS coverage_p,
       CAST(min(CASE WHEN CAST(cm AS DOUBLE) >= CAST(coverage_p AS DOUBLE) * tot.t
                     THEN rk END) AS BIGINT) AS n_types_needed,
       CAST(min(tot.n_types) AS BIGINT) AS total_types
FROM cum CROSS JOIN tot
CROSS JOIN (SELECT unnest([0.90, 0.95, 0.99]) AS coverage_p)
GROUP BY coverage_p"""


@stage(
    "vocab_coverage_documents",
    _VOCAB_COV_ORACLE,
    "tokenizer sizing: TOP-P VOCABULARY COVERAGE — the smallest number "
    "of word types whose occurrence mass reaches 90/95/99% of all "
    "tokens. This is the statistic behind vocabulary truncation "
    "decisions (how big a tokenizer vocab must be before <unk>/byte "
    "fallback is rare) and the min-count cuts every LM count table in "
    "this catalog references. Determinism: cumulative mass ranked by "
    "(cnt DESC, word) — exact BIGINT cumsum, unique tie-break; the "
    "three thresholds are conditional MINs over one ranked pass. "
    "Scale shape: one vocab groupBy, then a rank over the VOCABULARY "
    "(not the corpus) — ~1e7-1e8 rows at 100 TB; Spark executes the "
    "unpartitioned window single-partition, fine at vocab scale, and "
    "a range-partitioned two-pass cumsum is the swap-in if a byte-"
    "level vocab ever explodes it.",
)
def vocab_coverage_documents(spark, sf_dir):
    from .ext.text import tokens_col

    words = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens_col(F.lower(F.col("text")))).alias("w"))
    )
    # optimization r15 (guide §5): vocab feeds the totals and the
    # cumulative window — checkpoint computes the corpus tokenize +
    # vocab groupBy once.
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    tot = vocab.agg(
        F.sum("cnt").alias("t"), F.count(F.lit(1)).alias("n_types")
    )
    w = Window.orderBy(F.desc("cnt"), "w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rw = Window.orderBy(F.desc("cnt"), "w")
    cum = vocab.select(
        F.sum("cnt").over(w).alias("cm"),
        F.row_number().over(rw).alias("rk"),
    )
    base = cum.crossJoin(F.broadcast(tot))
    aggs = []
    for p in (0.90, 0.95, 0.99):
        aggs.append(
            F.min(
                F.when(
                    F.col("cm").cast("double") >= F.lit(p) * F.col("t"),
                    F.col("rk"),
                )
            ).alias(f"n_{int(round(p * 100))}")
        )
    one = base.groupBy().agg(*aggs, F.min("n_types").alias("total_types"))
    # optimization r15 (guide §5): the three per-coverage projections
    # of the SAME 1-row aggregate each re-ran the whole pipeline under
    # the union — collect the row once and emit the 3 literals.
    r = one.collect()[0]
    return spark.createDataFrame(
        [
            (p, int(r[f"n_{int(round(p * 100))}"]), int(r["total_types"]))
            for p in (0.90, 0.95, 0.99)
        ],
        schema="coverage_p double, n_types_needed bigint, "
               "total_types bigint",
    )


# ---------------------------------------------------------------------
# 4. Sequence-packing efficiency report
# ---------------------------------------------------------------------


def _pack_eff_oracle() -> str:
    from .queries import QUERIES

    base = QUERIES["pack_assign_documents"].oracle
    return f"""WITH packs AS ({base}),
pk AS (
  SELECT bucket, pack_id, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
  FROM packs GROUP BY bucket, pack_id
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
       CAST(min(pack_tokens) AS BIGINT) AS min_pack_tokens,
       CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens
FROM pk GROUP BY bucket"""


@stage(
    "pack_efficiency_documents",
    "",  # resolved lazily via staged_oracle (needs QUERIES registry)
    "LLM-pipeline QC: SEQUENCE-PACKING EFFICIENCY — per hash bucket, "
    "how full the 2048-token training packs from "
    "pack_assign_documents actually are (pack count, token totals, "
    "min/max pack fill). min < 2048 happens only for each bucket's "
    "tail pack; max > 2048 bounds the documented <one-document "
    "overflow. This is the report that decides whether the pack "
    "budget or the bucket count needs retuning before a training run "
    "wastes accelerator hours on padding. Same window-cumsum shape as "
    "the assignment itself (per-bucket parallelism), then two "
    "bucket-local groupBys — no new shuffle risk at 100 TB.",
)
def pack_efficiency_documents(spark, sf_dir):
    from .queries import QUERIES

    packs = QUERIES["pack_assign_documents"].fn(spark, sf_dir)
    pk = packs.groupBy("bucket", "pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens")
    )
    return pk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("pack_tokens").alias("total_tokens"),
        F.min("pack_tokens").alias("min_pack_tokens"),
        F.max("pack_tokens").alias("max_pack_tokens"),
    )


# ---------------------------------------------------------------------
# 5. Dedup cluster-size histogram
# ---------------------------------------------------------------------


def _cluster_hist_oracle() -> str:
    from .queries import QUERIES

    base = QUERIES["dedup_clusters_documents"].oracle
    # the base oracle is WITH RECURSIVE ... <final SELECT>; fold its
    # final SELECT into one more CTE and aggregate on top
    head, tail = base.rsplit("SELECT CAST(a AS BIGINT)", 1)
    return (
        head
        + ", clusters AS (SELECT CAST(a AS BIGINT)"
        + tail
        + """)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM (SELECT cluster_id, count(*) AS sz FROM clusters GROUP BY cluster_id)
GROUP BY sz"""
    )


@stage(
    "dedup_cluster_size_hist_documents",
    "",  # resolved lazily via staged_oracle (needs QUERIES registry)
    "dedup QC: CLUSTER-SIZE HISTOGRAM over the MinHash-LSH connected "
    "components — how many duplicate clusters of each size the corpus "
    "holds. The distribution is the dedup health check a curation run "
    "reads before choosing keep-one-per-cluster policy: a fat tail of "
    "large clusters means boilerplate/templates (candidates for "
    "removal wholesale), many 2-clusters means true near-dups. "
    "Composition: the exact clustering operator "
    "(dedup_clusters_documents — pointer-jumping at scale, recursive "
    "CTE in the oracle) plus two metadata-sized groupBys on its "
    "(doc_id, cluster_id) output; no new scale surface.",
)
def dedup_cluster_size_hist_documents(spark, sf_dir):
    from .queries import QUERIES

    clusters = QUERIES["dedup_clusters_documents"].fn(spark, sf_dir)
    sz = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    return sz.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


# ---------------------------------------------------------------------
# 6. Top principal direction via deterministic power iteration
# ---------------------------------------------------------------------

_POW_MU = """e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings
), pe AS (
  SELECT vec_id, t.pos, x[t.pos + 1] AS v FROM e, range(0, 64) t(pos)
), mu AS (
  SELECT pos,
         CAST(sum(CAST(round(v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
           / count(*) AS m,
         CAST(count(*) AS BIGINT) AS n
  FROM pe GROUP BY pos
), mul AS (
  SELECT list(m ORDER BY pos) AS ml, min(n) AS n FROM mu
)"""


def _pow_iter_sql(v_expr: str, s_name: str, w_name: str) -> str:
    """One power-iteration step: s_i = (x_i - mu) . v, then
    w_j = quantized-exact mean of (x_ij - mu_j) * s_i."""
    return f""", {s_name} AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, 65),
           j -> (e.x[j] - mul.ml[j]) * {v_expr})) AS s
  FROM e, mul
), {w_name} AS (
  SELECT pe.pos,
         CAST(sum(CAST(round((pe.v - mul.ml[pe.pos + 1]) * {s_name}.s * 1e6)
                       AS BIGINT)) AS DOUBLE) / 1e6 / mul.n AS w
  FROM pe JOIN {s_name} USING (vec_id) CROSS JOIN mul
  GROUP BY pe.pos, mul.n
)"""


_POW_ORACLE = (
    "WITH "
    + _POW_MU
    + _pow_iter_sql("0.125", "s1", "w1")
    + ", w1l AS (SELECT list(w ORDER BY pos) AS wl FROM w1)"
    + _pow_iter_sql("w1l.wl[j]", "s2", "w2").replace(
        "FROM e, mul\n)", "FROM e, mul, w1l\n)", 1
    )
    + """, nrm AS (
  SELECT sqrt(list_sum(list_transform(wl2, y -> y * y))) AS nm
  FROM (SELECT list(w ORDER BY pos) AS wl2 FROM w2)
)
SELECT CAST(pos AS INTEGER) AS pos, round(w / nrm.nm, 6) AS component
FROM w2, nrm"""
)


@stage(
    "covariance_topvec_embeddings",
    _POW_ORACLE,
    "iterative ML: TOP PRINCIPAL DIRECTION of the 64-dim embedding "
    "covariance by two deterministic POWER-ITERATION steps (v0 = "
    "uniform 1/8 vector, no intermediate normalization — 2 steps need "
    "none; final vector unit-normalized, round-6). C.v is computed "
    "WITHOUT materializing C: s_i = (x_i - mu).v per row (in-order "
    "list fold), then w_j = quantized-exact mean of (x_ij - mu_j) * "
    "s_i — the kmeans_embeddings_2iter determinism contract applied "
    "to PCA, so the oracle replays both iterations bit-identically "
    "(quantized sums make the intermediate vector exact; the final "
    "norm folds the 64 components in pos order on both engines). "
    "This is the building block for OPQ-style rotations and "
    "whitening. Scale shape: per iteration one narrow map pass + one "
    "64-group aggregate; driver state is the 64-float vector.",
)
def covariance_topvec_embeddings(spark, sf_dir):
    from .ext.similarity import pca_top_direction

    emb = load_table(spark, sf_dir, "embeddings")
    v = pca_top_direction(emb, dim=64, iters=2)
    return spark.createDataFrame(
        [(i, round(v[i], 6)) for i in range(64)],
        schema="pos int, component double",
    )



# ---------------------------------------------------------------------
# 7. Per-source Jensen-Shannon divergence from the corpus distribution
# ---------------------------------------------------------------------

# JS(p_src, q_corpus) = 0.5 KL(p||m) + 0.5 KL(q||m), m = (p+q)/2.
# Words ABSENT from a source (p=0) contribute 0.5 * q_w * ln 2 on the
# q side and 0 on the p side, so the full source x vocab grid is never
# needed: sum the two KL terms over the source's own words, then add
# 0.5 * ln 2 * (1 - Q_src) where Q_src is the corpus-probability mass
# of the source's words.
_JS_TERM = (
    "0.5 * p * ln(p / (0.5 * (p + q))) + 0.5 * q * ln(q / (0.5 * (p + q)))"
)

_JS_ORACLE = f"""WITH words AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text),
           '[[:space:]]+'), x -> x <> '')) AS w
  FROM documents
), sw AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM words
  GROUP BY source, w
), stot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS st FROM sw GROUP BY source
), cw AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS cc FROM sw GROUP BY w
), ctot AS (
  SELECT CAST(sum(cc) AS BIGINT) AS ct FROM cw
), terms AS (
  SELECT sw.source,
         CAST(sw.c AS DOUBLE) / stot.st AS p,
         CAST(cw.cc AS DOUBLE) / ctot.ct AS q
  FROM sw
  JOIN stot ON stot.source = sw.source
  JOIN cw ON cw.w = sw.w
  CROSS JOIN ctot
)
SELECT t.source,
       stot.st AS n_tokens,
       round(sum({_JS_TERM}) + 0.5 * ln(2.0) * (1.0 - sum(q)), 6)
         AS js_divergence
FROM terms t JOIN stot ON stot.source = t.source
GROUP BY t.source, stot.st"""


@stage(
    "source_js_divergence_documents",
    _JS_ORACLE,
    "curation signal: per-source JENSEN-SHANNON DIVERGENCE between "
    "each source's unigram distribution and the whole corpus's — the "
    "'which source is an outlier' number a data-mixing run reads "
    "before reweighting (symmetric, bounded by ln 2, robust to "
    "disjoint supports — unlike KL). Words a source never uses are "
    "handled in closed form (0.5 ln2 x their corpus mass), so the "
    "computation never builds a source x vocab grid: one (source, "
    "word) count table, a word-marginal join, and a per-source sum — "
    "two shuffles on word-sized keys, float-accumulated -> round(6). "
    "At 100 TB the same min-count vocab cut as every LM table applies "
    "(tail mass folds into the closed-form remainder).",
)
def source_js_divergence_documents(spark, sf_dir):
    from .ext.text import tokens_col

    words = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    )
    # optimization r15 (guide §5): sw feeds the per-source totals, the
    # corpus totals, and the JS terms — persist, materialize the
    # per-source rollup eagerly, unpersist.
    sw = (
        words.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    stot = sw.groupBy("source").agg(F.sum("c").alias("st"))
    cw = sw.groupBy("w").agg(F.sum("c").alias("cc"))
    ctot = cw.agg(F.sum("cc").alias("ct"))
    terms = (
        sw.join(stot, "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            "st",
            (F.col("c").cast("double") / F.col("st")).alias("p"),
            (F.col("cc").cast("double") / F.col("ct")).alias("q"),
        )
    )
    m = F.lit(0.5) * (F.col("p") + F.col("q"))
    term = F.lit(0.5) * F.col("p") * F.log(F.col("p") / m) + F.lit(0.5) * F.col(
        "q"
    ) * F.log(F.col("q") / m)
    import math

    out = (
        terms.groupBy("source", "st")
        .agg(
            F.round(
                F.sum(term)
                + F.lit(0.5 * math.log(2.0)) * (F.lit(1.0) - F.sum("q")),
                6,
            ).alias("js_divergence")
        )
        .select(
            "source", F.col("st").alias("n_tokens"), "js_divergence"
        )
    )
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, sw)


# ---------------------------------------------------------------------
# 8. Sliding (overlapping) window counts
# ---------------------------------------------------------------------

_SLIDE_ORACLE = """WITH ev AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
), wins AS (
  SELECT (es // 900) * 900 - k.k * 900 AS wstart
  FROM ev, (SELECT unnest(range(0, 4)) AS k) k
  WHERE (es // 900) * 900 - k.k * 900 > es - 3600
)
SELECT CAST(wstart AS BIGINT) AS window_epoch,
       CAST(count(*) AS BIGINT) AS n
FROM wins GROUP BY wstart"""


@stage(
    "sliding_window_counts_events",
    _SLIDE_ORACLE,
    "time-series op: SLIDING-WINDOW counts — every event lands in the "
    "four overlapping 1h windows that slide by 15min (Spark's "
    "F.window(ts, '1 hour', '15 minutes') semantics: epoch-aligned "
    "starts, start <= t < start + 1h), closing the window-family gap "
    "next to the tumbling form (tumbling_window_counts_events). The "
    "oracle derives each event's four member windows arithmetically; "
    "Spark uses the native window generator — cross-checking the "
    "ENGINE's sliding-window expansion against first principles, not "
    "just against itself. Scale shape: the expansion is a map-side "
    "4x explode fused into the scan, then one groupBy on the window "
    "start; identical to the streaming windowed aggregation's batch "
    "face with slide < length.",
)
def sliding_window_counts_events(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_epoch"), "n"
        )
    )


# ---------------------------------------------------------------------
# 9. As-of join with freshness tolerance
# ---------------------------------------------------------------------

_ASOF_TOL_ORACLE = """WITH u AS (
  SELECT user_id, ts, event_id, (event_type = 'click') AS is_c
  FROM events WHERE event_type IN ('click', 'error')
), m AS (
  SELECT event_id, user_id, ts, is_c,
         last_value(CASE WHEN is_c THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_id,
         last_value(CASE WHEN is_c THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_ts
  FROM u
)
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(CASE WHEN m_ts >= ts - INTERVAL 2 HOUR THEN m_id END AS BIGINT)
         AS last_click_id
FROM m WHERE NOT is_c"""


@stage(
    "asof_tolerance_join_events",
    _ASOF_TOL_ORACLE,
    "time-series op: AS-OF JOIN WITH FRESHNESS TOLERANCE - each "
    "'error' event gets the most recent prior 'click' of the same "
    "user ONLY if it happened within the last 2 hours, else NULL "
    "(the market-data/telemetry semantics: most recent quote, but "
    "only if fresh - a stale match is worse than no match). Same "
    "union + single window shuffle as asof_join_events; the matched "
    "row's own timestamp rides the window state as a struct, so the "
    "staleness check is one map-side comparison, never a range join. "
    "All three outcomes (no prior click, stale click, fresh click) "
    "are populated at both verification SFs.",
)
def asof_tolerance_join_events(spark, sf_dir):
    from .ext.timeseries import asof_join

    df = load_table(spark, sf_dir, "events")
    errors = df.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value="event_id",
        tiebreak="event_id",
        value_alias="last_click_id",
        tolerance="2 HOURS",
    )
    return out.select("event_id", "user_id", "last_click_id")


# ---------------------------------------------------------------------
# 10. Dedup survivor selection (keep-best policy)
# ---------------------------------------------------------------------


def _survivor_oracle() -> str:
    from .queries import QUERIES

    base = QUERIES["dedup_clusters_documents"].oracle
    head, tail = base.rsplit("SELECT CAST(a AS BIGINT)", 1)
    return (
        head
        + ", clusters AS (SELECT CAST(a AS BIGINT)"
        + tail
        + """)
SELECT cluster_id,
       CAST(n_members AS BIGINT) AS n_members,
       survivor_doc,
       CAST(survivor_chars AS BIGINT) AS survivor_chars
FROM (
  SELECT c.cluster_id,
         count(*) OVER (PARTITION BY c.cluster_id) AS n_members,
         c.doc_id AS survivor_doc,
         d.n_chars AS survivor_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
) WHERE rn = 1"""
    )


@stage(
    "dedup_survivor_selection_documents",
    "",  # resolved lazily via staged_oracle (needs QUERIES registry)
    "dedup policy: SURVIVOR SELECTION - for every near-dup cluster "
    "(the MinHash-LSH connected components), keep the LONGEST member "
    "(n_chars, doc_id tie-break) instead of the arbitrary min-id the "
    "clustering itself reports. This is the curation decision dedup "
    "exists to feed: near-dup groups usually contain one full "
    "document and several truncated/boilerplate variants, and "
    "keep-longest (or keep-highest-quality - swap the ranking column) "
    "decides which survives. Composition: the exact clustering "
    "operator + a broadcast-sized metadata join + one per-cluster "
    "window rank; no new scale surface beyond the clusters "
    "themselves.",
)
def dedup_survivor_selection_documents(spark, sf_dir):
    from .queries import QUERIES

    clusters = QUERIES["dedup_clusters_documents"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = clusters.join(docs, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), "doc_id"
    )
    cw = Window.partitionBy("cluster_id")
    return (
        j.select(
            "cluster_id",
            F.count(F.lit(1)).over(cw).alias("n_members"),
            F.col("doc_id").alias("survivor_doc"),
            F.col("n_chars").alias("survivor_chars"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------
# 11. Top-eigenvalue variance share (embedding-space collapse metric)
# ---------------------------------------------------------------------

_POW_SHARE_ORACLE = (
    "WITH "
    + _POW_MU
    + _pow_iter_sql("0.125", "s1", "w1")
    + ", w1l AS (SELECT list(w ORDER BY pos) AS wl FROM w1)"
    + _pow_iter_sql("w1l.wl[j]", "s2", "w2").replace(
        "FROM e, mul\n)", "FROM e, mul, w1l\n)", 1
    )
    + """, v2n AS (
  SELECT list_transform(wl2, y -> y / nm) AS v
  FROM (SELECT wl2, sqrt(list_sum(list_transform(wl2, y -> y * y))) AS nm
        FROM (SELECT list(w ORDER BY pos) AS wl2 FROM w2))
), s3 AS (
  SELECT e.vec_id,
         list_sum(list_transform(range(1, 65),
           j -> (e.x[j] - mul.ml[j]) * v2n.v[j])) AS s
  FROM e, mul, v2n
), lam AS (
  SELECT CAST(sum(CAST(round(s * s * 1e6) AS BIGINT)) AS DOUBLE)
           / 1e6 / mul.n AS l1
  FROM s3 CROSS JOIN mul GROUP BY mul.n
), pv AS (
  SELECT pe.pos,
         CAST(sum(CAST(round((pe.v - mul.ml[pe.pos + 1])
                             * (pe.v - mul.ml[pe.pos + 1]) * 1e6)
                       AS BIGINT)) AS DOUBLE) / 1e6 / mul.n AS var
  FROM pe CROSS JOIN mul GROUP BY pe.pos, mul.n
), tot AS (
  SELECT list_sum(vl) AS tv
  FROM (SELECT list(var ORDER BY pos) AS vl FROM pv)
)
SELECT round(lam.l1, 6) AS top_eig,
       round(tot.tv, 6) AS total_var,
       round(lam.l1 / tot.tv, 6) AS top_share
FROM lam, tot"""
)


@stage(
    "pca_variance_share_embeddings",
    _POW_SHARE_ORACLE,
    "embedding QC: TOP-EIGENVALUE VARIANCE SHARE - the Rayleigh "
    "quotient v'Cv of the power-iteration direction over the total "
    "variance (trace of C). This is the collapse/anisotropy metric "
    "for an embedding space: share -> 1/dim means a healthy isotropic "
    "space, share -> 1 means the embedder is collapsing onto one "
    "axis and downstream cosine similarity is degenerating - the "
    "number to watch across model or corpus snapshots. Same "
    "deterministic power replay as covariance_topvec_embeddings plus "
    "one more pass: lambda1 = quantized-exact mean of ((x - mu) . "
    "v)^2, per-dimension variances quantized-exact and summed in pos "
    "order. Scale shape: three narrow passes + 64-group aggregates; "
    "driver state is one 64-float vector.",
)
def pca_variance_share_embeddings(spark, sf_dir):
    from .ext.similarity import _as_literal_array, pca_top_direction

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("x"),
    )
    v = pca_top_direction(
        load_table(spark, sf_dir, "embeddings"), dim=64, iters=2
    )
    pe = emb.select(F.posexplode("x").alias("pos", "vv"))
    mu_rows = (
        pe.groupBy("pos")
        .agg(
            (
                F.sum(F.round(F.col("vv") * F.lit(1e9)).cast("long")).cast(
                    "double"
                )
                / F.lit(1e9)
                / F.count(F.lit(1))
            ).alias("m"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    mu = [0.0] * 64
    for r in mu_rows:
        mu[r["pos"]] = float(r["m"])
    n = int(mu_rows[0]["n"])
    mu_lit = _as_literal_array(mu)
    v_lit = _as_literal_array(v)

    xd = F.zip_with(F.col("x"), mu_lit, lambda a, b: a - b)
    staged = emb.select(xd.alias("xd"))
    s = F.aggregate(
        F.zip_with(F.col("xd"), v_lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    lam = (
        staged.select(s.alias("s"))
        .agg(
            (
                F.sum(
                    F.round(F.col("s") * F.col("s") * F.lit(1e6)).cast("long")
                ).cast("double")
                / F.lit(1e6)
                / F.lit(n)
            ).alias("l1")
        )
        .collect()[0]["l1"]
    )
    var_rows = (
        staged.select(F.posexplode("xd").alias("pos", "d"))
        .groupBy("pos")
        .agg(
            (
                F.sum(
                    F.round(F.col("d") * F.col("d") * F.lit(1e6)).cast("long")
                ).cast("double")
                / F.lit(1e6)
                / F.lit(n)
            ).alias("var")
        )
        .collect()
    )
    var = [0.0] * 64
    for r in var_rows:
        var[r["pos"]] = float(r["var"])
    tv = 0.0
    for y in var:  # in-pos-order fold == the oracle's ordered list_sum
        tv = tv + y
    return spark.createDataFrame(
        [(round(float(lam), 6), round(tv, 6), round(float(lam) / tv, 6))],
        schema="top_eig double, total_var double, top_share double",
    )


# ---------------------------------------------------------------------
# 12. PageRank over the near-dup candidate graph (hub detection)
# ---------------------------------------------------------------------


def _pagerank_oracle() -> str:
    from .queries import QUERIES

    base = QUERIES["dedup_clusters_documents"].oracle
    i = base.find(", reach AS (")
    head = base[:i]  # WITH RECURSIVE ... pairs ... edges AS (...)
    return (
        head
        + """, deg AS (
  SELECT a, CAST(count(*) AS BIGINT) AS dg FROM edges GROUP BY a
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM deg
), r1 AS (
  SELECT e.b AS node,
         0.15 / nn.n + 0.85 *
           (CAST(sum(CAST(round((1.0 / nn.n) / deg.dg * 1e9) AS BIGINT))
                 AS DOUBLE) / 1e9) AS r
  FROM edges e JOIN deg ON deg.a = e.a CROSS JOIN nn
  GROUP BY e.b, nn.n
), r2 AS (
  SELECT e.b AS node,
         0.15 / nn.n + 0.85 *
           (CAST(sum(CAST(round(r1.r / deg.dg * 1e9) AS BIGINT))
                 AS DOUBLE) / 1e9) AS r
  FROM edges e
  JOIN deg ON deg.a = e.a
  JOIN r1 ON r1.node = e.a
  CROSS JOIN nn
  GROUP BY e.b, nn.n
)
SELECT CAST(node AS BIGINT) AS doc_id, round(r, 9) AS pr FROM (
  SELECT node, r,
         row_number() OVER (ORDER BY round(r, 9) DESC, node) AS rn
  FROM r2)
WHERE rn <= 10"""
    )


@stage(
    "pagerank_dedup_graph_documents",
    "",  # resolved lazily via staged_oracle (needs QUERIES registry)
    "graph analytics: 2-iteration PAGERANK (d = 0.85, uniform start) "
    "over the undirected MinHash-LSH candidate graph, top-10 by rank. "
    "High-centrality nodes in a near-dup graph are the HUBS - "
    "template/boilerplate documents that partially match many others "
    "without being exact duplicates of any - exactly the documents a "
    "curation pass removes wholesale, and a signal connected "
    "components cannot give (CC sees reachability, not degree "
    "concentration). Deterministic contract: per-target contribution "
    "sums are quantized-exact (round 1e9, int64-accumulated), damping "
    "arithmetic uses the literal 0.15/0.85 on both engines, final "
    "ranking is (round-9 rank, doc_id) - so DuckDB replays both "
    "iterations bit-for-bit. Scale shape: the graph is the LSH-pruned "
    "EDGE LIST (orders of magnitude smaller than the corpus); each "
    "iteration is one equi-join + groupBy on it - the same shape as "
    "the clustering rounds, composable to any iteration count.",
)
def pagerank_dedup_graph_documents(spark, sf_dir):
    from .ext import dedup as X_dedup

    pairs = X_dedup.lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), num_hashes=8, bands=4
    )
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("dg"))
    n = deg.count()

    def qsum(col):
        return (
            F.sum(F.round(col * F.lit(1e9)).cast("long")).cast("double")
            / F.lit(1e9)
        )

    base = F.lit(0.15) / F.lit(float(n))
    r1 = (
        edges.join(deg, "a")
        .groupBy(F.col("b").alias("node"))
        .agg((base + F.lit(0.85) * qsum(F.lit(1.0) / F.lit(float(n)) / F.col("dg"))).alias("r"))
    )
    r2 = (
        edges.join(deg, "a")
        .join(r1.select(F.col("node").alias("a"), F.col("r").alias("ra")), "a")
        .groupBy(F.col("b").alias("node"))
        .agg((base + F.lit(0.85) * qsum(F.col("ra") / F.col("dg"))).alias("r"))
    )
    out = (
        r2.select(
            F.col("node").alias("doc_id"), F.round(F.col("r"), 9).alias("pr")
        )
        .orderBy(F.desc("pr"), "doc_id")
        .limit(10)
    )
    # 10-row result: materialize so the edge cache can be released here
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, edges)


# ---------------------------------------------------------------------
# 13. Heavy hitters at GLOBAL support (the cross-shard threshold)
# ---------------------------------------------------------------------

_HH_G_SUPPORT = 0.01
_HH_G_EPSILON = 0.0025


@stage(
    "heavy_hitters_global_support_events",
    f"""WITH f AS (
  SELECT CASE WHEN event_id % 5 = 0 THEN 0 ELSE user_id END AS uid
  FROM events
), exact AS (
  SELECT uid, CAST(count(*) AS BIGINT) AS exact_cnt FROM f GROUP BY uid
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM f
)
SELECT CAST(uid AS BIGINT) AS user_id, exact_cnt,
       TRUE AS tracked_at_global_support
FROM exact CROSS JOIN tot
WHERE exact_cnt >= ceiling({_HH_G_SUPPORT} * n)""",
    "streaming sketch, GLOBAL-support face: the cross-shard threshold "
    "derivation the heavy-hitter docstring describes, as running "
    "code - global N = sum of distinct (shard, shard_n) from the "
    "sketch's own output (each key's history lives in exactly one "
    "shard, so per-shard totals partition the stream), then the "
    "sketch-side no-false-negative filter count + delta >= "
    f"support * N at support {_HH_G_SUPPORT} (> epsilon "
    f"{_HH_G_EPSILON}). The oracle lists the exact-count heavy keys "
    "with TRUE - a key the global filter wrongly dropped surfaces as "
    "a missing row. Complements heavy_hitters_batch_events (which "
    "checks the per-key count brackets); together they prove both "
    "halves of the Manku-Motwani contract at stream-global scope.",
)
def heavy_hitters_global_support_events(spark, sf_dir):
    from .streaming.heavyhitters import lossy_count_batch

    f = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 5 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("uid"),
        "event_id",
    )
    cand = lossy_count_batch(
        f, key_col="uid", order_col="event_id", epsilon=_HH_G_EPSILON,
        n_shards=8, batch_rows=1000,
    )
    # global N from the sketch's own per-shard totals
    glob = (
        cand.select("shard", "shard_n").distinct()
        .agg(F.sum("shard_n").alias("n"))
    )
    filtered = (
        cand.crossJoin(F.broadcast(glob))
        .filter(
            F.col("count") + F.col("delta")
            >= F.lit(_HH_G_SUPPORT) * F.col("n")
        )
        .select(F.col("uid").cast("long").alias("uid"), F.lit(True).alias("t"))
    )
    exact = f.groupBy("uid").agg(F.count(F.lit(1)).alias("exact_cnt"))
    tot = f.agg(F.count(F.lit(1)).alias("n"))
    heavy = exact.crossJoin(F.broadcast(tot)).filter(
        F.col("exact_cnt") >= F.ceil(F.lit(_HH_G_SUPPORT) * F.col("n"))
    )
    return heavy.join(filtered, "uid", "left").select(
        F.col("uid").alias("user_id"),
        "exact_cnt",
        F.coalesce(F.col("t"), F.lit(False)).alias(
            "tracked_at_global_support"
        ),
    )


# ---------------------------------------------------------------------
# 14. Multimodal payload-level exact dedup
# ---------------------------------------------------------------------

_MM_DEDUP_ORACLE = """WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0
), d AS (
  SELECT doc_id, md5(text) AS digest FROM base
)
SELECT digest,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM d GROUP BY digest HAVING count(*) >= 2"""


@stage(
    "multimodal_payload_dedup",
    _MM_DEDUP_ORACLE,
    "multimodal curation: EXACT PAYLOAD DEDUP - byte-identical media "
    "detected by hashing the opaque binary column (every 10th "
    "payload re-ingested under a new id stands in for the re-crawled "
    "image/audio file; both engines construct the identical dirtied "
    "view - the de-vacuization convention). This is the first dedup "
    "pass of every image/audio pipeline: no decode needed, the "
    "16-byte digest is the only thing shuffled (never the payload "
    "bytes), keep-min-id picks the canonical copy. Runs through the "
    "ext/multimodal.attach_payload plumbing, i.e. the REAL binary-"
    "column path the decode operators use.",
)
def multimodal_payload_dedup(spark, sf_dir):
    from .ext import multimodal as X_mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dirty = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    wrapped = X_mm.attach_payload(dirty, "text", media_type="image")
    return (
        wrapped.select("doc_id", F.md5(F.col("payload")).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# ---------------------------------------------------------------------
# 15. Cross-source duplicate rate (contamination directionality)
# ---------------------------------------------------------------------


def _cross_source_oracle() -> str:
    from .queries import QUERIES

    base = QUERIES["dedup_clusters_documents"].oracle
    i = base.find(", edges AS (")
    head = base[:i]  # WITH RECURSIVE ... pairs AS (...)
    return (
        head
        + """
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY least(da.source, db.source), greatest(da.source, db.source)"""
    )


@stage(
    "cross_source_dup_rate_documents",
    "",  # resolved lazily via staged_oracle (needs QUERIES registry)
    "curation signal: CROSS-SOURCE DUPLICATE MATRIX - the MinHash-LSH "
    "near-dup pairs bucketed by the (unordered) source pair of their "
    "endpoints. Within-source pairs mean a crawler re-fetched its own "
    "content (fix ingestion); cross-source pairs mean two feeds "
    "overlap (fix the data mix, and decide WHICH source's copy "
    "survives - pair with dedup_survivor_selection). Composition: "
    "the LSH candidate pairs + two broadcast-sized metadata joins + "
    "one tiny groupBy; the corpus is never re-scanned.",
)
def cross_source_dup_rate_documents(spark, sf_dir):
    from .ext import dedup as X_dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = X_dedup.lsh_candidate_pairs(docs, num_hashes=8, bands=4)
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
    )
    return (
        j.select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------
# 16. Constraint-violation samples (the debugging face of checks)
# ---------------------------------------------------------------------

_VIOL_SAMPLES_ORACLE = """WITH v AS (
  SELECT 'value_out_of_range' AS check_name, event_id
  FROM events WHERE value IS NOT NULL AND (value < -3.0 OR value > 3.0)
  UNION ALL
  SELECT 'props_missing_k', event_id
  FROM events WHERE json_extract(props, '$.k') IS NULL
  UNION ALL
  SELECT 'odd_user_purchase', event_id
  FROM events WHERE event_type = 'purchase' AND user_id % 2 = 1
)
SELECT check_name, CAST(rk AS INTEGER) AS rk,
       CAST(event_id AS BIGINT) AS event_id
FROM (SELECT check_name, event_id,
             row_number() OVER (PARTITION BY check_name
                                ORDER BY event_id) AS rk
      FROM v)
WHERE rk <= 5"""


@stage(
    "constraint_violation_samples_events",
    _VIOL_SAMPLES_ORACLE,
    "contracts, debugging face: VIOLATION SAMPLES - the first 5 "
    "offending row ids per failed constraint (a range breach, a "
    "missing JSON key, a business-rule probe), deterministically "
    "ordered by id. Counts (the reference's only output and this "
    "catalog's *_violations_* queries) say THAT a check failed; "
    "samples are what an on-call engineer actually opens. Scale "
    "shape: the three predicates evaluate in ONE scan (unioned "
    "projections of the same cached read), then a per-check window "
    "top-5 whose partitions are check-count-many - the k rows "
    "shipped to the report are metadata-sized no matter the table.",
)
def constraint_violation_samples_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k long")["k"]
    checks = [
        (
            "value_out_of_range",
            F.col("value").isNotNull()
            & ((F.col("value") < -3.0) | (F.col("value") > 3.0)),
        ),
        ("props_missing_k", k.isNull()),
        (
            "odd_user_purchase",
            (F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 1),
        ),
    ]
    parts = [
        ev.filter(cond).select(
            F.lit(name).alias("check_name"), "event_id"
        )
        for name, cond in checks
    ]
    from functools import reduce

    v = reduce(lambda a, b: a.unionByName(b), parts)
    w = Window.partitionBy("check_name").orderBy("event_id")
    return (
        v.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select("check_name", "rk", "event_id")
    )


# ---------------------------------------------------------------------
# 17. Calendar gap-fill (resample with zero-filled missing days)
# ---------------------------------------------------------------------

_GAP_FILL_ORACLE = """WITH d AS (
  SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY day
), bounds AS (
  SELECT min(day) AS lo, max(day) AS hi FROM d
), spine AS (
  SELECT unnest(generate_series(bounds.lo, bounds.hi,
                                INTERVAL 1 DAY)) AS day
  FROM bounds
)
SELECT CAST(floor(epoch(spine.day)) AS BIGINT) AS day_epoch,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
       (d.n IS NULL) AS gap_filled
FROM spine LEFT JOIN d ON d.day = spine.day"""


@stage(
    "gap_fill_daily_events",
    _GAP_FILL_ORACLE,
    "time-series op: CALENDAR GAP-FILL - daily event counts joined "
    "onto a complete day spine between the observed min and max, "
    "missing days emitted as explicit zeros with a gap flag. Every "
    "monitoring consumer needs this resample step (a day with no "
    "data is an INCIDENT, not an absent row; naive groupBy output "
    "silently hides it). Scale shape: one groupBy to day "
    "granularity, a 2-value bounds aggregate broadcast into a "
    "sequence() spine (rows = calendar days, metadata-sized at any "
    "data scale), one broadcast left join spine-to-counts.",
)
def gap_fill_daily_events(spark, sf_dir):
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the corpus scan/aggregate runs once.
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    return spine.join(d, "day", "left").select(
        F.unix_timestamp("day").alias("day_epoch"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.col("n").isNull().alias("gap_filled"),
    )


# ---------------------------------------------------------------------
# 18. LSH candidate precision (the tuning companion to recall)
# ---------------------------------------------------------------------


def _lsh_precision_oracle() -> str:
    from .queries import _MINHASH_PAIRS_SELECT, _minhash_ctes

    return (
        f"WITH {_minhash_ctes()}"
        + f""", pairs AS (
{_MINHASH_PAIRS_SELECT}
), verified AS (
  SELECT p.doc_a FROM pairs p
  JOIN documents ta ON ta.doc_id = p.doc_a
  JOIN documents tb ON tb.doc_id = p.doc_b
  WHERE 1.0 - CAST(levenshtein(ta.text, tb.text) AS DOUBLE)
              / greatest(length(ta.text), length(tb.text)) >= 0.8
)
SELECT CAST((SELECT count(*) FROM pairs) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM verified) AS BIGINT) AS n_verified,
       round(CAST((SELECT count(*) FROM verified) AS DOUBLE)
             / (SELECT count(*) FROM pairs), 6) AS candidate_precision"""
    )


@stage(
    "lsh_precision_documents",
    "",  # resolved lazily via staged_oracle (needs QUERIES registry)
    "dedup tuning: LSH CANDIDATE PRECISION - what fraction of the "
    "MinHash-LSH candidate pairs survive exact verification (edit "
    "similarity >= 0.8). The companion number to the banding S-curve's "
    "recall: precision near 1 means the verify stage is cheap but the "
    "bands may be too tight (missing true pairs); precision near 0 "
    "means the expensive verifier is drowning in false candidates - "
    "widen bands or raise bits. Same candidate/verify machinery as "
    "lsh_verified_pairs_documents, aggregated to the one-row summary "
    "a tuning loop reads. Scale shape: counts over the LSH-pruned "
    "pair list; the corpus is never re-scanned.",
)
def lsh_precision_documents(spark, sf_dir):
    from .ext import dedup as X_dedup

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    pairs = X_dedup.lsh_candidate_pairs(docs, num_hashes=8, bands=4)
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("__ta"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("__tb"))
    sim = F.lit(1.0) - F.levenshtein("__ta", "__tb").cast(
        "double"
    ) / F.greatest(F.length("__ta"), F.length("__tb")).cast("double")
    return (
        pairs.join(F.broadcast(ta), "doc_a")
        .join(F.broadcast(tb), "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum((sim >= 0.8).cast("long")).alias("n_verified"),
            F.round(
                F.sum((sim >= 0.8).cast("long")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("candidate_precision"),
        )
    )


# ---------------------------------------------------------------------
# 19. Rare-token ratio (garbage / misparse detector)
# ---------------------------------------------------------------------

_RARE_ORACLE = """WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM words GROUP BY w
)
SELECT words.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN vocab.cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare,
       round(CAST(sum(CASE WHEN vocab.cnt <= 2 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS rare_ratio
FROM words JOIN vocab ON vocab.w = words.w
GROUP BY words.doc_id"""


@stage(
    "rare_token_ratio_documents",
    _RARE_ORACLE,
    "curation filter: RARE-TOKEN RATIO - per document, the fraction "
    "of token occurrences whose corpus frequency is <= 2. A high "
    "ratio flags mojibake, OCR garbage, base64 blobs and wrong-"
    "language fragments: their 'words' appear almost nowhere else. "
    "The cheap complement to LM perplexity scoring (no model needed, "
    "one corpus vocabulary), and the operational face of the "
    "min-count vocab cuts every LM table here applies - this query "
    "tells you how much of each document those cuts would discard. "
    "Shapes: one vocabulary groupBy, one equi-join of the token "
    "stream against it (broadcast once the min-count cut shrinks the "
    "vocab), one per-doc aggregate; exact-int counts, round(6) on "
    "the single derived ratio.",
)
def rare_token_ratio_documents(spark, sf_dir):
    from .ext.text import tokens_col

    # optimization r15 (guide §5): the token frame feeds the vocab
    # count and the final join — eager localCheckpoint tokenizes once.
    words = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    ).localCheckpoint()
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    rare = (F.col("cnt") <= 2).cast("long")
    return (
        words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(rare).alias("n_rare"),
            F.round(
                F.sum(rare).cast("double") / F.count(F.lit(1)), 6
            ).alias("rare_ratio"),
        )
    )


# ---------------------------------------------------------------------
# 20. Revenue concentration (Pareto front over parts)
# ---------------------------------------------------------------------

_PARETO_ORACLE = """WITH pr AS (
  SELECT l_partkey,
         CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000.0)
                       AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT CAST(sum(rev) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS np
  FROM pr
), cum AS (
  SELECT sum(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cm,
         row_number() OVER (ORDER BY rev DESC, l_partkey) AS rk
  FROM pr
)
SELECT CAST(share_p AS DOUBLE) AS share_p,
       CAST(min(CASE WHEN CAST(cm AS DOUBLE)
                          >= CAST(share_p AS DOUBLE) * tot.t
                     THEN rk END) AS BIGINT) AS n_parts_needed,
       CAST(min(tot.np) AS BIGINT) AS total_parts
FROM cum CROSS JOIN tot
CROSS JOIN (SELECT unnest([0.5, 0.8, 0.95]) AS share_p)
GROUP BY share_p"""


@stage(
    "pareto_revenue_share_lineitem",
    _PARETO_ORACLE,
    "analytics: REVENUE CONCENTRATION - the smallest number of parts "
    "whose revenue reaches 50/80/95% of the total (the Pareto/ABC "
    "analysis every inventory and catalog team runs; the same ranked-"
    "cumulative-mass shape as vocab_coverage_documents applied to "
    "money). Determinism: revenue stays in exact int basis points "
    "(the q3 convention) through the groupBy AND the cumulative sum, "
    "ranked (revenue DESC, partkey); only the final threshold compare "
    "touches doubles. Scale note: the rank runs over the PART "
    "dimension (not lineitem) - at 100 TB that is ~1e8 rows, "
    "single-partition-window-able like the vocabulary rank, with a "
    "range-partitioned two-pass cumsum as the swap-in.",
)
def pareto_revenue_share_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(
        F.round(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * F.lit(10000.0)
        ).cast("long")
    ).alias("rev")
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the corpus scan/aggregate runs once.
    pr = li.groupBy("l_partkey").agg(rev).localCheckpoint()
    tot = pr.agg(
        F.sum("rev").alias("t"), F.count(F.lit(1)).alias("np")
    )
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rw = Window.orderBy(F.desc("rev"), "l_partkey")
    cum = pr.select(
        F.sum("rev").over(w).alias("cm"),
        F.row_number().over(rw).cast("long").alias("rk"),
    )
    base = cum.crossJoin(F.broadcast(tot))
    aggs = []
    for pct in (0.5, 0.8, 0.95):
        aggs.append(
            F.min(
                F.when(
                    F.col("cm").cast("double")
                    >= F.lit(pct) * F.col("t").cast("double"),
                    F.col("rk"),
                )
            ).alias(f"n_{int(round(pct * 100))}")
        )
    one = base.groupBy().agg(*aggs, F.min("np").alias("total_parts"))
    # optimization r15 (guide §5): the three projections of the SAME
    # 1-row aggregate each re-ran the whole pipeline under the union —
    # collect the row once and emit the 3 literals.
    r = one.collect()[0]
    return spark.createDataFrame(
        [
            (pct, r[f"n_{int(round(pct * 100))}"], r["total_parts"])
            for pct in (0.5, 0.8, 0.95)
        ],
        schema="share_p double, n_parts_needed bigint, "
               "total_parts bigint",
    )


def staged_oracle(name: str) -> str:
    """Oracle SQL for a staged query (lazy for the two that compose an
    existing registered oracle)."""
    if name == "pack_efficiency_documents":
        return _pack_eff_oracle()
    if name == "dedup_cluster_size_hist_documents":
        return _cluster_hist_oracle()
    if name == "dedup_survivor_selection_documents":
        return _survivor_oracle()
    if name == "pagerank_dedup_graph_documents":
        return _pagerank_oracle()
    if name == "cross_source_dup_rate_documents":
        return _cross_source_oracle()
    if name == "lsh_precision_documents":
        return _lsh_precision_oracle()
    return STAGED_R6[name].oracle
