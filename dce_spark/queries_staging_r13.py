"""ROUND-13 STAGED catalog queries — seeded in round 11 (the staging
pipeline runs a full round ahead: round 12 promotes the r12 cohort, and
round 13 promotes these), NOT registered (same freeze protocol as
queries_staging_r5..r12). The three themes are the round-10 verdict's
item-2 seeds, each with real 100 TB pull:

GRAPH OPS over the dedup candidate graph (completes the
``pagerank_dedup_graph_documents`` family): the graph is the
SHINGLE-OVERLAP candidate graph — an edge joins two documents sharing
>= 3 distinct word-8-gram shingles (the ``dup_ngram_span_documents``
gram convention; an inverted-index equi-join, never all-pairs, and —
unlike the banded-LSH graph PageRank runs on — hash-free, so every
oracle replays it without the md5 parity-probe caveat). All iterative
ops run a FIXED number of synchronous rounds, making each round an
oracle-able equi-join + groupBy:

- ``cc_hashmin_labels_documents`` — hash-min connected-components
  labels after 2 rounds; top-20 components by size.
- ``cc_convergence_curve_documents`` — labels/changes per round for
  rounds 1..3: the convergence telemetry that tells an operator how
  many pointer-jumping rounds a corpus actually needs.
- ``label_propagation_round_documents`` — one synchronous round of
  majority label propagation over seed labels (doc_id % 5),
  deterministic (count DESC, label ASC) tie-break.
- ``graph_degree_profile_documents`` — power-of-two degree histogram
  (the fixed-edge boolean-sum binning convention) + isolated docs.
- ``triangle_closure_documents`` — exact triangle / wedge counts and
  the global clustering coefficient.
- ``common_neighbors_topk_documents`` — top-10 doc pairs by common-
  neighbor count with an adjacency flag (the link-prediction score
  that finds near-dup pairs the shingle threshold itself missed).
- ``cross_source_edge_mix_documents`` — candidate edges grouped by
  (source, source): how much near-duplication crosses source
  boundaries (the contamination direction matrix).

STREAMING-BATCH MIRRORS for the remaining warehouse faces: events are
cut into 5 fixed epoch-range micro-batches (exact integer arithmetic:
``batch = (es - mn) * 5 div (mx - mn + 1)``); each query computes, as
one batch plan, the per-batch quantity the corresponding streaming
operator would emit — the ``streaming/upsert.py`` equivalence-test
protocol turned into oracle-paired catalog entries. Documented per
query below.

DETERMINISTIC SOURCE-MIX PLANNING (the sampling family's optimizer
face): greedy token-budget allocation across sources under quality
floors, repetition caps, largest-remainder rounding, dedup-adjusted
budgets, and the cap-induced mix shift — all exact integer arithmetic
(token counts are whitespace-split word counts, the
``dup_ngram_span`` convention), divisions only in final reported
ratios. Documented per query below.

tests/test_staging_r13.py runs these through the SAME compare harness
as the live catalog at the suite's SF. Every query verified against
its DuckDB oracle at sf0.001 + sf0.01 + sf0.1 before commit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

# NOTE r16 (ADVICE fix): no top-of-module catalog bootstrap here. The
# r14 staging module imports graph helpers FROM this module at module
# scope, so bootstrapping the catalog before those helpers exist made
# a standalone r13-first import fail (r13 -> queries -> queries_more
# promotion -> r14 -> partially-initialized r13). The tail promotion
# hook bootstraps the whole chain AFTER every definition instead; the
# promotion loops getattr-guard partially-initialized staging modules,
# so every import order completes (pinned by tests/test_staging_r13).
from .data import load_table

STAGED_R13: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R13[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R13[name].oracle


# =====================================================================
# A. Graph ops over the shingle-overlap dedup candidate graph
# =====================================================================

_GRAM_N = 8  # the dup_ngram_span_documents gram width
_EDGE_MIN_SHARED = 3  # >= 3 shared distinct 8-grams makes an edge

# the shared graph CTE: distinct (doc, 8-gram) inverted index ->
# candidate pairs (a < b, >= 3 shared grams) -> symmetric edge list.
# Documents only meet on shared grams (equi-join); a gram shared by k
# docs contributes k^2 pair rows, bounded in this corpus by the
# injected duplicate family sizes — the same volume class the
# dup-span/containment queries already shuffle.
_GRAPH_CTE = f"""WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= {_GRAM_N}
), gpos AS (
  SELECT doc_id, w, unnest(range(0, len(w) - {_GRAM_N - 1})) AS pos
  FROM words
), grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(w[pos + 1 : pos + {_GRAM_N}], ' ') AS ng
  FROM gpos
), prs AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM grams x JOIN grams y ON x.ng = y.ng AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {_EDGE_MIN_SHARED}
), edges AS (
  SELECT a, b FROM prs UNION ALL SELECT b AS a, a AS b FROM prs
)"""


def _gram_pairs(spark, sf_dir):
    """Candidate pairs (a < b) sharing >= _EDGE_MIN_SHARED distinct
    word-8-grams — the Spark mirror of _GRAPH_CTE's ``prs``.

    Optimization r15 (guide §2.3/§2.4): the original self-join form
    (grams x JOIN grams y ON ng) computed the explode+distinct gram
    pipeline TWICE — once per join side — because the shared ``grams``
    frame was not reusable without a leaked persist. The per-gram
    posting-list form computes grams ONCE: group the inverted index by
    gram, sort the posting list, and explode the C(k,2) ordered pairs
    with a higher-order function. The generated (a, b) multiset is
    exactly the self-join's a < b output (same gram -> same doc set ->
    same ordered pairs), so the n_shared counts and the final pair set
    are identical. One scan + 3 exchanges instead of two scans + 4.

    Skew bound (r16, ADVICE note): a gram shared by k documents holds
    a k-element posting list and k(k-1)/2 pair structs in ONE executor
    row before the explode — the same k² candidate mass the old
    self-join spread across shuffle rows, concentrated per-gram. This
    is safe while max posting-list size stays memory-bounded (here:
    dup families of tens of docs -> k² in the thousands; an 8-WORD
    shingle is far more selective than the single-token hot keys that
    flood LSH buckets). A corpus whose boilerplate floods a single
    8-gram past ~10^4 docs needs the cap/salt treatment the LSH path
    already has (_cap_buckets): filter `size(ids) <= cap` before the
    pair explode, which is the same recall contract as the capped
    bucket (only boilerplate-saturated grams are dropped, and a true
    near-dup pair keeps its other shared grams)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.col("text"), " ").alias("w"))
        .filter(F.size("w") >= _GRAM_N)
    )
    # per-document gram dedup is MAP-SIDE: distinct over (doc_id, ng)
    # rows == array_distinct of each doc's own gram array, so the
    # global .distinct() exchange of ~60-byte gram strings disappears
    # (guide §2.3: aggregate before you shuffle)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(0, size(w) - {_GRAM_N}), "
                f"i -> array_join(slice(w, i + 1, {_GRAM_N}), ' ')))"
            )
        ).alias("ng"),
    )
    posting = (
        grams.groupBy("ng")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_structs = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS a, y AS b))))"
    )
    return (
        posting.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _EDGE_MIN_SHARED)
        .select("a", "b")
    )


def _gram_edges(pairs):
    """Symmetric edge list from the a<b pair list (two disjoint
    directions — no dedup shuffle needed)."""
    return pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def _hashmin_round(lbls, edges):
    """One synchronous hash-min round: every node takes the min of its
    own label and its neighbors' labels. One equi-join + one groupBy on
    the (LSH-pruned-size) edge list — the pointer-jumping building
    block, composable to any fixed round count.

    Optimization r15 (guide §2.4): the original form joined the
    neighbor-min frame BACK against the label frame on v to apply
    least(own, nb_min) — a third exchange per round. Unioning each
    node's own (v, lbl) row into the message stream before the min
    aggregation computes the same least() inside the ONE groupBy:
    min(own_lbl, nb_lbl...) == least(lbl, min(nb_lbl)). Every node in
    ``lbls`` contributes its own row, so the output vertex set is
    unchanged (the old inner join was total for the same reason: label
    frames are seeded from the symmetric edge list's endpoints). Two
    exchanges per round instead of three."""
    msgs = edges.join(
        lbls.select(F.col("v").alias("b"), F.col("lbl").alias("nb_lbl")),
        "b",
    ).select(F.col("a").alias("v"), F.col("nb_lbl").alias("m"))
    own = lbls.select("v", F.col("lbl").alias("m"))
    return msgs.union(own).groupBy("v").agg(F.min("m").alias("lbl"))


def _hashmin_round_flagged(lbls, edges):
    """_hashmin_round plus a per-node ``chg`` flag (label shrank this
    round) — optimization r15 (guide §2.4): the driver convergence
    loops previously computed n_changed with a SEPARATE join of the
    new label frame against the previous one (one more exchange +
    join per round). Tagging the own-label row through the same union
    lets the one aggregation emit both the new label and the previous
    one; chg = (new < prev) is exactly the old join's
    ``lbl != prev`` predicate because hash-min labels only decrease.
    Callers select (v, lbl) before the next round."""
    msgs = edges.join(
        lbls.select(F.col("v").alias("b"), F.col("lbl").alias("nb_lbl")),
        "b",
    ).select(
        F.col("a").alias("v"),
        F.col("nb_lbl").alias("m"),
        F.lit(None).cast("long").alias("own"),
    )
    own = lbls.select("v", F.col("lbl").alias("m"), F.col("lbl").alias("own"))
    return (
        msgs.union(own)
        .groupBy("v")
        .agg(F.min("m").alias("lbl"), F.min("own").alias("prev"))
        .select("v", "lbl", (F.col("lbl") < F.col("prev")).alias("chg"))
    )



def _local_result(spark, df):
    """Materialize a small final frame so the caller can unpersist its
    inputs (the convention for queries that manage persisted
    intermediate frames; reused by queries_staging_r14)."""
    rows = df.collect()
    return spark.createDataFrame(rows, df.schema)


_CC_LABELS_ORACLE = (
    _GRAPH_CTE
    + """, nodes AS (
  SELECT DISTINCT a AS v FROM edges
), l0 AS (
  SELECT v, v AS lbl FROM nodes
), l1 AS (
  SELECT e.a AS v, least(min(o.lbl), min(nb.lbl)) AS lbl
  FROM edges e JOIN l0 o ON o.v = e.a JOIN l0 nb ON nb.v = e.b
  GROUP BY e.a
), l2 AS (
  SELECT e.a AS v, least(min(o.lbl), min(nb.lbl)) AS lbl
  FROM edges e JOIN l1 o ON o.v = e.a JOIN l1 nb ON nb.v = e.b
  GROUP BY e.a
)
SELECT CAST(lbl AS BIGINT) AS component, CAST(count(*) AS BIGINT) AS n_nodes
FROM l2 GROUP BY lbl
ORDER BY n_nodes DESC, component LIMIT 20"""
)


@stage(
    "cc_hashmin_labels_documents",
    _CC_LABELS_ORACLE,
    "graph dedup: hash-min CONNECTED-COMPONENT labels after exactly 2 "
    "synchronous rounds over the shingle-overlap candidate graph, "
    "top-20 components by (size DESC, label ASC). After k rounds a "
    "node's label is the minimum doc_id within k hops — so a fixed "
    "round count is both oracle-able (each round is one equi-join + "
    "groupBy DuckDB replays exactly) and the honest telemetry of an "
    "iterative CC job mid-flight. Completes the "
    "pagerank_dedup_graph_documents family with the reachability face "
    "(PageRank sees degree concentration, CC sees transitive dup "
    "groups). Scale: the edge list is inverted-index-pruned (docs only "
    "meet on shared 8-grams), each round shuffles the EDGE list not "
    "the corpus, and the full algorithm is this block iterated "
    "O(log diameter) times with the driver checking convergence "
    "between rounds (ext/dedup.py's pointer-jumping does exactly "
    "that; cited: reference has no graph ops — extension surface).",
)
def cc_hashmin_labels_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir)
    # persist pre-partitioned on the round-join key b (guide §2.4) so
    # both fixed rounds reuse the cached partitioning
    edges = _gram_edges(pairs).repartition("b").persist()
    lbls = edges.select(F.col("a").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    l2 = _hashmin_round(_hashmin_round(lbls, edges), edges)
    out = (
        l2.groupBy(F.col("lbl").cast("long").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "component")
        .limit(20)
    )
    res = _local_result(spark, out)
    edges.unpersist()
    return res


_CC_CURVE_ORACLE = (
    _GRAPH_CTE
    + """, nodes AS (
  SELECT DISTINCT a AS v FROM edges
), l0 AS (
  SELECT v, v AS lbl FROM nodes
), l1 AS (
  SELECT e.a AS v, least(min(o.lbl), min(nb.lbl)) AS lbl
  FROM edges e JOIN l0 o ON o.v = e.a JOIN l0 nb ON nb.v = e.b
  GROUP BY e.a
), l2 AS (
  SELECT e.a AS v, least(min(o.lbl), min(nb.lbl)) AS lbl
  FROM edges e JOIN l1 o ON o.v = e.a JOIN l1 nb ON nb.v = e.b
  GROUP BY e.a
), l3 AS (
  SELECT e.a AS v, least(min(o.lbl), min(nb.lbl)) AS lbl
  FROM edges e JOIN l2 o ON o.v = e.a JOIN l2 nb ON nb.v = e.b
  GROUP BY e.a
)
SELECT CAST(1 AS BIGINT) AS iter,
       CAST(count(DISTINCT c.lbl) AS BIGINT) AS n_labels,
       CAST(sum(CASE WHEN c.lbl <> p.lbl THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed
FROM l1 c JOIN l0 p ON p.v = c.v
UNION ALL
SELECT CAST(2 AS BIGINT),
       CAST(count(DISTINCT c.lbl) AS BIGINT),
       CAST(sum(CASE WHEN c.lbl <> p.lbl THEN 1 ELSE 0 END) AS BIGINT)
FROM l2 c JOIN l1 p ON p.v = c.v
UNION ALL
SELECT CAST(3 AS BIGINT),
       CAST(count(DISTINCT c.lbl) AS BIGINT),
       CAST(sum(CASE WHEN c.lbl <> p.lbl THEN 1 ELSE 0 END) AS BIGINT)
FROM l3 c JOIN l2 p ON p.v = c.v"""
)


@stage(
    "cc_convergence_curve_documents",
    _CC_CURVE_ORACLE,
    "graph dedup telemetry: the hash-min CONVERGENCE CURVE — distinct "
    "labels remaining and labels changed after each of 3 synchronous "
    "rounds. n_changed hitting 0 is the fixpoint signal an iterative "
    "CC driver uses to stop early; the label count's trajectory tells "
    "the operator whether the dup graph is shallow star-shaped "
    "components (1 round suffices — typical template dups) or long "
    "chains (needs pointer doubling). Exactly the between-rounds "
    "bookkeeping ext/dedup.py's distributed CC loop keeps, surfaced "
    "as an oracle-checked query. Scale: 3 fixed equi-join rounds over "
    "the pruned edge list; the per-round reduction is a count and a "
    "distinct over node rows.",
)
def cc_convergence_curve_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir)
    # persist pre-partitioned on the round-join key b (guide §2.4) so
    # all three fixed rounds reuse the cached partitioning
    edges = _gram_edges(pairs).repartition("b").persist()
    l0 = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
        .persist()
    )
    levels = [l0]
    for _ in range(3):
        levels.append(_hashmin_round(levels[-1], edges).persist())
    rows = []
    for k in (1, 2, 3):
        cur, prev = levels[k], levels[k - 1]
        r = (
            cur.join(
                prev.select(F.col("v"), F.col("lbl").alias("plbl")), "v"
            )
            .agg(
                F.lit(k).cast("long").alias("iter"),
                F.countDistinct("lbl").alias("n_labels"),
                F.sum(
                    (F.col("lbl") != F.col("plbl")).cast("long")
                ).alias("n_changed"),
            )
        )
        rows.extend(r.collect())
    schema = "iter bigint, n_labels bigint, n_changed bigint"
    for lv in levels:
        lv.unpersist()
    edges.unpersist()
    return spark.createDataFrame(rows, schema)


_LPA_ORACLE = (
    _GRAPH_CTE
    + """, nodes AS (
  SELECT DISTINCT a AS v FROM edges
), seeds AS (
  SELECT v, v % 5 AS lbl FROM nodes
), votes AS (
  SELECT e.a AS v, s.lbl AS cand, CAST(count(*) AS BIGINT) AS c
  FROM edges e JOIN seeds s ON s.v = e.b
  GROUP BY 1, 2
), won AS (
  SELECT v, cand FROM (
    SELECT v, cand,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, cand) AS rn
    FROM votes) WHERE rn = 1
)
SELECT CAST(w.cand AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(CASE WHEN w.cand <> w.v % 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flipped
FROM won w GROUP BY w.cand"""
)


@stage(
    "label_propagation_round_documents",
    _LPA_ORACLE,
    "graph dedup: one synchronous round of MAJORITY LABEL PROPAGATION "
    "over the candidate graph, seeds = doc_id % 5 (a deterministic "
    "5-way coloring standing in for e.g. source shards). Each node "
    "adopts its neighbors' most frequent seed label with the "
    "deterministic (count DESC, label ASC) tie-break — so the round "
    "is a pure equi-join + groupBy + one bounded per-node window, and "
    "DuckDB replays the vote exactly. Community detection by LPA is "
    "the soft-clustering complement of hash-min CC (CC merges "
    "anything connected; LPA keeps weakly-linked groups apart), and "
    "per-round determinism is what makes a multi-round LPA job "
    "checkpointable. n_flipped per label measures how much one round "
    "re-colors the graph. Scale: vote table ~ edge list; the rank "
    "window partitions per node (bounded by its degree).",
)
def label_propagation_round_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir)
    # optimization r15 (guide §5): the plan references ``edges`` twice
    # (seed derivation + vote join); unpersisted, Catalyst computes the
    # whole gram-pair pipeline once per reference. Persist + eager
    # result + unpersist halves the heavy subtree (the convention of
    # the other graph queries).
    edges = _gram_edges(pairs).persist()
    seeds = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .select("v", (F.col("v") % 5).alias("lbl"))
    )
    votes = (
        edges.join(
            seeds.select(F.col("v").alias("b"), F.col("lbl").alias("cand")),
            "b",
        )
        .groupBy(F.col("a").alias("v"), "cand")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("v").orderBy(F.desc("c"), "cand")
    won = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("v", "cand")
    )
    res = _local_result(
        spark,
        won.groupBy(F.col("cand").cast("long").alias("label")).agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum((F.col("cand") != F.col("v") % 5).cast("long")).alias(
                "n_flipped"
            ),
        ),
    )
    edges.unpersist()
    return res


_DEGREE_EDGES = [2, 4, 8, 16, 32, 64, 128]

_DEG_PROFILE_ORACLE = (
    _GRAPH_CTE
    + """, deg AS (
  SELECT a AS v, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY a
), bucketed AS (
  SELECT v, d, """
    + " + ".join(f"CAST((d >= {e}) AS INT)" for e in _DEGREE_EDGES)
    + """ AS bucket
  FROM deg
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(d) AS BIGINT) AS min_deg,
       CAST(max(d) AS BIGINT) AS max_deg
FROM bucketed GROUP BY bucket
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(count(*) AS BIGINT),
       CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM documents WHERE doc_id NOT IN (SELECT v FROM deg)"""
)


@stage(
    "graph_degree_profile_documents",
    _DEG_PROFILE_ORACLE,
    "graph dedup QC: the candidate graph's DEGREE HISTOGRAM over "
    "power-of-two buckets (the fixed-edge boolean-sum binning "
    "convention: bucket = sum_i(degree >= 2^i), oracle-exact), plus "
    "the isolated-document count as the bucket = -1 row. Degree "
    "concentration is the LSH/shingle-threshold health check: a heavy "
    "top bucket means boilerplate hubs are about to quadratically "
    "inflate every pairwise stage downstream (the reason "
    "ext/dedup._cap_buckets exists), and the isolated share is the "
    "fraction of the corpus dedup cannot touch at this threshold. "
    "Scale: degree is one groupBy over the edge list; the isolated "
    "count is an anti-join against the (doc_id-projected) corpus scan.",
)
def graph_degree_profile_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir)
    edges = _gram_edges(pairs)
    # optimization r15 (guide §5): ``deg`` feeds BOTH the histogram
    # and the isolated-count anti-join; unpersisted, the gram-pair
    # pipeline ran once per reference. Persist + eager result +
    # unpersist computes it once.
    deg = edges.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("d")
    ).persist()
    bucket = None
    for e in _DEGREE_EDGES:
        t = (F.col("d") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    hist = (
        deg.select(bucket.cast("long").alias("bucket"), "d")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_deg"),
            F.max("d").alias("max_deg"),
        )
    )
    isolated = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(deg.select(F.col("v").alias("doc_id")), "doc_id", "left_anti")
        .agg(
            F.lit(-1).cast("long").alias("bucket"),
            F.count(F.lit(1)).alias("n_nodes"),
            F.lit(0).cast("long").alias("min_deg"),
            F.lit(0).cast("long").alias("max_deg"),
        )
    )
    res = _local_result(spark, hist.unionByName(isolated))
    deg.unpersist()
    return res


_TRIANGLE_ORACLE = (
    _GRAPH_CTE
    + """, tri AS (
  SELECT CAST(count(*) AS BIGINT) AS t
  FROM prs e1
  JOIN prs e2 ON e2.a = e1.b
  JOIN prs e3 ON e3.a = e1.a AND e3.b = e2.b
), deg AS (
  SELECT a AS v, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY a
), wed AS (
  SELECT CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS w FROM deg
)
SELECT tri.t AS n_triangles, wed.w AS n_wedges,
       CASE WHEN wed.w > 0
            THEN round(3.0 * tri.t / wed.w, 9) ELSE 0.0 END
         AS closure
FROM tri, wed"""
)


@stage(
    "triangle_closure_documents",
    _TRIANGLE_ORACLE,
    "graph dedup QC: exact TRIANGLE count (oriented a<b<c — each "
    "triangle counted once via two equi-joins on the a<b pair list), "
    "exact WEDGE count (sum of d*(d-1)/2 over undirected degrees, "
    "integer arithmetic), and the global clustering coefficient "
    "3T/W. High closure says the candidate graph is clique-like "
    "(true duplicate FAMILIES — safe to collapse per component); low "
    "closure with high degree says chain/star structure (hub "
    "boilerplate stitching unrelated docs — collapsing a component "
    "would over-merge, prefer pairwise verification). That one "
    "number picks between the two dedup survivor strategies the "
    "catalog already implements. Scale: the compact-join triangle "
    "shape (edge list joined to itself twice, always on equi-keys) "
    "is the standard distributed triangle count; wedges are one "
    "groupBy.",
)
def triangle_closure_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir).persist()
    e1 = pairs.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = pairs.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = pairs.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = _gram_edges(pairs).groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    wed = deg.agg(
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("long").alias("w")
    )
    out = (
        tri.crossJoin(F.broadcast(wed))  # two 1-row frames
        .select(
            F.col("t").alias("n_triangles"),
            F.col("w").alias("n_wedges"),
            F.when(
                F.col("w") > 0,
                F.round(F.lit(3.0) * F.col("t") / F.col("w"), 9),
            )
            .otherwise(F.lit(0.0))
            .alias("closure"),
        )
    )
    res = _local_result(spark, out)
    pairs.unpersist()
    return res


_COMMON_NB_ORACLE = (
    _GRAPH_CTE
    + """, cn AS (
  SELECT e1.a AS x, e2.a AS y, CAST(count(*) AS BIGINT) AS n_common
  FROM edges e1 JOIN edges e2 ON e1.b = e2.b AND e1.a < e2.a
  GROUP BY 1, 2
)
SELECT CAST(cn.x AS BIGINT) AS doc_a, CAST(cn.y AS BIGINT) AS doc_b,
       cn.n_common,
       (p.a IS NOT NULL) AS already_edge
FROM cn LEFT JOIN prs p ON p.a = cn.x AND p.b = cn.y
ORDER BY cn.n_common DESC, doc_a, doc_b LIMIT 10"""
)


@stage(
    "common_neighbors_topk_documents",
    _COMMON_NB_ORACLE,
    "graph dedup: top-10 document pairs by COMMON-NEIGHBOR count in "
    "the candidate graph, flagged with whether the pair is already an "
    "edge. A pair with many common neighbors but NO direct edge is "
    "the classic link-prediction hit — two documents that share "
    "near-dup relatives without crossing the shingle threshold "
    "themselves (e.g. two distant revisions of the same template): "
    "exactly the pairs an incremental dedup pass re-verifies with "
    "the exact Jaccard op. Deterministic contract: ranking is "
    "(count DESC, doc_a, doc_b). Scale: one self-equi-join of the "
    "edge list on the shared endpoint + one groupBy — the "
    "2-hop-path table is the same size class as the wedge count.",
)
def common_neighbors_topk_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir).persist()
    edges = _gram_edges(pairs)
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("u"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("u"))
    cn = (
        e1.join(e2, "u")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    flagged = cn.join(
        pairs.select(
            F.col("a").alias("x"), F.col("b").alias("y"),
            F.lit(True).alias("already_edge"),
        ),
        ["x", "y"],
        "left",
    ).select(
        F.col("x").cast("long").alias("doc_a"),
        F.col("y").cast("long").alias("doc_b"),
        "n_common",
        F.coalesce(F.col("already_edge"), F.lit(False)).alias(
            "already_edge"
        ),
    )
    out = flagged.orderBy(F.desc("n_common"), "doc_a", "doc_b").limit(10)
    res = _local_result(spark, out)
    pairs.unpersist()
    return res


_CROSS_SOURCE_ORACLE = (
    _GRAPH_CTE
    + """, ds AS (
  SELECT doc_id, source FROM documents
)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_edges
FROM prs p
JOIN ds sa ON sa.doc_id = p.a
JOIN ds sb ON sb.doc_id = p.b
GROUP BY 1, 2"""
)


@stage(
    "cross_source_edge_mix_documents",
    _CROSS_SOURCE_ORACLE,
    "graph dedup governance: the candidate-edge SOURCE MIX — near-dup "
    "pair counts grouped by unordered (source, source). The diagonal "
    "is within-source duplication (normal: crawls re-fetch); the "
    "off-diagonal is CROSS-SOURCE contamination — one source "
    "syndicating or mirroring another — which changes the dedup "
    "survivor policy (keep the canonical source's copy, not min "
    "doc_id) and flags sources whose 'new' data is another source "
    "re-badged. The per-pair matrix is what source-level dup-rate "
    "(cross_source_dup_rate_documents) cannot show: WHICH pairs of "
    "sources touch. Scale: two broadcast-size dimension joins onto "
    "the pruned pair list, then a tiny group.",
)
def cross_source_edge_mix_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir)
    ds = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = ds.select(F.col("doc_id").alias("a"), F.col("source").alias("sa"))
    sb = ds.select(F.col("doc_id").alias("b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


# =====================================================================
# B. Streaming-batch mirrors: 5 fixed epoch-range micro-batches
# =====================================================================

_NB = 5  # micro-batch count
_ID_RADIX = 10_000_000  # the established (epoch_s, id) packing radix

# shared CTE: events with integer epoch seconds and the exact-integer
# batch id (es - mn) * _NB div (mx - mn + 1) in [0, _NB) — both engines
# compute it as integer division of non-negative ints, so the cut is
# bit-deterministic (no float in the bucketing path)
_EV_BATCH_CTE = f"""WITH bounds AS (
  SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS mn,
         CAST(max(floor(epoch(ts))) AS BIGINT) AS mx
  FROM events
), ev AS (
  SELECT event_id, user_id, event_type, value, ts, mn, mx,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(((CAST(floor(epoch(ts)) AS BIGINT) - mn) * {_NB})
              // (mx - mn + 1) AS BIGINT) AS batch
  FROM events, bounds
)"""


def _events_batched(spark, sf_dir):
    """events + (es, batch, mn, mx) — the Spark mirror of
    _EV_BATCH_CTE. The 1-row bounds frame rides a scalar broadcast
    (the _events_tt convention); the batch id is exact integer
    arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp(F.col("ts"))
    bounds = ev.agg(F.min(es).alias("mn"), F.max(es).alias("mx"))
    return (
        ev.withColumn("es", es)
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "batch", F.expr(f"(es - mn) * {_NB} div (mx - mn + 1)")
        )
    )


_ATTR_CUTS_ORACLE = (
    _EV_BATCH_CTE
    + f""", lasts AS (
  SELECT event_id, event_type, es, batch, mn, mx,
         max(CASE WHEN event_type = 'click'
                  THEN es * {_ID_RADIX} + event_id END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS packed
  FROM ev
), purch AS (
  SELECT batch,
         (packed IS NOT NULL
          AND es - packed // {_ID_RADIX} <= 3600) AS attributed,
         CASE WHEN packed IS NOT NULL
              THEN CAST(((packed // {_ID_RADIX} - mn) * {_NB})
                        // (mx - mn + 1) AS BIGINT) END AS src_batch
  FROM lasts WHERE event_type = 'purchase'
)
SELECT CAST(batch AS BIGINT) AS batch,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_attributed,
       CAST(sum(CASE WHEN attributed AND src_batch < batch
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_batch
FROM purch GROUP BY batch"""
)


@stage(
    "attribution_stream_cuts_events",
    _ATTR_CUTS_ORACLE,
    "streaming-batch mirror, attribution face: last-click attribution "
    "(the attribution_windows_events packing convention: es*1e7+id "
    "running window MAX, 1-hour window) with the stream cut into 5 "
    "fixed epoch-range micro-batches — per batch, purchases, "
    "attributed purchases, and the CROSS-BATCH attributions whose "
    "click lives in an EARLIER batch. n_cross_batch is the number "
    "the streaming operator can only get right by carrying per-user "
    "state across micro-batches — it is exactly the state-dependence "
    "telemetry that sizes the attribution operator's state store "
    "(clicks must be retained one window-length past the batch "
    "boundary). The batch replay grouped by cut equals the streaming "
    "emission because attribution is computed over the FULL ordered "
    "stream first and only then grouped — the upsert.py equivalence "
    "protocol as an oracle-paired entry. Scale: one shuffle on "
    "user_id for the window, one tiny group; the source batch falls "
    "out of the packed value (no second join).",
)
def attribution_stream_cuts_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    guard = F.assert_true(
        (F.col("event_id") >= 0) & (F.col("event_id") < F.lit(_ID_RADIX)),
        F.lit(
            "attribution_stream_cuts: event_id outside [0, 1e7) breaks "
            "the (epoch_s, id) int64 packing"
        ),
    )
    packed = F.max(
        F.when(
            F.col("event_type") == "click",
            F.col("es") * F.lit(_ID_RADIX)
            + F.col("event_id")
            + F.coalesce(guard.cast("long"), F.lit(0)),
        )
    ).over(w)
    staged = ev.withColumn("packed", packed).filter(
        F.col("event_type") == "purchase"
    )
    # exact integer unpack: packed ~ 1.7e16 exceeds double's 2^53
    # mantissa, so a float `/` could flip floor() at radix boundaries —
    # `div` matches the oracle's `//` bit-for-bit
    src_es = F.expr(f"packed div {_ID_RADIX}")
    attributed = F.col("packed").isNotNull() & (
        F.col("es") - src_es <= 3600
    )
    src_batch = F.expr(
        f"(packed div {_ID_RADIX} - mn) * {_NB} div (mx - mn + 1)"
    )
    return staged.groupBy(F.col("batch").cast("long").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(attributed.cast("long")).alias("n_attributed"),
        F.sum(
            (attributed & (src_batch < F.col("batch"))).cast("long")
        ).alias("n_cross_batch"),
    )


_PIT_W = 604_800  # the 7-day PIT horizon (pit_features convention)

_PIT_CUTS_ORACLE = (
    _EV_BATCH_CTE
    + f""", cuts AS (
  SELECT mn, mx FROM bounds
), per_user AS (
  SELECT user_id,
"""
    + ",\n".join(
        f"         CAST(sum(CASE WHEN es >= (mn + ((mx - mn + 1) * {b + 1})"
        f" // {_NB}) - {_PIT_W} AND es < mn + ((mx - mn + 1) * {b + 1})"
        f" // {_NB} THEN 1 ELSE 0 END) AS BIGINT) AS c{b}"
        for b in range(4)
    )
    + """
  FROM ev GROUP BY user_id
)
SELECT CAST(0 AS BIGINT) AS cut_idx,
       CAST(sum(CASE WHEN c0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_active_users,
       CAST(sum(c0) AS BIGINT) AS window_events,
       CAST(sum(CASE WHEN c0 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_changed
FROM per_user
UNION ALL
SELECT CAST(1 AS BIGINT),
       CAST(sum(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(c1) AS BIGINT),
       CAST(sum(CASE WHEN c1 <> c0 THEN 1 ELSE 0 END) AS BIGINT)
FROM per_user
UNION ALL
SELECT CAST(2 AS BIGINT),
       CAST(sum(CASE WHEN c2 > 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(c2) AS BIGINT),
       CAST(sum(CASE WHEN c2 <> c1 THEN 1 ELSE 0 END) AS BIGINT)
FROM per_user
UNION ALL
SELECT CAST(3 AS BIGINT),
       CAST(sum(CASE WHEN c3 > 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(c3) AS BIGINT),
       CAST(sum(CASE WHEN c3 <> c2 THEN 1 ELSE 0 END) AS BIGINT)
FROM per_user"""
)


@stage(
    "pit_stream_cut_consistency_events",
    _PIT_CUTS_ORACLE,
    "streaming-batch mirror, point-in-time face: the 7-day PIT "
    "activity feature (events per user in [cut - 7d, cut)) evaluated "
    "AT EACH of the 4 interior micro-batch cut times, with per-cut "
    "active users, total in-window events, and the number of users "
    "whose feature CHANGED since the previous cut (cut 0 compares "
    "against the empty state, so its changed-count equals its active "
    "count). The change count is the streaming PIT operator's "
    "emission volume under update mode — what a feature-store sink "
    "actually receives per trigger — so this query is the capacity "
    "plan for the streaming mirror of pit_features_events. Shape: "
    "the 4 window counts fuse into ONE per-user grouped aggregate "
    "(no events x cuts expansion), then a 1-row reduction per cut; "
    "cut times are exact integer arithmetic off the broadcast "
    "bounds.",
)
def pit_stream_cut_consistency_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    cut = [
        F.expr(f"mn + (mx - mn + 1) * {b + 1} div {_NB}") for b in range(4)
    ]
    per_user = ev.groupBy("user_id").agg(
        *[
            F.sum(
                (
                    (F.col("es") >= cut[b] - _PIT_W)
                    & (F.col("es") < cut[b])
                ).cast("long")
            ).alias(f"c{b}")
            for b in range(4)
        ]
    )
    aggs = []
    for b in range(4):
        prev = F.lit(0) if b == 0 else F.col(f"c{b - 1}")
        aggs.append(
            F.struct(
                F.lit(b).cast("long").alias("cut_idx"),
                F.sum((F.col(f"c{b}") > 0).cast("long")).alias(
                    "n_active_users"
                ),
                F.sum(F.col(f"c{b}")).alias("window_events"),
                F.sum((F.col(f"c{b}") != prev).cast("long")).alias(
                    "n_users_changed"
                ),
            ).alias(f"s{b}")
        )
    one = per_user.agg(*aggs)
    return one.select(
        F.explode(F.array(*[F.col(f"s{b}") for b in range(4)])).alias("s")
    ).select(
        "s.cut_idx", "s.n_active_users", "s.window_events",
        "s.n_users_changed",
    )


_LWW_CONV_ORACLE = (
    _EV_BATCH_CTE
    + f""", kb AS (
  SELECT user_id, batch,
         CAST(max(es * {_ID_RADIX} + event_id) AS BIGINT) AS mxp,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM ev GROUP BY user_id, batch
), run AS (
  SELECT user_id, batch, mxp, n_rows,
         CAST(max(mxp) OVER (PARTITION BY user_id ORDER BY batch
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS BIGINT) AS prior
  FROM kb
)
SELECT CAST(batch AS BIGINT) AS batch,
       CAST(count(*) AS BIGINT) AS n_keys_in_batch,
       CAST(sum(CASE WHEN prior IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_first_seen,
       CAST(sum(CASE WHEN prior IS NOT NULL AND mxp > prior
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_winner_updates,
       CAST(sum(CASE WHEN prior IS NOT NULL AND mxp < prior
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_stale_batches
FROM run GROUP BY batch"""
)


@stage(
    "lww_stream_convergence_events",
    _LWW_CONV_ORACLE,
    "streaming-batch mirror, CDC-upsert face: per micro-batch, how "
    "the last-write-wins table actually moves — keys appearing for "
    "the first time, keys whose LWW WINNER changes (the batch's max "
    "(es, event_id) packed version beats every earlier batch's), and "
    "keys whose entire batch arrived STALE (all versions older than "
    "the standing winner — the out-of-order deliveries the LWW fold "
    "must absorb without emitting). first_seen + winner_updates is "
    "the per-trigger upsert volume of the streaming LWW operator "
    "(streaming/upsert.py); stale_batches is the disorder the "
    "order-invariance proof (tests/test_streaming.py) says it "
    "tolerates. The argmax packs into one int64 (the established "
    "es*1e7+id radix, guard enforced Spark-side), so winner "
    "evolution is one per-key-batch aggregate + a bounded lag "
    "window — no self-join, no rescan per batch. Scale: one shuffle "
    "on (user, batch), one on user for the window.",
)
def lww_stream_convergence_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    guard = F.assert_true(
        (F.col("event_id") >= 0) & (F.col("event_id") < F.lit(_ID_RADIX)),
        F.lit(
            "lww_stream_convergence: event_id outside [0, 1e7) breaks "
            "the (epoch_s, id) int64 packing"
        ),
    )
    packed = (
        F.col("es") * F.lit(_ID_RADIX)
        + F.col("event_id")
        + F.coalesce(guard.cast("long"), F.lit(0))
    )
    kb = ev.groupBy("user_id", "batch").agg(
        F.max(packed).alias("mxp"), F.count(F.lit(1)).alias("n_rows")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = kb.withColumn("prior", F.max("mxp").over(w))
    return run.groupBy(F.col("batch").cast("long").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_keys_in_batch"),
        F.sum(F.col("prior").isNull().cast("long")).alias("n_first_seen"),
        F.sum(
            (F.col("prior").isNotNull() & (F.col("mxp") > F.col("prior")))
            .cast("long")
        ).alias("n_winner_updates"),
        F.sum(
            (F.col("prior").isNotNull() & (F.col("mxp") < F.col("prior")))
            .cast("long")
        ).alias("n_stale_batches"),
    )


_WM_DELAYS = [0, 60, 600, 3600]

_WM_DROP_ORACLE = (
    _EV_BATCH_CTE
    + """, bm AS (
  SELECT batch, CAST(max(es) AS BIGINT) AS bmax FROM ev GROUP BY batch
), wm AS (
  SELECT batch,
         CAST(max(bmax) OVER (ORDER BY batch
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS BIGINT) AS m
  FROM bm
), flagged AS (
  SELECT e.batch, CAST(d.d AS BIGINT) AS delay_s,
         CASE WHEN w.m IS NOT NULL AND e.es < w.m - d.d
              THEN 1 ELSE 0 END AS dropped
  FROM ev e
  JOIN wm w ON w.batch = e.batch
  CROSS JOIN (SELECT unnest([0, 60, 600, 3600]) AS d) d
)
SELECT CAST(batch AS BIGINT) AS batch, delay_s,
       CAST(sum(dropped) AS BIGINT) AS n_dropped
FROM flagged GROUP BY batch, delay_s"""
)


@stage(
    "watermark_drop_matrix_events",
    _WM_DROP_ORACLE,
    "streaming-batch mirror, watermark face: the late-row DROP MATRIX "
    "— for every (micro-batch, candidate delay in {0s, 60s, 10m, "
    "1h}), how many of the batch's rows arrive with event time older "
    "than the running max event time of all PRIOR batches minus the "
    "delay. This is the lag-1 watermark mirror (batch b filters "
    "against max over batches <= b-1 — the deterministic batch-side "
    "definition; Spark's own streaming filter lags one further batch, "
    "the documented round-5 pin), and the matrix is exactly the "
    "delay-tuning table an operator reads before committing a "
    "withWatermark value: the smallest delay whose drop counts are "
    "acceptable. Batch 0 has no prior watermark and drops nothing. "
    "Scale: per-batch maxes are a 5-row aggregate; the running max "
    "is a 5-row window; rows meet it on an equi-join on batch and "
    "the 4 delays expand via a map-side explode of a literal array — "
    "no cross join of data against data.",
)
def watermark_drop_matrix_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    bm = ev.groupBy("batch").agg(F.max("es").alias("bmax"))
    w = Window.orderBy("batch").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = bm.withColumn("m", F.max("bmax").over(w)).select("batch", "m")
    flagged = (
        ev.join(F.broadcast(wm), "batch")
        .select(
            "batch", "es", "m",
            F.explode(
                F.array(*[F.lit(d).cast("long") for d in _WM_DELAYS])
            ).alias("delay_s"),
        )
        .select(
            "batch", "delay_s",
            F.when(
                F.col("m").isNotNull()
                & (F.col("es") < F.col("m") - F.col("delay_s")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("dropped"),
        )
    )
    return flagged.groupBy(
        F.col("batch").cast("long").alias("batch"), "delay_s"
    ).agg(F.sum("dropped").cast("long").alias("n_dropped"))


_SESS_GAP = 1800  # the sessionization_events 30-min gap rule

_SESS_OPEN_ORACLE = (
    _EV_BATCH_CTE
    + f""", marked AS (
  SELECT user_id, es, event_id, mn, mx,
         CASE WHEN lag(es) OVER (PARTITION BY user_id
                                 ORDER BY es, event_id) IS NULL
                   OR es - lag(es) OVER (PARTITION BY user_id
                                         ORDER BY es, event_id)
                      > {_SESS_GAP}
              THEN 1 ELSE 0 END AS new_s
  FROM ev
), sid AS (
  SELECT user_id, es, mn, mx,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY es, event_id
                          ROWS UNBOUNDED PRECEDING) AS s
  FROM marked
), sess AS (
  SELECT user_id, s, mn, mx,
         CAST(min(es) AS BIGINT) AS s_start,
         CAST(max(es) AS BIGINT) AS s_end
  FROM sid GROUP BY user_id, s, mn, mx
), opened AS (
  SELECT user_id,
         CAST(c.c AS BIGINT) AS cut_idx,
         mn + ((mx - mn + 1) * (c.c + 1)) // {_NB} AS cut_s,
         s_start, s_end
  FROM sess CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS c) c
)
SELECT cut_idx,
       CAST(sum(CASE WHEN s_start <= cut_s
                      AND s_end + {_SESS_GAP} > cut_s
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_open_sessions,
       CAST(count(DISTINCT CASE WHEN s_start <= cut_s
                                 AND s_end + {_SESS_GAP} > cut_s
                                THEN user_id END) AS BIGINT)
         AS n_open_users
FROM opened GROUP BY cut_idx"""
)


@stage(
    "session_open_state_events",
    _SESS_OPEN_ORACLE,
    "streaming-batch mirror, sessionization face: OPEN-SESSION STATE "
    "at each of the 4 interior micro-batch cuts — sessions (30-min "
    "gap rule, the sessionization_events convention) that started at "
    "or before the cut and whose gap-timeout has not yet expired "
    "(last event + gap > cut), i.e. exactly the sessions the "
    "streaming sessionizer holds in its state store at that trigger "
    "(a session leaves state only when the watermark passes last "
    "event + gap — streaming/sessionize.py's eviction rule). "
    "n_open_sessions is the state-row count "
    "(watermark_state_rows_events' sessionized sibling) and sizes "
    "the executor-memory budget of applyInPandasWithState at any "
    "scale. Shape: the single-shuffle gaps-and-islands session "
    "build, then a 4-way explode of cut indexes over the ~sessions "
    "frame (map-side literal explode; cut times are exact ints off "
    "the broadcast bounds).",
)
def session_open_state_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    wlag = Window.partitionBy("user_id").orderBy("es", "event_id")
    marked = ev.withColumn(
        "new_s",
        (
            F.lag("es").over(wlag).isNull()
            | ((F.col("es") - F.lag("es").over(wlag)) > _SESS_GAP)
        ).cast("int"),
    )
    # the running sum must use the SAME total order as the lag that
    # computed new_s — ordering by es alone leaves same-second rows
    # free to permute, which can move a tied row across a session
    # boundary differently per engine/partitioning
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("es", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sid = marked.withColumn("s", F.sum("new_s").over(wrun))
    sess = sid.groupBy("user_id", "s", "mn", "mx").agg(
        F.min("es").alias("s_start"), F.max("es").alias("s_end")
    )
    opened = sess.select(
        "user_id", "s_start", "s_end",
        F.explode(
            F.array(*[F.lit(c).cast("long") for c in range(4)])
        ).alias("cut_idx"),
        "mn", "mx",
    ).withColumn(
        "cut_s", F.expr(f"mn + (mx - mn + 1) * (cut_idx + 1) div {_NB}")
    )
    is_open = (F.col("s_start") <= F.col("cut_s")) & (
        F.col("s_end") + _SESS_GAP > F.col("cut_s")
    )
    return opened.groupBy("cut_idx").agg(
        F.sum(is_open.cast("long")).alias("n_open_sessions"),
        F.countDistinct(F.when(is_open, F.col("user_id"))).alias(
            "n_open_users"
        ),
    )


_TOPK_STAB_ORACLE = (
    _EV_BATCH_CTE
    + """, cnt AS (
  SELECT batch, user_id, CAST(count(*) AS BIGINT) AS c
  FROM ev GROUP BY batch, user_id
), ranked AS (
  SELECT batch, user_id, c,
         row_number() OVER (PARTITION BY batch
                            ORDER BY c DESC, user_id) AS rn
  FROM cnt
), top5 AS (
  SELECT batch, user_id, rn FROM ranked WHERE rn <= 5
)
SELECT CAST(cur.batch AS BIGINT) AS batch,
       CAST(max(CASE WHEN cur.rn = 1 THEN cur.user_id END) AS BIGINT)
         AS top_user,
       CAST(count(prev.user_id) AS BIGINT) AS n_carried
FROM top5 cur
LEFT JOIN top5 prev
  ON prev.user_id = cur.user_id AND prev.batch = cur.batch - 1
WHERE cur.batch >= 1
GROUP BY cur.batch"""
)


@stage(
    "topk_stream_stability_events",
    _TOPK_STAB_ORACLE,
    "streaming-batch mirror, heavy-hitter face: TOP-K STABILITY "
    "across micro-batches — for each batch >= 1, its top-5 users by "
    "event count (deterministic (count DESC, user ASC) rank), the "
    "rank-1 user, and how many of the top-5 were ALSO top-5 in the "
    "previous batch. Carryover near 5 says the heavy-hitter sketch "
    "(streaming/heavy_hitters) can be checkpointed rarely and its "
    "per-trigger emission diffed; carryover near 0 says hot keys "
    "churn per trigger and downstream consumers must treat every "
    "emission as a full replacement — the operational bit the "
    "lossy-counting epsilon guarantee deliberately does not state "
    "(contents vary with order, the r10 pin). Shape: one grouped "
    "count per (batch, user), a per-batch bounded rank window, and "
    "a self-equi-join of two 25-row frames.",
)
def topk_stream_stability_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    cnt = ev.groupBy("batch", "user_id").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("batch").orderBy(F.desc("c"), "user_id")
    top5 = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("batch", "user_id", "rn")
    )
    cur = top5.filter(F.col("batch") >= 1)
    prev = top5.select(
        (F.col("batch") + 1).alias("batch"),
        F.col("user_id").alias("prev_user"),
    )
    return (
        cur.join(
            prev,
            (cur["batch"] == prev["batch"])
            & (cur["user_id"] == prev["prev_user"]),
            "left",
        )
        .groupBy(cur["batch"].cast("long").alias("batch"))
        .agg(
            F.max(
                F.when(F.col("rn") == 1, F.col("user_id"))
            ).cast("long").alias("top_user"),
            F.count("prev_user").alias("n_carried"),
        )
    )


_CDC_DISORDER_ORACLE = (
    _EV_BATCH_CTE
    + """, kb AS (
  SELECT user_id, batch, CAST(max(es) AS BIGINT) AS bmax
  FROM ev GROUP BY user_id, batch
), pri AS (
  SELECT user_id, batch,
         CAST(max(bmax) OVER (PARTITION BY user_id ORDER BY batch
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS BIGINT) AS prior_max
  FROM kb
)
SELECT CAST(e.batch AS BIGINT) AS batch,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN p.prior_max IS NOT NULL
                      AND e.es < p.prior_max
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_out_of_order,
       round(CAST(sum(CASE WHEN p.prior_max IS NOT NULL
                            AND e.es < p.prior_max
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 9)
         AS ooo_share
FROM ev e JOIN pri p ON p.user_id = e.user_id AND p.batch = e.batch
GROUP BY e.batch"""
)


@stage(
    "cdc_disorder_rate_events",
    _CDC_DISORDER_ORACLE,
    "streaming-batch mirror, disorder face: the PER-BATCH OUT-OF-ORDER "
    "RATE — rows arriving with event time strictly older than their "
    "key's max event time across all PRIOR batches (per-key lag-1 "
    "running max, same construction as the LWW winner tracking). "
    "This is the disorder the split/order-invariance proofs "
    "(tests/test_streaming.py's LWW pin) guarantee the stateful "
    "operators absorb; measuring it per batch tells the operator "
    "whether a rising late-data trend is about to cross the "
    "configured watermark delay (pair with watermark_drop_matrix: "
    "this query is per-KEY disorder, that one is per-STREAM "
    "lateness). Shape: per-(key, batch) maxes, a bounded per-key lag "
    "window over ~key x 5 rows, then one equi-join back on (key, "
    "batch) — shuffles bounded by key cardinality, never event "
    "volume squared.",
)
def cdc_disorder_rate_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    kb = ev.groupBy("user_id", "batch").agg(F.max("es").alias("bmax"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("batch")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pri = kb.withColumn("prior_max", F.max("bmax").over(w)).select(
        "user_id", "batch", "prior_max"
    )
    joined = ev.join(pri, ["user_id", "batch"])
    ooo = (
        F.col("prior_max").isNotNull() & (F.col("es") < F.col("prior_max"))
    ).cast("long")
    return joined.groupBy(F.col("batch").cast("long").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(ooo).alias("n_out_of_order"),
        F.round(
            F.sum(ooo).cast("double") / F.count(F.lit(1)), 9
        ).alias("ooo_share"),
    )


# =====================================================================
# C. Deterministic source-mix planning (the sampling family's
#    optimizer face) — exact integer arithmetic end to end
# =====================================================================

_QUALITY_FLOOR = 20  # docs with >= 20 whitespace tokens count as "ok"

# shared per-source token ledger: token counts are whitespace-split
# word counts (the dup_ngram_span / text-stats convention) — exact
# ints, so every allocation below is replayable bit-for-bit
_SRC_CTE = f"""WITH words AS (
  SELECT doc_id, source, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
  FROM documents
), src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ntok) AS BIGINT) AS tokens,
         CAST(sum(CASE WHEN ntok >= {_QUALITY_FLOOR}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
         CAST(sum(CASE WHEN ntok >= {_QUALITY_FLOOR}
                       THEN ntok ELSE 0 END) AS BIGINT) AS tokens_ok
  FROM words GROUP BY source
), tot AS (
  SELECT CAST(sum(tokens) AS BIGINT) AS t,
         CAST(sum(tokens_ok) AS BIGINT) AS t_ok,
         CAST(count(*) AS BIGINT) AS n_src
  FROM src
)"""


def _src_frame(spark, sf_dir):
    """(per-source ledger frame, with the 1-row totals broadcast on
    every row) — the Spark mirror of _SRC_CTE."""
    words = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
    )
    ok = F.col("ntok") >= _QUALITY_FLOOR
    src = words.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("tokens"),
        F.sum(ok.cast("long")).alias("n_ok"),
        F.sum(F.when(ok, F.col("ntok")).otherwise(0)).alias("tokens_ok"),
    )
    # optimization r15 (guide §5): src feeds the totals AND the
    # returned frame — checkpoint the per-source ledger so the corpus
    # scan+aggregate runs once for every _src_frame consumer.
    src = src.localCheckpoint()
    tot = src.agg(
        F.sum("tokens").alias("t"),
        F.sum("tokens_ok").alias("t_ok"),
        F.count(F.lit(1)).alias("n_src"),
    )
    return src.crossJoin(F.broadcast(tot))


_BUDGET_ALLOC_ORACLE = (
    _SRC_CTE
    + """, ranked AS (
  SELECT s.*, t.t,
         row_number() OVER (ORDER BY CAST(n_ok AS DOUBLE) / n_docs DESC,
                            source) AS rank
  FROM src s, tot t
), cum AS (
  SELECT *,
         CAST(coalesce(sum(tokens) OVER (ORDER BY rank
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM ranked
)
SELECT source, CAST(rank AS BIGINT) AS rank, n_docs, tokens,
       round(CAST(n_ok AS DOUBLE) / n_docs, 9) AS quality,
       CAST(greatest(CAST(0 AS BIGINT),
                     least(tokens,
                           CAST((3 * t) // 5 AS BIGINT) - cum_before))
            AS BIGINT) AS alloc_tokens
FROM cum"""
)


@stage(
    "token_budget_allocation_documents",
    _BUDGET_ALLOC_ORACLE,
    "source-mix planning: GREEDY TOKEN-BUDGET ALLOCATION — rank "
    "sources by quality (share of docs above the 20-token floor, "
    "deterministic (quality DESC, source ASC) order), then fill a "
    "budget of 60% of the corpus (exact: (3*total) div 5) by taking "
    "each source whole until the budget runs out, clipping the "
    "boundary source: alloc = clamp(B - cum_before, 0, tokens). This "
    "is the planner a pretraining data pipeline runs before the "
    "samplers (split_assign / weighted_sample execute what this "
    "decides): exact integer cumulative sums make the plan "
    "replayable and auditable — the same greedy prefix on any engine. "
    "Scale: the ledger is one grouped scan; ranking and the "
    "cumulative window run over #sources rows — pure metadata, like "
    "the 8-row fixed-edge ECDF window.",
)
def token_budget_allocation_documents(spark, sf_dir):
    src = _src_frame(spark, sf_dir)
    quality = F.col("n_ok").cast("double") / F.col("n_docs")
    w = Window.orderBy(F.desc(quality), "source")
    ranked = src.withColumn("rank", F.row_number().over(w))
    wc = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = ranked.withColumn(
        "cum_before", F.coalesce(F.sum("tokens").over(wc), F.lit(0))
    )
    budget = F.expr("3 * t div 5")
    return cum.select(
        "source",
        F.col("rank").cast("long").alias("rank"),
        "n_docs",
        "tokens",
        F.round(quality, 9).alias("quality"),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col("tokens"), budget - F.col("cum_before")),
        ).alias("alloc_tokens"),
    )


_FLOOR_SWEEP = [5, 10, 20, 40, 80]

_FLOOR_SWEEP_ORACLE = (
    _SRC_CTE
    + """
SELECT CAST(f.f AS BIGINT) AS floor_tokens,
       CAST(sum(CASE WHEN w.ntok >= f.f THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs,
       CAST(sum(CASE WHEN w.ntok >= f.f THEN w.ntok ELSE 0 END) AS BIGINT)
         AS tokens,
       round(CAST(sum(CASE WHEN w.ntok >= f.f THEN w.ntok ELSE 0 END)
                  AS DOUBLE) / t.t, 9) AS token_share
FROM words w
CROSS JOIN (SELECT unnest([5, 10, 20, 40, 80]) AS f) f, tot t
GROUP BY f.f, t.t"""
)


@stage(
    "length_floor_sweep_documents",
    _FLOOR_SWEEP_ORACLE,
    "source-mix planning: the QUALITY-FLOOR TUNING CURVE — surviving "
    "documents, surviving tokens, and surviving token share for each "
    "candidate length floor in {5, 10, 20, 40, 80} whitespace "
    "tokens. A pipeline picks its floor by reading this curve (where "
    "does the next doubling of the floor start costing real data?), "
    "and re-reads it per corpus refresh because length distributions "
    "drift. Shape: the floors expand via a map-side explode of a "
    "literal array (no data-vs-data join), so the whole sweep is ONE "
    "scan + a 5-cell aggregate — the same fixed-edge sweep economics "
    "as the shape tests and semdedup_threshold_sweep. The 0-floor "
    "row is deliberately absent: it is the tot CTE (everything "
    "survives).",
)
def length_floor_sweep_documents(spark, sf_dir):
    words = load_table(spark, sf_dir, "documents").select(
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok")
    )
    tot = words.agg(F.sum("ntok").alias("t"))
    swept = (
        words.crossJoin(F.broadcast(tot))
        .select(
            "ntok", "t",
            F.explode(
                F.array(*[F.lit(x).cast("long") for x in _FLOOR_SWEEP])
            ).alias("floor_tokens"),
        )
    )
    surv = F.col("ntok") >= F.col("floor_tokens")
    return swept.groupBy("floor_tokens", "t").agg(
        F.sum(surv.cast("long")).alias("n_docs"),
        F.sum(F.when(surv, F.col("ntok")).otherwise(0)).alias("tokens"),
        F.round(
            F.sum(F.when(surv, F.col("ntok")).otherwise(0)).cast("double")
            / F.col("t"),
            9,
        ).alias("token_share"),
    ).drop("t")


_REPEAT_CAP = 3  # max epochs any source's tokens may repeat

_EPOCH_SCHED_ORACLE = (
    _SRC_CTE
    + f""", ranked AS (
  SELECT s.*, t.t, t.t_ok,
         row_number() OVER (ORDER BY CAST(n_ok AS DOUBLE) / n_docs DESC,
                            source) AS rank
  FROM src s, tot t
), prop AS (
  SELECT *,
         CAST((2 * t * tokens_ok) // t_ok AS BIGINT) AS prop_alloc,
         CAST(least(CAST((2 * t * tokens_ok) // t_ok AS BIGINT),
                    {_REPEAT_CAP} * tokens) AS BIGINT) AS capped_alloc
  FROM ranked
), lo AS (
  SELECT CAST(2 * max(t) - sum(capped_alloc) AS BIGINT) AS leftover
  FROM prop
), head AS (
  SELECT p.*, lo.leftover,
         CAST({_REPEAT_CAP} * tokens - capped_alloc AS BIGINT) AS headroom,
         CAST(coalesce(sum({_REPEAT_CAP} * tokens - capped_alloc)
                OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS BIGINT) AS head_before
  FROM prop p, lo
)
SELECT source, CAST(rank AS BIGINT) AS rank, tokens, prop_alloc,
       capped_alloc,
       CAST(capped_alloc
            + greatest(CAST(0 AS BIGINT),
                       least(headroom, leftover - head_before))
            AS BIGINT) AS final_alloc,
       round(CAST(capped_alloc
                  + greatest(CAST(0 AS BIGINT),
                             least(headroom, leftover - head_before))
                  AS DOUBLE) / tokens, 6) AS repeat_factor
FROM head"""
)


@stage(
    "epoch_repetition_schedule_documents",
    _EPOCH_SCHED_ORACLE,
    "source-mix planning: EPOCH SCHEDULE UNDER A REPETITION CAP — a "
    "2x-corpus token budget is first allocated proportionally to "
    "each source's QUALITY-SURVIVING tokens (prop = (2*total * "
    "tokens_ok) div total_ok: clean sources earn repetition), capped "
    "at 3 epochs of any single source, and the leftover from capping "
    "is redistributed greedily in quality-rank order into the "
    "remaining headroom (add = clamp(leftover - headroom_before, 0, "
    "headroom)). The repeat factor per source is the number a "
    "data-order scheduler turns into actual epoch passes; the cap is "
    "the memorization guard. Everything up to the final reported "
    "factor is exact integer arithmetic — floors, mins, cumulative "
    "headroom — so the plan replays identically on any engine and "
    "any partitioning. Scale: one grouped scan + #sources-row "
    "windows (metadata).",
)
def epoch_repetition_schedule_documents(spark, sf_dir):
    src = _src_frame(spark, sf_dir)
    quality = F.col("n_ok").cast("double") / F.col("n_docs")
    w = Window.orderBy(F.desc(quality), "source")
    ranked = src.withColumn("rank", F.row_number().over(w))
    prop = ranked.withColumn(
        "prop_alloc", F.expr("2 * t * tokens_ok div t_ok")
    ).withColumn(
        "capped_alloc",
        F.least(F.col("prop_alloc"), F.lit(_REPEAT_CAP) * F.col("tokens")),
    )
    # leftover is a scalar: total budget minus capped sum (>= 0 since
    # capping only shrinks floor-summed allocations)
    lo = prop.agg(
        (F.lit(2) * F.max("t") - F.sum("capped_alloc"))
        .cast("long")
        .alias("leftover")
    )
    head = (
        prop.crossJoin(F.broadcast(lo))
        .withColumn(
            "headroom",
            (F.lit(_REPEAT_CAP) * F.col("tokens") - F.col("capped_alloc"))
            .cast("long"),
        )
        .withColumn(
            "head_before",
            F.coalesce(
                F.sum("headroom").over(
                    Window.orderBy("rank").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
    )
    add = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("headroom"), F.col("leftover") - F.col("head_before")),
    )
    final = (F.col("capped_alloc") + add).cast("long")
    return head.select(
        "source",
        F.col("rank").cast("long").alias("rank"),
        "tokens",
        "prop_alloc",
        "capped_alloc",
        final.alias("final_alloc"),
        F.round(final.cast("double") / F.col("tokens"), 6).alias(
            "repeat_factor"
        ),
    )


_SAMPLE_SLOTS = 1000

_REMAINDER_ORACLE = (
    _SRC_CTE
    + f""", based AS (
  SELECT s.source, s.tokens, t.t,
         CAST(({_SAMPLE_SLOTS} * s.tokens) // t.t AS BIGINT) AS base_slots,
         CAST(({_SAMPLE_SLOTS} * s.tokens) % t.t AS BIGINT) AS rem
  FROM src s, tot t
), extras AS (
  SELECT CAST({_SAMPLE_SLOTS} - sum(base_slots) AS BIGINT) AS n_extra
  FROM based
)
SELECT b.source, b.tokens, b.base_slots,
       CAST(CASE WHEN row_number() OVER (ORDER BY b.rem DESC, b.source)
                      <= e.n_extra
                 THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(b.base_slots
            + CASE WHEN row_number() OVER (ORDER BY b.rem DESC, b.source)
                        <= e.n_extra
                   THEN 1 ELSE 0 END AS BIGINT) AS slots
FROM based b, extras e"""
)


@stage(
    "sample_slots_largest_remainder_documents",
    _REMAINDER_ORACLE,
    "source-mix planning: LARGEST-REMAINDER (Hamilton) ROUNDING of "
    "fractional source shares into exactly 1000 integer sample "
    "slots: base = (1000*tokens) div total per source, then the "
    "slots lost to flooring go one each to the largest remainders "
    "((remainder DESC, source ASC) — fully deterministic). The slot "
    "vector is what a stratified sampler actually consumes (it "
    "cannot draw 12.7 documents), and largest-remainder is the "
    "rounding that keeps every source within one slot of its exact "
    "share — naive per-source rounding can lose or invent slots and "
    "systematically starve small sources. Integer division and "
    "modulo make every column exact; the in-repo test asserts the "
    "slots sum to exactly 1000. Scale: #sources-row arithmetic off "
    "one grouped scan.",
)
def sample_slots_largest_remainder_documents(spark, sf_dir):
    src = _src_frame(spark, sf_dir)
    based = src.select(
        "source",
        "tokens",
        F.expr(f"{_SAMPLE_SLOTS} * tokens div t").alias("base_slots"),
        (F.lit(_SAMPLE_SLOTS) * F.col("tokens") % F.col("t")).alias("rem"),
    )
    extras = based.agg(
        (F.lit(_SAMPLE_SLOTS) - F.sum("base_slots"))
        .cast("long")
        .alias("n_extra")
    )
    w = Window.orderBy(F.desc("rem"), "source")
    return (
        based.crossJoin(F.broadcast(extras))
        .withColumn("rn", F.row_number().over(w))
        .select(
            "source",
            "tokens",
            "base_slots",
            (F.col("rn") <= F.col("n_extra")).cast("long").alias("extra"),
            (
                F.col("base_slots")
                + (F.col("rn") <= F.col("n_extra")).cast("long")
            ).alias("slots"),
        )
    )


_DEDUP_BUDGET_ORACLE = f"""WITH words AS (
  SELECT doc_id, source, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
         CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY lower(text))
              THEN 1 ELSE 0 END AS survivor
  FROM documents
), src AS (
  SELECT source,
         CAST(sum(ntok) AS BIGINT) AS raw_tokens,
         CAST(sum(CASE WHEN survivor = 1 THEN ntok ELSE 0 END) AS BIGINT)
           AS uniq_tokens
  FROM words GROUP BY source
), tot AS (
  SELECT CAST(sum(raw_tokens) AS BIGINT) AS tr,
         CAST(sum(uniq_tokens) AS BIGINT) AS tu
  FROM src
)
SELECT s.source, s.raw_tokens, s.uniq_tokens,
       CAST(({_SAMPLE_SLOTS} * s.raw_tokens) // t.tr AS BIGINT)
         AS raw_base_slots,
       CAST(({_SAMPLE_SLOTS} * s.uniq_tokens) // t.tu AS BIGINT)
         AS uniq_base_slots,
       CAST(({_SAMPLE_SLOTS} * s.uniq_tokens) // t.tu
            - ({_SAMPLE_SLOTS} * s.raw_tokens) // t.tr AS BIGINT)
         AS slot_delta
FROM src s, tot t"""


@stage(
    "dedup_adjusted_budget_documents",
    _DEDUP_BUDGET_ORACLE,
    "source-mix planning: DEDUP-ADJUSTED BUDGET — each source's token "
    "count before and after exact dedup (survivor = min doc_id per "
    "lowercased text, the dedup_exact survivor convention), and the "
    "shift in its floored share of 1000 sample slots when shares are "
    "computed on UNIQUE rather than raw tokens. A source that loses "
    "slots here was buying weight with copies — the allocation "
    "correction that makes the mix planner and the dedup pass agree "
    "(raw-share planning systematically over-samples crawl-heavy "
    "sources). Floored (pre-remainder) slots on both sides keep "
    "every column pure integer arithmetic; the largest-remainder "
    "twin handles the exact-sum rounding. Scale: the survivor flag "
    "is one window over the text-keyed shuffle the exact-dedup "
    "family already pays; everything after is #sources-row "
    "arithmetic.",
)
def dedup_adjusted_budget_documents(spark, sf_dir):
    words = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
        F.lower(F.col("text")).alias("norm"),
    )
    wmin = Window.partitionBy("norm")
    flagged = words.withColumn(
        "survivor",
        (F.col("doc_id") == F.min("doc_id").over(wmin)).cast("long"),
    )
    # optimization r15 (guide §5): src feeds the totals AND the
    # returned frame — checkpoint so the survivor window + corpus scan
    # runs once.
    src = flagged.groupBy("source").agg(
        F.sum("ntok").alias("raw_tokens"),
        F.sum(F.when(F.col("survivor") == 1, F.col("ntok")).otherwise(0))
        .alias("uniq_tokens"),
    ).localCheckpoint()
    tot = src.agg(
        F.sum("raw_tokens").alias("tr"), F.sum("uniq_tokens").alias("tu")
    )
    out = src.crossJoin(F.broadcast(tot))
    raw_slots = F.expr(f"{_SAMPLE_SLOTS} * raw_tokens div tr")
    uniq_slots = F.expr(f"{_SAMPLE_SLOTS} * uniq_tokens div tu")
    return out.select(
        "source",
        "raw_tokens",
        "uniq_tokens",
        raw_slots.alias("raw_base_slots"),
        uniq_slots.alias("uniq_base_slots"),
        (uniq_slots - raw_slots).alias("slot_delta"),
    )


_MIX_EPS = 1e-6  # the psi_bins_lineitem epsilon convention

_MIX_SHIFT_ORACLE = (
    _SRC_CTE
    + f""", capped AS (
  SELECT s.source, s.tokens, t.t,
         CAST(least(s.tokens, t.t // (2 * t.n_src)) AS BIGINT)
           AS capped_tokens
  FROM src s, tot t
), ct AS (
  SELECT CAST(sum(capped_tokens) AS BIGINT) AS c FROM capped
)
SELECT k.source, k.tokens, k.capped_tokens,
       round((CAST(k.capped_tokens AS DOUBLE) / ct.c
              - CAST(k.tokens AS DOUBLE) / k.t)
             * ln((CAST(k.capped_tokens AS DOUBLE) / ct.c + {_MIX_EPS})
                  / (CAST(k.tokens AS DOUBLE) / k.t + {_MIX_EPS})), 6)
         AS psi_term
FROM capped k, ct"""
)


@stage(
    "mix_shift_under_caps_documents",
    _MIX_SHIFT_ORACLE,
    "source-mix planning: MIX SHIFT UNDER A PER-SOURCE CAP — token "
    "shares before vs after capping every source at total div "
    "(2 * n_sources) (a relative cap, so the policy is "
    "scale-invariant), scored as per-source PSI terms (the "
    "psi_bins_lineitem convention: eps = 1e-6, 6dp per-term rows — "
    "terms are emitted per source rather than pre-summed so the "
    "transcendental ln never accumulates across rows before "
    "rounding). The summed terms against the classical 0.2 alarm "
    "say whether an anti-dominance cap materially changes what the "
    "model sees, or merely trims one heavy crawl; the per-source "
    "sign says who pays. Scale: #sources-row arithmetic off one "
    "grouped scan; the cap and both share vectors are exact ints "
    "until the final reported ratio.",
)
def mix_shift_under_caps_documents(spark, sf_dir):
    src = _src_frame(spark, sf_dir)
    capped = src.select(
        "source", "tokens", "t",
        F.least(
            F.col("tokens"), F.expr("t div (2 * n_src)")
        ).alias("capped_tokens"),
    )
    ct = capped.agg(F.sum("capped_tokens").alias("c"))
    out = capped.crossJoin(F.broadcast(ct))
    q = F.col("capped_tokens").cast("double") / F.col("c")
    p = F.col("tokens").cast("double") / F.col("t")
    return out.select(
        "source",
        "tokens",
        "capped_tokens",
        F.round(
            (q - p) * F.log((q + F.lit(_MIX_EPS)) / (p + F.lit(_MIX_EPS))),
            6,
        ).alias("psi_term"),
    )


# ---------------------------------------------------------------------
# Round-13 promotion hook (second pass; see queries_more's re-entrancy
# note): this module bootstraps the catalog chain BEFORE defining
# STAGED_R13, so importing THIS module first runs the whole
# registration chain while STAGED_R13 is still empty. Re-invoking the
# skip-if-registered promotion here — after all twenty entries exist —
# makes the catalog complete under either import order (the
# queries_staging_r8..r12 pattern, verbatim).
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r13 as _promote  # noqa: E402

_promote()
del _promote
