"""ROUND-14 STAGED catalog queries — seeded in round 11 (the staging
pipeline stays stocked ahead: r12 and r13 cohorts are already staged,
so this keeps two full cohorts in the pipe as rounds 12/13 promote),
NOT registered (same freeze protocol as queries_staging_r5..r13).
Round 14 promotes them.

The three themes are the in-code ROUND-14 candidate seeds
(queries.py plan comment), each with real 100 TB pull:

CONVERGED GRAPH FIXPOINTS over the shingle-overlap candidate graph
(the hash-free graph queries_staging_r13 introduced — an edge joins
two documents sharing >= 3 distinct word-8-grams, built as an
inverted-index equi-join, never all-pairs). Where the r13 cohort ran
a FIXED number of hash-min rounds (each round oracle-able as one
equi-join + groupBy), these run the driver-side convergence loop TO
THE FIXPOINT (n_changed == 0 stops the loop — exactly the
between-rounds bookkeeping ext/dedup.py's pointer-jumping CC keeps),
and the oracle is the reachability CLOSURE as a DuckDB RECURSIVE CTE:
component = min doc_id reachable. At the fixpoint the k-hop minimum
IS the component minimum, so loop and closure agree exactly —
cross-engine, no iteration-count coupling.

- ``cc_converged_components_documents`` — converged component labels,
  top-20 by (size DESC, label ASC).
- ``cc_size_histogram_documents`` — fixed-edge histogram of converged
  component sizes (the boolean-sum binning convention).
- ``cc_cross_source_components_documents`` — components by how many
  sources they span: the transitive contamination profile.
- ``cc_component_density_documents`` — intra-component edge density
  for the top-10 components: star-shaped template dups vs cliques of
  mutual near-copies.
- ``cc_survivor_savings_documents`` — survivor selection at the
  CONVERGED-component level: tokens retired per component when only
  the canonical (min doc_id == the label) survives.
- ``cc_truncation_error_documents`` — how wrong a k-round
  approximation is vs the fixpoint, k = 1..3: the stop-early error
  curve an iterative-CC operator budgets against.
- ``cc_exact_group_fusion_documents`` — components classified by how
  many distinct normalized texts they fuse: pure exact-dup clusters
  vs genuine near-dup fusions.

LEDGER TIME DIMENSION over the mergeable validation state
(dce_spark/state.py, the r11 API): events are cut into the r13
convention's 5 exact-integer epoch micro-batches; snapshot s is the
cumulative ledger after committing batches 0..s. Every query below is
pure state arithmetic — sums/max/min over per-(partition, batch)
state rows, never a re-scan of the rows a committed state already
covers — which is precisely what makes a validation ledger usable at
100 TB (the reference re-validates the table per run,
crates/contracts_core/src/engine.rs:141-200; a ledger diffs commits
in metadata time). Documented per query below.

CURRICULUM / DATA-ORDERING PLANS over the source-mix planner's world
(queries_staging_r13's allocation family): a deterministic
integer difficulty score per document (mean-word-length milli +
25 x token count — the two classic competence-curriculum proxies,
length and a rarity stand-in, integer-weighted so the plan replays
bit-for-bit on any engine), fixed-edge difficulty buckets (the
boolean-sum convention — NO global sort: at 100 TB a per-doc global
rank is a single-partition window, so ordering is bucket-granular
and the within-bucket order is a deterministic multiplicative-hash
interleave), token-balanced epoch assignment over the bucket
histogram, the pacing curve, and the mix-vs-curriculum interaction
PSI. Documented per query below.

tests/test_staging_r14.py runs these through the SAME compare harness
as the live catalog at the suite's SF. Every query verified against
its DuckDB oracle at sf0.001 + sf0.01 + sf0.1 before commit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

# NOTE r16 (ADVICE fix): no top-of-module catalog bootstrap — this
# module imports r13's graph helpers at module scope and r15 imports
# THIS module's CTEs at module scope, so an early bootstrap made the
# standalone r14-first import die inside the promotion chain while
# this module was still empty. The r13 import below runs the full
# catalog chain (r13's tail hook) with getattr-guarded promotions;
# the tail hook here finishes the r14 and r15 promotions afterwards.
from .data import load_table

# deliberate reuse of the r13 cohort's graph + micro-batch machinery:
# the shingle-overlap candidate graph and the exact-integer batch cut
# are CONVENTIONS (documented there), and the r14 fixpoint/ledger
# queries are their continuation — re-declaring them here would fork
# the convention the moment one copy changed.
from .queries_staging_r13 import (  # noqa: F401
    _EV_BATCH_CTE,
    _GRAPH_CTE,
    _NB,
    _events_batched,
    _gram_edges,
    _gram_pairs,
    _hashmin_round,
    _hashmin_round_flagged,
    _local_result,
)

STAGED_R14: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R14[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R14[name].oracle


# =====================================================================
# A. Converged graph fixpoints over the shingle-overlap dedup graph
# =====================================================================

_MAX_CC_ROUNDS = 32  # safety cap; hash-min needs <= diameter rounds

# the closure oracle: same graph CTE, RECURSIVE reachability, then
# component = min reachable doc_id. DuckDB's UNION (not UNION ALL)
# dedups (v, u) rows per iteration, so cycles terminate.
_GRAPH_RCTE = _GRAPH_CTE.replace("WITH ", "WITH RECURSIVE ", 1)

_CLOSURE_CTE = (
    _GRAPH_RCTE
    + """, reach AS (
  SELECT a AS v, a AS u FROM edges
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN edges e ON e.a = r.u
), comp AS (
  SELECT v, CAST(min(u) AS BIGINT) AS component FROM reach GROUP BY v
)"""
)


def _converged_labels(spark, sf_dir):
    """(labels DF [v, lbl], persisted edges DF, n_rounds) — the
    driver-side hash-min convergence loop run to n_changed == 0.
    Each round is one equi-join + groupBy over the (inverted-index-
    pruned) edge list; the driver only reads ONE scalar per round
    (the changed-row count), so at 100 TB this is O(log diameter)
    distributed rounds with O(1) driver state — the exact loop
    ext/dedup.py's pointer-jumping CC runs, surfaced with its
    convergence telemetry. Caller unpersists both returned frames."""
    pairs = _gram_pairs(spark, sf_dir)
    # persist the edge list ALREADY partitioned on the round-join key
    # b (guide §2.4): every hash-min round joins edges on b, so the
    # cached partitioning is reused and rounds shuffle only the label
    # frame — one up-front exchange instead of one edge-list exchange
    # PER ROUND (at scale the edge list is the big side)
    edges = _gram_edges(pairs).repartition("b").persist()
    lbls = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
        .persist()
    )
    # (r16) no dedicated count() job: round 1's count materializes the
    # cache in the same job — guide §1.2, one pass fewer
    rounds = 0
    prev_cached = None
    while True:
        rounds += 1
        assert rounds <= _MAX_CC_ROUNDS, (
            f"hash-min CC did not converge in {_MAX_CC_ROUNDS} rounds"
        )
        # optimization r15 (guide §2.4): the flagged round carries the
        # changed-bit through the round's own aggregation, so
        # n_changed is a filter+count over the cached round output —
        # the separate nxt-vs-prev join (one extra exchange per
        # round) is gone. Labels and round count are unchanged:
        # chg == (new label < previous), exactly the old join's
        # inequality (hash-min labels only decrease).
        nxt = _hashmin_round_flagged(lbls, edges)
        # truncate lineage every few rounds (round-12 ADVICE): each
        # round's logical plan otherwise nests the previous round's
        # join+groupBy, growing up to _MAX_CC_ROUNDS deep — persist
        # caches DATA but not the plan, so on a deep graph planning
        # time (and driver plan size) inflates despite the
        # O(1)-driver-state loop. localCheckpoint materializes the
        # labels (one row per node) and resets the plan to a scan.
        nxt = nxt.localCheckpoint() if rounds % 4 == 0 else nxt.persist()
        n_changed = nxt.filter("chg").count()
        lbls.unpersist()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = nxt
        lbls = nxt.select("v", "lbl")
        if n_changed == 0:
            break
    # hand the caller a frame whose storage IT controls: checkpoint
    # the (v, lbl) projection and drop the loop's internal cache, so
    # the caller's unpersist() actually frees the last copy
    final = lbls.localCheckpoint()
    if prev_cached is not None:
        prev_cached.unpersist()
    return final, edges, rounds


_CC_CONVERGED_ORACLE = (
    _CLOSURE_CTE
    + """
SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
FROM comp GROUP BY component
ORDER BY n_nodes DESC, component LIMIT 20"""
)


@stage(
    "cc_converged_components_documents",
    _CC_CONVERGED_ORACLE,
    "graph fixpoint: hash-min connected components run TO CONVERGENCE "
    "(the driver loop stops when a round changes zero labels), top-20 "
    "components by (size DESC, label ASC). The r13 fixed-round twin "
    "(cc_hashmin_labels_documents) shows the algorithm mid-flight; "
    "this is the terminal answer, and the oracle is iteration-free — "
    "a DuckDB RECURSIVE reachability closure taking min(reachable "
    "doc_id) — so loop and oracle agree without coupling on a round "
    "count. Scale: each round shuffles the pruned EDGE list only, the "
    "driver holds one counter, and the round count is O(graph "
    "diameter) (dup graphs are shallow; the in-repo test pins "
    "convergence <= 32 rounds).",
)
def cc_converged_components_documents(spark, sf_dir):
    lbls, edges, _ = _converged_labels(spark, sf_dir)
    out = _local_result(
        spark,
        lbls.groupBy(F.col("lbl").cast("long").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy(F.desc("n_nodes"), "component")
        .limit(20),
    )
    lbls.unpersist()
    edges.unpersist()
    return out


_SIZE_EDGES = [3, 4, 5, 9, 17]

_SIZE_BUCKET_SQL = " + ".join(
    f"CAST((n_nodes >= {e}) AS INT)" for e in _SIZE_EDGES
)

_CC_SIZEHIST_ORACLE = (
    _CLOSURE_CTE
    + f""", sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
  FROM comp GROUP BY component
)
SELECT CAST({_SIZE_BUCKET_SQL} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(n_nodes) AS BIGINT) AS n_docs,
       CAST(min(n_nodes) AS BIGINT) AS min_size,
       CAST(max(n_nodes) AS BIGINT) AS max_size
FROM sizes GROUP BY 1"""
)


@stage(
    "cc_size_histogram_documents",
    _CC_SIZEHIST_ORACLE,
    "graph fixpoint: fixed-edge histogram of CONVERGED component "
    "sizes (edges 3/4/5/9/17, the boolean-sum codegen binning "
    "convention — every graph node has >= 1 edge, so sizes start at "
    "2). The size distribution is the dedup planner's sizing input: "
    "mass in small buckets means pair-level dedup suffices, mass in "
    "the tail means survivor selection must handle big clusters (and "
    "the driver union-find threshold in ext/dedup.py:568 is sized by "
    "exactly this curve). Scale: the histogram is #components rows "
    "reduced to <= 6 buckets — metadata after the CC rounds.",
)
def cc_size_histogram_documents(spark, sf_dir):
    lbls, edges, _ = _converged_labels(spark, sf_dir)
    sizes = lbls.groupBy("lbl").agg(F.count(F.lit(1)).alias("n_nodes"))
    bucket = None
    for e in _SIZE_EDGES:
        t = (F.col("n_nodes") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    out = _local_result(
        spark,
        sizes.groupBy(bucket.cast("long").alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum("n_nodes").alias("n_docs"),
            F.min("n_nodes").alias("min_size"),
            F.max("n_nodes").alias("max_size"),
        ),
    )
    lbls.unpersist()
    edges.unpersist()
    return out


_CC_XSOURCE_ORACLE = (
    _CLOSURE_CTE
    + """, labeled AS (
  SELECT c.component, d.source
  FROM comp c JOIN documents d ON d.doc_id = c.v
), per AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM labeled GROUP BY component
)
SELECT n_sources, CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(n_docs) AS BIGINT) AS n_docs
FROM per GROUP BY n_sources"""
)


@stage(
    "cc_cross_source_components_documents",
    _CC_XSOURCE_ORACLE,
    "graph fixpoint: converged components grouped by how many SOURCES "
    "their members span. cross_source_edge_mix_documents (r13) counts "
    "cross-source EDGES; this is the transitive closure of that "
    "signal — a component spanning 3 sources is one text family "
    "syndicated across three feeds even if no single edge connects "
    "all three, which is what a contamination audit actually needs "
    "(eval-set leakage travels along paths, not single edges). "
    "Scale: one broadcast-sized join from labels to document "
    "metadata, then #components-row arithmetic.",
)
def cc_cross_source_components_documents(spark, sf_dir):
    lbls, edges, _ = _converged_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("v"), "source"
    )
    per = (
        lbls.join(docs, "v")
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
    )
    out = _local_result(
        spark,
        per.groupBy("n_sources").agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum("n_docs").alias("n_docs"),
        ),
    )
    lbls.unpersist()
    edges.unpersist()
    return out


_CC_DENSITY_ORACLE = (
    _CLOSURE_CTE
    + """, ec AS (
  SELECT c.component, CAST(count(*) AS BIGINT) AS n_edges
  FROM prs p JOIN comp c ON c.v = p.a
  GROUP BY c.component
), nc AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_nodes
  FROM comp GROUP BY component
)
SELECT n.component, n.n_nodes, e.n_edges,
       round(2.0 * e.n_edges / (n.n_nodes * (n.n_nodes - 1)), 9)
         AS density
FROM nc n JOIN ec e ON e.component = n.component
ORDER BY n.n_nodes DESC, n.component LIMIT 10"""
)


@stage(
    "cc_component_density_documents",
    _CC_DENSITY_ORACLE,
    "graph fixpoint: intra-component edge DENSITY (2E / N(N-1)) for "
    "the top-10 converged components. Density 1.0 is a clique — "
    "every member is a direct near-copy of every other (template "
    "spam); low density is a chain or star — copies-of-copies where "
    "transitive merging is doing real work, and where a survivor "
    "threshold tuned on direct similarity under-merges. Every "
    "candidate pair is intra-component by construction (an edge "
    "implies same component), so the per-component edge count is one "
    "equi-join from the (a < b) pair list to the label frame. "
    "Scale: #pairs-row join, #components-row arithmetic.",
)
def cc_component_density_documents(spark, sf_dir):
    lbls, edges, _ = _converged_labels(spark, sf_dir)
    pairs = edges.filter(F.col("a") < F.col("b"))
    ec = (
        pairs.join(
            lbls.select(F.col("v").alias("a"), F.col("lbl")), "a"
        )
        .groupBy(F.col("lbl").cast("long").alias("component"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    nc = lbls.groupBy(F.col("lbl").cast("long").alias("component")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    dens = F.round(
        F.lit(2.0)
        * F.col("n_edges")
        / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))),
        9,
    )
    out = _local_result(
        spark,
        nc.join(ec, "component")
        .select("component", "n_nodes", "n_edges", dens.alias("density"))
        .orderBy(F.desc("n_nodes"), "component")
        .limit(10),
    )
    lbls.unpersist()
    edges.unpersist()
    return out


_CC_SAVINGS_ORACLE = (
    _CLOSURE_CTE
    + """, toks AS (
  SELECT c.component, c.v,
         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ntok
  FROM comp c JOIN documents d ON d.doc_id = c.v
), per AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(ntok) AS BIGINT) AS tokens_total,
         CAST(sum(CASE WHEN v = component THEN ntok ELSE 0 END)
              AS BIGINT) AS tokens_survivor
  FROM toks GROUP BY component
)
SELECT component, n_docs, tokens_total, tokens_survivor,
       CAST(tokens_total - tokens_survivor AS BIGINT) AS tokens_saved
FROM per ORDER BY tokens_saved DESC, component LIMIT 20"""
)


@stage(
    "cc_survivor_savings_documents",
    _CC_SAVINGS_ORACLE,
    "graph fixpoint: SURVIVOR SELECTION at the converged-component "
    "level — keep only the canonical member (min doc_id, which IS "
    "the hash-min label) and retire the rest; top-20 components by "
    "tokens retired. This is the near-dup counterpart of "
    "dedup_survivor_selection_documents's exact-text ladder: the "
    "budget line a dedup pass reports before anyone deletes "
    "anything, at the granularity decisions are actually made "
    "(whole transitive families, not pairs). Scale: labels join "
    "document token counts (equi-join), #components-row reduce.",
)
def cc_survivor_savings_documents(spark, sf_dir):
    lbls, edges, _ = _converged_labels(spark, sf_dir)
    toks = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("v"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
    )
    per = (
        lbls.join(toks, "v")
        .groupBy(F.col("lbl").cast("long").alias("component"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("tokens_total"),
            F.sum(
                F.when(F.col("v") == F.col("lbl"), F.col("ntok")).otherwise(
                    0
                )
            ).alias("tokens_survivor"),
        )
    )
    out = _local_result(
        spark,
        per.select(
            "component",
            "n_docs",
            "tokens_total",
            "tokens_survivor",
            (F.col("tokens_total") - F.col("tokens_survivor"))
            .cast("long")
            .alias("tokens_saved"),
        )
        .orderBy(F.desc("tokens_saved"), "component")
        .limit(20),
    )
    lbls.unpersist()
    edges.unpersist()
    return out


def _lk_ctes(k: int) -> str:
    """l0..lk hash-min round CTEs (the r13 fixed-round SQL shape,
    generated instead of hand-copied)."""
    parts = [
        """, nodes AS (
  SELECT DISTINCT a AS v FROM edges
), l0 AS (
  SELECT v, v AS lbl FROM nodes
)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""", l{i} AS (
  SELECT e.a AS v, least(min(o.lbl), min(nb.lbl)) AS lbl
  FROM edges e JOIN l{i - 1} o ON o.v = e.a JOIN l{i - 1} nb ON nb.v = e.b
  GROUP BY e.a
)"""
        )
    return "".join(parts)


_CC_TRUNC_ORACLE = (
    _CLOSURE_CTE
    + _lk_ctes(3)
    + """
SELECT CAST(1 AS BIGINT) AS iter,
       CAST(count(DISTINCT l.lbl) AS BIGINT) AS n_labels,
       CAST(sum(CASE WHEN l.lbl <> c.component THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mislabeled
FROM l1 l JOIN comp c ON c.v = l.v
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(count(DISTINCT l.lbl) AS BIGINT),
       CAST(sum(CASE WHEN l.lbl <> c.component THEN 1 ELSE 0 END)
            AS BIGINT)
FROM l2 l JOIN comp c ON c.v = l.v
UNION ALL
SELECT CAST(3 AS BIGINT), CAST(count(DISTINCT l.lbl) AS BIGINT),
       CAST(sum(CASE WHEN l.lbl <> c.component THEN 1 ELSE 0 END)
            AS BIGINT)
FROM l3 l JOIN comp c ON c.v = l.v"""
)


@stage(
    "cc_truncation_error_documents",
    _CC_TRUNC_ORACLE,
    "graph fixpoint: the STOP-EARLY ERROR CURVE — after k = 1, 2, 3 "
    "hash-min rounds, how many nodes still carry a label that is not "
    "their converged component (and how many distinct labels remain "
    "vs the true component count). cc_convergence_curve_documents "
    "(r13) reports the per-round deltas; this scores each truncation "
    "against the FIXPOINT, which is the number an operator trading "
    "rounds for cost actually budgets: 'if I stop at 2 rounds, what "
    "fraction of docs land in the wrong dup family?'. Scale: the "
    "fixed rounds and the convergence loop share the same pruned "
    "edge-list join; the comparison is a node-row equi-join per k.",
)
def cc_truncation_error_documents(spark, sf_dir):
    pairs = _gram_pairs(spark, sf_dir)
    # pre-partitioned on the round-join key b (guide §2.4): the three
    # fixed rounds AND every convergence round reuse the cached
    # partitioning instead of re-exchanging the edge list
    edges = _gram_edges(pairs).repartition("b").persist()
    # optimization r16: the seed frame is persisted (round 1 references
    # it twice: message join + own-label union) but no longer
    # materialized by its own count() job — the first round's count
    # populates the cache in the same job (guide §1.2: one pass fewer)
    l0 = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
        .persist()
    )
    # fixed truncations l1..l3
    levels = [l0]
    for _ in range(3):
        levels.append(_hashmin_round(levels[-1], edges).persist())
    # converge from l3 onward (labels only improve; reuse the work)
    conv = levels[-1]
    extra = []
    rounds = 3
    while True:
        rounds += 1
        assert rounds <= _MAX_CC_ROUNDS
        # flagged round (guide §2.4): n_changed from the round's own
        # cached output, no separate nxt-vs-prev join per round;
        # lineage checkpointed every 4 rounds (optimization r16, the
        # _converged_labels discipline — the catalog's deepest hash-min
        # loop otherwise grows its logical plan by one join+groupBy
        # nesting per round, guide §5)
        nxt = _hashmin_round_flagged(conv, edges)
        nxt = nxt.localCheckpoint() if rounds % 4 == 0 else nxt.persist()
        n_changed = nxt.filter("chg").count()
        extra.append(nxt)
        conv = nxt.select("v", "lbl")
        if n_changed == 0:
            break
    comp = conv.select("v", F.col("lbl").alias("component"))
    # optimization r16 (guide §2.6/§1.2): the three per-truncation
    # rollups were three sequential collect jobs over cached frames —
    # a union of the three 1-row aggregates runs them inside ONE job
    # (Spark schedules the three join+agg subtrees concurrently), and
    # the driver-side sort restores the original iter order exactly
    parts = [
        levels[k]
        .join(comp, "v")
        .agg(
            F.lit(k).cast("long").alias("iter"),
            F.countDistinct("lbl").cast("long").alias("n_labels"),
            F.sum(
                (F.col("lbl") != F.col("component")).cast("long")
            ).alias("n_mislabeled"),
        )
        for k in (1, 2, 3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    rows = sorted(stacked.collect(), key=lambda r: r["iter"])
    schema = stacked.schema
    for lv in levels + extra:
        lv.unpersist()
    edges.unpersist()
    return spark.createDataFrame(rows, schema)


_CC_FUSION_ORACLE = (
    _CLOSURE_CTE
    + """, texts AS (
  SELECT c.component, lower(d.text) AS norm
  FROM comp c JOIN documents d ON d.doc_id = c.v
), per AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT norm) AS BIGINT) AS n_distinct_texts
  FROM texts GROUP BY component
)
SELECT n_distinct_texts, CAST(count(*) AS BIGINT) AS n_components,
       CAST(sum(n_docs) AS BIGINT) AS n_docs
FROM per GROUP BY n_distinct_texts"""
)


@stage(
    "cc_exact_group_fusion_documents",
    _CC_FUSION_ORACLE,
    "graph fixpoint: converged components classified by how many "
    "DISTINCT normalized texts (lowercased, the dedup_exact "
    "convention) they fuse. n_distinct_texts = 1 means the shingle "
    "graph rediscovered an exact-dup group (the cheap hash pass "
    "would have caught it); >= 2 means the component exists BECAUSE "
    "of near-dup edges — the marginal value of the expensive "
    "shingle/LSH pass over exact hashing, quantified. The "
    "cross-family consistency check: exact-dup groups can never be "
    "split across components (identical texts share all shingles), "
    "so the fixpoint labels must nest the exact partition — pinned "
    "by the in-repo replay test. Scale: labels join normalized "
    "text keys; #components-row reduce.",
)
def cc_exact_group_fusion_documents(spark, sf_dir):
    lbls, edges, _ = _converged_labels(spark, sf_dir)
    texts = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("v"), F.lower(F.col("text")).alias("norm")
    )
    per = (
        lbls.join(texts, "v")
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("norm").cast("long").alias("n_distinct_texts"),
        )
    )
    out = _local_result(
        spark,
        per.groupBy("n_distinct_texts").agg(
            F.count(F.lit(1)).alias("n_components"),
            F.sum("n_docs").alias("n_docs"),
        ),
    )
    lbls.unpersist()
    edges.unpersist()
    return out

# =====================================================================
# B. Ledger time dimension: state-row arithmetic across snapshot
#    commits (events cut into the r13 convention's 5 exact-integer
#    epoch micro-batches; snapshot s = the cumulative ledger after
#    committing batches 0..s)
# =====================================================================

_V_HIGH = 300.0  # range-check threshold (the violation family)
_V_COMMON = 100.0  # rate-drift threshold (a commonly-hit predicate)

# per-(event_type, batch) mergeable state rows: exact counts, the
# quantized-exact 1e2 value sum (values sit on the 0.01 grid), and the
# freshness max — the __total__/__con__/__fresh__ state families of
# dce_spark/state.py, keyed by commit batch
_ST_CTE = (
    _EV_BATCH_CTE
    + f""", st AS (
  SELECT event_type, batch,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value >= {_V_HIGH} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_high,
         CAST(sum(CASE WHEN value >= {_V_COMMON} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_common,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         CAST(max(es) AS BIGINT) AS max_es
  FROM ev GROUP BY 1, 2
)"""
)


def _type_batch_states(spark, sf_dir):
    """The Spark mirror of _ST_CTE: one mergeable state row per
    (event_type, commit batch) — a grouped single-pass scan, which is
    the ledger-build job a 100 TB pipeline runs once per commit and
    every query below consumes WITHOUT re-scanning rows."""
    ev = _events_batched(spark, sf_dir)
    return ev.groupBy("event_type", "batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("value") >= _V_HIGH).cast("long")).alias("n_high"),
        F.sum((F.col("value") >= _V_COMMON).cast("long")).alias(
            "n_common"
        ),
        F.sum(
            F.round(F.col("value") * F.lit(100.0)).cast("long")
        ).alias("sum_cents"),
        F.max("es").alias("max_es"),
    )


_LEDGER_DIFF_ORACLE = (
    _ST_CTE
    + """
SELECT event_type,
       CAST(sum(CASE WHEN batch <= 3 THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_t1,
       CAST(sum(n) AS BIGINT) AS n_rows_t2,
       CAST(sum(CASE WHEN batch = 4 THEN n ELSE 0 END) AS BIGINT)
         AS d_rows,
       CAST(sum(CASE WHEN batch = 4 THEN n_high ELSE 0 END) AS BIGINT)
         AS d_high_value,
       CAST(max(max_es) - max(CASE WHEN batch <= 3 THEN max_es END)
            AS BIGINT) AS fresh_advance_s
FROM st GROUP BY event_type"""
)


@stage(
    "ledger_snapshot_diff_events",
    _LEDGER_DIFF_ORACLE,
    "ledger time dimension: the SNAPSHOT DIFF between two committed "
    "ledger states — T1 = batches 0..3, T2 = all 5 — per event_type "
    "partition: row-count delta, range-violation delta (value >= "
    "300), and how far the freshness watermark advanced. This is "
    "'what changed since yesterday's validation?' answered from TWO "
    "LEDGER ROWS per partition, zero data scan — the time-dimension "
    "face of dce_spark/state.py's merge rules (sums diff by "
    "subtraction, maxes diff by comparison, both exact). Scale: the "
    "state table is #types x 5 rows regardless of corpus size; the "
    "diff is metadata arithmetic.",
)
def ledger_snapshot_diff_events(spark, sf_dir):
    st = _type_batch_states(spark, sf_dir)
    t1 = F.when(F.col("batch") <= 3, F.col("n")).otherwise(0)
    return st.groupBy("event_type").agg(
        F.sum(t1).cast("long").alias("n_rows_t1"),
        F.sum("n").cast("long").alias("n_rows_t2"),
        F.sum(F.when(F.col("batch") == 4, F.col("n")).otherwise(0))
        .cast("long")
        .alias("d_rows"),
        F.sum(F.when(F.col("batch") == 4, F.col("n_high")).otherwise(0))
        .cast("long")
        .alias("d_high_value"),
        (
            F.max("max_es")
            - F.max(F.when(F.col("batch") <= 3, F.col("max_es")))
        )
        .cast("long")
        .alias("fresh_advance_s"),
    )


_LEDGER_GROWTH_ORACLE = (
    _ST_CTE
    + f""", pb AS (
  SELECT batch, CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(n_common) AS BIGINT) AS nc
  FROM st GROUP BY batch
), fu AS (
  SELECT user_id, CAST(min(batch) AS BIGINT) AS fb FROM ev GROUP BY 1
), ft AS (
  SELECT event_type, CAST(min(batch) AS BIGINT) AS fb FROM ev GROUP BY 1
), snaps AS (
  SELECT CAST(unnest(range(0, {_NB})) AS BIGINT) AS snapshot
), rows_c AS (
  SELECT s.snapshot,
         CAST(sum(CASE WHEN pb.batch <= s.snapshot THEN pb.n ELSE 0 END)
              AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN pb.batch <= s.snapshot THEN pb.nc ELSE 0 END)
              AS BIGINT) AS n_common
  FROM snaps s, pb GROUP BY s.snapshot
), users_c AS (
  SELECT s.snapshot,
         CAST(sum(CASE WHEN fu.fb <= s.snapshot THEN 1 ELSE 0 END)
              AS BIGINT) AS n_users
  FROM snaps s, fu GROUP BY s.snapshot
), types_c AS (
  SELECT s.snapshot,
         CAST(sum(CASE WHEN ft.fb <= s.snapshot THEN 1 ELSE 0 END)
              AS BIGINT) AS n_types
  FROM snaps s, ft GROUP BY s.snapshot
)
SELECT r.snapshot, r.n_rows, u.n_users, t.n_types, r.n_common,
       round(CAST(r.n_common AS DOUBLE) / r.n_rows, 9) AS common_rate
FROM rows_c r
JOIN users_c u ON u.snapshot = r.snapshot
JOIN types_c t ON t.snapshot = r.snapshot"""
)


@stage(
    "ledger_growth_curve_events",
    _LEDGER_GROWTH_ORACLE,
    "ledger time dimension: the cumulative GROWTH CURVE across all 5 "
    "snapshot commits — rows, distinct users (via first-seen batch, "
    "so the distinct is computed ONCE, not once per snapshot), "
    "distinct event types, and the value >= 100 predicate rate. The "
    "trajectory an on-call engineer reads before trusting a ledger: "
    "monotone rows/users/types (pinned by the in-repo test) with a "
    "drifting predicate rate localizes WHEN a pipeline change "
    "landed. Scale: per-batch states and first-seen frames expand "
    "map-side to the snapshots they participate in (explode of an "
    "integer sequence, <= 5 rows each — no range join, no grid "
    "cross) — state arithmetic, no re-scan per snapshot.",
)
def ledger_growth_curve_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    st = _type_batch_states(spark, sf_dir)
    # each per-batch state contributes to snapshots batch.._NB-1: a
    # map-side explode of an integer sequence (equi-groupable), not a
    # range join against a snapshot grid
    last = F.lit(_NB - 1).cast("long")
    snap = F.explode(F.sequence(F.col("batch"), last)).alias("snapshot")
    pb = st.groupBy("batch").agg(
        F.sum("n").alias("n"), F.sum("n_common").alias("nc")
    )
    rows_c = (
        pb.select("n", "nc", snap)
        .groupBy("snapshot")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.sum("nc").cast("long").alias("n_common"),
        )
    )
    fsnap = F.explode(F.sequence(F.col("fb"), last)).alias("snapshot")
    fu = ev.groupBy("user_id").agg(F.min("batch").alias("fb"))
    ft = ev.groupBy("event_type").agg(F.min("batch").alias("fb"))
    users_c = (
        fu.select(fsnap)
        .groupBy("snapshot")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    types_c = (
        ft.select(fsnap)
        .groupBy("snapshot")
        .agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    )
    return (
        rows_c.join(users_c, "snapshot")
        .join(types_c, "snapshot")
        .select(
            "snapshot",
            "n_rows",
            "n_users",
            "n_types",
            "n_common",
            F.round(
                F.col("n_common").cast("double") / F.col("n_rows"), 9
            ).alias("common_rate"),
        )
    )


_LEDGER_MERGE_EQ_ORACLE = (
    _ST_CTE
    + """, full_s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_full,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
           AS sum_cents_full,
         CAST(max(es) AS BIGINT) AS max_es_full
  FROM ev GROUP BY 1
), merged AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_merged,
         CAST(sum(sum_cents) AS BIGINT) AS sum_cents_merged,
         CAST(max(max_es) AS BIGINT) AS max_es_merged
  FROM st GROUP BY 1
)
SELECT f.event_type, f.n_full, m.n_merged,
       f.sum_cents_full, m.sum_cents_merged,
       f.max_es_full, m.max_es_merged,
       CAST(f.n_full = m.n_merged
            AND f.sum_cents_full = m.sum_cents_merged
            AND f.max_es_full = m.max_es_merged AS BIGINT) AS exact_match
FROM full_s f JOIN merged m ON m.event_type = f.event_type"""
)


@stage(
    "ledger_merge_recompute_equality_events",
    _LEDGER_MERGE_EQ_ORACLE,
    "ledger time dimension: MERGED == RECOMPUTED, surfaced as a "
    "query — per event_type, the full-scan state (count, quantized-"
    "exact 1e2 value sum, freshness max) next to the same state "
    "merged from the 5 per-batch ledger rows by pure sum/max, with "
    "the equality bit (all 1s — pinned by the in-repo test AND by "
    "the oracle computing both sides independently). This is the "
    "property that lets validate_partitions(..., state_ledger=...) "
    "replace a rescan (state.py; tests/test_state_ledger.py proves "
    "it at the report level, this proves it at the batch-commit "
    "granularity the time dimension adds). Exact integers make the "
    "equality bit-for-bit, not approximate. Scale: one grouped scan "
    "for each side at test SF; in production the merged side reads "
    "the committed ledger only.",
)
def ledger_merge_recompute_equality_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    st = _type_batch_states(spark, sf_dir)
    full_s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_full"),
        F.sum(F.round(F.col("value") * F.lit(100.0)).cast("long")).alias(
            "sum_cents_full"
        ),
        F.max("es").cast("long").alias("max_es_full"),
    )
    merged = st.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_merged"),
        F.sum("sum_cents").cast("long").alias("sum_cents_merged"),
        F.max("max_es").cast("long").alias("max_es_merged"),
    )
    eq = (
        (F.col("n_full") == F.col("n_merged"))
        & (F.col("sum_cents_full") == F.col("sum_cents_merged"))
        & (F.col("max_es_full") == F.col("max_es_merged"))
    )
    return full_s.join(merged, "event_type").select(
        "event_type",
        "n_full",
        "n_merged",
        "sum_cents_full",
        "sum_cents_merged",
        "max_es_full",
        "max_es_merged",
        eq.cast("long").alias("exact_match"),
    )


_LEDGER_ARRIVALS_ORACLE = (
    _EV_BATCH_CTE
    + """, fu AS (
  SELECT user_id, CAST(min(batch) AS BIGINT) AS fb FROM ev GROUP BY 1
), ab AS (
  SELECT batch, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
  FROM ev GROUP BY batch
), nu AS (
  SELECT fb AS batch, CAST(count(*) AS BIGINT) AS n_new FROM fu
  GROUP BY fb
)
SELECT a.batch, a.n_rows, a.n_active_users,
       CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new_users,
       CAST(a.n_active_users - coalesce(n.n_new, 0) AS BIGINT)
         AS n_returning_users
FROM ab a LEFT JOIN nu n ON n.batch = a.batch"""
)


@stage(
    "ledger_partition_arrivals_events",
    _LEDGER_ARRIVALS_ORACLE,
    "ledger time dimension: PARTITION ARRIVALS per commit — with "
    "user_id as the ledger partition key, each batch's active "
    "partitions split into first-seen (a NEW ledger row is created) "
    "vs returning (an existing row is superseded). The create-vs-"
    "update mix is the ledger's write-amplification profile: "
    "all-new means append-only commits, mostly-returning means the "
    "ledger wants merge-on-read compaction — the operational knob "
    "SCALING.md 8c's incremental design leaves to measurement. "
    "Scale: first-seen is one groupBy over the user dimension; the "
    "batch split is a 5-row left join.",
)
def ledger_partition_arrivals_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    fu = ev.groupBy("user_id").agg(F.min("batch").alias("fb"))
    ab = ev.groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").cast("long").alias("n_active_users"),
    )
    nu = fu.groupBy(F.col("fb").alias("batch")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    return (
        ab.join(nu, "batch", "left")
        .select(
            "batch",
            "n_rows",
            "n_active_users",
            F.coalesce(F.col("n_new"), F.lit(0))
            .cast("long")
            .alias("n_new_users"),
            (
                F.col("n_active_users")
                - F.coalesce(F.col("n_new"), F.lit(0))
            )
            .cast("long")
            .alias("n_returning_users"),
        )
    )


_LEDGER_COMPACT_ORACLE = (
    _EV_BATCH_CTE
    + f""", pu AS (
  SELECT user_id, CAST(count(DISTINCT batch) AS BIGINT)
           AS n_batches_present,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM ev GROUP BY user_id
)
SELECT n_batches_present,
       CAST({_NB} - n_batches_present AS BIGINT) AS n_unchanged_commits,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(n_rows) AS BIGINT) AS n_rows
FROM pu GROUP BY n_batches_present"""
)


@stage(
    "ledger_compaction_histogram_events",
    _LEDGER_COMPACT_ORACLE,
    "ledger time dimension: the COMPACTION HISTOGRAM — per user "
    "partition, in how many of the 5 commits did its state row "
    "actually change (a cumulative state changes in commit b iff "
    "batch b contains rows for that partition), grouped into the "
    "distribution. n_unchanged_commits counts snapshot transitions "
    "where the ledger row is byte-identical to the previous one — "
    "exactly the rows a snapshot-per-commit layout stores "
    "redundantly, so sum(n_partitions x n_unchanged) is the "
    "delta-encoding savings a ledger store gets by writing only "
    "changed states (the lww_compaction_ratio_events logic applied "
    "to the ledger itself). Scale: one groupBy over the partition "
    "dimension, reduced to <= 5 histogram rows.",
)
def ledger_compaction_histogram_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    pu = ev.groupBy("user_id").agg(
        F.countDistinct("batch").cast("long").alias("n_batches_present"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        pu.groupBy("n_batches_present")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            "n_batches_present",
            (F.lit(_NB) - F.col("n_batches_present"))
            .cast("long")
            .alias("n_unchanged_commits"),
            "n_partitions",
            "n_rows",
        )
    )


_LEDGER_LAG_ORACLE = (
    _EV_BATCH_CTE
    + f""", pu AS (
  SELECT user_id, batch, CAST(max(es) AS BIGINT) AS max_es,
         CAST(max(mn) AS BIGINT) AS mn, CAST(max(mx) AS BIGINT) AS mx
  FROM ev GROUP BY user_id, batch
), snaps AS (
  SELECT CAST(unnest(range(0, {_NB})) AS BIGINT) AS snapshot
), us AS (
  SELECT s.snapshot, p.user_id,
         CAST(max(p.max_es) AS BIGINT) AS max_es,
         CAST(max(p.mn) AS BIGINT) AS mn, CAST(max(p.mx) AS BIGINT) AS mx
  FROM snaps s JOIN pu p ON p.batch <= s.snapshot
  GROUP BY s.snapshot, p.user_id
), lag AS (
  SELECT snapshot, user_id,
         CAST(mn + ((mx - mn + 1) * (snapshot + 1)) // {_NB} - max_es
              AS BIGINT) AS lag_s,
         CAST((mx - mn + 1) // {_NB} AS BIGINT) AS w
  FROM us
)
SELECT snapshot, CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(max(lag_s) AS BIGINT) AS max_lag_s,
       CAST(sum(CASE WHEN lag_s > w THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lagging
FROM lag GROUP BY snapshot"""
)


@stage(
    "ledger_freshness_lag_events",
    _LEDGER_LAG_ORACLE,
    "ledger time dimension: FRESHNESS LAG read off the ledger — at "
    "each snapshot cut (cut_s = mn + (mx-mn+1)*(s+1) div 5, the "
    "exact-integer batch boundary), each user partition's lag is "
    "cut minus its freshness-state max_es over committed batches; "
    "reported per snapshot: partitions seen so far, worst lag, and "
    "partitions lagging more than one full batch window (silent "
    "for an entire commit — the page-an-operator threshold). This "
    "is freshness_events' check evaluated FROM STATES at 5 points "
    "in time, no timestamp rescan: the __fresh__ max merges by "
    "max, so the cumulative max over batch states IS the "
    "partition's watermark. Scale: each (partition x batch) state "
    "row expands map-side to the <= 5 snapshots it participates in "
    "(explode of an integer sequence — an equi-groupable expansion, "
    "NOT a range join) — ledger arithmetic.",
)
def ledger_freshness_lag_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    pu = ev.groupBy("user_id", "batch").agg(
        F.max("es").alias("max_es"),
        F.max("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    us = (
        pu.select(
            "user_id",
            "max_es",
            "mn",
            "mx",
            F.explode(
                F.sequence(
                    F.col("batch"), F.lit(_NB - 1).cast("long")
                )
            ).alias("snapshot"),
        )
        .groupBy("snapshot", "user_id")
        .agg(
            F.max("max_es").alias("max_es"),
            F.max("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    cut = F.col("mn") + F.expr(
        f"(mx - mn + 1) * (snapshot + 1) div {_NB}"
    )
    w = F.expr(f"(mx - mn + 1) div {_NB}")
    lag = us.select(
        "snapshot",
        (cut - F.col("max_es")).cast("long").alias("lag_s"),
        w.cast("long").alias("w"),
    )
    return lag.groupBy("snapshot").agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.max("lag_s").cast("long").alias("max_lag_s"),
        F.sum((F.col("lag_s") > F.col("w")).cast("long"))
        .cast("long")
        .alias("n_lagging"),
    )


_LEDGER_DRIFT_ORACLE = (
    _ST_CTE
    + """, win AS (
  SELECT event_type,
         CAST(sum(CASE WHEN batch <= 2 THEN n ELSE 0 END) AS BIGINT)
           AS n_t1,
         CAST(sum(CASE WHEN batch <= 2 THEN n_common ELSE 0 END)
              AS BIGINT) AS nc_t1,
         CAST(sum(CASE WHEN batch >= 3 THEN n ELSE 0 END) AS BIGINT)
           AS n_delta,
         CAST(sum(CASE WHEN batch >= 3 THEN n_common ELSE 0 END)
              AS BIGINT) AS nc_delta
  FROM st GROUP BY event_type
)
SELECT event_type, n_t1, n_delta,
       round(CAST(nc_t1 AS DOUBLE) / n_t1, 9) AS rate_t1,
       round(CAST(nc_delta AS DOUBLE) / n_delta, 9) AS rate_delta,
       round(CAST(nc_delta AS DOUBLE) / n_delta
             - CAST(nc_t1 AS DOUBLE) / n_t1, 9) AS drift,
       CAST(abs(CAST(nc_delta AS DOUBLE) / n_delta
                - CAST(nc_t1 AS DOUBLE) / n_t1) > 0.02 AS BIGINT)
         AS drift_flag
FROM win"""
)


@stage(
    "ledger_rate_drift_events",
    _LEDGER_DRIFT_ORACLE,
    "ledger time dimension: METRIC DRIFT BETWEEN LEDGER WINDOWS — "
    "per event_type, the value >= 100 predicate rate in the "
    "established window (batches 0..2) vs the delta window (3..4), "
    "with the drift and a 2-point alarm flag. The check a pipeline "
    "runs on every incremental commit: 'did the data that just "
    "arrived look like the data the contract was calibrated on?' — "
    "computed from 10 state rows, not from rows (counts are exact "
    "ints; division happens once, at report time, identically in "
    "both engines). Complements pit_feature_drift_events (row-level "
    "PIT features) with the zero-rescan ledger face. Scale: state "
    "arithmetic over #types x 5 rows.",
)
def ledger_rate_drift_events(spark, sf_dir):
    st = _type_batch_states(spark, sf_dir)
    win = st.groupBy("event_type").agg(
        F.sum(F.when(F.col("batch") <= 2, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_t1"),
        F.sum(
            F.when(F.col("batch") <= 2, F.col("n_common")).otherwise(0)
        )
        .cast("long")
        .alias("nc_t1"),
        F.sum(F.when(F.col("batch") >= 3, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_delta"),
        F.sum(
            F.when(F.col("batch") >= 3, F.col("n_common")).otherwise(0)
        )
        .cast("long")
        .alias("nc_delta"),
    )
    r1 = F.col("nc_t1").cast("double") / F.col("n_t1")
    rd = F.col("nc_delta").cast("double") / F.col("n_delta")
    return win.select(
        "event_type",
        "n_t1",
        "n_delta",
        F.round(r1, 9).alias("rate_t1"),
        F.round(rd, 9).alias("rate_delta"),
        F.round(rd - r1, 9).alias("drift"),
        (F.abs(rd - r1) > F.lit(0.02)).cast("long").alias("drift_flag"),
    )

# =====================================================================
# C. Curriculum / data-ordering plans (deterministic difficulty
#    scoring + bucket-granular epoch ordering over the mix-planner's
#    world — NO global per-doc sort anywhere)
# =====================================================================

_SCORE_EDGES = [5500, 6000, 6500, 7000, 7500, 8000]
_N_EPOCHS = 4
_PACE_GRID = [6000, 6500, 7000, 7500, 8000]
_KNUTH = 2654435761  # Knuth multiplicative-hash constant
_IMOD = 4294967296  # 2^32
_IMASK = 2147483648  # 2^31 — pre-multiply mask for the interleave key
# The interleave key masks doc_id BEFORE the multiply (round-12
# ADVICE: an unmasked doc_id >= ~2^33 overflowed int64 — Spark wraps
# silently, DuckDB errors, so the "identical on every engine"
# determinism claim broke at large id domains). The mask is 2^31, not
# 2^32: (2^32-1) * 2654435761 ~= 2^63.4 still exceeds int64, while
# (2^31-1) * 2654435761 ~= 2^62.3 stays exact on every engine.
# key = ((doc_id % 2^31) * KNUTH) % 2^32 — unchanged for every tested
# doc_id domain, and a well-mixed deterministic permutation at any.

_SCORE_BUCKET_SQL = " + ".join(
    f"CAST((score >= {e}) AS INT)" for e in _SCORE_EDGES
)

# per-doc exact difficulty: mean word length in milli-chars
# ((1000 * chars) div tokens — the rarity proxy: long words are rare
# words in any natural corpus) + 25 x token count (the length term,
# weighted onto the same scale). Pure integer arithmetic -> the same
# score on any engine, any partitioning.
_SCORED_CTE = f"""WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
         CAST(length(text) AS BIGINT) AS nch
  FROM documents
), s0 AS (
  SELECT doc_id, source, ntok,
         CAST((1000 * nch) // ntok + 25 * ntok AS BIGINT) AS score
  FROM d
), scored AS (
  SELECT doc_id, source, ntok, score,
         CAST({_SCORE_BUCKET_SQL} AS BIGINT) AS bucket
  FROM s0
)"""

# bucket histogram -> token-balanced epoch assignment: epoch(bucket) =
# (4 * cum_tokens_before) div total_tokens, computed over the <= 7
# bucket rows (metadata window) — the bucket-granular ordering that
# replaces a global sort at scale
_EMAP_CTE = (
    _SCORED_CTE
    + f""", hist AS (
  SELECT bucket, CAST(sum(ntok) AS BIGINT) AS tokens
  FROM scored GROUP BY bucket
), cum AS (
  SELECT bucket, tokens,
         CAST(coalesce(sum(tokens) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
         CAST(sum(tokens) OVER () AS BIGINT) AS t
  FROM hist
), emap AS (
  SELECT bucket, tokens, cum_before, t,
         CAST(({_N_EPOCHS} * cum_before) // t AS BIGINT) AS epoch
  FROM cum
)"""
)


def _scored_docs(spark, sf_dir):
    """The Spark mirror of _SCORED_CTE: per-doc exact difficulty score
    and fixed-edge bucket — one map-side expression, no shuffle."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ntok"),
        F.length(F.col("text")).cast("long").alias("nch"),
    )
    s0 = d.select(
        "doc_id",
        "source",
        "ntok",
        (F.expr("(1000 * nch) div ntok") + F.lit(25) * F.col("ntok"))
        .cast("long")
        .alias("score"),
    )
    bucket = None
    for e in _SCORE_EDGES:
        t = (F.col("score") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    return s0.withColumn("bucket", bucket.cast("long"))


def _epoch_map(spark, sf_dir):
    """The Spark mirror of _EMAP_CTE's emap: (bucket, tokens,
    cum_before, t, epoch) over the <= 7 bucket-histogram rows."""
    # optimization r15 (guide §5): hist feeds the total and the map —
    # checkpoint the <=7-row histogram so the corpus score scan runs
    # once for every _epoch_map consumer.
    hist = (
        _scored_docs(spark, sf_dir)
        .groupBy("bucket")
        .agg(F.sum("ntok").alias("tokens"))
        .localCheckpoint()
    )
    tot = hist.agg(F.sum("tokens").alias("t"))
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum_before",
            F.coalesce(F.sum("tokens").over(wc), F.lit(0)).cast("long"),
        )
        .withColumn(
            "epoch", F.expr(f"{_N_EPOCHS} * cum_before div t")
        )
    )


_CURR_HIST_ORACLE = (
    _SCORED_CTE
    + """
SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ntok) AS BIGINT) AS tokens,
       CAST(min(score) AS BIGINT) AS min_score,
       CAST(max(score) AS BIGINT) AS max_score
FROM scored GROUP BY bucket"""
)


@stage(
    "curriculum_difficulty_histogram_documents",
    _CURR_HIST_ORACLE,
    "curriculum ordering: the DIFFICULTY HISTOGRAM — per fixed-edge "
    "difficulty bucket (score = (1000*chars) div tokens + 25*tokens; "
    "edges 5500..8000 — mean word length is the classic rarity "
    "proxy and doc length the classic competence proxy of "
    "curriculum learning, integer-weighted so the score is exact "
    "and engine-invariant), docs, tokens, and the score range. "
    "This is the distribution every downstream ordering decision "
    "reads; fixed edges make it mergeable across partitions and "
    "days (the histogram_quantile_merge_lineitem property), which "
    "a rank-based curriculum does not have. Scale: one scan, "
    "map-side codegen bucket expression, <= 7 output rows.",
)
def curriculum_difficulty_histogram_documents(spark, sf_dir):
    return (
        _scored_docs(spark, sf_dir)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("tokens"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


_CURR_EPOCH_ORACLE = (
    _EMAP_CTE
    + """
SELECT bucket, tokens, cum_before, epoch FROM emap"""
)


@stage(
    "curriculum_epoch_assignment_documents",
    _CURR_EPOCH_ORACLE,
    "curriculum ordering: TOKEN-BALANCED EPOCH ASSIGNMENT — "
    "difficulty buckets are assigned, in bucket (= difficulty) "
    "order, to 4 training epochs by cumulative token mass: "
    "epoch(bucket) = (4 * tokens_before) div total. Easy buckets "
    "land in epoch 0, hard in epoch 3, and each epoch gets ~equal "
    "tokens to within one bucket's granularity (pinned by the "
    "in-repo test) — the competence-based curriculum schedule "
    "(Platanios et al.'s staircase, bucket-granular). At 100 TB "
    "this is THE honest design: assignment is a broadcast of a "
    "<= 7-row map, not a corpus sort, and adding tomorrow's "
    "documents only increments bucket histograms. Scale: one "
    "grouped scan + a <= 7-row window.",
)
def curriculum_epoch_assignment_documents(spark, sf_dir):
    return _epoch_map(spark, sf_dir).select(
        "bucket", "tokens", "cum_before", "epoch"
    )


_MIX_EPS = 1e-6  # the psi_bins_lineitem epsilon convention

_CURR_MIX_ORACLE = (
    _EMAP_CTE
    + f""", grid AS (
  SELECT e.epoch, s.source, CAST(sum(s.ntok) AS BIGINT) AS tokens
  FROM scored s JOIN emap e ON e.bucket = s.bucket
  GROUP BY e.epoch, s.source
), etot AS (
  SELECT epoch, CAST(sum(tokens) AS BIGINT) AS etok FROM grid GROUP BY 1
), stot AS (
  SELECT source, CAST(sum(tokens) AS BIGINT) AS stok FROM grid GROUP BY 1
), tot AS (
  SELECT CAST(sum(tokens) AS BIGINT) AS t FROM grid
)
SELECT g.epoch, g.source, g.tokens,
       round(CAST(g.tokens AS DOUBLE) / e.etok, 9) AS epoch_share,
       round(CAST(s.stok AS DOUBLE) / t.t, 9) AS global_share,
       round((CAST(g.tokens AS DOUBLE) / e.etok
              - CAST(s.stok AS DOUBLE) / t.t)
             * ln((CAST(g.tokens AS DOUBLE) / e.etok + {_MIX_EPS})
                  / (CAST(s.stok AS DOUBLE) / t.t + {_MIX_EPS})), 6)
         AS psi_term
FROM grid g
JOIN etot e ON e.epoch = g.epoch
JOIN stot s ON s.source = g.source, tot t"""
)


@stage(
    "curriculum_epoch_mix_documents",
    _CURR_MIX_ORACLE,
    "curriculum ordering: the CURRICULUM x MIX INTERACTION — per "
    "(epoch, source): tokens, the source's share WITHIN the epoch "
    "vs its global share, and the PSI term (the psi_bins eps=1e-6, "
    "6dp per-term convention). Difficulty ordering silently "
    "reweights sources per epoch (if one source is systematically "
    "hard, epoch 3 becomes that source) — exactly the confound the "
    "mix planner's caps were tuned to prevent, so this is the "
    "check that curriculum and mix plans COMPOSE rather than "
    "fight. Summed per epoch against the 0.2 alarm it says which "
    "training phases see a materially shifted diet. Scale: the "
    "grid is epochs x sources rows off one grouped scan; shares "
    "come from <= grid-size joins, the broadcast <= 7-row epoch "
    "map does the assignment.",
)
def curriculum_epoch_mix_documents(spark, sf_dir):
    scored = _scored_docs(spark, sf_dir)
    emap = _epoch_map(spark, sf_dir).select("bucket", "epoch")
    # optimization r15 (guide §5): grid feeds both margins, the total
    # AND the final select — checkpoint the (epoch x source)-bounded
    # frame so the scored-corpus join+agg runs once, not four times.
    grid = (
        scored.join(F.broadcast(emap), "bucket")
        .groupBy("epoch", "source")
        .agg(F.sum("ntok").alias("tokens"))
        .localCheckpoint()
    )
    etot = grid.groupBy("epoch").agg(F.sum("tokens").alias("etok"))
    stot = grid.groupBy("source").agg(F.sum("tokens").alias("stok"))
    tot = grid.agg(F.sum("tokens").alias("t"))
    q = F.col("tokens").cast("double") / F.col("etok")
    p = F.col("stok").cast("double") / F.col("t")
    return (
        grid.join(F.broadcast(etot), "epoch")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "epoch",
            "source",
            "tokens",
            F.round(q, 9).alias("epoch_share"),
            F.round(p, 9).alias("global_share"),
            F.round(
                (q - p)
                * F.log(
                    (q + F.lit(_MIX_EPS)) / (p + F.lit(_MIX_EPS))
                ),
                6,
            ).alias("psi_term"),
        )
    )


_CURR_PACE_ORACLE = (
    _SCORED_CTE
    + f""", tot AS (
  SELECT CAST(sum(ntok) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS nd
  FROM scored
)
SELECT CAST(g.g AS BIGINT) AS max_score,
       CAST(sum(CASE WHEN s.score < g.g THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs,
       CAST(sum(CASE WHEN s.score < g.g THEN s.ntok ELSE 0 END)
            AS BIGINT) AS tokens,
       round(CAST(sum(CASE WHEN s.score < g.g THEN s.ntok ELSE 0 END)
                  AS DOUBLE) / t.t, 9) AS token_share
FROM scored s
CROSS JOIN (SELECT unnest([{", ".join(str(x) for x in _PACE_GRID)}]) AS g) g,
     tot t
GROUP BY g.g, t.t"""
)


@stage(
    "curriculum_pacing_curve_documents",
    _CURR_PACE_ORACLE,
    "curriculum ordering: the PACING CURVE — for each competence "
    "cutoff in the fixed grid {6000..8000}, how many documents and "
    "tokens are 'unlocked' (score strictly below the cutoff) and "
    "the unlocked token share. A pacing function maps training "
    "progress to a competence cutoff; this curve is its inverse "
    "image, read to pick cutoffs that unlock data at the rate the "
    "schedule wants (root-pacing wants ~sqrt-shaped shares). Same "
    "sweep economics as length_floor_sweep_documents: the grid "
    "expands via a literal-array explode, ONE scan, 5-cell "
    "aggregate — no per-cutoff rescan. Scale: map-side flags off "
    "one scan; <= 5 output rows.",
)
def curriculum_pacing_curve_documents(spark, sf_dir):
    scored = _scored_docs(spark, sf_dir)
    tot = scored.agg(F.sum("ntok").alias("t"))
    swept = scored.crossJoin(F.broadcast(tot)).select(
        "score",
        "ntok",
        "t",
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in _PACE_GRID])
        ).alias("max_score"),
    )
    unlocked = F.col("score") < F.col("max_score")
    return (
        swept.groupBy("max_score", "t")
        .agg(
            F.sum(unlocked.cast("long")).alias("n_docs"),
            F.sum(F.when(unlocked, F.col("ntok")).otherwise(0)).alias(
                "tokens"
            ),
            F.round(
                F.sum(F.when(unlocked, F.col("ntok")).otherwise(0))
                .cast("double")
                / F.col("t"),
                9,
            ).alias("token_share"),
        )
        .drop("t")
    )


_CURR_ILEAVE_ORACLE = (
    _EMAP_CTE
    + f""", keyed AS (
  SELECT e.epoch, s.doc_id, s.bucket, s.score,
         CAST(((s.doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD} AS BIGINT) AS ikey
  FROM scored s JOIN emap e ON e.bucket = s.bucket
), ranked AS (
  SELECT epoch, doc_id, bucket, score, ikey,
         row_number() OVER (PARTITION BY epoch
                            ORDER BY ikey, doc_id) AS pos
  FROM keyed
)
SELECT epoch, CAST(pos AS BIGINT) AS position, doc_id, bucket, score,
       ikey
FROM ranked WHERE pos <= 5"""
)


@stage(
    "curriculum_interleave_order_documents",
    _CURR_ILEAVE_ORACLE,
    "curriculum ordering: the WITHIN-EPOCH INTERLEAVE — inside each "
    "epoch, documents are ordered by the deterministic "
    "multiplicative-hash key ((doc_id mod 2^31) * 2654435761) mod "
    "2^32 (Knuth's constant; the pre-multiply mask keeps the product "
    "inside int64 at ANY id domain — "
    "exact 64-bit integer arithmetic, so the 'shuffle' is "
    "identical on every engine and every run — a seeded permutation "
    "without RNG state), and the first 5 positions per epoch are "
    "emitted. Within an epoch the curriculum is deliberately "
    "UN-ordered: consecutive same-source/same-difficulty runs are "
    "what the interleave destroys (correlated batches hurt "
    "convergence), while the epoch boundary preserves the "
    "difficulty staircase. Scale: the key is map-side; top-5 per "
    "epoch is a partitioned window over 4 partitions — at real "
    "scale the full ordering is never materialized, readers sort "
    "WITHIN partitions by the same key (sortWithinPartitions).",
)
def curriculum_interleave_order_documents(spark, sf_dir):
    scored = _scored_docs(spark, sf_dir)
    emap = _epoch_map(spark, sf_dir).select("bucket", "epoch")
    keyed = scored.join(F.broadcast(emap), "bucket").select(
        "epoch",
        "doc_id",
        "bucket",
        "score",
        F.expr(f"((doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD}")
        .cast("long")
        .alias("ikey"),
    )
    w = Window.partitionBy("epoch").orderBy("ikey", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 5)
        .select(
            "epoch",
            F.col("pos").cast("long").alias("position"),
            "doc_id",
            "bucket",
            "score",
            "ikey",
        )
    )


_CURR_SRC_PSI_ORACLE = (
    _SCORED_CTE
    + f""", grid AS (
  SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs
  FROM scored GROUP BY source, bucket
), stot AS (
  SELECT source, CAST(sum(n_docs) AS BIGINT) AS sn FROM grid GROUP BY 1
), btot AS (
  SELECT bucket, CAST(sum(n_docs) AS BIGINT) AS bn FROM grid GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM grid
)
SELECT g.source, g.bucket, g.n_docs,
       round(CAST(g.n_docs AS DOUBLE) / s.sn, 9) AS source_share,
       round(CAST(b.bn AS DOUBLE) / t.t, 9) AS global_share,
       round((CAST(g.n_docs AS DOUBLE) / s.sn
              - CAST(b.bn AS DOUBLE) / t.t)
             * ln((CAST(g.n_docs AS DOUBLE) / s.sn + {_MIX_EPS})
                  / (CAST(b.bn AS DOUBLE) / t.t + {_MIX_EPS})), 6)
         AS psi_term
FROM grid g
JOIN stot s ON s.source = g.source
JOIN btot b ON b.bucket = g.bucket, tot t"""
)


@stage(
    "curriculum_source_difficulty_psi_documents",
    _CURR_SRC_PSI_ORACLE,
    "curriculum ordering: WHICH SOURCES ARE SYSTEMATICALLY HARD — "
    "per (source, difficulty bucket): doc counts, the source's own "
    "difficulty distribution vs the corpus distribution, and the "
    "PSI term (eps=1e-6, 6dp). A source whose difficulty profile "
    "diverges from the corpus is the one the epoch-mix check will "
    "flag downstream; reading this FIRST tells the planner whether "
    "to fix it with per-source score centering or per-epoch source "
    "caps. Summed per source this is the drift score between 'what "
    "this source looks like' and 'what the curriculum assumes "
    "documents look like'. Scale: sources x <= 7 buckets grid off "
    "one grouped scan; shares via grid-size joins.",
)
def curriculum_source_difficulty_psi_documents(spark, sf_dir):
    # optimization r15 (guide §5): grid feeds both margins, the total
    # AND the final select — checkpoint the (source x bucket)-bounded
    # frame so the corpus score scan runs once, not four times.
    grid = (
        _scored_docs(spark, sf_dir)
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )
    stot = grid.groupBy("source").agg(F.sum("n_docs").alias("sn"))
    btot = grid.groupBy("bucket").agg(F.sum("n_docs").alias("bn"))
    tot = grid.agg(F.sum("n_docs").alias("t"))
    q = F.col("n_docs").cast("double") / F.col("sn")
    p = F.col("bn").cast("double") / F.col("t")
    return (
        grid.join(F.broadcast(stot), "source")
        .join(F.broadcast(btot), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "bucket",
            "n_docs",
            F.round(q, 9).alias("source_share"),
            F.round(p, 9).alias("global_share"),
            F.round(
                (q - p)
                * F.log(
                    (q + F.lit(_MIX_EPS)) / (p + F.lit(_MIX_EPS))
                ),
                6,
            ).alias("psi_term"),
        )
    )


# ---------------------------------------------------------------------
# Round-14 promotion hook (second pass; see queries_more's re-entrancy
# note): under an r14-first import the catalog chain ran while this
# module was still empty (the r13 import at the top triggers it), so
# both the r14 promotion (getattr-guard) and the r15 promotion (r15
# imports THIS module's CTEs; its import bails while r14 is partial)
# were skipped. Re-invoking both here — after every definition exists —
# makes the catalog complete under either import order.
# ---------------------------------------------------------------------

from . import queries_more as _qm  # noqa: E402

_qm._promote_staged_r14()
# the r15 promotion exists only once queries_more has defined it — on
# the NORMAL chain this module is imported mid-queries_more (before
# that point) and queries_more's own body runs the r15 promotion later
_promote_next = getattr(_qm, "_promote_staged_r15", None)
if _promote_next is not None:
    _promote_next()
del _qm, _promote_next
