"""ROUND-15 STAGED catalog queries — seeded in round 12 (the staging
pipeline stays stocked two cohorts ahead: r13 and r14 cohorts are
already staged and verified, so this cohort composes the NEWEST proven
machinery one step further), NOT registered (same freeze protocol as
queries_staging_r5..r14). Round 15 promotes them.

The three themes are the in-code ROUND-15 candidate seeds
(queries.py plan comment), each a continuation of proven machinery
with real 100 TB pull:

INCREMENTAL GRAPH MAINTENANCE over the shingle-overlap dedup graph
(the r13/r14 convention: an edge joins two documents sharing >= 3
distinct word-8-grams, built as an inverted-index equi-join, never
all-pairs). Documents are cut into 5 ARRIVAL BATCHES over the doc_id
range with the exact-integer cut convention ((id - mn) * 5 div
(mx - mn + 1)); batch 4 is "today's delivery". The committed state is
the CONVERGED base-graph labels (batches 0..3); the incremental run
seeds from them, joins only the delta documents' grams against the
same inverted index, and re-converges — the fixpoint family's LEDGER
face: at 100 TB a daily dedup job must not re-run CC over the corpus,
it re-converges the edge-touched components and reuses every other
committed label (hash-min from any seed that is a member-id upper
bound converges to the component minimum, so the incremental answer
PROVABLY equals the full recompute — and the oracle is the
reachability closure on the unioned graph, iteration-free).

- ``cc_incremental_labels_documents`` — the seeded re-convergence
  itself: converged labels after the delta arrives, top-20
  components with their new-node counts.
- ``cc_touched_components_documents`` — which committed base
  components the delta touches, and with how many pairs/new docs.
- ``cc_incremental_stability_documents`` — the relabel audit: how
  many committed labels survived the delta (the zero-churn claim a
  label-reuse design depends on, computed, not assumed).
- ``cc_attachment_profile_documents`` — how new docs land: attached
  to existing components vs forming all-new ones.
- ``cc_delta_edge_mix_documents`` — delta pairs by endpoint age
  (old-old / old-new / new-new): the arrival batch's join footprint.
- ``cc_reconverge_frontier_documents`` — the node-level work bound:
  frontier (touched-component) nodes vs stable nodes whose labels
  are reusable as-is.
- ``cc_incremental_savings_documents`` — the edge-level work bound:
  pairs inside touched components (re-joined by the incremental run)
  vs pairs whose work is saved.

ZONE-MAP / LEDGER PRUNING ECONOMICS over the per-(partition, commit)
mergeable state rows (extends round 11's zone_map_prune_lineitem
along the r14 ledger time axis): each (event_type, batch) state row
carries exact value zones (quantized cents min/max) and time zones
(epoch-second min/max), and every query below is pure state
arithmetic answering "which state rows PROVE a predicate can skip
them, and what does that buy" — the scan-planning face of the
ledger: at 100 TB the difference between a full scan and reading 8%
of partitions is exactly this metadata computation.

- ``zone_prune_matrix_events`` — the per-(partition, commit) prune
  matrix for a value predicate and a freshness predicate.
- ``zone_prune_threshold_sweep_events`` — rows/states skipped per
  candidate value threshold (map-side literal sweep).
- ``zone_prune_time_cut_events`` — prunability along the commit
  axis for each snapshot-cut freshness predicate.
- ``zone_prune_soundness_events`` — the audit: zero predicate
  matches inside pruned groups, recomputed from rows.
- ``zone_time_adjacency_events`` — successive-commit value-zone
  overlap per partition (clustering rot along the time axis).
- ``zone_prune_compaction_tradeoff_events`` — what compacting 5
  commit states into 1 costs in pruning power.

JOINT CURRICULUM x MIX ALLOCATION composing queries_staging_r13's
source-mix planner with queries_staging_r14's difficulty-epoch map:
the planning object becomes the (epoch, source) GRID — slots, caps,
drift, and ordering heads per cell, all exact integer arithmetic off
one grouped scan (the grid is <= n_epochs x n_sources rows —
metadata at any corpus size).

- ``joint_epoch_source_grid_documents`` — the grid itself with
  in-epoch token shares.
- ``joint_slots_by_epoch_documents`` — largest-remainder (Hamilton)
  rounding of 1000 sample slots per epoch across sources.
- ``joint_caps_redistribution_documents`` — per-epoch anti-dominance
  caps with greedy quality-ranked redistribution of the capped-off
  budget.
- ``joint_mix_drift_by_epoch_documents`` — per-epoch PSI terms of
  the in-epoch source mix vs the corpus mix (does the curriculum
  ordering skew WHAT the model reads late in training?).
- ``joint_interleave_heads_documents`` — the first 3 interleave
  positions per (epoch, source) under the masked multiplicative-hash
  key (the r14 ordering convention with the source dimension).
- ``joint_dominance_audit_documents`` — per epoch: top-source share
  before vs after the cap, and how many sources hit it.
- ``joint_rounding_drift_documents`` — per-epoch Hamilton slots
  summed across epochs vs 4x the corpus-level allocation: the
  rounding interaction a two-level planner must budget for.

tests/test_staging_r15.py runs these through the SAME compare harness
as the live catalog at the suite's SF. Every query verified against
its DuckDB oracle at sf0.001 + sf0.01 + sf0.1 before commit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

# NOTE r16 (ADVICE fix): no top-of-module catalog bootstrap — this
# module imports r13/r14 helpers at module scope, so an early
# bootstrap made standalone staging-first imports die while earlier
# cohorts were partially initialized. The r13/r14 imports below run
# the full catalog chain through their own tail hooks; the tail hook
# here re-invokes the r15 promotion afterwards.
from .data import load_table

# deliberate reuse of the r13/r14 cohorts' machinery (the graph CTE,
# the hash-min round, the exact-integer cut, the curriculum score and
# epoch map are CONVENTIONS documented there; re-declaring them here
# would fork the convention the moment one copy changed)
from .queries_staging_r13 import (  # noqa: F401
    _EV_BATCH_CTE,
    _GRAPH_CTE,
    _NB,
    _QUALITY_FLOOR,
    _events_batched,
    _gram_edges,
    _gram_pairs,
    _hashmin_round,
    _hashmin_round_flagged,
    _local_result,
)
from .queries_staging_r14 import (  # noqa: F401
    _EMAP_CTE,
    _IMASK,
    _IMOD,
    _KNUTH,
    _MAX_CC_ROUNDS,
    _N_EPOCHS,
    _epoch_map,
    _scored_docs,
)

STAGED_R15: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R15[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R15[name].oracle


# =====================================================================
# A. Incremental graph maintenance over the shingle-overlap dup graph
# =====================================================================

_DNB = 5  # arrival batches over the doc_id range (the _NB cut form)
_NEW_BATCH = _DNB - 1  # batch 4 = the arriving delta

# arrival-batch CTE suffix: extends _GRAPH_CTE's pair list with each
# endpoint's arrival batch (exact integer cut over the doc_id range),
# the base (old-old) pair subset, and both symmetric edge lists
_IGR_CTE = (
    _GRAPH_CTE
    + f""", dbounds AS (
  SELECT CAST(min(doc_id) AS BIGINT) AS dmn,
         CAST(max(doc_id) AS BIGINT) AS dmx
  FROM documents
), db AS (
  SELECT doc_id,
         CAST(((doc_id - dmn) * {_DNB}) // (dmx - dmn + 1) AS BIGINT)
           AS dbatch
  FROM documents, dbounds
), prsb AS (
  SELECT p.a, p.b, da.dbatch AS ab, dbb.dbatch AS bb
  FROM prs p
  JOIN db da ON da.doc_id = p.a
  JOIN db dbb ON dbb.doc_id = p.b
), base_prs AS (
  SELECT a, b FROM prsb
  WHERE ab < {_NEW_BATCH} AND bb < {_NEW_BATCH}
), base_edges AS (
  SELECT a, b FROM base_prs UNION ALL SELECT b AS a, a AS b FROM base_prs
)"""
)

# both reachability closures (full graph and base graph) in one
# RECURSIVE list; an oracle that references only one never pays for
# the other (unreferenced CTEs are not executed)
_IGR_RCTE = _IGR_CTE.replace("WITH ", "WITH RECURSIVE ", 1)

_TWO_CLOSURES = (
    _IGR_RCTE
    + """, reach AS (
  SELECT a AS v, a AS u FROM edges
  UNION
  SELECT r.v, e.b AS u FROM reach r JOIN edges e ON e.a = r.u
), comp_full AS (
  SELECT v, CAST(min(u) AS BIGINT) AS component FROM reach GROUP BY v
), breach AS (
  SELECT a AS v, a AS u FROM base_edges
  UNION
  SELECT r.v, e.b AS u FROM breach r JOIN base_edges e ON e.a = r.u
), comp_base AS (
  SELECT v, CAST(min(u) AS BIGINT) AS component FROM breach GROUP BY v
)"""
)


def _doc_bounds(spark, sf_dir):
    """1-row (dmn, dmx) doc_id bounds frame — broadcast next to any
    frame carrying doc_ids so the arrival batch becomes map-side
    arithmetic (optimization r15, guide §2.4: the batch of a doc_id
    is a pure function of the id and the two scalar bounds, so every
    former equi-join against a (doc_id, dbatch) map frame collapses
    to ``_dbatch_expr`` on a broadcast — zero exchanges)."""
    return (
        load_table(spark, sf_dir, "documents")
        .agg(F.min("doc_id").alias("dmn"), F.max("doc_id").alias("dmx"))
    )


def _dbatch_expr(colname: str):
    """The exact-integer arrival-batch cut over the doc_id range —
    identical to _IGR_CTE's ``db`` formula (requires dmn/dmx columns
    in scope from a broadcast _doc_bounds crossJoin)."""
    return (
        F.expr(f"({colname} - dmn) * {_DNB} div (dmx - dmn + 1)")
        .cast("long")
    )


def _doc_batches(spark, sf_dir):
    """(doc_id, dbatch) — the Spark mirror of _IGR_CTE's ``db``: the
    exact-integer arrival-batch cut over the doc_id range (scalar
    bounds ride a 1-row broadcast, the _events_batched convention)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.crossJoin(F.broadcast(_doc_bounds(spark, sf_dir))).select(
        "doc_id", _dbatch_expr("doc_id").alias("dbatch")
    )


def _pairs_batched(spark, sf_dir):
    """Candidate pairs with endpoint arrival batches (a, b, ab, bb) —
    the Spark mirror of _IGR_CTE's ``prsb``.

    Optimization r15 (guide §2.4): the original form joined the pair
    list TWICE against the (doc_id, dbatch) map frame — two exchanges
    of the pair list plus two recomputes of the batch map. The batch
    is pure arithmetic over (doc_id, dmn, dmx), so both joins collapse
    to map-side expressions next to one broadcast 1-row bounds frame.
    Same (a, b, ab, bb) rows (every pair endpoint is a documents
    doc_id, so the old inner joins were total)."""
    pairs = _gram_pairs(spark, sf_dir)
    return pairs.crossJoin(F.broadcast(_doc_bounds(spark, sf_dir))).select(
        "a",
        "b",
        _dbatch_expr("a").alias("ab"),
        _dbatch_expr("b").alias("bb"),
    )


def _converge(lbls, edges):
    """Hash-min to the fixpoint from an ARBITRARY seed labeling
    (persisted labels DF, rounds). Same loop, convergence test, and
    lineage discipline (localCheckpoint every 4 rounds) as
    queries_staging_r14._converged_labels — generalized to take the
    seed, which is what makes the run INCREMENTAL: seeded from
    committed labels, only un-converged regions keep changing."""
    # lineage discipline is stricter than the single-loop r14 form:
    # _hashmin_round references the label frame TWICE (message join +
    # final least-join), so the logical plan DOUBLES per round — and
    # here the seed itself may carry a prior converged run's lineage.
    # Checkpoint every 2 rounds, and return an eagerly checkpointed
    # frame so a second loop seeded from this one starts from a scan,
    # not from the whole first loop's plan (plan-string OOM otherwise).
    # The SEED checkpoint is lazy since r16: it still truncates the
    # seed's lineage, but materializes inside round 1's count job
    # instead of spending a dedicated job (guide §1.2).
    lbls = lbls.localCheckpoint(eager=False)
    rounds = 0
    prev_cached = None
    while True:
        rounds += 1
        assert rounds <= _MAX_CC_ROUNDS, (
            f"hash-min CC did not converge in {_MAX_CC_ROUNDS} rounds"
        )
        # optimization r15 (guide §2.4): flagged round — n_changed is
        # a filter+count over the round's own cached output instead of
        # a separate nxt-vs-prev join (one exchange fewer per round);
        # chg == (new < prev) is the old join's inequality exactly
        # (hash-min labels only decrease). Labels/rounds unchanged.
        nxt = _hashmin_round_flagged(lbls, edges)
        nxt = nxt.localCheckpoint() if rounds % 2 == 0 else nxt.persist()
        n_changed = nxt.filter("chg").count()
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = nxt
        lbls = nxt.select("v", "lbl")
        if n_changed == 0:
            break
    final = lbls.localCheckpoint()
    if prev_cached is not None:
        prev_cached.unpersist()
    return final, rounds


def _base_state(spark, sf_dir):
    """(pairsb, base_edges, base_lbls) — the COMMITTED half of the
    incremental-maintenance state: batched pairs, the old-old edge
    list, and its converged labels. Split out in optimization r15
    (guide §1.2, don't compute things you throw away):
    cc_touched_components consumes only the committed labels and the
    delta pairs, so it no longer pays for the seeded full-graph
    re-convergence it never reads. All three returned frames are
    persisted; callers unpersist."""
    pairsb = _pairs_batched(spark, sf_dir).persist()
    base_pairs = pairsb.filter(
        (F.col("ab") < _NEW_BATCH) & (F.col("bb") < _NEW_BATCH)
    ).select("a", "b")
    # edge list persists pre-partitioned on the round-join key b
    # (guide §2.4) so convergence rounds reuse the cached partitioning
    # and shuffle only the label frame — see _converged_labels
    base_edges = _gram_edges(base_pairs).repartition("b").persist()
    seed0 = (
        base_edges.select(F.col("a").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
    )
    base_lbls, _ = _converge(seed0, base_edges)
    return pairsb, base_edges, base_lbls


def _incremental_state(spark, sf_dir):
    """The full incremental-maintenance state:

    (pairsb, base_edges, full_edges, base_lbls, full_lbls) — pairsb /
    both edge lists / both label frames persisted (caller unpersists
    all five; the convention of the r13/r14 fixpoint queries).

    base_lbls = the COMMITTED state: converged labels over the
    old-old edge list. full_lbls = the incremental run: every
    full-graph node seeded with its committed label (own id where no
    label was committed — previously isolated or newly arrived), then
    hash-min over the unioned edge list to the fixpoint. Hash-min
    converges to the minimum SEED value reachable, every seed is the
    id of a member of the same component, and the member holding the
    component-minimum id keeps its own id as seed (its base label is
    the min of a subset containing it) — so the seeded fixpoint
    equals the full-recompute closure exactly, while touching only
    the regions the delta actually changed."""
    pairsb, base_edges, base_lbls = _base_state(spark, sf_dir)
    full_edges = (
        _gram_edges(pairsb.select("a", "b")).repartition("b").persist()
    )
    seed1 = (
        full_edges.select(F.col("a").alias("v"))
        .distinct()
        .join(
            base_lbls.select("v", F.col("lbl").alias("committed")),
            "v",
            "left",
        )
        .select("v", F.coalesce("committed", F.col("v")).alias("lbl"))
    )
    full_lbls, _ = _converge(seed1, full_edges)
    return pairsb, base_edges, full_edges, base_lbls, full_lbls


def _release(*dfs):
    for d in dfs:
        d.unpersist()


_CC_INC_ORACLE = (
    _TWO_CLOSURES
    + f""", newdocs AS (
  SELECT doc_id FROM db WHERE dbatch = {_NEW_BATCH}
)
SELECT component, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new_nodes
FROM comp_full c LEFT JOIN newdocs n ON n.doc_id = c.v
GROUP BY component
ORDER BY n_nodes DESC, component LIMIT 20"""
)


@stage(
    "cc_incremental_labels_documents",
    _CC_INC_ORACLE,
    "incremental graph maintenance: the SEEDED RE-CONVERGENCE itself. "
    "The base graph (arrival batches 0..3) is converged and its "
    "labels committed; then the batch-4 delta's edges join in and "
    "hash-min re-runs SEEDED FROM THE COMMITTED LABELS (new or "
    "previously-isolated nodes seed with their own id). Output: "
    "top-20 converged components by (size DESC, component ASC) with "
    "their new-doc counts. The oracle is the full-graph reachability "
    "closure — the seeded fixpoint provably equals the full "
    "recompute (every seed is a member id upper-bounded by the "
    "committed subset minimum), which is the correctness contract "
    "that lets a daily job NEVER re-run CC from scratch. Scale: the "
    "seed join is one equi-join against the committed label table; "
    "re-convergence rounds shuffle the edge list only, and regions "
    "the delta never touched are fixed points from round one.",
)
def cc_incremental_labels_documents(spark, sf_dir):
    pairsb, base_edges, full_edges, base_lbls, full_lbls = (
        _incremental_state(spark, sf_dir)
    )
    is_new = (F.col("dbatch") == _NEW_BATCH).cast("long")
    # batch via broadcast-bounds arithmetic on v (a doc_id) — the
    # former equi-join against the batch map was total and is now a
    # map-side expression (guide §2.4)
    out = _local_result(
        spark,
        full_lbls.crossJoin(F.broadcast(_doc_bounds(spark, sf_dir)))
        .select("v", "lbl", _dbatch_expr("v").alias("dbatch"))
        .groupBy(F.col("lbl").cast("long").alias("component"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(is_new).alias("n_new_nodes"),
        )
        .orderBy(F.desc("n_nodes"), "component")
        .limit(20),
    )
    _release(pairsb, base_edges, full_edges, base_lbls, full_lbls)
    return out


_CC_TOUCHED_ORACLE = (
    _TWO_CLOSURES
    + f""", dpairs AS (
  SELECT a, b, ab, bb FROM prsb
  WHERE ab = {_NEW_BATCH} OR bb = {_NEW_BATCH}
), oldpts AS (
  SELECT CASE WHEN ab < {_NEW_BATCH} THEN a ELSE b END AS v,
         CASE WHEN ab = {_NEW_BATCH} THEN a ELSE b END AS newpt
  FROM dpairs
  WHERE ab < {_NEW_BATCH} OR bb < {_NEW_BATCH}
), labeled AS (
  SELECT coalesce(cb.component, o.v) AS base_component, o.newpt
  FROM oldpts o LEFT JOIN comp_base cb ON cb.v = o.v
), bsize AS (
  SELECT component, CAST(count(*) AS BIGINT) AS n_base_nodes
  FROM comp_base GROUP BY component
)
SELECT l.base_component,
       CAST(coalesce(max(s.n_base_nodes), 0) AS BIGINT) AS n_base_nodes,
       CAST(count(*) AS BIGINT) AS n_delta_pairs,
       CAST(count(DISTINCT l.newpt) AS BIGINT) AS n_new_docs
FROM labeled l LEFT JOIN bsize s ON s.component = l.base_component
GROUP BY l.base_component"""
)


@stage(
    "cc_touched_components_documents",
    _CC_TOUCHED_ORACLE,
    "incremental graph maintenance: WHICH committed base components "
    "the delta touches — for every delta pair with an old endpoint, "
    "the old endpoint's committed component (its own id when it was "
    "previously isolated: n_base_nodes 0 reports exactly that), with "
    "the touching pair count and the distinct new docs attaching. "
    "This is the re-convergence WORK LIST a 100 TB incremental dedup "
    "job builds before running anything: components absent from this "
    "list keep their committed labels untouched. Scale: delta pairs "
    "come from joining ONLY the delta docs' grams against the "
    "persisted inverted index; the classification is two equi-joins "
    "against the committed label table.",
)
def cc_touched_components_documents(spark, sf_dir):
    # base-only state (optimization r15, guide §1.2): this query reads
    # the delta pairs and the COMMITTED labels only — the seeded
    # full-graph re-convergence _incremental_state also runs was
    # computed and discarded here
    pairsb, base_edges, base_lbls = _base_state(spark, sf_dir)
    dpairs = pairsb.filter(
        (F.col("ab") == _NEW_BATCH) | (F.col("bb") == _NEW_BATCH)
    )
    oldpts = dpairs.filter(
        (F.col("ab") < _NEW_BATCH) | (F.col("bb") < _NEW_BATCH)
    ).select(
        F.when(F.col("ab") < _NEW_BATCH, F.col("a"))
        .otherwise(F.col("b"))
        .alias("v"),
        F.when(F.col("ab") == _NEW_BATCH, F.col("a"))
        .otherwise(F.col("b"))
        .alias("newpt"),
    )
    labeled = oldpts.join(
        base_lbls.select("v", F.col("lbl").alias("committed")), "v", "left"
    ).select(
        F.coalesce("committed", F.col("v")).alias("base_component"),
        "newpt",
    )
    bsize = base_lbls.groupBy(F.col("lbl").alias("base_component")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    out = _local_result(
        spark,
        labeled.groupBy("base_component")
        .agg(
            F.count(F.lit(1)).alias("n_delta_pairs"),
            F.countDistinct("newpt").alias("n_new_docs"),
        )
        .join(bsize, "base_component", "left")
        .select(
            "base_component",
            F.coalesce("sz", F.lit(0)).cast("long").alias("n_base_nodes"),
            "n_delta_pairs",
            "n_new_docs",
        ),
    )
    _release(pairsb, base_edges, base_lbls)
    return out


_CC_STABILITY_ORACLE = (
    _TWO_CLOSURES
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_old_nodes,
       CAST(sum(CASE WHEN cf.component <> coalesce(cb.component, cf.v)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_relabeled,
       CAST(sum(CASE WHEN cf.component = coalesce(cb.component, cf.v)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_stable,
       round(CAST(sum(CASE WHEN cf.component =
                                coalesce(cb.component, cf.v)
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 9) AS stable_share,
       (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM comp_base)
         AS n_base_components,
       (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM comp_full)
         AS n_full_components
FROM comp_full cf
JOIN db d ON d.doc_id = cf.v
LEFT JOIN comp_base cb ON cb.v = cf.v
WHERE d.dbatch < {_NEW_BATCH}"""
)


@stage(
    "cc_incremental_stability_documents",
    _CC_STABILITY_ORACLE,
    "incremental graph maintenance: the RELABEL AUDIT. For every OLD "
    "node in the post-delta graph, does its converged label still "
    "equal its committed one (own id where nothing was committed)? "
    "A committed label only changes when the delta BRIDGES two "
    "previously separate old components — the event a label-reuse "
    "design must detect, because every downstream consumer of the "
    "old label (survivor choices, cluster stats) is invalidated. "
    "Computed, never assumed: the one-row audit carries the relabel "
    "count, the stable share, and both component counts. Scale: one "
    "equi-join between the committed and re-converged label tables — "
    "the cheapest possible invalidation feed.",
)
def cc_incremental_stability_documents(spark, sf_dir):
    pairsb, base_edges, full_edges, base_lbls, full_lbls = (
        _incremental_state(spark, sf_dir)
    )
    old_full = (
        full_lbls.crossJoin(F.broadcast(_doc_bounds(spark, sf_dir)))
        .select("v", "lbl", _dbatch_expr("v").alias("dbatch"))
        .filter(F.col("dbatch") < _NEW_BATCH)
        .join(
            base_lbls.select("v", F.col("lbl").alias("committed")),
            "v",
            "left",
        )
        .select(
            "v",
            "lbl",
            F.coalesce("committed", F.col("v")).alias("base_lbl"),
        )
    )
    stable = (F.col("lbl") == F.col("base_lbl")).cast("long")
    counts = old_full.agg(
        F.count(F.lit(1)).alias("n_old_nodes"),
        F.sum(F.lit(1) - stable).alias("n_relabeled"),
        F.sum(stable).alias("n_stable"),
        F.round(
            F.sum(stable).cast("double") / F.count(F.lit(1)), 9
        ).alias("stable_share"),
    )
    nb = base_lbls.agg(
        F.countDistinct("lbl").alias("n_base_components")
    )
    nf = full_lbls.agg(
        F.countDistinct("lbl").alias("n_full_components")
    )
    out = _local_result(
        spark,
        counts.crossJoin(F.broadcast(nb)).crossJoin(F.broadcast(nf)),
    )
    _release(pairsb, base_edges, full_edges, base_lbls, full_lbls)
    return out


_CC_ATTACH_ORACLE = (
    _TWO_CLOSURES
    + f""", compage AS (
  SELECT cf.component,
         CAST(sum(CASE WHEN d.dbatch < {_NEW_BATCH} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_old
  FROM comp_full cf JOIN db d ON d.doc_id = cf.v
  GROUP BY cf.component
), newnodes AS (
  SELECT cf.v, cf.component FROM comp_full cf
  JOIN db d ON d.doc_id = cf.v
  WHERE d.dbatch = {_NEW_BATCH}
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t FROM newnodes
)
SELECT CASE WHEN a.n_old > 0 THEN 'attached' ELSE 'isolated_new' END
         AS kind,
       CAST(count(*) AS BIGINT) AS n_new_docs,
       CAST(count(DISTINCT n.component) AS BIGINT) AS n_components,
       round(CAST(count(*) AS DOUBLE) / max(t.t), 9) AS new_doc_share
FROM newnodes n JOIN compage a ON a.component = n.component, tot t
GROUP BY 1"""
)


@stage(
    "cc_attachment_profile_documents",
    _CC_ATTACH_ORACLE,
    "incremental graph maintenance: HOW the delta lands — each new "
    "doc that enters the graph either ATTACHES to a component "
    "containing old docs (it is a near-copy of existing corpus: the "
    "dedup admission decision fires) or lands in an ALL-NEW "
    "component (today's delivery duplicates itself: a template or "
    "feed replay). The two kinds have different remediations — "
    "admission filtering vs source-side investigation — so the "
    "profile is the delta-triage row a daily job reads first. "
    "Scale: component age is one grouped count over the label "
    "table; the classification is an equi-join on component id.",
)
def cc_attachment_profile_documents(spark, sf_dir):
    pairsb, base_edges, full_edges, base_lbls, full_lbls = (
        _incremental_state(spark, sf_dir)
    )
    aged = full_lbls.crossJoin(
        F.broadcast(_doc_bounds(spark, sf_dir))
    ).select("v", "lbl", _dbatch_expr("v").alias("dbatch"))
    compage = aged.groupBy("lbl").agg(
        F.sum((F.col("dbatch") < _NEW_BATCH).cast("long")).alias("n_old")
    )
    newnodes = aged.filter(F.col("dbatch") == _NEW_BATCH).select(
        "v", "lbl"
    )
    tot = newnodes.agg(F.count(F.lit(1)).alias("t"))
    out = _local_result(
        spark,
        newnodes.join(compage, "lbl")
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.when(F.col("n_old") > 0, F.lit("attached"))
            .otherwise(F.lit("isolated_new"))
            .alias("kind")
        )
        .agg(
            F.count(F.lit(1)).alias("n_new_docs"),
            F.countDistinct("lbl").alias("n_components"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("t"), 9
            ).alias("new_doc_share"),
        ),
    )
    _release(pairsb, base_edges, full_edges, base_lbls, full_lbls)
    return out


_CC_DMIX_ORACLE = (
    _IGR_CTE
    + f""", kinds AS (
  SELECT CASE WHEN ab < {_NEW_BATCH} AND bb < {_NEW_BATCH}
              THEN 'old_old'
              WHEN ab = {_NEW_BATCH} AND bb = {_NEW_BATCH}
              THEN 'new_new' ELSE 'old_new' END AS kind
  FROM prsb
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t FROM kinds
)
SELECT kind, CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(count(*) AS DOUBLE) / max(t.t), 9) AS pair_share
FROM kinds, tot t GROUP BY kind"""
)


@stage(
    "cc_delta_edge_mix_documents",
    _CC_DMIX_ORACLE,
    "incremental graph maintenance: the candidate-pair list by "
    "endpoint age — old-old pairs are yesterday's committed work, "
    "old-new pairs are admission checks (new doc vs existing "
    "corpus), new-new pairs are intra-delivery duplication. The mix "
    "is the incremental job's cost model: its join volume is the "
    "old-new + new-new share ONLY (the old-old work is never "
    "redone), so this row quantifies the savings claim before any "
    "CC round runs. Scale: the kind tag is a map-side expression on "
    "the pair list; three output rows.",
)
def cc_delta_edge_mix_documents(spark, sf_dir):
    pairsb = _pairs_batched(spark, sf_dir)
    kinds = pairsb.select(
        F.when(
            (F.col("ab") < _NEW_BATCH) & (F.col("bb") < _NEW_BATCH),
            F.lit("old_old"),
        )
        .when(
            (F.col("ab") == _NEW_BATCH) & (F.col("bb") == _NEW_BATCH),
            F.lit("new_new"),
        )
        .otherwise(F.lit("old_new"))
        .alias("kind")
    )
    tot = kinds.agg(F.count(F.lit(1)).alias("t"))
    return (
        kinds.crossJoin(F.broadcast(tot))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("t"), 9
            ).alias("pair_share"),
        )
    )


_CC_FRONTIER_ORACLE = (
    _TWO_CLOSURES
    + f""", dpts AS (
  SELECT DISTINCT v FROM (
    SELECT a AS v FROM prsb
    WHERE ab = {_NEW_BATCH} OR bb = {_NEW_BATCH}
    UNION ALL
    SELECT b AS v FROM prsb
    WHERE ab = {_NEW_BATCH} OR bb = {_NEW_BATCH}
  )
), touched AS (
  SELECT DISTINCT cf.component
  FROM comp_full cf JOIN dpts p ON p.v = cf.v
), flagged AS (
  SELECT cf.v,
         CASE WHEN t.component IS NOT NULL THEN 1 ELSE 0 END AS fr
  FROM comp_full cf LEFT JOIN touched t ON t.component = cf.component
)
SELECT CAST(sum(fr) AS BIGINT) AS n_frontier_nodes,
       CAST(sum(1 - fr) AS BIGINT) AS n_stable_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM touched)
         AS n_frontier_components,
       (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM comp_full)
         - (SELECT CAST(count(*) AS BIGINT) FROM touched)
         AS n_stable_components,
       round(CAST(sum(fr) AS DOUBLE) / count(*), 9)
         AS frontier_node_share
FROM flagged"""
)


@stage(
    "cc_reconverge_frontier_documents",
    _CC_FRONTIER_ORACLE,
    "incremental graph maintenance: the NODE-LEVEL WORK BOUND — "
    "frontier nodes sit in components containing a delta-pair "
    "endpoint (their labels may need re-convergence); stable nodes' "
    "committed labels are reusable AS-IS, no compute. The frontier "
    "share is the headline number of the incremental design: at "
    "steady state a daily delta touches a tiny fraction of a "
    "100 TB corpus's components, and this row is the measured (not "
    "assumed) bound the scheduler budgets re-convergence by. Scale: "
    "frontier marking is one equi-join of the delta endpoints "
    "against the label table, then a component-keyed semi-join.",
)
def cc_reconverge_frontier_documents(spark, sf_dir):
    pairsb, base_edges, full_edges, base_lbls, full_lbls = (
        _incremental_state(spark, sf_dir)
    )
    dp = pairsb.filter(
        (F.col("ab") == _NEW_BATCH) | (F.col("bb") == _NEW_BATCH)
    )
    dpts = (
        dp.select(F.col("a").alias("v"))
        .union(dp.select(F.col("b").alias("v")))
        .distinct()
    )
    touched = (
        full_lbls.join(dpts, "v").select("lbl").distinct()
    )
    flagged = full_lbls.join(
        touched.withColumn("fr", F.lit(1)), "lbl", "left"
    ).select("v", F.coalesce("fr", F.lit(0)).alias("fr"))
    counts = flagged.agg(
        F.sum("fr").cast("long").alias("n_frontier_nodes"),
        F.sum(F.lit(1) - F.col("fr")).cast("long").alias("n_stable_nodes"),
        F.round(
            F.sum("fr").cast("double") / F.count(F.lit(1)), 9
        ).alias("frontier_node_share"),
    )
    nfc = touched.agg(F.count(F.lit(1)).alias("n_frontier_components"))
    nc = full_lbls.agg(F.countDistinct("lbl").alias("n_all"))
    out = _local_result(
        spark,
        counts.crossJoin(F.broadcast(nfc))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_frontier_nodes",
            "n_stable_nodes",
            F.col("n_frontier_components").cast("long"),
            (F.col("n_all") - F.col("n_frontier_components"))
            .cast("long")
            .alias("n_stable_components"),
            "frontier_node_share",
        ),
    )
    _release(pairsb, base_edges, full_edges, base_lbls, full_lbls)
    return out


_CC_SAVINGS_ORACLE = (
    _TWO_CLOSURES
    + f""", dpts AS (
  SELECT DISTINCT v FROM (
    SELECT a AS v FROM prsb
    WHERE ab = {_NEW_BATCH} OR bb = {_NEW_BATCH}
    UNION ALL
    SELECT b AS v FROM prsb
    WHERE ab = {_NEW_BATCH} OR bb = {_NEW_BATCH}
  )
), touched AS (
  SELECT DISTINCT cf.component
  FROM comp_full cf JOIN dpts p ON p.v = cf.v
), pflag AS (
  SELECT p.a, p.b, p.ab, p.bb,
         CASE WHEN t.component IS NOT NULL THEN 1 ELSE 0 END AS tch
  FROM prsb p
  JOIN comp_full cf ON cf.v = p.a
  LEFT JOIN touched t ON t.component = cf.component
)
SELECT CAST(sum(tch) AS BIGINT) AS n_pairs_touched,
       CAST(sum(1 - tch) AS BIGINT) AS n_pairs_stable,
       CAST(sum(CASE WHEN ab = {_NEW_BATCH} OR bb = {_NEW_BATCH}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_delta_pairs,
       round(CAST(sum(tch) AS DOUBLE) / count(*), 9)
         AS touched_pair_share
FROM pflag"""
)


@stage(
    "cc_incremental_savings_documents",
    _CC_SAVINGS_ORACLE,
    "incremental graph maintenance: the EDGE-LEVEL WORK BOUND — "
    "every candidate pair lies inside exactly one converged "
    "component (both endpoints share it), so pairs split into "
    "touched-component pairs (the re-convergence joins walk them "
    "again) and stable pairs (never re-joined: their components saw "
    "no delta). 1 - touched_pair_share is the measured join-work "
    "saving of incremental over full recompute, reported next to "
    "the delta pair count that caused it. Scale: the pair flag is "
    "one equi-join from pair endpoint to component label, then a "
    "broadcast-size semi-join on touched components.",
)
def cc_incremental_savings_documents(spark, sf_dir):
    pairsb, base_edges, full_edges, base_lbls, full_lbls = (
        _incremental_state(spark, sf_dir)
    )
    dp = pairsb.filter(
        (F.col("ab") == _NEW_BATCH) | (F.col("bb") == _NEW_BATCH)
    )
    dpts = (
        dp.select(F.col("a").alias("v"))
        .union(dp.select(F.col("b").alias("v")))
        .distinct()
    )
    touched = full_lbls.join(dpts, "v").select("lbl").distinct()
    pflag = (
        pairsb.join(
            full_lbls.select(F.col("v").alias("a"), "lbl"), "a"
        )
        .join(touched.withColumn("tch", F.lit(1)), "lbl", "left")
        .select(
            "ab", "bb", F.coalesce("tch", F.lit(0)).alias("tch")
        )
    )
    is_delta = (
        (F.col("ab") == _NEW_BATCH) | (F.col("bb") == _NEW_BATCH)
    ).cast("long")
    out = _local_result(
        spark,
        pflag.agg(
            F.sum("tch").cast("long").alias("n_pairs_touched"),
            F.sum(F.lit(1) - F.col("tch"))
            .cast("long")
            .alias("n_pairs_stable"),
            F.sum(is_delta).alias("n_delta_pairs"),
            F.round(
                F.sum("tch").cast("double") / F.count(F.lit(1)), 9
            ).alias("touched_pair_share"),
        ),
    )
    _release(pairsb, base_edges, full_edges, base_lbls, full_lbls)
    return out


# =====================================================================
# B. Zone-map / ledger pruning economics over (partition, commit)
# =====================================================================

_Z_THR = 400.0  # the fixed value predicate (value >= 400)
_Z_THR_CENTS = 40000  # its quantized-exact form on the cents grid
_Z_SWEEP_CENTS = [10000, 20000, 30000, 40000, 50000]

# per-(event_type, batch) state rows extended with exact ZONES: value
# zones on the cents grid (values sit on the 0.01 grid, so
# round(value*100) is a lossless int64), time zones in epoch seconds,
# and the scalar bounds (mn, mx) carried through for cut arithmetic —
# the r14 _ST_CTE families plus the pruning metadata every columnar
# format already keeps per row-group
_ZST_CTE = (
    _EV_BATCH_CTE
    + """, zst AS (
  SELECT event_type, batch,
         CAST(count(*) AS BIGINT) AS n,
         CAST(min(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
           AS zmin_cents,
         CAST(max(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
           AS zmax_cents,
         CAST(min(es) AS BIGINT) AS zmin_es,
         CAST(max(es) AS BIGINT) AS zmax_es,
         CAST(max(mn) AS BIGINT) AS mn,
         CAST(max(mx) AS BIGINT) AS mx
  FROM ev GROUP BY 1, 2
)"""
)


def _zone_states(spark, sf_dir):
    """The Spark mirror of _ZST_CTE: one zone-extended state row per
    (event_type, commit batch) — the ledger-build job, one grouped
    single-pass scan; every query below is metadata arithmetic over
    its <= n_types x 5 rows."""
    ev = _events_batched(spark, sf_dir)
    cents = F.round(F.col("value") * F.lit(100.0)).cast("long")
    return ev.groupBy("event_type", "batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(cents).alias("zmin_cents"),
        F.max(cents).alias("zmax_cents"),
        F.min("es").alias("zmin_es"),
        F.max("es").alias("zmax_es"),
        F.max("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


_Z_MATRIX_ORACLE = (
    _ZST_CTE
    + f"""
SELECT event_type, batch, n, zmin_cents, zmax_cents,
       CAST(CASE WHEN zmax_cents < {_Z_THR_CENTS} THEN 1 ELSE 0 END
            AS BIGINT) AS prunable_value,
       CAST(CASE WHEN zmax_es < mn + (mx - mn + 1) * {_NB - 1} // {_NB}
                 THEN 1 ELSE 0 END AS BIGINT) AS prunable_fresh
FROM zst"""
)


@stage(
    "zone_prune_matrix_events",
    _Z_MATRIX_ORACLE,
    "pruning economics: the per-(partition, commit) PRUNE MATRIX — "
    "for each (event_type, batch) state row, can the committed zones "
    "PROVE the row group irrelevant to (a) the value predicate "
    "value >= 400 (zone max below the threshold on the exact cents "
    "grid) and (b) the freshness predicate es >= last-snapshot-cut "
    "(time-zone max before the cut, exact integer cut arithmetic)? "
    "This matrix is what a scan planner consults INSTEAD of opening "
    "files — the ledger's zone columns are the same metadata parquet "
    "row groups carry, kept where the validation ledger already "
    "lives. Scale: n_types x 5 metadata rows; the decision per row "
    "is two integer comparisons.",
)
def zone_prune_matrix_events(spark, sf_dir):
    st = _zone_states(spark, sf_dir)
    cut = F.expr(f"mn + (mx - mn + 1) * {_NB - 1} div {_NB}")
    return st.select(
        "event_type",
        "batch",
        "n",
        "zmin_cents",
        "zmax_cents",
        (F.col("zmax_cents") < _Z_THR_CENTS)
        .cast("long")
        .alias("prunable_value"),
        (F.col("zmax_es") < cut).cast("long").alias("prunable_fresh"),
    )


_Z_SWEEP_ORACLE = (
    _ZST_CTE
    + f""", tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS t FROM zst
)
SELECT CAST(thr.c AS BIGINT) AS thr_cents,
       CAST(sum(CASE WHEN zmax_cents < thr.c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_states_prunable,
       CAST(sum(CASE WHEN zmax_cents < thr.c THEN n ELSE 0 END)
            AS BIGINT) AS n_rows_skipped,
       round(CAST(sum(CASE WHEN zmax_cents < thr.c THEN n ELSE 0 END)
                  AS DOUBLE) / max(t.t), 9) AS row_skip_share
FROM zst CROSS JOIN (SELECT unnest([{", ".join(str(c) for c in _Z_SWEEP_CENTS)}]) AS c) thr, tot t
GROUP BY thr.c"""
)


@stage(
    "zone_prune_threshold_sweep_events",
    _Z_SWEEP_ORACLE,
    "pruning economics: the THRESHOLD TUNING CURVE — states and rows "
    "provably skippable for each candidate value threshold in "
    "{100, 200, 300, 400, 500} (cents grid). A pipeline reads this "
    "curve to know which of ITS predicates the current physical "
    "layout can actually serve cheaply (a predicate whose threshold "
    "sits below every zone max prunes nothing: re-cluster or pay "
    "full scans). Shape: the sweep explodes a 5-literal array "
    "map-side over the state table (the length_floor_sweep "
    "convention — no data-vs-data join), so the whole curve is a "
    "5 x n_states-cell aggregate over metadata rows.",
)
def zone_prune_threshold_sweep_events(spark, sf_dir):
    st = _zone_states(spark, sf_dir)
    tot = st.agg(F.sum("n").cast("long").alias("t"))
    swept = st.crossJoin(F.broadcast(tot)).select(
        "n",
        "zmax_cents",
        "t",
        F.explode(
            F.array(*[F.lit(c).cast("long") for c in _Z_SWEEP_CENTS])
        ).alias("thr_cents"),
    )
    pr = F.col("zmax_cents") < F.col("thr_cents")
    return swept.groupBy("thr_cents").agg(
        F.sum(pr.cast("long")).alias("n_states_prunable"),
        F.sum(F.when(pr, F.col("n")).otherwise(0)).alias("n_rows_skipped"),
        F.round(
            F.sum(F.when(pr, F.col("n")).otherwise(0)).cast("double")
            / F.max("t"),
            9,
        ).alias("row_skip_share"),
    )


_Z_TIMECUT_ORACLE = (
    _ZST_CTE
    + f""", tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS t FROM zst
)
SELECT CAST(s.s AS BIGINT) AS snapshot_cut,
       CAST(sum(CASE WHEN zmax_es < mn + (mx - mn + 1) * s.s // {_NB}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_states_prunable,
       CAST(sum(CASE WHEN zmax_es < mn + (mx - mn + 1) * s.s // {_NB}
                     THEN n ELSE 0 END) AS BIGINT) AS n_rows_skipped,
       round(CAST(sum(CASE WHEN zmax_es <
                               mn + (mx - mn + 1) * s.s // {_NB}
                           THEN n ELSE 0 END) AS DOUBLE) / max(t.t), 9)
         AS row_skip_share
FROM zst CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS s) s, tot t
GROUP BY s.s"""
)


@stage(
    "zone_prune_time_cut_events",
    _Z_TIMECUT_ORACLE,
    "pruning economics: prunability along the COMMIT AXIS — for each "
    "snapshot-cut freshness predicate es >= cut_s (cut_s = mn + "
    "(mx - mn + 1) * s div 5, the exact-integer cut convention), how "
    "many (partition, commit) states prove themselves skippable and "
    "how many rows that retires. By construction of the batch cut a "
    "commit is prunable exactly when it predates the cut — THIS "
    "QUERY PROVES the layout delivers that ideal (a partition whose "
    "time zones straddle a cut would break it): incremental "
    "consumers ('rows since the last run') scan ONLY the newest "
    "commits, which is the whole point of committing by time. "
    "Shape: a 4-literal map-side explode over metadata rows.",
)
def zone_prune_time_cut_events(spark, sf_dir):
    st = _zone_states(spark, sf_dir)
    tot = st.agg(F.sum("n").cast("long").alias("t"))
    swept = st.crossJoin(F.broadcast(tot)).select(
        "n",
        "zmax_es",
        "mn",
        "mx",
        "t",
        F.explode(
            F.array(*[F.lit(s).cast("long") for s in (1, 2, 3, 4)])
        ).alias("snapshot_cut"),
    )
    pr = F.col("zmax_es") < F.expr(
        f"mn + (mx - mn + 1) * snapshot_cut div {_NB}"
    )
    return swept.groupBy("snapshot_cut").agg(
        F.sum(pr.cast("long")).alias("n_states_prunable"),
        F.sum(F.when(pr, F.col("n")).otherwise(0)).alias("n_rows_skipped"),
        F.round(
            F.sum(F.when(pr, F.col("n")).otherwise(0)).cast("double")
            / F.max("t"),
            9,
        ).alias("row_skip_share"),
    )


_Z_SOUND_ORACLE = (
    _ZST_CTE
    + f""", pruned AS (
  SELECT event_type, batch, n FROM zst
  WHERE zmax_cents < {_Z_THR_CENTS}
), act AS (
  SELECT e.event_type,
         CAST(count(*) AS BIGINT) AS actual_matches_total,
         CAST(sum(CASE WHEN p.batch IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS actual_matches_in_pruned
  FROM ev e LEFT JOIN pruned p
    ON p.event_type = e.event_type AND p.batch = e.batch
  WHERE CAST(round(e.value * 100.0) AS BIGINT) >= {_Z_THR_CENTS}
  GROUP BY e.event_type
), clm AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_pruned_states,
         CAST(sum(n) AS BIGINT) AS claimed_skipped_rows
  FROM pruned GROUP BY event_type
)
SELECT z.event_type,
       CAST(coalesce(c.n_pruned_states, 0) AS BIGINT) AS n_pruned_states,
       CAST(coalesce(c.claimed_skipped_rows, 0) AS BIGINT)
         AS claimed_skipped_rows,
       CAST(coalesce(a.actual_matches_total, 0) AS BIGINT)
         AS actual_matches_total,
       CAST(coalesce(a.actual_matches_in_pruned, 0) AS BIGINT)
         AS actual_matches_in_pruned
FROM (SELECT DISTINCT event_type FROM zst) z
LEFT JOIN clm c ON c.event_type = z.event_type
LEFT JOIN act a ON a.event_type = z.event_type"""
)


@stage(
    "zone_prune_soundness_events",
    _Z_SOUND_ORACLE,
    "pruning economics: the SOUNDNESS AUDIT — recompute, from rows, "
    "how many value >= 400 matches actually live inside the "
    "(partition, commit) groups the zones claimed skippable: the "
    "answer must be zero, and this query REPORTS it per partition "
    "rather than assuming it (a zone ledger corrupted by a bad merge "
    "or a late update would surface here first, before wrong query "
    "results ship). This is the one deliberate row-scan of the "
    "family — the periodic audit a metadata-trusting planner "
    "schedules, exactly like Iceberg manifest verification. Scale: "
    "one scan + an equi-join against the tiny pruned-state list.",
)
def zone_prune_soundness_events(spark, sf_dir):
    ev = _events_batched(spark, sf_dir)
    st = _zone_states(spark, sf_dir)
    pruned = st.filter(F.col("zmax_cents") < _Z_THR_CENTS).select(
        "event_type", "batch", "n"
    )
    cents = F.round(F.col("value") * F.lit(100.0)).cast("long")
    act = (
        ev.filter(cents >= _Z_THR_CENTS)
        .join(
            pruned.select(
                "event_type", "batch", F.lit(1).alias("inp")
            ),
            ["event_type", "batch"],
            "left",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("actual_matches_total"),
            F.sum(F.coalesce("inp", F.lit(0)))
            .cast("long")
            .alias("actual_matches_in_pruned"),
        )
    )
    clm = pruned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pruned_states"),
        F.sum("n").cast("long").alias("claimed_skipped_rows"),
    )
    types = st.select("event_type").distinct()
    return (
        types.join(clm, "event_type", "left")
        .join(act, "event_type", "left")
        .select(
            "event_type",
            F.coalesce("n_pruned_states", F.lit(0))
            .cast("long")
            .alias("n_pruned_states"),
            F.coalesce("claimed_skipped_rows", F.lit(0))
            .cast("long")
            .alias("claimed_skipped_rows"),
            F.coalesce("actual_matches_total", F.lit(0))
            .cast("long")
            .alias("actual_matches_total"),
            F.coalesce("actual_matches_in_pruned", F.lit(0))
            .cast("long")
            .alias("actual_matches_in_pruned"),
        )
    )


_Z_ADJ_ORACLE = (
    _ZST_CTE
    + """, lagged AS (
  SELECT event_type, batch, zmin_cents, zmax_cents,
         lag(zmin_cents) OVER w AS pmin,
         lag(zmax_cents) OVER w AS pmax
  FROM zst
  WINDOW w AS (PARTITION BY event_type ORDER BY batch)
)
SELECT event_type,
       CAST(count(pmin) AS BIGINT) AS n_adjacent,
       CAST(sum(CASE WHEN least(zmax_cents, pmax) >=
                          greatest(zmin_cents, pmin)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_overlapping,
       CAST(sum(CASE WHEN pmin IS NULL THEN 0
                     ELSE greatest(CAST(0 AS BIGINT),
                          CAST(least(zmax_cents, pmax)
                               - greatest(zmin_cents, pmin) AS BIGINT))
                END) AS BIGINT) AS overlap_width_sum
FROM lagged GROUP BY event_type"""
)


@stage(
    "zone_time_adjacency_events",
    _Z_ADJ_ORACLE,
    "pruning economics: VALUE-ZONE OVERLAP BETWEEN SUCCESSIVE "
    "COMMITS per partition — round 12's zone_map_adjacency along the "
    "ledger's time axis. Commits whose value zones all overlap mean "
    "values are NOT drifting (good for stationarity, bad for "
    "value-predicate pruning across time); disjoint successive zones "
    "mean the value distribution moves with time and value "
    "predicates gain time-locality for free. The overlap widths are "
    "exact cents integers — least/greatest over committed zone "
    "bounds, no row data. Scale: a lag window over 5 rows per "
    "partition — metadata.",
)
def zone_time_adjacency_events(spark, sf_dir):
    st = _zone_states(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("batch")
    lagged = st.select(
        "event_type",
        "batch",
        "zmin_cents",
        "zmax_cents",
        F.lag("zmin_cents").over(w).alias("pmin"),
        F.lag("zmax_cents").over(w).alias("pmax"),
    )
    ov = F.least("zmax_cents", "pmax") >= F.greatest("zmin_cents", "pmin")
    width = F.when(F.col("pmin").isNull(), F.lit(0)).otherwise(
        F.greatest(
            F.lit(0).cast("long"),
            (
                F.least("zmax_cents", "pmax")
                - F.greatest("zmin_cents", "pmin")
            ).cast("long"),
        )
    )
    return lagged.groupBy("event_type").agg(
        F.count("pmin").alias("n_adjacent"),
        F.sum(F.when(ov, 1).otherwise(0))
        .cast("long")
        .alias("n_overlapping"),
        F.sum(width).cast("long").alias("overlap_width_sum"),
    )


_Z_COMPACT_ORACLE = (
    _ZST_CTE
    + f""", per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_states,
         CAST(sum(CASE WHEN zmax_cents < {_Z_THR_CENTS}
                       THEN 1 ELSE 0 END) AS BIGINT)
           AS n_prunable_states,
         CAST(sum(CASE WHEN zmax_cents < {_Z_THR_CENTS}
                       THEN n ELSE 0 END) AS BIGINT) AS rows_skipped,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(zmax_cents) AS BIGINT) AS merged_zmax
  FROM zst GROUP BY event_type
)
SELECT event_type, n_states, n_prunable_states, rows_skipped,
       CAST(CASE WHEN merged_zmax < {_Z_THR_CENTS} THEN 1 ELSE 0 END
            AS BIGINT) AS compacted_prunable,
       CAST(CASE WHEN merged_zmax < {_Z_THR_CENTS} THEN n_rows ELSE 0 END
            AS BIGINT) AS rows_skipped_compacted
FROM per"""
)


@stage(
    "zone_prune_compaction_tradeoff_events",
    _Z_COMPACT_ORACLE,
    "pruning economics: WHAT COMPACTION COSTS — per partition, rows "
    "skippable under value >= 400 with per-commit state rows vs "
    "after compacting all 5 commits into one merged state (zone "
    "merge = min of mins / max of maxes, the state.py rule). "
    "Compaction shrinks the ledger but WIDENS zones: a single hot "
    "commit poisons the merged zone and the other four commits lose "
    "their prunability. rows_skipped vs rows_skipped_compacted is "
    "the exact price, per partition — the ledger-retention knob "
    "(how many commits to keep un-compacted) should be turned by "
    "this number, not by storage cost alone. Scale: two metadata "
    "aggregations over the state table.",
)
def zone_prune_compaction_tradeoff_events(spark, sf_dir):
    st = _zone_states(spark, sf_dir)
    pr = F.col("zmax_cents") < _Z_THR_CENTS
    per = st.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_states"),
        F.sum(pr.cast("long")).alias("n_prunable_states"),
        F.sum(F.when(pr, F.col("n")).otherwise(0)).alias("rows_skipped"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("zmax_cents").alias("merged_zmax"),
    )
    cp = F.col("merged_zmax") < _Z_THR_CENTS
    return per.select(
        "event_type",
        "n_states",
        "n_prunable_states",
        "rows_skipped",
        cp.cast("long").alias("compacted_prunable"),
        F.when(cp, F.col("n_rows")).otherwise(0)
        .cast("long")
        .alias("rows_skipped_compacted"),
    )


# =====================================================================
# C. Joint curriculum x mix allocation over the (epoch, source) grid
# =====================================================================

_JSLOTS = 1000  # sample slots per epoch (the r13 Hamilton convention)
_MIX_EPS = 1e-6  # the psi_bins_lineitem epsilon convention

# the planning grid: token/doc/quality ledger per (difficulty epoch,
# source) — scored docs joined to the bucket->epoch map, one grouped
# scan; <= n_epochs x n_sources metadata rows ever after
_GRID_CTE = (
    _EMAP_CTE
    + f""", grid AS (
  SELECT e.epoch, s.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(s.ntok) AS BIGINT) AS tokens,
         CAST(sum(CASE WHEN s.ntok >= {_QUALITY_FLOOR}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
  FROM scored s JOIN emap e ON e.bucket = s.bucket
  GROUP BY 1, 2
)"""
)


def _epoch_source_grid(spark, sf_dir):
    """The Spark mirror of _GRID_CTE's ``grid``: the bucket->epoch map
    is <= 7 rows (broadcast), so the grid costs the scored scan plus
    one grouped aggregation."""
    scored = _scored_docs(spark, sf_dir)
    emap = _epoch_map(spark, sf_dir).select("bucket", "epoch")
    ok = F.col("ntok") >= _QUALITY_FLOOR
    return (
        scored.join(F.broadcast(emap), "bucket")
        .groupBy("epoch", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("tokens"),
            F.sum(ok.cast("long")).alias("n_ok"),
        )
    )


_J_GRID_ORACLE = (
    _GRID_CTE
    + """
SELECT epoch, source, n_docs, tokens,
       CAST(sum(tokens) OVER (PARTITION BY epoch) AS BIGINT)
         AS epoch_tokens,
       round(CAST(tokens AS DOUBLE)
             / CAST(sum(tokens) OVER (PARTITION BY epoch) AS BIGINT), 9)
         AS token_share
FROM grid"""
)


@stage(
    "joint_epoch_source_grid_documents",
    _J_GRID_ORACLE,
    "joint curriculum x mix: the PLANNING GRID itself — tokens, docs "
    "and in-epoch token share per (difficulty epoch, source). The "
    "curriculum decides WHEN a document is read (r14's token-balanced "
    "epoch map over fixed-edge difficulty buckets); the mix planner "
    "decides HOW MUCH of each source is read (r13's allocation "
    "family); every joint decision below is arithmetic over this "
    "grid, which is <= n_epochs x n_sources rows off one grouped "
    "scan — the two planners compose in metadata space, never by "
    "re-scanning the corpus. Scale: the epoch map rides a 7-row "
    "broadcast; in-epoch totals are per-epoch windows over grid "
    "rows.",
)
def joint_epoch_source_grid_documents(spark, sf_dir):
    grid = _epoch_source_grid(spark, sf_dir)
    we = Window.partitionBy("epoch")
    etok = F.sum("tokens").over(we).cast("long")
    return grid.select(
        "epoch",
        "source",
        "n_docs",
        "tokens",
        etok.alias("epoch_tokens"),
        F.round(F.col("tokens").cast("double") / etok, 9).alias(
            "token_share"
        ),
    )


# the per-epoch Hamilton slot chain as reusable CTEs (n_docs threaded
# through for the r16 sampler-execution cohort's fill audits); the
# ``cells`` CTE is the chain's product: one row per (epoch, source)
# with its final integer slot count
_SLOT_CTES = (
    _GRID_CTE
    + f""", based AS (
  SELECT epoch, source, n_docs, tokens,
         CAST(sum(tokens) OVER (PARTITION BY epoch) AS BIGINT) AS etok
  FROM grid
), slotted AS (
  SELECT epoch, source, n_docs, tokens, etok,
         CAST(({_JSLOTS} * tokens) // etok AS BIGINT) AS base_slots,
         CAST(({_JSLOTS} * tokens) % etok AS BIGINT) AS rem
  FROM based
), extras AS (
  SELECT *,
         CAST({_JSLOTS} - sum(base_slots)
              OVER (PARTITION BY epoch) AS BIGINT) AS n_extra,
         row_number() OVER (PARTITION BY epoch
                            ORDER BY rem DESC, source) AS rn
  FROM slotted
), cells AS (
  SELECT epoch, source, n_docs, tokens, etok, base_slots,
         CAST(CASE WHEN rn <= n_extra THEN 1 ELSE 0 END AS BIGINT)
           AS extra,
         CAST(base_slots + CASE WHEN rn <= n_extra THEN 1 ELSE 0 END
              AS BIGINT) AS slots
  FROM extras
)"""
)

_J_SLOTS_ORACLE = (
    _SLOT_CTES
    + """
SELECT epoch, source, tokens, base_slots, extra, slots FROM cells"""
)


@stage(
    "joint_slots_by_epoch_documents",
    _J_SLOTS_ORACLE,
    "joint curriculum x mix: LARGEST-REMAINDER (Hamilton) rounding of "
    "exactly 1000 sample slots PER EPOCH across sources — the r13 "
    "corpus-level rounding pushed down one level, because the "
    "stratified sampler runs once per epoch and needs integer slots "
    "that sum to the epoch's budget exactly (the in-repo test "
    "asserts 1000 per epoch). Base = floored share of the EPOCH's "
    "tokens; the slots lost to flooring go one each to the largest "
    "in-epoch remainders ((rem DESC, source ASC) — fully "
    "deterministic). Scale: per-epoch windows over grid rows — "
    "metadata; integer division and modulo keep every column "
    "exact.",
)
def joint_slots_by_epoch_documents(spark, sf_dir):
    return _cell_slots(spark, sf_dir).select(
        "epoch", "source", "tokens", "base_slots", "extra", "slots"
    )


def _cell_slots(spark, sf_dir):
    """The Spark mirror of _SLOT_CTES' ``cells``: one row per
    (epoch, source) with the final per-epoch Hamilton slot count
    (n_docs threaded through for the r16 sampler-execution fill
    audits)."""
    grid = _epoch_source_grid(spark, sf_dir)
    we = Window.partitionBy("epoch")
    based = grid.select(
        "epoch",
        "source",
        "n_docs",
        "tokens",
        F.sum("tokens").over(we).cast("long").alias("etok"),
    )
    slotted = based.select(
        "epoch",
        "source",
        "n_docs",
        "tokens",
        "etok",
        F.expr(f"{_JSLOTS} * tokens div etok").alias("base_slots"),
        (F.lit(_JSLOTS) * F.col("tokens") % F.col("etok")).alias("rem"),
    )
    wr = Window.partitionBy("epoch").orderBy(F.desc("rem"), "source")
    extras = slotted.select(
        "epoch",
        "source",
        "n_docs",
        "tokens",
        "etok",
        "base_slots",
        (F.lit(_JSLOTS) - F.sum("base_slots").over(we))
        .cast("long")
        .alias("n_extra"),
        F.row_number().over(wr).alias("rn"),
    )
    got = (F.col("rn") <= F.col("n_extra")).cast("long")
    return extras.select(
        "epoch",
        "source",
        "n_docs",
        "tokens",
        "etok",
        "base_slots",
        got.alias("extra"),
        (F.col("base_slots") + got).alias("slots"),
    )


_J_CAPS_ORACLE = (
    _GRID_CTE
    + """, based AS (
  SELECT epoch, source, n_docs, tokens, n_ok,
         CAST(sum(tokens) OVER (PARTITION BY epoch) AS BIGINT) AS etok,
         CAST(count(*) OVER (PARTITION BY epoch) AS BIGINT) AS n_src
  FROM grid
), capped AS (
  SELECT *,
         CAST(etok // (2 * n_src) AS BIGINT) AS cap_tokens,
         CAST(least(tokens, etok // (2 * n_src)) AS BIGINT)
           AS capped_alloc,
         row_number() OVER (PARTITION BY epoch
                            ORDER BY CAST(n_ok AS DOUBLE) / n_docs DESC,
                            source) AS rank
  FROM based
), head AS (
  SELECT *,
         CAST(etok - sum(capped_alloc) OVER (PARTITION BY epoch)
              AS BIGINT) AS leftover,
         CAST(tokens - capped_alloc AS BIGINT) AS headroom,
         CAST(coalesce(sum(tokens - capped_alloc)
                OVER (PARTITION BY epoch ORDER BY rank
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS head_before
  FROM capped
)
SELECT epoch, source, tokens, cap_tokens, capped_alloc,
       CAST(capped_alloc
            + greatest(CAST(0 AS BIGINT),
                       least(headroom, leftover - head_before))
            AS BIGINT) AS final_alloc,
       CAST(CASE WHEN tokens > cap_tokens THEN 1 ELSE 0 END AS BIGINT)
         AS was_capped
FROM head"""
)


@stage(
    "joint_caps_redistribution_documents",
    _J_CAPS_ORACLE,
    "joint curriculum x mix: PER-EPOCH ANTI-DOMINANCE CAPS with "
    "greedy redistribution — within each epoch every source is "
    "capped at epoch_tokens div (2 * n_sources_in_epoch) (the r13 "
    "relative-cap policy, now epoch-scoped: a source can dominate "
    "ONE difficulty band even when globally balanced), and the "
    "tokens the cap frees are redistributed in quality-rank order "
    "((n_ok/n_docs DESC, source), the r13 greedy convention) into "
    "each source's remaining headroom: add = clamp(leftover - "
    "headroom_before, 0, headroom). Every allocation column is "
    "exact integer arithmetic — floors, mins, cumulative headroom — "
    "so the per-epoch plan replays identically on any engine. "
    "Scale: per-epoch windows over grid rows.",
)
def joint_caps_redistribution_documents(spark, sf_dir):
    grid = _epoch_source_grid(spark, sf_dir)
    we = Window.partitionBy("epoch")
    based = grid.select(
        "epoch",
        "source",
        "n_docs",
        "tokens",
        "n_ok",
        F.sum("tokens").over(we).cast("long").alias("etok"),
        F.count(F.lit(1)).over(we).cast("long").alias("n_src"),
    )
    cap = F.expr("etok div (2 * n_src)")
    quality = F.col("n_ok").cast("double") / F.col("n_docs")
    wr = Window.partitionBy("epoch").orderBy(F.desc(quality), "source")
    capped = based.select(
        "epoch",
        "source",
        "tokens",
        "etok",
        cap.cast("long").alias("cap_tokens"),
        F.least(F.col("tokens"), cap).cast("long").alias("capped_alloc"),
        F.row_number().over(wr).alias("rank"),
    )
    wc = Window.partitionBy("epoch").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, -1
    )
    head = capped.select(
        "epoch",
        "source",
        "tokens",
        "cap_tokens",
        "capped_alloc",
        (F.col("etok") - F.sum("capped_alloc").over(we))
        .cast("long")
        .alias("leftover"),
        (F.col("tokens") - F.col("capped_alloc"))
        .cast("long")
        .alias("headroom"),
        F.coalesce(
            F.sum(F.col("tokens") - F.col("capped_alloc")).over(wc),
            F.lit(0),
        )
        .cast("long")
        .alias("head_before"),
    )
    add = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("headroom"), F.col("leftover") - F.col("head_before")),
    )
    return head.select(
        "epoch",
        "source",
        "tokens",
        "cap_tokens",
        "capped_alloc",
        (F.col("capped_alloc") + add).cast("long").alias("final_alloc"),
        (F.col("tokens") > F.col("cap_tokens"))
        .cast("long")
        .alias("was_capped"),
    )


_J_DRIFT_ORACLE = (
    _GRID_CTE
    + f""", shares AS (
  SELECT epoch, source, tokens,
         CAST(sum(tokens) OVER (PARTITION BY epoch) AS BIGINT) AS etok,
         CAST(sum(tokens) OVER (PARTITION BY source) AS BIGINT) AS stok,
         CAST(sum(tokens) OVER () AS BIGINT) AS t
  FROM grid
)
SELECT epoch, source, tokens,
       round((CAST(tokens AS DOUBLE) / etok
              - CAST(stok AS DOUBLE) / t)
             * ln((CAST(tokens AS DOUBLE) / etok + {_MIX_EPS})
                  / (CAST(stok AS DOUBLE) / t + {_MIX_EPS})), 6)
         AS psi_term
FROM shares"""
)


@stage(
    "joint_mix_drift_by_epoch_documents",
    _J_DRIFT_ORACLE,
    "joint curriculum x mix: the INTERACTION CHECK — per-(epoch, "
    "source) PSI terms of the in-epoch source mix against the "
    "corpus-wide mix (the psi convention: eps 1e-6, 6dp per-term "
    "rows, terms emitted per cell so the transcendental ln never "
    "accumulates before rounding). A curriculum that orders by "
    "difficulty implicitly REORDERS SOURCES whenever difficulty "
    "correlates with source (boilerplate-heavy crawls score easy), "
    "so late training can see a different world than the mix "
    "planner promised — summed terms per epoch against the 0.2 "
    "alarm quantify exactly that skew, per offending source. "
    "Scale: three window sums over grid rows.",
)
def joint_mix_drift_by_epoch_documents(spark, sf_dir):
    grid = _epoch_source_grid(spark, sf_dir)
    etok = F.sum("tokens").over(Window.partitionBy("epoch")).cast("long")
    stok = F.sum("tokens").over(Window.partitionBy("source")).cast("long")
    t = F.sum("tokens").over(Window.partitionBy()).cast("long")
    q = F.col("tokens").cast("double") / etok
    p = stok.cast("double") / t
    return grid.select(
        "epoch",
        "source",
        "tokens",
        F.round(
            (q - p) * F.log((q + F.lit(_MIX_EPS)) / (p + F.lit(_MIX_EPS))),
            6,
        ).alias("psi_term"),
    )


_J_ILEAVE_ORACLE = (
    _EMAP_CTE
    + f""", keyed AS (
  SELECT e.epoch, s.source, s.doc_id,
         CAST(((s.doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD} AS BIGINT)
           AS ikey
  FROM scored s JOIN emap e ON e.bucket = s.bucket
), ranked AS (
  SELECT epoch, source, doc_id, ikey,
         row_number() OVER (PARTITION BY epoch, source
                            ORDER BY ikey, doc_id) AS pos
  FROM keyed
)
SELECT epoch, source, CAST(pos AS BIGINT) AS position, doc_id, ikey
FROM ranked WHERE pos <= 3"""
)


@stage(
    "joint_interleave_heads_documents",
    _J_ILEAVE_ORACLE,
    "joint curriculum x mix: the first 3 interleave positions per "
    "(epoch, source) cell under the masked multiplicative-hash key "
    "(((doc_id mod 2^31) * 2654435761) mod 2^32, the r14 ordering "
    "convention) — the deterministic 'what does the reader stream "
    "FIRST from each cell' probe a data-order audit replays "
    "bit-for-bit. Per-cell heads matter because the joint plan "
    "hands each (epoch, source) quota to a separate reader: its "
    "first batches set the tone of resumed training, and a seeded "
    "permutation makes them reproducible across engines and runs. "
    "Scale: the key is map-side; the window is per-cell top-3 "
    "(partitioned, never global).",
)
def joint_interleave_heads_documents(spark, sf_dir):
    scored = _scored_docs(spark, sf_dir)
    emap = _epoch_map(spark, sf_dir).select("bucket", "epoch")
    keyed = scored.join(F.broadcast(emap), "bucket").select(
        "epoch",
        "source",
        "doc_id",
        F.expr(f"((doc_id % {_IMASK}) * {_KNUTH}) % {_IMOD}")
        .cast("long")
        .alias("ikey"),
    )
    w = Window.partitionBy("epoch", "source").orderBy("ikey", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 3)
        .select(
            "epoch",
            "source",
            F.col("pos").cast("long").alias("position"),
            "doc_id",
            "ikey",
        )
    )


_J_DOM_ORACLE = (
    _GRID_CTE
    + """, based AS (
  SELECT epoch, source, tokens,
         CAST(sum(tokens) OVER (PARTITION BY epoch) AS BIGINT) AS etok,
         CAST(count(*) OVER (PARTITION BY epoch) AS BIGINT) AS n_src
  FROM grid
), capped AS (
  SELECT *,
         CAST(least(tokens, etok // (2 * n_src)) AS BIGINT)
           AS capped_alloc,
         CAST(CASE WHEN tokens > etok // (2 * n_src) THEN 1 ELSE 0 END
              AS BIGINT) AS hit
  FROM based
)
SELECT epoch,
       CAST(max(n_src) AS BIGINT) AS n_sources,
       round(CAST(max(tokens) AS DOUBLE) / max(etok), 9)
         AS top_share_raw,
       round(CAST(max(capped_alloc) AS DOUBLE)
             / CAST(sum(capped_alloc) AS BIGINT), 9)
         AS top_share_capped,
       CAST(sum(hit) AS BIGINT) AS n_capped
FROM capped GROUP BY epoch"""
)


@stage(
    "joint_dominance_audit_documents",
    _J_DOM_ORACLE,
    "joint curriculum x mix: the per-epoch DOMINANCE AUDIT — the top "
    "source's token share before vs after the epoch-scoped "
    "anti-dominance cap, and how many sources hit the cap. The raw "
    "share answers 'is any difficulty band owned by one source?' "
    "(the failure mode the joint plan exists to prevent: an easy "
    "epoch that is 80% one crawl teaches its boilerplate as "
    "foundational); the capped share is the guarantee the cap "
    "actually delivers; n_capped says how binding the policy is. "
    "Scale: per-epoch windows + a 4-row grouped aggregate over grid "
    "rows.",
)
def joint_dominance_audit_documents(spark, sf_dir):
    grid = _epoch_source_grid(spark, sf_dir)
    we = Window.partitionBy("epoch")
    based = grid.select(
        "epoch",
        "source",
        "tokens",
        F.sum("tokens").over(we).cast("long").alias("etok"),
        F.count(F.lit(1)).over(we).cast("long").alias("n_src"),
    )
    cap = F.expr("etok div (2 * n_src)")
    capped = based.select(
        "epoch",
        "tokens",
        "etok",
        "n_src",
        F.least(F.col("tokens"), cap).cast("long").alias("capped_alloc"),
        (F.col("tokens") > cap).cast("long").alias("hit"),
    )
    return capped.groupBy("epoch").agg(
        F.max("n_src").cast("long").alias("n_sources"),
        F.round(
            F.max("tokens").cast("double") / F.max("etok"), 9
        ).alias("top_share_raw"),
        F.round(
            F.max("capped_alloc").cast("double")
            / F.sum("capped_alloc").cast("long"),
            9,
        ).alias("top_share_capped"),
        F.sum("hit").cast("long").alias("n_capped"),
    )


_J_ROUND_ORACLE = (
    _GRID_CTE
    + f""", based AS (
  SELECT epoch, source, tokens,
         CAST(sum(tokens) OVER (PARTITION BY epoch) AS BIGINT) AS etok
  FROM grid
), slotted AS (
  SELECT epoch, source,
         CAST(({_JSLOTS} * tokens) // etok AS BIGINT) AS base_slots,
         CAST(({_JSLOTS} * tokens) % etok AS BIGINT) AS rem
  FROM based
), extras AS (
  SELECT *,
         CAST({_JSLOTS} - sum(base_slots)
              OVER (PARTITION BY epoch) AS BIGINT) AS n_extra,
         row_number() OVER (PARTITION BY epoch
                            ORDER BY rem DESC, source) AS rn
  FROM slotted
), per_epoch AS (
  SELECT source,
         CAST(sum(base_slots + CASE WHEN rn <= n_extra THEN 1 ELSE 0 END)
              AS BIGINT) AS epoch_slots_total
  FROM extras GROUP BY source
), stot AS (
  SELECT source, CAST(sum(tokens) AS BIGINT) AS stok,
         CAST(sum(sum(tokens)) OVER () AS BIGINT) AS t
  FROM grid GROUP BY source
), cbase AS (
  SELECT source, stok, t,
         CAST(({_JSLOTS} * stok) // t AS BIGINT) AS base_slots,
         CAST(({_JSLOTS} * stok) % t AS BIGINT) AS rem
  FROM stot
), cext AS (
  SELECT *,
         CAST({_JSLOTS} - sum(base_slots) OVER () AS BIGINT) AS n_extra,
         row_number() OVER (ORDER BY rem DESC, source) AS rn
  FROM cbase
), corpus AS (
  SELECT source,
         CAST(base_slots + CASE WHEN rn <= n_extra THEN 1 ELSE 0 END
              AS BIGINT) AS corpus_slots
  FROM cext
)
SELECT p.source, p.epoch_slots_total,
       CAST({_N_EPOCHS} * c.corpus_slots AS BIGINT) AS corpus_slots_x4,
       CAST(p.epoch_slots_total - {_N_EPOCHS} * c.corpus_slots AS BIGINT)
         AS slot_drift
FROM per_epoch p JOIN corpus c ON c.source = p.source"""
)


@stage(
    "joint_rounding_drift_documents",
    _J_ROUND_ORACLE,
    "joint curriculum x mix: the TWO-LEVEL ROUNDING INTERACTION — "
    "each source's Hamilton slots summed across the 4 per-epoch "
    "allocations vs 4x its corpus-level Hamilton allocation. The "
    "two are NOT equal in general (rounding does not commute with "
    "partitioning — the apportionment-paradox family), and the "
    "drift is the exact number of slots a source gains or loses "
    "when the sampler is run per-epoch instead of once globally: a "
    "planner promising corpus-level shares must budget this "
    "correction or accept it knowingly. Every column is exact "
    "integer arithmetic; both allocations are fully deterministic. "
    "Scale: two window stacks over grid rows (metadata).",
)
def joint_rounding_drift_documents(spark, sf_dir):
    grid = _epoch_source_grid(spark, sf_dir)
    we = Window.partitionBy("epoch")
    based = grid.select(
        "epoch",
        "source",
        "tokens",
        F.sum("tokens").over(we).cast("long").alias("etok"),
    )
    slotted = based.select(
        "epoch",
        "source",
        F.expr(f"{_JSLOTS} * tokens div etok").alias("base_slots"),
        (F.lit(_JSLOTS) * F.col("tokens") % F.col("etok")).alias("rem"),
    )
    wr = Window.partitionBy("epoch").orderBy(F.desc("rem"), "source")
    extras = slotted.select(
        "source",
        "base_slots",
        (F.lit(_JSLOTS) - F.sum("base_slots").over(we))
        .cast("long")
        .alias("n_extra"),
        F.row_number().over(wr).alias("rn"),
    )
    per_epoch = extras.groupBy("source").agg(
        F.sum(
            F.col("base_slots")
            + (F.col("rn") <= F.col("n_extra")).cast("long")
        )
        .cast("long")
        .alias("epoch_slots_total")
    )
    stot = grid.groupBy("source").agg(
        F.sum("tokens").cast("long").alias("stok")
    )
    t = F.sum("stok").over(Window.partitionBy()).cast("long")
    # the corpus-level Hamilton stack mirrors the oracle's cbase/cext
    cbase = stot.select(
        "source",
        "stok",
        t.alias("t"),
    ).select(
        "source",
        "stok",
        "t",
        F.expr(f"{_JSLOTS} * stok div t").alias("base_slots"),
        (F.lit(_JSLOTS) * F.col("stok") % F.col("t")).alias("rem"),
    )
    wg = Window.partitionBy()
    wrn = Window.orderBy(F.desc("rem"), "source")
    cext = cbase.select(
        "source",
        "base_slots",
        (F.lit(_JSLOTS) - F.sum("base_slots").over(wg))
        .cast("long")
        .alias("n_extra"),
        F.row_number().over(wrn).alias("rn"),
    )
    corpus = cext.select(
        "source",
        (
            F.col("base_slots")
            + (F.col("rn") <= F.col("n_extra")).cast("long")
        ).alias("corpus_slots"),
    )
    return per_epoch.join(corpus, "source").select(
        "source",
        "epoch_slots_total",
        (F.lit(_N_EPOCHS) * F.col("corpus_slots"))
        .cast("long")
        .alias("corpus_slots_x4"),
        (
            F.col("epoch_slots_total")
            - F.lit(_N_EPOCHS) * F.col("corpus_slots")
        )
        .cast("long")
        .alias("slot_drift"),
    )


# ---------------------------------------------------------------------
# Round-15 promotion hook (second pass; see queries_more's re-entrancy
# note): this module bootstraps the catalog chain BEFORE defining
# STAGED_R15, so importing THIS module first runs the whole
# registration chain while STAGED_R15 is still empty. Re-invoking the
# skip-if-registered promotion here — after all twenty entries exist —
# makes the catalog complete under either import order (the
# queries_staging_r8..r14 pattern, verbatim).
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r15 as _promote  # noqa: E402

_promote()
del _promote
