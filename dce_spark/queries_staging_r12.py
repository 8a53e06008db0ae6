"""ROUND-12 STAGED catalog queries — seeded in round 10 (the staging
pipeline stays a FULL round ahead: the round-11 cohort is already
staged and verified, so these compose the NEW round-11 surfaces — the
mergeable-state ledger, the IVF drift monitors, the SCD2 snapshot
machinery, the governance profiles — one derivative step further),
NOT registered (same freeze protocol as queries_staging_r5..r11).
Round 12 promotes them; the round-11 session may extend or re-verify.

Cohort map (every query oracle-verified at sf0.001 + sf0.01 + sf0.1
before commit):

mergeable-state derivatives —
- ``validation_state_regression_orders`` — the cross-RUN diff the
  incremental ledger exists to produce: prior-snapshot violation
  rates vs merged-snapshot rates per partition, with drift flags.
- ``histogram_merge_invariance_lineitem`` — the merge-tree invariance
  PROOF as a query: the same histogram merged two different ways
  (by-flag vs by-month) must agree bucket-for-bucket.
- ``quantile_state_drift_lineitem`` — per-flag quantile read-offs
  from the same states the merged read-off uses: which partitions
  drag the tail.
- ``moments_running_merge_events`` — the incremental profile LEDGER:
  daily moment states prefix-merged into running mean/variance.
- ``zone_map_adjacency_lineitem`` — zone-map quality: does each
  partition's ship-date zone overlap its successor's (overlap =
  clustering rot; pruning stops working).

embedding-drift derivatives —
- ``ivf_reassignment_churn_embeddings`` — the REBUILD cost matrix:
  transition counts between build-time cells and retrained cells.
- ``cell_label_purity_embeddings`` — per-cell majority-label purity
  per half: semantic drift inside cells.
- ``coord_drift_sweep_embeddings`` — the per-dimension fixed-edge KS
  sweep (dims 0..3), the production fan-out of the round-11 single-
  coordinate monitor.
- ``residual_quantile_drift_embeddings`` — histogram-state quantile
  read-offs of the residual distribution per half (p50/p90 shifting
  right = recall decay).
- ``label_share_drift_embeddings`` — class-prior shift between
  halves (per-label PSI terms).

warehouse derivatives + governance — documented per query below.

tests/test_staging_r12.py runs these through the SAME compare harness
as the live catalog at the suite's SF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table, local_result

STAGED_R12: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R12[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R12[name].oracle


# =====================================================================
# A. Mergeable-state derivatives
# =====================================================================

_REGRESSION_ORACLE = """WITH state AS (
  SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT)
           AS part_epoch,
         CAST(o_orderkey % 2 AS BIGINT) AS run,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM orders GROUP BY 1, 2
), pivoted AS (
  SELECT part_epoch,
         CAST(sum(CASE WHEN run = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN run = 0 THEN v ELSE 0 END) AS BIGINT) AS v0,
         CAST(sum(CASE WHEN run = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN run = 1 THEN v ELSE 0 END) AS BIGINT) AS v1
  FROM state GROUP BY 1
)
SELECT part_epoch, n0, n1,
       round(CAST(v0 AS DOUBLE) / n0, 6) AS rate_prev,
       round(CAST(v0 + v1 AS DOUBLE) / (n0 + n1), 6) AS rate_new,
       CAST(CASE WHEN abs(round(CAST(v0 + v1 AS DOUBLE) / (n0 + n1), 6)
                        - round(CAST(v0 AS DOUBLE) / n0, 6)) > 0.01
                 THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
FROM pivoted WHERE n0 > 0 AND n1 > 0"""


@stage(
    "validation_state_regression_orders",
    _REGRESSION_ORACLE,
    "cross-run validation regression — the report the round-11 "
    "incremental ledger exists to produce: per partition, the "
    "violation rate of the PRIOR snapshot (run 0, an orderkey-parity "
    "stand-in for yesterday's committed state) vs the rate after "
    "merging the delta (run 1), flagging partitions whose rate moved "
    "more than a point. Because both rates derive from the same "
    "mergeable count states, yesterday's numbers never need "
    "recomputation — the diff costs one pass over TODAY's delta plus "
    "a metadata merge. Rates are exact-int ratios rounded 6dp before "
    "the flag comparison, so the flag is deterministic cross-engine.",
)
def validation_state_regression_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    state = o.groupBy(
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "part_epoch"
        ),
        F.pmod(F.col("o_orderkey"), F.lit(2)).cast("long").alias("run"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F")).cast("long")
        ).alias("v"),
    )
    rn = lambda r, c: F.sum(  # noqa: E731
        F.when(F.col("run") == r, F.col(c)).otherwise(F.lit(0))
    ).cast("long")
    piv = state.groupBy("part_epoch").agg(
        rn(0, "n").alias("n0"),
        rn(0, "v").alias("v0"),
        rn(1, "n").alias("n1"),
        rn(1, "v").alias("v1"),
    )
    rate_prev = F.round(F.col("v0").cast("double") / F.col("n0"), 6)
    rate_new = F.round(
        (F.col("v0") + F.col("v1")).cast("double")
        / (F.col("n0") + F.col("n1")),
        6,
    )
    return (
        piv.filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "part_epoch",
            "n0",
            "n1",
            rate_prev.alias("rate_prev"),
            rate_new.alias("rate_new"),
            F.when(
                F.abs(rate_new - rate_prev) > F.lit(0.01), 1
            )
            .otherwise(0)
            .cast("long")
            .alias("drift_flag"),
        )
    )


# shared fixed price edges — same boundaries as the round-11
# histogram-quantile state (re-declared: staging modules stay
# standalone so a promotion never couples cohorts)
_PRICE_EDGES = [2000.0, 5000.0, 10000.0, 20000.0, 40000.0, 60000.0,
                80000.0, 100000.0]

_PRICE_BUCKET_SQL = " + ".join(
    f"CAST((l_extendedprice >= {e}) AS INT)" for e in _PRICE_EDGES
)


def _price_bucket_col():
    bucket = None
    for e in _PRICE_EDGES:
        t = (F.col("l_extendedprice") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    return bucket


_MERGE_INVARIANCE_ORACLE = f"""WITH b AS (
  SELECT l_returnflag,
         CAST(floor(epoch(date_trunc('month', l_shipdate))) AS BIGINT)
           AS part_epoch,
         {_PRICE_BUCKET_SQL} AS bucket
  FROM lineitem
), via_flags AS (
  SELECT bucket, CAST(sum(n) AS BIGINT) AS n FROM (
    SELECT bucket, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY l_returnflag, bucket
  ) GROUP BY bucket
), via_months AS (
  SELECT bucket, CAST(sum(n) AS BIGINT) AS n FROM (
    SELECT bucket, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY part_epoch, bucket
  ) GROUP BY bucket
)
SELECT CAST(f.bucket AS BIGINT) AS bucket,
       f.n AS n_via_flags, m.n AS n_via_months,
       CAST(CASE WHEN f.n = m.n THEN 1 ELSE 0 END AS BIGINT) AS equal
FROM via_flags f JOIN via_months m ON m.bucket = f.bucket"""


@stage(
    "histogram_merge_invariance_lineitem",
    _MERGE_INVARIANCE_ORACLE,
    "merge-tree invariance, proven as a query: the SAME fixed-edge "
    "price histogram assembled along two different partitionings — "
    "per-returnflag states merged, and per-ship-month states merged — "
    "must agree bucket-for-bucket (equal = 1 on every row). This is "
    "the property audit for the round-11 mergeable-state ledger: a "
    "state store whose merge depends on grouping or order is corrupt, "
    "and this query is the cheap end-to-end tripwire (two key-bounded "
    "aggregation trees over one scan, joined on ~9 bucket rows). At "
    "100 TB the two trees are yesterday's by-partition states and "
    "today's by-shard states — the check costs metadata.",
)
def histogram_merge_invariance_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        F.unix_timestamp(F.date_trunc("month", F.col("l_shipdate"))).alias(
            "part_epoch"
        ),
        _price_bucket_col().alias("bucket"),
    )
    via_flags = (
        b.groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("bucket")
        .agg(F.sum("n").cast("long").alias("n_via_flags"))
    )
    via_months = (
        b.groupBy("part_epoch", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("bucket")
        .agg(F.sum("n").cast("long").alias("n_via_months"))
    )
    return via_flags.join(via_months, "bucket").select(
        F.col("bucket").cast("long").alias("bucket"),
        "n_via_flags",
        "n_via_months",
        F.when(F.col("n_via_flags") == F.col("n_via_months"), 1)
        .otherwise(0)
        .cast("long")
        .alias("equal"),
    )


_QSTATE_DRIFT_ORACLE = f"""WITH b AS (
  SELECT l_returnflag AS flag, {_PRICE_BUCKET_SQL} AS bucket FROM lineitem
), state AS (
  SELECT flag, bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2
), cum AS (
  SELECT flag, bucket,
         CAST(sum(n) OVER (PARTITION BY flag ORDER BY bucket) AS BIGINT)
           AS cum
  FROM state
), tot AS (
  SELECT flag, CAST(sum(n) AS BIGINT) AS nt FROM state GROUP BY 1
), qs AS (
  SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q
)
SELECT c.flag, s.q, CAST(min(c.bucket) AS BIGINT) AS bucket
FROM qs s, cum c JOIN tot t ON t.flag = c.flag
WHERE c.cum >= ceil(s.q * t.nt)
GROUP BY c.flag, s.q"""


@stage(
    "quantile_state_drift_lineitem",
    _QSTATE_DRIFT_ORACLE,
    "per-partition quantile read-offs from the SAME per-flag "
    "histogram states the round-11 merged read-off consumes: "
    "p50/p90/p99 buckets per returnflag — which partitions drag the "
    "merged tail (a flag whose p99 bucket sits above the others' is "
    "where the expensive rows live). Zero extra passes over the data: "
    "the states already exist for the merged quantile; this is pure "
    "metadata arithmetic on them (per-flag cumulative window over 9 "
    "buckets, ceil(q*N) threshold — all exact integers).",
)
def quantile_state_drift_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    state = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            _price_bucket_col().alias("bucket"),
        )
        .groupBy("flag", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    w = Window.partitionBy("flag").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = state.select(
        "flag", "bucket", F.sum("n").over(w).cast("long").alias("cum")
    )
    tot = state.groupBy("flag").agg(F.sum("n").cast("long").alias("nt"))
    qs = F.array(*[F.lit(q).cast("double") for q in (0.5, 0.9, 0.99)])
    return (
        cum.join(tot, "flag")
        .select("flag", "bucket", "cum", "nt", F.explode(qs).alias("q"))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("nt")))
        .groupBy("flag", "q")
        .agg(F.min("bucket").cast("long").alias("bucket"))
    )


_RUNNING_MERGE_ORACLE = """WITH state AS (
  SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT))
              AS BIGINT) AS s1,
         CAST(sum(CAST(round(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                             * 10000.0) AS BIGINT)) AS BIGINT) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY 1
), cum AS (
  SELECT day_epoch,
         CAST(sum(n) OVER w AS BIGINT) AS cn,
         CAST(sum(s1) OVER w AS BIGINT) AS cs1,
         CAST(sum(s2) OVER w AS BIGINT) AS cs2
  FROM state
  WINDOW w AS (ORDER BY day_epoch ROWS UNBOUNDED PRECEDING)
)
SELECT day_epoch, cn AS cum_n,
       round(CAST(cs1 AS DOUBLE) / 100.0 / cn, 6) AS cum_mean,
       round(CAST(cs2 AS DOUBLE) / 10000.0 / cn
             - (CAST(cs1 AS DOUBLE) / 100.0 / cn)
             * (CAST(cs1 AS DOUBLE) / 100.0 / cn), 6) AS cum_var
FROM cum"""


@stage(
    "moments_running_merge_events",
    _RUNNING_MERGE_ORACLE,
    "the incremental profile LEDGER as a time series: daily quantized "
    "moment states (the round-11 mergeable (n, Σx, Σx²) convention) "
    "prefix-merged into the running mean/variance after each day's "
    "close — exactly what an incremental validation pipeline publishes "
    "nightly without ever re-reading history. The prefix merge is a "
    "running sum over the ~days-row STATE table (metadata at any "
    "corpus scale; the window never touches raw rows), and because "
    "the states are exact int64, day N's ledger row is bit-identical "
    "to a from-scratch recompute over days 1..N.",
)
def moments_running_merge_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    v = F.col("value").cast("double")
    state = ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_epoch")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(v * F.lit(100.0)).cast("long")).alias("s1"),
        F.sum(F.round(v * v * F.lit(10000.0)).cast("long")).alias("s2"),
    )
    w = Window.orderBy("day_epoch").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = state.select(
        "day_epoch",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("s1").over(w).cast("long").alias("cs1"),
        F.sum("s2").over(w).cast("long").alias("cs2"),
    )
    mean = F.col("cs1").cast("double") / F.lit(100.0) / F.col("cn")
    return cum.select(
        "day_epoch",
        F.col("cn").alias("cum_n"),
        F.round(mean, 6).alias("cum_mean"),
        F.round(
            F.col("cs2").cast("double") / F.lit(10000.0) / F.col("cn")
            - mean * mean,
            6,
        ).alias("cum_var"),
    )


_ZONE_ADJ_ORACLE = """WITH zones AS (
  SELECT CAST(floor(epoch(date_trunc('month', l_shipdate))) AS BIGINT)
           AS part_epoch,
         CAST(min(floor(epoch(l_shipdate))) AS BIGINT) AS zmin_s,
         CAST(max(floor(epoch(l_shipdate))) AS BIGINT) AS zmax_s
  FROM lineitem GROUP BY 1
)
SELECT part_epoch, zmin_s, zmax_s,
       CAST(CASE WHEN lead(zmin_s) OVER (ORDER BY zmin_s, part_epoch)
                      <= zmax_s
                 THEN 1 ELSE 0 END AS BIGINT) AS overlaps_next
FROM zones"""


@stage(
    "zone_map_adjacency_lineitem",
    _ZONE_ADJ_ORACLE,
    "zone-map quality audit: order the per-month ship-date zones by "
    "their minimum and flag each whose range overlaps its successor's "
    "— on time-clustered data every flag is 0 and min/max pruning cuts "
    "scans to the predicate's partitions; flags turning 1 mean the "
    "write layout is rotting (late-arriving data smeared across "
    "partitions) and a re-cluster/compaction pays for itself. The "
    "lead-window adjacency test is the linear-time proxy for the "
    "quadratic all-pairs overlap count (for interval sets, zero "
    "adjacent overlaps in min-order implies zero overlaps anywhere). "
    "Runs entirely on the ~months-row zone state: metadata cost.",
)
def zone_map_adjacency_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    es = F.unix_timestamp(F.col("l_shipdate"))
    zones = li.groupBy(
        F.unix_timestamp(F.date_trunc("month", F.col("l_shipdate"))).alias(
            "part_epoch"
        )
    ).agg(F.min(es).alias("zmin_s"), F.max(es).alias("zmax_s"))
    w = Window.orderBy("zmin_s", "part_epoch")
    return zones.select(
        "part_epoch",
        "zmin_s",
        "zmax_s",
        F.when(F.lead("zmin_s").over(w) <= F.col("zmax_s"), 1)
        .otherwise(0)
        .cast("long")
        .alias("overlaps_next"),
    )


# =====================================================================
# B. Embedding-drift derivatives
# =====================================================================

_IVF_K = 4

# the kmeans/IVF oracle conventions (queries_more._KMEANS_ORACLE,
# queries_staging_r11._EMB_CTE) — re-declared standalone
_EMB_CTE = f"""WITH emb AS (
  SELECT vec_id, CAST(vec_id % 2 AS BIGINT) AS h,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), seeds AS (
  SELECT vec_id AS cid, v FROM emb WHERE vec_id < {_IVF_K}
), d0 AS (
  SELECT e.vec_id, e.h, s.cid,
         list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - s.v[i]) * (e.v[i] - s.v[i]))) AS d2
  FROM emb e, seeds s
), a0 AS (
  SELECT vec_id, h, cid, d2 FROM (
    SELECT vec_id, h, cid, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d0) WHERE rn = 1
)"""


def _emb_base(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.pmod(F.col("vec_id"), F.lit(2)).cast("long").alias("h"),
        F.col("label").cast("long").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _seed_centroids(base):
    rows = base.filter(F.col("vec_id") < _IVF_K).orderBy("vec_id").collect()
    return [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in rows]


def _assign_expr(cent_pairs):
    # parsed-SQL argmin (optimization r16, guide §7.3 — same tree as
    # the Column-lambda form, ~0.4 s less driver build time per call)
    from .ext.similarity import argmin_assign_cols

    best_cid, best_d2, _d2s = argmin_assign_cols(cent_pairs)
    return best_cid, best_d2


_CHURN_ORACLE = (
    _EMB_CTE
    + """, c1 AS (
  SELECT a0.cid, t.pos,
         CAST(sum(CAST(round(e.v[t.pos + 1] * 1000000000.0) AS BIGINT))
              AS DOUBLE)
           / 1000000000.0 / count(*) AS m
  FROM emb e JOIN a0 ON e.vec_id = a0.vec_id, range(0, 64) t(pos)
  GROUP BY a0.cid, t.pos
), c1v AS (
  SELECT cid, list(m ORDER BY pos) AS v FROM c1 GROUP BY cid
), d1 AS (
  SELECT e.vec_id, c.cid,
         list_sum(list_transform(range(1, 65),
                  i -> (e.v[i] - c.v[i]) * (e.v[i] - c.v[i]))) AS d2
  FROM emb e, c1v c
), a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d1) WHERE rn = 1
)
SELECT CAST(a0.cid AS BIGINT) AS old_cid, CAST(a1.cid AS BIGINT) AS new_cid,
       CAST(count(*) AS BIGINT) AS n
FROM a0 JOIN a1 ON a1.vec_id = a0.vec_id
GROUP BY 1, 2"""
)


@stage(
    "ivf_reassignment_churn_embeddings",
    _CHURN_ORACLE,
    "index-rebuild cost matrix: assign every vector to the BUILD-TIME "
    "seed centroids AND to the one-Lloyd-iteration retrained centroids "
    "(the kmeans_embeddings_2iter update convention: quantized-exact "
    "1e9 per-dim means), and count the (old_cell, new_cell) "
    "transitions. The diagonal is vectors a retrain leaves in place; "
    "off-diagonal mass is inverted-list rewrite volume — THE number "
    "that decides between a cheap centroid refresh (small churn) and "
    "a full index rebuild with reshuffled lists. Centroids stay "
    "driver-side literals (metadata); two assignment map passes + one "
    "k x k aggregate; the vec-keyed join of the two assignments rides "
    "one shuffle bounded by corpus keys.",
)
def ivf_reassignment_churn_embeddings(spark, sf_dir):
    base = _emb_base(spark, sf_dir)
    cents0 = _seed_centroids(base)
    cid0, _ = _assign_expr(cents0)
    # one Lloyd update: quantized-exact per-dim means per build cell.
    # Optimization r15 (guide §2.3, r10 wide-agg convention): ONE
    # 64-column wide aggregate per cell instead of a posexplode 64x
    # row blowup + (cid, pos) shuffle; identical int64 sums, the two
    # double divisions replayed in the same order driver-side.
    c1_rows = (
        base.select(cid0.alias("cid"), "v")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.round(F.get("v", i) * F.lit(1e9)).cast("long"))
                .alias(f"s{i}")
                for i in range(64)
            ],
        )
        .collect()
    )
    cents1 = [
        (
            int(r["cid"]),
            [float(r[f"s{i}"]) / 1e9 / r["n"] for i in range(64)],
        )
        for r in sorted(c1_rows, key=lambda r: int(r["cid"]))
    ]
    cid1, _ = _assign_expr(cents1)
    return (
        base.select(
            cid0.cast("long").alias("old_cid"),
            cid1.cast("long").alias("new_cid"),
        )
        .groupBy("old_cid", "new_cid")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_PURITY_ORACLE = (
    _EMB_CTE
    + """, lab AS (
  SELECT a.cid, a.h, e2.label, CAST(count(*) AS BIGINT) AS c
  FROM a0 a JOIN (SELECT vec_id, label FROM embeddings) e2
    ON e2.vec_id = a.vec_id
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT cid, h, label, c,
         CAST(sum(c) OVER (PARTITION BY cid, h) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY cid, h
                            ORDER BY c DESC, label) AS rn
  FROM lab
)
SELECT CAST(cid AS BIGINT) AS cid, CAST(h AS BIGINT) AS half,
       n, CAST(label AS BIGINT) AS majority_label,
       round(CAST(c AS DOUBLE) / n, 6) AS purity
FROM ranked WHERE rn = 1"""
)


@stage(
    "cell_label_purity_embeddings",
    _PURITY_ORACLE,
    "semantic drift inside cells: per (IVF cell, half), the majority "
    "label and its share (purity; lowest label wins count ties, "
    "deterministically). A cell that was 80% one label at build time "
    "and is mixed in the post-build half has drifted SEMANTICALLY "
    "even if its occupancy and residuals look stable — the failure "
    "mode where filtered-by-cell retrieval starts returning "
    "off-topic neighbors. Label counts per cell are a key-bounded "
    "aggregate over the assignment pass; the majority pick is one "
    "rank window over ~cells x labels rows (metadata).",
)
def cell_label_purity_embeddings(spark, sf_dir):
    base = _emb_base(spark, sf_dir)
    cents = _seed_centroids(base)
    cid, _ = _assign_expr(cents)
    lab = (
        base.select(cid.alias("cid"), F.col("h").alias("half"), "label")
        .groupBy("cid", "half", "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wn = Window.partitionBy("cid", "half")
    wr = Window.partitionBy("cid", "half").orderBy(
        F.desc("c"), F.col("label")
    )
    return (
        lab.select(
            "cid",
            "half",
            "label",
            "c",
            F.sum("c").over(wn).cast("long").alias("n"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("cid").cast("long").alias("cid"),
            "half",
            "n",
            F.col("label").alias("majority_label"),
            F.round(F.col("c").cast("double") / F.col("n"), 6).alias(
                "purity"
            ),
        )
    )


_SWEEP_DIMS = [0, 1, 2, 3]
_SWEEP_EDGES = [-200000.0, -100000.0, -50000.0, 0.0, 50000.0, 100000.0,
                200000.0]


def _sweep_dim_sql(d: int) -> str:
    edge_sum = " + ".join(
        f"CAST((q >= {e}) AS INT)" for e in _SWEEP_EDGES
    )
    return f"""SELECT CAST({d} AS BIGINT) AS dim, ks_stat, n0, n1 FROM (
  WITH v AS (
    SELECT CAST(vec_id % 2 AS BIGINT) AS split,
           CAST(round(CAST(embedding[{d + 1}] AS DOUBLE) * 1000000.0)
                AS BIGINT) AS q
    FROM embeddings
  ), b AS (
    SELECT split, {edge_sum} AS bucket FROM v
  ), cells AS (
    SELECT bucket,
           sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
           sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
    FROM b GROUP BY bucket
  ), tot AS (
    SELECT sum(c0) AS n0, sum(c1) AS n1 FROM cells
  ), ecdf AS (
    SELECT sum(c0) OVER (ORDER BY bucket) AS cum0,
           sum(c1) OVER (ORDER BY bucket) AS cum1
    FROM cells
  )
  SELECT round(max(abs(CAST(cum0 AS DOUBLE) / t.n0
                     - CAST(cum1 AS DOUBLE) / t.n1)), 9) AS ks_stat,
         CAST(t.n0 AS BIGINT) AS n0, CAST(t.n1 AS BIGINT) AS n1
  FROM ecdf, tot t GROUP BY t.n0, t.n1
)"""


_SWEEP_ORACLE = "\nUNION ALL\n".join(_sweep_dim_sql(d) for d in _SWEEP_DIMS)


@stage(
    "coord_drift_sweep_embeddings",
    _SWEEP_ORACLE,
    "the per-dimension drift SWEEP — the production fan-out of the "
    "round-11 single-coordinate monitor: fixed-edge bucketed KS "
    "between the halves on each of the first four quantized "
    "coordinates, one row per dimension. Marginal per-dimension KS is "
    "the standard first-line embedding drift battery (cheap, "
    "localizes WHICH directions moved, catches what cell-level "
    "monitors miss when movement stays within cells); in production "
    "the sweep runs over all tracked dims — each is one scan with a "
    "map-side bucket expression and an 8-step bounded ECDF, and the "
    "scans share nothing, so they parallelize trivially across a "
    "cluster's idle capacity. Reuses the round-10 oracle-paired "
    "fixed-edge path (ext.stats.ks_two_sample_bucketed(edges=...)).",
)
def coord_drift_sweep_embeddings(spark, sf_dir):
    from functools import reduce

    from .ext.stats import ks_two_sample_bucketed

    emb = load_table(spark, sf_dir, "embeddings")
    outs = []
    for d in _SWEEP_DIMS:
        v = emb.select(
            F.pmod(F.col("vec_id"), F.lit(2)).cast("long").alias("split"),
            F.round(F.get("embedding", d).cast("double") * F.lit(1e6))
            .cast("long")
            .cast("double")
            .alias("q"),
        )
        ks = ks_two_sample_bucketed(
            v, split_col="split", value_col="q", edges=_SWEEP_EDGES
        )
        outs.append(
            ks.select(
                F.lit(d).cast("long").alias("dim"), "ks_stat", "n0", "n1"
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


_RESID_EDGES = [500000, 1000000, 1500000, 2000000, 2500000, 3000000]

_RESID_BUCKET_SQL = " + ".join(
    f"CAST((qd2 >= {e}) AS INT)" for e in _RESID_EDGES
)

_RESID_DRIFT_ORACLE = (
    _EMB_CTE
    + f""", r AS (
  SELECT h, CAST(round(d2 * 1000000.0) AS BIGINT) AS qd2 FROM a0
), b AS (
  SELECT h, {_RESID_BUCKET_SQL} AS bucket FROM r
), state AS (
  SELECT h, bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2
), cum AS (
  SELECT h, bucket,
         CAST(sum(n) OVER (PARTITION BY h ORDER BY bucket) AS BIGINT)
           AS cum
  FROM state
), tot AS (
  SELECT h, CAST(sum(n) AS BIGINT) AS nt FROM state GROUP BY 1
), qs AS (
  SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS q
), sel AS (
  SELECT c.h, s.q, min(c.bucket) AS bucket
  FROM qs s, cum c JOIN tot t ON t.h = c.h
  WHERE c.cum >= ceil(s.q * t.nt)
  GROUP BY c.h, s.q
)
SELECT CAST(sel.h AS BIGINT) AS half, sel.q,
       CAST(sel.bucket AS BIGINT) AS bucket,
       c.cum AS cum_le, t.nt AS n_total
FROM sel JOIN cum c ON c.h = sel.h AND c.bucket = sel.bucket
JOIN tot t ON t.h = sel.h"""
)


@stage(
    "residual_quantile_drift_embeddings",
    _RESID_DRIFT_ORACLE,
    "residual-distribution drift via histogram-state quantiles: the "
    "quantized squared residual (distance to the build-time centroid, "
    "the index_staleness signal) histogrammed per half on fixed "
    "edges, with p50/p90 read off each half's state — the round-11 "
    "mergeable-quantile machinery pointed at the index's own error "
    "distribution. The staleness MEAN can hide a fattening tail "
    "(p90 moving right while p50 holds = a subpopulation the index "
    "no longer fits); the two read-offs separate those cases. One "
    "assignment pass into a 2 x 7-bucket state; read-offs are "
    "metadata arithmetic.",
)
def residual_quantile_drift_embeddings(spark, sf_dir):
    base = _emb_base(spark, sf_dir)
    cents = _seed_centroids(base)
    _cid, d2 = _assign_expr(cents)
    qd2 = F.round(d2 * F.lit(1e6)).cast("long")
    bucket = None
    for e in _RESID_EDGES:
        t = (F.col("qd2") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    state = (
        base.select(F.col("h").alias("half"), qd2.alias("qd2"))
        .select("half", bucket.alias("bucket"))
        .groupBy("half", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    w = Window.partitionBy("half").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = state.select(
        "half", "bucket", F.sum("n").over(w).cast("long").alias("cum")
    )
    tot = state.groupBy("half").agg(F.sum("n").cast("long").alias("nt"))
    qs = F.array(*[F.lit(q).cast("double") for q in (0.5, 0.9)])
    picked = (
        cum.join(tot, "half")
        .select("half", "bucket", "cum", "nt", F.explode(qs).alias("q"))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("nt")))
        .groupBy("half", "q", "nt")
        .agg(F.min(F.struct("bucket", "cum")).alias("s"))
    )
    return picked.select(
        F.col("half").cast("long").alias("half"),
        "q",
        F.col("s.bucket").cast("long").alias("bucket"),
        F.col("s.cum").alias("cum_le"),
        F.col("nt").alias("n_total"),
    )


_LABEL_DRIFT_ORACLE = """WITH lab AS (
  SELECT CAST(label AS BIGINT) AS label, CAST(vec_id % 2 AS BIGINT) AS h
  FROM embeddings
), cnt AS (
  SELECT label,
         CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM lab GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
  FROM cnt
)
SELECT c.label, c.n_a, c.n_b,
       round(CAST(c.n_a AS DOUBLE) / t.ta, 6) AS share_a,
       round(CAST(c.n_b AS DOUBLE) / t.tb, 6) AS share_b,
       round((CAST(c.n_b AS DOUBLE) / t.tb
              - CAST(c.n_a AS DOUBLE) / t.ta)
             * ln((CAST(c.n_b AS DOUBLE) / t.tb + 1e-6)
                  / (CAST(c.n_a AS DOUBLE) / t.ta + 1e-6)), 6)
         AS psi_term
FROM cnt c, tot t"""


@stage(
    "label_share_drift_embeddings",
    _LABEL_DRIFT_ORACLE,
    "class-prior shift: per label, its share of the index-build half "
    "vs the post-build half with the PSI term (eps=1e-6, 6dp — the "
    "psi_bins convention). Label drift is the training-relevant "
    "complement of the geometric monitors: a retrieval index can be "
    "geometrically fresh while the class mix it serves has shifted "
    "under a class-conditioned sampler, silently rebalancing "
    "downstream training data. Pure metadata shape: one scan into a "
    "labels-row aggregate, 1-row totals broadcast.",
)
def label_share_drift_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cnt = (
        emb.select(
            F.col("label").cast("long").alias("label"),
            F.pmod(F.col("vec_id"), F.lit(2)).cast("long").alias("h"),
        )
        .groupBy("label")
        .agg(
            F.sum((F.col("h") == 0).cast("long")).alias("n_a"),
            F.sum((F.col("h") == 1).cast("long")).alias("n_b"),
        )
        .localCheckpoint()
    )
    tot = cnt.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    sa = F.col("n_a").cast("double") / F.col("ta")
    sb = F.col("n_b").cast("double") / F.col("tb")
    return cnt.crossJoin(F.broadcast(tot)).select(
        "label",
        "n_a",
        "n_b",
        F.round(sa, 6).alias("share_a"),
        F.round(sb, 6).alias("share_b"),
        F.round(
            (sb - sa) * F.log((sb + F.lit(1e-6)) / (sa + F.lit(1e-6))), 6
        ).alias("psi_term"),
    )


# =====================================================================
# C. Warehouse derivatives
# =====================================================================

# the round-11 _SCD2_IV_CTE (interval build + derived snapshot times),
# re-declared standalone
_SCD2_IV_CTE = """WITH ordered AS (
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
), iv AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS version_no, event_type,
         valid_from_s,
         lead(valid_from_s) OVER (PARTITION BY user_id
                                  ORDER BY run_id) AS valid_to_s,
         n_events
  FROM intervals
), bounds AS (
  SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS mn,
         CAST(max(floor(epoch(ts))) AS BIGINT) AS mx
  FROM events
), tt AS (
  SELECT mn + CAST(floor((mx - mn) / 2.0) AS BIGINT) AS tmid FROM bounds
)"""


def _scd2_iv_epochs(spark, sf_dir):
    from .ext.warehouse import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    iv = scd2_intervals(ev, "user_id", "event_type", "ts", "event_id")
    return ev, iv.select(
        "user_id",
        "version_no",
        "event_type",
        F.unix_timestamp("valid_from").alias("valid_from_s"),
        F.unix_timestamp("valid_to").alias("valid_to_s"),
        F.col("n_rows").alias("n_events"),
    )


_TRANSITION_ORACLE = (
    _SCD2_IV_CTE
    + """
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY version_no) AS prev_type
  FROM iv
) WHERE prev_type IS NOT NULL
GROUP BY 1, 2"""
)


@stage(
    "scd2_attr_transition_matrix_events",
    _TRANSITION_ORACLE,
    "VERSION-level attribute transition matrix: for every consecutive "
    "dimension-version pair per key, count (from_attr -> to_attr) — "
    "the Markov structure of the DIMENSION's changes, as opposed to "
    "markov_entropy_rate_events' event-level chain (runs of equal "
    "events collapse to one version here, so self-loops vanish and "
    "the matrix shows what attribute values actually REPLACE each "
    "other in MERGE batches — the input to change-data-validation "
    "rules like 'status may go O->F but never F->O'). One interval "
    "build (single user-keyed shuffle), a lag window on the same "
    "partitioning, and an attrs x attrs aggregate (metadata).",
)
def scd2_attr_transition_matrix_events(spark, sf_dir):
    _ev, iv = _scd2_iv_epochs(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("version_no")
    return (
        iv.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_PIT_SWEEP_ORACLE = """WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), horizons AS (
  SELECT CAST(unnest([86400, 259200, 604800]) AS BIGINT) AS horizon_s
), feat AS (
  SELECT l.es, h.horizon_s,
         (SELECT count(*) FROM e p
          WHERE p.user_id = l.user_id
            AND p.es BETWEEN l.es - h.horizon_s AND l.es - 1) AS n_prior
  FROM e l, horizons h WHERE l.event_type = 'purchase'
)
SELECT horizon_s,
       CAST(count(*) AS BIGINT) AS n_labels,
       round(CAST(sum(n_prior) AS DOUBLE) / count(*), 6) AS mean_prior
FROM feat GROUP BY 1"""


@stage(
    "pit_horizon_sweep_events",
    _PIT_SWEEP_ORACLE,
    "point-in-time horizon sweep: the PIT prior-activity count "
    "(pit_features_events' leakage-safe strictly-earlier-by-second "
    "feature) evaluated at THREE horizons (1d/3d/7d) with per-horizon "
    "label counts and mean feature values — the tuning curve that "
    "picks a feature window before committing to a backfill (a "
    "horizon whose mean has saturated adds state cost but no signal). "
    "Spark computes all three horizons from ONE user-keyed shuffle "
    "(three range-bounded window frames over the same ordered "
    "stream — the frames share the sort), where the oracle replays "
    "each as a correlated subquery; at 100 TB the three-frames-one-"
    "shuffle shape is the whole point.",
)
def pit_horizon_sweep_events(spark, sf_dir):
    from functools import reduce

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
    )
    outs = []
    for h in (86400, 259200, 604800):
        w = (
            Window.partitionBy("user_id")
            .orderBy("es")
            .rangeBetween(-h, -1)
        )
        feat = ev.withColumn("n_prior", F.count(F.lit(1)).over(w)).filter(
            F.col("event_type") == "purchase"
        )
        outs.append(
            feat.agg(
                F.lit(h).cast("long").alias("horizon_s"),
                F.count(F.lit(1)).alias("n_labels"),
                F.round(
                    F.sum("n_prior").cast("double") / F.count(F.lit(1)), 6
                ).alias("mean_prior"),
            ).select("horizon_s", "n_labels", "mean_prior")
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


# (epoch_s, event_id) packed into one BIGINT — the established
# last_event_attribution id_radix convention (es * 1e7 + id keeps
# integer lexicographic order exactly)
_ATTR_COMPARE_ORACLE = """WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS packed
  FROM events
), feat AS (
  SELECT e.event_type, e.es,
         (SELECT min(c.packed) FROM e c
          WHERE c.user_id = e.user_id AND c.event_type = 'click'
            AND c.es BETWEEN e.es - 3600 AND e.es - 1) AS first_touch,
         (SELECT max(c.packed) FROM e c
          WHERE c.user_id = e.user_id AND c.event_type = 'click'
            AND c.es BETWEEN e.es - 3600 AND e.es - 1) AS last_touch
  FROM e WHERE e.event_type = 'purchase'
)
SELECT CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN first_touch IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_attributed,
       CAST(sum(CASE WHEN first_touch IS NOT NULL
                      AND first_touch = last_touch
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_single_touch,
       CAST(sum(CASE WHEN first_touch IS NOT NULL
                      AND first_touch <> last_touch
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_touch,
       round(CAST(sum(CASE WHEN first_touch IS NOT NULL
                            AND first_touch <> last_touch
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(CASE WHEN first_touch IS NOT NULL THEN 1 ELSE 0 END),
             6) AS multi_touch_share
FROM feat"""


@stage(
    "attribution_model_compare_events",
    _ATTR_COMPARE_ORACLE,
    "attribution model sensitivity: for every purchase, the FIRST and "
    "LAST qualifying click in the strictly-earlier 1-hour window "
    "(seconds granularity; (es, event_id) packed into one BIGINT so "
    "min/max pick a deterministic event on same-second ties — the "
    "last_event_attribution id_radix convention), and the share of "
    "attributed purchases where the two models disagree "
    "(multi-touch). If multi_touch_share is near zero the "
    "first-vs-last debate is moot on this traffic; if not, the "
    "attribution join feeding training labels is a modeling DECISION "
    "and belongs in the contract. Spark: one user-keyed shuffle, two "
    "range-frame window aggregates (min/max over the same frame — "
    "one sort), no self-join; the oracle replays both as correlated "
    "subqueries.",
)
def attribution_model_compare_events(spark, sf_dir):
    # the packing precondition is ENFORCED like last_event_attribution
    # (round-8 ADVICE lesson): an event_id outside [0, radix) would
    # silently corrupt the min/max ordering, so it raises instead
    radix = 10_000_000
    guard = F.assert_true(
        (F.col("event_id") >= 0) & (F.col("event_id") < F.lit(radix)),
        F.lit(
            "attribution_model_compare: event_id outside [0, 1e7) "
            "breaks the (epoch_s, id) int64 packing — raise the radix"
        ),
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        (
            F.unix_timestamp("ts") * F.lit(radix).cast("long")
            + F.col("event_id")
            + F.coalesce(guard.cast("long"), F.lit(0))
        ).alias("packed"),
    )
    click_packed = F.when(
        F.col("event_type") == "click", F.col("packed")
    )
    w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-3600, -1)
    feat = (
        ev.withColumn("first_touch", F.min(click_packed).over(w))
        .withColumn("last_touch", F.max(click_packed).over(w))
        .filter(F.col("event_type") == "purchase")
    )
    attributed = F.col("first_touch").isNotNull()
    multi = attributed & (F.col("first_touch") != F.col("last_touch"))
    single = attributed & (F.col("first_touch") == F.col("last_touch"))
    return feat.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(attributed.cast("long")).alias("n_attributed"),
        F.sum(single.cast("long")).alias("n_single_touch"),
        F.sum(multi.cast("long")).alias("n_multi_touch"),
        F.round(
            F.sum(multi.cast("long")).cast("double")
            / F.sum(attributed.cast("long")),
            6,
        ).alias("multi_touch_share"),
    )


_RECONCILE_ORACLE = (
    _SCD2_IV_CTE
    + """, counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n_versions,
         CAST(sum(CASE WHEN valid_to_s IS NOT NULL AND valid_to_s <= tmid
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_closed_before,
         CAST(sum(CASE WHEN valid_from_s <= tmid
                        AND (valid_to_s IS NULL OR valid_to_s > tmid)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_asof,
         CAST(sum(CASE WHEN valid_from_s > tmid
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_opened_after,
         CAST(count(DISTINCT CASE WHEN valid_from_s <= tmid
                                  THEN user_id END) AS BIGINT)
           AS n_users_started
  FROM iv, tt
)
SELECT n_versions, n_closed_before, n_asof, n_opened_after,
       n_users_started,
       CAST(CASE WHEN n_closed_before + n_asof + n_opened_after
                      = n_versions
                 THEN 1 ELSE 0 END AS BIGINT) AS tiles_ok,
       CAST(CASE WHEN n_asof = n_users_started
                 THEN 1 ELSE 0 END AS BIGINT) AS asof_ok
FROM counts"""
)


@stage(
    "snapshot_reconciliation_events",
    _RECONCILE_ORACLE,
    "SCD2 integrity reconciliation — the invariants any as-of read "
    "silently assumes, checked as counts: every version is exactly "
    "one of closed-before-T / valid-at-T / opened-after-T (tiles_ok), "
    "and the as-of row count equals the keys whose history had "
    "started by T (asof_ok — one current row per started key, no "
    "gaps, no double-valid intervals). A MERGE bug that leaves "
    "overlapping or gapped intervals breaks these flags before any "
    "downstream join notices; this is the cheap post-MERGE gate. One "
    "interval-build shuffle + a single fused count pass with the "
    "1-row T broadcast.",
)
def snapshot_reconciliation_events(spark, sf_dir):
    from .queries_staging_r11 import _events_tt

    ev, tt = _events_tt(spark, sf_dir)
    _ev2, iv = _scd2_iv_epochs(spark, sf_dir)
    iv_t = iv.crossJoin(F.broadcast(tt.select("tmid")))
    closed_before = F.col("valid_to_s").isNotNull() & (
        F.col("valid_to_s") <= F.col("tmid")
    )
    asof = (F.col("valid_from_s") <= F.col("tmid")) & (
        F.col("valid_to_s").isNull() | (F.col("valid_to_s") > F.col("tmid"))
    )
    opened_after = F.col("valid_from_s") > F.col("tmid")
    counts = iv_t.agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(closed_before.cast("long")).alias("n_closed_before"),
        F.sum(asof.cast("long")).alias("n_asof"),
        F.sum(opened_after.cast("long")).alias("n_opened_after"),
        F.countDistinct(
            F.when(F.col("valid_from_s") <= F.col("tmid"), F.col("user_id"))
        ).alias("n_users_started"),
    )
    return counts.select(
        "n_versions",
        "n_closed_before",
        "n_asof",
        "n_opened_after",
        F.col("n_users_started").cast("long").alias("n_users_started"),
        F.when(
            F.col("n_closed_before") + F.col("n_asof")
            + F.col("n_opened_after")
            == F.col("n_versions"),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("tiles_ok"),
        F.when(F.col("n_asof") == F.col("n_users_started"), 1)
        .otherwise(0)
        .cast("long")
        .alias("asof_ok"),
    )


_MERGE_SKEW_ORACLE = """WITH per_key AS (
  SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
         user_id, event_type, CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2, 3
)
SELECT day_epoch,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(v) AS BIGINT) AS n_versions,
       CAST(max(v) AS BIGINT) AS max_versions_per_key,
       round(CAST(max(v) AS DOUBLE) / sum(v), 6) AS hot_key_share
FROM per_key GROUP BY 1"""


@stage(
    "merge_skew_profile_events",
    _MERGE_SKEW_ORACLE,
    "MERGE shuffle-skew profile: per day, the hottest key's version "
    "count and its share of the day's change volume — the number that "
    "predicts whether the upsert's key-partitioned shuffle needs "
    "salting (one key owning 30% of a day's versions serializes that "
    "reducer no matter how many executors the MERGE gets; the "
    "skew_salted_join_events treatment applies). Companion to "
    "upsert_batch_sizing_events' averages — skew is what averages "
    "hide. Two key-bounded aggregates, both riding the same "
    "day+key-partitioned shuffle with map-side partials.",
)
def merge_skew_profile_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias(
            "day_epoch"
        ),
        "user_id",
        "event_type",
    ).agg(F.count(F.lit(1)).alias("v"))
    return per_key.groupBy("day_epoch").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("v").cast("long").alias("n_versions"),
        F.max("v").cast("long").alias("max_versions_per_key"),
        F.round(
            F.max("v").cast("double") / F.sum("v"), 6
        ).alias("hot_key_share"),
    )


# =====================================================================
# D. Governance derivatives
# =====================================================================

_LDIV_VALUE_EDGES = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]

_LDIV_VBUCKET_SQL = " + ".join(
    f"CAST((CAST(value AS DOUBLE) >= {e}) AS INT)"
    for e in _LDIV_VALUE_EDGES
)

_LDIV_ORACLE = f"""WITH qi AS (
  SELECT hour(ts) AS hr,
         CASE WHEN value IS NULL THEN -1
              ELSE {_LDIV_VBUCKET_SQL} END AS vb,
         event_type
  FROM events
), classes AS (
  SELECT hr, vb,
         CAST(count(DISTINCT event_type) AS BIGINT) AS l_distinct,
         CAST(count(*) AS BIGINT) AS sz
  FROM qi GROUP BY 1, 2
)
SELECT l_distinct,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(sz) AS BIGINT) AS n_rows
FROM classes GROUP BY 1"""


@stage(
    "l_diversity_profile_events",
    _LDIV_ORACLE,
    "training-data governance, the l-diversity companion to "
    "k_anonymity_profile_events: treating event_type as the SENSITIVE "
    "attribute and (hour, fixed-edge value bucket) as the "
    "quasi-identifier, the distribution of DISTINCT sensitive values "
    "per equivalence class. k-anonymity alone is defeated by a "
    "homogeneous class (20 rows, all the same sensitive value leaks "
    "it exactly); classes with l_distinct = 1 are the homogeneity "
    "attack surface this profile sizes. Two key-bounded aggregates "
    "(rows -> classes with a distinct-count riding the same shuffle "
    "-> histogram over l).",
)
def l_diversity_profile_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    vb = None
    for e in _LDIV_VALUE_EDGES:
        t = (F.col("value").cast("double") >= F.lit(e)).cast("int")
        vb = t if vb is None else vb + t
    classes = (
        ev.select(
            F.hour("ts").alias("hr"),
            F.when(F.col("value").isNull(), -1).otherwise(vb).alias("vb"),
            "event_type",
        )
        .groupBy("hr", "vb")
        .agg(
            F.countDistinct("event_type").cast("long").alias("l_distinct"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    return classes.groupBy("l_distinct").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("sz").cast("long").alias("n_rows"),
    )


_VOCAB_SOURCES = ["src0", "src1", "src2", "src3", "src4"]

_VOCAB_OVERLAP_ORACLE = f"""WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text),
                '[[:space:]]+'), x -> x <> '')) AS w
  FROM documents
  WHERE source IN ({", ".join(f"'{s}'" for s in _VOCAB_SOURCES)})
), vocab AS (
  SELECT DISTINCT source, w FROM toks
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS sz FROM vocab GROUP BY 1
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM vocab a JOIN vocab b ON b.w = a.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.n_common,
       round(CAST(i.n_common AS DOUBLE)
             / (sa.sz + sb.sz - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b"""


@stage(
    "vocab_overlap_sources_documents",
    _VOCAB_OVERLAP_ORACLE,
    "cross-feed vocabulary overlap: pairwise Jaccard of the DISTINCT "
    "word sets of five named sources — the vocabulary-level "
    "duplication fingerprint that flags a feed syndicating another's "
    "content even when no document is a verbatim near-dup "
    "(dedup_containment finds copied SPANS; this finds copied "
    "LANGUAGE). Near-1.0 pairs are merge candidates in source-mix "
    "planning; near-0 pairs justify separate quality thresholds. The "
    "pair enumeration is a word-keyed self-join of the distinct "
    "(source, word) table with a < filter — vocabulary-bounded, "
    "never touching raw rows twice — and the source list is a "
    "deliberate literal: at 100 TB you sweep the suspect feeds, not "
    "all O(sources^2).",
)
def vocab_overlap_sources_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isin(_VOCAB_SOURCES)
    )
    # optimization r15 (guide §5): vocab feeds the size aggregate AND
    # both self-join sides — persist, materialize the sources²-bounded
    # result eagerly, unpersist.
    vocab = (
        docs.select(
            "source", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
        )
        .distinct()
        .persist()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    a = vocab.select(F.col("source").alias("src_a"), "w")
    b = vocab.select(F.col("source").alias("src_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("szb"))
    out = (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, vocab)


_CALIB_EDGES = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]

_CALIB_BUCKET_SQL = " + ".join(
    f"CAST((CAST(value AS DOUBLE) >= {e}) AS INT)" for e in _CALIB_EDGES
)

_CALIB_ORACLE = f"""WITH b AS (
  SELECT {_CALIB_BUCKET_SQL} AS bucket FROM events WHERE value IS NOT NULL
), cnt AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM cnt
)
SELECT CAST(c.bucket AS BIGINT) AS bucket, c.n,
       round(CAST(c.n AS DOUBLE) / t.nt, 6) AS share,
       CAST(CASE WHEN round(CAST(c.n AS DOUBLE) / t.nt, 6) < 0.01
                   OR round(CAST(c.n AS DOUBLE) / t.nt, 6) > 0.5
                 THEN 1 ELSE 0 END AS BIGINT) AS miscalibrated
FROM cnt c, tot t"""


@stage(
    "bucket_calibration_events",
    _CALIB_ORACLE,
    "fixed-edge maintenance: occupancy share per bucket of the "
    "shared value edges (the k-anonymity / fixed-edge-KS boundary "
    "set), flagging starved (<1%) and overloaded (>50%) buckets on "
    "the 6dp-rounded shares. Every fixed-edge operator in the catalog "
    "trades adaptivity for mergeability and oracle-exactness — this "
    "is the audit that tells you when the trade has gone bad and the "
    "edge set needs a (versioned, stated) refresh, BEFORE a drift "
    "monitor silently loses resolution in an overloaded bucket. One "
    "scan, 8-row aggregate, 1-row totals broadcast.",
)
def bucket_calibration_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    bucket = None
    for e in _CALIB_EDGES:
        t = (F.col("value").cast("double") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the base-table scan+aggregate runs once.
    cnt = (
        ev.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = cnt.agg(F.sum("n").cast("long").alias("nt"))
    share = F.round(F.col("n").cast("double") / F.col("nt"), 6)
    return cnt.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        share.alias("share"),
        F.when((share < 0.01) | (share > 0.5), 1)
        .otherwise(0)
        .cast("long")
        .alias("miscalibrated"),
    )


_SUPPRESS_ORACLE = f"""WITH qi AS (
  SELECT event_type, hour(ts) AS hr,
         CASE WHEN value IS NULL THEN -1
              ELSE {_LDIV_VBUCKET_SQL} END AS vb
  FROM events
), classes AS (
  SELECT event_type, hr, vb, CAST(count(*) AS BIGINT) AS sz
  FROM qi GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(sum(sz) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
         AS n_suppressed,
       round(CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS DOUBLE)
             / sum(sz), 6) AS suppressed_share
FROM classes GROUP BY 1"""


@stage(
    "rare_combo_suppression_events",
    _SUPPRESS_ORACLE,
    "the k-anonymity ACTION, costed: enforcing k=5 on the "
    "(event_type, hour, value-bucket) quasi-identifier suppresses "
    "every row in a sub-5 equivalence class — this query reports the "
    "per-event-type row loss that enforcement would cause, which is "
    "the number that arbitrates between suppression, coarser "
    "generalization (wider value buckets), and a higher k. Rare "
    "event types pay disproportionately (their classes are small "
    "everywhere) — exactly what the per-type breakdown surfaces. "
    "Computed entirely on the class-size table (key-bounded); no "
    "row-level join is needed because suppression cost is the sum of "
    "sub-k class sizes.",
)
def rare_combo_suppression_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    vb = None
    for e in _LDIV_VALUE_EDGES:
        t = (F.col("value").cast("double") >= F.lit(e)).cast("int")
        vb = t if vb is None else vb + t
    classes = (
        ev.select(
            "event_type",
            F.hour("ts").alias("hr"),
            F.when(F.col("value").isNull(), -1).otherwise(vb).alias("vb"),
        )
        .groupBy("event_type", "hr", "vb")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    supp = F.when(F.col("sz") < 5, F.col("sz")).otherwise(F.lit(0))
    return classes.groupBy("event_type").agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.sum(supp).cast("long").alias("n_suppressed"),
        F.round(
            F.sum(supp).cast("double") / F.sum("sz"), 6
        ).alias("suppressed_share"),
    )


_LORENZ_ORACLE = """WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT))
              AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1
), ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM per_user
), deciles AS (
  SELECT CAST((i - 1) * 10 // n AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS dx
  FROM ranked GROUP BY 1
), tot AS (
  SELECT CAST(sum(dx) AS BIGINT) AS tx FROM deciles
)
SELECT d.decile, d.n_users,
       round(CAST(d.dx AS DOUBLE) / t.tx, 6) AS value_share,
       round(CAST(CAST(sum(d.dx) OVER (ORDER BY d.decile) AS BIGINT)
                  AS DOUBLE) / t.tx, 6) AS cum_value_share
FROM deciles d, tot t"""


@stage(
    "value_lorenz_curve_events",
    _LORENZ_ORACLE,
    "the Lorenz curve behind the round-11 Gini: users ranked "
    "ascending by quantized total value, partitioned into exact "
    "rank-deciles ((i-1)*10 div n — pure integer arithmetic, "
    "identical in both engines), with each decile's value share and "
    "the cumulative curve. The Gini is one number; the curve says "
    "WHERE the concentration lives (bottom deciles owning ~0% = a "
    "long inactive tail to downsample; the top decile's share = the "
    "whale cap a sampler needs). The rank window is bounded by USER "
    "cardinality (entity-level, like the Gini); the decile rollup "
    "and cumulative window are 10-row metadata.",
)
def value_lorenz_curve_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.round(F.col("value").cast("double") * F.lit(100.0)).cast(
                "long"
            )
        ).alias("x")
    )
    wr = Window.orderBy("x", "user_id")
    wn = Window.partitionBy()
    ranked = per_user.select(
        "x",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    deciles = ranked.groupBy(
        F.expr("CAST((i - 1) * 10 DIV n AS BIGINT)").alias("decile")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").cast("long").alias("dx"),
    ).localCheckpoint()
    tot = deciles.agg(F.sum("dx").cast("long").alias("tx"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deciles.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_users",
            F.round(F.col("dx").cast("double") / F.col("tx"), 6).alias(
                "value_share"
            ),
            F.round(
                F.sum("dx").over(wc).cast("long").cast("double")
                / F.col("tx"),
                6,
            ).alias("cum_value_share"),
        )
    )


# ---------------------------------------------------------------------
# Round-12 promotion hook (second pass; see queries_more's re-entrancy
# note): this module bootstraps the catalog chain BEFORE defining
# STAGED_R12, so importing THIS module first runs the whole
# registration chain while STAGED_R12 is still empty. Re-invoking the
# skip-if-registered promotion here — after all twenty entries exist —
# makes the catalog complete under either import order (the
# queries_staging_r8..r11 pattern, verbatim).
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r12 as _promote  # noqa: E402

_promote()
del _promote
