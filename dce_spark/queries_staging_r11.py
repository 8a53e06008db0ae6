"""ROUND-11 STAGED catalog queries — seeded in round 10 (the staging
pipeline runs a full round ahead; the r10 promotion exhausted both
prior cohorts, so this is the first staging work since round 7), NOT
registered (same freeze protocol as queries_staging_r5..r10). Round 11
promotes them.

The three themes are the round-9 verdict's item-2 candidates, each
with real 100 TB pull:

MERGEABLE VALIDATION STATE (the incremental-validation counterpart of
``validate_partitions``): per-partition summary STATES that merge by
pure addition/min/max — the shape that lets a 1000-executor job
validate each parquet partition independently and combine results
without re-scanning, and lets tomorrow's incremental run merge
yesterday's committed state with today's delta.

- ``mergeable_profile_lineitem`` — per-ship-month profile state
  (count / quantized sums / min / max) plus the MERGED global row
  computed from the states, not from the data.
- ``incremental_validation_orders`` — per-order-month violation
  counts (allowed-values, range, null checks) with the merged total:
  the validation ledger a contract pipeline commits per partition.
- ``histogram_quantile_merge_lineitem`` — fixed-edge histograms as
  partition-mergeable quantile state: per-flag histograms merge by
  bucket addition, and p50/p90/p99 read off the merged counts.
- ``moments_merge_events`` — quantized (n, Σx, Σx²) moment states per
  event_type with the merged ALL row: mean/variance that combine
  exactly under any partitioning.
- ``zone_map_prune_lineitem`` — per-month zone maps (min/max) scored
  against a time-window predicate: which partitions a reader can
  prove it never needs to open.

EMBEDDING DRIFT over the IVF index (the ANN-index staleness signal):
cells = assignment to the established seed centroids (first k=4
vectors, the kmeans/IVF convention); "index build" half A
(vec_id % 2 = 0) vs "post-build" half B.

- ``centroid_shift_embeddings`` — per-cell quantized-exact centroid
  of each half and the L2 shift between them.
- ``cell_occupancy_psi_embeddings`` — PSI between the halves' cell
  occupancy (eps=1e-6 convention): traffic moving between cells.
- ``coord_drift_bucketed_embeddings`` — fixed-edge bucketed KS on a
  representative coordinate between halves (the round-10
  oracle-paired bucketed path on a second table).
- ``index_staleness_embeddings`` — per cell: occupancy delta and
  mean residual (distance to the build-time centroid) per half, with
  the re-index flag.
- ``assignment_margin_drift_embeddings`` — mean (second-best minus
  best) assignment margin per cell per half: cells going ambiguous.

SCD2 SNAPSHOT DIFF (cross-snapshot contract checks over the round-9
warehouse build) + training-governance ops — documented per query
below.

tests/test_staging_r11.py runs these through the SAME compare harness
as the live catalog at the suite's SF. Every query verified against
its DuckDB oracle at sf0.001 + sf0.01 + sf0.1 before commit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table

STAGED_R11: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R11[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    return STAGED_R11[name].oracle


# =====================================================================
# A. Mergeable validation state
# =====================================================================

_MERGE_PROFILE_ORACLE = """WITH state AS (
  SELECT CAST(floor(epoch(date_trunc('month', l_shipdate))) AS BIGINT)
           AS part_epoch,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
           AS sq,
         min(l_quantity) AS mnq,
         max(l_quantity) AS mxq,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
           AS sp
  FROM lineitem GROUP BY 1
)
SELECT part_epoch, n,
       CAST(sq AS DOUBLE) / 100.0 AS sum_qty,
       mnq AS min_qty, mxq AS max_qty,
       CAST(sp AS DOUBLE) / 100.0 AS sum_price
FROM state
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(sum(n) AS BIGINT),
       CAST(CAST(sum(sq) AS BIGINT) AS DOUBLE) / 100.0,
       min(mnq), max(mxq),
       CAST(CAST(sum(sp) AS BIGINT) AS DOUBLE) / 100.0
FROM state"""


@stage(
    "mergeable_profile_lineitem",
    _MERGE_PROFILE_ORACLE,
    "mergeable validation state: per-ship-month profile STATE "
    "(count, quantized-exact 1e2 sums, min, max — l_quantity and "
    "l_extendedprice sit on the 0.01 grid, so the quantization is "
    "lossless) plus the MERGED global row (part_epoch = -1) computed "
    "by combining the per-partition states with pure sum/min/max — "
    "never by re-scanning the data. This is the incremental-"
    "validation counterpart of validate_partitions: at 100 TB each "
    "parquet partition emits its state independently (map-side "
    "combine, one shuffle of ~months rows), states commit to a "
    "ledger, and tomorrow's run merges yesterday's states with "
    "today's delta partitions in metadata time. Exact integer "
    "arithmetic end-to-end makes merged == recomputed bit-for-bit, "
    "which is the property that lets the merge REPLACE the rescan.",
)
def mergeable_profile_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    state = li.groupBy(
        F.unix_timestamp(F.date_trunc("month", F.col("l_shipdate"))).alias(
            "part_epoch"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.round(F.col("l_quantity") * F.lit(100.0)).cast("long")
        ).alias("sq"),
        F.min("l_quantity").alias("mnq"),
        F.max("l_quantity").alias("mxq"),
        F.sum(
            F.round(F.col("l_extendedprice") * F.lit(100.0)).cast("long")
        ).alias("sp"),
    ).localCheckpoint()
    per_part = state.select(
        "part_epoch",
        "n",
        (F.col("sq").cast("double") / F.lit(100.0)).alias("sum_qty"),
        F.col("mnq").alias("min_qty"),
        F.col("mxq").alias("max_qty"),
        (F.col("sp").cast("double") / F.lit(100.0)).alias("sum_price"),
    )
    merged = state.agg(
        F.sum("n").alias("n"),
        F.sum("sq").alias("sq"),
        F.min("mnq").alias("mnq"),
        F.max("mxq").alias("mxq"),
        F.sum("sp").alias("sp"),
    ).select(
        F.lit(-1).cast("long").alias("part_epoch"),
        F.col("n").cast("long").alias("n"),
        (F.col("sq").cast("double") / F.lit(100.0)).alias("sum_qty"),
        F.col("mnq").alias("min_qty"),
        F.col("mxq").alias("max_qty"),
        (F.col("sp").cast("double") / F.lit(100.0)).alias("sum_price"),
    )
    return per_part.unionByName(merged)


_INCR_VALID_ORACLE = """WITH state AS (
  SELECT CAST(floor(epoch(date_trunc('month', o_orderdate))) AS BIGINT)
           AS part_epoch,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F')
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_status_viol,
         CAST(sum(CASE WHEN o_totalprice <= 0.0 OR o_totalprice > 400000.0
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_price_viol,
         CAST(sum(CASE WHEN o_orderpriority IS NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_null_priority
  FROM orders GROUP BY 1
)
SELECT part_epoch, n_rows, n_status_viol, n_price_viol, n_null_priority
FROM state
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(sum(n_rows) AS BIGINT),
       CAST(sum(n_status_viol) AS BIGINT),
       CAST(sum(n_price_viol) AS BIGINT),
       CAST(sum(n_null_priority) AS BIGINT)
FROM state"""


@stage(
    "incremental_validation_orders",
    _INCR_VALID_ORACLE,
    "mergeable validation state, contract flavor: per-order-month "
    "VIOLATION-COUNT state for three reference-style checks — "
    "allowed-values (o_orderstatus outside {O, F}; the P rows are the "
    "real violations this surfaces), numeric range (o_totalprice "
    "outside (0, 400000]), and nullability (o_orderpriority) — plus "
    "the merged total row (part_epoch = -1) combined from the states "
    "by addition. The reference validates a table as one pass "
    "(validator.rs); this is the partitioned-incremental face the "
    "100 TB pipeline needs: validate only NEW partitions, merge their "
    "states into the committed ledger, and the table-level verdict "
    "updates without touching old data. Violation counts are exact "
    "integers, so merged == recomputed exactly.",
)
def incremental_validation_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    state = o.groupBy(
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "part_epoch"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F")).cast("long")
        ).alias("n_status_viol"),
        F.sum(
            (
                (F.col("o_totalprice") <= 0.0)
                | (F.col("o_totalprice") > 400000.0)
            ).cast("long")
        ).alias("n_price_viol"),
        F.sum(F.col("o_orderpriority").isNull().cast("long")).alias(
            "n_null_priority"
        ),
    ).localCheckpoint()
    merged = state.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_status_viol").alias("n_status_viol"),
        F.sum("n_price_viol").alias("n_price_viol"),
        F.sum("n_null_priority").alias("n_null_priority"),
    ).select(
        F.lit(-1).cast("long").alias("part_epoch"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_status_viol").cast("long").alias("n_status_viol"),
        F.col("n_price_viol").cast("long").alias("n_price_viol"),
        F.col("n_null_priority").cast("long").alias("n_null_priority"),
    )
    return state.select(
        "part_epoch", "n_rows", "n_status_viol", "n_price_viol",
        "n_null_priority",
    ).unionByName(merged)


_HIST_EDGES = [2000.0, 5000.0, 10000.0, 20000.0, 40000.0, 60000.0,
               80000.0, 100000.0]
_HIST_QS = [0.5, 0.9, 0.99]

_HIST_BUCKET_SQL = " + ".join(
    f"CAST((l_extendedprice >= {e}) AS INT)" for e in _HIST_EDGES
)

_HIST_MERGE_ORACLE = f"""WITH b AS (
  SELECT l_returnflag, {_HIST_BUCKET_SQL} AS bucket FROM lineitem
), state AS (
  SELECT l_returnflag, bucket, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY 1, 2
), merged AS (
  SELECT bucket, CAST(sum(n) AS BIGINT) AS n FROM state GROUP BY 1
), cum AS (
  SELECT bucket, CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum
  FROM merged
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM merged
), qs AS (
  SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q
), sel AS (
  SELECT q, min(bucket) AS bucket
  FROM qs, cum, tot WHERE cum >= ceil(q * nt) GROUP BY q
)
SELECT s.q, CAST(s.bucket AS BIGINT) AS bucket,
       c.cum AS cum_le, t.nt AS n_total
FROM sel s JOIN cum c ON c.bucket = s.bucket, tot t"""


@stage(
    "histogram_quantile_merge_lineitem",
    _HIST_MERGE_ORACLE,
    "mergeable quantile state (the t-digest/KLL role, oracle-exact): "
    "fixed-edge histograms over l_extendedprice are built PER "
    "l_returnflag partition, merged by pure bucket addition, and "
    "p50/p90/p99 read off the MERGED counts as the first bucket whose "
    "cumulative count reaches ceil(q*N). Fixed edges trade adaptive "
    "resolution for exact mergeability and cross-engine determinism — "
    "the same trade the round-10 fixed-edge shape tests make, and the "
    "production choice when the same sketch must merge across days "
    "and clusters. Scale shape: one scan with a map-side codegen "
    "bucket expression, a ~flags x 9-bucket state table, a 9-row "
    "ordered window (metadata), and a 3-row quantile read-off; "
    "nothing grows with the corpus.",
)
def histogram_quantile_merge_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    bucket = None
    for e in _HIST_EDGES:
        t = (F.col("l_extendedprice") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    state = (
        li.select("l_returnflag", bucket.alias("bucket"))
        .groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the base-table scan+aggregate runs once.
    merged = (
        state.groupBy("bucket")
        .agg(F.sum("n").alias("n"))
        .localCheckpoint()
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "bucket", F.sum("n").over(w).cast("long").alias("cum")
    )
    tot = merged.agg(F.sum("n").cast("long").alias("nt"))
    qs = F.array(*[F.lit(q).cast("double") for q in _HIST_QS])
    picked = (
        cum.crossJoin(F.broadcast(tot))
        .select("bucket", "cum", "nt", F.explode(qs).alias("q"))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("nt")))
        .groupBy("q", "nt")
        .agg(F.min(F.struct("bucket", "cum")).alias("s"))
    )
    return picked.select(
        "q",
        F.col("s.bucket").cast("long").alias("bucket"),
        F.col("s.cum").alias("cum_le"),
        F.col("nt").alias("n_total"),
    )


_MOMENTS_ORACLE = """WITH state AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT))
              AS BIGINT) AS s1,
         CAST(sum(CAST(round(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                             * 10000.0) AS BIGINT)) AS BIGINT) AS s2
  FROM events WHERE value IS NOT NULL GROUP BY 1
), both_levels AS (
  SELECT event_type, n, s1, s2 FROM state
  UNION ALL
  SELECT '__all__', CAST(sum(n) AS BIGINT), CAST(sum(s1) AS BIGINT),
         CAST(sum(s2) AS BIGINT)
  FROM state
)
SELECT event_type, n,
       round(CAST(s1 AS DOUBLE) / 100.0 / n, 6) AS mean,
       round(CAST(s2 AS DOUBLE) / 10000.0 / n
             - (CAST(s1 AS DOUBLE) / 100.0 / n)
             * (CAST(s1 AS DOUBLE) / 100.0 / n), 6) AS variance
FROM both_levels"""


@stage(
    "moments_merge_events",
    _MOMENTS_ORACLE,
    "mergeable moment state: quantized-exact (n, Σx, Σx²) per "
    "event_type — value sits on the 0.01 grid, so Σx at 1e2 and Σx² "
    "at 1e4 are lossless int64 (Σx² capacity ~3.8e9 rows of this "
    "value domain per aggregation cell before overflow — per-GROUP "
    "here, so far beyond any per-type volume; re-quantize or "
    "tree-merge in two tiers beyond that) — "
    "with the '__all__' row MERGED from the states by addition, never "
    "recomputed. Mean and population variance derive from the merged "
    "sums in one documented double-op order (s2/q2/n - (s1/q1/n)^2, "
    "6dp). Moment states are the canonical mergeable-statistics "
    "example: any partitioning, any merge tree, bit-identical "
    "results — what makes incremental profile ledgers trustworthy.",
)
def moments_merge_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    v = F.col("value").cast("double")
    state = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(v * F.lit(100.0)).cast("long")).alias("s1"),
        F.sum(F.round(v * v * F.lit(10000.0)).cast("long")).alias("s2"),
    ).localCheckpoint()
    merged = state.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s1").cast("long").alias("s1"),
        F.sum("s2").cast("long").alias("s2"),
    ).select(F.lit("__all__").alias("event_type"), "n", "s1", "s2")
    both = state.unionByName(merged)
    mean = F.col("s1").cast("double") / F.lit(100.0) / F.col("n")
    return both.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(
            F.col("s2").cast("double") / F.lit(10000.0) / F.col("n")
            - mean * mean,
            6,
        ).alias("variance"),
    )


_ZONE_MAP_ORACLE = """WITH bounds AS (
  SELECT CAST(min(floor(epoch(l_shipdate))) AS BIGINT) AS mn,
         CAST(max(floor(epoch(l_shipdate))) AS BIGINT) AS mx
  FROM lineitem
), pred AS (
  SELECT mn + CAST(floor((mx - mn) / 3.0) AS BIGINT) AS lo,
         mn + 2 * CAST(floor((mx - mn) / 3.0) AS BIGINT) AS hi
  FROM bounds
), zones AS (
  SELECT CAST(floor(epoch(date_trunc('month', l_shipdate))) AS BIGINT)
           AS part_epoch,
         CAST(count(*) AS BIGINT) AS n,
         CAST(min(floor(epoch(l_shipdate))) AS BIGINT) AS zmin_s,
         CAST(max(floor(epoch(l_shipdate))) AS BIGINT) AS zmax_s
  FROM lineitem GROUP BY 1
)
SELECT z.part_epoch, z.n, z.zmin_s, z.zmax_s,
       CAST(CASE WHEN z.zmax_s < p.lo OR z.zmin_s > p.hi
                 THEN 1 ELSE 0 END AS BIGINT) AS prunable
FROM zones z, pred p"""


@stage(
    "zone_map_prune_lineitem",
    _ZONE_MAP_ORACLE,
    "mergeable scan-pruning state: per-ship-month ZONE MAPS (row "
    "count, min/max ship epoch) scored against a middle-third "
    "time-window predicate derived from the global bounds — each "
    "partition's row says whether a reader with that predicate can "
    "PROVE it never needs to open the partition (zmax < lo or zmin > "
    "hi). Zone maps are the min/max face of the mergeable-state "
    "family (merge = min/min, max/max) and what parquet row-group "
    "statistics give Spark's partition pruning for free when data is "
    "written time-clustered; this query is the audit that measures "
    "how much of the table a time-windowed training job can skip. "
    "Scale shape: one scan into a ~months-row state table, the "
    "1-row predicate broadcast-joined.",
)
def zone_map_prune_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    es = F.unix_timestamp(F.col("l_shipdate"))
    bounds = li.agg(
        F.min(es).alias("mn"), F.max(es).alias("mx")
    )
    pred = bounds.select(
        (
            F.col("mn")
            + F.floor((F.col("mx") - F.col("mn")) / F.lit(3.0)).cast("long")
        ).alias("lo"),
        (
            F.col("mn")
            + F.lit(2)
            * F.floor((F.col("mx") - F.col("mn")) / F.lit(3.0)).cast("long")
        ).alias("hi"),
    )
    zones = li.groupBy(
        F.unix_timestamp(F.date_trunc("month", F.col("l_shipdate"))).alias(
            "part_epoch"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(es).alias("zmin_s"),
        F.max(es).alias("zmax_s"),
    )
    return zones.crossJoin(F.broadcast(pred)).select(
        "part_epoch",
        "n",
        "zmin_s",
        "zmax_s",
        F.when(
            (F.col("zmax_s") < F.col("lo")) | (F.col("zmin_s") > F.col("hi")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("prunable"),
    )


# =====================================================================
# B. Embedding drift over the IVF index
# =====================================================================

_IVF_K = 4

# the established kmeans/IVF oracle conventions (queries_more.py
# _KMEANS_ORACLE): doubles, list_sum over an index-ordered transform
# (mirrors F.aggregate/zip_with's left fold), assignment tie-break
# ORDER BY d2, cid
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
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def _seed_centroids(base) -> list[tuple[int, list[float]]]:
    """First-k seed vectors as (cid, vec) literals — the kmeans/IVF
    'centroids are metadata' convention (collected once, ride the
    closure as literals, broadcast by construction)."""
    rows = base.filter(F.col("vec_id") < _IVF_K).orderBy("vec_id").collect()
    return [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in rows]


def _assign_expr(cent_pairs):
    """(best_cid, best_d2) against literal centroids — the
    array-min/array-position argmin shape from kmeans_embeddings_2iter
    (each d2 appears once in the tree; lowest cid wins ties, matching
    the oracle's ORDER BY d2, cid). Built as parsed SQL (optimization
    r16, guide §7.3): the Column-lambda build cost ~0.4 s of driver
    py4j round-trips per assignment; the parsed tree is the same
    expression, so assignments are bit-identical."""
    from .ext.similarity import argmin_assign_cols

    return argmin_assign_cols(cent_pairs)


_CENTROID_SHIFT_ORACLE = (
    _EMB_CTE
    + """, sums AS (
  SELECT a.cid, a.h, t.pos,
         CAST(sum(CAST(round(e.v[t.pos + 1] * 1000000000.0) AS BIGINT))
              AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM emb e JOIN a0 a ON e.vec_id = a.vec_id, range(0, 64) t(pos)
  GROUP BY 1, 2, 3
), means AS (
  SELECT cid, h, pos, CAST(s AS DOUBLE) / 1000000000.0 / n AS m
  FROM sums
), pivoted AS (
  SELECT cid, pos,
         sum(CASE WHEN h = 0 THEN m END) AS ma,
         sum(CASE WHEN h = 1 THEN m END) AS mb
  FROM means GROUP BY 1, 2
), cnt AS (
  SELECT cid,
         CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM a0 GROUP BY 1
), lists AS (
  SELECT cid, list(ma ORDER BY pos) AS la, list(mb ORDER BY pos) AS lb
  FROM pivoted GROUP BY cid
), shift AS (
  SELECT cid,
         sqrt(list_sum(list_transform(
           range(1, 65), i -> (la[i] - lb[i]) * (la[i] - lb[i])
         ))) AS d
  FROM lists
)
SELECT CAST(c.cid AS BIGINT) AS cid, c.n_a, c.n_b,
       round(s.d, 6) AS shift_l2
FROM cnt c JOIN shift s ON s.cid = c.cid"""
)


@stage(
    "centroid_shift_embeddings",
    _CENTROID_SHIFT_ORACLE,
    "embedding drift, centroid face: per IVF cell (assignment to the "
    "seed centroids, the established first-k convention), the "
    "quantized-exact per-dimension mean of the index-build half A "
    "(vec_id even) and the post-build half B, and the L2 distance "
    "between the two half-centroids — THE number that says the cell's "
    "population moved since the index was trained. Spark shape: one "
    "corpus scan into a 64-column wide aggregate per (cell, half) "
    "(quantized 1e9 int64 sums; no posexplode row blowup), an 8-row "
    "second-level pivot, and a zip_with fold for the shift — "
    "centroids stay metadata-sized at any corpus scale. The oracle "
    "mirrors the fold via index-ordered list_sum.",
)
def centroid_shift_embeddings(spark, sf_dir):
    # the 64-column wide aggregate, pivot and shift fold are built as
    # parsed SQL strings (optimization r16, guide §7.3): the former
    # Column-object construction cost ~2.8 s of driver py4j round-trips
    # per call (measured: state 0.64 + pivot 1.24 + shift 0.96 s) while
    # parsing the same expressions takes ~10 ms. The parsed trees are
    # the same expressions, so results are bit-identical.
    base = _emb_base(spark, sf_dir)
    cents = _seed_centroids(base)
    cid, _d2, _ = _assign_expr(cents)
    q9 = "CAST('1000000000.0' AS DOUBLE)"
    state = (
        base.select(cid.alias("cid"), "h", "v")
        .groupBy("cid", "h")
        .agg(
            F.expr("count(1) AS n"),
            *[
                F.expr(
                    f"sum(CAST(round(get(v, {i}) * {q9}) AS BIGINT)) AS s{i}"
                )
                for i in range(64)
            ],
        )
    )
    pivoted = state.groupBy("cid").agg(
        F.expr("CAST(sum(CASE WHEN h = 0 THEN n END) AS BIGINT) AS n_a"),
        F.expr("CAST(sum(CASE WHEN h = 1 THEN n END) AS BIGINT) AS n_b"),
        *[
            F.expr(
                f"CAST(sum(CASE WHEN h = 0 THEN s{i} END) AS BIGINT) AS a{i}"
            )
            for i in range(64)
        ],
        *[
            F.expr(
                f"CAST(sum(CASE WHEN h = 1 THEN s{i} END) AS BIGINT) AS b{i}"
            )
            for i in range(64)
        ],
    )
    ma = (
        "array("
        + ", ".join(f"CAST(a{i} AS DOUBLE) / {q9} / n_a" for i in range(64))
        + ")"
    )
    mb = (
        "array("
        + ", ".join(f"CAST(b{i} AS DOUBLE) / {q9} / n_b" for i in range(64))
        + ")"
    )
    return pivoted.selectExpr(
        "CAST(cid AS BIGINT) AS cid",
        "n_a",
        "n_b",
        f"round(sqrt(aggregate(zip_with({ma}, {mb}, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + x)), 6) AS shift_l2",
    )


_CELL_PSI_ORACLE = (
    _EMB_CTE
    + """, cnt AS (
  SELECT cid,
         CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM a0 GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS tr, CAST(sum(n_cur) AS BIGINT) AS tc
  FROM cnt
)
SELECT CAST(c.cid AS BIGINT) AS cid, c.n_ref, c.n_cur,
       round((CAST(c.n_cur AS DOUBLE) / t.tc
              - CAST(c.n_ref AS DOUBLE) / t.tr)
             * ln((CAST(c.n_cur AS DOUBLE) / t.tc + 1e-6)
                  / (CAST(c.n_ref AS DOUBLE) / t.tr + 1e-6)), 6)
         AS psi_term
FROM cnt c, tot t"""
)


@stage(
    "cell_occupancy_psi_embeddings",
    _CELL_PSI_ORACLE,
    "embedding drift, occupancy face: PSI terms between the IVF "
    "cells' occupancy shares in the index-build half A (reference) "
    "and post-build half B (current) — the psi_bins_lineitem "
    "convention (eps=1e-6, 6dp) applied to the ANN index's own cell "
    "histogram. Centroid shift says WHERE a cell's population went; "
    "occupancy PSI says whether query traffic will now land in cells "
    "whose inverted lists no longer reflect training — the cheap "
    "always-on staleness monitor (cell counts are metadata: one scan, "
    "k-row aggregate, 1-row totals broadcast). Re-index when the "
    "summed terms cross the classical 0.2 PSI alarm.",
)
def cell_occupancy_psi_embeddings(spark, sf_dir):
    base = _emb_base(spark, sf_dir)
    cents = _seed_centroids(base)
    cid, _d2, _ = _assign_expr(cents)
    cnt = (
        base.select(cid.alias("cid"), "h")
        .groupBy("cid")
        .agg(
            F.sum((F.col("h") == 0).cast("long")).alias("n_ref"),
            F.sum((F.col("h") == 1).cast("long")).alias("n_cur"),
        )
        .localCheckpoint()
    )
    tot = cnt.agg(
        F.sum("n_ref").cast("long").alias("tr"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    r_ref = F.col("n_ref").cast("double") / F.col("tr")
    r_cur = F.col("n_cur").cast("double") / F.col("tc")
    return cnt.crossJoin(F.broadcast(tot)).select(
        F.col("cid").cast("long").alias("cid"),
        "n_ref",
        "n_cur",
        F.round(
            (r_cur - r_ref)
            * F.log((r_cur + F.lit(1e-6)) / (r_ref + F.lit(1e-6))),
            6,
        ).alias("psi_term"),
    )


_COORD_EDGES = [-200000.0, -100000.0, -50000.0, 0.0, 50000.0, 100000.0,
                200000.0]

_COORD_EDGE_SUM = " + ".join(
    f"CAST((q0 >= {e}) AS INT)" for e in _COORD_EDGES
)

_COORD_DRIFT_ORACLE = f"""WITH v AS (
  SELECT CAST(vec_id % 2 AS BIGINT) AS split,
         CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT)
           AS q0
  FROM embeddings
), b AS (
  SELECT split, {_COORD_EDGE_SUM} AS bucket FROM v
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
FROM ecdf, tot t GROUP BY t.n0, t.n1"""


@stage(
    "coord_drift_bucketed_embeddings",
    _COORD_DRIFT_ORACLE,
    "embedding drift, coordinate face: fixed-edge bucketed two-sample "
    "KS between the halves on the quantized first coordinate "
    "(round(x0*1e6) — an exact int64, so bucket assignment is "
    "deterministic in both engines; the corpus is unit-normalized, "
    "which makes NORM drift vacuous and per-coordinate drift the "
    "right marginal signal — run one per tracked dimension in "
    "production). Reuses the round-10 oracle-paired fixed-edge path "
    "(ext.stats.ks_two_sample_bucketed(edges=...)) on a second table: "
    "map-side bucket expression, 8-step bounded ECDF, guarded "
    "divides. Distribution-level drift here catches what the "
    "cell-level monitors miss when movement stays within cells.",
)
def coord_drift_bucketed_embeddings(spark, sf_dir):
    from .ext.stats import ks_two_sample_bucketed

    v = load_table(spark, sf_dir, "embeddings").select(
        F.pmod(F.col("vec_id"), F.lit(2)).cast("long").alias("split"),
        F.round(F.get("embedding", 0).cast("double") * F.lit(1e6))
        .cast("long")
        .cast("double")
        .alias("q0"),
    )
    return ks_two_sample_bucketed(
        v, split_col="split", value_col="q0", edges=_COORD_EDGES
    )


_STALENESS_ORACLE = (
    _EMB_CTE
    + """, per AS (
  SELECT cid,
         CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN h = 0
                       THEN CAST(round(d2 * 1000000.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS qa,
         CAST(sum(CASE WHEN h = 1
                       THEN CAST(round(d2 * 1000000.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS qb
  FROM a0 GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb
  FROM per
), scored AS (
  SELECT p.cid, p.n_a, p.n_b,
         round(CAST(p.n_b AS DOUBLE) / t.tb
               - CAST(p.n_a AS DOUBLE) / t.ta, 6) AS occ_delta,
         round(CAST(p.qa AS DOUBLE) / 1000000.0 / p.n_a, 6) AS resid_a,
         round(CAST(p.qb AS DOUBLE) / 1000000.0 / p.n_b, 6) AS resid_b
  FROM per p, tot t
)
SELECT CAST(cid AS BIGINT) AS cid, n_a, n_b, occ_delta, resid_a, resid_b,
       CAST(CASE WHEN resid_b > resid_a * 1.1 THEN 1 ELSE 0 END AS BIGINT)
         AS stale_flag
FROM scored"""
)


@stage(
    "index_staleness_embeddings",
    _STALENESS_ORACLE,
    "embedding drift, residual face — the re-index decision row: per "
    "IVF cell, occupancy delta between halves AND the mean squared "
    "residual (distance to the BUILD-TIME centroid) per half, "
    "quantized-exact 1e6 sums, with stale_flag = post-build residual "
    "exceeding build residual by >10% (compared on the 6dp-rounded "
    "values, so the flag is deterministic cross-engine). Rising "
    "residuals with stable occupancy is the quiet failure mode — "
    "vectors still land in the cell but sit farther from its "
    "centroid, so nprobe recall decays without any occupancy signal; "
    "this is the monitor that catches it. One scan, assignment "
    "against literal centroids, k-row aggregate + 1-row totals "
    "broadcast.",
)
def index_staleness_embeddings(spark, sf_dir):
    base = _emb_base(spark, sf_dir)
    cents = _seed_centroids(base)
    cid, d2, _ = _assign_expr(cents)
    qd2 = F.round(d2 * F.lit(1e6)).cast("long")
    per = (
        base.select(cid.alias("cid"), "h", qd2.alias("qd2"))
        .groupBy("cid")
        .agg(
            F.sum((F.col("h") == 0).cast("long")).alias("n_a"),
            F.sum((F.col("h") == 1).cast("long")).alias("n_b"),
            F.sum(
                F.when(F.col("h") == 0, F.col("qd2")).otherwise(F.lit(0))
            ).alias("qa"),
            F.sum(
                F.when(F.col("h") == 1, F.col("qd2")).otherwise(F.lit(0))
            ).alias("qb"),
        )
        .localCheckpoint()
    )
    tot = per.agg(
        F.sum("n_a").cast("long").alias("ta"),
        F.sum("n_b").cast("long").alias("tb"),
    )
    occ_delta = F.round(
        F.col("n_b").cast("double") / F.col("tb")
        - F.col("n_a").cast("double") / F.col("ta"),
        6,
    )
    resid_a = F.round(
        F.col("qa").cast("double") / F.lit(1e6) / F.col("n_a"), 6
    )
    resid_b = F.round(
        F.col("qb").cast("double") / F.lit(1e6) / F.col("n_b"), 6
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("cid").cast("long").alias("cid"),
            "n_a",
            "n_b",
            occ_delta.alias("occ_delta"),
            resid_a.alias("resid_a"),
            resid_b.alias("resid_b"),
        )
        .select(
            "cid",
            "n_a",
            "n_b",
            "occ_delta",
            "resid_a",
            "resid_b",
            F.when(F.col("resid_b") > F.col("resid_a") * F.lit(1.1), 1)
            .otherwise(0)
            .cast("long")
            .alias("stale_flag"),
        )
    )


_MARGIN_DRIFT_ORACLE = (
    _EMB_CTE
    + """, ranked AS (
  SELECT vec_id, h, cid, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM d0
), margins AS (
  SELECT b.vec_id, b.h, b.cid,
         CAST(round((s.d2 - b.d2) * 1000000.0) AS BIGINT) AS qm
  FROM ranked b JOIN ranked s
    ON s.vec_id = b.vec_id AND b.rn = 1 AND s.rn = 2
)
SELECT CAST(cid AS BIGINT) AS cid, CAST(h AS BIGINT) AS half,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(CAST(sum(qm) AS BIGINT) AS DOUBLE) / 1000000.0
             / count(*), 6) AS mean_margin
FROM margins GROUP BY 1, 2"""
)


@stage(
    "assignment_margin_drift_embeddings",
    _MARGIN_DRIFT_ORACLE,
    "embedding drift, ambiguity face: per (cell, half), the mean "
    "margin between the SECOND-nearest and nearest centroid distance "
    "(quantized-exact 1e6 sums, 6dp mean). A shrinking margin in the "
    "post-build half means vectors increasingly sit between cells — "
    "the regime where single-probe IVF recall collapses and nprobe "
    "must grow — and it moves before occupancy or residuals do. "
    "Spark computes both distances from ONE evaluation of the "
    "k-distance array (array_sort for the two smallest; no second "
    "pass, no join), where the oracle replays rn=1/rn=2 over the "
    "distance table; the margin doubles are identical because the "
    "d2 formula and fold order are identical.",
)
def assignment_margin_drift_embeddings(spark, sf_dir):
    base = _emb_base(spark, sf_dir)
    cents = _seed_centroids(base)
    cid, best_d2, d2s = _assign_expr(cents)
    sorted_d2 = F.array_sort(d2s)
    margin = F.element_at(sorted_d2, 2) - F.element_at(sorted_d2, 1)
    qm = F.round(margin * F.lit(1e6)).cast("long")
    return (
        base.select(cid.alias("cid"), F.col("h").alias("half"), qm.alias("qm"))
        .groupBy("cid", "half")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("qm").cast("double") / F.lit(1e6) / F.count(F.lit(1)),
                6,
            ).alias("mean_margin"),
        )
        .select(
            F.col("cid").cast("long").alias("cid"),
            "half",
            "n",
            "mean_margin",
        )
    )


# =====================================================================
# C. SCD2 snapshot diff (cross-snapshot checks over the round-9
#    warehouse build)
# =====================================================================

# the round-9 _SCD2_ORACLE interval build (queries_staging_r9.py),
# extended with epoch bounds and the derived snapshot times: t1/t2 at
# the thirds of the stream's [min, max] epoch span (integer floor
# arithmetic, exact in both engines)
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
  SELECT mn + CAST(floor((mx - mn) / 3.0) AS BIGINT) AS t1,
         mn + 2 * CAST(floor((mx - mn) / 3.0) AS BIGINT) AS t2,
         mn + CAST(floor((mx - mn) / 2.0) AS BIGINT) AS tmid
  FROM bounds
)"""

_SNAPSHOT_DIFF_ORACLE = (
    _SCD2_IV_CTE
    + """, s1 AS (
  SELECT user_id, version_no FROM iv, tt
  WHERE valid_from_s <= t1 AND (valid_to_s IS NULL OR valid_to_s > t1)
), s2 AS (
  SELECT user_id, version_no FROM iv, tt
  WHERE valid_from_s <= t2 AND (valid_to_s IS NULL OR valid_to_s > t2)
)
SELECT CASE WHEN s1.user_id IS NULL THEN 'new'
            WHEN s2.version_no = s1.version_no THEN 'unchanged'
            ELSE 'changed' END AS change_class,
       CAST(count(*) AS BIGINT) AS n_users
FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id
GROUP BY 1"""
)


def _events_tt(spark, sf_dir):
    """(events frame, 1-row broadcastable t1/t2/tmid frame)."""
    ev = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp(F.col("ts"))
    bounds = ev.agg(F.min(es).alias("mn"), F.max(es).alias("mx"))
    third = F.floor((F.col("mx") - F.col("mn")) / F.lit(3.0)).cast("long")
    half = F.floor((F.col("mx") - F.col("mn")) / F.lit(2.0)).cast("long")
    tt = bounds.select(
        (F.col("mn") + third).alias("t1"),
        (F.col("mn") + F.lit(2) * third).alias("t2"),
        (F.col("mn") + half).alias("tmid"),
    )
    return ev, tt


def _scd2_iv_epochs(spark, sf_dir):
    from .ext.warehouse import scd2_intervals

    ev, tt = _events_tt(spark, sf_dir)
    iv = scd2_intervals(ev, "user_id", "event_type", "ts", "event_id")
    return (
        iv.select(
            "user_id",
            "version_no",
            "event_type",
            F.unix_timestamp("valid_from").alias("valid_from_s"),
            F.unix_timestamp("valid_to").alias("valid_to_s"),
            F.col("n_rows").alias("n_events"),
        ),
        tt,
    )


def _asof(iv_t, t_col: str):
    return iv_t.filter(
        (F.col("valid_from_s") <= F.col(t_col))
        & (F.col("valid_to_s").isNull() | (F.col("valid_to_s") > F.col(t_col)))
    )


@stage(
    "scd2_snapshot_diff_events",
    _SNAPSHOT_DIFF_ORACLE,
    "cross-snapshot SCD2 diff: reconstruct the dimension AS OF two "
    "snapshot times (the thirds of the stream's epoch span) from the "
    "round-9 SCD2 interval build, and classify every key's transition "
    "— new (absent at T1), changed (different version), unchanged. "
    "This is the audit a warehouse runs to answer 'what did the last "
    "month of MERGEs actually do to the dimension' without storing "
    "per-snapshot copies: the interval table IS every snapshot, and "
    "any as-of reconstruction is one filter over it. Scale: the "
    "interval build is the single-shuffle gaps-and-islands pass "
    "(scd2_intervals_events), both snapshot filters are map-side over "
    "it with the 1-row t1/t2 frame broadcast, and the diff join is "
    "keyed on user — one extra shuffle bounded by key cardinality, "
    "not event volume.",
)
def scd2_snapshot_diff_events(spark, sf_dir):
    iv, tt = _scd2_iv_epochs(spark, sf_dir)
    iv_t = iv.crossJoin(F.broadcast(tt))
    s1 = _asof(iv_t, "t1").select("user_id", F.col("version_no").alias("v1"))
    s2 = _asof(iv_t, "t2").select("user_id", F.col("version_no").alias("v2"))
    return (
        s2.join(s1, "user_id", "left")
        .select(
            F.when(F.col("v1").isNull(), "new")
            .when(F.col("v2") == F.col("v1"), "unchanged")
            .otherwise("changed")
            .alias("change_class")
        )
        .groupBy("change_class")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_ASOF_SNAPSHOT_ORACLE = (
    _SCD2_IV_CTE
    + """
SELECT CAST(user_id AS BIGINT) AS user_id, version_no, event_type,
       valid_from_s, tmid - valid_from_s AS age_s
FROM iv, tt
WHERE valid_from_s <= tmid AND (valid_to_s IS NULL OR valid_to_s > tmid)"""
)


@stage(
    "scd2_asof_snapshot_events",
    _ASOF_SNAPSHOT_ORACLE,
    "SCD2 as-of reconstruction — the time-travel read itself: the "
    "full dimension snapshot at the stream's midpoint epoch, one row "
    "per key holding the version valid at T (version_no, attribute, "
    "valid_from, age at T). The companion to scd2_snapshot_diff_"
    "events: diff classifies transitions between two snapshots, this "
    "materializes one snapshot — what a training job joins against "
    "to get point-in-time-correct dimension attributes for features "
    "(the batch face of pit_features_events' leakage discipline). "
    "One interval-build shuffle, then a map-side as-of filter with "
    "the 1-row T broadcast; no per-snapshot storage.",
)
def scd2_asof_snapshot_events(spark, sf_dir):
    iv, tt = _scd2_iv_epochs(spark, sf_dir)
    iv_t = iv.crossJoin(F.broadcast(tt))
    return _asof(iv_t, "tmid").select(
        F.col("user_id").cast("long").alias("user_id"),
        "version_no",
        "event_type",
        "valid_from_s",
        (F.col("tmid") - F.col("valid_from_s")).alias("age_s"),
    )


_CONTRACT_DIFF_ORACLE = (
    _SCD2_IV_CTE
    + """, win AS (
  SELECT e.event_type,
         CASE WHEN floor(epoch(e.ts)) <= t.tmid THEN 0 ELSE 1 END AS w,
         CAST(e.value AS DOUBLE) AS value
  FROM events e, tt t
), agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN w = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN w = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN w = 0 AND value > 100.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS g_a,
         CAST(sum(CASE WHEN w = 1 AND value > 100.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS g_b,
         CAST(sum(CASE WHEN w = 0 AND value < 1.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS l_a,
         CAST(sum(CASE WHEN w = 1 AND value < 1.0 THEN 1 ELSE 0 END)
              AS BIGINT) AS l_b
  FROM win GROUP BY 1
)
SELECT event_type, n_a, n_b,
       round(CAST(g_a AS DOUBLE) / n_a, 6) AS gt100_share_a,
       round(CAST(g_b AS DOUBLE) / n_b, 6) AS gt100_share_b,
       round(CAST(g_b AS DOUBLE) / n_b - CAST(g_a AS DOUBLE) / n_a, 6)
         AS gt100_delta,
       round(CAST(l_a AS DOUBLE) / n_a, 6) AS lt1_share_a,
       round(CAST(l_b AS DOUBLE) / n_b, 6) AS lt1_share_b,
       round(CAST(l_b AS DOUBLE) / n_b - CAST(l_a AS DOUBLE) / n_a, 6)
         AS lt1_delta
FROM agg"""
)


@stage(
    "contract_violation_diff_events",
    _CONTRACT_DIFF_ORACLE,
    "cross-snapshot contract diff: the same two threshold checks "
    "(value > 100 tail share, value < 1 floor share) evaluated per "
    "event_type on the BEFORE-midpoint and AFTER-midpoint windows of "
    "the stream, with the share deltas — the contract pipeline's "
    "answer to 'did the data change between the snapshot we validated "
    "and the snapshot we're training on', which plain per-snapshot "
    "validation cannot see (both snapshots can individually pass "
    "while the tail share doubles). Shares are exact integer ratios "
    "divided once (6dp), so the diff is deterministic cross-engine. "
    "One scan, one fused aggregate per type (both windows counted in "
    "the same pass via conditional sums — no second scan, no join of "
    "two validation runs).",
)
def contract_violation_diff_events(spark, sf_dir):
    ev, tt = _events_tt(spark, sf_dir)
    es = F.unix_timestamp(F.col("ts"))
    v = F.col("value").cast("double")
    win = ev.crossJoin(F.broadcast(tt)).select(
        "event_type",
        F.when(es <= F.col("tmid"), 0).otherwise(1).alias("w"),
        v.alias("value"),
    )
    inw = lambda wv, cond: F.sum(  # noqa: E731
        ((F.col("w") == wv) & cond).cast("long")
    )
    agg = win.groupBy("event_type").agg(
        F.sum((F.col("w") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("w") == 1).cast("long")).alias("n_b"),
        inw(0, F.col("value") > 100.0).alias("g_a"),
        inw(1, F.col("value") > 100.0).alias("g_b"),
        inw(0, F.col("value") < 1.0).alias("l_a"),
        inw(1, F.col("value") < 1.0).alias("l_b"),
    )
    sh = lambda c, n: F.col(c).cast("double") / F.col(n)  # noqa: E731
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(sh("g_a", "n_a"), 6).alias("gt100_share_a"),
        F.round(sh("g_b", "n_b"), 6).alias("gt100_share_b"),
        F.round(sh("g_b", "n_b") - sh("g_a", "n_a"), 6).alias("gt100_delta"),
        F.round(sh("l_a", "n_a"), 6).alias("lt1_share_a"),
        F.round(sh("l_b", "n_b"), 6).alias("lt1_share_b"),
        F.round(sh("l_b", "n_b") - sh("l_a", "n_a"), 6).alias("lt1_delta"),
    )


_LIFETIME_EDGES = [60, 600, 3600, 21600, 86400, 604800]

_LIFETIME_BUCKET_SQL = " + ".join(
    f"CAST((life_s >= {e}) AS INT)" for e in _LIFETIME_EDGES
)

_VERSION_LIFETIME_ORACLE = (
    _SCD2_IV_CTE
    + f""", closed AS (
  SELECT valid_to_s - valid_from_s AS life_s FROM iv
  WHERE valid_to_s IS NOT NULL
), b AS (
  SELECT {_LIFETIME_BUCKET_SQL} AS bucket FROM closed
), cnt AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nt FROM cnt
)
SELECT CAST(c.bucket AS BIGINT) AS bucket, c.n,
       round(CAST(c.n AS DOUBLE) / t.nt, 6) AS share
FROM cnt c, tot t"""
)


@stage(
    "scd2_version_lifetime_events",
    _VERSION_LIFETIME_ORACLE,
    "SCD2 version-survival profile: the lifetime (valid_to - "
    "valid_from, seconds) of every CLOSED dimension version, bucketed "
    "on fixed log-spaced edges (1min/10min/1h/6h/1d/1w) with counts "
    "and shares — the distribution behind scd2_change_rate_events' "
    "time series. The left mass (sub-minute versions) is churn that "
    "MERGE batching would collapse; the right mass sizes how much "
    "history a given retention window actually keeps. Fixed edges "
    "keep it mergeable across incremental runs (the round-11 "
    "mergeable-state theme) and oracle-exact. One interval-build "
    "shuffle, then a map-side bucket expression into a 7-row "
    "aggregate.",
)
def scd2_version_lifetime_events(spark, sf_dir):
    iv, _tt = _scd2_iv_epochs(spark, sf_dir)
    closed = iv.filter(F.col("valid_to_s").isNotNull()).select(
        (F.col("valid_to_s") - F.col("valid_from_s")).alias("life_s")
    )
    bucket = None
    for e in _LIFETIME_EDGES:
        t = (F.col("life_s") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    # optimization r15 (guide §5): referenced twice downstream —
    # checkpoint so the base-table scan+aggregate runs once.
    cnt = (
        closed.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = cnt.agg(F.sum("n").cast("long").alias("nt"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        F.round(F.col("n").cast("double") / F.col("nt"), 6).alias("share"),
    )


_BATCH_SIZING_ORACLE = """SELECT
  CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
  CAST(count(*) AS BIGINT) AS n_versions,
  CAST(count(DISTINCT (user_id, event_type)) AS BIGINT) AS n_keys,
  round(CAST(count(*) AS DOUBLE)
        / count(DISTINCT (user_id, event_type)), 6) AS versions_per_key
FROM events GROUP BY 1"""


@stage(
    "upsert_batch_sizing_events",
    _BATCH_SIZING_ORACLE,
    "MERGE batch sizing: per day, the change-stream volume "
    "(n_versions), the distinct keys it touches (n_keys), and "
    "versions-per-key — the ratio that decides upsert cadence: near "
    "1.0 every version is a distinct key and batching buys nothing; "
    "high ratios mean pre-compacting the batch (cdc_last_write_wins) "
    "shrinks the MERGE by that factor before it ever touches the "
    "target table. Complements lww_compaction_ratio_events (the "
    "whole-stream number) with the per-day series operations actually "
    "schedules by. One groupBy(day) with a distinct-pair count — at "
    "100 TB the distinct rides the same day-partitioned shuffle "
    "(partial aggregation per mapper), no second pass.",
)
def upsert_batch_sizing_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias(
                "day_epoch"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.countDistinct("user_id", "event_type").alias("n_keys"),
        )
        .select(
            "day_epoch",
            "n_versions",
            F.col("n_keys").cast("long").alias("n_keys"),
            F.round(
                F.col("n_versions").cast("double") / F.col("n_keys"), 6
            ).alias("versions_per_key"),
        )
    )


# =====================================================================
# D. Training-data governance + corpus analytics
# =====================================================================

_KANON_VALUE_EDGES = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0]
_KANON_SIZE_EDGES = [2, 5, 10]

_KANON_VBUCKET_SQL = " + ".join(
    f"CAST((CAST(value AS DOUBLE) >= {e}) AS INT)"
    for e in _KANON_VALUE_EDGES
)
_KANON_SBUCKET_SQL = " + ".join(
    f"CAST((sz >= {e}) AS INT)" for e in _KANON_SIZE_EDGES
)

_KANON_ORACLE = f"""WITH qi AS (
  SELECT event_type, hour(ts) AS hr,
         CASE WHEN value IS NULL THEN -1
              ELSE {_KANON_VBUCKET_SQL} END AS vb
  FROM events
), classes AS (
  SELECT event_type, hr, vb, CAST(count(*) AS BIGINT) AS sz
  FROM qi GROUP BY 1, 2, 3
), hist AS (
  SELECT {_KANON_SBUCKET_SQL} AS size_bucket, sz FROM classes
)
SELECT CAST(size_bucket AS BIGINT) AS size_bucket,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(sz) AS BIGINT) AS n_rows
FROM hist GROUP BY 1"""


@stage(
    "k_anonymity_profile_events",
    _KANON_ORACLE,
    "training-data governance: k-anonymity profile over the "
    "quasi-identifier tuple (event_type, hour-of-day, fixed-edge "
    "value bucket) — equivalence-class sizes histogrammed as "
    "singletons / 2-4 / 5-9 / 10+ with the row mass in each tier. "
    "The singleton and 2-4 tiers are the re-identification surface: "
    "rows whose QI tuple is (near-)unique must be suppressed or "
    "generalized before the table ships as training data, and this "
    "profile sizes that cut BEFORE anyone picks k. Two exact "
    "aggregations (rows -> classes -> histogram), both key-bounded; "
    "the QI bucketing is a map-side codegen expression, so the "
    "profile costs one scan at any corpus size.",
)
def k_anonymity_profile_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    vb = None
    for e in _KANON_VALUE_EDGES:
        t = (F.col("value").cast("double") >= F.lit(e)).cast("int")
        vb = t if vb is None else vb + t
    qi = ev.select(
        "event_type",
        F.hour("ts").alias("hr"),
        F.when(F.col("value").isNull(), -1).otherwise(vb).alias("vb"),
    )
    classes = qi.groupBy("event_type", "hr", "vb").agg(
        F.count(F.lit(1)).alias("sz")
    )
    sb = None
    for e in _KANON_SIZE_EDGES:
        t = (F.col("sz") >= F.lit(e)).cast("int")
        sb = t if sb is None else sb + t
    return (
        classes.select(sb.cast("long").alias("size_bucket"), "sz")
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("sz").cast("long").alias("n_rows"),
        )
    )


_PMI_ORACLE = """WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                     x -> x <> '') AS t
  FROM documents
), pos AS (
  SELECT t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2
), big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2 FROM pos
), uni AS (
  SELECT unnest(t) AS w FROM toks
), ucnt AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w
), utot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nu FROM ucnt
), bcnt AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
  FROM big GROUP BY 1, 2 HAVING count(*) >= 5
), btot AS (
  SELECT CAST(count(*) AS BIGINT) AS nb FROM big
)
SELECT b.w1, b.w2, b.c,
       round((CAST(b.c AS DOUBLE) / t.nb)
             / ((CAST(x.c AS DOUBLE) / u.nu)
                * (CAST(y.c AS DOUBLE) / u.nu)), 6) AS lift
FROM bcnt b
JOIN ucnt x ON x.w = b.w1
JOIN ucnt y ON y.w = b.w2, btot t, utot u
ORDER BY lift DESC, b.w1, b.w2 LIMIT 20"""


@stage(
    "pmi_lift_bigrams_documents",
    _PMI_ORACLE,
    "collocation mining: top-20 word bigrams by PMI LIFT — "
    "p(xy) / (p(x)p(y)), the exponentiated PMI — with a count floor "
    "of 5 (unsmoothed PMI is maximal for hapax pairs; the floor is "
    "the standard fix). Lift ranks identically to PMI (log is "
    "monotone) while staying log-free: every factor is an exact "
    "integer ratio and the combining multiplications/divisions are "
    "IEEE-exact-rounded, so 6dp survives cross-engine where a "
    "transcendental log could flip a last-ulp tie (the established "
    "exactness discipline). Collocations feed tokenizer vocab "
    "decisions and template detection. Scale shape: bigram counts "
    "and unigram counts are two key-bounded aggregates off one "
    "tokenize pass; the lift join is keyed on words (vocabulary-"
    "bounded), totals ride 1-row broadcasts, and the top-20 is a "
    "TakeOrdered — no global sort.",
)
def pmi_lift_bigrams_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents").select(
        tokens_col(F.lower(F.col("text"))).alias("t")
    )
    big = docs.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("s")
    ).select("s.w1", "s.w2")
    # optimization r15 (guide §5): big feeds the bigram counts AND the
    # bigram total, ucnt its total + both unigram sides — eager
    # localCheckpoints run each corpus explode once.
    big = big.localCheckpoint()
    uni = docs.select(F.explode("t").alias("w"))
    ucnt = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    utot = ucnt.agg(F.sum("c").cast("long").alias("nu"))
    bcnt = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
    )
    btot = big.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    x = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("cx"))
    y = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("cy"))
    lift = (F.col("c").cast("double") / F.col("nb")) / (
        (F.col("cx").cast("double") / F.col("nu"))
        * (F.col("cy").cast("double") / F.col("nu"))
    )
    return (
        bcnt.join(x, "w1")
        .join(y, "w2")
        .crossJoin(F.broadcast(btot))
        .crossJoin(F.broadcast(utot))
        .select(
            "w1", "w2", "c", F.round(lift, 6).alias("lift")
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(20)
    )


_DOCLEN_EDGES = [64, 96, 128, 192, 256, 384, 512]

_DOCLEN_BUCKET_SQL = " + ".join(
    f"CAST((n_chars >= {e}) AS INT)" for e in _DOCLEN_EDGES
)

_DOCLEN_ORACLE = f"""WITH b AS (
  SELECT source, {_DOCLEN_BUCKET_SQL} AS bucket FROM documents
), cnt AS (
  SELECT source, bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2
), tot AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM cnt GROUP BY 1
)
SELECT c.source, CAST(c.bucket AS BIGINT) AS bucket, c.n,
       round(CAST(c.n AS DOUBLE) / t.nt, 6) AS share
FROM cnt c JOIN tot t ON t.source = c.source"""


@stage(
    "doclen_histogram_by_source_documents",
    _DOCLEN_ORACLE,
    "corpus shape audit: per-source document-length histogram on "
    "fixed character-count edges with within-source shares — the "
    "input to sequence-packing and batch-shape decisions "
    "(pack_efficiency_documents optimizes against exactly this "
    "distribution) and the per-feed length fingerprint that makes a "
    "scraper regression (a feed suddenly emitting truncated docs) "
    "visible as a histogram shift. Fixed edges keep per-source "
    "histograms mergeable across incremental crawls (the round-11 "
    "mergeable-state theme). One scan, map-side bucket expression, "
    "source x 8-bucket aggregate with a source-keyed totals join — "
    "all key-bounded.",
)
def doclen_histogram_by_source_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bucket = None
    for e in _DOCLEN_EDGES:
        t = (F.col("n_chars") >= F.lit(e)).cast("int")
        bucket = t if bucket is None else bucket + t
    cnt = docs.select("source", bucket.alias("bucket")).groupBy(
        "source", "bucket"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("source")
    return cnt.select(
        "source",
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w).cast("double"), 6
        ).alias("share"),
    )


_GINI_ORACLE = """WITH per_user AS (
  SELECT event_type, user_id,
         CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100.0) AS BIGINT))
              AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x, user_id) AS i
  FROM per_user
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(2 * CAST(sum(i * x) AS BIGINT)
                  - (count(*) + 1) * CAST(sum(x) AS BIGINT) AS DOUBLE)
             / (count(*) * CAST(sum(x) AS BIGINT)), 6) AS gini
FROM ranked GROUP BY event_type"""


@stage(
    "value_gini_by_type_events",
    _GINI_ORACLE,
    "concentration audit: per event_type, the exact Gini coefficient "
    "of total value across users via the sorted-cumulative identity "
    "G = (2*Σ(i*x_i) - (n+1)*Σx) / (n*Σx) over ascending "
    "(total, user_id) ranks — how concentrated each event type's "
    "value mass is on few users, the skew signal that decides "
    "per-user caps in training-data sampling (a 0.9-Gini type is a "
    "few whales; uniform caps would gut it). Quantized-exact 1e2 "
    "user totals keep Σ(i*x) in int64 (capacity ~1e9 users at this "
    "value domain; re-quantize beyond). The per-type rank window is "
    "bounded by USER cardinality, not event rows (the entity-level "
    "window class of user-profile queries); the fixed-edge Lorenz "
    "histogram is the sketch path when even that bound breaks.",
)
def value_gini_by_type_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(
            F.round(F.col("value").cast("double") * F.lit(100.0)).cast(
                "long"
            )
        ).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    ranked = per_user.select(
        "event_type", "x", F.row_number().over(w).alias("i")
    )
    n = F.count(F.lit(1))
    s0 = F.sum("x").cast("long")
    s1 = F.sum(F.col("i") * F.col("x")).cast("long")
    return ranked.groupBy("event_type").agg(
        n.cast("long").alias("n_users"),
        F.round(
            (F.lit(2) * s1 - (n + F.lit(1)) * s0).cast("double")
            / (n * s0),
            6,
        ).alias("gini"),
    )


_TIME_SPLIT_ORACLE = """WITH bounds AS (
  SELECT CAST(min(floor(epoch(ts))) AS BIGINT) AS mn,
         CAST(max(floor(epoch(ts))) AS BIGINT) AS mx
  FROM events
), tt AS (
  SELECT mn + CAST(floor((mx - mn) / 2.0) AS BIGINT) AS tmid FROM bounds
), per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN floor(epoch(ts)) <= tmid
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
         CAST(sum(CASE WHEN floor(epoch(ts)) > tmid
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_post
  FROM events, tt GROUP BY user_id
)
SELECT CAST(sum(CASE WHEN n_pre > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train_users,
       CAST(sum(CASE WHEN n_post > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_eval_users,
       CAST(sum(CASE WHEN n_pre > 0 AND n_post > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap_users,
       round(CAST(sum(CASE WHEN n_pre > 0 THEN n_post ELSE 0 END)
                  AS DOUBLE)
             / sum(n_post), 6) AS eval_share_overlap_users
FROM per_user"""


@stage(
    "time_split_leakage_events",
    _TIME_SPLIT_ORACLE,
    "temporal split audit: split the stream at the midpoint epoch "
    "(train = before, eval = after) and measure USER leakage across "
    "the boundary — users present on both sides, and the share of "
    "eval events they own. The temporal twin of "
    "split_leakage_documents' hash-split check: time splits prevent "
    "future->past leakage but NOT entity memorization, and this "
    "number (here deliberately near 1.0 — every user spans the "
    "midpoint in this stream) is the evidence for choosing "
    "user-level rather than time-level splits when per-user signal "
    "is strong. One user-keyed aggregate with both window counts "
    "fused (no second scan), then a 1-row reduction.",
)
def time_split_leakage_events(spark, sf_dir):
    ev, tt = _events_tt(spark, sf_dir)
    es = F.unix_timestamp(F.col("ts"))
    per_user = (
        ev.crossJoin(F.broadcast(tt))
        .groupBy("user_id")
        .agg(
            F.sum((es <= F.col("tmid")).cast("long")).alias("n_pre"),
            F.sum((es > F.col("tmid")).cast("long")).alias("n_post"),
        )
    )
    return per_user.agg(
        F.sum((F.col("n_pre") > 0).cast("long")).alias("n_train_users"),
        F.sum((F.col("n_post") > 0).cast("long")).alias("n_eval_users"),
        F.sum(
            ((F.col("n_pre") > 0) & (F.col("n_post") > 0)).cast("long")
        ).alias("n_overlap_users"),
        F.round(
            F.sum(
                F.when(F.col("n_pre") > 0, F.col("n_post")).otherwise(0)
            ).cast("double")
            / F.sum("n_post"),
            6,
        ).alias("eval_share_overlap_users"),
    )


# ---------------------------------------------------------------------
# Round-11 promotion hook (second pass; see queries_more's re-entrancy
# note): this module bootstraps the catalog chain BEFORE defining
# STAGED_R11, so importing THIS module first runs the whole
# registration chain while STAGED_R11 is still empty. Re-invoking the
# skip-if-registered promotion here — after all twenty entries exist —
# makes the catalog complete under either import order (the
# queries_staging_r8/r9/r10 pattern, verbatim).
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r11 as _promote  # noqa: E402

_promote()
del _promote
