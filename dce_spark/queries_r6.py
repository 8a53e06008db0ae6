"""Round-6 catalog additions: the OPQ-lite learned rotation for PQ
(the capstone of the ANN ladder: PQ -> ADC -> recall@k -> rotation),
and the sliding-window late-data mirror. Registered from
queries_more.py and FRONTED in ``_DRIVER_WINDOW`` the same round they
land — the r1-r3 lesson: a query registered after the driver gate
rotates is an unchecked tail.

Shared determinism conventions as dce_spark/queries.py: quantized or
9dp-rounded float ranking with unique tie-breaks, in-order list folds
on both engines, round(6) for float-accumulated outputs, exact BIGINT
for counts.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .data import load_table
from .queries import register

# =====================================================================
# 1. PQ + OPQ-lite rotation: recall@10 at equal code size
# =====================================================================

# --- oracle building blocks -----------------------------------------
# Power iteration over a (vec_id, x LIST(DOUBLE)) relation: the
# covariance_topvec_embeddings pattern parameterized on source, dim
# and CTE prefix, so the same SQL replays the raw 64-dim fit AND the
# 63-dim tail fit on the once-reflected vectors.


def _pow_ctes(src: str, dim: int, p: str, v0: str) -> str:
    """mu + two quantized power-iteration steps + unit-normalized
    direction, as CTEs prefixed ``p``. ``v0`` is the SQL expression
    for the uniform start component (exactly what the Spark side
    computes: 1/sqrt(dim))."""
    return f""", {p}pe AS (
  SELECT vec_id, t.pos, x[t.pos + 1] AS v FROM {src}, range(0, {dim}) t(pos)
), {p}mu AS (
  SELECT pos,
         CAST(sum(CAST(round(v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
           / count(*) AS m,
         CAST(count(*) AS BIGINT) AS n
  FROM {p}pe GROUP BY pos
), {p}mul AS (
  SELECT list(m ORDER BY pos) AS ml, min(n) AS n FROM {p}mu
), {p}s1 AS (
  SELECT {src}.vec_id,
         list_sum(list_transform(range(1, {dim + 1}),
           j -> ({src}.x[j] - {p}mul.ml[j]) * {v0})) AS s
  FROM {src}, {p}mul
), {p}w1 AS (
  SELECT {p}pe.pos,
         CAST(sum(CAST(round(({p}pe.v - {p}mul.ml[{p}pe.pos + 1]) * {p}s1.s * 1e6)
                       AS BIGINT)) AS DOUBLE) / 1e6 / {p}mul.n AS w
  FROM {p}pe JOIN {p}s1 USING (vec_id) CROSS JOIN {p}mul
  GROUP BY {p}pe.pos, {p}mul.n
), {p}w1l AS (
  SELECT list(w ORDER BY pos) AS wl FROM {p}w1
), {p}s2 AS (
  SELECT {src}.vec_id,
         list_sum(list_transform(range(1, {dim + 1}),
           j -> ({src}.x[j] - {p}mul.ml[j]) * {p}w1l.wl[j])) AS s
  FROM {src}, {p}mul, {p}w1l
), {p}w2 AS (
  SELECT {p}pe.pos,
         CAST(sum(CAST(round(({p}pe.v - {p}mul.ml[{p}pe.pos + 1]) * {p}s2.s * 1e6)
                       AS BIGINT)) AS DOUBLE) / 1e6 / {p}mul.n AS w
  FROM {p}pe JOIN {p}s2 USING (vec_id) CROSS JOIN {p}mul
  GROUP BY {p}pe.pos, {p}mul.n
), {p}v AS (
  SELECT list_transform(wl, y -> y / sqrt(list_sum(
           list_transform(wl, z -> z * z)))) AS vl
  FROM (SELECT list(w ORDER BY pos) AS wl FROM {p}w2)
)"""


def _pq_train_ctes6(src: str, p: str) -> str:
    """PQ training replay over a (vec_id, x LIST(DOUBLE)) relation:
    per-subspace 1-iteration k-means (seeds = first 4 vectors, 9dp
    (d2, code)-ranked assignments, quantized-exact centroid means) —
    the pq_adc_topk_embeddings CTE chain parameterized on source and
    prefix so it instantiates for BOTH the raw and rotated vectors."""
    d2 = (
        "round(list_sum(list_transform(range(1, 9), "
        f"j -> ({p}sv.v[j] - {{cb}}.c[j]) * ({p}sv.v[j] - {{cb}}.c[j]))), 9)"
    )
    return f""", {p}sv AS (
  SELECT vec_id, s.sub,
         list_transform(range(1, 9), j -> {src}.x[s.sub * 8 + j]) AS v
  FROM {src}, (SELECT unnest(range(0, 8)) AS sub) s
), {p}seeds AS (
  SELECT sub, vec_id AS code, v AS c FROM {p}sv WHERE vec_id < 4
), {p}a0 AS (
  SELECT vec_id, sub, v, code FROM (
    SELECT {p}sv.vec_id, {p}sv.sub, {p}sv.v, {p}seeds.code,
           row_number() OVER (
             PARTITION BY {p}sv.vec_id, {p}sv.sub
             ORDER BY {d2.format(cb=p + "seeds")}, {p}seeds.code) AS rn
    FROM {p}sv JOIN {p}seeds ON {p}seeds.sub = {p}sv.sub)
  WHERE rn = 1
), {p}muc AS (
  SELECT sub, code, jj.j,
         CAST(sum(CAST(round(v[jj.j] * 1e9) AS BIGINT)) AS DOUBLE)
           / 1e9 / count(*) AS mu
  FROM {p}a0, (SELECT unnest(range(1, 9)) AS j) jj
  GROUP BY sub, code, jj.j
), {p}cb1 AS (
  SELECT sub, code, list(mu ORDER BY j) AS c FROM {p}muc GROUP BY sub, code
), {p}codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT {p}sv.vec_id, {p}sv.sub, {p}cb1.code,
           row_number() OVER (
             PARTITION BY {p}sv.vec_id, {p}sv.sub
             ORDER BY {d2.format(cb=p + "cb1")}, {p}cb1.code) AS rn
    FROM {p}sv JOIN {p}cb1 ON {p}cb1.sub = {p}sv.sub)
  WHERE rn = 1
)"""


def _adc_topk_ctes(p: str, qsrc: str) -> str:
    """ADC lookup tables from query relation ``qsrc`` (qid, v) against
    the ``p``-prefixed codebooks/codes, then per-query 9dp-ranked
    top-10."""
    return f""", {p}lut AS (
  SELECT {qsrc}.qid, {p}cb1.sub, {p}cb1.code,
         list_sum(list_transform(range(1, 9),
           j -> ({qsrc}.v[{p}cb1.sub * 8 + j] - {p}cb1.c[j])
              * ({qsrc}.v[{p}cb1.sub * 8 + j] - {p}cb1.c[j]))) AS d2
  FROM {p}cb1, {qsrc}
), {p}adcd AS (
  SELECT l.qid, {p}codes.vec_id, round(sum(l.d2), 9) AS adc_d2
  FROM {p}codes JOIN {p}lut l
    ON l.sub = {p}codes.sub AND l.code = {p}codes.code
  WHERE {p}codes.vec_id <> l.qid
  GROUP BY l.qid, {p}codes.vec_id
), {p}adck AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adc_d2, vec_id) AS rn
    FROM {p}adcd)
  WHERE rn <= 10
)"""


# --- the full rotation replay ----------------------------------------
# e -> power-iter v1 -> Householder u1 -> x1 -> tail power-iter v2 ->
# Householder u2 (axis 9 = start of subspace 1) -> x2 -> quantized
# per-dim variance -> snake permutation -> xr; then PQ train/encode/
# ADC on BOTH e (raw) and xr (rotated), exact top-10 on e as ground
# truth (squared L2 is rotation-invariant, so one truth serves both).
# _rotation_replay_ctes (e -> xr) is shared with the staged round-7
# opq_reconstruction_error oracle so the transform cannot drift.
_ROTATION_REPLAY_CTES = (
    _pow_ctes("e", 64, "p1", "0.125")
    + """, u1 AS (
  SELECT list_transform(up, y -> y / sqrt(list_sum(
           list_transform(up, z -> z * z)))) AS ul
  FROM (SELECT list_transform(range(1, 65),
          j -> vl[j] - (CASE WHEN j = 1 THEN 1.0 ELSE 0.0 END)) AS up
        FROM p1v)
), x1s AS (
  SELECT e.vec_id, e.x,
         list_sum(list_transform(range(1, 65),
           j -> e.x[j] * u1.ul[j])) AS s
  FROM e, u1
), x1 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range(1, 65),
           j -> x[j] - 2.0 * s * u1.ul[j]) AS x
  FROM x1s, u1
), e2 AS (
  SELECT vec_id, list_slice(x, 2, 64) AS x FROM x1
)"""
    + _pow_ctes("e2", 63, "p2", "(1.0 / sqrt(63.0))")
    + """, u2 AS (
  SELECT list_transform(up, y -> y / sqrt(list_sum(
           list_transform(up, z -> z * z)))) AS ul
  FROM (SELECT list_transform(range(1, 65),
          j -> (CASE WHEN j = 1 THEN 0.0
                     WHEN j = 9 THEN vl[j - 1] - 1.0
                     ELSE vl[j - 1] END)) AS up
        FROM p2v)
), x2s AS (
  SELECT x1.vec_id, x1.x,
         list_sum(list_transform(range(1, 65),
           j -> x1.x[j] * u2.ul[j])) AS s
  FROM x1, u2
), x2 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range(1, 65),
           j -> x[j] - 2.0 * s * u2.ul[j]) AS x
  FROM x2s, u2
), vpe AS (
  SELECT vec_id, t.pos, x[t.pos + 1] AS v FROM x2, range(0, 64) t(pos)
), vmu AS (
  SELECT pos,
         CAST(sum(CAST(round(v * 1e9) AS BIGINT)) AS DOUBLE) / 1e9
           / count(*) AS m
  FROM vpe GROUP BY pos
), vvar AS (
  SELECT vpe.pos,
         CAST(sum(CAST(round((vpe.v - vmu.m) * (vpe.v - vmu.m) * 1e6)
                       AS BIGINT)) AS DOUBLE) / 1e6 / count(*) AS var
  FROM vpe JOIN vmu USING (pos) GROUP BY vpe.pos
), slots AS (
  SELECT pos AS src,
         (CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END) * 8
           + (r // 8) AS tgt
  FROM (SELECT pos, row_number() OVER (ORDER BY var DESC, pos) - 1 AS r
        FROM vvar)
), perml AS (
  SELECT list(src ORDER BY tgt) AS pl FROM slots
), xr AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range(1, 65), t -> x[pl[t] + 1]) AS x
  FROM x2, perml
)"""
)

_OPQ_ORACLE = (
    """WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
  FROM embeddings
)"""
    + _ROTATION_REPLAY_CTES
    + _pq_train_ctes6("e", "p")
    + _pq_train_ctes6("xr", "r")
    + """, qv AS (
  SELECT vec_id AS qid, x AS v FROM e WHERE vec_id < 3
), rqv AS (
  SELECT vec_id AS qid, x AS v FROM xr WHERE vec_id < 3
)"""
    + _adc_topk_ctes("p", "qv")
    + _adc_topk_ctes("r", "rqv")
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
)
SELECT CAST(exk.qid AS BIGINT) AS query_id,
       round(CAST(count(padck.vec_id) AS DOUBLE) / 10, 6) AS recall_pq_at_10,
       round(CAST(count(radck.vec_id) AS DOUBLE) / 10, 6) AS recall_opq_at_10
FROM exk
LEFT JOIN padck ON padck.qid = exk.qid AND padck.vec_id = exk.vec_id
LEFT JOIN radck ON radck.qid = exk.qid AND radck.vec_id = exk.vec_id
GROUP BY exk.qid"""
)


@register(
    "pq_opq_recall_embeddings",
    _OPQ_ORACLE,
    "similarity QC: OPQ-LITE ROTATION vs plain PQ at EQUAL code size — "
    "recall@10 of the ADC top-10 against the exact squared-L2 top-10 "
    "for 3 sampled queries, with and without a LEARNED orthogonal "
    "transform applied before quantization. The transform "
    "(ext/similarity.opq_rotation_fit) is two Householder reflections "
    "aligning the top-2 covariance directions (deterministic power "
    "iteration) onto the first coordinates of subspaces 0 and 1, plus "
    "a variance-balancing snake permutation — the cheapest "
    "deterministic form of the OPQ paper's eigenvalue allocation. "
    "Ground truth is computed ONCE on the raw vectors (squared L2 is "
    "rotation-invariant). The oracle replays the ENTIRE pipeline — "
    "both power iterations, both reflections, the quantized variance "
    "ranking, the permutation, and both PQ train/encode/ADC chains — "
    "in SQL via in-order list folds and quantized-exact aggregates, "
    "extending the covariance_topvec_embeddings contract to the full "
    "transform. Rotation pays exactly when top covariance directions "
    "CROSS subspace boundaries (tests/test_ext.py pins a +0.4 recall "
    "uplift on such a fixture); on THIS near-isotropic synthetic "
    "corpus the two variants measure within noise of each other — "
    "which is itself the operational answer ('measure before shipping "
    "a rotation'). Scale shape: fit = 5 narrow map passes + dim-group "
    "aggregates (driver state: three 64-float vectors), apply = one "
    "narrow map pass; train/encode/ADC are the PQ operators' own "
    "shapes; the exact side is the recall harness's sampled-query "
    "O(q*n) pass, never the full query log.",
)
def pq_opq_recall_embeddings(spark, sf_dir):
    from concurrent.futures import ThreadPoolExecutor

    from .ext.similarity import (
        _adc_col,
        _sq_dist_round9_sql,
        opq_fit_apply,
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    embd = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )

    # optimization r16 (guide §2.6, overlap independent jobs): the
    # plain-PQ chain (train on the raw vectors + query collect) shares
    # nothing with the OPQ chain until the final join, and both are
    # sequences of small driver-synchronized jobs — overlapping them
    # hides the shorter chain's job latency entirely. Results are
    # unchanged: each chain is deterministic in its own inputs.
    def _plain_chain():
        # plain PQ: m=8 subspaces x k_sub=4 codes = 8 bytes/vector
        cbs = pq_train(emb, dim=64, m=8, k_sub=4, iters=1)
        qrows = sorted(
            embd.filter(F.col("vec_id") < 3).collect(),
            key=lambda r: r["vec_id"],
        )
        return cbs, qrows

    with ThreadPoolExecutor(max_workers=1) as pool:
        plain_fut = pool.submit(_plain_chain)
        # OPQ-lite: identical m/k_sub on the rotated vectors. The fused
        # fit+apply derives the rotated table from the fit's own cached
        # reflection stages (computed once, not twice) and returns it
        # persisted eagerly — same convention as tfidf's word table;
        # callers clearCache after consuming. At 100 TB the rotated +
        # encoded table is WRITTEN between stages, not recomputed.
        rot, xr = opq_fit_apply(emb, dim=64, m=8)
        rcbs = pq_train(xr, dim=64, m=8, k_sub=4, iters=1, vec_col="vec")
        cbs, qrows = plain_fut.result()
    codes = pq_encode(emb, cbs)
    rcodes = pq_encode(xr, rcbs, vec_col="vec")

    # rotated queries come FROM the rotated corpus rows, so both
    # engines use bit-identical query vectors by construction
    rqrows = sorted(
        xr.filter(F.col("vec_id") < 3).collect(), key=lambda r: r["vec_id"]
    )

    def structs(rows, col, mk):
        return [
            F.struct(
                F.lit(int(r["vec_id"])).cast("long").alias("query_id"),
                mk([float(x) for x in r[col]]).alias("d"),
            )
            for r in rows
        ]

    adc_structs = structs(qrows, "emb", lambda q: _adc_col(cbs, q))
    radc_structs = structs(rqrows, "vec", lambda q: _adc_col(rcbs, q))
    ex_structs = structs(
        qrows,
        "emb",
        lambda q: F.expr(_sq_dist_round9_sql("emb", q)),
    )

    def topk_per_query(df, sts):
        e = (
            df.select("vec_id", F.explode(F.array(*sts)).alias("s"))
            .select(
                "vec_id",
                F.col("s.query_id").alias("query_id"),
                F.col("s.d").alias("d"),
            )
            .filter(F.col("vec_id") != F.col("query_id"))
        )
        w = Window.partitionBy("query_id").orderBy("d", "vec_id")
        return (
            e.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 10)
            .select("query_id", "vec_id")
        )

    ex_all = topk_per_query(embd, ex_structs)
    padc = topk_per_query(codes, adc_structs).withColumn("p_hit", F.lit(1))
    radc = topk_per_query(rcodes, radc_structs).withColumn("r_hit", F.lit(1))
    return (
        ex_all.join(padc, ["query_id", "vec_id"], "left")
        .join(radc, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(
                F.sum(F.coalesce(F.col("p_hit"), F.lit(0))).cast("double")
                / F.lit(10),
                6,
            ).alias("recall_pq_at_10"),
            F.round(
                F.sum(F.coalesce(F.col("r_hit"), F.lit(0))).cast("double")
                / F.lit(10),
                6,
            ).alias("recall_opq_at_10"),
        )
    )


# =====================================================================
# 2. Sliding windows x watermark: late-data semantics, batch mirror
# =====================================================================

_SLIDE_SEC = 1800        # 30-minute slide
_SLIDE_LEN_SEC = 7200    # 2-hour windows -> 4 windows per event
_SLIDE_N = _SLIDE_LEN_SEC // _SLIDE_SEC


@register(
    "sliding_late_data_windows_events",
    f"""WITH arr AS (
  SELECT event_id,
         CAST(floor(epoch(CASE WHEN event_id % 7 = 0
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
           - 3600 AS wm_s
  FROM bm
), pairs AS (
  SELECT (a.es // {_SLIDE_SEC} - k.i) * {_SLIDE_SEC} AS wstart_s,
         a.batch
  FROM arr a, range(0, {_SLIDE_N}) k(i)
), flags AS (
  SELECT p.wstart_s,
         CASE WHEN w.wm_s IS NULL
              OR p.wstart_s + {_SLIDE_LEN_SEC} > w.wm_s
              THEN 1 ELSE 0 END AS ok
  FROM pairs p JOIN wm w ON w.batch = p.batch
)
SELECT CAST(wstart_s AS BIGINT) AS window_epoch,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(ok) AS BIGINT) AS n_accepted
FROM flags GROUP BY wstart_s""",
    "streaming semantics, batch mirror: SLIDING windows (2h length, "
    "30min slide — every event belongs to 4 windows) under "
    "withWatermark('1 hour'), over the same dirtied arrival stream as "
    "late_data_windows_events (every 7th event shifted 96h back, "
    "micro-batches of 100 by event_id). The rule is PER (row, window) "
    "PAIR, not per row: a late row's contribution to an old window is "
    "dropped while the SAME row still lands in its later windows — "
    "multi-window membership is exactly where off-by-one eviction "
    "bugs live, which tumbling mirrors cannot catch. A pair is "
    "accepted iff its window END is strictly above the lag-2 "
    "late-events watermark (the Spark 3.4+ split-watermark rule, "
    "pinned against a real readStream + sliding-window stream in "
    "tests/test_streaming.py). Output per window: generated pairs vs "
    "accepted pairs. Scale shape: the 4x window expansion is a "
    "map-side explode (never a shuffle multiplier), the watermark "
    "table stays #batches rows broadcast onto arrivals, and the "
    "final aggregate groups on the window start only.",
)
def sliding_late_data_windows_events(spark, sf_dir):
    # everything runs on FLOOR-OF-SECONDS event times: window ends are
    # exact multiples of the slide, and for integer wend the predicate
    # wend > wm is equivalent to wend > floor(wm) at ANY sub-second
    # watermark precision (floor is monotone, so the per-batch max of
    # floored times IS the floor of the max) — which sidesteps
    # TIMESTAMP_NTZ's missing numeric casts without changing semantics.
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
    wm = bm.select(
        "batch", (F.max("mx").over(w) - F.lit(3600)).alias("wm_s")
    )
    pairs = (
        arr.join(F.broadcast(wm), "batch")
        .select(
            F.floor(F.col("es") / _SLIDE_SEC).alias("ws0"),
            "wm_s",
            F.explode(F.sequence(F.lit(0), F.lit(_SLIDE_N - 1))).alias("i"),
        )
        .select(
            ((F.col("ws0") - F.col("i")) * _SLIDE_SEC).alias("wstart_s"),
            "wm_s",
        )
    )
    ok = (
        F.col("wm_s").isNull()
        | (F.col("wstart_s") + F.lit(_SLIDE_LEN_SEC) > F.col("wm_s"))
    ).cast("int")
    return (
        pairs.select("wstart_s", ok.alias("ok"))
        .groupBy("wstart_s")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("ok").alias("n_accepted"),
        )
        .select(
            F.col("wstart_s").alias("window_epoch"), "n_pairs", "n_accepted"
        )
    )
