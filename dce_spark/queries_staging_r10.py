"""ROUND-10 STAGED catalog queries — seeded in round 7 (the staging
pipeline runs a full round ahead: round-8 and round-9 cohorts were
already complete, so these compose the NEW round-7 surfaces — the
warehouse family, SemDeDup, hard negatives, dup spans — one derivative
step further), NOT registered (same freeze protocol as
queries_staging_r5..r9). Round 10 promotes them; round 8/9 sessions
may extend this cohort toward the usual twenty.

- ``scd2_change_rate_events`` — dimension churn as a time series:
  closed SCD2 intervals per close-day (how fast the dimension
  actually changes — the number that sizes MERGE cadence).
- ``attribution_gap_quantiles_events`` — conversion latency by
  portable integer day-of-week: attributed share and exact p50/p90
  click->purchase gaps.
- ``pit_feature_drift_events`` — PSI drift on an ENGINEERED feature
  (the 7-day prior-activity count of purchase labels), first half vs
  second half of the stream: feature drift is what actually breaks
  models, not raw-column drift.
- ``semdedup_threshold_sweep_embeddings`` — SemDeDup prune rates at
  three cosine thresholds from ONE within-cell pair table (the
  tuning curve before freezing a threshold).
- ``triplet_margin_embeddings`` — per probe query, the margin between
  the nearest SAME-label vector and the hardest mined FOREIGN-label
  negative: the triplet-loss feasibility number for contrastive
  training.
- ``dup_span_by_source_documents`` — the substring-dedup span profile
  rolled up per source: which feeds carry verbatim-copied spans and
  how long they run (the clip-vs-drop policy input).

tests/test_staging_r10.py runs these through the SAME compare harness
as the live catalog at the suite's SF.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Window, functions as F

from . import queries as _catalog_bootstrap  # noqa: F401  (import order)
from .data import load_table, local_result

STAGED_R10: dict[str, "StagedSpec"] = {}


@dataclass
class StagedSpec:
    fn: Callable
    oracle: str
    doc: str


def stage(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        STAGED_R10[name] = StagedSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def staged_oracle(name: str) -> str:
    """Oracle SQL for a staged query (uniform accessor; all round-10
    oracles are eager strings)."""
    return STAGED_R10[name].oracle


# ---------------------------------------------------------------------
# 1. SCD2 change rate (dimension churn time series)
# ---------------------------------------------------------------------

_SCD2_RATE_ORACLE = """WITH ordered AS (
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
  SELECT user_id, run_id,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS valid_from_s
  FROM runs GROUP BY user_id, run_id
), closed AS (
  SELECT user_id,
         lead(valid_from_s) OVER (PARTITION BY user_id
                                  ORDER BY run_id) AS valid_to_s
  FROM intervals
)
SELECT CAST(valid_to_s // 86400 AS BIGINT) AS day_index,
       CAST(count(*) AS BIGINT) AS n_changes,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_changing
FROM closed WHERE valid_to_s IS NOT NULL
GROUP BY valid_to_s // 86400"""


@stage(
    "scd2_change_rate_events",
    _SCD2_RATE_ORACLE,
    "dimension churn as a time series: CLOSED SCD2 intervals counted "
    "by the epoch-day their successor opened (integer day_index = "
    "epoch_s // 86400, engine-portable) plus distinct keys changing "
    "that day — the number that sizes MERGE cadence and history-table "
    "growth (a churn spike means the type-2 table is about to bloat). "
    "Composes ext/warehouse.scd2_intervals with one grouped rollup; "
    "still a single user_id shuffle plus a day-sized aggregate.",
)
def scd2_change_rate_events(spark, sf_dir):
    from .ext.warehouse import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    iv = scd2_intervals(ev, "user_id", "event_type", "ts", "event_id")
    closed = iv.filter(F.col("valid_to").isNotNull()).select(
        "user_id",
        (F.unix_timestamp("valid_to") / 86400).cast("long").alias("day_index"),
    )
    return closed.groupBy("day_index").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.countDistinct("user_id").alias("n_users_changing"),
    )


# ---------------------------------------------------------------------
# 2. Attribution gap quantiles by (portable) day-of-week
# ---------------------------------------------------------------------

_ATTR_GAP_ORACLE = """WITH base AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es, ts
  FROM events
), lasts AS (
  SELECT event_id, event_type, es,
         max(CASE WHEN event_type = 'click'
                  THEN es * 10000000 + event_id END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS packed
  FROM base
), purchases AS (
  SELECT (es // 86400) % 7 AS dow,
         CASE WHEN packed IS NOT NULL AND es - packed // 10000000 <= 3600
              THEN es - packed // 10000000 END AS gap_s
  FROM lasts WHERE event_type = 'purchase'
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(CAST(sum(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS attributed_share,
       round(quantile_cont(CAST(gap_s AS DOUBLE), 0.5), 6) AS p50_gap_s,
       round(quantile_cont(CAST(gap_s AS DOUBLE), 0.9), 6) AS p90_gap_s
FROM purchases GROUP BY dow"""


@stage(
    "attribution_gap_quantiles_events",
    _ATTR_GAP_ORACLE,
    "conversion latency profile: per PORTABLE integer day-of-week "
    "(epoch_days % 7 — DuckDB dayofweek is 0-6 vs Spark 1-7, so "
    "neither calendar function crosses engines), the purchase count, "
    "last-click attributed share, and exact interpolated p50/p90 "
    "click->purchase gaps (NULL-skipping quantiles over the "
    "attributed subset only, both engines). Composes "
    "ext/warehouse.last_event_attribution with a 7-row rollup; one "
    "user_id shuffle.",
)
def attribution_gap_quantiles_events(spark, sf_dir):
    from .ext.warehouse import last_event_attribution

    ev = load_table(spark, sf_dir, "events")
    out = last_event_attribution(
        ev, "user_id", "ts", "event_id",
        F.col("event_type") == "click", window_s=3600,
    ).filter(F.col("event_type") == "purchase")
    dow = (
        (F.unix_timestamp("ts") / 86400).cast("long") % 7
    ).alias("dow")
    pcts = F.percentile(
        F.col("attr_gap_s").cast("double"),
        F.array(F.lit(0.5), F.lit(0.9)),
    )
    return (
        out.select(dow, "attr_gap_s")
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(
                F.sum(F.col("attr_gap_s").isNotNull().cast("long"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("attributed_share"),
            pcts.alias("p"),
        )
        .select(
            "dow",
            "n_purchases",
            "attributed_share",
            F.round(F.col("p")[0], 6).alias("p50_gap_s"),
            F.round(F.col("p")[1], 6).alias("p90_gap_s"),
        )
    )


# ---------------------------------------------------------------------
# 3. PSI drift on an engineered feature (pit prior-activity count)
# ---------------------------------------------------------------------

_PIT_EDGES = [5, 10, 20, 40]
_PIT_B = len(_PIT_EDGES) + 1


def _pit_bin_sql(col: str) -> str:
    conds = [f"WHEN {col} < {_PIT_EDGES[0]} THEN 0"]
    for i in range(1, len(_PIT_EDGES)):
        conds.append(f"WHEN {col} < {_PIT_EDGES[i]} THEN {i}")
    conds.append(f"ELSE {len(_PIT_EDGES)}")
    return "CASE " + " ".join(conds) + " END"


_PIT_DRIFT_ORACLE = f"""WITH base AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), feat AS (
  SELECT event_id, event_type, es,
         count(*) OVER w AS n_prior
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY es
               RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)
), labels AS (
  SELECT es // 86400 AS day, n_prior FROM feat
  WHERE event_type = 'purchase'
), days AS (
  SELECT day, row_number() OVER (ORDER BY day) AS idx,
         count(*) OVER () AS k
  FROM (SELECT DISTINCT day FROM labels)
), tagged AS (
  SELECT CASE WHEN d.idx * 2 <= d.k THEN 0 ELSE 1 END AS period,
         {_pit_bin_sql('l.n_prior')} AS bin
  FROM labels l JOIN days d ON d.day = l.day
), cells AS (
  SELECT bin,
         CAST(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM tagged GROUP BY bin
), tot AS (
  SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
         CAST(count(*) AS BIGINT) AS b
  FROM cells
)
SELECT CAST(c.bin AS BIGINT) AS bin, c.c0, c.c1,
       round((CAST(c.c0 + 1 AS DOUBLE) / (t.n0 + t.b)
              - CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + t.b))
             * ln((CAST(c.c0 + 1 AS DOUBLE) / (t.n0 + t.b))
                  / (CAST(c.c1 + 1 AS DOUBLE) / (t.n1 + t.b))), 6)
         AS psi_contrib
FROM cells c CROSS JOIN tot t"""


@stage(
    "pit_feature_drift_events",
    _PIT_DRIFT_ORACLE,
    "feature drift where it matters: PSI of an ENGINEERED model input "
    "— the 7-day prior-activity count behind each purchase label "
    "(pit_features_events' n_prior_7d) — first half vs second half of "
    "the label days. Raw-column drift tests miss exactly this: a "
    "stable value distribution can still shift the engineered feature "
    "when user behavior recomposes. Same protocol as "
    "psi_value_drift_events (fixed bins, Laplace (c+1)/(n+B), exact "
    "integer idx*2 <= k period split, per-bin 6dp contributions). "
    "Scale: the pit window's one user_id shuffle + a bin-sized "
    "rollup.",
)
def pit_feature_drift_events(spark, sf_dir):
    from .ext.warehouse import pit_window_features

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.unix_timestamp("ts").alias("es"),
        F.lit(0.0).alias("v"),
    )
    feat = pit_window_features(base, "user_id", "es", "v", horizon_s=604800)
    labels = feat.filter(F.col("event_type") == "purchase").select(
        (F.col("es") / 86400).cast("long").alias("day"),
        F.col("pit_n_prior").alias("n_prior"),
    )
    days = labels.select("day").distinct()
    widx = Window.orderBy("day")
    wall = Window.partitionBy()
    idxd = days.select(
        "day",
        F.row_number().over(widx).alias("idx"),
        F.count(F.lit(1)).over(wall).alias("k"),
    )
    bin_col = F.lit(len(_PIT_EDGES))
    for i in range(len(_PIT_EDGES) - 1, -1, -1):
        bin_col = F.when(
            F.col("n_prior") < _PIT_EDGES[i], F.lit(i)
        ).otherwise(bin_col)
    tagged = labels.join(F.broadcast(idxd), "day").select(
        F.when(F.col("idx") * 2 <= F.col("k"), 0).otherwise(1).alias("period"),
        bin_col.alias("bin"),
    )
    cells = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c0"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
    )
    tot = cells.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.count(F.lit(1)).alias("b"),
    )
    p = (F.col("c0") + 1).cast("double") / (F.col("n0") + F.col("b"))
    q = (F.col("c1") + 1).cast("double") / (F.col("n1") + F.col("b"))
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("long").alias("bin"),
        "c0",
        "c1",
        F.round((p - q) * F.log(p / q), 6).alias("psi_contrib"),
    )


# ---------------------------------------------------------------------
# 4. SemDeDup threshold sweep
# ---------------------------------------------------------------------

_SEMDEDUP_THRS = [0.90, 0.95, 0.98]


def _semdedup_sweep_oracle() -> str:
    from .queries import _DIRTY_EMB_SQL
    from .queries_more import _KM_DIST, _KM_K

    thr_rows = ", ".join(str(t) for t in _SEMDEDUP_THRS)
    return f"""WITH {_DIRTY_EMB_SQL}, e AS (
  SELECT vec_id, embedding AS v FROM dirty
), seeds AS (
  SELECT vec_id AS cid, v FROM e WHERE vec_id < {_KM_K}
), d0 AS (
  SELECT e.vec_id, s.cid, {_KM_DIST.format(e='e.v', c='s.v')} AS d2
  FROM e, seeds s
), a0 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d0) WHERE rn = 1
), c1 AS (
  SELECT a0.cid, t.pos,
         CAST(sum(CAST(round(e.v[t.pos + 1] * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / count(*) AS m
  FROM e JOIN a0 ON e.vec_id = a0.vec_id, range(0, 64) t(pos)
  GROUP BY a0.cid, t.pos
), c1v AS (
  SELECT cid, list(m ORDER BY pos) AS v FROM c1 GROUP BY cid
), d1 AS (
  SELECT e.vec_id, c.cid, {_KM_DIST.format(e='e.v', c='c.v')} AS d2
  FROM e, c1v c
), cells AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d1) WHERE rn = 1
), maxcos AS (
  SELECT cb.vec_id,
         max(round(list_sum(list_transform(range(1, 65),
               i -> ea.v[i] * eb.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65),
               i -> ea.v[i] * ea.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65),
               i -> eb.v[i] * eb.v[i])))), 6)) AS mc
  FROM cells ca JOIN cells cb
    ON ca.cid = cb.cid AND ca.vec_id < cb.vec_id
  JOIN e ea ON ea.vec_id = ca.vec_id
  JOIN e eb ON eb.vec_id = cb.vec_id
  GROUP BY cb.vec_id
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cells)
SELECT CAST(t.thr AS DOUBLE) AS thr,
       CAST(sum(CASE WHEN m.mc >= t.thr THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pruned,
       round(CAST(sum(CASE WHEN m.mc >= t.thr THEN 1 ELSE 0 END) AS DOUBLE)
             / any_value(tt.n), 6) AS prune_rate
FROM (SELECT CAST(unnest([{thr_rows}]) AS DOUBLE) AS thr) t
CROSS JOIN tot tt
LEFT JOIN maxcos m ON true
GROUP BY t.thr"""


@stage(
    "semdedup_threshold_sweep_embeddings",
    _semdedup_sweep_oracle(),
    "SemDeDup tuning curve: corpus prune rates at THREE cosine "
    "thresholds from ONE within-cell pair table — per vector the MAX "
    "6dp cosine to any lower-id cell-mate is computed once, then each "
    "threshold is a conditional count over that per-victim table "
    "(never a re-join per threshold; the dedup_threshold_sweep "
    "convention applied to embeddings). Same deterministic k-means "
    "cell replay and dirtied view as semdedup_prune_embeddings. "
    "Scale: the one cell-keyed self-join dominates; the sweep itself "
    "is a 3-row rollup.",
)
def semdedup_threshold_sweep_embeddings(spark, sf_dir):
    from .ext.similarity import argmin_assign_cols, semdedup_pair_cosines
    from .queries import _dirty_embeddings
    from .queries_more import _KM_K

    df = _dirty_embeddings(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    base = df.select("vec_id", F.col("embedding").alias("v"))

    # parsed-SQL argmin (optimization r16, guide §7.3 — same tree as
    # the Column-lambda form, ~0.4 s less driver build time)
    def assign(cent_pairs):
        cid, _best, _d2s = argmin_assign_cols(cent_pairs)
        return cid

    seed_rows = base.filter(F.col("vec_id") < _KM_K).orderBy("vec_id").collect()
    cents = [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in seed_rows]
    # NOTE r15: the 64-column wide-aggregate form measured SLOWER than
    # this posexplode form here (see kmeans_embeddings_2iter note —
    # measured negative result; churn is the one site where it won).
    c1_rows = (
        base.withColumn("cid", assign(cents))
        .select("cid", F.posexplode("v").alias("pos", "x"))
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.round(F.col("x") * F.lit(1e9)).cast("long")).cast("double")
                / F.lit(1e9)
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    by_cid: dict = {}
    for r in c1_rows:
        by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
    cents1 = [
        (int(cid), [by_cid[cid][p] for p in range(64)]) for cid in sorted(by_cid)
    ]
    cells = base.select("vec_id", "v", assign(cents1).alias("cid")).persist()
    n_total = cells.count()
    # within-cell pair cosines via the salted exploding-join kernel
    # (optimization r16, guide §2.5/§3.3) — identical pair set and 6dp
    # values, parallelism no longer capped at the k distinct cells
    maxcos = (
        semdedup_pair_cosines(cells, len(cents1))
        .select(F.col("ib").alias("vec_id"), F.col("cos").alias("c"))
        .groupBy("vec_id")
        .agg(F.max("c").alias("mc"))
    )
    counts = maxcos.agg(
        *[
            F.sum((F.col("mc") >= F.lit(t)).cast("long")).alias(f"t{i}")
            for i, t in enumerate(_SEMDEDUP_THRS)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("thr"),
                F.coalesce(F.col(f"t{i}"), F.lit(0)).alias("n_pruned"),
            )
            for i, t in enumerate(_SEMDEDUP_THRS)
        ]
    )
    return (
        counts.select(F.explode(pairs).alias("s"))
        .select(
            F.col("s.thr").alias("thr"),
            F.col("s.n_pruned").cast("long").alias("n_pruned"),
            F.round(
                F.col("s.n_pruned").cast("double") / F.lit(float(n_total)), 6
            ).alias("prune_rate"),
        )
    )


# ---------------------------------------------------------------------
# 5. Triplet margin (contrastive-training feasibility)
# ---------------------------------------------------------------------

_TM_NPROBE = 2

_TRIPLET_ORACLE = f"""WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cent AS (
  SELECT label, CAST(t.pos AS BIGINT) AS pos,
         CAST(sum(CAST(round(v[t.pos + 1] * 1000000000.0) AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / CAST(count(*) AS DOUBLE) AS c
  FROM e, range(0, 64) t(pos)
  GROUP BY label, t.pos
), qv AS (
  SELECT vec_id AS qid, label AS qlabel, v FROM e WHERE vec_id < 3
), cs AS (
  SELECT qv.qid, cent.label,
         sum(CAST(round(cent.c * qv.v[cent.pos + 1] * 1000000000.0)
                  AS BIGINT)) AS score
  FROM cent JOIN qv ON cent.label <> qv.qlabel
  GROUP BY qv.qid, cent.label
), probe AS (
  SELECT qid, label FROM (
    SELECT qid, label,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, label) AS rk
    FROM cs)
  WHERE rk <= {_TM_NPROBE}
), cosall AS (
  SELECT q.qid, q.qlabel, e.vec_id, e.label,
         round(list_sum(list_transform(range(1, 65),
                 i -> q.v[i] * e.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> q.v[i] * q.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65),
                 i -> e.v[i] * e.v[i])))), 6) AS cos_sim
  FROM qv q JOIN e ON e.label = q.qlabel AND e.vec_id <> q.qid
), pos AS (
  SELECT qid, max(cos_sim) AS pos_cos FROM cosall GROUP BY qid
), neg AS (
  SELECT q.qid,
         max(round(list_sum(list_transform(range(1, 65),
                 i -> q.v[i] * e.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> q.v[i] * q.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65),
                 i -> e.v[i] * e.v[i])))), 6)) AS neg_cos
  FROM probe p
  JOIN qv q ON q.qid = p.qid
  JOIN e ON e.label = p.label
  GROUP BY q.qid
)
SELECT CAST(pos.qid AS BIGINT) AS qid,
       pos.pos_cos, neg.neg_cos,
       round(pos.pos_cos - neg.neg_cos, 6) AS margin
FROM pos JOIN neg ON neg.qid = pos.qid"""


@stage(
    "triplet_margin_embeddings",
    _TRIPLET_ORACLE,
    "contrastive-training feasibility: per probe query, the TRIPLET "
    "MARGIN — nearest SAME-label cosine (the easiest positive) minus "
    "the hardest mined FOREIGN-label negative (from the same "
    "exact-integer-scored nprobe=2 foreign cells as "
    "hard_negative_mining_embeddings). Negative or near-zero margins "
    "mean the mined negatives already violate the triplet constraint "
    "— the single number that predicts whether a margin loss has "
    "anything to learn from this corpus. Both maxes are over "
    "6dp-rounded in-order cosines, and the margin subtracts on the "
    "1e-6 grid (exact). Scale: two label equi-joins with 3-row "
    "broadcast query dims.",
)
def triplet_margin_embeddings(spark, sf_dir):
    from .ext.similarity import dot_col

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    sum_terms = ", ".join(
        f"sum(cast(round(get(v, {i}) * 1e9) as bigint)) as s{i}"
        for i in range(64)
    )
    cent_rows = (
        emb.groupBy("label")
        .agg(F.expr(f"struct({sum_terms}, count(*) as n)").alias("r"))
        .collect()
    )
    cents = {
        int(r["label"]): [
            float(r["r"][f"s{i}"]) / 1e9 / float(int(r["r"]["n"]))
            for i in range(64)
        ]
        for r in cent_rows
    }
    q_rows = emb.filter(F.col("vec_id") < 3).collect()
    pos_dim, neg_dim = [], []
    for qr in sorted(q_rows, key=lambda r: int(r["vec_id"])):
        qid, qlabel = int(qr["vec_id"]), int(qr["label"])
        qvec = [float(x) for x in qr["v"]]
        pos_dim.append((qid, qlabel, qvec))
        scored = []
        for lbl, c in cents.items():
            if lbl == qlabel:
                continue
            score = sum(int(round(c[i] * qvec[i] * 1e9)) for i in range(64))
            scored.append((-score, lbl))
        for _s, lbl in sorted(scored)[:_TM_NPROBE]:
            neg_dim.append((qid, lbl, qvec))
    pos_df = spark.createDataFrame(
        pos_dim, "qid long, label long, qv array<double>"
    )
    neg_df = spark.createDataFrame(
        neg_dim, "qid long, label long, qv array<double>"
    )
    cos = F.round(
        dot_col(F.col("qv"), F.col("v"))
        / (
            F.sqrt(dot_col(F.col("qv"), F.col("qv")))
            * F.sqrt(dot_col(F.col("v"), F.col("v")))
        ),
        6,
    )
    pos = (
        emb.join(F.broadcast(pos_df), "label")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", cos.alias("c"))
        .groupBy("qid")
        .agg(F.max("c").alias("pos_cos"))
    )
    neg = (
        emb.join(F.broadcast(neg_df), "label")
        .select("qid", cos.alias("c"))
        .groupBy("qid")
        .agg(F.max("c").alias("neg_cos"))
    )
    return pos.join(neg, "qid").select(
        "qid",
        "pos_cos",
        "neg_cos",
        F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
    )


# ---------------------------------------------------------------------
# 6. Duplicated-span profile per source
# ---------------------------------------------------------------------

_NGRAM_N10 = 8

_DUP_SPAN_SRC_ORACLE = f"""WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= {_NGRAM_N10}
), gpos AS (
  SELECT doc_id, w, unnest(range(0, len(w) - {_NGRAM_N10 - 1})) AS pos
  FROM words
), grams AS (
  SELECT doc_id, pos,
         array_to_string(w[pos + 1 : pos + {_NGRAM_N10}], ' ') AS ng
  FROM gpos
), shared AS (
  SELECT ng FROM grams GROUP BY ng HAVING count(DISTINCT doc_id) >= 2
), flagged AS (
  SELECT g.doc_id, g.pos,
         CASE WHEN s.ng IS NULL THEN 0 ELSE 1 END AS dup
  FROM grams g LEFT JOIN shared s ON s.ng = g.ng
), islands AS (
  SELECT doc_id, pos - row_number() OVER (PARTITION BY doc_id
                                          ORDER BY pos) AS grp
  FROM flagged WHERE dup = 1
), runs AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
  FROM islands GROUP BY doc_id, grp
), per_doc AS (
  SELECT f.doc_id,
         CAST(sum(f.dup) AS BIGINT) AS n_dup,
         CAST(count(*) AS BIGINT) AS n_ngrams
  FROM flagged f GROUP BY f.doc_id
), spans AS (
  SELECT doc_id, CAST(max(run_len) AS BIGINT) AS max_run
  FROM runs GROUP BY doc_id
)
SELECT w.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CASE WHEN p.n_dup > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS docs_with_dup_share,
       round(CAST(sum(coalesce(s.max_run, 0)) AS DOUBLE) / count(*), 6)
         AS mean_max_run,
       CAST(max(coalesce(s.max_run, 0)) AS BIGINT) AS longest_span
FROM words w
JOIN per_doc p ON p.doc_id = w.doc_id
LEFT JOIN spans s ON s.doc_id = w.doc_id
GROUP BY w.source"""


@stage(
    "dup_span_by_source_documents",
    _DUP_SPAN_SRC_ORACLE,
    "substring-dedup policy input per feed: which sources carry "
    "verbatim-copied spans, what share of their documents have any, "
    "and how long the longest run is — the numbers that decide "
    "CLIP-the-span vs DROP-the-document per source "
    "(dup_ngram_span_documents is the per-document readout; this is "
    "the rollup a curation policy is actually written against). Exact "
    "integer run lengths; the mean is an integer-sum division. Scale: "
    "the same inverted-index + gaps-and-islands shapes, one extra "
    "20-row rollup.",
)
def dup_span_by_source_documents(spark, sf_dir):
    n = _NGRAM_N10
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("w")
    ).filter(F.size("w") >= n)
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {n}), "
                f"i -> array_join(slice(w, i + 1, {n}), ' '))"
            )
        ).alias("pos", "ng"),
    )
    # optimization r16 (guide §2.4): the cross-doc sharing flag is a
    # window over the gram partition — ONE shuffle of the gram table
    # instead of the former groupBy(ng)+join-back (two shuffles plus
    # the posexplode computed once per join side).
    # size(collect_set(doc_id)) >= 2 == count(DISTINCT doc_id) >= 2;
    # measured 1.7 -> 0.8 s on the sf0.1 flag kernel, identical rows.
    # optimization r15 (guide §5): ``flagged`` feeds BOTH the
    # gaps-and-islands spans and the per-doc dup counts; unpersisted,
    # each reference would recompute the corpus posexplode and the
    # flag shuffle. Persist the narrow (doc_id, pos, dup) frame,
    # materialize the 20-row rollup eagerly, unpersist.
    wng = Window.partitionBy("ng")
    flagged = grams.select(
        "doc_id",
        "pos",
        (F.size(F.collect_set("doc_id").over(wng)) >= 2)
        .cast("int")
        .alias("dup"),
    ).persist()
    wisl = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        flagged.filter(F.col("dup") == 1)
        .select(
            "doc_id", (F.col("pos") - F.row_number().over(wisl)).alias("grp")
        )
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("doc_id")
        .agg(F.max("run_len").alias("max_run"))
    )
    per_doc = flagged.groupBy("doc_id").agg(F.sum("dup").alias("n_dup"))
    base = (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id")
        .join(spans, "doc_id", "left")
        .select(
            "source",
            "n_dup",
            F.coalesce(F.col("max_run"), F.lit(0)).alias("max_run"),
        )
    )
    out = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum((F.col("n_dup") > 0).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("docs_with_dup_share"),
        F.round(
            F.sum("max_run").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_max_run"),
        F.max("max_run").cast("long").alias("longest_span"),
    )
    # r16 ADVICE fix: release the persisted inputs on ALL paths
    return local_result(spark, out, flagged)


# ---------------------------------------------------------------------
# 7. Session-stage transition matrix (does abandonment persist?)
# ---------------------------------------------------------------------

_STAGE_TRANS_ORACLE = """WITH gaps AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN epoch(ts)
                   - epoch(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id))
                   > 1800
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM gaps
), stages AS (
  SELECT user_id, sess_id,
         CASE WHEN max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
              THEN 'purchase'
              WHEN max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
              THEN 'click'
              WHEN max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1
              THEN 'view'
              ELSE 'other' END AS stage
  FROM sess GROUP BY user_id, sess_id
), pairs AS (
  SELECT stage,
         lead(stage) OVER (PARTITION BY user_id ORDER BY sess_id)
           AS next_stage
  FROM stages
)
SELECT stage, next_stage, CAST(count(*) AS BIGINT) AS n_transitions
FROM pairs WHERE next_stage IS NOT NULL
GROUP BY stage, next_stage"""


@stage(
    "session_stage_transition_events",
    _STAGE_TRANS_ORACLE,
    "retention structure: the SESSION-to-NEXT-SESSION stage transition "
    "matrix — does a visit that died at 'click' convert next time, or "
    "do abandonment stages persist per user? (The row-normalized "
    "version is the session-grain Markov chain; "
    "session_abandonment_events is its stationary marginal.) Same "
    "30-min sessionization shape, stage election per session, then "
    "one lead() over the user's session sequence — everything rides "
    "the single user_id shuffle; output is a <=16-cell matrix.",
)
def session_stage_transition_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp(F.col("ts"))
    new_sess = F.when(
        F.lag(F.col("ts")).over(w).isNull()
        | ((ep - F.lag(ep).over(w)) > 1800),
        1,
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id", "event_type", "ts", "event_id", new_sess.alias("ns")
    ).withColumn("sess_id", F.sum("ns").over(wcum))
    flag = lambda t: F.max(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    )
    stages = sess.groupBy("user_id", "sess_id").agg(
        flag("purchase").alias("fp"),
        flag("click").alias("fc"),
        flag("view").alias("fv"),
    ).select(
        "user_id",
        "sess_id",
        F.when(F.col("fp") == 1, "purchase")
        .when(F.col("fc") == 1, "click")
        .when(F.col("fv") == 1, "view")
        .otherwise("other")
        .alias("stage"),
    )
    wl = Window.partitionBy("user_id").orderBy("sess_id")
    return (
        stages.select(
            "stage", F.lead("stage").over(wl).alias("next_stage")
        )
        .filter(F.col("next_stage").isNotNull())
        .groupBy("stage", "next_stage")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


# ---------------------------------------------------------------------
# 8. RFM segment migration between order-history halves
# ---------------------------------------------------------------------

_RFM_SPLIT_DATE = "1998-01-01"


def _rfm_period_ctes(p: str, pred: str) -> str:
    """Per-period RFM codes: metrics against the PERIOD's own horizon
    and median splits (a migration is meaningful only if each period
    is scored by its own yardstick)."""
    return f""", {p}cust AS (
  SELECT o_custkey,
         CAST(datediff('day', max(o_orderdate),
              (SELECT max(o_orderdate) FROM orders WHERE {pred}))
              AS BIGINT) AS recency_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0)
                       AS BIGINT)) AS DOUBLE) / 100.0 AS monetary
  FROM orders WHERE {pred} GROUP BY o_custkey
), {p}bounds AS (
  SELECT quantile_cont(CAST(recency_d AS DOUBLE), 0.5) AS r50,
         quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f50,
         quantile_cont(monetary, 0.5) AS m50
  FROM {p}cust
), {p}coded AS (
  SELECT c.o_custkey,
         (CASE WHEN CAST(c.recency_d AS DOUBLE) <= b.r50
               THEN 2 ELSE 1 END) * 100
         + (CASE WHEN CAST(c.frequency AS DOUBLE) > b.f50
                 THEN 2 ELSE 1 END) * 10
         + (CASE WHEN c.monetary > b.m50 THEN 2 ELSE 1 END) AS code
  FROM {p}cust c CROSS JOIN {p}bounds b
)"""


_RFM_MIGRATION_ORACLE = (
    "WITH dummy AS (SELECT 1)"
    + _rfm_period_ctes("a", f"o_orderdate < DATE '{_RFM_SPLIT_DATE}'")
    + _rfm_period_ctes("b", f"o_orderdate >= DATE '{_RFM_SPLIT_DATE}'")
    + """
SELECT CAST(a.code AS BIGINT) AS code_from,
       CAST(b.code AS BIGINT) AS code_to,
       CAST(count(*) AS BIGINT) AS n_customers
FROM acoded a JOIN bcoded b ON b.o_custkey = a.o_custkey
GROUP BY a.code, b.code"""
)


@stage(
    "rfm_migration_customers",
    _RFM_MIGRATION_ORACLE,
    "customer-lifecycle dynamics: the RFM SEGMENT MIGRATION matrix "
    "between the two halves of the order history (split at the fixed "
    f"date {_RFM_SPLIT_DATE}) — each period scored by its OWN horizon "
    "and median splits, customers active in both periods counted by "
    "(from, to) segment pair. Off-diagonal flow out of 222 is the "
    "churn-risk early warning rfm_segments_customers' snapshot cannot "
    "show. Same median-split convention as the snapshot query; scale "
    "shape: two filtered per-customer aggregates, two 1-row bounds "
    "broadcasts, one equi-join on custkey, a <=64-cell rollup.",
)
def rfm_migration_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")

    def coded(pred):
        sub = orders.filter(pred)
        horizon = sub.agg(F.max("o_orderdate").alias("hz"))
        cust = (
            sub.crossJoin(F.broadcast(horizon))
            .groupBy("o_custkey")
            .agg(
                F.datediff(F.first("hz"), F.max("o_orderdate"))
                .cast("long")
                .alias("recency_d"),
                F.count(F.lit(1)).alias("frequency"),
                (
                    F.sum(
                        F.round(
                            F.col("o_totalprice").cast("double") * 100
                        ).cast("long")
                    ).cast("double")
                    / F.lit(100.0)
                ).alias("monetary"),
            )
        )
        bounds = cust.agg(
            F.percentile(F.col("recency_d").cast("double"), F.lit(0.5)).alias(
                "r50"
            ),
            F.percentile(F.col("frequency").cast("double"), F.lit(0.5)).alias(
                "f50"
            ),
            F.percentile(F.col("monetary"), F.lit(0.5)).alias("m50"),
        )
        code = (
            F.when(F.col("recency_d").cast("double") <= F.col("r50"), 2)
            .otherwise(1)
            * 100
            + F.when(F.col("frequency").cast("double") > F.col("f50"), 2)
            .otherwise(1)
            * 10
            + F.when(F.col("monetary") > F.col("m50"), 2).otherwise(1)
        )
        return cust.crossJoin(F.broadcast(bounds)).select(
            "o_custkey", code.alias("code")
        )

    split = F.lit(_RFM_SPLIT_DATE).cast("date")
    a = coded(F.col("o_orderdate") < split).withColumnRenamed(
        "code", "code_from"
    )
    b = coded(F.col("o_orderdate") >= split).withColumnRenamed(
        "code", "code_to"
    )
    return (
        a.join(b, "o_custkey")
        .groupBy("code_from", "code_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.col("code_from").cast("long").alias("code_from"),
            F.col("code_to").cast("long").alias("code_to"),
            "n_customers",
        )
    )


# ---------------------------------------------------------------------
# 9. CDC compaction ratio per key dimension
# ---------------------------------------------------------------------

_LWW_RATIO_ORACLE = """SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_versions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys,
       round(1.0 - CAST(count(DISTINCT user_id) AS DOUBLE) / count(*), 6)
         AS compaction_ratio
FROM events GROUP BY event_type"""


@stage(
    "lww_compaction_ratio_events",
    _LWW_RATIO_ORACLE,
    "CDC sizing: per event_type, how much of the change stream a "
    "last-write-wins compaction deletes — versions vs distinct keys, "
    "compaction_ratio = 1 - keys/versions. The capacity number behind "
    "cdc_last_write_wins_events: a ratio near 0 means the MERGE sink "
    "is pure inserts (compaction buys nothing); near 1 means the "
    "stream is dominated by updates and the compacted table is tiny. "
    "One grouped aggregate with an exact distinct count; at 100 TB "
    "the distinct swaps for approx_count_distinct exactly as "
    "documented for the uniqueness family.",
)
def lww_compaction_ratio_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.countDistinct("user_id").alias("n_keys"),
        F.round(
            F.lit(1.0)
            - F.countDistinct("user_id").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("compaction_ratio"),
    )


# ---------------------------------------------------------------------
# 10. Hubness: in-degree distribution of the within-cell kNN graph
# ---------------------------------------------------------------------

_HUB_K = 5

_HUBNESS_ORACLE = f"""WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round(list_sum(list_transform(range(1, 65),
                 i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> a.v[i] * a.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65),
                 i -> b.v[i] * b.v[i])))), 6) AS cos_sim
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
), knn AS (
  SELECT dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos_sim DESC, dst) AS rk
    FROM pairs)
  WHERE rk <= {_HUB_K}
), indeg AS (
  SELECT e.vec_id,
         CAST(count(k.dst) AS BIGINT) AS in_degree
  FROM e LEFT JOIN knn k ON k.dst = e.vec_id
  GROUP BY e.vec_id
)
SELECT in_degree,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM indeg GROUP BY in_degree"""


@stage(
    "hubness_indegree_embeddings",
    _HUBNESS_ORACLE,
    "embedding-space pathology check: the IN-DEGREE distribution of "
    "the within-cell kNN graph (k=5, cells = the IVF label "
    "quantizer) — HUBNESS is the high-dimensional failure mode where "
    "a few vectors appear in everyone's neighbor lists (a heavy "
    "right tail here) while many are never retrieved (mass at 0), "
    "silently biasing both ANN retrieval and hard-negative mining. "
    "Healthy spaces concentrate near in-degree k. Pairs only meet "
    "inside a label cell (the SemDeDup equi-join bound, never a "
    "corpus cross join); per-source top-k is one window; the "
    "histogram is a k-sized rollup.",
)
def hubness_indegree_embeddings(spark, sf_dir):
    from .ext.similarity import dot_col

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).persist()
    emb.count()  # reused by both join sides and the left join below
    n2 = dot_col(F.col("v"), F.col("v"))
    a = emb.select(
        "label", F.col("vec_id").alias("src"),
        F.col("v").alias("va"), n2.alias("na2"),
    )
    b = emb.select(
        "label", F.col("vec_id").alias("dst"),
        F.col("v").alias("vb"), n2.alias("nb2"),
    )
    cos = F.round(
        dot_col(F.col("va"), F.col("vb"))
        / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
        6,
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.col("dst"))
    knn = (
        a.join(b, ["label"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", cos.alias("cos_sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HUB_K)
        .select("dst")
    )
    indeg = (
        emb.select("vec_id")
        .join(
            knn.groupBy("dst").agg(F.count(F.lit(1)).alias("d")),
            emb.vec_id == F.col("dst"),
            "left",
        )
        .select(F.coalesce(F.col("d"), F.lit(0)).alias("in_degree"))
    )
    return indeg.groupBy("in_degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    ).select(F.col("in_degree").cast("long").alias("in_degree"), "n_vectors")


# ---------------------------------------------------------------------
# 11. Anomaly run lengths (does the incident persist?)
# ---------------------------------------------------------------------

_ANOM_RUN_ORACLE = """WITH daily AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_index,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), wk AS (
  SELECT day_index, n, day_index % 7 AS dow,
         CAST(sum(n) OVER (PARTITION BY day_index % 7) AS BIGINT) AS tot_w,
         CAST(count(*) OVER (PARTITION BY day_index % 7) AS BIGINT) AS k_w
  FROM daily
), ranked AS (
  SELECT day_index, k_w,
         row_number() OVER (PARTITION BY dow
                            ORDER BY abs(n * k_w - tot_w) DESC, day_index)
           AS rk
  FROM wk
), islands AS (
  SELECT day_index - row_number() OVER (ORDER BY day_index) AS grp
  FROM ranked WHERE rk <= (k_w + 4) // 5
), runs AS (
  SELECT CAST(count(*) AS BIGINT) AS run_len FROM islands GROUP BY grp
)
SELECT run_len, CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY run_len"""


@stage(
    "anomaly_run_lengths_events",
    _ANOM_RUN_ORACLE,
    "incident persistence: the RUN-LENGTH histogram of consecutive "
    "extreme days — per weekday, the top ceil(20%) days by absolute "
    "deviation from that weekday's mean are flagged (rank on the "
    "EXACT integer |n*k_w - tot_w| with day_index tiebreak, so the "
    "flag set is non-vacuous at every scale — a fixed relative "
    "threshold goes silent as Poisson noise shrinks; portable "
    "integer dow = epoch_day % 7). Isolated flags are noise; runs of "
    "3+ are regime changes — the one-day detectors "
    "(weekday_adjusted_anomaly, CUSUM) cannot see duration, which is "
    "what paging policy keys on. Calendar-sized data end to end "
    "after one grouped scan.",
)
def anomaly_run_lengths_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (F.unix_timestamp("ts") / 86400).cast("long").alias("day_index")
    ).agg(F.count(F.lit(1)).alias("n"))
    wdow = Window.partitionBy(F.col("day_index") % 7)
    wk = daily.select(
        "day_index",
        "n",
        (F.col("day_index") % 7).alias("dow"),
        F.sum("n").over(wdow).alias("tot_w"),
        F.count(F.lit(1)).over(wdow).alias("k_w"),
    )
    wrank = Window.partitionBy("dow").orderBy(
        F.abs(F.col("n") * F.col("k_w") - F.col("tot_w")).desc(),
        F.col("day_index"),
    )
    ranked = wk.withColumn("rk", F.row_number().over(wrank))
    wisl = Window.orderBy("day_index")
    runs = (
        ranked.filter(
            F.col("rk") <= F.floor((F.col("k_w") + 4) / 5).cast("int")
        )
        .select(
            (F.col("day_index") - F.row_number().over(wisl)).alias("grp")
        )
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("run_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs")
    ).select(F.col("run_len").cast("long").alias("run_len"), "n_runs")


# ---------------------------------------------------------------------
# 12. Supplier redundancy per brand (single-source risk)
# ---------------------------------------------------------------------

_SUPPLIER_REDUNDANCY_ORACLE = """WITH per_part AS (
  SELECT l.l_partkey, p.p_brand,
         CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY l.l_partkey, p.p_brand
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_sourced,
       round(CAST(sum(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS single_source_share,
       CAST(max(n_suppliers) AS BIGINT) AS max_suppliers
FROM per_part GROUP BY p_brand"""


@stage(
    "supplier_redundancy_lineitem",
    _SUPPLIER_REDUNDANCY_ORACLE,
    "supply-chain risk: per brand, the share of parts OBSERVED with a "
    "single supplier across the order history (the single-source-of-"
    "failure rate q16's supplier counting never aggregates to) plus "
    "the redundancy ceiling. Distinct supplier counts per part ride "
    "one grouped pass over the lineitem-part broadcast join; the "
    "brand rollup is dimension-sized. At 100 TB the exact distinct "
    "swaps for approx_count_distinct exactly as documented for the "
    "uniqueness family.",
)
def supplier_redundancy_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "p_brand")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"))
    )
    return per_part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum((F.col("n_suppliers") == 1).cast("long")).alias(
            "n_single_sourced"
        ),
        F.round(
            F.sum((F.col("n_suppliers") == 1).cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("single_source_share"),
        F.max("n_suppliers").cast("long").alias("max_suppliers"),
    )


# ---------------------------------------------------------------------
# 13. Behavioral-profile outliers (type-mix cosine to the global mix)
# ---------------------------------------------------------------------

_TYPES = ["click", "view", "purchase", "signup", "error"]


def _profile_cosine_sql() -> str:
    ccols = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c{i}"
        for i, t in enumerate(_TYPES)
    )
    gcols = ", ".join(f"CAST(sum(c{i}) AS BIGINT) AS g{i}" for i in range(5))
    # explicit in-order 5-term sums: identical IEEE order on both engines
    dot = " + ".join(
        f"CAST(u.c{i} AS DOUBLE) * CAST(g.g{i} AS DOUBLE)" for i in range(5)
    )
    nu = " + ".join(
        f"CAST(u.c{i} AS DOUBLE) * CAST(u.c{i} AS DOUBLE)" for i in range(5)
    )
    ng = " + ".join(
        f"CAST(g.g{i} AS DOUBLE) * CAST(g.g{i} AS DOUBLE)" for i in range(5)
    )
    return f"""WITH u AS (
  SELECT user_id, {ccols} FROM events GROUP BY user_id
), g AS (
  SELECT {gcols} FROM u
), scored AS (
  SELECT u.user_id,
         round(({dot}) / (sqrt({nu}) * sqrt({ng})), 6) AS cos_sim
  FROM u CROSS JOIN g
)
SELECT CAST(least(floor(cos_sim * 10), 9) AS BIGINT) AS cos_band,
       CAST(count(*) AS BIGINT) AS n_users,
       round(min(cos_sim), 6) AS min_cos
FROM scored GROUP BY 1"""


@stage(
    "behavior_profile_outliers_events",
    _profile_cosine_sql(),
    "behavioral outlier QC: every user as a 5-dim event-type count "
    "vector, scored by COSINE to the GLOBAL type mix and banded into "
    "deciles — bots and instrumentation loops live in the low bands "
    "(their mix is one-hot-ish while organic users track the global "
    "profile). All counts exact integers; the cosine is an EXPLICIT "
    "in-order 5-term expression on both engines (no group-sum "
    "reordering), rounded 6dp before the integer floor banding. One "
    "grouped scan + a 1-row global broadcast; the histogram is "
    "10-row.",
)
def behavior_profile_outliers_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        *[
            F.sum((F.col("event_type") == t).cast("long")).alias(f"c{i}")
            for i, t in enumerate(_TYPES)
        ]
    )
    g = u.agg(*[F.sum(f"c{i}").alias(f"g{i}") for i in range(5)])
    dot = None
    nu = None
    ng = None
    for i in range(5):
        d = F.col(f"c{i}").cast("double") * F.col(f"g{i}").cast("double")
        a = F.col(f"c{i}").cast("double") * F.col(f"c{i}").cast("double")
        b = F.col(f"g{i}").cast("double") * F.col(f"g{i}").cast("double")
        dot = d if dot is None else dot + d
        nu = a if nu is None else nu + a
        ng = b if ng is None else ng + b
    scored = u.crossJoin(F.broadcast(g)).select(
        F.round(dot / (F.sqrt(nu) * F.sqrt(ng)), 6).alias("cos_sim")
    )
    return (
        scored.groupBy(
            F.least(F.floor(F.col("cos_sim") * 10), F.lit(9))
            .cast("long")
            .alias("cos_band")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.min("cos_sim"), 6).alias("min_cos"),
        )
    )


# ---------------------------------------------------------------------
# 14. Reciprocal-neighbor rate of the within-cell kNN graph
# ---------------------------------------------------------------------

_RECIP_ORACLE = f"""WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round(list_sum(list_transform(range(1, 65),
                 i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> a.v[i] * a.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65),
                 i -> b.v[i] * b.v[i])))), 6) AS cos_sim
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
), knn AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src
                              ORDER BY cos_sim DESC, dst) AS rk
    FROM pairs)
  WHERE rk <= {_HUB_K}
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN r.src IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_mutual,
       round(CAST(sum(CASE WHEN r.src IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
             / count(*), 6) AS reciprocal_share
FROM knn k
LEFT JOIN knn r ON r.src = k.dst AND r.dst = k.src"""


@stage(
    "reciprocal_neighbor_rate_embeddings",
    _RECIP_ORACLE,
    "neighborhood symmetry QC: the share of within-cell kNN edges "
    "(k=5, same graph as hubness_indegree_embeddings) that are "
    "MUTUAL — i's neighbor j also lists i. Low reciprocity is the "
    "other face of hubness (hub edges are one-way by construction) "
    "and predicts poor kNN-graph clustering and unreliable "
    "reciprocal-rank retrieval metrics. One self-equi-join of the "
    "edge list on reversed keys; everything upstream is the bounded "
    "cell join.",
)
def reciprocal_neighbor_rate_embeddings(spark, sf_dir):
    from .ext.similarity import dot_col

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).persist()
    emb.count()
    n2 = dot_col(F.col("v"), F.col("v"))
    a = emb.select(
        "label", F.col("vec_id").alias("src"),
        F.col("v").alias("va"), n2.alias("na2"),
    )
    b = emb.select(
        "label", F.col("vec_id").alias("dst"),
        F.col("v").alias("vb"), n2.alias("nb2"),
    )
    cos = F.round(
        dot_col(F.col("va"), F.col("vb"))
        / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2"))),
        6,
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.col("dst"))
    knn = (
        a.join(b, ["label"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", cos.alias("cos_sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HUB_K)
        .select("src", "dst")
        .persist()
    )
    knn.count()
    rev = knn.select(
        F.col("src").alias("rdst"), F.col("dst").alias("rsrc")
    ).withColumn("__m", F.lit(1))
    joined = knn.join(
        rev, (F.col("src") == F.col("rsrc")) & (F.col("dst") == F.col("rdst")),
        "left",
    )
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.coalesce(F.col("__m"), F.lit(0))).cast("long").alias(
            "n_mutual"
        ),
        F.round(
            F.sum(F.coalesce(F.col("__m"), F.lit(0))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("reciprocal_share"),
    )


# ---------------------------------------------------------------------
# 15. Return rate per supplier (ops quality ranking)
# ---------------------------------------------------------------------

_RETURN_RATE_ORACLE = """SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS return_share
FROM lineitem GROUP BY l_suppkey"""


@stage(
    "return_rate_by_supplier",
    _RETURN_RATE_ORACLE,
    "supplier quality ranking: per-supplier item counts and RETURN "
    "share (l_returnflag = 'R') — q10 aggregates returns by customer "
    "for revenue recovery; this is the other side of the ledger, the "
    "supplier scorecard procurement actually reviews. One grouped "
    "scan, exact integer counts, a single rounded division.",
)
def return_rate_by_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_suppkey").cast("long").alias("suppkey")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).alias("n_returned"),
        F.round(
            F.sum((F.col("l_returnflag") == "R").cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("return_share"),
    )


# ---------------------------------------------------------------------
# 16. Grouped Pearson correlation (quantity vs price per brand)
# ---------------------------------------------------------------------

_GROUPED_CORR_ORACLE = """WITH q AS (
  SELECT p.p_brand,
         CAST(round(CAST(l.l_quantity AS DOUBLE) * 100.0) AS BIGINT) AS qx,
         CAST(round(CAST(l.l_extendedprice AS DOUBLE) * 100.0) AS BIGINT)
           AS qy
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), s AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qx) AS BIGINT) AS sx,
         CAST(sum(qy) AS BIGINT) AS sy,
         CAST(sum(qx * qx) AS BIGINT) AS sxx,
         CAST(sum(qy * qy) AS BIGINT) AS syy,
         CAST(sum(qx * qy) AS BIGINT) AS sxy
  FROM q GROUP BY p_brand
)
SELECT p_brand, n,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             6) AS corr_qty_price
FROM s"""


@stage(
    "qty_price_corr_by_brand",
    _GROUPED_CORR_ORACLE,
    "GROUPED Pearson correlation — the per-segment version of the "
    "global corr_matrix machinery (A5's target-leakage check scoped "
    "to a dimension): quantity vs extended price per brand, from "
    "quantized-exact (cents) int64 moment sums so every engine "
    "accumulates identical integers, combined in ONE explicit "
    "double-arithmetic expression per group and rounded 6dp. A brand "
    "whose correlation diverges from the pack prices nonlinearly — "
    "the pricing-anomaly screen. Scale note: sum(qy*qy) reaches "
    "~2.4e18 at sf0.1 (price cents squared); beyond sf1 the y-moment "
    "needs a coarser quantum, documented here so the overflow is a "
    "decision, not a surprise. One broadcast-joined grouped scan.",
)
def qty_price_corr_by_brand(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    q = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.round(F.col("l_quantity").cast("double") * 100).cast("long").alias(
            "qx"
        ),
        F.round(F.col("l_extendedprice").cast("double") * 100)
        .cast("long")
        .alias("qy"),
    )
    s = q.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
        F.sum(F.col("qy") * F.col("qy")).alias("syy"),
        F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    dx = F.sqrt(nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
    dy = F.sqrt(nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    return s.select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        F.round(num / (dx * dy), 6).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------------
# 17. Multimodal format-mix drift between corpus halves
# ---------------------------------------------------------------------

_FORMAT_DRIFT_ORACLE = """WITH half AS (
  SELECT (SELECT (max(doc_id) + 1) // 2 FROM documents) AS h
), img AS (
  SELECT CASE CAST(doc_id % 3 AS INTEGER)
              WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
         CASE WHEN doc_id < (SELECT h FROM half) THEN 0 ELSE 1 END AS period
  FROM documents
), cells AS (
  SELECT format,
         CAST(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM img GROUP BY format
), margins AS (
  SELECT format, c0, c1,
         sum(c0) OVER () AS n0, sum(c1) OVER () AS n1,
         sum(c0 + c1) OVER () AS n
  FROM cells
)
SELECT format, c0, c1,
       round((c0 - CAST(c0 + c1 AS DOUBLE) * n0 / n)
             * (c0 - CAST(c0 + c1 AS DOUBLE) * n0 / n)
             / (CAST(c0 + c1 AS DOUBLE) * n0 / n)
             + (c1 - CAST(c0 + c1 AS DOUBLE) * n1 / n)
             * (c1 - CAST(c0 + c1 AS DOUBLE) * n1 / n)
             / (CAST(c0 + c1 AS DOUBLE) * n1 / n), 6) AS chi2_contrib
FROM margins"""


@stage(
    "format_mix_drift_multimodal",
    _FORMAT_DRIFT_ORACLE,
    "multimodal ingest drift: the container-FORMAT mix (png/jpeg/wav, "
    "parsed FROM THE BYTES by the real header parser on the Spark "
    "side) compared between the first and second half of the corpus "
    "by doc_id, with per-format chi-square contributions — a feed "
    "that silently flips image codecs shows up here before any "
    "decode budget is spent. The oracle replays the payload "
    "generator's arithmetic (the multimodal_header_meta contract: a "
    "parser bit-offset bug breaks the match); the half split is an "
    "exact integer compare against (max(doc_id)+1)//2. Scale shape: "
    "Arrow-batched header parse, 3x2 cells, window margins.",
)
def format_mix_drift_multimodal(spark, sf_dir):
    from typing import Iterator as _It

    import pandas as _pd

    from .ext import multimodal as X_mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    half = docs.agg(
        F.floor((F.max("doc_id") + 1) / 2).cast("long").alias("h")
    )

    def synth(batches: "_It[_pd.DataFrame]"):
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                kind = ("png", "jpeg", "wav")[i % 3]
                payloads.append(
                    X_mm.synthesize_payload(
                        kind, width=16 + i % 512, height=16 + (i * 7) % 512
                    )
                )
                ids.append(i)
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                }
            )

    payloads = docs.mapInPandas(synth, "doc_id long, payload binary")
    meta = X_mm.parse_media_headers(payloads, "doc_id")
    cells = (
        meta.crossJoin(F.broadcast(half))
        .select(
            "format",
            F.when(F.col("id") < F.col("h"), 0).otherwise(1).alias(
                "period"
            ),
        )
        .groupBy("format")
        .agg(
            F.sum(F.when(F.col("period") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c0"),
            F.sum(F.when(F.col("period") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
        )
    )
    wall = Window.partitionBy()
    m = cells.select(
        "format", "c0", "c1",
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum(F.col("c0") + F.col("c1")).over(wall).alias("n"),
    )
    rt = F.col("c0") + F.col("c1")
    e0 = rt.cast("double") * F.col("n0") / F.col("n")
    e1 = rt.cast("double") * F.col("n1") / F.col("n")
    return m.select(
        "format", "c0", "c1",
        F.round(
            (F.col("c0") - e0) * (F.col("c0") - e0) / e0
            + (F.col("c1") - e1) * (F.col("c1") - e1) / e1,
            6,
        ).alias("chi2_contrib"),
    )


# ---------------------------------------------------------------------
# 18. KS distance between customer segments (acctbal)
# ---------------------------------------------------------------------

_KS_SEGMENTS = ("BUILDING", "MACHINERY")

_KS_SEG_ORACLE = f"""WITH v AS (
  SELECT CASE WHEN c_mktsegment = '{_KS_SEGMENTS[0]}' THEN 0 ELSE 1 END
           AS split,
         CAST(c_acctbal AS DOUBLE) AS value
  FROM customer
  WHERE c_mktsegment IN ('{_KS_SEGMENTS[0]}', '{_KS_SEGMENTS[1]}')
), cells AS (
  SELECT value,
         sum(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS c1
  FROM v GROUP BY value
), tot AS (
  SELECT sum(c0) AS n0, sum(c1) AS n1 FROM cells
), ecdf AS (
  SELECT sum(c0) OVER (ORDER BY value) AS cum0,
         sum(c1) OVER (ORDER BY value) AS cum1
  FROM cells
)
SELECT round(max(abs(CAST(cum0 AS DOUBLE) / t.n0
                   - CAST(cum1 AS DOUBLE) / t.n1)), 9) AS ks_stat,
       CAST(t.n0 AS BIGINT) AS n0, CAST(t.n1 AS BIGINT) AS n1
FROM ecdf, tot t GROUP BY t.n0, t.n1"""


@stage(
    "ks_acctbal_segments",
    _KS_SEG_ORACLE,
    "segment-comparison KS: the exact two-sample Kolmogorov-Smirnov "
    "distance between account-balance distributions of two customer "
    "market segments — 'do these segments differ in wealth "
    "distribution or only in mean' is a shape question KS answers "
    "without binning. ks_test_events' exact protocol (ECDFs at "
    "distinct values so ties step once, exact int cumulative counts, "
    "one double division per step, 9dp): this is its dimension-scoped "
    "face on a new table, and the same single-task-ordered-window "
    "parity-probe caveat applies at 100 TB (use the quantile-bucketed "
    "variant there, as documented for ks_test_events).",
)
def ks_acctbal_segments(spark, sf_dir):
    # calls the first-class ext.stats operator (round-8 extraction —
    # the round-7 verdict ask: staged queries must not inline the
    # cells/ECDF machinery)
    from .ext.stats import ks_two_sample

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*_KS_SEGMENTS)
    )
    v = cust.select(
        F.when(F.col("c_mktsegment") == _KS_SEGMENTS[0], 0)
        .otherwise(1)
        .alias("split"),
        F.col("c_acctbal").cast("double").alias("value"),
    )
    return ks_two_sample(v)


# ---------------------------------------------------------------------
# 19. Order backlog aging (open orders by order year)
# ---------------------------------------------------------------------

_BACKLOG_ORACLE = """SELECT o_orderstatus,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100.0)
                           AS BIGINT)) AS DOUBLE) / 100.0, 6)
         AS total_value
FROM orders GROUP BY o_orderstatus, year(o_orderdate)"""


@stage(
    "order_backlog_aging",
    _BACKLOG_ORACLE,
    "fulfillment backlog aging: order counts and cent-exact value by "
    "status x order year — the 'O' (open) rows aged by origin year "
    "are working capital stuck in the pipeline, and an old open "
    "cohort that is not shrinking is a fulfillment leak (q4 counts "
    "late lineitems inside a quarter; this is the order-level "
    "balance-sheet view across the whole history). One grouped scan; "
    "year() agrees across engines on DATE columns.",
)
def order_backlog_aging(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("order_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(
                F.round(F.col("o_totalprice").cast("double") * 100).cast("long")
            ).cast("double")
            / F.lit(100.0),
            6,
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------
# 20. Vocabulary growth checkpoints (Heaps-law face of novelty)
# ---------------------------------------------------------------------

_VOCAB_Q = [25, 50, 75, 100]


def _vocab_growth_oracle() -> str:
    cols = []
    for pct in _VOCAB_Q:
        pred = f"doc_id * 100 < mx.m * {pct}"
        cols.append(
            f"CAST(count(DISTINCT CASE WHEN {pred} THEN w END) AS BIGINT)"
            f" AS v{pct}"
        )
        cols.append(
            f"CAST(count(CASE WHEN {pred} THEN w END) AS BIGINT) AS t{pct}"
        )
    sel = ", ".join(cols)
    rows = []
    prev = None
    for pct in _VOCAB_Q:
        nov = (
            f"round(CAST(v{pct} - v{prev} AS DOUBLE) / "
            f"nullif(v{pct}, 0), 6)"
            if prev
            else f"round(CAST(v{pct} AS DOUBLE) / nullif(v{pct}, 0), 6)"
        )
        rows.append(
            f"SELECT CAST({pct} AS BIGINT) AS pct, t{pct} AS cum_tokens, "
            f"v{pct} AS distinct_words, {nov} AS novelty_share FROM agg"
        )
        prev = pct
    return f"""WITH mx AS (
  SELECT max(doc_id) + 1 AS m FROM documents
), words AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[[:space:]]+'),
                            x -> x <> '')) AS w
  FROM documents
), agg AS (
  SELECT {sel} FROM words CROSS JOIN mx
)
{" UNION ALL ".join(rows)}"""


@stage(
    "vocab_growth_checkpoints_documents",
    _vocab_growth_oracle(),
    "corpus saturation (the Heaps-law face of ngram_novelty_decay, on "
    "unigrams): cumulative token and DISTINCT-word counts at the 25/"
    "50/75/100% doc_id checkpoints, plus each quarter's share of the "
    "running vocabulary that is NEW — when novelty_share goes flat, "
    "more of the same crawl stops buying vocabulary and the budget "
    "should move to new sources. Checkpoint membership is the exact "
    "integer compare doc_id*100 < max*pct; all four checkpoints are "
    "conditional distinct/count aggregates in ONE grouped pass (never "
    "four scans). Scale: exact distincts swap for "
    "approx_count_distinct at 100 TB, as documented for the "
    "uniqueness family.",
)
def vocab_growth_checkpoints_documents(spark, sf_dir):
    from .ext.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg((F.max("doc_id") + 1).alias("m"))
    words = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("w")
    )
    aggs = []
    for pct in _VOCAB_Q:
        pred = F.col("doc_id") * 100 < F.col("m") * pct
        aggs.append(
            F.countDistinct(F.when(pred, F.col("w"))).alias(f"v{pct}")
        )
        aggs.append(F.count(F.when(pred, F.col("w"))).alias(f"t{pct}"))
    agg = words.crossJoin(F.broadcast(mx)).agg(*aggs)
    rows = []
    prev = None
    for pct in _VOCAB_Q:
        if prev is None:
            nov = F.col(f"v{pct}").cast("double") / F.nullif(
                F.col(f"v{pct}"), F.lit(0)
            )
        else:
            nov = (F.col(f"v{pct}") - F.col(f"v{prev}")).cast(
                "double"
            ) / F.nullif(F.col(f"v{pct}"), F.lit(0))
        rows.append(
            F.struct(
                F.lit(pct).cast("long").alias("pct"),
                F.col(f"t{pct}").cast("long").alias("cum_tokens"),
                F.col(f"v{pct}").cast("long").alias("distinct_words"),
                F.round(nov, 6).alias("novelty_share"),
            )
        )
        prev = pct
    return agg.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.pct", "s.cum_tokens", "s.distinct_words", "s.novelty_share"
    )


# ---------------------------------------------------------------------
# Round-10 promotion hook (second pass; see queries_more's re-entrancy
# note): this module bootstraps the catalog chain BEFORE defining
# STAGED_R10, so importing THIS module first runs the whole
# registration chain while STAGED_R10 is still empty. Re-invoking the
# skip-if-registered promotion here — after all twenty entries exist —
# makes the catalog complete under either import order (the
# queries_staging_r8/r9 pattern, verbatim).
# ---------------------------------------------------------------------

from .queries_more import _promote_staged_r10 as _promote  # noqa: E402

_promote()
del _promote
