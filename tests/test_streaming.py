"""Structured Streaming contract enforcement (extension; SURVEY §2.9)."""

import time

import pytest

from pyspark.sql import Row, functions as F

from dce_spark.parser import parse_yaml
from dce_spark.streaming import streaming_quality_aggregates, validate_stream

CONTRACT = parse_yaml(
    """
version: "1.0.0"
name: stream_events
owner: data-eng
schema:
  fields:
    - name: id
      type: int64
      nullable: false
    - name: kind
      type: string
      constraints:
        - type: allowedvalues
          values: [a, b]
    - name: ts
      type: timestamp
"""
)


def test_validate_stream_per_batch(spark, tmp_path):
    reports = {}

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            F.col("value").alias("id"),
            F.when(F.col("value") % 10 == 0, "zzz").otherwise("a").alias("kind"),
            F.col("timestamp").alias("ts"),
        )
    )
    q = validate_stream(
        spark,
        src,
        CONTRACT,
        on_report=lambda bid, rep: reports.setdefault(bid, rep),
        checkpointLocation=str(tmp_path / "ckpt"),
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            done = [r for r in reports.values() if r.stats.records_validated > 0]
            if done:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert done, "no non-empty micro-batch validated within 60s"
    rep = done[0]
    # every 10th row violates allowed-values -> report fails
    assert not rep.passed
    names = {c.name for c in rep.checks}
    assert "constraints.allowedvalues:kind" in names


def test_streaming_quality_aggregates_plan(spark):
    # plan-level check: the windowed aggregate compiles and is streaming
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.col("value").alias("id"),
            F.lit("a").alias("kind"),
            F.col("timestamp").alias("ts"),
        )
    )
    out = streaming_quality_aggregates(src, CONTRACT, ts_col="ts")
    assert out.isStreaming
    cols = set(out.columns)
    assert {"window_start", "window_end", "n_rows", "nulls_id", "viol_kind_0"} <= cols


def test_batch_equivalence_of_quality_aggregates(spark):
    # the same aggregate expressions over a static frame give the counts
    from datetime import datetime

    df = spark.createDataFrame(
        [
            Row(id=1, kind="a", ts=datetime(2024, 1, 1, 0, 0, 10)),
            Row(id=None, kind="zzz", ts=datetime(2024, 1, 1, 0, 0, 20)),
        ]
    )
    from dce_spark.checks.constraints import violation_expr

    kind_check = CONTRACT.schema.fields[1].constraints[0]
    agg = df.agg(
        F.sum(F.col("id").isNull().cast("long")).alias("nulls_id"),
        F.sum(violation_expr(F.col("kind"), kind_check).cast("long")).alias("viol"),
    ).collect()[0]
    assert agg["nulls_id"] == 1 and agg["viol"] == 1


# ---- custom stateful operator: applyInPandasWithState sessionization

def test_fold_sessions_pure():
    from dce_spark.streaming import fold_sessions

    # no state, one burst, no gap exceeded -> stays open
    closed, open_s, d = fold_sessions([1.0, 2.0, 3.0], None, gap_seconds=5)
    assert closed == [] and open_s == (1.0, 3.0, 3) and d == 0
    # gap exceeded mid-stream -> closes first session
    closed, open_s, d = fold_sessions(
        [1.0, 2.0, 30.0, 31.0], None, gap_seconds=5
    )
    assert closed == [(1.0, 2.0, 2)] and open_s == (30.0, 31.0, 2) and d == 0
    # resumes from prior state across micro-batches
    closed, open_s, d = fold_sessions([100.0], (1.0, 2.0, 2), gap_seconds=5)
    assert closed == [(1.0, 2.0, 2)] and open_s == (100.0, 100.0, 1)
    closed, open_s, d = fold_sessions([3.0], (1.0, 2.0, 2), gap_seconds=5)
    assert closed == [] and open_s == (1.0, 3.0, 3) and d == 0
    # empty batch keeps state
    closed, open_s, d = fold_sessions([], (1.0, 2.0, 2), gap_seconds=5)
    assert closed == [] and open_s == (1.0, 2.0, 2) and d == 0
    # DISORDER CONTRACT (round 9): a cross-batch event strictly behind
    # the open session's START drops and counts — whether it belonged
    # to an earlier (possibly already-emitted) session is unknowable;
    # an event INSIDE the open span merges losslessly (boundaries
    # unchanged, count grows — exactly the batch global-sort answer)
    closed, open_s, d = fold_sessions([0.5, 1.5], (1.0, 2.0, 2), gap_seconds=5)
    assert closed == [] and open_s == (1.0, 2.0, 3) and d == 1
    closed, open_s, d = fold_sessions([2.0], (1.0, 2.0, 2), gap_seconds=5)
    assert closed == [] and open_s == (1.0, 2.0, 3) and d == 0


def test_next_deadline_rearm_only_on_end_advance():
    """Round-9 ADVICE pin: the idle-flush deadline re-arms the FULL
    gap only when the open session's END advanced. A batch of
    dropped-late events OR of in-span late/duplicate merges (n grows,
    boundaries don't) keeps the armed deadline — either kind arriving
    as a steady trickle must not postpone the flush indefinitely."""
    from dce_spark.streaming import next_deadline

    gap, now, armed = 30.0, 1000.0, 1010.0
    prev = (1.0, 50.0, 3)
    # new activity: end advanced -> full re-arm
    assert next_deadline(prev, (1.0, 60.0, 4), armed, now, gap) == now + gap
    # all events dropped: state unchanged -> keep armed deadline
    assert next_deadline(prev, prev, armed, now, gap) == armed
    # in-span late duplicate: n grew, end did NOT advance -> keep
    # the armed deadline (the round-9 fix re-armed the full gap here)
    assert next_deadline(prev, (1.0, 50.0, 4), armed, now, gap) == armed
    # fresh key (no prior state) -> full arm
    assert next_deadline(None, (5.0, 5.0, 1), None, now, gap) == now + gap
    # prior state but no armed deadline recorded -> full arm (defensive)
    assert next_deadline(prev, (1.0, 50.0, 4), None, now, gap) == now + gap


def test_fold_matches_batch_sessionization(spark, sf_dir):
    """The stateful fold and the batch lag-window query must agree on
    session counts per user (same gap semantics, two formulations)."""
    from collections import defaultdict

    from dce_spark.data import load_table
    from dce_spark.queries import QUERIES
    from dce_spark.streaming import fold_sessions

    GAP = 1800.0
    df = load_table(spark, sf_dir, "events")
    rows = (
        df.select("user_id", F.unix_timestamp("ts").alias("t"))
        .orderBy("user_id", "t")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(float(r["t"]))
    fold_counts = {}
    for u, ts in by_user.items():
        closed, open_s, _ = fold_sessions(ts, None, GAP)
        fold_counts[u] = len(closed) + (1 if open_s else 0)
    batch = QUERIES["sessionization_events"].fn(spark, sf_dir).collect()
    batch_counts = {r["user_id"]: r["n_sessions"] for r in batch}
    assert fold_counts == batch_counts


def test_stateful_sessionize_stream(spark, tmp_path):
    """Live applyInPandasWithState query: rate source, 2 users, ~1 event
    per user-second, gap 0.5s -> every event closes the previous
    session; closed sessions must reach the sink."""
    from dce_spark.streaming import stateful_sessionize

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "2").load()
        .select(
            (F.col("value") % 2).alias("user_id"),
            F.col("timestamp").alias("ts"),
        )
    )
    out = stateful_sessionize(src, gap_seconds=0.5)
    assert out.isStreaming
    assert set(out.columns) == {"user_id", "session_start", "session_end", "n_events"}
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM sessions_test").head()["n"]
            if n >= 2:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert n >= 2, f"expected closed sessions in the sink, got {n}"
    sample = spark.sql(
        "SELECT * FROM sessions_test ORDER BY session_start LIMIT 5"
    ).collect()
    for r in sample:
        assert r["user_id"] in (0, 1)
        assert r["n_events"] >= 1
        assert r["session_end"] >= r["session_start"]


def test_fold_sessions_properties():
    """Property-based: for any event-time sequence and gap, the fold
    conserves events, produces chronologically ordered non-overlapping
    sessions separated by more than gap, and no intra-session gap
    exceeds the threshold."""
    from hypothesis import given, settings, strategies as st

    from dce_spark.streaming import fold_sessions

    @settings(max_examples=200, deadline=None)
    @given(
        ts=st.lists(st.floats(0, 1e6, allow_nan=False), max_size=50),
        gap=st.floats(0.1, 1e4, allow_nan=False),
    )
    def check(ts, gap):
        ts = sorted(ts)
        closed, open_s, dropped = fold_sessions(ts, None, gap)
        assert dropped == 0  # sorted input never drops
        sessions = closed + ([open_s] if open_s else [])
        assert sum(n for _, _, n in sessions) == len(ts)
        for start, last, n in sessions:
            assert start <= last and n >= 1
        for (s1, l1, _), (s2, _, _) in zip(sessions, sessions[1:]):
            assert s2 - l1 > gap  # consecutive sessions separated by > gap
        # replaying in two chunks gives the same result as one pass
        for cut in (0, len(ts) // 2, len(ts)):
            c1, o1, d1 = fold_sessions(ts[:cut], None, gap)
            c2, o2, d2 = fold_sessions(ts[cut:], o1, gap)
            assert (c1 + c2, o2, d1 + d2) == (closed, open_s, 0)

    check()


def test_streaming_exact_dedup(spark, tmp_path):
    """Live dedup stream: duplicate payloads within the watermark horizon
    must be admitted once. Rate source emits the same 5 texts repeatedly;
    the sink must hold at most 5 distinct fingerprints' worth of rows."""
    from dce_spark.streaming import streaming_exact_dedup

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "20").load()
        .select(
            F.concat(F.lit("doc "), (F.col("value") % 5).cast("string")).alias("text"),
            F.col("timestamp").alias("ts"),
        )
    )
    out = streaming_exact_dedup(src, watermark_delay="1 hour")
    assert out.isStreaming and set(out.columns) == {"text", "ts"}
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM dedup_test").head()["n"]
            if n >= 3:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert n >= 3, "no deduped rows reached the sink"
    texts = [r["text"] for r in spark.sql("SELECT text FROM dedup_test").collect()]
    assert len(texts) == len(set(texts)) <= 5  # each payload admitted once


def test_streaming_curation_gate_matches_batch(spark, tmp_path):
    """The curation gate is a stateless projection, so the SAME function
    runs on a file stream and must emit exactly the batch result."""
    import shutil

    from dce_spark.ext.text import curation_decisions

    srcdir = tmp_path / "stream_src"
    srcdir.mkdir()
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(30)), "en"),  # kept
            (2, "tiny doc", "en"),                     # too_short
            (3, ("dup pair " * 40).strip(), "en"),     # repetitive (and long)
            (4, " ".join(f"wort{i}" for i in range(30)), "de"),  # non-target lang
        ],
        schema="doc_id long, text string, lang string",
    )
    docs.coalesce(1).write.parquet(str(srcdir / "batch0"))

    batch = {
        r["doc_id"]: r for r in curation_decisions(
            spark.read.parquet(str(srcdir / "batch0"))
        ).collect()
    }
    assert batch[1]["kept"] and batch[1]["drop_reasons"] == ""
    # a 2-word doc's single bigram has frac 1.0 — reasons are independent
    assert batch[2]["drop_reasons"] == "too_repetitive,too_short"
    assert "too_repetitive" in batch[3]["drop_reasons"]
    assert batch[4]["drop_reasons"] == "non_target_lang"

    stream_src = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .parquet(str(srcdir / "batch0"))
    )
    q = (
        curation_decisions(stream_src)
        .writeStream.format("memory")
        .queryName("curated_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {
        r["doc_id"]: r for r in spark.sql("SELECT * FROM curated_stream").collect()
    }
    assert {k: tuple(v) for k, v in streamed.items()} == {
        k: tuple(v) for k, v in batch.items()
    }


def test_streaming_binned_drift_matches_batch(spark, tmp_path):
    """Windowed binned counts + ref proportions on a stream equal the
    same computation done in batch, and the summed PSI is ~0 when the
    stream IS the reference distribution."""
    from dce_spark.streaming.drift import psi_term_of, streaming_binned_drift

    srcdir = tmp_path / "drift_src"
    srcdir.mkdir()
    rows = [
        (float(v % 10), f"2024-01-01 00:00:{s:02d}")
        for s, v in enumerate(range(60))
    ]
    df = spark.createDataFrame(rows, schema="value double, ts_s string").select(
        "value", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.coalesce(1).write.parquet(str(srcdir / "b0"))

    # reference: uniform over [0, 9] -> 5 equal bins
    ref_props = [0.2] * 5
    stream = (
        spark.readStream.schema("value double, ts timestamp")
        .parquet(str(srcdir / "b0"))
    )
    q = (
        streaming_binned_drift(
            stream, "value", "ts", ref_min=0.0, ref_max=9.0,
            ref_props=ref_props, window_duration="1 minute",
        )
        .writeStream.format("memory")
        .queryName("drift_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
        .trigger(availableNow=True)
        # update, not append: with one availableNow batch the watermark
        # never passes the window end, so append would emit nothing
        .outputMode("update")
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM drift_stream")
    rows_out = out.collect()
    assert {r["bin"] for r in rows_out} == {0, 1, 2, 3, 4}
    assert sum(r["n"] for r in rows_out) == 60
    # PSI of the stream vs its own distribution ~ 0
    tot = sum(r["n"] for r in rows_out)
    psi = out.agg(
        F.sum(
            psi_term_of(F.col("n").cast("double") / F.lit(float(tot)), F.col("ref_prop"))
        ).alias("psi")
    ).collect()[0]["psi"]
    assert abs(psi) < 1e-6


def test_enrich_stream_static_broadcast_join(spark, tmp_path):
    """Stream-static enrichment: each micro-batch left-joins a static
    dimension; the batch form of the same join must match exactly."""
    from dce_spark.streaming import enrich_stream

    srcdir = tmp_path / "enrich_src"
    srcdir.mkdir()
    events = spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "click"), (4, "unknown_kind")],
        schema="id long, kind string",
    )
    events.coalesce(1).write.parquet(str(srcdir / "b0"))
    dim = spark.createDataFrame(
        [("click", 2.0), ("view", 1.0)], schema="kind string, weight double"
    )

    batch = {
        r["id"]: r["weight"]
        for r in enrich_stream(spark.read.parquet(str(srcdir / "b0")), dim, on="kind").collect()
    }
    assert batch == {1: 2.0, 2: 1.0, 3: 2.0, 4: None}

    stream = (
        spark.readStream.schema("id long, kind string").parquet(str(srcdir / "b0"))
    )
    out = enrich_stream(stream, dim, on="kind")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("enriched_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {
        r["id"]: r["weight"] for r in spark.sql("SELECT * FROM enriched_stream").collect()
    }
    assert streamed == batch


def test_enrich_stream_rejects_stream_nulling_join(spark):
    from dce_spark.streaming import enrich_stream

    df = spark.createDataFrame([(1, "a")], schema="id long, kind string")
    with pytest.raises(ValueError):
        enrich_stream(df, df, on="kind", how="right")


def test_streaming_anomaly_flags_batch_equivalence(spark):
    from dce_spark.streaming import streaming_anomaly_flags

    df = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, -9.0), (4, None)], schema="id long, v double"
    )
    got = {
        r["id"]: (r["is_anomaly"], r["zscore"])
        for r in streaming_anomaly_flags(df, "v", ref_mean=0.0, ref_std=2.0).collect()
    }
    assert got[1] == (False, 0.0)
    assert got[2] == (True, 5.0)
    assert got[3] == (True, -4.5)
    assert got[4][0] is False and got[4][1] is None  # null value -> not an anomaly

    with pytest.raises(ValueError):
        streaming_anomaly_flags(df, "v", ref_mean=0.0, ref_std=0.0)


def test_windowed_anomaly_counts_stream(spark, tmp_path):
    from dce_spark.streaming import windowed_anomaly_counts

    srcdir = tmp_path / "anom_src"
    srcdir.mkdir()
    rows = [
        (1, "2024-01-01 00:00:10", 0.5),
        (2, "2024-01-01 00:00:20", 99.0),   # anomaly
        (3, "2024-01-01 00:01:10", -0.2),
        (4, "2024-01-01 00:01:20", -80.0),  # anomaly
        (5, "2024-01-01 00:01:30", 1.1),
    ]
    df = spark.createDataFrame(rows, schema="id long, ts string, v double").select(
        "id", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    df.coalesce(1).write.parquet(str(srcdir / "b0"))
    stream = spark.readStream.schema("id long, ts timestamp, v double").parquet(
        str(srcdir / "b0")
    )
    out = windowed_anomaly_counts(
        stream, "v", ref_mean=0.0, ref_std=2.0, ts_col="ts", window="1 minute"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("anom_counts")
        # update, not append: one availableNow batch never advances the
        # watermark past the window end
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_anom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        str(r["window_start"]): (r["n_rows"], r["n_anomalies"])
        for r in spark.sql("SELECT * FROM anom_counts").collect()
    }
    assert got == {
        "2024-01-01 00:00:00": (2, 1),
        "2024-01-01 00:01:00": (3, 1),
    }


def test_streaming_near_dup_filter_against_index(spark, tmp_path):
    """Streaming admission control vs a persisted LSH index: the
    re-ingested duplicate is dropped, the novel doc survives; state
    lives in the index files, not the stream."""
    from pyspark.sql import Row

    from dce_spark.ext.dedup import save_lsh_index
    from dce_spark.streaming import streaming_near_dup_filter

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely different content about spark engines"),
        ]
    )
    idx = str(tmp_path / "index")
    save_lsh_index(corpus, idx, fast=True, num_files=1)

    srcdir = tmp_path / "stream_src"
    srcdir.mkdir()
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=101, text="novel text with zero corpus overlap whatsoever"),
        ]
    )
    batch.coalesce(1).write.parquet(str(srcdir / "b0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(srcdir / "b0")
    )
    seen = {}
    q = streaming_near_dup_filter(
        spark,
        stream,
        idx,
        on_batch=lambda bid, df: seen.setdefault(bid, [r["doc_id"] for r in df.collect()]),
        checkpointLocation=str(tmp_path / "ckpt_ndf"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    survivors = sorted(x for ids in seen.values() for x in ids)
    assert survivors == [101]
    spark.catalog.clearCache()


def test_lossy_count_fold_guarantees():
    """Manku-Motwani invariants on a skewed synthetic stream, fed in
    uneven micro-batches: (1) no false negatives at any support >=
    epsilon; (2) sketch count underestimates by at most epsilon * n;
    (3) tracked-entry count stays far below key cardinality."""
    from dce_spark.streaming import lossy_count_fold

    eps = 0.02
    # 100x "hot", 40x "warm", 600 singletons -> n = 740
    stream = ["hot"] * 100 + ["warm"] * 40 + [f"cold{i}" for i in range(600)]
    import random

    random.Random(7).shuffle(stream)
    entries, n = {}, 0
    for lo in range(0, len(stream), 97):  # uneven batch size on purpose
        batch = {}
        for k in stream[lo : lo + 97]:
            batch[k] = batch.get(k, 0) + 1
        entries, n = lossy_count_fold(batch, entries, n, eps)
    assert n == 740
    true = {"hot": 100, "warm": 40}
    for key, tc in true.items():
        assert key in entries  # freq >= eps*n: must survive
        c, d = entries[key]
        assert c <= tc <= c + d
        assert tc - c <= eps * n
    # every tracked count is a lower bound and delta <= eps * n
    assert all(d <= eps * n for _, d in entries.values())
    # state is bounded by the sketch, not by the 602-key cardinality
    assert len(entries) < 120

    with pytest.raises(ValueError):
        lossy_count_fold({}, {}, 0, 1.5)


def test_streaming_heavy_hitters(spark, tmp_path):
    """End-to-end stateful sketch over two micro-batches: the final
    per-shard reports contain every key above support with a count
    bracket [count, count+delta] that covers the exact count."""
    from dce_spark.streaming import streaming_heavy_hitters

    srcdir = tmp_path / "hh_src"
    rows1 = [Row(k="hot")] * 60 + [Row(k=f"c{i}") for i in range(150)]
    rows2 = [Row(k="hot")] * 40 + [Row(k="warm")] * 30 + [
        Row(k=f"d{i}") for i in range(120)
    ]
    spark.createDataFrame(rows1).coalesce(1).write.mode("append").parquet(str(srcdir))
    spark.createDataFrame(rows2).coalesce(1).write.mode("append").parquet(str(srcdir))

    src = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir))
    )
    q = (
        streaming_heavy_hitters(src, "k", epsilon=0.05, n_shards=2)
        .writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one report per (batch, key); keep the latest
    # (largest shard_n) per key
    latest = {}
    for r in spark.sql("SELECT * FROM hh_stream").collect():
        if r["k"] not in latest or r["shard_n"] > latest[r["k"]]["shard_n"]:
            latest[r["k"]] = r
    exact = {
        r["k"]: r["cnt"]
        for r in spark.read.parquet(str(srcdir))
        .groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for key, tc in exact.items():
        if tc >= 30:  # far above epsilon of any shard's n (<= 400)
            assert key in latest, key
            c, d = latest[key]["count"], latest[key]["delta"]
            assert c <= tc <= c + d, (key, tc, c, d)
    # sketch state stayed bounded: far fewer tracked keys than the 272
    # distinct keys in the stream
    assert len(latest) < 150


def test_windowed_value_quantiles_stream_matches_batch(spark, tmp_path):
    """Windowed p50/p95/p99 on a stream equals the identical
    computation on the same data in batch (the sketch is deterministic
    for a given dataset + accuracy), and the stream runs in update
    mode with a watermark."""
    from datetime import datetime, timedelta

    from dce_spark.streaming import windowed_value_quantiles

    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        Row(ts=base + timedelta(minutes=m % 12, seconds=i), value=float((i * 7) % 100))
        for i, m in ((i, i // 40) for i in range(480))
    ]
    srcdir = tmp_path / "q_src"
    df = spark.createDataFrame(rows)
    df.coalesce(1).write.parquet(str(srcdir))

    batch = {
        tuple(r["window"]): (r["n"], r["q50"], r["q95"], r["q99"])
        for r in windowed_value_quantiles(
            spark.read.parquet(str(srcdir)), "value"
        ).collect()
    }
    assert len(batch) >= 2 and all(v[0] > 0 for v in batch.values())

    stream = spark.readStream.schema("ts timestamp, value double").parquet(
        str(srcdir)
    )
    q = (
        windowed_value_quantiles(stream, "value")
        .writeStream.format("memory")
        .queryName("wq_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_wq"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        tuple(r["window"]): (r["n"], r["q50"], r["q95"], r["q99"])
        for r in spark.sql("SELECT * FROM wq_stream").collect()
    }
    assert streamed == batch


def test_watermark_drops_match_batch_mirror(spark, tmp_path, sf_dir):
    """The late_data_windows_events catalog query claims to replay
    Structured Streaming's watermark policy exactly. Prove it: feed
    the SAME dirtied arrival stream (every 7th event shifted 96h back,
    micro-batches of 100 by event_id) through a real readStream with
    withWatermark('1 hour') + 1h tumbling count, and assert the final
    per-window counts equal the mirror's n_accepted — i.e. the rows
    the mirror says streaming would drop are exactly the rows
    streaming drops."""
    import os

    from dce_spark.data import load_table
    from dce_spark.queries import QUERIES

    arr = (
        load_table(spark, str(sf_dir), "events")
        .select(
            "event_id",
            F.when(
                F.col("event_id") % 7 == 0,
                F.col("ts") - F.expr("INTERVAL 96 HOURS"),
            )
            .otherwise(F.col("ts"))
            .alias("ets"),
        )
        .withColumn("batch", F.floor(F.col("event_id") / 100).cast("long"))
    )
    srcdir = tmp_path / "late_src"
    n_batches = arr.agg(F.max("batch")).collect()[0][0] + 1
    seen = set()
    for b in range(n_batches):
        arr.filter(F.col("batch") == b).select("ets").coalesce(1).write.mode(
            "append"
        ).parquet(str(srcdir))
        # pin ascending mtimes so the file source replays arrival order
        new = {f for f in os.listdir(srcdir) if f.endswith(".parquet")} - seen
        for f in new:
            os.utime(srcdir / f, (1_700_000_000 + 100 * b,) * 2)
        seen |= new

    stream = (
        spark.readStream.schema("ets timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir))
    )
    q = (
        stream.withWatermark("ets", "1 hour")
        .groupBy(F.window("ets", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_epoch"), "n")
        .writeStream.format("memory")
        .queryName("late_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode re-emits a window each time its count grows; the
    # final count per window is the max (counts are monotone)
    streamed = {
        r["window_epoch"]: r["mx"]
        for r in spark.sql(
            "SELECT window_epoch, max(n) AS mx FROM late_stream GROUP BY 1"
        ).collect()
    }
    mirror = {
        r["window_epoch"]: r["n_accepted"]
        for r in QUERIES["late_data_windows_events"].fn(spark, str(sf_dir))
        .filter(F.col("n_accepted") > 0)
        .collect()
    }
    assert streamed == mirror
    # non-vacuous: the dirtied stream must actually lose rows
    total_arrived = spark.read.parquet(str(srcdir)).count()
    assert sum(streamed.values()) < total_arrived


def test_sliding_watermark_drops_match_batch_mirror(spark, tmp_path, sf_dir):
    """sliding_late_data_windows_events extends the watermark mirror
    to SLIDING windows (2h length, 30min slide), where the drop rule
    is per (row, window) PAIR: a late row loses its oldest windows but
    still lands in the later ones — the multi-window membership case
    a tumbling mirror cannot exercise. Feed the same dirtied arrival
    stream through a real readStream + withWatermark('1 hour') +
    sliding-window count and assert the final per-window counts equal
    the mirror's n_accepted exactly."""
    import os

    from dce_spark.data import load_table
    from dce_spark.queries import QUERIES

    arr = (
        load_table(spark, str(sf_dir), "events")
        .select(
            "event_id",
            F.when(
                F.col("event_id") % 7 == 0,
                F.col("ts") - F.expr("INTERVAL 96 HOURS"),
            )
            .otherwise(F.col("ts"))
            .alias("ets"),
        )
        .withColumn("batch", F.floor(F.col("event_id") / 100).cast("long"))
    )
    srcdir = tmp_path / "slide_src"
    n_batches = arr.agg(F.max("batch")).collect()[0][0] + 1
    seen = set()
    for b in range(n_batches):
        arr.filter(F.col("batch") == b).select("ets").coalesce(1).write.mode(
            "append"
        ).parquet(str(srcdir))
        new = {f for f in os.listdir(srcdir) if f.endswith(".parquet")} - seen
        for f in new:
            os.utime(srcdir / f, (1_700_000_000 + 100 * b,) * 2)
        seen |= new

    stream = (
        spark.readStream.schema("ets timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir))
    )
    q = (
        stream.withWatermark("ets", "1 hour")
        .groupBy(F.window("ets", "2 hours", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_epoch"), "n")
        .writeStream.format("memory")
        .queryName("slide_late_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r["window_epoch"]: r["mx"]
        for r in spark.sql(
            "SELECT window_epoch, max(n) AS mx FROM slide_late_stream GROUP BY 1"
        ).collect()
    }
    mirror = {
        r["window_epoch"]: r["n_accepted"]
        for r in QUERIES["sliding_late_data_windows_events"]
        .fn(spark, str(sf_dir))
        .filter(F.col("n_accepted") > 0)
        .collect()
    }
    assert streamed == mirror
    # non-vacuous: pairs were dropped overall...
    total_pairs = arr.count() * 4
    assert sum(streamed.values()) < total_pairs
    # ...and at least one row was PARTIALLY accepted (kept in some of
    # its 4 windows, dropped from others) — the case that
    # distinguishes per-pair from per-row filtering; replicate the
    # mirror's floor-seconds arithmetic per event to find one
    from pyspark.sql import Window as W

    es = F.unix_timestamp("ets")
    bm = arr.select("batch", es.alias("es"))
    wmw = W.orderBy("batch").rowsBetween(W.unboundedPreceding, -2)
    wm = (
        bm.groupBy("batch")
        .agg(F.max("es").alias("mx"))
        .select("batch", (F.max("mx").over(wmw) - F.lit(3600)).alias("wm_s"))
    )
    per_event = (
        arr.select("event_id", es.alias("es"), "batch")
        .join(F.broadcast(wm), "batch")
        .select(
            "event_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            ((F.floor(F.col("es") / 1800) - F.col("i")) * 1800).alias("ws"),
            "wm_s",
        )
        .groupBy("event_id")
        .agg(
            F.sum(
                (
                    F.col("wm_s").isNull()
                    | (F.col("ws") + F.lit(7200) > F.col("wm_s"))
                ).cast("int")
            ).alias("n_ok")
        )
    )
    partial = per_event.filter(
        (F.col("n_ok") > 0) & (F.col("n_ok") < 4)
    ).count()
    assert partial > 0


def test_lossy_count_batch_matches_driver_fold(spark):
    """lossy_count_batch is the distributed replay of lossy_count_fold:
    per shard, its (count, delta, shard_n) must equal a driver-side
    fold over the same micro-batch sequence — and be invariant to the
    input's physical partitioning."""
    from dce_spark.streaming.heavyhitters import (
        lossy_count_batch,
        lossy_count_fold,
    )

    rows = [
        Row(k=str(17 if i % 3 == 0 else i % 40), ordc=i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["k"]): (r["count"], r["delta"], r["shard_n"])
        for r in lossy_count_batch(
            df, "k", "ordc", epsilon=0.02, n_shards=4, batch_rows=500
        ).collect()
    }

    # driver-side replay: same sharding, same batch boundaries,
    # same fold
    import pandas as pd

    pdf = df.toPandas()
    shard_of = {
        r["k"]: r["s"]
        for r in df.select(
            "k", F.pmod(F.xxhash64(F.col("k").cast("string")), F.lit(4)).alias("s")
        )
        .distinct()
        .collect()
    }
    expected = {}
    for s in range(4):
        sub = pdf[pdf["k"].map(shard_of) == s].sort_values("ordc")
        entries, n = {}, 0
        for _, grp in sub.groupby(sub["ordc"] // 500, sort=True):
            counts = {
                str(k): int(c) for k, c in grp["k"].value_counts().items()
            }
            entries, n = lossy_count_fold(counts, entries, n, 0.02)
        for k, (c, d) in entries.items():
            expected[k] = (c, d, n)
    assert got == expected

    # partitioning invariance: the shuffle onto shards makes the fold
    # independent of how the input happened to be split
    got2 = {
        (r["k"]): (r["count"], r["delta"], r["shard_n"])
        for r in lossy_count_batch(
            df.repartition(13), "k", "ordc", epsilon=0.02, n_shards=4,
            batch_rows=500,
        ).collect()
    }
    assert got2 == got
    # the hot key (17: every 3rd row) must be tracked with valid bounds
    exact_hot = sum(1 for r in rows if r.k == "17")
    c, d, _ = got["17"]
    assert c <= exact_hot <= c + d


def test_windowed_quantile_column_names_round_not_truncate(spark):
    """probs=(0.29,) must name the column q29 — int(p*100) truncated
    to q28 under float representation."""
    from datetime import datetime

    from dce_spark.streaming import windowed_value_quantiles

    df = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, 0, 0, i), value=float(i)) for i in range(10)]
    )
    out = windowed_value_quantiles(df, "value", probs=(0.29, 0.5))
    assert "q29" in out.columns and "q50" in out.columns


def test_lossy_count_fold_property():
    """Hypothesis sweep of the pure fold: for random skewed streams,
    random batch segmentations and random epsilon, the three
    Manku-Motwani invariants hold and the fold is segmentation-
    invariant in its guarantees (n and per-key bounds never depend on
    how the stream was chopped)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dce_spark.streaming import lossy_count_fold

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        st.integers(min_value=1, max_value=97),
        st.sampled_from([0.01, 0.05, 0.1, 0.3]),
    )
    def run(keys, batch_size, eps):
        stream = [f"k{v}" for v in keys]
        entries, n = {}, 0
        for lo in range(0, len(stream), batch_size):
            batch = {}
            for k in stream[lo : lo + batch_size]:
                batch[k] = batch.get(k, 0) + 1
            entries, n = lossy_count_fold(batch, entries, n, eps)
        assert n == len(stream)
        true = {}
        for k in stream:
            true[k] = true.get(k, 0) + 1
        for k, tc in true.items():
            if tc > eps * n:  # must survive
                assert k in entries, (k, tc, eps, n)
            if k in entries:
                c, d = entries[k]
                assert c <= tc <= c + d, (k, tc, c, d)
                assert tc - c <= eps * n
        for _, d in entries.values():
            assert d <= eps * n

    run()


def test_sliding_window_stream_matches_batch(spark, tmp_path, sf_dir):
    """The staged sliding_window_counts_events query is the batch face
    of a streaming window(1h, 15min) aggregation: replay the same
    events through a real readStream in update mode and assert the
    final per-window counts match the batch result exactly (no
    watermark, so nothing is dropped and every window converges to its
    batch count)."""
    from dce_spark.data import load_table
    from dce_spark.queries_staging_r6 import STAGED_R6

    batch = {
        r["window_epoch"]: r["n"]
        for r in STAGED_R6["sliding_window_counts_events"].fn(
            spark, str(sf_dir)
        ).collect()
    }
    assert len(batch) > 100 and sum(batch.values()) == 4 * load_table(
        spark, str(sf_dir), "events"
    ).count()

    srcdir = tmp_path / "slide_src"
    ev = load_table(spark, str(sf_dir), "events").select("ts")
    ev.filter(F.col("ts") < "2024-01-15").coalesce(1).write.mode("append").parquet(
        str(srcdir)
    )
    ev.filter(F.col("ts") >= "2024-01-15").coalesce(1).write.mode("append").parquet(
        str(srcdir)
    )
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir))
    )
    q = (
        stream.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_epoch"), "n")
        .writeStream.format("memory")
        .queryName("slide_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_slide"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["window_epoch"]: r["mx"]
        for r in spark.sql(
            "SELECT window_epoch, max(n) AS mx FROM slide_stream GROUP BY 1"
        ).collect()
    }
    assert streamed == batch


def test_streaming_lww_matches_batch_compaction(spark, tmp_path):
    """The streaming upsert state, drained over two file-source
    micro-batches, must end at exactly the batch last_write_wins
    compaction of the union — per key: same (ts, id, value) winner and
    the same cumulative version count."""
    from conftest import SF_DIR

    from dce_spark.data import load_table
    from dce_spark.ext.warehouse import last_write_wins
    from dce_spark.streaming import streaming_last_write_wins

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    srcdir = tmp_path / "lww_src"
    srcdir.mkdir()
    # two batches split by event id parity: every key sees versions in
    # BOTH micro-batches, so state genuinely carries across
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(srcdir / "b0")
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(srcdir / "b1")
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir / "*"))
    )
    out = streaming_last_write_wins(
        stream, ["user_id", "event_type"], "ts", "event_id", "value"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("lww_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_lww"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM lww_stream").collect()
    # update mode appends one row per (micro-batch, key); the key's
    # final state is its max-n_versions emission
    final = {}
    for r in emitted:
        k = (int(r["user_id"]), r["event_type"])
        if k not in final or int(r["n_versions"]) > int(final[k]["n_versions"]):
            final[k] = r
    got = {
        k: (r["last_ts"], int(r["last_id"]), float(r["last_value"]),
            int(r["n_versions"]))
        for k, r in final.items()
    }
    expect = {
        (int(r["user_id"]), r["event_type"]): (
            r["last_ts"], int(r["last_event_id"]), float(r["last_value"]),
            int(r["n_versions"]),
        )
        for r in last_write_wins(
            ev, ["user_id", "event_type"], ["ts", "event_id"], ["value"]
        ).collect()
    }
    assert got == expect
    # state genuinely crossed batches: some key must have emitted twice
    from collections import Counter

    per_key = Counter(
        (int(r["user_id"]), r["event_type"]) for r in emitted
    )
    assert max(per_key.values()) == 2


def test_fold_lww_pure_function():
    from dce_spark.streaming import fold_lww

    st, changed = fold_lww([(100, 1, 5.0), (200, 2, 7.0)], None)
    assert st == (200, 2, 7.0, 2) and changed
    # older version arrives late: state keeps the winner, counts it
    st2, changed2 = fold_lww([(150, 3, 9.0)], st)
    assert st2 == (200, 2, 7.0, 3) and not changed2
    # same timestamp, higher id: wins the tiebreak
    st3, changed3 = fold_lww([(200, 9, 1.0)], st2)
    assert st3 == (200, 9, 1.0, 4) and changed3
    # exact (ts, id) tie: the HIGHER payload wins — the batch
    # max(struct(ts, id, value)) semantics (round-8 ADVICE fix; the
    # old fold kept the first-seen value)
    st4, changed4 = fold_lww([(200, 9, 3.5)], st3)
    assert st4 == (200, 9, 3.5, 5) and changed4
    st5, changed5 = fold_lww([(200, 9, 2.0)], st4)
    assert st5 == (200, 9, 3.5, 6) and not changed5


def test_streaming_scd2_matches_batch_history(spark, tmp_path):
    """Closed intervals from the streaming SCD2 state, drained over two
    time-split micro-batches, must equal the batch operator's
    non-open rows exactly (version numbers, attrs, both interval
    bounds at microsecond precision, run sizes)."""
    import datetime as dt

    from conftest import SF_DIR

    from dce_spark.data import load_table
    from dce_spark.ext.warehouse import scd2_intervals
    from dce_spark.streaming import streaming_scd2

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    cut = dt.datetime(2024, 1, 16)
    srcdir = tmp_path / "scd2_src"
    srcdir.mkdir()
    # time-split batches: per key, batch-0 rows all precede batch-1
    # rows in (ts, id) order, so the in-order-stream contract holds
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(str(srcdir / "b0"))
    ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(str(srcdir / "b1"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir / "*"))
    )
    out = streaming_scd2(stream, ["user_id"], "event_type", "ts", "event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (int(r["user_id"]), int(r["version_no"])): (
            r["event_type"], r["valid_from"], r["valid_to"], int(r["n_rows"])
        )
        for r in spark.sql("SELECT * FROM scd2_stream").collect()
    }
    expect = {
        (int(r["user_id"]), int(r["version_no"])): (
            r["event_type"], r["valid_from"], r["valid_to"], int(r["n_rows"])
        )
        for r in scd2_intervals(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
        if r["valid_to"] is not None  # open rows live in stream state
    }
    assert got == expect
    assert len(got) > 100  # non-vacuous: real history volume crossed


def test_fold_scd2_pure_function():
    from dce_spark.streaming import fold_scd2

    closed, st, dropped = fold_scd2(
        [(100, 1, "x"), (200, 2, "x"), (300, 3, "y"), (400, 4, "x")], None
    )
    assert closed == [(1, "x", 100, 300, 2), (2, "y", 300, 400, 1)]
    assert st == ("x", 400, 1, 3, 400, 4) and dropped == 0
    # late row behind the fold point: dropped, history unchanged
    closed2, st2, dropped2 = fold_scd2([(250, 9, "z")], st)
    assert closed2 == [] and st2 == st and dropped2 == 1
    # continuation of the open run across a fold call
    closed3, st3, _ = fold_scd2([(500, 5, "x"), (600, 6, "y")], st2)
    assert closed3 == [(3, "x", 400, 600, 2)]
    assert st3 == ("y", 600, 1, 4, 600, 6)


def test_streaming_pit_features_match_batch_backfill(spark, tmp_path):
    """Online features over a time-split two-batch stream must equal
    the offline backfill (ext/warehouse.pit_window_features) on the
    union — the zero-train/serve-skew property, row for row."""
    import datetime as dt

    from conftest import SF_DIR

    from dce_spark.data import load_table
    from dce_spark.ext.warehouse import pit_window_features
    from dce_spark.streaming import streaming_pit_features

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    cut = dt.datetime(2024, 1, 16)
    srcdir = tmp_path / "pit_src"
    srcdir.mkdir()
    ev.filter(F.col("ts") < cut).coalesce(1).write.parquet(str(srcdir / "b0"))
    ev.filter(F.col("ts") >= cut).coalesce(1).write.parquet(str(srcdir / "b1"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir / "*"))
    )
    out = streaming_pit_features(
        stream, ["user_id"], "ts", "event_id", "value", horizon_s=604800
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pit_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pit"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        int(r["event_id"]): (
            int(r["pit_n_prior"]),
            round(float(r["pit_sum_value"]), 6),
            None if r["pit_last_gap_s"] is None else int(r["pit_last_gap_s"]),
        )
        for r in spark.sql("SELECT * FROM pit_stream").collect()
    }
    batch = pit_window_features(
        ev.withColumn("es", F.unix_timestamp("ts")),
        "user_id", "es", "value", horizon_s=604800,
    )
    expect = {
        int(r["event_id"]): (
            int(r["pit_n_prior"]),
            round(float(r["pit_sum_value"]), 6),
            None if r["pit_last_gap_s"] is None else int(r["pit_last_gap_s"]),
        )
        for r in batch.collect()
    }
    assert len(got) == ev.count()  # in-order stream: nothing dropped
    assert got == expect


def test_fold_pit_pure_function():
    from dce_spark.streaming import fold_pit

    feats, st, dropped = fold_pit(
        [(100, 1, 1_000_000), (200, 2, 2_000_000),
         (300, 3, 4_000_000), (300, 4, 8_000_000)],
        None, horizon_s=150,
    )
    # windows: [.,99]=∅; [50,199]={100}; [150,299]={200};
    # same-second 300s never see each other
    assert feats == [
        (1, 0, 0.0, None),
        (2, 1, 1_000_000.0, 100),
        (3, 1, 2_000_000.0, 100),
        (4, 1, 2_000_000.0, 100),
    ]
    assert dropped == 0
    # cross-call: the ring carried both same-second rows
    feats2, st2, _ = fold_pit([(301, 9, 0)], st, horizon_s=150)
    assert feats2 == [(9, 3, 14_000_000.0, 1)]
    # late row behind the fold point: dropped
    feats3, st3, dropped3 = fold_pit([(250, 1, 0)], st2, horizon_s=150)
    assert feats3 == [] and dropped3 == 1 and st3 == st2


def test_streaming_lww_with_ttl_runs_and_compacts(spark, tmp_path):
    """The ttl_seconds path (ProcessingTimeTimeout) must run end to
    end and still produce the correct compaction when no key actually
    idles past the TTL during the drain."""
    from conftest import SF_DIR

    from dce_spark.data import load_table
    from dce_spark.ext.warehouse import last_write_wins
    from dce_spark.streaming import streaming_last_write_wins

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    srcdir = tmp_path / "lww_ttl_src"
    srcdir.mkdir()
    ev.coalesce(1).write.parquet(str(srcdir / "b0"))
    stream = spark.readStream.schema(ev.schema).parquet(str(srcdir / "*"))
    out = streaming_last_write_wins(
        stream, ["user_id", "event_type"], ttl_seconds=3600.0
    )
    q = (
        out.writeStream.format("memory")
        .queryName("lww_ttl_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_lww_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (int(r["user_id"]), r["event_type"]): (
            int(r["last_id"]), int(r["n_versions"])
        )
        for r in spark.sql("SELECT * FROM lww_ttl_stream").collect()
    }
    expect = {
        (int(r["user_id"]), r["event_type"]): (
            int(r["last_event_id"]), int(r["n_versions"])
        )
        for r in last_write_wins(
            ev, ["user_id", "event_type"], ["ts", "event_id"], ["value"]
        ).collect()
    }
    assert got == expect


def test_streaming_pit_features_adversarial_cross_batch_disorder(
    spark, tmp_path
):
    """Round-8 (VERDICT r7 ask #5): late/out-of-order events ACROSS
    micro-batch boundaries, within the horizon. The operator's
    documented disorder contract is scd2-style: per key, rows at or
    behind the fold point (the max (es, id) already folded) are
    DROPPED — so under cross-batch lateness the streaming output must
    equal a driver-side fold_pit replay over the same batch split
    EXACTLY (state ser/de, quantization and pandas plumbing preserve
    fold semantics), and it diverges from the offline backfill ONLY
    on rows whose horizon window lost a dropped late row — the
    watermark-style divergence statement, pinned here row for row."""
    from conftest import SF_DIR

    from dce_spark.data import load_table
    from dce_spark.ext.warehouse import pit_window_features
    from dce_spark.streaming import fold_pit, streaming_pit_features

    HORIZON = 604800
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    # adversarial split: batch-1 holds every third event — per key,
    # many batch-1 rows precede batch-0's fold point (true cross-batch
    # late arrivals, all inside the 7-day horizon)
    srcdir = tmp_path / "pit_adv_src"
    srcdir.mkdir()
    ev.filter(F.col("event_id") % 3 != 0).coalesce(1).write.parquet(
        str(srcdir / "b0")
    )
    ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(
        str(srcdir / "b1")
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir / "*"))
    )
    out = streaming_pit_features(
        stream, ["user_id"], "ts", "event_id", "value", horizon_s=HORIZON
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pit_adv_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pit_adv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        int(r["event_id"]): (
            int(r["pit_n_prior"]),
            round(float(r["pit_sum_value"]), 6),
            None if r["pit_last_gap_s"] is None else int(r["pit_last_gap_s"]),
        )
        for r in spark.sql("SELECT * FROM pit_adv_stream").collect()
    }

    # driver-side replay: same batches, same per-key (es, id) sort,
    # same fold — the streaming plumbing must preserve this exactly
    rows = [
        (
            int(r["user_id"]),
            int(r["event_id"]),
            int(r["es"]),
            int(round(float(r["value"]) * 1e6)),
        )
        for r in ev.withColumn("es", F.unix_timestamp("ts")).collect()
    ]
    batches = [
        sorted(
            ((u, i, es, qv) for u, i, es, qv in rows if i % 3 != 0),
            key=lambda r: (r[2], r[1]),
        ),
        sorted(
            ((u, i, es, qv) for u, i, es, qv in rows if i % 3 == 0),
            key=lambda r: (r[2], r[1]),
        ),
    ]
    state: dict[int, tuple] = {}
    expect: dict[int, tuple] = {}
    dropped_rows: list[tuple[int, int]] = []  # (user, es) of dropped
    for batch in batches:
        by_key: dict[int, list] = {}
        for u, i, es, qv in batch:
            by_key.setdefault(u, []).append((es, i, qv))
        for u, recs in by_key.items():
            feats, st, _ = fold_pit(recs, state.get(u), HORIZON)
            state[u] = st
            emitted_ids = set()
            for i, n, qsum, gap in feats:
                expect[int(i)] = (int(n), round(qsum / 1e6, 6), gap)
                emitted_ids.add(i)
            for es, i, _ in recs:
                if i not in emitted_ids:
                    dropped_rows.append((u, es))
    assert got == expect  # exact fold-semantics equality
    n_total = len(rows)
    assert len(dropped_rows) > 0  # the split really was adversarial
    assert len(got) == n_total - len(dropped_rows)

    # divergence from the offline backfill is EXACTLY scoped to rows
    # whose horizon window lost a dropped same-key late row
    batch_feats = {
        int(r["event_id"]): (
            int(r["pit_n_prior"]),
            round(float(r["pit_sum_value"]), 6),
            None if r["pit_last_gap_s"] is None else int(r["pit_last_gap_s"]),
        )
        for r in pit_window_features(
            ev.withColumn("es", F.unix_timestamp("ts")),
            "user_id", "es", "value", horizon_s=HORIZON,
        ).collect()
    }
    dropped_by_key: dict[int, list[int]] = {}
    for u, es in dropped_rows:
        dropped_by_key.setdefault(u, []).append(es)
    es_of = {i: (u, es) for u, i, es, _ in rows}
    diverging = {i for i in got if got[i] != batch_feats[i]}
    allowed = set()
    for i in got:
        u, es = es_of[i]
        if any(
            es - HORIZON <= d <= es - 1 for d in dropped_by_key.get(u, [])
        ):
            allowed.add(i)
    assert diverging <= allowed, sorted(diverging - allowed)[:5]


def test_streaming_scd2_adversarial_cross_batch_disorder(spark, tmp_path):
    """Round-9 (VERDICT r8 ask #6): late/out-of-order rows ACROSS
    micro-batch boundaries for the SCD2 face. fold_scd2's documented
    disorder contract — rows at or behind the key's folded (es, id)
    point are DROPPED, history is never spliced — must survive the
    streaming plumbing exactly: the stream's closed intervals equal a
    driver-side fold_scd2 replay over the same adversarial batch
    split row for row, and keys the disorder never touched must match
    the offline batch history exactly (the watermark-style divergence
    statement: divergence is scoped to keys that dropped rows)."""
    import datetime as dt

    from conftest import SF_DIR

    from dce_spark.data import load_table
    from dce_spark.ext.warehouse import scd2_intervals
    from dce_spark.streaming import fold_scd2, streaming_scd2

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    # adversarial split: batch-1 holds every third event — per key,
    # most batch-1 rows sit behind batch-0's fold point (true
    # cross-batch late arrivals spanning the whole time range)
    srcdir = tmp_path / "scd2_adv_src"
    srcdir.mkdir()
    ev.filter(F.col("event_id") % 3 != 0).coalesce(1).write.parquet(
        str(srcdir / "b0")
    )
    ev.filter(F.col("event_id") % 3 == 0).coalesce(1).write.parquet(
        str(srcdir / "b1")
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir / "*"))
    )
    out = streaming_scd2(stream, ["user_id"], "event_type", "ts", "event_id")
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_adv_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2_adv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    epoch = dt.datetime(1970, 1, 1)
    us = lambda t: (t - epoch) // dt.timedelta(microseconds=1)  # noqa: E731
    got = {
        (int(r["user_id"]), int(r["version_no"])): (
            r["event_type"], us(r["valid_from"]), us(r["valid_to"]),
            int(r["n_rows"]),
        )
        for r in spark.sql("SELECT * FROM scd2_adv_stream").collect()
    }

    # driver-side replay: same batches, same per-key (es_us, id) sort,
    # same fold — the streaming plumbing must preserve this exactly
    rows = [
        (int(r["user_id"]), us(r["ts"]), int(r["event_id"]),
         str(r["event_type"]))
        for r in ev.collect()
    ]
    batches = [
        [(u, es, i, a) for u, es, i, a in rows if i % 3 != 0],
        [(u, es, i, a) for u, es, i, a in rows if i % 3 == 0],
    ]
    state: dict[int, tuple] = {}
    expect: dict[tuple[int, int], tuple] = {}
    dropped_keys: set[int] = set()
    n_dropped = 0
    for batch in batches:
        by_key: dict[int, list] = {}
        for u, es, i, a in batch:
            by_key.setdefault(u, []).append((es, i, a))
        for u, recs in by_key.items():
            recs.sort(key=lambda r: (r[0], r[1]))
            closed, st, dropped = fold_scd2(recs, state.get(u))
            if st is not None:
                state[u] = st
            for version_no, attr, vf, vt, n in closed:
                expect[(u, version_no)] = (attr, vf, vt, n)
            if dropped:
                dropped_keys.add(u)
                n_dropped += dropped
    assert n_dropped > 0  # the split really was adversarial
    assert got == expect  # exact fold-semantics equality

    # keys the disorder never touched must equal the offline history
    batch_hist = {
        (int(r["user_id"]), int(r["version_no"])): (
            r["event_type"], us(r["valid_from"]), us(r["valid_to"]),
            int(r["n_rows"]),
        )
        for r in scd2_intervals(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
        if r["valid_to"] is not None
    }
    clean = {k for k in got if k[0] not in dropped_keys} | {
        k for k in batch_hist if k[0] not in dropped_keys
    }
    for k in clean:
        assert got.get(k) == batch_hist.get(k), k


def test_streaming_sessionize_adversarial_cross_batch_disorder(
    spark, tmp_path
):
    """Round-9 (VERDICT r8 ask #6): cross-batch late events for the
    sessionization face — the interesting case is an event landing in
    the gap between already-folded session boundaries. fold_sessions'
    round-9 disorder contract (strictly behind the open session's
    fold point -> dropped and counted, never merged into a session it
    predates) must survive the streaming plumbing: closed sessions
    from the stream equal a driver-side fold replay over the same
    adversarial batch split exactly, and users the disorder never
    touched match the single-pass fold (the batch-equivalent) on
    their closed sessions."""
    import datetime as dt

    from conftest import SF_DIR

    from dce_spark.data import load_table
    from dce_spark.streaming import fold_sessions, stateful_sessionize

    GAP = 1800.0
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "ts", "event_id"
    )
    srcdir = tmp_path / "sess_adv_src"
    srcdir.mkdir()
    ev.filter(F.col("event_id") % 3 != 0).select(
        "user_id", "ts"
    ).coalesce(1).write.parquet(str(srcdir / "b0"))
    ev.filter(F.col("event_id") % 3 == 0).select(
        "user_id", "ts"
    ).coalesce(1).write.parquet(str(srcdir / "b1"))

    schema = ev.select("user_id", "ts").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(srcdir / "*"))
    )
    out = stateful_sessionize(stream, gap_seconds=GAP)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_adv_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess_adv"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    epoch = dt.datetime(1970, 1, 1)
    # the operator floors ns -> whole epoch seconds; mirror that
    secs = lambda t: float((t - epoch) // dt.timedelta(seconds=1))  # noqa: E731
    got: dict[int, list] = {}
    for r in spark.sql("SELECT * FROM sess_adv_stream").collect():
        got.setdefault(int(r["user_id"]), []).append(
            (secs(r["session_start"]), secs(r["session_end"]),
             int(r["n_events"]))
        )

    rows = [
        (int(r["user_id"]), secs(r["ts"]), int(r["event_id"]))
        for r in ev.collect()
    ]
    batches = [
        [(u, t) for u, t, i in rows if i % 3 != 0],
        [(u, t) for u, t, i in rows if i % 3 == 0],
    ]
    state: dict[int, tuple] = {}
    expect: dict[int, list] = {}
    dropped_users: set[int] = set()
    n_dropped = 0
    for batch in batches:
        by_user: dict[int, list] = {}
        for u, t in batch:
            by_user.setdefault(u, []).append(t)
        for u, ts in by_user.items():
            closed, st, dropped = fold_sessions(sorted(ts), state.get(u), GAP)
            if st is not None:
                state[u] = st
            if closed:
                expect.setdefault(u, []).extend(closed)
            if dropped:
                dropped_users.add(u)
                n_dropped += dropped
    assert n_dropped > 0  # the split really was adversarial
    for d in (got, expect):
        for u in d:
            d[u].sort()
    assert got == expect  # exact fold-semantics equality

    # users the disorder never touched match the single-pass fold
    by_user_all: dict[int, list] = {}
    for u, t, _ in rows:
        by_user_all.setdefault(u, []).append(t)
    for u, ts in by_user_all.items():
        if u in dropped_users:
            continue
        closed, _, d = fold_sessions(sorted(ts), None, GAP)
        assert d == 0
        assert sorted(closed) == got.get(u, []), u


def test_fold_lww_batch_split_order_invariance():
    """The round-9 verdict's remaining stateful-face disorder item,
    closed by INVARIANCE rather than a contract: LWW's reduction is a
    max over full (ts, id, value) tuples — commutative and associative
    — and n_versions is an additive count, so NO cross-batch split or
    intra-batch order can change the final state. Pinned by replaying
    fixed-seed random multisets through random batch partitions in
    random orders and requiring bit-equality with the one-shot fold.
    (Contrast sessionize/SCD2/PIT, whose folds are order-SENSITIVE and
    carry explicit disorder contracts + adversarial pins.)"""
    import random

    from dce_spark.streaming.upsert import fold_lww

    for seed in (3, 17, 401):
        rng = random.Random(seed)
        n = rng.randint(5, 60)
        # duplicate (ts, id) pairs on purpose: the value tiebreak is
        # part of the ordering and must stay split-invariant too
        records = [
            (
                rng.randint(0, 5) * 1_000_000,
                rng.randint(0, 3),
                float(rng.choice((-1.5, 0.0, 2.25, 7.5))),
            )
            for _ in range(n)
        ]
        one_shot, _ = fold_lww(records, None)
        for _trial in range(5):
            shuffled = records[:]
            rng.shuffle(shuffled)
            state = None
            i = 0
            while i < len(shuffled):
                j = i + rng.randint(1, max(1, len(shuffled) - i))
                state, _ = fold_lww(shuffled[i:j], state)
                i = j
            assert state == one_shot, seed


def test_lossy_count_fold_split_invariant_guarantees():
    """The lossy-counting face needs no disorder contract either, but
    for a WEAKER reason worth pinning precisely: the sketch CONTENTS
    legitimately differ across batch splits/orders (eviction happens
    at bucket boundaries, which depend on arrival order), while the
    Manku-Motwani GUARANTEES are order-independent. Pin both halves:
    (a) n_seen is split-invariant; (b) in EVERY random split/order,
    no false negatives at support >= epsilon and undercount <=
    epsilon * n — so any downstream consumer relying only on the
    guarantee sees order-independent behavior."""
    import random
    from collections import Counter

    from dce_spark.streaming import lossy_count_fold

    eps = 0.05
    base = (
        ["hot"] * 60
        + ["warm"] * 25
        + [f"cold{i}" for i in range(200)]
    )
    true = Counter(base)
    n_total = len(base)
    for seed in (5, 29, 311):
        rng = random.Random(seed)
        stream = base[:]
        rng.shuffle(stream)
        entries: dict[str, tuple[int, int]] = {}
        n_seen = 0
        i = 0
        while i < len(stream):
            j = i + rng.randint(1, 80)
            entries, n_seen = lossy_count_fold(
                Counter(stream[i:j]), entries, n_seen, eps
            )
            i = j
        assert n_seen == n_total, seed  # (a) split-invariant
        for key, cnt in true.items():  # (b) the guarantees
            if cnt >= eps * n_total:
                assert key in entries, (seed, key)
            if key in entries:
                c, d = entries[key]
                assert c <= cnt, (seed, key)
                assert cnt - c <= eps * n_total + 1, (seed, key)
