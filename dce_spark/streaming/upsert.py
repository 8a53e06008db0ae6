"""Streaming CDC compaction: last-write-wins upsert state via
``applyInPandasWithState`` — the streaming face of
:func:`dce_spark.ext.warehouse.last_write_wins` (SURVEY §2.9
extension; the reference has no streaming surface).

Why stateful-apply and not a windowed aggregate: the "current row"
of a key has no window — it is a running argmax over the key's whole
history, updated on every arriving version. Spark's built-in
streaming aggregates can hold a running ``max(struct(...))`` in
complete/update mode, but cannot emit ONLY the keys that changed in
a micro-batch with a version counter, which is what a downstream
MERGE sink consumes.

Scale design: one shuffle on the key per micro-batch; state per key
is a single (order, payload, n) tuple — O(live keys), independent of
version count. The fold (:func:`fold_lww`) is a pure function,
unit-testable without a streaming query. Keys are assumed to be a
bounded dimension (users, devices, SKUs); for unbounded key churn
add a processing-time TTL the same way stateful_sessionize does —
an evicted key's next version simply re-opens state with n reset,
which a MERGE sink tolerates (the compacted row is still correct,
only the version count restarts).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

__all__ = [
    "fold_lww",
    "streaming_last_write_wins",
    "fold_scd2",
    "streaming_scd2",
    "fold_pit",
    "streaming_pit_features",
]

State = tuple[int, int, float, int]  # (es_us, id, value, n_versions)


def fold_lww(
    records: list[tuple[int, int, float]],
    state: Optional[State],
) -> tuple[State, bool]:
    """Fold (event-time-micros, id, value) versions into last-write-wins
    state. Ordering is full-tuple lexicographic on (es_us, id, value) —
    identical to the batch operator's ``max(struct(ts, id, value))``,
    INCLUDING the payload comparison on (ts, id) ties (round-8 ADVICE
    fix: the old (es_us, id)-only compare kept the first-seen value
    where batch keeps the max value when the order key is non-unique).
    One residual divergence, documented not fixed: on an exact
    (es_us, id) tie where a candidate value is NaN, JVM struct-max
    ranks NaN above every double while Python comparisons with NaN are
    always False — keep (ts, id) unique (the batch docstring's advice)
    or NaN-free payloads for bit-equality. Returns
    ``(new_state, best_changed)``; ``n_versions`` always grows by
    ``len(records)``.
    """
    best = (state[0], state[1], state[2]) if state is not None else None
    n = state[3] if state is not None else 0
    changed = False
    for es_us, rid, val in records:
        cand = (es_us, rid, val)
        if best is None or cand > best:
            best = cand
            changed = True
    n += len(records)
    assert best is not None  # records is non-empty when called
    return (best[0], best[1], best[2], n), changed


def streaming_last_write_wins(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    ttl_seconds: float | None = None,
) -> DataFrame:
    """Streaming upsert compaction: for every key that received rows in
    a micro-batch, emit its CURRENT row — ``last_ts`` / ``last_id`` /
    ``last_value`` under (ts, id) last-write-wins ordering — plus the
    cumulative ``n_versions``. Update-mode output; a downstream MERGE
    sink applies each emission as an upsert.

    Key column types are taken from the input schema, so any
    groupable key works. Event time is compared at microsecond
    precision (exact int64 — no float timestamp hazards).

    ``ttl_seconds`` bounds state for unbounded key churn: a key idle
    for that much processing time is evicted silently; its next
    version re-opens state with the version count restarted (the
    compacted row stays correct — a MERGE sink tolerates the counter
    reset, as the module docstring discusses).
    """
    import pandas as pd  # noqa: F401  (workers need it; checked here)
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.schema.fields
        if f.name in key_cols
    )
    out_schema = (
        f"{key_fields}, last_ts timestamp, last_id bigint, "
        "last_value double, n_versions bigint"
    )
    state_schema = "es_us bigint, rid bigint, val double, n bigint"

    def per_key(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            # idle eviction: drop state silently — the next version of
            # this key re-opens it (version counter restarts)
            state.remove()
            return
        records: list[tuple[int, int, float]] = []
        for pdf in pdf_iter:
            es = pdf[ts_col].astype("int64").floordiv(1_000).tolist()
            ids = pdf[id_col].astype("int64").tolist()
            vals = pdf[value_col].astype("float64").tolist()
            records.extend(zip(es, ids, vals))
        if not records:
            return
        prev = tuple(state.get) if state.exists else None
        new_state, _changed = fold_lww(records, prev)
        state.update(new_state)
        if ttl_seconds is not None:
            state.setTimeoutDuration(int(ttl_seconds * 1000))
        es_us, rid, val, n = new_state
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(key_cols)},
                "last_ts": [pd.Timestamp(es_us * 1_000, unit="ns")],
                "last_id": [rid],
                "last_value": [val],
                "n_versions": [n],
            }
        )

    return (
        stream_df.groupBy(*key_cols)
        .applyInPandasWithState(
            per_key,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if ttl_seconds is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


# ---------------------------------------------------------------------
# SCD2: streaming dimension-history build
# ---------------------------------------------------------------------

# state: (attr, run_start_us, run_n, version_no, last_us, last_id)
Scd2State = tuple[str, int, int, int, int, int]


def fold_scd2(
    records: list[tuple[int, int, str]],
    state: Optional[Scd2State],
) -> tuple[list[tuple[int, str, int, int, int]], Optional[Scd2State], int]:
    """Fold (es_us, id, attr) rows — MUST be pre-sorted by (es_us, id)
    — into SCD2 run state. Returns ``(closed, new_state, n_dropped)``:
    ``closed`` rows are (version_no, attr, valid_from_us, valid_to_us,
    n_rows) — an interval closes when the attr changes, its valid_to
    being the closing row's timestamp (half-open, the batch operator's
    convention). Rows at or before the last processed (es_us, id) are
    DROPPED and counted — the streaming operator cannot splice history
    once later rows were folded (same contract as a watermark: bound
    your disorder upstream or widen the batch sort).
    """
    closed: list[tuple[int, str, int, int, int]] = []
    dropped = 0
    cur = state
    for es_us, rid, attr in records:
        if cur is not None and (es_us, rid) <= (cur[4], cur[5]):
            dropped += 1
            continue
        if cur is None:
            cur = (attr, es_us, 1, 1, es_us, rid)
        elif attr == cur[0]:
            cur = (cur[0], cur[1], cur[2] + 1, cur[3], es_us, rid)
        else:
            closed.append((cur[3], cur[0], cur[1], es_us, cur[2]))
            cur = (attr, es_us, 1, cur[3] + 1, es_us, rid)
    return closed, cur, dropped


def streaming_scd2(
    stream_df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming SCD type-2 history: emits CLOSED validity intervals
    (key, version_no, attr, valid_from, valid_to, n_rows) as an
    append stream — an interval closes the moment a row with a
    DIFFERENT attr value arrives for the key; the open (current)
    interval lives in state until then. The streaming face of
    :func:`dce_spark.ext.warehouse.scd2_intervals`: over an in-order
    (per key, by (ts, id)) stream the closed intervals are exactly the
    batch operator's non-open rows, which
    test_streaming_scd2_matches_batch_history pins.

    Out-of-order rows BEHIND the key's fold point are dropped (folded
    history cannot be spliced); keep disorder inside a micro-batch —
    each batch is sorted per key before folding — or bound it upstream
    with a watermark. State per key is one (attr, run) tuple.
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.schema.fields
        if f.name in key_cols
    )
    out_schema = (
        f"{key_fields}, version_no bigint, {attr_col} string, "
        "valid_from timestamp, valid_to timestamp, n_rows bigint"
    )
    state_schema = (
        "attr string, start_us bigint, n bigint, version bigint, "
        "last_us bigint, last_id bigint"
    )

    def per_key(key, pdf_iter, state):
        import pandas as pd

        recs: list[tuple[int, int, str]] = []
        for pdf in pdf_iter:
            es = pdf[ts_col].astype("int64").floordiv(1_000).tolist()
            ids = pdf[id_col].astype("int64").tolist()
            attrs = pdf[attr_col].astype(str).tolist()
            recs.extend(zip(es, ids, attrs))
        if not recs:
            return
        recs.sort(key=lambda r: (r[0], r[1]))
        prev = tuple(state.get) if state.exists else None
        closed, cur, _dropped = fold_scd2(recs, prev)
        if cur is not None:
            state.update(cur)
        if closed:
            yield pd.DataFrame(
                {
                    **{k: [key[i]] * len(closed)
                       for i, k in enumerate(key_cols)},
                    "version_no": [c[0] for c in closed],
                    attr_col: [c[1] for c in closed],
                    "valid_from": [
                        pd.Timestamp(c[2] * 1_000, unit="ns") for c in closed
                    ],
                    "valid_to": [
                        pd.Timestamp(c[3] * 1_000, unit="ns") for c in closed
                    ],
                    "n_rows": [c[4] for c in closed],
                }
            )

    return (
        stream_df.groupBy(*key_cols)
        .applyInPandasWithState(
            per_key,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------
# Point-in-time features, online (the feature-store serving path)
# ---------------------------------------------------------------------

# state: (es list asc (seconds), qv list (quantized values),
#         last_es, last_id) — the retained horizon tail
PitState = tuple[list[int], list[int], int, int]


def fold_pit(
    records: list[tuple[int, int, int]],
    state: Optional[PitState],
    horizon_s: int,
) -> tuple[list[tuple[int, int, float, Optional[int]]], PitState, int]:
    """Fold (es_seconds, id, qvalue) rows — pre-sorted by (es, id) —
    through a sliding-horizon ring, emitting for EACH row the features
    the batch operator computes: priors strictly earlier BY SECOND
    within ``[es - horizon_s, es - 1]``. Returns ``(feats, new_state,
    n_dropped)`` where feats rows are (id, n_prior, sum_value_quantum,
    last_gap_s). Rows behind the fold point (<= last (es, id)) are
    dropped and counted — the scd2 disorder contract.

    The per-row prior scan is a bisect + prefix sum over the retained
    ring (O(ring) worst case per row): the ring is horizon-bounded, so
    per-key work is O(batch x events-in-horizon) — the honest cost of
    exact online features; coarser aggregates (hourly buckets) shrink
    the ring when the horizon is long.
    """
    import bisect

    es_ring, qv_ring, last_es, last_id = (
        (list(state[0]), list(state[1]), state[2], state[3])
        if state is not None
        else ([], [], -1, -1)
    )
    feats: list[tuple[int, int, float, Optional[int]]] = []
    dropped = 0
    for es, rid, qv in records:
        if (es, rid) <= (last_es, last_id):
            dropped += 1
            continue
        lo = bisect.bisect_left(es_ring, es - horizon_s)
        if lo:
            del es_ring[:lo], qv_ring[:lo]
        hi = bisect.bisect_right(es_ring, es - 1)
        qsum = sum(qv_ring[:hi])
        feats.append(
            (
                rid,
                hi,
                float(qsum),
                (es - es_ring[hi - 1]) if hi else None,
            )
        )
        # insert keeping es order (same-second rows append after)
        es_ring.append(es)
        qv_ring.append(qv)
        last_es, last_id = es, rid
    return feats, (es_ring, qv_ring, last_es, last_id), dropped


def streaming_pit_features(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    horizon_s: int = 604800,
    quantum: float = 1e6,
) -> DataFrame:
    """ONLINE point-in-time features: for every arriving row, the
    key's prior-history features over ``[t - horizon_s, t - 1]``
    seconds — ``pit_n_prior``, ``pit_sum_value`` (quantized-exact),
    ``pit_last_gap_s`` — exactly what
    :func:`dce_spark.ext.warehouse.pit_window_features` backfills
    offline, computed at serving time from a horizon-bounded state
    ring (train/serve skew zero BY CONSTRUCTION, which is the entire
    feature-store problem). Append mode; rows behind a key's fold
    point are dropped (the scd2 disorder contract).
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupStateTimeout

    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in stream_df.schema.fields
        if f.name in key_cols
    )
    out_schema = (
        f"{key_fields}, {id_col} bigint, pit_n_prior bigint, "
        "pit_sum_value double, pit_last_gap_s bigint"
    )
    state_schema = (
        "es array<bigint>, qv array<bigint>, last_es bigint, last_id bigint"
    )

    def per_key(key, pdf_iter, state):
        import pandas as pd

        recs: list[tuple[int, int, int]] = []
        for pdf in pdf_iter:
            es = (
                pdf[ts_col].astype("int64").floordiv(1_000_000_000).tolist()
            )
            ids = pdf[id_col].astype("int64").tolist()
            qvs = [
                int(v)
                for v in pdf[value_col]
                .astype("float64")
                .mul(quantum)
                .round()
                .tolist()
            ]
            recs.extend(zip(es, ids, qvs))
        if not recs:
            return
        recs.sort(key=lambda r: (r[0], r[1]))
        prev = tuple(state.get) if state.exists else None
        feats, new_state, _dropped = fold_pit(recs, prev, horizon_s)
        state.update(
            (
                [int(x) for x in new_state[0]],
                [int(x) for x in new_state[1]],
                int(new_state[2]),
                int(new_state[3]),
            )
        )
        if feats:
            yield pd.DataFrame(
                {
                    **{k: [key[i]] * len(feats)
                       for i, k in enumerate(key_cols)},
                    id_col: [f[0] for f in feats],
                    "pit_n_prior": [f[1] for f in feats],
                    "pit_sum_value": [f[2] / quantum for f in feats],
                    "pit_last_gap_s": pd.array(
                        [f[3] for f in feats], dtype="Int64"
                    ),
                }
            )

    return (
        stream_df.groupBy(*key_cols)
        .applyInPandasWithState(
            per_key,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
