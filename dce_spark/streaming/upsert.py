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

__all__ = ["fold_lww", "streaming_last_write_wins"]

State = tuple[int, int, float, int]  # (es_us, id, value, n_versions)


def fold_lww(
    records: list[tuple[int, int, float]],
    state: Optional[State],
) -> tuple[State, bool]:
    """Fold (event-time-micros, id, value) versions into last-write-wins
    state. Ordering is lexicographic on (es_us, id) — identical to the
    batch operator's ``max(struct(ts, id, value))``. Returns
    ``(new_state, best_changed)``; ``n_versions`` always grows by
    ``len(records)``.
    """
    best = (state[0], state[1], state[2]) if state is not None else None
    n = state[3] if state is not None else 0
    changed = False
    for es_us, rid, val in records:
        cand = (es_us, rid, val)
        if best is None or (cand[0], cand[1]) > (best[0], best[1]):
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
) -> DataFrame:
    """Streaming upsert compaction: for every key that received rows in
    a micro-batch, emit its CURRENT row — ``last_ts`` / ``last_id`` /
    ``last_value`` under (ts, id) last-write-wins ordering — plus the
    cumulative ``n_versions``. Update-mode output; a downstream MERGE
    sink applies each emission as an upsert.

    Key column types are taken from the input schema, so any
    groupable key works. Event time is compared at microsecond
    precision (exact int64 — no float timestamp hazards).
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
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
