"""Custom stateful streaming operator: inactivity-gap sessionization
via ``applyInPandasWithState`` (SURVEY §2.9 extension — the reference
has no streaming operators at all; this is the idiomatic Spark shape
for operators the built-in windowed aggregations cannot express).

Why stateful-apply and not a window: a session has a *data-dependent*
extent (it ends ``gap`` after the last event, whenever that is), so no
fixed/sliding window matches it. Spark's session_window() covers the
common case; this operator is the general template — arbitrary
per-key state, batch-at-a-time Arrow transfer, explicit timeouts —
for session logic with custom close conditions (count caps, value
triggers, multi-stage states).

Scale design: state lives in the state store keyed by user — one
shuffle on the key per micro-batch, state size O(active users), idle
users evicted by the processing-time timeout. The per-group fold is
pure Python over Arrow-batched pandas (no row-at-a-time UDF), and the
fold itself (:func:`fold_sessions`) is a pure function, unit-testable
without a streaming query.
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame

__all__ = ["fold_sessions", "next_deadline", "stateful_sessionize"]


def next_deadline(
    prev: Optional[tuple[float, float, int]],
    open_session: tuple[float, float, int],
    armed: Optional[float],
    now: float,
    gap_seconds: float,
) -> float:
    """The idle-flush deadline decision, extracted pure so the
    processing-time logic is unit-testable without a streaming query.

    Re-arm the FULL gap only when the open session's END advanced
    (new activity). When the end did not move — a batch of
    dropped-late events (self-review round 9) or of in-span
    late/duplicate merges that grow ``n`` but not the boundaries
    (round-9 ADVICE) — keep the previously armed deadline: Spark
    clears a key's timeout on every data invocation, and re-arming
    the full gap on no-activity batches would let a steady trickle of
    late events postpone the idle flush indefinitely."""
    if prev is not None and armed is not None and open_session[1] <= prev[1]:
        return armed
    return now + gap_seconds


def fold_sessions(
    sorted_ts: Iterable[float],
    state: Optional[tuple[float, float, int]],
    gap_seconds: float,
) -> tuple[
    list[tuple[float, float, int]],
    Optional[tuple[float, float, int]],
    int,
]:
    """Fold sorted event times (epoch seconds) into sessions.

    ``state`` is the open session (start, last, n) or None. Returns
    ``(closed sessions, new open state, n_dropped)``. An event more
    than ``gap_seconds`` after the previous one closes the open
    session and starts a new one — identical semantics to the batch
    ``sessionization_events`` query's lag-window formulation.

    Disorder contract (round 9, the fold_scd2/fold_pit convention,
    tightened after self-review): an event STRICTLY BEHIND the open
    session's START (t < start) is DROPPED and counted — whether it
    was a separate earlier session or bridged to one already emitted
    is unknowable once the history left the state, so merging it
    would silently corrupt boundaries (before round 9 such a row
    merged into a session it predated, inflating its count). An event
    INSIDE the open span (start <= t <= last) merges losslessly —
    boundaries are unchanged and only the count grows, exactly what a
    batch global sort would produce — as does any in-order event.
    Within a micro-batch the input is sorted, so drops can only come
    from cross-batch lateness; bound it upstream with a watermark, or
    widen batches.
    """
    closed: list[tuple[float, float, int]] = []
    dropped = 0
    start_last_n = state
    for t in sorted_ts:
        if start_last_n is None:
            start_last_n = (t, t, 1)
            continue
        start, last, n = start_last_n
        if t < start:
            dropped += 1
        elif t - last > gap_seconds:  # only reachable when t > last
            closed.append((start, last, n))
            start_last_n = (t, t, 1)
        else:
            start_last_n = (start, max(last, t), n + 1)
    return closed, start_last_n, dropped


def stateful_sessionize(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Streaming sessionization: emits CLOSED sessions
    (user, session_start, session_end, n_events) as an append stream.

    A session closes when a later event of the same user arrives more
    than ``gap_seconds`` after the previous one, or when the user goes
    idle for ``gap_seconds`` of processing time (timeout flush). State
    per user is one (start, last, n) triple plus the armed idle-flush
    deadline (processing-time epoch seconds): Spark clears a group's
    timeout on EVERY invocation that sees data for the key, so the
    full gap re-arms ONLY when the open session's END advanced — a
    batch of dropped-late events (self-review round 9) or of in-span
    late/duplicate merges (round-9 ADVICE: those change n but not the
    end) re-arms with the REMAINING time to the original deadline;
    re-arming the full gap on either would let a steady trickle of
    late events postpone the idle flush indefinitely even though the
    session never saw new activity.

    CHECKPOINT COMPATIBILITY: the state schema gained a fourth field
    (the armed ``deadline``) in round 9 — a restart from a
    checkpointLocation written by the earlier 3-field version will
    fail state deserialization; use a FRESH checkpointLocation when
    upgrading across that boundary.

    Cross-batch late events strictly behind the open session's start
    are dropped (the :func:`fold_sessions` disorder contract — same
    watermark-style statement as streaming_scd2/_pit_features;
    test_streaming_sessionize_adversarial_cross_batch_disorder pins
    the streaming output against a driver-side fold replay). The
    fold's drop COUNT is not surfaced by this face (matching the
    upsert/PIT faces): monitor disorder upstream via watermark
    metrics, or call fold_sessions directly.
    """
    import pandas as pd  # noqa: F401  (workers need it; import checked here)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{user_col} bigint, session_start timestamp, "
        "session_end timestamp, n_events bigint"
    )
    state_schema = "start double, last double, n bigint, deadline double"

    def _emit(user, sessions):
        import pandas as pd

        return pd.DataFrame(
            {
                user_col: [user] * len(sessions),
                "session_start": [
                    pd.Timestamp(s, unit="s") for s, _, _ in sessions
                ],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def per_user(key, pdf_iter, state):
        import time as _time

        user = key[0]
        if state.hasTimedOut:
            # idle flush: close the open session and drop the state
            open_session = tuple(state.get)[:3]
            state.remove()
            yield _emit(user, [open_session])
            return
        ts: list[float] = []
        for pdf in pdf_iter:
            # datetime64[ns] -> epoch seconds, vectorized
            ts.extend(pdf[ts_col].astype("int64").floordiv(1_000_000_000).tolist())
        full = tuple(state.get) if state.exists else None
        prev = full[:3] if full is not None else None
        closed, open_session, _dropped = fold_sessions(
            sorted(ts), prev, gap_seconds
        )
        if open_session is not None:
            now = _time.time()
            deadline = next_deadline(
                prev,
                open_session,
                float(full[3]) if full is not None else None,
                now,
                gap_seconds,
            )
            state.update(
                (
                    float(open_session[0]),
                    float(open_session[1]),
                    int(open_session[2]),
                    float(deadline),
                )
            )
            # Spark cleared the previous timeout when this invocation
            # saw data — re-arm with the REMAINING time
            state.setTimeoutDuration(max(int((deadline - now) * 1000), 1))
        if closed:
            yield _emit(user, closed)

    return (
        stream_df.groupBy(user_col)
        .applyInPandasWithState(
            per_user,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
