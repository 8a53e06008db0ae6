"""Time-series operators: as-of join (no counterpart in the reference).

``asof_join`` matches each left row with the most recent right row
(strictly earlier in the (ts, tiebreak) order) sharing the key. It is
implemented as UNION + per-key window — one shuffle on the key, state
bounded by the window frame — instead of an inequality/range join,
which Spark would execute as a broadcast-nested-loop (O(|L|x|R|) per
key at 100 TB, a non-starter). This union-window shape is the standard
scalable as-of: sort each key's merged timeline once, carry the last
right-side value forward.

Skew note: a hot key serializes into one task's sort; salt by
time-bucket (key, floor(ts/day)) and carry the previous bucket's tail
if a single entity's history exceeds a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    tiebreak: str,
    value_alias: str = "asof_value",
    tolerance: str | None = None,
) -> DataFrame:
    """For every left row, attach ``right_value`` from the latest right
    row with the same ``on`` key strictly earlier in
    ``(ts, tiebreak)`` order. Returns all left columns + ``value_alias``.

    Both inputs need a shared orderable ``tiebreak`` column (any unique
    id) so results are deterministic under timestamp ties.

    ``tolerance`` (an interval string like ``"2 HOURS"``) bounds how
    stale the match may be: when the latest prior right row is older
    than ``left_ts - tolerance`` the value is NULL — the standard
    market-data/telemetry as-of semantics ("most recent quote, but
    only if fresh"). Still the same union + one window shuffle; the
    staleness check is a map-side comparison against the matched
    row's OWN timestamp, which rides along in the window state as a
    struct — NOT a range join (nested-loop at scale).
    """
    rv_type = dict(right.dtypes)[right_value]
    rts_type = dict(right.dtypes)[right_ts]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        F.lit(None)
        .cast(f"struct<v:{rv_type},t:{rts_type}>")
        .alias("__rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        F.struct(
            F.col(right_value).alias("v"), F.col(right_ts).alias("t")
        ).alias("__rv"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__l"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "__asof", F.last("__rv", ignorenulls=True).over(w)
    )
    val = F.col("__asof")["v"]
    if tolerance is not None:
        fresh = F.col("__asof")["t"] >= F.col("__ts") - F.expr(
            f"INTERVAL {tolerance}"
        )
        val = F.when(fresh, val)
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    return merged.filter(F.col("__l").isNotNull()).select(
        *out_cols, val.alias(value_alias)
    )
