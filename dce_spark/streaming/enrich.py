"""Stream-static enrichment and reference-anchored anomaly flagging.

Two more streaming faces of batch operators (the reference engine is
batch-only — reference has no streaming counterpart; SURVEY §2.9
extensions):

- :func:`enrich_stream` — the stream-static join: every micro-batch
  joins against a static dimension snapshot. With ``broadcast=True``
  (default) the dimension ships to executors and the STREAM side never
  shuffles — the only join shape that keeps up when the stream is the
  big side. Spark re-plans the static side each micro-batch, so a
  dimension backed by a table picks up slowly-changing updates
  batch-to-batch for free.
- :func:`streaming_anomaly_flags` — per-event z-score flags against
  REFERENCE statistics computed offline on a trusted window. Anchoring
  to the stream's own running stats would let gradual drift redefine
  "normal" (the same reasoning as streaming/drift.py's
  reference-anchored PSI bins); anchoring to constants keeps the
  operator stateless and map-side — pure column expressions, valid on
  batch and stream alike.
- :func:`windowed_anomaly_counts` — the windowed rollup of the flags:
  (window, n, n_anomalies) with a watermark, the alerting feed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "enrich_stream",
    "streaming_anomaly_flags",
    "windowed_anomaly_counts",
    "windowed_value_quantiles",
]


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Join each micro-batch against a static dimension snapshot.

    ``how`` must be a stream-side-preserving type (``left``/``inner``);
    the stream cannot be the null-producing side of an outer join
    without a watermark. Broadcast by default: the dimension is
    executor-resident, the stream never shuffles.
    """
    if how not in ("left", "inner", "left_semi", "left_anti"):
        raise ValueError(
            f"stream-static join must preserve the stream side; got {how!r}"
        )
    dim = F.broadcast(dim_df) if broadcast else dim_df
    return stream_df.join(dim, on=on, how=how)


def streaming_anomaly_flags(
    df: DataFrame,
    value_col: str,
    ref_mean: float,
    ref_std: float,
    z_threshold: float = 4.0,
) -> DataFrame:
    """Flag events whose ``value_col`` deviates more than
    ``z_threshold`` reference standard deviations from the reference
    mean. Stateless map-side expressions — identical semantics on a
    batch frame and a stream (the batch/stream equivalence the rest of
    dce_spark.streaming maintains)."""
    if not ref_std > 0:
        raise ValueError(f"ref_std must be positive, got {ref_std}")
    zscore = (F.col(value_col) - F.lit(float(ref_mean))) / F.lit(float(ref_std))
    return df.withColumn("zscore", zscore).withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("zscore")) >= F.lit(float(z_threshold)), F.lit(False)),
    )


def windowed_anomaly_counts(
    stream_df: DataFrame,
    value_col: str,
    ref_mean: float,
    ref_std: float,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark_delay: str = "10 minutes",
    z_threshold: float = 4.0,
) -> DataFrame:
    """(window_start, window_end, n_rows, n_anomalies) per event-time
    window — the alerting rollup. Watermarked so state is bounded and
    late events beyond the delay are dropped, not double-counted."""
    flagged = streaming_anomaly_flags(
        stream_df, value_col, ref_mean, ref_std, z_threshold
    )
    return (
        flagged.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("is_anomaly").cast("long")).alias("n_anomalies"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_rows",
            "n_anomalies",
        )
    )


def windowed_value_quantiles(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    probs: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Watermarked windowed value quantiles — the latency/size/score
    monitoring feed (p50/p95/p99 per window): (window, n, q50, q95,
    q99, ...).

    Uses ``approx_percentile`` (Greenwald-Khanna sketch) because exact
    percentiles buffer every value per window — unbounded state on a
    stream; the sketch is mergeable across partitions and bounded by
    ``accuracy``, the same exact-vs-sketch trade documented for
    quantiles_lineitem vs its _approx twin. Works identically on a
    batch frame (no watermark applied), which is how the equivalence
    test pins batch == stream.
    """
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.percentile_approx(
            F.col(value_col), F.lit(float(p)), F.lit(accuracy)
        ).alias(f"q{int(round(p * 100))}")
        for p in probs
    ]
    src = stream_df
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return src.groupBy(F.window(F.col(ts_col), window).alias("window")).agg(*aggs)
