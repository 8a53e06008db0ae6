"""Structured Streaming extension (no counterpart in the reference).

The reference validates finite tables only (SURVEY §2.9); its SLA block
is declared but never evaluated. This package enforces contracts on
*streams*: per-microbatch validation via foreachBatch running the same
fused check compiler, watermarked windowed quality aggregations for
continuous monitoring, and a custom stateful operator template
(applyInPandasWithState: sessionization, lossy-counting heavy
hitters).
"""

from .drift import psi_term_of, streaming_binned_drift
from .enforce import (
    streaming_exact_dedup,
    streaming_near_dup_filter,
    streaming_quality_aggregates,
    validate_stream,
)
from .enrich import (
    enrich_stream,
    streaming_anomaly_flags,
    windowed_anomaly_counts,
    windowed_value_quantiles,
)
from .heavyhitters import lossy_count_fold, streaming_heavy_hitters
from .sessionize import fold_sessions, next_deadline, stateful_sessionize
from .upsert import (
    fold_lww,
    fold_pit,
    fold_scd2,
    streaming_last_write_wins,
    streaming_pit_features,
    streaming_scd2,
)

__all__ = [
    "validate_stream",
    "streaming_quality_aggregates",
    "streaming_exact_dedup",
    "streaming_near_dup_filter",
    "stateful_sessionize",
    "fold_sessions",
    "next_deadline",
    "enrich_stream",
    "streaming_anomaly_flags",
    "windowed_anomaly_counts",
    "windowed_value_quantiles",
    "lossy_count_fold",
    "streaming_heavy_hitters",
    "fold_lww",
    "streaming_last_write_wins",
    "fold_scd2",
    "streaming_scd2",
    "fold_pit",
    "streaming_pit_features",
]
