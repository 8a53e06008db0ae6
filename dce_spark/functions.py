"""Reusable column expressions + driver-side parsers.

Ports the reference's duration parser (custom.rs:481-521) and
multi-format timestamp parser (custom.rs:523-560) — the latter as a
*column expression* so parsing happens JVM-side, never per-row in Python.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

__all__ = ["parse_duration_seconds", "to_timestamp_multi", "timestamp_epoch_col"]

_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(s|m|h|d|w)\s*$", re.IGNORECASE)
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def parse_duration_seconds(s: str) -> float:
    """Parse ``"30s" | "5m" | "1h" | "2d" | "1w"`` into seconds.

    Same unit set as the reference's freshness duration parser
    (custom.rs:481-521).
    """
    m = _DURATION_RE.match(s)
    if not m:
        raise ValueError(
            f"invalid duration {s!r}: expected <number><s|m|h|d|w>, e.g. '1h'"
        )
    return float(m.group(1)) * _UNIT_SECONDS[m.group(2).lower()]


def to_timestamp_multi(col: Column, dtype: T.DataType) -> Column:
    """Best-effort timestamp column: native timestamps pass through;
    strings try RFC3339/ISO, ``YYYY-MM-DD [HH:MM:SS]``, then integer
    epoch seconds/milliseconds (>1e10 => millis heuristic) — mirroring
    the reference's multi-format parser (custom.rs:523-560) as a single
    JVM-side expression. Unparseable values become NULL (the reference
    errors per-row; we surface them via null counts instead).
    """
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return col.cast("timestamp")
    s = col.cast("string")
    epoch = s.try_cast("long")
    return F.coalesce(
        F.try_to_timestamp(s),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
        F.try_to_timestamp(s, F.lit("yyyy-MM-dd")),
        F.when(epoch > F.lit(10_000_000_000), F.timestamp_millis(epoch)).otherwise(
            F.timestamp_seconds(epoch)
        ),
    )


def timestamp_epoch_col(col: Column) -> Column:
    """Timestamp -> epoch seconds (long) for engine-agnostic comparisons."""
    return F.unix_timestamp(col)


def utcnow() -> datetime:
    return datetime.now(timezone.utc)
