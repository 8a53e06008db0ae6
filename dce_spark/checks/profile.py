"""Column profiling: ports profile_batch (contracts-python/src/lib.rs:419-491).

The reference iterates rows in Python-visible Rust; here the whole
profile is ONE fused ``df.agg`` (row count + per-column null count,
distinct count, min/max/mean for numerics) — a single scan regardless
of column count. ``approx`` swaps exact COUNT(DISTINCT) (expand +
shuffle per column) for HLL sketches, the right default at 100 TB.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["profile_df"]

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profile_df(df: DataFrame, approx: bool = False, columns: list[str] | None = None) -> dict[str, Any]:
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    exprs = [F.count(F.lit(1)).alias("__rows")]
    for f in fields:
        c = F.col(f.name)
        exprs.append(F.sum(c.isNull().cast("long")).alias(f"__nulls__{f.name}"))
        distinct = F.approx_count_distinct(c) if approx else F.count_distinct(c)
        exprs.append(distinct.alias(f"__distinct__{f.name}"))
        if isinstance(f.dataType, _NUMERIC):
            exprs.append(F.min(c.cast("double")).alias(f"__min__{f.name}"))
            exprs.append(F.max(c.cast("double")).alias(f"__max__{f.name}"))
            exprs.append(F.avg(c.cast("double")).alias(f"__mean__{f.name}"))
    row = df.agg(*exprs).collect()[0].asDict()
    out: dict[str, Any] = {"row_count": row["__rows"], "columns": {}}
    for f in fields:
        col_stats: dict[str, Any] = {
            "type": f.dataType.simpleString(),
            "null_count": row[f"__nulls__{f.name}"] or 0,
            "distinct_count": row[f"__distinct__{f.name}"] or 0,
        }
        if isinstance(f.dataType, _NUMERIC):
            col_stats.update(
                min=row[f"__min__{f.name}"],
                max=row[f"__max__{f.name}"],
                mean=row[f"__mean__{f.name}"],
            )
        out["columns"][f.name] = col_stats
    return out
