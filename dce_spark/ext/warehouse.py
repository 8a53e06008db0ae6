"""Warehouse-maintenance and training-matrix operators.

The batch faces of the jobs a lakehouse runs on every ingest cycle —
CDC compaction (MERGE INTO / upsert), SCD type-2 dimension history,
leakage-free point-in-time feature backfill, and as-of attribution —
each in its shuffle-minimal Spark shape:

- :func:`last_write_wins` — the argmax rides ONE
  ``groupBy(keys).agg(max(struct(order, payload)))``: map-side
  partials ship one candidate per key per mapper, vs the window-sort
  formulation that shuffles every version of every key.
- :func:`scd2_intervals` — lag -> running sum -> group -> lead, all
  over a single partitioning of the key: the whole dimension history
  costs one shuffle.
- :func:`pit_window_features` — a ``rangeBetween(-horizon, -1)``
  window over integer event times: point-in-time correct by
  construction (nothing at or after the label instant is visible),
  and never the label-to-activity self-join that degenerates into a
  nested-loop range join at scale.
- :func:`last_event_attribution` — "latest qualifying event strictly
  before me" as a running window MAX over a packed (time, id) int64:
  pure integer arithmetic, no join, one shuffle.

Staged catalog queries (queries_staging_r9.py) pin each operator
against a DuckDB oracle; the unit tests in tests/test_warehouse.py
cover the edge semantics (empty priors, ties, single-version keys).

Reference scope note: the reference engine (AndreaBozzo/dce) has no
warehouse-maintenance surface — this module is part of the
LLM/training-pipeline extension layer, like ext/dedup and
ext/similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "last_write_wins",
    "scd2_intervals",
    "pit_window_features",
    "last_event_attribution",
]


def last_write_wins(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """CDC compaction: the latest version per ``keys`` under
    lexicographic ``order_cols`` ordering (make the combination
    unique — e.g. (ts, event_id) — or the highest payload wins ties).

    Returns one row per key: the key columns, every payload column
    (prefixed ``last_``), and ``n_versions``. Implemented as a single
    ``max(struct(order..., payload...))`` aggregate — struct
    comparison is lexicographic, so the argmax never needs a window
    sort and partial aggregation ships one candidate per key per
    mapper.
    """
    w = F.max(
        F.struct(*[F.col(c) for c in order_cols + payload_cols])
    ).alias("__w")
    out = df.groupBy(*keys).agg(w, F.count(F.lit(1)).alias("n_versions"))
    return out.select(
        *keys,
        *[
            F.col(f"__w.{c}").alias(f"last_{c}")
            for c in order_cols + payload_cols
        ],
        "n_versions",
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD type-2 history build: compress ``df`` into one row per RUN
    of equal consecutive ``attr`` values per ``key`` (ordered by
    ``(ts_col, tiebreak_col)``), with ``valid_from`` = the run's first
    timestamp, ``valid_to`` = the next run's first timestamp (NULL
    marks the current row) and a 1-based ``version_no``.

    All three window passes and the run aggregate share the one
    ``key`` partitioning — a single shuffle builds the full history.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    chg = F.when(
        F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr)),
        1,
    ).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = df.select(key, attr, ts_col, tiebreak_col, chg.alias("__chg"))
    runs = runs.withColumn("__run", F.sum("__chg").over(wcum))
    intervals = runs.groupBy(key, "__run").agg(
        F.min(attr).alias(attr),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wl = Window.partitionBy(key).orderBy("__run")
    return intervals.select(
        key,
        F.col("__run").cast("long").alias("version_no"),
        attr,
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


def pit_window_features(
    df: DataFrame,
    entity_col: str,
    time_col: Column | str,
    value_col: Column | str,
    horizon_s: int,
    quantum: float = 1e6,
) -> DataFrame:
    """Point-in-time feature backfill: appends, for EVERY row, the
    entity's history over ``[t - horizon_s, t - 1]`` in integer event
    time ``time_col`` (seconds) — ``pit_n_prior`` (count),
    ``pit_sum_value`` (quantized-exact sum of ``value_col``), and
    ``pit_last_gap_s`` (seconds since the most recent prior row;
    NULL when none). Strictly-before-by-second: rows sharing the
    label's second are NOT visible (a feature computed in the label's
    own second is already leakage at serving time).

    One shuffle on ``entity_col``; callers filter to label rows
    afterwards — the features for every candidate row materialize in
    a single pass, which is how a feature store backfills years of
    labels without a per-label scan.
    """
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    staged = df.withColumn("__t", t.cast("long")).withColumn(
        "__qv", F.round(v.cast("double") * F.lit(quantum)).cast("long")
    )
    w = (
        Window.partitionBy(entity_col)
        .orderBy("__t")
        .rangeBetween(-int(horizon_s), -1)
    )
    return (
        staged.withColumn("pit_n_prior", F.count(F.lit(1)).over(w))
        .withColumn(
            "pit_sum_value",
            F.coalesce(F.sum("__qv").over(w), F.lit(0)).cast("double")
            / F.lit(quantum),
        )
        .withColumn("pit_last_gap_s", F.col("__t") - F.max("__t").over(w))
        .drop("__t", "__qv")
    )


def last_event_attribution(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    id_col: str,
    source_pred: Column,
    window_s: int,
    id_radix: int = 10_000_000,
) -> DataFrame:
    """As-of attribution: appends, for EVERY row, the most recent row
    satisfying ``source_pred`` strictly earlier in ``(ts_col,
    id_col)`` row order within the same entity — ``attr_source_id``
    and ``attr_gap_s``, NULL when none qualifies inside ``window_s``
    seconds. Callers filter to trigger rows (e.g. purchases)
    afterwards.

    (epoch_s, id) packs into ONE int64 (``es * id_radix + id`` —
    exact integer order == lexicographic order while ``0 <= id <
    id_radix``), so the lookup is a single running window MAX: no
    self-join, no range join, one shuffle on the entity. The packing
    precondition is ENFORCED at runtime (round-8 ADVICE fix): a
    source row with ``id_col`` outside ``[0, id_radix)`` raises
    instead of silently corrupting attributions — the guard is a
    per-source-row integer compare folded into the packed expression
    (``assert_true`` evaluates to NULL, so ``+ coalesce(guard, 0)``
    is a no-op on the value while keeping Catalyst from pruning it).
    """
    es = F.unix_timestamp(F.col(ts_col))
    staged = df.withColumn("__es", es)
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    guard = F.assert_true(
        (F.col(id_col) >= 0) & (F.col(id_col) < F.lit(id_radix)),
        F.lit(
            f"last_event_attribution: {id_col} outside [0, "
            f"{id_radix}) breaks the (epoch_s, id) int64 packing — "
            "raise id_radix"
        ),
    )
    packed = F.max(
        F.when(
            source_pred,
            F.col("__es") * F.lit(id_radix)
            + F.col(id_col)
            + F.coalesce(guard.cast("long"), F.lit(0)),
        )
    ).over(w)
    staged = staged.withColumn("__packed", packed)
    # exact integer unpack: packed ~ es * 1e7 exceeds double's 2^53
    # mantissa, so a float `/` + floor can flip at radix boundaries
    # (id near 0 or radix-1) — `div` stays in int64 like the oracles'
    # `//`
    src_es = F.expr(f"__packed div {int(id_radix)}")
    ok = F.col("__packed").isNotNull() & (
        F.col("__es") - src_es <= F.lit(int(window_s))
    )
    return (
        staged.withColumn(
            "attr_source_id",
            F.when(ok, F.col("__packed") % id_radix).cast("long"),
        )
        .withColumn(
            "attr_gap_s", F.when(ok, F.col("__es") - src_es).cast("long")
        )
        .drop("__es", "__packed")
    )
