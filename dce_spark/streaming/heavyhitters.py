"""Streaming heavy hitters: Manku–Motwani lossy counting as a custom
stateful operator (no counterpart in the reference — its only
frequency surface is the finite-table class-balance check,
crates/contracts_validator/src/ml.rs; a stream monitor needs the
unbounded-cardinality version).

Why a sketch and not windowed groupBy counts: a count per DISTINCT key
needs state proportional to the key cardinality — unbounded for
user-ids/tokens/URLs at 100 TB/day. Lossy counting keeps at most
O(1/epsilon * log(epsilon * N)) tracked entries per shard with two
hard guarantees: (1) no false negatives — every key with true
frequency >= support * N survives; (2) every reported count
underestimates its true count by at most epsilon * N. The classic
monitoring contract "show everything above 0.1% of traffic, counted
to within 0.01%" costs ~10k tracked entries, independent of stream
length.

Scale shape: keys are hash-sharded; each shard's sketch lives in the
state store (one shuffle per micro-batch on the shard id, state size
bounded per shard, shards spread across executors). The fold itself
(:func:`lossy_count_fold`) is a pure function over a per-batch
pandas value_counts — Arrow-batched, no row-at-a-time Python — and is
unit-testable without a streaming query.
"""

from __future__ import annotations

import math
from typing import Mapping

from pyspark.sql import DataFrame, functions as F

__all__ = ["lossy_count_fold", "streaming_heavy_hitters", "lossy_count_batch"]


def lossy_count_fold(
    batch_counts: Mapping[str, int],
    entries: dict[str, tuple[int, int]],
    n_seen: int,
    epsilon: float,
) -> tuple[dict[str, tuple[int, int]], int]:
    """Merge one micro-batch's exact key counts into a lossy-counting
    sketch.

    ``entries`` maps key -> (count, delta); ``n_seen`` is the total
    items the sketch has absorbed. Returns the updated (entries,
    n_seen). Processing a whole batch per key preserves the per-item
    guarantees: a key entering at stream position n gets
    delta = floor(n / w) <= epsilon * n, the maximum it could have
    been undercounted by earlier evictions; pruning at bucket
    boundaries evicts exactly the entries whose count + delta can no
    longer reach the support threshold.
    """
    if not 0 < epsilon < 1:
        raise ValueError(f"need 0 < epsilon < 1, got {epsilon}")
    w = math.ceil(1.0 / epsilon)
    for key in sorted(batch_counts):  # sorted: deterministic fold order
        c_new = int(batch_counts[key])
        if c_new <= 0:
            continue
        start = n_seen
        n_seen += c_new
        if key in entries:
            c, d = entries[key]
            entries[key] = (c + c_new, d)
        else:
            entries[key] = (c_new, start // w)
        # prune once per crossed bucket boundary (equivalent to the
        # per-item rule: between boundaries nothing becomes prunable)
        if start // w != n_seen // w:
            b = n_seen // w
            entries = {
                k: (c, d) for k, (c, d) in entries.items() if c + d > b
            }
    return entries, n_seen


def streaming_heavy_hitters(
    stream_df: DataFrame,
    key_col: str,
    epsilon: float = 0.001,
    n_shards: int = 64,
) -> DataFrame:
    """Update-mode stream of tracked heavy-hitter candidates:
    (key, count, delta, shard_n) per micro-batch, where ``count`` is
    the sketch count (true count in [count, count + delta]) and
    ``shard_n`` the items absorbed by that key's shard. Downstream
    filters ``count + delta >= support * shard_n`` for the
    no-false-negative heavy-hitter set at any support >= epsilon.

    NOTE ``shard_n`` is PER-SHARD, not the global stream count: keys
    are hash-partitioned, so each key's full history lives in exactly
    one shard, but a shard absorbs only ~1/n_shards of total traffic.
    A filter of "keys above 0.1% of TOTAL traffic" therefore needs the
    global N = sum of each shard's latest ``shard_n`` (e.g. aggregate
    ``max(shard_n)`` per shard id downstream and sum). Filtering at
    ``support * shard_n`` per shard is strictly more permissive than
    ``support * N`` (shard_n <= N), so it keeps the no-false-negative
    guarantee for any global-support cut applied afterwards.

    Each shard's state is the sketch encoded as three parallel arrays
    (state-store friendly; no map-typed state), bounded by the lossy
    counting guarantee — NOT by key cardinality.
    """
    import pandas as pd  # noqa: F401  (workers need it; checked here)
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} string, count bigint, delta bigint, shard_n bigint"
    state_schema = "keys array<string>, counts array<long>, deltas array<long>, n bigint"

    def per_shard(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        batch: dict[str, int] = {}
        for pdf in pdf_iter:
            for k, c in pdf[key_col].astype(str).value_counts().items():
                batch[k] = batch.get(k, 0) + int(c)
        if state.exists:
            keys, counts, deltas, n = state.get
            entries = {
                k: (int(c), int(d)) for k, c, d in zip(keys, counts, deltas)
            }
            n = int(n)
        else:
            entries, n = {}, 0
        entries, n = lossy_count_fold(batch, entries, n, epsilon)
        ks = sorted(entries)
        state.update(
            (
                ks,
                [entries[k][0] for k in ks],
                [entries[k][1] for k in ks],
                n,
            )
        )
        yield pd.DataFrame(
            {
                key_col: ks,
                "count": [entries[k][0] for k in ks],
                "delta": [entries[k][1] for k in ks],
                "shard_n": [n] * len(ks),
            }
        )

    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
    return (
        stream_df.withColumn("__shard", shard)
        .groupBy("__shard")
        .applyInPandasWithState(
            per_shard,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def lossy_count_batch(
    df: DataFrame,
    key_col: str,
    order_col: str,
    epsilon: float = 0.01,
    n_shards: int = 8,
    batch_rows: int = 1000,
) -> DataFrame:
    """Batch REPLAY of the streaming lossy-counting sketch:
    (key, count, delta, shard_n) exactly as :func:`streaming_heavy_hitters`
    would emit after absorbing the whole frame, with micro-batches
    reconstructed as ``floor(order_col / batch_rows)`` and folded in
    order through the SAME :func:`lossy_count_fold`.

    Two uses: (1) backfill — run the identical sketch over historical
    data so batch and stream monitoring agree on guarantees, not just
    intent; (2) verification — the fold is deterministic (batch
    boundaries from ``order_col``, sorted-key fold within a batch), so
    an oracle holding exact counts can check both lossy-counting
    guarantees per key (no false negative at support >= epsilon;
    undercount <= epsilon * shard_n).

    Each row also carries its ``shard`` id so callers can derive the
    GLOBAL stream count as sum of distinct (shard, shard_n) — the
    global-support threshold the streaming docstring describes.

    Scale shape: ONE shuffle on the shard id, then each shard's fold
    is an Arrow-batched pandas pass whose working set is the sketch
    (O(1/epsilon * log(epsilon * n)) entries), not the key
    cardinality. Shards spread across executors; raise ``n_shards``
    with cluster size. ``key_col`` values are folded as strings, the
    streaming operator's convention.
    """
    import pandas as pd

    out_schema = (
        f"{key_col} string, count long, delta long, shard_n long, shard int"
    )

    def per_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        entries: dict[str, tuple[int, int]] = {}
        n = 0
        shard_id = int(pdf["__shard"].iloc[0])
        pdf = pdf.sort_values(order_col)
        batches = (pdf[order_col] // batch_rows).astype("int64")
        for _, grp in pdf.groupby(batches, sort=True):
            counts = {
                str(k): int(c)
                for k, c in grp[key_col].astype(str).value_counts().items()
            }
            entries, n = lossy_count_fold(counts, entries, n, epsilon)
        ks = sorted(entries)
        return pd.DataFrame(
            {
                key_col: ks,
                "count": [entries[k][0] for k in ks],
                "delta": [entries[k][1] for k in ks],
                "shard_n": [n] * len(ks),
                "shard": [shard_id] * len(ks),
            }
        )

    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
    return (
        df.select(F.col(key_col), F.col(order_col))
        .withColumn("__shard", shard)
        .groupBy("__shard")
        .applyInPandas(per_shard, schema=out_schema)
    )
