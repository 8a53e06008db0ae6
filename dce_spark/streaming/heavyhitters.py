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

__all__ = ["lossy_count_fold", "streaming_heavy_hitters"]


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
