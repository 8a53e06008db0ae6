"""Skew-mitigation operators: explicit key salting for hot-key joins.

Why this exists: a shuffled equi-join hashes rows to reducers by join
key, so ONE hot key (a celebrity user, a default/sentinel id, an empty
string) lands its entire row set on one task — the classic straggler
that turns a 5-minute join into an hour at 100 TB. Two production
answers:

1. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on by
   default here): the runtime splits oversized shuffle partitions and
   replicates the matching build side. Zero code change, but it only
   triggers past size thresholds and only for sort-merge joins.
2. Explicit salting (this module): append a deterministic salt in
   ``[0, n_salts)`` to the fact side's key and replicate the dim side
   once per salt value, turning one hot reducer into ``n_salts``
   evenly-loaded ones. Works for any join the optimizer picks and at
   any granularity, at the cost of a ``n_salts``-fold dim expansion —
   which is why it fits the fact-to-small-dim shape (the expansion is
   of the SMALL side).

``tests/test_plans.py`` locks the physical shape: the join keys must
include the salt column and the dim side must carry the explode, so a
refactor cannot silently collapse the spread back onto the hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["salted_equi_join"]

_SALT = "__salt"


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    salt_by: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` to ``dim`` on column ``on`` with the fact
    side salted ``n_salts`` ways and the dim side replicated to match.

    ``salt_by`` must be a DETERMINISTIC expression over fact columns
    (e.g. ``F.xxhash64("event_id")``) so results are reproducible and
    retries/speculative tasks agree. It defaults to
    ``F.xxhash64(<every fact column>)`` — a ROW-spreading hash: a hot
    key's rows land on different salts whenever any non-key column
    varies, which is what a skew join is for. (Hashing only the join
    key would assign every row of the hot key the SAME salt — paying
    the dim replication for zero mitigation.) Rows that are
    byte-identical across ALL columns still collapse onto one salt
    under the default; pass a row-unique ``salt_by`` (an id column)
    if your fact side contains full-row duplicates of the hot key.
    Result is identical to ``fact.join(dim, on, how)`` with the hot
    key's rows spread across ``n_salts`` reducers.
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted join supports inner/left, got {how!r}")
    src = (
        salt_by
        if salt_by is not None
        else F.xxhash64(*[F.col(c) for c in fact.columns])
    )
    f = fact.withColumn(_SALT, F.pmod(src, F.lit(n_salts)).cast("int"))
    d = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [on, _SALT], how).drop(_SALT)
