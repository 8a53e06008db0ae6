"""Embedding similarity search over an ``array<float>`` column.

- ``cosine_topk``: brute-force exact top-k against one query vector.
  The query is a literal (broadcast by construction); the scan is one
  map-side pass + a top-k (TakeOrdered) — no shuffle of the corpus.
- ``knn_join_topk``: exact top-k for a *set* of query vectors via
  broadcast nested-loop + per-query window top-k. Right for small Q,
  any corpus size.
- ``ivf_topk``: the scale path — partition the corpus by a coarse
  quantizer (here: nearest of k seed centroids), search only the
  query's cell. Recall < 1.0 by construction; nprobe widens the search.

Dot products use ``zip_with`` + ``aggregate`` (JVM-side, codegen) in
double precision. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["dot_col", "norm_col", "cosine_col", "cosine_topk", "knn_join_topk", "ivf_topk"]


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _as_literal_array(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query_vec``.

    One narrow pass over the corpus; Spark turns orderBy+limit into
    TakeOrdered (per-partition top-k, then merge of k*partitions rows —
    no full sort, no full shuffle).
    """
    q = _as_literal_array(query_vec)
    cos = cosine_col(F.col(vec_col), q)
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        df.select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def knn_join_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    round_digits: int | None = 6,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact k-NN join: every query row against the whole corpus.

    ``queries`` must be small enough to broadcast; the corpus streams
    through a broadcast nested-loop join, then a per-query window keeps
    the top k. Returns (q_id, vec_id, rank, cos_sim).
    ``exclude_self`` drops corpus rows whose id equals the query id
    *before* ranking.
    """
    joined = corpus.crossJoin(F.broadcast(queries))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(q_id_col))
    cos = cosine_col(F.col(vec_col), F.col(q_vec_col))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        joined.select(F.col(q_id_col), F.col(id_col), cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """IVF-style ANN: assign every corpus vector to its nearest centroid
    (map-side; centroid list is a literal array), then search only the
    ``nprobe`` cells nearest the query. At scale the corpus is written
    partitioned by cell so a query touches ~1/n_cells of the data.
    """
    import math

    def cell_of(vec_expr: Column) -> Column:
        best_cell, best_cos = F.lit(0), F.lit(-2.0)
        for i, c in enumerate(centroids):
            cos_i = cosine_col(vec_expr, _as_literal_array(c))
            better = cos_i > best_cos
            best_cell = F.when(better, F.lit(i)).otherwise(best_cell)
            best_cos = F.when(better, cos_i).otherwise(best_cos)
        return best_cell

    # driver-side: rank cells for the query vector
    def cos_py(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else -2.0

    probe_cells = sorted(
        range(len(centroids)), key=lambda i: -cos_py(query_vec, centroids[i])
    )[: max(1, nprobe)]

    q = _as_literal_array(query_vec)
    cos = cosine_col(F.col(vec_col), q)
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    return (
        df.withColumn("__cell", cell_of(F.col(vec_col)))
        .filter(F.col("__cell").isin([int(c) for c in probe_cells]))
        .select(F.col(id_col), cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )
