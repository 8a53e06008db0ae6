#!/usr/bin/env python
"""Retrieval walkthrough: the embedding/ANN surface end-to-end.

Builds a persisted IVF index over the test embeddings, runs single-
and batch-query ANN search against it, finds semantic near-duplicates
with hyperplane LSH, and closes with a plan lint proving nothing
cartesian-joins.

    python examples/retrieval_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.data import load_table  # noqa: E402
from dce_spark.ext.similarity import (  # noqa: E402
    cosine_topk,
    hyperplane_lsh_pairs,
    ivf_index_topk,
    ivfpq_index_topk,
    pq_train,
    save_ivf_index,
    save_ivfpq_index,
)
from dce_spark.planaudit import audit  # noqa: E402
from dce_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("retrieval-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

    # 1. exact brute force — the recall-1.0 baseline
    exact = cosine_topk(emb.filter(F.col("vec_id") != 0), qvec, k=5).collect()
    print(f"corpus: {n} vectors; exact top-5 for vec 0:",
          [(r["vec_id"], r["cos_sim"]) for r in exact])

    # 2. persisted IVF index: cells as hive partitions, probes
    # partition-pruned to 1/n_cells of the files
    cents = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    idx = os.path.join(tempfile.mkdtemp(prefix="ivf_"), "index")
    save_ivf_index(emb, idx, cents)
    ann = ivf_index_topk(spark, idx, qvec, k=5, nprobe=2).collect()
    print("IVF(nprobe=2) top-5 from the index:",
          [(r["vec_id"], r["cos_sim"]) for r in ann])

    # 3. batch ANN: a SET of queries through probe-cell equi-joins
    batch = QUERIES["embedding_ivf_knn_join"].fn(spark, sf_dir)
    per_q = batch.groupBy("q_id").agg(F.count(F.lit(1)).alias("k")).collect()
    print("batch ANN:", {r["q_id"]: r["k"] for r in per_q}, "results per query")

    # 4. IVF+PQ: codes instead of vectors (16-32x smaller scan), ADC
    # probes partition-pruned to their cells
    cbs = pq_train(emb, dim=len(qvec), m=8, k_sub=8, iters=1)
    pq_idx = os.path.join(tempfile.mkdtemp(prefix="ivfpq_"), "index")
    save_ivfpq_index(emb, pq_idx, cents, cbs)
    adc = ivfpq_index_topk(spark, pq_idx, qvec, k=5, nprobe=2).collect()
    print("IVF+PQ(nprobe=2) ADC top-5:",
          [(r["vec_id"], round(r["adc_d2"], 4)) for r in adc])

    # 5. semantic near-dups: hyperplane LSH, equi-join only
    pairs = hyperplane_lsh_pairs(emb, threshold=0.95, bits=32, bands=4)
    n_pairs = pairs.count()
    rep = audit(batch)
    print(f"near-dup pairs >=0.95: {n_pairs}; batch-ANN plan joins: "
          f"{rep.joins} (cartesian: {rep.cartesian_like})")

    # 6. OPQ-lite: learn an orthogonal transform (two Householder
    # reflections onto subspace starts + variance-balancing snake
    # permutation), then read recall@10 with/without it at equal code
    # size — ALWAYS measure before shipping a rotation: it pays only
    # when top covariance directions cross subspace boundaries
    from dce_spark.ext.similarity import opq_apply, opq_rotation_fit

    rot = opq_rotation_fit(emb, dim=len(qvec), m=8)
    xr = opq_apply(emb, rot)
    # the snake puts variance-rank r at position (r%8)*8 + r//8, so the
    # top-8 dims land at subspace STARTS: perm[0], perm[8], perm[16], ...
    print("OPQ-lite: top-4 variance dims land at subspace starts:",
          [int(rot["perm"][s * 8]) for s in range(4)])
    print("rotated table columns:", xr.columns)
    both = {
        r["query_id"]: (r["recall_pq_at_10"], r["recall_opq_at_10"])
        for r in QUERIES["pq_opq_recall_embeddings"].fn(spark, sf_dir).collect()
    }
    print("recall@10 (pq, opq) per query:", both)
    spark.catalog.clearCache()  # opq_apply materializes its stages

    spark.stop()


if __name__ == "__main__":
    main()
