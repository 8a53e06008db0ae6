#!/usr/bin/env python
"""Perplexity-filter ladder walkthrough: score documents with
corpus-trained language models of increasing order and watch the
ranking sharpen.

Runs the catalog's LM scoring ladder — unigram -> add-1 bigram ->
Jelinek-Mercer interpolated — plus the round-6 staged held-out
stupid-backoff trigram, and the vocabulary-coverage statistic that
sizes tokenizer vocabularies. Everything is the same code path as the
oracle-checked catalog queries; this script shows what a curation
author reads off them.

    python examples/lm_scoring_quickstart.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.queries import QUERIES  # noqa: E402
from dce_spark.queries_staging_r6 import STAGED_R6  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # the ladder: each model conditions on more context
    ladder = [
        ("unigram", QUERIES["unigram_logprob_documents"].fn),
        ("bigram add-1", QUERIES["bigram_logprob_documents"].fn),
        ("interp JM 0.7", QUERIES["interp_logprob_documents"].fn),
        ("trigram backoff (held-out)", STAGED_R6["trigram_backoff_logprob_documents"].fn),
    ]
    for label, fn in ladder:
        df = fn(spark, sf_dir)
        stats = df.agg(
            F.round(F.avg("avg_logprob"), 3).alias("mean"),
            F.round(F.min("avg_logprob"), 3).alias("worst"),
            F.count(F.lit(1)).alias("docs"),
        ).collect()[0]
        worst = (
            df.orderBy("avg_logprob").limit(3).select("doc_id").collect()
        )
        print(
            f"[lm] {label:28s} mean {stats['mean']:8.3f}  worst {stats['worst']:8.3f}"
            f"  over {stats['docs']} docs; lowest-scoring doc_ids: "
            + ", ".join(str(r["doc_id"]) for r in worst)
        )
        spark.catalog.clearCache()

    # vocabulary sizing: how many types cover the token mass
    cov = (
        STAGED_R6["vocab_coverage_documents"].fn(spark, sf_dir)
        .orderBy("coverage_p")
        .collect()
    )
    for r in cov:
        print(
            f"[vocab] {int(r['coverage_p'] * 100)}% of token mass needs "
            f"{r['n_types_needed']} of {r['total_types']} word types"
        )

    # the validator face of the ladder: a held-out score is only
    # meaningful if the split table is leak-free — guard it with the
    # no_overlap + temporal_split contract BEFORE training (strict:
    # ML failures route as warnings by default, a gate must fail)
    from dce_spark import validate_df
    from dce_spark.data import load_table

    contract = open(
        os.path.join(os.path.dirname(__file__), "lm_split_contract.yml")
    ).read()
    split_tbl = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") < 400, F.lit("train"))
        .otherwise(F.lit("score"))
        .alias("split"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") * 60)
        .alias("ingest_ts"),
    )
    report = validate_df(spark, split_tbl, contract, strict=True)
    print(f"[guard] lm split contract passed={report.passed}")

    spark.stop()


if __name__ == "__main__":
    main()
