#!/usr/bin/env python
"""End-to-end training-data curation walkthrough on the test corpus.

Runs the full funnel the engine exposes as composable library calls —
exact dedup, MinHash-LSH near-dup, quality/language gating, stratified
sampling, split assignment, and sequence packing — and prints the
per-stage attrition. Everything here is the same code path as the
oracle-checked catalog queries (`dce_spark/queries*.py`); this script
just shows the API a pipeline author would write.

    python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.data import load_table  # noqa: E402
from dce_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("curation-pipeline-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = load_table(spark, sf_dir, "documents").count()
    print(f"corpus: {n_docs} documents ({sf_dir})")

    # 1. the whole funnel in one query: exact dedup -> near-dup -> gate
    funnel = QUERIES["corpus_survivors_documents"].fn(spark, sf_dir)
    by_status = {
        r["status"]: r["n"]
        for r in funnel.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print("funnel:", dict(sorted(by_status.items())))

    survivors = funnel.filter(F.col("status") == "kept").select("doc_id")

    # 2. quality signals available per document (for threshold tuning)
    rep = QUERIES["repetition_signals_documents"].fn(spark, sf_dir)
    ent = QUERIES["char_entropy_documents"].fn(spark, sf_dir)
    sig = (
        survivors.join(rep, "doc_id")
        .join(ent, "doc_id")
        .agg(
            F.round(F.avg("top_bigram_frac"), 4).alias("avg_top_bigram_frac"),
            F.round(F.avg("entropy_nats"), 4).alias("avg_char_entropy"),
        )
        .collect()[0]
    )
    print(
        f"survivor signals: avg top-bigram {sig['avg_top_bigram_frac']}, "
        f"avg char entropy {sig['avg_char_entropy']} nats"
    )

    # 3. deterministic split + packing over the surviving corpus
    splits = QUERIES["split_assign_documents"].fn(spark, sf_dir)
    print(
        "split sizes:",
        {
            r["split"]: r["n"]
            for r in splits.groupBy("split")
            .agg(F.sum("n_docs").alias("n"))
            .collect()
        },
    )
    packs = QUERIES["pack_assign_documents"].fn(spark, sf_dir)
    n_packs = packs.select("bucket", "pack_id").distinct().count()
    print(f"sequence packing: {n_packs} packs of <=2048 tokens (+1 doc overflow)")

    # 4. ship the curated corpus as a query-friendly LAYOUT: survivors
    # hive-partitioned by language, each directory range-sorted by the
    # deterministic content fingerprint (zone-map pruning for lookup
    # joins); then prove the layout with one distributed stats pass.
    import tempfile

    from dce_spark.ext.text import fingerprint_col
    from dce_spark.sinks import layout_stats, write_partitioned

    out = os.path.join(tempfile.mkdtemp(prefix="curated_"), "docs")
    curated = (
        load_table(spark, sf_dir, "documents")
        .join(survivors, "doc_id")
        .withColumn("fp", fingerprint_col(F.col("text")))
    )
    write_partitioned(curated, out, ["lang"], files_per_partition=1)
    stats = layout_stats(spark, out).collect()
    print(
        f"layout: {len(stats)} files under {out} "
        f"({sum(r['rows'] for r in stats)} rows; one file per lang partition)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
