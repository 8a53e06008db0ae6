#!/usr/bin/env python
"""Tokenizer-training walkthrough: BPE over the test corpus.

Trains N BPE merges with :func:`dce_spark.ext.text.bpe_train` (the
same code path as the oracle-checked ``bpe_merges_documents`` /
``bpe_apply_documents`` catalog queries), then encodes the vocabulary
and prints coverage. The scalable shape: training runs on the
distinct-word frequency table, so every merge iteration is
corpus-size-independent after one corpus-sized groupBy.

    python examples/tokenizer_quickstart.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dce_spark.data import load_table  # noqa: E402
from dce_spark.ext.text import (  # noqa: E402
    bpe_encode,
    bpe_train,
    bpe_words,
    load_bpe,
    save_bpe,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("tokenizer-quickstart")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    words = bpe_words(docs)
    n_words, n_distinct = (
        words.agg(F.sum("cnt"), F.count(F.lit(1))).head()[0:2]
    )
    print(f"corpus: {n_words} word occurrences, {n_distinct} distinct")

    merges, final = bpe_train(words, n_merges)
    print(f"\nlearned merges (rank, left + right -> token, pair count):")
    for i, (left, right, c) in enumerate(merges, 1):
        print(f"  {i:2d}. {left!r} + {right!r} -> {left + right!r}  ({c})")

    vocab = (
        final.select(F.explode("syms").alias("token"), "cnt")
        .groupBy("token")
        .agg(F.sum("cnt").alias("occ"))
    )
    top = vocab.orderBy(F.desc("occ"), "token").limit(10).collect()
    n_tokens = vocab.agg(F.sum("occ")).head()[0]
    print(f"\nencoded corpus: {n_tokens} tokens "
          f"({n_tokens / n_words:.2f} tokens/word after {n_merges} merges)")
    print("top tokens:")
    for r in top:
        print(f"  {r['token']!r}: {r['occ']}")
    final.unpersist()

    # persist the tokenizer and encode documents with the Arrow-UDF
    # production path (the shape a 100k-merge vocabulary needs)
    import tempfile

    path = os.path.join(tempfile.mkdtemp(prefix="bpe_"), "tokenizer")
    save_bpe(spark, merges, path)
    encoded = bpe_encode(docs, load_bpe(spark, path))
    sample = encoded.orderBy("doc_id").head()
    print(f"\nencoded doc {sample['doc_id']}: first 12 tokens "
          f"{sample['tokens'][:12]}")
    spark.stop()


if __name__ == "__main__":
    main()
