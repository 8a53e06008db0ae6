"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the point of these over naive pairwise comparison):

- exact: hash-groupBy on a content fingerprint — one shuffle on the
  digest, no pairwise work.
- n-gram Jaccard: inverted-index self-join on shingles (only documents
  *sharing* a shingle ever meet), then count-based Jaccard. Never a
  cross join. Common-shingle skew is the known hazard at 100 TB —
  ``max_shingle_freq`` drops stop-shingles (df-cut), the standard fix.
- MinHash-LSH: per-document signatures via min-over-hash aggregates,
  banded into buckets; candidate pairs only within equal band buckets.
  All hashing is md5-based so results are engine-portable (oracle-
  checkable) and stable across runs/cluster sizes.
- SimHash: per-document bit-majority fingerprint; near-dups share
  fingerprints (or differ in few bits). One groupBy per doc.

Everything is built-in expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "shingles_col",
    "exact_duplicates",
    "jaccard_candidate_pairs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "simhash",
    "simhash_near_pairs",
    "save_lsh_index",
    "match_against_lsh_index",
    "dedup_clusters",
]

from .spread import spread_for_cpu
from .text import fingerprint_col, tokens_col


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *materialized* token-array
    column (array<string>).

    ``toks`` MUST be a plain column reference, not a computed
    expression: anything captured inside a higher-order-function lambda
    is re-evaluated per element, which turns an O(tokens) shingling
    into O(tokens^2) regex splits.
    """
    k = F.size(toks) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` (array<string>).

    Convenience form for ad-hoc use; pipelines should tokenize into a
    real column first and call :func:`shingles_from_tokens` (see note
    there about lambda capture cost).
    """
    return shingles_from_tokens(tokens_col(F.lower(text)), n)


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of documents with identical normalized text.

    Returns (fingerprint, n_docs, doc_ids) for every group with >1 doc.
    Shuffles on the 16-byte digest, not the document text.
    """
    return (
        df.select(F.col(id_col), fingerprint_col(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_sort(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _parallelize(df: DataFrame) -> DataFrame:
    """Spread the CPU-heavy per-document expression work across cores.

    A small corpus often arrives as a single input split; shingling +
    hashing is compute-bound, so scale-out must not depend on file
    layout. At cluster scale the input has many splits and this
    round-robin repartition is a cheap, byte-proportional shuffle of
    (id, text) only. Gated on a cheap input-file count (ext/spread.py;
    the former ``df.rdd`` partition probe forced an RDD-conversion
    plan — round-2's 6.5x payload_stats regression).

    JVM mode (no ``bytes_per_task``): shingling runs in built-in
    expressions, so extra partitions cost only task scheduling —
    always fan to core count. (Round-3 lesson: size-gating this the
    way the Python-stage spread is gated left a 5k-doc corpus in ONE
    task and tripled the whole dedup family at sf0.1.)
    """
    return spread_for_cpu(df)


def _shingle_table(
    df: DataFrame, text_col: str, id_col: str, n: int, fast: bool = False
) -> DataFrame:
    """(__id, sh) exploded distinct shingles. ``fast=True`` replaces the
    shingle STRING with its xxhash64 — an 8-byte join/shuffle key
    instead of an ~n-word string (the dominant shuffle width of the
    inverted-index joins). Set semantics are preserved modulo 64-bit
    hash collisions (~n²/2⁶⁵ — negligible at any corpus size that fits
    a cluster); not oracle-replayable, so catalog queries keep md5-free
    string shingles and the fast path is benched separately."""
    pruned = _parallelize(df.select(F.col(id_col).alias("__id"), F.col(text_col)))
    toks = pruned.select(
        "__id", tokens_col(F.lower(F.col(text_col))).alias("__toks")
    )
    out = toks.select(
        "__id", F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("sh")
    )
    if fast:
        # hash AFTER explode (a generator can't nest inside xxhash64)
        out = out.select("__id", F.xxhash64("sh").alias("sh"))
    return out


def jaccard_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
    fast: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity via inverted-index join.

    ``fast=True`` joins on xxhash64(shingle) instead of the shingle
    string — 8-byte shuffle keys, ~identical results (64-bit collision
    odds), the production path; default stays oracle-portable.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= threshold. ``max_shingle_freq`` drops shingles occurring
    in more than that many documents before the join (skew guard).

    With ``max_shingle_freq`` set, BOTH the pair intersection counts and
    the per-document sizes are computed over the same df-cut shingle
    table, so the Jaccard estimate is exact within the retained
    vocabulary (mixing filtered numerator with unfiltered denominator
    would systematically underestimate similarity).

    The intermediate shingle table stays persisted while the returned
    (lazy) DataFrame is alive; callers that run many dedup jobs in one
    session should ``spark.catalog.clearCache()`` after consuming the
    result (bench.py and the test suite do).
    """
    # cached + eagerly materialized: reused by the size aggregate and
    # BOTH sides of the self-join. Without the eager count, the two join
    # sides race to compute the same cache blocks and serialize on
    # block-manager locks; with it, every consumer reads warm cache.
    sh = _shingle_table(df, text_col, id_col, n, fast).persist()
    sh.count()
    if max_shingle_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_freq)
            .select("sh")
        )
        cut = sh.join(rare, "sh").persist()
        cut.count()
        sh.unpersist()
        sh = cut
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("__id").alias("ia"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("__id").alias("ib"), F.col("sz").alias("sz_b"))
    out = (
        common.join(F.broadcast(sa), "ia")
        .join(F.broadcast(sb), "ib")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b"), F.col("jaccard")
        )
    )
    return out


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    fast: bool = False,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection: shingle containment
    |shingles(contained) ∩ shingles(container)| / |shingles(contained)|.

    Catches the case Jaccard structurally misses — a short document
    embedded verbatim inside a much longer one (quote farms, concat
    dumps), where the union term drowns the overlap. Same
    inverted-index join as :func:`jaccard_candidate_pairs` (documents
    only meet on shared shingles, never a cross join); each unordered
    overlap emits up to two directed (contained, container) rows, so
    the asymmetry costs nothing extra in shuffle. Scale notes and
    persist/unpersist contract match jaccard_candidate_pairs.

    ``max_shingle_freq`` is the same df-cut skew guard as jaccard's:
    a shingle in D documents contributes D^2 join rows, so stop-
    shingles dominate the shuffle. When set, BOTH the overlap counts
    and the per-document sizes are computed over the surviving
    shingles — containment stays a true ratio over one consistent
    shingle universe (a doc made entirely of dropped shingles simply
    has no rows).
    """
    sh = _shingle_table(df, text_col, id_col, n, fast).persist()
    sh.count()
    if max_shingle_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_shingle_freq)
            .select("sh")
        )
        cut = sh.join(rare, "sh").persist()
        cut.count()
        sh.unpersist()
        sh = cut
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("__id").alias("ia"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("__id").alias("ib"), F.col("sz").alias("sz_b"))
    both = common.join(F.broadcast(sa), "ia").join(F.broadcast(sb), "ib")
    # both directions from ONE evaluation of the join: explode a 2-row
    # array per unordered pair. (The earlier union of two projections
    # re-computed the whole inverted-index join + groupBy per side —
    # measured 2x the jaccard join this shares its shape with.)
    directed = F.array(
        F.struct(
            F.col("ia").alias("contained"),
            F.col("ib").alias("container"),
            (F.col("common").cast("double") / F.col("sz_a").cast("double")).alias(
                "containment"
            ),
        ),
        F.struct(
            F.col("ib").alias("contained"),
            F.col("ia").alias("container"),
            (F.col("common").cast("double") / F.col("sz_b").cast("double")).alias(
                "containment"
            ),
        ),
    )
    out = (
        both.select(F.explode(directed).alias("p"))
        .select("p.contained", "p.container", "p.containment")
        .withColumn("containment", F.round(F.col("containment"), 6))
        .filter(F.col("containment") >= threshold)
    )
    out = out.persist()
    out.count()
    sh.unpersist()
    return out


def _hash_expr(seed: int, col: Column, fast: bool = False) -> Column:
    """Keyed hash for MinHash. Two interchangeable families:

    - portable (default): md5 of 'seed:value' — engine-portable hex, so
      signatures are oracle-checkable (DuckDB computes the same bytes)
      and stable across engines. ~10 ns/byte.
    - fast: xxhash64(seed, value) — JVM-intrinsic, ~10x cheaper; the
      production choice at 100 TB where only run-to-run stability
      matters (xxhash64 is deterministic across runs/cluster sizes).

    Min over either family is a valid MinHash (uniform + total order).
    """
    if fast:
        return F.xxhash64(F.lit(seed), col)
    return F.md5(F.concat(F.lit(f"{seed}:"), col).cast("binary"))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    fast: bool = False,
    seed_offset: int = 0,
) -> DataFrame:
    """Per-document MinHash signature: one min-aggregate per hash seed,
    single shuffle on doc id. Returns (id, h0..h{k-1}).
    ``fast=True`` swaps md5 for xxhash64 (see _hash_expr) — the 100 TB
    path; keep the default for oracle-checked parity runs.
    ``seed_offset`` shifts the seed range to [offset, offset+k): two
    calls with disjoint offsets give INDEPENDENT MinHash families —
    what a banding-stability check compares. Output column names stay
    h0..h{k-1} regardless of offset, so downstream banding is
    offset-agnostic."""
    sh = _shingle_table(df, text_col, id_col, n)
    aggs = [
        F.min(_hash_expr(seed_offset + i, F.col("sh"), fast)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(F.col("__id").alias(id_col)).agg(*aggs)


def _band_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    fast: bool,
    seed_offset: int = 0,
) -> DataFrame:
    """(__id, band, bkey) LSH bucket rows — the shared layout for the
    self-join (lsh_candidate_pairs) and the batch-vs-corpus join
    (incremental_lsh_matches)."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, text_col, id_col, n, num_hashes, fast, seed_offset=seed_offset
    )
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        bkey = (
            F.xxhash64(*parts)
            if fast
            else F.md5(F.concat(*parts).cast("binary"))
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), bkey.alias("bkey")))
    return sigs.select(
        F.col(id_col).alias("__id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("__id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))


def incremental_lsh_matches(
    corpus_df: DataFrame,
    batch_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    fast: bool = False,
) -> DataFrame:
    """Streaming-ingest dedup shape: candidate matches of a NEW batch
    against an EXISTING corpus — (batch_id, corpus_id) pairs sharing any
    LSH band bucket. Unlike the self-join, the corpus side is static: in
    production its bucket table is precomputed once (or bucketed on
    (band, bkey) at write time), so admitting a batch shuffles ONLY the
    batch's signatures — the join cost scales with the batch, not the
    100 TB corpus. Exact-duplicate texts share every band, so recall for
    exact re-ingests is 1 by construction.
    """
    cb = _band_buckets(corpus_df, text_col, id_col, n, num_hashes, bands, fast)
    bb = _band_buckets(batch_df, text_col, id_col, n, num_hashes, bands, fast)
    c, b = cb.alias("c"), bb.alias("b")
    return (
        b.join(
            c,
            (F.col("b.band") == F.col("c.band")) & (F.col("b.bkey") == F.col("c.bkey")),
        )
        .select(
            F.col("b.__id").alias("batch_id"), F.col("c.__id").alias("corpus_id")
        )
        .distinct()
    )


def _cap_buckets(buckets: DataFrame, max_bucket_size: int) -> DataFrame:
    """Drop every (band, bkey) bucket holding more than
    ``max_bucket_size`` members — the hot-bucket guard for LSH self
    joins. A bucket of size B yields ~B²/2 candidate pairs, so one
    boilerplate-flooded bucket (every page sharing a banner) turns the
    equi-join quadratic; the cap bounds per-bucket fanout to
    ``max_bucket_size²/2``.

    Recall impact: a pair is lost only if EVERY band it co-occurs in is
    oversized. Hot buckets are precisely near-identical boilerplate, so
    what's dropped is the least informative candidate mass; genuinely
    distinct near-dup pairs keep their other (smaller) band buckets.

    Cost: one window count partitioned by (band, bkey) — the same key
    the self-join shuffles on, so the exchange is reused, not added.
    """
    w = Window.partitionBy("band", "bkey")
    return (
        buckets.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    fast: bool = False,
    max_bucket_size: int | None = None,
    seed_offset: int = 0,
) -> DataFrame:
    """MinHash-LSH candidate pairs: signatures -> band buckets ->
    pairs sharing any bucket. Returns distinct (doc_a, doc_b), a < b.

    At scale: the only join is bucket-equality on a compact key; a hot
    bucket means near-identical boilerplate — ``max_bucket_size`` drops
    oversized buckets before the self-join (see _cap_buckets for the
    recall contract), mirroring jaccard's ``max_shingle_freq``.
    ``fast=True`` uses xxhash64 end-to-end (signatures + band keys):
    same candidate semantics, ~10x less hashing CPU — the production
    path; default md5 stays oracle-portable. ``seed_offset`` selects
    an independent hash family (see minhash_signatures).
    """
    buckets = _band_buckets(
        df, text_col, id_col, n, num_hashes, bands, fast,
        seed_offset=seed_offset,
    )
    if max_bucket_size is not None:
        buckets = _cap_buckets(buckets, max_bucket_size)
    buckets = buckets.persist()  # both sides of the self-join reuse this
    buckets.count()  # eager: see jaccard_candidate_pairs on the cache race
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("doc_a"), F.col("b.__id").alias("doc_b"))
        .distinct()
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    fast: bool = False,
) -> DataFrame:
    """SimHash fingerprint (default 16-bit for portability) from distinct
    word hashes: bit j of the fingerprint is the majority vote of bit j
    across word digests. Pure expressions: explode words -> per-bit
    signed sums -> recombine. Returns (id, simhash bigint).

    Portable mode derives bit j from hex digit j of md5(word) (its high
    bit, digit in 8..f) — any md5 implementation agrees, so the DuckDB
    oracle can replay it. ``fast=True`` takes bit j of xxhash64(word)
    instead: same statistics, ~10x less hashing CPU, the 100 TB path.
    """
    assert bits <= 32
    pruned = _parallelize(df.select(F.col(id_col).alias("__id"), F.col(text_col)))
    words = pruned.select(
        "__id",
        F.explode(F.array_distinct(tokens_col(F.lower(F.col(text_col))))).alias("w"),
    )
    if fast:
        words = words.withColumn("h", F.xxhash64(F.col("w")))
        bit_set = [
            F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1 for j in range(bits)
        ]
    else:
        # bit j = high bit of hex digit j of md5(word) — SEMANTICS
        # IDENTICAL to substring(h, j+1, 1).isin('8'..'f'), but the
        # digits are extracted by parsing each 8-hex-digit slice into
        # ONE long (conv) and bit-shifting, instead of 32 per-word
        # string substring+isin ops: digit j%8 of chunk j//8 has its
        # high bit at position 4*(7 - j%8) + 3. Chunks are staged as
        # real columns so each conv evaluates once per word. ~2x less
        # expression CPU in the words stage at identical output.
        words = words.withColumn("h", F.md5(F.col("w").cast("binary")))
        n_chunks = (bits + 7) // 8
        words = words.select(
            "*",
            *[
                F.conv(F.substring("h", 1 + 8 * c, 8), 16, 10)
                .cast("long")
                .alias(f"hc{c}")
                for c in range(n_chunks)
            ],
        )
        bit_set = [
            F.shiftright(F.col(f"hc{j // 8}"), 4 * (7 - j % 8) + 3)
            .bitwiseAND(F.lit(1))
            == 1
            for j in range(bits)
        ]
    # vote_j = sum over words of +1 if bit set else -1
    aggs = [
        F.sum(F.when(bit_set[j], 1).otherwise(-1)).alias(f"v{j}")
        for j in range(bits)
    ]
    votes = words.groupBy(F.col("__id").alias(id_col)).agg(*aggs)
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return votes.select(F.col(id_col), fp.alias("simhash"))


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over candidate pairs: every document gets the
    minimum reachable doc id as its ``cluster_id`` — the step after
    candidate generation in every dedup pipeline (pick one canonical doc
    per cluster, drop the rest). Deterministic fixpoint either way, so
    oracle-checkable against a recursive-CTE transitive closure.

    Two regimes, same result (a test pins them to the same fixpoint):

    - at most ``driver_threshold`` PAIRS: collect the pairs and run
      union-find on the driver. The candidate list is a REDUCED result
      (LSH pruned it to orders of magnitude below the corpus — 826
      pairs from 5000 docs on the fixture), so this is the same
      contract as collecting k-row aggregates, and it is what
      production dedup pipelines do for the finisher: a fixed ~1s
      driver pass beats paying per-round distributed job latency on a
      metadata-sized graph. Ids of any orderable type (int, string)
      keep their type.
    - larger: distributed min-label propagation with POINTER JUMPING
      (each round also adopts the label's label), so rounds grow with
      log(diameter) instead of diameter. Per round: two small
      equi-joins + a groupBy over the pair list, previous round's cache
      dropped; convergence detected by a changed-label count. The
      RETURNED labels frame stays persisted while it is alive — callers
      running many clusterings should ``spark.catalog.clearCache()``
      after consuming it (same convention as the candidate-pair ops).
    """
    pairs = pairs.persist()
    n_pairs = pairs.count()

    if n_pairs <= driver_threshold:
        id_type = pairs.schema[a_col].dataType
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for row in pairs.collect():
            a, b = row[a_col], row[b_col]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the cluster label
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        pairs.unpersist()
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("node", id_type, False),
                T.StructField("cluster_id", id_type, False),
            ]
        )
        rows = [(n, find(n)) for n in sorted(parent)]
        return pairs.sparkSession.createDataFrame(rows, schema=schema)

    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    edges.count()
    pairs.unpersist()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        # pointer jump: also adopt the current label's own label, which
        # squares path lengths -> O(log diameter) rounds
        ptr = labels.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(ptr, stepped.label == ptr.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
    fast: bool = False,
) -> DataFrame:
    """Hamming-ball near-dup pairs from SimHash fingerprints via
    bit-band LSH — the third dedup geometry (MinHash ~ set overlap,
    hyperplane ~ embedding angle, SimHash ~ weighted token profile).

    Split the ``bits``-bit fingerprint into ``bands`` contiguous
    slices; ``d`` bit flips touch at most ``d`` bands, so with
    ``bands > max_hamming`` two fingerprints within the Hamming ball
    MUST agree on >= 1 band (pigeonhole) — candidate recall is exactly
    1.0, unlike MinHash banding's probabilistic recall. Candidates are
    a band-key equi-join (never all-pairs); the popcount(xor) verify
    runs only on candidates. Returns (doc_a, doc_b, hamming).
    """
    if not bands > max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole recall guarantee"
        )
    assert bits % bands == 0
    width = bits // bands
    mask = (1 << width) - 1
    fp = simhash(df, text_col, id_col, bits, fast)
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    buckets = fp.select(
        F.col(id_col).alias("__id"), "simhash", F.explode(slices).alias("bk")
    ).select("__id", "simhash", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    buckets = buckets.persist()
    buckets.count()  # eager: see jaccard_candidate_pairs on the cache race
    a, b = buckets.alias("a"), buckets.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("doc_a"),
            F.col("b.__id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    out = out.persist()
    out.count()
    buckets.unpersist()
    return out


def save_lsh_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    fast: bool = True,
    num_files: int = 8,
) -> None:
    """Persist the corpus LSH bucket table — the operational form of
    incremental dedup at 100 TB: signatures for the full corpus are
    computed ONCE at index-build time, and every future ingest batch
    joins against the stored buckets (match_against_lsh_index) paying
    only its own signature cost. Re-deriving corpus signatures per
    batch (incremental_lsh_matches) is the ad-hoc form.

    Layout: (doc_id, band, bkey) range-sorted by (band, bkey) via
    sinks.write_sorted, so the batch join's lookups hit a bounded band
    of files (parquet min/max pruning on the join key ranges).
    Defaults to ``fast=True`` (xxhash64) — an index is a production
    artifact; pass ``fast=False`` only when oracle replay matters.

    The hashing parameters are persisted alongside (``<path>/meta``)
    and re-applied at query time — a batch hashed with different
    parameters would silently match nothing, so the index is
    self-describing by construction.
    """
    from ..sinks import write_sorted

    spark = df.sparkSession
    bb = _band_buckets(df, text_col, id_col, n, num_hashes, bands, fast).select(
        F.col("__id").alias("doc_id"), "band", "bkey"
    )
    write_sorted(bb, path + "/buckets", ["band", "bkey"], num_files=num_files)
    meta = [(1, n, num_hashes, bands, bool(fast))]
    df.sparkSession.createDataFrame(
        meta, schema="version int, n int, num_hashes int, bands int, fast boolean"
    ).coalesce(1).write.mode("overwrite").json(path + "/meta")


def match_against_lsh_index(
    spark,
    path: str,
    batch_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(batch_id, corpus_id) candidate matches of a new batch against a
    persisted LSH index (save_lsh_index). The batch's signatures are
    computed with the INDEX's stored parameters — never the caller's
    guess. Join cost scales with the batch; the corpus is only read
    along the matching band-key ranges."""
    m = spark.read.json(path + "/meta").head()
    bb = _band_buckets(
        batch_df, text_col, id_col, int(m["n"]), int(m["num_hashes"]),
        int(m["bands"]), bool(m["fast"]),
    )
    idx = spark.read.parquet(path + "/buckets")
    return (
        bb.join(idx, ["band", "bkey"])
        .select(F.col("__id").alias("batch_id"), F.col("doc_id").alias("corpus_id"))
        .distinct()
    )
