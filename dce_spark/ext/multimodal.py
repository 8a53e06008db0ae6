"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct. The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
transforms, partitioning-friendly signatures — is real and tested; the
actual media decoding is STUBBED (the image/audio libraries are not in
this environment): ``decode_image`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic fake decoder so the
pipeline shape can be exercised end-to-end.

At scale: payload columns dominate bytes, so transforms select only
(id, payload) before mapInPandas (column pruning), keep batches bounded
via ``spark.sql.execution.arrow.maxRecordsPerBatch``, and return
metadata-only frames (never re-emit payloads you don't need).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .spread import spread_for_cpu

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_payload",
    "payload_stats",
    "decode_image_batch",
    "extract_image_features",
    "sample_frames",
]

#: metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def _spread(df: DataFrame) -> DataFrame:
    """Ensure payload batches are spread across cores before Python
    workers — a single input split must not serialize the whole corpus
    through one Arrow pipe. Gated on a cheap input-file count (see
    ext/spread.py; the former ``df.rdd`` probe cost 6.5x at sf0.1)."""
    return spread_for_cpu(df)


def attach_payload(
    df: DataFrame, source_col: str, media_type: str = "image", fmt: str | None = None
) -> DataFrame:
    """Wrap an existing column's bytes as an opaque payload + metadata.

    (In production the payload arrives from object storage; here any
    string/binary column can stand in as the payload for testing.)
    """
    payload = F.col(source_col).cast("binary")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).cast("string").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def payload_stats(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched byte-level stats over payloads via mapInPandas:
    (id, n_bytes, digest). Real plumbing — the pattern every decode/
    featurize step follows: prune to (id, payload), batch through
    pandas, return a small typed frame."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("digest", T.StringType(), False),
        ]
    )
    pruned = _spread(df.select(id_col, payload_col))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return pruned.mapInPandas(compute, schema=schema)


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake 'decode': derives a (width, height, 4-dim
    feature vector) from the payload digest. Stands in for PIL/cv2."""
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] % 64
    height = 16 + d[1] % 64
    feats = [b / 255.0 for b in d[2:6]]
    return width, height, feats


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType(), False), False),
    ]
)


def decode_image_batch(payload: bytes, fake: bool = False):
    """Decode one image payload. STUB: real decoding needs PIL/cv2,
    not present in this environment."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decoding requires PIL/opencv (not available); pass fake=True "
        "for the deterministic test decoder"
    )


def extract_image_features(
    df: DataFrame, id_col: str, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """mapInPandas feature extraction: (id, width, height, features).

    The Arrow batch shape, schema, and pruning are production-real; only
    the per-payload decode is stubbed (``fake=True`` for tests).
    """
    pruned = _spread(df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("p")))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_image_batch(bytes(b), fake=fake) for b in pdf["p"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return pruned.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling STUB: emits (id, frame_idx, ts_ms) rows.

    With ``fake=True`` the frame count is derived deterministically from
    payload length (1 frame per 100 bytes) so the explode shape —
    one input row to N output rows — is testable without codecs.
    """
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("ts_ms", T.LongType(), False),
        ]
    )
    pruned = _spread(df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("p")))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss = [], [], []
            for i, b in zip(pdf["id"], pdf["p"]):
                if not fake:
                    raise NotImplementedError(
                        "video decoding requires av/ffmpeg (not available); "
                        "pass fake=True for the deterministic stub"
                    )
                n_frames = max(1, len(bytes(b)) // 100)
                for j in range(n_frames):
                    ids.append(int(i))
                    idxs.append(j)
                    tss.append(j * every_ms)
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                }
            )

    return pruned.mapInPandas(run, schema=schema)
