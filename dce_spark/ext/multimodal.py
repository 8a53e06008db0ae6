"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct. Three tiers of realness:

1. The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
   transforms, partitioning-friendly signatures — is real and tested.
2. Container-header METADATA decoding is REAL: :func:`parse_header`
   reads PNG IHDR, JPEG SOFn markers, GIF/BMP descriptors, and WAV
   RIFF chunks from raw bytes (fixed struct layouts, no media
   libraries) — the production first stage that filters by
   dimensions/duration BEFORE paying for pixel decode.
3. Pixel/sample decoding is STUBBED (PIL/ffmpeg absent from this
   environment): ``decode_image`` raises NotImplementedError unless
   ``fake=True``, which substitutes a deterministic fake decoder so
   the pipeline shape can be exercised end-to-end.

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
    "MEDIA_HEADER_SCHEMA",
    "attach_payload",
    "payload_stats",
    "parse_header",
    "parse_media_headers",
    "synthesize_payload",
    "decode_image_batch",
    "extract_image_features",
    "sample_frames",
    "resize_images",
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
    through one Arrow pipe. Python-stage mode: the fan-out is
    size-gated (one task per 32 MB of input) because every post-
    shuffle partition pays an Arrow python-worker spin-up — 32
    partitions of 150 rows cost 7x the work itself (see
    ext/spread.py; the former ``df.rdd`` probe cost 6.5x at sf0.1)."""
    return spread_for_cpu(df, bytes_per_task=32 << 20)


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


# ---------------------------------------------------------------------
# REAL container-metadata decoding (no media libraries needed): the
# dimension/sample-rate fields live in fixed-layout file headers, so a
# pure byte parser extracts them — this is the production first stage
# of any media pipeline (filter by size/format BEFORE paying for pixel
# decode). Pixel/sample decoding itself stays stubbed below (PIL/ffmpeg
# absent from this environment).
# ---------------------------------------------------------------------

MEDIA_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),  # png|jpeg|gif|bmp|wav|unknown
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # PNG color type -> samples/pixel


def parse_header(b: bytes) -> dict:
    """Parse real container headers: PNG IHDR, JPEG SOFn marker walk,
    GIF logical screen descriptor, BMP DIB header, WAV RIFF chunks.

    Returns a dict matching MEDIA_HEADER_SCHEMA minus (id, n_bytes);
    ``format='unknown'`` (all fields None) for unrecognized/truncated
    payloads — corrupt bytes must classify, not throw, at scale."""
    out = {
        "format": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "bit_depth": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR" and len(b) >= 26:
            out["format"] = "png"
            out["width"] = int.from_bytes(b[16:20], "big")
            out["height"] = int.from_bytes(b[20:24], "big")
            out["bit_depth"] = b[24]
            out["channels"] = _PNG_CHANNELS.get(b[25])
            return out
        if b[:2] == b"\xff\xd8":  # JPEG SOI; walk marker segments
            out["format"] = "jpeg"
            i = 2
            while i + 3 < len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers carry no length
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn (baseline..lossless)
                    out["bit_depth"] = b[i + 4]
                    out["height"] = int.from_bytes(b[i + 5 : i + 7], "big")
                    out["width"] = int.from_bytes(b[i + 7 : i + 9], "big")
                    out["channels"] = b[i + 9]
                    return out
                i += 2 + seg_len
            return out
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            out["format"] = "gif"
            out["width"] = int.from_bytes(b[6:8], "little")
            out["height"] = int.from_bytes(b[8:10], "little")
            return out
        if b[:2] == b"BM" and len(b) >= 26:
            out["format"] = "bmp"
            out["width"] = int.from_bytes(b[18:22], "little", signed=True)
            out["height"] = abs(int.from_bytes(b[22:26], "little", signed=True))
            return out
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            out["format"] = "wav"
            i = 12
            byte_rate = None
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                clen = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(b):
                    out["channels"] = int.from_bytes(b[i + 10 : i + 12], "little")
                    out["sample_rate"] = int.from_bytes(b[i + 12 : i + 16], "little")
                    byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
                    if i + 24 <= len(b):
                        out["bit_depth"] = int.from_bytes(b[i + 22 : i + 24], "little")
                elif cid == b"data" and byte_rate:
                    out["duration_ms"] = clen * 1000 // byte_rate
                    return out
                i += 8 + clen + (clen & 1)  # chunks are word-aligned
            return out
    except (IndexError, KeyError):
        pass
    return out


def synthesize_payload(kind: str, width: int = 0, height: int = 0,
                       channels: int = 1, sample_rate: int = 8000,
                       data_bytes: int = 0) -> bytes:
    """Build a byte-valid container header (+ dummy body) of the given
    kind — real struct layouts, so :func:`parse_header` exercises the
    same byte paths production files hit. PNG gets a real IHDR chunk
    (CRC is dummy — the parser, like any metadata scanner, does not
    verify checksums); JPEG gets a COM segment BEFORE the SOF0 so the
    marker walk is exercised, not just offset math; WAV gets fmt+data
    RIFF chunks with a correct byte_rate."""
    if kind == "png":
        ihdr = (width.to_bytes(4, "big") + height.to_bytes(4, "big")
                + bytes([8, 2, 0, 0, 0]))  # bit depth 8, color type 2 (RGB)
        return (b"\x89PNG\r\n\x1a\n" + len(ihdr).to_bytes(4, "big") + b"IHDR"
                + ihdr + b"\x00\x00\x00\x00")
    if kind == "jpeg":
        com = b"synthetic"
        sof = (bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
               + bytes([3]))  # precision 8, 3 components
        return (b"\xff\xd8"
                + b"\xff\xfe" + (len(com) + 2).to_bytes(2, "big") + com
                + b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
                + b"\xff\xd9")
    if kind == "wav":
        bits = 16
        byte_rate = sample_rate * channels * bits // 8
        fmt = (b"\x01\x00" + channels.to_bytes(2, "little")
               + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
               + (channels * bits // 8).to_bytes(2, "little")
               + bits.to_bytes(2, "little"))
        data = bytes(data_bytes)
        body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
                + b"data" + len(data).to_bytes(4, "little") + data)
        return b"RIFF" + (len(body) + 4).to_bytes(4, "little") + body
    raise ValueError(f"unknown payload kind {kind!r}")


def parse_media_headers(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched header metadata extraction over binary payloads:
    (id, format, width, height, channels, bit_depth, sample_rate,
    duration_ms, n_bytes). Pure byte parsing per payload — no decode
    libraries, no exceptions on corrupt input (format='unknown')."""
    pruned = _spread(
        df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("p"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_header(bytes(b)) for b in pdf["p"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "format": [m["format"] for m in metas],
                    "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                    "height": pd.array([m["height"] for m in metas], dtype="Int32"),
                    "channels": pd.array([m["channels"] for m in metas], dtype="Int32"),
                    "bit_depth": pd.array([m["bit_depth"] for m in metas], dtype="Int32"),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m["duration_ms"] for m in metas], dtype="Int64"
                    ),
                    "n_bytes": [len(bytes(b)) for b in pdf["p"]],
                }
            )

    return pruned.mapInPandas(run, schema=MEDIA_HEADER_SCHEMA)


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
    """Decode one image payload -> (width, height, 4-dim features).

    ``fake=True`` uses the deterministic digest-derived decoder (this
    environment ships no imaging library). With ``fake=False`` the
    REAL decode runs whenever PIL is importable: true pixel
    dimensions plus mean-RGB + luminance features from an 8x8
    thumbnail — the same Arrow plumbing either way, so enabling real
    decode is a library install, not a code change."""
    if fake:
        return _fake_decode(payload)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - PIL absent in CI env
        raise NotImplementedError(
            "image decoding requires PIL (pip install pillow) or pass "
            "fake=True for the deterministic test decoder"
        ) from e
    import io as _io

    with Image.open(_io.BytesIO(payload)) as im:
        rgb = im.convert("RGB")
        w, h = rgb.size
        data = list(rgb.resize((8, 8)).getdata())
        n = float(len(data)) * 255.0
        mr = sum(p[0] for p in data) / n
        mg = sum(p[1] for p in data) / n
        mb = sum(p[2] for p in data) / n
        lum = 0.299 * mr + 0.587 * mg + 0.114 * mb
        return w, h, [mr, mg, mb, lum]


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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized_bytes", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    max_side: int = 224,
    fake: bool = False,
) -> DataFrame:
    """Thumbnail/resize stage: (id, src dims, target dims, resized
    bytes, digest) via Arrow-batched mapInPandas.

    Target dims are REAL math (aspect-preserving fit into
    ``max_side``, computed from the REAL parsed header dimensions —
    parse_header — when the payload is a recognized container). The
    pixel resample itself is the documented stub: ``fake=True``
    substitutes a deterministic digest-derived byte count so the
    batch shape, pruning, and schema are exercised end-to-end;
    without it the stage raises (PIL/cv2 absent from this env).
    """
    pruned = _spread(
        df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("p"))
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "src_width", "src_height", "width",
                                   "height", "resized_bytes", "digest")}
            if not fake:
                try:
                    from PIL import Image
                except ImportError as e:  # pragma: no cover - PIL absent
                    raise NotImplementedError(
                        "pixel resampling requires PIL (pip install pillow); "
                        "pass fake=True for the deterministic stub"
                    ) from e
            for i, b in zip(pdf["id"], pdf["p"]):
                raw = bytes(b)
                hdr = parse_header(raw)
                sw, sh = hdr["width"], hdr["height"]
                if sw and sh:
                    scale = min(1.0, max_side / max(sw, sh))
                    w, h = max(1, int(sw * scale)), max(1, int(sh * scale))
                else:
                    w = h = max_side  # unknown container: letterbox target
                d = hashlib.sha256(raw).hexdigest()
                if fake:
                    # stub: deterministic fake output size ~ 3 bytes/pixel
                    n_resized = w * h * 3
                else:
                    import io as _io

                    with Image.open(_io.BytesIO(raw)) as im:
                        n_resized = len(
                            im.convert("RGB").resize((w, h)).tobytes()
                        )
                out["id"].append(int(i))
                out["src_width"].append(sw)
                out["src_height"].append(sh)
                out["width"].append(w)
                out["height"].append(h)
                out["resized_bytes"].append(n_resized)
                out["digest"].append(d)
            yield pd.DataFrame(
                {
                    "id": pd.Series(out["id"], dtype="int64"),
                    "src_width": pd.array(out["src_width"], dtype="Int32"),
                    "src_height": pd.array(out["src_height"], dtype="Int32"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "resized_bytes": pd.Series(out["resized_bytes"], dtype="int64"),
                    "digest": out["digest"],
                }
            )

    return pruned.mapInPandas(run, schema=RESIZED_SCHEMA)
