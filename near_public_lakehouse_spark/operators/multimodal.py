"""Multimodal columns: image/audio/video as opaque BINARY columns with
typed metadata, processed via Arrow-batched `mapInPandas`.

This is the 100 TB training-data-pipeline surface (BASELINE.json north
star). Design contract:

- A multimodal table row = (id, modality, media BINARY, meta STRUCT).
  Payloads are opaque to Spark; all pruning happens on metadata columns so
  a metadata-only query NEVER deserializes payload bytes (columnar parquet
  reads skip the binary column entirely — verify ReadSchema in .explain).
- Transform stages are `mapInPandas` generators: Arrow moves the binary
  batches zero-copy, pandas sees bytes objects, and output batch size is
  decoupled from input (frame sampling can fan out, filtering can fan in).
- The codec layer (`decode_image` etc.) is STUBBED: the real
  Pillow/ffmpeg/soundfile calls are not in this container, so decoders
  parse only self-describing headers (deterministic, dependency-free) and
  raise NotImplementedError for real codecs. The Spark-side plumbing —
  schema, batching, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # 'image' | 'audio' | 'video'
        StructField("media", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

# --- stub codec layer ------------------------------------------------------

FAKE_MAGIC = b"FAKEIMG1"  # 8-byte magic || u32 width || u32 height || pixels


def encode_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image payload (tests / fixtures)."""
    body = bytes((x * 31 + seed) % 256 for x in range(min(width * height, 256)))
    return FAKE_MAGIC + struct.pack("<II", width, height) + body


def decode_image(payload: bytes) -> dict:
    """Header-only decode. Real formats raise NotImplementedError — swap in
    Pillow here in a full deployment; the call sites don't change."""
    if payload[:8] == FAKE_MAGIC:
        w, h = struct.unpack("<II", payload[8:16])
        return {"format": "fake", "width": w, "height": h}
    if payload[:8] == b"\x89PNG\r\n\x1a\n" or payload[:2] == b"\xff\xd8":
        raise NotImplementedError(
            "real image codecs (PNG/JPEG) need Pillow, which is not in this container"
        )
    raise ValueError("unknown image payload")


# --- mapInPandas stages ----------------------------------------------------


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """Populate (format,width,height,n_bytes) from payload headers.

    Scale notes: mapInPandas streams Arrow batches; nothing is collected,
    output partitioning follows input (no shuffle). Malformed payloads
    yield NULL metadata instead of failing the batch.
    """
    schema = df.schema

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            fmts, ws, hs, nb = [], [], [], []
            for payload in pdf["media"]:
                try:
                    meta = decode_image(bytes(payload))
                    fmts.append(meta["format"])
                    ws.append(meta["width"])
                    hs.append(meta["height"])
                except (ValueError, NotImplementedError):
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                nb.append(len(payload))
            pdf = pdf.assign(format=fmts, width=ws, height=hs, n_bytes=nb)
            yield pdf

    return df.mapInPandas(run, schema)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_images(df: DataFrame, max_side: int = 64) -> DataFrame:
    """Thumbnail stage: header-preserving fake resize (aspect-ratio math is
    real; pixel resampling is where Pillow would slot in)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    meta = decode_image(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                w, h = meta["width"], meta["height"]
                scale = max_side / max(w, h, 1)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out.append((mid, nw, nh, encode_fake_image(nw, nh)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "thumb"])

    return df.mapInPandas(run, RESIZE_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature_norm", LongType()),
        StructField("n_pixels", LongType()),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage shape: payload -> fixed-width vector. The
    stub emits a deterministic byte-sum 'embedding norm'; a real deployment
    yields the model's vector column here (same mapInPandas contract)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                b = bytes(payload)
                try:
                    meta = decode_image(b)
                except (ValueError, NotImplementedError):
                    continue
                out.append((mid, sum(b[16:]), meta["width"] * meta["height"]))
            yield pd.DataFrame(out, columns=["media_id", "feature_norm", "n_pixels"])

    return df.mapInPandas(run, FEATURE_SCHEMA)


FAKE_VIDEO_MAGIC = b"FAKEVID1"  # 8-byte magic || u32 n_frames || u32 frame_len || frames


def encode_fake_video(n_frames: int, frame_len: int = 16, seed: int = 0) -> bytes:
    """Deterministic fake video payload: fixed-length frames back to back."""
    frames = b"".join(
        bytes((f * 17 + x * 7 + seed) % 256 for x in range(frame_len))
        for f in range(n_frames)
    )
    return FAKE_VIDEO_MAGIC + struct.pack("<II", n_frames, frame_len) + frames


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, stride: int = 4) -> DataFrame:
    """Frame-sampling stage: one OUTPUT row per kept frame (every
    `stride`-th) — the fan-out case mapInPandas exists for: output batch
    size is decoupled from input rows. Real ffmpeg demuxing slots into the
    container parse; the sampling/fan-out plumbing is what's tested.

    Scale notes: fan-out happens executor-side within the input partition —
    no shuffle, no driver involvement; downstream repartition only if frame
    work needs rebalancing.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                b = bytes(payload)
                if b[:8] != FAKE_VIDEO_MAGIC:
                    continue  # not a video (or a real codec -> ffmpeg slot)
                n_frames, frame_len = struct.unpack("<II", b[8:16])
                for f in range(0, n_frames, stride):
                    start = 16 + f * frame_len
                    out.append((mid, f, b[start : start + frame_len]))
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame"])

    return df.mapInPandas(run, FRAME_SCHEMA)


def make_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture media table."""
    rows = [
        (
            i,
            "image",
            encode_fake_image(32 + (i % 8) * 16, 32 + (i % 5) * 16, seed=i),
            None,
            None,
            None,
            None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_video_table(spark, n: int = 16) -> DataFrame:
    """Deterministic fixture video table (frame counts vary per row)."""
    rows = [
        (i, "video", encode_fake_video(8 + (i % 3) * 4, seed=i), None, None, None, None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def metadata_only_projection(df: DataFrame) -> DataFrame:
    """The query every consumer should start from: metadata pruning without
    touching payload bytes (check ReadSchema excludes `media`)."""
    return df.select("media_id", "modality", "format", "width", "height", "n_bytes")


# --- real (dependency-free) analysis stages --------------------------------

# Magic-byte signatures: format routing needs no codec, so unlike the
# decode layer this stage is fully real — it is how a 100 TB ingest fans
# payloads out to per-format decode pools.
_MAGIC_SIGNATURES = (
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),  # wav/avi container; refine via bytes 8-12
    ("mp4", None),  # ftyp at offset 4, handled below
    ("fake_image", FAKE_MAGIC),
    ("fake_video", FAKE_VIDEO_MAGIC),
)

SNIFF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("detected_format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def sniff_format(payload: bytes) -> str:
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] == b"RIFF" and len(payload) >= 12:
        kind = payload[8:12]
        if kind == b"WAVE":
            return "wav"
        if kind == b"AVI ":
            return "avi"
        return "riff"
    for name, magic in _MAGIC_SIGNATURES:
        if magic and payload[: len(magic)] == magic:
            return name
    return "unknown"


def detect_formats(df: DataFrame) -> DataFrame:
    """Magic-byte format sniffing per payload — the routing stage before
    any decode. Pure bytes inspection (first 16 bytes), so it is REAL in
    this container, not a stub."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["media"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "detected_format": [sniff_format(bytes(p)) for p in payloads],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return df.select("media_id", "media").mapInPandas(run, SNIFF_SCHEMA)


ENTROPY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", DoubleType()),
    ]
)


def byte_entropy_features(df: DataFrame) -> DataFrame:
    """Shannon entropy (bits/byte) of each payload — a real, codec-free
    quality/filter signal: ~0 for constant padding, ~8 for
    compressed/encrypted blobs, mid-range for structured media. Vectorized
    numpy bincount over Arrow batches; the standard cheap screen before
    spending decode cycles at 100 TB."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, sizes, ents = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                counts = np.bincount(b, minlength=256)
                p = counts[counts > 0] / len(b)
                ents.append(float(-(p * np.log2(p)).sum()) if len(b) else 0.0)
                ids.append(mid)
                sizes.append(len(b))
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": sizes, "byte_entropy": ents}
            )

    return df.select("media_id", "media").mapInPandas(run, ENTROPY_SCHEMA)
