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
- The COMPRESSED-codec layer (PNG/JPEG/MP4) is stubbed: Pillow/ffmpeg are
  not in this container, so those payloads raise NotImplementedError at a
  documented seam. UNCOMPRESSED formats are decoded for real from the
  public specs — WAV/PCM (decode_wav -> audio_features), 24-bit BMP
  (decode_bmp -> image_stats, resize_bmp_images), and YUV4MPEG2 raw video
  (decode_y4m -> video_features, sample_y4m_frames) — so the full
  decode -> feature -> transform -> re-encode pipeline runs on actual
  media bytes end-to-end in ALL THREE modalities. Format sniffing and
  byte entropy are codec-free and real for everything.
- Each real modality also yields a deterministic numpy-only EMBEDDING
  (audio_mel_embedding: STFT->mel->log-mean; image_phash_embedding:
  block-mean->2-D DCT low-frequency spectrum; video_phash_embedding:
  per-frame pHash spectrum mean-pooled over time), all L2-normalized
  array<float> in the same (media_id, embedding) shape — so multimodal
  near-dup and similarity search ride the UNCHANGED similarity stack
  (queries/similarity: brute-force cosine, sign-LSH, IVF) with no new
  scale machinery.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
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
    ("bmp", b"BM"),
    ("riff", b"RIFF"),  # wav/avi container; refine via bytes 8-12
    ("mp4", None),  # ftyp at offset 4, handled below
    ("y4m", b"YUV4MPEG2 "),
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


# --- real codecs: WAV (PCM) and BMP (24-bit) -------------------------------
# These two formats are fully decodable from the public spec with
# struct + numpy — no Pillow/ffmpeg — so the decode layer is REAL for
# them: real samples, real pixels, real features, real thumbnails. The
# compressed-codec seam (PNG/JPEG/MP4) stays a documented
# NotImplementedError above; these paths prove the full pipeline shape
# (decode -> feature -> resize) end-to-end on actual media bytes.


def encode_wav(samples, sample_rate: int = 16_000, n_channels: int = 1) -> bytes:
    """PCM16 WAV encoder (RIFF/WAVE/fmt /data). `samples` is an int16
    numpy array, interleaved when n_channels > 1."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate, byte_rate,
        n_channels * 2, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff_len = 4 + len(fmt) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data


def decode_wav(payload: bytes) -> dict:
    """PCM WAV decode (8/16-bit, any channel count): chunk walk over the
    RIFF container. Returns sample_rate / n_channels / bits / a float64
    numpy array in [-1, 1] (channel-interleaved)."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"non-PCM WAV (format {audio_format})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "samples": x,
    }


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio feature extraction over WAV payloads: duration, RMS,
    peak, zero-crossing rate — the standard cheap screens (silence /
    clipping / tone-vs-speech) a 100 TB audio ingest runs before any
    model. Vectorized numpy per payload inside Arrow batches; non-WAV and
    non-PCM payloads are skipped (routed by detect_formats upstream)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                # The FULL per-payload computation sits inside the guard: a
                # WAV with a valid header but truncated multi-channel data
                # would otherwise raise from reshape() and fail the job
                # instead of being skipped like any other corrupt payload.
                try:
                    w = decode_wav(bytes(payload))
                    x = w["samples"]
                    n_frames = len(x) // max(w["n_channels"], 1)
                    mono = (
                        x.reshape(-1, w["n_channels"]).mean(axis=1) if len(x) else x
                    )
                    zc = (
                        float(
                            np.count_nonzero(
                                np.signbit(mono[1:]) != np.signbit(mono[:-1])
                            )
                        )
                        / max(len(mono) - 1, 1)
                    )
                    row = (
                        mid,
                        w["sample_rate"],
                        w["n_channels"],
                        n_frames / w["sample_rate"],
                        float(np.sqrt((x * x).mean())) if len(x) else 0.0,
                        float(np.abs(x).max()) if len(x) else 0.0,
                        zc,
                    )
                except (ValueError, NotImplementedError, ZeroDivisionError):
                    continue
                out.append(row)
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_channels", "duration_s",
                    "rms", "peak", "zero_crossing_rate",
                ],
            )

    return df.select("media_id", "media").mapInPandas(run, AUDIO_FEATURE_SCHEMA)


MEL_EMBED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _mel_filterbank(n_mels: int, n_fft: int, sample_rate: int):
    """(n_mels, n_fft//2+1) triangular mel filterbank from the public
    O'Shaughnessy formula mel = 2595*log10(1 + hz/700) — the standard
    construction (librosa/HTK shape), pure numpy."""
    import numpy as np

    f_max = sample_rate / 2.0
    mel_pts = np.linspace(0.0, 2595.0 * np.log10(1.0 + f_max / 700.0), n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * hz_pts / sample_rate).astype(int)
    bins = np.clip(bins, 0, n_fft // 2)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        lo, ctr, hi = bins[m], bins[m + 1], bins[m + 2]
        for k in range(lo, ctr):
            if ctr > lo:
                fb[m, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fb[m, k] = (hi - k) / (hi - ctr)
        if fb[m].sum() == 0:
            # degenerate triangle: adjacent mel points floor to the same
            # fft bin (hi == lo, or lo < ctr == hi with ctr - lo == 1,
            # whose only coefficient is (lo-lo)/1 = 0 — found by the
            # hypothesis sweep in tests/test_codec_properties.py). A unit
            # spike at the center keeps every filter live so no tone
            # falls into a dead band.
            fb[m, ctr] = 1.0
    return fb


def audio_mel_embedding(
    df: DataFrame, n_mels: int = 16, n_fft: int = 256, hop: int = 128
) -> DataFrame:
    """REAL spectral embedding over WAV payloads: framed Hann-windowed
    STFT (np.fft.rfft) -> power spectrum -> mel filterbank -> log ->
    time-mean -> L2-normalized array<float> — a deterministic,
    numpy-only audio fingerprint. This upgrades the audio path from
    stat screens (audio_features) to an EMBEDDING column the existing
    similarity stack consumes directly: feed the output to
    queries/similarity.embedding_topk_frame (brute-force cosine) or the
    LSH/IVF index builders for audio near-dup at scale — the same
    bucket-join shapes, so nothing new to scale. Pinned in
    tests/test_multimodal.py: near-identical clips rank each other #1
    by cosine; unrelated tones do not.

    Clips shorter than one frame are zero-padded to n_fft; multi-channel
    audio is mixed down like audio_features. Corrupt/non-PCM payloads
    are skipped (the module's standard routing contract)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        window = None  # built lazily so n_fft is closed over once
        fbanks: dict[int, object] = {}  # sample_rate -> filterbank
        for pdf in batches:
            out_ids, out_vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    w = decode_wav(bytes(payload))
                    x = w["samples"].astype(np.float64)
                    if w["n_channels"] > 1:
                        x = x.reshape(-1, w["n_channels"]).mean(axis=1)
                    if len(x) < n_fft:
                        x = np.pad(x, (0, n_fft - len(x)))
                    if window is None:
                        window = np.hanning(n_fft)
                    n_frames = 1 + (len(x) - n_fft) // hop
                    idx = (
                        np.arange(n_fft)[None, :]
                        + hop * np.arange(n_frames)[:, None]
                    )
                    spec = np.abs(np.fft.rfft(x[idx] * window, axis=1)) ** 2
                    sr = w["sample_rate"]
                    if sr not in fbanks:
                        fbanks[sr] = _mel_filterbank(n_mels, n_fft, sr)
                    mel = np.log1p(spec @ fbanks[sr].T).mean(axis=0)
                    nrm = float(np.sqrt((mel * mel).sum()))
                    vec = (mel / nrm if nrm > 0 else mel).astype(np.float32)
                except (ValueError, NotImplementedError, ZeroDivisionError):
                    continue
                out_ids.append(mid)
                out_vecs.append(vec.tolist())  # python floats: Arrow rejects np.float32 lists
            # explicit dtypes: an EMPTY partition otherwise infers float64
            # for `embedding`, which Arrow cannot cast to list<float>
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "embedding": pd.Series(out_vecs, dtype="object"),
                }
            )

    return df.select("media_id", "media").mapInPandas(run, MEL_EMBED_SCHEMA)


def encode_bmp(pixels) -> bytes:
    """24-bit uncompressed BMP encoder. `pixels` is an (H, W, 3) uint8
    RGB numpy array; rows are stored bottom-up, BGR, padded to 4 bytes —
    the classic BITMAPINFOHEADER layout."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    pad = b"\x00" * (stride - w * 3)
    bgr = arr[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        rows += bgr[y].tobytes() + pad
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40)
    return header + info + bytes(rows)


def decode_bmp(payload: bytes):
    """24-bit uncompressed BMP decode -> (H, W, 3) uint8 RGB array."""
    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    bits, compression = struct.unpack("<HI", payload[28:34])
    if bits != 24 or compression != 0:
        raise NotImplementedError(f"{bits}-bit/compression={compression} BMP")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("contrast", DoubleType()),
        StructField("saturation", DoubleType()),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL pixel statistics over BMP payloads: mean luminance (Rec. 601),
    RMS contrast, mean saturation proxy (max-min channel spread) — the
    brightness/flat-image/grayscale screens an image-corpus ingest applies
    before expensive captioning or embedding."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    px = decode_bmp(bytes(payload)).astype(np.float64)
                except (ValueError, NotImplementedError):
                    continue
                luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
                sat = px.max(axis=2) - px.min(axis=2)
                out.append(
                    (
                        mid,
                        px.shape[1],
                        px.shape[0],
                        float(luma.mean()),
                        float(luma.std()),
                        float(sat.mean()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mean_luma", "contrast", "saturation"],
            )

    return df.select("media_id", "media").mapInPandas(run, IMAGE_STATS_SCHEMA)


def resize_bmp_images(df: DataFrame, max_side: int = 64) -> DataFrame:
    """REAL thumbnailing for BMP payloads: nearest-neighbor resampling via
    numpy index grids, re-encoded as BMP. Same contract as resize_images
    (which covers the fixture/fake format); this is the pixels-for-real
    path proving the decode->transform->re-encode loop works distributed."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    px = decode_bmp(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                h, w = px.shape[:2]
                scale = max_side / max(w, h, 1)
                nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
                ys = (np.arange(nh) * (h / nh)).astype(int)
                xs = (np.arange(nw) * (w / nw)).astype(int)
                thumb = px[ys][:, xs]
                out.append((mid, nw, nh, encode_bmp(thumb)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "thumb"])

    return df.mapInPandas(run, RESIZE_SCHEMA)


# --- real (dependency-free) VIDEO: YUV4MPEG2 (.y4m) ------------------------
# The third modality closed the same way WAV/BMP closed audio/images: a
# real PUBLIC uncompressed format the container can decode with stdlib
# struct + numpy. YUV4MPEG2 is the reference raw-video interchange format
# (mjpegtools/ffmpeg): an ASCII parameter header, then "FRAME\n"-prefixed
# raw YCbCr planes. 4:2:0 subsampling (C420*) is implemented; other
# chroma modes raise at the documented seam like non-PCM WAV.

Y4M_MAGIC = b"YUV4MPEG2 "


def _block_mean_resample(luma, out_h: int = 32, out_w: int = 32):
    """Area-style downsample of a 2-D luma array to (out_h, out_w) by
    averaging index-partitioned blocks — deterministic, numpy-only (the
    resample step of the public pHash construction)."""
    import numpy as np

    a = np.asarray(luma, dtype=np.float64)
    h, w = a.shape
    ys = np.minimum((np.arange(out_h + 1) * h) // out_h, h)
    xs = np.minimum((np.arange(out_w + 1) * w) // out_w, w)
    out = np.empty((out_h, out_w))
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        row = a[y0:y1]
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = row[:, x0:x1].mean()
    return out


def _dct2_lowfreq(luma, keep: int = 8):
    """Top-left keep x keep block of the orthonormal 2-D DCT-II of a
    32x32 block-mean resample, DC dropped, flattened — the pHash
    spectrum kept REAL-VALUED so it works as a cosine embedding (bit
    thresholding loses the magnitudes ANN ranking needs). Pure numpy:
    D @ X @ D.T with the explicit DCT-II basis matrix."""
    import numpy as np

    x = _block_mean_resample(luma)
    n = x.shape[0]
    k = np.arange(n)
    basis = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis[0] /= np.sqrt(2.0)
    spec = basis @ x @ basis.T
    flat = spec[:keep, :keep].flatten()[1:]  # drop DC: brightness-invariant
    return flat


def _l2_unit(vec):
    import numpy as np

    v = np.asarray(vec, dtype=np.float64)
    nrm = float(np.sqrt((v * v).sum()))
    return (v / nrm if nrm > 0 else v).astype(np.float32)


def image_phash_embedding(df: DataFrame, keep: int = 8) -> DataFrame:
    """REAL perceptual embedding over BMP payloads: luma (Rec.601) ->
    32x32 block-mean resample -> 2-D DCT-II low-frequency block, DC
    dropped, L2-normalized — the pHash construction kept real-valued so
    the output array<float> feeds the similarity stack unchanged
    (embedding_topk_frame / LSH / IVF) for image near-dup. Deterministic,
    numpy-only; non-BMP payloads are skipped per the module's routing
    contract. Pinned in tests: a noisy copy ranks its original #1."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_ids, out_vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    rgb = decode_bmp(bytes(payload)).astype(np.float64)
                    luma = (
                        0.299 * rgb[:, :, 0]
                        + 0.587 * rgb[:, :, 1]
                        + 0.114 * rgb[:, :, 2]
                    )
                    vec = _l2_unit(_dct2_lowfreq(luma, keep))
                except (ValueError, NotImplementedError):
                    continue
                out_ids.append(mid)
                out_vecs.append(vec.tolist())  # python floats: Arrow rejects np.float32 lists
            # explicit dtypes: an EMPTY partition otherwise infers float64
            # for `embedding`, which Arrow cannot cast to list<float>
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "embedding": pd.Series(out_vecs, dtype="object"),
                }
            )

    return df.select("media_id", "media").mapInPandas(run, MEL_EMBED_SCHEMA)


def video_phash_embedding(df: DataFrame, keep: int = 8, stride: int = 2) -> DataFrame:
    """REAL temporal perceptual embedding over Y4M payloads: every
    `stride`-th luma plane gets the image pHash spectrum
    (`_dct2_lowfreq`), frames are mean-pooled over time, L2-normalized —
    one array<float> per clip, consumable by the unchanged similarity
    stack for video near-dup. A re-encoded/noisy copy of a clip pools to
    nearly the same spectrum; unrelated clips do not (test-pinned)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_ids, out_vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    v = decode_y4m(bytes(payload))
                    lumas = v["lumas"][::stride]
                    if not lumas:
                        continue
                    pooled = np.mean(
                        [_dct2_lowfreq(l.astype(np.float64), keep) for l in lumas],
                        axis=0,
                    )
                    vec = _l2_unit(pooled)
                except (ValueError, NotImplementedError):
                    continue
                out_ids.append(mid)
                out_vecs.append(vec.tolist())  # python floats: Arrow rejects np.float32 lists
            # explicit dtypes: an EMPTY partition otherwise infers float64
            # for `embedding`, which Arrow cannot cast to list<float>
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "embedding": pd.Series(out_vecs, dtype="object"),
                }
            )

    return df.select("media_id", "media").mapInPandas(run, MEL_EMBED_SCHEMA)


def encode_y4m(frames, width: int, height: int, fps=(25, 1)) -> bytes:
    """YUV4MPEG2 encoder (C420jpeg). `frames` is an iterable of
    (y, u, v) plane byte strings — y is width*height, u/v are
    (width//2)*(height//2) each."""
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n"
    ).encode("ascii")
    body = b"".join(b"FRAME\n" + y + u + v for y, u, v in frames)
    return header + body


def decode_y4m(payload: bytes) -> dict:
    """YUV4MPEG2 decode: parse the parameter header, then walk the
    FRAME-delimited planes. Returns width/height/fps/n_frames and the
    luma planes as a list of uint8 numpy arrays (height, width) — chroma
    is parsed for framing but not returned (features here are luma-based,
    like every cheap video screen)."""
    import numpy as np

    if payload[: len(Y4M_MAGIC)] != Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = None
    fps_n, fps_d = 25, 1
    chroma = "420jpeg"
    for tok in payload[len(Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            fps_n, fps_d = (int(x) for x in val.split(":"))
        elif tag == b"C":
            chroma = val
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if not chroma.startswith("420"):
        raise NotImplementedError(f"Y4M chroma mode C{chroma} (only 4:2:0 here)")
    y_len = width * height
    c_len = (width // 2) * (height // 2)
    frame_len = y_len + 2 * c_len
    lumas = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)  # FRAME line may carry parameters
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME delimiter")
        start = fnl + 1
        if start + frame_len > len(payload):
            raise ValueError("truncated frame")
        lumas.append(
            np.frombuffer(payload[start : start + y_len], dtype=np.uint8).reshape(
                height, width
            )
        )
        pos = start + frame_len
    return {
        "width": width,
        "height": height,
        "fps_n": fps_n,
        "fps_d": fps_d,
        "n_frames": len(lumas),
        "lumas": lumas,
    }


VIDEO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("duration_s", DoubleType()),
        StructField("mean_luma", DoubleType()),
        StructField("motion", DoubleType()),
    ]
)


def video_features(df: DataFrame) -> DataFrame:
    """REAL video feature extraction over Y4M payloads: dimensions, frame
    count, duration, mean luma, and mean absolute inter-frame luma delta
    ("motion") — the cheap static-vs-live screens a 100 TB video ingest
    runs before paying for a real decoder. Same contract as
    audio_features: mapInPandas, no shuffle, malformed/compressed
    payloads are skipped, not fatal."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    v = decode_y4m(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                lumas = v["lumas"]
                if not lumas:
                    continue
                stack = np.stack(lumas).astype(np.float64)
                fps = v["fps_n"] / v["fps_d"]
                motion = (
                    float(np.abs(np.diff(stack, axis=0)).mean())
                    if len(lumas) > 1
                    else 0.0
                )
                out.append(
                    (
                        mid,
                        v["width"],
                        v["height"],
                        v["n_frames"],
                        fps,
                        v["n_frames"] / fps,
                        float(stack.mean()),
                        motion,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "n_frames", "fps",
                    "duration_s", "mean_luma", "motion",
                ],
            )

    return df.mapInPandas(run, VIDEO_FEATURE_SCHEMA)


def sample_y4m_frames(df: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling over REAL Y4M payloads: one output row per kept
    luma plane (every `stride`-th frame) — fan-out executor-side, no
    shuffle, same contract as the fake-codec `sample_frames`."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                try:
                    v = decode_y4m(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                for f in range(0, v["n_frames"], stride):
                    out.append((mid, f, v["lumas"][f].tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame"])

    return df.mapInPandas(run, FRAME_SCHEMA)


def make_y4m_table(spark, n: int = 8, width: int = 16, height: int = 12) -> DataFrame:
    """Deterministic fixture table of real Y4M videos: a moving gradient
    (per-frame luma shift), constant chroma."""
    c_len = (width // 2) * (height // 2)
    rows = []
    for i in range(n):
        frames = []
        for f in range(4 + (i % 3) * 2):
            y = bytes(
                (x + 3 * yy + 5 * f + i) % 256
                for yy in range(height)
                for x in range(width)
            )
            frames.append((y, b"\x80" * c_len, b"\x80" * c_len))
        rows.append(
            (i, "video", encode_y4m(frames, width, height), None, None, None, None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
