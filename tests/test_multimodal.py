"""Multimodal column plumbing: metadata extraction, resize, feature
stages via mapInPandas; payload-pruning check on the parquet scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.make_media_table(spark, n=48)


def test_metadata_extraction(spark, media):
    out = mm.extract_media_metadata(media)
    rows = out.collect()
    assert len(rows) == 48
    assert all(r.format == "fake" for r in rows)
    assert all(r.n_bytes == len(r.media) for r in rows)
    widths = {r.width for r in rows}
    assert widths == {32, 48, 64, 80, 96, 112, 128, 144}


def test_resize_respects_aspect_ratio(spark, media):
    thumbs = mm.resize_images(mm.extract_media_metadata(media), max_side=64).collect()
    assert len(thumbs) == 48
    for t in thumbs:
        assert max(t.width, t.height) <= 64
        decoded = mm.decode_image(bytes(t.thumb))
        assert (decoded["width"], decoded["height"]) == (t.width, t.height)


def test_feature_extraction_deterministic(spark, media):
    f1 = {r.media_id: r.feature_norm for r in mm.extract_features(media).collect()}
    f2 = {r.media_id: r.feature_norm for r in mm.extract_features(media).collect()}
    assert f1 == f2 and len(f1) == 48
    assert all(r >= 0 for r in f1.values())


def test_malformed_payload_does_not_fail_batch(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        [(1, "image", b"garbage-not-an-image", None, None, None, None)], mm.MEDIA_SCHEMA
    )
    out = mm.extract_media_metadata(bad).collect()
    assert len(out) == 1 and out[0].format is None


def test_real_codec_is_explicitly_stubbed():
    png_header = b"\x89PNG\r\n\x1a\n" + b"0" * 16
    with pytest.raises(NotImplementedError):
        mm.decode_image(png_header)


def test_metadata_query_prunes_payload_column(spark, media, tmp_path):
    """Payload pruning at the scan: a metadata-only projection over the
    parquet table must not read the `media` column (ReadSchema check —
    the 100 TB contract for multimodal tables)."""
    path = str(tmp_path / "media_tbl")
    mm.extract_media_metadata(media).write.parquet(path)
    q = mm.metadata_only_projection(spark.read.parquet(path))
    plan = q._jdf.queryExecution().executedPlan().toString()
    schema_line = _read_schema(plan)
    assert schema_line and "media:binary" not in schema_line, plan

def _read_schema(plan: str) -> str:
    for line in plan.splitlines():
        if "ReadSchema" in line:
            return line
    return ""


def test_frame_sampling_fan_out(spark):
    """Every stride-th frame, one output row each; mixed-modality input
    skips non-video payloads instead of failing."""
    vids = mm.make_video_table(spark, n=9)  # frame counts 8, 12, 16
    frames = mm.sample_frames(vids, stride=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    # n_frames = 8 + (i%3)*4 -> kept = ceil(n/4): 2, 3, 4
    expect = {i: (8 + (i % 3) * 4 + 3) // 4 for i in range(9)}
    assert {k: len(v) for k, v in by_media.items()} == expect
    for rows in by_media.values():
        assert [r.frame_index for r in sorted(rows, key=lambda r: r.frame_index)] == [
            i * 4 for i in range(len(rows))
        ]
        # frame payloads are the exact container slices
        assert all(len(bytes(r.frame)) == 16 for r in rows)
    # images pass through a video sampler as zero rows, not errors
    mixed = mm.make_media_table(spark, n=4).union(mm.make_video_table(spark, n=2))
    out = mm.sample_frames(mixed, stride=4)
    assert set(r.media_id for r in out.collect()) == {0, 1}


def test_format_sniffing_routes_by_magic_bytes(spark):
    import near_public_lakehouse_spark.operators.multimodal as mm

    rows = [
        (1, "image", b"\x89PNG\r\n\x1a\n" + b"\x00" * 24, None, None, None, None),
        (2, "image", b"\xff\xd8\xff\xe0" + b"\x00" * 24, None, None, None, None),
        (3, "audio", b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"\x00" * 16, None, None, None, None),
        (4, "video", b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16, None, None, None, None),
        (5, "image", mm.encode_fake_image(8, 8), None, None, None, None),
        (6, "image", b"garbage-bytes-here", None, None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r.detected_format for r in mm.detect_formats(df).collect()}
    assert got == {1: "png", 2: "jpeg", 3: "wav", 4: "mp4", 5: "fake_image", 6: "unknown"}


def test_byte_entropy_separates_padding_from_noise(spark):
    import near_public_lakehouse_spark.operators.multimodal as mm

    constant = bytes(256)  # all-zero padding: entropy 0
    uniform = bytes(range(256)) * 4  # every byte value equally often: entropy 8
    rows = [
        (1, "image", constant, None, None, None, None),
        (2, "image", uniform, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r.byte_entropy for r in mm.byte_entropy_features(df).collect()}
    assert got[1] == 0.0
    assert abs(got[2] - 8.0) < 1e-9


# --- real codecs: WAV/PCM and 24-bit BMP (round 4) -------------------------


def _sine_wav(freq=440.0, rate=16_000, seconds=0.5, amp=0.5):
    import numpy as np

    from near_public_lakehouse_spark.operators.multimodal import encode_wav

    t = np.arange(int(rate * seconds)) / rate
    samples = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    return encode_wav(samples, sample_rate=rate)


def test_wav_roundtrip_and_features(spark):
    import numpy as np

    from near_public_lakehouse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        decode_wav,
        detect_formats,
    )

    payload = _sine_wav()
    w = decode_wav(payload)
    assert w["sample_rate"] == 16_000 and w["n_channels"] == 1 and w["bits"] == 16
    # RMS of a 0.5-amplitude sine is amp/sqrt(2)
    assert abs(np.sqrt((w["samples"] ** 2).mean()) - 0.5 / np.sqrt(2)) < 1e-3

    rows = [(1, "audio", payload, None, None, None, None),
            (2, "audio", b"not a wav", None, None, None, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert {r.detected_format for r in detect_formats(df).collect()} == {"wav", "unknown"}

    feats = {r.media_id: r for r in audio_features(df).collect()}
    assert list(feats) == [1]  # non-wav row skipped, not failed
    f = feats[1]
    assert abs(f.duration_s - 0.5) < 1e-9
    assert abs(f.rms - 0.5 / 2**0.5) < 1e-3
    assert abs(f.peak - 0.5) < 1e-3
    # 440 Hz sine crosses zero ~2*440 times/s -> rate-normalized ~0.055
    assert abs(f.zero_crossing_rate - 2 * 440 / 16_000) < 5e-3


def test_bmp_roundtrip_stats_and_resize(spark):
    import numpy as np

    from near_public_lakehouse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_bmp,
        image_stats,
        resize_bmp_images,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(48, 100, 3), dtype=np.uint8)  # non-x4 width pad path
    payload = encode_bmp(px)
    assert np.array_equal(decode_bmp(payload), px)

    solid = np.full((128, 64, 3), (200, 100, 50), dtype=np.uint8)
    rows = [(1, "image", payload, None, None, None, None),
            (2, "image", encode_bmp(solid), None, None, None, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    stats = {r.media_id: r for r in image_stats(df).collect()}
    assert (stats[1].width, stats[1].height) == (100, 48)
    expected_luma = 0.299 * 200 + 0.587 * 100 + 0.114 * 50
    assert abs(stats[2].mean_luma - expected_luma) < 1e-9
    assert stats[2].contrast < 1e-9  # solid color: zero RMS contrast
    assert abs(stats[2].saturation - 150.0) < 1e-9

    thumbs = {r.media_id: r for r in resize_bmp_images(df, max_side=32).collect()}
    assert (thumbs[2].width, thumbs[2].height) == (16, 32)
    tpx = decode_bmp(bytes(thumbs[2].thumb))
    assert tpx.shape == (32, 16, 3)
    assert np.all(tpx == np.array((200, 100, 50), dtype=np.uint8))  # solid stays solid


def test_truncated_multichannel_wav_is_skipped_not_fatal(spark):
    """A WAV whose header is valid but whose data bytes don't divide by
    the channel count must be skipped like any corrupt payload — not fail
    the whole job from inside reshape()."""
    import struct as _s

    from near_public_lakehouse_spark.operators.multimodal import (
        audio_features,
        encode_wav,
    )
    import numpy as np

    good = encode_wav(np.zeros(100, dtype="<i2"), sample_rate=8000)
    # valid stereo header, data chunk truncated to an odd sample count
    stereo = np.zeros(200, dtype="<i2")  # 100 frames x 2 channels
    bad = bytes(
        bytearray(encode_wav(stereo, sample_rate=8000, n_channels=2))[:-2]
    )  # drop one 16-bit sample -> 199 samples, not divisible by 2 channels
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))], "media_id long, media binary"
    )
    out = audio_features(df).collect()
    assert [r.media_id for r in out] == [1]


def test_y4m_roundtrip_features_and_sampling(spark):
    """Real video end-to-end: encode YUV4MPEG2 -> decode -> features vs a
    numpy reference -> stride sampling returns the exact luma planes."""
    import numpy as np

    from near_public_lakehouse_spark.operators.multimodal import (
        decode_y4m,
        make_y4m_table,
        sample_y4m_frames,
        video_features,
    )

    df = make_y4m_table(spark, n=4, width=16, height=12)
    # pure-python round trip on one payload
    payload = bytes(df.filter("media_id = 1").collect()[0].media)
    v = decode_y4m(payload)
    assert (v["width"], v["height"], v["fps_n"], v["fps_d"]) == (16, 12, 25, 1)
    assert v["n_frames"] == 6  # 4 + (1 % 3) * 2
    ref = np.array(
        [
            [(x + 3 * yy + 5 * f + 1) % 256 for x in range(16)]
            for f in range(6)
            for yy in range(12)
        ],
        dtype=np.uint8,
    ).reshape(6, 12, 16)

    feats = {r.media_id: r for r in video_features(df).collect()}
    assert set(feats) == {0, 1, 2, 3}
    r = feats[1]
    assert (r.width, r.height, r.n_frames) == (16, 12, 6)
    assert r.fps == 25.0 and abs(r.duration_s - 6 / 25) < 1e-12
    assert abs(r.mean_luma - ref.astype(np.float64).mean()) < 1e-9
    assert abs(r.motion - np.abs(np.diff(ref.astype(np.float64), axis=0)).mean()) < 1e-9

    frames = sample_y4m_frames(df.filter("media_id = 1"), stride=2).collect()
    assert [f.frame_index for f in sorted(frames, key=lambda x: x.frame_index)] == [0, 2, 4]
    got0 = np.frombuffer(bytes(frames[0].frame), dtype=np.uint8).reshape(12, 16)
    assert np.array_equal(got0, ref[frames[0].frame_index])


def test_y4m_rejects_unsupported_chroma_and_skips_compressed(spark):
    """Non-4:2:0 chroma raises at the documented seam; an MP4 payload in
    the same table is skipped, not fatal."""
    import pytest as _pytest

    from near_public_lakehouse_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        video_features,
    )

    c444 = b"YUV4MPEG2 W4 H4 F25:1 C444\n" + b"FRAME\n" + b"\x00" * 48
    with _pytest.raises(NotImplementedError):
        decode_y4m(c444)

    good = encode_y4m([(b"\x10" * 16, b"\x80" * 4, b"\x80" * 4)], 4, 4)
    mp4 = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(mp4)), (3, bytearray(c444))],
        "media_id long, media binary",
    )
    out = video_features(df).collect()
    assert [r.media_id for r in out] == [1]
    assert out[0].mean_luma == 16.0


def test_mel_embedding_ranks_near_identical_audio_first(spark):
    """audio_mel_embedding is a REAL spectral fingerprint: STFT -> mel ->
    log-time-mean -> L2. Two renditions of the same tone (one with mild
    noise) must rank each other #1 by cosine through the UNCHANGED
    similarity stack (embedding_topk_frame), while a far tone and white
    noise rank them lower; corrupt payloads are skipped per the module's
    routing contract; and the vector is unit-norm and deterministic."""
    import numpy as np

    from near_public_lakehouse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_mel_embedding,
        encode_wav,
    )
    from near_public_lakehouse_spark.queries.similarity import embedding_topk_frame

    rate = 16_000
    t = np.arange(rate // 2) / rate

    def clip(x):
        return encode_wav((np.clip(x, -1, 1) * 32767).astype("<i2"), sample_rate=rate)

    rng = np.random.default_rng(7)
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    rows = [
        (0, "audio", clip(tone), None, None, None, None),
        (1, "audio", clip(tone + 0.02 * rng.standard_normal(len(t))), None, None, None, None),
        (2, "audio", clip(0.5 * np.sin(2 * np.pi * 3000 * t)), None, None, None, None),
        (3, "audio", clip(0.3 * rng.standard_normal(len(t))), None, None, None, None),
        (4, "audio", b"not a wav at all", None, None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    emb = audio_mel_embedding(df)
    got = {r.media_id: np.array(r.embedding) for r in emb.collect()}
    assert sorted(got) == [0, 1, 2, 3]  # corrupt payload skipped, not fatal
    for v in got.values():
        assert abs(np.sqrt((v * v).sum()) - 1.0) < 1e-6  # unit norm
    # deterministic across runs
    again = {r.media_id: np.array(r.embedding) for r in emb.collect()}
    assert all(np.array_equal(got[k], again[k]) for k in got)

    # the embedding column plugs straight into the similarity stack
    topk = embedding_topk_frame(
        emb.select(F.col("media_id").alias("vec_id"), "embedding")
    )
    best = {r.qid: r.cid for r in topk.collect() if r.rnk == 1}
    assert best[0] == 1 and best[1] == 0  # the two tone renditions pair up
    # and the pair's cosine beats their similarity to noise/far tone
    cos = {(r.qid, r.cid): r.cosine for r in topk.collect()}
    assert cos[(0, 1)] > cos.get((0, 2), -1) and cos[(0, 1)] > cos.get((0, 3), -1)


def test_image_phash_embedding_ranks_noisy_copy_first(spark):
    """image_phash_embedding: Rec.601 luma -> 32x32 block-mean -> 2-D
    DCT-II low-frequency spectrum (DC dropped), L2-normalized. A noisy
    copy of an image ranks its original #1 by cosine through the
    unchanged similarity stack; a structurally different image ranks
    lower; dropping DC makes the vector brightness-shift invariant."""
    import numpy as np

    from near_public_lakehouse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_phash_embedding,
    )
    from near_public_lakehouse_spark.queries.similarity import embedding_topk_frame

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    noisy = np.clip(
        base.astype(int) + rng.integers(-12, 13, size=base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    brighter = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    rows = [
        (0, "image", encode_bmp(base), None, None, None, None),
        (1, "image", encode_bmp(noisy), None, None, None, None),
        (2, "image", encode_bmp(other), None, None, None, None),
        (3, "image", encode_bmp(brighter), None, None, None, None),
        (4, "image", b"JUNK", None, None, None, None),
    ]
    emb = image_phash_embedding(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r.media_id: np.array(r.embedding) for r in emb.collect()}
    assert sorted(got) == [0, 1, 2, 3]
    # brightness shift barely moves the DC-free spectrum
    assert float(got[0] @ got[3]) > 0.98
    topk = embedding_topk_frame(
        emb.select(F.col("media_id").alias("vec_id"), "embedding")
    )
    best = {r.qid: r.cid for r in topk.collect() if r.rnk == 1}
    # 0's noisy copy is 1; 3 is 0's brightness twin so accept either dup
    assert best[1] == 0 and best[0] in (1, 3)
    cos = {(r.qid, r.cid): r.cosine for r in topk.collect()}
    assert cos[(0, 1)] > cos[(0, 2)]


def test_video_phash_embedding_pools_frames_and_ranks_copy_first(spark):
    """video_phash_embedding: per-frame pHash spectra mean-pooled over
    time. A mildly noisy re-rendition of a clip ranks the original #1;
    an unrelated clip ranks below it; corrupt payloads skip."""
    import numpy as np

    from near_public_lakehouse_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_y4m,
        video_phash_embedding,
    )
    from near_public_lakehouse_spark.queries.similarity import embedding_topk_frame

    rng = np.random.default_rng(13)
    w, h, n = 32, 24, 8

    chroma = bytes((w // 2) * (h // 2))  # flat chroma planes

    def clip(frames):
        return encode_y4m(
            [(f.astype(np.uint8).tobytes(), chroma, chroma) for f in frames], w, h
        )

    base = [rng.integers(0, 255, size=(h, w)) for _ in range(n)]
    noisy = [np.clip(f + rng.integers(-10, 11, size=f.shape), 0, 255) for f in base]
    other = [rng.integers(0, 255, size=(h, w)) for _ in range(n)]
    rows = [
        (0, "video", clip(base), None, None, None, None),
        (1, "video", clip(noisy), None, None, None, None),
        (2, "video", clip(other), None, None, None, None),
        (3, "video", b"\x00bad", None, None, None, None),
    ]
    emb = video_phash_embedding(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r.media_id: np.array(r.embedding) for r in emb.collect()}
    assert sorted(got) == [0, 1, 2]
    topk = embedding_topk_frame(
        emb.select(F.col("media_id").alias("vec_id"), "embedding")
    )
    best = {r.qid: r.cid for r in topk.collect() if r.rnk == 1}
    assert best[0] == 1 and best[1] == 0
