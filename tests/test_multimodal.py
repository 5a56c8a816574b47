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
