"""Property-based invariants for the round-6 additions: the Y4M codec
must round-trip arbitrary frame content and dimensions, and the BPE-ish
pre-tokenizer must partition arbitrary input identically on both engines
(the fixed-string parity suite is tests/test_text_extra.py; this fuzzes
the space around it)."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from near_public_lakehouse_spark.operators.multimodal import decode_y4m, encode_y4m
from near_public_lakehouse_spark.queries.text import BPE_PAT, _BPE_SQL_PAT

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

dims = st.tuples(st.integers(1, 12), st.integers(1, 10))  # (w//2, h//2)


@given(half=dims, n_frames=st.integers(0, 5), seed=st.integers(0, 2**31))
@settings(**_SETTINGS)
def test_y4m_roundtrip_arbitrary_frames(half, n_frames, seed):
    w, h = half[0] * 2, half[1] * 2  # C420 needs even dims
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n_frames):
        y = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
        u = rng.integers(0, 256, (w // 2) * (h // 2), dtype=np.uint8).tobytes()
        v = rng.integers(0, 256, (w // 2) * (h // 2), dtype=np.uint8).tobytes()
        frames.append((y, u, v))
    out = decode_y4m(encode_y4m(frames, w, h, fps=(30, 1)))
    assert (out["width"], out["height"], out["n_frames"]) == (w, h, n_frames)
    assert (out["fps_n"], out["fps_d"]) == (30, 1)
    for (y, _, _), luma in zip(frames, out["lumas"]):
        assert luma.tobytes() == y


# Printable-ASCII text including the regex's special citizens: quotes,
# digits, punctuation runs, repeated whitespace.
texts = st.text(
    alphabet=st.sampled_from(
        "abcXYZ019 '.,!?-_()[]{}#$%&*+/<>=@\\^`|~\t\n"
    ),
    max_size=80,
)


@given(s=texts)
@settings(**_SETTINGS)
def test_bpe_partitions_input_on_both_engines(spark, s):
    from pyspark.sql import functions as F

    spark_toks = list(
        spark.range(1)
        .select(F.regexp_extract_all(F.lit(s), F.lit(BPE_PAT), 0).alias("t"))
        .collect()[0]
        .t
    )
    duck_toks = duckdb.sql(
        "SELECT regexp_extract_all(?, '" + _BPE_SQL_PAT + "')", params=[s]
    ).fetchone()[0]
    assert spark_toks == duck_toks
    assert "".join(spark_toks) == s
