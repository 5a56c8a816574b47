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


# --- per-modality embedding math (round-11 continuation) --------------------

embed_dims = st.tuples(st.integers(8, 80), st.integers(8, 80))  # (h, w)


@given(dims=embed_dims, seed=st.integers(0, 2**31))
@settings(**_SETTINGS)
def test_dct2_basis_is_orthonormal_and_brightness_invariant(dims, seed):
    """The pHash spectrum's DCT-II basis must be orthonormal (Parseval:
    full-spectrum energy == pixel energy of the 32x32 resample) and the
    kept low block, with DC dropped, must be exactly invariant to a
    constant brightness shift — the two properties the embedding's
    cosine semantics rest on."""
    from near_public_lakehouse_spark.operators.multimodal import (
        _block_mean_resample,
        _dct2_lowfreq,
    )

    h, w = dims
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h, w))

    x = _block_mean_resample(img)
    n = x.shape[0]
    k = np.arange(n)
    basis = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
    )
    basis[0] /= np.sqrt(2.0)
    assert np.allclose(basis @ basis.T, np.eye(n), atol=1e-10)  # orthonormal
    spec = basis @ x @ basis.T
    assert np.isclose((spec**2).sum(), (x**2).sum(), rtol=1e-10)  # Parseval

    shift = rng.uniform(-60, 60)
    assert np.allclose(
        _dct2_lowfreq(img), _dct2_lowfreq(img + shift), atol=1e-8
    )  # DC dropped -> brightness shift invisible


@given(dims=embed_dims, seed=st.integers(0, 2**31))
@settings(**_SETTINGS)
def test_block_mean_resample_is_bounded_and_mean_preserving_when_even(dims, seed):
    """Resampled values stay within the input's range for any shape, and
    when the input divides evenly into blocks the global mean is exactly
    preserved (area resampling loses no mass)."""
    from near_public_lakehouse_spark.operators.multimodal import _block_mean_resample

    h, w = dims
    rng = np.random.default_rng(seed)
    img = rng.uniform(-5, 260, size=(h, w))
    out = _block_mean_resample(img)
    assert out.shape == (32, 32)
    assert out.min() >= img.min() - 1e-9 and out.max() <= img.max() + 1e-9

    even = rng.uniform(0, 1, size=(64, 96))  # 2x3 blocks exactly
    assert np.isclose(_block_mean_resample(even).mean(), even.mean(), rtol=1e-12)


@given(
    sr=st.sampled_from([8_000, 16_000, 22_050, 44_100]),
    n_mels=st.integers(4, 32),
)
@settings(**_SETTINGS)
def test_mel_filterbank_covers_spectrum_without_negatives(sr, n_mels):
    """Every filter is non-negative with positive mass, and the bank's
    column support covers the full rfft bin range (no spectral hole a
    tone could hide in) for any sample rate/mel count combination."""
    from near_public_lakehouse_spark.operators.multimodal import _mel_filterbank

    n_fft = 256
    fb = _mel_filterbank(n_mels, n_fft, sr)
    assert fb.shape == (n_mels, n_fft // 2 + 1)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()  # no dead filter
    covered = fb.sum(axis=0) > 0
    # triangles tile the mel axis: inner bins are covered (edges may not be)
    assert covered[1 : n_fft // 2].mean() > 0.95


@given(
    op=st.sampled_from(["=", "<", "<=", ">", ">="]),
    lo=st.one_of(st.none(), st.integers(-50, 50)),
    span=st.integers(0, 40),
    v=st.integers(-60, 60),
)
@settings(**_SETTINGS)
def test_prune_bounds_exclusion_is_sound(op, lo, span, v):
    """Data-skipping soundness: whenever _excluded_by_bounds proves a
    file out, NO value inside the file's [lo, hi] interval satisfies the
    predicate — exhaustively checked over the interval. Missing bounds
    must never prove exclusion through the missing side."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        _excluded_by_bounds,
    )

    hi = None if lo is None else lo + span
    ops = {
        "=": lambda x: x == v,
        "<": lambda x: x < v,
        "<=": lambda x: x <= v,
        ">": lambda x: x > v,
        ">=": lambda x: x >= v,
    }
    if _excluded_by_bounds(op, lo, hi, v):
        assert lo is not None  # unbounded files can never be excluded
        assert not any(ops[op](x) for x in range(lo, hi + 1))
    # and with both bounds missing nothing is ever excluded
    assert not _excluded_by_bounds(op, None, None, v)
