"""Regression tests for the r14 functions/sources review findings:
floor-division boundary correctness, dsum overflow loudness, json-stream
validation symmetry, schema-probe scheme guard, and the borsh codec's
vesting round-trip + vec length bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ns_floordiv_is_exact_at_unit_boundaries(spark):
    """r14 review (verified): decimal(38,0)/decimal(19,0) types as
    decimal(38,6) and CheckOverflow rounds HALF_UP before floor, so the
    last 43.2 ms of every day bucketed into the NEXT day. The
    subtract-modulus form is exactly divisible, so floor is a no-op."""
    from near_public_lakehouse_spark.functions.time import (
        ns_to_date,
        ns_to_epoch_hour,
        ns_to_micros,
        ns_to_seconds,
    )

    rows = [
        (1_727_999_999_999_999_999,),  # last ns of 2024-10-03
        (1_728_000_000_000_000_000,),  # first ns of 2024-10-04
        (999_999_999,),  # last ns of epoch second 0
        (-1,),  # floor semantics below zero
    ]
    got = (
        spark.createDataFrame(rows, "ns long")
        .select(
            "ns",
            ns_to_date("ns").cast("string").alias("d"),
            ns_to_seconds("ns").alias("s"),
            ns_to_epoch_hour("ns").alias("h"),
            ns_to_micros("ns").alias("us"),
        )
        .collect()
    )
    by_ns = {r.ns: r for r in got}
    r = by_ns[1_727_999_999_999_999_999]
    assert (r.d, r.s, r.h, r.us) == (
        "2024-10-03", 1_727_999_999, 479_999, 1_727_999_999_999_999
    )
    r = by_ns[1_728_000_000_000_000_000]
    assert (r.d, r.s, r.h) == ("2024-10-04", 1_728_000_000, 480_000)
    assert by_ns[999_999_999].s == 0
    r = by_ns[-1]
    assert (r.d, r.s, r.h, r.us) == ("1969-12-31", -1, -1, -1)


def test_dsum_overflow_raises_instead_of_vanishing(spark):
    """r14 review: with ANSI off, an addend past decimal(28,6) cast to
    NULL and silently vanished from the 'exact' sum."""
    from near_public_lakehouse_spark.functions.numeric import davg, dsum

    ok = spark.createDataFrame([(1.5,), (2.5,), (None,)], "v double")
    assert ok.agg(dsum("v").alias("s")).collect()[0].s == 4.0
    assert ok.agg(davg("v").alias("a")).collect()[0].a == 2.0

    big = spark.createDataFrame([(1.0,), (1e25,)], "v double")
    with pytest.raises(Exception, match="overflow"):
        big.agg(dsum("v").alias("s")).collect()
    # with the right precision the same value sums fine
    assert big.agg(dsum("v", scale=0, precision=38).alias("s")).collect()[0].s == pytest.approx(1e25)


def test_read_blocks_validates_max_files_on_both_paths(spark, tmp_path):
    """r14 review: the evolve=True branch skipped the _reader validation,
    so max_files=0 was silently dropped and negatives reached Spark."""
    from near_public_lakehouse_spark.sources.json_stream import read_blocks

    d = str(tmp_path)
    for evolve in (False, True):
        with pytest.raises(ValueError, match="max_files"):
            read_blocks(spark, d, streaming=True, max_files=0, evolve=evolve)
        with pytest.raises(ValueError, match="max_files"):
            read_blocks(spark, d, streaming=True, max_files=-2, evolve=evolve)
        with pytest.raises(ValueError, match="max_files"):
            read_blocks(spark, d, streaming=False, max_files=5, evolve=evolve)


def test_probe_refuses_object_store_schemes(spark):
    from near_public_lakehouse_spark.streaming.evolution import probe_json_schema

    with pytest.raises(ValueError, match="scheme"):
        probe_json_schema(spark, "s3a://bucket/lake")


def test_lockup_vesting_hash_round_trips():
    """r14 review: decode surfaced only vesting_hash_len, so
    encode(decode(x)) silently re-encoded VestingHash states as the None
    variant — the hash is now carried (hex) and round-trips."""
    from near_public_lakehouse_spark.sources.borsh import (
        decode_lockup_state,
        encode_lockup_state,
    )

    raw = encode_lockup_state(
        {"lockup_amount": 10**24, "vesting_hash": b"\x01" * 32}
    )
    flat = decode_lockup_state(raw)
    assert flat["vesting_hash_len"] == 32
    assert flat["vesting_hash"] == "01" * 32
    assert encode_lockup_state(flat) == raw  # true inverse now


def test_vec_length_prefix_is_bounded():
    from near_public_lakehouse_spark.sources.borsh import BorshError, decode

    with pytest.raises(BorshError, match="vec length"):
        decode(("vec", ("struct", [])), b"\xff\xff\xff\xff")
    # a legitimate small vec still decodes
    assert decode(("vec", "u8"), b"\x02\x00\x00\x00\x07\x09") == [7, 9]
