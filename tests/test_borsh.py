"""Borsh codec + lockup state decode (L2) tests.

Byte-level vectors are computed by hand from the public borsh spec
(little-endian ints, u32-len strings, u8 enum tags, 0/1 options) so the
codec is pinned against the wire format, not against itself; round-trips
are property-tested with hypothesis; the Spark seam composes the decode
UDF with the existing L1 vesting math and checks against the pure-Python
reference path.
"""

from __future__ import annotations

import json
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from near_public_lakehouse_spark.sources.borsh import (
    LOCKUP_CONTRACT,
    BorshError,
    decode,
    decode_lockup_state,
    encode,
    encode_lockup_state,
)

# ---------------------------------------------------------------------------
# Wire-format pins (hand-computed from the spec)


def test_scalar_wire_format():
    assert encode("u8", 7) == b"\x07"
    assert encode("u16", 0x0201) == b"\x01\x02"
    assert encode("u32", 1) == b"\x01\x00\x00\x00"
    assert encode("u64", 2**40) == (2**40).to_bytes(8, "little")
    assert encode("u128", 2**100 + 5) == (2**100 + 5).to_bytes(16, "little")
    assert encode("bool", True) == b"\x01"
    assert encode("string", "ab") == b"\x02\x00\x00\x00ab"
    assert encode("bytes", b"\x00\xff") == b"\x02\x00\x00\x00\x00\xff"


def test_composite_wire_format():
    assert encode(("option", "u64"), None) == b"\x00"
    assert encode(("option", "u64"), 3) == b"\x01" + (3).to_bytes(8, "little")
    assert encode(("vec", "u16"), [1, 2]) == b"\x02\x00\x00\x00\x01\x00\x02\x00"
    s = ("struct", [("a", "u8"), ("b", "string")])
    assert encode(s, {"a": 9, "b": "x"}) == b"\x09\x01\x00\x00\x00x"
    e = ("enum", [("A", None), ("B", "u16")])
    assert encode(e, {"variant": "A"}) == b"\x00"
    assert encode(e, {"variant": "B", "value": 5}) == b"\x01\x05\x00"


def test_lockup_contract_known_bytes():
    """A minimal contract, byte-by-byte: the exact layout BorshDeserialize
    would read for lockup_types.rs field order."""
    raw = b"".join(
        [
            struct.pack("<I", 5) + b"o.nea",          # owner_account_id
            (10**24).to_bytes(16, "little"),            # lockup_amount u128
            (0).to_bytes(16, "little"),                 # termination_withdrawn
            (0).to_bytes(8, "little"),                  # lockup_duration
            b"\x00",                                    # release_duration None
            b"\x01" + (42).to_bytes(8, "little"),       # lockup_timestamp Some(42)
            b"\x00" + (7).to_bytes(8, "little"),        # TransfersEnabled{ts=7}
            b"\x00",                                    # VestingInformation::None
            struct.pack("<I", 2) + b"wl",               # whitelist account
            b"\x00",                                    # staking_information None
            b"\x00",                                    # foundation None
        ]
    )
    c = decode(LOCKUP_CONTRACT, raw)
    assert c["owner_account_id"] == "o.nea"
    assert c["lockup_information"]["lockup_amount"] == 10**24
    assert c["lockup_information"]["lockup_timestamp"] == 42
    assert c["lockup_information"]["transfers_information"] == {
        "variant": "TransfersEnabled",
        "value": {"transfers_timestamp": 7},
    }
    assert c["vesting_information"] == {"variant": "None", "value": None}
    assert encode(LOCKUP_CONTRACT, c) == raw  # exact re-encode


def test_decode_rejects_malformed():
    with pytest.raises(BorshError):
        decode("u64", b"\x01\x02")  # truncated
    with pytest.raises(BorshError):
        decode("bool", b"\x02")  # invalid bool
    with pytest.raises(BorshError):
        decode(("option", "u8"), b"\x05\x01")  # invalid option tag
    with pytest.raises(BorshError):
        decode(("enum", [("A", None)]), b"\x01")  # discriminant out of range
    with pytest.raises(BorshError):
        decode("u8", b"\x01\x00")  # trailing bytes


# ---------------------------------------------------------------------------
# Property round-trips


_states = st.fixed_dictionaries(
    {
        "owner_account_id": st.text(min_size=1, max_size=24),
        "lockup_amount": st.integers(min_value=0, max_value=2**127),
        "termination_withdrawn_tokens": st.integers(min_value=0, max_value=2**64),
        "lockup_duration": st.integers(min_value=0, max_value=2**63),
        "release_duration": st.none() | st.integers(min_value=1, max_value=2**62),
        "lockup_timestamp": st.none() | st.integers(min_value=0, max_value=2**63),
        "transfers_timestamp": st.integers(min_value=0, max_value=2**63),
        "foundation_account_id": st.none() | st.text(max_size=12),
    },
)


@settings(max_examples=60, deadline=None)
@given(state=_states, kind=st.integers(min_value=0, max_value=3))
def test_lockup_state_roundtrip(state, kind):
    if kind == 1:
        state["vesting_schedule"] = {
            "start_timestamp": 100,
            "cliff_timestamp": 200,
            "end_timestamp": 300,
        }
    elif kind == 2:
        state["terminating_unvested_amount"] = state["lockup_amount"] // 2
        state["termination_status"] = "UnstakingInProgress"
    elif kind == 3:
        state["staking_pool_account_id"] = "pool.near"
        state["staking_deposit_amount"] = 123456789
        state["staking_status"] = "Busy"
    raw = encode_lockup_state(state)
    flat = decode_lockup_state(raw)
    assert flat["owner_account_id"] == state["owner_account_id"]
    assert flat["lockup_amount"] == str(state["lockup_amount"])
    assert flat["release_duration"] == state["release_duration"]
    assert flat["lockup_timestamp"] == state["lockup_timestamp"]
    assert flat["transfers_timestamp"] == state["transfers_timestamp"]
    assert flat["foundation_account_id"] == state["foundation_account_id"]
    if kind == 1:
        assert flat["vesting_schedule"] == state["vesting_schedule"]
    elif kind == 2:
        assert flat["terminating_unvested_amount"] == str(
            state["terminating_unvested_amount"]
        )
        assert flat["termination_status"] == "UnstakingInProgress"
    elif kind == 3:
        assert flat["staking_pool_account_id"] == "pool.near"
        assert flat["staking_status"] == "Busy"
    # encode(decode(x)) is byte-identical
    assert encode_lockup_state({**state, **_vesting_passthrough(flat)}) == raw


def _vesting_passthrough(flat: dict) -> dict:
    out = {}
    if "vesting_schedule" in flat:
        out["vesting_schedule"] = flat["vesting_schedule"]
    if "terminating_unvested_amount" in flat:
        out["terminating_unvested_amount"] = flat["terminating_unvested_amount"]
        out["termination_status"] = flat["termination_status"]
    return out


# ---------------------------------------------------------------------------
# Spark seam: raw bytes -> decode UDF -> L1 locked-amount math


def test_decode_udf_composes_with_locked_amount(spark):
    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.plans.lockup import (
        Lockup,
        VestingSchedule,
        get_locked_amount,
        locked_amount_udf,
    )
    from near_public_lakehouse_spark.sources.borsh import decode_lockup_state_udf

    from near_public_lakehouse_spark.plans.lockup import TRANSFERS_ENABLED_NS

    # locked_amount_udf injects the phase-2 transfers timestamp (the
    # lockup.rs:69-71 override), so schedule everything relative to it.
    ns = 10**9
    t0 = TRANSFERS_ENABLED_NS
    states = [
        {  # linear release in progress
            "owner_account_id": "a.near",
            "lockup_amount": 10**27 + 3,  # > u64, exercises exact math
            "release_duration": 400 * ns,
            "lockup_timestamp": t0 + 1_000 * ns,
            "transfers_timestamp": 0,
        },
        {  # vesting past the cliff, mid-schedule
            "owner_account_id": "b.near",
            "lockup_amount": 5 * 10**26,
            "lockup_timestamp": t0,
            "transfers_timestamp": 0,
            "vesting_schedule": {
                "start_timestamp": t0 + 900 * ns,
                "cliff_timestamp": t0 + 1_000 * ns,
                "end_timestamp": t0 + 3_000 * ns,
            },
        },
        {  # terminating
            "owner_account_id": "c.near",
            "lockup_amount": 7 * 10**25,
            "terminating_unvested_amount": 10**25,
            "lockup_timestamp": t0,
            "transfers_timestamp": 0,
        },
    ]
    block_ts = t0 + 1_100 * ns
    rows = [(encode_lockup_state(s), block_ts, "unknown-hash") for s in states]
    rows.append((b"\xff\x01garbage", block_ts, "unknown-hash"))  # malformed
    df = spark.createDataFrame(rows, "state binary, ts long, code_hash string")

    out = (
        df.withColumn("state_json", decode_lockup_state_udf()(F.col("state")))
        .withColumn("locked", locked_amount_udf()("state_json", "ts", "code_hash"))
        .select("state_json", "locked")
        .collect()
    )
    assert out[3].state_json is None and out[3].locked is None

    # expected via the pure-Python path on the ORIGINAL dicts
    def expect(s):
        vesting = None
        if s.get("vesting_schedule"):
            v = s["vesting_schedule"]
            vesting = VestingSchedule(
                v["start_timestamp"], v["cliff_timestamp"], v["end_timestamp"]
            )
        elif s.get("terminating_unvested_amount") is not None:
            from near_public_lakehouse_spark.plans.lockup import Terminating

            vesting = Terminating(s["terminating_unvested_amount"])
        lk = Lockup(  # transfers_timestamp left at the injected default,
            lockup_amount=s["lockup_amount"],  # matching the UDF
            release_duration=s.get("release_duration"),
            lockup_timestamp=s.get("lockup_timestamp"),
            vesting=vesting,
        )
        return str(get_locked_amount(lk, block_ts, False))

    for i, s in enumerate(states):
        assert out[i].locked == expect(s), f"row {i}"
        parsed = json.loads(out[i].state_json)
        assert parsed["owner_account_id"] == s["owner_account_id"]
