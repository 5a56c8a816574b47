"""Borsh codec + lockup contract state decode (L2).

The reference fetches lockup contract state over JSON-RPC and Borsh-
deserializes it into `LockupContract`
(`rust-extract-apis/lockups/src/lockup.rs:19-73`, types from
`lockup_types.rs:32-136`). This module closes that seam in-engine: a
schema-driven Borsh codec written from the PUBLIC specification
(borsh.io — little-endian fixed-width integers, u32-length-prefixed
strings/vecs, u8-discriminant enums, 0/1-byte Options, structs as field
concatenation) plus the lockup contract schema, so raw `view_state` bytes
become the decoded-state rows that `plans/lockup.py` (L1 math, U4 UDF)
already consumes. The RPC *fetch* stays an injected client, same as the
repo's other RPC seams (`plans/gold.py`); the *decode* is real.

Both directions are implemented: `encode` exists so tests can round-trip
randomized states and pin known byte vectors without any Rust toolchain.

Schema DSL (plain data, no classes):
    "u8" | "u16" | "u32" | "u64" | "u128" | "bool" | "string" | "bytes"
    ("option", schema)
    ("vec", schema)
    ("struct", [(field_name, schema), ...])        -> dict
    ("enum", [(variant_name, schema_or_None), ...]) -> {"variant": name,
                                                        "value": payload}

`bytes` is the Vec<u8> fast path (borsh has no distinct bytes type).
near-sdk wrapper types serialize transparently: AccountId -> string,
U64 -> u64, U128 -> u128, Base64VecU8 -> Vec<u8>.
"""

from __future__ import annotations

import struct

_INT_WIDTHS = {"u8": 1, "u16": 2, "u32": 4, "u64": 8, "u128": 16}


class BorshError(ValueError):
    """Malformed bytes or schema/value mismatch."""


# ---------------------------------------------------------------------------
# Generic codec


def encode(schema, value) -> bytes:
    out = bytearray()
    _encode_into(schema, value, out)
    return bytes(out)


def _encode_into(schema, value, out: bytearray) -> None:
    if isinstance(schema, str):
        if schema in _INT_WIDTHS:
            width = _INT_WIDTHS[schema]
            iv = int(value)
            if iv < 0 or iv >= 1 << (8 * width):
                raise BorshError(f"{schema} out of range: {iv}")
            out += iv.to_bytes(width, "little")
        elif schema == "bool":
            out += b"\x01" if value else b"\x00"
        elif schema == "string":
            raw = value.encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
        elif schema == "bytes":
            raw = bytes(value)
            out += struct.pack("<I", len(raw)) + raw
        else:
            raise BorshError(f"unknown scalar schema {schema!r}")
        return
    kind = schema[0]
    if kind == "option":
        if value is None:
            out += b"\x00"
        else:
            out += b"\x01"
            _encode_into(schema[1], value, out)
    elif kind == "vec":
        out += struct.pack("<I", len(value))
        for item in value:
            _encode_into(schema[1], item, out)
    elif kind == "struct":
        for name, sub in schema[1]:
            if name not in value:
                raise BorshError(f"missing struct field {name!r}")
            _encode_into(sub, value[name], out)
    elif kind == "enum":
        variants = schema[1]
        names = [n for n, _ in variants]
        vname = value["variant"]
        try:
            idx = names.index(vname)
        except ValueError:
            raise BorshError(f"unknown enum variant {vname!r}") from None
        out += bytes([idx])
        payload_schema = variants[idx][1]
        if payload_schema is not None:
            _encode_into(payload_schema, value.get("value"), out)
    else:
        raise BorshError(f"unknown schema kind {kind!r}")


def decode(schema, data: bytes):
    """Decode `data` fully; trailing bytes are an error (borsh requires
    exact consumption, matching BorshDeserialize::try_from_slice)."""
    value, pos = _decode_at(schema, data, 0)
    if pos != len(data):
        raise BorshError(f"{len(data) - pos} trailing bytes after decode")
    return value


def _take(data: bytes, pos: int, n: int) -> bytes:
    if pos + n > len(data):
        raise BorshError("unexpected end of input")
    return data[pos : pos + n]


def _decode_at(schema, data: bytes, pos: int):
    if isinstance(schema, str):
        if schema in _INT_WIDTHS:
            width = _INT_WIDTHS[schema]
            raw = _take(data, pos, width)
            return int.from_bytes(raw, "little"), pos + width
        if schema == "bool":
            b = _take(data, pos, 1)[0]
            if b not in (0, 1):
                raise BorshError(f"invalid bool byte {b}")
            return bool(b), pos + 1
        if schema in ("string", "bytes"):
            (n,) = struct.unpack("<I", _take(data, pos, 4))
            raw = _take(data, pos + 4, n)
            if schema == "string":
                try:
                    return raw.decode("utf-8"), pos + 4 + n
                except UnicodeDecodeError as exc:
                    raise BorshError("invalid utf-8 in string") from exc
            return bytes(raw), pos + 4 + n
        raise BorshError(f"unknown scalar schema {schema!r}")
    kind = schema[0]
    if kind == "option":
        flag = _take(data, pos, 1)[0]
        if flag == 0:
            return None, pos + 1
        if flag != 1:
            raise BorshError(f"invalid option byte {flag}")
        return _decode_at(schema[1], data, pos + 1)
    if kind == "vec":
        (n,) = struct.unpack("<I", _take(data, pos, 4))
        pos += 4
        if n > len(data) - pos:
            # every element consumes >= 1 byte, so a length prefix past
            # the remaining input is corrupt — without this bound a
            # 4-byte payload of 0xffffffff loops 2^32-1 times on a
            # zero-width element schema (r14 review; the codec is the
            # documented extension point, not just the lockup contract)
            raise BorshError(
                f"vec length {n} exceeds remaining input ({len(data) - pos} bytes)"
            )
        items = []
        for _ in range(n):
            item, pos = _decode_at(schema[1], data, pos)
            items.append(item)
        return items, pos
    if kind == "struct":
        obj = {}
        for name, sub in schema[1]:
            obj[name], pos = _decode_at(sub, data, pos)
        return obj, pos
    if kind == "enum":
        idx = _take(data, pos, 1)[0]
        variants = schema[1]
        if idx >= len(variants):
            raise BorshError(f"enum discriminant {idx} out of range")
        vname, payload_schema = variants[idx]
        pos += 1
        if payload_schema is None:
            return {"variant": vname, "value": None}, pos
        payload, pos = _decode_at(payload_schema, data, pos)
        return {"variant": vname, "value": payload}, pos
    raise BorshError(f"unknown schema kind {kind!r}")


# ---------------------------------------------------------------------------
# Lockup contract schema (lockup_types.rs:32-224, field order = borsh order)

VESTING_SCHEDULE = (
    "struct",
    [("start_timestamp", "u64"), ("cliff_timestamp", "u64"), ("end_timestamp", "u64")],
)

TERMINATION_STATUS = (
    "enum",
    [
        ("VestingTerminatedWithDeficit", None),
        ("UnstakingInProgress", None),
        ("EverythingUnstaked", None),
        ("WithdrawingFromStakingPoolInProgress", None),
        ("ReadyToWithdraw", None),
        ("WithdrawingFromAccountInProgress", None),
    ],
)

TERMINATION_INFORMATION = (
    "struct",
    [("unvested_amount", "u128"), ("status", TERMINATION_STATUS)],
)

VESTING_INFORMATION = (
    "enum",
    [
        ("None", None),
        ("VestingHash", "bytes"),  # Base64VecU8 -> Vec<u8>
        ("VestingSchedule", VESTING_SCHEDULE),
        ("Terminating", TERMINATION_INFORMATION),
    ],
)

TRANSFERS_INFORMATION = (
    "enum",
    [
        ("TransfersEnabled", ("struct", [("transfers_timestamp", "u64")])),
        ("TransfersDisabled", ("struct", [("transfer_poll_account_id", "string")])),
    ],
)

LOCKUP_INFORMATION = (
    "struct",
    [
        ("lockup_amount", "u128"),
        ("termination_withdrawn_tokens", "u128"),
        ("lockup_duration", "u64"),
        ("release_duration", ("option", "u64")),
        ("lockup_timestamp", ("option", "u64")),
        ("transfers_information", TRANSFERS_INFORMATION),
    ],
)

TRANSACTION_STATUS = ("enum", [("Idle", None), ("Busy", None)])

STAKING_INFORMATION = (
    "struct",
    [
        ("staking_pool_account_id", "string"),
        ("status", TRANSACTION_STATUS),
        ("deposit_amount", "u128"),
    ],
)

LOCKUP_CONTRACT = (
    "struct",
    [
        ("owner_account_id", "string"),  # AccountId -> string
        ("lockup_information", LOCKUP_INFORMATION),
        ("vesting_information", VESTING_INFORMATION),
        ("staking_pool_whitelist_account_id", "string"),
        ("staking_information", ("option", STAKING_INFORMATION)),
        ("foundation_account_id", ("option", "string")),
    ],
)


def decode_lockup_state(raw: bytes) -> dict:
    """Borsh bytes -> the flat state dict `plans/lockup.locked_amount_udf`
    consumes (amounts as decimal strings: u128 rule, never a double).

    Mirrors lockup.rs:62-71: after decode the pipeline overrides
    transfers_information with the phase-2 timestamp; the raw decoded
    value is still surfaced (`transfers_*` keys) for audit.
    """
    c = decode(LOCKUP_CONTRACT, raw)
    li = c["lockup_information"]
    vi = c["vesting_information"]
    out = {
        "owner_account_id": c["owner_account_id"],
        "lockup_amount": str(li["lockup_amount"]),
        "termination_withdrawn_tokens": str(li["termination_withdrawn_tokens"]),
        "lockup_duration": li["lockup_duration"],
        "release_duration": li["release_duration"],
        "lockup_timestamp": li["lockup_timestamp"],
        "staking_pool_whitelist_account_id": c["staking_pool_whitelist_account_id"],
        "foundation_account_id": c["foundation_account_id"],
    }
    ti = li["transfers_information"]
    if ti["variant"] == "TransfersEnabled":
        out["transfers_timestamp"] = ti["value"]["transfers_timestamp"]
    else:
        out["transfer_poll_account_id"] = ti["value"]["transfer_poll_account_id"]
    if vi["variant"] == "VestingSchedule":
        vs = vi["value"]
        out["vesting_schedule"] = {
            "start_timestamp": vs["start_timestamp"],
            "cliff_timestamp": vs["cliff_timestamp"],
            "end_timestamp": vs["end_timestamp"],
        }
    elif vi["variant"] == "Terminating":
        out["terminating_unvested_amount"] = str(vi["value"]["unvested_amount"])
        out["termination_status"] = vi["value"]["status"]["variant"]
    elif vi["variant"] == "VestingHash":
        out["vesting_hash_len"] = len(vi["value"])
        # hex (JSON-safe) so encode_lockup_state is a true inverse — the
        # r14 review found the hash silently dropped on round-trip,
        # re-encoding as the None variant (locked-amount math then treats
        # the account as unvested)
        out["vesting_hash"] = bytes(vi["value"]).hex()
    si = c["staking_information"]
    if si is not None:
        out["staking_pool_account_id"] = si["staking_pool_account_id"]
        out["staking_deposit_amount"] = str(si["deposit_amount"])
        out["staking_status"] = si["status"]["variant"]
    return out


def encode_lockup_state(state: dict) -> bytes:
    """Inverse of `decode_lockup_state` for fixtures/tests: flat dict ->
    borsh bytes. Unspecified optional fields default like a fresh
    contract (no staking, no foundation, transfers enabled at 0)."""
    ti = (
        {"variant": "TransfersDisabled",
         "value": {"transfer_poll_account_id": state["transfer_poll_account_id"]}}
        if "transfer_poll_account_id" in state
        else {"variant": "TransfersEnabled",
              "value": {"transfers_timestamp": int(state.get("transfers_timestamp", 0))}}
    )
    if state.get("vesting_schedule"):
        vs = state["vesting_schedule"]
        vi = {
            "variant": "VestingSchedule",
            "value": {
                "start_timestamp": int(vs["start_timestamp"]),
                "cliff_timestamp": int(vs["cliff_timestamp"]),
                "end_timestamp": int(vs["end_timestamp"]),
            },
        }
    elif state.get("terminating_unvested_amount") is not None:
        vi = {
            "variant": "Terminating",
            "value": {
                "unvested_amount": int(state["terminating_unvested_amount"]),
                "status": {"variant": state.get("termination_status", "ReadyToWithdraw")},
            },
        }
    elif state.get("vesting_hash") is not None:
        vh = state["vesting_hash"]
        vi = {
            "variant": "VestingHash",
            "value": bytes.fromhex(vh) if isinstance(vh, str) else bytes(vh),
        }
    else:
        vi = {"variant": "None"}
    si = None
    if state.get("staking_pool_account_id"):
        si = {
            "staking_pool_account_id": state["staking_pool_account_id"],
            "status": {"variant": state.get("staking_status", "Idle")},
            "deposit_amount": int(state.get("staking_deposit_amount", 0)),
        }
    contract = {
        "owner_account_id": state.get("owner_account_id", "owner.near"),
        "lockup_information": {
            "lockup_amount": int(state["lockup_amount"]),
            "termination_withdrawn_tokens": int(state.get("termination_withdrawn_tokens", 0)),
            "lockup_duration": int(state.get("lockup_duration", 0)),
            "release_duration": (
                int(state["release_duration"])
                if state.get("release_duration") is not None
                else None
            ),
            "lockup_timestamp": (
                int(state["lockup_timestamp"])
                if state.get("lockup_timestamp") is not None
                else None
            ),
            "transfers_information": ti,
        },
        "vesting_information": vi,
        "staking_pool_whitelist_account_id": state.get(
            "staking_pool_whitelist_account_id", "whitelist.near"
        ),
        "staking_information": si,
        "foundation_account_id": state.get("foundation_account_id"),
    }
    return encode(LOCKUP_CONTRACT, contract)


# ---------------------------------------------------------------------------
# Spark surface: binary state column -> state_json column


def decode_lockup_state_udf():
    """Scalar UDF binary -> JSON string in exactly the shape
    `plans/lockup.locked_amount_udf` parses, so the two compose:

        df.withColumn("state_json", decode_lockup_state_udf()(F.col("state")))
          .withColumn("locked", locked_amount_udf()(...))

    Plain Python UDF on purpose (same rationale as locked_amount_udf):
    u128 balances exceed int64, and the rows hitting this are the few
    thousand lockup accounts per snapshot, not the fact stream.
    Malformed bytes -> NULL sentinel, filtered downstream (SURVEY §5).
    """
    import json

    from pyspark.sql.functions import udf
    from pyspark.sql.types import StringType

    def call(raw) -> str | None:
        if raw is None:
            return None
        try:
            return json.dumps(decode_lockup_state(bytes(raw)), sort_keys=True)
        except Exception:
            return None

    return udf(call, StringType())
