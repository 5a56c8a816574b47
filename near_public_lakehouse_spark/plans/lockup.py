"""Lockup locked-amount math (L1): pure-Python port of the reference's Rust
business logic — `rust-extract-apis/lockups/src/lockup.rs:103-197` (itself
derived from near/core-contracts lockup getters), types from
`lockup_types.rs:32-136`, buggy-code-hash list from `lockup.rs:78-99`,
transfers-enabled constant from `lockup.rs:17`.

Python ints are unbounded, so u128 balances and the U256 intermediate
product need no special handling; u64 timestamp saturation is made
explicit. The UDF wrapper at the bottom is the U4 surface
(`rust_api_get_lockup_amount` — Aggregated Circulating Supply
Pipeline.py:158-199); the Borsh decode layer (L2) lives in
`sources/borsh.py` and composes with this UDF, while the RPC fetch
itself stays an injected client like the repo's other RPC seams.
"""

from __future__ import annotations

from dataclasses import dataclass

# Transfers enabled on mainnet after community voting,
# 2020-10-13 18:38:58.293 UTC (lockup.rs:17).
TRANSFERS_ENABLED_NS = 1_602_614_338_293_769_340

# Contract binaries with the start-date bug (lockup.rs:82-91).
BUGGY_CODE_HASHES = frozenset(
    {
        "3kVY9qcVRoW3B5498SMX6R3rtSLiCdmBzKs7zcnzDJ7Q",
        "DiC9bKCqUHqoYqUXovAnqugiuntHWnM3cAc7KrgaHTu",
    }
)

_U64_MAX = 2**64 - 1


def _sat_add_u64(a: int, b: int) -> int:
    return min(a + b, _U64_MAX)


def is_bug_inside_contract(code_hash: str) -> bool:
    """Per-binary bug dispatch (lockup.rs:78-99); unknown hashes are assumed
    fixed, as in the reference."""
    return code_hash in BUGGY_CODE_HASHES


@dataclass(frozen=True)
class VestingSchedule:
    """lockup_types.rs VestingSchedule {start,cliff,end} (ns timestamps)."""

    start_timestamp: int
    cliff_timestamp: int
    end_timestamp: int


@dataclass(frozen=True)
class Terminating:
    """VestingInformation::Terminating — unvested amount frozen at
    termination (lockup_types.rs)."""

    unvested_amount: int


@dataclass(frozen=True)
class Lockup:
    """Decoded lockup contract state (lockup_types.rs:32-136). The RPC
    fetch stays an injected client; `sources/borsh.py` (L2) decodes raw
    view_state bytes into this shape."""

    lockup_amount: int
    termination_withdrawn_tokens: int = 0
    lockup_duration: int = 0
    release_duration: int | None = None
    lockup_timestamp: int | None = None
    # lockup.rs:69-71 injects the phase-2 timestamp unconditionally.
    transfers_timestamp: int = TRANSFERS_ENABLED_NS
    vesting: VestingSchedule | Terminating | None = None


def get_unvested_amount(
    lockup: Lockup, vesting_schedule: VestingSchedule, block_timestamp: int
) -> int:
    """lockup.rs:164-196: tokens still locked by the vesting schedule."""
    amount = lockup.lockup_amount
    if isinstance(lockup.vesting, Terminating):
        return lockup.vesting.unvested_amount
    if lockup.vesting is None:
        return 0
    if block_timestamp < vesting_schedule.cliff_timestamp:
        return amount  # before the cliff, nothing is vested
    if block_timestamp >= vesting_schedule.end_timestamp:
        return 0  # after the end, everything is vested
    time_left = vesting_schedule.end_timestamp - block_timestamp
    total_time = vesting_schedule.end_timestamp - vesting_schedule.start_timestamp
    return amount * time_left // total_time  # exact U256 math


def get_locked_amount(lockup: Lockup, block_timestamp: int, has_bug: bool) -> int:
    """lockup.rs:105-160: tokens locked due to lockup or vesting at
    `block_timestamp` (ns)."""
    lockup_timestamp = max(
        _sat_add_u64(lockup.transfers_timestamp, lockup.lockup_duration),
        lockup.lockup_timestamp or 0,
    )
    if lockup_timestamp <= block_timestamp:
        if lockup.release_duration is not None:
            # Buggy binaries measured linear release from the transfers-
            # enabled date instead of the lockup date (lockup.rs:121-125).
            start_lockup = lockup.transfers_timestamp if has_bug else lockup_timestamp
            end_timestamp = _sat_add_u64(start_lockup, lockup.release_duration)
            if block_timestamp >= end_timestamp:
                unreleased = 0
            else:
                time_left = end_timestamp - block_timestamp
                unreleased = lockup.lockup_amount * time_left // lockup.release_duration
        else:
            unreleased = 0

        if isinstance(lockup.vesting, VestingSchedule):
            unvested = get_unvested_amount(lockup, lockup.vesting, block_timestamp)
        elif isinstance(lockup.vesting, Terminating):
            unvested = lockup.vesting.unvested_amount
        else:
            unvested = 0
        return max(
            max(unreleased - lockup.termination_withdrawn_tokens, 0),  # saturating_sub
            unvested,
        )
    # Entire balance locked before the lockup timestamp (lockup.rs:159).
    return lockup.lockup_amount - lockup.termination_withdrawn_tokens


# ---------------------------------------------------------------------------
# Spark surface (U4): locked amount as a column over decoded-state rows


def locked_amount_udf():
    """Scalar UDF (state_json, block_timestamp, code_hash) -> locked amount
    as a decimal STRING (u128 rule: never a double).

    The reference calls a Rust sidecar over HTTP per row (U4); here the
    math is local. This is deliberately a plain Python UDF, not pandas:
    the math is exact bigint (>64-bit) which numpy cannot represent.
    Rows hitting this UDF are the few thousand lockup accounts per day,
    not the fact stream — driver-bounded, not scan-bounded.
    """
    import json

    from pyspark.sql.functions import udf
    from pyspark.sql.types import StringType

    def compute(state_json: str, block_timestamp: int, code_hash: str) -> str | None:
        if state_json is None or block_timestamp is None:
            return None
        try:
            s = json.loads(state_json)
            vesting = None
            if s.get("vesting_schedule"):
                v = s["vesting_schedule"]
                vesting = VestingSchedule(
                    int(v["start_timestamp"]), int(v["cliff_timestamp"]), int(v["end_timestamp"])
                )
            elif s.get("terminating_unvested_amount") is not None:
                vesting = Terminating(int(s["terminating_unvested_amount"]))
            lk = Lockup(
                lockup_amount=int(s["lockup_amount"]),
                termination_withdrawn_tokens=int(s.get("termination_withdrawn_tokens", 0)),
                lockup_duration=int(s.get("lockup_duration", 0)),
                release_duration=(
                    int(s["release_duration"]) if s.get("release_duration") is not None else None
                ),
                lockup_timestamp=(
                    int(s["lockup_timestamp"]) if s.get("lockup_timestamp") is not None else None
                ),
                vesting=vesting,
            )
            return str(
                get_locked_amount(
                    lk, int(block_timestamp), is_bug_inside_contract(code_hash or "")
                )
            )
        except (KeyError, ValueError, TypeError):
            return None  # error sentinel, filtered downstream (SURVEY §5)

    return udf(compute, StringType())
