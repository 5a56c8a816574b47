"""L1 lockup math: unit cases from FIXTURES.md F8 (before-cliff /
mid-release / after-end / terminating / buggy-hash) + hypothesis
property tests, + the U4 UDF surface."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from near_public_lakehouse_spark.plans.lockup import (
    TRANSFERS_ENABLED_NS,
    Lockup,
    Terminating,
    VestingSchedule,
    get_locked_amount,
    is_bug_inside_contract,
)

YOCTO = 10**24
DAY_NS = 86_400 * 10**9
T0 = TRANSFERS_ENABLED_NS


def test_fully_locked_before_lockup_timestamp():
    lk = Lockup(lockup_amount=100 * YOCTO, lockup_duration=30 * DAY_NS)
    assert get_locked_amount(lk, T0 + 10 * DAY_NS, False) == 100 * YOCTO


def test_termination_withdrawn_reduces_locked_before_start():
    lk = Lockup(
        lockup_amount=100 * YOCTO,
        termination_withdrawn_tokens=25 * YOCTO,
        lockup_duration=30 * DAY_NS,
    )
    assert get_locked_amount(lk, T0, False) == 75 * YOCTO


def test_linear_release_midpoint():
    lk = Lockup(
        lockup_amount=100 * YOCTO, lockup_duration=0, release_duration=100 * DAY_NS
    )
    # halfway through the release window: exactly half locked (U256 exact)
    assert get_locked_amount(lk, T0 + 50 * DAY_NS, False) == 50 * YOCTO
    # 99.5 days in: 0.5 days of 100 left
    assert get_locked_amount(lk, T0 + 99 * DAY_NS + DAY_NS // 2, False) == YOCTO // 2


def test_everything_released_after_end():
    lk = Lockup(lockup_amount=100 * YOCTO, release_duration=10 * DAY_NS)
    assert get_locked_amount(lk, T0 + 11 * DAY_NS, False) == 0


def test_no_release_duration_means_cliff_unlock():
    lk = Lockup(lockup_amount=100 * YOCTO, lockup_duration=10 * DAY_NS)
    assert get_locked_amount(lk, T0 + 10 * DAY_NS, False) == 0


def test_buggy_contract_releases_from_transfers_date():
    """The bug measures release from transfers-enabled instead of lockup
    end: with lockup_duration=50d and release=100d, at T0+100d the fixed
    contract has 50d left, the buggy one 0 (lockup.rs:121-126)."""
    lk = Lockup(
        lockup_amount=100 * YOCTO,
        lockup_duration=50 * DAY_NS,
        release_duration=100 * DAY_NS,
    )
    t = T0 + 100 * DAY_NS
    assert get_locked_amount(lk, t, has_bug=False) == 50 * YOCTO
    assert get_locked_amount(lk, t, has_bug=True) == 0


def test_vesting_cliff_and_interpolation():
    vs = VestingSchedule(
        start_timestamp=T0, cliff_timestamp=T0 + 25 * DAY_NS, end_timestamp=T0 + 100 * DAY_NS
    )
    lk = Lockup(lockup_amount=100 * YOCTO, vesting=vs)
    # before cliff (lockup window passed, no release_duration -> unreleased=0
    # but everything unvested)
    assert get_locked_amount(lk, T0 + 10 * DAY_NS, False) == 100 * YOCTO
    # mid-vesting at 75% elapsed: 25% unvested
    assert get_locked_amount(lk, T0 + 75 * DAY_NS, False) == 25 * YOCTO
    # after end
    assert get_locked_amount(lk, T0 + 101 * DAY_NS, False) == 0


def test_terminating_vesting_freezes_unvested():
    lk = Lockup(lockup_amount=100 * YOCTO, vesting=Terminating(unvested_amount=33 * YOCTO))
    assert get_locked_amount(lk, T0 + 365 * DAY_NS, False) == 33 * YOCTO


def test_bug_hash_dispatch():
    assert is_bug_inside_contract("3kVY9qcVRoW3B5498SMX6R3rtSLiCdmBzKs7zcnzDJ7Q")
    assert not is_bug_inside_contract("4Pfw2RU6e35dUsHQQoFYfwX8KFFvSRNwMSNLXuSFHXrC")
    assert not is_bug_inside_contract("anything-else")


amounts = st.integers(min_value=0, max_value=(2**127))
durations = st.integers(min_value=1, max_value=10 * 365 * DAY_NS)
offsets = st.integers(min_value=0, max_value=20 * 365 * DAY_NS)


@settings(max_examples=200, deadline=None)
@given(amount=amounts, release=durations, lockup_dur=durations, dt=offsets)
def test_locked_amount_bounded(amount, release, lockup_dur, dt):
    lk = Lockup(lockup_amount=amount, lockup_duration=lockup_dur, release_duration=release)
    locked = get_locked_amount(lk, T0 + dt, False)
    assert 0 <= locked <= amount


@settings(max_examples=100, deadline=None)
@given(amount=amounts, release=durations, t1=offsets, t2=offsets)
def test_locked_amount_monotonic_nonincreasing(amount, release, t1, t2):
    lk = Lockup(lockup_amount=amount, release_duration=release)
    lo, hi = sorted((t1, t2))
    assert get_locked_amount(lk, T0 + hi, False) <= get_locked_amount(lk, T0 + lo, False)


@settings(max_examples=100, deadline=None)
@given(amount=amounts, release=durations, lockup_dur=durations, dt=offsets)
def test_buggy_never_locks_more_than_fixed(amount, release, lockup_dur, dt):
    """Releasing from the earlier (transfers) date can only unlock sooner."""
    lk = Lockup(lockup_amount=amount, lockup_duration=lockup_dur, release_duration=release)
    t = T0 + dt
    assert get_locked_amount(lk, t, True) <= get_locked_amount(lk, t, False)


def test_locked_amount_udf(spark):
    import json

    from near_public_lakehouse_spark.plans.lockup import locked_amount_udf

    state = json.dumps({"lockup_amount": str(100 * YOCTO), "release_duration": str(100 * DAY_NS)})
    df = spark.createDataFrame(
        [
            (state, T0 + 50 * DAY_NS, "other"),
            (state, T0 + 50 * DAY_NS, "3kVY9qcVRoW3B5498SMX6R3rtSLiCdmBzKs7zcnzDJ7Q"),
            ("not json", T0, "other"),
        ],
        "state string, ts long, code_hash string",
    )
    out = df.select(locked_amount_udf()("state", "ts", "code_hash").alias("locked")).collect()
    assert out[0].locked == str(50 * YOCTO)
    assert out[1].locked == str(50 * YOCTO)  # same math, bug only moves start
    assert out[2].locked is None  # error sentinel, not a crash
