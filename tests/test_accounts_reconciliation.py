"""Deleted-account reconciliation storm test (VERDICT r8 task #8).

The reference exposes account liveness two ways that must agree:
- the BQ `accounts` VIEW: latest CREATE_ACCOUNT/DELETE_ACCOUNT/TRANSFER
  action per account via row_number() DESC, `is_active = NOT
  (action_kind = 'DELETE_ACCOUNT')` (BQ Writer Views & Data
  Dictionary.py:363-388);
- the SCD1-maintained `silver_accounts` (APPLY CHANGES keyed on
  account_id, SEQUENCE BY block_timestamp — SCD tables.sql:14-39).

The edge cases that were never storm-tested: RE-CREATED accounts
(create -> delete -> create), deletes arriving BEFORE their creates
(out-of-order batches), and replayed batches. Property: for ANY event
history split into ANY batch arrival order, the folded SCD1 state equals
the view semantics over the full history — per account, the
max-timestamp event decides is_active and last_action_kind.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators.scd import apply_changes

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane


KINDS = ["CREATE_ACCOUNT", "DELETE_ACCOUNT", "TRANSFER"]

CHANGE_SCHEMA = (
    "block_date date, block_timestamp long, block_timestamp_utc timestamp, "
    "block_height long, block_hash string, account_id string, "
    "is_active boolean, last_action_kind string, last_receipt_id string"
)


def _random_history(rng: random.Random, n_accounts: int, n_events: int):
    """Events with globally unique timestamps (the view's ORDER BY has no
    tiebreak, so real pipelines rely on timestamp uniqueness per account;
    unique global ts keeps the property well-defined)."""
    events = []
    ts_pool = rng.sample(range(1, 10_000_000), n_events)
    for i in range(n_events):
        acct = f"acct{rng.randrange(n_accounts)}.near"
        kind = rng.choice(KINDS)
        ts = 1_700_000_000_000_000_000 + ts_pool[i] * 1_000_000_000
        events.append((acct, kind, ts, f"RCPT{i:06d}"))
    return events


def _changes_df(spark, events):
    rows = [
        (
            None,  # block_date — not part of the liveness contract
            ts,
            None,
            ts // 1_000_000_000,
            f"BLK{ts}",
            acct,
            kind != "DELETE_ACCOUNT",
            kind,
            rcpt,
        )
        for acct, kind, ts, rcpt in events
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _view_semantics(spark, events):
    """The BQ view recomputed independently: latest event per account."""
    df = _changes_df(spark, events)
    w = Window.partitionBy("account_id").orderBy(F.desc("block_timestamp"))
    return {
        (r.account_id, r.is_active, r.last_action_kind)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }


def _scd_state(spark, path):
    return {
        (r.account_id, r.is_active, r.last_action_kind)
        for r in spark.read.parquet(path).collect()
    }


@pytest.mark.parametrize("seed", [11, 23, 47, 101])
def test_storm_batches_converge_to_view_semantics(spark, tmp_path, seed):
    """Random create/delete/transfer storms, shuffled into random batch
    arrival order (deletes can precede their creates across batches),
    one batch replayed: the SCD1 fold equals the view answer."""
    rng = random.Random(seed)
    events = _random_history(rng, n_accounts=12, n_events=120)
    want = _view_semantics(spark, events)

    arrival = events[:]
    rng.shuffle(arrival)  # arrival order decoupled from event time
    n_batches = rng.randrange(3, 7)
    batches = [arrival[i::n_batches] for i in range(n_batches)]
    path = str(tmp_path / "silver_accounts")
    for b in batches:
        apply_changes(spark, path, _changes_df(spark, b), ["account_id"], "block_timestamp")
    # replay an arbitrary earlier batch — APPLY CHANGES must be idempotent
    apply_changes(
        spark, path, _changes_df(spark, rng.choice(batches)), ["account_id"], "block_timestamp"
    )
    assert _scd_state(spark, path) == want


def test_recreated_account_comes_back_active(spark, tmp_path):
    """The specific reference edge case: create -> delete -> re-create,
    with the DELETE arriving LAST (out of order). Liveness must follow
    event time, not arrival time."""
    t0 = 1_700_000_000_000_000_000
    create1 = ("phoenix.near", "CREATE_ACCOUNT", t0 + 1_000_000_000, "R1")
    delete = ("phoenix.near", "DELETE_ACCOUNT", t0 + 2_000_000_000, "R2")
    create2 = ("phoenix.near", "CREATE_ACCOUNT", t0 + 3_000_000_000, "R3")
    path = str(tmp_path / "acc")
    for batch in ([create1], [create2], [delete]):  # delete arrives last
        apply_changes(spark, path, _changes_df(spark, batch), ["account_id"], "block_timestamp")
    state = _scd_state(spark, path)
    assert state == {("phoenix.near", True, "CREATE_ACCOUNT")}
    # and the tombstone alone (no later event) reads inactive
    path2 = str(tmp_path / "acc2")
    for batch in ([create2], [create1], [("phoenix.near", "DELETE_ACCOUNT", t0 + 4_000_000_000, "R4")]):
        apply_changes(spark, path2, _changes_df(spark, batch), ["account_id"], "block_timestamp")
    assert _scd_state(spark, path2) == {("phoenix.near", False, "DELETE_ACCOUNT")}


def test_view_and_scd_agree_on_fixture_pipeline(spark, tmp_path_factory):
    """End-to-end on the NEAR fixtures: the accounts view computed from
    receipt actions agrees with the pipeline's SCD1 silver_accounts on
    (account_id, is_active) for every account the receipt side feeds."""
    from near_public_lakehouse_spark.plans.pipeline import run_batch
    from near_public_lakehouse_spark.plans.scd_tables import accounts_changes
    from near_public_lakehouse_spark.sources.fixtures import generate_fixtures

    raw = tmp_path_factory.mktemp("rec_raw")
    out = tmp_path_factory.mktemp("rec_out")
    generate_fixtures(str(raw), n_blocks=40)
    pipe = run_batch(spark, str(raw), str(out))

    ara = pipe.read("silver_action_receipt_actions")
    changes = accounts_changes(ara)
    w = Window.partitionBy("account_id").orderBy(F.desc("block_timestamp"))
    view = {
        (r.account_id, r.is_active)
        for r in changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    scd = {
        (r.account_id, r.is_active) for r in pipe.read("silver_accounts").collect()
    }
    assert view == scd and len(view) > 0
