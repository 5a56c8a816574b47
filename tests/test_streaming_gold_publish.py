"""Streaming twins of the two batch-only gold publishes (VERDICT r10
task #5): `circulating_supply` (per-day facts parked until their block
dimension arrives) and `near_balances` (daily-latest account state folded
per micro-batch, snapshot published at epoch close). Fold == batch pinned
over >= 3 micro-batches with late rows on both the fact and the
change side.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from near_public_lakehouse_spark.plans import balances as B
import pytest

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane

PROCESSED = "2024-03-05 07:00:00"
YOCTO = 10**24


def _same_rows(a, b):
    return sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _pub_df(spark, table_dir):
    # published tables retain tombstoned part-files on disk — read the
    # live rows through the Delta log, never the raw directory
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    return DeltaLogReader(table_dir).to_df(spark)


def _append_one_file(df, path):
    df.coalesce(1).write.mode("append").parquet(path)


# --- circulating_supply ------------------------------------------------------


def _supply_row(spark, day, height):
    return spark.createDataFrame(
        [(day, height, str(10**33 + height), str(2 * 10**32), str(8 * 10**32), 2, 0)],
        "block_date string, block_height long, total_supply string, "
        "total_locked_supply string, circulating_supply string, "
        "n_lockups long, n_errors long",
    ).withColumn("block_date", F.col("block_date").cast("date"))


def _blocks(spark, heights):
    ns = 1_709_251_200_123_456_789
    return spark.createDataFrame(
        [(h, f"BLK{h}", ns + h * 10**9) for h in heights],
        "block_height long, block_hash string, block_timestamp long",
    )


def test_streaming_supply_folds_to_batch_with_late_block(spark, tmp_path):
    """>= 3 micro-batches; day 3's block row is LATE — its supply row
    parks and publishes only once the block arrives; the drained fold
    equals the batch publish over the full inputs."""
    from near_public_lakehouse_spark.plans.public import (
        public_circulating_supply,
        publish_public_table,
    )
    from near_public_lakehouse_spark.streaming.jobs import (
        flush_pending_supply,
        streaming_public_supply,
    )

    gold_dir = str(tmp_path / "gold_supply")
    for i in range(1, 4):  # three files -> three micro-batches
        _append_one_file(_supply_row(spark, f"2024-03-0{i}", 1000 + i), gold_dir)
    blocks_dir = str(tmp_path / "blocks")
    _blocks(spark, [1001, 1002]).write.parquet(blocks_dir)  # 1003 withheld

    out = str(tmp_path / "stream_pub")
    ckpt = str(tmp_path / "ckpt")
    streaming_public_supply(
        spark, gold_dir, blocks_dir, out, ckpt, PROCESSED, max_files_per_trigger=1
    ).awaitTermination(300)

    early = _pub_df(spark, out + "/circulating_supply")
    assert early.count() == 2  # day 3 parked, not published
    assert (
        spark.read.parquet(os.path.join(ckpt, "pending_supply")).count() == 1
    )

    # the block arrives late; a new day-4 gold row arrives too
    _blocks(spark, [1003, 1004]).coalesce(1).write.mode("append").parquet(blocks_dir)
    _append_one_file(_supply_row(spark, "2024-03-04", 1004), gold_dir)
    streaming_public_supply(
        spark, gold_dir, blocks_dir, out, ckpt, PROCESSED
    ).awaitTermination(300)
    assert flush_pending_supply(spark, gold_dir, blocks_dir, out, ckpt, PROCESSED) == 0

    out_b = str(tmp_path / "batch_pub")
    batch = public_circulating_supply(
        spark.read.parquet(gold_dir), spark.read.parquet(blocks_dir), PROCESSED
    )
    publish_public_table(spark, "circulating_supply", batch, out_b)
    got = _pub_df(spark, out + "/circulating_supply")
    want = _pub_df(spark, out_b + "/circulating_supply")
    assert got.count() == want.count() == 4
    assert _same_rows(got, want)

    # replay drain with no new input is a no-op
    streaming_public_supply(
        spark, gold_dir, blocks_dir, out, ckpt, PROCESSED
    ).awaitTermination(300)
    assert _same_rows(_pub_df(spark, out + "/circulating_supply"), want)


# --- near_balances -----------------------------------------------------------


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        "block_height long, block_date string, affected_account_id string, "
        "nonstaked_balance string, staked_balance string, storage_usage long",
    ).withColumn("block_date", F.col("block_date").cast("date"))


def test_streaming_balances_folds_to_batch_with_late_change(spark, tmp_path):
    """The daily-latest fold over >= 3 micro-batches: a late change row
    with a SUPERSEDED height must not displace the account's latest, a
    late row for a new account must land, and the epoch-close publish
    equals the batch snapshot over the full history."""
    from near_public_lakehouse_spark.plans.public import (
        public_near_balances,
        publish_public_table,
    )
    from near_public_lakehouse_spark.streaming.jobs import (
        publish_balances_epoch,
        streaming_public_balances,
    )

    batches = [
        [(1, "2024-01-01", "whale.near", str(20_000 * YOCTO), "0", 100)],
        [
            (5, "2024-01-02", "whale.near", str(15_000 * YOCTO), "0", 120),
            (2, "2024-01-01", "whale-lock.near", str(10 * YOCTO), "0", 10),
        ],
        # LATE, superseded: h=3 < 5 must not displace whale's latest
        [(3, "2024-01-01", "whale.near", str(99_999 * YOCTO), "0", 110)],
        # LATE, new account: its only row must land in the snapshot
        [(4, "2024-01-02", "late.near", str(30_000 * YOCTO), "0", 50)],
    ]
    changes_dir = str(tmp_path / "changes")
    for rows in batches:
        _append_one_file(_changes(spark, rows), changes_dir)

    full = _changes(spark, [r for b in batches for r in b])
    lockups = spark.createDataFrame(
        [("whale.near", "whale-lock.near")],
        "owner_account_id string, lockup_account_id string",
    )
    amb_dir = str(tmp_path / "amb")
    B.silver_accounts_with_min_balances(full, lockups, nf_accounts=[]).write.parquet(
        amb_dir
    )
    rewards_dir = str(tmp_path / "rewards")
    spark.createDataFrame(
        [
            ("whale.near", "2024-01-02", str(1 * YOCTO), str(2 * YOCTO), str(3 * YOCTO)),
            ("whale-lock.near", "2024-01-02", str(4 * YOCTO), str(5 * YOCTO), str(6 * YOCTO)),
        ],
        "delegator_id string, epoch_date string, unstaked string, staked string, reward string",
    ).withColumn("epoch_date", F.col("epoch_date").cast("date")).write.parquet(
        rewards_dir
    )

    out = str(tmp_path / "stream_pub")
    ckpt = str(tmp_path / "ckpt")
    streaming_public_balances(
        spark, changes_dir, out, ckpt, "2024-01-02", max_files_per_trigger=1
    ).awaitTermination(300)
    # the fold kept one row per account, with the LATEST height winning
    state = spark.read.parquet(os.path.join(ckpt, "balances_state"))
    by_acct = {r.affected_account_id: r.block_height for r in state.collect()}
    assert by_acct == {"whale.near": 5, "whale-lock.near": 2, "late.near": 4}

    publish_balances_epoch(
        spark, ckpt, amb_dir, rewards_dir, out, "2024-01-02", 5, PROCESSED
    )

    out_b = str(tmp_path / "batch_pub")
    snap = B.silver_accounts_daily_ft_balances(
        spark.read.parquet(amb_dir),
        full,
        spark.read.parquet(rewards_dir),
        epoch_date="2024-01-02",
        epoch_block_height=5,
    )
    publish_public_table(
        spark, "near_balances", public_near_balances(snap, PROCESSED), out_b
    )
    got = _pub_df(spark, out + "/near_balances")
    want = _pub_df(spark, out_b + "/near_balances")
    assert got.count() == want.count() > 0
    assert _same_rows(got, want)
    # the superseded late row's balance must not appear anywhere
    assert got.filter(F.col("liquid") == 99_999.0).count() == 0

    # replay drain + republish: idempotent
    streaming_public_balances(
        spark, changes_dir, out, ckpt, "2024-01-02"
    ).awaitTermination(300)
    publish_balances_epoch(
        spark, ckpt, amb_dir, rewards_dir, out, "2024-01-02", 5, PROCESSED
    )
    assert _same_rows(_pub_df(spark, out + "/near_balances"), want)


def test_expire_pending_applies_the_trailing_fence(spark, tmp_path):
    """Parked rows older than the publisher's trailing re-MERGE fence age
    out (the batch pipeline's inner joins drop the same rows); rows
    inside the fence survive and still publish when their dimension
    arrives."""
    from near_public_lakehouse_spark.plans.public import (
        public_circulating_supply,
        publish_public_table,
    )
    from near_public_lakehouse_spark.streaming.jobs import (
        expire_pending_supply,
        flush_pending_supply,
        streaming_public_supply,
    )

    gold_dir = str(tmp_path / "gold_supply")
    # two days' rows whose blocks are BOTH withheld: one falls outside a
    # 3-day fence anchored at 2024-03-10, one stays inside it
    _append_one_file(_supply_row(spark, "2024-03-01", 1001), gold_dir)
    _append_one_file(_supply_row(spark, "2024-03-09", 1009), gold_dir)
    blocks_dir = str(tmp_path / "blocks")
    _blocks(spark, [9999]).write.parquet(blocks_dir)  # matches nothing

    out = str(tmp_path / "pub")
    ckpt = str(tmp_path / "ckpt")
    streaming_public_supply(
        spark, gold_dir, blocks_dir, out, ckpt, PROCESSED, max_files_per_trigger=1
    ).awaitTermination(300)
    assert spark.read.parquet(os.path.join(ckpt, "pending_supply")).count() == 2

    dropped = expire_pending_supply(spark, ckpt, "2024-03-10", fence_days=3)
    assert dropped == 1
    pending = spark.read.parquet(os.path.join(ckpt, "pending_supply"))
    assert [str(r.block_date) for r in pending.collect()] == ["2024-03-09"]

    # the surviving row's block arrives -> it still publishes
    _blocks(spark, [1009]).coalesce(1).write.mode("append").parquet(blocks_dir)
    assert flush_pending_supply(spark, gold_dir, blocks_dir, out, ckpt, PROCESSED) == 0
    got = _pub_df(spark, out + "/circulating_supply")
    assert [str(r.block_date) for r in got.collect()] == ["2024-03-09"]

    # idempotent: nothing left outside the fence
    assert expire_pending_supply(spark, ckpt, "2024-03-10", fence_days=3) == 0
