"""The published ``public_lakehouse`` consumer tables (NB NEAR Public
Datasets.py — VERDICT r8 task #2), built as pipeline nodes over the
fixture silver layer and golden-checked against independent DuckDB
recomputation of the reference SQL.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane


PROCESSED = "2024-03-05 07:00:00"


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    from near_public_lakehouse_spark.plans.pipeline import build_pipeline
    from near_public_lakehouse_spark.sources.fixtures import generate_fixtures
    from near_public_lakehouse_spark.sources.json_stream import (
        read_blocks,
        read_shards,
    )

    raw = tmp_path_factory.mktemp("pub_raw")
    out = tmp_path_factory.mktemp("pub_out")
    generate_fixtures(str(raw), n_blocks=60, n_shards=2)
    p = build_pipeline(spark, str(out), processed_time=PROCESSED)
    p.run_batch(
        {
            "raw_blocks": read_blocks(spark, str(raw)),
            "raw_shards": read_shards(spark, str(raw)),
        }
    )
    return p


def _scan(pipe, name: str) -> str:
    return f"parquet_scan('{pipe.path(name)}/*/*.parquet', hive_partitioning=1)"


def _scan_flat(pipe, name: str) -> str:
    return f"parquet_scan('{pipe.path(name)}/*.parquet')"


# --- block_chunks -----------------------------------------------------------


def test_block_chunks_matches_duckdb(pipe):
    got = {
        (str(r.date), r.height, r.hash, r.chunk_hash, r.total_supply, r.shard_id)
        for r in pipe.read("public_block_chunks").collect()
    }
    con = duckdb.connect()
    expected = con.execute(
        f"""
        SELECT c.block_date, b.block_height, b.block_hash, c.chunk_hash,
               b.total_supply, c.shard_id
        FROM {_scan(pipe, 'silver_chunks')} c
        JOIN {_scan(pipe, 'silver_blocks')} b
          ON c.block_hash = b.block_hash AND c.block_date = b.block_date
        """
    ).fetchall()
    assert got == {(str(d), h, bh, ch, ts, s) for d, h, bh, ch, ts, s in expected}
    assert len(got) == pipe.read("silver_chunks").count()  # denorm is 1:1


def test_block_chunks_schema_and_stamp(pipe):
    bc = pipe.read("public_block_chunks")
    assert set(bc.columns) == {
        "date", "height", "time", "hash", "prev_hash", "total_supply",
        "gas_price", "author_account_id", "epoch_id", "shard_id",
        "chunk_hash", "chunk_signature", "chunk_gas_limit", "chunk_gas_used",
        "chunk_author_account_id", "_processed_time",
    }
    assert bc.filter(F.col("chunk_signature").isNull()).count() == 0
    stamp = bc.select("_processed_time").distinct().collect()
    assert len(stamp) == 1 and str(stamp[0][0]) == PROCESSED


# --- actions ----------------------------------------------------------------


def test_actions_5way_denorm_matches_duckdb(pipe):
    """The flagship table: ra⋈r⋈o⋈eo⋈t(⋈b) row set and the transaction /
    outcome attributes, recomputed in DuckDB from the silver parquet."""
    a = pipe.read("public_actions")
    got = {
        (
            str(r.block_date), r.receipt_id, r.index_in_action_receipt,
            r.chunk_hash, r.tx_hash, r.tx_from, r.tx_status,
            r.execution_status, r.action_kind, r.gas_price,
        )
        for r in a.collect()
    }
    con = duckdb.connect()
    expected = con.execute(
        f"""
        SELECT ra.block_date, ra.receipt_id, ra.index_in_action_receipt,
               r.chunk_hash, o.originated_from_transaction_hash,
               t.signer_account_id, t.status, eo.status, ra.action_kind,
               b.gas_price
        FROM {_scan(pipe, 'silver_action_receipt_actions')} ra
        JOIN {_scan(pipe, 'silver_receipts')} r
          ON r.receipt_id = ra.receipt_id AND r.block_date = ra.block_date
        JOIN {_scan(pipe, 'silver_receipt_originated_from_transaction')} o
          ON ra.receipt_id = o.receipt_id AND ra.block_date = o.block_date
          AND o.originated_from_transaction_hash <> ''
        JOIN {_scan(pipe, 'silver_execution_outcomes')} eo
          ON eo.receipt_id = ra.receipt_id
        JOIN {_scan(pipe, 'silver_transactions')} t
          ON t.transaction_hash = o.originated_from_transaction_hash
        JOIN {_scan(pipe, 'silver_blocks')} b
          ON b.block_hash = ra.block_hash AND b.block_date = ra.block_date
        """
    ).fetchall()
    assert got == {
        (str(d), rid, idx, ch, tx, s, ts, es, k, gp)
        for d, rid, idx, ch, tx, s, ts, es, k, gp in expected
    }
    assert len(got) > 0


def test_actions_per_kind_struct_decode(pipe):
    """Per-kind decode (NB NEAR Public Datasets.py:137-146): exactly the
    matching struct member is non-null, values come from the raw args."""
    a = pipe.read("public_actions")
    rows = a.select("action_kind", "action").collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.action_kind, []).append(r.action)

    t = by_kind["TRANSFER"][0]
    assert t.transfer.deposit == "1000000000000000000000000"
    assert t.stake is None and t.add_key is None

    s = by_kind["STAKE"][0]
    assert s.stake.stake == "5000000000000000000000000"
    assert s.stake.public_key == "ed25519:pkstake"

    ak = [x for x in by_kind["ADD_KEY"] if x.add_key.access_key.permission == "FullAccess"]
    assert ak and ak[0].add_key.public_key == "ed25519:pkfull"
    fc_perm = [x for x in by_kind["ADD_KEY"] if x.add_key.access_key.permission != "FullAccess"]
    assert fc_perm and "FunctionCall" in fc_perm[0].add_key.access_key.permission

    dk = by_kind["DELETE_KEY"][0]
    assert dk.delete_key.public_key == "ed25519:pkfull"
    da = by_kind["DELETE_ACCOUNT"][0]
    assert da.delete_account.beneficiary_id == "alice.near"

    dc = by_kind["DEPLOY_CONTRACT"][0]
    # lower(hex(unbase64('Y29kZQ=='))) = hex('code')
    assert dc.deploy_contract.code_sha256 == "636f6465"

    dl = by_kind["DELEGATE_ACTION"][0]
    assert dl.delegate.delegate_action.receiver_id == "bob.near"
    assert dl.delegate.signature == "sigdel"

    fc = by_kind["FUNCTION_CALL"][0]
    assert fc.function_call.call.method_name is not None
    assert fc.function_call.call.gas > 0
    # args_parsed is the decoded base64 payload
    assert fc.function_call.args_parsed.startswith("{")


def test_actions_delegate_flag_and_readme_query(pipe):
    a = pipe.read("public_actions")
    assert (
        a.filter(F.col("is_delegate_action") != (F.col("action_kind") == "DELEGATE_ACTION")).count()
        == 0
    )

    # The README example query (README.md:48-61) re-expressed over the
    # published `actions` table must equal the silver-view answer.
    from near_public_lakehouse_spark.plans.views import (
        daily_unique_signers_of_contract,
    )

    over_actions = (
        a.filter(
            (F.col("action_kind") == "FUNCTION_CALL")
            & (F.col("receipt_receiver_account_id") == "ft.near")
        )
        .groupBy("block_date")
        .agg(F.countDistinct("tx_from").alias("n_unique_signers"))
    )
    via_views = daily_unique_signers_of_contract(
        pipe.read("silver_receipts"),
        pipe.read("silver_action_receipt_actions"),
        "ft.near",
    )
    got = {(str(r.block_date), r.n_unique_signers) for r in over_actions.collect()}
    want = {(str(r.block_date), r.n_unique_signers) for r in via_views.collect()}
    assert got == want and len(got) >= 2


# --- logs -------------------------------------------------------------------


def test_logs_event_json_split_matches_duckdb(pipe):
    got = {
        (r.receipt_id, r.index_in_execution_outcome_logs, r.log, r.event)
        for r in pipe.read("public_logs").collect()
    }
    con = duckdb.connect()
    expected = con.execute(
        f"""
        SELECT receipt_id, index_in_execution_outcome_logs, log,
               CASE WHEN starts_with(log, 'EVENT_JSON:') THEN log[12:] END
        FROM {_scan(pipe, 'silver_execution_outcome_logs')}
        """
    ).fetchall()
    assert got == set(map(tuple, expected))
    assert any(e is not None for *_, e in got)  # EVENT_JSON rows decoded


def test_logs_event_prefix_requires_colon(spark):
    """NEP-297's prefix is 'EVENT_JSON:' (11 chars). The extractor skips
    11 chars, so the predicate must verify the colon too — a log like
    'EVENT_JSONIC ...' previously produced a garbage non-null event
    (r13 review)."""
    from near_public_lakehouse_spark.plans.public import public_logs

    rows = [
        ("EVENT_JSON:{\"standard\":\"x\"}", "{\"standard\":\"x\"}"),
        ("EVENT_JSONIC standard test", None),
        ("EVENT_JSON", None),
        ("plain log line", None),
    ]
    df = spark.createDataFrame(
        [
            ("2024-03-05", 1, "2024-03-05 07:00:00", "SUCCESS", "a.near",
             f"r{i}", 0, log)
            for i, (log, _) in enumerate(rows)
        ],
        "block_date string, block_height long, block_timestamp_utc string, "
        "status string, executor_account_id string, receipt_id string, "
        "index_in_execution_outcome_logs int, log string",
    )
    got = {
        r.log: r.event
        for r in public_logs(df, "2024-03-05 07:00:00").collect()
    }
    assert got == dict(rows)


# --- ft / nft transfers -----------------------------------------------------


def test_ft_transfers_projection(pipe):
    ft = pipe.read("public_ft_transfers")
    assert {
        "block_date", "block_height", "block_time", "block_hash", "chunk_hash",
        "shard_id", "standard", "token_id", "receipt_id", "contract_account_id",
        "cause", "status", "event_memo", "event_index", "affected_account_id",
        "involved_account_id", "delta_amount", "_processed_time",
    } == set(ft.columns)
    silver = pipe.read("silver_execution_outcome_ft_event_logs")
    assert ft.count() == silver.count()
    assert ft.select("standard").distinct().collect()[0][0] == "nep141"
    assert ft.select("token_id").distinct().collect()[0][0] == "near"
    assert ft.filter(F.col("chunk_hash").isNull() | F.col("shard_id").isNull()).count() == 0


def test_nft_transfers_owner_names(pipe):
    nft = pipe.read("public_nft_transfers")
    assert {"old_owner_account_id", "new_owner_account_id", "authorized_account_id"} <= set(
        nft.columns
    )
    xfer = nft.filter(F.col("cause") == "nft_transfer")
    assert xfer.count() > 0
    assert xfer.filter(F.col("old_owner_account_id").isNull()).count() == 0
    assert xfer.filter(F.col("new_owner_account_id").isNull()).count() == 0


# --- publication semantics ---------------------------------------------------


def test_republish_is_idempotent(pipe, spark, tmp_path):
    """Insert-only MERGE on the natural key: publishing the same window
    twice (the reference reruns hourly over trailing windows) adds no
    rows; a genuinely new row lands."""
    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    publish_public_table(spark, "logs", df, out)
    n1 = _delta_df(spark, out + "/logs").count()
    publish_public_table(spark, "logs", df, out)  # same window again
    n2 = _delta_df(spark, out + "/logs").count()
    assert n1 == n2 == df.count()
    extra = df.limit(1).withColumn("receipt_id", F.lit("NEWRCPT"))
    publish_public_table(spark, "logs", extra, out)
    assert _delta_df(spark, out + "/logs").count() == n1 + 1


def test_trailing_fence_bounds_the_window(pipe, spark):
    """The as_of fence (block_date >= as_of - N days) keeps a publish run
    to trailing partitions — the reference's late-arrival re-MERGE."""
    from near_public_lakehouse_spark.plans.public import public_logs

    all_rows = pipe.read("silver_execution_outcome_logs")
    dates = sorted(
        str(r.block_date) for r in all_rows.select("block_date").distinct().collect()
    )
    assert len(dates) >= 2
    fenced = public_logs(all_rows, PROCESSED, as_of=dates[-1])
    got = {str(r.block_date) for r in fenced.select("block_date").distinct().collect()}
    assert got == {d for d in dates if d >= dates[-2]}  # 1-day trailing window


# --- circulating_supply / near_balances --------------------------------------


def test_circulating_supply_projection_ns_exact(spark):
    """The published timestamp converts ns -> µs by exact integer
    floordiv (never `/` on ns BIGINTs); hash/height resolve via the
    silver_blocks equi-join."""
    from near_public_lakehouse_spark.plans.public import public_circulating_supply

    ns = 1_709_251_200_123_456_789  # sub-µs tail must truncate, not round
    gold = spark.createDataFrame(
        [("2024-03-01", 1000, str(10**33), str(2 * 10**32), str(8 * 10**32), 2, 0)],
        "block_date string, block_height long, total_supply string, "
        "total_locked_supply string, circulating_supply string, "
        "n_lockups long, n_errors long",
    ).withColumn("block_date", F.col("block_date").cast("date"))
    blocks = spark.createDataFrame(
        [(1000, "BLKHASH", ns), (1001, "OTHER", ns + 10**9)],
        "block_height long, block_hash string, block_timestamp long",
    )
    rows = public_circulating_supply(gold, blocks, PROCESSED).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.computed_at_block_hash == "BLKHASH"
    assert r.computed_at_block_height == 1000
    assert r.circulating_tokens_supply == str(8 * 10**32)
    assert r.total_tokens_supply == str(10**33)
    import datetime

    micros = ns // 1_000
    want = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc) + datetime.timedelta(
        microseconds=micros
    )
    assert r.computed_at_block_timestamp.replace(tzinfo=datetime.timezone.utc) == want


def test_near_balances_projection_types(spark):
    """Published snapshot: typed epoch keys, exact yocto STRINGS kept,
    display-only nonstaked_balance dropped."""
    from near_public_lakehouse_spark.plans.public import public_near_balances

    YOCTO = 10**24
    daily = spark.createDataFrame(
        [
            (
                "2024-01-02", 2, "whale.near", 15000.0, str(15_000 * YOCTO), 120,
                str(YOCTO), str(2 * YOCTO), str(3 * YOCTO),
                "whale-lock.near", 777.25, str(4 * YOCTO), str(5 * YOCTO), str(6 * YOCTO),
            )
        ],
        "epoch_date string, epoch_block_height int, account_id string, "
        "liquid double, nonstaked_balance string, storage_usage long, "
        "unstaked_not_liquid string, staked string, reward string, "
        "lockup_account_id string, lockup_liquid double, "
        "lockup_unstaked_not_liquid string, "
        "lockup_staked string, lockup_reward string",
    )
    out = public_near_balances(daily, PROCESSED)
    assert "nonstaked_balance" not in out.columns
    assert dict(out.dtypes)["epoch_date"] == "date"
    assert dict(out.dtypes)["epoch_block_height"] == "bigint"
    # reference column order: lockup_liquid sits between lockup_account_id
    # and lockup_unstaked_not_liquid (NEAR Public Datasets.py:367-369)
    cols = out.columns
    assert cols.index("lockup_liquid") == cols.index("lockup_account_id") + 1
    assert cols.index("lockup_unstaked_not_liquid") == cols.index("lockup_liquid") + 1
    r = out.collect()[0]
    assert r.staked == str(2 * YOCTO) and r.lockup_reward == str(6 * YOCTO)
    assert r.lockup_liquid == 777.25
    assert str(r._processed_time) == PROCESSED


def test_streaming_publish_equals_batch_publish(pipe, spark, tmp_path):
    """The live-publish twin: streaming the silver logs table through
    the same projection + insert-only MERGE (forced multi-batch, then a
    replay drain) folds to exactly the batch publish."""
    from near_public_lakehouse_spark.plans.public import (
        public_logs,
        publish_public_table,
    )
    from near_public_lakehouse_spark.streaming.jobs import streaming_public_table

    silver_path = pipe.path("silver_execution_outcome_logs")
    out_s = str(tmp_path / "stream_pub")
    streaming_public_table(
        spark, silver_path, "logs", public_logs, out_s,
        str(tmp_path / "ckpt"), PROCESSED, max_files_per_trigger=1,
    ).awaitTermination(180)
    # replay drain: nothing new -> nothing changes
    streaming_public_table(
        spark, silver_path, "logs", public_logs, out_s,
        str(tmp_path / "ckpt"), PROCESSED,
    ).awaitTermination(60)

    out_b = str(tmp_path / "batch_pub")
    publish_public_table(
        spark, "logs", public_logs(pipe.read("silver_execution_outcome_logs"), PROCESSED), out_b
    )
    got = {tuple(r) for r in _delta_df(spark, out_s + "/logs").collect()}
    want = {tuple(r) for r in _delta_df(spark, out_b + "/logs").collect()}
    assert got == want and len(got) > 0


# --- Delta + Avro publication (VERDICT r9 task #2) ---------------------------
# The reference's public dataset is Delta + hourly Avro copies
# (NEAR Public Datasets.py:48 and :392-437). Every publish commits a
# `_delta_log` version; round-trips go through the INDEPENDENT protocol
# reader (operators/delta_reader.DeltaLogReader), not the writer's own
# replay helper.


def _delta_df(spark, table_dir):
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    return DeltaLogReader(table_dir).to_df(spark)


def _same_rows(a, b):
    return sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_publish_delta_log_roundtrip_and_checkpoint(pipe, spark, tmp_path):
    """publish -> `_delta_log` commit per publish; the independent Delta
    reader returns the expected live rows across 11 MERGE versions,
    including through the 10-commit classic checkpoint — while the
    DIRECTORY holds strictly more files than the snapshot (superseded
    part-files are retained as tombstones for time travel, VERDICT r11
    task #1), so the raw parquet read over-counts and the log is the only
    correct read path."""
    import os

    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    publish_public_table(spark, "logs", df, out)  # v0: initial full write
    assert os.path.exists(f"{table}/_delta_log/{0:020d}.json")
    assert _same_rows(_delta_df(spark, table), spark.read.parquet(table))

    base = df.limit(1)
    for i in range(1, 11):  # v1..v10 — v10 crosses the checkpoint cadence
        extra = base.withColumn("receipt_id", F.lit(f"NEWRCPT{i}"))
        publish_public_table(spark, "logs", extra, out)
        assert os.path.exists(f"{table}/_delta_log/{i:020d}.json")
    assert os.path.exists(f"{table}/_delta_log/{10:020d}.checkpoint.parquet")
    assert os.path.exists(f"{table}/_delta_log/_last_checkpoint")

    delta_read = _delta_df(spark, table)
    assert delta_read.count() == df.count() + 10
    pq_read = spark.read.parquet(table)
    assert delta_read.columns == pq_read.columns
    assert dict(delta_read.dtypes)["block_date"] == "date"  # partition col typed
    # retention: each republish of the touched partition left the
    # superseded part-files on disk as tombstones
    assert pq_read.count() > delta_read.count()

    # idempotent republish of an already-landed window: the MERGE rewrites
    # the touched partitions (new file names), the log records the
    # add/remove diff, rows stay identical through the reader
    publish_public_table(spark, "logs", base.withColumn("receipt_id", F.lit("NEWRCPT1")), out)
    assert _delta_df(spark, table).count() == df.count() + 10


def test_unpartitioned_publish_delta_log_survives_swap(spark, tmp_path):
    """circulating_supply publishes unpartitioned: every MERGE is a full
    rewrite whose superseded files tombstone in place — two versions,
    reader returns exactly the live rows while the dir keeps v0's file."""
    import os

    from near_public_lakehouse_spark.plans.public import publish_public_table

    def supply(*days):
        return spark.createDataFrame(
            [(d, f"HASH{d}", str(10**33 + i), PROCESSED) for i, d in enumerate(days)],
            "block_date string, computed_at_block_hash string, "
            "circulating_supply string, _processed_time string",
        ).select(
            F.col("block_date").cast("date").alias("block_date"),
            "computed_at_block_hash",
            "circulating_supply",
            F.col("_processed_time").cast("timestamp").alias("_processed_time"),
        )

    out = str(tmp_path / "pub")
    table = out + "/circulating_supply"
    publish_public_table(spark, "circulating_supply", supply("2024-03-01"), out)
    # second publish does the unpartitioned park/install swap
    publish_public_table(
        spark, "circulating_supply", supply("2024-03-01", "2024-03-02"), out
    )
    assert os.path.exists(f"{table}/_delta_log/{0:020d}.json")
    assert os.path.exists(f"{table}/_delta_log/{1:020d}.json")
    assert _delta_df(spark, table).count() == 2
    # the v0 file stays on disk as a tombstone (raw read over-counts)
    assert spark.read.parquet(table).count() == 3


def test_export_public_avro_copies(pipe, spark, tmp_path):
    """The hourly avro pass (delta_to_avro, Datasets.py:392-437): the
    `_processed_time == window` slice of each published table lands under
    avro/{table}/{Y/m/d/H}; real OCF bytes read back row-identical; empty
    slices write nothing and return None."""
    from near_public_lakehouse_spark.operators.export import read_export
    from near_public_lakehouse_spark.plans.public import (
        export_public_avro,
        publish_public_table,
    )

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    publish_public_table(spark, "logs", df, out)

    folder = export_public_avro(spark, "logs", out, PROCESSED)
    assert folder is not None and folder.endswith("/avro/logs/2024/03/05/07")
    back = read_export(spark, folder, "avro")
    assert back.count() == df.count()
    got = {(str(r.block_date), r.receipt_id, r.index_in_execution_outcome_logs) for r in back.collect()}
    want = {(str(r.block_date), r.receipt_id, r.index_in_execution_outcome_logs) for r in df.collect()}
    assert got == want

    # a window with no published rows: no folder, no files
    assert export_public_avro(spark, "logs", out, "2030-01-01 00:00:00") is None


def test_export_public_avro_all_skips_unpublished_tables(pipe, spark, tmp_path):
    """A deployment that has only published SOME tables (supported: the
    per-table streaming entry points) must still get its hourly avro
    copies — unpublished tables skip like empty slices instead of
    aborting the whole pass with FileNotFoundError (r13 review)."""
    from near_public_lakehouse_spark.plans.public import (
        PUBLIC_TABLE_KEYS,
        export_public_avro_all,
        publish_public_table,
    )

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    publish_public_table(spark, "logs", df, out)
    res = export_public_avro_all(spark, out, PROCESSED)
    assert set(res) == set(PUBLIC_TABLE_KEYS)
    assert res["logs"] is not None
    assert all(v is None for k, v in res.items() if k != "logs")


def test_export_avro_slice_exact_after_second_publish(pipe, spark, tmp_path):
    """The r13 two-pass slice read (file discovery via a column-pruned
    scan, then a paths-restricted read) must stay EXACT when a LATER
    publish rewrites partitions — slice rows then live in files added by
    the newer commit, mixed with newer rows."""
    from near_public_lakehouse_spark.operators.export import read_export
    from near_public_lakehouse_spark.plans.public import (
        export_public_avro,
        publish_public_table,
    )

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    publish_public_table(spark, "logs", df, out)  # slice @PROCESSED
    later = "2024-03-05 08:00:00"
    publish_public_table(
        spark,
        "logs",
        df.limit(2).withColumn(
            "_processed_time", F.lit(later).cast("timestamp")
        ),
        out,
    )  # partition rewrite: PROCESSED rows now live in the NEW files

    folder = export_public_avro(spark, "logs", out, PROCESSED)
    back = read_export(spark, folder, "avro")
    # insert-only merge: every original row still carries PROCESSED
    assert back.count() == df.count()
    f2 = export_public_avro(spark, "logs", out, later)
    assert f2 is None or read_export(spark, f2, "avro").count() <= 2


def test_streaming_actions_folds_to_batch_with_late_dims(pipe, spark, tmp_path):
    """The flagship 5-way actions denorm as a live fold (VERDICT r9 #5):
    the fact table streams in >= 3 micro-batches while a dimension
    (transactions) is INCOMPLETE; unmatched facts park, the withheld
    dimension rows arrive later, and the drained fold equals the batch
    publish over the full inputs — out-of-order arrival on the dim side
    never loses a fact row."""
    import os
    import shutil

    from near_public_lakehouse_spark.plans.public import (
        public_actions,
        publish_public_table,
    )
    from near_public_lakehouse_spark.streaming.jobs import (
        ACTIONS_DIMS,
        ACTIONS_FACT,
        flush_pending_actions,
        streaming_public_actions,
    )

    paths = {n: pipe.path(n) for n in (ACTIONS_FACT, *ACTIONS_DIMS)}
    fact_files = [
        f
        for _, _, files in os.walk(paths[ACTIONS_FACT])
        for f in files
        if f.endswith(".parquet")
    ]
    assert len(fact_files) >= 3  # maxFilesPerTrigger=1 -> >= 3 micro-batches

    # withhold half the transactions: their dependent facts must PARK
    tx = spark.read.parquet(paths["silver_transactions"])
    hashes = sorted(r.transaction_hash for r in tx.select("transaction_hash").collect())
    assert len(hashes) >= 4
    withheld = set(hashes[:: 2])
    dim_dir = str(tmp_path / "tx_dim")
    tx.filter(~F.col("transaction_hash").isin(list(withheld))).write.parquet(dim_dir)
    silver_paths = dict(paths, silver_transactions=dim_dir)

    out = str(tmp_path / "stream_pub")
    ckpt = str(tmp_path / "ckpt")
    streaming_public_actions(
        spark, silver_paths, out, ckpt, PROCESSED, max_files_per_trigger=1
    ).awaitTermination(300)

    published_early = _delta_df(spark, out + "/actions")
    n_parked = spark.read.parquet(os.path.join(ckpt, "pending_facts")).count()
    assert n_parked > 0  # the withheld dimension really parked facts
    assert published_early.filter(F.col("tx_hash").isin(list(withheld))).count() == 0

    # the withheld dimension rows ARRIVE (late): append them to the dim dir
    late_dir = str(tmp_path / "tx_late")
    tx.filter(F.col("transaction_hash").isin(list(withheld))).write.parquet(late_dir)
    for f in os.listdir(late_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(late_dir, f), os.path.join(dim_dir, "late-" + f))

    # a replay drain with no new fact files is a no-op...
    streaming_public_actions(
        spark, silver_paths, out, ckpt, PROCESSED
    ).awaitTermination(120)
    # ...the flush retries the parked facts against the now-complete dims.
    # What remains pending is EXACTLY the facts with no origins row at all
    # in the silver layer: the batch pipeline silently inner-join-drops
    # them, the stream keeps waiting (late vs never is undecidable without
    # a fence policy) — they must not leak into the published table.
    still_waiting = flush_pending_actions(spark, silver_paths, out, ckpt, PROCESSED)
    orphans = (
        pipe.read(ACTIONS_FACT)
        .join(
            pipe.read("silver_receipt_originated_from_transaction").select(
                "block_date", "receipt_id"
            ),
            ["block_date", "receipt_id"],
            "left_anti",
        )
        .count()
    )
    assert still_waiting == orphans > 0

    out_b = str(tmp_path / "batch_pub")
    batch = public_actions(
        pipe.read(ACTIONS_FACT),
        pipe.read("silver_receipts"),
        pipe.read("silver_receipt_originated_from_transaction"),
        pipe.read("silver_execution_outcomes"),
        pipe.read("silver_transactions"),
        pipe.read("silver_blocks"),
        PROCESSED,
    )
    publish_public_table(spark, "actions", batch, out_b)
    got = {tuple(map(str, r)) for r in _delta_df(spark, out + "/actions").collect()}
    want = {tuple(map(str, r)) for r in _delta_df(spark, out_b + "/actions").collect()}
    assert len(got) == len(want) > 0
    assert got == want


# --- publish crash-safety: log-authoritative transactionality ----------------
# The live state is defined by `_delta_log`, and the merge installs new
# part-files IN PLACE without touching existing ones — so a crash at ANY
# point before the sync commit publishes NOTHING: readers keep seeing the
# pre-crash snapshot, the rerun is idempotent, and the crashed attempt's
# files are unreferenced orphans that vacuum sweeps. (This replaced the
# r10 intent-marker protocol, which existed because the old swap mutated
# the directory before the log caught up.)


def test_publish_crash_between_merge_and_sync_is_transactional(
    pipe, spark, tmp_path, monkeypatch
):
    import os

    from near_public_lakehouse_spark.operators import delta_export as dx
    from near_public_lakehouse_spark.operators.delta_export import (
        vacuum_delta_table,
    )
    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    publish_public_table(spark, "logs", df, out)  # healthy v0
    pre_crash = sorted(map(tuple, _delta_df(spark, table).collect()))

    # crash AFTER the merge installed its new part-files, BEFORE the sync
    base = df.limit(1)
    crash_win = base.withColumn("receipt_id", F.lit("CRASHROW"))
    real_sync = dx.sync_delta_log_from_dir
    monkeypatch.setattr(
        dx,
        "sync_delta_log_from_dir",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("simulated crash")),
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        publish_public_table(spark, "logs", crash_win, out)
    monkeypatch.setattr(dx, "sync_delta_log_from_dir", real_sync)

    # nothing published: the reader still returns the pre-crash snapshot;
    # the crashed attempt's files sit in the dir as unreferenced orphans
    assert sorted(map(tuple, _delta_df(spark, table).collect())) == pre_crash
    assert (
        spark.read.parquet(table)
        .filter(F.col("receipt_id") == "CRASHROW")
        .count()
        == 1  # orphan bytes on disk...
    )
    assert (
        _delta_df(spark, table).filter(F.col("receipt_id") == "CRASHROW").count()
        == 0  # ...invisible through the log
    )

    # the RERUN of the same window is idempotent and lands the row;
    # publishes of other windows never needed repair
    publish_public_table(spark, "logs", crash_win, out)
    other_win = (
        base.withColumn("receipt_id", F.lit("OTHERWIN"))
        .withColumn("block_date", F.date_add("block_date", 1))
    )
    publish_public_table(spark, "logs", other_win, out)
    live = _delta_df(spark, table)
    assert live.filter(F.col("receipt_id") == "CRASHROW").count() == 1
    assert live.filter(F.col("receipt_id") == "OTHERWIN").count() == 1
    assert live.count() == df.count() + 2
    live_rows = sorted(map(tuple, live.collect()))

    # every add in the snapshot points at a real file, and vacuum sweeps
    # the crash orphans without touching any retained snapshot's files
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    reader = DeltaLogReader(table)
    for path in reader.snapshot().files:
        assert os.path.exists(os.path.join(table, path))
    removed = vacuum_delta_table(table, retain_last=len(reader.versions))
    assert removed  # the orphaned CRASHROW attempt was swept
    for path in DeltaLogReader(table).snapshot().files:
        assert os.path.exists(os.path.join(table, path))
    assert sorted(map(tuple, _delta_df(spark, table).collect())) == live_rows


def test_publish_crash_during_initial_write_recovers(
    pipe, spark, tmp_path, monkeypatch
):
    """Crash before the very first sync: the table data exists but no
    `_delta_log` does — a state that self-describes the crash (tombstones
    cannot predate the log). The next publish reconciles the directory as
    version 0 with a full-walk sync, then merges its own window."""
    import os

    from near_public_lakehouse_spark.operators import delta_export as dx
    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    real_sync = dx.sync_delta_log_from_dir
    monkeypatch.setattr(
        dx,
        "sync_delta_log_from_dir",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("simulated crash")),
    )
    with pytest.raises(RuntimeError):
        publish_public_table(spark, "logs", df, out)
    monkeypatch.setattr(dx, "sync_delta_log_from_dir", real_sync)
    assert not os.path.isdir(os.path.join(table, "_delta_log"))

    extra = df.limit(1).withColumn("receipt_id", F.lit("NEWRCPT"))
    publish_public_table(spark, "logs", extra, out)
    live = _delta_df(spark, table)
    assert live.count() == df.count() + 1
    assert live.filter(F.col("receipt_id") == "NEWRCPT").count() == 1


def test_publish_stray_legacy_marker_reconciles_then_merges(
    pipe, spark, tmp_path
):
    """A leftover intent marker from the pre-retention publish protocol
    (whatever its contents — here corrupt JSON) triggers a one-time
    full-walk reconcile sync before the log-authoritative merge, then is
    deleted. Sound because markers predate the first retained publish, so
    no tombstones can exist for the walk to resurrect."""
    import os

    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    publish_public_table(spark, "logs", df, out)
    with open(table + ".__publish_intent__.json", "w") as fh:
        fh.write("{not json")
    extra = df.limit(1).withColumn("receipt_id", F.lit("NEWRCPT"))
    publish_public_table(spark, "logs", extra, out)
    assert not os.path.exists(table + ".__publish_intent__.json")
    live = _delta_df(spark, table)
    assert live.count() == df.count() + 1
    assert live.filter(F.col("receipt_id") == "NEWRCPT").count() == 1


# --- third-validator: hand-rolled PROTOCOL.md replay (VERDICT r10 #4) --------
# The publish round-trip already goes through the repo's independent
# protocol READER — but reader and writer share an author, so writer bugs
# could hide behind reader leniency. This validator replays the raw
# `_delta_log` JSON with minimal hand-rolled asserts straight from
# PROTOCOL.md: contiguous versions, protocol/metaData invariants, add
# path<->partitionValues agreement, on-disk existence + size + numRecords
# for every live file, tombstone invariants (a removed path is not in the
# reconciled state; every non-live on-disk file is accounted for by a
# remove action — retention keeps tombstones on disk until vacuum), and
# checkpoint-at-v10 equivalence with the JSON replay.


def _replay_raw_json(log_dir, upto=None):
    import json as _json
    import os
    import re as _re

    names = sorted(
        n for n in os.listdir(log_dir) if _re.fullmatch(r"\d{20}\.json", n)
    )
    versions = [int(n[:-5]) for n in names]
    assert versions == list(range(len(versions))), "non-contiguous versions"
    live, meta, protocol, removed_ever = {}, None, None, set()
    for v, fname in zip(versions, names):
        if upto is not None and v > upto:
            break
        seen_in_commit = set()
        with open(os.path.join(log_dir, fname)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = _json.loads(line)
                assert len(act) == 1, "one action per line"
                ((kind, body),) = act.items()
                if kind == "protocol":
                    assert v == 0, "this writer only creates protocol at v0"
                    assert isinstance(body["minReaderVersion"], int)
                    assert isinstance(body["minWriterVersion"], int)
                    protocol = body
                elif kind == "metaData":
                    assert body["format"]["provider"] == "parquet"
                    schema = _json.loads(body["schemaString"])
                    assert schema["type"] == "struct"
                    top = {f["name"] for f in schema["fields"]}
                    assert set(body["partitionColumns"]) <= top
                    assert body["id"]
                    meta = body
                elif kind == "add":
                    path = body["path"]
                    assert not path.startswith("/") and ".." not in path
                    assert path not in seen_in_commit
                    assert path not in live, "re-add without remove"
                    seen_in_commit.add(path)
                    assert set(body["partitionValues"]) == set(
                        meta["partitionColumns"]
                    )
                    segs = dict(
                        s.split("=", 1)
                        for s in path.split("/")[:-1]
                        if "=" in s
                    )
                    from urllib.parse import unquote

                    for k, val in body["partitionValues"].items():
                        if val is None:
                            assert segs[k] == "__HIVE_DEFAULT_PARTITION__"
                        else:
                            assert unquote(segs[k]) == val
                    assert isinstance(body["size"], int) and body["size"] > 0
                    live[path] = body
                elif kind == "remove":
                    assert body["path"] in live, "tombstone for never-live path"
                    del live[body["path"]]
                    removed_ever.add(body["path"])
                else:
                    raise AssertionError(f"unknown action {kind}")
        assert protocol is not None and meta is not None, "v0 must establish both"
    # tombstone invariant: a removed path is not in the reconciled state
    # (unless a later add resurrected it — this writer never does)
    assert not (removed_ever & set(live)), "tombstoned path still live"
    return live, meta, protocol, removed_ever


def _validate_delta_table(table_dir) -> int:
    import json as _json
    import os

    import pyarrow.parquet as _pq

    log_dir = os.path.join(table_dir, "_delta_log")
    live, meta, protocol, removed_ever = _replay_raw_json(log_dir)

    disk = set()
    for dp, dns, fns in os.walk(table_dir):
        dns[:] = [d for d in dns if not d.startswith(("_", "."))]
        for fn in fns:
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                disk.add(os.path.relpath(os.path.join(dp, fn), table_dir))
    assert set(live) <= disk, "live file missing from directory"
    # retention invariant: every non-live on-disk file is a tombstone the
    # log accounts for (not-yet-vacuumed remove) — never an untracked
    # stray in a crash-free history
    assert disk - set(live) <= removed_ever, "non-live file with no tombstone"
    for path, add in live.items():
        full = os.path.join(table_dir, path)
        assert add["size"] == os.path.getsize(full)
        if "stats" in add:
            stats = _json.loads(add["stats"])
            assert stats["numRecords"] == _pq.ParquetFile(full).metadata.num_rows

    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as fh:
            pointer = _json.load(fh)
        cpv = pointer["version"]
        cp_file = os.path.join(log_dir, f"{cpv:020d}.checkpoint.parquet")
        assert os.path.exists(cp_file)
        rows = _pq.read_table(cp_file).to_pylist()
        assert pointer["size"] == len(rows)
        cp_live, cp_meta, cp_proto, cp_removed = {}, None, None, set()
        for row in rows:
            if row.get("add") and row["add"].get("path"):
                cp_live[row["add"]["path"]] = row["add"]
            if row.get("remove") and row["remove"].get("path"):
                cp_removed.add(row["remove"]["path"])
            if row.get("metaData") and row["metaData"].get("id"):
                cp_meta = row["metaData"]
            if row.get("protocol") and row["protocol"].get("minReaderVersion") is not None:
                cp_proto = row["protocol"]
        j_live, j_meta, j_proto, _ = _replay_raw_json(log_dir, upto=cpv)
        assert set(cp_live) == set(j_live), "checkpoint file set != JSON replay"
        assert cp_meta is not None and cp_meta["id"] == j_meta["id"]
        assert _json.loads(cp_meta["schemaString"]) == _json.loads(j_meta["schemaString"])
        assert cp_proto["minReaderVersion"] == j_proto["minReaderVersion"]
        assert cp_proto["minWriterVersion"] == j_proto["minWriterVersion"]
        assert not (cp_removed & set(cp_live))
    n_commits = len(
        [n for n in os.listdir(log_dir) if n.endswith(".json") and n[:-5].isdigit()]
    )
    return n_commits


def test_all_seven_public_tables_pass_the_protocol_validator(
    pipe, spark, tmp_path
):
    """All 7 public tables validated; `logs` (partitioned) and
    `circulating_supply` (unpartitioned) run 12 versions each, crossing
    the 10-commit checkpoint cadence."""
    import os

    from near_public_lakehouse_spark.plans.public import (
        public_near_balances,
        publish_public_table,
    )

    out = str(tmp_path / "pub")

    logs = pipe.read("public_logs")
    publish_public_table(spark, "logs", logs, out)
    for i in range(1, 12):
        publish_public_table(
            spark,
            "logs",
            logs.limit(1).withColumn("receipt_id", F.lit(f"VRCPT{i}")),
            out,
        )

    def supply(*days):
        return spark.createDataFrame(
            [(d, f"HASH{d}", str(10**33 + i), PROCESSED) for i, d in enumerate(days)],
            "block_date string, computed_at_block_hash string, "
            "circulating_supply string, _processed_time string",
        ).select(
            F.col("block_date").cast("date").alias("block_date"),
            "computed_at_block_hash",
            "circulating_supply",
            F.col("_processed_time").cast("timestamp").alias("_processed_time"),
        )

    days = []
    for i in range(12):
        days.append(f"2024-03-{i + 1:02d}")
        publish_public_table(spark, "circulating_supply", supply(*days), out)

    for table, node, key in [
        ("block_chunks", "public_block_chunks", "chunk_hash"),
        ("actions", "public_actions", "receipt_id"),
        ("ft_transfers", "public_ft_transfers", "receipt_id"),
        ("nft_transfers", "public_nft_transfers", "receipt_id"),
    ]:
        df = pipe.read(node)
        publish_public_table(spark, table, df, out)
        for i in range(1, 3):
            publish_public_table(
                spark,
                table,
                df.limit(1).withColumn(key, F.lit(f"VNEW{i}")),
                out,
            )

    YOCTO = 10**24
    def balances(account):
        return public_near_balances(
            spark.createDataFrame(
                [
                    (
                        "2024-01-02", 2, account, 15000.0, str(15_000 * YOCTO), 120,
                        str(YOCTO), str(2 * YOCTO), str(3 * YOCTO),
                        None, None, None, None, None,
                    )
                ],
                "epoch_date string, epoch_block_height int, account_id string, "
                "liquid double, nonstaked_balance string, storage_usage long, "
                "unstaked_not_liquid string, staked string, reward string, "
                "lockup_account_id string, lockup_liquid double, "
                "lockup_unstaked_not_liquid string, "
                "lockup_staked string, lockup_reward string",
            ),
            PROCESSED,
        )

    for i in range(3):
        publish_public_table(spark, "near_balances", balances(f"acct{i}.near"), out)

    commits = {
        t: _validate_delta_table(os.path.join(out, t))
        for t in [
            "logs", "circulating_supply", "block_chunks", "actions",
            "ft_transfers", "nft_transfers", "near_balances",
        ]
    }
    assert commits["logs"] >= 12 and commits["circulating_supply"] >= 12
    assert all(n >= 3 for t, n in commits.items() if t != "near_balances")
    assert commits["near_balances"] >= 3
    # both 12-version tables crossed the checkpoint
    for t in ("logs", "circulating_supply"):
        assert os.path.exists(
            os.path.join(out, t, "_delta_log", f"{10:020d}.checkpoint.parquet")
        )


def test_published_partitions_prune_through_reader_skipping(pipe, spark, tmp_path):
    """Round-12 candidate #1: the PUBLISHED tables' partition layout must
    be provably prunable through the independent reader's data skipping —
    a block_date predicate keeps only that partition's add actions and
    the pruned read equals the filtered full read. This is the property
    that makes a daily consumer query O(one partition) at 100 TB."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaLogReader,
        prune_snapshot_files,
    )
    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    publish_public_table(spark, "logs", df, out)

    days = sorted(
        str(r.block_date) for r in df.select("block_date").distinct().collect()
    )
    assert len(days) >= 2, "fixture must span multiple partitions"
    day = days[0]

    r = DeltaLogReader(table)
    snap = r.snapshot()
    pruned = prune_snapshot_files(snap, [("block_date", "=", day)])
    assert 0 < len(pruned.files) < len(snap.files)
    # every kept add action really is that partition's
    assert all(
        a["partitionValues"]["block_date"] == day for a in pruned.files.values()
    )

    full = {
        tuple(x)
        for x in r.to_df(spark).filter(F.col("block_date") == day).collect()
    }
    skipped = {
        tuple(x)
        for x in r.to_df(spark, where=[("block_date", "=", day)])
        .filter(F.col("block_date") == day)
        .collect()
    }
    assert skipped == full and full

    # range shape too: everything from the second day on
    later = prune_snapshot_files(snap, [("block_date", ">=", days[1])])
    assert len(later.files) < len(snap.files)
    assert all(
        a["partitionValues"]["block_date"] >= days[1]
        for a in later.files.values()
    )


# --- retention at the publish edge (VERDICT r11 task #1) ---------------------


def _n_data_files(table_dir):
    import os

    n = 0
    for dp, dns, fns in os.walk(table_dir):
        dns[:] = [d for d in dns if not d.startswith(("_", "."))]
        n += sum(
            1
            for fn in fns
            if fn.endswith(".parquet") and not fn.startswith(("_", "."))
        )
    return n


def test_retention_vacuum_and_time_travel(pipe, spark, tmp_path):
    """The full retention story over 13 versions with repeated partition
    rewrites: superseded part-files stay on disk as tombstones, so TIME
    TRAVEL to any version inside the retention window replays exactly;
    one vacuum then drops everything unreferenced by the retained
    snapshots — after which in-window time travel STILL replays, an
    out-of-window read fails explicitly at the missing file, the protocol
    validator stays green, and repeated republish+vacuum cycles keep the
    directory size bounded."""
    from near_public_lakehouse_spark.operators.delta_export import (
        vacuum_delta_table,
    )
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader
    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    publish_public_table(spark, "logs", df, out)  # v0

    # v1..v12: every publish rewrites the SAME partition (base's
    # block_date) — 12 partition rewrites, tombstones accumulating
    base = df.limit(1)
    for i in range(1, 13):
        publish_public_table(
            spark, "logs", base.withColumn("receipt_id", F.lit(f"R{i}")), out
        )

    reader = DeltaLogReader(table)
    assert reader.versions == list(range(13))
    # pre-vacuum: the directory holds every generation; time travel
    # replays any version (pin counts: version v has df.count()+v rows)
    pre_counts = {
        v: reader.to_df(spark, version=v).count() for v in (0, 4, 8, 12)
    }
    assert pre_counts == {v: df.count() + v for v in (0, 4, 8, 12)}
    n_files_before = _n_data_files(table)

    removed = vacuum_delta_table(table, retain_last=5)  # retain v8..v12
    assert removed, "vacuum found nothing to drop after 12 rewrites"
    assert _n_data_files(table) == n_files_before - len(removed)

    # in-window time travel still replays byte-identically
    fresh = DeltaLogReader(table)
    for v in (8, 10, 12):
        frame = fresh.to_df(spark, version=v)
        assert frame.count() == df.count() + v
        assert (
            frame.filter(F.col("receipt_id") == f"R{v}").count() == 1
            if v
            else True
        )
    # out-of-window: history stays listable, the READ fails explicitly
    # on the vacuumed file (Delta's own behavior)
    assert 0 in fresh.versions
    with pytest.raises(Exception):
        fresh.to_df(spark, version=0).count()

    # vacuum never deletes a live or retained file: every add of every
    # retained snapshot still exists on disk
    import os

    for v in range(8, 13):
        for path in fresh.snapshot(v).files:
            assert os.path.exists(os.path.join(table, path))

    # the hand-rolled PROTOCOL.md validator stays green post-vacuum
    assert _validate_delta_table(table) >= 13

    # directory size is BOUNDED across republish+vacuum cycles: the
    # steady-state file count stops growing
    counts = []
    for i in range(4):
        publish_public_table(
            spark, "logs", base.withColumn("receipt_id", F.lit(f"S{i}")), out
        )
        vacuum_delta_table(table, retain_last=5)
        counts.append(_n_data_files(table))
    assert counts[-1] <= counts[0], f"directory growth unbounded: {counts}"
    assert _validate_delta_table(table) >= 17


def test_published_change_feed_surfaces_rewrites(pipe, spark, tmp_path):
    """Task #1's tombstones feed task #7's consumer, on a REAL published
    table: each partition-rewrite publish surfaces through
    `DeltaLogReader.read_changes(include_removes=True)` as the exact
    delete+insert transition (replaying it reproduces the next snapshot),
    the reference semantic (`skipChangeCommits`) sees only the initial
    load, and the default read refuses the rewrite."""
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader
    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    publish_public_table(spark, "logs", df, out)  # v0
    base = df.limit(1)
    for i in (1, 2):  # two partition rewrites
        publish_public_table(
            spark, "logs", base.withColumn("receipt_id", F.lit(f"R{i}")), out
        )

    reader = DeltaLogReader(table)
    with pytest.raises(ValueError, match="rewrote existing rows"):
        reader.read_changes(spark)
    skip = reader.read_changes(spark, skip_change_commits=True)
    assert {r["_commit_version"] for r in skip.select("_commit_version").collect()} == {0}
    assert skip.count() == df.count()

    def ids(frame):
        return sorted(r[0] for r in frame.select("receipt_id").collect())

    for v in (1, 2):
        feed = reader.read_changes(
            spark, since_version=v - 1, end_version=v, include_removes=True
        )
        deletes = ids(feed.filter(F.col("_change_type") == "delete"))
        inserts = ids(feed.filter(F.col("_change_type") == "insert"))
        before = ids(reader.to_df(spark, version=v - 1))
        after = ids(reader.to_df(spark, version=v))
        assert deletes and inserts
        for d in deletes:
            assert d in before
        replayed = sorted([x for x in before if x not in deletes] + inserts)
        assert replayed == after
        assert f"R{v}" in inserts


def test_delta_mirror_propagates_published_rewrites(pipe, spark, tmp_path):
    """Cross-store consumer: a versioned mirror of a PUBLISHED Delta table
    tracks it through partition-rewrite publishes with deletes propagated
    — the downstream shape the reference's BQ Writer cannot have (it
    reads skipChangeCommits=true). Exactly-once: the consumed Delta
    version rides inside the versioned commit; re-drains are no-ops."""
    from near_public_lakehouse_spark.operators import versioned as V
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader
    from near_public_lakehouse_spark.plans.public import (
        PUBLIC_TABLE_KEYS,
        publish_public_table,
    )

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    mirror = str(tmp_path / "mirror")
    keys = PUBLIC_TABLE_KEYS["logs"][0]

    publish_public_table(spark, "logs", df, out)  # v0
    base = df.limit(1)
    publish_public_table(
        spark, "logs", base.withColumn("receipt_id", F.lit("R1")), out
    )  # v1: partition rewrite

    def ids(frame):
        return sorted(r[0] for r in frame.select("receipt_id").collect())

    r = V.delta_mirror_into(spark, table, mirror, keys)
    assert r["source_version"] == 1
    reader = DeltaLogReader(table)
    assert ids(V.read_version(spark, mirror)) == ids(reader.to_df(spark))

    # another rewrite, drained separately
    publish_public_table(
        spark, "logs", base.withColumn("receipt_id", F.lit("R2")), out
    )
    V.delta_mirror_into(spark, table, mirror, keys)
    assert ids(V.read_version(spark, mirror)) == ids(
        DeltaLogReader(table).to_df(spark)
    )
    # idempotent no-op drain
    r = V.delta_mirror_into(spark, table, mirror, keys)
    assert r["n_rows"] == 0 and r.get("drained")


def test_delta_mirror_first_contact_on_dataless_window(pipe, spark, tmp_path):
    """First contact with a source whose pending window carries NO
    data-changing commits (empty first publish): the watermark-only v0
    commit on the not-yet-existing target must carry the SOURCE snapshot's
    schema, not "{}" — the latter wedges every later read_version of the
    target, including the next data-bearing mirror batch's own target
    read (ADVICE r12)."""
    from near_public_lakehouse_spark.operators import versioned as V
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader
    from near_public_lakehouse_spark.plans.public import (
        PUBLIC_TABLE_KEYS,
        publish_public_table,
    )

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    mirror = str(tmp_path / "mirror")
    keys = PUBLIC_TABLE_KEYS["logs"][0]

    publish_public_table(spark, "logs", df.limit(0), out)  # empty v0, no adds
    r = V.delta_mirror_into(spark, table, mirror, keys)
    assert r["source_version"] == 0 and r["n_rows"] == 0

    # target v0 must be readable — schema came from the Delta snapshot
    empty = V.read_version(spark, mirror)
    assert empty.count() == 0
    assert set(keys) <= set(empty.columns)

    # the next DATA-BEARING batch reads the target it just created
    publish_public_table(spark, "logs", df, out)  # v1: real rows
    r = V.delta_mirror_into(spark, table, mirror, keys)
    assert r["source_version"] == 1 and r["n_rows"] > 0
    got = sorted(
        r[0] for r in V.read_version(spark, mirror).select("receipt_id").collect()
    )
    want = sorted(
        r[0] for r in DeltaLogReader(table).to_df(spark).select("receipt_id").collect()
    )
    assert got == want


def test_empty_first_publish_does_not_reset_table_identity(pipe, spark, tmp_path):
    """An existing table whose current snapshot holds ZERO data files
    (empty first window) must NOT be mistaken for brand-new: the next
    publish must continue the log (same table id, version monotonic)
    instead of wiping _delta_log and re-issuing v0 under a new id —
    protocol corruption for any reader mid-stream (r12 review)."""
    import os

    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader
    from near_public_lakehouse_spark.plans.public import publish_public_table

    df = pipe.read("public_logs")
    out = str(tmp_path / "pub")
    table = out + "/logs"
    publish_public_table(spark, "logs", df.limit(0), out)  # empty v0
    r0 = DeltaLogReader(table)
    v0 = r0.versions[-1]
    snap0 = r0.snapshot()
    table_id = None
    import json as _json

    with open(os.path.join(table, "_delta_log", f"{0:020d}.json")) as fh:
        for line in fh:
            act = _json.loads(line)
            if "metaData" in act:
                table_id = act["metaData"]["id"]
    assert not snap0.files  # genuinely empty snapshot

    publish_public_table(spark, "logs", df, out)  # real rows
    r1 = DeltaLogReader(table)
    assert r1.versions[0] == 0 and r1.versions[-1] > v0  # history continued
    with open(os.path.join(table, "_delta_log", f"{0:020d}.json")) as fh:
        for line in fh:
            act = _json.loads(line)
            if "metaData" in act:
                assert act["metaData"]["id"] == table_id  # same table id
    assert r1.to_df(spark).count() == df.count()
