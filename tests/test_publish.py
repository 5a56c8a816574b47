"""Publisher sink (K5) tests: JSON payload fidelity, per-key and total
ordering, chunked ack batching, streaming batch fencing (at-least-once),
and the durable cursor — the engine-side contract of the reference's
sequential block publisher (rust-near-gcp-pubsub-writer/src/main.rs)."""

from __future__ import annotations

import json
import os
import random

from near_public_lakehouse_spark.operators.publish import (
    FileTransport,
    file_transport_factory,
    publish_rows,
    publish_stream,
)


def _mk_df(spark, n=200, keys=5, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, f"k{i % keys}", rng.randint(0, 10**6), f"payload-{i}")
        for i in range(n)
    ]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "seq long, key string, value long, note string")


def test_publish_per_key_ordering_and_fidelity(spark, tmp_path):
    root = str(tmp_path / "msgs")
    df = _mk_df(spark, n=200, keys=5)
    publish_rows(
        df,
        file_transport_factory(root),
        key_col="key",
        seq_col="seq",
        chunk_size=16,  # forces many chunked publish calls
    )
    msgs = FileTransport.read_all(root)
    assert len(msgs) == 200
    # exactly-once within one run, payload carries the full row as JSON
    seen = {}
    per_key: dict[str, list[int]] = {}
    for m in msgs:
        body = json.loads(m["data"])
        assert body["note"] == f"payload-{body['seq']}"
        assert m["key"] == body["key"] and m["seq"] == body["seq"]
        assert body["seq"] not in seen
        seen[body["seq"]] = True
        per_key.setdefault(m["key"], []).append(m["seq"])
    assert len(per_key) == 5
    for key, seqs in per_key.items():
        assert seqs == sorted(seqs), f"out-of-order delivery for {key}"


def test_publish_total_order(spark, tmp_path):
    root = str(tmp_path / "msgs")
    publish_rows(
        _mk_df(spark, n=120, keys=7),
        file_transport_factory(root),
        key_col="key",
        seq_col="seq",
        ordered="total",
        chunk_size=11,
    )
    seqs = [m["seq"] for m in FileTransport.read_all(root)]
    assert seqs == sorted(seqs) and len(seqs) == 120


def test_publish_stream_fences_replays_and_tracks_cursor(spark, tmp_path):
    src = tmp_path / "src"
    for i, lo in enumerate([0, 40]):
        spark.createDataFrame(
            [(s, f"k{s % 3}", f"n{s}") for s in range(lo, lo + 40)],
            "seq long, key string, note string",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))

    msgs_root = str(tmp_path / "msgs")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("seq long, key string, note string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "b*"))
    )

    def run():
        q = publish_stream(
            stream,
            file_transport_factory(msgs_root),
            state,
            key_col="key",
            seq_col="seq",
            checkpoint_path=ckpt,
        )
        q.awaitTermination(120)

    run()
    msgs = FileTransport.read_all(msgs_root)
    assert len(msgs) == 80
    assert sorted(m["seq"] for m in msgs) == list(range(80))
    with open(f"{state}/_CURSOR") as fh:
        assert json.load(fh)["hi"] == 79  # the reference's height log, durable
    markers = sorted(os.listdir(f"{state}/published"))
    assert len(markers) == 2

    # checkpoint wiped but publisher state kept: Spark replays both batches
    # with the same epoch ids; markers make the replay a no-op.
    import shutil

    shutil.rmtree(ckpt)
    run()
    assert len(FileTransport.read_all(msgs_root)) == 80

    # crash in the publish->marker gap: marker missing => that one batch is
    # re-sent (at-least-once), the other stays fenced.
    os.remove(f"{state}/published/{markers[0]}")
    shutil.rmtree(ckpt)
    run()
    again = FileTransport.read_all(msgs_root)
    assert len(again) == 120  # 80 + one replayed 40-row batch
    # every original seq still present; duplicates only from one batch
    from collections import Counter

    counts = Counter(m["seq"] for m in again)
    assert set(counts) == set(range(80))
    assert sorted(set(counts.values())) == [1, 2] and sum(
        1 for v in counts.values() if v == 2
    ) == 40


def test_corrupt_cursor_treated_as_absent(spark, tmp_path):
    """r6 ADVICE (publish.py:139): a crash mid-write used to leave a
    truncated _CURSOR that json.load then raised on at EVERY restart,
    wedging the stream. The cursor is now written via atomic os.replace
    and a corrupt file is treated as absent — the stream recovers and
    rewrites a valid cursor."""
    src = tmp_path / "src"
    spark.createDataFrame(
        [(s, f"k{s % 3}", f"n{s}") for s in range(20)],
        "seq long, key string, note string",
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))

    msgs_root = str(tmp_path / "msgs")
    state = str(tmp_path / "state")
    os.makedirs(state, exist_ok=True)
    with open(f"{state}/_CURSOR", "w") as fh:
        fh.write('{"hi": 1')  # truncated mid-write

    stream = spark.readStream.schema("seq long, key string, note string").parquet(
        str(src / "b*")
    )
    q = publish_stream(
        stream,
        file_transport_factory(msgs_root),
        state,
        key_col="key",
        seq_col="seq",
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    with open(f"{state}/_CURSOR") as fh:
        assert json.load(fh)["hi"] == 19
    assert not [p for p in os.listdir(state) if p.startswith("_CURSOR.tmp")]


def test_read_all_order_survives_writer_counter_reset(tmp_path):
    """r6 ADVICE (publish.py:180): lexicographic (pid, counter) filename
    order is not publish order when a reused worker's counter restarts at
    0 across micro-batches. The ns-stamp filename prefix must keep
    read_all in true publish order even when a LATER transport instance
    restarts its counter."""
    root = str(tmp_path / "msgs")
    t1 = FileTransport(root)
    t1.publish([("k", 1, "a")])
    t1.publish([("k", 2, "b")])
    t2 = FileTransport(root)  # fresh instance: counter back to 0
    t2.publish([("k", 3, "c")])
    seqs = [m["seq"] for m in FileTransport.read_all(root)]
    assert seqs == [1, 2, 3], seqs
