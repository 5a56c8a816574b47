"""Round-trip validation of the Delta export through the INDEPENDENT
pure-Python reader (operators/delta_reader.py) — the closest thing to an
external byte-validation the container allows (VERDICT r5 task #5):
export -> from-scratch PROTOCOL.md replay -> same file set, same schema,
same rows as the versioned manifest store, at EVERY version.
"""

from __future__ import annotations

import json
import os

import pytest

from near_public_lakehouse_spark.operators import versioned as V
from near_public_lakehouse_spark.operators.delta_export import write_delta_log
from near_public_lakehouse_spark.operators.delta_reader import (
    DeltaLogReader,
    DeltaProtocolError,
)


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    """Versioned table exercising append, upsert, compaction and an
    idempotent txn — the same surface the exporter maps."""
    d = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]), d)
    V.commit_append(_df(spark, [(3, "c")]), d)
    V.versioned_upsert(spark, d, _df(spark, [(2, "B"), (4, "d")]), ["k"])
    V.commit_compact(spark, d, target_files=1)
    write_delta_log(d)
    return d


def test_every_version_round_trips_files_and_schema(table):
    r = DeltaLogReader(table)
    assert r.versions == V._versions(table)
    for v in r.versions:
        snap = r.snapshot(v)
        manifest = V._read_manifest(table, v)
        assert snap.paths == set(manifest["files"]), f"version {v}"
        # schemaString is Spark's own schema JSON — compare parsed forms
        assert snap.schema == json.loads(manifest["schema"]), f"version {v}"


def test_every_version_round_trips_rows(spark, table):
    r = DeltaLogReader(table)
    for v in r.versions:
        via_reader = {tuple(x) for x in r.to_df(spark, v).collect()}
        via_store = {tuple(x) for x in V.read_version(spark, table, version=v).collect()}
        assert via_reader == via_store, f"version {v}"


def test_stats_sum_matches_row_count(spark, table):
    r = DeltaLogReader(table)
    snap = r.snapshot()
    n = snap.num_records()
    assert n is not None
    assert n == V.read_version(spark, table).count()


def test_txn_actions_round_trip(spark, tmp_path):
    d = str(tmp_path / "t")
    sink = V.idempotent_batch_sink(d, app_id="loader")
    sink(_df(spark, [(1, "a")]), 7)
    write_delta_log(d)
    snap = DeltaLogReader(d).snapshot()
    assert snap.txns == {"loader": 7}


def test_reader_is_strict_about_protocol(spark, tmp_path, table):
    # a log demanding reader features we lack must refuse, not misread
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        lines = fh.readlines()
    bumped = [
        json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}})
        + "\n"
    ] + lines[1:]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.writelines(bumped)
    with pytest.raises(DeltaProtocolError, match="reader version"):
        DeltaLogReader(table).snapshot()


def test_reader_rejects_gapped_logs(table):
    log = os.path.join(table, "_delta_log")
    versions = sorted(n for n in os.listdir(log) if n.endswith(".json"))
    assert len(versions) >= 3
    os.remove(os.path.join(log, versions[1]))
    with pytest.raises(DeltaProtocolError, match="contiguous"):
        DeltaLogReader(table)


def test_reader_rejects_unknown_actions(table):
    log = os.path.join(table, "_delta_log")
    last = sorted(n for n in os.listdir(log) if n.endswith(".json"))[-1]
    with open(os.path.join(log, last), "a") as fh:
        fh.write(json.dumps({"mystery": {"x": 1}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="unknown action"):
        DeltaLogReader(table).snapshot()


# ---------------------------------------------------------------------------
# checkpoint-parquet support (VERDICT r7 task #6)


@pytest.fixture()
def aged_table(spark, tmp_path):
    """A long-lived table: 25 commits (v0..v24), checkpoint at v20 —
    the shape a real Delta table has after its log ages (the reference's
    tables all checkpoint every 10 commits)."""
    d = str(tmp_path / "aged")
    V.commit_overwrite(_df(spark, [(0, "r0")]), d)
    for i in range(1, 25):
        V.commit_append(_df(spark, [(i, f"r{i}")]), d)
    write_delta_log(d)  # default interval 10 -> checkpoint at v20
    return d


def test_checkpoint_written_at_interval(aged_table):
    log = os.path.join(aged_table, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{20:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint")) as fh:
        pointer = json.load(fh)
    assert pointer["version"] == 20
    assert pointer["size"] > 0


def test_checkpoint_replay_equals_full_json_replay(aged_table):
    """With the full JSON history still present, snapshots computed from
    checkpoint+trailing commits must be file-exactly what full replay
    gives — for the checkpoint version, after it, and (via the surviving
    JSON prefix) before it."""
    log = os.path.join(aged_table, "_delta_log")
    with_ckpt = DeltaLogReader(aged_table)
    assert with_ckpt.checkpoint_version == 20
    os.rename(os.path.join(log, "_last_checkpoint"), os.path.join(log, "_lc.bak"))
    json_only = DeltaLogReader(aged_table)
    assert json_only.checkpoint_version is None
    for v in (5, 19, 20, 21, 24):
        a, b = with_ckpt.snapshot(v), json_only.snapshot(v)
        assert a.paths == b.paths, f"version {v}"
        assert a.schema == b.schema
        assert a.txns == b.txns
        # r8 ADVICE: full action-body equality, not just paths/schema/txns —
        # the parquet round-trip must not turn empty maps (partitionValues,
        # configuration) into [] or otherwise reshape the add bodies.
        assert a.files == b.files, f"version {v}"
        for body in a.files.values():
            assert isinstance(body.get("partitionValues", {}), dict)


def test_malformed_pointer_parts_is_corruption(aged_table):
    """r8 ADVICE: a corrupt _last_checkpoint with non-int `parts` must
    raise DeltaProtocolError, not a raw TypeError from range()/format()."""
    log = os.path.join(aged_table, "_delta_log")
    pointer = os.path.join(log, "_last_checkpoint")
    with open(pointer) as fh:
        meta = json.load(fh)
    for bad in ("3", 2.5, 0, -1, True):
        with open(pointer, "w") as fh:
            json.dump({**meta, "parts": bad}, fh)
        with pytest.raises(DeltaProtocolError, match="malformed"):
            DeltaLogReader(aged_table)


def test_checkpoint_reads_after_aged_json_cleanup(spark, aged_table):
    """The actual failure the feature closes: aged JSON commits cleaned
    up below the checkpoint — replay must come from the checkpoint, read
    back file-exactly vs the manifest store, and refuse pre-checkpoint
    time travel instead of misreading."""
    log = os.path.join(aged_table, "_delta_log")
    for v in range(20):  # real Delta log cleanup: drop JSON below the checkpoint
        os.remove(os.path.join(log, f"{v:020d}.json"))
    r = DeltaLogReader(aged_table)
    assert r.versions == list(range(20, 25))
    for v in range(20, 25):
        snap = r.snapshot(v)
        manifest = V._read_manifest(aged_table, v)
        assert snap.paths == set(manifest["files"]), f"version {v}"
        assert snap.schema == json.loads(manifest["schema"])
        rows = {tuple(x) for x in r.to_df(spark, v).collect()}
        expect = {tuple(x) for x in V.read_version(spark, aged_table, version=v).collect()}
        assert rows == expect, f"version {v}"
    with pytest.raises(DeltaProtocolError, match="not readable"):
        r.snapshot(5)


def test_multipart_checkpoint_round_trips(spark, aged_table):
    from near_public_lakehouse_spark.operators.delta_export import write_checkpoint

    log = os.path.join(aged_table, "_delta_log")
    paths = write_checkpoint(aged_table, 20, parts=3)
    assert [os.path.basename(p) for p in paths] == [
        f"{20:020d}.checkpoint.{i:010d}.{3:010d}.parquet" for i in (1, 2, 3)
    ]
    for v in range(20):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    r = DeltaLogReader(aged_table)
    assert r.checkpoint_version == 20
    snap = r.snapshot(24)
    assert snap.paths == set(V._read_manifest(aged_table, 24)["files"])


def test_pointer_to_missing_checkpoint_is_corruption(aged_table):
    log = os.path.join(aged_table, "_delta_log")
    os.remove(os.path.join(log, f"{20:020d}.checkpoint.parquet"))
    # neither a classic nor a v2 checkpoint exists at the pointer version
    with pytest.raises(DeltaProtocolError, match="no checkpoint file"):
        DeltaLogReader(aged_table)


# ---------------------------------------------------------------------------
# column mapping, NAME mode (round 9)


def _mapped_table(spark, tmp_path) -> str:
    """A NAME-mode column-mapped table as a modern external writer lays it
    out: parquet columns carry physical `col-<n>` names (including inside
    a nested struct and an array of structs); the logical names live only
    in schemaString field metadata."""
    d = str(tmp_path / "mapped")
    os.makedirs(os.path.join(d, "_delta_log"))
    data = spark.createDataFrame(
        [(1, ("alice", 30), [("x", 1)]), (2, (None, 40), []), (3, None, None)],
        "`col-1` long, `col-2` struct<`col-3`: string, `col-4`: long>, "
        "`col-5` array<struct<`col-6`: string, `col-7`: long>>",
    )
    data.coalesce(1).write.parquet(d + "/data")
    part = [f for f in os.listdir(d + "/data") if f.endswith(".parquet")][0]
    os.rename(os.path.join(d, "data", part), os.path.join(d, "part-0.parquet"))

    def fld(name, typ, phys, fid):
        return {
            "name": name, "type": typ, "nullable": True,
            "metadata": {
                "delta.columnMapping.physicalName": phys,
                "delta.columnMapping.id": fid,
            },
        }

    schema = {
        "type": "struct",
        "fields": [
            fld("id", "long", "col-1", 1),
            fld(
                "person",
                {"type": "struct", "fields": [
                    fld("name", "string", "col-3", 3),
                    fld("age", "long", "col-4", 4),
                ]},
                "col-2", 2,
            ),
            fld(
                "tags",
                {"type": "array", "containsNull": True,
                 "elementType": {"type": "struct", "fields": [
                     fld("key", "string", "col-6", 6),
                     fld("n", "long", "col-7", 7),
                 ]}},
                "col-5", 5,
            ),
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t-mapped", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "7"},
            "createdTime": 0,
        }},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(d, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return d


def test_column_mapping_name_mode_reads_logical_names(spark, tmp_path):
    d = _mapped_table(spark, tmp_path)
    r = DeltaLogReader(d)
    df = r.to_df(spark)
    assert df.columns == ["id", "person", "tags"]
    rows = {x.id: x for x in df.collect()}
    assert rows[1].person.name == "alice" and rows[1].person.age == 30
    assert rows[1].tags[0].key == "x" and rows[1].tags[0].n == 1
    assert rows[2].person.name is None and rows[2].person.age == 40
    assert rows[2].tags == []
    assert rows[3].person is None and rows[3].tags is None  # null guard


def test_column_mapping_reader_v3_feature_gating(spark, tmp_path):
    d = _mapped_table(spark, tmp_path)
    log = os.path.join(d, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().strip().splitlines()
    # v3 + columnMapping feature: accepted
    lines[0] = json.dumps({"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["columnMapping"], "writerFeatures": ["columnMapping"],
    }})
    open(log, "w").write("\n".join(lines) + "\n")
    assert DeltaLogReader(d).to_df(spark).count() == 3
    # v3 + a feature we cannot honor: refuse loudly
    lines[0] = json.dumps({"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["columnMapping", "typeWidening"],
    }})
    open(log, "w").write("\n".join(lines) + "\n")
    with pytest.raises(DeltaProtocolError, match="typeWidening"):
        DeltaLogReader(d).snapshot()


def _id_mapped_file(spark, out_path, names, ids, rows):
    """One parquet file whose column NAMES are arbitrary but whose
    parquet field ids carry the delta.columnMapping.id values — the
    exact case only ID matching reads correctly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = [
        pa.field(n, t, metadata={b"PARQUET:field_id": str(i).encode()})
        for n, t, i in zip(names, (pa.int64(), pa.string()), ids)
    ]
    pq.write_table(
        pa.Table.from_pylist(
            [dict(zip(names, r)) for r in rows], schema=pa.schema(fields)
        ),
        out_path,
    )


def test_column_mapping_id_mode_matches_by_field_id(spark, tmp_path):
    """ID mode: two files with DIFFERENT physical column names (a rename
    happened between writes) but stable field ids — matching by footer
    field id reads both correctly; name/physicalName matching could not."""
    d = str(tmp_path / "idt")
    os.makedirs(os.path.join(d, "_delta_log"))
    _id_mapped_file(spark, os.path.join(d, "part-0.parquet"),
                    ["zz_old_k", "zz_old_v"], [1, 2], [(1, "a"), (2, "b")])
    _id_mapped_file(spark, os.path.join(d, "part-1.parquet"),
                    ["qq_new_k", "qq_new_v"], [1, 2], [(3, "c")])

    def fld(name, typ, phys, fid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.physicalName": phys,
                             "delta.columnMapping.id": fid}}

    schema = {"type": "struct", "fields": [
        fld("id", "long", "col-a", 1), fld("val", "string", "col-b", 2),
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t-id", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id",
                                        "delta.columnMapping.maxColumnId": "2"},
                      "createdTime": 0}},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "part-1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(d, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    df = DeltaLogReader(d).to_df(spark)
    assert df.columns == ["id", "val"]
    assert {(x.id, x.val) for x in df.collect()} == {(1, "a"), (2, "b"), (3, "c")}


def test_column_mapping_id_mode_physicalname_fallback(spark, tmp_path):
    """A NAME-mode-shaped file (physicalName columns, no footer ids)
    under an ID-mode table still reads via the physicalName fallback —
    delta's own writers put both in the files."""
    d = _mapped_table(spark, tmp_path)
    log = os.path.join(d, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().strip().splitlines()
    meta = json.loads(lines[1])
    meta["metaData"]["configuration"]["delta.columnMapping.mode"] = "id"
    lines[1] = json.dumps(meta)
    open(log, "w").write("\n".join(lines) + "\n")
    df = DeltaLogReader(d).to_df(spark)
    assert df.columns == ["id", "person", "tags"]
    rows = {x.id: x for x in df.collect()}
    assert rows[1].person.name == "alice" and rows[1].tags[0].n == 1


# ---------------------------------------------------------------------------
# deletion vectors (round 9)
#
# The serializers below are written in THIS test directly from the public
# specs (ZeroMQ spec 32 for Z85, RoaringFormatSpec for the 32-bit portable
# bitmap, PROTOCOL.md for the DV frame) — independent of the reader's
# decoders, so agreement is two implementations of the spec meeting.

import struct
import zlib

from near_public_lakehouse_spark.operators.delta_reader import (
    dv_deleted_rows,
    roaring64_decode,
    z85_decode,
)

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)


def _z85_encode(b: bytes) -> str:
    out = []
    for i in range(0, len(b), 4):
        acc = int.from_bytes(b[i : i + 4], "big")
        s = ""
        for _ in range(5):
            s = _Z85[acc % 85] + s
            acc //= 85
        out.append(s)
    return "".join(out)


def _ser32_arrays(values: set[int]) -> bytes:
    """Standard-portable 32-bit roaring, array containers only
    (cookie 12346, offset header present)."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(values):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    out = struct.pack("<II", 12346, n)
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    base = 4 + 4 + 4 * n + 4 * n
    off = base
    for k in keys:
        out += struct.pack("<I", off)  # byte offset of this container's start
        off += len(by_key[k]) * 2
    for k in keys:
        out += struct.pack(f"<{len(by_key[k])}H", *by_key[k])
    return out


def _ser64(values: set[int]) -> bytes:
    by_high: dict[int, set[int]] = {}
    for v in sorted(values):
        by_high.setdefault(v >> 32, set()).add(v & 0xFFFFFFFF)
    out = struct.pack("<iQ", 1681511377, len(by_high))
    for high in sorted(by_high):
        out += struct.pack("<I", high) + _ser32_arrays(by_high[high])
    return out


def _dv_file(dir_, bitmap: bytes, uuid_hex: str, prefix: str = "") -> dict:
    """Write a DV file the way an external writer lays it out and return
    the add-action descriptor pointing at it ('u' storage)."""
    import uuid as _uuid

    u = _uuid.UUID(uuid_hex)
    rel = os.path.join(prefix, f"deletion_vector_{u}.bin") if prefix else f"deletion_vector_{u}.bin"
    full = os.path.join(dir_, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    frame = b"\x01" + struct.pack(">I", len(bitmap)) + bitmap + struct.pack(
        ">I", zlib.crc32(bitmap) & 0xFFFFFFFF
    )
    with open(full, "wb") as fh:
        fh.write(frame)
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + _z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(bitmap),
        "cardinality": len(roaring64_decode(bitmap)),
    }


def test_z85_spec_vector():
    """The ZeroMQ spec-32 reference vector pins the alphabet/ordering."""
    assert _z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])


def test_roaring_decode_array_bitmap_and_run_containers():
    # array containers across 32-bit buckets and 16-bit keys
    vals = {0, 1, 5, 70000, (3 << 32) | 7, (3 << 32) | 65536}
    assert roaring64_decode(_ser64(vals)) == vals

    # bitmap container: cardinality > 4096 forces the 8 KiB form
    dense = set(range(0, 10000, 2))
    payload = bytearray(struct.pack("<II", 12346, 1))
    payload += struct.pack("<HH", 0, len([v for v in dense if v < 65536]) - 1)
    payload += struct.pack("<I", 0)
    bits = bytearray(8192)
    for v in dense:
        bits[v // 8] |= 1 << (v % 8)
    payload += bits
    buf = struct.pack("<iQI", 1681511377, 1, 0) + bytes(payload)
    assert roaring64_decode(buf) == dense

    # run container: cookie 12347, one run [10, 14]
    rc = struct.pack("<I", 12347 | (0 << 16))  # 1 container
    rc += b"\x01"  # run bitset: container 0 is a run
    rc += struct.pack("<HH", 0, 4)  # key 0, cardinality-1 = 4
    rc += struct.pack("<H", 1) + struct.pack("<HH", 10, 4)
    buf = struct.pack("<iQI", 1681511377, 1, 0) + rc
    assert roaring64_decode(buf) == {10, 11, 12, 13, 14}


@pytest.fixture()
def dv_table(spark, tmp_path):
    """A plain (unmapped) table whose single data file carries a DV
    deleting row indices {1, 3}: reader v3 + deletionVectors feature."""
    d = str(tmp_path / "dvt")
    os.makedirs(os.path.join(d, "_delta_log"))
    spark.createDataFrame(
        [(i, f"r{i}") for i in range(6)], "k long, v string"
    ).coalesce(1).write.parquet(d + "/data")
    part = [f for f in os.listdir(d + "/data") if f.endswith(".parquet")][0]
    os.rename(os.path.join(d, "data", part), os.path.join(d, "part-0.parquet"))
    dv = _dv_file(d, _ser64({1, 3}), "00112233-4455-6677-8899-aabbccddeeff", prefix="ab")
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t-dv", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {"delta.enableDeletionVectors": "true"},
                      "createdTime": 0}},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 6}),
                 "deletionVector": dv}},
    ]
    with open(os.path.join(d, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return d


def test_deletion_vector_rows_filtered(spark, dv_table):
    r = DeltaLogReader(dv_table)
    df = r.to_df(spark)
    assert df.columns == ["k", "v"]
    assert {x.k for x in df.collect()} == {0, 2, 4, 5}
    assert r.snapshot().num_records() == 4  # stats net of DV cardinality


def test_deletion_vector_inline_storage(spark, dv_table):
    """Same bitmap shipped inline ('i' storage, Z85 text) — identical rows."""
    log = os.path.join(dv_table, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().strip().splitlines()
    add = json.loads(lines[2])
    bitmap = _ser64({0, 5})
    add["add"]["deletionVector"] = {
        "storageType": "i",
        "pathOrInlineDv": _z85_encode(bitmap + b"\x00" * (-len(bitmap) % 4)),
        "sizeInBytes": len(bitmap),
        "cardinality": 2,
    }
    lines[2] = json.dumps(add)
    open(log, "w").write("\n".join(lines) + "\n")
    assert {x.k for x in DeltaLogReader(dv_table).to_df(spark).collect()} == {1, 2, 3, 4}


def test_deletion_vector_corruption_refused(spark, dv_table):
    """A flipped bitmap byte fails the frame CRC; a lying cardinality
    fails the descriptor cross-check."""
    import glob

    (dv_path,) = glob.glob(os.path.join(dv_table, "ab", "deletion_vector_*.bin"))
    blob = bytearray(open(dv_path, "rb").read())
    blob[6] ^= 0xFF
    open(dv_path, "wb").write(bytes(blob))
    with pytest.raises(DeltaProtocolError, match="checksum"):
        DeltaLogReader(dv_table).to_df(spark)
    blob[6] ^= 0xFF
    open(dv_path, "wb").write(bytes(blob))

    log = os.path.join(dv_table, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().strip().splitlines()
    add = json.loads(lines[2])
    add["add"]["deletionVector"]["cardinality"] = 5
    lines[2] = json.dumps(add)
    open(log, "w").write("\n".join(lines) + "\n")
    with pytest.raises(DeltaProtocolError, match="cardinality"):
        DeltaLogReader(dv_table).to_df(spark)


# ---------------------------------------------------------------------------
# partition-column reconstitution (round 9)


def test_partition_values_reconstituted_from_log(spark, tmp_path):
    """External writers do NOT store partition columns in the data files
    (PROTOCOL.md): values live in add.partitionValues as serialized
    strings. The reader must reconstitute them with the declared types —
    including a DATE partition and a null partition value — and compose
    with deletion vectors on the same file."""
    d = str(tmp_path / "pt")
    os.makedirs(os.path.join(d, "_delta_log"))
    for i, rows in enumerate([[(1, "a"), (2, "b")], [(3, "c")], [(4, "d")]]):
        spark.createDataFrame(rows, "k long, v string").coalesce(1).write.parquet(
            d + f"/data{i}"
        )
        part = [f for f in os.listdir(d + f"/data{i}") if f.endswith(".parquet")][0]
        os.rename(os.path.join(d, f"data{i}", part), os.path.join(d, f"part-{i}.parquet"))

    def plain(name, typ):
        return {"name": name, "type": typ, "nullable": True, "metadata": {}}

    schema = {"type": "struct", "fields": [
        plain("k", "long"), plain("v", "string"),
        plain("ds", "date"), plain("region", "integer"),
    ]}
    dv = _dv_file(d, _ser64({0}), "00112233-4455-6677-8899-aabbccddee01")
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t-part", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["ds", "region"],
                      "configuration": {}, "createdTime": 0}},
        {"add": {"path": "part-0.parquet",
                 "partitionValues": {"ds": "2024-03-01", "region": "7"},
                 "size": 1, "modificationTime": 0, "dataChange": True,
                 "deletionVector": dv}},  # deletes k=1 (row 0 of this file)
        {"add": {"path": "part-1.parquet",
                 "partitionValues": {"ds": "2024-03-02", "region": None},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "part-2.parquet",
                 "partitionValues": {"ds": None, "region": "9"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(d, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    df = DeltaLogReader(d).to_df(spark)
    assert df.columns == ["k", "v", "ds", "region"]
    assert dict(df.dtypes)["ds"] == "date" and dict(df.dtypes)["region"] == "int"
    rows = {x.k: (str(x.ds), x.region) for x in df.collect()}
    assert rows == {
        2: ("2024-03-01", 7),   # k=1 removed by the DV on the same file
        3: ("2024-03-02", None),
        4: ("None", 9),
    }


# ---------------------------------------------------------------------------
# V2 spec checkpoints (round 9)


def _to_v2_checkpoint(spark, aged_table):
    """Rewrite the aged table's classic v20 checkpoint as a V2 spec
    checkpoint: a JSON top-level file (checkpointMetadata + protocol +
    metaData + txn) with the add state in a parquet sidecar under
    _delta_log/_sidecars/, the layout modern external writers produce."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log = os.path.join(aged_table, "_delta_log")
    classic = os.path.join(log, f"{20:020d}.checkpoint.parquet")
    rows = pq.read_table(classic).to_pylist()

    def unwrap(row):
        (kv,) = [(k, v) for k, v in row.items() if v is not None]
        return kv

    actions = [unwrap(r) for r in rows]
    adds = [b for k, b in actions if k == "add"]
    others = [(k, b) for k, b in actions if k != "add"]

    os.makedirs(os.path.join(log, "_sidecars"))
    sidecar_name = "sc-0001.parquet"
    pq.write_table(
        pa.Table.from_pylist([{"add": a} for a in adds]),
        os.path.join(log, "_sidecars", sidecar_name),
    )

    def clean(b):  # arrow round-trip artifacts -> plain JSON
        return json.loads(json.dumps(b, default=str))

    top = [
        {"checkpointMetadata": {"version": 20}},
        *({k: clean(b)} for k, b in others),
        {"sidecar": {"path": sidecar_name, "sizeInBytes": 1,
                     "modificationTime": 0}},
    ]
    v2 = os.path.join(log, f"{20:020d}.checkpoint.80a083e8-7026.json")
    with open(v2, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in top) + "\n")
    os.remove(classic)
    return v2


def test_v2_checkpoint_with_sidecars_reads_identically(spark, aged_table):
    want = {
        v: DeltaLogReader(aged_table).snapshot(v).files for v in (20, 22, 24)
    }
    _to_v2_checkpoint(spark, aged_table)
    r = DeltaLogReader(aged_table)
    assert r.checkpoint_version == 20
    assert os.path.basename(r._checkpoint_files[0]).endswith(".json")
    for v in (20, 22, 24):
        snap = r.snapshot(v)
        assert snap.paths == set(want[v]), f"version {v}"
        manifest = V._read_manifest(aged_table, v)
        assert snap.paths == set(manifest["files"])
    # and after aged-JSON cleanup the v2 checkpoint alone carries the state
    for v in range(20):
        os.remove(os.path.join(aged_table, "_delta_log", f"{v:020d}.json"))
    r2 = DeltaLogReader(aged_table)
    rows = {tuple(x) for x in r2.to_df(spark, 24).collect()}
    want_rows = {tuple(x) for x in V.read_version(spark, aged_table, version=24).collect()}
    assert rows == want_rows


def test_v2_checkpoint_validations(spark, aged_table):
    v2 = _to_v2_checkpoint(spark, aged_table)
    lines = open(v2).read().strip().splitlines()

    # checkpointMetadata version mismatch is corruption
    bad = [json.dumps({"checkpointMetadata": {"version": 19}})] + lines[1:]
    open(v2, "w").write("\n".join(bad) + "\n")
    with pytest.raises(DeltaProtocolError, match="checkpointMetadata"):
        DeltaLogReader(aged_table).snapshot(24)

    # sidecar without checkpointMetadata is corruption
    open(v2, "w").write("\n".join(lines[1:]) + "\n")
    with pytest.raises(DeltaProtocolError, match="without checkpointMetadata"):
        DeltaLogReader(aged_table).snapshot(24)

    # missing sidecar file is corruption
    open(v2, "w").write("\n".join(lines) + "\n")
    os.remove(os.path.join(aged_table, "_delta_log", "_sidecars", "sc-0001.parquet"))
    with pytest.raises(DeltaProtocolError, match="sidecar"):
        DeltaLogReader(aged_table).snapshot(24)


# ---------------------------------------------------------------------------
# round-10 ADVICE regressions: partitioned id-mode partitionValues keys,
# field ids nested inside arrays/maps; r11 ADVICE relaxed the DV offset
# to Option-with-validated-fallback (PROTOCOL.md types it Option)


def test_column_mapping_id_mode_partitioned_physical_pv_keys(spark, tmp_path):
    """add.partitionValues keys are PHYSICAL names whenever column mapping
    is enabled — id mode included. A partitioned id-mapped table must
    reconstitute partition values via physicalName, not the logical name
    (which would silently read NULLs)."""
    d = str(tmp_path / "idpart")
    os.makedirs(os.path.join(d, "_delta_log"))
    _id_mapped_file(spark, os.path.join(d, "part-0.parquet"),
                    ["zz_k", "zz_v"], [1, 2], [(1, "a"), (2, "b")])
    _id_mapped_file(spark, os.path.join(d, "part-1.parquet"),
                    ["qq_k", "qq_v"], [1, 2], [(3, "c")])

    def fld(name, typ, phys, fid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.physicalName": phys,
                             "delta.columnMapping.id": fid}}

    schema = {"type": "struct", "fields": [
        fld("id", "long", "col-a", 1), fld("val", "string", "col-b", 2),
        fld("day", "date", "col-p", 3),
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t-idp", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["day"],
                      "configuration": {"delta.columnMapping.mode": "id",
                                        "delta.columnMapping.maxColumnId": "3"},
                      "createdTime": 0}},
        {"add": {"path": "part-0.parquet",
                 "partitionValues": {"col-p": "2024-01-01"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "part-1.parquet",
                 "partitionValues": {"col-p": "2024-01-02"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(d, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    df = DeltaLogReader(d).to_df(spark)
    assert df.columns == ["id", "val", "day"]
    got = {(x.id, x.val, str(x.day)) for x in df.collect()}
    assert got == {(1, "a", "2024-01-01"), (2, "b", "2024-01-01"),
                   (3, "c", "2024-01-02")}
    assert dict(df.dtypes)["day"] == "date"


def test_id_mode_field_ids_inside_arrays(spark, tmp_path):
    """Field ids on struct fields NESTED INSIDE a list must be harvested
    from the footer: two files whose nested physical names differ (renamed
    between writes, ids stable) both read correctly by id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "idarr")
    os.makedirs(os.path.join(d, "_delta_log"))

    def file(path, names, rows):
        top, key, n = names
        elem = pa.struct([
            pa.field(key, pa.string(), metadata={b"PARQUET:field_id": b"6"}),
            pa.field(n, pa.int64(), metadata={b"PARQUET:field_id": b"7"}),
        ])
        fields = [
            pa.field("i", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field(top, pa.list_(elem), metadata={b"PARQUET:field_id": b"5"}),
        ]
        pq.write_table(
            pa.Table.from_pylist(
                [{"i": i, top: [{key: k, n: v} for k, v in tags]}
                 for i, tags in rows],
                schema=pa.schema(fields),
            ),
            path,
        )

    file(os.path.join(d, "part-0.parquet"), ("zz_tags", "zz_key", "zz_n"),
         [(1, [("x", 10)])])
    file(os.path.join(d, "part-1.parquet"), ("qq_tags", "qq_k", "qq_nn"),
         [(2, [("y", 20), ("z", 30)])])

    def fld(name, typ, phys, fid):
        return {"name": name, "type": typ, "nullable": True,
                "metadata": {"delta.columnMapping.physicalName": phys,
                             "delta.columnMapping.id": fid}}

    schema = {"type": "struct", "fields": [
        fld("i", "long", "col-i", 1),
        fld("tags",
            {"type": "array", "containsNull": True,
             "elementType": {"type": "struct", "fields": [
                 fld("key", "string", "col-k", 6),
                 fld("n", "long", "col-n", 7),
             ]}},
            "col-t", 5),
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "t-ida", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id",
                                        "delta.columnMapping.maxColumnId": "7"},
                      "createdTime": 0}},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "part-1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(d, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    df = DeltaLogReader(d).to_df(spark)
    assert df.columns == ["i", "tags"]
    got = {(x.i, tuple((t.key, t.n) for t in x.tags)) for x in df.collect()}
    assert got == {(1, (("x", 10),)), (2, (("y", 20), ("z", 30)))}


def test_deletion_vector_missing_offset_falls_back_to_post_version_byte(
    spark, dv_table
):
    """PROTOCOL.md types `offset` as Option (only stated absent for inline
    'i' storage); a single-DV-per-file writer may omit it. The reader
    falls back to offset 1 (right after the version byte) and lets the
    size + CRC frame checks validate the guess."""
    log = os.path.join(dv_table, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().strip().splitlines()
    add = json.loads(lines[2])
    del add["add"]["deletionVector"]["offset"]
    lines[2] = json.dumps(add)
    open(log, "w").write("\n".join(lines) + "\n")
    df = DeltaLogReader(dv_table).to_df(spark)
    assert {x.k for x in df.collect()} == {0, 2, 4, 5}


def test_deletion_vector_wrong_offset_is_caught_by_frame_checks(
    spark, dv_table
):
    """A wrong offset (explicit or guessed) cannot silently misread: the
    [len][bytes][crc32] frame checks refuse it."""
    log = os.path.join(dv_table, "_delta_log", f"{0:020d}.json")
    lines = open(log).read().strip().splitlines()
    add = json.loads(lines[2])
    add["add"]["deletionVector"]["offset"] = 3
    lines[2] = json.dumps(add)
    open(log, "w").write("\n".join(lines) + "\n")
    with pytest.raises(DeltaProtocolError, match="size mismatch|checksum"):
        DeltaLogReader(dv_table).to_df(spark)


# --- data skipping (round-11 continuation) ----------------------------------


def test_data_skipping_stats_prunes_files_not_rows(spark, tmp_path):
    """Range/equality predicates prune add actions through stats bounds;
    the pruned read composed with the same DataFrame filter is
    row-identical to the full read (skipping is IO-only)."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        prune_snapshot_files,
    )

    d = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]).repartition(1), d)
    V.commit_append(_df(spark, [(10, "x"), (11, "y")]).repartition(1), d)
    V.commit_append(_df(spark, [(20, "p")]).repartition(1), d)
    write_delta_log(d)
    r = DeltaLogReader(d)
    snap = r.snapshot()
    assert len(snap.files) == 3

    where = [("k", ">=", 10), ("k", "<", 20)]
    pruned = prune_snapshot_files(snap, where)
    assert len(pruned.files) == 1  # only the [10, 11] file survives

    full = {
        tuple(x)
        for x in r.to_df(spark).filter("k >= 10 AND k < 20").collect()
    }
    skipped = {
        tuple(x)
        for x in r.to_df(spark, where=where).filter("k >= 10 AND k < 20").collect()
    }
    assert skipped == full and full == {(10, "x"), (11, "y")}

    assert len(prune_snapshot_files(snap, [("k", "=", 20)]).files) == 1
    assert len(prune_snapshot_files(snap, [("k", "<=", 2)]).files) == 1
    assert len(prune_snapshot_files(snap, [("k", ">", 100)]).files) == 0


def test_data_skipping_partition_values_and_mapped_keys(spark, tmp_path):
    """Partition-column predicates prune through add.partitionValues —
    including a NAME-mapped table, where the keys are physical names —
    and the pruned read equals the filtered full read."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        prune_snapshot_files,
    )
    from tests.test_delta_export import _mapped_table

    d, df = _mapped_table(spark, tmp_path)  # partitioned by day, mode=name
    r = DeltaLogReader(d)
    snap = r.snapshot()
    n_files = len(snap.files)
    pruned = prune_snapshot_files(snap, [("day", "=", "2024-01-02")])
    assert 0 < len(pruned.files) < n_files

    full = {
        tuple(x)
        for x in r.to_df(spark).filter("day = '2024-01-02'").collect()
    }
    skipped = {
        tuple(x)
        for x in r.to_df(spark, where=[("day", "=", "2024-01-02")])
        .filter("day = '2024-01-02'")
        .collect()
    }
    assert skipped == full and len(full) == 1


def test_data_skipping_is_conservative_on_missing_stats_and_nulls(spark):
    """Unknown never excludes: a file without stats (or without bounds
    for the column) is kept under any data-column predicate. A NULL
    partition value excludes the file under every comparison (no row can
    satisfy it, SQL three-valued logic). Unsupported ops raise."""
    import pytest as _pytest

    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaSnapshot,
        prune_snapshot_files,
    )

    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "day", "type": "date", "nullable": True, "metadata": {}},
        ],
    }
    snap = DeltaSnapshot(
        version=0,
        schema=schema,
        partition_columns=["day"],
        files={
            "no_stats.parquet": {"partitionValues": {"day": "2024-01-01"}},
            "null_day.parquet": {
                "partitionValues": {"day": None},
                "stats": '{"numRecords":1,"minValues":{"k":5},"maxValues":{"k":5}}',
            },
            "bounded.parquet": {
                "partitionValues": {"day": "2024-01-02"},
                "stats": '{"numRecords":1,"minValues":{"k":100},"maxValues":{"k":200}}',
            },
        },
    )
    kept = prune_snapshot_files(snap, [("k", "=", 5)])
    # no_stats kept (unknown), null_day kept (k=5 in bounds), bounded pruned
    assert set(kept.files) == {"no_stats.parquet", "null_day.parquet"}

    kept = prune_snapshot_files(snap, [("day", ">=", "2024-01-01")])
    # null partition value can satisfy no comparison
    assert set(kept.files) == {"no_stats.parquet", "bounded.parquet"}

    with _pytest.raises(ValueError):
        prune_snapshot_files(snap, [("k", "!=", 5)])


def test_clustered_layout_multiplies_data_skipping(spark, tmp_path):
    """The M3 clustering discipline pays off through the reader's data
    skipping: the SAME rows in a round-robin layout keep every file under
    a range predicate (each file spans the whole key range), while a
    range-clustered layout keeps exactly the overlapping file — the
    mechanism that turns a selective predicate into O(matching files) IO
    at 100 TB."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        prune_snapshot_files,
    )

    rows = [(i, f"v{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "k int, v string")
    where = [("k", ">=", 100), ("k", "<", 200)]

    d_rand = str(tmp_path / "rand")
    V.commit_overwrite(df.repartition(4), d_rand)
    write_delta_log(d_rand)
    d_clust = str(tmp_path / "clust")
    V.commit_overwrite(df.repartitionByRange(4, "k"), d_clust)
    write_delta_log(d_clust)

    kept_rand = prune_snapshot_files(DeltaLogReader(d_rand).snapshot(), where)
    kept_clust = prune_snapshot_files(DeltaLogReader(d_clust).snapshot(), where)
    assert len(kept_rand.files) == 4  # every file overlaps [100, 200)
    assert len(kept_clust.files) == 1  # clustering made the bounds tight

    want = {(i, f"v{i}") for i in range(100, 200)}
    for d in (d_rand, d_clust):
        got = {
            tuple(x)
            for x in DeltaLogReader(d)
            .to_df(spark, where=where)
            .filter("k >= 100 AND k < 200")
            .collect()
        }
        assert got == want


def test_data_skipping_coerces_decimal_boolean_timestamp_pv(spark):
    """ADVICE r11: partition-value pruning must compare decimal/boolean
    partition columns by VALUE, not by their spec string serialization —
    lexicographically '9.5' > '10.0', which silently drops live files —
    and must normalize timestamp partition values (spec serializes with a
    space) to ISO-T so the same literal serves the partition path and the
    stats path."""
    from decimal import Decimal

    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaSnapshot,
        prune_snapshot_files,
    )

    schema = {
        "type": "struct",
        "fields": [
            {"name": "price", "type": "decimal(10,2)", "nullable": True, "metadata": {}},
            {"name": "live", "type": "boolean", "nullable": True, "metadata": {}},
            {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
    snap = DeltaSnapshot(
        version=0,
        schema=schema,
        partition_columns=["price", "live", "ts"],
        files={
            "lo.parquet": {
                "partitionValues": {
                    "price": "9.50", "live": "false",
                    "ts": "2021-01-01 00:00:00",
                },
                "stats": '{"numRecords":1,"minValues":{"k":1},"maxValues":{"k":1}}',
            },
            "hi.parquet": {
                "partitionValues": {
                    "price": "10.00", "live": "true",
                    "ts": "2021-06-01 00:00:00",
                },
                "stats": '{"numRecords":1,"minValues":{"k":2},"maxValues":{"k":2}}',
            },
        },
    )
    # decimal: numeric comparison (lexicographic would exclude hi and keep lo)
    kept = prune_snapshot_files(snap, [("price", ">", Decimal("9.90"))])
    assert set(kept.files) == {"hi.parquet"}
    # ... and a float/str literal coerces to Decimal instead of TypeError
    kept = prune_snapshot_files(snap, [("price", ">", 9.9)])
    assert set(kept.files) == {"hi.parquet"}
    kept = prune_snapshot_files(snap, [("price", "<=", "9.5")])
    assert set(kept.files) == {"lo.parquet"}
    # boolean: 'true'/'false' serialization compares against a bool literal
    kept = prune_snapshot_files(snap, [("live", "=", True)])
    assert set(kept.files) == {"hi.parquet"}
    # timestamp: one ISO-T literal works despite the space-separated pv
    kept = prune_snapshot_files(snap, [("ts", ">=", "2021-03-01T00:00:00")])
    assert set(kept.files) == {"hi.parquet"}
    # an unparseable decimal literal is unknown — keeps everything
    kept = prune_snapshot_files(snap, [("price", ">", "not-a-number")])
    assert set(kept.files) == {"lo.parquet", "hi.parquet"}


def test_data_skipping_absent_pv_key_and_unmapped_mode_none(spark):
    """ADVICE r11: an ABSENT partitionValues key is unknown (keep the
    file) — only an explicit NULL excludes; and physicalName metadata is
    honored only when columnMapping mode is name/id, so a mode='none'
    table carrying stray physicalName metadata still prunes by LOGICAL
    key instead of silently dropping every live file."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaSnapshot,
        prune_snapshot_files,
    )

    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "day",
                "type": "date",
                "nullable": True,
                # stray mapping metadata on an UNMAPPED table
                "metadata": {"delta.columnMapping.physicalName": "col-xyz"},
            },
        ],
    }
    files = {
        "present.parquet": {"partitionValues": {"day": "2024-01-02"}},
        "absent_key.parquet": {"partitionValues": {}},
        "explicit_null.parquet": {"partitionValues": {"day": None}},
    }
    snap = DeltaSnapshot(
        version=0, schema=schema, partition_columns=["day"], files=files,
        configuration={},  # mode defaults to none
    )
    kept = prune_snapshot_files(snap, [("day", "=", "2024-01-02")])
    # logical key resolves despite stray physicalName; absent key kept;
    # explicit NULL excluded
    assert set(kept.files) == {"present.parquet", "absent_key.parquet"}

    # same table with mapping ENABLED: now the physical key is the right one
    files_mapped = {
        "present.parquet": {"partitionValues": {"col-xyz": "2024-01-02"}},
        "other.parquet": {"partitionValues": {"col-xyz": "2024-01-03"}},
    }
    snap_mapped = DeltaSnapshot(
        version=0, schema=schema, partition_columns=["day"], files=files_mapped,
        configuration={"delta.columnMapping.mode": "name"},
    )
    kept = prune_snapshot_files(snap_mapped, [("day", "=", "2024-01-02")])
    assert set(kept.files) == {"present.parquet"}


# --- change feed (VERDICT r11 task #7) ---------------------------------------


def _rows_at(r, spark, v):
    return sorted((x.k, x.v) for x in r.to_df(spark, version=v).collect())


def test_read_changes_default_raises_on_change_commit(table, spark):
    r = DeltaLogReader(table)
    with pytest.raises(ValueError, match="rewrote existing rows"):
        r.read_changes(spark)


def test_read_changes_skip_change_commits_matches_reference_semantics(table, spark):
    """skipChangeCommits=true (the reference's BQ Writer choice): the
    upsert commit vanishes WHOLESALE — its adds too — and compaction is
    invisible because nothing it touches carries dataChange."""
    r = DeltaLogReader(table)
    feed = r.read_changes(spark, skip_change_commits=True)
    rows = feed.collect()
    got = sorted((x.k, x.v, x._commit_version) for x in rows)
    assert got == [(1, "a", 0), (2, "b", 0), (3, "c", 1)]
    assert all(x._change_type == "insert" for x in rows)


def test_read_changes_include_removes_replays_snapshot_transition(table, spark):
    """The delete+insert view is net-exact: applying version 2's deletes
    then inserts to snapshot(1) reproduces snapshot(2) as a multiset."""
    r = DeltaLogReader(table)
    feed = r.read_changes(
        spark, since_version=1, end_version=2, include_removes=True
    ).collect()
    assert {x._commit_version for x in feed} == {2}
    deletes = sorted((x.k, x.v) for x in feed if x._change_type == "delete")
    inserts = sorted((x.k, x.v) for x in feed if x._change_type == "insert")
    assert inserts, "the upsert added rows"
    before = _rows_at(r, spark, 1)
    after = _rows_at(r, spark, 2)
    replayed = [t for t in before if t not in deletes] + [
        t for t in inserts
    ]
    # deletes are file-granular: every delete WAS in the before-state
    for t in deletes:
        assert t in before
    assert sorted(replayed) == after


def test_read_changes_compaction_invisible_and_empty_window(table, spark):
    r = DeltaLogReader(table)
    tip = r.versions[-1]
    feed = r.read_changes(
        spark, since_version=2, end_version=tip, include_removes=True
    )
    assert feed.count() == 0
    assert {"_commit_version", "_change_type"} <= set(feed.columns)


def test_read_changes_vacuumed_remove_fails_loudly(table, spark):
    """include_removes needs the removed files on disk: after deleting a
    tombstoned data file (what an aged vacuum does), the delete-direction
    read raises instead of silently returning partial history."""
    r = DeltaLogReader(table)
    live = set(r.snapshot().files)
    all_seen = set()
    for v in r.versions:
        all_seen |= set(r.snapshot(v).files)
    removed = sorted(all_seen - live)
    assert removed
    os.remove(os.path.join(table, removed[0]))
    with pytest.raises(Exception):
        r.read_changes(
            spark, since_version=1, end_version=2, include_removes=True
        ).collect()


def test_read_changes_raises_on_cleaned_json_gap(spark, tmp_path):
    """A cleaned-up JSON gap between the replayable prefix and the
    checkpoint must RAISE, not silently skip commits: a watermarked
    consumer (delta_mirror_into) would otherwise diverge forever (r12
    review finding). Snapshot reads of checkpoint-covered versions keep
    working; only the change feed across the gap refuses."""
    d = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), d)
    for i in range(2, 13):  # versions 1..11
        V.commit_append(_df(spark, [(i, "x")]), d)
    write_delta_log(d, checkpoint_interval=10)  # checkpoint at v10
    # clean versions 4-5's JSON (aged log cleanup): prefix 0-3 replayable,
    # checkpoint covers 10+, versions 4-9 unreadable per-commit
    for v in (4, 5):
        os.remove(os.path.join(d, "_delta_log", f"{v:020d}.json"))

    r = DeltaLogReader(d)
    assert 3 in r.versions and 10 in r.versions and 4 not in r.versions
    # snapshot access still fine
    assert r.to_df(spark, version=11).count() == 12
    # the feed refuses the gap instead of returning partial history
    with pytest.raises(DeltaProtocolError, match="per-commit JSON"):
        r.read_changes(spark, since_version=3, end_version=11)
    with pytest.raises(DeltaProtocolError, match="per-commit JSON"):
        r.read_changes(spark)  # full-history bootstrap crosses the gap too
    # windows fully inside readable JSON ranges still work
    assert r.read_changes(spark, since_version=10).count() == 1
    assert {x.k for x in r.read_changes(spark, since_version=0, end_version=3).collect()} == {2, 3, 4}
