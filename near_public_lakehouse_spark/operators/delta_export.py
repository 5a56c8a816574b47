"""Delta Lake `_delta_log` export for versioned tables — the interop seam.

The reference stores every table as Delta (NB/BQ Writer Stream.py:9-15;
every ``CREATE STREAMING LIVE TABLE``). `operators/versioned.py` reproduces
the Delta CONTRACT (atomic commits, optimistic concurrency, time travel,
change feed, idempotent txn, data-skipping stats) on its own manifest log;
what it historically lacked was bytes-on-disk readable by EXTERNAL delta
readers (delta-spark, duckdb-delta, delta-rs).

This module closes that gap from the public Delta transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md): the data
files are already plain parquet under the table root, so emitting the
manifest history as `_delta_log/<20-digit version>.json` commit files —
newline-delimited protocol / metaData / add / remove / txn actions — makes
the SAME directory a readable Delta table in place. No data is copied or
rewritten; the export is control-plane only and deterministic, so it can
be re-run after every commit (idempotent overwrite of the same bytes).

Mapping (versioned manifest -> Delta actions):

  manifest "files" (full snapshot)   -> add/remove DIFF vs previous version
  manifest "schema" (StructType json)-> metaData.schemaString (same format:
                                        Delta inherited Spark's schema JSON)
  manifest "stats" rows/min/max      -> add.stats JSON (numRecords/minValues/
                                        maxValues — Delta's data-skipping)
  manifest "data_change" false       -> add/remove with dataChange: false
                                        (OPTIMIZE-style reorganization)
  manifest "txn" {app: version}      -> txn actions (idempotent writers)

Checkpoint parquet files ARE written (round 8, VERDICT r7 task #6):
`write_delta_log` emits a classic checkpoint every `checkpoint_interval`
commits — `<version>.checkpoint.parquet` holding the reconciled snapshot
actions plus the `_last_checkpoint` pointer, per PROTOCOL.md — so a
long-lived table reads back from the checkpoint + trailing JSON commits
instead of replaying hundreds of commits (real Delta tables, e.g. the
reference's `NB/BQ Writer Stream.py:9-15`, checkpoint every 10 and clean
up aged JSON; without checkpoint support a reader fails on such tables).
Expired `remove` tombstones are not carried into checkpoints (this
writer has no VACUUM coordination to serve). Still out of scope:
deletion vectors, column mapping. Readers needing only minReaderVersion 1
can read these tables.

The container deliberately has no delta-spark jar, no duckdb-delta
extension and no network, so EXTERNAL byte-validation cannot run here;
tests/test_delta_export.py instead pins the protocol structure action by
action against the spec (commit naming, action shapes, snapshot replay
equivalence, schemaString round-trip, stats fidelity), and COVERAGE.md
records the disposition.
"""

from __future__ import annotations

import json
import os
import uuid

from near_public_lakehouse_spark.operators.versioned import (
    _read_manifest,
    _versions,
)

_DELTA_LOG = "_delta_log"

# Protocol floor: plain parquet + append/remove semantics only, which is
# exactly minReaderVersion 1 / minWriterVersion 2 per PROTOCOL.md.
_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def _delta_stats(stats: dict | None) -> str | None:
    """Manifest per-file stats -> Delta `add.stats` JSON string."""
    if not stats:
        return None
    out: dict = {"numRecords": stats.get("rows")}
    if stats.get("min"):
        out["minValues"] = stats["min"]
    if stats.get("max"):
        out["maxValues"] = stats["max"]
    return json.dumps(out)


def _table_id(table_dir: str) -> str:
    """Stable table id: derived from the v0 manifest timestamp + dir name
    so re-exports emit byte-identical metaData (Delta requires the id to
    be stable across commits of one table)."""
    m0 = _read_manifest(table_dir, _versions(table_dir)[0])
    seed = f"{os.path.basename(os.path.abspath(table_dir))}|{m0['timestamp']}"
    return str(uuid.uuid5(uuid.NAMESPACE_URL, seed))


def write_delta_log(table_dir: str, checkpoint_interval: int | None = 10) -> list[str]:
    """Export the table's full manifest history as a Delta `_delta_log`.

    Returns the commit-file paths written. Idempotent: a re-run rewrites
    byte-identical commit files (all content derives from the manifests),
    so it composes with the versioned store's crash discipline — run it
    after any commit to refresh interop state.

    When `checkpoint_interval` is set (default 10, real Delta's cadence),
    a parquet checkpoint + `_last_checkpoint` pointer is also written at
    the latest version that is a positive multiple of the interval, so
    external readers replay O(interval) JSON commits instead of the full
    history.
    """
    versions = _versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"{table_dir} has no committed versions")
    log_dir = os.path.join(table_dir, _DELTA_LOG)
    os.makedirs(log_dir, exist_ok=True)
    table_id = _table_id(table_dir)

    written: list[str] = []
    prev_files: dict[str, dict] = {}
    prev_schema: str | None = None
    for v in versions:
        m = _read_manifest(table_dir, v)
        ts_ms = int(m["timestamp"] * 1000)
        data_change = bool(m.get("data_change", True))
        stats = m.get("stats", {})
        cur_files = {f: stats.get(f) for f in m["files"]}

        actions: list[dict] = []
        if v == versions[0]:
            actions.append({"protocol": _PROTOCOL})
        if m["schema"] != prev_schema:
            # metaData appears in commit 0 and again on schema evolution —
            # exactly when Delta requires a new metaData action.
            actions.append(
                {
                    "metaData": {
                        "id": table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": m["schema"],
                        "partitionColumns": [],
                        "configuration": {},
                        "createdTime": ts_ms,
                    }
                }
            )
            prev_schema = m["schema"]
        for app, txv in (m.get("txn") or {}).items():
            actions.append({"txn": {"appId": app, "version": txv, "lastUpdated": ts_ms}})
        for path in sorted(set(prev_files) - set(cur_files)):
            actions.append(
                {
                    "remove": {
                        "path": path,
                        "deletionTimestamp": ts_ms,
                        "dataChange": data_change,
                    }
                }
            )
        for path in sorted(set(cur_files) - set(prev_files)):
            st = _delta_stats(cur_files[path])
            add = {
                "path": path,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(table_dir, path))
                if os.path.exists(os.path.join(table_dir, path))
                else 0,
                "modificationTime": ts_ms,
                "dataChange": data_change,
            }
            if st:
                add["stats"] = st
            actions.append({"add": add})

        commit_path = os.path.join(log_dir, f"{v:020d}.json")
        payload = "".join(json.dumps(a, sort_keys=True) + "\n" for a in actions)
        with open(commit_path, "w") as fh:
            fh.write(payload)
        written.append(commit_path)
        prev_files = cur_files

    if checkpoint_interval:
        ckpt_v = max(
            (v for v in versions if v > 0 and v % checkpoint_interval == 0),
            default=None,
        )
        if ckpt_v is not None:
            write_checkpoint(table_dir, ckpt_v)
    return written


# ---------------------------------------------------------------------------
# Parquet checkpoints (PROTOCOL.md "Checkpoints": classic, optionally
# multi-part). The checkpoint schema mirrors the spec's action columns —
# one row per action, exactly one non-null action column per row.


def _checkpoint_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            (
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            (
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string())])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", pa.map_(pa.string(), pa.string())),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            (
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", pa.map_(pa.string(), pa.string())),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                    ]
                ),
            ),
            (
                "remove",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("deletionTimestamp", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
            (
                "txn",
                pa.struct(
                    [
                        ("appId", pa.string()),
                        ("version", pa.int64()),
                        ("lastUpdated", pa.int64()),
                    ]
                ),
            ),
        ]
    )


def _replay_full_actions(log_dir: str, version: int) -> list[dict]:
    """Reconcile JSON commits 0..version keeping FULL action bodies (the
    snapshot replay above keeps only paths): latest protocol/metaData,
    live adds, latest txn per appId."""
    protocol = None
    meta = None
    adds: dict[str, dict] = {}
    txns: dict[str, dict] = {}
    for v in range(version + 1):
        path = os.path.join(log_dir, f"{v:020d}.json")
        with open(path) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
                elif "txn" in action:
                    txns[action["txn"]["appId"]] = action["txn"]
    if protocol is None or meta is None:
        raise FileNotFoundError(f"{log_dir}: no protocol/metaData by v{version}")
    rows: list[dict] = [{"protocol": protocol}, {"metaData": meta}]
    rows += [{"txn": t} for _, t in sorted(txns.items())]
    rows += [{"add": adds[p]} for p in sorted(adds)]
    return rows


def write_checkpoint_v2(
    table_dir: str, version: int, sidecars: int = 2
) -> list[str]:
    """Write a V2 spec checkpoint (PROTOCOL.md "V2 Spec Checkpoints") —
    the reader's v2 structs run in reverse (VERDICT r10 task #7, the same
    move that produced the name-mapping writer): a UUID-named top-level
    parquet (``<v>.checkpoint.u<hex>.parquet``) holding the reconciled
    protocol/metaData/txn actions, the REQUIRED ``checkpointMetadata``
    action (version-stamped), and ``sidecar`` actions naming parquet
    files under ``_delta_log/_sidecars/`` that carry the add state
    striped ``sidecars``-ways — the layout real writers use above
    millions of files, where one massive checkpoint parquet would
    serialize the write.

    Spec note: PROTOCOL.md ties v2 checkpoints to the ``v2Checkpoint``
    table feature (protocol v3). The publish path stays on classic
    checkpoints at its (1,2)/(2,5) floor — nothing in the reference
    needs v2 writes there; this writer exists for tables that opt in.
    The repo's own protocol reader consumes the format either way, and
    ``_checkpoint_seed`` (the sync's replay shortcut) seeds from the v2
    form too (top file + sidecar add paths), falling back to full JSON
    replay on anything it cannot validate.

    Returns [top-level path, *sidecar paths]."""
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = os.path.join(table_dir, _DELTA_LOG)
    rows = _replay_full_actions(log_dir, version)
    file_rows = [r for r in rows if "add" in r or "remove" in r]
    top_rows = [r for r in rows if "add" not in r and "remove" not in r]

    sc_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    base = {f.name: f.type for f in _checkpoint_arrow_schema()}
    side_schema = pa.schema([("add", base["add"]), ("remove", base["remove"])])
    n = max(1, int(sidecars))
    sc_actions: list[dict] = []
    paths: list[str] = []
    for i in range(n):
        chunk = file_rows[i::n]
        name = f"{_uuid.uuid4()}.parquet"
        p = os.path.join(sc_dir, name)
        pq.write_table(pa.Table.from_pylist(chunk, schema=side_schema), p)
        paths.append(p)
        sc_actions.append(
            {
                "sidecar": {
                    "path": name,
                    "sizeInBytes": os.path.getsize(p),
                    "modificationTime": int(os.path.getmtime(p) * 1000),
                }
            }
        )

    top_schema = pa.schema(
        list(_checkpoint_arrow_schema())
        + [
            ("checkpointMetadata", pa.struct([("version", pa.int64())])),
            (
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                    ]
                ),
            ),
        ]
    )
    top = top_rows + [{"checkpointMetadata": {"version": version}}] + sc_actions
    # 'u' prefix keeps the middle segment non-all-digit, so readers never
    # confuse it with a classic multi-part checkpoint name
    top_path = os.path.join(
        log_dir, f"{version:020d}.checkpoint.u{_uuid.uuid4().hex}.parquet"
    )
    pq.write_table(pa.Table.from_pylist(top, schema=top_schema), top_path)

    pointer = {"version": version, "size": len(top) + len(file_rows)}
    tmp = os.path.join(log_dir, "_last_checkpoint.tmp")
    with open(tmp, "w") as fh:
        json.dump(pointer, fh)
    os.replace(tmp, os.path.join(log_dir, "_last_checkpoint"))
    return [top_path, *paths]


def write_checkpoint(table_dir: str, version: int, parts: int | None = None) -> list[str]:
    """Write a classic parquet checkpoint of the reconciled snapshot at
    `version` plus the `_last_checkpoint` pointer (PROTOCOL.md). With
    `parts`, writes a multi-part checkpoint
    (`<v>.checkpoint.<part>.<parts>.parquet`, actions striped) — the
    form real writers use above millions of files. Expired `remove`
    tombstones are not included (nothing here serves VACUUM). Returns the
    checkpoint file paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = os.path.join(table_dir, _DELTA_LOG)
    rows = _replay_full_actions(log_dir, version)
    schema = _checkpoint_arrow_schema()
    if parts:
        chunks = [rows[i::parts] for i in range(parts)]
        paths = [
            os.path.join(
                log_dir, f"{version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet"
            )
            for i in range(parts)
        ]
    else:
        chunks = [rows]
        paths = [os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")]
    for chunk, path in zip(chunks, paths):
        pq.write_table(pa.Table.from_pylist(chunk, schema=schema), path)
    pointer = {"version": version, "size": len(rows)}
    if parts:
        pointer["parts"] = parts
    tmp = os.path.join(log_dir, "_last_checkpoint.tmp")
    with open(tmp, "w") as fh:
        json.dump(pointer, fh)
    os.replace(tmp, os.path.join(log_dir, "_last_checkpoint"))
    return paths


# ---------------------------------------------------------------------------
# Directory-state sync: Delta commits for tables maintained by the
# path-based MERGE (operators/merge.py), which has no manifest store.


def _hive_decode(value: str) -> str | None:
    """Hive partition-dir value -> Delta partitionValues string (the
    spec serializes null partition values as JSON null)."""
    from urllib.parse import unquote

    if value == "__HIVE_DEFAULT_PARTITION__":
        return None
    return unquote(value)


def _checkpoint_seed(log_dir: str) -> tuple[int, dict | None, set[str]] | None:
    """Load the snapshot state at the last classic checkpoint, if one
    exists and its files are intact: (checkpoint version, metaData, live
    add paths). Returns None when there is no usable checkpoint (the
    JSON history is always complete, so the caller just replays it all).

    This bounds the per-sync replay cost to [one columnar path-column
    read + <= checkpoint_interval JSON commits] instead of O(all commits
    x all adds) JSON parsing — the term the 10x scale probe showed
    growing with table size inside an otherwise O(touched-files) publish
    (SCALE.md round-11 row). Only add PATHS are materialized (the diff
    needs nothing else); the metaData row is extracted alone."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    pointer_path = os.path.join(log_dir, "_last_checkpoint")
    try:
        with open(pointer_path) as fh:
            pointer = json.load(fh)
        v = int(pointer["version"])
        if pointer.get("parts"):
            parts = int(pointer["parts"])
            files = [
                os.path.join(
                    log_dir,
                    f"{v:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet",
                )
                for i in range(parts)
            ]
        else:
            files = [os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")]
            if not os.path.exists(files[0]):
                # V2 spec checkpoint (<v>.checkpoint.<uniqueStr>.parquet):
                # seed from its sidecar-carried add state. Sidecar names
                # come from the top file's sidecar actions; their
                # checkpointMetadata gate belongs to the READER's full
                # validation — the seed only needs the path set, and any
                # inconsistency falls through to the full JSON replay.
                import glob as _glob

                v2 = sorted(
                    f
                    for f in _glob.glob(
                        os.path.join(log_dir, f"{v:020d}.checkpoint.*.parquet")
                    )
                    if not all(
                        seg.isdigit()
                        for seg in os.path.basename(f).split(".")[2:-1]
                    )
                )
                if not v2:
                    return None
                top = pq.read_table(v2[0])
                files = []
                if "sidecar" in top.schema.names:
                    files = [
                        os.path.join(log_dir, "_sidecars", p)
                        for p in pc.struct_field(top["sidecar"], "path")
                        .drop_null()
                        .to_pylist()
                    ]
                files.insert(0, v2[0])
        meta = None
        adds: set[str] = set()
        for p in files:
            cols = [
                c for c in ("add", "metaData") if c in pq.read_schema(p).names
            ]
            t = pq.read_table(p, columns=cols)
            if "add" in cols:
                adds.update(
                    pc.struct_field(t["add"], "path").drop_null().to_pylist()
                )
            if "metaData" in cols:
                md_rows = t.filter(
                    pc.is_valid(pc.struct_field(t["metaData"], "id"))
                )["metaData"].to_pylist()
                if md_rows:
                    meta = {
                        k: val for k, val in md_rows[-1].items() if val is not None
                    }
                    if "configuration" in meta:
                        # pyarrow maps round-trip as (key, value) tuples
                        meta["configuration"] = dict(meta["configuration"])
        return v, meta, adds
    except Exception:
        return None  # missing/corrupt checkpoint: full JSON replay below


def partition_value_str(v) -> str | None:
    """Spark/hive partition-DIR serialization of a Python value. The one
    divergence from str(): booleans write lowercase ('live=true'), while
    str(True) is 'True' — matching on str() silently missed boolean
    partitions in both the sync scope test and the merge pruning literal
    (r12 review), leaving superseded generations un-tombstoned."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _log_has_removes(log_dir: str) -> bool:
    """True iff any JSON commit carries a remove ACTION. This writer
    keeps the full JSON history on disk (checkpoints are additive seeds),
    so a scan of the commit files is complete and cheap. Each line is
    parsed and checked for a top-level 'remove' key — a raw substring
    match would false-positive on a column literally named "remove" in a
    schemaString or on commitInfo prose, spuriously refusing a legitimate
    directory-walk reconcile (ADVICE r12)."""
    if not os.path.isdir(log_dir):
        return False
    for n in os.listdir(log_dir):
        if n.endswith(".json") and n[:-5].isdigit():
            with open(os.path.join(log_dir, n)) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    # Defensive parse (ADVICE r13): a truncated/corrupt
                    # line fails CLOSED (treat as has-removes — refusing
                    # a reconcile is recoverable, resurrecting tombstoned
                    # rows is not), and membership is only tested on
                    # dicts — `"remove" in <top-level JSON string>` is a
                    # substring match, the exact false-positive the r12
                    # rewrite was meant to eliminate.
                    try:
                        obj = json.loads(line)
                    except json.JSONDecodeError:
                        return True
                    if isinstance(obj, dict) and "remove" in obj:
                        return True
    return False


def _replay_json_log(log_dir: str) -> tuple[int | None, dict | None, set[str]]:
    """(last version, latest metaData, live add paths): seeded from the
    last classic checkpoint when one exists, then the JSON commits past
    it — falling back to the full JSON history (always kept by this
    writer) when no checkpoint is usable."""
    if not os.path.isdir(log_dir):
        return None, None, set()
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    meta = None
    adds: set[str] = set()
    seed_v = -1
    seed = _checkpoint_seed(log_dir)
    if seed is not None and versions and seed[0] <= versions[-1]:
        seed_v, meta, adds = seed
    for v in versions:
        if v <= seed_v:
            continue
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    adds.add(action["add"]["path"])
                elif "remove" in action:
                    adds.discard(action["remove"]["path"])
    return (versions[-1] if versions else None), meta, adds


# --- writer-side NAME-mode column mapping (VERDICT r9 task #7) -------------
# The reader's logical->physical walk (operators/delta_reader) run in
# reverse: at table creation every field gets a stable
# delta.columnMapping.id and an IDENTITY physicalName (the parquet files
# already carry the logical names — exactly what delta-spark does when
# mapping is enabled on an existing table). Later logical renames touch
# only metaData; data files and partitionValues keys keep the physical
# names forever.

_CM_ID = "delta.columnMapping.id"
_CM_PHYS = "delta.columnMapping.physicalName"

# Column mapping requires protocol (2, 5) per PROTOCOL.md.
_PROTOCOL_CM = {"minReaderVersion": 2, "minWriterVersion": 5}


def _annotate_name_mapping(schema: dict, start_id: int = 0) -> tuple[dict, int]:
    """Assign mapping ids + identity physical names to EVERY struct field
    (nested included — the spec ids all fields), preserving any ids
    already present. Returns (annotated schema, max id used)."""
    counter = start_id

    def walk_type(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                return {**t, "fields": [walk_field(f) for f in t["fields"]]}
            if t.get("type") == "array":
                return {**t, "elementType": walk_type(t["elementType"])}
            if t.get("type") == "map":
                return {
                    **t,
                    "keyType": walk_type(t["keyType"]),
                    "valueType": walk_type(t["valueType"]),
                }
        return t

    def walk_field(f):
        nonlocal counter
        md = dict(f.get("metadata") or {})
        if _CM_ID not in md:
            counter += 1
            md[_CM_ID] = counter
            md[_CM_PHYS] = f["name"]
        counter = max(counter, int(md[_CM_ID]))
        return {**f, "metadata": md, "type": walk_type(f["type"])}

    return {**schema, "fields": [walk_field(f) for f in schema["fields"]]}, counter


def _strip_mapping(schema: dict) -> dict:
    """Drop the delta.columnMapping.* metadata so a mapped schemaString can
    be compared with the producer's plain Spark schema JSON."""

    def walk_type(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                return {**t, "fields": [walk_field(f) for f in t["fields"]]}
            if t.get("type") == "array":
                return {**t, "elementType": walk_type(t["elementType"])}
            if t.get("type") == "map":
                return {
                    **t,
                    "keyType": walk_type(t["keyType"]),
                    "valueType": walk_type(t["valueType"]),
                }
        return t

    def walk_field(f):
        md = {
            k: v
            for k, v in (f.get("metadata") or {}).items()
            if not k.startswith("delta.columnMapping.")
        }
        out = {**f, "type": walk_type(f["type"])}
        if md:
            out["metadata"] = md
        else:
            out.pop("metadata", None)
        return out

    return {**schema, "fields": [walk_field(f) for f in schema["fields"]]}


def _canon(schema: dict) -> str:
    return json.dumps(schema, sort_keys=True)


def rename_delta_column(table_dir: str, renames: dict[str, str]) -> int:
    """Logical rename of top-level columns on a NAME-mapped table: one new
    commit carrying only a metaData action whose field names change while
    ids/physical names (and therefore every data file and partitionValues
    key) stay untouched — the whole point of NAME mapping. Returns the
    committed version."""
    log_dir = os.path.join(table_dir, _DELTA_LOG)
    last_v, meta, _ = _replay_json_log(log_dir)
    if meta is None:
        raise FileNotFoundError(f"{table_dir}: no Delta metaData to rename in")
    if (meta.get("configuration") or {}).get("delta.columnMapping.mode") != "name":
        raise ValueError(
            "rename_delta_column requires delta.columnMapping.mode=name "
            "(renames on an unmapped table would orphan the data files)"
        )
    schema = json.loads(meta["schemaString"])
    names = {f["name"] for f in schema["fields"]}
    missing = sorted(set(renames) - names)
    if missing:
        raise KeyError(f"no such column(s) to rename: {missing}")
    schema["fields"] = [
        {**f, "name": renames.get(f["name"], f["name"])} for f in schema["fields"]
    ]
    new_meta = {
        **meta,
        "schemaString": json.dumps(schema),
        "partitionColumns": [
            renames.get(c, c) for c in meta.get("partitionColumns", [])
        ],
    }
    version = last_v + 1
    commit = os.path.join(log_dir, f"{version:020d}.json")
    tmp = commit + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(json.dumps({"metaData": new_meta}, sort_keys=True) + "\n")
    os.replace(tmp, commit)
    return version


def sync_delta_log_from_dir(
    table_dir: str,
    schema_json: str,
    partition_columns: list[str] | tuple[str, ...] = (),
    touched_partitions: list | None = None,
    checkpoint_interval: int | None = 10,
    column_mapping: str | None = None,
    live_files: list[str] | None = None,
) -> int | None:
    """Commit the parquet directory's CURRENT file set to `_delta_log` as
    an add/remove diff against the previous Delta snapshot — the interop
    path for tables maintained by the path-based MERGE
    (`operators/merge.merge_upsert`), which swaps whole partition dirs and
    keeps no manifest log. The reference's published `public_lakehouse.*`
    tables are Delta (`NEAR Public Datasets.py:48`, every table under
    ``gs://near-lakehouse-public/mainnet/delta/``); this makes the engine's
    published directories readable by external Delta readers in place.

    `schema_json` is the Spark `StructType.json()` of the FULL row
    (partition column included) — the same JSON dialect Delta's
    schemaString uses. Partition values are reconstituted from the hive
    dir names (unquoted; ``__HIVE_DEFAULT_PARTITION__`` -> null).

    `touched_partitions`: when the caller knows which first-level
    partition values the preceding MERGE touched (merge_upsert returns
    them), the diff walks ONLY those partition dirs — per-publish cost
    O(files in touched partitions), not O(table), which is what keeps a
    daily publish viable on a 100 TB table. None = full walk.

    `live_files`: explicit table-relative live set for the diff scope,
    for tables that RETAIN superseded part-files on disk as log
    tombstones (`merge.merge_upsert_logged` returns it). A directory
    walk cannot tell a tombstone from a live file there, so the caller
    must name the live set; everything previously live in scope and not
    named is tombstoned with a `remove` action, while on-disk files the
    log already tombstoned (or never referenced — crash orphans) are
    ignored rather than resurrected as adds.

    Every `checkpoint_interval` commits a classic parquet checkpoint +
    `_last_checkpoint` pointer is written (the reference's 10-commit
    cadence). Returns the committed version, or None when the directory
    already matches the snapshot (idempotent re-sync).
    """
    import time

    log_dir = os.path.join(table_dir, _DELTA_LOG)
    last_v, meta, prev_adds = _replay_json_log(log_dir)

    # Directory-walk diffs (full or touched-scoped) cannot tell a
    # tombstoned part-file from a live one, so on a table that has EVER
    # emitted remove tombstones a walk would resurrect superseded
    # generations as adds — duplicate rows for every reader. The r12
    # review found the legacy-marker reconcile path could reach here with
    # exactly that state; the documented soundness assumption ("markers
    # predate tombstones") is now enforced instead of assumed.
    if live_files is None and _log_has_removes(log_dir):
        raise ValueError(
            f"{table_dir}: directory-walk sync refused — the log carries "
            "remove tombstones, so the walk cannot distinguish live files; "
            "pass live_files= (merge_upsert_logged returns it)"
        )

    pcol = partition_columns[0] if partition_columns else None
    if touched_partitions is not None and pcol is not None:
        touched_strs = {partition_value_str(p) for p in touched_partitions}
        part_dirs = [
            n
            for n in os.listdir(table_dir)
            if n.startswith(f"{pcol}=")
            and os.path.isdir(os.path.join(table_dir, n))
            and _hive_decode(n.split("=", 1)[1]) in touched_strs
        ]
        roots = [os.path.join(table_dir, n) for n in part_dirs]
        # Scope prior log entries by DECODED partition value, not by dir
        # existence: a touched partition whose dir vanished entirely must
        # still emit its removes, or the log keeps referencing dead files.
        def _in_scope(path: str) -> bool:
            seg = path.split("/", 1)[0]
            return seg.startswith(f"{pcol}=") and (
                _hive_decode(seg.split("=", 1)[1]) in touched_strs
            )

        prev_scope = {p for p in prev_adds if _in_scope(p)}
    else:
        roots = [table_dir]
        prev_scope = prev_adds

    if live_files is not None:
        cur_files = set(live_files)
    else:
        cur_files = set()
        for root in roots:
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames[:] = [
                    d for d in dirnames if not d.startswith(("_", "."))
                ]
                for fn in filenames:
                    if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                        cur_files.add(
                            os.path.relpath(os.path.join(dirpath, fn), table_dir)
                        )

    removed = sorted(set(prev_scope) - cur_files)
    added = sorted(cur_files - set(prev_scope))

    mapped = column_mapping == "name" or (
        meta is not None
        and (meta.get("configuration") or {}).get("delta.columnMapping.mode")
        == "name"
    )
    if column_mapping not in (None, "name"):
        raise ValueError(f"unsupported column mapping mode {column_mapping!r}")
    if (
        column_mapping == "name"
        and meta is not None
        and (meta.get("configuration") or {}).get("delta.columnMapping.mode")
        != "name"
    ):
        # Upgrading an existing unmapped table in place needs a dedicated
        # commit (protocol (2,5) + metaData with mode=name and an annotated
        # schema); silently half-applying it here would leave out-of-spec
        # metadata — the protocol action is only ever written at v0 and the
        # configuration would never gain the mode. Refuse loudly instead.
        raise ValueError(
            "column_mapping='name' requested on an existing table whose "
            "metaData has no columnMapping mode; create the table mapped "
            "from version 0 (in-place upgrades are not supported)"
        )
    protocol = _PROTOCOL_CM if mapped else _PROTOCOL
    pv_phys: dict[str, str] = {}
    if not mapped:
        schema_str, config = schema_json, {}
        schema_changed = meta is None or meta.get("schemaString") != schema_json
    else:
        incoming = json.loads(schema_json)
        if meta is None:
            annotated, max_id = _annotate_name_mapping(incoming)
            schema_str = json.dumps(annotated)
            config = {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": str(max_id),
            }
            schema_changed = True
        else:
            stored = json.loads(meta["schemaString"])
            config = dict(meta.get("configuration") or {})
            if _canon(_strip_mapping(stored)) == _canon(_strip_mapping(incoming)):
                schema_str, schema_changed = meta["schemaString"], False
            else:
                # evolution on a mapped table: NEW top-level columns get
                # fresh ids past maxColumnId; existing columns keep their
                # ids/physical names (matched by logical name — renames
                # must go through rename_delta_column, never the sync).
                stored_by_name = {f["name"]: f for f in stored["fields"]}
                gone = sorted(
                    set(stored_by_name) - {f["name"] for f in incoming["fields"]}
                )
                if gone:
                    raise ValueError(
                        f"columns {gone} vanished from a name-mapped table; "
                        "drops are unsupported and renames must use "
                        "rename_delta_column"
                    )
                merged = []
                for f in incoming["fields"]:
                    sf = stored_by_name.get(f["name"])
                    if sf is None:
                        merged.append(f)  # new column — annotated below
                        continue
                    if _canon(_strip_mapping({"type": "struct", "fields": [sf]})) != _canon(
                        _strip_mapping({"type": "struct", "fields": [f]})
                    ):
                        raise ValueError(
                            f"unsupported in-place type/shape change on mapped "
                            f"column {f['name']!r}"
                        )
                    merged.append(sf)
                start = int(config.get("delta.columnMapping.maxColumnId", 0))
                annotated, max_id = _annotate_name_mapping(
                    {**incoming, "fields": merged}, start_id=start
                )
                schema_str = json.dumps(annotated)
                config["delta.columnMapping.maxColumnId"] = str(max_id)
                schema_changed = True
        # add.partitionValues keys are PHYSICAL names on mapped tables
        pv_phys = {
            f["name"]: (f.get("metadata") or {}).get(_CM_PHYS, f["name"])
            for f in json.loads(schema_str)["fields"]
        }

    if not removed and not added and not schema_changed:
        return None

    ts_ms = int(time.time() * 1000)
    version = 0 if last_v is None else last_v + 1
    actions: list[dict] = []
    if last_v is None:
        actions.append({"protocol": protocol})
    if schema_changed:
        actions.append(
            {
                "metaData": {
                    "id": meta["id"] if meta else str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_str,
                    "partitionColumns": list(partition_columns),
                    "configuration": config,
                    "createdTime": meta.get("createdTime", ts_ms) if meta else ts_ms,
                }
            }
        )
    for path in removed:
        actions.append(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": ts_ms,
                    "dataChange": True,
                }
            }
        )
    for path in added:
        abs_path = os.path.join(table_dir, path)
        pv: dict[str, str | None] = {}
        for seg in path.split("/")[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                pv[pv_phys.get(k, k)] = _hive_decode(v)
        add = {
            "path": path,
            "partitionValues": pv,
            "size": os.path.getsize(abs_path),
            "modificationTime": int(os.path.getmtime(abs_path) * 1000),
            "dataChange": True,
        }
        try:
            import pyarrow.parquet as pq

            add["stats"] = json.dumps(
                {"numRecords": pq.ParquetFile(abs_path).metadata.num_rows}
            )
        except Exception:
            pass  # stats are optional data-skipping hints
        actions.append({"add": add})

    commit = os.path.join(log_dir, f"{version:020d}.json")
    os.makedirs(log_dir, exist_ok=True)
    tmp = commit + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("".join(json.dumps(a, sort_keys=True) + "\n" for a in actions))
    os.replace(tmp, commit)

    if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
        write_checkpoint(table_dir, version)
    return version


def vacuum_delta_table(table_dir: str, retain_last: int = 7) -> list[str]:
    """Retention-windowed VACUUM for an exported Delta table (mirror of
    `versioned.vacuum`; reference pairs every scheduled MERGE with
    OPTIMIZE/VACUUM — `NB/Epochs and validators Silver Pipeline.py:95-96`
    and 6 sibling sites): delete every on-disk data file NOT referenced
    by any of the last `retain_last` readable snapshots — superseded
    part-files whose tombstones aged past the retention window, plus
    crash orphans no version ever referenced. Returns the deleted
    table-relative paths, sorted.

    Invariants (pinned by the protocol-validator tests):
    - never deletes a file any retained snapshot references, so time
      travel INSIDE the window keeps replaying byte-identically;
    - log JSONs are kept — history stays listable; reading a vacuumed
      version fails at file-access time with an explicit missing file,
      exactly Delta's behavior;
    - bounds directory growth: after vacuum, on-disk data files =
      union of the retained snapshots' live sets.

    Single-writer assumption, like Delta's own VACUUM: don't run it
    concurrently with a publish (an in-flight publish's not-yet-committed
    files would look like orphans)."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaLogReader,
    )

    # The LATEST snapshot is never eligible regardless of retention —
    # Delta's VACUUM contract. retain_last=0 would otherwise protect
    # NOTHING and delete the current table's every data file (r12 review).
    if retain_last < 1:
        raise ValueError(
            f"retain_last must be >= 1 (got {retain_last}): the latest "
            "snapshot's files are never vacuum-eligible"
        )
    reader = DeltaLogReader(table_dir)
    keep = reader.versions[-retain_last:]
    protected: set[str] = set()
    for v in keep:
        protected.update(reader.snapshot(v).files)

    removed: list[str] = []
    for dirpath, dirnames, filenames in os.walk(table_dir):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for fn in filenames:
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                rel = os.path.relpath(os.path.join(dirpath, fn), table_dir)
                if rel not in protected:
                    os.remove(os.path.join(dirpath, fn))
                    removed.append(rel)
    # A publish that crashed between staging and install leaves the
    # SIBLING '<table>.__merge_tmp__' dir holding a full copy of the
    # merged partitions; it is never log-referenced, and only a re-merge
    # of the same table would otherwise reclaim it (r12 review). Safe
    # under this function's documented no-concurrent-publish assumption.
    tmp = table_dir.rstrip("/") + ".__merge_tmp__"
    if os.path.isdir(tmp):
        import shutil

        shutil.rmtree(tmp)
    # drop partition dirs the deletions emptied (cosmetic: readers use
    # the log, but a bare `col=value` dir with no files confuses humans)
    for name in os.listdir(table_dir):
        p = os.path.join(table_dir, name)
        if os.path.isdir(p) and "=" in name and not os.listdir(p):
            os.rmdir(p)
    return sorted(removed)


def read_delta_snapshot(table_dir: str, version: int | None = None) -> dict:
    """Replay a `_delta_log` the way an external reader would (PROTOCOL.md
    action reconciliation): latest metaData wins, add/remove tombstone by
    path. Returns {"version", "schema", "files"}. Used by the structural
    tests to prove snapshot equivalence with the manifest store — and
    usable as a minimal in-repo Delta reader for foreign tables that fit
    the supported protocol floor."""
    log_dir = os.path.join(table_dir, _DELTA_LOG)
    commits = sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    if version is not None:
        commits = [c for c in commits if c <= version]
    files: set[str] = set()
    schema = None
    protocol = None
    for c in commits:
        with open(os.path.join(log_dir, f"{c:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                    if protocol["minReaderVersion"] > 1:
                        raise NotImplementedError(
                            f"reader version {protocol['minReaderVersion']} > 1"
                        )
                elif "metaData" in action:
                    schema = action["metaData"]["schemaString"]
                elif "add" in action:
                    files.add(action["add"]["path"])
                elif "remove" in action:
                    files.discard(action["remove"]["path"])
    return {"version": commits[-1] if commits else None, "schema": schema, "files": files}
