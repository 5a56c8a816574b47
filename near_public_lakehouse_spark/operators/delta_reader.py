"""Independent pure-Python Delta transaction-log reader.

This is the in-container approximation of external byte-validation for
`operators/delta_export.write_delta_log` (VERDICT r5 task #5): the
container has no delta-spark jar, no duckdb-delta extension and no
network, so no third-party reader can check the exported `_delta_log`.
This module plays that role from inside: it implements the commit-replay
rules of the PUBLIC Delta protocol spec
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) from scratch
— it deliberately imports NOTHING from `delta_export` or `versioned`, and
validates shapes strictly rather than trusting the writer:

- commit discovery: `_delta_log/<20-digit zero-padded version>.json`,
  contiguous replay from version 0 (a gap is corruption and raises);
- action reconciliation: latest `metaData` wins; `add` puts a path into
  the snapshot (last add wins for a re-added path); `remove` tombstones
  it; `txn` tracks the latest version per appId;
- protocol gating: reader versions beyond what this reader implements
  (v1/v2, v3 only with supported readerFeatures — columnMapping,
  deletionVectors, v2Checkpoint) raise —
  reading on anyway could silently return wrong rows, which is exactly
  what a real reader must not do;
- strict field checks: every `add` must carry path/partitionValues/size/
  modificationTime/dataChange per the spec's required-field table; an
  unknown action key raises instead of being skipped.

`snapshot()` reconstructs the file set + schema at any version;
`to_df()` reads the reconstructed parquet file list through Spark — the
actual data-access path an external engine would take. The round-trip
test (tests/test_delta_reader.py) cross-validates every version of real
exported tables against the versioned manifest store: same files, same
schema, same rows.

Checkpoint-parquet support (round 8, VERDICT r7 task #6): when
`_delta_log/_last_checkpoint` exists, the reader loads the referenced
classic checkpoint (single- or multi-part,
`<v>.checkpoint[.<part>.<parts>].parquet`), treats its action rows as
the base state at the checkpoint version, and replays only the trailing
JSON commits — so a long-lived table whose aged JSON commits were
cleaned up (real Delta checkpoints every 10 commits and expires old
JSON) still reads correctly, and a table with a full JSON history reads
identically either way (pinned in tests/test_delta_reader.py). Time
travel BEFORE the checkpoint still requires the JSON commits from
version 0 and raises if they are gone. Checkpoint rows must have exactly
one non-null action column per the spec; violations raise.

Column mapping (round 9): reader versions 2 and 3-with-readerFeatures
⊆ {columnMapping} are accepted; `to_df` resolves NAME-mode mapping by
building the physical parquet schema from each field's
`delta.columnMapping.physicalName` metadata (recursively through
structs/arrays/maps) and projecting back to logical names — so tables
rewritten under `delta.columnMapping.mode = name` (the mode modern
writers set on column rename/drop) read correctly. ID-mode matching reads
by parquet footer field ids (see below).

Deletion vectors (round 9): `add.deletionVector` descriptors are
honored — inline ('i', Z85 text), UUID-relative ('u') and absolute
('p') storage; the DV file frame (version byte, BE length + bitmap +
CRC-32 at `offset`) and the RoaringBitmapArray portable bitmap
(array/bitmap/run containers) are decoded from the public specs, and
`to_df` anti-joins the deleted (file, row_index) pairs against
parquet's `_metadata` row identity. `num_records` nets out DV
cardinality. Reader v3 + readerFeatures ["deletionVectors"] accepted.

Partition-column reconstitution (round 9): columns listed in
partitionColumns are never read from data files — per-file values come
from add.partitionValues (spec string serialization, cast to the
declared types, nulls honored), attached by a bounded one-row-per-file
broadcast on parquet _metadata file identity; composes with DVs and
NAME mapping (physical partitionValues keys).

V2 spec checkpoints (round 9): `<v>.checkpoint.<unique>.{json,parquet}`
top-level files are discovered when no classic checkpoint exists at the
pointer version; the required checkpointMetadata action is
version-validated, sidecar actions pull add/remove state from parquet
files under `_delta_log/_sidecars/`, and missing/mismatched pieces are
corruption, never a partial read.

ID-mode column mapping (round 9): table columns match parquet columns
by FIELD ID from each file's footer (bounded driver metadata reads);
files are grouped by their id->name maps so renamed-between-writes
physical columns read correctly, with physicalName fallback for files
carrying no ids. With this, every reader feature the protocol defines
for versions 1-3 that this repo's tables can encounter is implemented;
nothing remains on the reader floor.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

_LOG = "_delta_log"
_KNOWN_ACTIONS = {"protocol", "metaData", "add", "remove", "txn", "commitInfo", "cdc"}
_ADD_REQUIRED = {"path", "partitionValues", "size", "modificationTime", "dataChange"}
# reader v1 = base; v2 = column mapping; v3 = table features, gated on the
# explicit readerFeatures list (PROTOCOL.md "Reader Requirements")
_SUPPORTED_READER_FEATURES = {"columnMapping", "deletionVectors", "v2Checkpoint"}
_MAX_READER_VERSION = 3


class DeltaProtocolError(RuntimeError):
    """Log violates the protocol contract (or needs features we lack)."""


@dataclass
class DeltaSnapshot:
    version: int
    schema: dict | None
    partition_columns: list[str]
    files: dict[str, dict] = field(default_factory=dict)  # path -> add action
    txns: dict[str, int] = field(default_factory=dict)
    protocol: dict | None = None
    configuration: dict = field(default_factory=dict)  # latest metaData configuration

    @property
    def paths(self) -> set[str]:
        return set(self.files)

    def num_records(self) -> int | None:
        """Sum of add.stats numRecords net of deletion-vector cardinality,
        or None if any file lacks stats."""
        total = 0
        for a in self.files.values():
            st = a.get("stats")
            if not st:
                return None
            n = json.loads(st).get("numRecords")
            if n is None:
                return None
            total += n - (a.get("deletionVector") or {}).get("cardinality", 0)
        return total


_PRUNE_OPS = ("=", "<", "<=", ">", ">=", "in")


def _decoded_file_path(F):
    """`_metadata.file_path` as a RAW filesystem path expression:
    Spark reports a URI (space -> %20 etc.) while the DV row pairs and
    partition-value frames carry os.path.abspath strings — one encoded
    character made every identity match miss, silently resurrecting
    DV-deleted rows and nulling reconstituted partition columns (r14
    review). url_decode undoes %XX; '+' is pre-escaped because it is a
    LITERAL in a URI path but decodes to space under form rules."""
    return F.url_decode(
        F.regexp_replace(F.col("_metadata.file_path"), r"\+", "%2B")
    )


def _parse_ts(v):
    """ISO-ish timestamp string -> tz-aware datetime (naive = UTC, the
    Delta stats convention), or None when unparseable. Lexicographic
    comparison of timestamp stats mis-prunes when an external writer
    emits fractional-seconds or zone suffixes ('...00.000Z' >
    '...00') — r14 review; datetimes compare chronologically."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        dt = v
    elif isinstance(v, str):
        try:
            dt = _dt.datetime.fromisoformat(
                v.strip().replace(" ", "T", 1).replace("Z", "+00:00")
            )
        except ValueError:
            return None
    else:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return dt


def _excluded_by_bounds(op: str, lo, hi, v) -> bool:
    """True iff NO x with lo <= x <= hi can satisfy `x op v`. A missing
    bound (None) is unbounded on that side, so exclusion is never
    provable through it — the conservative direction."""
    if op == "in":
        # v is a collection of candidate literals: excluded only when
        # EVERY candidate is provably outside [lo, hi].
        return all(_excluded_by_bounds("=", lo, hi, x) for x in v)
    if op == "=":
        return (lo is not None and v < lo) or (hi is not None and v > hi)
    if op == "<":
        return lo is not None and lo >= v
    if op == "<=":
        return lo is not None and lo > v
    if op == ">":
        return hi is not None and hi <= v
    if op == ">=":
        return hi is not None and hi < v
    raise ValueError(f"unsupported prune op {op!r} (use one of {_PRUNE_OPS})")


def prune_snapshot_files(snap: DeltaSnapshot, where) -> DeltaSnapshot:
    """Delta data skipping on the snapshot's add actions: drop every file
    that PROVABLY contains no row satisfying ALL of `where`
    ([(logical_col, op, literal)], op in =/</<=/>/>=/'in'). The 'in' op
    takes a list literal and is NULL-SAFE: a None member means "or the
    column is NULL", so an explicit-NULL partition file is KEPT when (and
    only when) None is in the list — the shape merge_upsert_logged uses
    to scope its target read. Evidence used:

    - add.partitionValues for partition columns (spec string
      serialization; numeric/decimal/boolean columns are coerced before
      comparing, dates and strings compare lexicographically —
      chronological for ISO dates; timestamp values are normalized to
      ISO-T so one literal serves both the partition and the stats path;
      an EXPLICIT NULL partition value excludes the file under any
      comparison per SQL three-valued logic, but an ABSENT
      partitionValues key is unknown and never excludes; a type this
      pruner can't provably compare — or a literal incomparable with the
      coerced value — keeps the file), and
    - add.stats minValues/maxValues for data columns. Pruning on stored
      bounds is safe for ANY protocol-compliant writer: the spec requires
      stored min <= true min and stored max >= true max (string
      truncation widens, never narrows, the interval).

    Files with missing stats/bounds are KEPT (unknown never excludes), so
    composing `to_df(where=...)` with the same DataFrame-level filter is
    always row-identical to the unpruned read — skipping is an IO
    optimization, not a semantic filter. Column-mapped tables resolve
    partitionValues/stats keys through physicalName, same as to_df.
    Returns a new snapshot sharing everything but `files`."""
    if not where:
        return snap
    import decimal as _dec

    fields = {f["name"]: f for f in (snap.schema or {}).get("fields", [])}
    # partitionValues/stats keys are PHYSICAL names only when column
    # mapping is actually enabled — same gate as to_df's pv_key. A
    # mode='none' table that still carries physicalName metadata (e.g.
    # copied schema JSON) must be looked up by LOGICAL name, else every
    # live file silently prunes away.
    mapping_on = snap.configuration.get(
        "delta.columnMapping.mode", "none"
    ) in ("name", "id")

    _UNKNOWN = object()  # sentinel: not provably comparable → keep file

    def phys_key(col: str) -> str:
        if not mapping_on:
            return col
        f = fields.get(col, {})
        return (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", col
        )

    def coerce_pv(col: str, raw: str):
        """Spec string serialization → comparable Python value, or
        _UNKNOWN when this pruner can't prove the comparison sound
        (unknown never excludes)."""
        t = fields.get(col, {}).get("type")
        if not isinstance(t, str):
            return _UNKNOWN  # nested/complex partition type: keep
        try:
            if t in ("byte", "short", "integer", "long"):
                return int(raw)
            if t in ("float", "double"):
                return float(raw)
            if t.startswith("decimal"):
                return _dec.Decimal(raw)
            if t == "boolean":
                return raw == "true"
            if t.startswith("timestamp"):
                # spec serializes pv as '2021-01-01 00:00:00'; parse to a
                # datetime so comparison is chronological, not
                # lexicographic (r14 review)
                ts = _parse_ts(raw)
                return ts if ts is not None else _UNKNOWN
            if t in ("string", "date"):
                return raw  # ISO dates compare lexicographically == chronologically
        except (ValueError, ArithmeticError):
            return _UNKNOWN  # unparseable serialization: keep
        return _UNKNOWN  # binary & anything else: keep

    def coerce_lit(col: str, v):
        """Literal -> the SAME comparable domain coerce_pv maps the
        partition value into, accepting native Python values AND their
        string serializations (callers like merge_upsert_logged pass
        str(p)). Asymmetry here silently disabled skipping for every
        numeric/boolean partition type — int pv vs string literal raises
        TypeError, which the pruner swallows as 'keep every file', an
        O(table) read where O(touched) was promised (r12 review)."""
        t = fields.get(col, {}).get("type")
        if isinstance(t, str):
            try:
                if t in ("byte", "short", "integer", "long"):
                    return int(v)
                if t in ("float", "double"):
                    return float(v)
                if t.startswith("decimal"):
                    return _dec.Decimal(str(v))
                if t == "boolean":
                    if isinstance(v, bool):
                        return v
                    if isinstance(v, str):
                        return v.lower() == "true"
                    return _UNKNOWN
                if t.startswith("timestamp"):
                    ts = _parse_ts(v)
                    return ts if ts is not None else _UNKNOWN
            except (ValueError, TypeError, ArithmeticError):
                return _UNKNOWN
        return v

    def coerce_lits(col: str, op: str, v):
        """Coerce the literal (or, for 'in', each non-null member)."""
        if op != "in":
            return coerce_lit(col, v)
        out = []
        for x in v:
            if x is None:
                continue  # null membership handled at the pv branch
            cx = coerce_lit(col, x)
            if cx is _UNKNOWN:
                return _UNKNOWN
            out.append(cx)
        return out

    pnames = set(snap.partition_columns)
    kept: dict[str, dict] = {}
    for rel, a in snap.files.items():
        st = None
        excluded = False
        for col, op, v in where:
            if op not in _PRUNE_OPS:
                raise ValueError(f"unsupported prune op {op!r}")
            key = phys_key(col)
            lit = coerce_lits(col, op, v)
            if lit is _UNKNOWN:
                continue
            if col in pnames:
                pvs = a.get("partitionValues") or {}
                if key not in pvs:
                    continue  # absent key: unknown never excludes
                raw = pvs[key]
                if raw is None:
                    # explicit NULL: no comparison holds — except a
                    # null-safe 'in' whose candidate list contains None
                    # (the caller's partition fence uses isNull()).
                    if op == "in" and any(x is None for x in v):
                        continue
                    excluded = True
                    break
                pv = coerce_pv(col, raw)
                if pv is _UNKNOWN:
                    continue
                try:
                    if _excluded_by_bounds(op, pv, pv, lit):
                        excluded = True
                        break
                except TypeError:
                    continue  # incomparable literal/value types: keep
            else:
                if st is None:
                    st = json.loads(a["stats"]) if a.get("stats") else {}
                if op == "in" and any(x is None for x in v):
                    # null-safe IN on a DATA column: the file may hold
                    # NULL rows the bounds can't see (bounds only cover
                    # non-null values). Exclusion needs nullCount == 0;
                    # without it, keep (r14 review — a [None]-only list
                    # previously pruned EVERY file vacuously).
                    nc = (st.get("nullCount") or {}).get(key)
                    if not isinstance(nc, int) or nc > 0:
                        continue
                lo = (st.get("minValues") or {}).get(key)
                hi = (st.get("maxValues") or {}).get(key)
                t = fields.get(col, {}).get("type")
                if isinstance(t, str) and t.startswith("timestamp"):
                    # unparseable bound -> None = unbounded (never
                    # excludes through that side)
                    lo, hi = _parse_ts(lo), _parse_ts(hi)
                try:
                    if _excluded_by_bounds(op, lo, hi, lit):
                        excluded = True
                        break
                except TypeError:
                    continue  # incomparable stats bounds: keep
        if not excluded:
            kept[rel] = a
    return DeltaSnapshot(
        version=snap.version,
        schema=snap.schema,
        partition_columns=snap.partition_columns,
        files=kept,
        txns=snap.txns,
        protocol=snap.protocol,
        configuration=snap.configuration,
    )


class DeltaLogReader:
    """Replays a `_delta_log` directory according to PROTOCOL.md."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        log_dir = os.path.join(table_dir, _LOG)
        if not os.path.isdir(log_dir):
            raise FileNotFoundError(f"{table_dir} has no {_LOG}")
        self._log_dir = log_dir
        versions = []
        for name in os.listdir(log_dir):
            if name.endswith(".json") and len(name) == 25 and name[:20].isdigit():
                versions.append(int(name[:20]))
        self._json_versions = sorted(versions)
        self.checkpoint_version, self._checkpoint_files = self._discover_checkpoint()
        cv = self.checkpoint_version
        if not versions and cv is None:
            raise DeltaProtocolError(f"{log_dir} contains no commit files")
        # Readable range: with a checkpoint, [cv, hi] is always readable
        # (plus any older versions whose full JSON prefix survives);
        # without one, the JSON history must be contiguous from its start.
        if cv is None:
            lo, hi = self._json_versions[0], self._json_versions[-1]
            if self._json_versions != list(range(lo, hi + 1)):
                raise DeltaProtocolError(
                    f"commit versions not contiguous: {self._json_versions}"
                )
            self.versions = self._json_versions
        else:
            trailing = [v for v in self._json_versions if v > cv]
            hi = trailing[-1] if trailing else cv
            if trailing != list(range(cv + 1, hi + 1)):
                raise DeltaProtocolError(
                    f"commits after checkpoint v{cv} not contiguous: {trailing}"
                )
            # versions readable from the checkpoint, plus any pre-checkpoint
            # versions still fully replayable from v0 JSON commits
            json_set = set(self._json_versions)
            replayable_prefix = []
            for v in range(cv):
                if v in json_set:
                    replayable_prefix.append(v)
                else:
                    break
            self.versions = replayable_prefix + list(range(cv, hi + 1))

    def _discover_checkpoint(self) -> tuple[int | None, list[str]]:
        """Honor `_last_checkpoint`: return (version, ordered part paths),
        or (None, []) if no checkpoint exists. A pointer naming missing
        files is corruption and raises."""
        pointer = os.path.join(self._log_dir, "_last_checkpoint")
        if not os.path.exists(pointer):
            return None, []
        with open(pointer) as fh:
            meta = json.load(fh)
        if not isinstance(meta, dict) or type(meta.get("version")) is not int:
            raise DeltaProtocolError(f"malformed _last_checkpoint: {meta!r}")
        v = meta["version"]
        parts = meta.get("parts")
        # r8 ADVICE: a corrupt pointer with a non-int / non-positive `parts`
        # must take the documented corruption path, not a raw TypeError
        # from range()/format().
        if parts is not None and (type(parts) is not int or parts < 1):
            raise DeltaProtocolError(f"malformed _last_checkpoint: {meta!r}")
        if parts:
            files = [
                os.path.join(
                    self._log_dir,
                    f"{v:020d}.checkpoint.{i:010d}.{parts:010d}.parquet",
                )
                for i in range(1, parts + 1)
            ]
        else:
            classic = os.path.join(self._log_dir, f"{v:020d}.checkpoint.parquet")
            if os.path.exists(classic):
                files = [classic]
            else:
                # V2 spec checkpoint: <v>.checkpoint.<uniqueStr>.{json,parquet}.
                # Any complete one is valid; pick deterministically.
                import glob as _glob

                v2 = sorted(
                    f
                    for pat in ("json", "parquet")
                    for f in _glob.glob(
                        os.path.join(self._log_dir, f"{v:020d}.checkpoint.*.{pat}")
                    )
                    # exclude classic multi-part names (all-digit middle parts)
                    if not all(
                        seg.isdigit()
                        for seg in os.path.basename(f).split(".")[2:-1]
                    )
                )
                if not v2:
                    raise DeltaProtocolError(
                        f"_last_checkpoint points at v{v} but no checkpoint file exists"
                    )
                files = [v2[0]]
        for f in files:
            if not os.path.exists(f):
                raise DeltaProtocolError(
                    f"_last_checkpoint points at v{v} but {os.path.basename(f)} is missing"
                )
        return v, files

    @staticmethod
    def _from_arrow(value, typ):
        """Normalize pyarrow .to_pylist() output to plain JSON shapes,
        SCHEMA-AWARE (r8 ADVICE): map types surface as lists of
        (key, value) tuples -> dicts, and the arrow type — not the value
        shape — decides, so an EMPTY map (e.g. add.partitionValues or
        metaData.configuration on an unpartitioned table) becomes {},
        byte-equal to the JSON-replay snapshot, never []. None struct
        fields (absent optionals like add.stats) are dropped."""
        import pyarrow as pa

        if value is None:
            return None
        if pa.types.is_map(typ):
            return {
                k: DeltaLogReader._from_arrow(v, typ.item_type) for k, v in value
            }
        if pa.types.is_struct(typ):
            return {
                f.name: DeltaLogReader._from_arrow(value.get(f.name), f.type)
                for f in typ
                if value.get(f.name) is not None
            }
        if pa.types.is_list(typ) or pa.types.is_large_list(typ):
            return [DeltaLogReader._from_arrow(v, typ.value_type) for v in value]
        return value

    def _raw_checkpoint_rows(self, path):
        """(key, body) per row of one checkpoint file — parquet (arrow-
        normalized) or JSON-lines (v2 checkpoints may be either)."""
        if path.endswith(".json"):
            with open(path) as fh:
                for ln, line in enumerate(fh, 1):
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if len(action) != 1:
                        raise DeltaProtocolError(
                            f"{os.path.basename(path)}:{ln}: checkpoint row must "
                            f"have exactly one action, got {sorted(action)}"
                        )
                    (key,) = action
                    yield key, action[key]
            return
        import pyarrow.parquet as pq

        table = pq.read_table(path)
        schema = table.schema
        for row in table.to_pylist():
            present = [(k, v) for k, v in row.items() if v is not None]
            if len(present) != 1:
                raise DeltaProtocolError(
                    f"{os.path.basename(path)}: checkpoint row must have "
                    f"exactly one non-null action, got {[k for k, _ in present]}"
                )
            key, body = present[0]
            yield key, self._from_arrow(body, schema.field(key).type)

    def _checkpoint_actions(self):
        """Yield (key, body) for every action in the checkpoint. V2 spec
        checkpoints (PROTOCOL.md "V2 Spec Checkpoints") carry a required
        checkpointMetadata action whose version must equal the checkpoint
        version, plus sidecar actions naming parquet files under
        `_delta_log/_sidecars/` that hold the add/remove state; classic
        checkpoints inline everything."""
        saw_ckpt_meta = False
        sidecars = []
        for path in self._checkpoint_files:
            for key, body in self._raw_checkpoint_rows(path):
                if key == "checkpointMetadata":
                    if body.get("version") != self.checkpoint_version:
                        raise DeltaProtocolError(
                            f"checkpointMetadata.version {body.get('version')} != "
                            f"checkpoint version {self.checkpoint_version}"
                        )
                    saw_ckpt_meta = True
                    continue
                if key == "sidecar":
                    sidecars.append(body)
                    continue
                if key not in _KNOWN_ACTIONS:
                    raise DeltaProtocolError(
                        f"{os.path.basename(path)}: unknown action {key!r}"
                    )
                yield key, body
        for sc in sidecars:
            if not saw_ckpt_meta:
                raise DeltaProtocolError(
                    "sidecar action in a checkpoint without checkpointMetadata"
                )
            sc_path = os.path.join(self._log_dir, "_sidecars", sc["path"])
            if not os.path.exists(sc_path):
                raise DeltaProtocolError(
                    f"sidecar file {sc['path']} named by the checkpoint is missing"
                )
            for key, body in self._raw_checkpoint_rows(sc_path):
                if key not in ("add", "remove"):
                    raise DeltaProtocolError(
                        f"sidecar {sc['path']}: only add/remove allowed, got {key!r}"
                    )
                yield key, body

    def _actions(self, version: int):
        path = os.path.join(self._log_dir, f"{version:020d}.json")
        with open(path) as fh:
            for ln, line in enumerate(fh, 1):
                if not line.strip():
                    continue
                action = json.loads(line)
                if len(action) != 1:
                    raise DeltaProtocolError(
                        f"{path}:{ln}: action must have exactly one key, "
                        f"got {sorted(action)}"
                    )
                (key,) = action
                if key not in _KNOWN_ACTIONS:
                    raise DeltaProtocolError(f"{path}:{ln}: unknown action {key!r}")
                yield key, action[key]

    def snapshot(self, version: int | None = None) -> DeltaSnapshot:
        """Reconstruct table state at `version` (default: latest) — from
        the checkpoint + trailing JSON commits when a checkpoint covers
        the requested version, else by full JSON replay from v0."""
        if version is None:
            version = self.versions[-1]
        if version not in self.versions:
            raise DeltaProtocolError(
                f"version {version} not readable: available {self.versions}"
            )
        snap = DeltaSnapshot(version=version, schema=None, partition_columns=[])
        cv = self.checkpoint_version
        if cv is not None and version >= cv:
            action_stream = self._checkpoint_actions()
            replay = range(cv + 1, version + 1)
        else:
            action_stream = iter(())
            replay = range(version + 1)
        for key, body in action_stream:
            self._apply(snap, key, body)
        for v in replay:
            for key, body in self._actions(v):
                self._apply(snap, key, body)
        if snap.protocol is None:
            raise DeltaProtocolError("log never declared a protocol action")
        if snap.schema is None:
            raise DeltaProtocolError("log never declared a metaData action")
        return snap

    def _apply(self, snap: DeltaSnapshot, key: str, body: dict) -> None:
        if key == "protocol":
            snap.protocol = body
            mrv = body.get("minReaderVersion", 1)
            if mrv > _MAX_READER_VERSION:
                raise DeltaProtocolError(
                    f"needs reader version {mrv}, "
                    f"this reader supports {_MAX_READER_VERSION}"
                )
            if mrv == 3:
                if "readerFeatures" not in body:
                    raise DeltaProtocolError(
                        "reader version 3 requires an explicit readerFeatures "
                        "list (PROTOCOL.md table features); refusing to guess"
                    )
                unsupported = set(body["readerFeatures"]) - _SUPPORTED_READER_FEATURES
                if unsupported:
                    raise DeltaProtocolError(
                        f"unsupported reader features {sorted(unsupported)}; "
                        f"this reader supports {sorted(_SUPPORTED_READER_FEATURES)}"
                    )
        elif key == "metaData":
            fmt = body.get("format", {})
            if fmt.get("provider") != "parquet":
                raise DeltaProtocolError(
                    f"unsupported format provider {fmt.get('provider')!r}"
                )
            snap.schema = json.loads(body["schemaString"])
            snap.partition_columns = list(body.get("partitionColumns", []))
            snap.configuration = dict(body.get("configuration") or {})
        elif key == "add":
            missing = _ADD_REQUIRED - set(body)
            if missing:
                raise DeltaProtocolError(
                    f"add action missing required fields {sorted(missing)}"
                )
            snap.files[body["path"]] = body
        elif key == "remove":
            snap.files.pop(body["path"], None)
        elif key == "txn":
            snap.txns[body["appId"]] = body["version"]
        # commitInfo / cdc are informational — ignored per spec

    def to_df(self, spark, version: int | None = None, where=None, paths=None):
        """The data-access path an external engine takes: read exactly the
        snapshot's parquet file list. Empty snapshot -> empty DataFrame
        with the declared schema. Composes, in order: partition-column
        RECONSTITUTION (per PROTOCOL.md, data files do not store columns
        listed in partitionColumns — values come from add.partitionValues,
        cast per the Partition Value Serialization rules), deletion-vector
        row filtering, and column-mapping resolution — NAME mode via the
        physicalName metadata, ID mode via parquet footer field ids
        (per-file-group matching with physicalName fallback).

        `where` ([(col, op, literal)]) turns on Delta DATA SKIPPING: add
        actions whose partitionValues / stats bounds prove the predicate
        false are never read (see prune_snapshot_files). It prunes IO
        only — the caller still applies the real filter; the result is a
        superset of the matching rows exactly as with the full read.

        `paths` (set of table-relative paths) restricts the read to those
        of the snapshot's files — the change-feed seam (`read_changes`):
        per-commit adds/removes read with the FULL snapshot machinery
        (DVs, column mapping, partition reconstitution) instead of a bare
        parquet read that would miss all three."""
        from pyspark.sql.types import StructType

        snap = self.snapshot(version)
        if paths is not None:
            unknown = set(paths) - set(snap.files)
            if unknown:
                raise DeltaProtocolError(
                    f"paths not in snapshot v{snap.version}: {sorted(unknown)[:3]}"
                )
            snap.files = {p: a for p, a in snap.files.items() if p in paths}
        if where:
            snap = prune_snapshot_files(snap, where)
        schema = StructType.fromJson(snap.schema)
        mode = snap.configuration.get("delta.columnMapping.mode", "none")
        if mode not in ("none", "", "name", "id"):
            raise DeltaProtocolError(
                f"column mapping mode {mode!r} not supported"
            )
        paths = [os.path.join(self.table_dir, p) for p in sorted(snap.paths)]
        if not paths:
            return spark.createDataFrame([], schema)
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType as _ST

        fields_by_name = {f.name: f for f in schema.fields}
        pnames = list(snap.partition_columns)
        missing = [c for c in pnames if c not in fields_by_name]
        if missing:
            raise DeltaProtocolError(
                f"partitionColumns {missing} not present in the table schema"
            )
        data_schema = _ST([f for f in schema.fields if f.name not in pnames])

        def tag(frame):
            return frame.select(
                "*",
                F.regexp_replace(_decoded_file_path(F), "^file:/*", "/").alias(
                    "__df_file"
                ),
                F.col("_metadata.row_index").alias("__df_row"),
            )

        need_meta = bool(pnames) or any(
            a.get("deletionVector") for a in snap.files.values()
        )
        if mode == "id":
            # ID mode: parquet column names may differ per file; group the
            # file list by each footer's field-id -> name map (bounded
            # driver metadata reads, like DVs), read each group with its
            # own physical schema, project to LOGICAL names, then union.
            df = self._read_id_mapped(spark, paths, data_schema)
            need_meta = True  # tags already attached per group
        else:
            read_schema = (
                _physical_schema(data_schema) if mode == "name" else data_schema
            )
            df = spark.read.schema(read_schema).parquet(*paths)
            if need_meta:
                df = tag(df)

        dv_files = {
            p: a["deletionVector"]
            for p, a in snap.files.items()
            if a.get("deletionVector")
        }
        if dv_files:
            # Resolve every DV to (absolute file, row index) and anti-join
            # against parquet's _metadata row identity. The bitmaps are
            # metadata-sized driver reads (like the log itself); a real
            # engine pushes this filter into the scan — same semantics.
            pairs = []
            for rel, dv in dv_files.items():
                rows = dv_deleted_rows(self.table_dir, dv)
                if len(rows) != dv.get("cardinality", len(rows)):
                    raise DeltaProtocolError(
                        f"deletion vector for {rel}: bitmap cardinality "
                        f"{len(rows)} != descriptor {dv.get('cardinality')}"
                    )
                ap = os.path.abspath(os.path.join(self.table_dir, rel))
                pairs.extend((ap, int(r)) for r in sorted(rows))
            if pairs:
                deleted = spark.createDataFrame(pairs, "f string, r long")
                df = df.join(
                    deleted,
                    (F.col("__df_file") == F.col("f"))
                    & (F.col("__df_row") == F.col("r")),
                    "left_anti",
                )

        if pnames:
            # per-file partition values: a bounded (one row per add action)
            # broadcast joined on file identity, cast from the spec's
            # string serialization to the declared column types. Under
            # NAME mapping, partitionValues keys are PHYSICAL names.
            def pv_key(c: str) -> str:
                # add.partitionValues keys are PHYSICAL names whenever
                # column mapping is enabled — EITHER mode (PROTOCOL.md
                # "Column Mapping": writers store physical names in
                # partitionValues for both 'name' and 'id').
                f = fields_by_name[c]
                if mode in ("name", "id"):
                    return (f.metadata or {}).get(
                        "delta.columnMapping.physicalName", f.name
                    )
                return f.name

            rows = [
                tuple(
                    [os.path.abspath(os.path.join(self.table_dir, rel))]
                    + [
                        (a.get("partitionValues") or {}).get(pv_key(c))
                        for c in pnames
                    ]
                )
                for rel, a in snap.files.items()
            ]
            pv_schema = "__pv_file string" + "".join(
                f", __pv_{i} string" for i in range(len(pnames))
            )
            pv_df = spark.createDataFrame(rows, pv_schema)
            df = df.join(
                F.broadcast(pv_df), F.col("__df_file") == F.col("__pv_file"), "left"
            ).drop("__pv_file")

        if need_meta:
            df = df.drop("__df_file", "__df_row")

        # final projection in declared field order: reconstituted partition
        # columns cast to their types; data columns via the NAME-mode
        # logical projection when mapped, as-is otherwise (ID mode already
        # projected to logical names per file group)
        if mode == "name":
            phys_by_logical = {
                lf.name: pf for pf, lf in zip(read_schema.fields, data_schema.fields)
            }
        out = []
        for f in schema.fields:
            if f.name in pnames:
                out.append(
                    F.col(f"__pv_{pnames.index(f.name)}").cast(f.dataType).alias(f.name)
                )
            elif mode == "name":
                pf = phys_by_logical[f.name]
                out.append(
                    _to_logical(F.col(pf.name), pf.dataType, f.dataType).alias(f.name)
                )
            else:
                out.append(F.col(f.name))
        return df.select(out)

    def _read_id_mapped(self, spark, paths, data_schema):
        """ID-mode column mapping: match table columns to parquet columns
        by FIELD ID (PROTOCOL.md column mapping, ID mode). Every file's
        arrow footer yields its id->name map (nested struct levels
        included); files sharing a map read as one group with that
        group's physical schema; a field whose id is absent from a
        footer falls back to its physicalName (delta writers put BOTH in
        the files; the fallback also null-fills genuinely missing
        columns through Spark's missing-column semantics). Each group
        projects to logical names before the groups union."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        def footer_map(path) -> tuple:
            sch = pq.read_schema(path)

            def walk(fields, prefix):
                out = []
                for fld in fields:
                    md = fld.metadata or {}
                    fid = md.get(b"PARQUET:field_id")
                    if fid is not None:
                        out.append((int(fid), prefix + (fld.name,)))
                    out.extend(walk_type(fld.type, prefix + (fld.name,)))
                return out

            def walk_type(t, prefix):
                # descend into every nested level that can carry ids,
                # mirroring phys_type_for's recursion. List/map wrapper
                # fields ("element"/"key"/"value") are TRANSPARENT: the
                # lookup side (phys_schema_for) passes its prefix through
                # arrays and maps unchanged, so the footer paths must
                # omit the wrapper names too.
                if pa.types.is_struct(t):
                    return walk(list(t), prefix)
                if pa.types.is_list(t) or pa.types.is_large_list(t):
                    return walk_type(t.value_type, prefix)
                if pa.types.is_map(t):
                    return walk_type(t.key_type, prefix) + walk_type(
                        t.item_type, prefix
                    )
                return []

            return tuple(sorted(walk(list(sch), ())))

        groups: dict[tuple, list[str]] = {}
        for path in paths:
            groups.setdefault(footer_map(path), []).append(path)

        from pyspark.sql.types import ArrayType, MapType, StructField, StructType

        def phys_schema_for(fmap: dict, ldt, prefix):
            fields = []
            for lf in ldt.fields:
                fid = (lf.metadata or {}).get("delta.columnMapping.id")
                pname = fmap.get((fid, prefix)) if fid is not None else None
                if pname is None:
                    pname = (lf.metadata or {}).get(
                        "delta.columnMapping.physicalName", lf.name
                    )
                fields.append(
                    StructField(
                        pname,
                        phys_type_for(fmap, lf.dataType, prefix + (pname,)),
                        lf.nullable,
                    )
                )
            return StructType(fields)

        def phys_type_for(fmap, dt, prefix):
            if isinstance(dt, StructType):
                return phys_schema_for(fmap, dt, prefix)
            if isinstance(dt, ArrayType):
                return ArrayType(
                    phys_type_for(fmap, dt.elementType, prefix), dt.containsNull
                )
            if isinstance(dt, MapType):
                return MapType(
                    phys_type_for(fmap, dt.keyType, prefix),
                    phys_type_for(fmap, dt.valueType, prefix),
                    dt.valueContainsNull,
                )
            return dt

        parts = []
        for fmap_t, group_paths in groups.items():
            # (fid, path) pairs -> {(fid, parent_path): name}
            fmap = {(fid, fpath[:-1]): fpath[-1] for fid, fpath in fmap_t}
            phys = phys_schema_for(fmap, data_schema, ())
            g = spark.read.schema(phys).parquet(*group_paths)
            g = g.select(
                "*",
                F.regexp_replace(_decoded_file_path(F), "^file:/*", "/").alias(
                    "__df_file"
                ),
                F.col("_metadata.row_index").alias("__df_row"),
            )
            logical_cols = [
                _to_logical(F.col(pf.name), pf.dataType, lf.dataType).alias(lf.name)
                for pf, lf in zip(phys.fields, data_schema.fields)
            ]
            parts.append(g.select(*logical_cols, "__df_file", "__df_row"))
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out

    def change_plan(
        self,
        since_version: int | None = None,
        end_version: int | None = None,
        skip_change_commits: bool = False,
        include_removes: bool = False,
    ) -> list[tuple[int, list[str], list[str]]]:
        """Driver-side change-feed plan: ``(version, added paths, removed
        paths)`` per data-changing commit in ``(since_version,
        end_version]`` — pure log reads, no Spark job, so a consumer can
        detect an empty window for free (the `mirror` consumers do).

        Validation is range-complete: EVERY version in the window must
        have its JSON commit. The window is built from the raw range, not
        filtered to the readable subset, so a cleaned-up gap between a
        replayable JSON prefix and the checkpoint RAISES instead of
        silently skipping commits — a watermarked consumer would
        otherwise diverge forever (r12 review finding)."""
        hi = self.versions[-1] if end_version is None else end_version
        start = -1 if since_version is None else since_version
        if since_version is not None and since_version not in self.versions:
            raise DeltaProtocolError(
                f"since_version {since_version} not readable: "
                f"available {self.versions}"
            )
        window = list(range(start + 1, hi + 1))
        json_set = set(self._json_versions)
        not_json = [v for v in window if v not in json_set]
        if not_json:
            raise DeltaProtocolError(
                f"change feed needs per-commit JSON for versions {not_json} "
                "(only a checkpoint survives for them)"
            )
        plan: list[tuple[int, list[str], list[str]]] = []
        for v in window:
            adds: list[str] = []
            removes: list[str] = []
            for key, body in self._actions(v):
                if key == "add" and body.get("dataChange", True):
                    adds.append(body["path"])
                elif key == "remove" and body.get("dataChange", True):
                    removes.append(body["path"])
            if removes:
                if skip_change_commits:
                    continue
                if not include_removes:
                    raise ValueError(
                        f"version {v} of {self.table_dir} rewrote existing "
                        "rows; pass skip_change_commits=True to ignore "
                        "change commits or include_removes=True for the "
                        "delete+insert view"
                    )
                if v - 1 not in self.versions:
                    raise DeltaProtocolError(
                        f"version {v - 1} not readable — cannot resolve the "
                        f"rows version {v} removed"
                    )
            if adds or (removes and include_removes):
                plan.append((v, adds, removes if include_removes else []))
        return plan

    def read_changes(
        self,
        spark,
        since_version: int | None = None,
        end_version: int | None = None,
        skip_change_commits: bool = False,
        include_removes: bool = False,
    ):
        """Per-commit change feed over the `_delta_log`, the consumer-side
        twin of the publish edge's `remove` tombstones (VERDICT r11 task
        #7): rows changed by commits in ``(since_version, end_version]``
        with ``_commit_version`` and ``_change_type`` columns.

        Commit classes, mirroring a Delta streaming source's documented
        semantics (the reference reads with ``skipChangeCommits=true``,
        `NB/BQ Writer Stream.py:9-15`, precisely because its pipelines
        never propagate deletes):

        - additive (adds with ``dataChange`` true, no data-change
          removes): the added files' rows surface as ``insert``;
        - reorganization (``dataChange`` false on every action, e.g.
          OPTIMIZE/compaction): invisible — same rows, new layout;
        - change commit (any ``dataChange`` remove, e.g. a partition
          rewrite by `merge_upsert_logged`): ValueError by default
          (silently re-reading rewritten rows double-counts), skipped
          WHOLESALE with ``skip_change_commits=True`` (the reference's
          choice), or SURFACED with ``include_removes=True``: the removed
          files' rows (read at the PREDECESSOR version, so DVs / mapping /
          partition values apply) as ``delete`` plus the added files' rows
          as ``insert`` — file-granularity CDF, where an update appears as
          its delete+insert pair. Net-exact: applying deletes-then-inserts
          reproduces the snapshot transition; rows merely copied between
          files during a rewrite appear on both sides.

        Needs the window's JSON commits (a checkpoint collapses per-commit
        boundaries) and, for ``include_removes``, the removed data files
        still on disk — i.e. inside the vacuum retention window; a
        vacuumed file raises at read time rather than returning partial
        history. Cost: driver-side log replay per commit plus O(files
        changed in the window) data reads."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        # plan computed first so every validation (window completeness,
        # raise-on-rewrite) happens before any Spark job is built

        plan = self.change_plan(
            since_version,
            end_version,
            skip_change_commits=skip_change_commits,
            include_removes=include_removes,
        )
        hi = self.versions[-1] if end_version is None else end_version
        parts = []
        for v, adds, removes in plan:
            if removes:
                parts.append(
                    self.to_df(spark, version=v - 1, paths=set(removes)).select(
                        "*",
                        F.lit(v).cast("long").alias("_commit_version"),
                        F.lit("delete").alias("_change_type"),
                    )
                )
            if adds:
                parts.append(
                    self.to_df(spark, version=v, paths=set(adds)).select(
                        "*",
                        F.lit(v).cast("long").alias("_commit_version"),
                        F.lit("insert").alias("_change_type"),
                    )
                )
        if not parts:
            schema = StructType.fromJson(self.snapshot(hi).schema)
            schema = schema.add("_commit_version", "long").add(
                "_change_type", "string"
            )
            return spark.createDataFrame([], schema)
        out = parts[0]
        for p_ in parts[1:]:
            # schema evolution mid-window: later commits may add columns;
            # earlier rows null-fill them (additive evolution only, the
            # same contract as the streaming runner's sidecars)
            out = out.unionByName(p_, allowMissingColumns=True)
        return out


# --- column mapping (NAME mode) ---------------------------------------------


def _physical_schema(schema):
    """The parquet-side schema of a NAME-mode column-mapped table: every
    field renamed to its `delta.columnMapping.physicalName` metadata,
    recursively through structs/arrays/maps (PROTOCOL.md "Column
    Mapping"). A field without the metadata keeps its logical name (the
    pre-mapping columns of an upgraded table)."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    def walk(dt):
        if isinstance(dt, StructType):
            return StructType(
                [
                    StructField(
                        (f.metadata or {}).get(
                            "delta.columnMapping.physicalName", f.name
                        ),
                        walk(f.dataType),
                        f.nullable,
                    )
                    for f in dt.fields
                ]
            )
        if isinstance(dt, ArrayType):
            return ArrayType(walk(dt.elementType), dt.containsNull)
        if isinstance(dt, MapType):
            return MapType(walk(dt.keyType), walk(dt.valueType), dt.valueContainsNull)
        return dt

    return walk(schema)


def _to_logical(col, phys_dt, log_dt):
    """Project a physical-named column back to its logical shape —
    recursive struct rebuild with a null guard (F.struct over a null
    struct would fabricate a struct of nulls), element-wise transform
    for arrays, key/value rebuild for maps."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(log_dt, StructType):
        inner = F.struct(
            *[
                _to_logical(col[pf.name], pf.dataType, lf.dataType).alias(lf.name)
                for pf, lf in zip(phys_dt.fields, log_dt.fields)
            ]
        )
        return F.when(col.isNotNull(), inner).otherwise(F.lit(None).cast(log_dt))
    if isinstance(log_dt, ArrayType):
        return F.transform(
            col, lambda x: _to_logical(x, phys_dt.elementType, log_dt.elementType)
        )
    if isinstance(log_dt, MapType):
        return F.map_from_arrays(
            F.transform(
                F.map_keys(col), lambda k: _to_logical(k, phys_dt.keyType, log_dt.keyType)
            ),
            F.transform(
                F.map_values(col),
                lambda v: _to_logical(v, phys_dt.valueType, log_dt.valueType),
            ),
        )
    return col


# --- deletion vectors --------------------------------------------------------
# PROTOCOL.md "Deletion Vectors": an `add` may carry a deletionVector
# descriptor {storageType, pathOrInlineDv, offset?, sizeInBytes,
# cardinality} marking row indices of the parquet file as deleted.
# Everything below implements the PUBLIC specs from scratch:
# - Z85 text encoding (ZeroMQ spec 32/Z85) for inline DVs and UUID paths;
# - the on-disk DV file frame (1-byte format version; at `offset` a
#   4-byte big-endian length, the bitmap bytes, then a 4-byte big-endian
#   CRC-32 of the bitmap bytes);
# - the RoaringBitmapArray "portable" layout (4-byte LE magic 1681511377,
#   8-byte LE bitmap count, then per 32-bit bucket: 4-byte LE key +
#   a standard-portable 32-bit Roaring bitmap per RoaringFormatSpec —
#   array, bitmap and run containers all supported).
# The container has no delta-spark to cross-check bytes against, so the
# test-side serializer is written independently from the same specs
# (mirror-image of the delta_export/delta_reader discipline).

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}
_DV_MAGIC = 1681511377


def z85_decode(text: str) -> bytes:
    """ZeroMQ Z85 (spec 32): 5 chars -> 4 bytes, big-endian base-85."""
    if len(text) % 5:
        raise DeltaProtocolError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            if ch not in _Z85_INDEX:
                raise DeltaProtocolError(f"invalid z85 character {ch!r}")
            acc = acc * 85 + _Z85_INDEX[ch]
        if acc > 0xFFFFFFFF:
            raise DeltaProtocolError("z85 group overflows 32 bits")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def _roaring32_portable(buf: bytes, pos: int) -> tuple[set[int], int]:
    """One standard-portable 32-bit Roaring bitmap starting at `pos`;
    returns (values, next_pos). RoaringFormatSpec: cookie 12346 (no run
    containers, container count in the next u32, offset header always
    present) or 12347 (run containers, count packed into the cookie's
    upper 16 bits, run-marker bitset, offset header only when >= 4
    containers)."""
    import struct

    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    has_runs = (cookie & 0xFFFF) == 12347
    if has_runs:
        n = (cookie >> 16) + 1
        runbits = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
    elif cookie == 12346:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        runbits = b""
    else:
        raise DeltaProtocolError(f"unknown roaring cookie {cookie}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if not has_runs or n >= 4:
        pos += 4 * n  # offset header (we parse sequentially)
    values: set[int] = set()
    for i, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(runbits[i // 8] & (1 << (i % 8))) if has_runs else False
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.update(base + v for v in range(start, start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.update(base + v for v in vals)
        else:  # bitmap container: 2^16 bits = 8 KiB
            chunk = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(chunk):
                while b:
                    low = b & -b
                    values.add(base + byte_i * 8 + low.bit_length() - 1)
                    b ^= low
    return values, pos


def roaring64_decode(buf: bytes) -> set[int]:
    """RoaringBitmapArray portable: LE magic, u64 LE bucket count, then
    per bucket a u32 LE high-key + one 32-bit portable bitmap."""
    import struct

    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != _DV_MAGIC:
        raise DeltaProtocolError(f"bad deletion-vector magic {magic}")
    (n_buckets,) = struct.unpack_from("<Q", buf, 4)
    pos = 12
    out: set[int] = set()
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, pos = _roaring32_portable(buf, pos)
        out.update((high << 32) | v for v in vals)
    return out


def dv_deleted_rows(table_dir: str, dv: dict) -> set[int]:
    """Resolve one deletionVector descriptor to its deleted row indices.
    storageType: 'i' inline (pathOrInlineDv = Z85 of the bitmap bytes),
    'u' relative file (optional directory prefix + Z85 of a 16-byte
    UUID -> deletion_vector_<uuid>.bin under the table root), 'p'
    absolute path. File frame: version byte 1 at offset 0; the bitmap
    at `offset` as [u32 BE length][bytes][u32 BE crc32]."""
    import struct
    import uuid as _uuid
    import zlib

    st = dv.get("storageType")
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        if len(data) < dv.get("sizeInBytes", 0):
            raise DeltaProtocolError("inline deletion vector shorter than sizeInBytes")
        return roaring64_decode(data[: dv["sizeInBytes"]])
    if st == "u":
        enc = dv["pathOrInlineDv"]
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(tail))
        rel = os.path.join(prefix, f"deletion_vector_{u}.bin") if prefix else f"deletion_vector_{u}.bin"
        path = os.path.join(table_dir, rel)
    elif st == "p":
        path = dv["pathOrInlineDv"]
    else:
        raise DeltaProtocolError(f"unknown deletionVector storageType {st!r}")
    with open(path, "rb") as fh:
        blob = fh.read()
    if not blob or blob[0] != 1:
        raise DeltaProtocolError(f"unsupported deletion-vector file version {blob[:1]!r}")
    # PROTOCOL.md types offset as Option (only stated absent for inline
    # storageType 'i'); a writer holding one DV per file may omit it, in
    # which case the frame starts right after the version byte. The
    # size + CRC checks below validate the guess — a wrong offset cannot
    # silently misread.
    off = dv.get("offset", 1)
    (size,) = struct.unpack_from(">I", blob, off)
    if size != dv["sizeInBytes"]:
        raise DeltaProtocolError(
            f"deletion vector size mismatch: frame {size} vs descriptor {dv['sizeInBytes']}"
        )
    data = blob[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    if crc != zlib.crc32(data) & 0xFFFFFFFF:
        raise DeltaProtocolError("deletion vector checksum mismatch")
    return roaring64_decode(data)
