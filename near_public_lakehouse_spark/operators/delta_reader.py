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
- protocol gating: `minReaderVersion` > 1 (column mapping, deletion
  vectors, v2 checkpoints...) raises — reading on anyway could silently
  return wrong rows, which is exactly what a real reader must not do;
- strict field checks: every `add` must carry path/partitionValues/size/
  modificationTime/dataChange per the spec's required-field table; an
  unknown action key raises instead of being skipped.

`snapshot()` reconstructs the file set + schema at any version;
`to_df()` reads the reconstructed parquet file list through Spark — the
actual data-access path an external engine would take. The round-trip
test (tests/test_delta_reader.py) cross-validates every version of real
exported tables against the versioned manifest store: same files, same
schema, same rows.

Out of scope, mirroring the writer's documented floor: parquet
checkpoints (`_last_checkpoint` is ignored; JSON replay is always
complete for tables this writer produces), deletion vectors, column
mapping, partition-column reconstitution beyond verbatim passthrough.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

_LOG = "_delta_log"
_KNOWN_ACTIONS = {"protocol", "metaData", "add", "remove", "txn", "commitInfo", "cdc"}
_ADD_REQUIRED = {"path", "partitionValues", "size", "modificationTime", "dataChange"}
_MAX_READER_VERSION = 1


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

    @property
    def paths(self) -> set[str]:
        return set(self.files)

    def num_records(self) -> int | None:
        """Sum of add.stats numRecords, or None if any file lacks stats."""
        total = 0
        for a in self.files.values():
            st = a.get("stats")
            if not st:
                return None
            n = json.loads(st).get("numRecords")
            if n is None:
                return None
            total += n
        return total


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
        if not versions:
            raise DeltaProtocolError(f"{log_dir} contains no commit files")
        self.versions = sorted(versions)
        lo, hi = self.versions[0], self.versions[-1]
        if self.versions != list(range(lo, hi + 1)):
            raise DeltaProtocolError(f"commit versions not contiguous: {self.versions}")

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
        """Reconstruct table state at `version` (default: latest)."""
        if version is None:
            version = self.versions[-1]
        if version not in self.versions:
            raise DeltaProtocolError(
                f"version {version} not in log range "
                f"[{self.versions[0]}, {self.versions[-1]}]"
            )
        snap = DeltaSnapshot(version=version, schema=None, partition_columns=[])
        for v in self.versions:
            if v > version:
                break
            for key, body in self._actions(v):
                if key == "protocol":
                    snap.protocol = body
                    if body.get("minReaderVersion", 1) > _MAX_READER_VERSION:
                        raise DeltaProtocolError(
                            f"needs reader version {body['minReaderVersion']}, "
                            f"this reader supports {_MAX_READER_VERSION}"
                        )
                elif key == "metaData":
                    fmt = body.get("format", {})
                    if fmt.get("provider") != "parquet":
                        raise DeltaProtocolError(
                            f"unsupported format provider {fmt.get('provider')!r}"
                        )
                    snap.schema = json.loads(body["schemaString"])
                    snap.partition_columns = list(body.get("partitionColumns", []))
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
        if snap.protocol is None:
            raise DeltaProtocolError("log never declared a protocol action")
        if snap.schema is None:
            raise DeltaProtocolError("log never declared a metaData action")
        return snap

    def to_df(self, spark, version: int | None = None):
        """The data-access path an external engine takes: read exactly the
        snapshot's parquet file list. Empty snapshot -> empty DataFrame
        with the declared schema."""
        from pyspark.sql.types import StructType

        snap = self.snapshot(version)
        schema = StructType.fromJson(snap.schema)
        paths = [os.path.join(self.table_dir, p) for p in sorted(snap.paths)]
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)
