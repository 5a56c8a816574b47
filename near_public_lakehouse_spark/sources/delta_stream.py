"""Structured-Streaming source over the *Delta-protocol* change feed —
the `readStream` twin of `operators.delta_reader.DeltaLogReader
.read_changes`, closing the last reference-surface asymmetry (VERDICT
r14 task #4): the reference's publication consumer is a CONTINUOUS
stream over the published Delta table (`NB/BQ Writer Stream.py:9-15`,
``spark.readStream.option("skipChangeCommits", "true")``), while this
repo's `delta_mirror_into` was a batch drain loop.

    spark.dataSource.register(DeltaChangesDataSource)
    feed = (spark.readStream.format("delta_changes")
            .option("path", delta_table_dir).load())

Offsets are DELTA COMMIT VERSIONS (`{"version": N}` = consumed through
N), so Spark's checkpoint provides exactly-once planning: `partitions()`
is a pure function of the immutable `_delta_log` window, so a recovered
query replans a byte-identical micro-batch. Planning is driver-side log
replay only (O(commits + files changed)); each changed file becomes one
input partition read EXECUTOR-side with pyarrow, composing the full
protocol-read semantics the batch reader (`DeltaLogReader.to_df`)
implements Spark-side:

- deletion vectors: the roaring bitmap is decoded DRIVER-side
  (`dv_deleted_rows` — metadata-sized, same posture as the batch
  reader's driver-side pair materialization) and rides the partition
  payload as row indices; the executor masks those positions out.
- column mapping: each pinned logical field resolves against the file's
  parquet footer by field id (ID mode), then physicalName (NAME mode),
  then logical name; a field absent from the footer null-fills
  (pre-evolution files).
- partition-column reconstitution: `add.partitionValues` strings are
  resolved driver-side per file (physical keys under either mapping
  mode) and cast executor-side per the protocol's Partition Value
  Serialization rules.

Schema, partition columns and mapping mode are pinned at stream start
from the latest snapshot (the same contract as `versioned_changes` and
Spark's own sources); columns added mid-stream surface on restart.

Commit classes mirror `read_changes`: additive commits surface as
``insert`` rows, reorganizations are invisible, change commits (any
dataChange remove) surface as delete+insert pairs with
``includeRemoves`` (default true — the feed shape `delta_mirror_stream`
consumes), raise without it, or are skipped wholesale with
``skipChangeCommits`` (the reference's tail shape). Needs the window's
JSON commits and, for removes, the removed files inside the publish
side's vacuum retention window — the same contract as the batch feed.

DELIBERATELY NO per-trigger rate limit, for the reason documented at
`sources/versioned_stream.py:35-45` (the Python MicroBatchStream
protocol calls ``latestOffset()`` blind); bounded catch-up lives in the
batch consumers' ``max_versions_per_batch``.

Options:
- ``path`` (required): the Delta table directory (contains _delta_log).
- ``includeRemoves`` (default true), ``skipChangeCommits`` (default
  false): as above.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructType

from near_public_lakehouse_spark.sources.versioned_stream import _bool_option

_PHYS = "delta.columnMapping.physicalName"
_FID = "delta.columnMapping.id"


def _conform(col, target_type):
    """Cast one arrow column to the pinned field type, rebuilding structs
    and lists POSITIONALLY so physical (column-mapped) child names never
    leak into name-based cast semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_struct(target_type):
        children = [
            _conform(arr.field(i), target_type.field(i).type)
            for i in range(target_type.num_fields)
        ]
        return pa.StructArray.from_arrays(
            children,
            fields=list(target_type),
            mask=pc.is_null(arr),
        )
    if pa.types.is_list(target_type) or pa.types.is_large_list(target_type):
        values = _conform(arr.values, target_type.value_type)
        return pa.ListArray.from_arrays(
            arr.offsets, values, mask=pc.is_null(arr)
        )
    return arr.cast(target_type)


class DeltaChangesDataSource(DataSource):
    """`format("delta_changes")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "delta_changes"

    def _table_dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_changes requires .option('path', table_dir)")
        return path

    def schema(self) -> StructType:
        from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

        snap = DeltaLogReader(self._table_dir()).snapshot()
        out = StructType.fromJson(snap.schema).add("_commit_version", LongType())
        if _bool_option(self.options, "includeRemoves", True):
            out = out.add("_change_type", StringType())
        return out

    def streamReader(self, schema: StructType) -> "DeltaChangesStreamReader":
        return DeltaChangesStreamReader(
            self._table_dir(),
            schema,
            include_removes=_bool_option(self.options, "includeRemoves", True),
            skip_change_commits=_bool_option(self.options, "skipChangeCommits", False),
        )


class DeltaChangesStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table_dir: str,
        schema: StructType,
        include_removes: bool,
        skip_change_commits: bool,
    ) -> None:
        from pyspark.sql.pandas.types import to_arrow_schema

        from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

        self._dir = table_dir
        self._include_removes = include_removes
        self._skip_change_commits = skip_change_commits
        self._arrow_schema = to_arrow_schema(schema)
        # Pin the resolution plan at stream start (schema/mapping/partition
        # columns from the LATEST snapshot), like the source's schema():
        # per pinned field -> (physical name, field id) for footer
        # resolution, plus the partition-column pv keys.
        snap = DeltaLogReader(table_dir).snapshot()
        self._mode = snap.configuration.get("delta.columnMapping.mode", "none")
        logical = StructType.fromJson(snap.schema)
        mapped = self._mode in ("name", "id")
        self._resolve: dict[str, tuple[str, int | None]] = {}
        for f in logical.fields:
            md = f.metadata or {}
            phys = md.get(_PHYS, f.name) if mapped else f.name
            fid = md.get(_FID) if self._mode == "id" else None
            self._resolve[f.name] = (phys, int(fid) if fid is not None else None)
        self._pnames = list(snap.partition_columns)
        self._pv_keys = {c: self._resolve[c][0] for c in self._pnames if c in self._resolve}

    # --- offsets: consumed-through Delta commit version -------------------

    def initialOffset(self) -> dict:
        return {"version": -1}  # before v0: full-history catch-up first

    def latestOffset(self) -> dict:
        from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

        return {"version": DeltaLogReader(self._dir).versions[-1]}

    # --- planning: driver-side log replay only ----------------------------

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        import os

        from near_public_lakehouse_spark.operators.delta_reader import (
            DeltaLogReader,
            dv_deleted_rows,
        )

        reader = DeltaLogReader(self._dir)
        since = None if start["version"] < 0 else start["version"]
        plan = reader.change_plan(
            since,
            end["version"],
            skip_change_commits=self._skip_change_commits,
            include_removes=self._include_removes,
        )
        parts: list[InputPartition] = []
        snap_cache: dict[int, object] = {}

        def one(rel: str, snap_version: int, commit_v: int, change: str):
            snap = snap_cache.get(snap_version)
            if snap is None:
                snap = snap_cache[snap_version] = reader.snapshot(snap_version)
            add = snap.files[rel]
            dv = add.get("deletionVector")
            deleted = tuple(sorted(dv_deleted_rows(self._dir, dv))) if dv else ()
            pv_raw = add.get("partitionValues") or {}
            pvs = tuple(pv_raw.get(self._pv_keys.get(c, c)) for c in self._pnames)
            return InputPartition(
                (os.path.join(self._dir, rel), commit_v, change, deleted, pvs)
            )

        for v, adds, removes in plan:
            # removed files read with the PREDECESSOR snapshot's add
            # metadata (their DVs / partition values), as in read_changes
            for f in removes:
                parts.append(one(f, v - 1, v, "delete"))
            for f in adds:
                parts.append(one(f, v, v, "insert"))
        if not parts:
            # reorganization-only window: Spark still needs >=1 partition
            # to run the (empty) micro-batch that advances the offset.
            parts.append(InputPartition(None))
        return parts

    # --- executor-side: one changed file -> Arrow batches -----------------

    def read(self, partition: InputPartition) -> Iterator:
        if partition.value is None:
            return
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        path, version, change, deleted, pvs = partition.value
        pf = pq.ParquetFile(path)
        file_schema = pf.schema_arrow
        by_name = {f.name: f.name for f in file_schema}
        by_id: dict[int, str] = {}
        if self._mode == "id":
            for f in file_schema:
                fid = (f.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_id[int(fid)] = f.name

        def resolve(logical: str) -> str | None:
            phys, fid = self._resolve.get(logical, (logical, None))
            if fid is not None and fid in by_id:
                return by_id[fid]
            return by_name.get(phys) or by_name.get(logical)

        wanted = [
            resolve(f.name)
            for f in self._arrow_schema
            if f.name not in ("_commit_version", "_change_type")
            and f.name not in self._pnames
        ]
        tbl = pf.read(columns=[c for c in wanted if c is not None])
        if deleted:
            mask = np.ones(tbl.num_rows, dtype=bool)
            mask[list(deleted)] = False
            tbl = tbl.filter(pa.array(mask))
        n = tbl.num_rows

        arrays = []
        for field in self._arrow_schema:
            if field.name == "_commit_version":
                col = pa.repeat(pa.scalar(version, type=field.type), n)
            elif field.name == "_change_type":
                col = pa.repeat(pa.scalar(change, type=field.type), n)
            elif field.name in self._pnames:
                # Partition Value Serialization: the string form casts to
                # the declared type (ISO dates/timestamps, plain numerics,
                # true/false); a missing/None value is NULL.
                raw = pvs[self._pnames.index(field.name)]
                if raw is None:
                    col = pa.nulls(n, type=field.type)
                else:
                    col = pa.repeat(
                        pa.scalar(raw, type=pa.string()).cast(field.type), n
                    )
            else:
                src = resolve(field.name)
                if src is None:
                    col = pa.nulls(n, type=field.type)  # pre-evolution file
                else:
                    col = _conform(tbl.column(src), field.type)
            arrays.append(col)
        yield from pa.table(arrays, schema=self._arrow_schema).to_batches()

    def commit(self, end: dict) -> None:
        # Offsets live in the query checkpoint; the log is immutable and
        # vacuum-governed on the publish side — nothing to clean per batch.
        return
