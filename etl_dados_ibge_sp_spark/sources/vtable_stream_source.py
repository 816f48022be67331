"""Versioned table as a STREAMING source — a Spark 4 Python
DataSource streaming reader (`format("vtable")`) that tails the
table's manifest and emits each appended version's rows as a
micro-batch.  Offsets are version numbers, so the stream is
exactly-once by construction: the checkpoint stores the last version
fully emitted, and replay re-reads exactly the same immutable dirs.

This closes the lakehouse loop: `sinks/versioned` writes (batch or
exactly-once streaming), this source lets DOWNSTREAM pipelines
subscribe to the table incrementally — each consumer processes only
the versions committed since its checkpoint, the streaming form of
`table_changes`.

Semantics mirror the real lakehouse streaming sources: the table must
be APPEND-ONLY between the offsets read (each new version = previous
dirs + one new dir).  A rewrite (`write_version`, compaction, merge)
breaks delta-derivability, and the source fails with a clear error
telling the consumer to restart from a fresh checkpoint — silent
re-emission or skipping would corrupt downstream state.

Driver-side reader (`SimpleDataSourceStreamReader`) by design: a CDC
tail reads one batch's worth of new files per trigger, which is
driver-feasible at any table size because the unit of work is the
DELTA, never the table.  The schema comes from the manifest (the
same committed-with-the-pointer schema `read_version` uses) — columns
added by schema evolution read as NULL from pre-evolution batches.
Local/shared-filesystem paths only, like `sources/fwf_source`.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from ..sinks.versioned import _dirs_for, _read_manifest


def _table_schema(table_dir: str) -> StructType:
    man = _read_manifest(table_dir)
    if man["current"] is None:
        raise ValueError(
            f"vtable: {table_dir} has no committed version yet")
    stored = man.get("schema", {}).get(str(man["current"]))
    if stored is None:
        raise ValueError(
            f"vtable: {table_dir} has a pre-schema manifest; write one "
            "version with the current code to record the schema")
    return StructType.fromJson(json.loads(stored))


class VTableStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, table_dir: str, schema: StructType):
        self.table_dir = table_dir
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"version": 0}

    def _delta_dirs(self, start_v: int, end_v: int) -> list[str]:
        """Snapshot dirs added between two versions — defined only
        when the older version's dir list is a prefix of the newer's
        (pure appends).  Anything else is a rewrite: fail clearly.

        The checkpointed start version may have been RETIRED by
        vacuum while its dirs live on (reference-counted by the
        current chain) — the delta is still derivable: on a pure
        append chain every dir's number equals the version that added
        it, so start's dir list is exactly end's dirs numbered
        <= start_v.  If none qualify, a rewrite replaced the chain
        (rewrites start a fresh dir numbered > start_v) and we fail
        rather than re-emit the whole table."""
        man = _read_manifest(self.table_dir)
        end_dirs = _dirs_for(man, end_v)
        if not start_v:
            return end_dirs
        if start_v in man["versions"]:
            start_dirs = _dirs_for(man, start_v)
        else:  # vacuumed checkpoint version: reconstruct by number
            start_dirs = [d for d in end_dirs if int(d[2:]) <= start_v]
        if not start_dirs or end_dirs[:len(start_dirs)] != start_dirs:
            raise ValueError(
                f"vtable: versions {start_v}..{end_v} of "
                f"{self.table_dir} are not append-only (a rewrite — "
                "an op='write'/'compact'/'merge' commit — intervened); "
                "restart the consumer from a fresh checkpoint")
        return end_dirs[len(start_dirs):]

    def _rows(self, dirs: list[str]) -> list[tuple]:
        # Materialized, not a generator: Spark's simple-reader
        # wrapper both next()s the returned iterator AND copy.copy()s
        # it into its prefetch cache, so `read` must hand back
        # iter(list) — a list_iterator is copyable (via __reduce__)
        # where a generator is not.  Materializing is the simple
        # reader's documented driver-prefetch contract, and the unit
        # is one delta (the new batch), never the table.
        import pyarrow.parquet as pq

        out: list[tuple] = []
        for d in dirs:
            vdir = os.path.join(self.table_dir, d)
            # Whole-dir dataset read: pyarrow discovers hive partition
            # subdirs (partition columns come back as real columns),
            # and flat dirs read identically.
            tbl = pq.read_table(vdir)
            for row in tbl.to_pylist():
                out.append(tuple(row.get(f) for f in self.fields))
        return out

    def read(self, start: dict):
        man = _read_manifest(self.table_dir)
        end_v = man["current"] or 0
        start_v = start["version"]
        if end_v <= start_v:
            return iter([]), start
        return (iter(self._rows(self._delta_dirs(start_v, end_v))),
                {"version": end_v})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(self._delta_dirs(start["version"],
                                                end["version"])))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to ack


class VTableDataSource(DataSource):
    """``format("vtable")`` — see module docstring for the contract."""

    @classmethod
    def name(cls) -> str:
        return "vtable"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("vtable: .load(path) is required")
        if "://" in path:
            raise ValueError(
                f"vtable: {path!r} — URI schemes are not supported; "
                "this source reads local/shared-filesystem paths only")
        return _table_schema(path)

    def simpleStreamReader(self, schema: StructType):
        return VTableStreamReader(self.options["path"], schema)


def register_vtable(spark) -> None:
    """Register the vtable streaming format on this session."""
    spark.dataSource.register(VTableDataSource)
