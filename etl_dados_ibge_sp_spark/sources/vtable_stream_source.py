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
dirs + one new dir), with one sanctioned exception — a COMPACTION the
consumer is fully caught up to is row-preserving (dataChange=false)
and the stream resumes across it.  Any other rewrite
(`write_version`, merge, a compaction folding unread versions) breaks
delta-derivability, and the source fails with a clear error telling
the consumer to restart from a fresh checkpoint — silent re-emission
or skipping would corrupt downstream state.

Scale design — EXECUTOR-side reads: the default reader is a full
``DataSourceStreamReader`` whose driver role is manifest planning
only (list the delta's parquet files, one ``InputPartition`` per
file); the file bytes are read by executors as Arrow record batches.
At 100 TB one appended version IS a daily partition — potentially
TBs — so the delta must scale out like any other scan; the number of
FILES per version is manifest-sized (thousands), which is all the
driver ever holds.  Schema evolution null-fills on the executor (a
pre-evolution file simply lacks the new column), and hive-partition
directory values are re-injected from the file path, typed via the
manifest schema.

A driver-side ``SimpleDataSourceStreamReader`` fallback remains
available via ``.option("reader", "simple")`` for tiny
control-plane tables where per-partition task overhead exceeds the
delta itself.  Local/shared-filesystem paths only, like
`sources/fwf_source`.

The format is also a STREAMING SINK (``writeStream.format("vtable")``,
see :class:`VTableStreamWriter`): executors stage each task's Arrow
batches as parquet, the driver commit moves them into a new version
and records the micro-batch id in the manifest's per-writer ``txn``
ledger in the same atomic flip — exactly-once appends, so
``vtable -> transform -> vtable`` pipelines chain with no foreachBatch
shim and no duplicate rows across checkpoint replays.
"""

from __future__ import annotations

import json
import os
import shutil
import urllib.parse

from dataclasses import dataclass, field

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (DataSource,
                                    DataSourceStreamArrowWriter,
                                    DataSourceStreamReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

from ..sinks.versioned import (_commit, _deletes_for, _dirs_for,
                               _merged_schema, _partition_by_for,
                               _read_manifest, _writer_manifest)

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


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


def _delta_dirs(table_dir: str, start_v: int, end_v: int) -> list[str]:
    """Snapshot dirs added between two versions — defined only when
    the older version's dir list is a prefix of the newer's (pure
    appends).  Anything else is a rewrite: fail clearly.

    The checkpointed start version may have been RETIRED by vacuum
    while its dirs live on (reference-counted by the current chain) —
    the delta is still derivable: on a pure append chain every dir's
    number equals the version that added it, so start's dir list is
    exactly end's dirs numbered <= start_v.  If none qualify, a
    rewrite replaced the chain (rewrites start a fresh dir numbered
    > start_v) and we fail rather than re-emit the whole table."""
    man = _read_manifest(table_dir)
    if _deletes_for(man, end_v):
        # The stream reads data files RAW (executors never evaluate
        # delete predicates), so live merge-on-read deletes would
        # resurrect removed rows — and a delete inside the consumed
        # range can't be represented as appended rows at all.  Live
        # predicates at end_v cover both cases: a compaction clears
        # them by materializing survivors (and the compact-survival
        # rule below only lets a consumer cross it when fully caught
        # up, so no consumer can straddle the delete itself).
        raise ValueError(
            f"vtable: {table_dir} has live merge-on-read DELETE "
            f"predicates at version {end_v}; a row-append stream "
            "cannot represent removals — consume deletes via "
            "table_changes, or compact and restart the consumer "
            "from a fresh checkpoint")
    end_dirs = _dirs_for(man, end_v)
    if not start_v:
        return end_dirs
    if start_v in man["versions"]:
        start_dirs = _dirs_for(man, start_v)
    else:  # vacuumed checkpoint version: reconstruct by number
        start_dirs = [d for d in end_dirs if int(d[2:]) <= start_v]
    if not start_dirs or end_dirs[:len(start_dirs)] != start_dirs:
        # One rewrite shape IS still delta-derivable: a COMPACTION
        # preserves exactly the rows of the version it folded (the
        # lakehouse dataChange=false idiom), so a consumer fully
        # caught up through K-1 resumes across op='compact' at K —
        # the delta is the dirs appended after the compacted dir.
        # Any other shape (a later compaction folding versions the
        # consumer never saw, a merge, a plain overwrite) mixes
        # unseen rows into a folded file and must still fail.
        k = start_v + 1
        if (any(h.get("version") == k and h.get("op") == "compact"
                for h in man.get("history", []))
                and end_dirs and end_dirs[0] == f"v={k}"):
            return end_dirs[1:]
        raise ValueError(
            f"vtable: versions {start_v}..{end_v} of "
            f"{table_dir} are not append-only (a rewrite — an "
            "op='write'/'merge' commit, or a compaction folding "
            "versions this consumer had not yet read — intervened); "
            "restart the consumer from a fresh checkpoint")
    return end_dirs[len(start_dirs):]


def _parquet_files(vdir: str) -> list[tuple[str, dict[str, str | None]]]:
    """(file path, hive partition values) for every data file under a
    snapshot dir — flat dirs yield an empty hive dict; hive layouts
    (``p=.../part-*.parquet``) yield the decoded path values.  Sorted
    for deterministic partition planning."""
    out: list[tuple[str, dict[str, str | None]]] = []
    for root, dirs, files in os.walk(vdir):
        dirs.sort()
        rel = os.path.relpath(root, vdir)
        hive: dict[str, str | None] = {}
        if rel != ".":
            for seg in rel.split(os.sep):
                if "=" not in seg:
                    continue
                k, _, v = seg.partition("=")
                hive[k] = (None if v == _HIVE_NULL
                           else urllib.parse.unquote(v))
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append((os.path.join(root, f), hive))
    return out


class VTableFilePartition(InputPartition):
    """One delta parquet file — or one ROW GROUP of it — per task.
    ``row_groups=None`` means the whole file; files larger than the
    reader's ``split_bytes`` are split into one partition per row
    group so a skewed delta (one huge file) still scales out."""

    def __init__(self, path: str, hive: dict[str, str | None],
                 row_groups: list[int] | None = None):
        self.path = path
        self.hive = hive
        self.row_groups = row_groups


class VTablePartitionedStreamReader(DataSourceStreamReader):
    """Default reader: driver plans per-file (or per-row-group, above
    ``split_bytes``) partitions from the manifest; executors read the
    parquet bytes (Arrow batches)."""

    # Files at/above this size split into per-row-group partitions:
    # one cheap driver-side stat per file decides; only files that
    # split pay a footer read.  128 MiB matches Spark's
    # files.maxPartitionBytes default.
    DEFAULT_SPLIT_BYTES = 128 * 1024 * 1024

    def __init__(self, table_dir: str, schema: StructType,
                 split_bytes: int | None = None,
                 starting_version: int = 1):
        self.table_dir = table_dir
        # Pickled to executors with the reader: keep it a plain string.
        self.schema_json = schema.json()
        self.split_bytes = (self.DEFAULT_SPLIT_BYTES
                            if split_bytes is None else split_bytes)
        self.starting_version = starting_version

    # -- driver-side planning ------------------------------------------
    def initialOffset(self) -> dict:
        # A NEW checkpoint starts consuming at starting_version
        # (inclusive, default 1 = the whole table) — the Delta
        # startingVersion idiom for subscribing only to changes from
        # now on without replaying history.
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        man = _read_manifest(self.table_dir)
        return {"version": int(man["current"] or 0)}

    def partitions(self, start: dict, end: dict):
        start_v, end_v = start["version"], end["version"]
        if end_v <= start_v:
            return []
        parts = []
        for d in _delta_dirs(self.table_dir, start_v, end_v):
            vdir = os.path.join(self.table_dir, d)
            for path, hive in _parquet_files(vdir):
                if os.path.getsize(path) >= self.split_bytes:
                    import pyarrow.parquet as pq
                    n = pq.ParquetFile(path).metadata.num_row_groups
                    parts.extend(VTableFilePartition(path, hive, [g])
                                 for g in range(n))
                else:
                    parts.append(VTableFilePartition(path, hive))
        return parts

    # -- executor-side read --------------------------------------------
    def read(self, partition: VTableFilePartition):
        """Runs on an executor python worker: streams the one file's
        row groups as Arrow batches aligned to the table schema —
        missing columns (schema evolution) null-fill, hive path
        values re-materialize as typed constant columns.  Driver
        memory never sees row data."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = StructType.fromJson(json.loads(self.schema_json))
        target = to_arrow_schema(schema)
        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(row_groups=partition.row_groups):
            n = batch.num_rows
            names = batch.schema.names
            cols = []
            for field in target:
                if field.name in names:
                    col = batch.column(names.index(field.name))
                    cols.append(col.cast(field.type))
                elif field.name in partition.hive:
                    v = partition.hive[field.name]
                    if v is None:
                        cols.append(pa.nulls(n, field.type))
                    else:
                        cols.append(
                            pa.array([v] * n, pa.string())
                            .cast(field.type))
                else:  # added after this file was written: null-fill
                    cols.append(pa.nulls(n, field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=target)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to ack


class VTableStreamReader(SimpleDataSourceStreamReader):
    """Fallback driver-side reader (``.option("reader", "simple")``):
    correct at any table size because the unit is one delta, but it
    materializes that delta in driver memory — only for tiny
    control-plane tables."""

    def __init__(self, table_dir: str, schema: StructType,
                 starting_version: int = 1):
        self.table_dir = table_dir
        self.fields = [f.name for f in schema.fields]
        self.starting_version = starting_version

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def _rows(self, dirs: list[str]) -> list[tuple]:
        # Materialized, not a generator: Spark's simple-reader
        # wrapper both next()s the returned iterator AND copy.copy()s
        # it into its prefetch cache, so `read` must hand back
        # iter(list) — a list_iterator is copyable (via __reduce__)
        # where a generator is not.
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
        return (iter(self._rows(
                    _delta_dirs(self.table_dir, start_v, end_v))),
                {"version": end_v})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(_delta_dirs(
            self.table_dir, start["version"], end["version"])))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to ack


def _footer_stats(files: list[str],
                  stats_cols: list[str]) -> dict[str, list]:
    """Per-dir min/max for the table's declared stats columns, merged
    from the staged files' parquet FOOTER statistics — driver-side,
    zero data reads (the footers were just written; at a few KB each
    this is manifest-scale work).  A column missing statistics in any
    row group is skipped entirely (absent stats only ever mean 'never
    pruned' — safe).  NUMERIC columns only: parquet writers may
    TRUNCATE string min/max in footers (the spec allows it), and a
    truncated max understating the true range would prune a dir that
    still holds matching rows — silent data loss; string stats come
    only from the exact Observation path (write_version)."""
    import pyarrow.parquet as pq

    agg: dict[str, list] = {}
    bad: set[str] = set()
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i
               for i in range(md.num_columns)}
        for c in stats_cols:
            if c in bad or c not in idx:
                bad.add(c)
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    bad.add(c)
                    break
                mn, mx = st.min, st.max
                if not isinstance(mn, (int, float)) \
                        or isinstance(mn, bool):
                    bad.add(c)
                    break
                if c in agg:
                    agg[c] = [min(agg[c][0], mn), max(agg[c][1], mx)]
                else:
                    agg[c] = [mn, mx]
    return {c: v for c, v in agg.items() if c not in bad}


@dataclass
class VTableCommitMessage(WriterCommitMessage):
    files: list = field(default_factory=list)  # staged parquet paths
    rows: int = 0
    # Hive-relative subdir per staged file ("" = flat table), parallel
    # to ``files`` — e.g. "event_type=click".  Missing/short lists
    # mean flat for the unpaired files (messages from older pickles).
    dirs: list = field(default_factory=list)


def _hive_dir(cols: list[str], values: tuple) -> str:
    """The hive path fragment for one partition tuple, using Spark's
    escapePathName conventions: nulls become __HIVE_DEFAULT_PARTITION__
    and path-hostile characters are %XX-escaped, so Spark's
    partitioned parquet reader round-trips the values (and
    read_version's declared schema pins their types)."""
    hostile = set('"#%\'*/:=?\\{[]^') | {chr(c) for c in range(0x20)} \
        | {chr(0x7F)}

    def esc(s: str) -> str:
        return "".join(f"%{ord(ch):02X}" if ch in hostile else ch
                       for ch in s)

    parts = []
    for c, v in zip(cols, values):
        if v is None:
            parts.append(f"{esc(c)}={_HIVE_NULL}")
        else:
            parts.append(f"{esc(c)}={esc(str(v))}")
    return "/".join(parts)


class VTableStreamWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("vtable")`` — exactly-once streaming
    APPEND into a versioned table, completing the loop natively (no
    foreachBatch shim): executors write each task's Arrow batches as
    one parquet file into ``_staging/``, and the driver's commit()
    moves the staged files into a new ``v=N`` dir and flips the
    manifest with the micro-batch id recorded under
    ``txn[writer_id]`` IN THE SAME atomic flip — the transaction-id
    idempotence pattern `sinks/versioned.foreach_batch_appender`
    uses, so a checkpoint replay of an already-committed batch drops
    its staged files and appends nothing.

    Failure safety mirrors write_version: data files are fully
    staged (then moved, same filesystem) BEFORE the manifest flip;
    an abort or a crash leaves orphans in ``_staging/`` that no
    manifest references — harmless, rewritten by the replay, and
    reclaimed by ``vacuum``.  Append-only by construction (overwrite
    mode is refused).  Hive-partitioned tables are first-class since
    round 7: appending to one adopts its layout automatically, and
    ``.option("partition_by", "col[,col]")`` lets the first write
    CREATE a partitioned table — each task stages one file per
    partition tuple it holds (data files omit the partition columns;
    the dir name carries them), and commit moves the staged files
    into the hive tree of the new ``v=N`` dir.  The layout is fixed
    per table chain; a mismatched spec fails the commit loudly.

    The txn ledger is scoped by ``writer_id`` (option, default
    "stream") and batch ids restart at 0 for every new checkpoint —
    so a consumer that DELETES its checkpoint and re-streams into a
    table it already fed MUST pass a fresh ``writer_id`` (or the old
    ledger will treat the first batches as replays and skip them).
    Same contract as Delta's txn appId; foreach_batch_appender
    shares it."""

    def __init__(self, table_dir: str, schema: StructType,
                 writer_id: str = "stream",
                 merge_schema: bool = False,
                 partition_by: list[str] | None = None):
        self.table_dir = table_dir
        self.schema_json = schema.json()
        self.writer_id = writer_id
        self.merge_schema = merge_schema
        self.partition_by = list(partition_by or [])
        if self.partition_by:
            missing = [c for c in self.partition_by
                       if c not in schema.fieldNames()]
            if missing:
                raise ValueError(
                    f"vtable sink: partition columns {missing} are "
                    "not in the stream's schema")
            if not [c for c in schema.fieldNames()
                    if c not in self.partition_by]:
                # Data files omit the partition columns, so a spec
                # covering EVERY column would stage zero-column
                # parquet — caught here at writer construction, not
                # as a cryptic Arrow error at task time.
                raise ValueError(
                    "vtable sink: partition_by covers every column "
                    f"({self.partition_by}) — at least one non-"
                    "partition data column is required")

    # -- executor side ---------------------------------------------------
    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return VTableCommitMessage()
        staging = os.path.join(self.table_dir, "_staging")
        os.makedirs(staging, exist_ok=True)
        tbl = pa.Table.from_batches(batches)
        if not self.partition_by:
            path = os.path.join(staging,
                                f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(tbl, path)
            return VTableCommitMessage(files=[path], rows=tbl.num_rows,
                                       dirs=[""])
        # Hive layout: one staged file per partition tuple seen by
        # THIS task (data files omit the partition columns — the dir
        # name carries them, exactly like write_version's partitionBy
        # path).  A task's batch holds few distinct tuples after the
        # upstream shuffle, so the fan-out is bounded; the groups are
        # computed Arrow-side (one pass, no pandas copy).
        pcols = [tbl.column(c) for c in self.partition_by]
        keys = [tuple(col[j].as_py() for col in pcols)
                for j in range(tbl.num_rows)]
        by_key: dict[tuple, list[int]] = {}
        for j, k in enumerate(keys):
            by_key.setdefault(k, []).append(j)
        data = tbl.drop_columns(self.partition_by)
        files, dirs = [], []
        for k, idx in by_key.items():
            path = os.path.join(staging,
                                f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(data.take(idx), path)
            files.append(path)
            dirs.append(_hive_dir(self.partition_by, k))
        return VTableCommitMessage(files=files, rows=tbl.num_rows,
                                   dirs=dirs)

    # -- driver side -----------------------------------------------------
    def _staged(self, messages) -> tuple[list[str], int, list[str]]:
        files = [f for m in messages if m is not None for f in m.files]
        rows = sum(m.rows for m in messages if m is not None)
        dirs = [d for m in messages if m is not None
                for d in (m.dirs if len(getattr(m, "dirs", []))
                          == len(m.files) else [""] * len(m.files))]
        return files, rows, dirs

    def commit(self, messages, batchId: int) -> None:
        staged, rows, reldirs = self._staged(messages)
        man = _writer_manifest(self.table_dir)
        last = man.get("txn", {}).get(self.writer_id)
        if last is not None and batchId == last:
            for f in staged:  # replayed batch: already committed
                os.remove(f)
            return
        if last is not None and batchId < last:
            # A legitimate checkpoint replay only re-delivers the LAST
            # batch (commits are sequential); an earlier id means a
            # DIFFERENT checkpoint is feeding a ledger it does not own
            # (deleted/fresh checkpoint, same writer_id) — skipping
            # would silently drop data, so fail loudly instead.
            for f in staged:
                os.remove(f)
            raise ValueError(
                f"vtable sink: batch {batchId} is behind writer "
                f"{self.writer_id!r}'s ledger ({last}) on "
                f"{self.table_dir} — a new checkpoint must use a "
                "fresh writer_id option")
        if not staged:
            return  # empty batch: no version, nothing to make idempotent
        prev = man["current"]
        existing = _partition_by_for(man, prev) or []
        if prev is not None and list(existing) != self.partition_by:
            raise ValueError(
                f"vtable sink: {self.table_dir} is partitioned by "
                f"{list(existing)} but this stream stages "
                f"{self.partition_by} — the layout is fixed per table "
                "chain (rewrite via write_version to change it)")
        import types as _types

        batch_schema = StructType.fromJson(json.loads(self.schema_json))
        schema = _merged_schema(man, prev,
                                _types.SimpleNamespace(schema=batch_schema),
                                self.merge_schema)
        version = (prev or 0) + 1
        vdir = os.path.join(self.table_dir, f"v={version}")
        dirs = ({"base": prev, "add": f"v={version}"} if prev
                else [f"v={version}"])
        man.setdefault("txn", {})[self.writer_id] = batchId
        sc = man.get("stats_cols") or []
        if sc:
            # Footers are read from the STAGED files (same bytes the
            # move below relocates) so stats are ready before _commit.
            stats = _footer_stats(staged, sc)
            if stats:
                man.setdefault("stats", {})[f"v={version}"] = stats

        def _move_staged() -> None:
            # Runs INSIDE _commit's verified flip-lock section, where
            # v=<version> is proven uncommitted — so the rebuild below
            # can never destroy a racing winner's committed snapshot
            # (it used to run unfenced here, which escalated the
            # racing-writer window from duplicate rows to data loss).
            # Anything already in the dir is orphan debris from a
            # commit attempt that crashed between these moves and the
            # manifest flip.  The checkpoint replay stages FRESH
            # uuid-named files, so appending alongside the orphans
            # would commit every row twice — rebuild the dir from
            # scratch instead (write_version gets the same property
            # from parquet overwrite mode).
            shutil.rmtree(vdir, ignore_errors=True)
            os.makedirs(vdir)
            for f, rel in zip(staged, reldirs):
                dst_dir = os.path.join(vdir, rel) if rel else vdir
                os.makedirs(dst_dir, exist_ok=True)
                os.replace(f, os.path.join(dst_dir, os.path.basename(f)))

        _commit(man, self.table_dir, version, dirs, schema.json(),
                op="append", rows_written=rows,
                partition_by=self.partition_by or None,
                pre_flip=_move_staged)

    def abort(self, messages, batchId: int) -> None:
        staged, _rows, _dirs = self._staged(messages)
        for f in staged:
            try:
                os.remove(f)
            except FileNotFoundError:
                pass


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

    def streamReader(self, schema: StructType):
        if self.options.get("reader", "").lower() == "simple":
            # Raising the NotImplemented marker makes Spark's
            # _streamReader helper fall back to simpleStreamReader —
            # the sanctioned opt-out mechanism.
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"})
        split = self.options.get("split_bytes")
        return VTablePartitionedStreamReader(
            self.options["path"], schema,
            split_bytes=int(split) if split is not None else None,
            starting_version=int(self.options.get("starting_version",
                                                  1)))

    def simpleStreamReader(self, schema: StructType):
        return VTableStreamReader(
            self.options["path"], schema,
            starting_version=int(self.options.get("starting_version",
                                                  1)))

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "vtable sink is append-only (outputMode append); a "
                "rewrite is a batch operation — use "
                "sinks.versioned.write_version")
        path = self.options["path"]
        opt = self.options.get("partition_by")
        if opt:
            pby = [c.strip() for c in opt.split(",") if c.strip()]
        else:
            # Appending to an existing hive-partitioned table adopts
            # its layout automatically (resolved once, at query start
            # on the driver — the layout is fixed per table chain).
            try:
                man = _read_manifest(path)
                pby = _partition_by_for(man, man["current"]) or []
            except FileNotFoundError:
                pby = []
        return VTableStreamWriter(
            path, schema,
            writer_id=self.options.get("writer_id", "stream"),
            merge_schema=str(self.options.get("merge_schema", "false"))
            .lower() == "true",
            partition_by=pby or None)


def _ship_package(spark) -> None:
    """Make this source work from Spark's OUT-OF-PROCESS python
    workers (the streaming source runner and executor read() workers)
    under a FOREIGN driver session — the verification driver, or any
    spark-submit whose cwd isn't the repo.  Those workers' PYTHONPATH
    knows nothing about the repo, and cloudpickle serializes the
    DataSource class BY REFERENCE by default, so they would fail to
    import it.  Two layers:

    - ``addPyFile`` a zip of the package — the standard cluster
      deployment path (what a 1000-executor job distributes); covers
      executor task workers.
    - register this module (and the manifest helpers it closes over)
      for cloudpickle BY-VALUE serialization — the streaming source
      runner subprocess does not receive pyFiles includes in Spark
      4.1, so the pickled DataSource must be self-contained.  Both
      modules only reference pyspark + stdlib, so the embedded code
      has no further repo dependencies."""
    import sys

    from pyspark import cloudpickle

    from ..sinks import versioned

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(versioned)

    sc = spark.sparkContext
    if getattr(sc, "_vtable_pkg_shipped", False):
        return
    # Content-keyed build-once zip (workdirs hygiene): executors fetch
    # the addPyFile source lazily at first task and verify its bytes
    # on re-fetch, so the file must outlive the session and never
    # change — the old mkdtemp staging leaked one dir per session.
    # Imported INSIDE this driver-only function so the by-value
    # cloudpickle of this module gains no module-global dependency.
    from ..workdirs import package_zip

    sc.addPyFile(package_zip())
    sc._vtable_pkg_shipped = True


def register_vtable(spark) -> None:
    """Register the vtable streaming format on this session."""
    _ship_package(spark)
    spark.dataSource.register(VTableDataSource)
