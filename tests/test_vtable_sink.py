"""Laws for the vtable STREAMING SINK (writeStream.format("vtable")):
exactly-once appends across checkpointed runs (table-to-table native
copy), replayed-batch idempotence, abort cleanup, append-only refusal
of overwrite, and schema handling on first write / evolution."""

from __future__ import annotations

import os

import pytest

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     read_version,
                                                     table_history,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
    VTableStreamWriter, register_vtable)


def _copy_once(spark, src, dst, ckpt):
    q = (spark.readStream.format("vtable").option("path", src).load()
         .writeStream.format("vtable").option("path", dst)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    try:
        assert q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()


def _rows(spark, table):
    return sorted(tuple(r) for r in read_version(spark, table).collect())


def test_table_to_table_copy_exactly_once(spark, tmp_path):
    """The loop fully native: vtable source -> vtable sink, resumed
    across runs of one checkpoint, copies every appended version
    exactly once — including the first write CREATING the sink table
    (schema from the stream)."""
    register_vtable(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    write_version(spark.createDataFrame([(1, "a"), (2, "b")],
                                        "k int, v string"), src)
    _copy_once(spark, src, dst, ckpt)
    assert _rows(spark, dst) == [(1, "a"), (2, "b")]
    # Idle run: no new versions on src -> none on dst.
    v = len(table_history(dst))
    _copy_once(spark, src, dst, ckpt)
    assert len(table_history(dst)) == v
    # Two appends while the consumer is down -> ONE dst append, rows
    # exactly once.
    append_version(spark.createDataFrame([(3, "c")], "k int, v string"),
                   src)
    append_version(spark.createDataFrame([(4, "d")], "k int, v string"),
                   src)
    _copy_once(spark, src, dst, ckpt)
    assert _rows(spark, dst) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    ops = [h["op"] for h in table_history(dst)]
    assert ops == ["append", "append"]
    # The txn ledger carries the writer id and the last batch id.
    from etl_dados_ibge_sp_spark.sinks.versioned import _read_manifest
    assert "stream" in _read_manifest(dst)["txn"]


def test_replayed_batch_appends_nothing(spark, tmp_path):
    """Unit law for the commit protocol: committing the same batchId
    twice (a checkpoint replay) drops the staged files and leaves the
    table untouched."""
    import pyarrow as pa

    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        VTableCommitMessage)

    from pyspark.sql.pandas.types import to_arrow_schema

    t = str(tmp_path / "tbl")
    schema_df = spark.createDataFrame([(1, "a")], "k int, v string")
    w = VTableStreamWriter(t, schema_df.schema)
    # Real micro-batches arrive typed to the stream's schema; build the
    # rigged batch the same way.
    batch = pa.RecordBatch.from_pylist([{"k": 1, "v": "a"}],
                                       schema=to_arrow_schema(
                                           schema_df.schema))
    msg = w.write(iter([batch]))
    w.commit([msg], batchId=0)
    assert _rows(spark, t) == [(1, "a")]
    # Replay: stage again (a replayed task reruns write()), commit the
    # SAME batch id -> staged file removed, no new version.
    msg2 = w.write(iter([batch]))
    w.commit([msg2], batchId=0)
    assert _rows(spark, t) == [(1, "a")]
    assert len(table_history(t)) == 1
    assert not os.path.exists(msg2.files[0])
    # Failed-task slot: a None message must not break commit.
    msg3 = w.write(iter([batch]))
    w.commit([msg3, None, VTableCommitMessage()], batchId=1)
    assert _rows(spark, t) == [(1, "a"), (1, "a")]


def test_abort_cleans_staging(spark, tmp_path):
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    t = str(tmp_path / "tbl")
    schema = spark.createDataFrame([(1, "a")], "k int, v string").schema
    w = VTableStreamWriter(t, schema)
    msg = w.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 1, "v": "a"}], schema=to_arrow_schema(schema))]))
    assert os.path.exists(msg.files[0])
    w.abort([msg, None], batchId=0)
    assert not os.path.exists(msg.files[0])
    assert not os.path.exists(os.path.join(t, "_manifest.json"))


def test_overwrite_mode_refused(spark, tmp_path):
    # Direct unit check of the sink's own guard (the end-to-end
    # complete-mode run below can fail earlier for generic reasons —
    # complete mode needs an aggregate — so it alone would not pin
    # OUR refusal).
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        VTableDataSource)

    schema = spark.createDataFrame([(1, "a")], "k int, v string").schema
    ds = VTableDataSource({"path": str(tmp_path / "dst")})
    with pytest.raises(ValueError, match="append-only"):
        ds.streamWriter(schema, overwrite=True)

    register_vtable(spark)
    src = str(tmp_path / "src")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  src)
    q = (spark.readStream.format("vtable").option("path", src).load()
         .writeStream.format("vtable")
         .option("path", str(tmp_path / "dst"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("complete"))
    with pytest.raises(Exception):
        q.trigger(availableNow=True).start().awaitTermination(60)


def test_sink_schema_mismatch_and_evolution(spark, tmp_path):
    """Second micro-batch with a new column: refused by default,
    null-filled evolution with .option('merge_schema', 'true') — the
    same opt-in contract as append_version."""
    import pyarrow as pa

    t = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a")], "k int, v string")
    write_version(base, t)
    wider = spark.createDataFrame([(2, "b", 7.5)],
                                  "k int, v string, score double")
    from pyspark.sql.pandas.types import to_arrow_schema

    wide_batch = pa.RecordBatch.from_pylist(
        [{"k": 2, "v": "b", "score": 7.5}],
        schema=to_arrow_schema(wider.schema))
    strict = VTableStreamWriter(t, wider.schema)
    msg = strict.write(iter([wide_batch]))
    with pytest.raises(ValueError, match="merge_schema"):
        strict.commit([msg], batchId=0)
    evolving = VTableStreamWriter(t, wider.schema, merge_schema=True)
    msg = evolving.write(iter([wide_batch]))
    evolving.commit([msg], batchId=0)
    assert _rows(spark, t) == [(1, "a", None), (2, "b", 7.5)]


def test_foreign_checkpoint_ledger_mismatch_fails(spark, tmp_path):
    """A batch id BEHIND the ledger is not a replay (legitimate
    replays only re-deliver the last batch): it means a fresh
    checkpoint is feeding a ledger it does not own — silent skipping
    would drop data, so commit fails naming the fix."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    t = str(tmp_path / "tbl")
    schema = spark.createDataFrame([(1, "a")], "k int, v string").schema
    arrow = to_arrow_schema(schema)
    w = VTableStreamWriter(t, schema)
    w.commit([w.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 1, "v": "a"}], schema=arrow)]))], batchId=0)
    w.commit([w.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 2, "v": "b"}], schema=arrow)]))], batchId=1)
    msg = w.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 9, "v": "z"}], schema=arrow)]))
    with pytest.raises(ValueError, match="fresh writer_id"):
        w.commit([msg], batchId=0)
    assert not os.path.exists(msg.files[0])  # staged file still swept
    # A fresh writer_id resumes cleanly on its own ledger.
    w2 = VTableStreamWriter(t, schema, writer_id="stream-2")
    w2.commit([w2.write(iter([pa.RecordBatch.from_pylist(
        [{"k": 9, "v": "z"}], schema=arrow)]))], batchId=0)
    assert _rows(spark, t) == [(1, "a"), (2, "b"), (9, "z")]


def test_crash_orphans_do_not_duplicate_on_replay(spark, tmp_path):
    """Exactly-once across a crash BETWEEN the staged-file moves and
    the manifest flip: the half-moved files sit in the uncommitted
    v=N dir, and the checkpoint replay stages FRESH uuid-named files —
    commit must rebuild v=N from scratch, not append alongside the
    orphans (which would commit the batch's rows twice)."""
    import shutil

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    t = str(tmp_path / "tbl")
    schema_df = spark.createDataFrame([(1, "a")], "k int, v string")
    w = VTableStreamWriter(t, schema_df.schema)
    batch = pa.RecordBatch.from_pylist([{"k": 1, "v": "a"}],
                                       schema=to_arrow_schema(
                                           schema_df.schema))
    w.commit([w.write(iter([batch]))], batchId=0)    # v1 committed
    assert _rows(spark, t) == [(1, "a")]

    # Crash replica of batch 1: files moved into v=2, no manifest
    # flip, no ledger update.
    msg = w.write(iter([batch]))
    vdir = os.path.join(t, "v=2")
    os.makedirs(vdir)
    for f in msg.files:
        shutil.move(f, vdir)
    assert len(os.listdir(vdir)) == 1                # the orphan

    # Replay of batch 1 after restart: fresh staged files, same id.
    w.commit([w.write(iter([batch]))], batchId=1)
    assert _rows(spark, t) == [(1, "a"), (1, "a")]   # exactly once
    assert len(os.listdir(vdir)) == 1                # orphan purged
    assert len(table_history(t)) == 2


def test_partitioned_table_copy_adopts_layout(spark, tmp_path):
    """Appending to a hive-partitioned table: the sink adopts the
    table's layout automatically (no option needed), stages one file
    per partition tuple per task, and the committed version reads
    back partition-complete — including NULL partition values."""
    from etl_dados_ibge_sp_spark.sinks.versioned import _read_manifest

    register_vtable(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    rows = [(1, "a", "x"), (2, "b", "y"), (3, "c", "x"), (4, "d", None)]
    df = spark.createDataFrame(rows, "k int, v string, pk string")
    write_version(df, src)
    write_version(df.limit(0), dst, partition_by=["pk"])  # empty, layout set
    _copy_once(spark, src, dst, ckpt)
    assert _rows(spark, dst) == sorted(rows)
    man = _read_manifest(dst)
    assert man["partition_by"][str(man["current"])] == ["pk"]
    # The hive tree is real: data landed under pk=<value> dirs and the
    # files omit the partition column.
    vdir = os.path.join(dst, f"v={man['current']}")
    subdirs = sorted(d for d in os.listdir(vdir)
                     if os.path.isdir(os.path.join(vdir, d)))
    assert subdirs == ["pk=__HIVE_DEFAULT_PARTITION__", "pk=x", "pk=y"]
    import pyarrow.parquet as pq
    f = next(os.path.join(vdir, "pk=x", n)
             for n in os.listdir(os.path.join(vdir, "pk=x")))
    assert "pk" not in pq.read_schema(f).names


def test_partitioned_create_and_exactly_once(spark, tmp_path):
    """option("partition_by") CREATES a partitioned table on first
    write, and the txn ledger keeps appends exactly-once across
    checkpoint re-runs — same laws as the flat sink, hive layout."""
    register_vtable(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    write_version(spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k int, v string, pk string"),
        src)

    def copy():
        q = (spark.readStream.format("vtable").option("path", src)
             .load()
             .writeStream.format("vtable").option("path", dst)
             .option("partition_by", "pk")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        try:
            assert q.awaitTermination(120)
        finally:
            if q.isActive:
                q.stop()

    copy()
    assert _rows(spark, dst) == [(1, "a", "x"), (2, "b", "y")]
    # Idle re-run: nothing new, no version churn.
    v = len(table_history(dst))
    copy()
    assert len(table_history(dst)) == v
    # Two src appends while down -> one dst append, rows exactly once,
    # new partition dirs appear in the APPENDED version only.
    append_version(spark.createDataFrame([(3, "c", "z")],
                                         "k int, v string, pk string"),
                   src)
    append_version(spark.createDataFrame([(4, "d", "x")],
                                         "k int, v string, pk string"),
                   src)
    copy()
    assert _rows(spark, dst) == [(1, "a", "x"), (2, "b", "y"),
                                 (3, "c", "z"), (4, "d", "x")]
    assert [h["op"] for h in table_history(dst)] == ["append", "append"]


def test_partitioned_spec_mismatch_fails_loudly(spark, tmp_path):
    """The layout is fixed per table chain: streaming a different
    partition spec into an existing table must fail the commit, not
    silently mix layouts."""
    register_vtable(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame([(1, "a", "x")],
                               "k int, v string, pk string")
    write_version(df, src)
    write_version(df, dst)                       # existing FLAT table
    q = (spark.readStream.format("vtable").option("path", src).load()
         .writeStream.format("vtable").option("path", dst)
         .option("partition_by", "pk")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    import pytest
    from pyspark.errors import StreamingQueryException
    with pytest.raises(StreamingQueryException,
                       match="partitioned by"):
        q.awaitTermination(120)
    assert _rows(spark, dst) == [(1, "a", "x")]  # table untouched


def test_partitioned_sink_escaping_roundtrip(spark, tmp_path):
    """Path-hostile partition values must round-trip through the hive
    dir encoding: separators, escapes, '=', '%', spaces, unicode and
    NULL all read back exactly (both through read_version's Spark
    scan and the vtable stream reader's own decoder)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    t = str(tmp_path / "tbl")
    values = ["a b", "a/b", "a=b", "a%b", "w:x?y", "ração",
              "#hash", None]
    rows = [{"k": i, "pk": v} for i, v in enumerate(values)]
    schema = spark.createDataFrame([], "k int, pk string").schema
    w = VTableStreamWriter(t, schema, partition_by=["pk"])
    batch = pa.RecordBatch.from_pylist(rows,
                                       schema=to_arrow_schema(schema))
    w.commit([w.write(iter([batch]))], batchId=0)
    assert _rows(spark, t) == sorted(
        ((i, v) for i, v in enumerate(values)),
        key=lambda r: (r[0],))
    # The stream reader decodes the same dirs back to the same values.
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        _parquet_files)
    got = sorted(h["pk"] if h["pk"] is not None else "\x00NULL"
                 for _f, h in _parquet_files(os.path.join(t, "v=1")))
    want = sorted(v if v is not None else "\x00NULL" for v in values)
    assert got == want


def test_partitioned_sink_table_feeds_stream(spark, tmp_path):
    """Full native chain across layouts: flat src -> PARTITIONED dst
    (this sink's hive tree) -> vtable stream -> flat dst2.  The stream
    reader must re-inject the partition values it decodes from the
    sink-written dir names, typed per the manifest schema — rows
    arrive exactly once, byte-equal."""
    register_vtable(spark)
    src = str(tmp_path / "src")
    mid = str(tmp_path / "mid")
    out = str(tmp_path / "out")
    rows = [(1, "a", "x"), (2, "b", "y"), (3, "c", None)]
    write_version(spark.createDataFrame(
        rows, "k int, v string, pk string"), src)

    q = (spark.readStream.format("vtable").option("path", src).load()
         .writeStream.format("vtable").option("path", mid)
         .option("partition_by", "pk")
         .option("checkpointLocation", str(tmp_path / "ck1"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    q2 = (spark.readStream.format("vtable").option("path", mid).load()
          .writeStream.format("vtable").option("path", out)
          .option("checkpointLocation", str(tmp_path / "ck2"))
          .trigger(availableNow=True).start())
    assert q2.awaitTermination(120)
    key = lambda r: (r[0],)
    assert _rows(spark, out) == sorted(rows, key=key)


def test_partition_by_all_columns_rejected_at_construction(spark):
    """Data files omit the partition columns, so a spec covering every
    schema column would stage zero-column parquet — rejected with a
    clear error at writer construction, not a cryptic Arrow failure
    at task time."""
    schema = spark.createDataFrame([], "k int, pk string").schema
    with pytest.raises(ValueError, match="every column"):
        VTableStreamWriter("/tmp/never-created", schema,
                           partition_by=["pk", "k"])


def test_loser_commit_never_touches_committed_winner_dir(
        spark, tmp_path, monkeypatch):
    """A sink commit racing a winner that already committed v=N must
    fail WITHOUT touching the winner's snapshot dir: the rebuild
    (rmtree+moves) runs inside _commit's verified flip-lock section,
    so it only ever executes against a proven-uncommitted version.
    (Unfenced, the old path rmtree'd the winner's committed data
    before discovering the conflict — data loss, not just a lost
    race.)"""
    import copy

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    import etl_dados_ibge_sp_spark.sources.vtable_stream_source as vss
    from etl_dados_ibge_sp_spark.sinks.versioned import (
        ConcurrentWriteError, _writer_manifest)

    t = str(tmp_path / "tbl")
    schema = spark.createDataFrame([], "k int, v string").schema

    def batch(k, v):
        return pa.RecordBatch.from_pylist(
            [{"k": k, "v": v}], schema=to_arrow_schema(schema))

    w = VTableStreamWriter(t, schema)
    w.commit([w.write(iter([batch(1, "a")]))], batchId=0)   # v1
    stale = copy.deepcopy(_writer_manifest(t))              # current=1
    # The winner commits v=2 through the normal path.
    w2 = VTableStreamWriter(t, schema, writer_id="other")
    w2.commit([w2.write(iter([batch(2, "winner")]))], batchId=0)
    vdir = os.path.join(t, "v=2")
    winner_files = sorted(os.listdir(vdir))
    # The loser re-enters the race window: its manifest view still
    # says current=1, so its commit targets the committed v=2.
    monkeypatch.setattr(vss, "_writer_manifest",
                        lambda _d: copy.deepcopy(stale))
    msg = w.write(iter([batch(3, "loser")]))
    with pytest.raises(ConcurrentWriteError):
        w.commit([msg], batchId=1)
    assert sorted(os.listdir(vdir)) == winner_files   # snapshot intact
    assert _rows(spark, t) == [(1, "a"), (2, "winner")]


def test_concurrent_sink_commits_stress(spark, tmp_path):
    """Concurrency stress over the SINK commit path (8 threads, one
    batch each, distinct writer_ids, retry on ConcurrentWriteError):
    with the data-dir rebuild fenced inside _commit's critical
    section, every batch must land exactly once, the chain must be
    contiguous, and no staged file or marker may survive.  (The
    deterministic loser-vs-committed-winner interleaving is pinned
    above; this covers the race space probabilistically.)"""
    import threading

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from etl_dados_ibge_sp_spark.sinks.versioned import (
        ConcurrentWriteError, _commits_dir, _read_manifest)

    t = str(tmp_path / "tbl")
    schema = spark.createDataFrame([], "k int, v string").schema
    seed = VTableStreamWriter(t, schema, writer_id="seed")
    seed_batch = pa.RecordBatch.from_pylist(
        [{"k": 0, "v": "seed"}], schema=to_arrow_schema(schema))
    seed.commit([seed.write(iter([seed_batch]))], batchId=0)

    N = 8
    errs: list[Exception] = []

    def worker(i):
        w = VTableStreamWriter(t, schema, writer_id=f"w{i}")
        batch = pa.RecordBatch.from_pylist(
            [{"k": i + 1, "v": f"w{i}"}],
            schema=to_arrow_schema(schema))
        msg = w.write(iter([batch]))
        for _ in range(60):
            try:
                w.commit([msg], batchId=0)
                return
            except ConcurrentWriteError:
                continue
            except Exception as e:      # noqa: BLE001 — recorded
                errs.append(e)
                return
        errs.append(RuntimeError(f"w{i}: retries exhausted"))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(N)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=180)
    assert not errs, errs

    man = _read_manifest(t)
    assert man["current"] == N + 1
    assert man["versions"] == list(range(1, N + 2))
    assert _rows(spark, t) == [(0, "seed")] + \
        [(i + 1, f"w{i}") for i in range(N)]          # exactly once
    assert os.listdir(_commits_dir(t)) == []          # markers swept
    assert os.listdir(os.path.join(t, "_staging")) == []


def test_crash_during_move_leaves_no_claim_and_replays_once(
        spark, tmp_path, monkeypatch):
    """pre_flip ordering law: the data-dir rebuild runs BEFORE the
    claim, so a crash mid-move leaves NO marker (roll-forward can
    never complete a commit whose move failed) and no manifest
    change; the checkpoint replay then lands the batch exactly once,
    rebuilding v=N from scratch over the half-moved debris."""
    import os as _os

    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from etl_dados_ibge_sp_spark.sinks.versioned import (
        _commits_dir, _read_manifest)

    t = str(tmp_path / "tbl")
    schema = spark.createDataFrame([], "k int, v string").schema
    w = VTableStreamWriter(t, schema)

    def batch(rows):
        return pa.RecordBatch.from_pylist(
            rows, schema=to_arrow_schema(schema))

    w.commit([w.write(iter([batch([{"k": 1, "v": "a"}])]))], batchId=0)

    # Crash injection: the first os.replace of the NEXT commit dies.
    real_replace = os.replace
    armed = {"on": True}

    def dying_replace(src, dst):
        if armed["on"] and "/v=2" in dst:
            armed["on"] = False
            raise OSError("injected crash mid-move")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", dying_replace)
    msg = w.write(iter([batch([{"k": 2, "v": "b"}])]))
    with pytest.raises(OSError, match="injected"):
        w.commit([msg], batchId=1)
    monkeypatch.setattr(_os, "replace", real_replace)

    man = _read_manifest(t)
    assert man["current"] == 1                      # no manifest move
    assert os.listdir(_commits_dir(t)) == []        # NO claim marker
    # Replay of batch 1 (fresh staged files, same id): exactly once.
    w.commit([w.write(iter([batch([{"k": 2, "v": "b"}])]))], batchId=1)
    assert _rows(spark, t) == [(1, "a"), (2, "b")]
    assert len(table_history(t)) == 2
