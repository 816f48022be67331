"""Laws for the versioned parquet table (sinks/versioned): snapshot
isolation, time travel, idempotent re-runs, and retention vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (read_version,
                                                     vacuum,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _orders(spark, sf_dir, year):
    return load_table(spark, sf_dir, "orders", fan_out=False) \
        .filter(F.year("o_orderdate") == year)


def test_write_read_and_time_travel(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = write_version(_orders(spark, sf_dir, 1996), t)
    v2 = write_version(_orders(spark, sf_dir, 1997), t)
    assert (v1, v2) == (1, 2)
    cur = read_version(spark, t)
    assert cur.count() == _orders(spark, sf_dir, 1997).count()
    old = read_version(spark, t, version=1)
    assert old.count() == _orders(spark, sf_dir, 1996).count()


def test_rerun_never_corrupts_current(spark, sf_dir, tmp_path):
    """The delete&insert idempotency property, structurally: a re-run
    writes a NEW snapshot; the previous version stays intact and
    readable throughout, and the row count never doubles."""
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir, 1996)
    n = base.count()
    write_version(base, t)
    write_version(base, t)  # "re-run" of the same load
    assert read_version(spark, t).count() == n          # not 2n
    assert read_version(spark, t, version=1).count() == n


def test_vacuum_keeps_newest_and_current(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir, 1996).limit(10)
    for _ in range(5):
        write_version(base, t)
    removed = vacuum(t, keep=2)
    assert removed == [1, 2, 3]
    assert read_version(spark, t).count() == 10          # current ok
    assert read_version(spark, t, version=4).count() == 10
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, t, version=2)


def test_read_empty_table_fails_clearly(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no committed version"):
        read_version(spark, str(tmp_path / "nope"))


def test_orphan_snapshot_is_invisible(spark, sf_dir, tmp_path):
    """A crash mid-write leaves a snapshot dir the manifest never
    references: readers must not see it, and the next successful
    write must not be confused by it."""
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir, 1996).limit(7)
    write_version(base, t)
    # Simulate a crashed writer: data landed, manifest never flipped.
    base.limit(3).write.parquet(f"{t}/v=99")
    assert read_version(spark, t).count() == 7
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, t, version=99)
    assert write_version(base, t) == 2
    assert read_version(spark, t).count() == 7


def test_vacuum_reclaims_crash_orphans(spark, sf_dir, tmp_path):
    """A snapshot dir stranded by a crash between data write and
    manifest flip occupies disk forever unless vacuum reclaims it —
    the manifest alone can't know about it (round-5 ADVICE)."""
    import os

    from etl_dados_ibge_sp_spark.sinks.versioned import vacuum

    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir, 1996).limit(7)
    write_version(base, t)
    write_version(base, t)
    base.limit(3).write.parquet(f"{t}/v=99")  # crashed writer
    assert os.path.isdir(f"{t}/v=99")
    assert vacuum(t, keep=5) == [99]
    assert not os.path.isdir(f"{t}/v=99")
    # Committed versions under the keep horizon are untouched.
    assert read_version(spark, t).count() == 7
    assert read_version(spark, t, version=1).count() == 7


def test_concurrent_commit_detected(spark, tmp_path):
    """Lost-update detection: a second writer committing between this
    writer's manifest read and flip raises ConcurrentWriteError
    instead of silently discarding the other commit."""
    import pytest

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    V.write_version(df, t)

    # Simulate writer A reading the manifest, then writer B committing.
    man_a = V._read_manifest(t)
    V.append_version(df, t)  # writer B wins version 2
    with pytest.raises(V.ConcurrentWriteError, match="in flight"):
        V._commit(man_a, t, (man_a["current"] or 0) + 1,
                  [f"v={man_a['current'] + 1}"], df.schema.json(),
                  op="append", rows_written=1)
    # The table is untouched by the failed flip.
    assert V._read_manifest(t)["current"] == 2
    assert sorted(tuple(r) for r in V.read_version(spark, t).collect()) \
        == [(1, "a"), (1, "a")]


def test_commit_claim_race_one_winner(spark, tmp_path):
    """Two writers both based on version N racing for N+1: exactly one
    creates the put-if-absent marker; the loser raises instead of
    silently discarding the winner's commit."""
    import pytest

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    V.write_version(df, t)

    import copy
    man_a = copy.deepcopy(V._read_manifest(t))
    man_b = copy.deepcopy(man_a)
    args = ([f"v=2"], df.schema.json())
    V._commit(man_a, t, 2, *args, op="append", rows_written=1)
    with pytest.raises(V.ConcurrentWriteError):
        V._commit(man_b, t, 2, *args, op="append", rows_written=1)
    assert V._read_manifest(t)["current"] == 2


def test_crashed_claim_rolls_forward(spark, tmp_path):
    """A winner that crashed AFTER claiming its marker but BEFORE the
    manifest flip: the next writer completes the flip from the
    marker's full manifest (helping), then commits its own version on
    top — the crashed commit's data becomes visible, nothing is
    lost."""
    import copy
    import json
    import os

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    V.write_version(df, t)                       # v1

    # Hand-craft the crash: build v2's manifest + data dir exactly as
    # append_version would, write the MARKER, but never flip.
    spark.createDataFrame([(2, "b")], "k int, v string") \
        .coalesce(1).write.parquet(os.path.join(t, "v=2"))
    man2 = copy.deepcopy(V._read_manifest(t))
    man2["current"] = 2
    man2["versions"] = [1, 2]
    man2.setdefault("dirs", {})["2"] = {"base": 1, "add": "v=2"}
    man2.setdefault("schema", {})["2"] = man2["schema"]["1"]
    man2.setdefault("history", []).append(
        {"version": 2, "ts": 0.0, "op": "append", "rows_written": 1})
    os.makedirs(V._commits_dir(t), exist_ok=True)
    with open(os.path.join(V._commits_dir(t), "2.json"), "w") as fh:
        json.dump(man2, fh)
    assert V._read_manifest(t)["current"] == 1  # crash state

    # Next writer rolls v2 forward, then lands v3.
    V.append_version(spark.createDataFrame([(3, "c")],
                                           "k int, v string"), t)
    assert V._read_manifest(t)["current"] == 3
    assert sorted(tuple(r) for r in V.read_version(spark, t).collect()) \
        == [(1, "a"), (2, "b"), (3, "c")]
    assert os.listdir(V._commits_dir(t)) == []  # markers swept


def _crashed_v2_marker(spark, t, skip_v1=False):
    """Table at v1 with v2's data dir + commit marker on disk but the
    flip never performed — the crashed-winner state the fence tests
    start from.  Returns v2's manifest dict and the marker path.
    ``skip_v1`` assumes the caller already wrote v1."""
    import copy
    import json
    import os

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    if not skip_v1:
        df = spark.createDataFrame([(1, "a")], "k int, v string")
        V.write_version(df, t)                   # v1
    spark.createDataFrame([(2, "b")], "k int, v string") \
        .coalesce(1).write.parquet(os.path.join(t, "v=2"))
    man2 = copy.deepcopy(V._read_manifest(t))
    man2["current"] = 2
    man2["versions"] = [1, 2]
    man2.setdefault("dirs", {})["2"] = {"base": 1, "add": "v=2"}
    man2.setdefault("schema", {})["2"] = man2["schema"]["1"]
    man2.setdefault("history", []).append(
        {"version": 2, "ts": 0.0, "op": "append", "rows_written": 1})
    os.makedirs(V._commits_dir(t), exist_ok=True)
    marker = os.path.join(V._commits_dir(t), "2.json")
    with open(marker, "w") as fh:
        json.dump(man2, fh)
    return man2, marker


def test_stalled_helper_cannot_regress_manifest(spark, tmp_path,
                                                monkeypatch):
    """Lost-update fence on roll-forward: a helper that validated a
    marker, then stalled while the winner recovered (flipping v2) and
    a successor landed v3, must NOT flip the now-stale v2 content over
    v3.  Simulated by racing that exact history inside the helper's
    lock acquisition — the fix re-reads ``current`` under the lock."""
    import contextlib
    import os

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    man2, marker = _crashed_v2_marker(spark, t)
    assert V._read_manifest(t)["current"] == 1   # crash state

    real_lock = V._flip_lock
    armed = {"on": True}

    @contextlib.contextmanager
    def racing_lock(table_dir):
        if armed["on"]:
            armed["on"] = False
            # While the stalled helper waits on the lock: the winner
            # finishes its own flip, the marker is swept, and a
            # successor writer commits v3 on top.
            V._flip_manifest(table_dir, man2)
            os.remove(marker)
            V.append_version(spark.createDataFrame(
                [(3, "c")], "k int, v string"), t)   # v3
            assert V._read_manifest(table_dir)["current"] == 3
        with real_lock(table_dir):
            yield

    monkeypatch.setattr(V, "_flip_lock", racing_lock)
    V._roll_forward(t)                           # the stalled helper
    assert V._read_manifest(t)["current"] == 3   # no regression
    assert sorted(tuple(r) for r in V.read_version(spark, t).collect()) \
        == [(1, "a"), (2, "b"), (3, "c")]


def test_commit_detects_stale_claim_under_lock(spark, tmp_path,
                                               monkeypatch):
    """The race the 8-thread stress exposed: writer W verifies its
    target version is next, but ANOTHER writer commits that version
    (and sweeps its marker) before W reaches the critical section —
    W's claim would then look fresh while its flip could only regress
    or vanish.  Verify+claim+flip now share one locked section, so W
    must get ConcurrentWriteError and the racer's commit must stand."""
    import contextlib
    import copy
    import os

    import pytest

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    V.write_version(df, t)                       # v1

    man2 = copy.deepcopy(V._read_manifest(t))    # W's view: v2 is next

    real_lock = V._flip_lock
    armed = {"on": True}

    @contextlib.contextmanager
    def racing_lock(table_dir):
        if armed["on"]:
            armed["on"] = False
            # Before W enters the critical section: a racer lands v2
            # and its marker is swept — W's pre-verify already passed.
            V.append_version(spark.createDataFrame(
                [(2, "b")], "k int, v string"), t)
            assert V._read_manifest(table_dir)["current"] == 2
        with real_lock(table_dir):
            yield

    monkeypatch.setattr(V, "_flip_lock", racing_lock)
    with pytest.raises(V.ConcurrentWriteError, match="retry"):
        V._commit(man2, t, 2, {"base": 1, "add": "v=2x"},
                  df.schema.json(), op="append", rows_written=1)
    # The racer's commit stands untouched; W left no stale marker to
    # mislead a later roll-forward.
    assert V._read_manifest(t)["current"] == 2
    assert sorted(tuple(r) for r in V.read_version(spark, t).collect()) \
        == [(1, "a"), (2, "b")]
    assert os.listdir(V._commits_dir(t)) == []


def test_claimed_version_fences_pre_flip(spark, tmp_path, monkeypatch):
    """A crashed claimant (marker linked, flip never performed — the
    exact window _roll_forward exists for) must fence a racing
    writer's pre_flip: the manifest still reads version-1, so the
    racer's verify passes, but running pre_flip would rmtree the
    CLAIMED version's already-moved data — roll-forward would then
    make the claimant's commit durable over the racer's rows while
    the racer retries at N+1 and duplicates them.  The fix checks the
    marker inside the flip lock BEFORE pre_flip: ConcurrentWriteError,
    pre_flip never invoked, the claimant's data survives intact."""
    import contextlib
    import copy
    import os

    import pytest

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    V.write_version(df, t)                       # v1

    man2 = copy.deepcopy(V._read_manifest(t))    # racer's view: v2 next

    real_lock = V._flip_lock
    armed = {"on": True}

    @contextlib.contextmanager
    def racing_lock(table_dir):
        if armed["on"]:
            armed["on"] = False
            # While the racer waits on the lock: a claimant moves its
            # v=2 data, links its marker, and dies before the flip.
            _crashed_v2_marker(spark, table_dir, skip_v1=True)
            assert V._read_manifest(table_dir)["current"] == 1
        with real_lock(table_dir):
            yield

    monkeypatch.setattr(V, "_flip_lock", racing_lock)
    mutated = {"ran": False}

    def destructive_pre_flip():
        mutated["ran"] = True

    with pytest.raises(V.ConcurrentWriteError, match="claimed"):
        V._commit(man2, t, 2, {"base": 1, "add": "v=2"},
                  df.schema.json(), op="append", rows_written=1,
                  pre_flip=destructive_pre_flip)
    assert not mutated["ran"], \
        "pre_flip ran against a claimed version's data dir"
    # Roll-forward completes the claimant's commit over the
    # claimant's OWN data — nothing was rebuilt underneath it.
    V._roll_forward(t)
    assert V._read_manifest(t)["current"] == 2
    assert sorted(tuple(r) for r in V.read_version(spark, t).collect()) \
        == [(1, "a"), (2, "b")]
    assert os.listdir(V._commits_dir(t)) == []


def test_concurrent_commit_protocol_stress(spark, tmp_path):
    """Concurrency stress over the COMMIT PROTOCOL layer: 8 threads,
    each with its own pre-written data dir (unique names — the
    object-store model where data files never contend), race
    ``_commit`` with retry-on-ConcurrentWriteError.  Every commit must
    land exactly once (no lost updates), the version chain must be
    contiguous, and no marker may survive.  Exercises the lock-fenced
    roll-forward helpers and the marker-swept-by-peer
    FileNotFoundError path probabilistically — the deterministic
    fence tests above pin each interleaving.  (Concurrent writes to
    one SHARED v=N dir stay out of contract: the module serializes
    the manifest, not data dirs — see the module docstring.)"""
    import os
    import threading

    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(0, "seed")], "k int, v string")
    V.write_version(df, t)

    N = 8
    # Data dirs written serially up front; only the protocol races.
    for i in range(N):
        spark.createDataFrame([(i + 1, f"w{i}")], "k int, v string") \
            .coalesce(1).write.parquet(os.path.join(t, f"v=w{i}"))
    schema_json = df.schema.json()
    errs: list[Exception] = []

    def worker(i):
        for _ in range(60):  # bounded retries
            try:
                man = V._writer_manifest(t)
                prev = man["current"]
                V._commit(man, t, (prev or 0) + 1,
                          {"base": prev, "add": f"v=w{i}"},
                          schema_json, op="append", rows_written=1)
                return
            except V.ConcurrentWriteError:
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

    man = V._read_manifest(t)
    assert man["current"] == N + 1                   # seed + N commits
    assert man["versions"] == list(range(1, N + 2))  # contiguous
    rows = sorted(tuple(r) for r in V.read_version(spark, t).collect())
    assert rows == [(0, "seed")] + \
        [(i + 1, f"w{i}") for i in range(N)]         # exactly once each
    assert os.listdir(V._commits_dir(t)) == []       # markers swept


def test_crash_between_claim_and_flip_recovers(spark, tmp_path,
                                               monkeypatch):
    """Crash injection through the REAL _commit path (the
    hand-crafted-marker test above validates recovery shape; this one
    validates the marker _commit actually writes): the writer dies
    after winning its claim and before the flip — the next writer
    must roll the REAL marker forward, making the crashed commit's
    data visible, then land its own version on top."""
    from etl_dados_ibge_sp_spark.sinks import versioned as V

    t = str(tmp_path / "tbl")
    V.write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                    t)                                        # v1

    real_flip = V._flip_manifest
    boom = {"armed": True}

    def crashing_flip(table_dir, man):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("injected crash after claim, before flip")
        real_flip(table_dir, man)

    monkeypatch.setattr(V, "_flip_manifest", crashing_flip)
    import pytest
    with pytest.raises(OSError, match="injected crash"):
        V.append_version(spark.createDataFrame([(2, "b")],
                                               "k int, v string"), t)
    # Crash state: data dir + marker on disk, manifest still at v1.
    assert V._read_manifest(t)["current"] == 1
    import os
    assert os.listdir(V._commits_dir(t)) == ["2.json"]

    # Next writer helps the crashed commit forward, then lands v3.
    V.append_version(spark.createDataFrame([(3, "c")],
                                           "k int, v string"), t)
    assert V._read_manifest(t)["current"] == 3
    assert sorted(tuple(r) for r in V.read_version(spark, t).collect()) \
        == [(1, "a"), (2, "b"), (3, "c")]
    assert os.listdir(V._commits_dir(t)) == []
