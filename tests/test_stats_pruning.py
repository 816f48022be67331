"""Laws for manifest-level dir pruning (write_version(stats_cols=) +
read_version(prune=)): the prune is a pure optimization — same rows
after the caller's own filter, strictly fewer input files — appends
inherit the stats columns, deletes/compact/vacuum compose, and dirs
without stats are never pruned."""

from __future__ import annotations

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     compact,
                                                     delete_where,
                                                     read_version,
                                                     vacuum,
                                                     write_version)


def _daily(spark, day, n=4):
    rows = [(day * 100 + i, day, i * 1.5) for i in range(n)]
    return spark.createDataFrame(rows, "k bigint, day int, x double")


def _build(spark, t, days=5):
    write_version(_daily(spark, 0), t, stats_cols=["day"])
    for d in range(1, days):
        append_version(_daily(spark, d), t)  # inherits stats_cols
    return t


def test_prune_same_rows_fewer_files(spark, tmp_path):
    t = _build(spark, str(tmp_path / "tbl"))
    full = read_version(spark, t)
    pruned = read_version(spark, t, prune={"day": (3, 4)})
    want = sorted(tuple(r) for r in
                  full.filter("day BETWEEN 3 AND 4").collect())
    got = sorted(tuple(r) for r in
                 pruned.filter("day BETWEEN 3 AND 4").collect())
    assert got == want
    assert set(pruned.inputFiles()) < set(full.inputFiles())
    # Exactly the two in-range dirs' files survive planning.
    assert all("/v=4/" in f or "/v=5/" in f
               for f in pruned.inputFiles())


def test_one_sided_bounds_and_all_pruned(spark, tmp_path):
    t = _build(spark, str(tmp_path / "tbl"))
    hi = read_version(spark, t, prune={"day": (None, 0)})
    assert all("/v=1/" in f for f in hi.inputFiles())
    none = read_version(spark, t, prune={"day": (99, None)})
    assert none.count() == 0
    assert none.columns == ["k", "day", "x"]  # committed schema kept


def test_unstated_dirs_never_pruned(spark, tmp_path):
    """A table written WITHOUT stats_cols has no stats: prune keeps
    everything (safe), never silently drops data."""
    t = str(tmp_path / "tbl")
    write_version(_daily(spark, 0), t)
    append_version(_daily(spark, 1), t)
    assert read_version(spark, t, prune={"day": (99, 99)}).count() == \
        read_version(spark, t).count()


def test_prune_composes_with_deletes_compact_vacuum(spark, tmp_path):
    t = _build(spark, str(tmp_path / "tbl"))
    delete_where(spark, t, "k = 301")  # one row of day 3
    got = sorted(tuple(r) for r in
                 read_version(spark, t, prune={"day": (3, 3)})
                 .filter("day = 3").collect())
    assert got == [(300, 3, 0.0), (302, 3, 3.0), (303, 3, 4.5)]
    # Compact folds the chain; its new dir records fresh stats under
    # the inherited stats_cols, so pruning still works afterwards.
    compact(spark, t)
    append_version(_daily(spark, 9), t)
    pruned = read_version(spark, t, prune={"day": (9, 9)})
    assert all("/v=8/" in f for f in pruned.inputFiles())
    assert pruned.filter("day = 9").count() == 4
    vacuum(t, keep=1)
    assert read_version(spark, t, prune={"day": (9, 9)}) \
        .filter("day = 9").count() == 4


def test_native_sink_records_footer_stats(spark, tmp_path):
    """Dirs appended by the vtable streaming SINK carry stats too —
    merged from the staged files' parquet footers at commit, zero
    data reads — so sink-fed tables stay prunable."""
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        register_vtable)

    register_vtable(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    # dst is created with stats_cols, then fed by the native sink.
    write_version(_daily(spark, 0), dst, stats_cols=["day"])
    write_version(_daily(spark, 7), src)
    q = (spark.readStream.format("vtable").option("path", src).load()
         .writeStream.format("vtable").option("path", dst)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    try:
        assert q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    from etl_dados_ibge_sp_spark.sinks.versioned import _read_manifest
    stats = _read_manifest(dst)["stats"]
    assert stats["v=2"]["day"] == [7, 7]
    pruned = read_version(spark, dst, prune={"day": (7, 7)})
    assert all("/v=2/" in f for f in pruned.inputFiles())
    assert pruned.count() == 4


# ----------------------------------------------------------------------
# Dir-level Bloom pruning (write_version(bloom_cols=) +
# read_version(prune_eq=)) — the equality complement of the min/max
# stats: same hint-not-filter law, false positives only keep dirs.
# ----------------------------------------------------------------------

def _bloom_build_tbl(spark, t, days=5):
    # Disjoint k-ranges per dir: day d holds keys d*100 .. d*100+3.
    write_version(_daily(spark, 0), t, bloom_cols=["k"])
    for d in range(1, days):
        append_version(_daily(spark, d), t)  # inherits bloom_cols
    return t


def test_bloom_prune_same_rows_fewer_files(spark, tmp_path):
    t = _bloom_build_tbl(spark, str(tmp_path / "tbl"))
    full = read_version(spark, t)
    pruned = read_version(spark, t, prune_eq={"k": 302})
    want = sorted(tuple(r) for r in full.filter("k = 302").collect())
    got = sorted(tuple(r) for r in pruned.filter("k = 302").collect())
    assert got == want and len(got) == 1
    assert set(pruned.inputFiles()) < set(full.inputFiles())
    # The key's own dir always survives (no false negatives, ever).
    assert any("/v=4/" in f for f in pruned.inputFiles())


def test_bloom_prune_absent_key_and_string_col(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "k int, name string"), t,
        bloom_cols=["name"])
    append_version(spark.createDataFrame(
        [(3, "gamma"), (4, "delta")], "k int, name string"), t)
    hit = read_version(spark, t, prune_eq={"name": "delta"})
    assert sorted(tuple(r) for r in
                  hit.filter("name = 'delta'").collect()) == \
        [(4, "delta")]
    # A key in no dir: every dir may prune away — empty frame, schema
    # kept (same contract as the min/max all-pruned case).
    none = read_version(spark, t, prune_eq={"name": "omega"})
    assert none.count() == 0
    assert none.columns == ["k", "name"]


def test_bloom_unstated_dirs_never_pruned(spark, tmp_path):
    """Dirs without blooms (older commits, the vtable sink's appends)
    are always kept — prune_eq is safe on mixed tables."""
    t = str(tmp_path / "tbl")
    write_version(_daily(spark, 0), t)            # no blooms
    append_version(_daily(spark, 1), t)
    assert read_version(spark, t, prune_eq={"k": -1}).count() == \
        read_version(spark, t).count()


def test_bloom_bits_recorded_per_version(spark, tmp_path):
    """Changing bloom_bits on a later write must not corrupt
    time-travel pruning of earlier versions: each version's bloom is
    probed with the m_bits it was BUILT with (recorded per entry), so
    read(v=old, prune_eq).filter(p) == read(v=old).filter(p) even
    after the table-global bloom_bits moved."""
    t = str(tmp_path / "tbl")
    write_version(_daily(spark, 0), t, bloom_cols=["k"],
                  bloom_bits=1 << 8)
    append_version(_daily(spark, 1), t)           # built at 1 << 8
    # Explicit bloom_cols= re-pins bloom_bits table-wide — the exact
    # scenario that used to probe v=1/v=2 blooms with the wrong size.
    write_version(_daily(spark, 2), t, bloom_cols=["k"],
                  bloom_bits=1 << 13)
    for key in (1, 2, 100, 103):                  # all live in v<=2
        got = read_version(spark, t, version=2,
                           prune_eq={"k": key}).filter(f"k = {key}")
        assert got.count() == 1, f"key {key} falsely excluded"


def test_bloom_legacy_flat_entries_still_probe(spark, tmp_path):
    """Manifests written before per-version bits (flat {col: hexmap}
    entries) keep working: the probe falls back to the table-global
    bloom_bits for those entries."""
    import json

    from etl_dados_ibge_sp_spark.sinks.versioned import _manifest_path

    t = _bloom_build_tbl(spark, str(tmp_path / "tbl"), days=3)
    mp = _manifest_path(t)
    man = json.loads(open(mp).read())
    # Rewrite every entry to the legacy flat shape (bits == the
    # table-global value, exactly how old manifests were written).
    man["blooms"] = {d: e["cols"] for d, e in man["blooms"].items()}
    with open(mp, "w") as f:
        json.dump(man, f)
    pruned = read_version(spark, t, prune_eq={"k": 102})
    assert pruned.filter("k = 102").count() == 1
    assert any("/v=2/" in f for f in pruned.inputFiles())


def test_bloom_bits_change_migrates_legacy_entries(spark, tmp_path):
    """A later write_version(bloom_cols=, bloom_bits=<new>) on a table
    holding LEGACY flat bloom entries must not corrupt them: flat
    entries probe via the mutable table-global bloom_bits, so moving
    that global would compute wrong bit positions for every legacy dir
    and FALSELY exclude dirs on prune/time-travel reads.  The writer
    migrates legacy entries in place to {bits: <old global>, cols: …}
    before touching the global."""
    import json

    from etl_dados_ibge_sp_spark.sinks.versioned import _manifest_path

    t = str(tmp_path / "tbl")
    write_version(_daily(spark, 0), t, bloom_cols=["k"],
                  bloom_bits=1 << 8)
    append_version(_daily(spark, 1), t)           # built at 1 << 8
    mp = _manifest_path(t)
    man = json.loads(open(mp).read())
    # Regress both entries to the legacy flat shape (pre-upgrade
    # manifests: probe size comes from the table-global bloom_bits).
    man["blooms"] = {d: e["cols"] for d, e in man["blooms"].items()}
    with open(mp, "w") as f:
        json.dump(man, f)

    # The mutating write: same cols, DIFFERENT bits.  Without the
    # migration this silently re-sizes the probe for v=1 and v=2.
    write_version(_daily(spark, 2), t, bloom_cols=["k"],
                  bloom_bits=1 << 13)

    man = json.loads(open(mp).read())
    for d in ("v=1", "v=2"):
        assert man["blooms"][d]["bits"] == 1 << 8, \
            f"{d} not pinned to the bits it was built with"
    assert man["blooms"]["v=3"]["bits"] == 1 << 13
    assert man["bloom_bits"] == 1 << 13
    # The law the migration protects: no false exclusions.  v=3 is a
    # full replace (day-2 keys only); the legacy dirs are reachable by
    # TIME TRAVEL, the read that probes their migrated entries.
    for key in (200, 203):
        got = read_version(spark, t,
                           prune_eq={"k": key}).filter(f"k = {key}")
        assert got.count() == 1, f"key {key} falsely excluded"
    for key in (1, 2, 100, 103):
        got = read_version(spark, t, version=2,
                           prune_eq={"k": key}).filter(f"k = {key}")
        assert got.count() == 1, f"key {key} falsely excluded at v=2"


def test_bloom_composes_with_stats_and_vacuum(spark, tmp_path):
    """prune (range) and prune_eq (equality) drop independently, and
    vacuum sweeps retired dirs' blooms exactly like stats."""
    from etl_dados_ibge_sp_spark.sinks.versioned import _read_manifest

    t = str(tmp_path / "tbl")
    write_version(_daily(spark, 0), t, stats_cols=["day"],
                  bloom_cols=["k"])
    for d in range(1, 4):
        append_version(_daily(spark, d), t)
    both = read_version(spark, t, prune={"day": (2, 3)},
                        prune_eq={"k": 302})
    assert sorted(tuple(r) for r in
                  both.filter("k = 302").collect()) == \
        sorted(tuple(r) for r in
               read_version(spark, t).filter("k = 302").collect())
    assert all("/v=4/" in f for f in both.inputFiles())
    compact(spark, t)                              # folds the chain
    vacuum(t, keep=1)
    man = _read_manifest(t)
    assert set(man.get("blooms", {})) <= {f"v={man['current']}"} | set()
    # The folded snapshot (a write_version via compact) re-records
    # blooms because bloom_cols persist on the manifest.
    assert f"v={man['current']}" in man.get("blooms", {})
    assert read_version(
        spark, t, prune_eq={"k": 302}).filter("k = 302").count() == 1
