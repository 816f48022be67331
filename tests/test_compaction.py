"""Laws for versioned-table compaction (sinks/versioned.compact):
row preservation, file-count reduction, idempotence, snapshot safety,
and the sort_by clustering guarantee (disjoint per-file key ranges)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (compact,
                                                     read_version,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_custkey", "o_totalprice")


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_compact_preserves_rows_and_reduces_files(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    write_version(base.repartition(16), t)  # fragmented snapshot
    before = _rowset(read_version(spark, t))
    v, n_before, n_after = compact(spark, t)
    assert v == 2
    assert n_before == 16
    assert n_after < n_before
    assert _rowset(read_version(spark, t)) == before
    # Pre-compaction snapshot stays time-travelable until vacuumed.
    assert _rowset(read_version(spark, t, version=1)) == before


def test_compact_is_idempotent(spark, sf_dir, tmp_path):
    """A snapshot already at the file-count target is returned
    unchanged — re-running compaction must not churn versions."""
    t = str(tmp_path / "tbl")
    write_version(_orders(spark, sf_dir).repartition(8), t)
    v1, _, _ = compact(spark, t)
    v2, n_before, n_after = compact(spark, t)
    assert (v1, v2) == (2, 2)
    assert n_before == n_after


def test_compact_file_count_tracks_byte_target(spark, sf_dir, tmp_path):
    """A small target splits the rewrite into multiple files; the
    output count is ceil(bytes/target), not always 1."""
    t = str(tmp_path / "tbl")
    write_version(_orders(spark, sf_dir).repartition(16), t)
    _, _, n_after = compact(spark, t, target_file_bytes=16 << 10)
    assert 1 < n_after < 16


def test_compact_sort_by_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """With sort_by, per-file [min,max] key ranges must not overlap —
    the property parquet min/max skipping needs to prune whole files."""
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    write_version(base.repartition(16), t)
    v, _, n_after = compact(spark, t, target_file_bytes=16 << 10,
                            sort_by=["o_orderkey"])
    assert n_after > 1  # the law below is vacuous with one file
    ranges = (read_version(spark, t)
              .groupBy(F.input_file_name().alias("f"))
              .agg(F.min("o_orderkey").alias("lo"),
                   F.max("o_orderkey").alias("hi"))
              .collect())
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert len(spans) == n_after
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next
    assert _rowset(read_version(spark, t)) == _rowset(base)


def test_compact_zorder_tightens_both_columns(spark, sf_dir, tmp_path):
    """Z-order compaction's differentiating property vs a single-key
    sort at the SAME file-size target: the sort leaves the second
    column's per-file min/max span at ~the full range (no skipping on
    it), while the Morton layout tightens BOTH columns at once."""
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    write_version(base.repartition(8), t)

    def spans(col):
        rs = (read_version(spark, t)
              .groupBy(F.input_file_name())
              .agg((F.max(col) - F.min(col)).alias("s")).collect())
        return sum(r.s for r in rs) / len(rs)

    frag_key = spans("o_orderkey")
    compact(spark, t, target_file_bytes=4 << 10,
            sort_by=["o_orderkey"])
    sorted_price = spans("o_totalprice")

    v, _, n_after = compact(spark, t, target_file_bytes=4 << 10,
                            zorder_by=["o_orderkey", "o_totalprice"])
    assert n_after > 4  # the law is vacuous with a couple of cells
    assert spans("o_totalprice") < 0.5 * sorted_price
    # 0.8: at the tiny test SF the Morton grid is coarse (few cells),
    # so the per-dimension tightening is real but modest; at sf0.01
    # the same layout measures ~0.27x.
    assert spans("o_orderkey") < 0.8 * frag_key
    assert _rowset(read_version(spark, t)) == _rowset(base)
    assert "zkey" not in read_version(spark, t).columns


def test_timestamp_as_of_time_travel(spark, tmp_path):
    from etl_dados_ibge_sp_spark.sinks.versioned import table_history

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1,)], "k int"), t)
    write_version(spark.createDataFrame([(1,), (2,)], "k int"), t)
    hist = {h["version"]: h["ts"] for h in table_history(t)}
    assert read_version(spark, t, as_of_ts=hist[1]).count() == 1
    assert read_version(spark, t,
                        as_of_ts=(hist[1] + hist[2]) / 2).count() == 1
    assert read_version(spark, t, as_of_ts=hist[2] + 1).count() == 2
    with pytest.raises(ValueError, match="no version committed"):
        read_version(spark, t, as_of_ts=hist[1] - 1)
    with pytest.raises(ValueError, match="not both"):
        read_version(spark, t, version=1, as_of_ts=hist[1])


def test_compact_empty_table_fails_clearly(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no committed version"):
        compact(spark, str(tmp_path / "nope"))
