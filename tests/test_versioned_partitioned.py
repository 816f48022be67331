"""Laws for hive-partitioned snapshots (sinks/versioned
partition_by): round-trip with partition columns, partition pruning in
the plan, appends inheriting the layout, compaction preserving it, and
the streaming CDC source reading partition columns."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     compact,
                                                     merge_version,
                                                     read_version,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_orderstatus", "o_totalprice")


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    write_version(base, t, partition_by=["o_orderstatus"])
    assert os.path.isdir(f"{t}/v=1/o_orderstatus=F")
    got = read_version(spark, t)
    assert sorted(got.columns) == sorted(base.columns)
    assert _rowset(got) == _rowset(base)
    # A partition-column filter must prune at the scan, not post-scan.
    plan = (got.filter("o_orderstatus = 'F'")
            ._jdf.queryExecution().executedPlan().toString())
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan[:800]


def test_partitioned_append_chain_and_compact(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    a = base.filter("o_orderkey % 2 = 0")
    b = base.filter("o_orderkey % 2 = 1")
    write_version(a, t, partition_by=["o_orderstatus"])
    append_version(b, t)  # inherits the hive layout
    assert os.path.isdir(f"{t}/v=2/o_orderstatus=F")
    cur = read_version(spark, t)
    assert _rowset(cur) == _rowset(base)
    # Time travel on the partitioned chain.
    assert _rowset(read_version(spark, t, version=1)) == _rowset(a)
    # Compaction folds the chain and PRESERVES the partition layout.
    v, _, _ = compact(spark, t)
    assert v == 3
    assert os.path.isdir(f"{t}/v=3/o_orderstatus=F")
    assert _rowset(read_version(spark, t)) == _rowset(base)


def test_partitioned_merge_preserves_layout(spark, tmp_path):
    t = str(tmp_path / "tbl")
    target = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0)], "k int, part string, x double")
    write_version(target, t, partition_by=["part"])
    ups = spark.createDataFrame([(2, "B", 25.0), (3, "A", 30.0)],
                                "k int, part string, x double")
    merge_version(spark, t, ups, keys=["k"])
    assert os.path.isdir(f"{t}/v=2/part=A")
    got = {r.k: (r.part, r.x) for r in read_version(spark, t).collect()}
    assert got == {1: ("A", 10.0), 2: ("B", 25.0), 3: ("A", 30.0)}


def test_vtable_stream_reads_partition_columns(spark, tmp_path):
    from etl_dados_ibge_sp_spark.sources.vtable_stream_source import (
        register_vtable)

    register_vtable(spark)
    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "A", 10.0)],
                                        "k int, part string, x double"),
                  t, partition_by=["part"])
    append_version(spark.createDataFrame([(2, "B", 20.0)],
                                         "k int, part string, x double"),
                   t)
    rows: list[tuple] = []

    def sink(batch_df, _bid):
        rows.extend(tuple(r) for r in batch_df.collect())

    q = (spark.readStream.format("vtable").option("path", t).load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    try:
        assert q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    assert sorted(rows) == [(1, "A", 10.0), (2, "B", 20.0)]
