"""Laws for copy-on-write MERGE on versioned tables
(sinks/versioned.merge_version): brute-force dict-merge parity,
delete precedence, schema/column-order preservation, and snapshot
isolation of the pre-merge version."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (merge_version,
                                                     read_version,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_orderstatus", "o_totalprice")


def test_merge_matches_brute_force(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    target = base.filter("o_orderkey % 4 != 0")
    updates = (base.filter("o_orderkey % 3 = 0")
               .withColumn("o_orderstatus", F.lit("M"))
               .withColumn("o_totalprice", F.col("o_totalprice") + 5))
    deletes = base.filter("o_orderkey % 7 = 0") \
        .select("o_orderkey").distinct()
    write_version(target, t)
    v = merge_version(spark, t, updates, keys=["o_orderkey"],
                      deletes=deletes)
    assert v == 2

    brute = {r.o_orderkey: (r.o_orderstatus, r.o_totalprice)
             for r in target.collect()}
    for r in updates.collect():
        brute[r.o_orderkey] = (r.o_orderstatus, r.o_totalprice)
    for r in deletes.collect():  # delete wins over update
        brute.pop(r.o_orderkey, None)

    got_df = read_version(spark, t)
    assert got_df.columns == target.columns  # order preserved
    got = {r.o_orderkey: (r.o_orderstatus, r.o_totalprice)
           for r in got_df.collect()}
    assert got == brute
    # Every merged key is present exactly once.
    assert got_df.count() == len(brute)
    # Pre-merge version is untouched.
    assert sorted(r.o_orderkey for r in
                  read_version(spark, t, version=1).collect()) == \
        sorted(brute_k for brute_k in
               (r.o_orderkey for r in target.collect()))


def test_merge_rejects_duplicate_keys_either_side(spark, tmp_path):
    """The winner selection keeps one row per key, so duplicate-key
    inputs would silently lose rows — MERGE's well-formedness rule is
    enforced on BOTH sides, and a violation commits nothing."""
    import pytest

    from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                         table_history)

    t = str(tmp_path / "tbl")
    one = spark.createDataFrame([(1, "a")], "k int, v string")
    write_version(one, t)
    append_version(one, t)  # duplicate key 1 in the TABLE
    ups = spark.createDataFrame([(2, "x")], "k int, v string")
    with pytest.raises(ValueError, match="table has multiple rows"):
        merge_version(spark, t, ups, keys=["k"])

    t2 = str(tmp_path / "tbl2")
    write_version(one, t2)
    with pytest.raises(ValueError, match="updates has multiple rows"):
        merge_version(spark, t2, ups.unionAll(ups), keys=["k"])
    # Nothing was committed by the failed merges.
    assert [h["op"] for h in table_history(t)] == ["write", "append"]
    assert [h["op"] for h in table_history(t2)] == ["write"]


def test_merge_records_op_in_history(spark, tmp_path):
    from etl_dados_ibge_sp_spark.sinks.versioned import table_history

    t = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k int, v string"),
                  t)
    merge_version(spark, t,
                  spark.createDataFrame([(2, "b")], "k int, v string"),
                  keys=["k"])
    assert [h["op"] for h in table_history(t)] == ["write", "merge"]


def test_merge_without_deletes_is_pure_upsert(spark, tmp_path):
    t = str(tmp_path / "tbl")
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string")
    updates = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k int, v string")
    write_version(target, t)
    merge_version(spark, t, updates, keys=["k"])
    got = {r.k: r.v for r in read_version(spark, t).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
