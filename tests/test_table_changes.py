"""Laws for versioned-table snapshot diff (sinks/versioned.
table_changes): brute-force multiset diff, the apply identity
(old + inserts - deletes == new), self-diff emptiness, duplicate-row
counting, and the vacuumed-endpoint error."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sinks.versioned import (read_version,
                                                     table_changes,
                                                     vacuum,
                                                     write_version)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_orderstatus", "o_totalprice")


def _multiset(df, drop=()):
    cols = [c for c in df.columns if c not in drop]
    return Counter(tuple(r) for r in df.select(*cols).collect())


def test_diff_matches_brute_force_and_apply_identity(spark, sf_dir,
                                                     tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir)
    v1_df = base.filter(F.col("o_orderkey") % 3 != 0)
    v2_df = base.filter(F.col("o_orderkey") % 5 != 0) \
                .withColumn("o_totalprice",
                            F.col("o_totalprice") + 1)  # updates too
    write_version(v1_df, t)
    write_version(v2_df, t)
    ch = table_changes(spark, t, from_version=1)
    ins = _multiset(ch.filter("_change_type = 'insert'"),
                    drop=("_change_type",))
    del_ = _multiset(ch.filter("_change_type = 'delete'"),
                     drop=("_change_type",))
    old, new = _multiset(v1_df), _multiset(v2_df)
    assert ins == new - old
    assert del_ == old - new
    # Apply identity: a consumer at v1 replaying the diff lands on v2.
    assert old + ins - del_ == new


def test_self_diff_is_empty(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_orders(spark, sf_dir), t)
    assert table_changes(spark, t, 1, to_version=1).count() == 0


def test_duplicate_rows_diff_by_count(spark, tmp_path):
    """Multiset semantics: 3 copies -> 1 copy must emit exactly 2
    delete rows (a set-based diff would emit none)."""
    t = str(tmp_path / "tbl")
    one = spark.createDataFrame([(1, "a")], "k int, v string")
    three = one.unionAll(one).unionAll(one)
    write_version(three, t)
    write_version(one, t)
    ch = table_changes(spark, t, 1).collect()
    assert [r._change_type for r in ch] == ["delete", "delete"]


def test_diff_against_vacuumed_version_fails_clearly(spark, sf_dir,
                                                     tmp_path):
    t = str(tmp_path / "tbl")
    base = _orders(spark, sf_dir).limit(5)
    for _ in range(4):
        write_version(base, t)
    vacuum(t, keep=1)
    with pytest.raises(ValueError, match="not available"):
        table_changes(spark, t, 1)
    # The surviving endpoint still reads fine.
    assert read_version(spark, t).count() == 5
