"""Sources: sanitized JSON (S1-S3), CSV sniff (S4-S5), latest-file
(S7), JDBC option plumbing (S6) — the FIXTURES.md dirty-input cases."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.sources import (
    latest_file, read_csv_sniffed, read_sanitized_json, unwrap_envelope,
)


def test_sanitized_json_envelope(spark, tmp_path):
    # Envelope dict whose first key wraps the records; dirty INF/NaN
    # tokens inside numeric strings (FIXTURES.md F1).
    body = ('{"registros": ['
            '{"Município": "Botucatu", "Admitidos": "10", "Saldo": "INF"},'
            '{"Município": "Bauru", "Admitidos": "NaN", "Saldo": "-3"}'
            '], "outra_chave": 1}')
    p = tmp_path / "extract.json"
    p.write_text(body)
    parsed = read_sanitized_json(spark, str(p))
    rows = unwrap_envelope(parsed).orderBy("Município").collect()
    assert [r["Município"] for r in rows] == ["Bauru", "Botucatu"]
    # dirty tokens became nulls pre-parse
    assert rows[0]["Admitidos"] is None
    assert rows[1]["Saldo"] is None
    assert rows[1]["Admitidos"] == "10"


def test_sanitized_json_bare_list(spark, tmp_path):
    p = tmp_path / "bare.json"
    p.write_text('[{"a": 1}, {"a": 2}]')
    parsed = read_sanitized_json(spark, str(p))
    out = unwrap_envelope(parsed)
    assert sorted(r["a"] for r in out.collect()) == [1, 2]


def test_csv_sniff_semicolon_and_comma(spark, tmp_path):
    semi = tmp_path / "semi.csv"
    semi.write_text("COD;NOME\n3501608;Botucatu\n3506003;Bauru\n")
    comma = tmp_path / "comma.csv"
    comma.write_text("COD,NOME\n3501608,Botucatu\n")
    df1 = read_csv_sniffed(spark, str(semi))
    assert df1.columns == ["COD", "NOME"] and df1.count() == 2
    df2 = read_csv_sniffed(spark, str(comma))
    assert df2.columns == ["COD", "NOME"] and df2.count() == 1


def test_latest_file(tmp_path):
    a = tmp_path / "a.json"
    a.write_text("{}")
    os.utime(a, (time.time() - 100, time.time() - 100))
    b = tmp_path / "b.json"
    b.write_text("{}")
    assert latest_file(str(tmp_path)) == str(b)
    assert latest_file(str(tmp_path), "*.csv") is None


def test_jdbc_reader_builds_plan(spark):
    # No database in the container: assert the reader carries the
    # pushed-down query + partitioning options (plan-level check).
    from etl_dados_ibge_sp_spark.sources.jdbc_source import read_jdbc_query
    try:
        read_jdbc_query(
            spark, "jdbc:postgresql://nowhere/db",
            "SELECT DISTINCT municipio FROM t",
            properties={"user": "u"},
            partition_column="id", lower_bound=0, upper_bound=10,
            num_partitions=4)
    except Exception as e:  # driver class missing — expected offline
        assert "driver" in str(e).lower() or "connect" in str(e).lower()


def test_csv_sink_roundtrip(spark, tmp_path):
    # K1: `;`-separated CSV write, single-file parity mode; re-reading
    # with the sniffing reader restores the rows.
    from etl_dados_ibge_sp_spark.sinks.csv_sink import write_csv

    df = spark.createDataFrame(
        [(1, "Botucatu", 10.5), (2, "Bauru", -3.0)],
        ["id", "municipio", "saldo"])
    out = str(tmp_path / "out_csv")
    write_csv(df, out, single_file=True)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1  # coalesced single shard
    back = read_csv_sniffed(spark, out)
    got = {(int(r["id"]), r["municipio"], float(r["saldo"]))
           for r in back.collect()}
    assert got == {(1, "Botucatu", 10.5), (2, "Bauru", -3.0)}


def test_prune_old_files(tmp_path):
    # K5: keep the 2 newest, delete the rest, oldest-first.
    from etl_dados_ibge_sp_spark.sources.files import prune_old_files

    now = time.time()
    for i in range(5):
        p = tmp_path / f"f{i}.csv"
        p.write_text("x")
        os.utime(p, (now - 100 + i, now - 100 + i))  # f4 newest
    deleted = prune_old_files(str(tmp_path), "*.csv", keep=2)
    assert sorted(os.path.basename(d) for d in deleted) == \
        ["f0.csv", "f1.csv", "f2.csv"]
    assert sorted(f.name for f in tmp_path.iterdir()) == \
        ["f3.csv", "f4.csv"]


def test_anti_join_empty_warehouse_schema_pinned(spark):
    # The "V22 fix" (SURVEY §1.3, T4): an EMPTY warehouse snapshot with
    # pinned key dtypes must anti-join cleanly and keep every incoming
    # row — no implicit coercion, no analysis error.
    from pyspark.sql import types as T

    from etl_dados_ibge_sp_spark.operators.joins import anti_join_dedup
    from etl_dados_ibge_sp_spark.operators.repair import pin_key_types

    incoming = spark.createDataFrame(
        [("Botucatu", 2025, 10), ("Bauru", 2025, 10)],
        ["municipio", "ano_ref", "mes_ref"])
    empty = spark.createDataFrame([], T.StructType([
        T.StructField("municipio", T.StringType()),
        T.StructField("ano_ref", T.StringType()),   # wrong dtype on purpose
        T.StructField("mes_ref", T.StringType()),
    ]))
    pinned = pin_key_types(empty, {"municipio": "string",
                                   "ano_ref": "bigint",
                                   "mes_ref": "bigint"})
    out = anti_join_dedup(incoming, pinned,
                          ["municipio", "ano_ref", "mes_ref"])
    assert out.count() == 2
    assert dict(pinned.dtypes)["ano_ref"] == "bigint"


def test_sanitized_json_inference_stays_jvm_side(spark, tmp_path):
    """The no-schema inference path must not bounce bodies through
    Python: no RDD/Python-eval nodes in the executed plan (VERDICT r1
    item 7 — the JVM Dataset[String] reader overload, not clean.rdd)."""
    p = tmp_path / "x.json"
    p.write_text('{"rows": [{"a": 1}, {"a": 2}]}')
    out = unwrap_envelope(read_sanitized_json(spark, str(p)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not any(t in plan for t in
                   ("BatchEvalPython", "ArrowEvalPython", "ExistingRDD",
                    "MapPartitions"))
    assert sorted(r["a"] for r in out.collect()) == [1, 2]


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC sink/source roundtrip preserves values; filters push into
    the ORC scan (same lakehouse properties as parquet)."""
    from etl_dados_ibge_sp_spark.sources.orc_source import read_orc, write_orc

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)
    back = read_orc(spark, path)
    assert sorted(back.columns) == sorted(nation.columns)
    assert back.count() == nation.count()
    a = {tuple(r) for r in nation.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b

    plan = (back.filter(F.col("n_regionkey") == 1)
            .select("n_name")._jdf.queryExecution().executedPlan()
            .toString())
    assert "n_regionkey" in plan  # filter reached the scan


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partitioned ORC layout: a partition-key filter prunes to one
    directory (scan reads a single partition, not the table)."""
    from etl_dados_ibge_sp_spark.sources.orc_source import read_orc, write_orc

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation_orc_part")
    write_orc(nation, path, partition_by=["n_regionkey"])
    back = read_orc(spark, path).filter(F.col("n_regionkey") == 2)
    expected = nation.filter(F.col("n_regionkey") == 2).count()
    assert back.count() == expected
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "n_regionkey" in plan
