"""Domain-true pipeline parity: the FIXTURES.md F1/F2 chain
(P1→P3 renames, J1 enrichment with case/whitespace normalization and
positional dim fallback, T1-T3 repair, P4 allowlist) and the
run-twice idempotency law of the restatement sink."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_dados_ibge_sp_spark.plans.caged_pipeline import (
    LOAD_ALLOWLIST, caged_transform,
)
from etl_dados_ibge_sp_spark.sinks.parquet_sink import restate_partition


@pytest.fixture()
def raw_caged(spark):
    rows = [
        # dirty tokens, bogus undefined col, mixed-case municipality
        ("19.35", "Botucatu", "Comércio", "Varejo", "G", "47", "471",
         "4711", "47113", "120", "-24.0", "96", "1500", "INF", "14.2"),
        ("", "  BAURU ", "Indústria", None, "C", "10", "101",
         "1011", "10111", "NaN", "33.0", "", "800", "0.15", ""),
        (None, "Inexistente", None, "Serviços", "S", None, None,
         None, None, "7", "2.0", "5", "60", "-0.02", "3.1"),
    ]
    cols = ["undefined", "Município",
            "Grande Grupamento Atividade Econômica", "Atividade Econômica",
            "CNAE 2.0 Seção", "CNAE 2.0 Divisão", "CNAE 2.0 Grupo",
            "CNAE 2.0 Classe", "CNAE 2.0 Subclasse", "Admitidos",
            "Desligados", "Saldo", "Estoque", "Variação Relativa",
            "Tempo de Emprego"]
    return spark.createDataFrame(rows, cols)


@pytest.fixture()
def ibge_dim(spark):
    return spark.createDataFrame(
        [(3501608, "botucatu"), (3506003, "Bauru")], ["COD", "NOME"])


def test_caged_transform_chain(spark, raw_caged, ibge_dim):
    out = caged_transform(raw_caged, ibge_dim, ano=2025, mes=10)
    assert out.columns == [c for c in LOAD_ALLOWLIST]
    rows = {r["municipio"]: r for r in out.collect()}
    # J1: case/whitespace-normalized join hits both spellings
    assert rows["Botucatu"]["codigo_ibge"] == 3501608
    assert rows["  BAURU "]["codigo_ibge"] == 3506003
    # P6/T3: miss -> 0
    assert rows["Inexistente"]["codigo_ibge"] == 0
    # T1: INF -> null -> 0.0; empty string -> 0
    assert rows["Botucatu"]["variacao_relativa"] == 0.0
    assert rows["  BAURU "]["admitidos"] == 0
    assert rows["  BAURU "]["saldo"] == 0
    # negative measures survive (FIXTURES: Desligados both signs)
    assert rows["Botucatu"]["desligados"] == -24
    # T2: category fill
    assert rows["Inexistente"]["grande_grupamento_atividade"] == "Indefinido"
    # P5: literal period columns
    assert rows["Botucatu"]["ano_ref"] == 2025
    assert str(rows["Botucatu"]["data_competencia"]) == "2025-10-01"


def test_caged_transform_positional_dim_fallback(spark, raw_caged):
    # F2 variant with swapped headers -> J3 positional resolution
    # (code = cols[1], name = cols[-1]).
    dim = spark.createDataFrame(
        [("x", 3501608, "Botucatu")], ["junk", "CODIGO", "CIDADE"])
    out = caged_transform(raw_caged, dim, ano=2025, mes=10)
    rows = {r["municipio"]: r for r in out.collect()}
    assert rows["Botucatu"]["codigo_ibge"] == 3501608


def test_restate_partition_idempotent(spark, tmp_path):
    path = str(tmp_path / "wh")
    base = spark.createDataFrame(
        [(1, 2025, 9, 10.0), (2, 2025, 10, 20.0)],
        ["id", "ano_ref", "mes_ref", "valor"])
    restate_partition(base, path, ["ano_ref", "mes_ref"])

    # Re-deliver month 10 with corrected values — twice (idempotency).
    batch = spark.createDataFrame(
        [(2, 2025, 10, 25.0), (3, 2025, 10, 30.0)],
        ["id", "ano_ref", "mes_ref", "valor"])
    for _ in range(2):
        restate_partition(batch, path, ["ano_ref", "mes_ref"])
        got = spark.read.parquet(path)
        assert got.count() == 3  # month 9 untouched + 2 restated rows
        vals = {r["id"]: r["valor"] for r in got.collect()}
        assert vals == {1: 10.0, 2: 25.0, 3: 30.0}


def test_delete_and_insert_runs_scoped_delete(monkeypatch, spark, tmp_path):
    import sqlite3

    from etl_dados_ibge_sp_spark.sinks import jdbc_sink

    dbfile = str(tmp_path / "wh.db")
    with sqlite3.connect(dbfile) as db:
        db.execute("CREATE TABLE t (id INT, ano INT, mes INT)")
        db.executemany("INSERT INTO t VALUES (?,?,?)",
                       [(1, 2025, 9), (2, 2025, 10), (3, 2025, 10)])

    appended = {}
    monkeypatch.setattr(jdbc_sink, "write_jdbc_append",
                        lambda df, url, table, properties=None, **kw:
                        appended.setdefault("n", df.count()))
    batch = spark.createDataFrame([(9, 2025, 10)], ["id", "ano", "mes"])
    jdbc_sink.delete_and_insert(
        batch, lambda: sqlite3.connect(dbfile), "jdbc:x", "t",
        "ano = ? AND mes = ?", [2025, 10])
    # scoped DELETE removed only the restated month
    with sqlite3.connect(dbfile) as db:
        left = db.execute("SELECT id FROM t ORDER BY id").fetchall()
    assert left == [(1,)]
    assert appended["n"] == 1


def test_rename_dotted_source_column(spark):
    # The reference's `Geográfico.Município` variant (pipeline.py:65):
    # dotted raw names must rename without backtick accidents.
    from etl_dados_ibge_sp_spark.operators.project import rename_first_match

    df = spark.createDataFrame([("Botucatu", 1)],
                               ["Geográfico.Município", "x"])
    out = rename_first_match(df, ["Geográfico.Município", "Município"],
                             "municipio")
    assert out.columns == ["municipio", "x"]
    assert out.first()["municipio"] == "Botucatu"
