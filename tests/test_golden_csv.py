"""SURVEY §5 test-plan item 2 — the reference's one committed artifact,
``consolidado_municipios_final.csv``, read back through the caged chain.

The artifact (reference dags/meu_pipeline.py:36-44 writes it; reference
pipeline.py:64-186 consumes the same shape) pins the domain semantics
nothing synthetic can: the ``undefined`` metric column (P1), the
``Município`` rename (P2), float-formatted integer measures like
``-24.0`` Desligados (T1), genuinely fractional Desligados that must
null out and repair to 0 (T1/T3, the reference's strict=False Int64
cast), empty-string categories -> 'Indefinido' (T2), and the
rollup-level row structure (A4).

All expected constants below were computed directly from the committed
artifact (1129 rows; e.g. the 318 non-null Desligados contain 8
fractional values, the rest are float-formatted integers summing 1925).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators.aggregate import rollup_agg
from etl_dados_ibge_sp_spark.plans.caged_pipeline import (
    LOAD_ALLOWLIST, caged_transform,
)
from etl_dados_ibge_sp_spark.sources.csv_source import read_csv_sniffed

GOLDEN = "/root/reference/consolidado_municipios_final.csv"

HIER = [
    "Município", "Grande Grupamento Atividade Econômica",
    "Atividade Econômica", "CNAE 2.0 Seção", "CNAE 2.0 Divisão",
    "CNAE 2.0 Grupo", "CNAE 2.0 Classe", "CNAE 2.0 Subclasse",
]
HIER_SNAKE = [
    "municipio", "grande_grupamento_atividade", "atividade_economica",
    "cnae_secao", "cnae_divisao", "cnae_grupo", "cnae_classe",
    "cnae_subclasse",
]

# Botucatu's public IBGE municipality code.
BOTUCATU_COD = 3507506

# Row counts per rollup level (number of non-null hierarchy columns),
# read off the committed artifact.
LEVEL_HISTOGRAM = {0: 1, 1: 1, 2: 5, 3: 9, 4: 19,
                   5: 456, 6: 399, 7: 139, 8: 100}


@pytest.fixture(scope="module")
def golden(spark):
    df = read_csv_sniffed(spark, GOLDEN).cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def transformed(spark, golden):
    dim = spark.createDataFrame([("Botucatu", BOTUCATU_COD)],
                                ["NOME", "COD"])
    df = caged_transform(golden, dim, ano=2025, mes=10).cache()
    yield df
    df.unpersist()


def test_golden_sniffs_semicolon_and_shape(golden):
    assert len(golden.columns) == 17
    assert golden.columns[0] == "undefined"
    assert "Município" in golden.columns
    assert golden.count() == 1129
    meses = [r[0] for r in golden.select("Mes_Ref").distinct().collect()]
    assert meses == ["Outubro"]


def test_golden_caged_transform_columns_and_rows(transformed):
    # The artifact exercises every allowlist column, so the output is
    # the full allowlist in order; `undefined` is dropped (P1).
    assert transformed.columns == LOAD_ALLOWLIST
    assert transformed.count() == 1129


def test_golden_measure_repair(transformed):
    dtypes = dict(transformed.dtypes)
    assert dtypes["admitidos"] == "bigint"
    assert dtypes["desligados"] == "bigint"
    assert dtypes["saldo"] == "bigint"
    assert dtypes["variacao_relativa"] == "double"
    row = transformed.agg(
        F.sum("admitidos").alias("adm"),
        F.sum("desligados").alias("des"),
        F.sum("saldo").alias("sal"),
        F.count(F.when(F.col("desligados").isNull(), 1)).alias("des_null"),
    ).collect()[0]
    # Float-formatted integers ('-24.0') repair; the 8 genuinely
    # fractional Desligados null out and fill to 0 — the reference's
    # strict=False Int64 cast + fill_null(0) (pipeline.py:131-137).
    assert row["adm"] == 3966
    assert row["des"] == 1925
    assert row["sal"] == 4522
    assert row["des_null"] == 0


def test_golden_category_fill(transformed):
    counts = transformed.agg(*[
        F.count(F.when(F.col(c) == "Indefinido", 1)).alias(c)
        for c in ("grande_grupamento_atividade", "atividade_economica",
                  "cnae_secao")
    ]).collect()[0]
    assert counts["grande_grupamento_atividade"] == 2
    assert counts["atividade_economica"] == 7
    assert counts["cnae_secao"] == 16


def test_golden_enrichment_and_time_columns(transformed):
    row = transformed.agg(
        F.count(F.when(F.col("codigo_ibge") == BOTUCATU_COD, 1)).alias("hit"),
        F.count(F.when(F.col("codigo_ibge") == 0, 1)).alias("miss"),
        F.count_distinct("ano_ref", "mes_ref",
                         "data_competencia").alias("periods"),
        F.min("data_competencia").alias("dc"),
    ).collect()[0]
    # Every row is Botucatu except the grand-total row (null município),
    # which misses the lookup and fills to 0 (pipeline.py:108-112).
    assert row["hit"] == 1128
    assert row["miss"] == 1
    assert row["periods"] == 1
    assert row["dc"] == dt.date(2025, 10, 1)


def test_golden_is_rollup_prefix_structured(transformed):
    """A4 shape: in every row the non-null hierarchy columns form a
    prefix — once a level is null, all deeper levels are null."""
    # 'Indefinido' is the filled form of null for the first three
    # category columns; treat it as null for the shape check.
    def level_col(c):
        return F.when(F.col(c).isNull() | (F.col(c) == "Indefinido"), 0) \
                .otherwise(1)

    viol = F.lit(0)
    for shallow, deep in zip(HIER_SNAKE, HIER_SNAKE[1:]):
        viol = viol + F.when(
            (level_col(shallow) == 0) & (level_col(deep) == 1), 1
        ).otherwise(0)
    bad = transformed.filter(viol > 0).count()
    assert bad == 0

    lvl = sum((level_col(c) for c in HIER_SNAKE), F.lit(0))
    hist = {r["lvl"]: r["n"] for r in
            transformed.groupBy(lvl.alias("lvl"))
                       .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert hist == LEVEL_HISTOGRAM


def test_golden_leaf_rollup_reproduces_artifact_groups(transformed):
    """Rolling up the artifact's leaf rows with rollup_agg regenerates
    exactly the hierarchy groups the reference exported: 100 distinct
    leaves plus their 135 distinct prefixes, every one present as a row
    of the artifact itself."""
    leaves = transformed.filter(
        F.lit(True) & F.col("cnae_subclasse").isNotNull()
        & (F.col("cnae_secao") != "Indefinido")
        & (F.col("atividade_economica") != "Indefinido")
        & (F.col("grande_grupamento_atividade") != "Indefinido")
        & F.col("municipio").isNotNull()
    )
    rolled = rollup_agg(leaves, HIER_SNAKE,
                        [F.count(F.lit(1)).alias("n")])
    assert rolled.count() == 235  # 100 leaf groups + 135 prefixes

    def key_rows(df):
        # Normalize filled 'Indefinido' back to None so artifact rows
        # compare equal to rollup's subtotal NULLs.
        cols = [F.when(F.col(c) == "Indefinido", None)
                 .otherwise(F.col(c)).alias(c) for c in HIER_SNAKE]
        return {tuple(r) for r in df.select(*cols).distinct().collect()}

    artifact_keys = key_rows(transformed)
    rolled_keys = key_rows(rolled)
    assert rolled_keys <= artifact_keys
