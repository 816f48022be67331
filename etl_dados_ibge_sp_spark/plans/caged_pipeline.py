"""Composed pipelines mirroring the reference's DAG shapes.

Two entry points:

* :func:`caged_transform` — the domain-true transform chain
  (P1→P3 renames, T1-T3 repair, J1 enrichment, P4 allowlist) applied to
  a raw CAGED-shaped frame + IBGE lookup dim, mirroring
  reference pipeline.py:64-186.  Exercised by the fixture tests.
* :func:`incremental_enrichment` — the flagship: the production DAG's
  full shape (extract → anti-join dedup → broadcast enrichment →
  repair → allowlist, reference dags/etl_municipios.py:57-206) restated
  over the driver's TPC-H-ish tables so it runs at any scale factor.

Plan shape at scale: one lazy expression tree; the only wide
dependencies are the anti-join exchange (keys-only on the warehouse
side, broadcast under AQE when small) and nothing else — enrichment
dims broadcast, everything else is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import distinct_keys
from ..operators.joins import anti_join_dedup, enrich_left_join
from ..operators.project import (
    allowlist_select, drop_if_present, rename_first_match, rename_map,
    with_literal_time_columns,
)
from ..operators.repair import fill_nulls, pin_key_types, try_cast_columns
from ..sources.parquet_source import load_table

# Portuguese -> snake_case rename map (reference pipeline.py:69-83).
RENAME_MAP = {
    "Grande Grupamento Atividade Econômica": "grande_grupamento_atividade",
    "Atividade Econômica": "atividade_economica",
    "CNAE 2.0 Seção": "cnae_secao",
    "CNAE 2.0 Divisão": "cnae_divisao",
    "CNAE 2.0 Grupo": "cnae_grupo",
    "CNAE 2.0 Classe": "cnae_classe",
    "CNAE 2.0 Subclasse": "cnae_subclasse",
    "Admitidos": "admitidos",
    "Desligados": "desligados",
    "Saldo": "saldo",
    "Estoque": "estoque",
    "Variação Relativa": "variacao_relativa",
    "Tempo de Emprego": "tempo_emprego",
}

# Sink allowlist projection (reference pipeline.py:179-186).
LOAD_ALLOWLIST = [
    "municipio", "codigo_ibge", "grande_grupamento_atividade",
    "atividade_economica", "cnae_secao", "cnae_divisao", "cnae_grupo",
    "cnae_classe", "cnae_subclasse", "admitidos", "desligados", "saldo",
    "estoque", "variacao_relativa", "tempo_emprego", "ano_ref", "mes_ref",
    "data_competencia",
]

_INT_MEASURES = ("admitidos", "desligados", "saldo", "estoque")
_FLOAT_MEASURES = ("variacao_relativa", "tempo_emprego")
_CATEGORY_FILLS = ("grande_grupamento_atividade", "atividade_economica",
                   "cnae_secao")


def caged_transform(raw: DataFrame, ibge_dim: DataFrame,
                    ano: int, mes: int) -> DataFrame:
    """Domain-true transform chain on a CAGED-shaped raw frame.

    raw: columns as extracted (FIXTURES.md F1); ibge_dim: the lookup
    CSV frame (F2, columns NOME/COD or positional fallback).
    """
    from ..operators.joins import resolve_dim_columns

    df = drop_if_present(raw, "undefined")                       # P1
    df = rename_first_match(df, ["Geográfico.Município", "Município"],
                            "municipio")                         # P2
    df = rename_map(df, RENAME_MAP)                              # P3
    df = with_literal_time_columns(df, ano, mes)                 # P5/D2

    name_col, code_col = resolve_dim_columns(ibge_dim.columns,
                                             "NOME", "COD")      # J3
    df = enrich_left_join(df, ibge_dim, "municipio", name_col,
                          code_col, "codigo_ibge", normalize=True)  # J1

    present_int = [c for c in _INT_MEASURES if c in df.columns]
    present_float = [c for c in _FLOAT_MEASURES if c in df.columns]
    df = try_cast_columns(df, {
        **{c: "bigint" for c in present_int + ["codigo_ibge"]},
        **{c: "double" for c in present_float},
    })                                                           # T1
    df = fill_nulls(df, {
        **{c: "Indefinido" for c in _CATEGORY_FILLS if c in df.columns},
        **{c: 0 for c in present_int + ["codigo_ibge"]},
        **{c: 0.0 for c in present_float},
    })                                                           # T2/T3
    return allowlist_select(df, LOAD_ALLOWLIST)                  # P4


def incremental_enrichment(spark: SparkSession, sf_dir: str,
                           extract_from: str = "1997-01-01",
                           loaded_until: str = "1997-07-01") -> DataFrame:
    """Flagship query: the production DAG restated on the star schema.

    * "new extract"  = orders from ``extract_from`` on, with derived
      reference period (ano_ref/mes_ref).
    * "warehouse"    = customer-months already loaded (orders before
      ``loaded_until``), reduced to distinct keys (A1/S6 shape).
    * anti-join dedup (J2) on (o_custkey, ano_ref, mes_ref) with pinned
      key types (T4).
    * enrichment (J1): customer dim for the name, broadcast nation dim
      for the "municipality code" analogue, miss -> 0 / 'indefinido'.
    * repair (T1-T3) + allowlist projection (P4).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    incoming = (
        orders
        .filter(F.col("o_orderdate") >= F.lit(extract_from).cast("date"))
        .withColumn("ano_ref", F.year("o_orderdate").cast("bigint"))
        .withColumn("mes_ref", F.month("o_orderdate").cast("bigint"))
    )
    warehouse = (
        orders
        .filter(F.col("o_orderdate") < F.lit(loaded_until).cast("date"))
        .withColumn("ano_ref", F.year("o_orderdate").cast("bigint"))
        .withColumn("mes_ref", F.month("o_orderdate").cast("bigint"))
    )
    warehouse_keys = distinct_keys(warehouse,
                                   ["o_custkey", "ano_ref", "mes_ref"])
    warehouse_keys = pin_key_types(warehouse_keys, {
        "o_custkey": "bigint", "ano_ref": "bigint", "mes_ref": "bigint",
    })  # T4 — holds even when the snapshot is empty

    delta = anti_join_dedup(incoming, warehouse_keys,
                            ["o_custkey", "ano_ref", "mes_ref"])  # J2

    # Enrichment: customer name (the "municipio" analogue) ...
    cust_dim = customer.select(
        "c_custkey",
        F.lower(F.trim(F.col("c_name"))).alias("municipio"),
        "c_nationkey",
    )
    enriched = delta.join(F.broadcast(cust_dim),
                          delta.o_custkey == cust_dim.c_custkey, "left")
    # ... then the small code dim (J1, broadcast, miss -> defaults).
    nat_dim = nation.select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_nationkey").cast("bigint").alias("codigo_ibge"),
        F.lower(F.trim(F.col("n_name"))).alias("regiao"),
    )
    enriched = (
        enriched.join(F.broadcast(nat_dim), "c_nationkey", "left")
        .withColumn("valor", F.col("o_totalprice").try_cast("double"))  # T1
        .fillna({"codigo_ibge": 0, "regiao": "indefinido",
                 "municipio": "indefinido", "valor": 0.0})              # T2/T3
    )
    return allowlist_select(enriched, [
        "o_orderkey", "municipio", "codigo_ibge", "regiao",
        "ano_ref", "mes_ref", "valor",
    ])                                                                  # P4
