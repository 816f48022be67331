"""Projection / column operators (SURVEY §2.2 P1-P7, §2.6 D1-D3).

All of these are pure narrow transformations — Catalyst folds them into
the scan (column pruning reaches the parquet reader), so they are free
at any scale.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_if_present(df: DataFrame, *cols: str) -> DataFrame:
    """P1 — drop bogus columns (e.g. ``undefined``); Spark's drop is
    already a no-op on missing names (reference pipeline.py:64)."""
    return df.drop(*cols)


def rename_first_match(df: DataFrame, candidates: Iterable[str],
                       target: str) -> DataFrame:
    """P2 — first-match conditional rename: the reference maps
    ``Geográfico.Município`` -> municipio, elif ``Município`` ->
    municipio (pipeline.py:65-66).  Dotted source names are fine:
    withColumnRenamed treats names literally, no backticks needed."""
    for cand in candidates:
        if cand in df.columns:
            return df.withColumnRenamed(cand, target)
    return df


def rename_map(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P3 — bulk rename intersected with existing columns
    (reference pipeline.py:69-85)."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def allowlist_select(df: DataFrame, allow: Iterable[str]) -> DataFrame:
    """P4 — select the intersection of an allowlist with df.columns,
    preserving allowlist order (reference pipeline.py:179-186)."""
    have = set(df.columns)
    keep = [c for c in allow if c in have]
    return df.select(*keep)


def melt(df: DataFrame, ids: Iterable[str], values: Iterable[str],
         var_name: str = "measure", value_name: str = "value") -> DataFrame:
    """Wide -> long unpivot.  Spark's native ``unpivot`` expands to a
    single-pass generator (one output row per (row, measure)) — no
    shuffle, no N-way self-union scan; the parquet scan still reads
    only ids + values."""
    return df.unpivot(list(ids), list(values), var_name, value_name)


def with_literal_time_columns(df: DataFrame, ano: int, mes: int) -> DataFrame:
    """P5/D2 — append typed reference-period literals: ``ano_ref``
    (bigint), ``mes_ref`` (bigint), ``data_competencia`` (first of
    month, date) — reference pipeline.py:114-122.

    The period is a parameter, not ``datetime.now()``, so results are
    deterministic (SURVEY §7 risk register)."""
    return (
        df.withColumn("ano_ref", F.lit(ano).cast("bigint"))
        .withColumn("mes_ref", F.lit(mes).cast("bigint"))
        .withColumn("data_competencia", F.lit(dt.date(ano, mes, 1)))
    )
