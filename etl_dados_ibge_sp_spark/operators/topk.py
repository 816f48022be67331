"""Sorts / limits / top-k (SURVEY §2.8 K5 generalized).

The reference's only top-k is file retention (keep 5 newest CSVs,
pipeline_manual.py:16-28).  As *row* operators:

* global top-k: ``orderBy(...).limit(k)`` — Spark plans TakeOrdered
  (per-partition heap + driver merge), no full sort, no full shuffle.
* per-group top-k: ``row_number`` over a window.  One shuffle on the
  partition key; at 100 TB pre-aggregate or filter before the window
  when possible, and never window over an empty partitionBy (that is a
  single-task global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order: Sequence[Column], k: int,
                    rank_col: str = "rn") -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
