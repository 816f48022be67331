"""Data-quality assertion checks (dbt-test style) as a first-class
operator: each check names a DataFrame of VIOLATIONS (orphaned foreign
keys, duplicate keys, nulls, out-of-range values) and the report is one
row per check with its violation count.

Scale shape: every check is an independent aggregate — anti-joins for
referential integrity (broadcast/AQE like any other join), groupBy-
HAVING for uniqueness, plain filters for nulls/ranges — each collapsing
to a single count before the union, so the report itself moves a
handful of rows no matter how many TBs the checks scanned.  Checks
share nothing, so Spark schedules them as parallel jobs of one action.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_counts(checks: dict[str, DataFrame]) -> DataFrame:
    """One (check_name, n_violations) row per named violations frame.

    A passing check contributes a 0 row (present, not absent — the
    report proves the check RAN, which is the point of a DQ gate)."""
    outs = [
        df.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .select(F.lit(name).alias("check_name"), "n_violations")
        for name, df in sorted(checks.items())
    ]
    return reduce(lambda a, b: a.unionAll(b), outs)


def fk_violations(child: DataFrame, child_key: str,
                  parent: DataFrame, parent_key: str) -> DataFrame:
    """Child rows whose key has no parent (left-anti join)."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key, "left_anti")


def duplicate_keys(df: DataFrame, *keys: str) -> DataFrame:
    """Key tuples appearing more than once (one row per offending
    tuple, counted after map-side combine — never the raw rows)."""
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1))
