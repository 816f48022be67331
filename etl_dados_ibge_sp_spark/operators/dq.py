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
    """Child rows whose key has no parent — a renamed view of the J2
    anti-join (operators/joins.anti_join_dedup owns the distinct-keys-
    before-exchange shape; one implementation, no drift)."""
    from .joins import anti_join_dedup
    return anti_join_dedup(
        child, parent.select(F.col(parent_key).alias(child_key)),
        [child_key])


def duplicate_keys(df: DataFrame, *keys: str) -> DataFrame:
    """Key tuples appearing more than once (one row per offending
    tuple, counted after map-side combine — never the raw rows)."""
    return (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1))


def profile_columns(df: DataFrame, table_name: str,
                    cols: list[str] | None = None) -> DataFrame:
    """Per-column profiling report: (table_name, column_name, n_rows,
    n_nulls, n_distinct) — the first thing anyone asks of an unknown
    table.

    One aggregate pass over the table computes every column's stats
    (count/count(col)/count(distinct col) fused into a single agg —
    Catalyst expands multi-distinct into one Expand + two partial
    aggregates, still map-side combinable), then one narrow unpivot to
    the long report shape.  At 100 TB swap the exact distincts for
    ``approx_count_distinct`` (the HLL path, see sketch_cardinality) —
    the report schema stays identical, which is why the operator keeps
    the long shape rather than a wide one."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [F.count(F.col(c)).alias(f"__nn_{c}"),
                 F.countDistinct(F.col(c)).alias(f"__nd_{c}")]
    wide = df.agg(*aggs)
    rows = [
        F.struct(F.lit(c).alias("column_name"),
                 F.col("__n").alias("n_rows"),
                 (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                 F.col(f"__nd_{c}").alias("n_distinct"))
        for c in cols
    ]
    return (wide.select(F.explode(F.array(*rows)).alias("p"))
            .select(F.lit(table_name).alias("table_name"),
                    F.col("p.column_name"),
                    F.col("p.n_rows").cast("bigint").alias("n_rows"),
                    F.col("p.n_nulls").cast("bigint").alias("n_nulls"),
                    F.col("p.n_distinct").cast("bigint")
                    .alias("n_distinct")))


def profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle for :func:`profile_columns` (adjacent, no
    drift): one UNION ALL leg per column."""
    legs = [
        f"SELECT '{table}' AS table_name, '{c}' AS column_name, "
        f"CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_nulls, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct "
        f"FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL\n".join(legs)
