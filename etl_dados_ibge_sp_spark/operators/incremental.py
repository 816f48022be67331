"""Incremental aggregate maintenance: merge partial aggregation
states instead of recomputing from history.

The 100-TB pattern: a nightly pipeline holds a per-key aggregate table
over years of facts.  Recomputing it scans everything; maintaining it
merges yesterday's STATE with today's delta's state — the same
algebraic-decomposition trick Spark itself uses for map-side partial
aggregation, lifted to the table level.  Supported out of the box:
count / sum / min / max, and anything derivable from them at
finalization (avg = sum/count).  Holistic aggregates (median, exact
distinct) do NOT decompose — those take the sketch path
(``approx_percentiles``, HLL in ``sketch_cardinality``), which is the
point of keeping the state schema explicit here.

Law (tests + the query oracle): merge(partial(A), partial(B)) finalizes
identically to a full aggregate over A ∪ B, for every split point.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_aggregate(df: DataFrame, keys: Sequence[str],
                      value_col: str) -> DataFrame:
    """Canonical per-key partial state over an integer value column:
    (keys..., cnt, sum_v, min_v, max_v).  DECIMAL(38,0) sum so merges
    never overflow or reorder-drift."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(v).alias("cnt"),
        F.sum(v.cast("decimal(38,0)")).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"))


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge partial states built by :func:`partial_aggregate` with
    the same keys: counts and sums add, min/max fold — one union +
    one map-side-combinable groupBy, never a fact-table scan."""
    from functools import reduce
    u = reduce(lambda a, b: a.unionAll(b), states)
    keys = [c for c in u.columns
            if c not in ("cnt", "sum_v", "min_v", "max_v")]
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"))


def finalize(state: DataFrame) -> DataFrame:
    """Render a state as user-facing aggregates; avg derives from
    (sum, cnt) at the end — the decomposition that makes averages
    mergeable."""
    keys = [c for c in state.columns
            if c not in ("cnt", "sum_v", "min_v", "max_v")]
    return state.select(
        *keys,
        F.col("cnt").cast("bigint").alias("n_rows"),
        F.col("sum_v").cast("bigint").alias("total"),
        F.col("min_v").cast("bigint").alias("v_min"),
        F.col("max_v").cast("bigint").alias("v_max"),
        F.round(F.col("sum_v").cast("double")
                / F.col("cnt").cast("double"), 6).alias("v_avg"))
