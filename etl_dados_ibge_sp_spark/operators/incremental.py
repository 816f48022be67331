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


#: The canonical state schema; key columns are everything else, so a
#: caller's key must not collide with these names (asserted below).
STATE_COLS = ("cnt", "sum_v", "min_v", "max_v")


def _state_keys(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c not in STATE_COLS]


def partial_aggregate(df: DataFrame, keys: Sequence[str],
                      value_col: str) -> DataFrame:
    """Canonical per-key partial state over an integer value column:
    (keys..., cnt, sum_v, min_v, max_v).  DECIMAL(38,0) sum so merges
    never overflow or reorder-drift.  ``cnt`` is count(*) — NULL
    values occupy a row but contribute nothing to sum/min/max, the
    standard SQL aggregate semantics (and what the oracle's
    count(*) computes)."""
    bad = set(keys) & set(STATE_COLS)
    if bad:
        raise ValueError(f"key columns collide with state schema: {bad}")
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v.cast("decimal(38,0)")).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"))


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge partial states built by :func:`partial_aggregate` with
    the same keys: counts and sums add, min/max fold — one union +
    one map-side-combinable groupBy, never a fact-table scan."""
    from functools import reduce
    u = reduce(lambda a, b: a.unionAll(b), states)
    return u.groupBy(*_state_keys(u)).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"))


def finalize(state: DataFrame) -> DataFrame:
    """Render a state as user-facing aggregates; avg derives from
    (sum, cnt) at the end — the decomposition that makes averages
    mergeable."""
    keys = _state_keys(state)
    return state.select(
        *keys,
        F.col("cnt").cast("bigint").alias("n_rows"),
        F.col("sum_v").cast("bigint").alias("total"),
        F.col("min_v").cast("bigint").alias("v_min"),
        F.col("max_v").cast("bigint").alias("v_max"),
        F.round(F.col("sum_v").cast("double")
                / F.col("cnt").cast("double"), 6).alias("v_avg"))
