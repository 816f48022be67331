"""Single-pass write metrics via ``df.observe`` (Spark's Observation
API): row counts, null counts, and value bounds collected DURING the
write, not by a second scan.

The reference's pipeline logs row counts around every load step
(reference diagnostico.py's count prints); the naive Spark translation
is ``df.count()`` before ``df.write`` — TWO full computations of the
frame.  ``Observation`` attaches aggregate expressions to the plan
itself: the metrics ride along with the write job's tasks and cost one
extra map-side accumulator, which is the only acceptable shape at
100 TB (a pre-count of a 100-TB frame is hours of duplicated work).

Metrics are exact and deterministic (counts/min/max are
order-independent), and available immediately after the action
returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def write_parquet_observed(df: DataFrame, path: str,
                           null_cols: list[str] | None = None,
                           bound_col: str | None = None,
                           mode: str = "overwrite") -> dict:
    """Write ``df`` to parquet and return metrics gathered in the SAME
    job: ``n_rows``, ``nulls_<c>`` for each of ``null_cols``, and
    ``min_/max_<bound_col>`` when given.  One pass, no pre-count."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols or []:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1))
                    .alias(f"nulls_{c}"))
    if bound_col:
        aggs.append(F.min(bound_col).alias(f"min_{bound_col}"))
        aggs.append(F.max(bound_col).alias(f"max_{bound_col}"))
    obs = Observation()
    df.observe(obs, *aggs).write.mode(mode).parquet(path)
    return dict(obs.get)
