"""Slowly-changing-dimension (SCD Type 2) interval building.

The reference's warehouse loads are full restatements (pipeline.py's
delete-and-insert); the natural extension for an incremental warehouse
is attribute history: collapse an ordered change feed into validity
intervals ``[valid_from, valid_to)`` with an ``is_current`` flag —
the SCD2 dimension shape.

Scale design: one shuffle on the business key, then everything is
narrow window arithmetic over the key's ordered run (lag → run-length
encode → per-run aggregate → lead for the closing edge).  State per
key is a handful of rows; no self-joins, no iteration.  At 100 TB the
feed arrives partitioned by key (bucketed landing zone) and the
shuffle disappears.

Determinism: ordering is (ts, tiebreak) with an explicit unique
tiebreak column — required, since equal timestamps otherwise make
run boundaries nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(feed: DataFrame, key_col: str, attr_col: str,
                   ts_col: str, tiebreak_col: str) -> DataFrame:
    """Collapse consecutive equal ``attr_col`` runs per key into SCD2
    validity intervals.

    Output: ``(key, attr, valid_from, valid_to, is_current,
    n_changes)`` where ``valid_to`` is null on the open (current) row
    and ``n_changes`` counts feed rows inside the run.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(attr_col)).over(w)
    is_new_run = F.when(
        prev.isNull() | (prev != F.col(attr_col)), F.lit(1)
    ).otherwise(F.lit(0))
    runs = feed.select(
        key_col, attr_col, ts_col,
        F.sum(is_new_run).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__run"),
    )
    per_run = runs.groupBy(key_col, "__run").agg(
        F.min(attr_col).alias(attr_col),  # constant within a run
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    w_run = Window.partitionBy(key_col).orderBy("__run")
    return per_run.select(
        key_col, attr_col, "valid_from",
        F.lead("valid_from").over(w_run).alias("valid_to"),
        F.lead("valid_from").over(w_run).isNull().alias("is_current"),
        "n_changes",
    )


def cdc_latest_state(feed: DataFrame, key_col: str, ts_col: str,
                     tiebreak_col: str, delete_predicate) -> DataFrame:
    """Apply a change feed to produce current state: last write wins
    per key; keys whose final operation satisfies ``delete_predicate``
    are absent from the result (the CDC-merge semantics of a lakehouse
    MERGE INTO, expressed engine-agnostically).

    One shuffle (the per-key window); no join against a snapshot — at
    scale the snapshot union-s in as older feed rows, which keeps the
    operator a single window over (key, ts) instead of a
    full-outer-join storm.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc())
    latest = (feed.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))
    return latest.filter(~delete_predicate)
