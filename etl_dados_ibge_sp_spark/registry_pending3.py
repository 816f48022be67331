"""Third tranche of round-budget-deferred queries (round 5; see
``registry_pending`` for the admission protocol — this module only
GROWS the list, queued after ``dedup_incremental_load``; everything
here self-admits from round 6 when the 4-round staleness bound
reopens ~49 slots).

Families:

* **Remaining classic TPC-H shapes** the registry had not exercised:
  Q6 (the pure pushed-filter single aggregate — the canonical
  predicate-pushdown probe), Q12 (join + conditional two-way counts),
  Q20 (share-of-total threshold: per-(part,supplier) aggregate vs
  half the per-part total).
* **Window distribution functions**: percent_rank / cume_dist — the
  remaining rank-family surface (`window_rank_functions` covers
  rank/dense_rank/row_number/ntile).
* **Deterministic per-group sampling**: hash-ordered top-k per group,
  the retry-safe "N examples per domain" corpus primitive.
* **Event-sequence transitions**: per-user consecutive event-type
  bigram counts (Markov transition matrix) — one lead() window plus a
  tiny map-combinable groupBy, the sequence-statistics primitive for
  behavioral/LM-ish data.

Float discipline (tranche-1 rules): sums accumulate in DECIMAL;
ratios use IEEE-exact ops only (percent_rank/cume_dist are integer
divisions, exact in both engines) rounded to 6 dp; hash orders are
md5 strings, engine-portable.  All tie-breaks go through unique keys.

Written and pytest-oracled in round 5 while the driver's 50-row
budget drained the never-verified backlog (the round-4 verdict froze
net-new registrations — see VERDICT.md "Next round" #1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.parquet_source import load_table

_DEC = "decimal(32,6)"


# --------------------------------------------------------------------------
# TPC-H Q6: the pure scan-filter aggregate
# --------------------------------------------------------------------------

_Q6_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
       round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(32,6))
                      * CAST(l_discount AS DECIMAL(32,6))) AS DOUBLE), 2)
           AS forecast_revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
"""


def _q_revenue_forecast_filter(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta if mid-band discounts on small
    orders were dropped.  The whole query is ONE scan: every predicate
    (date range, discount band, quantity) must reach the parquet
    reader as a pushed filter and the ReadSchema must carry exactly
    the four referenced columns — at 100 TB this query is min/max
    row-group skipping plus a map-side partial sum, no shuffle of any
    data rows (one tiny partial-agg exchange).  The plan law is pinned
    in tests/test_pending3.py."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=False)
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24))
    rev = F.sum(F.col("l_extendedprice").cast(_DEC)
                * F.col("l_discount").cast(_DEC))
    return f.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(rev.cast("double"), 2).alias("forecast_revenue_delta"))


# --------------------------------------------------------------------------
# TPC-H Q12 shape: join + conditional two-way counts
# --------------------------------------------------------------------------

_Q12_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
"""


def _q_returnflag_priority_counts(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipped lineitems classified by whether their
    order was high-priority, as ONE conditional aggregation after the
    fact-fact join (never two filtered passes over the join).  The
    date filter pushes to the lineitem scan; the aggregate is
    map-side combinable on the few returnflag groups, so the second
    shuffle carries |groups| rows."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    orders = load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem", fan_out=False).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))) \
        .select("l_orderkey", "l_returnflag")
    return (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("long")
                 .alias("high_priority_lines"),
                 F.sum(F.when(hi, 0).otherwise(1)).cast("long")
                 .alias("low_priority_lines")))


# --------------------------------------------------------------------------
# TPC-H Q20 shape: share-of-total threshold (excess concentration)
# --------------------------------------------------------------------------

_Q20_SQL = """
WITH pq AS (
    SELECT l_partkey, l_suppkey,
           SUM(CAST(l_quantity AS DECIMAL(32,6))) AS q
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2),
pt AS (SELECT l_partkey, SUM(q) AS tot FROM pq GROUP BY 1)
SELECT s.s_suppkey, s.s_name,
       CAST(count(*) AS BIGINT) AS n_dominated_parts
FROM pq
JOIN pt ON pt.l_partkey = pq.l_partkey
JOIN supplier s ON s.s_suppkey = pq.l_suppkey
WHERE pq.q > CAST(0.5 AS DECIMAL(32,6)) * pt.tot
GROUP BY 1, 2
"""


def _q_dominant_part_suppliers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q20 flavor: suppliers who shipped MORE THAN HALF of a
    part's total 1996 volume, with how many parts they dominate —
    the share-of-total threshold shape (supply-concentration risk).
    The per-part total is a WINDOW SUM over the per-(part,supplier)
    aggregate, not a self-join: writing it as pq JOIN (pq GROUP BY
    partkey) makes Catalyst expand the unmaterialized pq twice and
    SCAN LINEITEM TWICE — the window form reads the fact table once
    (plan law pinned in tests/test_pending3.py).  DECIMAL quantities
    make the 0.5×total boundary exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=False).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    pq = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q")))
    tot = F.sum("q").over(Window.partitionBy("l_partkey"))
    sup = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_name")
    return (pq.withColumn("tot", tot)
            .filter(F.col("q") > F.lit(0.5).cast(_DEC) * F.col("tot"))
            .join(F.broadcast(sup),
                  pq["l_suppkey"] == sup["s_suppkey"])
            .groupBy("s_suppkey", "s_name")
            .agg(F.count(F.lit(1)).alias("n_dominated_parts")))


# --------------------------------------------------------------------------
# Window distribution functions: percent_rank / cume_dist
# --------------------------------------------------------------------------

_WDIST_SQL = """
SELECT event_id, event_type,
       round(percent_rank() OVER w, 6) AS pr,
       round(cume_dist() OVER w, 6) AS cd
FROM events
WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
"""


def _q_window_distribution_functions(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist per event_type — the distribution
    half of the rank-function family (`window_rank_functions` covers
    rank/dense_rank/row_number/ntile).  Both are integer divisions
    ((rank−1)/(n−1), peers/n): IEEE-exact, so the 6-dp round matches
    DuckDB bit-for-bit.  The (value, event_id) order key is unique,
    making every rank deterministic; NULL values are excluded because
    the engines disagree on NULL sort position (Spark first, DuckDB
    last — the tranche-1 lesson).  One shuffle on event_type."""
    ev = load_table(spark, sf_dir, "events", fan_out=False) \
        .filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id", "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"))


# --------------------------------------------------------------------------
# Deterministic per-group hash sample
# --------------------------------------------------------------------------

_GSAMPLE_SQL = """
WITH r AS (
    SELECT source, doc_id,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) AS rn
    FROM documents)
SELECT source, doc_id, CAST(rn AS BIGINT) AS sample_rank
FROM r WHERE rn <= 5
"""


def _q_group_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sampling: 5 documents per source,
    chosen by md5(doc_id) order — the "N examples per domain"
    primitive every corpus audit/eval-set build needs.  Hash order is
    (a) uniform (any k-prefix is an unbiased sample), (b) retry-safe
    and engine-portable (md5 of the decimal string, no RNG state),
    and (c) stable under corpus growth for the docs that remain.  One
    shuffle on source; rank truncation prunes everything else.  At
    100 TB: this is a windowed top-k, so each task keeps only its
    local top-5 per group before the exchange."""
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    w = Window.partitionBy("source") \
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (docs.select("source", "doc_id",
                        F.row_number().over(w).alias("sample_rank"))
            .filter(F.col("sample_rank") <= 5)
            .withColumn("sample_rank", F.col("sample_rank").cast("long")))


# --------------------------------------------------------------------------
# Event-sequence transition counts (Markov bigrams)
# --------------------------------------------------------------------------

_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events)
SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n_transitions
FROM seq
WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""


def _q_event_transition_counts(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type bigram counts — the Markov
    transition matrix behavioral modeling and sequence-data prep both
    start from.  ONE shuffle on user_id for the lead() window (ordered
    by the unique (ts, event_id) key), then a map-combinable groupBy
    whose output is at most |types|² rows — the second exchange is
    negligible at any scale.  NULL next_type (each user's last event)
    is dropped identically on both engines."""
    ev = load_table(spark, sf_dir, "events", fan_out=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("event_type",
                      F.lead("event_type").over(w).alias("next_type"))
            .filter(F.col("next_type").isNotNull())
            .groupBy("event_type", "next_type")
            .agg(F.count(F.lit(1)).alias("n_transitions")))


# (name, oracle_sql, fn) in admission order — queued after
# dedup_incremental_load (see registry_pending).
PENDING3: list[tuple[str, str,
                     Callable[[SparkSession, str], DataFrame]]] = [
    ("revenue_forecast_filter", _Q6_SQL, _q_revenue_forecast_filter),
    ("returnflag_priority_counts", _Q12_SQL,
     _q_returnflag_priority_counts),
    ("dominant_part_suppliers", _Q20_SQL, _q_dominant_part_suppliers),
    ("window_distribution_functions", _WDIST_SQL,
     _q_window_distribution_functions),
    ("group_sample_hash", _GSAMPLE_SQL, _q_group_sample_hash),
    ("event_transition_counts", _TRANSITIONS_SQL,
     _q_event_transition_counts),
]
