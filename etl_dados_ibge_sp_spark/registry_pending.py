"""Round-budget-aware DEFERRED query registration.

The verification driver records at most ``DRIVER_ROW_BUDGET`` (50)
CORRECTNESS rows per round, spending them unverified-first (see
``registry._ordered_names``).  Registering more net-new queries than
the rotation has slack for would push already-stale rows out of
re-verification for another round — so finished-but-not-yet-registered
queries wait here and self-admit, in list order, as slack appears in
later rounds.  ``admit`` is idempotent: once a pending query is
registered it counts as unverified itself, consuming exactly the slack
it was admitted under.

Each entry still carries its full DuckDB oracle; the implementations
are tested by pytest (tests/test_pending_r05.py) from the day they are
written, independent of when the driver first sees them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.parquet_source import load_table

DRIVER_ROW_BUDGET = 50


def _fresh_work_dir(name: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf) scratch dir, cleared on entry —
    the repo convention for queries that must materialize files:
    bench warm+timed runs, parity tests, and driver rounds all reuse
    ONE bounded tree instead of leaking a ``mkdtemp`` per invocation.
    Hoisted to :mod:`..workdirs` in round 8 (uid-scoped parent,
    foreign-entry handling); this name stays as the registry-local
    spelling.  Callers whose RESULT lazily reads from the tree rely
    on the clear happening at the START of the next call, never at
    exit."""
    from .workdirs import fresh_work_dir

    return fresh_work_dir(name, sf_dir)


# --------------------------------------------------------------------------
# Multimodal, second modality: real RIFF/WAV PCM audio
# --------------------------------------------------------------------------

def _q_multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end to end: a deterministic 64-sample 16-bit
    mono PCM WAV is encoded per document (real RIFF bytes: header, fmt
    chunk, data chunk) and decoded back with the numpy-only chunk-walk
    parser (operators/multimodal.decode_wav); the exact integer stats
    (amplitude sum, energy, peak) match the closed-form oracle.  The
    audio twin of multimodal_ppm_roundtrip — both stages Arrow-batched
    mapInPandas, narrow, no shuffle."""
    from .operators.multimodal import decode_wav, encode_wav
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_wav(encode_wav(docs))


_WAV_SQL = """
WITH t AS (
    SELECT d.doc_id,
           ((d.doc_id * 37 + s.t * 13) % 65536) - 32768 AS amp
    FROM documents d, generate_series(0, 63) s(t)
)
SELECT doc_id, CAST(64 AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(SUM(amp) AS BIGINT) AS sum_amp,
       CAST(SUM(amp * amp) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(amp)) AS BIGINT) AS peak
FROM t GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# Correlated-subquery query shapes (TPC-H Q17 / Q21 style)
# --------------------------------------------------------------------------
#
# Both run the SAME SQL text on Spark and DuckDB: the point is to
# exercise Catalyst's scalar-subquery decorrelation (the plan must
# show an aggregate + join, never a per-row subquery — pinned in
# tests/test_pending_r05.py).  Averages accumulate in DECIMAL on both
# engines so the filter boundary is bit-identical.

_Q17_SQL = """
SELECT p.p_brand,
       round(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(32,6)))
                  AS DOUBLE) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM {lineitem} l JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND l.l_quantity < CAST(0.2 AS DOUBLE) * (
      SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(32,6))) AS DOUBLE)
             / count(*)
      FROM {lineitem} l2 WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
"""


def _q_correlated_small_qty_revenue(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: revenue from lineitems whose quantity is
    below 20% of their part's average quantity — a correlated scalar
    subquery that Catalyst decorrelates into a per-part aggregate +
    join (the plan a 100-TB engine must produce; a per-row subquery
    would be a quadratic disaster)."""
    load_table(spark, sf_dir, "lineitem", fan_out=False) \
        .createOrReplaceTempView("__q17_lineitem")
    load_table(spark, sf_dir, "part", fan_out=False) \
        .createOrReplaceTempView("__q17_part")
    return spark.sql(_Q17_SQL.format(lineitem="__q17_lineitem",
                                     part="__q17_part"))


_QEXISTS_SQL = """
SELECT o.o_orderkey, o.o_custkey,
       round(o.o_totalprice, 2) AS o_totalprice
FROM {orders} o
WHERE o.o_totalprice > CAST(1.6 AS DOUBLE) * (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(32,6))) AS DOUBLE)
             / count(*)
      FROM {orders} o2 WHERE o2.o_custkey = o.o_custkey)
  AND EXISTS (SELECT 1 FROM {lineitem} l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
"""


def _q_correlated_exists_orders(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Correlated scalar subquery + correlated EXISTS in one query
    (TPC-H Q21 flavor): orders 1.6x above their own customer's average
    that contain at least one bulk lineitem.  Decorrelates to a
    per-customer aggregate join plus a left-semi join."""
    load_table(spark, sf_dir, "orders", fan_out=False) \
        .createOrReplaceTempView("__qex_orders")
    load_table(spark, sf_dir, "lineitem", fan_out=False) \
        .createOrReplaceTempView("__qex_lineitem")
    return spark.sql(_QEXISTS_SQL.format(orders="__qex_orders",
                                         lineitem="__qex_lineitem"))


def _q_multimodal_wav_resample(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """REAL audio downsample: encode → decimate-by-2 (every second
    sample, rate halved) → exact integer stats of the 32-sample
    result, matching the closed-form oracle over even sample indices —
    the audio twin of multimodal_ppm_resize."""
    from .operators.multimodal import encode_wav, resample_wav
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return resample_wav(encode_wav(docs), factor=2)


_WAV_RESAMPLE_SQL = """
WITH t AS (
    SELECT d.doc_id,
           ((d.doc_id * 37 + s.t * 2 * 13) % 65536) - 32768 AS amp
    FROM documents d, generate_series(0, 31) s(t)
)
SELECT doc_id, CAST(32 AS BIGINT) AS n_samples,
       CAST(4000 AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(SUM(amp) AS BIGINT) AS sum_amp,
       CAST(SUM(amp * amp) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(amp)) AS BIGINT) AS peak
FROM t GROUP BY doc_id
"""


_Q11_SQL = """
SELECT p.p_brand,
       round(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(32,6)))
                  AS DOUBLE), 2) AS brand_value,
       CAST(count(*) AS BIGINT) AS n_parts
FROM {part} p
GROUP BY p.p_brand
HAVING CAST(SUM(CAST(p.p_retailprice AS DECIMAL(32,6))) AS DOUBLE) >
       CAST(0.04 AS DOUBLE) * (
           SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(32,6)))
                       AS DOUBLE)
           FROM {part} p2)
"""


def _q_having_scalar_threshold(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: brands holding more than 4% of total retail
    value — a HAVING clause against an uncorrelated scalar subquery.
    The scalar computes once and broadcasts as a literal-like filter
    on the aggregate, never per group; DECIMAL accumulation keeps the
    4% boundary bit-identical across engines."""
    load_table(spark, sf_dir, "part", fan_out=False) \
        .createOrReplaceTempView("__q11_part")
    return spark.sql(_Q11_SQL.format(part="__q11_part"))


def _q_event_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days (day - row_number is constant within an island — the classic
    formulation).  One shuffle on user_id serves both windows; islands
    never materialize more than (user, day) rows."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000.0)) \
        .cast("bigint")
    d = e.select("user_id", day.alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn("grp", F.col("day") - F.row_number().over(w))
    s = (g.groupBy("user_id", "grp")
         .agg(F.count(F.lit(1)).alias("streak_days"),
              F.min("day").alias("start_day")))
    pick = Window.partitionBy("user_id") \
        .orderBy(F.desc("streak_days"), F.asc("start_day"))
    return (s.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("streak_days").cast("bigint")
                    .alias("streak_days"), "start_day"))


_STREAKS_SQL = """
WITH d AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0)
                AS BIGINT) AS day
    FROM events
), g AS (
    SELECT user_id, day,
           day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
    FROM d
), s AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS streak_days,
           MIN(day) AS start_day
    FROM g GROUP BY user_id, grp
)
SELECT user_id, streak_days, start_day
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
          ORDER BY streak_days DESC, start_day) AS rn FROM s)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Correlated-aggregate shapes, round 2 (TPC-H Q2 / Q22 style)
# --------------------------------------------------------------------------

_Q2_SQL = """
SELECT n.n_name, s.s_name, round(s.s_acctbal, 2) AS acctbal
FROM {supplier} s JOIN {nation} n ON n.n_nationkey = s.s_nationkey
WHERE s.s_acctbal = (SELECT min(s2.s_acctbal) FROM {supplier} s2
                     WHERE s2.s_nationkey = s.s_nationkey)
"""


def _q_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: each nation's minimum-balance supplier via a
    correlated aggregate EQUALITY subquery — the min-cost-supplier
    shape.  Catalyst decorrelates it to a per-nation min aggregate +
    join; equality against the min is exact (the min IS one of the
    doubles), so no rounding discipline is needed on the filter."""
    load_table(spark, sf_dir, "supplier", fan_out=False) \
        .createOrReplaceTempView("__q2_supplier")
    load_table(spark, sf_dir, "nation") \
        .createOrReplaceTempView("__q2_nation")
    return spark.sql(_Q2_SQL.format(supplier="__q2_supplier",
                                    nation="__q2_nation"))


_Q22_SQL = """
SELECT n.n_name AS cntry, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(32,6))) AS DOUBLE), 2)
           AS totacctbal
FROM {customer} c JOIN {nation} n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > (
      SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(32,6))) AS DOUBLE)
             / count(*)
      FROM {customer} c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM {orders} o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n.n_name
"""


def _q_inactive_premium_customers(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog: above-average-balance customers with NO order
    since 2000, counted per nation — an uncorrelated scalar subquery
    (computed once, broadcast as a filter) plus a correlated NOT
    EXISTS (decorrelated to a left-anti join with the date filter
    pushed into the orders scan).  DECIMAL accumulation keeps the
    average boundary bit-identical across engines."""
    load_table(spark, sf_dir, "customer", fan_out=False) \
        .createOrReplaceTempView("__q22_customer")
    load_table(spark, sf_dir, "nation") \
        .createOrReplaceTempView("__q22_nation")
    load_table(spark, sf_dir, "orders", fan_out=False) \
        .createOrReplaceTempView("__q22_orders")
    return spark.sql(_Q22_SQL.format(customer="__q22_customer",
                                     nation="__q22_nation",
                                     orders="__q22_orders"))


# --------------------------------------------------------------------------
# Triangle counting on the nation trade graph
# --------------------------------------------------------------------------

_TRADE_EDGES_CTE = """
WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem),
ord AS (SELECT o_orderkey, o_custkey FROM orders),
cst AS (SELECT c_custkey, c_nationkey FROM customer),
sup AS (SELECT s_suppkey, s_nationkey FROM supplier),
tr AS (SELECT cst.c_nationkey AS cn, sup.s_nationkey AS sn
            FROM li
            JOIN ord ON ord.o_orderkey = li.l_orderkey
            JOIN cst ON cst.c_custkey = ord.o_custkey
            JOIN sup ON sup.s_suppkey = li.l_suppkey
            WHERE cst.c_nationkey <> sup.s_nationkey),
w AS MATERIALIZED (SELECT least(cn, sn) AS a, greatest(cn, sn) AS b,
             count(*) AS wt
      FROM tr GROUP BY 1, 2)
SELECT a AS u, b AS v FROM w
WHERE wt > 1.2 * (SELECT CAST(SUM(wt) AS DOUBLE) / count(*) FROM w)
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded nation trade graph (u, v): undirected customer-
    nation <-> supplier-nation pairs whose trade volume exceeds 1.2x
    the mean edge weight — a RELATIVE threshold, so the graph stays
    sparse (and its structure discriminative) at every scale factor
    instead of saturating to the complete graph.  Shared by the
    triangle and BFS queries; mirrors _TRADE_EDGES_CTE exactly.

    Memoized per (session, sf_dir) via session.session_memo (one
    shared idiom for all session-scoped caches): the star join is the
    expensive part and its tiny derived edge list is deterministic,
    so every graph query over the same corpus shares ONE
    materialization — exactly how a production pipeline stages a
    derived graph table."""
    from .session import session_memo

    return session_memo(spark, f"trade_edges:{sf_dir}",
                        lambda: _build_trade_edges(spark, sf_dir))


def _build_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.least("c_nationkey", "s_nationkey").alias("a"),
                F.greatest("c_nationkey", "s_nationkey").alias("b")))
    # w is the star join's output (the expensive part) and feeds both
    # the mean-weight scalar and the thresholded edge list — persist so
    # the join runs once.
    from pyspark.storagelevel import StorageLevel
    w = (pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("wt"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    stats = w.agg((F.sum("wt").cast("double")
                   / F.count(F.lit(1))).alias("__mean_wt"))
    edges = (w.join(F.broadcast(stats))
             .filter(F.col("wt") > 1.2 * F.col("__mean_wt"))
             .select(F.col("a").alias("u"), F.col("b").alias("v")))
    # The thresholded graph is <= |nations|^2 rows at ANY corpus scale
    # (a node-pair aggregate over a bounded dimension), i.e. a tiny
    # derived MODEL like the k-means centroids: materialize it to the
    # driver once and hand every graph query a LocalTableScan.
    # Without this, iterative consumers (BFS layers, triangle wedge
    # joins) embed the full star-join subtree at every edge reference
    # and Catalyst planning time dwarfs execution.
    try:
        local = spark.createDataFrame(edges.collect(),
                                      schema=edges.schema)
    finally:
        w.unpersist()
    return local


def _q_nation_trade_triangles(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Triangle participation per nation on the thresholded trade
    graph (_trade_edges).  The triangle core is
    operators/graph.triangle_participation: degree-ordered
    orientation, O(E^1.5) wedge bound, 3 shuffles, no driver
    iteration.  Oracle: graph.triangles_sql's x<y<z enumeration — a
    different orientation, same triangle set."""
    from .operators.graph import triangle_participation
    nation = load_table(spark, sf_dir, "nation")
    tp = triangle_participation(_trade_edges(spark, sf_dir))
    return (tp.join(F.broadcast(nation), tp.node == nation.n_nationkey)
            .select("n_name", "n_triangles"))


def _triangles_oracle() -> str:
    from .operators.graph import triangles_sql
    return f"""
WITH pn AS ({triangles_sql(_TRADE_EDGES_CTE)})
SELECT n.n_name, pn.n_triangles
FROM pn JOIN nation n ON n.n_nationkey = pn.node
"""


# --------------------------------------------------------------------------
# Exact-integer rolling anomaly detection (trailing-window z-score)
# --------------------------------------------------------------------------

_ANOMALY_SQL = """
WITH q AS (SELECT event_id, user_id,
                  CAST(floor(value * 1000000) AS BIGINT) AS value_micros,
                  ts
           FROM events),
w AS (SELECT event_id, user_id, value_micros,
             count(*) OVER win AS n_window,
             SUM(CAST(value_micros AS HUGEINT)) OVER win AS s,
             SUM(CAST(value_micros AS HUGEINT)
                 * CAST(value_micros AS HUGEINT)) OVER win AS ss
      FROM q
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id, value_micros,
       CAST(n_window AS BIGINT) AS n_window
FROM w
WHERE n_window >= 8
  AND (CAST(n_window AS HUGEINT) * value_micros - s)
      * (CAST(n_window AS HUGEINT) * value_micros - s)
      * (n_window - 1)
      > 4 * CAST(n_window AS HUGEINT)
          * (CAST(n_window AS HUGEINT) * ss - s * s)
"""


def _q_events_rolling_anomaly(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection with EXACT integer
    arithmetic: an event is anomalous when (x - mean)^2 > 4 * var_samp
    over the user's previous <=20 events (>=8 required) — cleared of
    denominators, (n*x - s)^2 * (n-1) > 4n * (n*ss - s^2), evaluated
    in DECIMAL(38) on Spark and HUGEINT in DuckDB so the decision
    boundary is bit-identical across engines (no float z-score to
    drift).  One shuffle on user_id serves all three frame aggregates;
    the frame is ROWS-bounded so state is O(20) per user regardless of
    history length."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 1000000).cast("bigint")
    q = e.select("event_id", "user_id", x.alias("value_micros"), "ts")
    win = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(-20, -1))
    xd = F.col("value_micros").cast("decimal(38,0)")
    w = q.select(
        "event_id", "user_id", "value_micros",
        F.count(F.lit(1)).over(win).alias("n_window"),
        F.sum(xd).over(win).alias("__s"),
        F.sum(xd * xd).over(win).alias("__ss"))
    n = F.col("n_window").cast("decimal(38,0)")
    s, ss = F.col("__s"), F.col("__ss")
    dev = n * xd - s
    return (w.filter((F.col("n_window") >= 8)
                     & (dev * dev * (n - 1) > 4 * n * (n * ss - s * s)))
            .select("event_id", "user_id", "value_micros",
                    F.col("n_window").cast("bigint").alias("n_window")))


# --------------------------------------------------------------------------
# RANGE-frame sliding aggregate (7-day revenue per customer)
# --------------------------------------------------------------------------

_SLIDING_SQL = """
WITH o AS (SELECT o_custkey, o_orderkey,
                  CAST(floor(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                             / 86400000000.0) AS BIGINT) AS day,
                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderkey, o_custkey, day,
       CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY day
                             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rev7d_cents
FROM o
"""


def _q_revenue_sliding_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer trailing-7-day revenue with a value-based RANGE
    frame (not ROWS): the frame is [day-6, day], so same-day peer
    orders are always included together and the result is independent
    of tie order — the frame semantics every calendar-window metric
    needs.  Integer day index + integer cents keep both engines
    exact.  One shuffle on o_custkey."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    # o_orderdate arrives as TIMESTAMP_NTZ (parquet isAdjustedToUTC =
    # false): datediff on its wall-clock DATE is the tz-free epoch-day
    # index — unix_micros would reject the type, and a cast to zoned
    # TIMESTAMP would shift with the (unknown) driver session timezone.
    day = F.datediff(F.to_date(F.col("o_orderdate")),
                     F.to_date(F.lit("1970-01-01"))).cast("bigint")
    cents = F.floor(F.col("o_totalprice") * 100).cast("bigint")
    q = o.select("o_orderkey", "o_custkey", day.alias("day"),
                 cents.alias("cents"))
    win = (Window.partitionBy("o_custkey").orderBy("day")
           .rangeBetween(-6, 0))
    return q.select("o_orderkey", "o_custkey", "day",
                    F.sum("cents").over(win).cast("bigint")
                    .alias("rev7d_cents"))


# --------------------------------------------------------------------------
# Pareto front (2-D skyline) per brand
# --------------------------------------------------------------------------

_PARETO_SQL = """
SELECT p.p_brand, p.p_partkey,
       CAST(floor(p.p_retailprice * 100) AS BIGINT) AS price_cents,
       CAST(p.p_size AS BIGINT) AS p_size
FROM {part} p
WHERE NOT EXISTS (
    SELECT 1 FROM {part} p2
    WHERE p2.p_brand = p.p_brand
      AND CAST(floor(p2.p_retailprice * 100) AS BIGINT)
          < CAST(floor(p.p_retailprice * 100) AS BIGINT)
      AND p2.p_size > p.p_size)
"""


def _q_pareto_front_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto front (2-D skyline): parts not strictly
    dominated (cheaper AND larger) by a same-brand part.  The oracle
    is the quadratic NOT-EXISTS dominance definition; the Spark plan
    is the O(n log n) sweep — sort each brand by price, then a part
    survives iff no strictly-cheaper part has a larger size, i.e.
    max(p_size) over the RANGE frame of strictly lower price_cents is
    <= its own size.  The RANGE bound excludes price peers exactly as
    the strict < in the dominance definition requires.  One shuffle
    on p_brand; no self-join, no cross product."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100).cast("bigint")
    q = p.select("p_brand", "p_partkey", cents.alias("price_cents"),
                 F.col("p_size").cast("bigint").alias("p_size"))
    win = (Window.partitionBy("p_brand").orderBy("price_cents")
           .rangeBetween(Window.unboundedPreceding, -1))
    best_cheaper = F.max("p_size").over(win)
    return (q.withColumn("__m", best_cheaper)
            .filter(F.col("__m").isNull()
                    | (F.col("__m") <= F.col("p_size")))
            .drop("__m"))


def _q_stream_rolling_anomaly(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Streaming restatement of events_rolling_anomaly
    (streaming/windowed.stream_rolling_anomaly): per-user trailing
    z-score via applyInPandasWithState with O(frame) state, verified
    against the SAME exact-integer SQL oracle as the batch form —
    Python's arbitrary-precision ints reproduce the DECIMAL/HUGEINT
    arithmetic bit-for-bit."""
    from .streaming.windowed import stream_rolling_anomaly
    return stream_rolling_anomaly(spark, sf_dir)


# --------------------------------------------------------------------------
# Exact heavy hitters without a full-vocabulary shuffle
# --------------------------------------------------------------------------

_HH_K = 400
_HH_SQL = f"""
WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
               AS tok FROM documents),
tot AS (SELECT count(*) AS n FROM t),
c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
SELECT c.tok, CAST(c.cnt AS BIGINT) AS cnt
FROM c, tot WHERE c.cnt * {_HH_K} > tot.n
"""


def _q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi=1/400 heavy-hitter tokens over the corpus via
    two-pass local-threshold candidate generation + exact recount
    (operators/aggregate.heavy_hitters_exact) — the scale path that
    never shuffles the full vocabulary.  The oracle is the naive
    full GROUP BY with the same integer threshold; results are
    identical by the candidate-superset guarantee."""
    from .operators.aggregate import heavy_hitters_exact
    from .operators.text import tokens
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return heavy_hitters_exact(toks, "tok", _HH_K)


# --------------------------------------------------------------------------
# Window VALUE-function surface (first/last/nth, IGNORE NULLS)
# --------------------------------------------------------------------------

_WVF_SQL = """
WITH q AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000000) AS BIGINT) AS vm
           FROM events),
m AS (SELECT *, CASE WHEN vm % 3 <> 0 THEN vm END AS vm_sparse FROM q)
SELECT event_id, user_id,
       first_value(vm) OVER w AS first_v,
       first_value(vm_sparse IGNORE NULLS) OVER w AS first_nn,
       last_value(vm_sparse IGNORE NULLS) OVER w AS locf_v,
       nth_value(vm, 2) OVER w AS second_v
FROM m
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def _q_window_value_functions(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The value-window surface in one pass: first_value / last_value /
    nth_value plus their IGNORE NULLS forms (last_value IGNORE NULLS
    over a trailing frame IS last-observation-carried-forward) — the
    complement of window_rank_functions' ranking surface.  One shared
    window spec => one shuffle + sort; the null-sparse column derives
    deterministically from the data (vm % 3) so both engines filter
    identical nulls."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000000).cast("bigint")
    m = (e.select("event_id", "user_id", "ts", vm.alias("vm"))
         .withColumn("vm_sparse",
                     F.when(F.col("vm") % 3 != 0, F.col("vm"))))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return m.select(
        "event_id", "user_id",
        F.first_value("vm").over(w).alias("first_v"),
        F.first_value("vm_sparse", ignoreNulls=True).over(w)
         .alias("first_nn"),
        F.last_value("vm_sparse", ignoreNulls=True).over(w)
         .alias("locf_v"),
        F.nth_value("vm", 2).over(w).alias("second_v"))


# --------------------------------------------------------------------------
# Data-quality assertion report (dbt-test style)
# --------------------------------------------------------------------------

_DQ_SQL = """
SELECT 'dup_user_ts' AS check_name, CAST(count(*) AS BIGINT)
       AS n_violations
FROM (SELECT user_id, ts FROM events GROUP BY user_id, ts
      HAVING count(*) > 1)
UNION ALL
SELECT 'fk_lineitem_orders', CAST(count(*) AS BIGINT) FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'fk_orders_customer', CAST(count(*) AS BIGINT) FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'neg_acctbal', CAST(count(*) AS BIGINT) FROM customer
WHERE c_acctbal < 0
UNION ALL
SELECT 'short_doc_text', CAST(count(*) AS BIGINT) FROM documents
WHERE text IS NULL OR length(trim(text)) < 100
UNION ALL
SELECT 'value_out_of_range', CAST(count(*) AS BIGINT) FROM events
WHERE value IS NULL OR value <= 0 OR value > 400
UNION ALL
SELECT 'bad_event_type', CAST(count(*) AS BIGINT) FROM events
WHERE event_type IS NULL OR event_type NOT IN
      ('click', 'signup', 'error', 'view', 'purchase')
UNION ALL
SELECT 'future_ts', CAST(count(*) AS BIGINT) FROM events
WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2030-01-01'
"""


def _q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over the warehouse (operators/dq): two
    referential-integrity anti-joins, a composite-key uniqueness
    check, null/range filters, an accepted-values domain check, and a
    future-timestamp bound — one (check_name, n_violations) row each,
    passing checks included as explicit zeros.  Every check collapses
    to a count before the union, so the report moves eight rows
    however many TBs the checks scanned."""
    from .operators.dq import dq_counts, duplicate_keys, fk_violations

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    return dq_counts({
        "dup_user_ts": duplicate_keys(events, "user_id", "ts"),
        "fk_lineitem_orders": fk_violations(
            li, "l_orderkey", orders, "o_orderkey"),
        "fk_orders_customer": fk_violations(
            orders.select("o_custkey"), "o_custkey", cust, "c_custkey"),
        "neg_acctbal": cust.filter(F.col("c_acctbal") < 0),
        "short_doc_text": docs.filter(
            F.col("text").isNull()
            | (F.length(F.trim("text")) < 100)),
        "value_out_of_range": events.filter(
            F.col("value").isNull() | (F.col("value") <= 0)
            | (F.col("value") > 400)),
        # accepted-values (dbt-style domain check) + a bound against
        # obviously-corrupt future timestamps; the reference instant
        # is a fixed literal, not now(), so the check is deterministic.
        "bad_event_type": events.filter(
            F.col("event_type").isNull()
            | ~F.col("event_type").isin("click", "signup", "error",
                                        "view", "purchase")),
        "future_ts": events.filter(
            F.col("ts") >= F.lit("2030-01-01").cast("timestamp")),
    })


# --------------------------------------------------------------------------
# Market-share ratio (TPC-H Q8 shape)
# --------------------------------------------------------------------------

_MKTSHARE_SQL = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
       round(CAST(SUM(CASE WHEN r.r_name = 'AMERICA'
                           THEN CAST(o.o_totalprice AS DECIMAL(32,6))
                           ELSE CAST(0 AS DECIMAL(32,6)) END)
                  AS DOUBLE)
             / CAST(SUM(CAST(o.o_totalprice AS DECIMAL(32,6)))
                    AS DOUBLE), 6) AS america_share,
       round(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(32,6)))
                  AS DOUBLE), 2) AS total_rev
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1
"""


def _q_market_share_yearly(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one region's share of yearly revenue — a
    conditional-aggregate ratio.  Both the numerator and denominator
    accumulate in DECIMAL, divide once in double, and round, so the
    ratio is bit-identical across engines.  nation/region broadcast;
    orders-customer is the one genuinely large join (key-partitioned,
    AQE picks broadcast when customer fits), then the year rollup."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dec = F.col("o_totalprice").cast("decimal(32,6)")
    amer = F.when(F.col("r_name") == "AMERICA", dec) \
        .otherwise(F.lit(0).cast("decimal(32,6)"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.round(F.sum(amer).cast("double")
                     / F.sum(dec).cast("double"), 6)
             .alias("america_share"),
             F.round(F.sum(dec).cast("double"), 2).alias("total_rev")))


# --------------------------------------------------------------------------
# Z-order clustering key (multi-dimensional data skipping)
# --------------------------------------------------------------------------

def _zorder_oracle() -> str:
    from .operators.layout import zorder_key_sql
    return zorder_key_sql("orders", ["o_custkey", "o_totalprice"],
                          id_col="o_orderkey")


def _q_zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (o_custkey, o_totalprice)
    — the sort key that makes every output file's min/max stats tight
    on BOTH columns at once (operators/layout).  Pure JVM shift/or
    arithmetic after one tiny min/max aggregate; the oracle renders
    the identical affine-quantize + interleave in SQL, so the key is
    bit-reproducible across engines."""
    from .operators.layout import zorder_key
    o = load_table(spark, sf_dir, "orders") \
        .select("o_orderkey", "o_custkey", "o_totalprice")
    return zorder_key(o, ["o_custkey", "o_totalprice"]) \
        .select("o_orderkey", "zkey")


# --------------------------------------------------------------------------
# Schema-evolution scan (mergeSchema over heterogeneous fragments)
# --------------------------------------------------------------------------

_SCHEMA_EVO_SQL = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 1 THEN source END AS source,
       CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
FROM documents
"""


def _q_schema_evolution_scan(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Schema evolution, the lake reality after any column addition:
    an EARLY parquet fragment written before the ``source``/``n_chars``
    columns existed and a LATER fragment with them, read back in one
    ``mergeSchema`` scan.  Missing columns surface as nulls exactly
    where the fragment lacked them; the oracle reproduces the same
    union from the base table.  At 100 TB this is how every long-lived
    table actually looks — per-file schemas differ and the reader owns
    reconciliation; the footer merge is metadata-only (no data
    rewrite)."""
    import hashlib
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    # Deterministic per-sf staging dir + overwrite mode: repeated
    # invocations (bench warm+timed, driver rounds) rewrite ONE copy
    # instead of leaking a fresh mkdtemp each call.  The dir can't be
    # deleted before the driver consumes the lazy result, so bounding
    # it is the honest fix.
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    tmp = os.path.join(tempfile.gettempdir(), f"schema_evo_{tag}")
    docs.filter(F.col("doc_id") % 2 == 0) \
        .select("doc_id", "lang") \
        .write.mode("overwrite").parquet(f"{tmp}/old")
    docs.filter(F.col("doc_id") % 2 == 1) \
        .select("doc_id", "lang", "source", "n_chars") \
        .write.mode("overwrite").parquet(f"{tmp}/new")
    back = spark.read.option("mergeSchema", "true") \
        .parquet(f"{tmp}/old", f"{tmp}/new")
    return back.select("doc_id", "lang", "source",
                       F.col("n_chars").cast("bigint").alias("n_chars"))


# --------------------------------------------------------------------------
# Table profiling report
# --------------------------------------------------------------------------

_PROFILE_TABLES = {
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderpriority"],
    "documents": ["doc_id", "lang", "source", "n_chars"],
}


def _profile_oracle() -> str:
    from .operators.dq import profile_sql
    return "\nUNION ALL\n".join(
        profile_sql(t, cs) for t, cs in _PROFILE_TABLES.items())


def _q_profile_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling (operators/dq.profile_columns): per-column
    n_rows / n_nulls / n_distinct for three tables in one long report
    — one fused aggregate pass per table (multi-distinct via one
    Expand), unions of 5-row frames.  The oracle is the naive
    one-leg-per-column UNION ALL."""
    from functools import reduce

    from .operators.dq import profile_columns
    frames = [
        profile_columns(load_table(spark, sf_dir, t).select(*cs), t, cs)
        for t, cs in _PROFILE_TABLES.items()
    ]
    return reduce(lambda a, b: a.unionAll(b), frames)


def _bfs_oracle() -> str:
    from .operators.graph import hop_distances_sql
    sym = f"""
WITH base AS ({_TRADE_EDGES_CTE})
SELECT u, v FROM base UNION ALL SELECT v AS u, u AS v FROM base"""
    srcs = "SELECT n_nationkey AS node FROM nation WHERE n_nationkey = 0"
    return f"""
WITH pn AS ({hop_distances_sql(sym, srcs, k=4)})
SELECT n.n_name, pn.dist
FROM pn JOIN nation n ON n.n_nationkey = pn.node
"""


def _q_nation_trade_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS (operators/graph.hop_distances): shortest hop
    distance from nation 0 over the symmetrized thresholded trade
    graph, <= 4 hops — k unrolled relaxation rounds, each one
    (node, dist) join + min-agg, the same small-payload iterative
    shape as pagerank.  Oracle: the identical rounds as unrolled
    CTEs."""
    from .operators.graph import hop_distances
    e = _trade_edges(spark, sf_dir)
    sym = e.unionAll(e.select(F.col("v").alias("u"),
                              F.col("u").alias("v")))
    nation = load_table(spark, sf_dir, "nation")
    srcs = nation.filter(F.col("n_nationkey") == 0) \
        .select(F.col("n_nationkey").alias("node"))
    # The trade graph is a node-pair aggregate over the nation
    # dimension — <= |nations|^2 rows at ANY corpus scale, so the
    # per-round join can broadcast instead of shuffling.
    d = hop_distances(sym, srcs, k=4, broadcast_edges=True)
    return (d.join(F.broadcast(nation),
                   d.node == nation.n_nationkey)
            .select("n_name", "dist"))


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (partial-state merge)
# --------------------------------------------------------------------------

_INCR_AGG_SQL = """
WITH c AS (SELECT o_custkey,
                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total,
       CAST(MIN(cents) AS BIGINT) AS v_min,
       CAST(MAX(cents) AS BIGINT) AS v_max,
       round(CAST(SUM(cents) AS DOUBLE) / count(*), 6) AS v_avg
FROM c GROUP BY o_custkey
"""


def _q_incremental_agg_maintenance(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (operators/incremental): the
    per-customer order aggregate is built as TWO partial states — the
    'historical' snapshot (orders before 1998) and the 'delta' (1998
    onward) — then merged and finalized WITHOUT rescanning history.
    The oracle is the full GROUP BY over all orders: merge(partial(A),
    partial(B)) must equal recompute(A ∪ B) exactly, which is the
    entire contract of incremental ETL."""
    from .operators.incremental import (finalize, merge_states,
                                        partial_aggregate)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("bigint")
         .alias("cents"))
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    # NULL order dates route into the historical side: both < and >=
    # evaluate to NULL for them, so without the isNull() arm the two
    # partials would NOT partition the table and merge != recompute.
    hist = partial_aggregate(
        o.filter(F.col("o_orderdate").isNull()
                 | (F.col("o_orderdate") < cut)),
        ["o_custkey"], "cents")
    delta = partial_aggregate(o.filter(F.col("o_orderdate") >= cut),
                              ["o_custkey"], "cents")
    return finalize(merge_states(hist, delta))


# --------------------------------------------------------------------------
# Sliding-window DISTINCT (7-day active users) + day-of-week profile
# --------------------------------------------------------------------------

_ACTIVE7_SQL = """
WITH d AS (SELECT DISTINCT user_id,
                  CAST(floor(epoch_us(CAST(ts AS TIMESTAMP))
                             / 86400000000.0) AS BIGINT) AS day
           FROM events),
g AS (SELECT DISTINCT day FROM d)
SELECT g.day, CAST(count(DISTINCT d.user_id) AS BIGINT) AS active_7d
FROM g JOIN d ON d.day BETWEEN g.day - 6 AND g.day
GROUP BY g.day
"""


def _q_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT active users per day — the sliding
    DISTINCT no window frame can express (COUNT(DISTINCT) OVER RANGE
    is unsupported in every engine).  The scale shape: dedupe to
    (user, day) once, explode each row to the <=7 window-days it
    contributes to (in-row sequence — x7 fan-out of the already-tiny
    distinct set, NOT of the raw events), keep real days via a
    broadcast semi-join, and one distinct-count per window-day.  The
    oracle is the quadratic-ish range self-join definition."""
    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000.0)) \
        .cast("bigint")
    d = e.select("user_id", day.alias("day")).distinct()
    days = d.select("day").distinct()
    expanded = d.select(
        "user_id",
        F.explode(F.sequence(F.col("day"),
                             F.col("day") + F.lit(6))).alias("day"))
    return (expanded.join(F.broadcast(days), "day", "left_semi")
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("bigint")
                 .alias("active_7d")))


_DOW_SQL = """
SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE), 2)
           AS total_value
FROM events GROUP BY 1, 2
"""


def _q_events_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type.  ISO weekday
    (Mon=1..Sun=7) on both engines — Spark's ``weekday`` (Mon=0) + 1
    vs DuckDB's ``isodow`` — because the engines' default ``dayofweek``
    numberings disagree; DECIMAL-accumulated totals as everywhere."""
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy((F.weekday("ts") + F.lit(1)).cast("bigint")
                      .alias("dow"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(32,6)"))
                         .cast("double"), 2).alias("total_value")))


def _mix_temp_oracle() -> str:
    from .operators.mixing import source_mix_temperature_sql
    return source_mix_temperature_sql("documents", "doc_id", "text",
                                      "source")


def _q_corpus_mix_temperature(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (alpha=0.5): per-source rates
    derive from the data as sqrt(token count) — the multilingual
    upsample-the-tail rebalance — with the same deterministic
    content-hash sampling as corpus_mix
    (operators/mixing.source_mix_temperature)."""
    from .operators.mixing import source_mix_temperature
    docs = load_table(spark, sf_dir, "documents")
    return source_mix_temperature(docs, "doc_id", "text", "source")


def _q_stream_incremental_agg(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Streaming twin of incremental_agg_maintenance
    (streaming/windowed.stream_incremental_agg): four genuine
    micro-batches (maxFilesPerTrigger=1 over four staged fragments),
    each foreachBatch merging its partial state with the previous
    version — history never rescanned.  Shares the batch query's
    full-GROUP-BY oracle because partial-state merge is associative
    over any split."""
    from .streaming.windowed import stream_incremental_agg
    return stream_incremental_agg(spark, sf_dir)


def _wsample_oracle() -> str:
    from .operators.sample import weighted_sample_sql
    return weighted_sample_sql("documents", ["doc_id"], "n_chars",
                               k=100, cols="doc_id, source, n_chars")


def _q_weighted_sample_docs(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/sample.weighted_sample, Efraimidis-Spirakis): 100 docs
    with inclusion probability proportional to length — the
    quality/length-weighted subsample step of a curation pipeline,
    reproducible across clusters and engines."""
    from .operators.sample import weighted_sample
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "source", "n_chars")
    return weighted_sample(docs, ["doc_id"], "n_chars", k=100)


# --------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

_NULLSAFE_SQL = """
WITH a AS (SELECT DISTINCT CASE WHEN CAST(floor(value) AS BIGINT) % 5 = 0
                                THEN NULL
                                ELSE CAST(floor(value) AS BIGINT) % 50
                           END AS k
           FROM events WHERE event_type = 'click'),
b AS (SELECT DISTINCT CASE WHEN CAST(floor(value) AS BIGINT) % 5 = 0
                           THEN NULL
                           ELSE CAST(floor(value) AS BIGINT) % 50
                      END AS k
      FROM events WHERE event_type = 'view')
SELECT a.k AS k, CAST(count(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
"""


def _q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark ``<=>`` vs SQL IS NOT DISTINCT
    FROM): NULL keys match each other instead of silently dropping —
    the semantics every "join on an optional attribute" pipeline needs
    and a plain equi-join gets wrong.  Still hash-partitionable (null
    is just one more key value), so the plan is an ordinary shuffled
    hash join, not a cartesian fallback."""
    e = load_table(spark, sf_dir, "events")
    k = F.when(F.floor("value").cast("bigint") % 5 == 0,
               F.lit(None).cast("bigint")) \
        .otherwise(F.floor("value").cast("bigint") % 50)
    a = e.filter(F.col("event_type") == "click") \
        .select(k.alias("k")).distinct()
    b = e.filter(F.col("event_type") == "view") \
        .select(k.alias("ka")).distinct()
    return (a.join(b, a["k"].eqNullSafe(b["ka"]))
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs")))


# --------------------------------------------------------------------------
# Python UDTF surface (lateral table function)
# --------------------------------------------------------------------------

_UDTF_SQL = """
WITH f AS (
    SELECT doc_id,
           list_filter(list_transform(
               regexp_split_to_array(text, '[.!?]+'),
               x -> trim(x, ' ' || chr(9) || chr(10) || chr(11)
                            || chr(12) || chr(13))),
               x -> x <> '') AS parts
    FROM documents
), z AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(parts) + 1),
                  i -> {'idx': i - 1, 's': parts[i]})) AS u
    FROM f
)
SELECT doc_id, CAST(u.idx AS BIGINT) AS sentence_idx,
       u.s AS sentence
FROM z
"""


def _q_udtf_sentence_split(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 user-defined TABLE function) via a
    SQL LATERAL join: one input row fans out to one row per sentence.
    This is deliberately the API demo — the production path for a
    pure-string split is the in-row JVM split + posexplode the other
    text queries use (the oracle proves the semantics are
    SQL-expressible); a UDTF earns its per-row Python cost only when
    the expansion needs real Python (a parser, a tokenizer library, a
    model).  Registered per-call; the oracle replicates the
    filter-then-index semantics with list_filter + generate_series."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx bigint, sentence string")
    class SplitSentences:
        def eval(self, text: str):  # noqa: ANN001 — UDTF contract
            import re
            parts = [s.strip() for s in re.split(r"[.!?]+", text or "")
                     if s.strip()]
            for i, s in enumerate(parts):
                yield i, s

    spark.udtf.register("__split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents") \
        .createOrReplaceTempView("__udtf_docs")
    return spark.sql("""
        SELECT doc_id, s.sentence_idx, s.sentence
        FROM __udtf_docs, LATERAL __split_sentences(text) s""")


# --------------------------------------------------------------------------
# RFM customer segmentation (percentile-threshold bucketing)
# --------------------------------------------------------------------------

_RFM_SQL = """
WITH base AS (
    SELECT o_custkey,
           CAST(max(CAST(floor(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                      / 86400000000.0) AS BIGINT)) AS BIGINT) AS last_day,
           CAST(count(*) AS BIGINT) AS f_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS m_cents
    FROM orders GROUP BY o_custkey
), ref AS (SELECT max(last_day) AS ref_day FROM base),
r AS (
    SELECT b.o_custkey, ref.ref_day - b.last_day AS r_days,
           b.f_orders, b.m_cents
    FROM base b, ref
), th AS (
    SELECT quantile_cont(r_days, 0.25) AS r25,
           quantile_cont(r_days, 0.5) AS r50,
           quantile_cont(r_days, 0.75) AS r75,
           quantile_cont(f_orders, 0.25) AS f25,
           quantile_cont(f_orders, 0.5) AS f50,
           quantile_cont(f_orders, 0.75) AS f75,
           quantile_cont(m_cents, 0.25) AS m25,
           quantile_cont(m_cents, 0.5) AS m50,
           quantile_cont(m_cents, 0.75) AS m75
    FROM r
)
SELECT r.o_custkey, r.r_days, r.f_orders, r.m_cents,
       CAST(1 + CAST(r_days > r25 AS INT) + CAST(r_days > r50 AS INT)
              + CAST(r_days > r75 AS INT) AS BIGINT) AS r_bucket,
       CAST(1 + CAST(f_orders > f25 AS INT) + CAST(f_orders > f50 AS INT)
              + CAST(f_orders > f75 AS INT) AS BIGINT) AS f_bucket,
       CAST(1 + CAST(m_cents > m25 AS INT) + CAST(m_cents > m50 AS INT)
              + CAST(m_cents > m75 AS INT) AS BIGINT) AS m_bucket
FROM r, th
"""


def _q_customer_rfm_segments(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """RFM segmentation — recency (days since last order, vs the
    dataset's max day so it is deterministic, never now()), frequency,
    monetary — each bucketed 1-4 by EXACT quartile thresholds.  The
    scale shape: thresholds come from one tiny aggregate over the
    per-customer rollup and broadcast back as a 1-row join — never an
    ntile window over an unpartitioned table (the global-sort
    scale-killer the naive formulation hides).  Integer metrics and
    interpolated quantile_cont ≡ Spark percentile keep every bucket
    boundary engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    # tz-free epoch day on the NTZ wall date (the revenue_sliding_7d
    # pattern); r_days is a DIFFERENCE of days so any constant offset
    # would cancel anyway.
    day = F.datediff(F.to_date(F.col("o_orderdate")),
                     F.to_date(F.lit("1970-01-01"))).cast("bigint")
    base = (o.select("o_custkey", day.alias("day"),
                     F.floor(F.col("o_totalprice") * 100).cast("bigint")
                      .alias("cents"))
            .groupBy("o_custkey")
            .agg(F.max("day").alias("last_day"),
                 F.count(F.lit(1)).alias("f_orders"),
                 F.sum("cents").cast("bigint").alias("m_cents")))
    from pyspark.sql import Window
    wall = Window.partitionBy()
    r = base.select(
        "o_custkey",
        (F.max("last_day").over(wall) - F.col("last_day"))
        .alias("r_days"),
        "f_orders", "m_cents")
    th = r.agg(*[
        F.expr(f"percentile({c}, {q})").alias(f"{c[0]}{int(q * 100)}")
        for c in ("r_days", "f_orders", "m_cents")
        for q in (0.25, 0.5, 0.75)])

    def bucket(col: str, p: str) -> F.Column:
        return (F.lit(1)
                + (F.col(col) > F.col(f"{p}25")).cast("int")
                + (F.col(col) > F.col(f"{p}50")).cast("int")
                + (F.col(col) > F.col(f"{p}75")).cast("int")
                ).cast("bigint")

    return (r.join(F.broadcast(th))
            .select("o_custkey", "r_days", "f_orders", "m_cents",
                    bucket("r_days", "r").alias("r_bucket"),
                    bucket("f_orders", "f").alias("f_bucket"),
                    bucket("m_cents", "m").alias("m_bucket")))


# --------------------------------------------------------------------------
# Relational division (the FOR ALL shape)
# --------------------------------------------------------------------------

_DIVISION_SQL = """
WITH target AS (
    SELECT n_nationkey FROM {nation} n JOIN {region} r
        ON r.r_regionkey = n.n_regionkey WHERE r.r_name = 'AMERICA'
), served AS (
    SELECT DISTINCT l.l_suppkey, c.c_nationkey
    FROM {lineitem} l
    JOIN {orders} o ON o.o_orderkey = l.l_orderkey
    JOIN {customer} c ON c.c_custkey = o.o_custkey
    WHERE c.c_nationkey IN (SELECT n_nationkey FROM target)
      AND l.l_shipdate >= TIMESTAMP '2001-04-01'
)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_nations
FROM served GROUP BY l_suppkey
HAVING count(*) = (SELECT count(*) FROM target)
"""


def _q_suppliers_serving_all_nations(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Relational division — the FOR ALL query shape (Codd's ÷, TPC-H
    has no analog): suppliers whose recent shipments reached customers
    in EVERY nation of a region.  The scale formulation is
    count-distinct equality, never the double-NOT-EXISTS textbook
    form: dedupe (supplier, nation) pairs once, one groupBy, compare
    to the divisor's count (an uncorrelated scalar, computed once) —
    all shuffles are keys-only.  Same SQL text on both engines."""
    for t in ("nation", "region", "customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t, fan_out=False) \
            .createOrReplaceTempView(f"__div_{t}")
    return spark.sql(_DIVISION_SQL.format(
        nation="__div_nation", region="__div_region",
        customer="__div_customer", orders="__div_orders",
        lineitem="__div_lineitem"))


# --------------------------------------------------------------------------
# Incremental dedup load: the production arrival path, end to end
# --------------------------------------------------------------------------

_INC_LOAD_SQL = """
WITH wh AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
nb AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
norm_w AS (
    SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
    FROM wh),
norm_n AS (
    SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
    FROM nb),
sh_w AS (
    SELECT doc_id,
           unnest([substr(nt, i, 4)
               FOR i IN generate_series(1, greatest(length(nt) - 3, 1))])
               AS shingle
    FROM norm_w),
sh_n AS (
    SELECT doc_id,
           unnest([substr(nt, i, 4)
               FOR i IN generate_series(1, greatest(length(nt) - 3, 1))])
               AS shingle
    FROM norm_n),
sig_w AS (
    SELECT doc_id,
           min(substr(md5(concat('s0:', shingle)),  1, 8)) AS mh0,
           min(substr(md5(concat('s0:', shingle)),  9, 8)) AS mh1,
           min(substr(md5(concat('s0:', shingle)), 17, 8)) AS mh2,
           min(substr(md5(concat('s0:', shingle)), 25, 8)) AS mh3,
           min(substr(md5(concat('s1:', shingle)),  1, 8)) AS mh4,
           min(substr(md5(concat('s1:', shingle)),  9, 8)) AS mh5,
           min(substr(md5(concat('s1:', shingle)), 17, 8)) AS mh6,
           min(substr(md5(concat('s1:', shingle)), 25, 8)) AS mh7
    FROM sh_w GROUP BY 1),
sig_n AS (
    SELECT doc_id,
           min(substr(md5(concat('s0:', shingle)),  1, 8)) AS mh0,
           min(substr(md5(concat('s0:', shingle)),  9, 8)) AS mh1,
           min(substr(md5(concat('s0:', shingle)), 17, 8)) AS mh2,
           min(substr(md5(concat('s0:', shingle)), 25, 8)) AS mh3,
           min(substr(md5(concat('s1:', shingle)),  1, 8)) AS mh4,
           min(substr(md5(concat('s1:', shingle)),  9, 8)) AS mh5,
           min(substr(md5(concat('s1:', shingle)), 17, 8)) AS mh6,
           min(substr(md5(concat('s1:', shingle)), 25, 8)) AS mh7
    FROM sh_n GROUP BY 1),
band_w AS (
    SELECT doc_id, 0 AS band, concat(mh0, '|', mh1) AS band_key FROM sig_w
    UNION ALL SELECT doc_id, 1, concat(mh2, '|', mh3) FROM sig_w
    UNION ALL SELECT doc_id, 2, concat(mh4, '|', mh5) FROM sig_w
    UNION ALL SELECT doc_id, 3, concat(mh6, '|', mh7) FROM sig_w),
band_n AS (
    SELECT doc_id, 0 AS band, concat(mh0, '|', mh1) AS band_key FROM sig_n
    UNION ALL SELECT doc_id, 1, concat(mh2, '|', mh3) FROM sig_n
    UNION ALL SELECT doc_id, 2, concat(mh4, '|', mh5) FROM sig_n
    UNION ALL SELECT doc_id, 3, concat(mh6, '|', mh7) FROM sig_n),
kept AS (
    SELECT band, band_key FROM band_w
    GROUP BY 1, 2 HAVING COUNT(*) <= 500),
pruned_w AS (
    SELECT b.* FROM band_w b
    JOIN kept k ON b.band = k.band AND b.band_key = k.band_key),
cand AS (
    SELECT DISTINCT n.doc_id AS new_id, w.doc_id AS old_id
    FROM band_n n
    JOIN pruned_w w ON n.band = w.band AND n.band_key = w.band_key),
shd_n AS (SELECT DISTINCT doc_id, shingle FROM sh_n),
shd_w AS (SELECT DISTINCT doc_id, shingle FROM sh_w),
sz_n AS (SELECT doc_id, COUNT(*) AS sz FROM shd_n GROUP BY 1),
sz_w AS (SELECT doc_id, COUNT(*) AS sz FROM shd_w GROUP BY 1),
inter AS (
    SELECT c.new_id, c.old_id, COUNT(*) AS i
    FROM cand c
    JOIN shd_n a ON a.doc_id = c.new_id
    JOIN shd_w b ON b.doc_id = c.old_id AND b.shingle = a.shingle
    GROUP BY 1, 2),
dups AS (
    SELECT i.new_id, min(i.old_id) AS matched_old
    FROM inter i
    JOIN sz_n ON sz_n.doc_id = i.new_id
    JOIN sz_w ON sz_w.doc_id = i.old_id
    WHERE round(CAST(i.i AS DOUBLE) / (sz_n.sz + sz_w.sz - i.i), 6) >= 0.8
    GROUP BY 1)
SELECT nb.doc_id, d.matched_old,
       CAST(d.matched_old IS NULL AS BIGINT) AS loaded
FROM nb LEFT JOIN dups d ON d.new_id = nb.doc_id
"""


def _q_dedup_incremental_load(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The production arrival path END TO END: a new document batch
    (doc_id % 7 = 0) lands against the existing corpus warehouse (the
    other 6/7), and incremental LSH decides what loads.

    batch minhash signatures -> ``incremental_lsh_candidates`` against
    the warehouse signature table (new-bands x warehouse-bands only —
    the corpus is never re-shingled against itself; the hot-band cap
    bounds fanout on the warehouse side) -> exact char-4gram Jaccard
    recheck of just the candidate pairs (inverted-index join, never
    all-pairs) -> anti-join verdict per batch doc: ``matched_old`` =
    lowest warehouse duplicate (NULL if none), ``loaded`` = 1 iff the
    doc survives to load.  At 100 TB the warehouse signatures are a
    materialized table partitioned by band key, so each nightly batch
    touches only its own buckets — O(batch), not O(corpus).

    Composes the J2 anti-join-load semantics (reference
    pipeline.py:179-186) with MinHash/LSH; every stage is the same
    operator the standalone dedup queries verify.  The whole decision
    is ``dedup.incremental_neardup_verdict`` — the identical function
    the streaming arrival path (streaming/windowed.py
    streaming_neardup_load) runs per micro-batch."""
    from .operators.dedup import incremental_neardup_verdict

    # The warehouse frame plays two roles with OPPOSITE layout needs:
    # the signature derivation is a narrow per-row-heavy pipeline that
    # wants the scan fan-out, while the exact-recheck branch semi-joins
    # it first — and PushDownLeftSemiAntiJoin transposes a fan-out
    # repartition ABOVE the semi join, turning it into a blind
    # reshuffle of the join output (the join's own hash exchange
    # already provides full parallelism there).  So: derive the
    # signatures from a fanned scan and pass them via ``wh_sigs``,
    # while the operator sees only the plain warehouse frame.
    docs_fan = load_table(spark, sf_dir, "documents", fan_out=True)
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    wh = docs.filter(F.col("doc_id") % 7 != 0)
    nb = docs_fan.filter(F.col("doc_id") % 7 == 0)
    # All three warehouse-side intermediates are the STAGED tables a
    # production warehouse stores (signatures, band keys, per-doc
    # shingle sets — written at ingest); per-arrival work is only the
    # batch side + the candidate verify (optimization r12).
    return incremental_neardup_verdict(
        nb, wh, threshold=0.8, max_bucket=500,
        wh_sigs=_warehouse_signatures(spark, sf_dir),
        wh_bands=_warehouse_bands(spark, sf_dir),
        wh_shingle_arrays=_warehouse_shingle_arrays(spark, sf_dir))


def _warehouse_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse MinHash signature table, materialized once per
    (session, sf_dir) — the local analogue of the production layout,
    where signatures are a stored table (partitioned by band key)
    written at ingest and each arriving batch only READS them.
    Deriving them inline made every bench run re-shingle + re-hash the
    entire corpus (~60% of the pipeline's wall), which no deployed
    arrival path would do."""
    from pyspark.storagelevel import StorageLevel

    from .operators.dedup import char_shingles, minhash_signature
    from .session import session_memo

    def build():
        wh = load_table(spark, sf_dir, "documents", fan_out=True) \
            .filter(F.col("doc_id") % 7 != 0)
        return minhash_signature(
            char_shingles(wh, "doc_id", "text", n=4),
            "doc_id", n_hashes=8) \
            .persist(StorageLevel.MEMORY_AND_DISK)

    return session_memo(spark, f"wh_sigs:{sf_dir}", build)


def _warehouse_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warehouse band-key table — banded_keys over the staged
    signatures with the hot-band cap (500) already applied — staged
    once per (session, sf_dir).  This is literally the layout the
    production warehouse stores ("signatures partitioned by band
    key", _warehouse_signatures' docstring): each arriving batch
    joins it, so re-deriving the banding AND re-running the
    bucket-census window over the whole warehouse per arrival
    (one full-warehouse shuffle per invocation, r11 plan dump) was
    per-query work no deployed path would pay.  Deterministic
    function of the staged signatures; the cap matches the registered
    query's max_bucket=500 (optimization r12)."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from .operators.dedup import banded_keys
    from .session import session_memo

    def build():
        wb = banded_keys(_warehouse_signatures(spark, sf_dir),
                         "doc_id", rows_per_band=2)
        w = Window.partitionBy("band", "band_key")
        return (wb.withColumn("__n", F.count(F.lit(1)).over(w))
                .filter(F.col("__n") <= 500)
                .drop("__n")
                .persist(StorageLevel.MEMORY_AND_DISK))

    return session_memo(spark, f"wh_bands:{sf_dir}", build)


def _warehouse_shingle_arrays(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """The warehouse per-doc char-4-gram shingle-SET table (doc_id,
    shingles), staged once per (session, sf_dir) — the "stored
    per-doc shingle table" incremental_neardup_verdict's docstring
    prescribes for cluster scale.  The exact recheck previously
    re-projected every warehouse text (normalize + transform +
    array_distinct, the pipeline's heaviest narrow work) on EVERY
    arrival; the staged table is written once at ingest alongside
    the signatures (optimization r12)."""
    from pyspark.storagelevel import StorageLevel

    from .operators.dedup import shingle_set_arrays
    from .session import session_memo

    def build():
        wh = load_table(spark, sf_dir, "documents", fan_out=True) \
            .filter(F.col("doc_id") % 7 != 0)
        return shingle_set_arrays(wh, "doc_id", "text", n=4) \
            .persist(StorageLevel.MEMORY_AND_DISK)

    return session_memo(spark, f"wh_shingle_arrays:{sf_dir}", build)


# (name, oracle_sql, fn) in admission order.
PENDING: list[tuple[str, str,
                    Callable[[SparkSession, str], DataFrame]]] = [
    ("multimodal_wav_stats", _WAV_SQL, _q_multimodal_wav_stats),
    ("correlated_small_qty_revenue",
     _Q17_SQL.format(lineitem="lineitem", part="part"),
     _q_correlated_small_qty_revenue),
    ("correlated_exists_orders",
     _QEXISTS_SQL.format(orders="orders", lineitem="lineitem"),
     _q_correlated_exists_orders),
    ("multimodal_wav_resample", _WAV_RESAMPLE_SQL,
     _q_multimodal_wav_resample),
    ("having_scalar_threshold", _Q11_SQL.format(part="part"),
     _q_having_scalar_threshold),
    ("event_day_streaks", _STREAKS_SQL, _q_event_day_streaks),
    ("min_acctbal_supplier",
     _Q2_SQL.format(supplier="supplier", nation="nation"),
     _q_min_acctbal_supplier),
    ("inactive_premium_customers",
     _Q22_SQL.format(customer="customer", nation="nation",
                     orders="orders"),
     _q_inactive_premium_customers),
    ("nation_trade_triangles", _triangles_oracle(),
     _q_nation_trade_triangles),
    ("events_rolling_anomaly", _ANOMALY_SQL, _q_events_rolling_anomaly),
    ("revenue_sliding_7d", _SLIDING_SQL, _q_revenue_sliding_7d),
    ("pareto_front_brand", _PARETO_SQL.format(part="part"),
     _q_pareto_front_brand),
    ("heavy_hitter_tokens", _HH_SQL, _q_heavy_hitter_tokens),
    ("window_value_functions", _WVF_SQL, _q_window_value_functions),
    ("stream_rolling_anomaly", _ANOMALY_SQL, _q_stream_rolling_anomaly),
    ("dq_report", _DQ_SQL, _q_dq_report),
    ("market_share_yearly", _MKTSHARE_SQL, _q_market_share_yearly),
    ("zorder_key_orders", _zorder_oracle(), _q_zorder_key_orders),
    ("schema_evolution_scan", _SCHEMA_EVO_SQL, _q_schema_evolution_scan),
    ("profile_tables", _profile_oracle(), _q_profile_tables),
    ("nation_trade_bfs", _bfs_oracle(), _q_nation_trade_bfs),
    ("incremental_agg_maintenance", _INCR_AGG_SQL,
     _q_incremental_agg_maintenance),
    ("active_users_7d", _ACTIVE7_SQL, _q_active_users_7d),
    ("events_dow_profile", _DOW_SQL, _q_events_dow_profile),
    ("corpus_mix_temperature", _mix_temp_oracle(),
     _q_corpus_mix_temperature),
    ("weighted_sample_docs", _wsample_oracle(), _q_weighted_sample_docs),
    ("stream_incremental_agg", _INCR_AGG_SQL, _q_stream_incremental_agg),
    ("null_safe_join", _NULLSAFE_SQL, _q_null_safe_join),
    ("udtf_sentence_split", _UDTF_SQL, _q_udtf_sentence_split),
    ("customer_rfm_segments", _RFM_SQL, _q_customer_rfm_segments),
    ("suppliers_serving_all_nations",
     _DIVISION_SQL.format(nation="nation", region="region",
                          customer="customer", orders="orders",
                          lineitem="lineitem"),
     _q_suppliers_serving_all_nations),
]


# Second tranche (TPC-H shapes Q4/Q5/Q7/Q10/Q14/Q15/Q16/Q18/Q19,
# embedding quantization/centroids, substring-dup spans, analytics
# surface) — appended AFTER the first so admission order is stable.
from .registry_pending2 import PENDING2  # noqa: E402

PENDING.extend(PENDING2)

# Third tranche (round 5) — queues BEHIND both earlier tranches; at
# N = 150 = 3x50 the rotation has zero slack in round 5 (by design:
# the round-4 verdict froze net-new registrations so the 50-row budget
# drains the never-verified backlog), so this admits when the
# staleness bound extends to 4 rounds in round 6+.
PENDING.append(("dedup_incremental_load", _INC_LOAD_SQL,
                _q_dedup_incremental_load))

from .registry_pending3 import PENDING3  # noqa: E402

PENDING.extend(PENDING3)

# Fourth tranche (round 5): mergeable sketches (KMV / count-min /
# Bloom join pruning), the Q9/Q21 join shapes, embedding range
# search.  Queued last; admits with the rest when round 6 reopens
# slots.
from .registry_pending4 import PENDING4  # noqa: E402

PENDING.extend(PENDING4)

# Fifth tranche (Q7 cross-nation trade, sweep-line concurrency,
# largest-remainder apportionment, weighted median, chi-square cells,
# Benford audit, basket pair support, linear interpolation).  Queued
# last; admits with the rest when round 6 reopens slots.
from .registry_pending5 import PENDING5  # noqa: E402

PENDING.extend(PENDING5)

# Sixth tranche (round 5): containment dedup, concentration /
# inequality statistics (Gini impurity, Gini coefficient, HHI), CUSUM
# changepoint, user-journey paths, FK-integrity audit, deadline
# funnel, discrete gap quantiles, ABC classification, two-sample KS
# drift, streaming windowed top-k.  Queued last; admits with the rest
# when round 6 reopens slots.
from .registry_pending6 import PENDING6  # noqa: E402

PENDING.extend(PENDING6)

# Seventh tranche (round 5): batch model inference + classifier
# evaluation (logistic scoring, calibration bins, exact AUC).
from .registry_pending7 import PENDING7  # noqa: E402

PENDING.extend(PENDING7)

# Eighth tranche (round 5): attribution, approximate-FD profiling,
# seasonal-naive backtest, discrete survival table, LTV cohort
# triangle.
from .registry_pending8 import PENDING8  # noqa: E402

PENDING.extend(PENDING8)

# Ninth tranche (round 5): the video modality — RIFF/AVI codec
# queries with closed-form oracles, completing the PPM/WAV/AVI set.
# Tranches 1-8 hold 45; all 47 fit round 6's 50 slots, and
# N = 150 + 47 = 197 stays within the 4-round rotation bound (≤ 200).
from .registry_pending9 import PENDING9  # noqa: E402

PENDING.extend(PENDING9)


# --------------------------------------------------------------------------
# Tenth tranche (round 7): SemDeDup as a driver-checked query.  The
# round-7 bound extension (registry._stale_bound: 4 -> 5, cap 250)
# reopens slack, and the round-7 rotation has exactly 47 critically
# stale rows + the 2 never-verified gated queries — one free slot,
# which this entry consumes (pinned by the round-7 drain simulation).
# --------------------------------------------------------------------------

def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semantic_dedup) end to end as a
    hash-checked query: over the planted-clusters fixture
    (registry_ext.planted_clusters — k-means provably converges to the
    planted centers, so cluster = vec_id % 8 and the centroid is the
    normalized per-cluster mean, both closed-form in SQL) plus planted
    EXACT duplicates (1.1x-scaled copies of every 10th vector — same
    direction, cosine 1 after normalization).  At threshold 0.9999
    each copy loses to its original (equal rounded centroid_sim, lower
    id wins), so the kept set is every original with its cluster and
    centroid similarity — the full keeper policy, cluster assignment,
    and centroid arithmetic in one value hash.  Scale shape documented
    on the operator: the only quadratic term is within-CLUSTER, and
    the assignment is materialized before the pair join."""
    from .operators.similarity import kmeans_fit, semantic_dedup
    from .registry_ext import planted_clusters
    from .session import session_memo

    pl = planted_clusters(load_table(spark, sf_dir, "embeddings", fan_out=True))
    copies = pl.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.1).alias("embedding"))
    corpus = pl.unionByName(copies)
    # The model is an ingest-time cost, not a per-query cost (the
    # _ivf_model pattern): fit once per (session, sf) — deterministic,
    # so memoization cannot change the result.
    cents = session_memo(spark, f"semdedup_cents:{sf_dir}",
                         lambda: kmeans_fit(corpus, k=8, n_iter=3))
    return semantic_dedup(corpus, threshold=0.9999, k=8,
                          centroids=cents)


# The oracle restates the fixed point the Spark k-means provably
# reaches on the planted fixture: cluster = vec_id % 8 (seeds 0..7
# cover all planted centers, assignments stable from iteration 1) and
# centroid = l2-normalized per-cluster mean of the normalized vectors
# (kmeans_fit's decimal(32,12)-accumulated mean, mirrored here), then
# applies the identical pair policy over rounded-6dp cosines.
_SEMDEDUP_SQL = """
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), pl AS (
    SELECT vec_id,
           list_transform(e, (x, i) ->
               x / sqrt(list_dot_product(e, e)) * CAST(0.1 AS DOUBLE)
               + CASE WHEN i - 1 = vec_id % 8 THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END) AS v0
    FROM e
), corpus AS (
    SELECT vec_id, v0 FROM pl
    UNION ALL
    SELECT vec_id + 1000000,
           list_transform(v0, x -> x * CAST(1.1 AS DOUBLE))
    FROM pl WHERE vec_id % 10 = 0
), nv AS (
    SELECT vec_id, CAST(vec_id % 1000000 % 8 AS BIGINT) AS cluster,
           list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v
    FROM corpus
), ex AS (
    SELECT cluster, generate_subscripts(v, 1) AS i, unnest(v) AS x
    FROM nv
), dims AS (
    SELECT cluster, i,
           CAST(sum(CAST(x AS DECIMAL(32,12))) AS DOUBLE) / count(*) AS m
    FROM ex GROUP BY cluster, i
), cent AS (
    SELECT cluster, list(m ORDER BY i) AS c0 FROM dims GROUP BY cluster
), centn AS (
    SELECT cluster,
           list_transform(c0, x -> x / sqrt(list_dot_product(c0, c0))) AS c
    FROM cent
), asg AS (
    SELECT nv.vec_id, nv.cluster, nv.v,
           round(list_dot_product(nv.v, centn.c), 6) AS centroid_sim
    FROM nv JOIN centn USING (cluster)
), beaten AS (
    SELECT DISTINCT b.vec_id
    FROM asg x JOIN asg b USING (cluster)
    WHERE x.vec_id != b.vec_id
      AND (x.centroid_sim > b.centroid_sim
           OR (x.centroid_sim = b.centroid_sim AND x.vec_id < b.vec_id))
      AND round(list_dot_product(x.v, b.v), 6) >= CAST(0.9999 AS DOUBLE)
)
SELECT a.vec_id, a.cluster, a.centroid_sim
FROM asg a LEFT JOIN beaten USING (vec_id) WHERE beaten.vec_id IS NULL
"""

PENDING.append(("semantic_dedup", _SEMDEDUP_SQL, _q_semantic_dedup))


def _q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-level boilerplate removal (operators/dedup.
    remove_boilerplate_lines — the CCNet/C4 cleanup step), driver-
    checked over a planted multi-line fixture: every document gains a
    universal copyright footer (boilerplate by any threshold), every
    even document a promo line (boilerplate at min_docs=10), every odd
    document a doc-unique ref line (never boilerplate) — so the
    cleaned text, kept-line and dropped-line counts per document are
    all closed-form.  The hash check covers the census threshold, the
    short-line guard, order-preserving reassembly, and the exact
    cleaned text."""
    from .operators.dedup import remove_boilerplate_lines

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    promo = F.lit("subscribe to our newsletter today")
    uniq = F.concat(F.lit("ref "), F.col("doc_id").cast("string"))
    txt = F.concat_ws(
        "\n", F.col("text"),
        F.when(F.col("doc_id") % 2 == 0, promo).otherwise(uniq),
        F.lit("copyright example corp all rights reserved"))
    return remove_boilerplate_lines(
        docs.select("doc_id", txt.alias("text")),
        min_docs=10, min_chars=4)


_BOILERPLATE_SQL = """
WITH fixed AS (
    SELECT doc_id,
           text || chr(10) ||
           CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter today'
                ELSE 'ref ' || CAST(doc_id AS VARCHAR) END || chr(10) ||
           'copyright example corp all rights reserved' AS text
    FROM documents
), ls AS (
    SELECT doc_id, string_split(text, chr(10)) AS arr FROM fixed
), lines AS (
    SELECT doc_id, generate_subscripts(arr, 1) AS i, unnest(arr) AS ln
    FROM ls
), census AS (
    SELECT lower(trim(ln)) AS key
    FROM lines WHERE length(trim(ln)) >= 4
    GROUP BY 1 HAVING count(DISTINCT doc_id) >= 10
), kept AS (
    SELECT l.doc_id, l.i, l.ln
    FROM lines l LEFT JOIN census c ON lower(trim(l.ln)) = c.key
    WHERE c.key IS NULL
), rebuilt AS (
    SELECT doc_id, string_agg(ln, chr(10) ORDER BY i) AS text_clean,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
), totals AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total
    FROM lines GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(r.text_clean, '') AS text_clean,
       COALESCE(r.n_kept, 0) AS n_kept,
       CAST(t.n_total - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""

PENDING.append(("boilerplate_lines", _BOILERPLATE_SQL,
                _q_boilerplate_lines))


# --------------------------------------------------------------------------
# ROUND-GATED tranche: entries that must NOT be admitted before a
# given round even if slack exists.  Round 6's 50-row budget is
# exactly consumed by the 49-query round-5 backlog plus the
# newly-oracled sketch_cardinality (the round-5 verdict's freeze), so
# anything registered in round 6 would displace a never-verified row.
# --------------------------------------------------------------------------

def _q_lakehouse_incremental_loop(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The full lakehouse loop as one checked query (plans/
    lakehouse_loop): events arrive at a versioned raw table in three
    batches (b = event_id % 3), an exactly-once vtable stream consumes
    them across two availableNow runs, each micro-batch MERGEs
    latest-per-user into a keyed state table, each merge's
    table_changes CDC delta maintains a per-event_type aggregate —
    and the oracle is the BATCH RESTATEMENT of that aggregate, so the
    driver's hash check IS the delta-view-maintenance identity."""
    from .plans.lakehouse_loop import incremental_loop
    ev = load_table(spark, sf_dir, "events") \
        .select("event_id", "user_id", "event_type", "ts")
    # Deterministic per-sf work dir, CLEARED on entry (the tables and
    # stream checkpoint must start fresh each run — resuming an old
    # checkpoint would change the arrival plan): repeated invocations
    # rewrite ONE tree instead of leaking a mkdtemp per call.  Safe to
    # return: the result is a local relation over the collected CDC
    # deltas, independent of the work dir.
    return incremental_loop(spark, ev, _fresh_work_dir("lh_loop", sf_dir))


_LOOP_SQL = """
WITH w AS (
    SELECT user_id, event_type, event_id,
           row_number() OVER (PARTITION BY user_id
               ORDER BY event_id % 3 DESC, epoch_us(ts) DESC,
                        event_id DESC) AS rn
    FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(event_id) AS BIGINT) AS sum_event_id
FROM w WHERE rn = 1
GROUP BY event_type
"""

def _q_vtable_sink_roundtrip(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Native lakehouse streaming I/O end to end, hash-checked: the
    events table becomes a versioned raw table, a `format("vtable")`
    source → `format("vtable")` SINK stream copies it table-to-table
    (executor-side reads, staged-parquet exactly-once writes, txn
    ledger), and the aggregate over the COPY must equal the oracle's
    aggregate over the original — any duplicated, dropped, or
    corrupted row changes the hash."""
    import os

    from .sinks.versioned import read_version, write_version
    from .sources.vtable_stream_source import register_vtable

    register_vtable(spark)
    # Deterministic per-sf work dir, cleared on entry (fresh tables +
    # checkpoint each run; one bounded tree across bench/driver runs).
    # The dir must outlive this call — the returned aggregate lazily
    # reads the copied table — so the NEXT invocation clears it.
    work = _fresh_work_dir("vsink_rt", sf_dir)
    src, dst = os.path.join(work, "src"), os.path.join(work, "dst")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"))
    write_version(ev, src)
    q = (spark.readStream.format("vtable").option("path", src).load()
         .writeStream.format("vtable").option("path", dst)
         .option("checkpointLocation", os.path.join(work, "ckpt"))
         .trigger(availableNow=True)
         .start())
    try:
        assert q.awaitTermination(300), "vtable roundtrip stream hung"
    finally:
        if q.isActive:
            q.stop()
    return (read_version(spark, dst)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.countDistinct("user_id").cast("bigint")
                 .alias("n_users"),
                 F.sum("event_id").cast("bigint").alias("sum_event_id"),
                 F.sum("ts_us").cast("bigint").alias("sum_ts_us")))


_VSINK_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(event_id) AS BIGINT) AS sum_event_id,
       CAST(sum(epoch_us(ts)) AS BIGINT) AS sum_ts_us
FROM events GROUP BY event_type
"""

# (earliest admission round, name, oracle_sql, fn)
PENDING_GATED: list[tuple[int, str, str,
                          Callable[[SparkSession, str], DataFrame]]] = [
    (7, "lakehouse_incremental_loop", _LOOP_SQL,
     _q_lakehouse_incremental_loop),
    (7, "vtable_sink_roundtrip", _VSINK_SQL, _q_vtable_sink_roundtrip),
]

# Tenth tranche (authored round 9, gated to round 10 — the round-9
# budget is exactly full, so these must not displace its rotation;
# the round-10 slack is 5*50 - 201 = 49 and the drain simulation in
# tests/test_pending_r10.py covers the admission).
from .registry_pending10 import PENDING10_GATED  # noqa: E402

PENDING_GATED.extend(PENDING10_GATED)

# Eleventh tranche (authored round 10, gated to round 11 — the
# round-10 budget already carries the five split/PNG admissions, so
# these must not displace that rotation; the round-11 slack is
# 5*50 - 211 = 39 and the drain simulation in
# tests/test_pending_r11.py covers the admission).
from .registry_pending11 import PENDING11_GATED  # noqa: E402

PENDING_GATED.extend(PENDING11_GATED)

# Twelfth tranche (authored round 11, gated to round 12 — the
# round-11 budget carries the five governance admissions, so these
# must not displace that rotation; the round-12 slack is
# 5*50 - 216 = 34 and the drain simulation in
# tests/test_pending_r12.py covers the admission).
from .registry_pending12 import PENDING12_GATED  # noqa: E402

PENDING_GATED.extend(PENDING12_GATED)

# Thirteenth tranche (authored round 11, gated to round 13 — one
# tranche unlocks per round so no admission can displace the previous
# rotation; the round-13 slack is 5*50 - 221 = 29 and the drain
# simulation in tests/test_pending_r13.py covers the admission).
from .registry_pending13 import PENDING13_GATED  # noqa: E402

PENDING_GATED.extend(PENDING13_GATED)


def admit(registry: dict, slack: int,
          register_fn: Callable[[str, str | None], Callable],
          current_round: int | None = None) -> list[str]:
    """Register up to ``slack`` pending queries, in list order.

    ``registry._load_extensions`` computes the slack: zero-displacement
    in round 4 (the round-3 verdict pinned that round's budget), then
    bounded by N ≤ 3·budget — the registry size at which the LRU
    rotation still re-verifies every query within 3 rounds.  Each
    admitted query consumes one slot.  Returns the admitted names
    (idempotent: an admitted query is skipped by the ``in registry``
    check on later calls).

    ``current_round`` additionally unlocks ``PENDING_GATED`` entries
    whose earliest admission round has arrived; without it (older
    callers, unit harnesses) gated entries stay queued."""
    candidates = list(PENDING)
    for min_round, name, sql, fn in PENDING_GATED:
        if current_round is not None and current_round >= min_round:
            candidates.append((name, sql, fn))
    admitted: list[str] = []
    for name, sql, fn in candidates:
        if slack <= 0:
            break
        if name in registry:
            continue
        register_fn(name, sql)(fn)
        admitted.append(name)
        slack -= 1
    return admitted
