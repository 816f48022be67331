"""Fifth tranche of round-budget-deferred queries (round 5; queued
behind the fourth tranche — see ``registry_pending`` for the admission
protocol; nothing here registers before the round-6 slot reopening).

Families:

* **TPC-H Q7 shape** generalized: cross-nation trade volume by
  (supplier nation, customer nation, year) — the canonical
  "two-sided dimension resolution on one fact row" join.
* **Interval analytics**: per-day maximum session concurrency via the
  sweep-line (+1/-1 running sum) — the O(n log n) answer to "how many
  users were active at once", partitioned by day so the sweep
  parallelizes.
* **Integer apportionment** (largest-remainder / Hamilton method):
  distribute a fixed number of sample slots across nations
  proportional to revenue — THE statistics-bureau allocation
  primitive, and a pure-integer query (div/mod/rank), so parity with
  the oracle is arithmetic identity, not float luck.
* **Weighted median** per group via the cumulative-weight window —
  the order statistic ``percentile`` cannot weight.
* **Contingency-table residuals** (chi-square cells) for
  event-type × ISO-weekday independence — per-cell expected counts
  and standardized residuals from window marginals over the tiny
  aggregated frame.
* **Benford first-digit audit** of order totals — the classic
  anomaly screen; expected shares are 6-dp literals on BOTH engines
  (log10 is not required to be correctly rounded, so it never runs
  at query time).
* **Market-basket pair support**: co-purchased part pairs from
  in-row combination generation (collect_set → pair explode) —
  bounded by basket size, never a fact-fact self-join.
* **Linear-interpolation resampling** of the event feed onto a 3-hour
  grid — the missing twin of ``events_resample_locf`` (LOCF carries,
  this one interpolates inside each known segment).

Float discipline (tranche-1 rules): money goes through the exact
``CAST(x AS DECIMAL(32,6))`` lift (2-dp inputs, so the 6-dp decimal
cast is exact, not rounding) and integer cents where arithmetic must
be bit-identical; ratios/residuals use IEEE-exact op chains (single
divisions, correctly-rounded sqrt) written in the same textual order
on both engines, rounded to 6 dp; tie-breaks go through unique keys.

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

# Exact integer cents from a 2-dp money double: the 6-dp decimal cast
# is exact (established tranche-1 idiom), *100 stays in decimal, the
# bigint cast is then integer-exact on both engines.
_CENTS_SQL = "CAST(CAST({col} AS DECIMAL(32,6)) * 100 AS BIGINT)"


def _cents(col: str):
    return (F.col(col).cast(_DEC) * 100).cast("bigint")


# --------------------------------------------------------------------------
# TPC-H Q7 shape: cross-nation trade volume
# --------------------------------------------------------------------------

_Q7_SQL = """
SELECT n2.n_name AS supp_nation,
       n1.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(round(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(32,6))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE c.c_nationkey <> s.s_nationkey
GROUP BY n2.n_name, n1.n_name, year(l.l_shipdate)
"""


def _q_nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape, generalized to every cross-nation pair: revenue
    shipped from supplier nation to customer nation per year.  ONE
    fact-fact shuffle (lineitem ⋈ orders on orderkey); customer,
    supplier, and both nation role-copies are broadcast, so the
    two-sided nation resolution costs no extra exchange.  The final
    groupBy is map-side combinable onto ≤ |nations|²·|years| groups —
    at 100 TB the reduce side is a few thousand rows regardless of
    fact size.  (Classic Q7 pins two nations; keeping every pair makes
    the result non-degenerate at every test SF.)"""
    li = load_table(spark, sf_dir, "lineitem", fan_out=False)
    o = load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .filter(F.col("c_nationkey") != F.col("s_nationkey"))
         .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
         .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")))
    rev = F.sum((F.col("l_extendedprice")
                 * (F.lit(1) - F.col("l_discount"))).cast(_DEC))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("bigint").alias("l_year"))
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(rev, 2).cast("double").alias("revenue")))


# --------------------------------------------------------------------------
# Sweep-line: per-day maximum session concurrency
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000

_CONCUR_SQL = f"""
WITH ev AS (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
), iv AS (
    SELECT user_id, us // {_DAY_US} AS day,
           min(us) AS s, max(us) AS e
    FROM ev GROUP BY user_id, us // {_DAY_US}
), pts AS (
    SELECT day, s AS t, 1 AS delta, user_id FROM iv
    UNION ALL
    SELECT day, e AS t, -1 AS delta, user_id FROM iv
), sw AS (
    SELECT day, delta,
           sum(delta) OVER (PARTITION BY day
                            ORDER BY t, delta DESC, user_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS conc
    FROM pts
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(max(conc) AS BIGINT) AS max_concurrent,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sessions
FROM sw GROUP BY day
"""


def _q_max_concurrent_sessions(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Maximum simultaneous active user-sessions per day, by the
    sweep line: each user-day span [first event, last event] becomes
    a +1 start point and a −1 end point; a running sum ordered by
    (time, starts-before-ends, user) is the concurrency curve and its
    max the answer.  All integers — parity is exact.  Scale: the
    sweep window is PARTITIONED BY day, so each day's sweep is an
    independent partition (no global single-partition sort); interval
    extraction is one map-side-combinable groupBy.  The tie order is
    total (user_id is unique within a day-side), so the running sum
    is deterministic; equal-delta swaps cannot change prefix values
    anyway."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select("user_id", F.unix_micros("ts").alias("us"))
    iv = (ev.withColumn("day", F.expr(f"us div {_DAY_US}"))
          .groupBy("user_id", "day")
          .agg(F.min("us").alias("s"), F.max("us").alias("e")))
    pts = (iv.select("day", F.col("s").alias("t"),
                     F.lit(1).alias("delta"), "user_id")
           .unionByName(
               iv.select("day", F.col("e").alias("t"),
                         F.lit(-1).alias("delta"), "user_id")))
    w = (Window.partitionBy("day")
         .orderBy(F.col("t").asc(), F.col("delta").desc(),
                  F.col("user_id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sw = pts.withColumn("conc", F.sum("delta").over(w))
    return (sw.groupBy(F.col("day").cast("bigint").alias("day"))
            .agg(F.max("conc").cast("bigint").alias("max_concurrent"),
                 F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
                 .cast("bigint").alias("n_sessions")))


# --------------------------------------------------------------------------
# Largest-remainder (Hamilton) apportionment of sample slots
# --------------------------------------------------------------------------

_SEATS = 10_000

_APPORTION_SQL = f"""
WITH rev AS (
    SELECT n.n_nationkey, n.n_name,
           SUM({_CENTS_SQL.format(col='l.l_extendedprice')}) AS cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_nationkey, n.n_name
), q AS (
    SELECT n_nationkey, n_name, cents,
           ({_SEATS} * cents) // sum(cents) OVER () AS base,
           ({_SEATS} * cents) % sum(cents) OVER () AS rem
    FROM rev
), r AS (
    SELECT n_nationkey, n_name, cents, base,
           row_number() OVER (ORDER BY rem DESC, n_nationkey) AS rk,
           {_SEATS} - sum(base) OVER () AS leftover
    FROM q
)
SELECT n_name AS nation,
       CAST(cents AS BIGINT) AS rev_cents,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS slots
FROM r
"""


def _q_revenue_apportionment(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment: split {_SEATS} sample slots
    across nations proportional to customer-side revenue.  Everything
    after the revenue rollup is INTEGER arithmetic — quota numerator
    ``seats·cents``, floor-div base, mod remainder, remainder-ranked
    bonus — so the result is bit-identical on any engine (the whole
    point of doing apportionment in integers; float quotas misallocate
    seats).  Scale: one fact rollup (map-side combinable onto
    |nations| groups); the windows run over the 25-row nation frame.
    Overflow headroom: seats·total-cents fits bigint through ~10⁵ ×
    world-revenue; lift to DECIMAL(38,0) beyond."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=False)
    o = load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    rev = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(n),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("n_nationkey", "n_name")
           .agg(F.sum(_cents("l_extendedprice")).alias("cents")))
    wall = Window.partitionBy()
    q = (rev.withColumn("num", F.lit(_SEATS) * F.col("cents"))
         .withColumn("total", F.sum("cents").over(wall))
         .withColumn("base", F.expr("num div total"))
         .withColumn("rem", F.col("num") % F.col("total")))
    r = (q.withColumn("rk", F.row_number().over(
            Window.orderBy(F.desc("rem"), F.asc("n_nationkey"))))
         .withColumn("leftover",
                     F.lit(_SEATS) - F.sum("base").over(wall)))
    return r.select(
        F.col("n_name").alias("nation"),
        F.col("cents").cast("bigint").alias("rev_cents"),
        (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1)
         .otherwise(0)).cast("bigint").alias("slots"))


# --------------------------------------------------------------------------
# Weighted median per group (cumulative-weight window)
# --------------------------------------------------------------------------

_WMEDIAN_SQL = f"""
WITH v AS (
    SELECT l_returnflag,
           {_CENTS_SQL.format(col='l_extendedprice')} AS cents,
           CAST(l_quantity AS BIGINT) AS w
    FROM lineitem
), g AS (
    SELECT l_returnflag, cents, sum(w) AS w
    FROM v GROUP BY l_returnflag, cents
), c AS (
    SELECT l_returnflag, cents,
           sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cw,
           sum(w) OVER (PARTITION BY l_returnflag) AS tw
    FROM g
)
SELECT l_returnflag,
       CAST(min(CASE WHEN 2 * cw >= tw THEN cents END) AS BIGINT)
           AS weighted_median_cents,
       CAST(max(tw) AS BIGINT) AS total_weight
FROM c GROUP BY l_returnflag
"""


def _q_weighted_median_value(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per return flag: the
    smallest value whose cumulative weight reaches half the total —
    the order statistic ``percentile``/``median`` cannot weight.
    Values are exact integer cents and weights integer quantities, so
    the cumulative compare ``2·cw ≥ tw`` is integer-exact parity.
    Scale: pre-aggregating to (group, value) makes the window input
    |distinct values| per group (and makes the ROWS frame
    deterministic — one row per value); one shuffle for the groupBy,
    one for the per-group window."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select("l_returnflag", _cents("l_extendedprice").alias("cents"),
                  F.col("l_quantity").cast("bigint").alias("w"))
    g = v.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("w"))
    wc = (Window.partitionBy("l_returnflag").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy("l_returnflag")
    c = g.select("l_returnflag", "cents",
                 F.sum("w").over(wc).alias("cw"),
                 F.sum("w").over(wt).alias("tw"))
    return (c.groupBy("l_returnflag")
            .agg(F.min(F.when(2 * F.col("cw") >= F.col("tw"),
                              F.col("cents")))
                 .cast("bigint").alias("weighted_median_cents"),
                 F.max("tw").cast("bigint").alias("total_weight")))


# --------------------------------------------------------------------------
# Chi-square contingency cells: event type x ISO weekday
# --------------------------------------------------------------------------

_CHISQ_SQL = """
WITH cell AS (
    SELECT event_type,
           CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
           count(*) AS o
    FROM events GROUP BY event_type, CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT)
), m AS (
    SELECT event_type, dow, o,
           sum(o) OVER (PARTITION BY event_type) AS r,
           sum(o) OVER (PARTITION BY dow) AS c,
           sum(o) OVER () AS g
    FROM cell
)
SELECT event_type, dow,
       CAST(o AS BIGINT) AS observed,
       round(CAST(r * c AS DOUBLE) / CAST(g AS DOUBLE), 6) AS expected,
       round((CAST(o AS DOUBLE) - CAST(r * c AS DOUBLE) / CAST(g AS DOUBLE))
             / sqrt(CAST(r * c AS DOUBLE) / CAST(g AS DOUBLE)), 6)
           AS residual
FROM m
"""


def _q_event_chisq_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independence screen for event-type × ISO-weekday: per-cell
    expected count under independence (row·col/grand) and the
    standardized residual (o−e)/√e — the per-cell evidence a χ²
    test sums.  Emitted per cell rather than as the χ² scalar so
    every number is an IEEE-exact op chain (integer marginal
    products, one division, correctly-rounded sqrt, one more
    division) — an unordered float SUM across cells would not be
    bit-reproducible, per-cell values are.  Scale: ONE map-side
    combinable groupBy onto |types|·7 cells; the marginal windows run
    over that tiny aggregated frame, not the fact table.  ISO weekday
    = Spark ``weekday()+1`` ≡ DuckDB ``isodow`` (the engines' default
    dayofweek numberings disagree — established idiom from
    events_dow_profile)."""
    e = load_table(spark, sf_dir, "events")
    cell = (e.groupBy("event_type",
                      (F.weekday("ts") + F.lit(1)).cast("bigint")
                      .alias("dow"))
            .agg(F.count(F.lit(1)).alias("o")))
    m = cell.select(
        "event_type", "dow", "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("dow")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("g"))
    e_exp = (F.col("r") * F.col("c")).cast("double") \
        / F.col("g").cast("double")
    return m.select(
        "event_type", "dow",
        F.col("o").cast("bigint").alias("observed"),
        F.round(e_exp, 6).alias("expected"),
        F.round((F.col("o").cast("double") - e_exp) / F.sqrt(e_exp), 6)
         .alias("residual"))


# --------------------------------------------------------------------------
# Benford first-digit audit of order totals
# --------------------------------------------------------------------------

# log10(1 + 1/d) to 6 dp — literals on BOTH engines (libm log10 is not
# required to be correctly rounded, so it never runs at query time).
_BENFORD_P = {1: 0.301030, 2: 0.176091, 3: 0.124939, 4: 0.096910,
              5: 0.079181, 6: 0.066947, 7: 0.057992, 8: 0.051153,
              9: 0.045757}

_BENFORD_SQL = f"""
WITH c AS (
    SELECT {_CENTS_SQL.format(col='o_totalprice')} AS cents
    FROM orders WHERE o_totalprice > 0
), d AS (
    SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           count(*) AS n
    FROM c GROUP BY CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
), t AS (
    SELECT digit, n, sum(n) OVER () AS total FROM d
)
SELECT t.digit,
       CAST(t.n AS BIGINT) AS n_orders,
       round(CAST(t.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share,
       CAST(b.p AS DOUBLE) AS benford_p,
       round(CAST(t.n AS DOUBLE) / CAST(t.total AS DOUBLE)
             - CAST(b.p AS DOUBLE), 6) AS delta
FROM t
JOIN (VALUES {', '.join(f'({d}, {p})' for d, p in _BENFORD_P.items())})
     AS b(digit, p) ON t.digit = b.digit
"""


def _q_benford_digit_audit(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: observed share of each
    leading significant digit vs the Benford expectation — the
    classic fabricated-data audit.  The leading digit comes from the
    STRING head of the exact integer cents (invariant under the ×100
    power-of-10 lift; no log10 at query time — expected shares are
    6-dp literals identical on both engines, and bigint→string
    rendering is engine-portable).  Scale: one map-side combinable
    groupBy onto 9 digits; the share window runs over the 9-row
    frame; the expectation table is a broadcast LocalTableScan."""
    o = load_table(spark, sf_dir, "orders", fan_out=False)
    bf = spark.createDataFrame(
        sorted(_BENFORD_P.items()), "digit bigint, benford_p double")
    d = (o.filter(F.col("o_totalprice") > 0)
         .select(_cents("o_totalprice").alias("cents"))
         .select(F.substring(F.col("cents").cast("string"), 1, 1)
                 .cast("bigint").alias("digit"))
         .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    t = d.withColumn("total", F.sum("n").over(Window.partitionBy()))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    return (t.join(F.broadcast(bf), "digit")
            .select("digit",
                    F.col("n").cast("bigint").alias("n_orders"),
                    F.round(share, 6).alias("share"),
                    "benford_p",
                    F.round(share - F.col("benford_p"), 6)
                    .alias("delta")))


# --------------------------------------------------------------------------
# Market-basket pair support (in-row combination generation)
# --------------------------------------------------------------------------

_MIN_SUPPORT = 3

_BASKET_SQL = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), p AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS n
    FROM li a
    JOIN li b ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
)
SELECT CAST(part_a AS BIGINT) AS part_a,
       CAST(part_b AS BIGINT) AS part_b,
       CAST(n AS BIGINT) AS support
FROM p WHERE n >= {_MIN_SUPPORT}
"""


def _q_basket_pair_support(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Frequent co-purchased part pairs (the A-Priori L2 pass):
    support = number of orders containing both parts, threshold
    {_MIN_SUPPORT}.  Spark generates pairs IN-ROW: collect_set per
    order (dedups for free), sort, nested-transform the C(k,2)
    combinations, explode — work is bounded by basket-size², never
    the |lineitem|² a fact-fact self-join risks, and the orderkey
    groupBy is the only fact shuffle (the pair groupBy moves ≤
    Σ C(k,2) rows, map-side combinable).  The oracle states the same
    relation as the naive equi-self-join — result equality proves the
    in-row rewrite."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=False)
    baskets = (li.groupBy("l_orderkey")
               .agg(F.sort_array(F.collect_set("l_partkey"))
                    .alias("parts")))
    pairs = baskets.filter(F.size("parts") >= 2).select(
        F.explode(F.flatten(F.transform(
            F.sequence(F.lit(1), F.size("parts") - 1),
            lambda i: F.transform(
                F.slice(F.col("parts"), i + 1,
                        F.size("parts") - i),
                lambda x: F.struct(
                    F.element_at(F.col("parts"), i).alias("part_a"),
                    x.alias("part_b")))))).alias("pr"))
    return (pairs.select(F.col("pr.part_a").cast("bigint").alias("part_a"),
                         F.col("pr.part_b").cast("bigint").alias("part_b"))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
            .filter(F.col("support") >= _MIN_SUPPORT))


# --------------------------------------------------------------------------
# Linear-interpolation resampling onto a 3-hour grid
# --------------------------------------------------------------------------

_INTERP_STEP = 10_800_000_000  # 3 h in microseconds

_INTERP_SQL = f"""
WITH ev AS (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           value, event_id
    FROM events
), evu AS (
    SELECT user_id, us, arg_max(value, event_id) AS v
    FROM ev GROUP BY user_id, us
), seg AS (
    SELECT user_id, us, v,
           lead(us) OVER (PARTITION BY user_id ORDER BY us) AS next_us,
           lead(v) OVER (PARTITION BY user_id ORDER BY us) AS next_v
    FROM evu
), spans AS (
    SELECT user_id,
           (min(us) + {_INTERP_STEP} - 1) // {_INTERP_STEP} AS g0,
           max(us) // {_INTERP_STEP} AS g1
    FROM evu GROUP BY user_id
), grid AS (
    SELECT user_id,
           unnest(generate_series(g0, g1)) * {_INTERP_STEP} AS grid_us
    FROM spans WHERE g1 >= g0
)
SELECT g.user_id, g.grid_us,
       s.us AS prev_us, s.next_us,
       round(s.v + (s.next_v - s.v)
             * (CAST(g.grid_us - s.us AS DOUBLE)
                / CAST(s.next_us - s.us AS DOUBLE)), 6) AS value_interp
FROM grid g
JOIN seg s ON g.user_id = s.user_id
          AND g.grid_us >= s.us AND g.grid_us < s.next_us
"""


def _q_events_interpolate_linear(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Time-series resampling with LINEAR interpolation onto a
    3-hour grid — ``events_resample_locf``'s missing twin: each grid
    point inside a known segment [pᵢ, pᵢ₊₁) gets
    vᵢ + (vᵢ₊₁−vᵢ)·(t−tᵢ)/(tᵢ₊₁−tᵢ).  Spark composes it from the
    as-of join: a lead() window turns the deduplicated feed into
    segments carrying their own next-point, the backward non-strict
    asof lands every grid point on its segment start, and the
    ``grid < next_us`` filter closes the half-open interval — one
    shuffle for the segments, one inside the asof, NO range join (a
    range join on Spark degenerates to broadcast-nested-loop; the
    oracle states the range-join semantics and equality proves the
    asof rewrite).  Timestamp deltas fit doubles exactly (< 2⁵³ µs),
    so the interpolation is the same single-rounding op chain on
    both engines."""
    from .operators.joins import asof_join

    step = _INTERP_STEP
    e = load_table(spark, sf_dir, "events")
    ev = e.select("user_id", F.unix_micros("ts").alias("us"),
                  "value", "event_id")
    evu = ev.groupBy("user_id", "us").agg(
        F.max_by("value", "event_id").alias("v"))
    wl = Window.partitionBy("user_id").orderBy("us")
    seg = evu.select("user_id", "us", "v",
                     F.lead("us").over(wl).alias("next_us"),
                     F.lead("v").over(wl).alias("next_v"))
    spans = evu.groupBy("user_id").agg(
        F.expr(f"(min(us) + {step} - 1) div {step}").alias("g0"),
        F.expr(f"max(us) div {step}").alias("g1"))
    grid = (spans.filter(F.col("g1") >= F.col("g0"))
            .select("user_id",
                    F.explode(F.sequence("g0", "g1")).alias("__g"))
            .select("user_id", (F.col("__g") * step).alias("grid_us")))
    out = asof_join(grid, seg, ["user_id"], left_ts="grid_us",
                    right_ts="us", right_vals=["v", "next_us", "next_v"],
                    strict=False)
    frac = (F.col("grid_us") - F.col("matched_ts")).cast("double") \
        / (F.col("next_us") - F.col("matched_ts")).cast("double")
    return (out.filter(F.col("grid_us") < F.col("next_us"))
            .select("user_id", "grid_us",
                    F.col("matched_ts").alias("prev_us"), "next_us",
                    F.round(F.col("v")
                            + (F.col("next_v") - F.col("v")) * frac, 6)
                    .alias("value_interp")))


# --------------------------------------------------------------------------
# Rolling 7-day Pearson correlation of daily click vs purchase volume
# --------------------------------------------------------------------------

_CORR_WIN = 6  # RANGE 6 preceding + current day = 7-day trailing window

_ROLLCORR_SQL = f"""
WITH daily AS (
    SELECT epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US} AS day,
           sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US}
), m AS (
    SELECT day, x, y,
           count(*) OVER w AS n,
           sum(x) OVER w AS sx,   sum(y) OVER w AS sy,
           sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
           sum(x * y) OVER w AS sxy
    FROM daily
    WINDOW w AS (ORDER BY day
                 RANGE BETWEEN {_CORR_WIN} PRECEDING AND CURRENT ROW)
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(x AS BIGINT) AS n_clicks,
       CAST(y AS BIGINT) AS n_purchases,
       CAST(n AS BIGINT) AS n_days,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
            END AS corr_7d
FROM m
"""


def _q_rolling_corr_counts_7d(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Trailing 7-day Pearson correlation between daily click volume
    and daily purchase volume — the co-movement monitor behind
    "are purchases tracking traffic this week?".  Formulated on
    integer daily COUNTS so every moment (Σx, Σx², Σxy over the
    frame) is exact bigint arithmetic; only the final
    (nΣxy−ΣxΣy)/(√(nΣxx−Σx²)·√(nΣyy−Σy²)) chain touches floats —
    integer casts, two correctly-rounded sqrts, one multiply, one
    divide, identical textual order on both engines.  Zero-variance
    frames yield NULL via an INTEGER guard (never a float compare).
    The frame is RANGE over the integer day index, so calendar gaps
    shorten the window instead of silently stretching it.  Scale:
    one map-side combinable groupBy collapses the fact table to
    |days| rows; the window runs over that tiny frame (partition by
    coarser calendar units — month — if |days| ever mattered)."""
    e = load_table(spark, sf_dir, "events") \
        .filter(F.col("event_type").isin("click", "purchase"))
    daily = (e.select(F.expr(f"unix_micros(ts) div {_DAY_US}")
                      .alias("day"), "event_type")
             .groupBy("day")
             .agg(F.sum(F.when(F.col("event_type") == "click", 1)
                        .otherwise(0)).alias("x"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("y")))
    w = (Window.orderBy("day")
         .rangeBetween(-_CORR_WIN, Window.currentRow))
    m = daily.select(
        "day", "x", "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"))
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("day").cast("bigint").alias("day"),
        F.col("x").cast("bigint").alias("n_clicks"),
        F.col("y").cast("bigint").alias("n_purchases"),
        F.col("n").cast("bigint").alias("n_days"),
        F.when((varx_n > 0) & (vary_n > 0),
               F.round(cov_n.cast("double")
                       / (F.sqrt(varx_n.cast("double"))
                          * F.sqrt(vary_n.cast("double"))), 6))
        .alias("corr_7d"))


PENDING5: list[tuple[str, str,
                     Callable[[SparkSession, str], DataFrame]]] = [
    ("nation_pair_trade", _Q7_SQL, _q_nation_pair_trade),
    ("max_concurrent_sessions", _CONCUR_SQL, _q_max_concurrent_sessions),
    ("revenue_apportionment", _APPORTION_SQL, _q_revenue_apportionment),
    ("weighted_median_value", _WMEDIAN_SQL, _q_weighted_median_value),
    ("event_chisq_cells", _CHISQ_SQL, _q_event_chisq_cells),
    ("benford_digit_audit", _BENFORD_SQL, _q_benford_digit_audit),
    ("basket_pair_support", _BASKET_SQL, _q_basket_pair_support),
    ("events_interpolate_linear", _INTERP_SQL,
     _q_events_interpolate_linear),
    ("rolling_corr_counts_7d", _ROLLCORR_SQL,
     _q_rolling_corr_counts_7d),
]
