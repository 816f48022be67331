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
    load_table(spark, sf_dir, "lineitem") \
        .createOrReplaceTempView("__q17_lineitem")
    load_table(spark, sf_dir, "part") \
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
    load_table(spark, sf_dir, "orders") \
        .createOrReplaceTempView("__qex_orders")
    load_table(spark, sf_dir, "lineitem") \
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
    load_table(spark, sf_dir, "part") \
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
]


def admit(registry: dict, verified: set[str],
          register_fn: Callable[[str, str | None], Callable]) -> list[str]:
    """Register pending queries up to the driver's row budget.

    ``slack`` = budget minus the queries already awaiting verification;
    each admitted query consumes one slot.  Returns the admitted names
    (idempotent: an admitted query is unverified, so a second call
    computes slack 0 for it and skips it via the ``in registry``
    check)."""
    slack = DRIVER_ROW_BUDGET - sum(1 for n in registry
                                    if n not in verified)
    admitted: list[str] = []
    for name, sql, fn in PENDING:
        if slack <= 0:
            break
        if name in registry:
            continue
        register_fn(name, sql)(fn)
        admitted.append(name)
        slack -= 1
    return admitted
