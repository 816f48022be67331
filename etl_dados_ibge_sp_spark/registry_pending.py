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
