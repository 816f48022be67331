"""Thirteenth pending tranche (authored round 11, gated to round 13):
the NUMERICS family — the second-order statistics a data platform
ships once the first-order censuses (tranches 11/12) exist, every one
in the repo's exact-arithmetic discipline (integer/decimal
accumulation, ONE final correctly-rounded double per reported value —
the HHI precedent, registry_pending6.py:561).

* **scaled-integer covariance** — the whitening/PCA-prep matrix over
  the embedding coordinates.  Cross-row float sums are NOT
  order-stable across partitions (the one arithmetic class a
  hash-oracle cannot tolerate), so coordinates are scaled to exact
  BIGINT (round(x * 1e6)) first and the moment sums accumulate in
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); the covariance appears
  only in the final division chain.
* **daily autocorrelation** — lag-1..7 autocorrelation of the daily
  event counts (the seasonality detector behind the dow profile).
  The textbook estimator divides by the mean twice; multiplying
  through by n² keeps numerator and denominator exact integers:
  r_k = [n²·ΣP_k − n·S·(A_k+B_k) + p_k·S²] / [n·(n·Q − S²)].
* **Poisson bootstrap CI** — the resampling technique that actually
  works at 100 TB (per-row independent Poisson(1) weights — no
  global multinomial draw, no rand()): 32 deterministic resamples of
  total order revenue, each weight derived from the engine-portable
  md5 hash ring against literal Poisson-CDF thresholds, so every
  engine draws the identical "random" weights.
* **epoch mix schedule** — the per-(source, epoch) token table a
  training run actually consumes, derived from tranche 12's
  epoch/repeat budget: epoch e serves
  clamp(alloc − (e−1)·unique, 0, unique) tokens, exactly.
* **QI generalization ladder** — the privacy-engineering follow-up
  to the k-anonymity audit: the SAME corpus censused at four
  successive quasi-identifier generalizations (finer/coarser length
  buckets, language kept/dropped), reporting per level how many
  classes and documents still sit below k = 5 — the table that says
  WHICH generalization first clears the bar.

Scale shape: one scan per query; the covariance explode is a
constant d(d+1)/2 = 2080-cell fanout whose sums combine map-side, so
the shuffle carries 2080 cells per partition, never rows; the
autocorrelation and bootstrap land on ≤ 7 and 32 cells; the ladder is
a ×4 in-row fanout onto QI grids.  No joins against data-scaled
sides anywhere (stat frames are 1-row broadcasts; the ladder and
schedule join nothing).

Deferral contract (same as every tranche): full DuckDB oracles now,
pytest parity from day one (tests/test_pending_r13.py), admission
when `registry_pending.admit` unlocks round-13 gated entries — at
round 13 the registry sits at 221 and the slack is 5*50 - 221 = 29;
the drain simulation in tests/test_pending_r13.py proves the 5-round
staleness bound survives the admission.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry_pending12 import _EPOCH_SQL, _q_epoch_repeat_budget
from .sources.parquet_source import load_table

_DAY_US = 86_400_000_000
_D = 64           # embedding dimensionality (fixture schema)
_SCALE = 1_000_000  # coordinate scaling: exact in BIGINT
_B = 32           # bootstrap resamples
_RING = 1_000_000  # hash ring size (operators/sample.N_BUCKETS)

# Poisson(1) CDF thresholds on the hash ring, as exact integer
# literals shared by BOTH engines (computed once here; embedding the
# same constants in the Spark plan and the SQL string is what makes
# the "random" weights engine-identical).  Tail truncated at w=5:
# P(W>5) ≈ 5.9e-4 of the ring.
_POISSON_CDF = []
_acc = 0.0
for _w in range(5):
    _acc += math.exp(-1.0) / math.factorial(_w)
    _POISSON_CDF.append(round(_acc * _RING))


def _poisson_weight(bucket):
    """Weight column from a ring bucket via the literal CDF."""
    w = F.lit(5)
    for i in range(len(_POISSON_CDF) - 1, -1, -1):
        w = F.when(bucket < _POISSON_CDF[i], F.lit(i)).otherwise(w)
    return w.cast("bigint")


def _poisson_weight_sql(bucket_sql: str) -> str:
    cases = " ".join(
        f"WHEN {bucket_sql} < {t} THEN {i}"
        for i, t in enumerate(_POISSON_CDF))
    return f"CAST(CASE {cases} ELSE 5 END AS BIGINT)"


# --------------------------------------------------------------------------
# Scaled-integer covariance of the embedding coordinates
# --------------------------------------------------------------------------

def _q_embed_covariance_scaled(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding coordinates
    in scaled-integer arithmetic.  Each coordinate becomes
    round(x·1e6) as BIGINT; per (i, j) cell the sums Σqᵢ, Σqⱼ, Σqᵢqⱼ
    accumulate exactly (DECIMAL(38,0) — order-independent, unlike
    float sums), and the sample covariance
    (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / (n·(n−1)) / 1e12 is one final division
    chain.  The d(d+1)/2-cell explode is a CONSTANT fanout whose
    partial aggregation combines map-side — the shuffle carries 2080
    cells per partition, never vectors.  (At extreme scale the same
    sums can be produced per-partition as a numpy Gram matrix under
    mapInPandas; the DataFrame shape keeps the whole plan in
    codegen.)"""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = emb.select(
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * F.lit(float(_SCALE)))
                    .cast("bigint")).alias("q"))
    c1 = q.select(F.posexplode("q").alias("i", "qi"), "q")
    cells = (c1.select(
        "i", "qi",
        F.posexplode(F.slice("q", F.col("i") + 1, F.lit(_D)))
         .alias("jj", "qj"))
        .select(F.col("i").cast("bigint").alias("i"),
                (F.col("i") + F.col("jj")).cast("bigint").alias("j"),
                "qi", "qj"))
    agg = cells.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("qi").cast("decimal(38,0)")).alias("si"),
        F.sum(F.col("qj").cast("decimal(38,0)")).alias("sj"),
        F.sum((F.col("qi") * F.col("qj")).cast("decimal(38,0)"))
         .alias("sij"))
    numer = (F.col("n").cast("decimal(38,0)") * F.col("sij")
             - F.col("si") * F.col("sj"))
    cov = F.round(
        numer.cast("double") / F.col("n").cast("double")
        / (F.col("n") - 1).cast("double") / F.lit(1.0e12), 9)
    return agg.select("i", "j", F.col("n").alias("n_vecs"),
                      cov.alias("cov"))


_COV_SQL = f"""
WITH q AS (
    SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}.0)
                         AS BIGINT)) AS q
    FROM embeddings
), cells AS (
    SELECT CAST(i.i AS BIGINT) AS i, CAST(j.j AS BIGINT) AS j,
           q.q[i.i + 1] AS qi, q.q[j.j + 1] AS qj
    FROM q, generate_series(0, {_D - 1}) i(i),
         generate_series(0, {_D - 1}) j(j)
    WHERE j.j >= i.i
)
SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       round(CAST(COUNT(*) * SUM(CAST(qi AS HUGEINT) * qj)
                  - SUM(CAST(qi AS HUGEINT)) * SUM(CAST(qj AS HUGEINT))
                  AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
             / CAST(COUNT(*) - 1 AS DOUBLE) / 1e12, 9) AS cov
FROM cells GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Daily autocorrelation of event volume
# --------------------------------------------------------------------------

def _q_events_autocorr_daily(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of daily event counts, exact until the
    final division: with S = Σc, Q = Σc², n days, and per lag k the
    joined-pair sums P_k = Σc_t·c_{t+k}, A_k = Σc_t, B_k = Σc_{t+k}
    over the p_k pairs both of whose days exist,
    r_k = [n²P_k − nS(A_k+B_k) + p_k·S²] / [n(nQ − S²)] — the
    mean-centered estimator with the 1/n divisions multiplied
    through, so both sides of the ratio are exact integers (DECIMAL
    at warehouse scale: day counts square).  Scale: the daily rollup
    is map-side combinable; everything after lives on ≤ 31 rows.
    The daily frame feeds THREE subtrees (global stats, both lag-join
    sides) that Catalyst cannot fuse, so it is persisted — without
    the cache the plan re-scans the fact table three times for a
    31-row aggregate (caught by this tranche's plan-shape law)."""
    from pyspark.storagelevel import StorageLevel

    e = load_table(spark, sf_dir, "events")
    d = (e.select(F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("qq"))
    a = d.select(F.col("day"), F.col("c").alias("c1")).withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.lit(7))))
    # Explicit broadcast: the lag side is the <=31-row daily frame —
    # pinning it keeps the plan shape independent of session-level
    # broadcast thresholds (a foreign session may set the auto
    # threshold to -1), which the plan-shape law relies on.
    j = a.join(F.broadcast(d.select(F.col("day").alias("day2"),
                                    F.col("c").alias("c2"))),
               F.col("day2") == F.col("day") + F.col("k"))
    per_k = j.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("p"),
        F.sum(F.col("c1").cast("decimal(38,0)") * F.col("c2"))
         .alias("pk"),
        F.sum("c1").cast("decimal(38,0)").alias("ak"),
        F.sum("c2").cast("decimal(38,0)").alias("bk"))
    n_d = F.col("n").cast("decimal(38,0)")
    num = (n_d * n_d * F.col("pk")
           - n_d * F.col("s") * (F.col("ak") + F.col("bk"))
           + F.col("p").cast("decimal(38,0)") * F.col("s") * F.col("s"))
    den = n_d * (n_d * F.col("qq") - F.col("s") * F.col("s"))
    return (per_k.crossJoin(F.broadcast(stats))
            .select(F.col("k").cast("bigint").alias("k"),
                    F.col("n").alias("n_days"),
                    F.col("p").alias("n_pairs"),
                    F.round(num.cast("double") / den.cast("double"), 6)
                     .alias("autocorr"))
            )


_AUTOCORR_SQL = f"""
WITH d AS (
    SELECT epoch_us(ts) // {_DAY_US} AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(c AS HUGEINT)) AS s,
           SUM(CAST(c AS HUGEINT) * c) AS qq
    FROM d
), per_k AS (
    SELECT k.k, CAST(COUNT(*) AS BIGINT) AS p,
           SUM(CAST(t1.c AS HUGEINT) * t2.c) AS pk,
           SUM(CAST(t1.c AS HUGEINT)) AS ak,
           SUM(CAST(t2.c AS HUGEINT)) AS bk
    FROM generate_series(1, 7) k(k)
    JOIN d t1 ON TRUE
    JOIN d t2 ON t2.day = t1.day + k.k
    GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k, n AS n_days, p AS n_pairs,
       round(CAST(CAST(n AS HUGEINT) * n * pk
                  - CAST(n AS HUGEINT) * s * (ak + bk)
                  + CAST(p AS HUGEINT) * s * s AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * qq - s * s)
                    AS DOUBLE), 6) AS autocorr
FROM per_k, stats
"""


# --------------------------------------------------------------------------
# Poisson bootstrap CI of total order revenue
# --------------------------------------------------------------------------

def _q_bootstrap_poisson_revenue(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """32 deterministic Poisson-bootstrap resamples of total order
    revenue.  The classical bootstrap's global n-draw multinomial
    cannot be expressed as a per-row map; the Poisson(1) approximation
    can (independent per-row weights, the standard large-scale
    substitution), and drawing the weight from the md5 hash ring
    against literal CDF thresholds makes every engine reproduce the
    identical resamples — no rand(), retry-stable, oracle-checkable.
    One scan, ×32 in-row fanout, map-side partial aggregation onto 32
    cells; revenue accumulates in exact integer cents."""
    o = load_table(spark, sf_dir, "orders", fan_out=True)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    r = (o.select(F.col("o_orderkey"), cents.alias("m"))
         .withColumn("b", F.explode(F.sequence(F.lit(0),
                                               F.lit(_B - 1)))))
    digest = F.md5(F.concat(
        F.lit("boot:"), F.col("o_orderkey").cast("string"),
        F.lit("\x1f"), F.col("b").cast("string")))
    bucket = (F.conv(F.substring(digest, 1, 15), 16, 10)
              .cast("bigint") % _RING)
    w = _poisson_weight(bucket)
    return (r.select(F.col("b").cast("bigint").alias("resample_id"),
                     (w * F.col("m")).alias("wm"), w.alias("w"))
            .groupBy("resample_id")
            .agg(F.sum("w").cast("bigint").alias("n_eff"),
                 F.sum("wm").cast("bigint").alias("total_cents")))


_BUCKET_SQL = ("CAST(concat('0x', substr(md5(concat('boot:', "
               "CAST(o_orderkey AS VARCHAR), chr(31), "
               "CAST(b.b AS VARCHAR))), 1, 15)) AS BIGINT) "
               f"% {_RING}")

_BOOT_SQL = f"""
WITH r AS (
    SELECT CAST(b.b AS BIGINT) AS resample_id,
           CAST(round(o_totalprice * 100) AS BIGINT) AS m,
           {_poisson_weight_sql(_BUCKET_SQL)} AS w
    FROM orders, generate_series(0, {_B - 1}) b(b)
)
SELECT resample_id,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       CAST(SUM(w * m) AS BIGINT) AS total_cents
FROM r GROUP BY 1
"""


# --------------------------------------------------------------------------
# Epoch mix schedule
# --------------------------------------------------------------------------

def _q_epoch_mix_schedule(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The per-(source, epoch) token table a run consumes under
    tranche 12's epoch/repeat budget: epoch e serves
    clamp(alloc − (e−1)·unique, 0, unique) tokens — full passes over
    the deduped pool until the allocation runs out, a partial last
    pass, zeros after.  Σ over epochs equals the budget's
    tokens_served by construction (law-tested).  Pure arithmetic on
    the |sources|-row budget grid."""
    budget = _q_epoch_repeat_budget(spark, sf_dir)
    e = budget.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.lit(4))))
    served = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("unique_tokens"),
                F.col("alloc_tokens")
                - (F.col("epoch") - 1) * F.col("unique_tokens")))
    return e.select(
        "source", F.col("epoch").cast("bigint").alias("epoch"),
        served.cast("bigint").alias("tokens_in_epoch"),
        F.round(served * F.lit(1.0) / F.col("alloc_tokens"), 6)
         .alias("frac_of_alloc"))


_SCHEDULE_SQL = f"""
WITH budget_q AS ({_EPOCH_SQL})
SELECT source, CAST(e.e AS BIGINT) AS epoch,
       CAST(greatest(0, least(unique_tokens,
            alloc_tokens - (e.e - 1) * unique_tokens)) AS BIGINT)
           AS tokens_in_epoch,
       round(greatest(0, least(unique_tokens,
             alloc_tokens - (e.e - 1) * unique_tokens)) * 1.0
             / alloc_tokens, 6) AS frac_of_alloc
FROM budget_q, generate_series(1, 4) e(e)
"""


# --------------------------------------------------------------------------
# QI generalization ladder
# --------------------------------------------------------------------------

# A true coarsening chain: each level's partition refines the next's
# (bucket widths NESTED — 500 = 5·100, 1000 = 2·500 — and attributes
# only ever dropped), so every level-(L+1) class is a union of
# level-L classes and the monotonicity laws (n_classes and
# docs-below-k non-increasing, min_k non-decreasing) hold by
# construction.  Width 250 would NOT refine 100 (floor(n/250) splits
# floor(n/100) classes) — the law test pins the nesting.
_LADDER = (
    # (level, lang in QI?, length-bucket width)
    (0, True, 100),
    (1, True, 500),
    (2, False, 500),
    (3, False, 1000),
)


def _q_qi_generalization_ladder(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """k-anonymity at four successive quasi-identifier
    generalizations: the census that says WHICH generalization level
    first clears k >= 5 for every class (and what each level costs in
    identifiability).  One scan, ×4 in-row fanout to (level, QI-key)
    rows, two aggregations — grids only."""
    docs = load_table(spark, sf_dir, "documents")
    keys = F.array(*[
        F.struct(
            F.lit(lvl).cast("bigint").alias("level"),
            F.concat_ws(
                "\x1f",
                *([F.col("lang")] if use_lang else []),
                F.col("source"),
                F.floor(F.col("n_chars") / F.lit(width))
                 .cast("string")).alias("qi"))
        for lvl, use_lang, width in _LADDER])
    classes = (docs.select(F.explode(keys).alias("x"))
               .groupBy("x.level", "x.qi")
               .agg(F.count(F.lit(1)).alias("sz")))
    return (classes.groupBy("level")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_classes"),
                 F.min("sz").cast("bigint").alias("min_k"),
                 F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
                  .cast("bigint").alias("classes_below_5"),
                 F.sum(F.when(F.col("sz") < 5, F.col("sz"))
                       .otherwise(0)).cast("bigint")
                  .alias("docs_below_5")))


def _ladder_leg(lvl: int, use_lang: bool, width: int) -> str:
    lang = "CAST(lang AS VARCHAR), " if use_lang else ""
    return (f"SELECT CAST({lvl} AS BIGINT) AS level, "
            f"concat_ws(chr(31), {lang}CAST(source AS VARCHAR), "
            f"CAST(n_chars // {width} AS VARCHAR)) AS qi "
            "FROM documents")


_LADDER_SQL = ("WITH keys AS ("
               + " UNION ALL ".join(_ladder_leg(*row) for row in _LADDER)
               + """
), classes AS (
    SELECT level, qi, COUNT(*) AS sz FROM keys GROUP BY 1, 2
)
SELECT level, CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS min_k,
       CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
           AS classes_below_5,
       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
           AS docs_below_5
FROM classes GROUP BY 1
""")


# (earliest admission round, name, oracle_sql, fn) — consumed by
# registry_pending.PENDING_GATED.
PENDING13_GATED: list[tuple[int, str, str,
                            Callable[[SparkSession, str],
                                     DataFrame]]] = [
    (13, "embed_covariance_scaled", _COV_SQL,
     _q_embed_covariance_scaled),
    (13, "events_autocorr_daily", _AUTOCORR_SQL,
     _q_events_autocorr_daily),
    (13, "bootstrap_poisson_revenue", _BOOT_SQL,
     _q_bootstrap_poisson_revenue),
    (13, "epoch_mix_schedule", _SCHEDULE_SQL, _q_epoch_mix_schedule),
    (13, "qi_generalization_ladder", _LADDER_SQL,
     _q_qi_generalization_ladder),
]
