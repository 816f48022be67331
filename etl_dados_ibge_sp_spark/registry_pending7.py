"""Seventh pending tranche (round 5): batch MODEL INFERENCE and the
classifier-evaluation metrics that close the train/serve loop a
training-data pipeline runs after curation — score every vector with a
frozen linear model, summarize calibration, and compute the exact AUC.
Three queries; round 6's 50 admission slots cover the whole queue
(45 with tranche 8), so these admit with the rest when the staleness
bound extends to 4 rounds.

Float discipline (the subtlety this tranche exists to pin): the raw
margin z = w·x + b is a SEQUENTIAL in-row IEEE fold (similarity.dot ==
DuckDB list_dot_product — the established bit-parity idiom), so z is
bit-identical across engines and safe to ORDER, GROUP, and THRESHOLD
on.  The sigmoid needs exp(), which is NOT guaranteed correctly
rounded across libms — so every decision boundary is taken in z-space
(predicted = z ≥ 0; calibration bin = count of logit literals ≤ z,
with the logit boundaries baked as Python-computed double literals
into BOTH engines), and exp() only ever feeds displayed, rounded
score columns (the unigram_logprob precedent).  AUC is rank
arithmetic on z: doubled midranks keep tie handling in exact
integers, one division at the end.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.similarity import _as_double, dot
from .sources.parquet_source import load_table

# Frozen "quality classifier": dyadic weights (exactly representable
# doubles, so the literal round-trips through SQL text and F.lit
# identically) over the 64-dim embedding, alternating sign so the
# margin distribution straddles zero at every SF.
_DIM = 64
_W = [((-1) ** i * (i + 1)) / 128 for i in range(_DIM)]
_B = 0.125

_W_SQL = "[" + ", ".join(repr(w) for w in _W) + "]"

# z-space bin boundaries: logit(k/10) for k = 1..9, computed ONCE in
# Python and embedded as double literals in both engines — comparing
# the bit-identical z against shared literals sidesteps exp() ULP
# drift at bin edges entirely.
_LOGIT = [math.log(k / 10 / (1 - k / 10)) for k in range(1, 10)]

_Z_SQL = f"""
    SELECT vec_id, label % 2 AS target,
           list_dot_product(CAST(embedding AS DOUBLE[]), {_W_SQL})
               + {_B!r} AS z
    FROM embeddings
"""


def _z_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(float(x)) for x in _W])
    return e.select(
        "vec_id",
        (F.col("label") % 2).alias("target"),
        (dot(_as_double(F.col("embedding")), w) + F.lit(_B)).alias("z"))


# --------------------------------------------------------------------------
# Batch inference: sigmoid scores + z-space decision
# --------------------------------------------------------------------------

_SCORE_SQL = f"""
WITH zf AS ({_Z_SQL})
SELECT vec_id, CAST(target AS BIGINT) AS target,
       round(1.0 / (1.0 + exp(-z)), 6) AS score,
       CAST(CASE WHEN z >= 0 THEN 1 ELSE 0 END AS BIGINT) AS predicted
FROM zf
"""


def _q_embed_score_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch classifier inference: sigmoid(w·x + b) per embedding with
    a frozen literal weight vector — the quality-scoring / filtering
    pass a curation pipeline runs over every document embedding.  The
    decision is taken on the margin (z ≥ 0 ⇔ score ≥ ½), never on the
    exp()-derived score, so predictions are bit-deterministic.

    Scale: zero shuffles — one narrow projection, the in-row fold is
    O(d) per row inside whole-stage codegen, and the model (64
    doubles) is a plan literal, the degenerate case of a broadcast
    model.  At 100 TB this is the map-only job it should be."""
    z = _z_frame(spark, sf_dir)
    return z.select(
        "vec_id", F.col("target").cast("bigint").alias("target"),
        F.round(1.0 / (1.0 + F.exp(-F.col("z"))), 6).alias("score"),
        F.when(F.col("z") >= 0, 1).otherwise(0).cast("bigint")
         .alias("predicted"))


# --------------------------------------------------------------------------
# Calibration summary (reliability-diagram bins)
# --------------------------------------------------------------------------

_BOUNDS_SQL = "[" + ", ".join(repr(b) for b in _LOGIT) + "]"

_CALIB_SQL = f"""
WITH zf AS ({_Z_SQL}),
b AS (
    SELECT vec_id, target, z,
           len(list_filter({_BOUNDS_SQL}, x -> x <= z)) AS bin,
           CAST(floor(1.0 / (1.0 + exp(-z)) * 1000000) AS BIGINT)
               AS score_micro
    FROM zf
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(COUNT(*) AS BIGINT) AS n,
       round(SUM(score_micro) * 1.0 / (COUNT(*) * 1000000), 6)
           AS mean_score,
       round(SUM(target) * 1.0 / COUNT(*), 6) AS pos_rate
FROM b GROUP BY bin
"""


def _q_score_calibration_bins(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Reliability diagram for the frozen classifier: decile score
    bins vs observed positive rate — the calibration check that
    decides whether scores can gate a corpus directly or need
    recalibration.  Bin membership compares the bit-identical margin
    against shared logit literals (never floor(exp·10), whose ULP
    drift could flip an edge row per engine); the mean score
    accumulates floor-scaled integer micros, so the aggregate is
    partitioning-invariant.

    Scale: one map-side-combinable groupBy onto ≤10 rows."""
    z = _z_frame(spark, sf_dir)
    bounds = F.array(*[F.lit(float(b)) for b in _LOGIT])
    zb = z.select(
        "target",
        F.size(F.filter(bounds, lambda x: x <= F.col("z"))).alias("bin"),
        F.floor(1.0 / (1.0 + F.exp(-F.col("z"))) * 1000000)
         .cast("bigint").alias("score_micro"))
    return (zb.groupBy(F.col("bin").cast("bigint").alias("bin"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.round(F.sum("score_micro") * 1.0
                         / (F.count(F.lit(1)) * 1000000), 6)
                 .alias("mean_score"),
                 F.round(F.sum("target") * 1.0 / F.count(F.lit(1)), 6)
                 .alias("pos_rate")))


# --------------------------------------------------------------------------
# Exact AUC via doubled midranks (Mann–Whitney U)
# --------------------------------------------------------------------------

_AUC_SQL = f"""
WITH zf AS ({_Z_SQL}),
r AS (
    SELECT target, z,
           row_number() OVER (ORDER BY z, vec_id) AS rn
    FROM zf
), g AS (
    SELECT z, min(rn) + max(rn) AS two_mid,
           CAST(SUM(target) AS BIGINT) AS pos_g
    FROM r GROUP BY z
), s AS (
    SELECT CAST(SUM(pos_g) AS BIGINT) AS n_pos,
           CAST(SUM(two_mid * pos_g) AS BIGINT) AS two_mid_pos
    FROM g
), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM zf)
SELECT s.n_pos, t.n - s.n_pos AS n_neg,
       round((s.two_mid_pos - s.n_pos * (s.n_pos + 1)) * 1.0
             / (2 * s.n_pos * (t.n - s.n_pos)), 6) AS auc
FROM s, t
"""


def _q_classifier_auc_exact(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the frozen classifier against the parity
    target (label mod 2), via the Mann–Whitney rank identity with
    DOUBLED midranks: 2U = Σ_pos 2·midrank − n⁺(n⁺+1), so tied
    margins contribute their exact ½ without a single fractional
    intermediate — AUC is one integer expression and one final
    division.  Ranks order by the bit-identical margin (tie-broken by
    vec_id; equal-z groups collapse before the sum, so the tie-break
    never affects the result).

    Scale: the rank window is a global sort of (z, target) PAIRS —
    the already-projected 16-byte rows, not embeddings; at warehouse
    scale the standard move is the two-pass histogram AUC (bin z,
    accumulate pos/neg per bin — value_percentiles' approach), which
    converges to exactly this definition.  Everything after the sort
    is a map-side-combinable aggregate to one row.

    Integer headroom: ``row_number`` is int32, so this exact
    formulation caps at 2^31-1 ranked rows; ``two_mid`` is summed as
    bigint (min is cast before the add so min+max cannot wrap at
    ~2^30 rows).  Beyond that, the histogram AUC is the scale path."""
    z = _z_frame(spark, sf_dir)
    r = z.select("target", "z", "vec_id").withColumn(
        "rn", F.row_number().over(Window.orderBy("z", "vec_id")))
    g = r.groupBy("z").agg(
        (F.min("rn").cast("bigint") + F.max("rn")).alias("two_mid"),
        F.sum("target").cast("bigint").alias("pos_g"))
    s = g.agg(
        F.sum("pos_g").cast("bigint").alias("n_pos"),
        F.sum(F.col("two_mid") * F.col("pos_g")).cast("bigint")
         .alias("two_mid_pos"))
    t = z.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    j = s.crossJoin(F.broadcast(t))
    auc = F.round(
        (F.col("two_mid_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
        * 1.0 / (2 * F.col("n_pos") * (F.col("n") - F.col("n_pos"))), 6)
    return j.select("n_pos", (F.col("n") - F.col("n_pos")).alias("n_neg"),
                    auc.alias("auc"))


PENDING7: list[tuple[str, str,
                     Callable[[SparkSession, str], DataFrame]]] = [
    ("embed_score_logreg", _SCORE_SQL, _q_embed_score_logreg),
    ("score_calibration_bins", _CALIB_SQL, _q_score_calibration_bins),
    ("classifier_auc_exact", _AUC_SQL, _q_classifier_auc_exact),
]
