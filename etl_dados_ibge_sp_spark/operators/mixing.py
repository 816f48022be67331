"""Corpus composition operators for training-data pipelines: weighted
source mixing under a token budget, deterministic global shuffle +
sharding, and unigram-LM negative-log-likelihood scoring (the
perplexity-filter baseline).

All three are pure Catalyst expression pipelines — no Python in any
hot path — and every randomized-looking step is content-hash
deterministic (operators/sample.py rationale: retry-safe,
coordinated, pushdown-friendly; rand() can never be oracle-checked).

Scale notes:

* ``source_mix`` aggregates per-source token totals (a keys-only
  shuffle), broadcasts the ~#sources-row rate table back, and samples
  with a scan-local filter — the corpus itself never shuffles.
* ``shuffle_shard`` is the one-shuffle form of "globally shuffle the
  corpus and write N training shards": shard = hash(key) % N is a
  scan-local expression, and the intra-shard order is a window over
  the shard partitioning — no global sort, no single-partition
  window.  At 100 TB this is exactly `repartition(N, shard)` +
  per-shard sort, the layout a `partitionBy("shard")` writer wants.
* ``unigram_nll`` shuffles tokens once for the frequency table
  (map-side combinable wordcount), broadcasts the vocabulary back,
  and reduces per document.  Scores are integer micro-nats so the
  per-document sum is order-insensitive (exact), engine-portable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sample import N_BUCKETS, hash_bucket, hash_bucket_sql
from .text import token_count, tokens


def source_weight(source_col: str = "source"):
    """Demo mixing weight derived from the source id (``src7`` -> 7 % 4
    + 1): deterministic and expressible in any SQL engine, standing in
    for the per-domain weights a real mixing config supplies."""
    return (F.regexp_extract(F.col(source_col), r"(\d+)$", 1)
            .cast("int") % 4 + 1).cast("double")


def source_weight_sql(source_col: str = "source") -> str:
    return (f"CAST(CAST(regexp_extract({source_col}, '(\\d+)$', 1) "
            f"AS INT) % 4 + 1 AS DOUBLE)")


def source_mix(docs: DataFrame, id_col: str, text_col: str,
               source_col: str, budget_frac: float = 0.5,
               salt: str = "mix", weight=None) -> DataFrame:
    """Weighted source mixing under a token budget.

    Given per-source weights w_s, allocate a global token budget
    (``budget_frac`` of the whole corpus) proportionally:
    ``rate_s = min(1, budget * (w_s / Σw) / tokens_s)``, then keep each
    document with probability rate_s — deterministically, via its
    content-hash bucket, so the sample is identical on every cluster,
    retry, and engine.  Documents are sampled whole (never split);
    the realized token count concentrates tightly around the budget.

    ``weight``: a Column over the per-source aggregate (may reference
    ``source_col`` or the ``src_tok`` token total); defaults to the
    config-style :func:`source_weight`.  Weights are cast to
    DECIMAL(38,8) — exact for both the integer config weights and
    6-dp-rounded data-derived weights — so the weight SUM is
    order-insensitive and the rate is engine-exact.

    Returns the sampled (id, source, n_tok) rows.
    """
    d = docs.select(F.col(id_col), F.col(source_col),
                    token_count(F.col(text_col)).alias("n_tok"))
    w = weight if weight is not None else source_weight(source_col)
    per_src = (d.groupBy(source_col).agg(F.sum("n_tok").alias("src_tok"))
               .withColumn("w", w.cast("decimal(38,8)")))
    # Global totals as window-over-aggregate (not a crossJoin of a
    # second aggregate): the rate table derives from ONE pass over the
    # per-source aggregate, so the corpus scan isn't repeated for the
    # totals.  The empty-frame window runs on the ~#sources-row
    # aggregate only.
    wall = Window.partitionBy()
    rates = per_src.select(
        source_col,
        F.least(
            F.lit(1.0),
            (F.lit(budget_frac) * F.sum("src_tok").over(wall))
            * (F.col("w").cast("double")
               / F.sum("w").over(wall).cast("double"))
            / F.col("src_tok"),
        ).alias("rate"))
    return (
        d.join(F.broadcast(rates), source_col)
        # floor, not cast: CAST-to-int truncates in Spark but rounds in
        # DuckDB, so a boundary bucket (frac(rate*N) >= 0.5) would admit
        # one extra bucket on the oracle side.  Explicit floor on both
        # sides makes the threshold engine-independent.
        .filter(hash_bucket([id_col], salt)
                < F.floor(F.col("rate") * N_BUCKETS).cast("bigint"))
        .select(id_col, source_col, "n_tok")
    )


def source_mix_sql(table: str, id_col: str, text_col: str,
                   source_col: str, budget_frac: float = 0.5,
                   salt: str = "mix", weight_sql: str | None = None) -> str:
    """DuckDB rendering of :func:`source_mix`, kept adjacent so the two
    cannot drift.  Arithmetic association matches the Spark side
    exactly so the double-precision rates are bit-identical.
    ``weight_sql``: expression over (source_col, src_tok), defaulting
    to the config-style weight."""
    toks = f"len(regexp_split_to_array(trim({text_col}), '\\s+'))"
    wsql = weight_sql or source_weight_sql(source_col)
    return f"""
WITH d AS (
    SELECT {id_col}, {source_col},
           CAST({toks} AS BIGINT) AS n_tok
    FROM {table}
), per_src0 AS (
    SELECT {source_col}, SUM(n_tok) AS src_tok
    FROM d GROUP BY {source_col}
), per_src AS (
    SELECT *, CAST({wsql} AS DECIMAL(38,8)) AS w FROM per_src0
), rates AS (
    SELECT {source_col},
           least(1.0, ({budget_frac} * SUM(src_tok) OVER ())
                      * (CAST(w AS DOUBLE)
                         / CAST(SUM(w) OVER () AS DOUBLE))
                      / src_tok) AS rate
    FROM per_src
)
SELECT d.{id_col}, d.{source_col}, d.n_tok
FROM d JOIN rates USING ({source_col})
WHERE {hash_bucket_sql([id_col], salt)}
      < CAST(floor(rate * {N_BUCKETS}) AS BIGINT)
"""


def shuffle_shard(df: DataFrame, key_cols: Sequence[str],
                  n_shards: int = 8, salt: str = "shf") -> DataFrame:
    """Deterministic global shuffle + shard assignment for training:
    shard = hash(key) % n_shards (scan-local), position within the
    shard = rank of the hash under the shard's window partitioning.
    Reproduces the "shuffle the corpus, write N shards" step with ONE
    shuffle and no global sort; ties (hash collisions) break on the
    key itself, so the order is total and engine-portable.
    """
    b = hash_bucket(key_cols, salt)
    w = Window.partitionBy("shard").orderBy(
        "__bucket", *[F.col(c) for c in key_cols])
    return (
        df.withColumn("__bucket", b)
        .withColumn("shard", (F.col("__bucket") % n_shards).cast("bigint"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__bucket")
    )


def unigram_nll(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unigram-LM negative log-likelihood per document — the
    perplexity-filter baseline of LLM data curation (score docs by
    how surprising their tokens are under a corpus-wide unigram
    model; outliers in either direction are boilerplate or garbage).

    Per-token cost is quantized to integer micro-nats
    (``round(-ln(count/total) * 1e6)``) so document sums are exact
    bigint arithmetic — order-insensitive and identical across
    engines; the double mean is derived from the integer sum.

    Returns (id, n_tok, nll_micro, avg_nll).
    """
    toks = docs.select(F.col(id_col),
                       F.explode(tokens(F.col(text_col))).alias("__tok"))
    freq = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    tot = freq.agg(F.sum("__cnt").alias("__tot"))
    vocab = freq.crossJoin(F.broadcast(tot)).select(
        "__tok",
        F.round((-F.log(F.col("__cnt") / F.col("__tot"))) * 1e6)
        .cast("bigint").alias("__nll"))
    return (
        toks.join(F.broadcast(vocab), "__tok")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tok"),
             F.sum("__nll").alias("nll_micro"))
        .select(
            id_col, "n_tok", "nll_micro",
            ((F.col("nll_micro").cast("double") / F.col("n_tok"))
             / F.lit(1e6)).alias("avg_nll"))
    )


def source_mix_temperature(docs: DataFrame, id_col: str, text_col: str,
                           source_col: str, budget_frac: float = 0.5,
                           salt: str = "mixT") -> DataFrame:
    """Temperature-scaled source mixing (alpha = 0.5): weights derive
    from the DATA as sqrt(source token count) instead of a config —
    the standard multilingual-pretraining rebalance that upsamples
    small sources relative to their size (w_s ∝ n_s^alpha flattens the
    distribution; alpha=0.5 is the common temperature tau=2 setting).
    A thin wrapper over :func:`source_mix` — same rate formula, same
    deterministic content-hash sampling; sqrt is IEEE-correctly-
    rounded on both engines and the 6-dp rounding makes the weight
    exactly DECIMAL-representable."""
    w = F.round(F.sqrt(F.col("src_tok").cast("double")), 6)
    return source_mix(docs, id_col, text_col, source_col,
                      budget_frac=budget_frac, salt=salt, weight=w)


def source_mix_temperature_sql(table: str, id_col: str, text_col: str,
                               source_col: str,
                               budget_frac: float = 0.5,
                               salt: str = "mixT") -> str:
    """DuckDB rendering of :func:`source_mix_temperature` — the shared
    :func:`source_mix_sql` body with the sqrt weight expression."""
    return source_mix_sql(
        table, id_col, text_col, source_col,
        budget_frac=budget_frac, salt=salt,
        weight_sql="round(sqrt(CAST(src_tok AS DOUBLE)), 6)")
