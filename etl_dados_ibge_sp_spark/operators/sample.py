"""Deterministic hash sampling.

At 100 TB you cannot sample with ``rand()``: it is non-reproducible
across retries (a recomputed task re-rolls the dice, breaking
exactly-once sinks) and cannot be pushed into two sides of a join.
The scalable idiom is content-hash sampling: a row is in the sample
iff ``hash(key) mod N < fraction * N``.  Properties that matter at
scale:

* **Deterministic** across retries, engines, partitionings — md5 of
  the key, no RNG state.
* **Coordinated**: sampling two fact tables on the same join key
  yields a consistent join sample (Universe sampling).
* **Pushdown-friendly**: the predicate is a plain filter, evaluated
  inside the scan's whole-stage codegen; no shuffle, no driver state.

The reference has no sampling (its data is 1.1k rows); this is part
of the 100-TB extension surface (SURVEY.md §7 phase 9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bucket count for the hash ring; fraction resolution is 1/N_BUCKETS.
N_BUCKETS = 1_000_000

#: Unit separator keeps multi-column keys unambiguous ("a","bc" vs "ab","c").
_SEP = "\x1f"


def hash_bucket(key_cols: Sequence[str], salt: str = "smp") -> Column:
    """Deterministic bucket in [0, N_BUCKETS): 60-bit md5 prefix of the
    salted, separator-joined key (same construction as
    text.fingerprint64 — portable to any engine with md5 + hex parse).
    """
    key = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])
    digest = F.md5(F.concat(F.lit(salt + ":"), key))
    return (F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint")
            % N_BUCKETS)


def hash_sample(df: DataFrame, key_cols: Sequence[str], fraction: float,
                salt: str = "smp") -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` of the
    ring.  Same key + salt + fraction -> same sample, on any cluster.
    """
    return df.filter(hash_bucket(key_cols, salt) < int(fraction * N_BUCKETS))


def hash_bucket_sql(key_cols: Sequence[str], salt: str = "smp") -> str:
    """The DuckDB-ANSI rendering of :func:`hash_bucket`, kept adjacent
    so the two cannot drift."""
    key = ", ".join(f"CAST({c} AS VARCHAR)" for c in key_cols)
    return (f"CAST(concat('0x', substr(md5(concat('{salt}:', "
            f"concat_ws(chr(31), {key}))), 1, 15)) AS BIGINT) % {N_BUCKETS}")


def stratified_balance(df: DataFrame, group_col: str,
                       key_cols: Sequence[str], k: int | None = None,
                       salt: str = "strat") -> DataFrame:
    """Balanced downsampling: keep a deterministic k-subset of every
    stratum (default k = the smallest stratum's size), the standard
    class-balancing step before training.

    Selection is by hash rank, not random(): same inputs -> same
    sample on any cluster/partitioning/retry, and the oracle can
    reproduce it exactly.

    Scale: one window shuffle on the stratum key (row_number over
    hash order); the stratum-size reduce is a map-side-combinable
    count whose tiny result broadcasts back.  Skewed strata cost what
    any per-key window costs — at 100 TB pre-filter obvious giants or
    sample within shards first.
    """
    from pyspark.sql import Window

    if k is None:
        kdf = (df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
               .agg(F.min("__n").alias("__k")))
        k_col = F.broadcast(kdf)
    order = [hash_bucket(key_cols, salt)] + [F.col(c) for c in key_cols]
    w = Window.partitionBy(group_col).orderBy(*order)
    ranked = df.withColumn("rn", F.row_number().over(w).cast("bigint"))
    if k is None:
        return ranked.join(k_col).filter(F.col("rn") <= F.col("__k")) \
            .drop("__k")
    return ranked.filter(F.col("rn") <= k)


def weighted_sample(df: DataFrame, key_cols: Sequence[str],
                    weight_col: str, k: int,
                    salt: str = "wsmp") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k rows
    (Efraimidis-Spirakis A-ES): each row gets an exponential key
    ``-ln(u) / w`` with u drawn from its content-hash bucket, and the
    k SMALLEST keys win — inclusion probability proportional to
    weight, no sequential reservoir, so the "reservoir" is a plain
    distributed top-k (TakeOrdered: per-partition heads, tiny driver
    merge).  Same key + salt -> same sample on any cluster, retry, or
    engine.

    Cross-engine float discipline: u = (bucket+1)/1e6 is exact, ln may
    differ by an ulp between libm and the JVM, so the key is rounded
    to 9 decimals before ranking (an ulp at ln-scale is ~1e-15 — far
    inside the rounding) and ties break on the key columns.

    Zero- and NULL-weight rows are EXCLUDED before ranking: their key
    would be NULL (division by zero / null), and Spark sorts NULLs
    first while DuckDB sorts them last — so without the filter the
    engines disagree AND zero-probability rows would win the sample.
    The filter is the semantics (inclusion probability 0), not a
    workaround.

    Returns the sampled rows with their ``skey``.
    """
    u = (hash_bucket(key_cols, salt) + F.lit(1)) / F.lit(float(N_BUCKETS))
    w = F.col(weight_col).cast("double")
    skey = F.round(-F.log(u) / w, 9)
    return (df.filter(w > 0)
            .withColumn("skey", skey)
            .orderBy(F.asc_nulls_last("skey"),
                     *[F.asc(c) for c in key_cols])
            .limit(k))


def weighted_sample_sql(table: str, key_cols: Sequence[str],
                        weight_col: str, k: int, cols: str,
                        salt: str = "wsmp") -> str:
    """DuckDB rendering of :func:`weighted_sample` (adjacent, no
    drift)."""
    keys = ", ".join(key_cols)
    return f"""
SELECT {cols}, skey FROM (
    SELECT *, round(-ln(({hash_bucket_sql(key_cols, salt)} + 1)
                        / {float(N_BUCKETS)!r})
                    / CAST({weight_col} AS DOUBLE), 9) AS skey
    FROM {table}
    WHERE CAST({weight_col} AS DOUBLE) > 0)
ORDER BY skey, {keys} LIMIT {k}"""
