"""Mergeable distributed sketches: KMV distinct-count, count-min
frequency, and Bloom-filter join pruning.

The reference engine has no sketch surface (its corpora fit one
machine); these are the "beyond the reference" large-pipeline
operators the 100-TB brief calls for.  All three share one property
that matters at cluster scale: the summary is a FIXED-SIZE,
map-side-combinable aggregate — counters, a k-set of hashes, or a bit
array — so partial results merge associatively across partitions,
days, and reruns, where the exact computation (COUNT DISTINCT, a
per-key count, a semi-join build side) shuffles every key.

KMV and count-min hash with the engine-portable 60-bit md5-prefix
construction shared with :mod:`.sample` (``conv(substr(md5(salt:key),
1, 15), 16, 10)``), so both have a bit-exact DuckDB rendering: the
oracle recomputes the identical hashes, order statistics, counters,
and estimates — a sketch whose VALUES are deterministic is testable
as an oracle query, not just against an error-bound law.  Bloom is
the exception on purpose: its oracle is the PLAIN join (equality
proves conservativeness) and never recomputes a hash, so it uses the
native integer ``xxhash64`` — the probe must cost ~nothing because it
runs at raw-scan parallelism below the fan-out exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit hash space: 15 hex digits.  2^60 is a power of two, so
# dividing a hash by the space size is IEEE-exact in both engines.
HASH_SPACE = 1 << 60


def hash60(col: Column, salt: str) -> Column:
    """Uniform 60-bit hash of a string column (salted md5 prefix)."""
    digest = F.md5(F.concat(F.lit(salt + ":"), col))
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str, salt: str) -> str:
    """DuckDB rendering of :func:`hash60`, kept adjacent so the two
    cannot drift."""
    return (f"CAST(concat('0x', substr(md5(concat('{salt}:', {expr})), "
            f"1, 15)) AS BIGINT)")


# --------------------------------------------------------------------------
# KMV (K-minimum-values) distinct-count sketch
# --------------------------------------------------------------------------

def kmv_sketch(df: DataFrame, group_col: str, key_col: str,
               k: int = 64, alpha: int = 8,
               salt: str = "kmv") -> DataFrame:
    """Per-group KMV sketch (Bar-Yossef et al. 2002; Beyer et al.
    2007): the ``k`` smallest distinct 60-bit hashes of ``key_col``,
    as one ascending array column ``kmv``.

    Bounded-state plan, in three cheap passes over the hashed keys:

    1. ``approx_count_distinct`` (HLL++, fixed-size, combinable) sizes
       each group.
    2. A broadcast threshold keeps only hashes in the lowest
       ``alpha*k / n_distinct`` slice of the hash space — expected
       ``alpha*k`` survivors per group, so step 3's per-group state is
       O(alpha*k), never O(n_distinct).  Groups at or below
       ``alpha*k`` distinct keys keep everything (the sketch is then
       exact).  ``alpha`` covers both the HLL error (rsd 5%) and the
       binomial spread of how many hashes land under the cut; at
       alpha=8 the probability that fewer than ``k`` survive is
       Chernoff-negligible (< e^-30), and the pytest law re-checks it
       against the unfiltered order statistic on every test dataset.
    3. ``array_sort(collect_set(..))[:k]`` per group — the only
       non-combinable step, over the ~alpha*k survivors.

    Sketches merge by concatenating arrays, re-sorting, and re-taking
    ``k`` (:func:`kmv_merge`) — the union-day/union-partition path.
    """
    h = hash60(F.col(key_col).cast("string"), salt)
    hashed = df.select(F.col(group_col), h.alias("__h"))
    sizes = (hashed.groupBy(group_col)
             .agg(F.approx_count_distinct("__h", rsd=0.05).alias("__nd")))
    thr = (F.when(F.col("__nd") <= alpha * k, F.lit(HASH_SPACE - 1))
           .otherwise((F.lit(float(HASH_SPACE)) * (alpha * k)
                       / F.col("__nd")).cast("bigint")))
    cut = sizes.select(F.col(group_col), thr.alias("__thr"))
    kept = (hashed.join(F.broadcast(cut), group_col)
            .where(F.col("__h") <= F.col("__thr")))
    return (kept.groupBy(group_col)
            .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k)
                 .alias("kmv")))


def kmv_merge(a: Column, b: Column, k: int) -> Column:
    """Merge two KMV arrays: union, distinct, re-sort, first ``k`` —
    the associative combine that makes the sketch a partial aggregate."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_union_est(merged: Column, k: int) -> Column:
    """Distinct-count estimate from a (merged) KMV array column:
    exact size below ``k``, else (k-1) * 2^60 / kth_min."""
    size = F.size(merged)
    kth = F.element_at(merged, k)
    return F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH_SPACE))
        / kth.cast("double"))


def kmv_intersect_estimate(a: Column, b: Column, k: int) -> Column:
    """|A ∩ B| estimate from two KMV sketches — the set algebra that
    makes KMV more than a distinct counter (Beyer et al. 2007): merge
    the sketches (a KMV of A ∪ B), estimate the union, and scale by
    the fraction of the merged k-set present in BOTH input sketches
    (an unbiased Jaccard estimate, since the merged k-set is a uniform
    sample of the union's hash space).  Exact whenever both sets fit
    their sketches.  Entirely in-row over two small arrays — sketches
    of yesterday's and today's corpora intersect without touching
    either corpus."""
    merged = kmv_merge(a, b, k)
    both = F.size(F.array_intersect(F.array_intersect(merged, a), b))
    denom = F.least(F.size(merged), F.lit(k))
    return both.cast("double") / denom * kmv_union_est(merged, k)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from a KMV sketch.

    With fewer than ``k`` values the sketch IS the distinct set (the
    estimate is exact); otherwise est = (k-1) * 2^60 / kth_min — the
    classic KMV estimator.  (k-1)*2^60 is a power-of-two multiple so
    the only rounded ops are the bigint->double cast of the k-th hash
    and one division, identical IEEE steps in any engine."""
    size = F.size("kmv")
    kth = F.element_at("kmv", k)
    est = kmv_union_est(F.col("kmv"), k)
    return sketch.select(
        *[c for c in sketch.columns if c != "kmv"],
        F.least(size, F.lit(k)).cast("int").alias("k_used"),
        kth.alias("kth_hash"),
        F.round(est, 2).alias("n_distinct_est"))


# --------------------------------------------------------------------------
# Count-min frequency sketch
# --------------------------------------------------------------------------

def _cm_pos(key: Column, row: int, width: int, salt: str) -> Column:
    return hash60(key.cast("string"), f"{salt}{row}") % width


def countmin_counters(df: DataFrame, key_col: str, depth: int = 4,
                      width: int = 256, salt: str = "cm") -> DataFrame:
    """Build the count-min counter matrix (Cormode & Muthukrishnan
    2005): ``depth`` independent hash rows of ``width`` counters, as
    rows (r, pos, cnt).

    One map-side-combinable aggregate: each input row contributes
    ``depth`` (r, pos) increments, and the result is at most
    depth*width rows REGARDLESS of input size — the fixed-size summary
    that merges across partitions/days by adding counters."""
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 _cm_pos(F.col(key_col), r, width, salt).alias("pos"))
        for r in range(depth)])
    return (df.select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.r").alias("r"), F.col("c.pos").alias("pos"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def countmin_lookup(counters: DataFrame, keys: DataFrame, key_col: str,
                    depth: int = 4, width: int = 256,
                    salt: str = "cm",
                    out_col: str = "cm_est") -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate
    is min over the ``depth`` counters the key hashes to — never an
    under-count, over by at most the collision mass (pinned by the
    pytest law).  The counter matrix is tiny, so it broadcasts.

    LEFT join + coalesce-to-0, not inner: an unseen key can hash to
    cells no insert ever touched, and those cells hold 0 — an inner
    join would drop the empty cells from the min (overestimating past
    the count-min bound) and lose all-empty keys from the output
    entirely."""
    cells = F.array(*[
        F.struct(F.lit(r).alias("r"),
                 _cm_pos(F.col(key_col), r, width, salt).alias("pos"))
        for r in range(depth)])
    probed = keys.select(*keys.columns, F.explode(cells).alias("c"))
    return (probed.join(F.broadcast(counters),
                        (F.col("c.r") == F.col("r"))
                        & (F.col("c.pos") == F.col("pos")),
                        "left")
            .groupBy(*keys.columns)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias(out_col)))


def countmin_sql(key_expr: str, source: str, depth: int = 4,
                 width: int = 256, salt: str = "cm") -> str:
    """DuckDB CTE computing the identical counter matrix, for oracle
    embedding: SELECT r, pos, cnt FROM (...)."""
    h = (f"CAST(concat('0x', substr(md5(concat('{salt}', "
         f"CAST(s.r AS VARCHAR), ':', {key_expr})), 1, 15)) AS BIGINT)")
    return (f"SELECT s.r AS r, {h} % {width} AS pos, "
            f"CAST(count(*) AS BIGINT) AS cnt "
            f"FROM {source}, generate_series(0, {depth - 1}) s(r) "
            f"GROUP BY 1, 2")


# --------------------------------------------------------------------------
# Bloom-filter join pruning
# --------------------------------------------------------------------------

def _bloom_positions(key: Column, n_hashes: int, m_bits: int,
                     salt: str) -> list[Column]:
    """``n_hashes`` bit positions from ONE ``xxhash64`` — disjoint
    21-bit slices, masked to ``m_bits`` (power of two required).

    Unlike the KMV/count-min hashes, Bloom needs NO engine-portable
    digest: its oracle is the plain join (equality proves the filter
    conservative), never a recomputation of the hashes — so the native
    JVM xxhash64 (integer ops end-to-end, no string digest, no hex
    parse) is the right choice.  This matters doubly because the probe
    filter runs below the fan-out exchange by design (prune before the
    shuffle, i.e. at raw-scan parallelism): with md5 the per-row
    digest dominated the whole query on a narrow local scan (~3 s on
    600 k rows); xxhash64 makes the probe virtually free.  The 64-bit
    hash yields three independent 21-bit slices; the arithmetic
    shift's sign bits are masked off by ``m_bits - 1``."""
    if not 1 <= n_hashes <= 3:
        raise ValueError("n_hashes must be 1..3 (one 64-bit digest)")
    if m_bits & (m_bits - 1) or m_bits > 1 << 21:
        raise ValueError("m_bits must be a power of two <= 2^21")
    h = F.xxhash64(F.lit(salt), key.cast("string"))
    return [F.shiftright(h, 21 * r).bitwiseAND(F.lit(m_bits - 1))
            for r in range(n_hashes)]


def bloom_build(build: DataFrame, key_col: str, m_bits: int = 1 << 20,
                n_hashes: int = 3, salt: str = "bf") -> bytes:
    """Aggregate the build side's join keys into an ``m_bits`` Bloom
    (1970) bit array, returned as ``m_bits/4`` ASCII hex-nibble BYTES
    (nibble i holds bits 4i..4i+3, LSB-first).

    The bit array is built DISTRIBUTED — set-bit positions are a
    keys-only projection, packed into words by a ``bit_or`` aggregate
    of at most m_bits/64 rows — and only the fixed-size word table is
    collected (m=2^20 -> 16384 longs, ~128 KB: a bounded driver-side
    model like the k-means centroids, NOT a collect of the keys; the
    boundedness is set by ``m_bits``, independent of data scale).  At
    even larger build sides, grow ``m_bits`` or switch to Spark's
    runtime row-level bloom (spark.sql.optimizer.runtime.bloomFilter)
    which this operator makes explicit and testable.

    Why hex BYTES and not an array or a string: a Python-list literal
    crosses py4j once per ELEMENT (F.lit on 16384 longs measured 15 s
    of driver time — it dominated the whole query), and numpy /
    one-row-DataFrame transports still cost seconds; a scalar literal
    is one py4j call and ONE Literal node.  And it must be BINARY, not
    STRING: UTF8String.substring walks codepoints from the start, so
    probing a 262144-char string literal is O(position) PER ROW
    (measured 12 s for 6 000 probes), while binary substring is
    byte-addressed O(1)."""
    pos = F.explode(F.array(*_bloom_positions(
        F.col(key_col), n_hashes, m_bits, salt))).alias("p")
    # Keys-only projection, fanned out BEFORE hashing: the build side
    # often arrives as a narrow filtered scan (few partitions locally)
    # and md5 is the whole per-row cost; the Generate/hash stage sits
    # above the repartition, so it runs cluster-wide.  The shuffle
    # moves bare keys — negligible.
    keys = build.select(F.col(key_col))
    spark = build.sparkSession
    keys = keys.repartition(spark.sparkContext.defaultParallelism)
    words = (keys.select(pos)
             .groupBy((F.col("p") / 64).cast("int").alias("w"))
             .agg(F.expr("bit_or(shiftleft(1L, CAST(p % 64 AS INT)))")
                  .alias("bits"))
             .collect())
    bitmap = 0
    for row in words:
        bitmap |= (row["bits"] & ((1 << 64) - 1)) << (64 * row["w"])
    # MSB-first hex, reversed => char i is the nibble for bits 4i..4i+3.
    return format(bitmap, f"0{m_bits // 4}x")[::-1].encode("ascii")


def bloom_prune(probe: DataFrame, key_col: str, nibbles: bytes,
                m_bits: int = 1 << 20, n_hashes: int = 3,
                salt: str = "bf") -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the build side: all
    ``n_hashes`` bits set.  Never drops a true match (the oracle
    equality below is the proof); false positives pass through to the
    exact join, so the filter is correctness-neutral and purely a
    shuffle-volume reducer — the explicit form of a runtime semi-join
    bloom, applied at the scan so the pruned rows never shuffle."""
    positions = _bloom_positions(F.col(key_col), n_hashes, m_bits, salt)
    pos_cols = {f"__bp{r}": pos for r, pos in enumerate(positions)}
    out = probe.withColumns({"__bf": F.lit(nibbles), **pos_cols})
    cond = None
    for pc in pos_cols:
        # Nibble for bit p lives at 1-based byte index p/4 + 1; the
        # bit inside it is p%4.  The 1-byte binary slice casts to a
        # 1-char hex string for conv.  Variable-distance shifts need
        # SQL form (the PySpark shiftright helper takes only a
        # literal distance).
        c = F.expr(f"(shiftright(CAST(conv(CAST(substring(__bf, "
                   f"CAST({pc} / 4 AS INT) + 1, 1) AS STRING), 16, 10) "
                   f"AS INT), CAST({pc} % 4 AS INT)) & 1) = 1")
        cond = c if cond is None else (cond & c)
    return out.where(cond).drop("__bf", *pos_cols)
