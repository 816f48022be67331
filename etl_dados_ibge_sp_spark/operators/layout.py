"""Z-order (Morton) clustering for multi-dimensional data skipping.

The 100-TB problem this solves: hive-style partitioning on one column
prunes only that column's predicates, and partitioning on two explodes
the file count (|A| x |B| directories).  Z-ordering interleaves the
bits of several quantized columns into ONE sort key; range-partitioning
and sorting by it makes every file's min/max stats TIGHT on *all*
participating columns at once, so the parquet/Delta-style file- and
row-group-level stats prune point/range queries on any of them —
multi-dimensional skipping with a single linear layout (the technique
Delta Lake's OPTIMIZE ZORDER BY popularized).

Everything is JVM-side expression arithmetic (shift/or/floor — inside
whole-stage codegen, no UDF), and the quantization is a plain min-max
affine map whose two scalars come from one tiny aggregate, so the key
is deterministic and cross-engine reproducible (the adjacent SQL
builder renders the identical arithmetic for DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Affine map of ``col`` from [lo, hi] onto integer [0, 2^bits).

    Double arithmetic on purpose: both engines run the identical IEEE
    expression, so the bucket of every value — including boundary
    values — is bit-identical.  hi maps to the top bucket via least().
    """
    nb = float(2 ** bits)
    scaled = (col.cast("double") - lo) / (hi - lo) * F.lit(nb)
    return F.least(F.lit(2 ** bits - 1),
                   F.greatest(F.lit(0), F.floor(scaled).cast("bigint")))


def _interleave(qcols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits`` bits of each quantized column:
    output bit (b * d + i) = bit b of column i.  d x bits shift/and/or
    terms, all folded by codegen into straight-line JVM arithmetic."""
    d = len(qcols)
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, q in enumerate(qcols):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * d + i))
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append a ``zkey`` Morton key over ``cols`` (numeric).

    One tiny min/max aggregate per call (a scalar "model", broadcast
    as literals via a 1-row join — the winsorize pattern), then pure
    row-local arithmetic.  ``bits`` bounds the key to d*bits bits;
    8 bits/column resolves 256 buckets per dimension — plenty, since
    the key only has to cluster files, not order rows totally.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    stats = df.agg(*aggs)
    out = df.join(F.broadcast(stats))
    qs = [_quantize(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"),
                    bits) for c in cols]
    return out.withColumn("zkey", _interleave(qs, bits)) \
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])


def zorder_layout(df: DataFrame, cols: list[str], n_files: int,
                  bits: int = 8) -> DataFrame:
    """Range-partition + sort by the Z-order key: the frame to hand to
    a writer so each output file covers a compact Morton range (tight
    per-file min/max on every ``cols`` member).  One range-exchange
    (sampled boundaries) + local sorts — no global sort."""
    keyed = zorder_key(df, cols, bits)
    return keyed.repartitionByRange(n_files, "zkey") \
        .sortWithinPartitions("zkey")


def zorder_key_sql(table: str, cols: list[str], bits: int = 8,
                   id_col: str = "") -> str:
    """DuckDB rendering of :func:`zorder_key` (kept adjacent so the
    arithmetic cannot drift): same affine quantization in double, same
    interleave via integer shifts."""
    nb = float(2 ** bits)
    stats = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS lo_{i}, "
        f"max(CAST({c} AS DOUBLE)) AS hi_{i}"
        for i, c in enumerate(cols))
    quants = ", ".join(
        f"least({2 ** bits - 1}, greatest(0, CAST(floor("
        f"(CAST(t.{c} AS DOUBLE) - s.lo_{i}) / (s.hi_{i} - s.lo_{i})"
        f" * {nb!r}) AS BIGINT))) AS q_{i}"
        for i, c in enumerate(cols))
    terms = " | ".join(
        f"(((q_{i} >> {b}) & 1) << {b * len(cols) + i})"
        for b in range(bits) for i in range(len(cols)))
    sel = f"{id_col}, " if id_col else ""
    return f"""
WITH s AS (SELECT {stats} FROM {table}),
q AS (SELECT t.{id_col + ', ' if id_col else '*, '}{quants}
      FROM {table} t, s)
SELECT {sel}CAST({terms} AS BIGINT) AS zkey FROM q"""
