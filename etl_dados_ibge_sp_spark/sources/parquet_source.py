"""Parquet star-schema loader for the test datasets (TESTDATA.md).

At 100 TB the fact tables (lineitem/orders/events/documents) would be
partitioned on disk (e.g. by month of the date column) and these readers
would pick up partition pruning for free; the loader keeps scans lazy so
Catalyst pushes filters and prunes columns into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimensions that should broadcast in joins (reference J1 joins a
# ~645-row lookup; nation/region/supplier play that role here).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})

# Tables that feed per-row-heavy pipelines (hashing, shingling, window
# functions, big aggregations) and deserve full cluster parallelism.
FACT_TABLES = frozenset({"lineitem", "orders", "events", "documents",
                         "embeddings"})


def scan_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s physical plan, cached on the
    DataFrame OBJECT: the ``.rdd.getNumPartitions()`` probe is a full
    analysis + physical-planning + RDD-DAG pass on the driver
    (measured 70–115 ms per call, tools/loadpath_probe.py), and a
    frame's partition count is fixed for its lifetime — same plan,
    same session, same files — so paying it more than once per frame
    is pure waste.  Frames that flow through ``session_memo`` (every
    ``load_table`` result) therefore pay the probe once per SESSION,
    not once per invocation."""
    n = getattr(df, "_etl_scan_partitions", None)
    if n is None:
        n = df.rdd.getNumPartitions()
        df._etl_scan_partitions = n
    return n


def ensure_parallelism(df: DataFrame, spark: SparkSession,
                       source: DataFrame | None = None) -> DataFrame:
    """Fan a narrow scan out to cluster parallelism.

    A parquet file is splittable only at row-group boundaries; a
    single-row-group file scans as ONE partition, serializing every
    downstream narrow transform (md5 shingling measured 32× under-
    parallelized at sf0.1).  When the scan has fewer partitions than
    the cluster has cores, a round-robin repartition — one tiny
    shuffle of the raw rows — buys full-width execution of everything
    after it.  At 100 TB the scan already has thousands of partitions
    and this is a no-op.  Callers opt in per load site (load_table's
    fan_out flag, opt-in since optimization r11): the shuffle only
    pays for itself when heavy narrow work follows the scan.

    ``source``: probe proxy (optimization r12).  When ``df`` is a
    NARROW transform (select/filter/withColumn — no shuffle, no
    coalesce) of ``source``, the partition counts are identical by
    Spark's narrow-dependency contract, so probing the source instead
    lets a caller that derives fresh frames per invocation from a
    session-memoized base (e.g. fuzzy_join_deletes over a load_table
    dim) hit :func:`scan_partitions`' per-object cache instead of
    paying a fresh planning pass every call.
    """
    target = spark.sparkContext.defaultParallelism
    if scan_partitions(df if source is None else source) < target:
        return df.repartition(target)
    return df


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Restore a proper session-zoned timestamp from the on-disk
    TIMESTAMP(NANOS) column, whichever way the reader surfaced it:

    * nanos-long (``spark.sql.legacy.parquet.nanosAsLong``, Spark
      <= 4.0): integer-divide to micros (nanos exceed double
      precision) and convert.
    * ``timestamp_ntz`` (Spark 4.1+ reads parquet nanos natively as
      NTZ): cast to TIMESTAMP — with the UTC session timezone this is
      the identical instant, and watermarks/windows require the
      zoned type.
    """
    from pyspark.sql import functions as F
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(
            col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fan_out: bool = False) -> DataFrame:
    """Resolve one star-schema table to a (lazy) DataFrame.

    ``fan_out`` is now OPT-IN (optimization r11).  The round-robin
    fan-out exists for per-row-heavy NARROW pipelines (hashing,
    shingling, codecs, per-row RNG) where a 1-partition scan would
    serialize the work; for everything else the exchange is pure cost
    at bench scale (measured suite-wide A/B at sf0.1: bare scans save
    ~32 s across 221 queries — a scan-first aggregation like
    count_report drops 0.81 s -> 0.20 s — while the ~25 genuinely
    per-row-heavy queries that keep ``fan_out=True`` would regress
    0.1-6.6 s each without it; tools/loadpath_probe.py,
    plans/r11/fanout_ab_sf0.1.json, OPTIMIZATION_r11.md).  At 100 TB
    both settings are identical: the
    scan already has cluster-width partitions and the fan-out is a
    no-op either way.

    The resolved frame is memoized per (session, path, fan_out) —
    PLAN-level reuse only, the same thing a catalog's table resolution
    does.  Nothing is persisted or precomputed: the frame is lazy, so
    every downstream action still scans the parquet files.  What the
    memo removes is the per-call driver work this module used to pay
    on EVERY query invocation — file listing + footer schema read in
    ``spark.read.parquet`` (measured 50–95 ms) and the
    ``ensure_parallelism`` partition probe (a full analysis/physical-
    planning pass via ``.rdd``, measured 70–115 ms) — a constant a
    long-lived cluster amortizes to zero but a 221-query suite paid
    hundreds of times (tools/loadpath_probe.py, optimization r11).

    The memo key carries the path's stat fingerprint (mtime_ns, size),
    so a path REWRITTEN within a session (tests stage-and-overwrite
    scratch tables; Spark's overwrite replaces the directory entries,
    bumping its mtime) resolves fresh instead of serving a stale file
    listing; an unstattable path skips the memo entirely.  FLAT-LAYOUT
    ASSUMPTION: the fingerprint stats only the top-level directory, so
    writes that touch only nested partition subdirectories (or rewrite
    a file in place without a directory-entry change) would NOT bump
    it — fine for this engine's tables (every writer replaces the
    whole top-level dir), but a partitioned layout must either include
    the per-partition entries in the key or skip the memo."""
    from ..session import session_memo

    path = os.path.join(sf_dir, f"{name}.parquet")

    def build() -> DataFrame:
        df = spark.read.parquet(path)
        if name == "events":
            df = normalize_ts(df)
        if fan_out and name in FACT_TABLES:
            df = ensure_parallelism(df, spark)
        return df

    try:
        st = os.stat(path)
    except OSError:
        return build()
    key = f"load_table:{path}:{fan_out}:{st.st_mtime_ns}:{st.st_size}"
    return session_memo(spark, key, build)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLE_NAMES) -> None:
    """Register temp views so `spark.sql` queries can name the tables."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
