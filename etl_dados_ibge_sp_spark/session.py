"""SparkSession factory with scale-aware defaults.

The reference has no session concept (Polars eager, single process —
see SURVEY.md §4).  Here we centralize the Spark configuration that
makes the engine behave deterministically in tests and efficiently at
scale:

* AQE on (runtime join-strategy switching, skew-join splitting,
  partition coalescing) — the 100-TB insurance policy.
* UTC session timezone — parquet timestamps compare bit-identically
  against DuckDB oracles and across clusters in different zones.
* ANSI off — the reference's semantics are null-on-bad-cast
  (``cast(strict=False)``, reference pipeline.py:126-141); we use
  ``try_cast``-style helpers everywhere so the engine also works with
  ANSI on, but the session default matches the reference.
* Arrow on for any pandas interchange (vectorized, not row-at-a-time).

``tune_for_oracle(spark)`` applies the runtime-settable subset of these
to an externally provided session (the verification driver constructs
its own SparkSession; every query entrypoint calls this so results are
deterministic regardless of the host session's defaults).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied both at build time and onto foreign
# sessions handed to us by the verification driver.
_RUNTIME_CONF = {
    # Deterministic timestamp semantics vs DuckDB (naive == UTC).
    "spark.sql.session.timeZone": "UTC",
    # Reference semantics: bad cast -> null, not error (SURVEY §2.4 T1).
    "spark.sql.ansi.enabled": "false",
    # Adaptive execution: coalesce post-shuffle partitions, switch
    # sort-merge -> broadcast at runtime, split skewed partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas/pandas_udf interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Small dims (nation/region/ibge lookup) should always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # events.parquet stores TIMESTAMP(NANOS), which the vectorized
    # parquet reader rejects; read as nanos-since-epoch long and convert
    # (sources/parquet_source.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_shuffle_partitions() -> int:
    """Shuffle parallelism: cores-driven locally; on a real cluster this
    should be ~2-3x total executor cores (or left to AQE's coalescing
    with a high initial value)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return max(int(cpus), 4)
    return 32


def get_spark(app_name: str = "etl-dados-ibge-sp-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions or default_shuffle_partitions()),
    )
    # Local-mode memory headroom; harmless on a managed cluster where
    # spark-submit overrides it.
    builder = builder.config("spark.driver.memory",
                             os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Apply deterministic-semantics confs to a foreign session.

    Only runtime-settable confs; safe to call repeatedly.  Also ships
    this package to the Python workers (addPyFile) so pandas-UDF /
    mapInPandas closures resolve regardless of the host's cwd or
    PYTHONPATH.

    Applied once per SPARKSESSION (optimization r12; r11 keyed the
    guard on the SparkContext, which is wrong scope — ``conf.set``
    writes session-scoped runtime conf, so a second session over the
    same context, e.g. ``spark.newSession()``, would silently skip the
    timezone/ANSI/nanosAsLong setup and diverge from the oracle).  The
    guard is the applied-key set memoized per session via the one
    ``session_memo`` liveness idiom, so the ~10 py4j conf.set
    round-trips — a measurable per-query constant across a 221-query
    suite — happen once per session, a key that FAILED to apply
    (frozen conf on an exotic session) is retried on the next call
    instead of being stranded for the context's lifetime, and stopped
    sessions are swept rather than pinned.  Query paths that
    temporarily override one of these confs restore it themselves
    (e.g. streaming's shuffle-partition scope), so once-per-session is
    sufficient.
    """
    applied = session_memo(spark, "tune_for_oracle:applied", set)
    for k in _RUNTIME_CONF:
        if k in applied:
            continue
        try:
            spark.conf.set(k, _RUNTIME_CONF[k])
            applied.add(k)
        except Exception:
            # Frozen conf on an exotic session: results then depend on
            # the host defaults, which is the best we can do — but keep
            # the key out of `applied` so a transient failure is
            # retried on the next call.
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """addPyFile a zip of this package, once per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, "_etl_ibge_pkg_shipped", False):
        return
    try:
        from .workdirs import package_zip

        # Content-keyed build-once zip (workdirs hygiene): executors
        # fetch the addPyFile source lazily at first task and verify
        # its bytes on re-fetch, so the file must outlive the session
        # and never change — the old mkdtemp-per-session staging
        # leaked one dir per SparkContext.
        sc.addPyFile(package_zip())
        sc._etl_ibge_pkg_shipped = True
    except Exception:
        # Self-contained closures keep working without the shipped zip.
        pass


_SESSION_MEMO: dict = {}


def session_memo(spark: SparkSession, key: str, build):
    """Memoize a derived frame (or model) per (session, key).

    The stored value keeps a STRONG reference to the owning session:
    ``id()`` of a live object is unique, and pinning the session for
    the memo's lifetime is exactly what makes the id a safe dict key —
    a stopped-and-collected session could otherwise recycle its id and
    the memo would serve a frame bound to a dead session.  One idiom,
    shared by every session-scoped cache in the engine (Jaccard pair
    set, trade graph, pagerank edges), so the liveness reasoning lives
    in one place.

    ``build`` runs at most once per (session, key); its result is
    returned verbatim on later calls.

    Eviction: every call first sweeps entries whose owning session has
    been STOPPED (their frames are unusable anyway), so a long-lived
    driver that stops and replaces sessions doesn't pin dead sessions
    and their persisted frames forever.  ``session_memo_clear`` evicts
    a live session's entries explicitly.
    """
    _sweep_stopped()
    k = (id(spark), key)
    if k not in _SESSION_MEMO:
        _SESSION_MEMO[k] = (spark, build())
    return _SESSION_MEMO[k][1]


def _is_stopped(spark: SparkSession) -> bool:
    try:
        # SparkContext.stop() nulls _jsc; any access error counts too.
        return spark.sparkContext._jsc is None
    except Exception:
        return True


def _evict(k) -> None:
    _, value = _SESSION_MEMO.pop(k)
    # Memo values are frames, models, or composites of both (e.g. the
    # IVF entry is a (persisted corpus, centroid list) tuple) — walk
    # one level of tuple/list so every persisted member is released.
    parts = value if isinstance(value, (tuple, list)) else (value,)
    for part in parts:
        try:
            unpersist = getattr(part, "unpersist", None)
            if callable(unpersist):
                unpersist()
        except Exception:
            pass  # dead session: nothing to release JVM-side


def _sweep_stopped() -> None:
    for k in [k for k, (s, _) in _SESSION_MEMO.items() if _is_stopped(s)]:
        _evict(k)


def session_memo_clear(spark: SparkSession | None = None) -> int:
    """Evict memo entries (all sessions, or just ``spark``'s),
    unpersisting any cached frames.  Returns the number evicted."""
    doomed = [k for k, (s, _) in _SESSION_MEMO.items()
              if spark is None or s is spark]
    for k in doomed:
        _evict(k)
    return len(doomed)
