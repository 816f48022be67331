#!/usr/bin/env python
"""Microbenchmark for the load-path constants (optimization round 11).

Isolates the per-invocation driver/executor costs every query pays
through ``sources/parquet_source.load_table``:

  A. ``spark.read.parquet`` DataFrame construction (footer/schema);
  B. ``.rdd.getNumPartitions()`` — the fan-out probe: full analysis +
     physical planning + RDD DAG construction, driver-side;
  C. noop-sink write of the bare scan (1 partition at sf0.1);
  D. noop-sink write of ``repartition(defaultParallelism)`` over the
     scan — the fan-out exchange `ensure_parallelism` adds.

Run ALONE on the host.  Prints per-step min/mean over N reps.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

from etl_dados_ibge_sp_spark.session import get_spark  # noqa: E402

N = 12


def timed(fn):
    ts = []
    for _ in range(N):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="loadpath-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for table in ("lineitem", "events", "documents"):
        path = os.path.join(sf_dir, f"{table}.parquet")
        spark.read.parquet(path).write.mode("overwrite") \
            .format("noop").save()  # warm footers/pages/codegen

        out[f"{table}: A read.parquet"] = timed(
            lambda: spark.read.parquet(path))
        df = spark.read.parquet(path)
        # Probe-only cost: rebuild the frame OUTSIDE the timed lambda
        # per rep (``.rdd`` memoizes on the DataFrame, so a single
        # prebuilt df would time the probe once and a dict lookup
        # N-1 times; timing read.parquet().rdd inside would instead
        # double-count step A — the r11 evidence overstated B by ~A).
        frames = iter([spark.read.parquet(path) for _ in range(N)])
        out[f"{table}: B rdd.getNumPartitions"] = timed(
            lambda: next(frames).rdd.getNumPartitions())
        out[f"{table}: C noop bare scan"] = timed(
            lambda: df.write.mode("overwrite").format("noop").save())
        target = spark.sparkContext.defaultParallelism
        out[f"{table}: D noop repartition({target})"] = timed(
            lambda: df.repartition(target).write.mode("overwrite")
            .format("noop").save())
        agg = df.groupBy(df.columns[0]).count()
        out[f"{table}: E noop groupBy(bare)"] = timed(
            lambda: agg.write.mode("overwrite").format("noop").save())
        agg2 = df.repartition(target).groupBy(df.columns[0]).count()
        out[f"{table}: F noop groupBy(fanout)"] = timed(
            lambda: agg2.write.mode("overwrite").format("noop").save())
    for k, (mn, mean) in out.items():
        print(f"{k:42s} min={mn*1000:8.1f}ms mean={mean*1000:8.1f}ms")


if __name__ == "__main__":
    main()
