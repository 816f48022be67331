#!/usr/bin/env python
"""Round-10 scale measurements — the three verdict asks that need
generated-scale data:

1. (r9 task #7) Extend the second-decade curve beyond the dedup/
   stream families: ``fuzzy_join_names_k2``, ``corpus_curate``,
   ``bloom_filter_join`` at sf1.0 / sf3.0 / sf10.0, all re-measured
   in ONE run so the step exponents are internally consistent.
2. (r9 task #3) ``leakage_pairs`` — the exact inverted-index
   candidate path vs the new LSH-banded path
   (registry_pending10.leakage_pairs(candidates=...)) at sf1.0 /
   sf3.0 / sf10.0: the docstring's 100 TB substitution claim becomes
   a measured crossover.
3. (r9 task #5) ``kmeans_fit_sampled`` vs the full ``kmeans_fit`` at
   sf10.0, k=auto — the regime-boundary note said the sample pays
   off once the corpus scan term dominates the fixed k·d codegen
   overhead; this records the sf10 walls that claim rested on.

Methodology matches tools/scale_curve_sf10.py: the shape-preserving
generator (tools/make_scale_data.py), warm pass + min-of-2, noop
sink, local[32].  Run ALONE (one Spark session on the host); merge
the printed JSON into BENCH_sf1.json / SCALE.md by hand — scale runs
are evidence artifacts, not CI.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

from etl_dados_ibge_sp_spark.session import get_spark  # noqa: E402
from etl_dados_ibge_sp_spark.workdirs import work_root  # noqa: E402

N_PASSES = 2

# corpus_curate LAST: its exact-verify path has a MEASURED memory
# boundary at sf10.0 (the corpus-side index broadcast outgrows the
# heap) and a driver-fatal OOM must not poison queries still queued
# in the same session.
REGISTERED = ["fuzzy_join_names_k2", "bloom_filter_join",
              "corpus_curate"]


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _min_of(fn, spark, sf_dir):
    """warm + min-of-N seconds, or {"error": ...} — a query that hits
    its measured scale boundary (e.g. corpus_curate's exact-verify
    memory wall at sf10.0) records the failure as a result instead of
    killing the run; a DNF at a scale point is evidence."""
    samples = []
    try:
        for _ in range(1 + N_PASSES):  # first is the warm pass
            t0 = time.monotonic()
            _noop(fn(spark, sf_dir))
            samples.append(time.monotonic() - t0)
    except Exception as exc:  # noqa: BLE001
        return {"error": str(exc).split("\n")[0][:300],
                "completed_passes": len(samples)}
    return round(min(samples[1:]), 3)


def _fresh_spark():
    from etl_dados_ibge_sp_spark.session import get_spark as gs
    sp = gs()
    sp.sparkContext.setLogLevel("ERROR")
    return sp


def measure(spark, sf_dir: str, with_kmeans: bool) -> dict:
    from etl_dados_ibge_sp_spark.registry import all_queries_with_pending
    from etl_dados_ibge_sp_spark.registry_pending10 import leakage_pairs

    out: dict = {}
    qs = all_queries_with_pending()

    def alive(sp):
        # A driver-fatal OOM kills the JVM; everything after in that
        # session fails with connection errors.  Recover with a fresh
        # session so one query's measured boundary cannot poison the
        # rest of the scale pass.
        try:
            sp.sql("SELECT 1").collect()
            return sp
        except Exception:  # noqa: BLE001
            try:
                sp.stop()
            except Exception:  # noqa: BLE001
                pass
            return _fresh_spark()

    for strat in ("inverted", "lsh"):
        key = f"leakage_pairs_{strat}"
        out[key] = {"sec": _min_of(
            lambda sp, d, s=strat: leakage_pairs(sp, d, candidates=s),
            spark, sf_dir)}
        print(json.dumps({os.path.basename(sf_dir): {key: out[key]}}),
              flush=True)
        spark = alive(spark)

    for name in REGISTERED:
        out[name] = {"sec": _min_of(qs[name], spark, sf_dir)}
        print(json.dumps({os.path.basename(sf_dir): {name: out[name]}}),
              flush=True)
        spark = alive(spark)

    if with_kmeans:
        from tools.scale_curve_r9 import _semdedup_corpus

        from etl_dados_ibge_sp_spark.operators.similarity import (
            auto_semdedup_k, kmeans_fit, kmeans_fit_sampled)

        try:
            corpus = _semdedup_corpus(spark, sf_dir)
            k = auto_semdedup_k(corpus)
            t0 = time.monotonic()
            full = kmeans_fit(corpus, k=k, n_iter=3)
            full_sec = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            sampled = kmeans_fit_sampled(corpus, k=k, n_iter=3)
            sampled_sec = round(time.monotonic() - t0, 3)
            out["kmeans_fit_sf10"] = {
                "k": k, "full_fit_sec": full_sec,
                "sampled_fit_sec": sampled_sec,
                "speedup": round(full_sec / max(sampled_sec, 1e-9), 2),
                "centroid_sets_equal_len": len(full) == len(sampled)}
        except Exception as exc:  # noqa: BLE001
            out["kmeans_fit_sf10"] = {
                "error": str(exc).split("\n")[0][:300]}
        print(json.dumps({os.path.basename(sf_dir):
                          {"kmeans_fit_sf10": out["kmeans_fit_sf10"]}}),
              flush=True)
    return out


def main() -> None:
    root = work_root()
    result = {"metric": "scale_curve_r10",
              "data_factors": [10, 30, 100],
              "method": ("warm + min-of-2, noop sink, local[32], "
                         "default 8g heap (same as every other curve "
                         "run — r9 comparability); one FRESH session "
                         "per scale so shuffle residue and session "
                         "memos reset identically at each decade; a "
                         "query that hits its measured scale boundary "
                         "records {error} instead of killing the run "
                         "— a DNF at a scale point is evidence"),
              "scales": {}}
    scales = sys.argv[1:] or ["1.0", "3.0", "10.0"]
    for sf in scales:
        d = os.path.join(root, f"sf{sf}")
        if not os.path.isdir(d):
            print(f"skip sf{sf}: {d} missing", file=sys.stderr)
            continue
        spark = get_spark()
        spark.sparkContext.setLogLevel("ERROR")
        result["scales"][sf] = measure(spark, d,
                                       with_kmeans=(sf == "10.0"))
        try:
            # measure() may have replaced a session its boundary
            # query killed; stop whatever is active now.
            from pyspark.sql import SparkSession
            active = SparkSession.getActiveSession()
            (active or spark).stop()
        except Exception:  # noqa: BLE001
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
