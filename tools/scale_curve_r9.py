#!/usr/bin/env python
"""Round-9 scale-curve extension (VERDICT r08 'Next round' #1 + #7):
re-measure the two previously fixed-parameter quadratics at their new
AUTO-sized defaults, and add the missing sf3.0 point for
``dedup_containment`` (whose shingle-DF cap was a scale claim with no
measured point).

Methodology matches BENCH_sf1.json exactly — warm pass then min-of-3
interleaved timed passes per scale, noop sink, local[32] — so the new
rows are like-for-like with the round-8 curve:

* ``semantic_dedup`` @ k="auto" (auto_semdedup_k ≈ √n/2): corpus is
  the registered query's (planted clusters + 1.1× copies).  The
  k-means fit is reported separately (``fit_sec``, single measure) —
  it is the ingest-time cost the registered query memoizes per
  (session, sf), so the curve row times the dedup pass like the
  round-8 fixed-k row did.  The round-8 finding this answers:
  exponent 1.91 on the sf1→sf3 step at fixed k=8.
* ``embed_near_dup_pairs`` @ n_bits="auto" (auto_sign_bits ≈
  log2(n/128), recomputed inside every timed pass — the one cheap
  count() IS part of the auto path): corpus is the registered
  query's (base + 1.1× planted copies).  Round-8 finding: 24.5×
  wall at a 10× data step at fixed n_bits=4.
* ``dedup_containment``: the registered callable, unchanged — only
  the third curve point was missing.

With ``--verify`` the script first proves result-identity of auto vs
the registered fixed parameters on the sf1.0 corpus (sorted value
compare), upgrading the fixture-level laws to generated-scale
evidence.

Run ALONE (no concurrent Spark) and merge the printed JSON into
BENCH_sf1.json / SCALE.md by hand — scale runs are an evidence
artifact, not CI.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

from etl_dados_ibge_sp_spark.session import get_spark  # noqa: E402
from etl_dados_ibge_sp_spark.sources.parquet_source import (  # noqa: E402
    load_table)
from etl_dados_ibge_sp_spark.workdirs import work_root  # noqa: E402

N_PASSES = 3


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _semdedup_corpus(spark, sf_dir):
    from etl_dados_ibge_sp_spark.registry_ext import planted_clusters
    pl = planted_clusters(load_table(spark, sf_dir, "embeddings"))
    copies = pl.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.1).alias("embedding"))
    return pl.unionByName(copies)


def _neardup_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id",
                      F.col("embedding").cast("array<double>")
                       .alias("embedding"))
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x * 1.1).alias("embedding"))
    return base.unionByName(planted)


def measure(spark, sf_dir: str) -> dict:
    from etl_dados_ibge_sp_spark.operators.similarity import (
        auto_semdedup_k, kmeans_fit, semantic_dedup)
    from etl_dados_ibge_sp_spark.operators.similarity import (
        embed_near_dup_pairs)
    from etl_dados_ibge_sp_spark.registry import all_queries_with_pending

    out: dict = {}

    # --- semantic_dedup @ auto-k (fit once, dedup min-of-3) ---------
    corpus = _semdedup_corpus(spark, sf_dir)
    k = auto_semdedup_k(corpus)
    t0 = time.monotonic()
    cents = kmeans_fit(corpus, k=k, n_iter=3)
    fit_sec = time.monotonic() - t0
    samples = []
    for _ in range(1 + N_PASSES):  # first iteration is the warm pass
        t0 = time.monotonic()
        _noop(semantic_dedup(corpus, threshold=0.9999, k=k,
                             centroids=cents))
        samples.append(time.monotonic() - t0)
    out["semantic_dedup_auto_k"] = {
        "k": k, "fit_sec": round(fit_sec, 3),
        "sec": round(min(samples[1:]), 3)}

    # --- embed_near_dup_pairs @ auto n_bits (count() in-loop) -------
    nd = _neardup_corpus(spark, sf_dir)
    samples = []
    for _ in range(1 + N_PASSES):
        t0 = time.monotonic()
        _noop(embed_near_dup_pairs(nd, threshold=0.9, n_bits="auto"))
        samples.append(time.monotonic() - t0)
    from etl_dados_ibge_sp_spark.operators.similarity import (
        auto_sign_bits)
    out["dedup_embed_neardup_auto_bits"] = {
        "n_bits": auto_sign_bits(nd), "sec": round(min(samples[1:]), 3)}

    # --- dedup_containment (registered callable) --------------------
    q = all_queries_with_pending()["dedup_containment"]
    samples = []
    for _ in range(1 + N_PASSES):
        t0 = time.monotonic()
        _noop(q(spark, sf_dir))
        samples.append(time.monotonic() - t0)
    out["dedup_containment"] = {"sec": round(min(samples[1:]), 3)}
    return out


def verify_identity(spark, sf_dir: str) -> dict:
    """Auto-sized vs registered-fixed parameters: identical results on
    the generated sf1.0 corpus (the scale at which round 8 measured the
    fixed parameters' quadratic)."""
    from etl_dados_ibge_sp_spark.operators.similarity import (
        auto_semdedup_k, embed_near_dup_pairs, kmeans_fit,
        semantic_dedup)

    nd = _neardup_corpus(spark, sf_dir)
    fixed = embed_near_dup_pairs(nd, threshold=0.9, n_bits=4)
    auto = embed_near_dup_pairs(nd, threshold=0.9, n_bits="auto")
    rows_f = sorted(map(tuple, fixed.collect()))
    rows_a = sorted(map(tuple, auto.collect()))
    nd_same = rows_f == rows_a

    corpus = _semdedup_corpus(spark, sf_dir)
    k = auto_semdedup_k(corpus)
    # Materialize each kept set BEFORE the next semantic_dedup call:
    # its entry-time pin eviction unpersists the PRIOR call's
    # assignment caches, so an uncollected prior result regresses to
    # the documented per-pair lineage-recompute shape (the operator's
    # single-threaded contract).
    ids_f = sorted(r[0] for r in semantic_dedup(
        corpus, threshold=0.9999, k=8,
        centroids=kmeans_fit(corpus, k=8, n_iter=3))
        .select("vec_id").collect())
    ids_a = sorted(r[0] for r in semantic_dedup(
        corpus, threshold=0.9999, k=k,
        centroids=kmeans_fit(corpus, k=k, n_iter=3))
        .select("vec_id").collect())
    return {"neardup_identical": nd_same, "neardup_pairs": len(rows_f),
            "semdedup_kept_identical": ids_f == ids_a,
            "semdedup_kept": len(ids_f), "auto_k": k}


def main() -> None:
    root = work_root()
    dirs = {"0.1": "/root/testdata/sf0.1",
            "1.0": os.path.join(root, "sf1.0"),
            "3.0": os.path.join(root, "sf3.0")}
    spark = get_spark()
    result: dict = {"metric": "scale_curve_r9_auto_params",
                    "host": spark.sparkContext.master, "scales": {}}
    if "--verify" in sys.argv:
        result["identity_sf1"] = verify_identity(spark, dirs["1.0"])
        print(json.dumps({"identity_sf1": result["identity_sf1"]}),
              flush=True)
    for sf, d in dirs.items():
        if not os.path.isdir(d):
            print(f"skip sf{sf}: {d} missing", file=sys.stderr)
            continue
        result["scales"][sf] = measure(spark, d)
        print(json.dumps({sf: result["scales"][sf]}), flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
