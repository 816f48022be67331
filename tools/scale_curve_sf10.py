#!/usr/bin/env python
"""Second-decade scale point: sf10.0 = 100× the driver's sf0.1.

The round-8/9 curve (BENCH_sf1.json, SCALE.md) measures sf0.1 → sf1.0
→ sf3.0 (1× → 10× → 30×).  This tool adds the 100× point for the
flagship scale claims — the queries whose design argument is "banded /
bucketed / O(delta), so the exponent holds as data grows" — and
re-measures sf3.0 *in the same run* so the sf3→sf10 (3.33× data) step
exponent is internally consistent rather than cross-run.

Methodology: same generator (tools/make_scale_data.py, factor 100 —
shape-preserving: constant per-key fanout, decorrelated cross-copy
shingles/cosines), warm pass + min-of-2 timed passes, noop sink,
local[32].  Min-of-2 (not 3) because at these walls host-noise is
proportionally small and the suite must fit a round; documented in
the artifact.  sf10.0 is NOT on workdirs.SCALE_DATA_KEEP — prune it
after merging results (python -c "from etl_dados_ibge_sp_spark.
workdirs import prune_scale_data; print(prune_scale_data())").

Run ALONE; merge the printed JSON into BENCH_sf1.json / SCALE.md.
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

# Registered queries measured as-is (the callables the driver runs).
REGISTERED = [
    "dedup_minhash_lsh",        # banded LSH: never all-pairs
    "boilerplate_lines",        # fingerprint census + broadcast anti-join
    "dedup_containment",        # df-pruned shingle inverted index
    "dedup_incremental_load",   # new-batch x warehouse-bands only
    "lakehouse_incremental_loop",  # O(delta) stages, startup-dominated
    "stream_sessionize",        # state ~ active users, not events
]


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _min_of(fn, spark, sf_dir) -> float:
    samples = []
    for _ in range(1 + N_PASSES):  # first is the warm pass
        t0 = time.monotonic()
        _noop(fn(spark, sf_dir))
        samples.append(time.monotonic() - t0)
    return round(min(samples[1:]), 3)


def measure(spark, sf_dir: str) -> dict:
    from tools.scale_curve_r9 import _neardup_corpus, _semdedup_corpus

    from etl_dados_ibge_sp_spark.operators.similarity import (
        auto_semdedup_k, auto_sign_bits, embed_near_dup_pairs,
        kmeans_fit, semantic_dedup)
    from etl_dados_ibge_sp_spark.registry import all_queries_with_pending

    out: dict = {}
    qs = all_queries_with_pending()
    for name in REGISTERED:
        out[name] = {"sec": _min_of(qs[name], spark, sf_dir)}
        print(json.dumps({os.path.basename(sf_dir): {name: out[name]}}),
              flush=True)

    corpus = _semdedup_corpus(spark, sf_dir)
    k = auto_semdedup_k(corpus)
    t0 = time.monotonic()
    cents = kmeans_fit(corpus, k=k, n_iter=3)
    fit_sec = round(time.monotonic() - t0, 3)
    out["semantic_dedup_auto_k"] = {
        "k": k, "fit_sec": fit_sec,
        "sec": _min_of(lambda sp, d: semantic_dedup(
            corpus, threshold=0.9999, k=k, centroids=cents),
            spark, sf_dir)}
    print(json.dumps({os.path.basename(sf_dir):
                      {"semantic_dedup_auto_k":
                       out["semantic_dedup_auto_k"]}}), flush=True)

    nd = _neardup_corpus(spark, sf_dir)
    out["dedup_embed_neardup_auto_bits"] = {
        "n_bits": auto_sign_bits(nd),
        "sec": _min_of(lambda sp, d: embed_near_dup_pairs(
            nd, threshold=0.9, n_bits="auto"), spark, sf_dir)}
    print(json.dumps({os.path.basename(sf_dir):
                      {"dedup_embed_neardup_auto_bits":
                       out["dedup_embed_neardup_auto_bits"]}}),
          flush=True)
    return out


def main() -> None:
    root = work_root()
    spark = get_spark()
    result = {"metric": "scale_curve_sf10", "data_factors": [30, 100],
              "method": ("warm + min-of-2, noop sink, local[32]; sf3.0 "
                         "re-measured in the SAME run so the sf3->sf10 "
                         "step exponent is internally consistent"),
              "scales": {}}
    for sf in ("3.0", "10.0"):
        d = os.path.join(root, f"sf{sf}")
        if not os.path.isdir(d):
            print(f"skip sf{sf}: {d} missing", file=sys.stderr)
            continue
        result["scales"][sf] = measure(spark, d)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
