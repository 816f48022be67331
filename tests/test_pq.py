"""Laws for product quantization (operators/similarity.pq_*):
code validity, ADC recall against exact L2 brute force, and
self-query recovery."""

from __future__ import annotations

import numpy as np
import pytest

from etl_dados_ibge_sp_spark.operators.similarity import (pq_adc_topk,
                                                          pq_encode,
                                                          pq_train)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

M, K = 8, 16


@pytest.fixture(scope="module")
def pq(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=M, k=K, n_iter=2)
    codes = pq_encode(emb, books).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
            for r in emb.select("vec_id", "embedding").collect()}
    return emb, books, codes, vecs


def test_pq_codes_are_valid(pq):
    _, books, codes, vecs = pq
    assert len(books) == M and all(len(s) == K for s in books)
    assert len(codes) == len(vecs)
    for r in codes:
        assert len(r["codes"]) == M
        assert all(0 <= c < K for c in r["codes"])


def test_pq_adc_recall_against_exact(spark, sf_dir, pq):
    """ADC top-2k candidates must contain >= 70% of the exact-L2
    top-10 — the quantization-quality bar that makes PQ a usable
    first-stage filter (refine the survivors against exact vectors,
    as the docstring prescribes)."""
    emb, books, _, vecs = pq
    q = vecs[1]
    exact = sorted(vecs, key=lambda i: (float(((vecs[i] - q) ** 2).sum()),
                                        i))[:10]
    got = [r["vec_id"] for r in
           pq_adc_topk(pq_encode(emb, books), list(q), books,
                       k=20).collect()]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.7, f"recall@10 with 20 candidates = {recall}"


def test_pq_self_query_recovers_itself(spark, sf_dir, pq):
    """Querying with a corpus vector must put that vector's own id in
    the top-5 ADC candidates (its quantized cell is by construction
    nearest-or-close to the unquantized query)."""
    emb, books, _, vecs = pq
    got = [r["vec_id"] for r in
           pq_adc_topk(pq_encode(emb, books), list(vecs[7]), books,
                       k=5).collect()]
    assert 7 in got, got


def test_ivfpq_recall_and_pruning(spark, sf_dir):
    """The composed two-stage pipeline: IVF cells prune the scan
    (strictly fewer rows than the corpus reach ADC), and with refine
    against exact vectors the top-10 recall vs exact cosine stays
    >= 0.6 while scanning only nprobe cells."""
    from etl_dados_ibge_sp_spark.operators.similarity import (
        ann_ivfpq_topk, kmeans_fit, l2_normalized, _as_double)
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, n_iter=2)
    norm = emb.select("vec_id",
                      l2_normalized(_as_double(F.col("embedding")))
                      .alias("embedding"))
    books = pq_train(norm, m=M, k=K, n_iter=2)

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64")
            for r in norm.collect()}
    q = vecs[3]
    exact = sorted(vecs, key=lambda i: (-float(vecs[i] @ q), i))[:10]

    got = [r["vec_id"] for r in
           ann_ivfpq_topk(emb, list(q), cents, books, k=10,
                          nprobe=3, refine=40).collect()]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.6, f"ivfpq recall@10 = {recall}"
    # Pruning really happened: the probed cells hold < the corpus.
    from etl_dados_ibge_sp_spark.operators.similarity import \
        nearest_centroid
    cells = emb.select(nearest_centroid(
        l2_normalized(_as_double(F.col("embedding"))), cents)
        .alias("c")).groupBy("c").count().collect()
    total = sum(r["count"] for r in cells)
    top3 = sum(sorted((r["count"] for r in cells), reverse=True)[:3])
    assert top3 < total, "IVF assignment left everything in 3 cells"


def test_pq_encode_is_inrow_jvm(spark, sf_dir, pq):
    """Encoding is a narrow, Python-free projection: no exchange, no
    Python eval in the plan — the property that lets it run as a
    side-effect of any corpus scan at 100 TB."""
    emb, books, _, _ = pq
    plan = pq_encode(emb, books) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_pq_train_clamps_k_to_corpus_size(spark, tmp_path):
    """Fewer corpus vectors than k: the codebooks must clamp to the
    seed count (round-5 ADVICE) so the in-row argmin probe and the
    driver update loop agree on the entry count — instead of
    element_at walking past the end under ANSI mode."""
    rows = [(i, [float(i), float(-i), 1.0, 0.5] * 2) for i in range(5)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    books = pq_train(emb, m=2, k=K, n_iter=1)
    assert len(books) == 2
    assert all(len(s) == 5 for s in books)
    codes = pq_encode(emb, books).collect()
    for r in codes:
        assert all(0 <= c < 5 for c in r["codes"])
