"""Edge-case laws for the round-3 operators: hand-computable fixtures
exercising the branches the sf-scale oracle sweep cannot isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_pagerank_dangling_node_leaks_mass(spark):
    # a -> b, b has no out-edges: b's rank leaks (simplified PageRank).
    # Closed form with d=0.85, N=2, 1 iteration from uniform:
    #   r(a) = 0.075            (jump only — nothing points at a)
    #   r(b) = 0.075 + 0.85*0.5 (a's full rank flows to b)
    from etl_dados_ibge_sp_spark.operators.graph import pagerank
    nodes = spark.createDataFrame([(0,), (1,)], "node bigint")
    edges = spark.createDataFrame([(0, 1, 1)], "u bigint, v bigint, w bigint")
    out = {r.node: r.pagerank
           for r in pagerank(nodes, edges, iters=1).collect()}
    assert out[0] == pytest.approx(0.075, abs=1e-9)
    assert out[1] == pytest.approx(0.075 + 0.85 * 0.5, abs=1e-9)
    assert sum(out.values()) < 1.0  # the dangling leak is real


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # a <-> b: the uniform vector is stationary at any iteration count.
    from etl_dados_ibge_sp_spark.operators.graph import pagerank
    nodes = spark.createDataFrame([(0,), (1,)], "node bigint")
    edges = spark.createDataFrame([(0, 1, 3), (1, 0, 3)],
                                  "u bigint, v bigint, w bigint")
    out = {r.node: r.pagerank
           for r in pagerank(nodes, edges, iters=7).collect()}
    assert out[0] == pytest.approx(0.5, abs=1e-9)
    assert out[1] == pytest.approx(0.5, abs=1e-9)


def test_source_mix_rate_caps_at_one(spark):
    # A tiny source whose fair-share budget exceeds its own tokens must
    # keep ALL its docs (rate capped at 1.0), never oversample.
    from etl_dados_ibge_sp_spark.operators.mixing import source_mix
    rows = ([(i, "a b c d e f g h i j", "src1") for i in range(40)]
            + [(100 + i, "a b", "src3") for i in range(2)])
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    out = source_mix(docs, "doc_id", "text", "source", budget_frac=0.5)
    by_src = {r.source: r.n for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    # src3 (weight 4, 4 tokens total) gets far more budget than it has
    # tokens: every doc survives.
    assert by_src.get("src3") == 2
    # src1 (weight 2, 400 tokens) is genuinely subsampled.
    assert 0 < by_src.get("src1", 0) < 40


def test_merge_upsert_branches(spark, sf_dir):
    from etl_dados_ibge_sp_spark.registry import all_queries
    out = all_queries()["merge_upsert"](spark, sf_dir)
    ops = {r.merge_op: r.n for r in
           out.groupBy("merge_op").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    # All three MERGE branches are exercised by the fixture overlap.
    assert set(ops) == {"unchanged", "updated", "inserted"}
    assert ops["inserted"] >= 1 and ops["updated"] >= 1


def test_pretrain_sequences_account_every_token(spark, sf_dir):
    # Sequence token counts must sum to each shard's total tokens, and
    # every interior sequence is exactly full (256).
    from etl_dados_ibge_sp_spark.operators.text import token_count
    from etl_dados_ibge_sp_spark.registry import all_queries
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    out = all_queries()["pretrain_sequences"](spark, sf_dir)
    per_shard = {r.shard: r.t for r in
                 out.groupBy("shard").agg(F.sum("n_tok").alias("t"))
                 .collect()}
    docs = load_table(spark, sf_dir, "documents")
    # Recompute shard totals independently.
    from etl_dados_ibge_sp_spark.operators.mixing import hash_bucket
    truth = {r.shard: r.t for r in docs.select(
        (hash_bucket(["doc_id"], "shf") % 8).cast("bigint").alias("shard"),
        token_count(F.col("text")).alias("n"))
        .groupBy("shard").agg(F.sum("n").alias("t")).collect()}
    assert per_shard == truth
    mx = {r.shard: r.m for r in
          out.groupBy("shard").agg(F.max("seq_id").alias("m")).collect()}
    interior = out.alias("o").join(
        spark.createDataFrame([(s, m) for s, m in mx.items()],
                              "shard bigint, m bigint"), "shard") \
        .filter(F.col("seq_id") < F.col("m"))
    bad = interior.filter(F.col("n_tok") != 256).count()
    assert bad == 0, "an interior sequence is not exactly 256 tokens"


def test_quantile_bins_are_quartiles(spark, sf_dir):
    from etl_dados_ibge_sp_spark.registry import all_queries
    out = all_queries()["quality_quantile_bins"](spark, sf_dir)
    # Each source's four bins must each hold between 15% and 35% of its
    # docs (exact quartiles up to integer-tie rounding).
    dist = (out.groupBy("source", "bin")
            .agg(F.count(F.lit(1)).alias("n")).collect())
    per_src = {}
    for r in dist:
        per_src.setdefault(r.source, {})[r.bin] = r.n
    for src, bins in per_src.items():
        total = sum(bins.values())
        assert set(bins) == {0, 1, 2, 3}, (src, bins)
        for b, n in bins.items():
            assert 0.15 <= n / total <= 0.35, (src, b, n, total)
