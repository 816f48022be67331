"""Round-3 operator laws not covered by the oracle-parity sweep:
sketch error bounds, binary/Avro source behavior, and mixing-budget
properties."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.registry import all_queries

QUERIES = all_queries()


def test_sketch_cardinality_error_law(spark, sf_dir):
    # HLL++ at rsd=0.02 must land within 5% of the exact distinct
    # count for every group (generous vs the configured 2% rsd).
    # The registered query folds this law into its checked
    # within_bounds column (its oracle asserts literal 1); here we
    # re-derive the raw estimate so the underlying contract is pinned
    # independently of the query's restatement.
    rows = QUERIES["sketch_cardinality"](spark, sf_dir).collect()
    assert rows
    assert all(r.within_bounds == 1 for r in rows)
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    raw = (load_table(spark, sf_dir, "events")
           .groupBy("event_type")
           .agg(F.approx_count_distinct("user_id", rsd=0.02)
                .alias("approx_users"),
                F.countDistinct("user_id").alias("exact_users"))
           .collect())
    for r in raw:
        rel = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel <= 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_binary_file_source_reads_payload(spark, sf_dir):
    from etl_dados_ibge_sp_spark.sources.binary_source import (
        read_binary_files,
    )
    path = f"{sf_dir}/nation.parquet"
    df = read_binary_files(spark, path)
    row = df.select("path", "length", "content").first()
    assert row.length == os.path.getsize(path)
    assert len(row.content) == row.length
    # Parquet magic both ends — the payload is byte-faithful.
    assert row.content[:4] == b"PAR1" and row.content[-4:] == b"PAR1"


def test_avro_gate_raises_actionable_error(spark, tmp_path):
    from etl_dados_ibge_sp_spark.sources.binary_source import read_avro
    try:
        df = read_avro(spark, str(tmp_path / "nothing.avro"))
    except RuntimeError as e:
        assert "spark-avro" in str(e)
        return
    except Exception:
        # Module present but path missing — also acceptable here.
        return
    assert df is not None  # module genuinely available


def test_source_mix_hits_token_budget(spark, sf_dir):
    # The mixing rates must realize the requested global token budget
    # to within sampling noise (docs are sampled whole; at sf0.01 the
    # corpus is 500 docs, so allow a wide but bounded band).
    from etl_dados_ibge_sp_spark.operators.mixing import source_mix
    from etl_dados_ibge_sp_spark.operators.text import token_count
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(token_count(F.col("text"))).alias("t")).first().t
    sampled = source_mix(docs, "doc_id", "text", "source",
                         budget_frac=0.5)
    got = sampled.agg(F.sum("n_tok").alias("t")).first().t
    assert 0.35 * total <= got <= 0.65 * total


def test_pagerank_mass_conservation(spark, sf_dir):
    # With every node having out-edges, total rank mass stays 1.
    rows = QUERIES["nation_pagerank"](spark, sf_dir).collect()
    assert len(rows) == 25
    mass = sum(r.pagerank for r in rows)
    assert mass == pytest.approx(1.0, abs=1e-6)
    assert all(r.pagerank > 0 for r in rows)


def test_shuffle_shard_is_balanced_partition(spark, sf_dir):
    from etl_dados_ibge_sp_spark.operators.mixing import shuffle_shard
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = shuffle_shard(docs, ["doc_id"], n_shards=8)
    sizes = {r.shard: r.n for r in
             out.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert set(sizes) == set(range(8))
    n = docs.count()
    # Multinomial balance: each shard within 3x of fair share.
    assert all(n / 24 <= c <= 3 * n / 8 for c in sizes.values())
    # pos is a dense 1..size ranking inside each shard.
    mx = {r.shard: r.m for r in
          out.groupBy("shard").agg(F.max("pos").alias("m")).collect()}
    assert mx == sizes
