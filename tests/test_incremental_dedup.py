"""Incremental (arrival-path) MinHash dedup: a new batch's candidates
come from banding against the existing signature WAREHOUSE — no corpus
re-shingling, no corpus self-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators.dedup import (
    incremental_lsh_candidates, minhash_signature, word_shingles)


def test_incremental_candidates_find_planted_dups(spark, sf_dir):
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    warehouse = minhash_signature(
        word_shingles(docs, "doc_id", "text", n=3), "doc_id")

    # New batch: exact copies of 5 corpus docs under fresh ids
    # (planted near-dups) + 3 novel docs.
    copies = (docs.filter(F.col("doc_id") < 5)
              .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    novel = spark.createDataFrame(
        [(200000 + i,
          f"utterly novel zebra quasar {i} " * 10) for i in range(3)],
        "doc_id bigint, text string")
    batch = copies.unionByName(novel)
    new_sigs = minhash_signature(
        word_shingles(batch, "doc_id", "text", n=3), "doc_id")

    cand = incremental_lsh_candidates(new_sigs, warehouse, "doc_id")
    pairs = {(r.new_id, r.old_id) for r in cand.collect()}

    # Every planted copy must surface against its original (identical
    # shingle sets -> identical signatures -> all bands collide).
    for i in range(5):
        assert (100000 + i, i) in pairs
    # Novel docs share no shingles with the corpus; their signatures
    # should not collide in any band.
    assert not any(new >= 200000 for new, _ in pairs)
