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


def test_incremental_candidates_max_bucket_caps_hot_bands(spark):
    """A warehouse band bucket larger than max_bucket is dropped before
    the join (no quadratic fanout on the arrival path); normal-size
    buckets are unaffected."""
    # 30 identical warehouse docs -> one hot band bucket of size 30;
    # one distinct doc in its own (size-1) buckets.
    rows = [(i, "the same stopband text repeated " * 5) for i in range(30)]
    rows.append((999, "completely different singular content here"))
    wh_docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    warehouse = minhash_signature(
        word_shingles(wh_docs, "doc_id", "text", n=3), "doc_id")

    batch = spark.createDataFrame(
        [(100000, "the same stopband text repeated " * 5),
         (100001, "completely different singular content here")],
        "doc_id bigint, text string")
    new_sigs = minhash_signature(
        word_shingles(batch, "doc_id", "text", n=3), "doc_id")

    uncapped = incremental_lsh_candidates(new_sigs, warehouse, "doc_id")
    assert uncapped.filter(F.col("new_id") == 100000).count() == 30

    capped = incremental_lsh_candidates(new_sigs, warehouse, "doc_id",
                                        max_bucket=10)
    got = {(r.new_id, r.old_id) for r in capped.collect()}
    # Hot bucket suppressed...
    assert not any(new == 100000 for new, _ in got)
    # ...but the singleton bucket still matches.
    assert (100001, 999) in got
