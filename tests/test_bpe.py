"""BPE trainer exactness law: the DataFrame-native merge table equals
a pure-Python reference BPE (same tie-break) on real corpus text and
on adversarial synthetic words (overlapping runs)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators.bpe import (
    bpe_train, word_symbol_table)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    words = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            c = word_counts[w]
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += c
        if not pairs:
            break
        # max count, lexicographic tie-break — mirror of the operator
        (a, b), c = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, c))
        for w, syms in words.items():
            out, carry = [], None
            for s in syms:
                if carry is None:
                    carry = s
                elif carry == a and s == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            words[w] = out
    return merges


def test_bpe_matches_reference_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    words = word_symbol_table(docs)
    got = bpe_train(words, n_merges=10)

    wc = {r["w"]: r["c"] for r in
          docs.select(F.explode(F.split(F.trim("text"), r"\s+"))
                      .alias("w"))
          .filter(F.length("w") > 0)
          .groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()}
    want = _ref_bpe(wc, 10)
    assert got == want


def test_bpe_matches_reference_on_overlaps(spark):
    """Adversarial: repeated symbols ('aaaa') where greedy
    left-to-right merging and pair counting interact."""
    data = {"aaaa": 3, "aaab": 2, "abab": 5, "bbaa": 1}
    df = spark.createDataFrame(
        [(list(w), c) for w, c in data.items()],
        "symbols array<string>, cnt bigint")
    got = bpe_train(df, n_merges=6)
    want = _ref_bpe(data, 6)
    assert got == want


def test_bpe_encode_counts_match_reference(spark, sf_dir):
    """Encoding law: per-doc BPE token counts after k learned merges
    equal the Python reference encoder applied to the same merges."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    words = word_symbol_table(docs)
    merges = bpe_train(words, n_merges=8)

    from etl_dados_ibge_sp_spark.operators.bpe import bpe_encode_counts
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode_counts(docs, merges).collect()}

    def encode_word(w):
        syms = list(w)
        for a, b, _ in merges:
            out, carry = [], None
            for s in syms:
                if carry is None:
                    carry = s
                elif carry == a and s == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            syms = out
        return len(syms)

    want = {}
    for r in docs.select("doc_id", "text").collect():
        ws = [w for w in r["text"].strip().split() if w]
        want[r["doc_id"]] = sum(encode_word(w) for w in ws)
    assert got == want


def test_bpe_reliable_checkpoint_identical(spark, tmp_path):
    """The reliable-checkpoint option must not change results — same
    contract as connected_components/pagerank's checkpoint_dir."""
    data = {"abab": 5, "aabb": 3, "bbbb": 2}
    df = spark.createDataFrame(
        [(list(w), c) for w, c in data.items()],
        "symbols array<string>, cnt bigint")
    plain = bpe_train(df, n_merges=5, checkpoint_every=2)
    reliable = bpe_train(df, n_merges=5, checkpoint_every=2,
                         checkpoint_dir=str(tmp_path / "ckpt"))
    assert plain == reliable
