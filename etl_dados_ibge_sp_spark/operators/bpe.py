"""Byte-pair-encoding tokenizer training, DataFrame-native.

Classic BPE (Sennrich et al. 2016): train on the WORD-FREQUENCY
dictionary, not raw text — the corpus collapses to (word, count) pairs
once (at 100 TB the dictionary is millions of rows where the corpus is
trillions of tokens; every iteration then touches only the
dictionary).  Each merge step is:

1. adjacent-pair counts: one in-row ``transform`` over each word's
   symbol array weighted by the word count, exploded and summed —
   map-side combinable, one small shuffle keyed by pair;
2. best pair: global argmax with lexicographic tie-break — a 1-row
   ``collect`` (the k-iteration driver barrier is k scalars, the same
   "model, not data" trade as ``similarity.kmeans_fit``, and k is the
   vocab-size hyperparameter);
3. merge: rewrite every word's symbol array left-to-right with a pure
   JVM ``aggregate`` fold (carry/emit automaton — handles overlapping
   occurrences exactly like the reference greedy implementation).

No Python touches a row; the per-iteration lineage grows linearly, so
``bpe_train`` localCheckpoints the dictionary every few merges (same
lineage-cut pattern as connected components).

Exactness law (tests): the learned merge table equals a pure-Python
reference BPE on the same corpus, tie-break for tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols, cnt) dictionary: whitespace words split to character
    symbols, counted.  The one corpus-sized pass of BPE training."""
    from .text import tokens
    words = (docs.select(F.explode(tokens(F.col(text_col)))
                         .alias("word"))
             .filter(F.length("word") > 0)
             .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    return words.select(F.split("word", "").alias("symbols"), "cnt")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count: in-row zip of the
    array with its own tail, then explode + sum."""
    n = F.size("symbols")
    pairs = F.transform(
        F.slice("symbols", 1, n - 1),
        lambda s, i: F.struct(
            s.alias("left"),
            F.element_at("symbols", i + 2).alias("right")))
    return (words.filter(n >= 2)
            .select(F.explode(pairs).alias("p"), "cnt")
            .groupBy("p.left", "p.right")
            .agg(F.sum("cnt").alias("pair_cnt")))


def _merge_pair(symbols: Column, a: str, b: str) -> Column:
    """Left-to-right greedy merge of (a, b) -> a+b via an aggregate
    fold (carry/emit automaton); overlapping runs merge exactly as the
    reference implementation does."""
    return F.aggregate(
        symbols,
        F.struct(F.array().cast("array<string>").alias("out"),
                 F.lit(None).cast("string").alias("carry")),
        lambda acc, s: F.when(
            acc["carry"].isNull(),
            F.struct(acc["out"].alias("out"), s.alias("carry")))
        .when((acc["carry"] == F.lit(a)) & (s == F.lit(b)),
              F.struct(F.concat(acc["out"], F.array(F.lit(a + b)))
                       .alias("out"),
                       F.lit(None).cast("string").alias("carry")))
        .otherwise(F.struct(F.concat(acc["out"], F.array(acc["carry"]))
                            .alias("out"), s.alias("carry"))),
        lambda acc: F.when(acc["carry"].isNull(), acc["out"])
        .otherwise(F.concat(acc["out"], F.array(acc["carry"]))))


def bpe_train(words: DataFrame, n_merges: int,
              checkpoint_every: int = 4,
              checkpoint_dir: str | None = None
              ) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (symbols, cnt) dictionary.

    Returns [(left, right, pair_count), ...] in merge order.  Ties on
    pair count break lexicographically on (left, right) — pinned so
    the result is engine- and partitioning-independent.

    ``checkpoint_dir``: when set, the periodic lineage cut takes a
    *reliable* checkpoint written to that directory (HDFS/S3 on a
    cluster) — the same contract as ``dedup.connected_components`` and
    ``graph.pagerank``.  The default ``localCheckpoint`` stores
    executor-local blocks, which a lost executor invalidates
    mid-training; long multi-thousand-merge cluster runs should pass
    a dir.
    """
    if checkpoint_dir is not None:
        words.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (_pair_counts(words)
               .orderBy(F.desc("pair_cnt"), F.asc("left"),
                        F.asc("right"))
               .limit(1).collect())
        if not top:
            break
        a, b, c = top[0]["left"], top[0]["right"], int(top[0]["pair_cnt"])
        merges.append((a, b, c))
        words = words.select(_merge_pair(F.col("symbols"), a, b)
                             .alias("symbols"), "cnt")
        if (i + 1) % checkpoint_every == 0:
            # Cut the per-iteration lineage like connected_components;
            # the dictionary is small, the plan otherwise nests k folds.
            if checkpoint_dir is not None:
                words = words.checkpoint(eager=True)
            else:
                words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode_counts(docs: DataFrame, merges: list[tuple[str, str, int]],
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge table and return per-document BPE token
    counts: (id_col, n_bpe_tokens).

    Encoding is ENTIRELY in-row — words from one ``split``, each word's
    symbol array folded through the merges in training order (the same
    carry/emit automaton as training, nested inside a ``transform``
    over the word array), then one in-row sum of sizes.  No shuffle,
    no Python, no join: the merge table is baked into the expression
    tree as literals (it IS the model — k entries).  Expression depth
    grows linearly with k; for production-sized vocabularies (k ~ 30k)
    encoding moves to a broadcast trie + mapInPandas, but the
    law-pinned semantics stay these."""
    from .text import tokens

    def encode(word: Column) -> Column:
        syms = F.split(word, "")
        for a, b, _cnt in merges:
            syms = _merge_pair(syms, a, b)
        return F.size(syms)

    per_word = F.transform(tokens(F.col(text_col)),
                           lambda w: F.when(F.length(w) > 0, encode(w))
                           .otherwise(F.lit(0)))
    total = F.aggregate(per_word, F.lit(0),
                        lambda acc, n: acc + n).cast("bigint")
    return docs.select(id_col, total.alias("n_bpe_tokens"))
