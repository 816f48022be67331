"""Tenth pending tranche (authored round 9, gated to round 10): the
dataset-SPLIT family — the train/valid/test mechanics every
training-data pipeline runs after curation, closing the gap between
the dedup/decontamination operators (which find duplicates) and the
question users actually ship on: *did any of them cross a split?*

* **Deterministic hash split** — 80/10/10 assignment from a
  closed-form multiplicative hash of the stable id (Knuth's
  2654435761 mod 2³²), never `rand()`: reproducible across runs,
  engines, and partitionings, join-free, and usable as a partition
  column at ingest.  (At petabyte scale with arbitrary ids the same
  shape runs on `xxhash64`; the closed-form constant is what keeps
  the DuckDB oracle exact — same trade as the pinned n_bits/k in the
  dedup family.  Spark's bigint multiply bounds doc_id <
  2⁶³/2654435761 ≈ 3.46e9 (~2³¹·⁷) before ANSI overflow — the same
  bound DuckDB's BIGINT enforces; the testdata ids are far inside,
  and ids beyond it would take the xxhash64 form anyway.)
* **N-gram novelty** — per arriving doc (the ``doc_id % 7`` arrival
  convention of `dedup_incremental_load`), the fraction of its
  distinct word-trigrams absent from the warehouse: the
  novelty/memorization signal dataset curators track alongside
  quality.  One anti-join keyed by gram — the `text_decontaminate`
  shape pointed at the corpus itself.
* **Cross-split leakage** — trigram-Jaccard ≥ 0.8 near-dup pairs
  whose members landed in DIFFERENT splits: the train/test
  contamination report.  Pair discovery is the df-pruned inverted
  index of `dedup_containment` (grams with posting lists > 50 docs
  are dropped before the pair join, bounding fan-out to maxdf² per
  gram); at 100 TB the candidate pairs come from `dedup_minhash_lsh`
  and only the verdict join changes — the split/leakage logic is
  identical.

Deferral contract (same as every tranche): full DuckDB oracles now,
pytest parity from day one (tests/test_pending_r10.py), admission
when `registry_pending.admit` unlocks round-10 gated entries — the
round-9 rotation is exactly budget-full (vocab_topk + 49 of the r5
cohort), so these three must NOT displace it; at round 10 the slack
is 5·50 − 201 = 49 and the drain simulation in
tests/test_pending_r10.py proves the staleness bound survives the
admission.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.parquet_source import load_table

# Closed-form 80/10/10 split: bucket = (id * 2654435761 mod 2^32)
# mod 10; 8 -> valid, 9 -> test, else train.  Integer arithmetic is
# bit-identical in both engines.
_SPLIT_SQL = ("CASE ((doc_id * 2654435761) % 4294967296) % 10 "
              "WHEN 8 THEN 'valid' WHEN 9 THEN 'test' "
              "ELSE 'train' END")


def _split_col() -> F.Column:
    b = F.pmod(F.pmod(F.col("doc_id") * F.lit(2654435761),
                      F.lit(4294967296)), F.lit(10))
    return (F.when(b == 8, F.lit("valid"))
             .when(b == 9, F.lit("test"))
             .otherwise(F.lit("train")))


def _q_split_train_valid_test(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split with per-split descriptive stats.
    Pure projection + a 3-group aggregate: map-side partial
    aggregation, one constant-size shuffle, no sampling skew — the
    assignment is a function of the id alone, so re-running the
    pipeline (or re-partitioning the table) can never move a document
    between splits."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(_split_col().alias("split"),
                        "doc_id", "n_chars")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))


_SPLIT_STATS_SQL = f"""
SELECT {_SPLIT_SQL} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents GROUP BY 1
"""

# Word trigrams, DuckDB rendering identical to registry_pending6's
# containment oracle (word_shingles(n=3): trim -> \s+ split ->
# distinct 3-token windows).
_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_TRI_SQL = (f"list_transform(generate_series(1, len({_TOKS_SQL}) - 2), "
            f"i -> array_to_string(({_TOKS_SQL})[i:i+2], ' '))")


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per arriving doc, the fraction of its distinct word-trigrams
    the warehouse has never seen.  The anti-join is keyed by gram —
    partial-aggregated, shuffle carries (gram, id) pairs only; at
    100 TB the warehouse gram set is the stored decontamination index
    (or its bloom digest — `text_decontaminate`'s documented scale
    path), so the arrival cost is O(batch grams)."""
    from .operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    bg = word_shingles(docs.filter(F.col("doc_id") % 7 == 0),
                       "doc_id", "text", n=3)
    wg = (word_shingles(docs.filter(F.col("doc_id") % 7 != 0),
                        "doc_id", "text", n=3)
          .select("shingle").distinct())
    tot = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    nov = (bg.join(wg, "shingle", "left_anti")
             .groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_novel")))
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0).cast("long"))
    return (tot.join(nov, "doc_id", "left")
            .select("doc_id", "n_grams",
                    n_novel.alias("n_novel"),
                    F.round(n_novel / F.col("n_grams"), 6)
                     .alias("novelty")))


_NGRAM_NOVELTY_SQL = f"""
WITH bg AS (
    SELECT doc_id, unnest(list_distinct({_TRI_SQL})) AS shingle
    FROM documents WHERE doc_id % 7 = 0
), wg AS (
    SELECT DISTINCT unnest(list_distinct({_TRI_SQL})) AS shingle
    FROM documents WHERE doc_id % 7 <> 0
), tot AS (
    SELECT doc_id, COUNT(*) AS n_grams FROM bg GROUP BY 1
), nov AS (
    SELECT bg.doc_id, COUNT(*) AS n_novel
    FROM bg ANTI JOIN wg USING (shingle) GROUP BY 1
)
SELECT t.doc_id, t.n_grams,
       COALESCE(n.n_novel, 0) AS n_novel,
       round(COALESCE(n.n_novel, 0) * 1.0 / t.n_grams, 6) AS novelty
FROM tot t LEFT JOIN nov n ON t.doc_id = n.doc_id
"""


def _q_split_leakage_pairs(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Train/test contamination report: trigram-Jaccard ≥ 0.8 near-dup
    pairs that straddle splits.  Same df-pruned inverted index as
    `dedup_containment` (posting lists > 50 docs dropped before the
    pair join — fan-out bounded by maxdf² per gram, sizes measured on
    the same pruned set the intersection uses); the split columns ride
    two skinny (id, split) joins.  At 100 TB substitute the
    LSH-banded candidates for the inverted-index pair join — the
    leakage verdict is unchanged."""
    from .operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh0 = word_shingles(docs, "doc_id", "text", n=3)
    keep = (sh0.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= 50)
            .select("shingle"))
    sh = sh0.join(keep, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("i")))
    jac = F.round(
        F.col("i") * F.lit(1.0) /
        (F.col("__sa") + F.col("__sb") - F.col("i")), 6)
    pairs = (inter
             .join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("sz").alias("__sa")), "doc_a")
             .join(sizes.select(F.col("doc_id").alias("doc_b"),
                                F.col("sz").alias("__sb")), "doc_b")
             .select("doc_a", "doc_b", jac.alias("jaccard"))
             .filter(F.col("jaccard") >= 0.8))
    sp = docs.select("doc_id", _split_col().alias("split"))
    return (pairs
            .join(sp.select(F.col("doc_id").alias("doc_a"),
                            F.col("split").alias("split_a")), "doc_a")
            .join(sp.select(F.col("doc_id").alias("doc_b"),
                            F.col("split").alias("split_b")), "doc_b")
            .filter(F.col("split_a") != F.col("split_b"))
            .select("doc_a", "doc_b", "split_a", "split_b", "jaccard"))


_SPLIT_LEAKAGE_SQL = f"""
WITH sh0 AS (
    SELECT doc_id, unnest(list_distinct({_TRI_SQL})) AS shingle
    FROM documents
), keep AS (
    SELECT shingle FROM sh0 GROUP BY 1 HAVING COUNT(*) <= 50
), sh AS (
    SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM sh a JOIN sh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), p AS (
    SELECT doc_a, doc_b,
           round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.8
), d AS (
    SELECT doc_id, {_SPLIT_SQL} AS split FROM documents
)
SELECT doc_a, doc_b, da.split AS split_a, db.split AS split_b, jaccard
FROM p
JOIN d da ON doc_a = da.doc_id
JOIN d db ON doc_b = db.doc_id
WHERE da.split <> db.split
"""


# (earliest admission round, name, oracle_sql, fn) — consumed by
# registry_pending.PENDING_GATED.
PENDING10_GATED: list[tuple[int, str, str,
                            Callable[[SparkSession, str],
                                     DataFrame]]] = [
    (10, "split_train_valid_test", _SPLIT_STATS_SQL,
     _q_split_train_valid_test),
    (10, "ngram_novelty", _NGRAM_NOVELTY_SQL, _q_ngram_novelty),
    (10, "split_leakage_pairs", _SPLIT_LEAKAGE_SQL,
     _q_split_leakage_pairs),
]
