"""Full-text relevance ranking (BM25) over the documents table.

The LLM-data-pipeline use case: score a corpus against a query term
set (quality filtering by topicality, retrieval-style curation) with
nothing but JVM expressions — no inverted index service, no Python.

Design for 100 TB:

* **No explode, no per-term shuffle.**  Term frequencies for the
  (small, fixed) query term set are per-row ``filter(tokens, t = w)``
  array folds — the doc never leaves its partition; the whole scoring
  pass is a narrow map over the corpus.
* **One scalar aggregate.**  N, total length, and every per-term
  document frequency come out of a single global ``agg`` (one row),
  broadcast back onto the scan.  Two passes over the corpus total,
  both full-scan-friendly; nothing quadratic, nothing keyed.
* **Top-k via TakeOrdered** (per-partition heaps), not a global sort.

Determinism (bit-exact vs the DuckDB oracle): the idf is the
Robertson–Spärck-Jones ratio **without the log** —
``(N - df + 0.5) / (df + 0.5)`` — monotone in the usual log idf for a
single term, and pure rational IEEE arithmetic, so Spark and any ANSI
engine produce identical doubles (libm ``ln`` rounding is not
portable; the repo-wide rule is no transcendentals in checked
outputs).  Per-doc scores sum the query terms in fixed query order
(left-associated), so no float-order nondeterminism.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalized_text

K1 = 1.2
B = 0.75


def _tf(tokens_col: F.Column, term: str) -> F.Column:
    return F.size(
        F.filter(tokens_col, lambda t: t == F.lit(term))
    ).cast("double")


def bm25_topk(docs: DataFrame, terms: Sequence[str], k: int,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = K1, b: float = B) -> DataFrame:
    """Top-k documents by (rational-idf) BM25 against ``terms``.

    Output: ``(id_col, bm25)``, best first, ties broken by id.
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    scored_in = docs.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("__dl"),
        *[_tf(toks, t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )
    stats = scored_in.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (F.sum(F.col("__dl").cast("long")).cast("double") /
         F.count(F.lit(1))).alias("__avgdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("long")).cast("double")
          .alias(f"__df{i}") for i in range(len(terms))],
    )
    j = scored_in.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}")
        idf = (F.col("__n") - F.col(f"__df{i}") + 0.5) / \
            (F.col(f"__df{i}") + 0.5)
        norm = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) +
                                 F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        score = score + idf * (tf * (F.lit(k1) + F.lit(1.0))) / norm
    return (
        j.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def bm25_oracle_sql(terms: Sequence[str], k: int,
                    norm_sql: str,
                    k1: float = K1, b: float = B) -> str:
    """DuckDB rendering of the identical arithmetic (same literals,
    same association order) for the correctness oracle."""
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms))
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"((n - df{i} + 0.5) / (df{i} + 0.5)) * (tf{i} * ({k1!r} + 1.0)) "
        f"/ (tf{i} + {k1!r} * (1.0 - {b!r} + {b!r} * dl / avgdl))"
        for i in range(len(terms)))
    return f"""
WITH d AS (
  SELECT doc_id, string_split({norm_sql}, ' ') AS toks FROM documents
), t AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         {tf_cols}
  FROM d
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM t
)
SELECT doc_id, round(0.0 + {score}, 6) AS bm25
FROM t, s
ORDER BY bm25 DESC, doc_id
LIMIT {k}
"""
