"""Eleventh pending tranche (authored round 10, gated to round 11):
the dataset-GOVERNANCE family — the audit reports a training-data
pipeline publishes alongside the data it ships.  The round-10 split
family answered "did anything cross a split?"; this tranche answers
the four questions a data-governance review asks next: does each
document clear the published quality bar, did the distribution drift
between splits, can any document be singled out by its metadata, and
how duplicated is each source?

* **Gopher-style quality rules** — the published rule-based document
  filter (word count >= 50, mean word length in [3, 10], >= 80 %
  alphabetic words, >= 2 stopword hits) with every verdict decided in
  EXACT integer arithmetic (``3 <= mean <= 10`` is evaluated as
  ``3·n_tok <= sum_len AND sum_len <= 10·n_tok``), so no rule can
  flip on a float-rounding boundary between engines; the rounded
  ratios are display-only.
* **PSI split drift** — the Population Stability Index of the length
  distribution between the train split and each holdout, on a FIXED
  closed-form bin grid (``least(n_chars // 250, 9)``, all ten cells
  materialized) with Laplace-smoothed shares so empty cells
  contribute finitely.  Fixed bins — never data-derived quantiles —
  are what make the metric comparable across pipeline runs, and what
  keep the oracle closed-form.
* **k-anonymity audit** — equivalence-class census over the
  quasi-identifier (lang, source, length bucket): the class-size
  histogram a privacy review reads to find singleton documents that
  metadata alone re-identifies.
* **near-dup rate by source** — the governance face of the dedup
  family: which SOURCES contribute the near-duplicate mass (the
  df-pruned trigram-Jaccard >= 0.8 pair set of `dedup_containment` /
  `split_leakage_pairs`, rolled up per source).
* **length curriculum** — document-count and token-mass per
  (split x context-length bin): the table a curriculum/packing
  scheduler is parameterized by.

Every query is pure JVM expression work over one documents scan —
map-side partial aggregation onto grids of at most a few dozen rows
(sources x bins), so each holds trivially at 100 TB: the only
shuffles move pre-aggregated cells, except the near-dup census whose
pair-discovery scale path is the LSH substitution already measured
for the leakage query (the rollup itself is a two-column aggregate).

Deferral contract (same as every tranche): full DuckDB oracles now,
pytest parity from day one (tests/test_pending_r11.py), admission
when `registry_pending.admit` unlocks round-11 gated entries — the
round-10 rotation already carries the five-query split/PNG tranche,
so these five must not displace it; at round 11 the slack is
5*50 - 211 = 39 and the drain simulation in tests/test_pending_r11.py
proves the staleness bound survives the admission.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import text as T
from .registry_pending10 import _SPLIT_SQL, _TRI_SQL, _split_col
from .sources.parquet_source import load_table

_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_STOP = T.LANG_MARKERS["en"]
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOP)


# --------------------------------------------------------------------------
# Gopher-style quality rules
# --------------------------------------------------------------------------

def _q_quality_gopher_rules(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Rule-based document filter in the Gopher/MassiveText style:
    per-document verdicts for word count, mean word length, alphabetic
    word share, and stopword presence, plus the composite pass bit.
    Every rule is decided in exact integer arithmetic (cross-
    multiplied thresholds), so Spark and the oracle can never disagree
    on a boundary document; the two rounded ratios are reporting
    columns only.  One scan, zero shuffles before the (absent) agg —
    this is a map-only verdict at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    n_tok = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.length(t)).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("bigint")
    stop_hits = T.stopword_count(F.col("text"), _STOP)
    r_words = (n_tok >= 50).cast("bigint")
    r_wordlen = ((sum_len >= 3 * n_tok)
                 & (sum_len <= 10 * n_tok)).cast("bigint")
    r_alpha = (5 * n_alpha >= 4 * n_tok).cast("bigint")
    r_stop = (stop_hits >= 2).cast("bigint")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.round(sum_len.cast("double") / n_tok, 6).alias("mean_tok_len"),
        F.round(n_alpha.cast("double") / n_tok, 6).alias("alpha_ratio"),
        stop_hits.alias("stop_hits"),
        r_words.alias("r_words"), r_wordlen.alias("r_wordlen"),
        r_alpha.alias("r_alpha"), r_stop.alias("r_stop"),
        (r_words * r_wordlen * r_alpha * r_stop).alias("passes"),
    )


_GOPHER_SQL = f"""
WITH m AS (
    SELECT doc_id,
           CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
           CAST(list_sum(list_transform({_TOKS_SQL}, t -> len(t)))
                AS BIGINT) AS sum_len,
           CAST(len(list_filter({_TOKS_SQL},
                t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT)
               AS n_alpha,
           CAST(len(list_filter({_TOKS_SQL},
                t -> t IN ({_STOP_SQL}))) AS BIGINT) AS stop_hits
    FROM documents
)
SELECT doc_id, n_tok,
       round(sum_len * 1.0 / n_tok, 6) AS mean_tok_len,
       round(n_alpha * 1.0 / n_tok, 6) AS alpha_ratio,
       stop_hits,
       CAST(n_tok >= 50 AS BIGINT) AS r_words,
       CAST(sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok AS BIGINT)
           AS r_wordlen,
       CAST(5 * n_alpha >= 4 * n_tok AS BIGINT) AS r_alpha,
       CAST(stop_hits >= 2 AS BIGINT) AS r_stop,
       CAST(n_tok >= 50 AS BIGINT)
         * CAST(sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok AS BIGINT)
         * CAST(5 * n_alpha >= 4 * n_tok AS BIGINT)
         * CAST(stop_hits >= 2 AS BIGINT) AS passes
FROM m
"""


# --------------------------------------------------------------------------
# PSI drift between splits
# --------------------------------------------------------------------------

def _q_split_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the document-length distribution,
    train vs each holdout split, on the fixed ten-cell grid
    ``least(n_chars // 250, 9)`` with Laplace smoothing
    ``(c + 0.5) / (n + 5.0)``.  The grid is materialized outright
    (3 splits x 10 bins = 30 rows) so absent cells still contribute —
    smoothing makes ln finite everywhere.  Scale shape: one scan
    partial-aggregates onto 30 cells; everything after the first
    groupBy is constant-size work, so the query is scan-bound at any
    corpus size (the grid cross-join is 30 literal rows, not data)."""
    docs = load_table(spark, sf_dir, "documents")
    binned = docs.select(
        _split_col().alias("split"),
        F.least(F.floor(F.col("n_chars") / F.lit(250)),
                F.lit(9)).cast("bigint").alias("b"))
    cnt = binned.groupBy("split", "b").agg(
        F.count(F.lit(1)).alias("c"))
    grid = (spark.range(10).select(F.col("id").alias("b"))
            .crossJoin(spark.range(3).select(
                F.element_at(
                    F.array(F.lit("train"), F.lit("valid"),
                            F.lit("test")),
                    (F.col("id") + 1).cast("int")).alias("split"))))
    full = (grid.join(cnt, ["split", "b"], "left")
            .select("split", "b",
                    F.coalesce(F.col("c"), F.lit(0).cast("bigint"))
                     .alias("c")))
    tot = full.groupBy("split").agg(F.sum("c").alias("n"))
    p = (full.join(tot, "split")
         .select("split", "b", "n",
                 ((F.col("c") + F.lit(0.5))
                  / (F.col("n") + F.lit(5.0))).alias("p")))
    train = (p.filter(F.col("split") == "train")
             .select("b", F.col("p").alias("pt")))
    holdout = p.filter(F.col("split") != "train")
    term = (F.col("pt") - F.col("p")) * F.log(F.col("pt") / F.col("p"))
    return (holdout.join(train, "b")
            .groupBy("split")
            .agg(F.max("n").cast("bigint").alias("n_docs"),
                 F.round(F.sum(term), 6).alias("psi")))


_PSI_SQL = f"""
WITH d AS (
    SELECT {_SPLIT_SQL} AS split,
           least(n_chars // 250, 9) AS b
    FROM documents
), grid AS (
    SELECT s.split, g.b
    FROM (VALUES ('train'), ('valid'), ('test')) s(split),
         generate_series(0, 9) g(b)
), c AS (
    SELECT grid.split, grid.b, COALESCE(x.cnt, 0) AS c
    FROM grid LEFT JOIN (
        SELECT split, b, COUNT(*) AS cnt FROM d GROUP BY 1, 2
    ) x ON grid.split = x.split AND grid.b = x.b
), n AS (
    SELECT split, SUM(c) AS n FROM c GROUP BY 1
), p AS (
    SELECT c.split, c.b, n.n,
           (c.c + 0.5) / (n.n + 5.0) AS p
    FROM c JOIN n USING (split)
), t AS (
    SELECT b, p AS pt FROM p WHERE split = 'train'
)
SELECT p.split, CAST(MAX(p.n) AS BIGINT) AS n_docs,
       round(SUM((t.pt - p.p) * ln(t.pt / p.p)), 6) AS psi
FROM p JOIN t USING (b)
WHERE p.split <> 'train'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# k-anonymity audit
# --------------------------------------------------------------------------

def _q_k_anonymity_audit(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Equivalence-class census over the quasi-identifier
    (lang, source, n_chars // 100): how many documents sit in classes
    of size 1 / 2-4 / 5-19 / 20+ — the table a privacy review reads
    to find metadata-re-identifiable rows.  Two cheap aggregations:
    the first partial-aggregates the scan onto the QI grid
    (sources x langs x length buckets — thousands of cells at any
    corpus size), the second is constant-size."""
    docs = load_table(spark, sf_dir, "documents")
    classes = (docs.select(
        "lang", "source",
        F.floor(F.col("n_chars") / F.lit(100)).cast("bigint")
         .alias("nb"))
        .groupBy("lang", "source", "nb")
        .agg(F.count(F.lit(1)).alias("sz")))
    size_class = (F.when(F.col("sz") == 1, F.lit("1"))
                  .when(F.col("sz") < 5, F.lit("2-4"))
                  .when(F.col("sz") < 20, F.lit("5-19"))
                  .otherwise(F.lit("20+")))
    return (classes.select(size_class.alias("size_class"), "sz")
            .groupBy("size_class")
            .agg(F.count(F.lit(1)).alias("n_classes"),
                 F.sum("sz").cast("bigint").alias("n_docs"),
                 F.min("sz").cast("bigint").alias("min_k"),
                 F.max("sz").cast("bigint").alias("max_k")))


_KANON_SQL = """
WITH g AS (
    SELECT lang, source, n_chars // 100 AS nb, COUNT(*) AS sz
    FROM documents GROUP BY 1, 2, 3
)
SELECT CASE WHEN sz = 1 THEN '1' WHEN sz < 5 THEN '2-4'
            WHEN sz < 20 THEN '5-19' ELSE '20+' END AS size_class,
       COUNT(*) AS n_classes,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(MIN(sz) AS BIGINT) AS min_k,
       CAST(MAX(sz) AS BIGINT) AS max_k
FROM g GROUP BY 1
"""


# --------------------------------------------------------------------------
# Near-dup rate by source
# --------------------------------------------------------------------------

def _q_near_dup_rate_by_source(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Which sources contribute the near-duplicate mass: documents
    that appear in any trigram-Jaccard >= 0.8 pair (the df <= 50
    pruned inverted-index discovery shared with `dedup_containment`
    and `split_leakage_pairs`), counted per source against the
    source's total.  At 100 TB the pair discovery swaps to the
    LSH-banded candidates exactly as measured for the leakage query;
    the census itself is ONE documents pass — a left join against the
    flagged-id set feeding a single per-source rollup that counts
    total and flagged rows together.  (A semi-join census would scan
    documents twice, and Spark's PushDownLeftSemiAntiJoin rule pushes
    a left-semi join below the scan fan-out repartition, stranding a
    RoundRobin exchange mid-plan — the one-pass left join keeps the
    fan-out at the scan where the plan-hygiene law can see it.)

    Pair discovery consumes the SESSION-STAGED shared pair set
    (registry_pending10.trigram_neardup_pairs — identical arithmetic,
    previously rebuilt inline per invocation; optimization r12)."""
    from .registry_pending10 import trigram_neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = trigram_neardup_pairs(spark, sf_dir)
    dup_ids = (pairs.select(F.col("doc_a").alias("doc_id"))
               .union(pairs.select(F.col("doc_b").alias("doc_id")))
               .distinct())
    return (docs.select("doc_id", "source")
            .join(dup_ids.withColumn("__dup", F.lit(1)), "doc_id",
                  "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count("__dup").alias("n_near_dup"))
            .select("source", "n_docs", "n_near_dup",
                    F.round(F.col("n_near_dup") * F.lit(1.0)
                            / F.col("n_docs"), 6)
                     .alias("near_dup_rate")))


_NEARDUP_BY_SOURCE_SQL = f"""
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
), dup_ids AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.8
        UNION ALL
        SELECT doc_b AS doc_id FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.8
    )
), flagged AS (
    SELECT source, COUNT(*) AS n_near_dup
    FROM documents SEMI JOIN dup_ids USING (doc_id)
    GROUP BY 1
)
SELECT d.source, COUNT(*) AS n_docs,
       COALESCE(MAX(f.n_near_dup), 0) AS n_near_dup,
       round(COALESCE(MAX(f.n_near_dup), 0) * 1.0 / COUNT(*), 6)
           AS near_dup_rate
FROM documents d LEFT JOIN flagged f ON d.source = f.source
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Length curriculum
# --------------------------------------------------------------------------

def _q_split_length_curriculum(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Document count and token mass per (split x context-length bin)
    — the table a packing/curriculum scheduler is parameterized by.
    Pure projection + one partial-aggregated groupBy onto a
    splits x bins grid of at most 15 cells."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = T.token_count(F.col("text"))
    len_bin = (F.when(n_tok <= 32, F.lit("xs"))
               .when(n_tok <= 64, F.lit("sm"))
               .when(n_tok <= 128, F.lit("md"))
               .when(n_tok <= 256, F.lit("lg"))
               .otherwise(F.lit("xl")))
    return (docs.select(_split_col().alias("split"),
                        len_bin.alias("len_bin"),
                        n_tok.alias("n_tok"), "n_chars")
            .groupBy("split", "len_bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("sum_tokens"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars")))


_CURRICULUM_SQL = f"""
WITH d AS (
    SELECT {_SPLIT_SQL} AS split,
           CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok, n_chars
    FROM documents
)
SELECT split,
       CASE WHEN n_tok <= 32 THEN 'xs' WHEN n_tok <= 64 THEN 'sm'
            WHEN n_tok <= 128 THEN 'md' WHEN n_tok <= 256 THEN 'lg'
            ELSE 'xl' END AS len_bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM d GROUP BY 1, 2
"""


# (earliest admission round, name, oracle_sql, fn) — consumed by
# registry_pending.PENDING_GATED.
PENDING11_GATED: list[tuple[int, str, str,
                            Callable[[SparkSession, str],
                                     DataFrame]]] = [
    (11, "quality_gopher_rules", _GOPHER_SQL, _q_quality_gopher_rules),
    (11, "split_psi_drift", _PSI_SQL, _q_split_psi_drift),
    (11, "k_anonymity_audit", _KANON_SQL, _q_k_anonymity_audit),
    (11, "near_dup_rate_by_source", _NEARDUP_BY_SOURCE_SQL,
     _q_near_dup_rate_by_source),
    (11, "split_length_curriculum", _CURRICULUM_SQL,
     _q_split_length_curriculum),
]
