"""Twelfth pending tranche (authored round 11, gated to round 12):
the data-MIX-ENGINEERING family — the budgeting tables a training run
is actually planned from, sitting one level above the governance
audits of tranche 11.  Governance asked "is the data clean / private /
balanced?"; this tranche answers "given this corpus, what do we
train on?": how many epochs each source must repeat to meet its token
allocation (and where the data runs out), which filter rule is doing
the removal work, whether any metadata class is language-revealing,
the one-row-per-source datasheet, and the quality-vs-token-budget
frontier.

* **epoch / repeat budget** — the data-constrained-scaling table
  (Muennighoff et al. 2023: repeating data up to ~4 epochs retains
  most of its value; beyond that returns collapse).  Per source: the
  served token mass (every doc counted as stored), the UNIQUE token
  mass (each distinct normalized content counted once — repetition a
  training run can deduplicate away), the allocation under a literal
  2x-corpus token target proportional to stored mass, and the epochs
  over the unique pool needed to serve it, capped at 4 with the
  shortfall made explicit.  Everything is exact BIGINT arithmetic —
  ceil-division is ``(a + u - 1) div u``, never a float — so no
  engine pair can disagree on an epoch count.
* **Gopher rule attribution** — the filter-ablation census for the
  tranche-11 quality rules: per rule, how many documents fail it and
  how many fail ONLY it (the rule's exclusive removal — the number
  that tells you what loosening one threshold would actually buy).
  One map-side aggregation to a single row of sums, unpivoted to four
  literal rows.
* **l-diversity audit** — the complement of tranche 11's k-anonymity:
  k-anonymity counts class SIZES over the quasi-identifier; this
  counts DISTINCT SENSITIVE VALUES (lang) per (source, length-bucket)
  class.  A class can be large yet still reveal its members' language
  (l = 1) — the failure k-anonymity cannot see.
* **source datacard** — the per-source datasheet row (docs, unique
  contents, token mass, language spread, exact-dup rate, corpus
  share): the table a datasheet/model-card pipeline publishes, and
  the join key for every other per-source audit.
* **quality/token tradeoff** — the selection frontier: bucket every
  document by how many of the four quality rules it passes (0-4) and
  accumulate token mass from the best grade down — "if the bar is
  grade >= g, this many tokens survive".  Pure integers until the
  display shares.

Scale shape: every query is one documents scan partial-aggregated
onto a grid no bigger than sources x grades; the two content-keyed
steps (unique mass, datacard uniques) shuffle md5 fingerprints, never
bodies — the exact-dedup shuffle shape already measured flat through
sf10.0.  No joins against data-scaled sides anywhere (the one
crossJoin is a 1-row corpus-total frame).

Deferral contract (same as every tranche): full DuckDB oracles now,
pytest parity from day one (tests/test_pending_r12.py), admission
when `registry_pending.admit` unlocks round-12 gated entries — the
round-11 rotation carries the five-query governance tranche, so these
five must not displace it; at round 12 the registry sits at 216 and
the slack is 5*50 - 216 = 34; the drain simulation in
tests/test_pending_r12.py proves the 5-round staleness bound survives
the admission.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import text as T
from .sources.parquet_source import load_table

_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_NORM_SQL = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_STOP = T.LANG_MARKERS["en"]
_STOP_SQL = ", ".join(f"'{w}'" for w in _STOP)

# The tranche-11 Gopher thresholds (registry_pending11._q_quality_
# gopher_rules), re-derived here in the same exact-integer form so the
# attribution census and the tradeoff frontier can never disagree with
# the per-document verdict query on a boundary document.
_RULES = ("words", "wordlen", "alpha", "stop")


def _gopher_bits(docs: DataFrame) -> DataFrame:
    """doc_id, source, n_tok, and the four exact-integer rule bits."""
    toks = T.tokens(F.col("text"))
    n_tok = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.length(t)).cast("bigint")
    n_alpha = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("bigint")
    stop_hits = T.stopword_count(F.col("text"), _STOP)
    return docs.select(
        "doc_id", "source",
        n_tok.alias("n_tok"),
        (n_tok >= 50).cast("bigint").alias("b_words"),
        ((sum_len >= 3 * n_tok) & (sum_len <= 10 * n_tok))
        .cast("bigint").alias("b_wordlen"),
        (5 * n_alpha >= 4 * n_tok).cast("bigint").alias("b_alpha"),
        (stop_hits >= 2).cast("bigint").alias("b_stop"),
    )


_BITS_SQL = f"""
    SELECT doc_id, source,
           CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
           CAST(len({_TOKS_SQL}) >= 50 AS BIGINT) AS b_words,
           CAST(list_sum(list_transform({_TOKS_SQL}, t -> len(t)))
                    >= 3 * len({_TOKS_SQL})
                AND list_sum(list_transform({_TOKS_SQL}, t -> len(t)))
                    <= 10 * len({_TOKS_SQL}) AS BIGINT) AS b_wordlen,
           CAST(5 * len(list_filter({_TOKS_SQL},
                    t -> regexp_matches(t, '[A-Za-z]')))
                    >= 4 * len({_TOKS_SQL}) AS BIGINT) AS b_alpha,
           CAST(len(list_filter({_TOKS_SQL},
                    t -> t IN ({_STOP_SQL}))) >= 2 AS BIGINT) AS b_stop
    FROM documents
"""


# --------------------------------------------------------------------------
# Epoch / repeat budget (data-constrained scaling)
# --------------------------------------------------------------------------

_TARGET_MULT = 2  # token target = 2x the stored corpus, per source
_EPOCH_CAP = 4    # the published point of collapsing returns


def _q_epoch_repeat_budget(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Per-source repeat budget under a 2x-stored-mass token target
    served from the exact-deduped pool, epochs capped at 4.

    Unique mass first groups (source, content_key) — the md5
    fingerprint shuffle of exact dedup, never bodies; token count is a
    function of the normalized content, so min() over the group is
    exact, not a choice.  The budget arithmetic is all BIGINT:
    ``epochs_needed = (alloc + unique - 1) div unique`` is exact
    ceil-division, so a boundary allocation can never flip on float
    rounding between engines."""
    docs = load_table(spark, sf_dir, "documents")
    per_content = (docs.select(
        "source",
        T.fingerprint_md5(F.col("text")).alias("content_key"),
        T.token_count(F.col("text")).alias("n_tok"))
        .groupBy("source", "content_key")
        .agg(F.min("n_tok").alias("n_tok"),
             F.count(F.lit(1)).alias("n_copies")))
    per_source = per_content.groupBy("source").agg(
        F.sum(F.col("n_tok") * F.col("n_copies")).cast("bigint")
         .alias("stored_tokens"),
        F.sum("n_tok").cast("bigint").alias("unique_tokens"))
    alloc = (F.lit(_TARGET_MULT) * F.col("stored_tokens")).cast("bigint")
    budget = per_source.select(
        "source", "stored_tokens", "unique_tokens",
        alloc.alias("alloc_tokens"))
    epochs_needed = F.expr(
        "(alloc_tokens + unique_tokens - 1) div unique_tokens")
    served = F.least(F.col("alloc_tokens"),
                     F.lit(_EPOCH_CAP) * F.col("unique_tokens"))
    return budget.select(
        "source", "stored_tokens", "unique_tokens", "alloc_tokens",
        epochs_needed.cast("bigint").alias("epochs_needed"),
        F.least(epochs_needed, F.lit(_EPOCH_CAP)).cast("bigint")
         .alias("epochs_capped"),
        served.cast("bigint").alias("tokens_served"),
        (F.col("alloc_tokens") - served).cast("bigint")
         .alias("shortfall"),
        F.round(F.lit(1.0) - F.col("unique_tokens")
                / F.col("stored_tokens"), 6).alias("dup_rate"),
    )


_EPOCH_SQL = f"""
WITH per_content AS (
    SELECT source, md5({_NORM_SQL}) AS content_key,
           MIN(CAST(len({_TOKS_SQL}) AS BIGINT)) AS n_tok,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1, 2
), per_source AS (
    SELECT source,
           CAST(SUM(n_tok * n_copies) AS BIGINT) AS stored_tokens,
           CAST(SUM(n_tok) AS BIGINT) AS unique_tokens
    FROM per_content GROUP BY 1
), budget AS (
    SELECT source, stored_tokens, unique_tokens,
           CAST({_TARGET_MULT} * stored_tokens AS BIGINT) AS alloc_tokens
    FROM per_source
)
SELECT source, stored_tokens, unique_tokens, alloc_tokens,
       CAST((alloc_tokens + unique_tokens - 1) // unique_tokens
            AS BIGINT) AS epochs_needed,
       CAST(least((alloc_tokens + unique_tokens - 1) // unique_tokens,
                  {_EPOCH_CAP}) AS BIGINT) AS epochs_capped,
       CAST(least(alloc_tokens, {_EPOCH_CAP} * unique_tokens)
            AS BIGINT) AS tokens_served,
       CAST(alloc_tokens
            - least(alloc_tokens, {_EPOCH_CAP} * unique_tokens)
            AS BIGINT) AS shortfall,
       round(1.0 - unique_tokens * 1.0 / stored_tokens, 6) AS dup_rate
FROM budget
"""


# --------------------------------------------------------------------------
# Gopher rule attribution (filter ablation)
# --------------------------------------------------------------------------

def _q_gopher_rule_attribution(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Per-rule removal census: documents failing each rule, and
    failing ONLY that rule (what loosening it alone would recover).
    One partial aggregation onto a single row of nine BIGINT sums,
    then an in-row unpivot to four literal rows — constant-size work
    after the scan at any corpus size."""
    bits = _gopher_bits(load_table(spark, sf_dir, "documents"))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for r in _RULES:
        others = [f"b_{o}" for o in _RULES if o != r]
        fail = 1 - F.col(f"b_{r}")
        excl = fail * F.col(others[0]) * F.col(others[1]) \
            * F.col(others[2])
        aggs.append(F.sum(fail).cast("bigint").alias(f"nf_{r}"))
        aggs.append(F.sum(excl).cast("bigint").alias(f"ne_{r}"))
    one = bits.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(r).alias("rule"),
                 F.col(f"nf_{r}").alias("n_fail"),
                 F.col(f"ne_{r}").alias("n_fail_exclusive"),
                 F.col("n_docs").alias("n_docs"))
        for r in _RULES])
    return (one.select(F.explode(rows).alias("x"))
            .select("x.rule", "x.n_fail", "x.n_fail_exclusive",
                    F.round(F.col("x.n_fail") * F.lit(1.0)
                            / F.col("x.n_docs"), 6).alias("fail_rate")))


def _attr_leg(rule: str) -> str:
    others = [o for o in _RULES if o != rule]
    prod = " * ".join(f"b_{o}" for o in others)
    return f"""
    SELECT '{rule}' AS rule,
           CAST(SUM(1 - b_{rule}) AS BIGINT) AS n_fail,
           CAST(SUM((1 - b_{rule}) * {prod}) AS BIGINT)
               AS n_fail_exclusive,
           round(SUM(1 - b_{rule}) * 1.0 / COUNT(*), 6) AS fail_rate
    FROM bits"""


_ATTR_SQL = (f"WITH bits AS ({_BITS_SQL})"
             + " UNION ALL ".join(_attr_leg(r) for r in _RULES))


# --------------------------------------------------------------------------
# l-diversity audit
# --------------------------------------------------------------------------

def _q_l_diversity_audit(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Distinct-language census per (source, n_chars // 100) class:
    the histogram over l = |distinct langs| a privacy review reads to
    find classes whose membership alone reveals the language.  Two
    aggregations: the first lands on the QI grid (sources x length
    buckets — thousands of cells at any corpus size), the second is
    constant-size."""
    docs = load_table(spark, sf_dir, "documents")
    classes = (docs.select(
        "source",
        F.floor(F.col("n_chars") / F.lit(100)).cast("bigint")
         .alias("nb"), "lang")
        .groupBy("source", "nb")
        .agg(F.countDistinct("lang").cast("bigint").alias("l"),
             F.count(F.lit(1)).alias("sz")))
    return (classes.groupBy("l")
            .agg(F.count(F.lit(1)).alias("n_classes"),
                 F.sum("sz").cast("bigint").alias("n_docs"),
                 F.min("sz").cast("bigint").alias("min_sz"),
                 F.max("sz").cast("bigint").alias("max_sz")))


_LDIV_SQL = """
WITH g AS (
    SELECT source, n_chars // 100 AS nb,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS l,
           COUNT(*) AS sz
    FROM documents GROUP BY 1, 2
)
SELECT l, COUNT(*) AS n_classes,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(MIN(sz) AS BIGINT) AS min_sz,
       CAST(MAX(sz) AS BIGINT) AS max_sz
FROM g GROUP BY 1
"""


# --------------------------------------------------------------------------
# Source datacard
# --------------------------------------------------------------------------

def _q_source_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One datasheet row per source: docs, distinct contents, token
    mass, language spread, exact-dup rate, share of the corpus token
    mass.  The distinct-content count shuffles md5 fingerprints (the
    exact-dedup shape); the corpus total is an unpartitioned window
    over the PER-SOURCE frame (|sources| rows — the single-partition
    window is bounded by the grid, never by data), NOT an
    agg+crossJoin of the same subtree: Catalyst compiles that as a
    second full documents scan (measured scans=2 in the first plan
    audit), and at 100 TB a datasheet must not read the corpus
    twice."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source", "lang",
        T.fingerprint_md5(F.col("text")).alias("content_key"),
        T.token_count(F.col("text")).alias("n_tok"))
    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("content_key").cast("bigint")
         .alias("n_unique"),
        F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    return per_source.select(
        "source", "n_docs", "n_unique", "sum_tokens", "n_langs",
        F.round(F.lit(1.0) - F.col("n_unique")
                / F.col("n_docs"), 6).alias("exact_dup_rate"),
        F.round(F.col("sum_tokens") * F.lit(1.0)
                / F.col("n_docs"), 6).alias("mean_tokens"),
        F.round(F.col("sum_tokens") * F.lit(1.0)
                / F.sum("sum_tokens").over(w_all), 6)
         .alias("corpus_share"))


_DATACARD_SQL = f"""
WITH base AS (
    SELECT source, lang, md5({_NORM_SQL}) AS content_key,
           CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
    FROM documents
), per_source AS (
    SELECT source, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT content_key) AS BIGINT) AS n_unique,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM base GROUP BY 1
)
SELECT source, n_docs, n_unique, sum_tokens, n_langs,
       round(1.0 - n_unique * 1.0 / n_docs, 6) AS exact_dup_rate,
       round(sum_tokens * 1.0 / n_docs, 6) AS mean_tokens,
       round(sum_tokens * 1.0
             / (SELECT SUM(sum_tokens) FROM per_source), 6)
           AS corpus_share
FROM per_source
"""


# --------------------------------------------------------------------------
# Quality / token tradeoff frontier
# --------------------------------------------------------------------------

def _q_quality_token_tradeoff(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Token mass available at each quality bar: grade = number of
    Gopher rules passed (0-4); cumulative token mass from the best
    grade down is the frontier a budget planner reads ("a bar of
    grade >= g leaves this many tokens").  One scan onto a <= 5-row
    grade rollup; the cumulative window runs over those 5 rows."""
    bits = _gopher_bits(load_table(spark, sf_dir, "documents"))
    grade = (F.col("b_words") + F.col("b_wordlen") + F.col("b_alpha")
             + F.col("b_stop")).alias("grade")
    by_grade = (bits.select(grade, "n_tok")
                .groupBy("grade")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("n_tok").cast("bigint").alias("sum_tokens")))
    w = (Window.orderBy(F.col("grade").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    total = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    return by_grade.select(
        "grade", "n_docs", "sum_tokens",
        F.sum("sum_tokens").over(w).cast("bigint").alias("cum_tokens"),
        F.round(F.sum("sum_tokens").over(w) * F.lit(1.0)
                / F.sum("sum_tokens").over(total), 6)
         .alias("cum_share"))


_TRADEOFF_SQL = f"""
WITH bits AS ({_BITS_SQL}),
g AS (
    SELECT b_words + b_wordlen + b_alpha + b_stop AS grade,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
    FROM bits GROUP BY 1
)
SELECT grade, n_docs, sum_tokens,
       CAST(SUM(sum_tokens) OVER (ORDER BY grade DESC) AS BIGINT)
           AS cum_tokens,
       round(SUM(sum_tokens) OVER (ORDER BY grade DESC) * 1.0
             / SUM(sum_tokens) OVER (), 6) AS cum_share
FROM g
"""


# (earliest admission round, name, oracle_sql, fn) — consumed by
# registry_pending.PENDING_GATED.
PENDING12_GATED: list[tuple[int, str, str,
                            Callable[[SparkSession, str],
                                     DataFrame]]] = [
    (12, "epoch_repeat_budget", _EPOCH_SQL, _q_epoch_repeat_budget),
    (12, "gopher_rule_attribution", _ATTR_SQL,
     _q_gopher_rule_attribution),
    (12, "l_diversity_audit", _LDIV_SQL, _q_l_diversity_audit),
    (12, "source_datacard", _DATACARD_SQL, _q_source_datacard),
    (12, "quality_token_tradeoff", _TRADEOFF_SQL,
     _q_quality_token_tradeoff),
]
