"""Second tranche of round-budget-deferred queries (see
``registry_pending`` for the admission protocol — this module only
GROWS the list; ``registry_pending.PENDING`` extends itself with
``PENDING2`` at import, so admission order is first-tranche-then-this).

Three families:

* **Classic analytics, TPC-H shapes** the registry did not yet
  exercise: Q4 (EXISTS semi-join), Q5 (regional star with the
  customer-nation = supplier-nation cycle), Q7 (nation-pair trade
  volume), Q10 (returned-item customers), Q14 (promo revenue ratio),
  Q15 (max-revenue supplier via aggregated CTE + scalar subquery),
  Q16 (count-distinct with NOT IN), Q18 (IN over a grouped HAVING),
  Q19 (disjunctive OR-of-ANDs pushdown).  These run the SAME SQL text
  on Spark and DuckDB — the capability under test is Catalyst's
  planning of the shape (semi/anti joins, decorrelation, CNF
  predicate pushdown), pinned where interesting in
  tests/test_pending2.py.

* **LLM-pipeline operators**: symmetric int8 embedding quantization,
  per-label centroid accumulation (the k-means/classifier-training
  primitive), per-doc top-k inverse-document-frequency terms, and
  duplicated-8-gram span detection (substring-level dedup à la
  "Deduplicating Training Data Makes Language Models Better",
  Lee et al. 2021 — the gram granularity MinHash can't see).

* **Analytics surface**: JSON property extraction, `groupBy().pivot()`
  wide counts, per-user modal event, median-absolute-deviation robust
  outliers, an exact integer decayed sum (EWMA with α=1/2 as a
  window-fold in pure JVM), and EXCEPT-based churn sets.

Float discipline (same rules as tranche 1): sums accumulate in
DECIMAL or integers; ratios use only IEEE-exact ops (+ - * /) and are
floor-scaled to integers so both engines hash identically; no
transcendentals anywhere near a compare boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.parquet_source import load_table


def _view(spark: SparkSession, sf_dir: str, table: str,
          prefix: str) -> str:
    """Temp view WITHOUT the scan fan-out: every SQL query here is
    join/aggregate-first, so its first exchange provides the
    parallelism and the fan-out repartition would only get transposed
    above the join as a blind reshuffle of join output
    (tests/test_plan_hygiene.py pins this)."""
    name = f"__{prefix}_{table}"
    load_table(spark, sf_dir, table, fan_out=False) \
        .createOrReplaceTempView(name)
    return name


# --------------------------------------------------------------------------
# TPC-H Q4: priority counts gated by an EXISTS semi-join
# --------------------------------------------------------------------------

_Q4_SQL = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM {orders} o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM {lineitem} l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
"""


def _q_order_priority_exists(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one lineitem shipped after
    the order date, counted by priority.  EXISTS must plan as a
    left-semi hash join (one pass over lineitem, no row-at-a-time
    subquery) — the date filter prunes orders BEFORE the join, so at
    100 TB the semi-join probe side is one month of orders, not the
    table."""
    o = _view(spark, sf_dir, "orders", "q4")
    li = _view(spark, sf_dir, "lineitem", "q4")
    return spark.sql(_Q4_SQL.format(orders=o, lineitem=li))


# --------------------------------------------------------------------------
# TPC-H Q5: regional revenue with the c_nationkey = s_nationkey cycle
# --------------------------------------------------------------------------

_Q5_SQL = """
SELECT n.n_name,
       round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(32,6))) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM {customer} c
JOIN {orders} o ON c.c_custkey = o.o_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
JOIN {supplier} s ON l.l_suppkey = s.s_suppkey
                 AND c.c_nationkey = s.s_nationkey
JOIN {nation} n ON s.s_nationkey = n.n_nationkey
JOIN {region} r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


def _q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation for one region, counting only
    lineitems where the customer's and supplier's nations coincide.
    The join graph has a cycle (customer–nation–supplier), which the
    optimizer must close with the extra equality on the fact join
    rather than a post-join filter; nation/region/supplier broadcast,
    so the only shuffles are the two fact-fact joins."""
    t = {n: _view(spark, sf_dir, n, "q5")
         for n in ("customer", "orders", "lineitem", "supplier",
                   "nation", "region")}
    return spark.sql(_Q5_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q7: trade volume between two nations by ship year
# --------------------------------------------------------------------------

_Q7_SQL = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(32,6))) AS DOUBLE), 2) AS volume
FROM {lineitem} l
JOIN {orders} o ON o.o_orderkey = l.l_orderkey
JOIN {customer} c ON c.c_custkey = o.o_custkey
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
JOIN {nation} n1 ON n1.n_nationkey = c.c_nationkey
JOIN {nation} n2 ON n2.n_nationkey = s.s_nationkey
WHERE n1.n_name IN ('NATION_3', 'NATION_7')
  AND n2.n_name IN ('NATION_3', 'NATION_7')
  AND n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
"""


def _q_nation_trade_yearly(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between an ordered pair of nations by
    year.  Both nation dimensions broadcast with their IN-filters
    applied BEFORE the join, so customer and supplier are pre-pruned
    to two nations each — at scale that turns two fact-dim joins into
    highly selective semi-filters ahead of the orders join."""
    t = {n: _view(spark, sf_dir, n, "q7")
         for n in ("lineitem", "orders", "customer", "supplier",
                   "nation")}
    return spark.sql(_Q7_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q10: top returned-item customers
# --------------------------------------------------------------------------

_Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(32,6))) AS DOUBLE), 2) AS revenue
FROM {customer} c
JOIN {orders} o ON o.o_custkey = c.c_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY c.c_custkey, c.c_name
ORDER BY SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              AS DECIMAL(32,6))) DESC, c.c_custkey
LIMIT 20
"""


def _q_returned_item_customers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-H Q10: the 20 customers who returned the most revenue in a
    year.  ORDER BY the exact DECIMAL aggregate (ties broken by key)
    so the LIMIT frontier is engine-independent; Spark plans the
    top-20 as TakeOrderedAndProject — no global sort ever
    materializes."""
    t = {n: _view(spark, sf_dir, n, "q10")
         for n in ("customer", "orders", "lineitem")}
    return spark.sql(_Q10_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q14: promo revenue share
# --------------------------------------------------------------------------

_Q14_SQL = """
SELECT CAST(floor(
         100000.0
         * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(32,6))
                ELSE CAST(0 AS DECIMAL(32,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(32,6))) AS DOUBLE)) AS BIGINT)
       AS promo_millibp,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM {lineitem} l JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-06-01'
  AND l.l_shipdate < TIMESTAMP '1998-09-01'
"""


def _q_promo_revenue_ratio(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts over a quarter, as
    a conditional aggregate — never two scans.  Both sums accumulate
    in DECIMAL (exact); the ratio touches doubles only through IEEE
    + - * / (deterministic across engines) and is floor-scaled to an
    integer, so the single output row hash-matches bit-for-bit."""
    t = {n: _view(spark, sf_dir, n, "q14") for n in ("lineitem", "part")}
    return spark.sql(_Q14_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q15: supplier(s) with maximum revenue
# --------------------------------------------------------------------------

_Q15_SQL = """
WITH rev AS (
  SELECT l.l_suppkey,
         SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(32,6))) AS total
  FROM {lineitem} l
  WHERE l.l_shipdate >= TIMESTAMP '1999-01-01'
    AND l.l_shipdate < TIMESTAMP '1999-07-01'
  GROUP BY l.l_suppkey)
SELECT s.s_suppkey, s.s_name,
       round(CAST(r.total AS DOUBLE), 2) AS total_revenue
FROM {supplier} s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total = (SELECT max(total) FROM rev)
"""


def _q_top_revenue_supplier(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) whose half-year revenue equals the
    maximum.  The CTE aggregates once; the scalar MAX subquery reuses
    it (Spark: ReusedExchange under AQE) and the equality is on the
    exact DECIMAL total, so 'argmax with ties' is engine-exact —
    the float-boundary-free version of SELECT...ORDER BY...LIMIT 1."""
    t = {n: _view(spark, sf_dir, n, "q15")
         for n in ("lineitem", "supplier")}
    return spark.sql(_Q15_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q16: distinct supplier counts with a NOT IN exclusion
# --------------------------------------------------------------------------

_Q16_SQL = """
SELECT p.p_brand, p.p_type,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM {part} p JOIN {lineitem} l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN
      (SELECT s.s_suppkey FROM {supplier} s WHERE s.s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
"""


def _q_brand_supplier_counts(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers serve each surviving
    brand/type cell, excluding suppliers from a NOT IN subquery.
    NOT IN over a non-nullable key plans as a broadcast anti join
    (null-aware machinery elided); count(DISTINCT) shuffles only the
    (brand, type, suppkey) triple after partial dedup."""
    t = {n: _view(spark, sf_dir, n, "q16")
         for n in ("part", "lineitem", "supplier")}
    return spark.sql(_Q16_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q18: orders whose total quantity clears a HAVING threshold
# --------------------------------------------------------------------------

_Q18_SQL = """
SELECT c.c_custkey, o.o_orderkey,
       round(o.o_totalprice, 2) AS o_totalprice
FROM {orders} o JOIN {customer} c ON c.c_custkey = o.o_custkey
WHERE o.o_orderkey IN
      (SELECT l.l_orderkey FROM {lineitem} l
       GROUP BY l.l_orderkey
       HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) >
              CAST(150 AS DECIMAL(18,2)))
"""


def _q_large_order_customers(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose summed lineitem quantity exceeds
    a threshold, joined back to their customers.  IN (GROUP BY ...
    HAVING) plans as aggregate -> left-semi join; the DECIMAL
    threshold comparison is exact on both engines."""
    t = {n: _view(spark, sf_dir, n, "q18")
         for n in ("orders", "customer", "lineitem")}
    return spark.sql(_Q18_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q19: disjunctive OR-of-ANDs join predicates
# --------------------------------------------------------------------------

_Q19_SQL = """
SELECT round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(32,6))) AS DOUBLE), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM {lineitem} l JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 25)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25
       AND l.l_quantity BETWEEN 10 AND 40)
"""


def _q_disjunctive_filter_revenue(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under an OR of conjunctive brand/size/
    quantity predicates.  The planner must CNF-split the disjunction:
    the (brand OR brand) and (size-range OR size-range) factors push
    to the part scan, (qty OR qty) to the lineitem scan, with only the
    cross terms evaluated post-join — pinned in tests (the part scan
    must carry a pushed filter, not read-all-rows)."""
    t = {n: _view(spark, sf_dir, n, "q19") for n in ("lineitem", "part")}
    return spark.sql(_Q19_SQL.format(**t))


# --------------------------------------------------------------------------
# Embedding int8 quantization (inference/serving prep)
# --------------------------------------------------------------------------

_QUANT_SQL = """
WITH u AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
m AS (SELECT vec_id, max(abs(x)) AS ma FROM u GROUP BY vec_id),
q AS (
  SELECT u.vec_id, CAST(floor(u.x / m.ma * 127) AS BIGINT) AS qv
  FROM u JOIN m ON m.vec_id = u.vec_id
  WHERE m.ma > 0)
SELECT vec_id,
       CAST(SUM(qv) AS BIGINT) AS q_sum,
       CAST(SUM(qv*qv) AS BIGINT) AS q_sqsum,
       CAST(MIN(qv) AS BIGINT) AS q_min,
       CAST(MAX(qv) AS BIGINT) AS q_max
FROM q GROUP BY vec_id
"""


def _q_embed_quantize_int8(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (scale =
    127 / max|x| per vector), reported as exact integer moments of the
    quantized vector.  Entirely in-row JVM (`transform` + `aggregate`
    folds): zero shuffles, zero Python — the oracle needs two CTEs and
    a join to say what one narrow projection computes here.
    floor(x / ma * 127) uses only IEEE-exact ops, so the integers are
    bit-identical across engines.  NULL elements are dropped up front:
    the fold below is NULL-absorbing (a + NULL = NULL) while the
    oracle's SUM skips NULLs, so without the filter a single NULL
    element would silently diverge the engines."""
    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    xd = F.filter(F.transform("embedding", lambda x: x.cast("double")),
                  lambda x: x.isNotNull())
    e = e.select("vec_id", xd.alias("xd")) \
         .withColumn("ma", F.array_max(F.transform("xd", F.abs))) \
         .filter(F.col("ma") > 0)
    q = F.transform("xd", lambda x: F.floor(x / F.col("ma") * 127))
    e = e.withColumn("q", q)
    zero = F.lit(0).cast("long")
    return e.select(
        "vec_id",
        F.aggregate("q", zero, lambda a, x: a + x).alias("q_sum"),
        F.aggregate("q", zero, lambda a, x: a + x * x).alias("q_sqsum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


# --------------------------------------------------------------------------
# Per-label centroid accumulation (classifier / k-means primitive)
# --------------------------------------------------------------------------

_CENTROID_SQL = """
WITH u AS (
  SELECT label,
         unnest(range(0, len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS xm
  FROM embeddings)
SELECT label, CAST(dim AS BIGINT) AS dim,
       CAST(SUM(xm) AS BIGINT) AS csum_micro,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM u GROUP BY label, dim
"""


def _q_embed_label_centroids(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Element-wise per-label embedding sums — the partial state every
    centroid update (k-means, nearest-class-mean classifiers) needs.
    posexplode -> groupBy(label, dim) is map-side combinable: each
    task pre-sums its rows, so the shuffle carries at most
    |labels| x dims x tasks tiny rows regardless of corpus size.
    Values are floor-scaled to integer micro-units BEFORE summing, so
    the accumulation is associative-exact (no float-order dependence)
    on both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "x"))
    xm = F.floor(F.col("x").cast("double") * 1000000).cast("long")
    return (ex.select("label", F.col("dim").cast("long").alias("dim"),
                      xm.alias("xm"))
            .groupBy("label", "dim")
            .agg(F.sum("xm").alias("csum_micro"),
                 F.count(F.lit(1)).alias("n_vectors")))


# --------------------------------------------------------------------------
# Per-doc top-k rare terms (tf x inverse document frequency)
# --------------------------------------------------------------------------

_TFIDF_SQL = """
WITH tok AS (
  SELECT d.doc_id, u.term
  FROM documents d, unnest(string_split(d.text, ' ')) u(term)),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(floor(tf.tf * (n.n_docs / df.df) * 1000000) AS BIGINT)
           AS score_micro
  FROM tf JOIN df ON df.term = tf.term CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER
         (PARTITION BY doc_id
          ORDER BY score_micro DESC, term) AS rnk
  FROM scored)
SELECT doc_id, term, CAST(rnk AS BIGINT) AS rnk, tf, df, score_micro
FROM ranked WHERE rnk <= 3
"""


def _q_text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per document by tf x (N/df) —
    the linear-idf member of the tf-idf family, chosen because N/df
    needs no logarithm: every arithmetic op is IEEE-exact, so the
    floor-scaled score (and therefore the rank frontier) is
    bit-identical across engines.  The docfreq table is corpus-wide
    but vocabulary-sized — it broadcasts; the only big shuffles are
    the (doc, term) tf groupBy and the per-doc top-k window, both on
    keys the data already clusters by."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tok.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (tf.join(F.broadcast(dfq), "term")
              .crossJoin(F.broadcast(n))
              .withColumn("score_micro",
                          F.floor(F.col("tf")
                                  * (F.col("n_docs") / F.col("df"))
                                  * F.lit(1000000.0)).cast("long")))
    w = Window.partitionBy("doc_id") \
        .orderBy(F.col("score_micro").desc(), "term")
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= 3)
            .select("doc_id", "term", "rnk", "tf", "df", "score_micro"))


# --------------------------------------------------------------------------
# Duplicated 8-gram spans (substring-level dedup signal)
# --------------------------------------------------------------------------

_DUPGRAM_SQL = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 6),
                i -> array_to_string(toks[i:i+7], ' '))) AS gram
  FROM tok WHERE len(toks) >= 8),
dup AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING count(DISTINCT doc_id) >= 2)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (WHERE d.gram IS NOT NULL) AS BIGINT)
         AS n_dup_grams
FROM grams g LEFT JOIN dup d ON d.gram = g.gram
GROUP BY g.doc_id
"""


def _q_text_dup_ngram_spans(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Per-document count of 8-token grams that also occur in another
    document — the substring-granularity duplication signal of Lee et
    al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"): exact-dup and MinHash operate on whole documents and
    miss boilerplate spans pasted into otherwise-distinct pages.
    Grams are built in-row (`transform` over a `sequence` of start
    offsets + `slice` — no quadratic self-join); the dup set is one
    map-combinable distinct-doc count over grams.  At 100 TB, hash
    the gram to a 64-bit fingerprint before the groupBy so the
    shuffle moves 8 bytes per gram, not the text."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split("text", " ")
    d = d.select("doc_id", toks.alias("toks")) \
         .filter(F.size("toks") >= 8)
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 7),
        lambda i: F.concat_ws(" ", F.slice("toks", i, 8)))
    grams = d.select("doc_id", F.explode(grams_arr).alias("gram"))
    dup = (grams.groupBy("gram")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2)
           .select("gram", F.lit(1).alias("is_dup")))
    return (grams.join(dup, "gram", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.count("is_dup").alias("n_dup_grams")))


# --------------------------------------------------------------------------
# JSON property extraction
# --------------------------------------------------------------------------

_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS n_distinct_k,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


def _q_event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON property column: `get_json_object` stays
    in the JVM (codegen'd Jayway path evaluation — never a Python
    UDF), and the extracted integers aggregate exactly.  At scale,
    extract-then-aggregate beats parse-whole-document `from_json`
    when only one key is needed — the path evaluator short-circuits."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.sum("k").alias("sum_k"),
                 F.count_distinct("k").alias("n_distinct_k"),
                 F.count(F.lit(1)).alias("n_events")))


# --------------------------------------------------------------------------
# groupBy().pivot() wide daily counts
# --------------------------------------------------------------------------

_EVENT_TYPES = ("view", "click", "signup", "purchase", "error")

_PIVOT_SQL = """
SELECT CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0)
            AS BIGINT) AS day,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
         AS view,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
         AS click,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
         AS signup,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS purchase,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
         AS error
FROM events GROUP BY 1
"""


def _q_pivot_event_counts(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Long->wide reshaping with `groupBy().pivot()`: one day row,
    one column per event type.  The pivot value list is EXPLICIT —
    with it, Spark skips the extra distinct-values job AND the output
    schema is stable (exactly what a 100-TB pipeline needs; an
    inferred pivot is a full scan plus a nondeterministic column
    set).  The pivot itself is a single map-combinable aggregation —
    same shuffle as the oracle's conditional-count formulation."""
    e = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                  / F.lit(86400000000.0)).cast("long")
    wide = (e.select(day.alias("day"), "event_type")
            .groupBy("day")
            .pivot("event_type", list(_EVENT_TYPES))
            .agg(F.count(F.lit(1)))
            .na.fill(0, list(_EVENT_TYPES)))
    return wide.select("day", *[F.col(c).cast("long").alias(c)
                                for c in _EVENT_TYPES])


# --------------------------------------------------------------------------
# Per-user modal event type
# --------------------------------------------------------------------------

_MODE_SQL = """
WITH cnt AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type),
r AS (
  SELECT *, row_number() OVER
       (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
  FROM cnt)
SELECT user_id, event_type AS top_event, n AS n_events
FROM r WHERE rn = 1
"""


def _q_mode_event_per_user(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Statistical mode per group with a DETERMINISTIC tie-break
    (count desc, then type asc) — engines' built-in mode() functions
    disagree on ties, so the portable formulation is count + window.
    Both the count groupBy and the rank window hash on user_id: AQE
    coalesces them into one exchange."""
    e = load_table(spark, sf_dir, "events")
    cnt = (e.groupBy("user_id", "event_type")
           .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("user_id") \
        .orderBy(F.col("n").desc(), "event_type")
    return (cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("top_event"),
                    F.col("n").alias("n_events")))


# --------------------------------------------------------------------------
# Median-absolute-deviation robust outliers
# --------------------------------------------------------------------------

_MAD_SQL = """
WITH v AS (
  SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS s
  FROM events),
med AS (
  SELECT event_type, quantile_cont(s, 0.5) AS med
  FROM v GROUP BY event_type),
dev AS (
  SELECT v.event_type, v.s, m.med, abs(v.s - m.med) AS adev
  FROM v JOIN med m ON m.event_type = v.event_type),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type)
SELECT d.event_type,
       CAST(floor(d.med) AS BIGINT) AS med_micro,
       CAST(floor(m.mad) AS BIGINT) AS mad_micro,
       CAST(count(*) FILTER (WHERE d.adev > 3 * m.mad) AS BIGINT)
         AS n_outliers,
       CAST(count(*) AS BIGINT) AS n_events
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type, d.med, m.mad
"""


def _q_value_mad_outliers(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Robust outlier counts per event type: median + median absolute
    deviation, |x - med| > 3*MAD.  Unlike z-scores, MAD doesn't let
    the outliers inflate their own threshold.

    Exactness: values floor-scale to integer micro-units BEFORE the
    percentiles, so every interpolated median is (l+h)/2 of integers
    (an exact x.0/x.5 double), every |s - med| an exact multiple of
    0.5, every MAD an exact multiple of 0.25 — the engines' different
    interpolation formulas (l*(1-f)+h*f vs l+(h-l)*f) agree bitwise
    because no intermediate op rounds.  Interpolating the raw doubles
    instead would sit 1 ulp from a floor/threshold boundary on
    adversarial data.

    Two exact-percentile passes (Spark `percentile` ≡ quantile_cont);
    the tiny per-type median/MAD tables broadcast back onto the scan,
    so the fact rows never shuffle — at 100 TB swap `percentile` for
    approx_percentile and the structure is unchanged."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type",
                 F.floor(F.col("value") * 1000000).cast("long")
                  .alias("s"))
    med = v.groupBy("event_type").agg(
        F.percentile("s", 0.5).alias("med"))
    dev = (v.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("s") - F.col("med"))))
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad"))
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1))
                 .alias("n_outliers"),
                 F.count(F.lit(1)).alias("n_events"))
            .select("event_type",
                    F.floor("med").cast("long").alias("med_micro"),
                    F.floor("mad").cast("long").alias("mad_micro"),
                    "n_outliers", "n_events"))


# --------------------------------------------------------------------------
# Exact integer decayed sum (EWMA with alpha = 1/2)
# --------------------------------------------------------------------------

_DECAY_SQL = """
WITH v AS (
  SELECT user_id, event_id,
         CAST(floor(value * 10000) AS BIGINT) AS s,
         row_number() OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)
SELECT a.user_id, a.event_id,
       CAST(SUM(b.s * CAST(pow(2, b.rn - greatest(1, a.rn - 7))
                           AS BIGINT)) AS BIGINT) AS decay_sum
FROM v a JOIN v b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
GROUP BY a.user_id, a.event_id
"""


DECAY_FRAME = 8


def decay_sum_frame(e: DataFrame) -> DataFrame:
    """Core of events_decay_sum over any (user_id, ts, event_id,
    value) frame — shared by the batch query, the streaming twin
    (streaming/windowed.stream_decay_sum) and the brute-force
    property test."""
    # NULL values contribute 0, exactly like the oracle: its SUM skips
    # the NULL term while the row still occupies its rn position.
    # Without the coalesce, collect_list would DROP the null (shifting
    # every weight in the frame) and the fold would go NULL-absorbing.
    s = F.coalesce(F.floor(F.col("value") * 10000).cast("long"),
                   F.lit(0).cast("long"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(-(DECAY_FRAME - 1), 0)
    lst = F.collect_list(s).over(w)
    decay = F.aggregate(F.reverse(lst), F.lit(0).cast("long"),
                        lambda acc, x: acc * 2 + x)
    return e.select("user_id", "event_id", decay.alias("decay_sum"))


def _q_events_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted activity (EWMA, alpha=1/2) over each user's
    trailing 8 events, EXACTLY: values floor-scale to integers and the
    power-of-two weights make the weighted sum pure integer arithmetic
    — no float accumulation order to disagree on.  Spark computes it
    as a Horner fold over a frame-ordered collect_list window (ONE
    shuffle on user_id, newest-first: acc*2 + x); the oracle has to
    say the same thing with a quadratic-ish self-join — the window
    fold is the scale path, the join is the spec."""
    return decay_sum_frame(load_table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# EXCEPT-based churn set
# --------------------------------------------------------------------------

_EXCEPT_SQL = """
SELECT o_custkey AS c_custkey
FROM {orders} WHERE o_orderdate < TIMESTAMP '1997-01-01'
EXCEPT
SELECT o_custkey FROM {orders}
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
"""


def _q_set_except_churned(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Churned customers as set algebra: ordered before 1997, never
    ordered from 2000 on.  EXCEPT [DISTINCT] plans as aggregate +
    left-anti join — both sides prune to the single o_custkey column
    at the scan (ReadSchema: one field), so the shuffle carries keys
    only."""
    o = _view(spark, sf_dir, "orders", "exc")
    return spark.sql(_EXCEPT_SQL.format(orders=o))


# --------------------------------------------------------------------------
# OHLC time bars (min_by / max_by selection aggregates)
# --------------------------------------------------------------------------

_OHLC_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600000000.0)
              AS BIGINT) AS bar,
         value, ts, event_id FROM events),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY event_type, bar
                       ORDER BY ts, event_id) AS rna,
    row_number() OVER (PARTITION BY event_type, bar
                       ORDER BY ts DESC, event_id DESC) AS rnd
  FROM t)
SELECT event_type, bar,
  CAST(floor(MAX(CASE WHEN rna=1 THEN value END)*10000) AS BIGINT)
    AS open_e4,
  CAST(floor(MAX(value)*10000) AS BIGINT) AS high_e4,
  CAST(floor(MIN(value)*10000) AS BIGINT) AS low_e4,
  CAST(floor(MAX(CASE WHEN rnd=1 THEN value END)*10000) AS BIGINT)
    AS close_e4,
  CAST(count(*) AS BIGINT) AS n_events
FROM r GROUP BY event_type, bar
"""


def _q_events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the canonical time-series
    downsample.  Spark uses `min_by`/`max_by` keyed on the unique
    (ts, event_id) struct: ONE map-combinable aggregation (selection
    partials merge like any min/max), no window sort anywhere — at
    100 TB that is a single keys+4-doubles shuffle.  The oracle needs
    two row_number windows to say the same thing; (ts, event_id)
    uniqueness makes both formulations pick identical rows, and
    open/high/low/close are pure SELECTION (no arithmetic), so the
    floor-scaled outputs are bit-exact."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ordk = F.struct(us.alias("us"), F.col("event_id"))
    t = e.select(
        "event_type",
        F.floor(us / F.lit(3600000000.0)).cast("long").alias("bar"),
        "value", ordk.alias("k"))
    g = (t.groupBy("event_type", "bar")
         .agg(F.min_by("value", F.col("k")).alias("o"),
              F.max("value").alias("h"),
              F.min("value").alias("lo"),
              F.max_by("value", F.col("k")).alias("c"),
              F.count(F.lit(1)).alias("n_events")))
    e4 = (lambda c, n: F.floor(F.col(c) * 10000).cast("long").alias(n))
    return g.select("event_type", "bar", e4("o", "open_e4"),
                    e4("h", "high_e4"), e4("lo", "low_e4"),
                    e4("c", "close_e4"), "n_events")


# --------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG parity)
# --------------------------------------------------------------------------

_LISTAGG_SQL = """
WITH r AS (
  SELECT n.n_name, c.c_name, c.c_acctbal,
         row_number() OVER (PARTITION BY c.c_nationkey
                            ORDER BY c.c_acctbal DESC, c.c_name) AS rn
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey)
SELECT n_name,
       string_agg(c_name, ',' ORDER BY rn) AS top_names,
       CAST(floor(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100)
            AS BIGINT) AS top_bal_cents,
       CAST(count(*) AS BIGINT) AS n_top
FROM r WHERE rn <= 5 GROUP BY n_name
"""


def _q_nation_top_customer_csv(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Ordered string aggregation (ANSI LISTAGG / string_agg WITHIN
    GROUP): each nation's top-5 customers by account balance as one
    ordered CSV cell.  Spark has no ordered string_agg, so the
    portable exact form is collect_list of (rank, name) structs +
    in-row `array_sort` + `transform` + `array_join` — the in-row
    sort makes the result independent of collect_list's arrival
    order, i.e. partition-count invariant.  Ranks come from one top-k
    window (ties broken by name); only rank<=5 rows ever reach the
    aggregation, so the shuffle carries 5 short rows per nation."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey") \
        .orderBy(F.col("c_acctbal").desc(), "c_name")
    top = (c.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= 5)
           .join(F.broadcast(n),
                 c.c_nationkey == n.n_nationkey))
    names = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "c_name"))),
            lambda x: x["c_name"]), ",")
    return (top.groupBy("n_name")
            .agg(names.alias("top_names"),
                 F.floor(F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                         * 100).cast("long").alias("top_bal_cents"),
                 F.count(F.lit(1)).alias("n_top")))


PENDING2: list[tuple[str, str,
                     Callable[[SparkSession, str], DataFrame]]] = [
    ("order_priority_exists",
     _Q4_SQL.format(orders="orders", lineitem="lineitem"),
     _q_order_priority_exists),
    ("regional_revenue",
     _Q5_SQL.format(customer="customer", orders="orders",
                    lineitem="lineitem", supplier="supplier",
                    nation="nation", region="region"),
     _q_regional_revenue),
    ("nation_trade_yearly",
     _Q7_SQL.format(lineitem="lineitem", orders="orders",
                    customer="customer", supplier="supplier",
                    nation="nation"),
     _q_nation_trade_yearly),
    ("returned_item_customers",
     _Q10_SQL.format(customer="customer", orders="orders",
                     lineitem="lineitem"),
     _q_returned_item_customers),
    ("promo_revenue_ratio",
     _Q14_SQL.format(lineitem="lineitem", part="part"),
     _q_promo_revenue_ratio),
    ("top_revenue_supplier",
     _Q15_SQL.format(lineitem="lineitem", supplier="supplier"),
     _q_top_revenue_supplier),
    ("brand_supplier_counts",
     _Q16_SQL.format(part="part", lineitem="lineitem",
                     supplier="supplier"),
     _q_brand_supplier_counts),
    ("large_order_customers",
     _Q18_SQL.format(orders="orders", customer="customer",
                     lineitem="lineitem"),
     _q_large_order_customers),
    ("disjunctive_filter_revenue",
     _Q19_SQL.format(lineitem="lineitem", part="part"),
     _q_disjunctive_filter_revenue),
    ("embed_quantize_int8", _QUANT_SQL, _q_embed_quantize_int8),
    ("embed_label_centroids", _CENTROID_SQL, _q_embed_label_centroids),
    ("text_tfidf_topk", _TFIDF_SQL, _q_text_tfidf_topk),
    ("text_dup_ngram_spans", _DUPGRAM_SQL, _q_text_dup_ngram_spans),
    ("event_props_json", _PROPS_SQL, _q_event_props_json),
    ("pivot_event_counts", _PIVOT_SQL, _q_pivot_event_counts),
    ("mode_event_per_user", _MODE_SQL, _q_mode_event_per_user),
    ("value_mad_outliers", _MAD_SQL, _q_value_mad_outliers),
    ("events_decay_sum", _DECAY_SQL, _q_events_decay_sum),
    ("set_except_churned", _EXCEPT_SQL.format(orders="orders"),
     _q_set_except_churned),
    ("events_ohlc_bars", _OHLC_SQL, _q_events_ohlc_bars),
    ("nation_top_customer_csv", _LISTAGG_SQL,
     _q_nation_top_customer_csv),
]
