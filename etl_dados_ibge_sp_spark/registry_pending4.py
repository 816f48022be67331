"""Fourth tranche of round-budget-deferred queries (round 5; queued
behind the third tranche — see ``registry_pending`` for the admission
protocol.  Nothing here registers before round 6: the round-4 verdict
froze net-new registrations so the driver's 50-row budget drains the
never-verified backlog, and ``registry._load_extensions`` computes
zero slack at the round-5 staleness bound).

Families:

* **Mergeable sketches** (``operators/sketches``): KMV distinct-count
  (HLL-sized threshold prefilter -> bounded min-k), count-min
  frequency (fixed d x w counter matrix), and Bloom-filter join
  pruning (distributed bit-array build, scan-side prune, exact join
  after).  Each sketch is built from the engine-portable 60-bit
  md5-prefix hash, so the oracle recomputes identical hash values,
  order statistics, counters, and estimates — sketches verified as
  exact oracle queries, not just error-bound laws (those are pinned
  too, in tests/test_sketches.py).
* **Remaining classic TPC-H join shapes**: Q9 (profit rollup across
  the 5-table part/supplier/orders/nation star, adapted to this
  schema's columns: retail-price-based supply-cost stand-in) and Q21
  (the double-correlated EXISTS / NOT EXISTS self-join on lineitem —
  here "the order's SOLE returning supplier", since this lineitem has
  no commit/receipt dates).
* **Embedding range search**: all vectors within a cosine radius of a
  query — the top-k path's missing twin, a zero-shuffle narrow scan.

Float discipline (tranche-1 rules): revenue/profit accumulate in
DECIMAL after the established per-row double expression; estimates
use IEEE-exact-or-single-rounding op chains; comparisons happen on
ROUNDED values; hashes are md5-prefix bigints.  Tie-breaks go through
unique keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import sketches as SK
from .sources.parquet_source import load_table


# Temp-view helper shared with the tranche-2 SQL queries (fan_out=False
# for join-first shapes; the rationale and plan law live at the
# definition).
from .registry_pending2 import _view  # noqa: E402


# --------------------------------------------------------------------------
# KMV distinct-count sketch: active user-days per event type
# --------------------------------------------------------------------------

_KMV_K = 64

# user-day key, rendered identically by both engines: BIGINT user id,
# '|', floor-div day index of the event timestamp.
_KMV_KEY_SQL = ("CAST(user_id AS VARCHAR) || '|' || "
                "CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 "
                "AS VARCHAR)")

_KMV_SQL = f"""
WITH h AS (
    SELECT DISTINCT event_type,
           {SK.hash60_sql(_KMV_KEY_SQL, 'kmv')} AS hv
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
), r AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
           count(*) OVER (PARTITION BY event_type) AS nd
    FROM h
)
SELECT event_type,
       CAST(least(nd, {_KMV_K}) AS INT) AS k_used,
       max(CASE WHEN rn = {_KMV_K} THEN hv END) AS kth_hash,
       round(CASE WHEN nd < {_KMV_K} THEN CAST(nd AS DOUBLE)
             ELSE {float(_KMV_K - 1)!r} * {float(SK.HASH_SPACE)!r}
                  / CAST(max(CASE WHEN rn = {_KMV_K} THEN hv END)
                         AS DOUBLE) END, 2) AS n_distinct_est
FROM r
GROUP BY event_type, nd
"""


def _q_kmv_distinct_by_type(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """KMV distinct-count of active (user, day) pairs per event type.
    The sketch build is the scale path — HLL++ sizes each group, a
    broadcast threshold keeps only the lowest slice of the hash space,
    and the k smallest distinct hashes are collected from the ~alpha*k
    survivors (operators/sketches.kmv_sketch) — while the oracle
    recomputes the exact order statistic over all distinct hashes, so
    a driver row checks the sketch VALUES bit-for-bit (estimator: one
    bigint->double cast + one division, IEEE-identical everywhere)."""
    ev = load_table(spark, sf_dir, "events", fan_out=True)
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000)) \
        .cast("bigint")
    # NULL-propagating F.concat, NOT concat_ws: concat_ws SKIPS null
    # members, so a NULL user_id would silently hash a partial key
    # ('|day') while the oracle's || yields NULL — divergent hash
    # sets.  With F.concat a NULL component nulls the whole key, the
    # null hash is dropped by collect_set, and the oracle's explicit
    # NOT NULL filter says the same thing.
    keyed = ev.select(
        "event_type",
        F.concat(F.col("user_id").cast("string"), F.lit("|"),
                 day.cast("string")).alias("uday"))
    sk = SK.kmv_sketch(keyed, "event_type", "uday", k=_KMV_K)
    return SK.kmv_estimate(sk, k=_KMV_K)


# --------------------------------------------------------------------------
# KMV set algebra: audience overlap from sketches alone
# --------------------------------------------------------------------------

_KMV_EST_SQL = """CASE WHEN len({arr}) < {k} THEN CAST(len({arr}) AS DOUBLE)
     ELSE {km1} * {space} / CAST({arr}[{k}] AS DOUBLE) END"""


def _kmv_overlap_sql() -> str:
    k = _KMV_K
    est = lambda arr: _KMV_EST_SQL.format(  # noqa: E731
        arr=arr, k=k, km1=float(k - 1), space=float(SK.HASH_SPACE))
    return f"""
WITH h AS (
    SELECT DISTINCT event_type,
           {SK.hash60_sql(_KMV_KEY_SQL, 'kmv')} AS hv
    FROM events
    WHERE event_type IN ('click', 'purchase')
      AND user_id IS NOT NULL AND ts IS NOT NULL
), r AS (
    SELECT event_type, hv,
           row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
    FROM h
), ka AS (
    SELECT list(hv ORDER BY hv) AS a FROM r
    WHERE event_type = 'click' AND rn <= {k}
), kb AS (
    SELECT list(hv ORDER BY hv) AS b FROM r
    WHERE event_type = 'purchase' AND rn <= {k}
), m AS (
    SELECT a, b,
           list_sort(list_distinct(a || b)) AS u
    FROM ka, kb
), mm AS (
    SELECT a, b,
           CASE WHEN len(u) > {k} THEN u[1:{k}] ELSE u END AS merged
    FROM m
)
SELECT round({est('a')}, 2) AS est_click,
       round({est('b')}, 2) AS est_purchase,
       round({est('merged')}, 2) AS est_union,
       round((CAST(len(list_filter(merged,
                       v -> list_contains(a, v)
                            AND list_contains(b, v))) AS DOUBLE)
              / least(len(merged), {k})) * ({est('merged')}), 2)
           AS est_overlap
FROM mm
"""


def _q_kmv_audience_overlap(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """|click audience ∩ purchase audience| (distinct user-days)
    estimated from the two KMV sketches ALONE — the set algebra that
    lets yesterday's and today's (or two sources') audiences intersect
    without touching either corpus again.  Merge the sketches, scale
    the union estimate by the fraction of the merged k-set present in
    both inputs (Beyer et al. 2007).  Every number is deterministic
    (integer hashes, one bigint->double cast, fixed-order IEEE ops),
    so the driver hash-checks the sketch algebra end to end."""
    ev = load_table(spark, sf_dir, "events") \
        .filter(F.col("event_type").isin("click", "purchase"))
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000)) \
        .cast("bigint")
    keyed = ev.select(
        "event_type",
        F.concat(F.col("user_id").cast("string"), F.lit("|"),
                 day.cast("string")).alias("uday"))
    sk = SK.kmv_sketch(keyed, "event_type", "uday", k=_KMV_K)
    a = sk.filter(F.col("event_type") == "click") \
        .select(F.col("kmv").alias("a"))
    b = sk.filter(F.col("event_type") == "purchase") \
        .select(F.col("kmv").alias("b"))
    both = a.crossJoin(F.broadcast(b))
    merged = SK.kmv_merge(F.col("a"), F.col("b"), _KMV_K)
    return both.select(
        F.round(SK.kmv_union_est(F.col("a"), _KMV_K), 2)
         .alias("est_click"),
        F.round(SK.kmv_union_est(F.col("b"), _KMV_K), 2)
         .alias("est_purchase"),
        F.round(SK.kmv_union_est(merged, _KMV_K), 2).alias("est_union"),
        F.round(SK.kmv_intersect_estimate(F.col("a"), F.col("b"),
                                          _KMV_K), 2)
         .alias("est_overlap"))


# --------------------------------------------------------------------------
# Count-min frequency sketch: per-user event counts
# --------------------------------------------------------------------------

_CM_D, _CM_W = 4, 256

_CM_SQL = f"""
WITH counters AS (
    {SK.countmin_sql('CAST(user_id AS VARCHAR)', 'events',
                     depth=_CM_D, width=_CM_W)}
), probe AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
    FROM events GROUP BY user_id
), pos AS (
    SELECT p.user_id, p.exact_cnt, s.r AS r,
           CAST(concat('0x', substr(md5(concat('cm',
                CAST(s.r AS VARCHAR), ':',
                CAST(p.user_id AS VARCHAR))), 1, 15)) AS BIGINT)
               % {_CM_W} AS pos
    FROM probe p, generate_series(0, {_CM_D - 1}) s(r)
)
SELECT p.user_id, p.exact_cnt, CAST(min(c.cnt) AS BIGINT) AS cm_est
FROM pos p JOIN counters c ON c.r = p.r AND c.pos = p.pos
GROUP BY p.user_id, p.exact_cnt
"""


def _q_countmin_user_events(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Count-min estimate vs exact count of events per user.  The
    counter matrix is ONE map-side-combinable aggregate with at most
    d*w output rows regardless of input size; lookups broadcast it.
    The counters and the min-of-d estimates are integers, so the
    oracle match is exact — and the >= exact-count guarantee is
    pinned separately in tests/test_sketches.py.  (Probing EVERY key,
    as here, is for oracle coverage; the production shape probes a
    bounded candidate set — e.g. per-partition top-k pre-candidates —
    against the broadcast matrix, which is what makes count-min cheap
    when the key universe doesn't fit anywhere.)"""
    ev = load_table(spark, sf_dir, "events")
    counters = SK.countmin_counters(ev.select("user_id"), "user_id",
                                    depth=_CM_D, width=_CM_W)
    keys = ev.groupBy("user_id") \
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    return SK.countmin_lookup(counters, keys, "user_id",
                              depth=_CM_D, width=_CM_W)


# --------------------------------------------------------------------------
# Bloom-filter join pruning: urgent-order revenue by year
# --------------------------------------------------------------------------

_BLOOM_SQL = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(32,6))) AS DOUBLE), 2)
           AS urgent_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY 1
"""


def _q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-filtered-dim join with an explicit Bloom prefilter on
    the fact scan: the urgent orders' keys are aggregated into a 2^20
    bit array (a bounded driver-side model — 16384 longs, independent
    of data scale), the lineitem scan drops rows whose key cannot be
    urgent BEFORE the shuffle, and the exact join then runs on the
    survivors.  The oracle is the PLAIN join — equality proves the
    filter never drops a true match; false positives are pruned by the
    join itself.  This is Spark's runtime row-level bloom made
    explicit, testable, and available to any query shape."""
    orders = load_table(spark, sf_dir, "orders", fan_out=False)
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    words = SK.bloom_build(build, "o_orderkey")
    pruned = SK.bloom_prune(li, "l_orderkey", words)
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) \
        .cast("decimal(32,6)")
    return (pruned.join(build.select("o_orderkey", "o_orderdate"),
                        pruned.l_orderkey == F.col("o_orderkey"))
            .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.round(F.sum(rev).cast("double"), 2)
                  .alias("urgent_revenue")))


# --------------------------------------------------------------------------
# TPC-H Q9 shape: profit by nation and order year
# --------------------------------------------------------------------------

_Q9_SQL = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(round(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - p.p_retailprice * l.l_quantity * 0.1
                           AS DECIMAL(32,6))), 2) AS DOUBLE) AS profit,
       CAST(count(*) AS BIGINT) AS n_lines
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
JOIN {orders} o ON o.o_orderkey = l.l_orderkey
JOIN {nation} n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY n.n_name, year(o.o_orderdate)
"""


def _q_product_profit_yearly(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-(nation, year) profit over the
    part/supplier/orders/nation star, filtered to one part family.
    This schema has no partsupp, so supply cost is the established
    stand-in 0.1 * p_retailprice * quantity; the per-row profit is one
    double expression (identical op order in both engines) cast to
    DECIMAL for accumulation.  NOTE the rounding order: round(.., 2)
    runs on the exact DECIMAL sum and only then casts to DOUBLE —
    both engines round decimal ties half-away-from-zero, whereas the
    usual round(CAST(.. AS DOUBLE), 2) diverges when a sum lands near
    a .005 boundary (this query's sf0.01 data hits one).  Plan shape: the p_name filter reaches
    the part scan, nation broadcasts, AQE picks broadcast for the
    filtered part side when it fits; the orders join is the one
    genuinely large shuffle."""
    t = {n: _view(spark, sf_dir, n, "q9")
         for n in ("lineitem", "part", "supplier", "orders", "nation")}
    return spark.sql(_Q9_SQL.format(**t))


# --------------------------------------------------------------------------
# TPC-H Q21 shape: the order's sole returning supplier
# --------------------------------------------------------------------------

_Q21_SQL = """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_sole_return
FROM {supplier} s
JOIN {lineitem} l1 ON s.s_suppkey = l1.l_suppkey
JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
WHERE l1.l_returnflag = 'R'
  AND o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM {lineitem} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM {lineitem} l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
"""


def _q_sole_returned_supplier(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates in this
    lineitem, so "kept waiting" becomes "returned"): suppliers who
    were the ONLY supplier with a returned line in a multi-supplier
    finished order — correlated EXISTS plus correlated NOT EXISTS
    against the same fact table.  Catalyst must decorrelate both into
    semi/anti self-joins on l_orderkey with the suppkey inequality as
    a join residual (the plan law in tests/test_sketches.py pins
    LeftSemi + LeftAnti, no in-plan Subquery) — at scale three
    co-partitioned shuffles of the fact on the same key, not a
    per-row subquery."""
    t = {n: _view(spark, sf_dir, n, "q21")
         for n in ("supplier", "lineitem", "orders")}
    return spark.sql(_Q21_SQL.format(**t))


# --------------------------------------------------------------------------
# Embedding range search
# --------------------------------------------------------------------------

_RCOS = """
round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[]))) *
       sqrt(list_dot_product(q.qe, q.qe))), 6)
"""

_RADIUS_SQL = f"""
WITH q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id, {_RCOS} AS cos_sim
FROM embeddings e, q
WHERE e.vec_id != 0 AND {_RCOS} >= 0.15
"""


def _q_embed_radius_search(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """All corpus vectors within cosine radius 0.15 of the query
    vector — the range-search twin of embed_cosine_topk.  Zero
    shuffles: broadcast single-row query, JVM fold dot products, a
    filter on the ROUNDED score (so the radius boundary resolves
    identically in both engines)."""
    from .operators import similarity as S
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"))
    corpus = emb.filter(F.col("vec_id") != 0) \
        .select("vec_id", "embedding")
    return S.cosine_radius(corpus, query, threshold=0.15)


# --------------------------------------------------------------------------
# Batch ANN serving: top-k for a query SET in one bucket join
# --------------------------------------------------------------------------

def _batch_ann_sql() -> str:
    from .registry_ext import _PLANT_SQL
    return f"""
WITH pl AS ({_PLANT_SQL}
), q AS (
    SELECT vec_id AS query_id, v AS qe FROM pl WHERE vec_id % 199 = 0
), s AS (
    SELECT q.query_id, p.vec_id,
           round(list_dot_product(p.v, q.qe) /
                 (sqrt(list_dot_product(p.v, p.v)) *
                  sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
    FROM pl p, q WHERE p.vec_id != 0
), r AS (
    SELECT query_id, vec_id, cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, vec_id) AS rn
    FROM s
)
SELECT query_id, vec_id, cos_sim FROM r WHERE rn <= 5
"""


def _q_embed_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN over the planted-clusters fixture: every 199th vector
    is a query, all answered by ONE bucket join against the corpus
    bucketed by the learned IVF quantizer (the memoized `_ivf_model`
    the single-query path trains).  On planted data the IVF result
    EQUALS exact per-query top-k — each query's true neighbors share
    its inverted list — so the oracle is the brute-force window SQL:
    a full hash-match of the batch serving path.  The recall law on
    raw embeddings stays pinned in tests/test_ranking_history.py."""
    from .operators import similarity as S
    from .registry_ext import _ivf_model, planted_clusters
    corpus, cents = _ivf_model(spark, sf_dir)
    queries = planted_clusters(load_table(spark, sf_dir, "embeddings")) \
        .filter(F.col("vec_id") % 199 == 0) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"))
    return S.ann_ivf_topk_batch(corpus, queries, k=5, centroids=cents,
                                nprobe=2)


# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 (+) cosine via reciprocal-rank fusion
# --------------------------------------------------------------------------

_RRF_K = 60.0     # the standard RRF damping constant (Cormack 2009)
_RRF_TOPN = 50    # per-leg candidate depth
_RRF_OUT = 20


def _rrf_sql() -> str:
    from .operators.ranking import bm25_oracle_sql
    from .registry_ext import _BM25_TERMS, _NORM_SQL
    bm25 = bm25_oracle_sql(_BM25_TERMS, _RRF_TOPN, _NORM_SQL)
    return f"""
WITH lexr AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
    FROM ({bm25})
), semr AS (
    SELECT vec_id AS doc_id,
           row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS r_sem
    FROM (
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id = 0)
        SELECT e.vec_id, {_RCOS} AS cos_sim
        FROM embeddings e, q WHERE e.vec_id != 0
        ORDER BY cos_sim DESC, e.vec_id
        LIMIT {_RRF_TOPN}
    )
)
SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
       round(COALESCE(1.0 / ({_RRF_K!r} + l.r_lex), 0.0)
             + COALESCE(1.0 / ({_RRF_K!r} + s.r_sem), 0.0), 6) AS rrf
FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
ORDER BY rrf DESC, doc_id
LIMIT {_RRF_OUT}
"""


def _q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval, the RAG-era default: fuse a lexical BM25
    ranking and a semantic cosine ranking by reciprocal-rank fusion
    (Cormack et al. 2009) — score = Σ 1/(60 + rank_leg), robust to
    incomparable raw scores.  Each leg is the engine's existing
    retriever (rational-idf BM25 over documents; brute cosine over
    embeddings, ids shared with the doc corpus); ranks are integers
    with id tie-breaks and the fused score is two IEEE divisions and
    one add in fixed order, so the oracle matches bit-for-bit.

    Scale shape: each leg is its own top-N (TakeOrdered / narrow
    scan) and fusion touches only 2N candidate rows — a driver-scale
    full-outer join however large the corpus."""
    from pyspark.sql import Window

    from .operators.ranking import bm25_topk
    from .operators.similarity import cosine_topk
    from .registry_ext import _BM25_TERMS

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    lex = bm25_topk(docs, list(_BM25_TERMS), _RRF_TOPN)
    lex_r = lex.withColumn(
        "r_lex",
        F.row_number().over(
            Window.orderBy(F.desc("bm25"), F.asc("doc_id"))))
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"))
    corpus = emb.filter(F.col("vec_id") != 0) \
        .select("vec_id", "embedding")
    sem = cosine_topk(corpus, query, k=_RRF_TOPN) \
        .withColumnRenamed("vec_id", "doc_id")
    sem_r = sem.withColumn(
        "r_sem",
        F.row_number().over(
            Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))))
    fused = (lex_r.join(sem_r, "doc_id", "full_outer")
             .select("doc_id",
                     F.round(
                         F.coalesce(F.lit(1.0) / (F.lit(_RRF_K)
                                                  + F.col("r_lex")),
                                    F.lit(0.0))
                         + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K)
                                                    + F.col("r_sem")),
                                      F.lit(0.0)),
                         6).alias("rrf")))
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(_RRF_OUT)


# (name, oracle_sql, fn) in admission order — queued after PENDING3.
PENDING4: list[tuple[str, str,
                     Callable[[SparkSession, str], DataFrame]]] = [
    ("kmv_distinct_by_type", _KMV_SQL, _q_kmv_distinct_by_type),
    ("countmin_user_events", _CM_SQL, _q_countmin_user_events),
    ("bloom_filter_join", _BLOOM_SQL, _q_bloom_filter_join),
    ("product_profit_yearly", _Q9_SQL.format(
        lineitem="lineitem", part="part", supplier="supplier",
        orders="orders", nation="nation"), _q_product_profit_yearly),
    ("sole_returned_supplier", _Q21_SQL.format(
        supplier="supplier", lineitem="lineitem", orders="orders"),
     _q_sole_returned_supplier),
    ("embed_radius_search", _RADIUS_SQL, _q_embed_radius_search),
    ("embed_ann_batch", _batch_ann_sql(), _q_embed_ann_batch),
    ("hybrid_search_rrf", _rrf_sql(), _q_hybrid_search_rrf),
    ("kmv_audience_overlap", _kmv_overlap_sql(),
     _q_kmv_audience_overlap),
]
