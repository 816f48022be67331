"""Sixth tranche of round-budget-deferred queries (written in round 5
while the driver's CORRECTNESS budget drained the never-verified
backlog — VERDICT r04 "Next round" #1 froze net-new registrations, so
everything here queues behind tranche 5 and admits when round 6
extends the staleness bound to 4 rounds, reopening 50 slots).

Families (each picked to close a genuine capability gap — see
QUERIES.md for the full inventory this extends):

* **Asymmetric containment dedup** — the LLM-corpus near-dup shape
  Jaccard misses: a document wholly CONTAINED in a larger one scores
  low Jaccard (union is large) but containment |A∩B|/|A| ≈ 1.  Runs
  on the shingle inverted index with a document-frequency cap, the
  same bounded-fan-out discipline as the LSH family.
* **Concentration / inequality statistics** — Gini impurity of
  per-user event mixes, the Gini *coefficient* of customer revenue
  (rank formula on integer cents), and Herfindahl–Hirschman supplier
  concentration: the statistics-bureau measures of "how unequal /
  concentrated is this distribution", all reduced to integer moments
  plus one final division.
* **CUSUM changepoint scan** — the classic drift detector on daily
  event counts, kept exact by scaling the cumulative deviation by
  n_days (s_k = n·Σ_{i≤k}c_i − k·T is an integer; the float CUSUM
  would smear parity).
* **Sequence paths** — top user journeys (first-5 event-type paths),
  the product-analytics staple.
* **Referential-integrity audit** — orphan-FK counts for every edge
  of the star schema in ONE DataFrame (a DQ gate the reference's
  ensure-table DDL implies but never checks; reference
  dags/etl_municipios.py:25-48 declares the FKs as comments only).
* **Time-bounded conversion funnel** — first 'view' → first
  'purchase' within 7 days, per signup-day cohort: the funnel with a
  deadline, which plain events_funnel (ordered-EXISTS) cannot say.
* **Order-statistics surface** — exact discrete gap quantiles
  (min / low-median / p90 / max of inter-event gaps) via the
  row_number-against-count idiom; no interpolation, so parity is
  integer identity.
* **ABC / Pareto classification** — cumulative-revenue-share classes
  (A ≤ 80 %, B ≤ 95 %, C rest) with the thresholds compared in
  integer micros (cum·5 ≤ tot·4), never float shares.
* **Two-sample Kolmogorov–Smirnov distance** between two sources'
  document-length distributions — the distribution-drift gate for
  corpus curation, exact via D·n1·n2 integer scaling.
* **Streaming windowed top-k** — leaderboard over tumbling windows
  with watermark-bounded state (counts only, never raw events), rank
  applied at read time.

Float discipline (tranche-1 rules): money lifts through
``CAST(x AS DECIMAL(32,6))`` (exact for the 2-dp inputs; the 6-dp
product ``l_extendedprice * (1 - l_discount)`` rounds identically on
both engines) and then to integer micros where arithmetic must be
bit-identical; every ratio is ONE division of two exact integers,
rounded to 6 dp; quantiles are discrete order statistics; tie-breaks
go through unique keys.  Squares of micros exceed BIGINT, so
second-moment sums accumulate in DECIMAL(38,0) (Spark) / HUGEINT
(DuckDB) — both exact integer types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.parquet_source import load_table

_DEC = "decimal(32,6)"
_DAY_US = 86_400_000_000

# Exact integer micros from the canonical 6-dp revenue decimal: the
# DECIMAL(32,6) lift is the engine-wide revenue idiom (registry
# pricing_summary etc.); *1e6 of a 6-dp decimal is integral, so the
# BIGINT cast is exact on both engines (no sub-unit truncation — the
# trap _CENTS_SQL avoids by only lifting 2-dp money).
_REV_MICROS_SQL = ("CAST(CAST(l_extendedprice * (1 - l_discount) "
                   "AS DECIMAL(32,6)) * 1000000 AS BIGINT)")


def _rev_micros():
    return ((F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
            .cast(_DEC) * 1000000).cast("bigint")


# --------------------------------------------------------------------------
# Asymmetric containment near-dup (the subset-duplication detector)
# --------------------------------------------------------------------------

_CONTAIN_TAU = 0.5
_CONTAIN_MAXDF = 50

_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_TRIGRAMS_SQL = (
    f"list_transform(generate_series(1, len({_TOKS_SQL}) - 2), "
    f"i -> array_to_string(({_TOKS_SQL})[i:i+2], ' '))"
)

_CONTAIN_SQL = f"""
WITH sh0 AS (
    SELECT doc_id, unnest(list_distinct({_TRIGRAMS_SQL})) AS shingle
    FROM documents
), keep AS (
    SELECT shingle FROM sh0 GROUP BY shingle
    HAVING COUNT(*) <= {_CONTAIN_MAXDF}
), sh AS (
    SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
    FROM sh a JOIN sh b
      ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(i AS BIGINT) AS n_shared,
       round(i * 1.0 / sa.sz, 6) AS containment
FROM inter JOIN sizes sa ON id_a = sa.doc_id
WHERE round(i * 1.0 / sa.sz, 6) >= {_CONTAIN_TAU}
"""


def _q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup: C(a→b) = |Sh(a)∩Sh(b)| /
    |Sh(a)| over distinct word-trigram shingles — flags a document
    whose content is (mostly) a subset of another even when Jaccard
    is diluted by the larger doc's extra text, the common case for
    quote-and-extend / boilerplate-wrapped duplication in web corpora.

    Scale design: same inverted-index discipline as the Jaccard/LSH
    family (operators/dedup.py) — pairs are generated ONLY through
    shared shingles, and shingles whose posting list exceeds
    ``maxdf`` docs are dropped first (boilerplate grams would
    otherwise fan out quadratically; a trigram shared by >50 docs
    identifies nothing).  Every stage is a map-side-combinable
    groupBy; the pair join's fan-out is bounded by maxdf² per
    shingle.  Sizes are measured on the SAME pruned shingle set the
    intersection uses, so the ratio is internally consistent.
    Directional on purpose: both (a→b) and (b→a) rows can appear,
    each with its own denominator.

    The pruned shingle relation is the SESSION-STAGED shared build
    (registry_pending10.pruned_trigram_shingles — same shingles, same
    maxdf=50 prune; previously rebuilt inline per invocation;
    optimization r12).  The directional intersection and sizes below
    are this query's own."""
    from .registry_pending10 import pruned_trigram_shingles
    sh = pruned_trigram_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("id_a") != F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("i")))
    cont = F.round(F.col("i") * 1.0 / F.col("sz"), 6)
    return (inter.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
            .select("id_a", "id_b",
                    F.col("i").cast("bigint").alias("n_shared"),
                    cont.alias("containment"))
            .filter(F.col("containment") >= _CONTAIN_TAU))


# --------------------------------------------------------------------------
# Gini impurity of per-user event-type mixes
# --------------------------------------------------------------------------

_GINI_IMP_SQL = """
WITH c AS (
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), m AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(SUM(cnt * cnt) AS BIGINT) AS sumsq
    FROM c GROUP BY 1
)
SELECT user_id, n_types, n_events,
       round(1.0 - sumsq * 1.0 / (n_events * n_events), 6) AS gini_impurity
FROM m
"""


def _q_event_type_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini impurity (1 − Σp_i²) of each user's event-type mix — the
    'how specialized is this user' score, and deliberately the
    ENTROPY-free diversity measure: it reduces to integer moments
    (Σc_i², N) plus one division, so parity is arithmetic identity
    rather than cross-engine ln() luck.  Two map-side-combinable
    groupBys, the second over ≤|users|·|types| rows; no window, no
    self-join.  At 100 TB both aggregations partial-combine and the
    final state is one small row per user."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"))
    m = c.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("cnt").cast("bigint").alias("n_events"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sumsq"))
    gini = F.round(
        F.lit(1.0) - F.col("sumsq") * 1.0
        / (F.col("n_events") * F.col("n_events")), 6)
    return m.select("user_id", "n_types", "n_events",
                    gini.alias("gini_impurity"))


# --------------------------------------------------------------------------
# Gini coefficient of customer revenue per nation (rank formula)
# --------------------------------------------------------------------------

_GINI_COEF_SQL = """
WITH rev AS (
    SELECT c.c_nationkey, o.o_custkey,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(32,6)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
), ranked AS (
    SELECT c_nationkey, cents,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY cents, o_custkey) AS i
    FROM rev
), agg AS (
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS s,
           CAST(SUM(i * cents) AS BIGINT) AS w
    FROM ranked GROUP BY 1
)
SELECT n.n_name, a.n_customers,
       round((2 * a.w - (a.n_customers + 1) * a.s) * 1.0
             / (a.n_customers * a.s), 6) AS gini
FROM agg a JOIN nation n ON a.c_nationkey = n.n_nationkey
"""


def _q_revenue_gini_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime revenue within each
    nation, by the rank formula G = (2·Σi·x_i − (n+1)·Σx_i)/(n·Σx_i)
    on ascending-sorted integer cents — numerator and denominator are
    exact integers, one division at the end.  (Equal values make the
    rank assignment ambiguous, but Σi·x_i is invariant under swapping
    equal x's, so the tie-break only serves determinism of the
    intermediate frame.)

    Scale: one fact shuffle (orders→per-customer cents, map-side
    combinable), then the rank window partitions BY NATION — ~1/25th
    of customers per partition, no global sort; the final aggregate
    is 25 rows.  Customers with no orders are out of scope (inner
    join), documented: Gini-of-purchasers.  BIGINT headroom: Σi·cents
    reaches ~1e25 at 1e8 customers × 1e9 cents — past ~1e6 customers
    per nation, lift the Σi·x accumulator to DECIMAL(38,0) (the HHI
    second-moment idiom); exact at every test SF as written."""
    o = load_table(spark, sf_dir, "orders", fan_out=False) \
        .select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer") \
        .select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    cents = (F.col("o_totalprice").cast(_DEC) * 100).cast("bigint")
    rev = (o.select("o_custkey", cents.alias("c100"))
           .groupBy("o_custkey").agg(F.sum("c100").cast("bigint")
                                     .alias("cents"))
           .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
           .select("c_nationkey", "o_custkey", "cents"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("cents").asc(), F.col("o_custkey").asc())
    ranked = rev.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("w"))
    gini = F.round(
        (2 * F.col("w") - (F.col("n_customers") + 1) * F.col("s")) * 1.0
        / (F.col("n_customers") * F.col("s")), 6)
    return (agg.join(F.broadcast(n),
                     F.col("c_nationkey") == F.col("n_nationkey"))
            .select("n_name", "n_customers", gini.alias("gini")))


# --------------------------------------------------------------------------
# CUSUM changepoint scan over daily event counts
# --------------------------------------------------------------------------

_CUSUM_SQL = f"""
WITH d AS (
    SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US} AS day,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
), s AS (
    SELECT event_type, day, cnt,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_days,
           CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS t,
           CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT)
               AS cum,
           CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                AS BIGINT) AS k
    FROM d
), dev AS (
    SELECT event_type, day, n_days, t,
           abs(n_days * cum - k * t) AS d_scaled,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY abs(n_days * cum - k * t) DESC,
                                       day ASC) AS r
    FROM s
)
SELECT event_type, CAST(day AS BIGINT) AS cp_day,
       CAST(d_scaled AS BIGINT) AS max_dev_scaled,
       n_days, t AS total_events
FROM dev WHERE r = 1
"""


def _q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan per event type: the day k maximizing
    |Σ_{i≤k}c_i − k·mean| over the ordered daily counts — the
    level-shift detector.  The deviation is kept integer by scaling
    with n_days (s_k = n·cum_k − k·T), so the argmax and the reported
    maximum are exact; mean-relative CUSUM in float would make parity
    depend on division order.  Ties break to the earliest day.

    Scale: daily pre-aggregation is map-side combinable (the shuffle
    carries (type, day) cells, not events); every window partitions
    by event_type over the TINY aggregated frame (≤ types × days
    rows).  The same two-window cascade (running stats, then rank on
    the statistic) is the general changepoint-scan shape."""
    e = load_table(spark, sf_dir, "events")
    d = (e.select("event_type",
                  F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"))
         .groupBy("event_type", "day")
         .agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))
    wp = Window.partitionBy("event_type")
    wc = wp.orderBy("day").rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow)
    s = (d.withColumn("n_days", F.count(F.lit(1)).over(wp).cast("bigint"))
         .withColumn("t", F.sum("cnt").over(wp).cast("bigint"))
         .withColumn("cum", F.sum("cnt").over(wc).cast("bigint"))
         .withColumn("k", F.row_number().over(wp.orderBy("day"))
                     .cast("bigint")))
    dev = F.abs(F.col("n_days") * F.col("cum") - F.col("k") * F.col("t"))
    ranked = s.withColumn("d_scaled", dev).withColumn(
        "r", F.row_number().over(
            wp.orderBy(F.desc("d_scaled"), F.asc("day"))))
    return (ranked.filter(F.col("r") == 1)
            .select("event_type", F.col("day").cast("bigint")
                    .alias("cp_day"),
                    F.col("d_scaled").cast("bigint")
                    .alias("max_dev_scaled"),
                    "n_days", F.col("t").alias("total_events")))


# --------------------------------------------------------------------------
# Top user journeys: first-5 event-type paths
# --------------------------------------------------------------------------

_PATH_STEPS = 5
_PATH_K = 10

_PATH_SQL = f"""
WITH r AS (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
), p AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY rn) AS path
    FROM r WHERE rn <= {_PATH_STEPS} GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {_PATH_K}
"""


def _q_event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first {steps} event types in
    (ts, event_id) order joined into a path string, counted, top-k by
    (count desc, path asc).  The product-analytics 'common flows'
    report.

    Scale: ONE shuffle by user (the row_number window); the path
    build is an in-row sort of ≤{steps} structs (collect_list of the
    already-filtered prefix — state is bounded by the rank filter,
    never the user's full history); the path groupBy is map-side
    combinable and TakeOrdered replaces a global sort for the
    top-k."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = (e.select("user_id", "event_type", "ts", "event_id")
         .withColumn("rn", F.row_number().over(w))
         .filter(F.col("rn") <= _PATH_STEPS))
    p = (r.groupBy("user_id")
         .agg(F.array_join(
             F.transform(
                 F.array_sort(F.collect_list(
                     F.struct(F.col("rn"), F.col("event_type")))),
                 lambda x: x["event_type"]),
             ">").alias("path")))
    return (p.groupBy("path")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .orderBy(F.desc("n_users"), F.asc("path"))
            .limit(_PATH_K))


# --------------------------------------------------------------------------
# Referential-integrity audit of the whole star schema
# --------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
]

_FK_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphans
FROM {child} ch
LEFT JOIN (SELECT DISTINCT {pkey} FROM {parent}) p
  ON ch.{ckey} = p.{pkey}"""
    for name, child, ckey, parent, pkey in _FK_EDGES)


def _q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every FK edge of the star
    schema, the child row count and the count of rows whose key has
    no parent — the DQ gate the reference's hand-written DDL implies
    but never verifies (reference dags/etl_municipios.py:25-48).  One
    DataFrame, seven left joins against DISTINCT parent keys, one
    action.

    Scale: each branch is a KEYS-ONLY join — the child projects its
    FK column, the parent side is deduplicated before joining (small
    dims broadcast; the two fact-fact edges shuffle bigint keys
    only).  The per-branch aggregate is map-side combinable to a
    single row, so the union'd result is 7 rows regardless of fact
    size."""
    branches = []
    for name, child, ckey, parent, pkey in _FK_EDGES:
        ch = load_table(spark, sf_dir, child, fan_out=False) \
            .select(ckey)
        pk = load_table(spark, sf_dir, parent, fan_out=False) \
            .select(pkey).distinct() \
            .withColumn("__hit", F.lit(1))
        if parent in ("nation", "region", "supplier", "customer", "part"):
            pk = F.broadcast(pk)
        j = ch.join(pk, ch[ckey] == pk[pkey], "left")
        branches.append(
            j.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                  F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
                  .cast("bigint").alias("n_orphans"))
            .select(F.lit(name).alias("relation"), "n_rows", "n_orphans"))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


# --------------------------------------------------------------------------
# Time-bounded conversion funnel: view -> purchase within 7 days
# --------------------------------------------------------------------------

_CONV_SQL = f"""
WITH v AS (
    SELECT user_id, min(ts) AS vt
    FROM events WHERE event_type = 'view' GROUP BY user_id
), u AS (
    SELECT v.user_id,
           epoch_us(CAST(v.vt AS TIMESTAMP)) // {_DAY_US} AS cohort_day,
           max(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END) AS conv
    FROM v LEFT JOIN events p
      ON p.user_id = v.user_id AND p.event_type = 'purchase'
     AND p.ts > v.vt AND p.ts <= v.vt + INTERVAL 7 DAY
    GROUP BY 1, 2
)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(conv) AS BIGINT) AS n_converted,
       round(SUM(conv) * 1.0 / COUNT(*), 6) AS conversion
FROM u GROUP BY 1
"""


def _q_conversion_within_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deadline funnel: of users whose first 'view' fell on day D, how
    many made a 'purchase' within 7 days of it — conversion with a
    time budget, which the plain ordered-EXISTS funnel cannot express.
    Cohorted by first-view day.

    Scale: first-view is a map-side-combinable min; the deadline
    check is a user-keyed join against ONLY the purchase slice
    (filter pushed to the scan), re-aggregated per user before the
    tiny cohort rollup, so purchase multiplicity never reaches the
    output.  The user-keyed shuffle is the one real exchange; both
    sides arrive partitioned by the same key."""
    e = load_table(spark, sf_dir, "events")
    v = (e.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("vt")))
    p = (e.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"), F.col("ts")
                 .alias("pt")))
    j = v.join(
        p, (F.col("p_user") == F.col("user_id"))
        & (F.col("pt") > F.col("vt"))
        & (F.col("pt") <= F.col("vt") + F.expr("INTERVAL 7 DAYS")),
        "left")
    u = (j.groupBy("user_id",
                   F.expr(f"unix_micros(vt) div {_DAY_US}")
                   .alias("cohort_day"))
         .agg(F.max(F.when(F.col("pt").isNotNull(), 1).otherwise(0))
              .alias("conv")))
    return (u.groupBy(F.col("cohort_day").cast("bigint")
                      .alias("cohort_day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
                 F.sum("conv").cast("bigint").alias("n_converted"),
                 F.round(F.sum("conv") * 1.0 / F.count(F.lit(1)), 6)
                 .alias("conversion")))


# --------------------------------------------------------------------------
# Herfindahl–Hirschman supplier concentration per (nation, year)
# --------------------------------------------------------------------------

_HHI_SQL = f"""
WITH r AS (
    SELECT s.s_nationkey, year(l.l_shipdate) AS l_year, l.l_suppkey,
           CAST(SUM({_REV_MICROS_SQL}) AS BIGINT) AS m
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1, 2, 3
), a AS (
    SELECT s_nationkey, l_year,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(m) AS BIGINT) AS tot,
           SUM(CAST(m AS HUGEINT) * m) AS sumsq
    FROM r GROUP BY 1, 2
)
SELECT n.n_name AS supp_nation, CAST(a.l_year AS BIGINT) AS l_year,
       a.n_suppliers,
       round(CAST(a.sumsq AS DOUBLE)
             / (CAST(a.tot AS DOUBLE) * CAST(a.tot AS DOUBLE)), 6)
           AS hhi
FROM a JOIN nation n ON a.s_nationkey = n.n_nationkey
"""


def _q_hhi_supplier_concentration(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration
    per (supplier nation, ship year): Σ share_i² — the antitrust
    measure (1/n = perfect competition, 1 = monopoly).  Computed as
    Σm_i² / (Σm_i)² on integer revenue micros; squares of micros
    exceed BIGINT, so the second moment accumulates in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB) — exact integers until the ONE final
    division (int→double conversion is correctly rounded on both
    engines).

    Scale: one map-side-combinable groupBy to (nation, year,
    supplier) rows, a broadcast supplier/nation resolution, then a
    second tiny aggregate — the reduce side is ≤ |nations|·|years|
    rows regardless of fact size."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=False)
    s = load_table(spark, sf_dir, "supplier") \
        .select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .groupBy("s_nationkey", F.year("l_shipdate").alias("l_year"),
                  "l_suppkey")
         .agg(F.sum(_rev_micros()).cast("bigint").alias("m")))
    a = r.groupBy("s_nationkey", "l_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("m").cast("bigint").alias("tot"),
        F.sum(F.col("m").cast("decimal(19,0)")
              * F.col("m").cast("decimal(19,0)")).alias("sumsq"))
    hhi = F.round(
        F.col("sumsq").cast("double")
        / (F.col("tot").cast("double") * F.col("tot").cast("double")), 6)
    return (a.join(F.broadcast(n),
                   F.col("s_nationkey") == F.col("n_nationkey"))
            .select(F.col("n_name").alias("supp_nation"),
                    F.col("l_year").cast("bigint").alias("l_year"),
                    "n_suppliers", hhi.alias("hhi")))


# --------------------------------------------------------------------------
# Exact discrete gap quantiles per event type
# --------------------------------------------------------------------------

_GAP_SQL = """
WITH o AS (
    SELECT event_type, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS prev
    FROM events
), r AS (
    SELECT event_type, gap,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY gap, user_id, us) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM (SELECT event_type, user_id, us, us - prev AS gap
          FROM o WHERE prev IS NOT NULL) t
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(min(gap) AS BIGINT) AS min_gap_us,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT)
           AS median_gap_us,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS BIGINT)
           AS p90_gap_us,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM r GROUP BY event_type
"""


def _q_session_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per event type: min, LOW-median,
    discrete p90, and max of the microsecond gaps between consecutive
    same-user same-type events.  Quantiles are DISCRETE order
    statistics selected by row_number against the partition count
    ((n+1)//2 and ceil(0.9n) = (9n+9)//10), so every reported value
    is an actual gap — integer parity, no interpolation ambiguity.

    Scale: the lag window shuffles by (user, type) — fine-grained
    keys; the rank window re-shuffles by type only over the already-
    reduced gap rows.  A 5-type partition count is the honest skew
    caveat: at 100 TB the per-type rank would use the two-pass
    histogram quantile (value_percentiles' approach) instead of a
    5-partition sort; the windows here pin the exact semantics that
    approximation must converge to."""
    e = load_table(spark, sf_dir, "events")
    # us = unix_micros(ts) is order-isomorphic to ts, so ordering the
    # lag by (us, event_id) matches the oracle's (ts, event_id).
    o = (e.select("event_type", "user_id", "event_id",
                  F.unix_micros("ts").alias("us"))
         .withColumn("prev", F.lag("us").over(
             Window.partitionBy("user_id", "event_type")
             .orderBy("us", "event_id"))))
    g = (o.filter(F.col("prev").isNotNull())
         .select("event_type", "user_id", "us",
                 (F.col("us") - F.col("prev")).alias("gap")))
    wr = Window.partitionBy("event_type").orderBy("gap", "user_id", "us")
    wp = Window.partitionBy("event_type")
    r = (g.withColumn("rn", F.row_number().over(wr))
         .withColumn("n", F.count(F.lit(1)).over(wp).cast("bigint")))
    return r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.min("gap").cast("bigint").alias("min_gap_us"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                     F.col("gap"))).cast("bigint")
         .alias("median_gap_us"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"),
                     F.col("gap"))).cast("bigint")
         .alias("p90_gap_us"),
        F.max("gap").cast("bigint").alias("max_gap_us"))


# --------------------------------------------------------------------------
# ABC (cumulative revenue share) classification of parts
# --------------------------------------------------------------------------

_ABC_SQL = f"""
WITH pr AS (
    SELECT l_partkey, CAST(SUM({_REV_MICROS_SQL}) AS BIGINT) AS m
    FROM lineitem GROUP BY 1
), c AS (
    SELECT l_partkey, m,
           CAST(SUM(m) OVER (ORDER BY m DESC, l_partkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS cum,
           CAST(SUM(m) OVER () AS BIGINT) AS tot
    FROM pr
), k AS (
    SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                WHEN cum * 20 <= tot * 19 THEN 'B'
                ELSE 'C' END AS abc_class, m, tot
    FROM c
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(m) AS BIGINT) AS revenue_micros,
       round(SUM(m) * 1.0 / max(tot), 6) AS share
FROM k GROUP BY abc_class
"""


def _q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts sorted by revenue
    descending; class A = the prefix holding ≤80 % of cumulative
    revenue, B up to 95 %, C the tail.  The thresholds compare in
    integer micros (cum·5 ≤ tot·4, cum·20 ≤ tot·19) — never float
    shares, so the class boundary is exact.  (BIGINT headroom: cum
    micros reach ~1e16 at sf0.1, ×20 ≈ 2e17, well under 9.2e18; at
    warehouse scale the compare lifts to DECIMAL.)

    Scale: the per-part aggregate is map-side combinable; the
    cumulative window is a single global sort of the ALREADY REDUCED
    per-part frame (|parts|, not |lineitem|) — the standard
    Pareto-curve shape; the final rollup is 3 rows."""
    li = load_table(spark, sf_dir, "lineitem", fan_out=False)
    pr = li.groupBy("l_partkey").agg(
        F.sum(_rev_micros()).cast("bigint").alias("m"))
    wc = Window.orderBy(F.desc("m"), F.asc("l_partkey")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy()
    c = (pr.withColumn("cum", F.sum("m").over(wc).cast("bigint"))
         .withColumn("tot", F.sum("m").over(wt).cast("bigint")))
    cls = (F.when(F.col("cum") * 5 <= F.col("tot") * 4, "A")
           .when(F.col("cum") * 20 <= F.col("tot") * 19, "B")
           .otherwise("C"))
    return (c.withColumn("abc_class", cls)
            .groupBy("abc_class")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"),
                 F.sum("m").cast("bigint").alias("revenue_micros"),
                 F.round(F.sum("m") * 1.0 / F.max("tot"), 6)
                 .alias("share")))


# --------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov distance between document sources
# --------------------------------------------------------------------------

_KS_SRC_A = "src0"
_KS_SRC_B = "src1"

_KS_SQL = f"""
WITH c AS (
    SELECT n_chars,
           CAST(SUM(CASE WHEN source = '{_KS_SRC_A}' THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN source = '{_KS_SRC_B}' THEN 1 ELSE 0 END)
                AS BIGINT) AS c2
    FROM documents WHERE source IN ('{_KS_SRC_A}', '{_KS_SRC_B}')
    GROUP BY n_chars
), w AS (
    SELECT CAST(SUM(c1) OVER (ORDER BY n_chars
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS f1,
           CAST(SUM(c2) OVER (ORDER BY n_chars
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS BIGINT) AS f2,
           CAST(SUM(c1) OVER () AS BIGINT) AS n1,
           CAST(SUM(c2) OVER () AS BIGINT) AS n2
    FROM c
)
SELECT max(n1) AS n1, max(n2) AS n2,
       CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS d_scaled,
       round(max(abs(f1 * n2 - f2 * n1)) * 1.0 / (max(n1) * max(n2)), 6)
           AS ks_distance
FROM w
"""


def _q_ks_two_sample_sources(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between two sources'
    document-length distributions: D = max_x |F̂₁(x) − F̂₂(x)| — the
    corpus-curation drift gate ('did this crawl's length profile
    shift?').  Exact: both empirical CDFs scale to integers
    (F̂ᵢ·n₁·n₂), the max runs on |f1·n2 − f2·n1|, and the single
    division happens once at the end.

    Scale: lengths pre-aggregate to (value, c1, c2) cells — the
    cumulative window sorts the DISTINCT-value frame, not documents
    (for unbounded-cardinality metrics, bin first; n_chars is
    integer-bounded).  The single-partition window over that reduced
    frame is the documented trade; the totals ride the same window
    (no extra pass).  BIGINT headroom: |f·n| ≤ n₁·n₂ — exact to ~3e9
    docs per side; beyond that, the same DECIMAL(38,0) lift as the
    HHI second moment."""
    d = load_table(spark, sf_dir, "documents")
    c = (d.filter(F.col("source").isin(_KS_SRC_A, _KS_SRC_B))
         .groupBy("n_chars")
         .agg(F.sum(F.when(F.col("source") == _KS_SRC_A, 1)
                    .otherwise(0)).cast("bigint").alias("c1"),
              F.sum(F.when(F.col("source") == _KS_SRC_B, 1)
                    .otherwise(0)).cast("bigint").alias("c2")))
    wc = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy()
    w = (c.withColumn("f1", F.sum("c1").over(wc).cast("bigint"))
         .withColumn("f2", F.sum("c2").over(wc).cast("bigint"))
         .withColumn("n1", F.sum("c1").over(wt).cast("bigint"))
         .withColumn("n2", F.sum("c2").over(wt).cast("bigint")))
    dev = F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
    return w.agg(
        F.max("n1").alias("n1"), F.max("n2").alias("n2"),
        F.max(dev).cast("bigint").alias("d_scaled"),
        F.round(F.max(dev) * 1.0 / (F.max("n1") * F.max("n2")), 6)
         .alias("ks_distance"))


# --------------------------------------------------------------------------
# Streaming windowed top-k event types
# --------------------------------------------------------------------------

_STREAM_TOPK_SQL = """
WITH c AS (
    SELECT time_bucket(INTERVAL 6 HOURS, CAST(ts AS TIMESTAMP))
               AS window_start,
           event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
), r AS (
    SELECT window_start, event_type, n_events,
           CAST(row_number() OVER (PARTITION BY window_start
                              ORDER BY n_events DESC, event_type ASC)
                AS BIGINT) AS rnk
    FROM c
)
SELECT window_start, event_type, n_events, rnk
FROM r WHERE rnk <= 3
"""


def _q_stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard (streaming/windowed.stream_windowed_topk):
    tumbling 6-hour windows over the event stream, watermark-bounded
    count state (one row per window × type — never raw events), run
    to completion with availableNow; rank-at-read gives the top-3 per
    window with a deterministic tie-break, hash-equal to the batch
    oracle."""
    from .streaming.windowed import stream_windowed_topk
    return stream_windowed_topk(spark, sf_dir, hours=6, k=3)


# (name, oracle_sql, fn) in admission order — appended to
# registry_pending.PENDING behind tranche 5.
PENDING6: list[tuple[str, str,
                     Callable[[SparkSession, str], DataFrame]]] = [
    ("dedup_containment", _CONTAIN_SQL, _q_dedup_containment),
    ("event_type_gini", _GINI_IMP_SQL, _q_event_type_gini),
    ("revenue_gini_nation", _GINI_COEF_SQL, _q_revenue_gini_nation),
    ("cusum_changepoint", _CUSUM_SQL, _q_cusum_changepoint),
    ("event_path_topk", _PATH_SQL, _q_event_path_topk),
    ("fk_integrity_audit", _FK_SQL, _q_fk_integrity_audit),
    ("conversion_within_7d", _CONV_SQL, _q_conversion_within_7d),
    ("hhi_supplier_concentration", _HHI_SQL,
     _q_hhi_supplier_concentration),
    ("session_gap_stats", _GAP_SQL, _q_session_gap_stats),
    ("abc_classification", _ABC_SQL, _q_abc_classification),
    ("ks_two_sample_sources", _KS_SQL, _q_ks_two_sample_sources),
    ("stream_windowed_topk", _STREAM_TOPK_SQL, _q_stream_windowed_topk),
]
