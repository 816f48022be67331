"""Round-3 extension queries: corpus composition (mixing, sharding,
perplexity-proxy scoring), prefix dedup, skew-salted join, ORC
round-trip, bigram LM counts, winsorized robust aggregates, and the
watermarked streaming dedup parity query.

Same contract as registry_ext: every SQL-expressible query carries a
DuckDB oracle built on engine-portable primitives, with arithmetic
association mirrored exactly so double-precision results are
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import mixing as X
from .operators.aggregate import dsum
from .operators.graph import pagerank_sql
from .operators.joins import salted_join
from .registry import _t, register
from .workdirs import fresh_work_dir

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


# --------------------------------------------------------------------------
# Corpus composition
# --------------------------------------------------------------------------

@register("corpus_mix", sql=X.source_mix_sql(
    "documents", "doc_id", "text", "source", budget_frac=0.5, salt="mix"))
def q_corpus_mix(spark, sf_dir):
    """Weighted source mixing under a token budget (see
    operators/mixing.source_mix): per-source rates from a keys-only
    aggregate, broadcast back, content-hash sampled in the scan."""
    docs = _t(spark, sf_dir, "documents")
    return X.source_mix(docs, "doc_id", "text", "source",
                        budget_frac=0.5, salt="mix")


@register("docs_shuffle_shard", sql=f"""
WITH b AS (
    SELECT doc_id,
           {X.hash_bucket_sql(["doc_id"], "shf")} AS bucket
    FROM documents
)
SELECT doc_id, CAST(bucket % 8 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY bucket % 8
                               ORDER BY bucket, doc_id) AS BIGINT) AS pos
FROM b
""")
def q_docs_shuffle_shard(spark, sf_dir):
    """Deterministic global shuffle + 8-way shard assignment (the
    "shuffle the corpus, write N training shards" step) — one shuffle,
    no global sort (operators/mixing.shuffle_shard)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return X.shuffle_shard(docs, ["doc_id"], n_shards=8, salt="shf") \
        .select("doc_id", "shard", "pos")


@register("unigram_logprob", sql=f"""
WITH t AS (
    SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), f AS (
    SELECT tok, count(*) AS cnt FROM t GROUP BY tok
), tot AS (
    SELECT SUM(cnt) AS tot FROM f
), v AS (
    SELECT tok,
           CAST(round((-ln(cnt / tot)) * 1000000.0) AS BIGINT) AS nll
    FROM f CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(SUM(nll) AS BIGINT) AS nll_micro,
       (CAST(SUM(nll) AS DOUBLE) / count(*)) / 1000000.0 AS avg_nll
FROM t JOIN v USING (tok) GROUP BY doc_id
""")
def q_unigram_logprob(spark, sf_dir):
    """Unigram-LM negative log-likelihood per document — the
    perplexity-filter baseline (operators/mixing.unigram_nll):
    integer micro-nat quantization keeps document sums exact and
    engine-portable."""
    docs = _t(spark, sf_dir, "documents")
    return X.unigram_nll(docs, "doc_id", "text")


@register("dedup_prefix_hash", sql="""
SELECT md5(substr(trim(text), 1, 100)) AS prefix_key,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
""")
def q_dedup_prefix_hash(spark, sf_dir):
    """Prefix-hash dedup (C4/Gopher "same first 100 chars" heuristic):
    catches same-lede template duplicates exact dedup misses, at exact
    dedup's shuffle cost (operators/dedup.prefix_dedup_groups)."""
    docs = _t(spark, sf_dir, "documents")
    return D.prefix_dedup_groups(docs, "doc_id", "text", prefix_len=100)


@register("ngram_counts", sql=f"""
WITH d AS (
    SELECT {_TOKS} AS toks FROM documents
), g AS (
    SELECT unnest(list_transform(
        generate_series(1, len(toks) - 1),
        i -> toks[i] || ' ' || toks[i + 1])) AS gram
    FROM d
), c AS (
    SELECT gram, count(*) AS cnt FROM g GROUP BY gram
)
SELECT gram, CAST(cnt AS BIGINT) AS cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, gram) AS BIGINT) AS rank
FROM c ORDER BY cnt DESC, gram LIMIT 50
""")
def q_ngram_counts(spark, sf_dir):
    """Bigram language-model counts, top-50 with deterministic
    tie-break — the n-gram-LM counterpart of vocab_topk, keeping
    multiplicity (a shingle-dedup would undercount).  Map-side
    combinable wordcount over a generated bigram array; the rank
    window runs over the 50-row result only."""
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select(X.tokens(F.col("text")).alias("__tk"))
    grams = tk.select(F.explode(F.when(
        F.size("__tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__tk") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("__tk"), i),
                F.element_at(F.col("__tk"), i + 1))),
    ).otherwise(F.array().cast("array<string>"))).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc("gram")).limit(50)
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("cnt"), F.asc("gram"))
    return top.select(
        "gram", F.col("cnt").cast("bigint").alias("cnt"),
        F.row_number().over(w).cast("bigint").alias("rank"))


# --------------------------------------------------------------------------
# Robust aggregates / skew / formats / streaming
# --------------------------------------------------------------------------

@register("winsorize_outliers", sql="""
WITH p AS (
    SELECT event_type,
           quantile_cont(value, 0.01) AS p01,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(CAST(least(greatest(e.value, p.p01), p.p99)
                     AS DECIMAL(32,6))) AS DOUBLE) AS sum_clipped,
       round(min(least(greatest(e.value, p.p01), p.p99)), 6)
           AS min_clipped,
       round(max(least(greatest(e.value, p.p01), p.p99)), 6)
           AS max_clipped
FROM events e JOIN p USING (event_type)
GROUP BY e.event_type
""")
def q_winsorize_outliers(spark, sf_dir):
    """Winsorized (p01/p99-clipped) robust aggregates per group — the
    outlier-clipping step of metric cleaning.  The tiny per-group
    percentile table broadcasts back onto the fact scan; at 100 TB
    swap the exact percentile for approx_percentile and nothing else
    changes."""
    e = _t(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.percentile("value", 0.01).alias("p01"),
        F.percentile("value", 0.99).alias("p99"))
    clip = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        e.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum(clip).alias("sum_clipped"),
             F.round(F.min(clip), 6).alias("min_clipped"),
             F.round(F.max(clip), 6).alias("max_clipped"))
    )


@register("salted_join_events", sql="""
SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""")
def q_salted_join_events(spark, sf_dir):
    """Skew-salted equi-join (operators/joins.salted_join): the big
    side salts on a hash of its payload, the medium side replicates
    across the salt domain, and the result is row-identical to the
    plain join — the oracle IS the plain join."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    return salted_join(ev, dim, ["user_id"], "inner", n_salts=8) \
        .select("event_id", "user_id", "c_mktsegment", "value")


@register("orc_roundtrip", sql="""
SELECT CAST(month(l_shipdate) AS BIGINT) AS ship_month,
       CAST(SUM(CAST(l_quantity AS DECIMAL(32,6))) AS DOUBLE) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1
""")
def q_orc_roundtrip(spark, sf_dir):
    """ORC sink → ORC scan round-trip (sources/orc_source): the 1997
    lineitem slice is written to ORC and aggregated from the ORC copy;
    matching the parquet-side oracle proves the format path is
    lossless (types, timestamps, nulls) end to end."""
    from .sources.orc_source import read_orc, write_orc
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.year("l_shipdate") == 1997)
          .select("l_orderkey", "l_quantity", "l_shipdate"))
    tmp = fresh_work_dir("orc_rt", sf_dir)
    write_orc(li, f"{tmp}/li")
    back = read_orc(spark, f"{tmp}/li")
    return (
        back.groupBy(F.month("l_shipdate").cast("bigint")
                     .alias("ship_month"))
        .agg(dsum("l_quantity").alias("sum_qty"),
             F.count(F.lit(1)).alias("n_items"))
    )


@register("multimodal_ppm_roundtrip", sql="""
WITH px AS (
    SELECT d.doc_id, r.r, c.c
    FROM documents d,
         generate_series(0, 7) r(r),
         generate_series(0, 7) c(c)
)
SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3 + 11) % 256) AS BIGINT)
           AS sum_g,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3 + 22) % 256) AS BIGINT)
           AS sum_b
FROM px GROUP BY doc_id
""")
def q_multimodal_ppm_roundtrip(spark, sf_dir):
    """REAL image decode, end to end: a deterministic 8×8 P6 PPM is
    encoded per document (raw binary image bytes) and decoded back
    with the numpy-only parser (operators/multimodal.decode_ppm);
    per-channel pixel sums match the closed-form oracle exactly.
    Both stages are Arrow-batched mapInPandas — narrow, no shuffle —
    the production multimodal shape with an honest codec."""
    from .operators.multimodal import decode_ppm, encode_ppm
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return decode_ppm(encode_ppm(docs))


@register("multimodal_ppm_resize", sql="""
WITH px AS (
    SELECT d.doc_id, r.r * 2 AS r, c.c * 2 AS c
    FROM documents d,
         generate_series(0, 3) r(r),
         generate_series(0, 3) c(c)
)
SELECT doc_id, CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3 + 11) % 256) AS BIGINT)
           AS sum_g,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3 + 22) % 256) AS BIGINT)
           AS sum_b
FROM px GROUP BY doc_id
""")
def q_multimodal_ppm_resize(spark, sf_dir):
    """REAL image resize: encode → numpy nearest-neighbor 2× downsample
    (top-left anchor) → channel sums of the 4×4 result, matching the
    closed-form oracle over the even-indexed pixels exactly."""
    from .operators.multimodal import encode_ppm, resize_ppm
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return resize_ppm(encode_ppm(docs), factor=2)


@register("merge_upsert", sql="""
WITH delta AS (
    SELECT user_id * 11 + 100 AS key,
           CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS new_bal
    FROM events GROUP BY user_id
), snap AS (
    SELECT c_custkey AS key, c_acctbal AS bal FROM customer
)
SELECT coalesce(s.key, d.key) AS key,
       round(coalesce(d.new_bal, s.bal), 6) AS bal,
       CASE WHEN d.key IS NULL THEN 'unchanged'
            WHEN s.key IS NULL THEN 'inserted'
            ELSE 'updated' END AS merge_op
FROM snap s FULL OUTER JOIN delta d ON s.key = d.key
""")
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics without a table format: WHEN MATCHED
    UPDATE (change row replaces the snapshot value), WHEN NOT MATCHED
    INSERT, untouched snapshot rows pass through.  Executed as
    tag-union + one groupBy (max_by on the change priority) — the
    scale shape: a full-outer join would shuffle the whole snapshot
    against the whole delta as a JOIN; the union aggregates on the
    key ONCE and is map-side combinable.  The oracle IS the
    full-outer-join formulation, proving the two equivalent."""
    delta = (
        _t(spark, sf_dir, "events")
        .groupBy((F.col("user_id") * 11 + 100).alias("key"))
        .agg(dsum("value").alias("val"))
        .select("key", "val", F.lit(1).alias("pri"),
                F.lit(True).alias("from_delta")))
    snap = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("val"),
        F.lit(0).alias("pri"), F.lit(False).alias("from_delta"))
    merged = (
        snap.unionByName(delta)
        .groupBy("key")
        .agg(F.max_by("val", "pri").alias("bal"),
             F.max("pri").alias("has_delta"),
             F.count(F.lit(1)).alias("n_src"))
    )
    return merged.select(
        "key", F.round("bal", 6).alias("bal"),
        F.when(F.col("has_delta") == 0, "unchanged")
         .when(F.col("n_src") == 1, "inserted")
         .otherwise("updated").alias("merge_op"))


@register("quality_quantile_bins", sql="""
WITH q AS (
    SELECT doc_id, source,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tok
    FROM documents
), cuts AS (
    SELECT source,
           quantile_cont(n_tok, 0.25) AS q1,
           quantile_cont(n_tok, 0.50) AS q2,
           quantile_cont(n_tok, 0.75) AS q3
    FROM q GROUP BY source
)
SELECT q.doc_id, q.source, q.n_tok,
       CAST(CASE WHEN q.n_tok <= c.q1 THEN 0
                 WHEN q.n_tok <= c.q2 THEN 1
                 WHEN q.n_tok <= c.q3 THEN 2
                 ELSE 3 END AS BIGINT) AS bin
FROM q JOIN cuts c ON c.source = q.source
""")
def q_quality_quantile_bins(spark, sf_dir):
    """Per-source quartile binning (the quality-bucketing step of
    curriculum / mixture design): exact per-group quartiles broadcast
    back onto the scan as three comparisons.  At 100 TB swap
    percentile for approx_percentile; the bin assignment is unchanged.
    Integer token counts make the quantile cuts engine-identical."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.text import token_count
    q = docs.select("doc_id", "source",
                    token_count(F.col("text")).alias("n_tok"))
    cuts = q.groupBy("source").agg(
        F.percentile("n_tok", 0.25).alias("q1"),
        F.percentile("n_tok", 0.50).alias("q2"),
        F.percentile("n_tok", 0.75).alias("q3"))
    return (
        q.join(F.broadcast(cuts), "source")
        .select("doc_id", "source", "n_tok",
                F.when(F.col("n_tok") <= F.col("q1"), 0)
                 .when(F.col("n_tok") <= F.col("q2"), 1)
                 .when(F.col("n_tok") <= F.col("q3"), 2)
                 .otherwise(3).cast("bigint").alias("bin"))
    )


@register("shipping_priority", sql="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(32,6))) AS DOUBLE) AS revenue,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l.l_orderkey, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
""")
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment filter -> star join -> revenue agg ->
    top-10.  Both filters push into their scans (date pruning at
    100 TB), the customer side reduces to keys before broadcasting,
    and the top-k is TakeOrdered, never a global sort."""
    c = (_t(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING")
         .select("c_custkey"))
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") < "1997-01-01")
         .select("o_orderkey", "o_custkey", "o_orderpriority"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > "1997-01-01")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
    )


@register("customer_distribution", sql="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
""")
def q_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: orders-per-customer distribution via left
    outer join (zero-order customers count!) + double aggregation.
    The first agg shuffles on custkey, the second on the tiny count
    domain — classic two-level rollup, no skew exposure."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist"))


@register("value_histogram", sql="""
SELECT event_type, CAST(floor(value / 25) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""")
def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram per group — scan-local bin assignment,
    one map-side-combinable aggregation; the 100-TB distribution
    profiling primitive (feeds the quality-binning and outlier
    stages)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type",
                  F.floor(F.col("value") / 25).cast("bigint").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "bin", "n")
    )


@register("value_trend_regression", sql="""
SELECT event_type,
       round(regr_slope(value, d), 6) AS slope,
       round(regr_intercept(value, d), 6) AS intercept,
       round(regr_r2(value, d), 6) AS r2,
       CAST(count(*) AS BIGINT) AS n
FROM (
    SELECT event_type, value,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS DOUBLE)
               AS d
    FROM events
)
GROUP BY event_type
""")
def q_value_trend_regression(spark, sf_dir):
    """Per-group least-squares trend (value vs day index) via the
    regr_* aggregates — single-pass mergeable moment states like
    stats_moments, so the shuffle carries one small state per group.
    Rounded to 6 dp: the moment sums are the only order-dependent
    doubles and the magnitudes keep the noise far below the
    rounding."""
    e = _t(spark, sf_dir, "events")
    # floor-div, not `div`: Spark's div truncates toward zero while the
    # oracle's // floors, and the two disagree for pre-1970 timestamps.
    d = F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000)) \
        .cast("double")
    x = e.select("event_type", "value", d.alias("d"))
    return x.groupBy("event_type").agg(
        F.round(F.regr_slope("value", "d"), 6).alias("slope"),
        F.round(F.regr_intercept("value", "d"), 6).alias("intercept"),
        F.round(F.regr_r2("value", "d"), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"))


@register("pretrain_sequences", sql=f"""
WITH d AS (
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tok,
           {X.hash_bucket_sql(["doc_id"], "shf")} AS b
    FROM documents
), sh AS (
    SELECT doc_id, n_tok, b, CAST(b % 8 AS BIGINT) AS shard FROM d
), off AS (
    SELECT doc_id, n_tok, shard,
           CAST(coalesce(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY b, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS o
    FROM sh
), seqs AS (
    SELECT shard, doc_id, n_tok, o,
           unnest(generate_series(o // 256, (o + n_tok - 1) // 256))
               AS seq_id
    FROM off
)
SELECT shard, CAST(seq_id AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(least((seq_id + 1) * 256, o + n_tok)
                - greatest(seq_id * 256, o)) AS BIGINT) AS n_tok
FROM seqs GROUP BY shard, seq_id
""")
def q_pretrain_sequences(spark, sf_dir):
    """The GPT-style pretraining layout: concatenate the (hash-
    shuffled) documents of each shard and cut the token stream into
    fixed 256-token training sequences that CROSS document boundaries
    (unlike seq_pack's whole-doc bins and doc_chunk's per-doc
    windows).  Per (shard, sequence): contributing docs and token
    count — all integer arithmetic on token offsets (one window
    cumsum + a span explode), so the oracle matches exactly.  One
    shuffle on the shard key; sequences never materialize tokens."""
    S = 256
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql import Window
    b = X.hash_bucket(["doc_id"], "shf")
    d = docs.select(
        "doc_id", X.token_count(F.col("text")).alias("n_tok"),
        b.alias("__b"), (b % 8).cast("bigint").alias("shard"))
    w = (Window.partitionBy("shard").orderBy("__b", "doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    off = d.withColumn("o", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    seqs = off.select(
        "shard", "n_tok", "o",
        F.explode(F.sequence(
            F.expr(f"o div {S}"),
            F.expr(f"(o + n_tok - 1) div {S}")))
        .alias("seq_id"))
    return (
        seqs.groupBy("shard", "seq_id")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum(F.least((F.col("seq_id") + 1) * S,
                           F.col("o") + F.col("n_tok"))
                   - F.greatest(F.col("seq_id") * S, F.col("o")))
             .alias("n_tok"))
        .select("shard", F.col("seq_id").cast("bigint").alias("seq_id"),
                "n_docs", "n_tok")
    )


@register("session_window_agg", sql="""
WITH x AS (
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events
), flags AS (
    SELECT user_id, event_id, us,
           CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w >= 1800000000
                THEN 1 ELSE 0 END AS new_run
    FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), runs AS (
    SELECT user_id, us,
           SUM(new_run) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS run
    FROM flags
)
SELECT user_id, MIN(us) AS start_us,
       MAX(us) + 1800000000 AS end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM runs GROUP BY user_id, run
""")
def q_session_window_agg(spark, sf_dir):
    """Native `session_window` gap-session aggregation — the built-in
    Catalyst form of event_sessionize (which pins the same semantics
    via lag+running-sum): one shuffle on (user_id, session), session
    end = last event + gap, end-exclusive.  Works identically under
    Structured Streaming with a watermark — the operator you'd
    actually deploy for 100-TB session rollups."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"),
                  "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id",
                F.unix_micros(F.col("sw.start")).alias("start_us"),
                F.unix_micros(F.col("sw.end")).alias("end_us"),
                "n_events")
    )


def _stream_curate_sql() -> str:
    from .registry_ext import _QUALITY_SQL
    return f"""
SELECT doc_id, lang, {_QUALITY_SQL} AS quality,
       CAST(len({_TOKS}) AS BIGINT) AS n_tok
FROM documents WHERE {_QUALITY_SQL} >= 0.45
"""


@register("stream_curate_pipeline", sql=_stream_curate_sql())
def q_stream_curate_pipeline(spark, sf_dir):
    """The curation front half run as a STREAM: documents land as
    JSONL (the real ingest format), a file-source stream applies the
    quality gate and token accounting per micro-batch — stateless, so
    no watermark, no state store; the availableNow output hash-matches
    the batch oracle over the same corpus."""
    import uuid as _uuid

    from .operators import text as T2
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    tmp = fresh_work_dir("stream_cur", sf_dir)
    docs.write.mode("overwrite").json(f"{tmp}/in")
    stream = spark.readStream.schema(docs.schema).json(f"{tmp}/in")
    out = (
        stream
        .withColumn("quality",
                    T2.quality_score(F.col("text"), F.length("text")))
        .filter(F.col("quality") >= 0.45)
        .select("doc_id", "lang", "quality",
                T2.token_count(F.col("text")).alias("n_tok")))
    qname = f"stream_cur_{_uuid.uuid4().hex[:8]}"
    query = (out.writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True).start())
    try:
        if not query.awaitTermination(300):
            raise TimeoutError(
                "availableNow stream did not finish within 300 s — "
                "refusing to return a partially-populated sink")
    finally:
        if query.isActive:
            query.stop()
    return spark.table(qname)


_RESAMPLE_STEP = 21_600_000_000  # 6 h in microseconds


@register("events_resample_locf", sql=f"""
WITH ev AS (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           value, event_id
    FROM events
), evu AS (
    SELECT user_id, us, arg_max(value, event_id) AS value
    FROM ev GROUP BY user_id, us
), spans AS (
    SELECT user_id,
           (min(us) + {_RESAMPLE_STEP} - 1) // {_RESAMPLE_STEP} AS g0,
           max(us) // {_RESAMPLE_STEP} AS g1
    FROM ev GROUP BY user_id
), grid AS (
    SELECT user_id,
           unnest(generate_series(g0, g1)) * {_RESAMPLE_STEP} AS grid_us
    FROM spans WHERE g1 >= g0
)
SELECT g.user_id, g.grid_us, e.us AS matched_ts, e.value
FROM grid g
ASOF JOIN evu e ON g.user_id = e.user_id AND g.grid_us >= e.us
""")
def q_events_resample_locf(spark, sf_dir):
    """Time-series resampling to a regular 6-hour grid with
    last-observation-carried-forward fill — the gap-filling operator
    behind dashboards and feature snapshots, composed from the
    engine's own as-of join: per-key span aggregate -> in-row grid
    explode (integer step arithmetic, aligned to step multiples) ->
    non-strict asof against the (key, ts)-deduplicated feed.  One
    shuffle for the span, one for the asof — grid points never touch
    the raw feed except through the asof window.  DuckDB's native
    ASOF JOIN is the oracle."""
    from .operators.joins import asof_join
    step = _RESAMPLE_STEP
    e = _t(spark, sf_dir, "events")
    ev = e.select("user_id", F.unix_micros("ts").alias("us"),
                  "value", "event_id")
    evu = ev.groupBy("user_id", "us").agg(
        F.max_by("value", "event_id").alias("value"))
    spans = ev.groupBy("user_id").agg(
        F.expr(f"(min(us) + {step} - 1) div {step}").alias("g0"),
        F.expr(f"max(us) div {step}").alias("g1"))
    grid = (spans.filter(F.col("g1") >= F.col("g0"))
            .select("user_id",
                    F.explode(F.sequence("g0", "g1")).alias("__g"))
            .select("user_id", (F.col("__g") * step).alias("grid_us")))
    return asof_join(grid, evu, ["user_id"], left_ts="grid_us",
                     right_ts="us", right_vals=["value"], strict=False)


_PR_NODES = "SELECT n_nationkey AS node FROM nation"
_PR_EDGES = """
SELECT c.c_nationkey AS u, s.s_nationkey AS v,
       CAST(count(*) AS BIGINT) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


@register("nation_pagerank", sql=f"""
WITH pr AS ({pagerank_sql(_PR_NODES, _PR_EDGES, 25, iters=5)})
SELECT n.n_name, pr.pagerank FROM pr JOIN nation n ON n.n_nationkey = pr.node
""")
def q_nation_pagerank(spark, sf_dir):
    """Weighted PageRank over the nation-level trade graph (customer
    nation -> supplier nation, edge weight = lineitem count), 5 power
    iterations (operators/graph.pagerank).  The edge build is the
    multi_join_revenue star join; the iteration shuffles only
    (node, rank) pairs.  Oracle: the same 5 rounds unrolled as CTEs,
    decimal-accumulated so the doubles match to the bit."""
    from .operators.graph import pagerank
    nation = _t(spark, sf_dir, "nation")
    edges = _pr_edges_local(spark, sf_dir)
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    # Bounded-dimension graph (<= |nations|^2 edges at any corpus
    # scale): edges are a driver-local table, so broadcast both
    # per-iteration joins — the only shuffle per round is the tiny
    # (node, decimal) aggregate.
    pr = pagerank(nodes, edges, iters=5, broadcast_edges=True)
    return pr.join(F.broadcast(nation),
                   pr.node == nation.n_nationkey) \
        .select("n_name", "pagerank")


def _pr_edges_local(spark, sf_dir):
    """The weighted nation->nation trade graph, star-joined once per
    (session, sf_dir) and materialized to the driver — same rationale
    and bound as registry_pending._trade_edges: a node-pair aggregate
    over the nation dimension is a tiny derived MODEL, and handing
    iterative consumers a LocalTableScan keeps their plans small."""
    from .session import session_memo

    return session_memo(spark, f"pr_edges:{sf_dir}",
                        lambda: _build_pr_edges(spark, sf_dir))


def _build_pr_edges(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("u"),
                 F.col("s_nationkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return spark.createDataFrame(edges.collect(), schema=edges.schema)


@register("jsonl_roundtrip", sql="""
SELECT doc_id, lang, source, md5(text) AS text_md5 FROM documents
""")
def q_jsonl_roundtrip(spark, sf_dir):
    """JSON-lines sink → scan round-trip: the documents table is
    written as JSONL (the lingua franca of training-data interchange)
    and read back with an explicit schema; md5 of the recovered text
    against the parquet-side oracle proves the encode/decode is
    lossless (quoting, unicode, nulls)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    tmp = fresh_work_dir("jsonl_rt", sf_dir)
    docs.write.mode("overwrite").json(f"{tmp}/docs")
    back = spark.read.schema(docs.schema).json(f"{tmp}/docs")
    return back.select("doc_id", "lang", "source",
                       F.md5("text").alias("text_md5"))


@register("text_source_roundtrip", sql=f"""
SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok FROM documents
""")
def q_text_source_roundtrip(spark, sf_dir):
    """Raw-text sink → `spark.read.text` scan round-trip: documents
    serialized as tab-separated lines, re-parsed with JVM regex
    extraction (id + body), token counts matched against the parquet
    side.  The line-oriented text source is how raw corpora actually
    arrive; at 100 TB the directory is the unit of parallelism."""
    from .operators.text import token_count
    docs = _t(spark, sf_dir, "documents")
    tmp = fresh_work_dir("text_rt", sf_dir)
    docs.select(F.concat_ws("\t", F.col("doc_id"), F.col("text"))
                .alias("value")).write.mode("overwrite").text(f"{tmp}/docs")
    back = spark.read.text(f"{tmp}/docs")
    return back.select(
        F.regexp_extract("value", r"^(\d+)\t", 1).cast("bigint")
         .alias("doc_id"),
        token_count(F.regexp_replace("value", r"^\d+\t", ""))
         .alias("n_tok"))


@register("sketch_cardinality", sql="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(1 AS BIGINT) AS within_bounds
FROM events GROUP BY event_type
""")
def q_sketch_cardinality(spark, sf_dir):
    """HyperLogLog++ cardinality sketches vs exact distinct counts —
    the 100-TB path for COUNT(DISTINCT): the sketch is fixed-size,
    map-side combinable, and mergeable across partitions/days, where
    exact distinct shuffles every key.  The raw estimate is
    engine-specific (DuckDB has no HLL++ with Spark's register
    layout), so the CHECKED value is the deterministic error contract:
    ``within_bounds`` = 1 iff the rsd=0.02 sketch lands within 5% of
    the exact count (2.5 sigma; deterministic for fixed input — HLL++
    has no RNG) — compared three-way against the oracle's literal 1
    alongside the exact counts.  The tighter-path law (estimate within
    bounds at every sf) is additionally pinned by
    tests/test_round3_ops.py."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02)
             .alias("approx_users"),
             F.countDistinct("user_id").alias("exact_users"))
        .select(
            "event_type",
            F.col("exact_users").cast("bigint").alias("exact_users"),
            (F.abs(F.col("approx_users") - F.col("exact_users"))
             <= 0.05 * F.col("exact_users"))
            .cast("bigint").alias("within_bounds"))
    )


@register("stream_dedup_watermark", sql="""
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
FROM events
""")
def q_stream_dedup_watermark(spark, sf_dir):
    """Watermarked streaming dedup (dropDuplicatesWithinWatermark) run
    availableNow: with a unique-keyed source the output equals the
    input — the batch-parity oracle; duplicate-arrival behavior is
    pinned by test_streaming_dedup_drops_duplicates."""
    from .streaming.windowed import streaming_dedup
    out = streaming_dedup(spark, sf_dir)
    return out.select("event_id", "user_id", "event_type",
                      F.unix_micros("ts").alias("ts_us"))
