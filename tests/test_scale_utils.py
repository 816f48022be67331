"""Scale utilities: salted-join equivalence on skewed keys, and
hypothesis property tests for the tolerant-repair semantics (the
SURVEY §5 dirty-input strategy, generalized from fixed fixtures to
generated inputs)."""

from __future__ import annotations

import math

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators.joins import salted_join
from etl_dados_ibge_sp_spark.operators.repair import try_cast_columns

# ---------------------------------------------------------------------------
# salted join
# ---------------------------------------------------------------------------


def _skewed_frames(spark):
    # 900 of 1000 rows share one hot key — the shape that melts a
    # single reducer in a plain shuffle join.
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("v"))
    medium = spark.createDataFrame(
        [("hot", 1), ("k950", 2), ("missing", 3)], ["k", "w"])
    return big, medium


def test_salted_join_inner_matches_plain(spark):
    big, medium = _skewed_frames(spark)
    plain = big.join(medium, ["k"], "inner")
    salted = salted_join(big, medium, ["k"], "inner", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, salted.collect()))


def test_salted_join_left_matches_plain(spark):
    big, medium = _skewed_frames(spark)
    plain = big.join(medium, ["k"], "left")
    salted = salted_join(big, medium, ["k"], "left", n_salts=4)
    assert sorted(map(tuple, plain.collect()), key=str) == \
        sorted(map(tuple, salted.collect()), key=str)


# ---------------------------------------------------------------------------
# tolerant repair properties
# ---------------------------------------------------------------------------

DIRTY = st.sampled_from(["INF", "-INF", "NaN", "", "  INF  ", "abc",
                         "12x", "1e999"])
NUMERICISH = st.one_of(
    st.integers(-10**12, 10**12).map(str),
    st.floats(allow_nan=False, allow_infinity=False,
              width=32).map(lambda f: f"{f!r}"),
    DIRTY,
)


def _ref_bigint(s: str):
    """Python restatement of try_cast_columns semantics for bigint:
    dirty tokens -> null; else parse as double; non-integral values
    null out (the reference's strict=False Int64 cast nulls '24.7',
    while '-24.0' repairs); out-of-range/overflow -> null."""
    if s.strip() in ("INF", "-INF", "NaN", ""):
        return None
    try:
        d = float(s)
    except ValueError:
        return None
    if math.isnan(d) or math.isinf(d) or d != math.floor(d):
        return None
    t = int(d)
    if not (-2**63 <= t < 2**63):
        return None
    return t


@given(st.lists(NUMERICISH, min_size=1, max_size=50))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_try_cast_bigint_matches_reference(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    got = [r["x"] for r in
           try_cast_columns(df, {"x": "bigint"}).collect()]
    want = [_ref_bigint(v) for v in values]
    assert got == want


@given(st.lists(DIRTY, min_size=1, max_size=20))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dirty_tokens_always_null_out(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    out = try_cast_columns(df, {"x": "double"})
    bad = [r["x"] for r in out.collect()
           if r["x"] is not None and not isinstance(r["x"], float)]
    assert bad == []
    # the canonical dirty tokens specifically must be null
    tokens = {"INF", "-INF", "NaN", ""}
    for v, r in zip(values, out.collect()):
        if v.strip() in tokens:
            assert r["x"] is None


# ---------------------------------------------------------------------------
# dedup signature laws
# ---------------------------------------------------------------------------


def test_minhash_identical_docs_identical_signatures(spark):
    # MinHash law: equal normalized text => equal signature, including
    # under whitespace/case variation (the normalization contract).
    from etl_dados_ibge_sp_spark.operators.dedup import (
        char_shingles, minhash_signature,
    )

    df = spark.createDataFrame([
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "  The   QUICK brown fox jumps over the LAZY dog "),
        (3, "a completely different document body here"),
    ], ["doc_id", "text"])
    sig = minhash_signature(
        char_shingles(df, "doc_id", "text", n=4), "doc_id")
    rows = {r["doc_id"]: tuple(r[c] for c in sig.columns if c != "doc_id")
            for r in sig.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_lsh_finds_planted_near_duplicates(spark):
    # End-to-end LSH recall check: a corpus of distinct docs plus one
    # pair differing by a single character must surface that pair.
    from etl_dados_ibge_sp_spark.operators.dedup import (
        char_shingles, lsh_candidate_pairs, minhash_signature,
    )

    base = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
            "do eiusmod tempor incididunt ut labore et dolore magna")
    docs = [(0, base), (1, base.replace("magna", "magnb"))]
    docs += [(i, f"unique document number {i} with body {i*7919}")
             for i in range(2, 30)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sig = minhash_signature(char_shingles(df, "doc_id", "text"), "doc_id")
    pairs = {(r["id_a"], r["id_b"])
             for r in lsh_candidate_pairs(sig, "doc_id").collect()}
    assert (0, 1) in pairs


def test_simhash_near_docs_small_hamming(spark):
    from etl_dados_ibge_sp_spark.operators.dedup import simhash16

    base = " ".join(f"token{i}" for i in range(50))
    df = spark.createDataFrame([
        (1, base),
        (2, base + " extra"),                      # near-dup
        (3, " ".join(f"other{i}" for i in range(50))),  # unrelated
    ], ["doc_id", "text"])
    h = {r["doc_id"]: r["simhash"] for r in simhash16(
        df, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[1], h[2]) <= 3
    assert ham(h[1], h[3]) > 3


# ---------------------------------------------------------------------------
# bucketed co-located join (the SCALE.md layout claim)
# ---------------------------------------------------------------------------


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Writing both join sides bucketed by the key lets the sort-merge
    join run without any Exchange — the co-located-join layout SCALE.md
    prescribes for fact-fact joins at 100 TB."""
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    try:
        orders = load_table(spark, sf_dir, "orders") \
            .select("o_orderkey", "o_totalprice")
        li = load_table(spark, sf_dir, "lineitem") \
            .select("l_orderkey", "l_quantity")
        (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
         .sortBy("o_orderkey").saveAsTable("bucketdemo.orders_b"))
        (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
         .sortBy("l_orderkey").saveAsTable("bucketdemo.lineitem_b"))

        a = spark.table("bucketdemo.orders_b")
        b = spark.table("bucketdemo.lineitem_b")
        # Force the non-broadcast path so the test proves bucketing
        # (not the broadcast threshold) removed the shuffles.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """SCALE.md layout claim: a fact table partitioned by date answers
    time-scoped queries by pruning partitions at the scan — the filter
    must appear as a PartitionFilter, not a post-scan Filter."""
    from pyspark.sql import functions as F2

    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events") \
        .withColumn("day", F2.to_date("ts"))
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    days = [r["day"] for r in
            spark.read.parquet(out).select("day").distinct().collect()]
    target = sorted(days)[0]
    q = spark.read.parquet(out).filter(F2.col("day") == F2.lit(target))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "day" in plan.split("PartitionFilters:")[1][:160]
    # count must agree with filtering the unpartitioned source
    expected = ev.filter(F2.col("day") == F2.lit(target)).count()
    assert q.count() == expected > 0


# ---------------------------------------------------------------------------
# deterministic hash sampling / fuzzy join / connected components
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_coordinated(spark):
    """Same key+salt+fraction -> identical sample on re-run; sampling
    two tables on a shared key yields a consistent join sample; the
    achieved rate is close to the requested fraction."""
    from etl_dados_ibge_sp_spark.operators.sample import hash_sample

    df = spark.range(20_000).select(F.col("id").alias("k"))
    s1 = {r["k"] for r in hash_sample(df, ["k"], 0.2).collect()}
    s2 = {r["k"] for r in hash_sample(df, ["k"], 0.2).collect()}
    assert s1 == s2
    assert abs(len(s1) / 20_000 - 0.2) < 0.02
    # coordinated: the 10% sample is a subset of the 20% sample
    s_small = {r["k"] for r in hash_sample(df, ["k"], 0.1).collect()}
    assert s_small <= s1
    # a different table sampled on the same key keeps the same ids
    other = spark.range(20_000).select(F.col("id").alias("k"),
                                       (F.col("id") * 2).alias("v"))
    s3 = {r["k"] for r in hash_sample(other, ["k"], 0.2).collect()}
    assert s3 == s1


def test_fuzzy_join_matches_naive_cross(spark):
    """Length-cell blocking must lose no pairs vs the naive cross
    product, including insert/delete matches that change length."""
    from etl_dados_ibge_sp_spark.operators.joins import fuzzy_join

    names = ["kitten", "sitten", "sittin", "sitting", "mitten",
             "bottucatu", "botucatu", "botucatu ", "sao paulo",
             "sao paulo!", "x", "xy", "totally-different"]
    a = spark.createDataFrame([(n,) for n in names], ["name_a"])
    b = spark.createDataFrame([(n,) for n in names], ["name_b"])
    got = sorted(
        (r["name_a"], r["name_b"])
        for r in fuzzy_join(a, b, "name_a", "name_b", max_dist=2)
        .filter(F.col("name_a") < F.col("name_b")).collect())
    naive = sorted(
        (r["name_a"], r["name_b"])
        for r in a.crossJoin(b)
        .filter((F.levenshtein("name_a", "name_b") <= 2) &
                (F.col("name_a") < F.col("name_b"))).collect())
    assert got == naive and len(got) > 0


def test_fuzzy_join_deletes_matches_naive_cross(spark):
    """Deletion-neighborhood (FastSS) blocking must lose no distance<=1
    pairs vs the naive cross product — including the all-same-length
    case that defeats length-cell blocking, empty strings, and
    transposition-shaped near-misses (distance 2, must be excluded)."""
    from etl_dados_ibge_sp_spark.operators.joins import fuzzy_join_deletes

    names = ["kitten", "sitten", "sittin", "sitting", "mitten", "", "a",
             "ab", "ba", "abc", "bbc", "abcd", "Supplier#000000001",
             "Supplier#000000002", "Supplier#000000011", "different"]
    a = spark.createDataFrame([(n,) for n in names], ["name_a"])
    b = spark.createDataFrame([(n,) for n in names], ["name_b"])
    got = sorted(
        (r["name_a"], r["name_b"])
        for r in fuzzy_join_deletes(a, b, "name_a", "name_b")
        .filter(F.col("name_a") < F.col("name_b")).collect())
    naive = sorted(
        (r["name_a"], r["name_b"])
        for r in a.crossJoin(b)
        .filter((F.levenshtein("name_a", "name_b") <= 1) &
                (F.col("name_a") < F.col("name_b"))).collect())
    assert got == naive and len(got) > 0
    # ("ab","ba") is a transposition: distance 2, must NOT appear
    assert ("ab", "ba") not in got


def test_fuzzy_join_deletes_k2_matches_naive_cross(spark):
    """The <=2-deletion neighborhood (round-10 generalization) must
    find exactly the distance<=2 pairs — including transpositions
    (distance 2 via two substitution-shaped deletions), the fixture
    shape of fuzzy_join_names_k2 (same-length strings differing in
    one trailing char), and distance-3 near-misses (excluded)."""
    from etl_dados_ibge_sp_spark.operators.joins import fuzzy_join_deletes

    names = ["kitten", "sitten", "sittin", "sitting", "mitten", "",
             "a", "ab", "ba", "abc", "bbc", "abcd", "abcdef",
             "0123456789#0", "0123456789#1", "0123456789#2",
             "x123456789#0", "totally-different"]
    a = spark.createDataFrame([(n,) for n in names], ["name_a"])
    b = spark.createDataFrame([(n,) for n in names], ["name_b"])
    got = sorted(
        (r["name_a"], r["name_b"], r["distance"])
        for r in fuzzy_join_deletes(a, b, "name_a", "name_b",
                                    max_dist=2)
        .filter(F.col("name_a") < F.col("name_b")).collect())
    naive = sorted(
        (r["name_a"], r["name_b"], r["d"])
        for r in a.crossJoin(b)
        .withColumn("d", F.levenshtein("name_a", "name_b")
                    .cast("bigint"))
        .filter((F.col("d") <= 2) &
                (F.col("name_a") < F.col("name_b"))).collect())
    assert got == naive and len(got) > 0
    # the transposition IS distance 2 now — it must appear
    assert ("ab", "ba", 2) in got


def test_fuzzy_join_qgrams_matches_naive_cross(spark):
    """q-gram prefix blocking must lose no distance<=2 pairs vs the
    naive cross product — including the all-same-length fixture that
    defeats length-cell blocking, strings below the count-filter
    floor (the short-string fallback path), empty strings, and
    multiplicity of duplicate input rows."""
    from etl_dados_ibge_sp_spark.operators.joins import fuzzy_join_qgrams

    names = ["kitten", "sitten", "sittin", "sitting", "mitten", "",
             "a", "ab", "ba", "abc", "bbc", "abcd", "abcdef",
             "Supplier#000000001", "Supplier#000000002",
             "Supplier#000000011", "Supplier#000000101",
             "totally-different", "sitting"]  # duplicate on purpose
    a = spark.createDataFrame([(n,) for n in names], ["name_a"])
    b = spark.createDataFrame([(n,) for n in names], ["name_b"])
    got = sorted(
        (r["name_a"], r["name_b"])
        for r in fuzzy_join_qgrams(a, b, "name_a", "name_b", max_dist=2)
        .filter(F.col("name_a") < F.col("name_b")).collect())
    naive = sorted(
        (r["name_a"], r["name_b"])
        for r in a.crossJoin(b)
        .filter((F.levenshtein("name_a", "name_b") <= 2) &
                (F.col("name_a") < F.col("name_b"))).collect())
    assert got == naive and len(got) > 0


def test_fuzzy_join_qgrams_k3(spark):
    """The blocking is parameterized in k, not hard-wired to 2."""
    from etl_dados_ibge_sp_spark.operators.joins import fuzzy_join_qgrams

    names = ["abcdefghij", "abcdefgxyz", "abcdefghxy", "zzzzzzzzzz",
             "abcdefghijk"]
    a = spark.createDataFrame([(n,) for n in names], ["name_a"])
    b = spark.createDataFrame([(n,) for n in names], ["name_b"])
    got = sorted(
        (r["name_a"], r["name_b"])
        for r in fuzzy_join_qgrams(a, b, "name_a", "name_b", max_dist=3)
        .filter(F.col("name_a") < F.col("name_b")).collect())
    naive = sorted(
        (r["name_a"], r["name_b"])
        for r in a.crossJoin(b)
        .filter((F.levenshtein("name_a", "name_b") <= 3) &
                (F.col("name_a") < F.col("name_b"))).collect())
    assert got == naive and len(got) > 0


def test_connected_components_chain(spark):
    """A path graph (diameter > 1) must fully converge to the minimum
    label — exercises the iterative propagation, not just near-cliques."""
    from etl_dados_ibge_sp_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], ["node"])
    # two components: a 0-1-2-3-4 chain and a 5-6 edge; 7 isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], ["id_a", "id_b"])
    got = {r["node"]: r["component_id"]
           for r in connected_components(nodes, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 7}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches rounds to reliable checkpoints (the
    cluster-safe path — localCheckpoint blocks die with their executor)
    with an identical result, and actually writes checkpoint files."""
    import os

    from etl_dados_ibge_sp_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(8)], ["node"])
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6)], ["id_a", "id_b"])
    ckdir = str(tmp_path / "ck")
    got = {r["node"]: r["component_id"]
           for r in connected_components(
               nodes, pairs, checkpoint_dir=ckdir).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5, 7: 7}
    assert any(files for _, _, files in os.walk(ckdir))


def test_ann_multiprobe_recall_beats_single_probe(spark, sf_dir):
    """Hamming-1 multi-probe must dominate single-probe recall@10
    against the exact cosine baseline (VERDICT r1 item 6).  Measured
    on the synthetic embeddings: ~0.56 avg vs ~0.14 single-probe."""
    from etl_dados_ibge_sp_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    singles, multis = [], []
    for qid in range(5):
        query = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("query_vec"))
        others = emb.filter(F.col("vec_id") != qid).select(
            "vec_id", "embedding")
        exact = {r.vec_id
                 for r in S.cosine_topk(others, query, k=10).collect()}
        sp = {r.vec_id
              for r in S.ann_bucketed_topk(others, query, k=10).collect()}
        mp = {r.vec_id
              for r in S.ann_multiprobe_topk(others, query, k=10).collect()}
        singles.append(len(sp & exact) / 10)
        multis.append(len(mp & exact) / 10)
        assert multis[-1] >= singles[-1]  # probing a superset of cells
    assert sum(multis) / len(multis) >= 0.4
    assert sum(multis) > sum(singles)


def test_connected_components_string_ids(spark):
    """Non-numeric node ids take the join-based convergence fallback
    (sum-of-labels only works for numeric); result must be identical
    min-label semantics."""
    from etl_dados_ibge_sp_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], ["node"])
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["id_a", "id_b"])
    got = {r["node"]: r["component_id"]
           for r in connected_components(nodes, pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_approx_percentiles_match_exact_within_rank_error(spark, sf_dir):
    """The sketch path must agree with exact percentiles to within the
    sketch's rank-error bound, and its plan must partial-aggregate
    (map-side combinable) rather than shuffle raw values."""
    from etl_dados_ibge_sp_spark.operators.aggregate import (
        approx_percentiles,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = approx_percentiles(
        e, ["event_type"], "value", [0.5, 0.9, 0.99], accuracy=10_000)
    # The sketch guarantee is on RANK, not value (and exact
    # `percentile` interpolates while the sketch returns a data value,
    # so value-comparison breaks on heavy tails): check the empirical
    # rank of each sketched percentile.
    vals = {}
    for r in e.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for v in vals.values():
        v.sort()
    for r in approx.collect():
        v = vals[r["event_type"]]
        n = len(v)
        for c, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            import bisect
            lo = bisect.bisect_left(v, r[c]) / n
            hi = bisect.bisect_right(v, r[c]) / n
            slack = 1 / 10_000 + 1 / n
            assert lo - slack <= p <= hi + slack, (c, p, lo, hi)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "partial_percentile_approx" in plan.lower() \
        or "objhashaggregate" in plan.lower()


def test_pagerank_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir puts the reused transition matrix on a reliable
    checkpoint (cluster-safe) with a bit-identical rank vector."""
    import os

    from etl_dados_ibge_sp_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(6)], ["node"])
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 1.0), (2, 3, 1.0),
         (3, 4, 0.5), (4, 5, 1.5), (5, 3, 1.0)], ["u", "v", "w"])
    base = {(r["node"], r["pagerank"])
            for r in pagerank(nodes, edges).collect()}
    ckdir = str(tmp_path / "ck_pr")
    ck = {(r["node"], r["pagerank"])
          for r in pagerank(nodes, edges,
                            checkpoint_dir=ckdir).collect()}
    assert ck == base
    assert any(files for _, _, files in os.walk(ckdir))



def test_embed_neardup_auto_bits_default_and_result_identical(spark):
    """The scale-safe sign-grid sizing is the SIGNATURE DEFAULT (the
    round-8 verdict's ask — the fixed n_bits=4 grid was the sf1.0
    sweep's worst quadratic, 24.5x wall at a 10x data step, while
    n_bits=7 ran result-identical): auto_sign_bits derives the grid
    from one corpus aggregate, and on the registered query's own
    planted fixture the pair set at n_bits="auto" equals the
    oracle-pinned n_bits=4 set — a scaled copy has the identical
    direction as its original, so they share a sign bucket under ANY
    grid, and the background max cosine (~0.55) is far below the 0.9
    threshold under which grid choice could change recall."""
    import inspect

    from etl_dados_ibge_sp_spark.operators.similarity import (
        auto_sign_bits, embed_near_dup_pairs)
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    sig = inspect.signature(embed_near_dup_pairs)
    assert sig.parameters["n_bits"].default == "auto"

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("embedding"))
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x * 1.1).alias("embedding"))
    corpus = base.unionByName(planted)
    n, d = corpus.count(), 16
    bits = auto_sign_bits(corpus)
    assert bits == max(1, min(16, d, round(math.log2(n / 128))))
    pairs_auto = sorted(
        (r.id_a, r.id_b) for r in
        embed_near_dup_pairs(corpus, threshold=0.9).collect())
    pairs_fixed = sorted(
        (r.id_a, r.id_b) for r in
        embed_near_dup_pairs(corpus, threshold=0.9, n_bits=4).collect())
    assert pairs_auto == pairs_fixed
    # Exactly the planted copies pair with their originals.
    assert pairs_auto == sorted(
        (r.vec_id, r.vec_id + 1000000) for r in planted.select(
            (F.col("vec_id") - 1000000).alias("vec_id")).collect())


def test_auto_sign_bits_grows_with_corpus(spark):
    """The sizing rule's scale property, directly: 10x the corpus
    adds ~log2(10) ~ 3 bits, holding per-cell population ~constant —
    the invariant that keeps the per-cell quadratic term flat per
    unit of data (a fixed grid's per-cell pairs grow with the SQUARE
    of growth)."""
    from etl_dados_ibge_sp_spark.operators.similarity import auto_sign_bits

    def fake(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(1.0)] * 16).alias("embedding"))

    b1k, b10k = auto_sign_bits(fake(1000)), auto_sign_bits(fake(10000))
    assert b10k - b1k in (3, 4)          # ~log2(10)
    assert auto_sign_bits(fake(50)) == 1     # tiny corpus: floor
    # Never more bits than vector dims (sign bits read leading dims).
    narrow = spark.range(100000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(-1.0)).alias("embedding"))
    assert auto_sign_bits(narrow) == 2
