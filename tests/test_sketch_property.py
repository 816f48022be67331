"""Property tests: the distributed sketches against exact driver-side
reimplementations on arbitrary inputs — duplicates, skew, tiny and
empty-ish groups.  The md5-prefix hash is recomputed in pure Python
(same construction), so KMV contents and count-min counters are
checked value-for-value, not just against error bounds."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators import sketches as SK

KEYS = st.lists(st.integers(min_value=0, max_value=30),
                min_size=1, max_size=60)


def _h60(key: str, salt: str) -> int:
    digest = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()
    return int(digest[:15], 16)


@given(KEYS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmv_sketch_matches_python_reference(spark, keys):
    k = 8
    df = spark.createDataFrame([("g", str(x)) for x in keys],
                               "g string, key string")
    got = SK.kmv_sketch(df, "g", "key", k=k).collect()[0]["kmv"]
    want = sorted({_h60(str(x), "kmv") for x in keys})[:k]
    assert got == want


@given(KEYS, KEYS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kmv_merge_is_union_sketch(spark, xs, ys):
    k = 8
    a = spark.createDataFrame([("g", str(x)) for x in xs],
                              "g string, key string")
    b = spark.createDataFrame([("g", str(y)) for y in ys],
                              "g string, key string")
    ska = SK.kmv_sketch(a, "g", "key", k=k).withColumnRenamed("kmv", "ka")
    skb = SK.kmv_sketch(b, "g", "key", k=k).withColumnRenamed("kmv", "kb")
    merged = (ska.join(skb, "g")
              .select(SK.kmv_merge(F.col("ka"), F.col("kb"), k)
                      .alias("kmv")).collect()[0]["kmv"])
    want = sorted({_h60(str(v), "kmv") for v in xs + ys})[:k]
    assert merged == want


@given(KEYS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_countmin_counters_match_python_reference(spark, keys):
    d, w = 3, 16
    df = spark.createDataFrame([(str(x),) for x in keys], "key string")
    got = {(r["r"], r["pos"]): r["cnt"]
           for r in SK.countmin_counters(df, "key", depth=d,
                                         width=w).collect()}
    want: dict = {}
    for x in keys:
        for r in range(d):
            cell = (r, _h60(str(x), f"cm{r}") % w)
            want[cell] = want.get(cell, 0) + 1
    assert got == want
    # And the point estimate never undercounts any key.
    probe = spark.createDataFrame([(str(x),) for x in set(keys)],
                                  "key string")
    est = {r["key"]: r["cm_est"]
           for r in SK.countmin_lookup(
               SK.countmin_counters(df, "key", depth=d, width=w),
               probe, "key", depth=d, width=w).collect()}
    for x in set(keys):
        assert est[str(x)] >= keys.count(x)


@given(KEYS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bloom_has_no_false_negatives(spark, keys):
    m = 1 << 16
    build = spark.createDataFrame([(str(x),) for x in keys],
                                  "key string")
    nib = SK.bloom_build(build, "key", m_bits=m)
    kept = SK.bloom_prune(build.distinct(), "key", nib, m_bits=m).count()
    assert kept == len({str(x) for x in keys})
