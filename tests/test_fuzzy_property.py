"""Property tests: both edit-distance blocking strategies (q-gram
prefix and <=k-deletion neighborhood) find EXACTLY the naive
cross-join's pairs — zero false negatives from the count filter,
prefix selection, the short-string fallback (strings straddle the
q*(k+1) boundary on both sides), or the neighborhood expansion."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_dados_ibge_sp_spark.operators.joins import (fuzzy_join_deletes,
                                                     fuzzy_join_qgrams)

WORD = st.text(alphabet="abc", min_size=0, max_size=12)
SIDE = st.lists(WORD, min_size=1, max_size=10, unique=True)


def lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(SIDE, SIDE, st.integers(min_value=1, max_value=2))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_qgram_join_matches_naive(spark, lefts, rights, k):
    ldf = spark.createDataFrame([(s,) for s in lefts], "a string")
    rdf = spark.createDataFrame([(s,) for s in rights], "b string")
    got = sorted(
        (r.a, r.b, r.distance)
        for r in fuzzy_join_qgrams(ldf, rdf, "a", "b",
                                   max_dist=k, q=3).collect())
    want = sorted(
        (a, b, lev(a, b))
        for a in lefts for b in rights if lev(a, b) <= k)
    assert got == want


@given(SIDE, SIDE, st.integers(min_value=1, max_value=2))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_deletes_join_matches_naive(spark, lefts, rights, k):
    ldf = spark.createDataFrame([(s,) for s in lefts], "a string")
    rdf = spark.createDataFrame([(s,) for s in rights], "b string")
    got = sorted(
        (r.a, r.b, r.distance)
        for r in fuzzy_join_deletes(ldf, rdf, "a", "b",
                                    max_dist=k).collect())
    want = sorted(
        (a, b, lev(a, b))
        for a in lefts for b in rights if lev(a, b) <= k)
    assert got == want
