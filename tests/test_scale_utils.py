"""Scale utilities: salted-join equivalence on skewed keys, and
hypothesis property tests for the tolerant-repair semantics (the
SURVEY §5 dirty-input strategy, generalized from fixed fixtures to
generated inputs)."""

from __future__ import annotations

import math

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
    dirty tokens -> null; else parse as double, truncate toward zero;
    out-of-range/overflow -> null."""
    if s.strip() in ("INF", "-INF", "NaN", ""):
        return None
    try:
        d = float(s)
    except ValueError:
        return None
    if math.isnan(d) or math.isinf(d):
        return None
    t = math.trunc(d)
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
