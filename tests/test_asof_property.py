"""Property test: the one-shuffle union+window as-of join equals the
brute-force per-row definition on arbitrary inputs — keys shared or
disjoint, timestamp ties between and within sides, strict and
non-strict modes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_dados_ibge_sp_spark.operators.joins import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=9)

LEFT = st.lists(st.tuples(KEYS, TS), min_size=1, max_size=12)
# Right rows must be unique per (key, ts) — the operator's documented
# contract (pre-aggregate otherwise).
RIGHT = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=12,
                 unique=True)


def brute_force(left, right, strict):
    out = []
    for i, (k, t) in enumerate(left):
        cands = [(rt, rv) for (rk, rt), rv in right.items()
                 if rk == k and (rt < t if strict else rt <= t)]
        if cands:
            mt, mv = max(cands)
            out.append((k, t, i, mt, mv))
        else:
            out.append((k, t, i, None, None))
    return sorted(out)


@given(LEFT, RIGHT, st.booleans())
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_matches_brute_force(spark, left, right, strict):
    rv = {(k, t): float(k * 100 + t) for (k, t) in right}
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k bigint, ts bigint, row_id bigint")
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rv.items()] or [(99, 99, 0.0)],
        "k bigint, ts bigint, value double")
    if not rv:
        rdf = rdf.filter("k < 0")  # genuinely empty right side
    got = asof_join(ldf, rdf, ["k"], left_ts="ts", right_ts="ts",
                    right_vals=["value"], strict=strict)
    got_rows = sorted(
        (r.k, r.ts, r.row_id, r.matched_ts, r.value)
        for r in got.collect())
    want = [(k, t, i, mt, (rv[(k, mt)] if mt is not None else None))
            for (k, t, i, mt, _v) in brute_force(left, rv, strict)]
    assert got_rows == sorted(want)
