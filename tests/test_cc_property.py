"""Property test: distributed min-label connected components equals a
driver-side union-find on arbitrary graphs — cliques, paths, isolated
nodes, self-loops, duplicate edges."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_dados_ibge_sp_spark.operators.dedup import connected_components

NODE = st.integers(min_value=0, max_value=14)
EDGES = st.lists(st.tuples(NODE, NODE), min_size=0, max_size=20)


def union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # Component id = minimum member id.
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items()
            for n in members}


@given(EDGES)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_matches_union_find(spark, edges):
    nodes = sorted(set(range(8)) | {x for e in edges for x in e})
    ndf = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    edf = spark.createDataFrame(edges or [(0, 0)],
                                "id_a bigint, id_b bigint")
    if not edges:
        edf = edf.filter("id_a < 0")
    got = {r.node: r.component_id
           for r in connected_components(ndf, edf).collect()}
    assert got == union_find(nodes, edges)
