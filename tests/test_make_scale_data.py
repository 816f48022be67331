"""Laws for tools/make_scale_data.py — the sf-scale generator behind
BENCH_sf1.json.  The scale-curve exponents are only meaningful if the
generated data preserves workload shape, so that is what gets pinned:
referential integrity under key offsets, per-copy isomorphism /
cross-copy disjointness for documents, and exact geometry
preservation for embeddings."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "tools"))
from make_scale_data import scale_dir  # noqa: E402

SRC = "/root/testdata/sf0.001"
FACTOR = 3


def _gen(tmp_path):
    dst = str(tmp_path / "scaled")
    scale_dir(SRC, dst, FACTOR)
    return dst


def test_row_counts_and_referential_integrity(tmp_path):
    dst = _gen(tmp_path)
    for t in ("customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"):
        n0 = pq.read_table(os.path.join(SRC, f"{t}.parquet")).num_rows
        n1 = pq.read_table(os.path.join(dst, f"{t}.parquet")).num_rows
        assert n1 == FACTOR * n0, t
    for t in ("region", "nation"):  # fixed dims
        assert pq.read_table(os.path.join(dst, f"{t}.parquet")).num_rows \
            == pq.read_table(os.path.join(SRC, f"{t}.parquet")).num_rows
    cust = set(pq.read_table(os.path.join(dst, "customer.parquet"))
               .column("c_custkey").to_pylist())
    orders = pq.read_table(os.path.join(dst, "orders.parquet"))
    assert set(orders.column("o_custkey").to_pylist()) <= cust
    li = pq.read_table(os.path.join(dst, "lineitem.parquet"))
    okeys = set(orders.column("o_orderkey").to_pylist())
    assert set(li.column("l_orderkey").to_pylist()) <= okeys
    ev = pq.read_table(os.path.join(dst, "events.parquet"))
    assert set(ev.column("user_id").to_pylist()) <= cust
    # Supplier names must be UNIQUE across copies: byte-identical
    # names would plant factor-way distance-0 groups and inflate the
    # edit-distance joins with the square of the factor (the sf1.0
    # full-scan artifact this law pins the fix for).
    sup = pq.read_table(os.path.join(dst, "supplier.parquet"))
    names = sup.column("s_name").to_pylist()
    assert len(set(names)) == len(names)
    # keys stay unique (offsets never collide)
    ck = orders.column("o_orderkey")
    assert len(okeys) == orders.num_rows
    assert pc.count_distinct(ck).as_py() == orders.num_rows


def test_documents_isomorphic_within_disjoint_across(tmp_path):
    dst = _gen(tmp_path)
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    out = pq.read_table(os.path.join(dst, "documents.parquet"))
    n = src.num_rows
    texts = out.column("text").to_pylist()
    base, copy1 = texts[:n], texts[n:2 * n]

    def toks(t):
        return t.split() if t else []

    # Isomorphism: token COUNT sequences identical per doc (the
    # bijection changes spellings, never structure).
    assert [len(toks(a)) for a in base] == [len(toks(b))
                                            for b in copy1]
    # Exact-duplicate structure preserved: same-text pairs in the
    # base are same-text pairs in the copy, and vice versa.
    import collections
    g0 = collections.Counter(base)
    g1 = collections.Counter(copy1)
    assert sorted(g0.values()) == sorted(g1.values())
    # Cross-copy disjointness AT THE SHINGLE LEVEL — the structure
    # MinHash/LSH/containment actually key on.  (Token-level overlap
    # is unavoidable: the corpus vocabulary is tiny, so any bijection
    # leaves the token SETS overlapping by pigeonhole; 3-gram
    # shingles live in vocab³ and decorrelate.)  Measured: ~0.001.
    def sh(t, k=3):
        w = toks(t)
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}

    shared = 0
    total = 0
    for a, b in list(zip(base, copy1))[:200]:
        sa, sb = sh(a), sh(b)
        if not sa or not sb:
            continue
        shared += len(sa & sb)
        total += len(sa | sb)
    assert total > 0 and shared / total < 0.05
    # n_chars recomputed to match the remapped text
    for t, nc in list(zip(texts, out.column("n_chars").to_pylist()))[:500]:
        assert nc == (len(t) if t is not None else None)


def test_embeddings_geometry_preserved_exactly(tmp_path):
    dst = _gen(tmp_path)
    src = np.array(pq.read_table(os.path.join(SRC, "embeddings.parquet"))
                   .column("embedding").to_pylist(), dtype=np.float32)
    out = np.array(pq.read_table(os.path.join(dst, "embeddings.parquet"))
                   .column("embedding").to_pylist(), dtype=np.float32)
    n = src.shape[0]
    copy1 = out[n:2 * n]
    # A signed permutation is orthogonal: norms and all pairwise dots
    # are preserved EXACTLY (same float32 values, reordered/negated).
    assert np.array_equal(np.sort(np.abs(src), axis=1),
                          np.sort(np.abs(copy1), axis=1))
    k = min(50, n)
    g_src = src[:k] @ src[:k].T
    g_cp = copy1[:k] @ copy1[:k].T
    assert np.allclose(g_src, g_cp, rtol=0, atol=1e-4)
    # Across copies the vectors decorrelate (mean |cos| small).
    nrm = np.linalg.norm
    cos = [float(src[i] @ copy1[i] / (nrm(src[i]) * nrm(copy1[i])))
           for i in range(min(200, n))]
    assert np.mean(np.abs(cos)) < 0.2


def test_deterministic_rebuild(tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    scale_dir(SRC, a, 2)
    scale_dir(SRC, b, 2)
    for t in ("documents", "embeddings", "lineitem"):
        ta = pq.read_table(os.path.join(a, f"{t}.parquet"))
        tb = pq.read_table(os.path.join(b, f"{t}.parquet"))
        assert ta.equals(tb), t
