#!/usr/bin/env python
"""Deterministic scale-up of the driver testdata for scale-curve runs.

Produces an sfN directory (default 10x sf0.1 == sf1.0) whose tables
keep the WORKLOAD SHAPE of the originals, so wall-time vs sf is a
meaningful exponent and not an artifact of degenerate duplication:

- TPC-H tables replicate with KEY OFFSETS (copy i shifts every key by
  i * (max_key + 1)), so referential joins stay valid, per-key fanout
  stays constant, and key cardinality scales with the data — exactly
  how TPC-H itself scales.  region/nation stay fixed (dims).
- ``documents`` copies apply a PER-COPY TOKEN BIJECTION (a seeded
  permutation of the corpus vocabulary, whitespace preserved): within
  a copy, every dedup-relevant structure (exact dups, shingle sets,
  line census) is isomorphic to the original; across copies the texts
  share (almost) no SHINGLES (measured 3-gram Jaccard ~0.001 — token
  sets necessarily overlap on a small vocabulary, but the n-gram
  structures MinHash/LSH/containment key on decorrelate) — so dedup
  workloads scale linearly in
  corpus size instead of exploding quadratically inside planted
  10-way duplicate groups, which naive text replication would cause.
- ``embeddings`` copies apply a per-copy SIGNED COORDINATE
  PERMUTATION (an orthogonal transform): norms and all within-copy
  pairwise cosines are preserved exactly, so cluster geometry / cell
  occupancy scale by replication; across copies vectors decorrelate.
- ``events`` offsets user_id by the CUSTOMER offset (events join
  customer on user_id) — 10x users at constant per-user event count,
  the realistic growth direction for sessionization state.

Output is NOT driver testdata (never written under /root/testdata);
it lives under the uid-scoped work root by default.  Timing-only: the
oracle compare is not expected to hold at generated scales.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TPCH_OFFSETS = {
    # table -> [(column, key-space owner table, key column)]
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [("o_orderkey", "orders", "o_orderkey"),
               ("o_custkey", "customer", "c_custkey")],
    "lineitem": [("l_orderkey", "orders", "o_orderkey"),
                 ("l_partkey", "part", "p_partkey"),
                 ("l_suppkey", "supplier", "s_suppkey")],
    "events": [("event_id", "events", "event_id"),
               ("user_id", "customer", "c_custkey")],
}


def _offset(tbl: pa.Table, col: str, off: int) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    t = tbl.schema.field(col).type
    return tbl.set_column(
        i, col, pc.cast(pc.add(tbl.column(col), off), t))


def _doc_copy(tbl: pa.Table, copy: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    vocab = sorted({t for x in texts if x for t in x.split()})
    idx = {t: j for j, t in enumerate(vocab)}
    perm = np.random.default_rng(42 + copy).permutation(len(vocab))

    def remap(text):
        if text is None:
            return None
        return "".join(
            p if (not p or p.isspace()) else vocab[perm[idx[p]]]
            for p in re.split(r"(\s+)", text))

    new = [remap(x) for x in texts]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text",
        pa.array(new, type=pa.string()))
    nc = pa.array([len(x) if x is not None else None for x in new],
                  type=tbl.schema.field("n_chars").type)
    return tbl.set_column(
        tbl.schema.get_field_index("n_chars"), "n_chars", nc)


def _emb_copy(tbl: pa.Table, copy: int) -> pa.Table:
    vecs = np.array(tbl.column("embedding").to_pylist(),
                    dtype=np.float32)
    rng = np.random.default_rng(1000 + copy)
    d = vecs.shape[1]
    out = vecs[:, rng.permutation(d)] * \
        rng.choice(np.array([-1.0, 1.0], dtype=np.float32), d)
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"), "embedding",
        pa.array(out.tolist(),
                 type=tbl.schema.field("embedding").type))


def scale_dir(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet"))
              for t in ("region", "nation", "customer", "supplier",
                        "part", "orders", "lineitem", "events",
                        "documents", "embeddings")}
    # key-space span per OWNER table (max key + 1)
    spans = {
        "customer": int(pc.max(tables["customer"]
                               .column("c_custkey")).as_py()) + 1,
        "supplier": int(pc.max(tables["supplier"]
                               .column("s_suppkey")).as_py()) + 1,
        "part": int(pc.max(tables["part"].column("p_partkey"))
                    .as_py()) + 1,
        "orders": int(pc.max(tables["orders"].column("o_orderkey"))
                      .as_py()) + 1,
        "events": int(pc.max(tables["events"].column("event_id"))
                      .as_py()) + 1,
        "documents": int(pc.max(tables["documents"].column("doc_id"))
                         .as_py()) + 1,
        "embeddings": int(pc.max(tables["embeddings"]
                                 .column("vec_id")).as_py()) + 1,
    }
    for name, tbl in tables.items():
        if name in ("region", "nation"):
            copies = [tbl]  # fixed dims
        elif name in TPCH_OFFSETS:
            copies = [tbl]
            for i in range(1, factor):
                c = tbl
                for col, owner, _k in TPCH_OFFSETS[name]:
                    c = _offset(c, col, i * spans[owner])
                if name == "supplier":
                    # s_name feeds the edit-distance fuzzy joins:
                    # byte-identical names across copies would plant
                    # factor-way distance-0 groups and blow the
                    # (per-name-group quadratic) pair count up with
                    # the SQUARE of the factor — a generator artifact,
                    # not a workload property.  A per-copy suffix
                    # keeps copies > max_dist apart while scaling
                    # name cardinality with the data like every key.
                    ni = c.schema.get_field_index("s_name")
                    c = c.set_column(
                        ni, "s_name",
                        pc.binary_join_element_wise(
                            c.column("s_name").cast(pa.string()),
                            f"q{i}x", "-"))
                copies.append(c)
        elif name == "documents":
            copies = [tbl]
            for i in range(1, factor):
                copies.append(_offset(_doc_copy(tbl, i), "doc_id",
                                      i * spans["documents"]))
        else:  # embeddings
            copies = [tbl]
            for i in range(1, factor):
                copies.append(_offset(_emb_copy(tbl, i), "vec_id",
                                      i * spans["embeddings"]))
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if len(sys.argv) > 2:
        dst = sys.argv[2]
    else:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), ".."))
        from etl_dados_ibge_sp_spark.workdirs import work_root
        dst = os.path.join(work_root(), "sf1.0")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_dir(src, dst, factor)
    print(dst)
