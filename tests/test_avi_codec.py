"""Laws for the RIFF/AVI uncompressed-video codec
(operators/multimodal.encode_avi / decode_avi / frame_sample_avi):
closed-form pixel-sum oracles, sampled-frames stitching, parser
robustness (JUNK chunks, word alignment), and partitioning
invariance."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators.multimodal import (AVI_H, AVI_W,
                                                          avi_n_frames,
                                                          decode_avi,
                                                          encode_avi,
                                                          frame_sample_avi)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _frame_sums(doc_id: int, f: int) -> tuple[int, int, int]:
    """Pure-Python brute force of one frame's per-channel pixel sums —
    independent of the numpy encode path."""
    sums = [0, 0, 0]
    for r in range(AVI_H):
        for c in range(AVI_W):
            for k in range(3):
                sums[k] += (doc_id * 31 + f * 17 + r * 7 + c * 3
                            + k * 11) % 256
    return tuple(sums)


def _docs(spark, sf_dir, n=40):
    return (load_table(spark, sf_dir, "documents", fan_out=False)
            .select("doc_id").orderBy("doc_id").limit(n))


def test_decode_matches_brute_force(spark, sf_dir):
    ids = _docs(spark, sf_dir)
    got = {r.doc_id: r for r in decode_avi(encode_avi(ids)).collect()}
    for r in ids.collect():
        i = r.doc_id
        nf = avi_n_frames(i)
        exp = [0, 0, 0]
        for f in range(nf):
            s = _frame_sums(i, f)
            for k in range(3):
                exp[k] += s[k]
        g = got[i]
        assert (g.n_frames, g.width, g.height) == (nf, AVI_W, AVI_H)
        assert (g.sum_r, g.sum_g, g.sum_b) == tuple(exp)


def test_frame_sample_indices_and_sums(spark, sf_dir):
    ids = _docs(spark, sf_dir)
    every = 2
    rows = frame_sample_avi(encode_avi(ids), every=every).collect()
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.frame_idx] = (
            r.sum_r, r.sum_g, r.sum_b)
    for r in ids.collect():
        i = r.doc_id
        want = list(range(0, avi_n_frames(i), every))
        assert sorted(by_doc[i]) == want
        for f in want:
            assert by_doc[i][f] == _frame_sums(i, f)


def test_every_1_sampling_stitches_to_decode_totals(spark, sf_dir):
    ids = _docs(spark, sf_dir, n=20)
    enc = encode_avi(ids)
    stitched = (frame_sample_avi(enc, every=1)
                .groupBy("doc_id")
                .agg(F.count("*").alias("n_frames"),
                     F.sum("sum_r").alias("sum_r"),
                     F.sum("sum_g").alias("sum_g"),
                     F.sum("sum_b").alias("sum_b")))
    total = decode_avi(enc).drop("width", "height")
    a = sorted(tuple(r) for r in stitched.collect())
    b = sorted(tuple(r) for r in total.collect())
    assert a == b


def test_parser_skips_junk_and_handles_odd_alignment(spark, sf_dir):
    """A JUNK chunk with an ODD byte length inserted between hdrl and
    movi must not change the decode — real AVIs carry such padding,
    and the walk must apply word alignment to traverse past it."""
    ids = _docs(spark, sf_dir, n=5)
    payloads = {r.doc_id: bytes(r.payload)
                for r in encode_avi(ids).collect()}

    def inject_junk(b: bytes) -> bytes:
        movi_at = b.index(b"LIST", 12, None)
        # first LIST is hdrl; find the movi LIST
        while b[movi_at + 8:movi_at + 12] != b"movi":
            movi_at = b.index(b"LIST", movi_at + 4)
        junk = b"JUNK" + struct.pack("<I", 7) + b"\x00" * 7 + b"\x00"
        out = b[:movi_at] + junk + b[movi_at:]
        return (out[:4] + struct.pack("<I", len(out) - 8) + out[8:])

    mangled = [(i, inject_junk(p)) for i, p in payloads.items()]
    df = spark.createDataFrame(mangled, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in decode_avi(df).collect()}
    clean = {r.doc_id: r for r in decode_avi(
        encode_avi(ids)).collect()}
    for i in payloads:
        assert tuple(got[i]) == tuple(clean[i])


def test_parser_rejects_non_avi_and_compressed(spark):
    df = spark.createDataFrame(
        [(1, b"RIFF\x04\x00\x00\x00WAVE")],
        "doc_id bigint, payload binary")
    with pytest.raises(Exception, match="not a RIFF/AVI"):
        decode_avi(df).collect()


def test_partitioning_invariance(spark, sf_dir):
    ids = _docs(spark, sf_dir, n=30)
    a = sorted(tuple(r) for r in
               decode_avi(encode_avi(ids)).collect())
    b = sorted(tuple(r) for r in
               decode_avi(encode_avi(ids.repartition(7))).collect())
    assert a == b
