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


def _build_interleaved_avi(doc_id: int, n_frames: int) -> bytes:
    """Hand-built spec shape the encoder doesn't emit: an audio strl
    AFTER the video strl (its WAVEFORMATEX must not clobber the video
    strf), movi frames wrapped in a ``LIST 'rec '`` interleave group,
    and the audio stream's ``01wb`` chunks mixed in (must be ignored).
    Pixel content follows the encoder's formula so `_frame_sums`
    oracles it."""
    w, h = AVI_W, AVI_H
    stride = (w * 3 + 3) // 4 * 4
    frame_size = stride * h

    def frame_bytes(f: int) -> bytes:
        out = bytearray(frame_size)
        for file_row in range(h):
            r = h - 1 - file_row  # bottom-up
            for c in range(w):
                for pos, k in enumerate((2, 1, 0)):  # BGR file order
                    out[file_row * stride + c * 3 + pos] = (
                        doc_id * 31 + f * 17 + r * 7 + c * 3
                        + k * 11) % 256
        return bytes(out)

    avih = (b"avih" + struct.pack("<I", 56)
            + struct.pack("<14I", 100000, 0, 0, 0, n_frames, 0, 2,
                          frame_size, w, h, 0, 0, 0, 0))
    strh_v = (b"strh" + struct.pack("<I", 56) + b"vids" + b"DIB "
              + struct.pack("<IHHIIIIIIIIHHHH", 0, 0, 0, 0, 1, 10,
                            0, n_frames, frame_size, 0, 0, 0, 0, w, h))
    strf_v = (b"strf" + struct.pack("<I", 40)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            frame_size, 0, 0, 0, 0))
    strl_v = (b"LIST" + struct.pack("<I", 4 + len(strh_v) + len(strf_v))
              + b"strl" + strh_v + strf_v)
    strh_a = (b"strh" + struct.pack("<I", 56) + b"auds" + b"\x00" * 4
              + struct.pack("<IHHIIIIIIIIHHHH", 0, 0, 0, 0, 1, 8000,
                            0, 8000, 16000, 0, 2, 0, 0, 0, 0))
    # WAVEFORMATEX: PCM, mono, 8 kHz, 16-bit — offsets 14:16/16:20
    # hold wBitsPerSample/cbSize+junk, the values that would misread
    # as bit depth/compression if strf selection were last-wins.
    strf_a = (b"strf" + struct.pack("<I", 16)
              + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
    strl_a = (b"LIST" + struct.pack("<I", 4 + len(strh_a) + len(strf_a))
              + b"strl" + strh_a + strf_a)
    hdrl = (b"LIST"
            + struct.pack("<I", 4 + len(avih) + len(strl_v) + len(strl_a))
            + b"hdrl" + avih + strl_v + strl_a)
    recs = b""
    for f in range(n_frames):
        audio = b"01wb" + struct.pack("<I", 4) + b"\xff\x7f\x00\x80"
        video = (b"00db" + struct.pack("<I", frame_size)
                 + frame_bytes(f))
        rec = video + audio
        recs += b"LIST" + struct.pack("<I", 4 + len(rec)) + b"rec " + rec
    movi = b"LIST" + struct.pack("<I", 4 + len(recs)) + b"movi" + recs
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_audio_stream_and_rec_interleave(spark):
    """The audio strl's WAVEFORMATEX must not clobber the video strf,
    '01wb' audio chunks must not count as frames, and frames inside
    LIST 'rec ' groups must all be found."""
    from etl_dados_ibge_sp_spark.operators.multimodal import decode_avi

    rows = [(i, _build_interleaved_avi(i, 3)) for i in (7, 12)]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in decode_avi(df).collect()}
    for i, _ in rows:
        exp = [0, 0, 0]
        for f in range(3):
            s = _frame_sums(i, f)
            for k in range(3):
                exp[k] += s[k]
        g = got[i]
        assert (g.n_frames, g.width, g.height) == (3, AVI_W, AVI_H)
        assert (g.sum_r, g.sum_g, g.sum_b) == tuple(exp)


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
