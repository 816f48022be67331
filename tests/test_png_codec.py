"""Laws for the baseline-PNG codec and the mixed-format dispatcher
(operators/multimodal.encode_png / decode_png / decode_real): the
payload is spec-conforming PNG (signature, IHDR, deflated IDAT,
CRC32 per chunk), one image exercises ALL FIVE scanline filters, the
decode matches a pure-Python brute force, corruption is caught by
CRC, and decode_real's per-row magic dispatch agrees with every
per-format decoder over a genuinely mixed corpus."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators.multimodal import (
    _PNG_SIG, PNG_SIDE, avi_n_frames, decode_avi, decode_png, decode_ppm,
    decode_real, decode_wav, encode_avi, encode_png, encode_ppm,
    encode_wav)
from etl_dados_ibge_sp_spark.sources.parquet_source import load_table


def _pixel(doc_id: int, r: int, c: int, k: int) -> int:
    return (doc_id * 31 + r * 7 + c * 3 + k * 11) % 256


def _channel_sums(doc_id: int) -> tuple[int, int, int]:
    return tuple(
        sum(_pixel(doc_id, r, c, k)
            for r in range(PNG_SIDE) for c in range(PNG_SIDE))
        for k in range(3))


def _docs(spark, sf_dir, n=40):
    return (load_table(spark, sf_dir, "documents", fan_out=False)
            .select("doc_id").orderBy("doc_id").limit(n))


def test_decode_matches_brute_force(spark, sf_dir):
    ids = _docs(spark, sf_dir)
    got = {r.doc_id: r for r in decode_png(encode_png(ids)).collect()}
    for r in ids.collect():
        i = r.doc_id
        g = got[i]
        assert (g.width, g.height) == (PNG_SIDE, PNG_SIDE)
        assert (g.sum_r, g.sum_g, g.sum_b) == _channel_sums(i)


def test_payload_is_spec_conforming_and_uses_all_five_filters(
        spark, sf_dir):
    """Walk the raw bytes of one encoded payload: PNG signature,
    ordered IHDR→IDAT→IEND chunks each with a valid CRC32, IHDR
    declaring 8-bit truecolor non-interlaced, and — after a real
    zlib inflate — scanline filter bytes covering ALL FIVE types, so
    a decoder lacking any reconstruction function cannot pass."""
    payload = bytes(encode_png(_docs(spark, sf_dir, n=1))
                    .collect()[0].payload)
    assert payload[:8] == _PNG_SIG
    pos, tags, idat = 8, [], b""
    while pos < len(payload):
        (clen,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + clen]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + clen:pos + 12 + clen])
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc
        tags.append(tag)
        if tag == b"IHDR":
            assert struct.unpack(">IIBBBBB", body) == (
                PNG_SIDE, PNG_SIDE, 8, 2, 0, 0, 0)
        if tag == b"IDAT":
            idat += body
        pos += 12 + clen
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    raw = zlib.decompress(idat)
    stride = PNG_SIDE * 3
    assert len(raw) == PNG_SIDE * (stride + 1)
    filters = {raw[r * (stride + 1)] for r in range(PNG_SIDE)}
    assert filters == {0, 1, 2, 3, 4}


def test_crc_corruption_is_detected(spark, sf_dir):
    from etl_dados_ibge_sp_spark.operators.multimodal import _png_rgb8

    payload = bytearray(bytes(encode_png(_docs(spark, sf_dir, n=1))
                              .collect()[0].payload))
    # Flip one bit inside the IDAT *body* (past sig+IHDR chunk+len+tag)
    payload[8 + 25 + 8 + 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        _png_rgb8(bytes(payload))


def test_decode_real_dispatch_matches_per_format(spark, sf_dir):
    """The mixed-corpus dispatcher must agree with every per-format
    decoder: doc_id % 4 selects the container, the four encoded
    frames are unioned, and each decode_real row is checked against
    the dedicated codec's output mapped into the unified schema."""
    ids = _docs(spark, sf_dir, n=48)
    m4 = F.col("doc_id") % 4
    mixed = (encode_png(ids.filter(m4 == 0))
             .unionByName(encode_ppm(ids.filter(m4 == 1)))
             .unionByName(encode_wav(ids.filter(m4 == 2)))
             .unionByName(encode_avi(ids.filter(m4 == 3))))
    got = {r.doc_id: r for r in decode_real(mixed).collect()}
    assert len(got) == ids.count()

    for r in decode_png(encode_png(ids.filter(m4 == 0))).collect():
        g = got[r.doc_id]
        assert (g.format, g.width, g.height, g.n_units) == \
            ("png", r.width, r.height, 1)
        assert (g.s0, g.s1, g.s2) == (r.sum_r, r.sum_g, r.sum_b)
    for r in decode_ppm(encode_ppm(ids.filter(m4 == 1))).collect():
        g = got[r.doc_id]
        assert (g.format, g.width, g.height, g.n_units) == \
            ("ppm", r.width, r.height, 1)
        assert (g.s0, g.s1, g.s2) == (r.sum_r, r.sum_g, r.sum_b)
    for r in decode_wav(encode_wav(ids.filter(m4 == 2))).collect():
        g = got[r.doc_id]
        assert (g.format, g.width, g.height, g.n_units) == \
            ("wav", r.sample_rate, r.n_channels, r.n_samples)
        assert (g.s0, g.s1, g.s2) == (r.sum_amp, r.sum_sq, r.peak)
    for r in decode_avi(encode_avi(ids.filter(m4 == 3))).collect():
        g = got[r.doc_id]
        assert (g.format, g.width, g.height) == ("avi", r.width,
                                                 r.height)
        assert g.n_units == r.n_frames == avi_n_frames(r.doc_id)
        assert (g.s0, g.s1, g.s2) == (r.sum_r, r.sum_g, r.sum_b)


def test_decode_real_unknown_magic_raises(spark, sf_dir):
    """Silent nulls would hide corpus corruption: an unrecognized
    magic must fail the job, not vanish."""
    bad = (_docs(spark, sf_dir, n=1)
           .select("doc_id",
                   F.encode(F.lit("GIF89a not supported"), "UTF-8")
                    .alias("payload")))
    with pytest.raises(Exception, match="unrecognized media magic"):
        decode_real(bad).collect()
