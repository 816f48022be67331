"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed in Arrow batches.

Wide-format codecs would call PIL / librosa / pyav — none of which
exist in this container — and :func:`decode_stub` keeps that
swap-in shape with a deterministic fake kernel.  Four REAL
stdlib+numpy codecs exercise the same plumbing end-to-end: baseline
PNG (:func:`decode_png` — zlib inflate, CRC-checked chunks, full
five-filter unfiltering: a genuinely *compressed* format), P6-PPM
images (:func:`decode_ppm`), RIFF/WAV 16-bit PCM audio
(:func:`decode_wav`), and RIFF/AVI uncompressed 24-bit video
(:func:`decode_avi`, with true sampled-frames-only decode in
:func:`frame_sample_avi`).  :func:`decode_real` dispatches on magic
bytes across all four — one Arrow-batched pass over a mixed-format
corpus.  Everything
Spark-side is real and tested: binary schema, Arrow batch transfer
(``mapInPandas``), batch-shaped UDF signature, partition-preserving
narrow execution.

At 100 TB: payloads stay in parquet binary columns (or pointers to an
object store); ``mapInPandas`` processes them per Arrow batch with no
shuffle, so decode throughput scales with executor count; metadata
extraction pushes down to a pure-JVM expression path
(:func:`binary_meta`) whenever the kernel can be expressed without
the codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("doc_id bigint, width bigint, height bigint, "
                 "n_frames bigint, checksum string")


def with_binary_payload(df: DataFrame, text_col: str = "text",
                        out_col: str = "payload") -> DataFrame:
    """Stand-in media payload: the UTF-8 bytes of a text column as a
    binary column (the driver tables carry no real media)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_meta(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata over a binary column: byte size, checksum, and
    the stub decoder's fake dimensions (md5-derived) — the expression
    path that needs no codec and stays in whole-stage codegen."""
    md5 = F.md5(F.col(payload_col))
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        md5.alias("checksum"),
        (F.conv(F.substring(md5, 1, 4), 16, 10).cast("bigint") % 1920 + 1
         ).alias("width"),
        (F.conv(F.substring(md5, 5, 4), 16, 10).cast("bigint") % 1080 + 1
         ).alias("height"),
        (F.conv(F.substring(md5, 9, 2), 16, 10).cast("bigint") % 30 + 1
         ).alias("n_frames"),
    )


def decode_stub(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Arrow-batched 'decode': mapInPandas over the binary column with
    a deterministic fake kernel (md5-derived dims).  Swap the digest
    arithmetic for a PIL/pyav call and the plumbing is
    production-shaped.

    The kernel is deliberately self-contained (imports inside, no
    module-level references) so cloudpickle ships it by value and the
    Python workers never need this package on their import path — the
    verification driver may run from an arbitrary cwd.
    """
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd
        for pdf in batches:
            digests = [_hl.md5(b).hexdigest() for b in pdf[payload_col]]
            yield _pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "width": [int(d[0:4], 16) % 1920 + 1 for d in digests],
                "height": [int(d[4:8], 16) % 1080 + 1 for d in digests],
                "n_frames": [int(d[8:10], 16) % 30 + 1 for d in digests],
                "checksum": digests,
            })

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = ("doc_id bigint, width bigint, height bigint, "
                 "out_width bigint, out_height bigint")


def resize_stub(df: DataFrame, max_side: int = 256,
                id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Arrow-batched resize plumbing: decode dims (stub kernel), then
    the aspect-preserving fit into a max_side box — the arithmetic a
    PIL ``thumbnail`` call would do, minus the pixels.  Swap the digest
    block for `Image.open(BytesIO(b))` and the operator is production
    shaped: same batch iterator, same output schema, no shuffle.
    """
    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                d = _hl.md5(b).hexdigest()
                w = int(d[0:4], 16) % 1920 + 1
                h = int(d[4:8], 16) % 1080 + 1
                scale = min(max_side / w, max_side / h, 1.0)
                rows.append((int(i), w, h,
                             max(int(w * scale), 1), max(int(h * scale), 1)))
            yield _pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "out_width", "out_height"])

    return df.select(id_col, payload_col).mapInPandas(
        resize_batches, schema=RESIZE_SCHEMA)


def frame_sample(df: DataFrame, every: int = 5,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Frame sampling as a JVM-side generator: one output row per
    sampled frame index (0, every, 2·every… < n_frames from the stub
    decoder's metadata).  The video-decode variant replaces the
    sequence with a pyav keyframe iterator inside mapInPandas; the
    row-explosion shape — and everything downstream — is identical.
    """
    md5 = F.md5(F.col(payload_col))
    n_frames = (F.conv(F.substring(md5, 9, 2), 16, 10).cast("bigint")
                % 30 + 1)
    frames = F.sequence(F.lit(0), n_frames - 1, F.lit(every))
    return (
        df.select(F.col(id_col), n_frames.alias("n_frames"),
                  F.explode(frames).alias("frame_idx"))
    )


FEATURE_DIM = 8
FEATURE_SCHEMA = "doc_id bigint, feature array<double>"


def feature_extract_stub(df: DataFrame, id_col: str = "doc_id",
                         payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction plumbing: payload -> fixed-dim
    double vector.  Stub kernel derives the vector from the md5 digest
    (dim i = bytes [4i,4i+4) as a fraction of 2^16, in [-1, 1)); the
    production swap-in is a vision/audio encoder forward pass over the
    same batch iterator.  Output feeds the similarity/ANN operators
    directly (same array<double> contract as the embeddings table).
    """
    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd
        for pdf in batches:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                d = _hl.md5(b).hexdigest()
                vec = [int(d[4 * j:4 * j + 4], 16) / 32768.0 - 1.0
                       for j in range(FEATURE_DIM)]
                out.append((int(i), vec))
            yield _pd.DataFrame(out, columns=["doc_id", "feature"])

    return df.select(id_col, payload_col).mapInPandas(
        feat_batches, schema=FEATURE_SCHEMA)


PPM_SIDE = 8
PPM_SCHEMA = ("doc_id bigint, width bigint, height bigint, "
              "sum_r bigint, sum_g bigint, sum_b bigint")


def encode_ppm(df: DataFrame, id_col: str = "doc_id",
               out_col: str = "payload") -> DataFrame:
    """Arrow-batched P6-PPM *encoder*: synthesize a deterministic
    8×8 RGB image per row — pixel (r, c) channel k has value
    ``(doc_id*31 + r*7 + c*3 + k*11) % 256`` — as real binary image
    bytes (header + raw RGB).  Stands in for the upstream system that
    produced the media; the pattern is arithmetic so the decoded
    content can be oracle-checked exactly."""
    side = PPM_SIDE

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd
        r = _np.arange(side).reshape(side, 1, 1)
        c = _np.arange(side).reshape(1, side, 1)
        k = _np.arange(3).reshape(1, 1, 3)
        header = f"P6\n{side} {side}\n255\n".encode()
        for pdf in batches:
            payloads = [
                header
                + ((int(i) * 31 + r * 7 + c * 3 + k * 11) % 256)
                .astype(_np.uint8).tobytes()
                for i in pdf[id_col]
            ]
            yield _pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                 out_col: payloads})

    return df.select(id_col).mapInPandas(
        enc, schema=f"{id_col} bigint, {out_col} binary")


def decode_ppm(df: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL image decode — no codec library needed: P6
    PPM is header + raw RGB, parsed with numpy alone.  This is the
    production shape of the decode stage (binary in, typed stats out,
    no shuffle); swapping the parser for `Image.open` generalizes the
    format support without touching the Spark plumbing."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re

        import numpy as _np
        import pandas as _pd
        # Header: magic, width, height, maxval, then exactly ONE
        # whitespace byte before the raw pixels (the P6 spec).  A
        # naive split() would also eat pixel bytes that happen to be
        # whitespace values (0x09/0x0a/0x20...).
        hdr = _re.compile(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s")
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                m = hdr.match(b)
                if not m:  # explicit: assert strips under -O
                    raise ValueError("not a P6 PPM")
                w, h = int(m.group(1)), int(m.group(2))
                px = _np.frombuffer(b, dtype=_np.uint8, offset=m.end(),
                                    count=w * h * 3).reshape(h, w, 3)
                sums = px.sum(axis=(0, 1), dtype=_np.int64)
                rows.append((int(i), w, h,
                             int(sums[0]), int(sums[1]), int(sums[2])))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "width", "height",
                               "sum_r", "sum_g", "sum_b"])

    return df.select(id_col, payload_col).mapInPandas(
        dec, schema=PPM_SCHEMA)


def resize_ppm(df: DataFrame, factor: int = 2, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """REAL resize: decode the P6 payload (numpy), nearest-neighbor
    subsample by ``factor`` (every factor-th pixel, the top-left
    anchor convention), and emit the resized dimensions + channel
    sums.  Same Arrow-batched narrow shape as decode; swapping the
    subsample for a PIL resample generalizes the kernel."""
    def rsz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re

        import numpy as _np
        import pandas as _pd
        hdr = _re.compile(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s")
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                m = hdr.match(b)
                if not m:  # explicit: assert strips under -O
                    raise ValueError("not a P6 PPM")
                w, h = int(m.group(1)), int(m.group(2))
                px = _np.frombuffer(b, dtype=_np.uint8, offset=m.end(),
                                    count=w * h * 3).reshape(h, w, 3)
                small = px[::factor, ::factor, :]
                sums = small.sum(axis=(0, 1), dtype=_np.int64)
                rows.append((int(i), small.shape[1], small.shape[0],
                             int(sums[0]), int(sums[1]), int(sums[2])))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "width", "height",
                               "sum_r", "sum_g", "sum_b"])

    return df.select(id_col, payload_col).mapInPandas(
        rsz, schema=PPM_SCHEMA)


WAV_N_SAMPLES = 64
WAV_RATE = 8000
WAV_SCHEMA = ("doc_id bigint, n_samples bigint, sample_rate bigint, "
              "n_channels bigint, sum_amp bigint, sum_sq bigint, "
              "peak bigint")


def encode_wav(df: DataFrame, id_col: str = "doc_id",
               out_col: str = "payload") -> DataFrame:
    """Arrow-batched RIFF/WAV *encoder*: synthesize a deterministic
    64-sample 16-bit mono PCM clip per row — sample t has amplitude
    ``((doc_id*37 + t*13) % 65536) - 32768`` — as real audio bytes
    (RIFF header, fmt chunk, data chunk, little-endian int16 PCM).
    The audio twin of :func:`encode_ppm`: arithmetic content so the
    decoded stats are oracle-checkable exactly."""
    import struct

    n, rate = WAV_N_SAMPLES, WAV_RATE

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd
        t = _np.arange(n, dtype=_np.int64)
        data_len = n * 2
        header = (
            b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                    rate * 2, 2, 16)
            + b"data" + struct.pack("<I", data_len)
        )
        for pdf in batches:
            payloads = [
                header
                + (((int(i) * 37 + t * 13) % 65536) - 32768)
                .astype("<i2").tobytes()
                for i in pdf[id_col]
            ]
            yield _pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                 out_col: payloads})

    return df.select(id_col).mapInPandas(
        enc, schema=f"{id_col} bigint, {out_col} binary")


def decode_wav(df: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL audio decode — no codec library needed:
    canonical RIFF chunk walk (any chunk order, trailing chunks
    ignored) + ``np.frombuffer`` for the int16 PCM samples, then
    exact integer stats per clip: sample count, rate, channels,
    amplitude sum, energy (sum of squares), and peak (max |amp|).
    Swapping the parser for soundfile/librosa generalizes the format
    support without touching the Spark plumbing — binary in, typed
    stats out, narrow, no shuffle."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, fmt, data = 12, None, None
                while pos + 8 <= len(b):
                    cid = b[pos:pos + 4]
                    (clen,) = _struct.unpack("<I", b[pos + 4:pos + 8])
                    body = b[pos + 8:pos + 8 + clen]
                    if cid == b"fmt ":
                        fmt = _struct.unpack("<HHIIHH", body[:16])
                    elif cid == b"data":
                        data = body
                    pos += 8 + clen + (clen & 1)  # chunks are word-aligned
                if fmt is None or data is None:
                    raise ValueError("missing fmt or data chunk")
                audio_fmt, n_ch, rate, _byte_rate, _block, bits = fmt
                if audio_fmt != 1 or bits != 16:
                    raise ValueError("only 16-bit PCM supported")
                amp = _np.frombuffer(data, dtype="<i2").astype(_np.int64)
                rows.append((int(i), len(amp) // n_ch, rate, n_ch,
                             int(amp.sum()), int((amp * amp).sum()),
                             int(_np.abs(amp).max()) if len(amp) else 0))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "sample_rate",
                               "n_channels", "sum_amp", "sum_sq",
                               "peak"])

    return df.select(id_col, payload_col).mapInPandas(
        dec, schema=WAV_SCHEMA)


def resample_wav(df: DataFrame, factor: int = 2,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """REAL audio downsample: decode the RIFF/PCM payload (the same
    chunk walk as :func:`decode_wav`), decimate by ``factor`` (every
    factor-th sample — the nearest-neighbor convention of
    :func:`resize_ppm`), and emit the resampled stats with the rate
    divided accordingly.  Swapping decimation for a windowed-sinc
    kernel generalizes the DSP without touching the Spark shape."""
    def rsz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE payload")
                pos, fmt, data = 12, None, None
                while pos + 8 <= len(b):
                    cid = b[pos:pos + 4]
                    (clen,) = _struct.unpack("<I", b[pos + 4:pos + 8])
                    body = b[pos + 8:pos + 8 + clen]
                    if cid == b"fmt ":
                        fmt = _struct.unpack("<HHIIHH", body[:16])
                    elif cid == b"data":
                        data = body
                    pos += 8 + clen + (clen & 1)
                if fmt is None or data is None:
                    raise ValueError("missing fmt or data chunk")
                audio_fmt, n_ch, rate, _br, _bl, bits = fmt
                if audio_fmt != 1 or bits != 16:
                    raise ValueError("only 16-bit PCM supported")
                amp = _np.frombuffer(data, dtype="<i2").astype(_np.int64)
                amp = amp[::factor]
                rows.append((int(i), len(amp) // n_ch, rate // factor,
                             n_ch, int(amp.sum()),
                             int((amp * amp).sum()),
                             int(_np.abs(amp).max()) if len(amp) else 0))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "sample_rate",
                               "n_channels", "sum_amp", "sum_sq",
                               "peak"])

    return df.select(id_col, payload_col).mapInPandas(
        rsz, schema=WAV_SCHEMA)


AVI_W, AVI_H = 6, 4  # stride 18 pads to 20: exercises DIB row padding
AVI_FPS = 10
AVI_SCHEMA = ("doc_id bigint, n_frames bigint, width bigint, "
              "height bigint, sum_r bigint, sum_g bigint, sum_b bigint")
AVI_FRAME_SCHEMA = ("doc_id bigint, frame_idx bigint, "
                    "sum_r bigint, sum_g bigint, sum_b bigint")


def avi_n_frames(doc_id: int) -> int:
    """Frames in the synthetic clip for ``doc_id`` (varies 2..5 so the
    sampling laws see ragged videos, like real corpora)."""
    return doc_id % 4 + 2


def encode_avi(df: DataFrame, id_col: str = "doc_id",
               out_col: str = "payload") -> DataFrame:
    """Arrow-batched RIFF/AVI *encoder*: synthesize a deterministic
    uncompressed-video clip per row — ``avi_n_frames(doc_id)`` frames
    of ``AVI_W``×``AVI_H`` 24-bit BI_RGB DIBs, where frame ``f`` pixel
    (r, c) channel k has value ``(doc_id*31 + f*17 + r*7 + c*3 +
    k*11) % 256`` — as spec-conforming AVI bytes (hdrl LIST with
    avih/strh/strf, movi LIST of 00db frames; DIB rows bottom-up,
    BGR, 4-byte row stride).  The video twin of :func:`encode_ppm` /
    :func:`encode_wav`: arithmetic content, exactly oracle-checkable."""
    import struct

    w, h, fps = AVI_W, AVI_H, AVI_FPS

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd
        stride = (w * 3 + 3) // 4 * 4
        frame_size = stride * h
        r = _np.arange(h).reshape(h, 1, 1)
        c = _np.arange(w).reshape(1, w, 1)
        kk = _np.array([2, 1, 0]).reshape(1, 1, 3)  # file order is BGR

        def frame_bytes(doc: int, f: int) -> bytes:
            vals = ((doc * 31 + f * 17 + r * 7 + c * 3 + kk * 11) % 256)
            padded = _np.zeros((h, stride), _np.uint8)
            padded[:, :w * 3] = vals.astype(_np.uint8).reshape(h, w * 3)
            return padded[::-1].tobytes()  # DIB rows are bottom-up

        strf = (b"strf" + struct.pack("<I", 40)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              frame_size, 0, 0, 0, 0))
        strh = (b"strh" + struct.pack("<I", 56) + b"vids" + b"DIB "
                + struct.pack("<IHHIIIIIIIIHHHH", 0, 0, 0, 0, 1, fps,
                              0, 0, frame_size, 0, 0, 0, 0, w, h))

        def make_avi(doc: int) -> bytes:
            nf = avi_n_frames(doc)
            strl = b"LIST" + struct.pack(
                "<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
            avih = (b"avih" + struct.pack("<I", 56)
                    + struct.pack("<14I", 10**6 // fps,
                                  fps * frame_size, 0, 0, nf, 0, 1,
                                  frame_size, w, h, 0, 0, 0, 0))
            hdrl = b"LIST" + struct.pack(
                "<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl
            frames = b"".join(
                b"00db" + struct.pack("<I", frame_size)
                + frame_bytes(doc, f) for f in range(nf))
            movi = (b"LIST" + struct.pack("<I", 4 + len(frames))
                    + b"movi" + frames)
            body = b"AVI " + hdrl + movi
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            yield _pd.DataFrame({
                id_col: pdf[id_col].astype("int64"),
                out_col: [make_avi(int(i)) for i in pdf[id_col]]})

    return df.select(id_col).mapInPandas(
        enc, schema=f"{id_col} bigint, {out_col} binary")


def _parse_avi(b: bytes):
    """Canonical RIFF/AVI walk (LIST recursion, word-aligned chunks,
    unknown/JUNK chunks skipped): returns ``(width, height, frames)``
    where frames is a list of ``(offset, length)`` spans of the VIDEO
    stream's DIB chunk bodies IN ORDER — offsets only, no pixel bytes
    touched, so a sampler decodes only the frames it keeps.

    Spec coverage beyond the happy path: the video stream is the strl
    whose strh says ``fccType == 'vids'`` (an accompanying audio strl
    must not clobber strf — a WAVEFORMATEX would misread as bit
    depth); movi chunks are matched by THAT stream's 2-digit number
    (``NNdb``/``NNdc``), so a second stream's chunks are never mixed
    in; and ``LIST 'rec '`` interleave groups (VfW's CD-ROM layout)
    are recursed into.  Only 24-bit BI_RGB video is supported (the
    uncompressed profile); anything else raises ``ValueError`` rather
    than mis-decoding.

    Module-level (shared by the kernels below): worker resolution is
    guaranteed by ``session._ship_package`` (addPyFile of this
    package), the same mechanism every registered query relies on."""
    import struct as _struct

    def chunks(pos: int, end: int):
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            (clen,) = _struct.unpack("<I", b[pos + 4:pos + 8])
            yield cid, pos + 8, min(clen, end - pos - 8)
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    avih, strf, frames = None, None, []
    stream_no, vids_no = 0, None

    def walk_movi(pos: int, end: int) -> None:
        prefix = b"%02d" % vids_no
        for cid2, s2, l2 in chunks(pos, end):
            if cid2 == b"LIST" and b[s2:s2 + 4] == b"rec ":
                walk_movi(s2 + 4, s2 + l2)
            elif cid2[:2] == prefix and cid2[2:4] in (b"db", b"dc"):
                frames.append((s2, l2))

    for cid, s, ln in chunks(12, len(b)):
        if cid != b"LIST":
            continue
        ltype = b[s:s + 4]
        if ltype == b"hdrl":
            for cid2, s2, l2 in chunks(s + 4, s + ln):
                if cid2 == b"avih":
                    avih = b[s2:s2 + l2]
                elif cid2 == b"LIST" and b[s2:s2 + 4] == b"strl":
                    is_vids = False
                    for cid3, s3, l3 in chunks(s2 + 4, s2 + l2):
                        if cid3 == b"strh":
                            is_vids = b[s3:s3 + 4] == b"vids"
                        elif cid3 == b"strf" and is_vids and vids_no is None:
                            strf = b[s3:s3 + l3]
                            vids_no = stream_no
                    stream_no += 1
        elif ltype == b"movi" and vids_no is not None:
            walk_movi(s + 4, s + ln)
    if avih is None or strf is None or not frames:
        raise ValueError("missing hdrl or movi content")
    w, h = _struct.unpack("<II", avih[32:40])
    (bits,) = _struct.unpack("<H", strf[14:16])
    (compression,) = _struct.unpack("<I", strf[16:20])
    if bits != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB (uncompressed) supported")
    return int(w), int(h), frames


def _dib_rgb(b: bytes, span: tuple[int, int], w: int, h: int):
    """One bottom-up BGR stride-padded DIB body at ``span=(offset,
    length)`` -> (h, w, 3) int64 RGB array (top-down).  frombuffer
    with an offset keeps the read zero-copy until the dtype cast —
    unsampled frames' bytes are never materialized."""
    import numpy as _np
    stride = (w * 3 + 3) // 4 * 4
    a = _np.frombuffer(b, _np.uint8, count=stride * h, offset=span[0])
    a = a.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    return a[::-1, :, ::-1].astype(_np.int64)  # flip rows, BGR -> RGB


def decode_avi(df: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL video decode — no codec library needed:
    RIFF/AVI chunk walk + numpy DIB decode, then exact integer stats
    per clip: frame count, dimensions, per-channel pixel sums over all
    frames.  Swapping the parser for pyav generalizes the codec
    support without touching the Spark plumbing (binary in, typed
    stats out, narrow, no shuffle)."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                w, h, frames = _parse_avi(raw)
                sums = sum(_dib_rgb(raw, f, w, h).sum(axis=(0, 1))
                           for f in frames)
                rows.append((int(i), len(frames), w, h,
                             int(sums[0]), int(sums[1]), int(sums[2])))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "width", "height",
                               "sum_r", "sum_g", "sum_b"])

    return df.select(id_col, payload_col).mapInPandas(
        dec, schema=AVI_SCHEMA)


def frame_sample_avi(df: DataFrame, every: int = 2,
                     id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """REAL frame sampling: one output row per kept frame (indices 0,
    every, 2·every, … < n_frames) with that frame's exact per-channel
    pixel sums.  The chunk walk indexes frame offsets without decoding
    pixels, so only sampled frames are ever decoded — the property
    that makes sparse sampling cheap on real video (a pyav variant
    seeks to keyframes the same way).  Upgrades :func:`frame_sample`'s
    metadata-only shape to real pixels."""
    def samp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b)
                w, h, frames = _parse_avi(raw)
                for f in range(0, len(frames), every):
                    s = _dib_rgb(raw, frames[f], w, h).sum(axis=(0, 1))
                    rows.append((int(i), f,
                                 int(s[0]), int(s[1]), int(s[2])))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "frame_idx",
                               "sum_r", "sum_g", "sum_b"])

    return df.select(id_col, payload_col).mapInPandas(
        samp, schema=AVI_FRAME_SCHEMA)


PNG_SIDE = 8
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(df: DataFrame, id_col: str = "doc_id",
               out_col: str = "payload") -> DataFrame:
    """Arrow-batched *real PNG* encoder: the same deterministic 8×8
    RGB raster as :func:`encode_ppm` (pixel (r, c) channel k =
    ``(doc_id*31 + r*7 + c*3 + k*11) % 256`` — so the PPM closed-form
    oracle transfers verbatim), written as a spec-conforming baseline
    PNG: signature, IHDR (8-bit truecolor, no interlace), one
    zlib-compressed IDAT, IEND, every chunk CRC32-protected.  Scanline
    ``r`` uses filter type ``r % 5``, so one image exercises ALL five
    PNG filters (None/Sub/Up/Average/Paeth) — the decoder cannot pass
    the roundtrip oracle without a complete filter implementation.
    Unlike the PPM/WAV/AVI family this payload is genuinely
    *compressed* — the decode path is a real codec, not a header walk.
    """
    side = PNG_SIDE

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import numpy as _np
        import pandas as _pd
        r = _np.arange(side).reshape(side, 1, 1)
        c = _np.arange(side).reshape(1, side, 1)
        k = _np.arange(3).reshape(1, 1, 3)
        ihdr = _png_chunk(
            b"IHDR", _struct.pack(">IIBBBBB", side, side, 8, 2, 0, 0, 0))
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                px = ((int(i) * 31 + r * 7 + c * 3 + k * 11) % 256) \
                    .astype(_np.int64)
                rows = px.reshape(side, side * 3)
                prior = _np.zeros(side * 3, dtype=_np.int64)
                out = bytearray()
                for rr in range(side):
                    raw = rows[rr]
                    left = _np.concatenate(
                        [_np.zeros(3, dtype=_np.int64), raw[:-3]])
                    upleft = _np.concatenate(
                        [_np.zeros(3, dtype=_np.int64), prior[:-3]])
                    ft = rr % 5
                    if ft == 0:
                        enc_row = raw
                    elif ft == 1:
                        enc_row = raw - left
                    elif ft == 2:
                        enc_row = raw - prior
                    elif ft == 3:
                        enc_row = raw - (left + prior) // 2
                    else:  # Paeth
                        p = left + prior - upleft
                        pa = _np.abs(p - left)
                        pb = _np.abs(p - prior)
                        pc = _np.abs(p - upleft)
                        pred = _np.where(
                            (pa <= pb) & (pa <= pc), left,
                            _np.where(pb <= pc, prior, upleft))
                        enc_row = raw - pred
                    out.append(ft)
                    out += (enc_row % 256).astype(_np.uint8).tobytes()
                    prior = raw
                idat = _png_chunk(b"IDAT", _zlib.compress(bytes(out)))
                payloads.append(_PNG_SIG + ihdr + idat
                                + _png_chunk(b"IEND", b""))
            yield _pd.DataFrame({id_col: pdf[id_col].astype("int64"),
                                 out_col: payloads})

    return df.select(id_col).mapInPandas(
        enc, schema=f"{id_col} bigint, {out_col} binary")


def _png_rgb8(b: bytes):
    """Baseline-PNG decoder (stdlib + numpy): signature check, chunk
    walk with per-chunk CRC32 verification, IHDR validation (8-bit
    truecolor, non-interlaced), IDAT concatenation + zlib inflate,
    and full scanline UNfiltering — all five filter types with the
    spec's reconstruction functions, including the Paeth predictor.
    Returns ``(width, height, uint8 ndarray h×w×3)``."""
    import struct
    import zlib

    import numpy as np
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        body = b[pos + 8:pos + 8 + clen]
        (crc,) = struct.unpack(
            ">I", b[pos + 8 + clen:pos + 12 + clen])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, ilace = \
                struct.unpack(">IIBBBBB", body)
            if (depth, ctype, ilace) != (8, 2, 0):
                raise ValueError("only 8-bit truecolor "
                                 "non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + clen
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size does not match dimensions")
    out = np.zeros((h, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=r * (stride + 1) + 1).astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prior) % 256
        elif ft in (1, 3, 4):
            # Left-dependent reconstructions are inherently
            # sequential in x; the rows are short (w·3 bytes).
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0
                up = prior[x]
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + up) // 2
                else:
                    c = prior[x - 3] if x >= 3 else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if pa <= pb and pa <= pc \
                        else (up if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = rec
        prior = rec
    return w, h, out.astype(np.uint8).reshape(h, w, 3)


def decode_png(df: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """Arrow-batched REAL *compressed*-image decode: full baseline-PNG
    parse (:func:`_png_rgb8` — CRC-checked chunk walk, zlib inflate,
    all-five-filter unfiltering) to per-channel pixel sums, the same
    output contract as :func:`decode_ppm`.  Retires the engine's last
    codec placeholder: binary in, typed stats out, Arrow batches,
    narrow, no shuffle."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = _png_rgb8(bytes(b))
                sums = px.sum(axis=(0, 1), dtype=_np.int64)
                rows.append((int(i), w, h,
                             int(sums[0]), int(sums[1]), int(sums[2])))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "width", "height",
                               "sum_r", "sum_g", "sum_b"])

    return df.select(id_col, payload_col).mapInPandas(
        dec, schema=PPM_SCHEMA)


REAL_SCHEMA = ("doc_id bigint, format string, width bigint, "
               "height bigint, n_units bigint, "
               "s0 bigint, s1 bigint, s2 bigint")


def decode_real(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """General decode over a MIXED-format binary column — the shape a
    real media lakehouse needs, where one corpus carries many
    containers.  Per-row magic-byte dispatch to the engine's four real
    codecs (PNG / P6-PPM / RIFF-WAVE / RIFF-AVI), emitting one unified
    row per payload: images report (width, height, n_units=1, channel
    sums), video reports (width, height, n_frames, channel sums over
    all frames), audio reports (sample_rate, n_channels, n_samples,
    sum_amp / sum_sq / peak) in the same slots.  Unknown magics raise
    — silent nulls would hide corpus corruption.  One Arrow-batched
    ``mapInPandas``, narrow, no shuffle: at 100 TB the dispatch is
    per-row inside the batch, so mixed corpora never need a
    per-format repartition."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd
        for pdf in batches:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(raw)
                if b[:8] == _PNG_SIG:
                    w, h, px = _png_rgb8(b)
                    s = px.sum(axis=(0, 1), dtype=_np.int64)
                    rows.append((int(i), "png", w, h, 1,
                                 int(s[0]), int(s[1]), int(s[2])))
                elif b[:2] == b"P6":
                    import re as _re
                    m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
                    if not m:
                        raise ValueError("malformed P6 header")
                    w, h = int(m.group(1)), int(m.group(2))
                    px = _np.frombuffer(
                        b, dtype=_np.uint8, offset=m.end(),
                        count=w * h * 3).reshape(h, w, 3)
                    s = px.sum(axis=(0, 1), dtype=_np.int64)
                    rows.append((int(i), "ppm", w, h, 1,
                                 int(s[0]), int(s[1]), int(s[2])))
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    pos, fmt, data = 12, None, None
                    while pos + 8 <= len(b):
                        cid = b[pos:pos + 4]
                        (clen,) = _struct.unpack(
                            "<I", b[pos + 4:pos + 8])
                        body = b[pos + 8:pos + 8 + clen]
                        if cid == b"fmt ":
                            fmt = _struct.unpack("<HHIIHH", body[:16])
                        elif cid == b"data":
                            data = body
                        pos += 8 + clen + (clen & 1)
                    if fmt is None or data is None:
                        raise ValueError("missing fmt or data chunk")
                    afmt, n_ch, rate, _br, _bl, bits = fmt
                    if afmt != 1 or bits != 16:
                        raise ValueError("only 16-bit PCM supported")
                    amp = _np.frombuffer(
                        data, dtype="<i2").astype(_np.int64)
                    rows.append((int(i), "wav", rate, n_ch,
                                 len(amp) // n_ch, int(amp.sum()),
                                 int((amp * amp).sum()),
                                 int(_np.abs(amp).max())
                                 if len(amp) else 0))
                elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    w, h, frames = _parse_avi(b)
                    tot = _np.zeros(3, dtype=_np.int64)
                    for span in frames:
                        tot += _dib_rgb(b, span, w, h).sum(
                            axis=(0, 1), dtype=_np.int64)
                    rows.append((int(i), "avi", w, h, len(frames),
                                 int(tot[0]), int(tot[1]),
                                 int(tot[2])))
                else:
                    raise ValueError(
                        f"unrecognized media magic {b[:8]!r}")
            yield _pd.DataFrame(
                rows, columns=["doc_id", "format", "width", "height",
                               "n_units", "s0", "s1", "s2"])

    return df.select(id_col, payload_col).mapInPandas(
        dec, schema=REAL_SCHEMA)
