"""Ninth pending tranche (round 5): the VIDEO modality as driver
queries — real RIFF/AVI encode -> decode / frame-sample with
closed-form integer oracles, completing the three-modality set
(image `multimodal_ppm_*`, audio `multimodal_wav_*`, video here).

Same deferral contract as every tranche: full DuckDB oracles now,
pytest parity from day one (tests/test_pending_r05.py), registration
when `registry_pending.admit` finds slack (round 6; 47 queued ≤ the
50-slot budget, N=197 ≤ the 200-query 4-round rotation bound).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .sources.parquet_source import load_table


def _q_multimodal_avi_stats(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """REAL video decode, end to end: a deterministic uncompressed
    RIFF/AVI clip (avi_n_frames(doc_id) frames of 6x4 24-bit BI_RGB
    DIBs, spec-conforming container) is encoded per document and
    decoded back with the numpy-only chunk-walk parser
    (operators/multimodal.decode_avi); exact per-clip integer channel
    sums match the closed-form oracle.  The video member of the
    PPM/WAV/AVI codec family — both stages Arrow-batched mapInPandas,
    narrow, no shuffle."""
    from .operators.multimodal import decode_avi, encode_avi
    # fan_out deliberately OFF (optimization r11): the fanned
    # encode->decode chain (two chained python workers x 32 tasks)
    # measured a pathological in-suite blowup (1.3 s -> 13.4 s min-of-3)
    # while the bare chain runs 0.5-0.8 s solo and in-suite.
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_avi(encode_avi(docs))


# Pixel (r, c) channel k of frame f is (doc_id*31 + f*17 + r*7 + c*3
# + k*11) % 256 over a 6x4 raster; frame count is doc_id % 4 + 2.
# The literals mirror operators/multimodal.AVI_W/AVI_H/avi_n_frames.
_AVI_SQL = """
WITH px AS (
    SELECT d.doc_id, k.k,
           (d.doc_id * 31 + f.f * 17 + r.r * 7 + c.c * 3 + k.k * 11)
           % 256 AS v
    FROM documents d,
         generate_series(0, 5) f(f), generate_series(0, 3) r(r),
         generate_series(0, 5) c(c), generate_series(0, 2) k(k)
    WHERE f.f < d.doc_id % 4 + 2
)
SELECT doc_id,
       CAST(doc_id % 4 + 2 AS BIGINT) AS n_frames,
       CAST(6 AS BIGINT) AS width,
       CAST(4 AS BIGINT) AS height,
       CAST(SUM(CASE WHEN k = 0 THEN v END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN k = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN k = 2 THEN v END) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id
"""


def _q_multimodal_avi_frames(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """REAL frame sampling over the same clips: every 2nd frame's
    exact per-channel pixel sums, one row per kept frame.  Only the
    sampled frames are decoded — the chunk walk returns byte spans, so
    skipped frames' pixels are never materialized (the property that
    makes sparse sampling cheap on real video)."""
    from .operators.multimodal import encode_avi, frame_sample_avi
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return frame_sample_avi(encode_avi(docs), every=2)


_AVI_FRAMES_SQL = """
WITH px AS (
    SELECT d.doc_id, f.f AS frame_idx, k.k,
           (d.doc_id * 31 + f.f * 17 + r.r * 7 + c.c * 3 + k.k * 11)
           % 256 AS v
    FROM documents d,
         generate_series(0, 5) f(f), generate_series(0, 3) r(r),
         generate_series(0, 5) c(c), generate_series(0, 2) k(k)
    WHERE f.f < d.doc_id % 4 + 2 AND f.f % 2 = 0
)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(SUM(CASE WHEN k = 0 THEN v END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN k = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN k = 2 THEN v END) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, frame_idx
"""


PENDING9: list[tuple[str, str,
                     Callable[[SparkSession, str], DataFrame]]] = [
    ("multimodal_avi_stats", _AVI_SQL, _q_multimodal_avi_stats),
    ("multimodal_avi_frames", _AVI_FRAMES_SQL, _q_multimodal_avi_frames),
]
