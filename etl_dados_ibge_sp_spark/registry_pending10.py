"""Tenth pending tranche (authored round 9, gated to round 10): the
dataset-SPLIT family — the train/valid/test mechanics every
training-data pipeline runs after curation, closing the gap between
the dedup/decontamination operators (which find duplicates) and the
question users actually ship on: *did any of them cross a split?*

* **Deterministic hash split** — 80/10/10 assignment from a
  closed-form multiplicative hash of the stable id (Knuth's
  2654435761 mod 2³²), never `rand()`: reproducible across runs,
  engines, and partitionings, join-free, and usable as a partition
  column at ingest.  (At petabyte scale with arbitrary ids the same
  shape runs on `xxhash64`; the closed-form constant is what keeps
  the DuckDB oracle exact — same trade as the pinned n_bits/k in the
  dedup family.  Spark's bigint multiply bounds doc_id <
  2⁶³/2654435761 ≈ 3.46e9 (~2³¹·⁷) before ANSI overflow — the same
  bound DuckDB's BIGINT enforces; the testdata ids are far inside,
  and ids beyond it would take the xxhash64 form anyway.)
* **N-gram novelty** — per arriving doc (the ``doc_id % 7`` arrival
  convention of `dedup_incremental_load`), the fraction of its
  distinct word-trigrams absent from the warehouse: the
  novelty/memorization signal dataset curators track alongside
  quality.  One anti-join keyed by gram — the `text_decontaminate`
  shape pointed at the corpus itself.
* **Cross-split leakage** — trigram-Jaccard ≥ 0.8 near-dup pairs
  whose members landed in DIFFERENT splits: the train/test
  contamination report.  Pair discovery is the df-pruned inverted
  index of `dedup_containment` (grams with posting lists > 50 docs
  are dropped before the pair join, bounding fan-out to maxdf² per
  gram); at 100 TB the candidate pairs come from `dedup_minhash_lsh`
  and only the verdict join changes — the split/leakage logic is
  identical.

Deferral contract (same as every tranche): full DuckDB oracles now,
pytest parity from day one (tests/test_pending_r10.py), admission
when `registry_pending.admit` unlocks round-10 gated entries — the
round-9 rotation is exactly budget-full (vocab_topk + 49 of the r5
cohort), so these three must NOT displace it; at round 10 the slack
is 5·50 − 201 = 49 and the drain simulation in
tests/test_pending_r10.py proves the staleness bound survives the
admission.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.parquet_source import load_table

# Closed-form 80/10/10 split: bucket = (id * 2654435761 mod 2^32)
# mod 10; 8 -> valid, 9 -> test, else train.  Integer arithmetic is
# bit-identical in both engines.
_SPLIT_SQL = ("CASE ((doc_id * 2654435761) % 4294967296) % 10 "
              "WHEN 8 THEN 'valid' WHEN 9 THEN 'test' "
              "ELSE 'train' END")


def _split_col() -> F.Column:
    b = F.pmod(F.pmod(F.col("doc_id") * F.lit(2654435761),
                      F.lit(4294967296)), F.lit(10))
    return (F.when(b == 8, F.lit("valid"))
             .when(b == 9, F.lit("test"))
             .otherwise(F.lit("train")))


def _q_split_train_valid_test(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split with per-split descriptive stats.
    Pure projection + a 3-group aggregate: map-side partial
    aggregation, one constant-size shuffle, no sampling skew — the
    assignment is a function of the id alone, so re-running the
    pipeline (or re-partitioning the table) can never move a document
    between splits."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.select(_split_col().alias("split"),
                        "doc_id", "n_chars")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("sum_chars"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))


_SPLIT_STATS_SQL = f"""
SELECT {_SPLIT_SQL} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents GROUP BY 1
"""

# Word trigrams, DuckDB rendering identical to registry_pending6's
# containment oracle (word_shingles(n=3): trim -> \s+ split ->
# distinct 3-token windows).
_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"
_TRI_SQL = (f"list_transform(generate_series(1, len({_TOKS_SQL}) - 2), "
            f"i -> array_to_string(({_TOKS_SQL})[i:i+2], ' '))")


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per arriving doc, the fraction of its distinct word-trigrams
    the warehouse has never seen.  The anti-join is keyed by gram —
    partial-aggregated, shuffle carries (gram, id) pairs only; at
    100 TB the warehouse gram set is the stored decontamination index
    (or its bloom digest — `text_decontaminate`'s documented scale
    path), so the arrival cost is O(batch grams)."""
    from .operators.dedup import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    bg = word_shingles(docs.filter(F.col("doc_id") % 7 == 0),
                       "doc_id", "text", n=3)
    wg = (word_shingles(docs.filter(F.col("doc_id") % 7 != 0),
                        "doc_id", "text", n=3)
          .select("shingle").distinct())
    tot = bg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    nov = (bg.join(wg, "shingle", "left_anti")
             .groupBy("doc_id")
             .agg(F.count(F.lit(1)).alias("n_novel")))
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0).cast("long"))
    return (tot.join(nov, "doc_id", "left")
            .select("doc_id", "n_grams",
                    n_novel.alias("n_novel"),
                    F.round(n_novel / F.col("n_grams"), 6)
                     .alias("novelty")))


_NGRAM_NOVELTY_SQL = f"""
WITH bg AS (
    SELECT doc_id, unnest(list_distinct({_TRI_SQL})) AS shingle
    FROM documents WHERE doc_id % 7 = 0
), wg AS (
    SELECT DISTINCT unnest(list_distinct({_TRI_SQL})) AS shingle
    FROM documents WHERE doc_id % 7 <> 0
), tot AS (
    SELECT doc_id, COUNT(*) AS n_grams FROM bg GROUP BY 1
), nov AS (
    SELECT bg.doc_id, COUNT(*) AS n_novel
    FROM bg ANTI JOIN wg USING (shingle) GROUP BY 1
)
SELECT t.doc_id, t.n_grams,
       COALESCE(n.n_novel, 0) AS n_novel,
       round(COALESCE(n.n_novel, 0) * 1.0 / t.n_grams, 6) AS novelty
FROM tot t LEFT JOIN nov n ON t.doc_id = n.doc_id
"""


def pruned_trigram_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The df <= 50-pruned word-trigram shingle relation (doc_id,
    shingle), staged once per (session, sf_dir) — the shared inverted
    index THREE registered queries previously each rebuilt per
    invocation (`dedup_containment`, `split_leakage_pairs`,
    `near_dup_rate_by_source`; r11 measured them at 2.9/4.0/4.6 s,
    dominated by the identical shingle explode + document-frequency
    census).  Production stages exactly this as a table at ingest
    (the `_warehouse_signatures` precedent); locally it is a
    session-memoized persisted frame, rebuilt from the parquet inputs
    inside every bench/oracle run.  Memoization cannot change any
    result: the relation is a deterministic function of the documents
    table, and each consumer's aggregation/join logic is untouched.

    Build notes: the input scan keeps ``fan_out=True`` — the shingle
    explode is exactly the per-row-heavy narrow work the fan-out
    exists for (r11 A/B) — and the df census prunes BEFORE the
    persist, so the staged relation is the small side (boilerplate
    grams with posting lists > 50 docs, the quadratic-fanout mass,
    never hit storage)."""
    from pyspark.storagelevel import StorageLevel

    from .operators.dedup import word_shingles
    from .session import session_memo

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents", fan_out=True)
        sh0 = word_shingles(docs, "doc_id", "text", n=3)
        keep = (sh0.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= 50)
                .select("shingle"))
        return (sh0.join(keep, "shingle")
                .persist(StorageLevel.MEMORY_AND_DISK))

    return session_memo(spark, f"pruned_tri_shingles:{sf_dir}", build)


def trigram_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-Jaccard >= 0.8 near-dup pairs (doc_a < doc_b, jaccard)
    over :func:`pruned_trigram_shingles`, staged once per (session,
    sf_dir) — the pair set `split_leakage_pairs` and
    `near_dup_rate_by_source` both verdict on (each previously rebuilt
    the whole inverted-index pair join per invocation).  Arithmetic is
    bit-identical to the inline form both queries used: exact
    intersection counts from the pruned index, sizes measured on the
    SAME pruned set, ``round(i / (sa + sb - i), 6) >= 0.8``."""
    from pyspark.storagelevel import StorageLevel

    from .session import session_memo

    def build() -> DataFrame:
        sh = pruned_trigram_shingles(spark, sf_dir)
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (a.join(b, "shingle")
                 .filter(F.col("doc_a") < F.col("doc_b"))
                 .groupBy("doc_a", "doc_b")
                 .agg(F.count(F.lit(1)).alias("i")))
        jac = F.round(
            F.col("i") * F.lit(1.0) /
            (F.col("__sa") + F.col("__sb") - F.col("i")), 6)
        return (inter
                .join(sizes.select(F.col("doc_id").alias("doc_a"),
                                   F.col("sz").alias("__sa")), "doc_a")
                .join(sizes.select(F.col("doc_id").alias("doc_b"),
                                   F.col("sz").alias("__sb")), "doc_b")
                .select("doc_a", "doc_b", jac.alias("jaccard"))
                .filter(F.col("jaccard") >= 0.8)
                .persist(StorageLevel.MEMORY_AND_DISK))

    return session_memo(spark, f"tri_neardup_pairs:{sf_dir}", build)


def leakage_pairs(spark: SparkSession, sf_dir: str,
                  candidates: str = "inverted") -> DataFrame:
    """Train/test contamination report: trigram-Jaccard ≥ 0.8 near-dup
    pairs that straddle splits, with a selectable candidate-discovery
    strategy (the verdict join — exact Jaccard on the df-pruned
    shingle sets — is IDENTICAL in both):

    ``candidates="inverted"`` — the df-pruned inverted index of
    `dedup_containment` (posting lists > 50 docs dropped before the
    pair join — fan-out bounded by maxdf² per gram, sizes measured on
    the same pruned set the intersection uses).  Exact: every
    qualifying pair is found.  The registered query uses this path so
    the DuckDB oracle stays closed-form.

    ``candidates="lsh"`` — the 100 TB path the inverted index's
    docstring promised: MinHash signatures (8 perms) banded 4×2 via
    `dedup.lsh_candidate_pairs` (hot buckets > 500 docs dropped), so
    candidate discovery is LINEAR in corpus size; each candidate is
    then verified with the SAME exact intersection join, so no false
    positives — only band-miss false negatives, P(miss | J=0.8) =
    (1−0.8²)⁴ ≈ 1.7 %.  The subset law (lsh ⊆ inverted, identical
    jaccard values) is pinned in tests/test_pending_r10.py; the
    sf1/sf3 curve rows live in SCALE.md."""
    from .operators.dedup import lsh_candidate_pairs, minhash_signature

    docs = load_table(spark, sf_dir, "documents")
    sh = pruned_trigram_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates == "inverted":
        # The staged shared pair set (identical arithmetic) — pair
        # discovery is computed once per session, not once per
        # invocation (optimization r12).
        pairs = trigram_neardup_pairs(spark, sf_dir)
    elif candidates == "lsh":
        # Banded discovery over the SAME pruned shingle set the
        # verdict measures (signatures on the unpruned set would let
        # a dropped stop-gram shift a signature but not the verdict).
        cand = lsh_candidate_pairs(
            minhash_signature(sh, "doc_id", n_hashes=8),
            "doc_id", rows_per_band=2, max_bucket=500)
        # Exact intersection per surviving candidate only: the pair
        # list is skinny (two bigints), the gram lists join it by id
        # — never an all-pairs gram join.
        a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
        inter = (cand
                 .join(a, "id_a").join(b, ["id_b", "shingle"])
                 .groupBy("id_a", "id_b")
                 .agg(F.count(F.lit(1)).alias("i"))
                 .select(F.col("id_a").alias("doc_a"),
                         F.col("id_b").alias("doc_b"), "i"))
    else:
        raise ValueError(f"unknown candidate strategy {candidates!r}")
    if candidates != "inverted":
        jac = F.round(
            F.col("i") * F.lit(1.0) /
            (F.col("__sa") + F.col("__sb") - F.col("i")), 6)
        pairs = (inter
                 .join(sizes.select(F.col("doc_id").alias("doc_a"),
                                    F.col("sz").alias("__sa")), "doc_a")
                 .join(sizes.select(F.col("doc_id").alias("doc_b"),
                                    F.col("sz").alias("__sb")), "doc_b")
                 .select("doc_a", "doc_b", jac.alias("jaccard"))
                 .filter(F.col("jaccard") >= 0.8))
    sp = docs.select("doc_id", _split_col().alias("split"))
    return (pairs
            .join(sp.select(F.col("doc_id").alias("doc_a"),
                            F.col("split").alias("split_a")), "doc_a")
            .join(sp.select(F.col("doc_id").alias("doc_b"),
                            F.col("split").alias("split_b")), "doc_b")
            .filter(F.col("split_a") != F.col("split_b"))
            .select("doc_a", "doc_b", "split_a", "split_b", "jaccard"))


def _q_split_leakage_pairs(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Registered face of :func:`leakage_pairs` — the exact
    inverted-index candidate path, whose DuckDB oracle is
    closed-form.  The LSH-banded 100 TB variant is
    ``leakage_pairs(..., candidates="lsh")`` with its subset law and
    measured sf1/sf3 curve."""
    return leakage_pairs(spark, sf_dir, candidates="inverted")


_SPLIT_LEAKAGE_SQL = f"""
WITH sh0 AS (
    SELECT doc_id, unnest(list_distinct({_TRI_SQL})) AS shingle
    FROM documents
), keep AS (
    SELECT shingle FROM sh0 GROUP BY 1 HAVING COUNT(*) <= 50
), sh AS (
    SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN keep USING (shingle)
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
), inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM sh a JOIN sh b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), p AS (
    SELECT doc_a, doc_b,
           round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.8
), d AS (
    SELECT doc_id, {_SPLIT_SQL} AS split FROM documents
)
SELECT doc_a, doc_b, da.split AS split_a, db.split AS split_b, jaccard
FROM p
JOIN d da ON doc_a = da.doc_id
JOIN d db ON doc_b = db.doc_id
WHERE da.split <> db.split
"""


def _q_multimodal_png_roundtrip(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """REAL *compressed*-image decode, end to end: a deterministic
    8×8 RGB raster is written as a spec-conforming baseline PNG
    (zlib-deflated IDAT, CRC32 on every chunk, scanline filters
    cycling through all five types) and decoded back with the
    stdlib+numpy parser (operators/multimodal.decode_png — chunk
    walk, CRC verification, inflate, full unfiltering).  The pixel
    formula matches encode_ppm, so the closed-form channel-sum
    oracle transfers verbatim — but unlike the PPM row this payload
    round-trips through actual compression and filter prediction,
    retiring the engine's last codec placeholder.  Both stages are
    Arrow-batched mapInPandas: narrow, no shuffle, decode throughput
    scales with executor count."""
    from .operators.multimodal import decode_png, encode_png

    # fan_out deliberately OFF — same chained-codec in-suite finding
    # as multimodal_avi_stats (OPTIMIZATION_r11.md).
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_png(encode_png(docs))


# Pixel (r, c) channel k is (doc_id*31 + r*7 + c*3 + k*11) % 256 over
# an 8×8 raster — identical to the PPM oracle (the PNG layer changes
# the container, not the content).
_PNG_SQL = """
WITH px AS (
    SELECT d.doc_id, r.r, c.c
    FROM documents d,
         generate_series(0, 7) r(r),
         generate_series(0, 7) c(c)
)
SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3 + 11) % 256) AS BIGINT)
           AS sum_g,
       CAST(SUM((doc_id * 31 + r * 7 + c * 3 + 22) % 256) AS BIGINT)
           AS sum_b
FROM px GROUP BY doc_id
"""


def _q_multimodal_decode_real(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """MIXED-format corpus decode — the media-lakehouse reality where
    one binary column carries many containers.  Each document is
    encoded into the format its id selects (doc_id % 4 → PNG / PPM /
    WAV / AVI), the four encoded frames are unioned into one corpus,
    and ``decode_real`` dispatches per row on magic bytes inside a
    single Arrow-batched pass — no per-format repartition, no
    shuffle; every decoded stat matches the per-format closed-form
    oracle exactly.  At 100 TB the union is simply the ingested
    table; dispatch cost is O(1) per row against the batch's
    in-memory bytes."""
    from .operators.multimodal import (decode_real, encode_avi,
                                       encode_png, encode_ppm,
                                       encode_wav)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    m4 = F.col("doc_id") % 4
    mixed = (encode_png(docs.filter(m4 == 0))
             .unionByName(encode_ppm(docs.filter(m4 == 1)))
             .unionByName(encode_wav(docs.filter(m4 == 2)))
             .unionByName(encode_avi(docs.filter(m4 == 3))))
    return decode_real(mixed)


# Unified-schema union of the four codec oracles: images/video carry
# (width, height, frames, channel sums); audio carries (rate,
# channels, samples, sum/energy/peak) in the same slots.  Content
# formulas mirror operators/multimodal.py's encoders literally.
_DECODE_REAL_SQL = """
WITH img AS (
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 4 = 0 THEN 'png' ELSE 'ppm' END
               AS format,
           CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS n_units,
           CAST(SUM((d.doc_id * 31 + r.r * 7 + c.c * 3) % 256)
                AS BIGINT) AS s0,
           CAST(SUM((d.doc_id * 31 + r.r * 7 + c.c * 3 + 11) % 256)
                AS BIGINT) AS s1,
           CAST(SUM((d.doc_id * 31 + r.r * 7 + c.c * 3 + 22) % 256)
                AS BIGINT) AS s2
    FROM documents d,
         generate_series(0, 7) r(r), generate_series(0, 7) c(c)
    WHERE d.doc_id % 4 IN (0, 1)
    GROUP BY 1, 2
), wav AS (
    SELECT doc_id, 'wav' AS format,
           CAST(8000 AS BIGINT) AS width, CAST(1 AS BIGINT) AS height,
           CAST(64 AS BIGINT) AS n_units,
           CAST(SUM(amp) AS BIGINT) AS s0,
           CAST(SUM(amp * amp) AS BIGINT) AS s1,
           CAST(MAX(ABS(amp)) AS BIGINT) AS s2
    FROM (
        SELECT d.doc_id,
               ((d.doc_id * 37 + t.t * 13) % 65536) - 32768 AS amp
        FROM documents d, generate_series(0, 63) t(t)
        WHERE d.doc_id % 4 = 2
    ) GROUP BY 1
), avi AS (
    SELECT doc_id, 'avi' AS format,
           CAST(6 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
           CAST(doc_id % 4 + 2 AS BIGINT) AS n_units,
           CAST(SUM(CASE WHEN k = 0 THEN v END) AS BIGINT) AS s0,
           CAST(SUM(CASE WHEN k = 1 THEN v END) AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN k = 2 THEN v END) AS BIGINT) AS s2
    FROM (
        SELECT d.doc_id, k.k,
               (d.doc_id * 31 + f.f * 17 + r.r * 7 + c.c * 3
                + k.k * 11) % 256 AS v
        FROM documents d,
             generate_series(0, 5) f(f), generate_series(0, 3) r(r),
             generate_series(0, 5) c(c), generate_series(0, 2) k(k)
        WHERE d.doc_id % 4 = 3 AND f.f < d.doc_id % 4 + 2
    ) GROUP BY 1
)
SELECT * FROM img
UNION ALL SELECT * FROM wav
UNION ALL SELECT * FROM avi
"""


# (earliest admission round, name, oracle_sql, fn) — consumed by
# registry_pending.PENDING_GATED.
PENDING10_GATED: list[tuple[int, str, str,
                            Callable[[SparkSession, str],
                                     DataFrame]]] = [
    (10, "split_train_valid_test", _SPLIT_STATS_SQL,
     _q_split_train_valid_test),
    (10, "ngram_novelty", _NGRAM_NOVELTY_SQL, _q_ngram_novelty),
    (10, "split_leakage_pairs", _SPLIT_LEAKAGE_SQL,
     _q_split_leakage_pairs),
    (10, "multimodal_png_roundtrip", _PNG_SQL,
     _q_multimodal_png_roundtrip),
    (10, "multimodal_decode_real", _DECODE_REAL_SQL,
     _q_multimodal_decode_real),
]
