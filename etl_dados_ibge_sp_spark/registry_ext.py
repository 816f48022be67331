"""Extension queries (LLM-data-pipeline operators): text analysis,
dedup (exact / Jaccard / MinHash-LSH / SimHash), similarity search,
multimodal plumbing, event sessionization, and the Structured
Streaming parity query.

Registered into the same REGISTRY as the core relational queries;
every entry that is SQL-expressible carries a DuckDB oracle built on
engine-portable primitives (md5/substr/hex-parse/list lambdas).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import multimodal as M
from .operators import similarity as S
from .operators import text as T
from .operators.aggregate import dsum
from .registry import _t, register

# Shared SQL fragments (kept identical across oracles).
_NORM_SQL = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"
# Word 3-gram shingles (DuckDB rendering of word_shingles(n=3)):
# generate_series(1, 0) is empty, so <3-token docs yield no grams —
# same guard as the Spark side.
_TRIGRAMS_SQL = (
    f"list_transform(generate_series(1, len({_TOKS_SQL}) - 2), "
    f"i -> array_to_string(({_TOKS_SQL})[i:i+2], ' '))"
)

# Session-scoped memo for the full-corpus trigram-Jaccard pair set —
# the one expensive intermediate two registered queries both need
# (dedup_keep_canonical clusters the whole corpus; corpus_curate
# clusters its quality/exact-dedup survivors, and Jaccard is pair-
# local, so survivor pairs == full pairs filtered to survivor
# endpoints).  A suite run computes pair discovery once instead of
# twice; results are unchanged because the filter is exact.


def _jaccard_pairs_full(spark, sf_dir):
    from pyspark.storagelevel import StorageLevel

    from .session import session_memo

    def build():
        docs = _t(spark, sf_dir, "documents", fan_out=True)
        # Planner-chosen joins (pin_shuffle=False), deliberately: the
        # pipelined broadcast verify is the only shape that never
        # materializes the |cand| x |doc| verification volume, and it
        # is measured optimal through sf3.0 (2.8 s).  Its documented
        # boundary is executor memory: the round-10 sf10.0 point
        # measured the corpus-side index broadcast OOM-ing an 8 GB
        # heap, and the pinned all-shuffle alternative trading that
        # for ~60-80 GB of materialized intermediate (linear —
        # cluster-viable, single-box-fatal, ENOSPC at sf3.0 locally).
        # Past that boundary the prescription is not a join strategy
        # but an ALGORITHM swap: LSH-banded candidates + bounded
        # verify (dedup_minhash_lsh, measured exponent 0.65 at sf10).
        return D.jaccard_pairs(
            D.word_shingles(docs, "doc_id", "text", n=3), "doc_id",
            threshold=0.8).select("id_a", "id_b") \
            .persist(StorageLevel.MEMORY_AND_DISK)

    return session_memo(spark, f"jaccard_pairs:{sf_dir}", build)


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@register("text_token_stats", sql=f"""
SELECT doc_id,
       CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
             / len({_TOKS_SQL}), 6) AS avg_token_len
FROM documents
""")
def q_text_token_stats(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish pre-tokens, all
    JVM-side regexp (no UDF)."""
    d = _t(spark, sf_dir, "documents", fan_out=True)
    text = F.col("text")
    n_tok = T.token_count(text)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        T.bpe_token_count(text).alias("n_bpe_tokens"),
        F.length(text).cast("bigint").alias("n_chars"),
        F.round(F.length(F.regexp_replace(text, r"\s", "")).cast("double")
                / n_tok, 6).alias("avg_token_len"),
    )


def _lang_score_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return (f"CAST(len(list_filter({_TOKS_SQL}, "
            f"t -> t IN ({inlist}))) AS BIGINT)")


@register("text_language_id", sql=f"""
WITH s AS (
    SELECT doc_id, lang,
           {_lang_score_sql(T.LANG_MARKERS['en'])} AS s_en,
           {_lang_score_sql(T.LANG_MARKERS['de'])} AS s_de,
           {_lang_score_sql(T.LANG_MARKERS['fr'])} AS s_fr,
           {_lang_score_sql(T.LANG_MARKERS['es'])} AS s_es
    FROM documents
)
SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
       CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM s
""")
def q_text_language_id(spark, sf_dir):
    """Language-ID heuristic: marker-stopword scores + first-match
    argmax (the n-gram-heuristic family, SQL-expressible)."""
    d = _t(spark, sf_dir, "documents", fan_out=True)
    text = F.col("text")
    scores = T.language_scores(text)
    return d.select(
        "doc_id", "lang",
        scores["en"].alias("s_en"), scores["de"].alias("s_de"),
        scores["fr"].alias("s_fr"), scores["es"].alias("s_es"),
        T.predicted_language(text).alias("pred_lang"),
    )


@register("text_quality_score", sql=f"""
SELECT doc_id,
       CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT)
           AS n_punct,
       round(0.4 * least({_lang_score_sql(T.LANG_MARKERS['en'])} * 1.0
                         / len({_TOKS_SQL}) * 4, 1.0)
           + 0.3 * (1.0 - least(len(regexp_extract_all(text, '[.,!?;:]'))
                                * 1.0 / length(text) * 10, 1.0))
           + 0.3 * least(length(text) / 500.0, 1.0), 6) AS quality
FROM documents
""")
def q_text_quality_score(spark, sf_dir):
    """Quality scoring: stopword density + punctuation sanity + length
    saturation, pure rational arithmetic (deterministic everywhere)."""
    d = _t(spark, sf_dir, "documents", fan_out=True)
    text = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(text).alias("n_tokens"),
        T.punct_count(text).alias("n_punct"),
        T.quality_score(text, F.length(text)).alias("quality"),
    )


@register("text_fingerprint", sql=f"""
SELECT doc_id,
       md5({_NORM_SQL}) AS fp_md5,
       CAST(concat('0x', substr(md5({_NORM_SQL}), 1, 15)) AS BIGINT)
           AS fp64
FROM documents
""")
def q_text_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 over normalized text + a 60-bit
    integer prefix (engine-portable hex parse)."""
    d = _t(spark, sf_dir, "documents")
    text = F.col("text")
    return d.select(
        "doc_id",
        T.fingerprint_md5(text).alias("fp_md5"),
        T.fingerprint64(text).alias("fp64"),
    )


@register("text_rolling_hash", sql=f"""
WITH norm AS (
    SELECT doc_id, {_NORM_SQL} AS nt FROM documents
)
SELECT doc_id,
       CASE WHEN length(nt) = 0 THEN CAST(0 AS BIGINT)
            ELSE list_reduce(
                list_prepend(CAST(0 AS BIGINT),
                    [CAST(ascii(c) AS BIGINT)
                     for c in string_split_regex(nt, '')]),
                (acc, x) -> (acc * 131 + x) % 2147483647)
       END AS rhash
FROM norm
""")
def q_text_rolling_hash(spark, sf_dir):
    """Rabin-Karp polynomial rolling-hash fingerprint over normalized
    text — a JVM-side aggregate fold, checked char-for-char against
    DuckDB's list_reduce."""
    d = _t(spark, sf_dir, "documents", fan_out=True)
    nt = d.select("doc_id", T.normalized_text(F.col("text")).alias("nt"))
    return nt.select("doc_id", T.rolling_hash(F.col("nt")).alias("rhash"))


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

@register("dedup_exact", sql=f"""
SELECT md5({_NORM_SQL}) AS content_key,
       min(doc_id) AS keeper_id,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
""")
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on the normalized-content fingerprint
    (shuffles fingerprints, not bodies)."""
    return D.exact_dedup_groups(
        _t(spark, sf_dir, "documents"), "doc_id", "text")


@register("dedup_jaccard_pairs", sql=f"""
WITH sh AS (
    SELECT doc_id, unnest(list_distinct({_TOKS_SQL})) AS shingle
    FROM documents WHERE doc_id < 300
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE round(i * 1.0 / (sa.sz + sb.sz - i), 6) >= 0.8
""")
def q_dedup_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs via the shingle inverted index —
    the exact (quadratic-per-bucket) verification path, bounded to
    doc_id<300; the scale path is dedup_minhash_lsh."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sh = D.word_shingles(docs, "doc_id", "text", n=1)
    return D.jaccard_pairs(sh, "doc_id", 0.8)


@register("dedup_minhash_lsh", sql=f"""
WITH norm AS (
    SELECT doc_id, {_NORM_SQL} AS nt FROM documents
), sh AS (
    SELECT doc_id,
           unnest([substr(nt, i, 4)
               FOR i IN generate_series(1, greatest(length(nt) - 3, 1))])
               AS shingle
    FROM norm
), sig AS (
    SELECT doc_id,
           min(substr(md5(concat('s0:', shingle)),  1, 8)) AS mh0,
           min(substr(md5(concat('s0:', shingle)),  9, 8)) AS mh1,
           min(substr(md5(concat('s0:', shingle)), 17, 8)) AS mh2,
           min(substr(md5(concat('s0:', shingle)), 25, 8)) AS mh3,
           min(substr(md5(concat('s1:', shingle)),  1, 8)) AS mh4,
           min(substr(md5(concat('s1:', shingle)),  9, 8)) AS mh5,
           min(substr(md5(concat('s1:', shingle)), 17, 8)) AS mh6,
           min(substr(md5(concat('s1:', shingle)), 25, 8)) AS mh7
    FROM sh GROUP BY 1
), banded AS (
    SELECT doc_id, 0 AS band, concat(mh0, '|', mh1) AS band_key FROM sig
    UNION ALL
    SELECT doc_id, 1, concat(mh2, '|', mh3) FROM sig
    UNION ALL
    SELECT doc_id, 2, concat(mh4, '|', mh5) FROM sig
    UNION ALL
    SELECT doc_id, 3, concat(mh6, '|', mh7) FROM sig
), kept AS (
    SELECT band, band_key FROM banded
    GROUP BY 1, 2 HAVING COUNT(*) <= 500
), pruned AS (
    SELECT b.* FROM banded b
    JOIN kept k ON b.band = k.band AND b.band_key = k.band_key
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM pruned a
JOIN pruned b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
""")
def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs: char-4gram shingles → 8-hash
    signature (one explode+groupBy pass) → 4 bands of 2 → equi-join on
    band keys with over-full buckets dropped (>500: no discriminative
    signal, quadratic fanout).  Linear-time pair discovery, the 100-TB
    dedup path."""
    docs = _t(spark, sf_dir, "documents", fan_out=True)
    sh = D.char_shingles(docs, "doc_id", "text", n=4)
    sig = D.minhash_signature(sh, "doc_id", n_hashes=8)
    return D.lsh_candidate_pairs(sig, "doc_id", rows_per_band=2,
                                 max_bucket=500)


@register("dedup_connected_components", sql=f"""
WITH RECURSIVE sh AS (
    SELECT doc_id, unnest(list_distinct({_TRIGRAMS_SQL})) AS shingle
    FROM documents
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT id_a, id_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.8
), edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL SELECT id_b AS u, id_a AS v FROM pairs
), reach(n, l) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.u, r.l FROM edges e JOIN reach r ON r.n = e.v
)
SELECT n AS doc_id, CAST(min(l) AS BIGINT) AS component_id
FROM reach GROUP BY n
""")
def q_dedup_connected_components(spark, sf_dir):
    """Dedup keeper assignment: connected components over the verified
    near-dup graph (word-Jaccard ≥ 0.8) by iterative min-label
    propagation — the one deliberately iterative algorithm (driver
    loop, O(diameter) rounds, lineage truncated per round).  Oracle is
    DuckDB's recursive-CTE transitive closure.  Word TRIgram shingles:
    unigram vocabulary overlap marks half the corpus as "duplicates"
    (~3M pairs at sf0.1); trigrams measure shared phrasing, the signal
    dedup actually wants, and keep the edge set linear in true dups."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _jaccard_pairs_full(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").alias("node"))
    out = D.connected_components(nodes, pairs, node_col="node")
    return out.select(F.col("node").alias("doc_id"),
                      F.col("component_id").cast("bigint"))


@register("dedup_keep_canonical", sql=f"""
WITH RECURSIVE sh AS (
    SELECT doc_id, unnest(list_distinct({_TRIGRAMS_SQL})) AS shingle
    FROM documents
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT id_a, id_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.8
), edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL SELECT id_b AS u, id_a AS v FROM pairs
), reach(n, l) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.u, r.l FROM edges e JOIN reach r ON r.n = e.v
), comp AS (
    SELECT n AS doc_id, min(l) AS component_id FROM reach GROUP BY n
)
SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d JOIN comp c ON c.doc_id = d.doc_id
WHERE c.doc_id = c.component_id
""")
def q_dedup_keep_canonical(spark, sf_dir):
    """The full dedup pipeline's output: the corpus with near-dup
    clusters collapsed to their canonical (minimum-id) member — pair
    discovery -> connected components -> filter keepers -> semi-join
    back to the corpus.  This is the operator a training-data pipeline
    actually runs; the stages before it are its observable internals.
    Trigram shingles, same rationale as dedup_connected_components."""
    # No fan-out: this load only feeds the final semi-join projection
    # (the shingle-heavy work lives inside the memoized pair set,
    # which fans out its own scan).
    docs = _t(spark, sf_dir, "documents", fan_out=False)
    pairs = _jaccard_pairs_full(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").alias("node"))
    comp = D.connected_components(nodes, pairs, node_col="node")
    keepers = comp.filter(F.col("node") == F.col("component_id")) \
        .select(F.col("node").alias("doc_id"))
    return docs.join(keepers, "doc_id", "left_semi") \
        .select("doc_id", "source",
                F.col("n_chars").cast("bigint").alias("n_chars"))


_QUALITY_SQL = f"""round(0.4 * least({_lang_score_sql(T.LANG_MARKERS['en'])} * 1.0
                     / len({_TOKS_SQL}) * 4, 1.0)
    + 0.3 * (1.0 - least(len(regexp_extract_all(text, '[.,!?;:]'))
                         * 1.0 / length(text) * 10, 1.0))
    + 0.3 * least(length(text) / 500.0, 1.0), 6)"""

_PRED_LANG_SQL = f"""CASE
    WHEN {_lang_score_sql(T.LANG_MARKERS['en'])} = greatest(
         {_lang_score_sql(T.LANG_MARKERS['en'])},
         {_lang_score_sql(T.LANG_MARKERS['de'])},
         {_lang_score_sql(T.LANG_MARKERS['fr'])},
         {_lang_score_sql(T.LANG_MARKERS['es'])}) THEN 'en'
    WHEN {_lang_score_sql(T.LANG_MARKERS['de'])} = greatest(
         {_lang_score_sql(T.LANG_MARKERS['en'])},
         {_lang_score_sql(T.LANG_MARKERS['de'])},
         {_lang_score_sql(T.LANG_MARKERS['fr'])},
         {_lang_score_sql(T.LANG_MARKERS['es'])}) THEN 'de'
    WHEN {_lang_score_sql(T.LANG_MARKERS['fr'])} = greatest(
         {_lang_score_sql(T.LANG_MARKERS['en'])},
         {_lang_score_sql(T.LANG_MARKERS['de'])},
         {_lang_score_sql(T.LANG_MARKERS['fr'])},
         {_lang_score_sql(T.LANG_MARKERS['es'])}) THEN 'fr'
    ELSE 'es' END"""


@register("corpus_curate", sql=f"""
WITH RECURSIVE base AS (
    SELECT doc_id, lang, text, n_chars,
           {_QUALITY_SQL} AS quality,
           {_PRED_LANG_SQL} AS pred_lang,
           md5({_NORM_SQL}) AS fp
    FROM documents
    WHERE {_QUALITY_SQL} >= 0.45
), exact_keep AS (
    SELECT min(doc_id) AS doc_id FROM base GROUP BY fp
), surv AS (
    SELECT b.* FROM base b JOIN exact_keep e ON e.doc_id = b.doc_id
), sh AS (
    SELECT doc_id, unnest(list_distinct({_TRIGRAMS_SQL})) AS shingle
    FROM surv
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1
), inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
), pairs AS (
    SELECT id_a, id_b
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.8
), edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION ALL SELECT id_b AS u, id_a AS v FROM pairs
), reach(n, l) AS (
    SELECT doc_id, doc_id FROM surv
    UNION
    SELECT e.u, r.l FROM edges e JOIN reach r ON r.n = e.v
), comp AS (
    SELECT n AS doc_id, min(l) AS component_id FROM reach GROUP BY n
)
SELECT s.doc_id, s.lang, s.pred_lang, s.quality,
       CAST(s.n_chars AS BIGINT) AS n_chars
FROM surv s JOIN comp c ON c.doc_id = s.doc_id
WHERE c.doc_id = c.component_id
""")
def q_corpus_curate(spark, sf_dir):
    """The flagship training-data curation pipeline, end to end:
    quality filter (stopword density + punctuation sanity + length
    saturation, >= 0.45) -> exact dedup (min doc_id per normalized-
    content md5 fingerprint; shuffles fingerprints, not bodies) ->
    near-dup canonicalization (trigram Jaccard >= 0.8 pairs via
    prefix filtering -> connected components -> keep the minimum-id
    member) -> curated corpus with language prediction attached.

    Every stage is an independently-oracled operator elsewhere in the
    registry; this query proves they compose into the one job a 100-TB
    corpus build actually runs.  All stages before the pair join are
    narrow (filter/projection over one scan); the heavy lifting
    shuffles only fingerprints, shingle prefixes, and doc-id edges —
    never document bodies."""
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")
    base = (
        docs.withColumn("quality", T.quality_score(text, F.length(text)))
        .filter(F.col("quality") >= 0.45)
        .withColumn("fp", T.fingerprint_md5(text))
    )
    exact_keep = base.groupBy("fp").agg(F.min("doc_id").alias("doc_id")) \
        .select("doc_id")
    # The survivor frame feeds four consumers (two pair-restriction
    # semi-joins, the CC node set, and the final output join): persist
    # it so the quality + fingerprint + exact-dedup pipeline runs once,
    # not once per CC driver action.
    from pyspark.storagelevel import StorageLevel
    surv = base.join(exact_keep, "doc_id", "left_semi") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    # Jaccard is pair-local: survivor pairs == the (shared, memoized)
    # full-corpus pair set restricted to survivor endpoints.
    surv_ids = surv.select("doc_id")
    full_pairs = _jaccard_pairs_full(spark, sf_dir)
    pairs = (
        full_pairs
        .join(surv_ids.withColumnRenamed("doc_id", "id_a"), "id_a",
              "left_semi")
        .join(surv_ids.withColumnRenamed("doc_id", "id_b"), "id_b",
              "left_semi")
        .select("id_a", "id_b")
    )
    nodes = surv.select(F.col("doc_id").alias("node"))
    comp = D.connected_components(nodes, pairs, node_col="node")
    keepers = comp.filter(F.col("node") == F.col("component_id")) \
        .select(F.col("node").alias("doc_id"))
    return surv.join(keepers, "doc_id", "left_semi") \
        .select("doc_id", "lang",
                T.predicted_language(text).alias("pred_lang"),
                "quality",
                F.col("n_chars").cast("bigint").alias("n_chars"))


@register("dedup_simhash", sql=f"""
WITH toks AS (
    SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
), vals AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(tok), 1, 4)) AS INTEGER) AS v
    FROM toks
), bits AS (
    SELECT doc_id, j,
           SUM(CASE WHEN (v >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
    FROM vals, generate_series(0, 15) t(j)
    GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << j)
                     ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY 1
""")
def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash per document (token-multiplicity sign-sum)."""
    return D.simhash16(_t(spark, sf_dir, "documents"), "doc_id", "text")


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_COS_SQL = """
round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
      (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                             CAST(e.embedding AS DOUBLE[]))) *
       sqrt(list_dot_product(q.qe, q.qe))), 6)
"""


@register("embed_cosine_topk", sql=f"""
WITH q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id, {_COS_SQL} AS cos_sim
FROM embeddings e, q
WHERE e.vec_id != 0
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
""")
def q_embed_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast query vector, JVM-side
    zip_with/aggregate fold, TakeOrdered top-k — the ANN baseline."""
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"))
    others = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding")
    return S.cosine_topk(others, query, k=10)


@register("embed_ann_bucketed", sql=f"""
WITH bucketed AS (
    SELECT vec_id, embedding,
           CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
              + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
              + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
              + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
             AS BIGINT) AS bucket
    FROM embeddings
), q AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qe, bucket
    FROM bucketed WHERE vec_id = 0
)
SELECT e.vec_id, e.bucket, {_COS_SQL} AS cos_sim
FROM bucketed e JOIN q ON e.bucket = q.bucket
ORDER BY cos_sim DESC, e.vec_id
LIMIT 5
""")
def q_embed_ann_bucketed(spark, sf_dir):
    """IVF-style bucketed ANN: sign-bit coarse quantizer, probe scans
    only the query's bucket (partition-prunable at scale)."""
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"))
    return S.ann_bucketed_topk(emb, query, k=5, n_bits=4)


@register("embed_ann_multiprobe", sql=f"""
WITH bucketed AS (
    SELECT vec_id, embedding,
           CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
              + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
              + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
              + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
             AS BIGINT) AS bucket
    FROM embeddings
), q0 AS (
    SELECT CAST(embedding AS DOUBLE[]) AS qe, bucket
    FROM bucketed WHERE vec_id = 0
), q AS (
    SELECT qe, bucket FROM q0
    UNION ALL
    SELECT qe, xor(bucket, CAST(1 AS BIGINT) << j)
    FROM q0, generate_series(0, 3) t(j)
)
SELECT e.vec_id, e.bucket, {_COS_SQL} AS cos_sim
FROM bucketed e JOIN q ON e.bucket = q.bucket
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
""")
def q_embed_ann_multiprobe(spark, sf_dir):
    """Multi-probe IVF ANN: probe the query's sign bucket plus its
    Hamming-1 shell, recovering near-boundary neighbors single-probe
    misses at (1+n_bits)/2^n_bits of the scan cost."""
    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"))
    return S.ann_multiprobe_topk(emb, query, k=10, n_bits=4)


def planted_clusters(emb, n_clusters: int = 8, eps: float = 0.1):
    """Well-separated planted-clusters fixture: shrink each embedding
    to an ``eps``-ball and shift it onto the one-hot axis of its
    cluster (``vec_id % n_clusters``).  Same-cluster cosine ≈ 1,
    cross-cluster ≈ 0, so exact top-k provably stays inside the
    query's cluster — which makes the exact-cosine SQL a valid oracle
    for the IVF path (kmeans seeds = vec_ids 1..8 cover all 8
    clusters, so Lloyd converges onto the planted centers)."""
    e = F.col("embedding").cast("array<double>")
    # Norm hoisted into its own projection: referenced inside the
    # transform lambda it would be re-evaluated per element (O(d²)
    # interpreted — the embed_ann_ivf 351 s lesson).  The isNotNull
    # guard is the alias's SECOND reference: CollapseProject inlines a
    # single-referenced alias straight back into the lambda (undoing
    # the hoist — verified on the optimized plan), but keeps
    # multiply-referenced ones.  Same idiom as
    # similarity.with_l2_normalized.
    step = emb.select("vec_id", e.alias("__e"),
                      F.sqrt(S.dot(e, e)).alias("__nrm"))
    c = (F.col("vec_id") % n_clusters).cast("bigint")
    v = F.transform("__e", lambda x, i: x / F.col("__nrm") * F.lit(eps)
                    + F.when(i.cast("bigint") == c, F.lit(1.0))
                       .otherwise(F.lit(0.0)))
    return step.select(
        "vec_id",
        F.when(F.col("__nrm").isNotNull(), v).alias("embedding"))


_PLANT_SQL = """
    SELECT vec_id,
           list_transform(e, (x, i) ->
               x / sqrt(list_dot_product(e, e)) * CAST(0.1 AS DOUBLE)
               + CASE WHEN i - 1 = vec_id % 8 THEN CAST(1.0 AS DOUBLE)
                      ELSE CAST(0.0 AS DOUBLE) END) AS v
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings)
"""


@register("embed_ann_ivf", sql=f"""
WITH pl AS ({_PLANT_SQL}
), q AS (
    SELECT v AS qe FROM pl WHERE vec_id = 0
)
SELECT p.vec_id,
       round(list_dot_product(p.v, q.qe) /
             (sqrt(list_dot_product(p.v, p.v)) *
              sqrt(list_dot_product(q.qe, q.qe))), 6) AS cos_sim
FROM pl p, q
WHERE p.vec_id != 0
ORDER BY cos_sim DESC, p.vec_id
LIMIT 10
""")
def q_embed_ann_ivf(spark, sf_dir):
    """IVF ANN with a LEARNED coarse quantizer (spherical k-means fit
    in pure DataFrame iterations): probe the 2 nearest of 8 inverted
    lists.  Run over the planted-clusters fixture (see
    ``planted_clusters``) the IVF result EQUALS exact top-k — all true
    neighbors share the query's inverted list — so the oracle is the
    exact-cosine SQL over the same derived vectors: a full hash-match
    driver check for the ANN path, not just a recall bound.  The
    recall-vs-exact law on the raw (unplanted) embeddings stays pinned
    in tests/test_ranking_history.py."""
    corpus, cents = _ivf_model(spark, sf_dir)
    query = planted_clusters(_t(spark, sf_dir, "embeddings")) \
        .filter(F.col("vec_id") == 0) \
        .select(F.col("embedding").alias("query_vec"))
    return S.ann_ivf_topk(corpus, query, k=10, centroids=cents,
                          nprobe=2).select("vec_id", "cos_sim")


def _ivf_model(spark, sf_dir):
    """Materialized planted corpus + trained coarse quantizer, memoized
    per (session, sf_dir).

    Two scale lessons in one place: (a) model TRAINING is a one-time
    ingest cost, not a per-query cost — at 100 TB the centroids are fit
    once on a sample and the bucket column is written at ingest, so
    per-session memoization is the honest local analogue; (b) the
    planted-clusters derivation must be MATERIALIZED before the argmax
    ever sees it — ``nearest_centroid``'s transform lambda re-evaluates
    its vector argument once per centroid per row, and interpreted
    higher-order lambdas over a derived O(d)-per-element expression
    turn the probe into an O(k·d²) pass (this exact shape measured
    351 s at sf0.1 before the rework)."""
    from pyspark.storagelevel import StorageLevel

    from .session import session_memo

    def build():
        emb = planted_clusters(_t(spark, sf_dir, "embeddings"))
        corpus = emb.filter(F.col("vec_id") != 0) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        cents = S.kmeans_fit(corpus, k=8, n_iter=3)
        return corpus, cents

    return session_memo(spark, f"ivf_model:{sf_dir}", build)


@register("dedup_embed_neardup", sql="""
WITH corpus AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000,
           list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.1)
    FROM embeddings WHERE vec_id % 10 = 0
), b AS (
    SELECT vec_id, e,
           (CASE WHEN e[1] >= 0 THEN 1 ELSE 0 END)
         + (CASE WHEN e[2] >= 0 THEN 2 ELSE 0 END)
         + (CASE WHEN e[3] >= 0 THEN 4 ELSE 0 END)
         + (CASE WHEN e[4] >= 0 THEN 8 ELSE 0 END) AS bucket
    FROM corpus
), p AS (
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           round(list_dot_product(a.e, c.e) /
                 (sqrt(list_dot_product(a.e, a.e)) *
                  sqrt(list_dot_product(c.e, c.e))), 6) AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
)
SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.9
""")
def q_dedup_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup: sign-bucket LSH self-join + cosine
    threshold.  The corpus plants scale-invariant copies (1.1×v for
    every 10th vector) so the planted pairs — and only they, the
    background max cosine is ~0.55 — must surface at cos≥0.9."""
    emb = _t(spark, sf_dir, "embeddings", fan_out=True)
    base = emb.select("vec_id",
                      F.col("embedding").cast("array<double>")
                       .alias("embedding"))
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x * 1.1).alias("embedding"))
    # n_bits PINNED (not "auto"): the DuckDB oracle above hardcodes
    # the 4-bit bucket formula, so the grid must stay closed-form.
    # Lifted callers get the operator's auto-sizing default — the
    # measured scale-safe rule (auto_sign_bits); the sf1.0 sweep
    # showed the fixed grid is the suite's worst quadratic (24.5×
    # wall at a 10× data step) while auto re-sizes result-identically.
    return S.embed_near_dup_pairs(base.unionByName(planted),
                                  threshold=0.9, n_bits=4)


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------

_META_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum,
       CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1
           AS width,
       CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1
           AS height,
       CAST(concat('0x', substr(md5(text), 9, 2)) AS BIGINT) % 30 + 1
           AS n_frames
FROM documents
"""


@register("multimodal_binary_meta", sql=_META_SQL)
def q_multimodal_binary_meta(spark, sf_dir):
    """Binary-column metadata, pure JVM expression path (octet_length /
    md5 / hex-parse over the payload bytes)."""
    d = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.binary_meta(d)


@register("multimodal_decode_stub", sql="""
SELECT doc_id,
       CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1
           AS width,
       CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1
           AS height,
       CAST(concat('0x', substr(md5(text), 9, 2)) AS BIGINT) % 30 + 1
           AS n_frames,
       md5(text) AS checksum
FROM documents
""")
def q_multimodal_decode_stub(spark, sf_dir):
    """Arrow-batched decode plumbing (mapInPandas over binary payloads)
    with the deterministic stub kernel — the oracle checks the full
    Python round trip byte-for-byte."""
    d = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.decode_stub(d)


@register("multimodal_frame_sample", sql="""
WITH meta AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(text), 9, 2)) AS BIGINT) % 30 + 1
               AS n_frames
    FROM documents
)
SELECT doc_id, n_frames,
       CAST(unnest(generate_series(0, n_frames - 1, 5)) AS BIGINT)
           AS frame_idx
FROM meta
""")
def q_multimodal_frame_sample(spark, sf_dir):
    """Frame sampling: one row per sampled frame index (every 5th up
    to the stub decoder's n_frames) — the row-explosion shape a video
    keyframe extractor produces, JVM-side."""
    d = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.frame_sample(d, every=5)


@register("multimodal_resize_stub", sql="""
WITH meta AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1920 + 1
               AS width,
           CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1080 + 1
               AS height
    FROM documents
), scaled AS (
    SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS scale FROM meta
)
SELECT doc_id, width, height,
       greatest(CAST(floor(width * scale) AS BIGINT), 1) AS out_width,
       greatest(CAST(floor(height * scale) AS BIGINT), 1) AS out_height
FROM scaled
""")
def q_multimodal_resize_stub(spark, sf_dir):
    """Aspect-preserving resize-to-fit plumbing via mapInPandas; the
    oracle recomputes the Python kernel's arithmetic in SQL, checking
    the Arrow round trip end-to-end."""
    d = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.resize_stub(d, max_side=256)


@register("multimodal_feature_stub", sql="""
SELECT doc_id, CAST(j AS BIGINT) AS dim,
       CAST(concat('0x', substr(md5(text), 4 * j + 1, 4)) AS BIGINT)
           / 32768.0 - 1.0 AS value
FROM documents, generate_series(0, 7) AS t(j)
""")
def q_multimodal_feature_stub(spark, sf_dir):
    """Feature-extraction plumbing (mapInPandas payload -> fixed-dim
    vector, stub kernel), unnested to scalar rows so the oracle checks
    every dimension value through the Arrow round trip."""
    d = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    feats = M.feature_extract_stub(d)
    return feats.select(
        "doc_id", F.posexplode("feature").alias("dim", "value")) \
        .withColumn("dim", F.col("dim").cast("bigint"))


# --------------------------------------------------------------------------
# Events: sessionization + windowed aggregation (+ streaming parity)
# --------------------------------------------------------------------------

@register("event_sessionize", sql="""
WITH x AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events
), y AS (
    SELECT user_id, event_id, us,
           CASE WHEN lag(us) OVER w IS NULL
                  OR us - lag(us) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM x
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id, event_id,
       CAST(SUM(new_sess) OVER (
            PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
FROM y
""")
def q_event_sessionize(spark, sf_dir):
    """Sessionization: 30-min-gap session ids via lag + running sum —
    one shuffle on user_id, then narrow window arithmetic."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = F.when(
        F.lag(us).over(w).isNull() |
        ((us - F.lag(us).over(w)) > 30 * 60 * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    return (
        e.select("user_id", "event_id", "ts",
                 new_sess.alias("new_sess"))
        .withColumn("session_id",
                    F.sum("new_sess").over(wsum).cast("bigint"))
        .select("user_id", "event_id", "session_id")
    )


@register("asof_join_events", sql="""
WITH clicks AS (
    SELECT user_id, ts, max(value) AS click_value
    FROM events WHERE event_type = 'click' GROUP BY 1, 2
), purchases AS (
    SELECT user_id, event_id, ts, value FROM events
    WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, p.value,
       epoch_us(CAST(c.ts AS TIMESTAMP)) AS matched_us,
       c.click_value
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts > c.ts
""")
def q_asof_join_events(spark, sf_dir):
    """As-of join (operator Spark lacks; composed union+window, one
    shuffle): each purchase gets the user's most recent strictly
    earlier click value.  Oracle is DuckDB's native ASOF LEFT JOIN."""
    from .operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = (e.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("value").alias("click_value")))
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", "event_id", "ts", "value"))
    out = asof_join(purchases, clicks, ["user_id"],
                    right_vals=["click_value"], strict=True)
    return out.select(
        "user_id", "event_id", "value",
        F.unix_micros(F.col("matched_ts")).alias("matched_us"),
        "click_value")


@register("value_percentiles", sql="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""")
def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    ANSI percentile_cont ≡ DuckDB quantile_cont).  At 100 TB switch to
    approx_percentile (t-digest sketch, map-side combinable) — exact
    percentile shuffles the values; the sketch shuffles KBs."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(*[F.round(F.percentile("value", p), 6).alias(n)
               for n, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))])
    )


_WINDOWED_AGG_SQL = """
SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


@register("windowed_event_agg", sql=_WINDOWED_AGG_SQL)
def q_windowed_event_agg(spark, sf_dir):
    """Tumbling 1-hour window aggregation (batch form)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "total_value")
    )


@register("stream_windowed_agg", sql=_WINDOWED_AGG_SQL)
def q_stream_windowed_agg(spark, sf_dir):
    """Structured Streaming parity: the same tumbling-window agg run as
    an availableNow stream (watermark + complete output) must equal
    the batch answer — checked against the same oracle."""
    from .streaming.windowed import stream_windowed_event_agg
    return stream_windowed_event_agg(spark, sf_dir)


@register("stream_enrich_events", sql="""
SELECT e.event_id, e.event_type, c.c_name, c.c_mktsegment, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""")
def q_stream_enrich_events(spark, sf_dir):
    """Stream-static broadcast enrichment run availableNow: stateless
    per-micro-batch dim join, no stream-side shuffle; final table
    equals the batch join (the oracle)."""
    from .streaming.windowed import stream_static_enrich
    return stream_static_enrich(spark, sf_dir)


from .operators.ranking import bm25_oracle_sql  # noqa: E402

_BM25_TERMS = ("spark", "dup", "batch")


@register("text_bm25_topk",
          sql=bm25_oracle_sql(_BM25_TERMS, 20, _NORM_SQL))
def q_text_bm25_topk(spark, sf_dir):
    """BM25 relevance top-k (rational-idf variant): two full scans,
    zero keyed shuffles — per-term tf is an array fold per row, corpus
    stats are ONE scalar aggregate broadcast back onto the scan."""
    from .operators.ranking import bm25_topk
    d = _t(spark, sf_dir, "documents", fan_out=True)
    return bm25_topk(d, list(_BM25_TERMS), 20)


@register("scd2_event_history", sql="""
WITH x AS (
    SELECT user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
    FROM events
), y AS (
    SELECT user_id, event_type, us, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS new_run
    FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), z AS (
    SELECT user_id, event_type, us,
           SUM(new_run) OVER (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
    FROM y
), r AS (
    SELECT user_id, min(event_type) AS event_type, run,
           min(us) AS valid_from_us,
           count(*) AS n_changes
    FROM z GROUP BY user_id, run
)
SELECT user_id, event_type, valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us,
       lead(valid_from_us) OVER w2 IS NULL AS is_current,
       n_changes
FROM r WINDOW w2 AS (PARTITION BY user_id ORDER BY run)
""")
def q_scd2_event_history(spark, sf_dir):
    """SCD Type 2 dimension history from the event feed: consecutive
    equal event_type runs per user collapse to validity intervals.
    One shuffle on the key, then narrow window arithmetic."""
    from .operators.history import scd2_intervals
    e = _t(spark, sf_dir, "events")
    out = scd2_intervals(e, "user_id", "event_type", "ts", "event_id")
    return out.select(
        "user_id", "event_type",
        F.unix_micros(F.col("valid_from")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_to")).alias("valid_to_us"),
        "is_current", "n_changes")


@register("stream_interval_join", sql="""
SELECT p.user_id, p.event_id AS purchase_id,
       epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_us,
       c.value AS click_value
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 6 HOUR
""")
def q_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (watermarked both sides, bounded
    state): purchases x clicks by the same user within the prior 6 h,
    run availableNow; equals the batch interval join (the oracle)."""
    from .streaming.windowed import stream_stream_interval_join
    return stream_stream_interval_join(spark, sf_dir)


@register("stream_sessionize", sql="""
WITH x AS (
    SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events
), flags AS (
    SELECT user_id, event_id, us,
           CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM x WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), runs AS (
    SELECT user_id, us,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM flags
), sess AS (
    SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM runs GROUP BY user_id, sid
)
SELECT user_id, start_us, end_us, n_events
FROM sess
WHERE end_us + 1800000000 < (SELECT max(end_us) FROM sess)
""")
def q_stream_sessionize(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user 30-min-gap sessionization with event-time timeouts.

    The oracle is exact, not approximate: the operator's emit rule is
    deterministic — a session is emitted iff it is CLOSED by the final
    watermark (= the global max event time).  Sessions closed in-batch
    always satisfy ``end + gap < max(us)`` (their same-user successor
    event proves it); sessions closed by event-time timeout satisfy it
    by watermark semantics; the still-open tail sessions are withheld,
    which the oracle's WHERE reproduces.  The same law is pinned
    batch-vs-stream in tests/test_nested_and_streaming.py."""
    from .streaming.windowed import stream_sessionize
    return stream_sessionize(spark, sf_dir)


# --------------------------------------------------------------------------
# Training-data curation, part 2: decontamination, PII, repetition,
# chunking, packing — plus event funnel / retention analytics.
# --------------------------------------------------------------------------

# Distinct-trigram list (the per-document shingle set, in-row).
_TRIGRAMS_DISTINCT_SQL = f"list_distinct({_TRIGRAMS_SQL})"


@register("text_decontaminate", sql=f"""
WITH tr AS (
    SELECT doc_id, {_TRIGRAMS_DISTINCT_SQL} AS gs
    FROM documents WHERE doc_id % 23 <> 0
), ev AS (
    SELECT DISTINCT unnest({_TRIGRAMS_DISTINCT_SQL}) AS gram
    FROM documents WHERE doc_id % 23 = 0
), g AS (
    SELECT doc_id, unnest(gs) AS gram FROM tr
), hits AS (
    SELECT doc_id, count(*) AS n_hit FROM g JOIN ev USING (gram)
    GROUP BY doc_id
), scored AS (
    SELECT tr.doc_id,
           CAST(len(tr.gs) AS BIGINT) AS n_grams,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN len(tr.gs) > 0
                THEN round(coalesce(h.n_hit, 0) * 1.0 / len(tr.gs), 6)
                ELSE 0.0 END AS contamination_ratio
    FROM tr LEFT JOIN hits h USING (doc_id)
)
SELECT doc_id, n_grams, n_contaminated, contamination_ratio,
       CAST(contamination_ratio >= 0.2 AS INT) AS contaminated
FROM scored
""")
def q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: word-trigram overlap of every
    training document against a held-out eval slice (doc_id % 23 == 0
    stands in for the benchmark corpus).  Eval gram set is broadcast;
    the training side never shuffles for the membership probe (see
    operators/dedup.py:contamination_stats for the 100 TB notes)."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 23 != 0)
    ev = docs.filter(F.col("doc_id") % 23 == 0)
    out = D.contamination_stats(train, ev, "doc_id", "text", n=3,
                                flag_threshold=0.2)
    return out.withColumn("contaminated",
                          F.col("contaminated").cast("int"))


def _pii_redact_sql(inner: str) -> str:
    out = inner
    for tag, pat in T.PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out


@register("text_pii_redact", sql=f"""
WITH i AS (
    SELECT doc_id, text || CASE CAST(doc_id % 10 AS INT)
        WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com'
        WHEN 1 THEN ' call 555-123-4567'
        WHEN 2 THEN ' ssn 123-45-6789'
        WHEN 3 THEN ' host 10.0.0.3 down'
        ELSE '' END AS inj
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(inj, '{T.PII_PATTERNS[0][1]}')) AS BIGINT)
           AS n_email,
       CAST(len(regexp_extract_all(inj, '{T.PII_PATTERNS[1][1]}')) AS BIGINT)
           AS n_ssn,
       CAST(len(regexp_extract_all(inj, '{T.PII_PATTERNS[2][1]}')) AS BIGINT)
           AS n_phone,
       CAST(len(regexp_extract_all(inj, '{T.PII_PATTERNS[3][1]}')) AS BIGINT)
           AS n_ip,
       {_pii_redact_sql('inj')} AS clean_text
FROM i
""")
def q_text_pii_redact(spark, sf_dir):
    """PII detection + redaction: deterministic synthetic PII is
    injected (so the op provably fires), then counted and replaced by
    category tags.  Four JVM regexp passes inside whole-stage codegen;
    patterns live in the RE2 ∩ java.util.regex common subset so the
    DuckDB oracle compiles the identical automaton."""
    docs = _t(spark, sf_dir, "documents", fan_out=True)
    m = F.col("doc_id") % 10
    inj = F.concat(
        F.col("text"),
        F.when(m == 0, F.concat(F.lit(" contact user"),
                                F.col("doc_id").cast("string"),
                                F.lit("@example.com")))
         .when(m == 1, F.lit(" call 555-123-4567"))
         .when(m == 2, F.lit(" ssn 123-45-6789"))
         .when(m == 3, F.lit(" host 10.0.0.3 down"))
         .otherwise(F.lit("")))
    base = docs.select("doc_id", inj.alias("__inj"))
    c = T.pii_counts(F.col("__inj"))
    return base.select(
        "doc_id",
        c["[EMAIL]"].alias("n_email"),
        c["[SSN]"].alias("n_ssn"),
        c["[PHONE]"].alias("n_phone"),
        c["[IP]"].alias("n_ip"),
        T.redact_pii(F.col("__inj")).alias("clean_text"))


@register("text_repetition", sql=f"""
WITH b AS (
    SELECT doc_id, {_TOKS_SQL} AS ws, {_TRIGRAMS_SQL} AS gs
    FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
       round(len(list_distinct(ws)) * 1.0 / len(ws), 6) AS distinct_ratio,
       round(list_max(list_transform(list_distinct(ws),
             w -> len(list_filter(ws, x -> x = w)))) * 1.0 / len(ws), 6)
           AS top_token_frac,
       CASE WHEN len(gs) > 0
            THEN round(1.0 - len(list_distinct(gs)) * 1.0 / len(gs), 6)
            ELSE 0.0 END AS dup_trigram_frac
FROM b
""")
def q_text_repetition(spark, sf_dir):
    """Intra-document repetition metrics (the 'repetitive doc' quality
    gate): distinct-token ratio, most-frequent-token share, duplicate
    trigram fraction.  All computed in-row from the token array —
    no explode, no shuffle; O(d·n) per doc is the right trade for
    short documents at 100 TB (bytes stream once through codegen)."""
    docs = _t(spark, sf_dir, "documents", fan_out=True)
    base = docs.select("doc_id",
                       T.tokens(F.col("text")).alias("__tk"))
    tk = F.col("__tk")
    gs = T.word_ngrams_array(tk, 3)
    n_tok = F.size(tk).cast("bigint")
    n_dist = F.size(F.array_distinct(tk)).cast("bigint")
    dup_tri = F.when(
        F.size(gs) > 0,
        F.round(F.lit(1.0) -
                F.size(F.array_distinct(gs)).cast("double") / F.size(gs), 6)
    ).otherwise(F.lit(0.0))
    return base.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dist.alias("n_distinct"),
        F.round(n_dist.cast("double") / n_tok, 6).alias("distinct_ratio"),
        T.top_token_fraction(tk).alias("top_token_frac"),
        dup_tri.alias("dup_trigram_frac"))


@register("doc_chunk", sql=f"""
WITH b AS (
    SELECT doc_id, {_TOKS_SQL} AS ws FROM documents
)
SELECT doc_id,
       CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
       array_to_string(ws[s:s+31], ' ') AS chunk_text,
       CAST(least(32, len(ws) - s + 1) AS BIGINT) AS n_chunk_tokens
FROM b, LATERAL (SELECT unnest(generate_series(1, len(ws), 24)) AS s)
""")
def q_doc_chunk(spark, sf_dir):
    """Fixed-size document chunking with overlap (context-window prep):
    32-token windows every 24 tokens (8-token overlap).  Chunk starts
    are a narrow in-row sequence + posexplode — rows fan out ~n/24×
    with zero shuffle, the embarrassingly-parallel shape."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", T.tokens(F.col("text")).alias("__tk"))
    starts = T.chunk_starts(F.col("__tk"), stride=24)
    return base.select(
        "doc_id", F.col("__tk"),
        F.posexplode(starts).alias("chunk_id", "s"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.array_join(F.slice("__tk", F.col("s"), 32), " ")
         .alias("chunk_text"),
        F.least(F.lit(32), F.size("__tk") - F.col("s") + 1)
         .cast("bigint").alias("n_chunk_tokens"))


@register("seq_pack", sql=f"""
WITH d AS (
    SELECT doc_id, source, len({_TOKS_SQL}) AS n_tok FROM documents
), packed AS (
    SELECT source, doc_id, n_tok,
           CAST((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_tok) // 256 AS BIGINT)
               AS bin_id
    FROM d
)
SELECT source, bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(min(doc_id) AS BIGINT) AS first_doc,
       CAST(max(doc_id) AS BIGINT) AS last_doc
FROM packed
GROUP BY source, bin_id
""")
def q_seq_pack(spark, sf_dir):
    """Greedy sequence packing into ~256-token training bins, the
    'concat-and-chunk' variant: docs are packed in id order within
    each source shard; a doc whose tokens start before a bin boundary
    joins that bin (bins may overflow, never split a doc's start).
    Window semantics = one shuffle on source; per-shard packing (not a
    global order) is deliberate — a global ORDER BY would serialize on
    one partition at 100 TB, per-shard is how packing runs in real
    pipelines."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source",
                    F.size(T.tokens(F.col("text"))).alias("n_tok"))
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = d.withColumn(
        "bin_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 256)
         .cast("bigint"))
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"))


@register("events_funnel", sql="""
WITH u AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
           min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
    FROM events GROUP BY user_id
)
SELECT CAST(count(tv) AS BIGINT) AS n_view,
       CAST(count(CASE WHEN tc > tv THEN 1 END) AS BIGINT) AS n_view_click,
       CAST(count(CASE WHEN tc > tv AND tp > tc THEN 1 END) AS BIGINT)
           AS n_view_click_purchase
FROM u
""")
def q_events_funnel(spark, sf_dir):
    """Ordered funnel (view → click → purchase by first-occurrence
    time): one shuffle on user_id with map-side partial min()s, then a
    single global reduce — the canonical scalable funnel shape (no
    self-joins, no per-user sorting)."""
    e = _t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
         .alias("tv"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts")))
         .alias("tc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
         .alias("tp"))
    return u.agg(
        F.count("tv").cast("bigint").alias("n_view"),
        F.count(F.when(F.col("tc") > F.col("tv"), 1))
         .cast("bigint").alias("n_view_click"),
        F.count(F.when((F.col("tc") > F.col("tv"))
                       & (F.col("tp") > F.col("tc")), 1))
         .cast("bigint").alias("n_view_click_purchase"))


@register("user_retention", sql="""
WITH f AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS d0
    FROM events GROUP BY user_id
), a AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT f.d0 AS cohort_day,
       CAST((a.d - f.d0) // 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
""")
def q_user_retention(spark, sf_dir):
    """Cohort retention: users bucketed by first-seen day, counted per
    week offset they return in.  Both aggregations and the join key on
    user_id — the first groupBy's hash partitioning is reused by the
    join (one logical shuffle family), then a small (cohort, offset)
    reduce."""
    e = _t(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    a = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (a.join(f, "user_id")
            .groupBy(F.col("d0").alias("cohort_day"),
                     F.floor(F.datediff(F.col("d"), F.col("d0")) / 7)
                      .cast("bigint").alias("week_offset"))
            .agg(F.countDistinct("user_id").cast("bigint")
                  .alias("n_users")))


# --------------------------------------------------------------------------
# CDC merge, balanced sampling, vocabulary induction
# --------------------------------------------------------------------------

from .operators.sample import hash_bucket_sql as _hb_sql  # noqa: E402


@register("cdc_latest_state", sql="""
WITH r AS (
    SELECT user_id, event_type, value, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT user_id, event_type AS last_op, value AS last_value,
       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
FROM r WHERE rn = 1 AND event_type <> 'error'
""")
def q_cdc_latest_state(spark, sf_dir):
    """CDC merge to current state (lakehouse MERGE INTO semantics):
    last write per key wins, keys whose final op is a delete marker
    ('error' stands in) vanish.  Single (key)-window shuffle; the
    snapshot would union in as older feed rows at scale — no
    full-outer join."""
    from .operators.history import cdc_latest_state
    e = _t(spark, sf_dir, "events")
    out = cdc_latest_state(e, "user_id", "ts", "event_id",
                           F.col("event_type") == "error")
    return out.select(
        "user_id",
        F.col("event_type").alias("last_op"),
        F.col("value").alias("last_value"),
        F.unix_micros(F.col("ts")).alias("ts_us"))


@register("stratified_sample", sql=f"""
WITH k AS (
    SELECT min(cnt) AS k FROM (
        SELECT lang, count(*) AS cnt FROM documents GROUP BY lang)
), r AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
               ORDER BY {_hb_sql(['doc_id'], 'strat')}, doc_id) AS rn
    FROM documents
)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
FROM r, k WHERE rn <= k.k
""")
def q_stratified_sample(spark, sf_dir):
    """Class balancing: every language stratum downsampled to the
    smallest stratum's size by deterministic hash rank (same sample on
    any cluster/retry; random() could never be oracle-checked).  One
    window shuffle + a broadcast scalar."""
    from .operators.sample import stratified_balance
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_balance(docs, "lang", ["doc_id"], salt="strat") \
        .select("doc_id", "lang", "rn")


@register("vocab_topk", sql=f"""
WITH t AS (
    SELECT unnest({_TOKS_SQL}) AS tok FROM documents
), c AS (
    SELECT tok, count(*) AS cnt FROM t GROUP BY tok
)
SELECT tok, CAST(cnt AS BIGINT) AS cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank
FROM c ORDER BY cnt DESC, tok LIMIT 100
""")
def q_vocab_topk(spark, sf_dir):
    """Vocabulary induction: global token frequencies (map-side
    combinable wordcount over exploded tokens), top-100 with a
    deterministic tie-break.  The rank window runs over the already-
    limited 100-row result, never the full vocabulary."""
    docs = _t(spark, sf_dir, "documents")
    counts = (docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
              .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(100)
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return top.select(
        "tok", F.col("cnt").cast("bigint").alias("cnt"),
        F.row_number().over(w).cast("bigint").alias("rank"))
