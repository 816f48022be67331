"""Text-analysis operators for training-data pipelines (BASELINE.json
north star; no counterpart in the reference, which processes tabular
CAGED data only).

All hot-path expressions are JVM-side built-ins (split/regexp/filter/
md5) — no Python UDFs — so they run inside whole-stage codegen and
scale linearly with input bytes.  Determinism: every score is pure
rational arithmetic (no transcendentals whose libm rounding could
differ across platforms/engines), rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer (the baseline tokenization for quality metrics).
_WS = r"\s+"

# BPE-ish pre-tokenization: letter runs, single digits, single symbols —
# the shape GPT-style byte-pair encoders split on before merging.
BPE_PRETOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic.  Disjoint sets so the argmax is unambiguous.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "with"),
    "de": ("der", "und", "die", "das", "nicht"),
    "fr": ("le", "et", "les", "une", "pour"),
    "es": ("el", "y", "los", "una", "para"),
}
# Fixed precedence for argmax ties (first wins).
LANG_ORDER = ("en", "de", "fr", "es")

PUNCT_RE = r"[.,!?;:]"


def tokens(col: Column) -> Column:
    """Whitespace tokens of a trimmed text column."""
    return F.split(F.trim(col), _WS)


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens (regexp_count, JVM-side)."""
    return F.regexp_count(col, F.lit(BPE_PRETOKEN_RE)).cast("bigint")


def stopword_count(col: Column, words: tuple[str, ...]) -> Column:
    """Occurrences of marker words among whitespace tokens."""
    return F.size(
        F.filter(tokens(col), lambda t: t.isin(*words))
    ).cast("bigint")


def language_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_count(col, ws)
            for lang, ws in LANG_MARKERS.items()}


def predicted_language(col: Column) -> Column:
    """Argmax over language marker scores; ties resolve to the first
    language in LANG_ORDER (first-match CASE, same shape in SQL)."""
    scores = language_scores(col)
    top = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    pred = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        pred = F.when(scores[lang] == top, F.lit(lang)).otherwise(pred)
    return pred


def punct_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(PUNCT_RE)).cast("bigint")


def quality_score(col: Column, n_chars: Column) -> Column:
    """Composite quality in [0,1]: stopword density + punctuation
    sanity + length saturation.  Pure rational arithmetic."""
    n_tok = token_count(col).cast("double")
    stop_ratio = stopword_count(col, LANG_MARKERS["en"]).cast("double") / n_tok
    punct_ratio = punct_count(col).cast("double") / n_chars.cast("double")
    len_score = F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0)) +
        F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))) +
        F.lit(0.3) * len_score,
        6,
    )


def duplicate_line_fraction(col: Column, delim: str = "\n") -> Column:
    """Gopher-style WITHIN-document repetition signal: the fraction of
    a document's lines whose normalized form (lower + trim) occurs
    more than once in the SAME document — scraped pages repeating
    their own nav/footer blocks score high and get filtered.  Distinct
    from cross-document boilerplate (``dedup.remove_boilerplate_lines``
    — a corpus census); this is a pure in-row expression, no shuffle,
    O(L²) higher-order filter per doc (fine at real line counts; docs
    are pages, not books).  Empty documents score 0."""
    lines = F.transform(F.split(col, delim, -1),
                        lambda s: F.lower(F.trim(s)))
    dup = F.size(F.filter(
        lines, lambda s: F.size(F.filter(lines, lambda t: t == s)) > 1))
    n = F.size(lines)
    return F.when(n > 0,
                  F.round(dup.cast("double") / n.cast("double"), 6)) \
            .otherwise(F.lit(0.0))


def duplicate_line_char_fraction(col: Column,
                                 delim: str = "\n") -> Column:
    """The character-weighted form Gopher actually thresholds
    ("fraction of characters in duplicate lines"): one repeated
    100-char footer outweighs ten repeated empty lines.  Same in-row
    shape as :func:`duplicate_line_fraction`."""
    lines = F.transform(F.split(col, delim, -1),
                        lambda s: F.lower(F.trim(s)))
    chars_in = (
        lambda arr: F.aggregate(arr, F.lit(0.0),
                                lambda acc, s: acc + F.length(s)))
    dup_lines = F.filter(
        lines, lambda s: F.size(F.filter(lines, lambda t: t == s)) > 1)
    total = chars_in(lines)
    return F.when(total > 0,
                  F.round(chars_in(dup_lines) / total, 6)) \
            .otherwise(F.lit(0.0))


def normalized_text(col: Column) -> Column:
    """Whitespace-collapsed, lowercased canonical form (the dedup and
    fingerprint normalization)."""
    return F.lower(F.regexp_replace(F.trim(col), _WS, " "))


def fingerprint_md5(col: Column) -> Column:
    """Full document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(col))


ROLLING_BASE = 131
ROLLING_MOD = 2147483647  # 2^31-1: base*mod + 127 stays in bigint range


def rolling_hash(norm_attr: Column) -> Column:
    """Polynomial rolling hash of a (pre-materialized) normalized-text
    attribute: h = fold(h·B + ascii(c)) mod M — the classic
    Rabin-Karp document fingerprint, as a JVM-side ``aggregate`` fold
    (no shuffle, no Python).

    Pass a plain column attribute, not the normalization expression —
    a captured expression would re-evaluate per character (see
    dedup.char_shingles for the measured trap).
    """
    codes = F.transform(F.split(norm_attr, ""),
                        lambda c: F.ascii(c).cast("bigint"))
    folded = F.aggregate(
        codes, F.lit(0).cast("bigint"),
        lambda acc, x: (acc * ROLLING_BASE + x) % ROLLING_MOD)
    return F.when(F.length(norm_attr) == 0, F.lit(0).cast("bigint")) \
        .otherwise(folded)


def fingerprint64(col: Column) -> Column:
    """64-bit-ish fingerprint: first 15 hex digits (60 bits) of the md5
    as a bigint — engine-portable (conv is plain hex parsing)."""
    return F.conv(F.substring(fingerprint_md5(col), 1, 15), 16, 10) \
        .cast("bigint")


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------
# Patterns restricted to the RE2 ∩ java.util.regex common subset (no
# lookaround, no backrefs) so the Spark plan and the DuckDB oracle
# compile the same automaton.  Order matters: emails first (they
# contain dots an IP pattern could nibble), then SSN before phone
# (3-2-4 vs 3-3-4 are disjoint, but keep the more specific first).
PII_PATTERNS = (
    ("[EMAIL]", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("[SSN]", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("[PHONE]", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"),
    ("[IP]", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
)


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category PII occurrence counts (JVM regexp_count)."""
    return {tag: F.regexp_count(col, F.lit(pat)).cast("bigint")
            for tag, pat in PII_PATTERNS}


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its category tag.  A chain of four
    JVM regexp_replace calls — single pass over the bytes each, inside
    whole-stage codegen; no Python."""
    out = col
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


# --------------------------------------------------------------------------
# Intra-document repetition
# --------------------------------------------------------------------------

def word_ngrams_array(tok_attr: Column, n: int) -> Column:
    """Non-distinct word n-gram array from a pre-materialized token
    array attribute (same guard as dedup.word_shingles: <n tokens →
    empty array, never a descending sequence)."""
    return F.when(
        F.size(tok_attr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok_attr) - (n - 1)),
            lambda i: F.array_join(F.slice(tok_attr, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def top_token_fraction(tok_attr: Column) -> Column:
    """Fraction of tokens taken by the most frequent token.  Computed
    in-row (array_max over per-distinct-token filter counts): O(d·n)
    per document but narrow — no explode, no shuffle, which is the
    100 TB-friendly shape for short documents."""
    counts = F.transform(
        F.array_distinct(tok_attr),
        lambda w: F.size(F.filter(tok_attr, lambda x: x == w)))
    return F.round(F.array_max(counts).cast("double") / F.size(tok_attr), 6)


# --------------------------------------------------------------------------
# Chunking & sequence packing
# --------------------------------------------------------------------------

def chunk_starts(tok_attr: Column, stride: int) -> Column:
    """1-based chunk start offsets: 1, 1+stride, … while ≤ n_tokens."""
    return F.sequence(F.lit(1), F.size(tok_attr), F.lit(stride))
