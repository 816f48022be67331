"""Laws for LINE-level boilerplate removal
(operators/dedup.remove_boilerplate_lines): census threshold, the
short-line guard, order-preserving reassembly, and the all-dropped
edge."""

from __future__ import annotations

from etl_dados_ibge_sp_spark.operators.dedup import (
    remove_boilerplate_lines)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = remove_boilerplate_lines(df, min_docs=3, min_chars=4, **kw)
    return {r.doc_id: (r.text_clean, r.n_kept, r.n_dropped)
            for r in out.collect()}


def test_census_threshold_and_order(spark):
    footer = "copyright footer"
    rows = [(i, f"alpha {i}\n{footer}\nomega {i}") for i in range(3)]
    rows.append((9, "unique one\nunique two"))
    got = _run(spark, rows)
    # Footer appears in 3 distinct docs -> dropped everywhere; the
    # surrounding unique lines keep their original order.
    for i in range(3):
        assert got[i] == (f"alpha {i}\nomega {i}", 2, 1)
    assert got[9] == ("unique one\nunique two", 2, 0)


def test_short_lines_are_structure_not_boilerplate(spark):
    # "- " bullets repeat everywhere but are under min_chars: kept.
    rows = [(i, f"- \nbody text {i}\n- ") for i in range(4)]
    got = _run(spark, rows)
    assert all(v == (f"- \nbody text {i}\n- ", 3, 0)
               for i, v in got.items())


def test_all_boilerplate_doc_becomes_empty(spark):
    rows = [(i, "same header line\nsame footer line") for i in range(3)]
    rows.append((9, "same header line\nplus own content"))
    got = _run(spark, rows)
    for i in range(3):
        assert got[i] == ("", 0, 2)
    assert got[9] == ("plus own content", 1, 1)


def test_normalization_is_case_and_trim_insensitive(spark):
    rows = [(0, "  Cookie Banner  \nown a"),
            (1, "cookie banner\nown b"),
            (2, "COOKIE BANNER\nown c")]
    got = _run(spark, rows)
    # Same normalized form across 3 docs -> all three variants drop.
    assert got == {0: ("own a", 1, 1), 1: ("own b", 1, 1),
                   2: ("own c", 1, 1)}


def test_duplicate_line_fractions_match_bruteforce(spark):
    """Within-document repetition signals equal a Python brute force
    on arbitrary line mixes (the Gopher repetition filters)."""
    from pyspark.sql import functions as F

    from etl_dados_ibge_sp_spark.operators.text import (
        duplicate_line_char_fraction, duplicate_line_fraction)

    texts = [
        "a\nb\nc",                        # no repetition
        "nav bar\nbody one\nnav bar",      # 2 of 3 lines duplicated
        "X\nx\n X ",                       # all dup after normalize
        "",                                # one empty line
        "only",                            # single line
        "long footer line\nz\nlong footer line\nq\nw",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i bigint, t string")
    got = {r.i: (r.f, r.cf) for r in df.select(
        "i",
        duplicate_line_fraction(F.col("t")).alias("f"),
        duplicate_line_char_fraction(F.col("t")).alias("cf")).collect()}

    for i, t in enumerate(texts):
        lines = [s.strip().lower() for s in t.split("\n")]
        dup = [s for s in lines if lines.count(s) > 1]
        f = round(len(dup) / len(lines), 6) if lines else 0.0
        tot = sum(len(s) for s in lines)
        cf = round(sum(len(s) for s in dup) / tot, 6) if tot else 0.0
        assert got[i] == (f, cf), (i, got[i], (f, cf))
