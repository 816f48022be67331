"""Type coercion / null handling (SURVEY §2.4 T1-T4, §2.5 F1-F3).

The reference's contract is *tolerant repair*: unparseable numerics
become null (``cast(strict=False)``, pipeline.py:126-141), then nulls
are defaulted (``fill_null``), and join keys are force-typed even on
empty frames so anti-join key dtypes always match (the "V22 fix",
dags/etl_municipios.py:127-133).

Everything here is a JVM-side expression (whole-stage codegen) — no
Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokens that mean "no number" in the upstream feed (pipeline.py:47).
DIRTY_NUMERIC_TOKENS = ("INF", "-INF", "NaN", "")


def sanitize_numeric_tokens(col: Column,
                            tokens: Iterable[str] = DIRTY_NUMERIC_TOKENS,
                            ) -> Column:
    """F3 — map literal dirty tokens to null before casting."""
    return F.when(F.trim(col).isin(*tokens), F.lit(None)).otherwise(col)


def try_cast_columns(df: DataFrame, casts: Mapping[str, str],
                     sanitize: bool = True) -> DataFrame:
    """T1 — non-strict cast: unparseable -> null instead of error.

    ``try_cast`` keeps this correct under ANSI mode (Spark 4 default);
    with ANSI off it is equivalent to a plain cast.
    """
    exprs = {}
    for name, dtype in casts.items():
        col = F.col(name)
        if sanitize:
            col = sanitize_numeric_tokens(col)
        if dtype in ("bigint", "long", "int", "integer", "smallint",
                     "tinyint"):
            # Integer columns arrive as float-formatted strings in the
            # source feed ("-24.0", FIXTURES.md F1); route through
            # double so they repair instead of nulling out.  Genuinely
            # fractional values ("24.7") null like the reference's
            # strict=False Int64 cast — only integral doubles survive.
            d = col.try_cast("double")
            # d % 1 (not floor(d) == d): floor() returns LongType and
            # overflows under ANSI for huge doubles; % stays double and
            # also nulls NaN/Infinity for free.
            exprs[name] = F.when(d % 1 == 0, d).try_cast(dtype)
        else:
            exprs[name] = col.try_cast(dtype)
    return df.withColumns(exprs)


def fill_nulls(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """T2/T3 — per-column null defaults (reference fill_null blocks)."""
    return df.fillna(dict(defaults))


def pin_key_types(df: DataFrame, key_types: Mapping[str, str]) -> DataFrame:
    """T4 — force join-key dtypes (works on empty frames too), so both
    anti-join inputs agree without implicit coercion."""
    return df.withColumns(
        {k: F.col(k).cast(t) for k, t in key_types.items()}
    )


def normalize_string_key(col: Column) -> Column:
    """F1+F2 — lower + trim, the reference's join-key normalization
    (pipeline.py:96,101)."""
    return F.lower(F.trim(col))
