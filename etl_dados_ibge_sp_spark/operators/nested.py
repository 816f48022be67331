"""U1 — recursive nested-document search (SURVEY §2.10).

The reference's ``diagnostico.py:8-24`` walks an arbitrarily nested
dict/list tree and prints every node whose ``Property`` equals a term.
Spark-first restatement: for *typed* nested data (struct/array
columns) we derive the explode/select plan from schema introspection —
pure Catalyst, no Python in the data path.  For ragged/untyped JSON
strings, a self-contained Python UDF does the same recursion (the one
genuinely custom operator; used only off the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def find_paths(schema: T.DataType, field: str,
               prefix: str = "") -> list[str]:
    """All dotted paths under ``schema`` whose leaf name == field.
    Array steps are marked with ``[]`` (each needs an explode)."""
    out: list[str] = []
    if isinstance(schema, T.StructType):
        for f in schema.fields:
            path = f"{prefix}.{f.name}" if prefix else f.name
            if f.name == field:
                out.append(path)
            out.extend(find_paths(f.dataType, field, path))
    elif isinstance(schema, T.ArrayType):
        out.extend(find_paths(schema.elementType, field, prefix + "[]"))
    return out


def search_nested(df: DataFrame, col: str, field: str,
                  term) -> DataFrame:
    """Rows where any node named ``field`` (at any depth under struct
    column ``col``) equals ``term``; adds ``match_path`` with the
    dotted path that matched.

    The plan is a union of per-path filters; each array along a path
    becomes an ``exists()`` higher-order predicate (JVM-side, no
    explode materialization, no Python).
    """
    paths = find_paths(df.schema[col].dataType, field)
    if not paths:
        return df.limit(0).withColumn("match_path", F.lit(""))

    def path_predicate(path: str) -> Column:
        # "a.b[].c" -> getField chain with an exists() per array step.
        def rec(cur: Column, segments: list[str]) -> Column:
            head, *tail = segments
            for part in head.strip(".").split("."):
                if part:
                    cur = cur.getField(part)
            if not tail:
                return cur == F.lit(term)
            return F.exists(cur, lambda x: rec(x, tail))

        return rec(F.col(col), path.split("[]"))

    out = None
    for p in paths:
        part = df.filter(path_predicate(p)) \
            .withColumn("match_path", F.lit(f"{col}.{p}"))
        out = part if out is None else out.unionByName(part)
    return out


def search_json_udf(df: DataFrame, json_col: str, field: str,
                    term) -> DataFrame:
    """Ragged-JSON fallback: recursive walk inside a self-contained
    Python UDF returning the list of matching paths (empty -> no
    match).  Mirrors the reference's recursion exactly
    (diagnostico.py:8-24)."""
    @F.udf(returnType=T.ArrayType(T.StringType()))
    def walk(doc: str):
        import json as _json
        try:
            tree = _json.loads(doc) if doc else None
        except Exception:
            return []
        hits = []

        def rec(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == field and v == term:
                        hits.append(f"{path}.{k}" if path else k)
                    rec(v, f"{path}.{k}" if path else k)
            elif isinstance(node, list):
                for i, v in enumerate(node):
                    rec(v, f"{path}[{i}]")

        rec(tree, "")
        return hits

    return (
        df.withColumn("match_paths", walk(F.col(json_col)))
        .filter(F.size("match_paths") > 0)
    )
