"""Tolerant JSON ingest (SURVEY §2.1 S1-S3).

The reference reads the whole JSON file as text, textually replaces the
out-of-spec tokens ``"INF"`` / ``"-INF"`` / ``"NaN"`` with ``null``,
parses, and unwraps a one-key envelope dict into a record list
(reference pipeline.py:41-55, dags/etl_municipios.py:72-80).

Spark-first restatement:

* sanitize: ``spark.read.text(wholetext)`` -> ``regexp_replace`` ->
  ``from_json`` — the replace runs JVM-side on executors, so a 100 TB
  landing zone of JSON files sanitizes in parallel with no driver
  involvement.
* envelope unwrap: schema introspection picks the first wrapping key,
  then ``explode`` flattens the record array — one narrow dependency,
  no shuffle.
* schema: explicit ``StructType`` preferred; full-scan inference
  (the reference's ``infer_schema_length=None``) is the fallback.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Tokens the upstream scraper emits that JSON cannot represent
# (reference pipeline.py:47).
_DIRTY_TOKENS = ('"INF"', '"-INF"', '"NaN"')


def sanitize_json_text(col: Column) -> Column:
    """Replace non-JSON numeric tokens with null, JVM-side."""
    out = col
    for tok in _DIRTY_TOKENS:
        out = F.replace(out, F.lit(tok), F.lit("null"))
    return out


def read_sanitized_json(spark: SparkSession, path: str,
                        schema: T.StructType | str | None = None) -> DataFrame:
    """Read JSON file(s) whose bodies may contain INF/-INF/NaN tokens.

    Returns one row per input file with a single parsed column ``doc``
    (struct if a schema is given, else inferred by parsing a sanitized
    copy).  Use :func:`unwrap_envelope` to get the record rows.
    """
    raw = spark.read.option("wholetext", "true").text(path)
    clean = raw.select(sanitize_json_text(F.col("value")).alias("body"))
    if schema is None:
        # Full-scan inference, the reference's infer_schema_length=None:
        # parse once with Spark's JSON schema inference on the sanitized
        # text.  Fine for landing files; explicit schemas preferred.
        # The JVM reader's Dataset[String] overload keeps the whole
        # inference pass JVM-side (PySpark's reader only exposes the
        # RDD overload, which would bounce every body through Python).
        jds = getattr(clean._jdf, "as")(  # .as() — `as` is a py keyword
            spark._jvm.org.apache.spark.sql.Encoders.STRING())
        inferred = DataFrame(spark._jsparkSession.read().json(jds), spark)
        schema = inferred.schema if len(inferred.columns) else T.StructType()
        # Spark's JSON inference flattens a top-level array into rows;
        # from_json needs the array type back to parse the raw body.
        # Arrayness comes from an aggregated boolean (any body starts
        # with '['), not a driver fetch of a whole wholetext body.
        head = clean.select(
            F.max(F.ltrim("body").startswith("[")).alias("a")).first()
        if head is not None and head["a"]:
            schema = T.ArrayType(schema)
        # Re-express as a from_json over the sanitized column so the
        # plan below is identical in both branches.
    return clean.select(F.from_json("body", schema).alias("doc"))


def unwrap_envelope(parsed: DataFrame, col: str = "doc") -> DataFrame:
    """Envelope unwrap (S2): if the document is a struct whose first
    field holds an array of records, explode that array; if it is
    already an array, explode it directly.

    The "first key" selection is schema introspection, mirroring the
    reference's ``lista = dados[list(dados.keys())[0]]``
    (pipeline.py:51-52) without touching data on the driver.  Note
    Spark's JSON inference sorts field names, losing document key
    order, so "first key" here means: the first *array-typed* field
    (the record list the envelope wraps), falling back to the first
    field.
    """
    field = next(f for f in parsed.schema.fields if f.name == col)
    dt = field.dataType
    if isinstance(dt, T.ArrayType):
        rec = F.explode(F.col(col))
    elif isinstance(dt, T.StructType):
        wrap = next((f for f in dt.fields
                     if isinstance(f.dataType, T.ArrayType)), None)
        if wrap is not None:
            rec = F.explode(F.col(f"{col}.`{wrap.name}`"))
        else:
            rec = F.col(col)  # bare single record
    else:
        raise TypeError(f"cannot unwrap envelope of type {dt.simpleString()}")
    out = parsed.select(rec.alias("record"))
    rec_type = out.schema["record"].dataType
    if isinstance(rec_type, T.StructType):
        out = out.select("record.*")
    return out
