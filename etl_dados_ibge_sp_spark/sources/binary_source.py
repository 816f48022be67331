"""Opaque-file sources: binaryFile (multimodal payload ingest) and the
Avro gate.

``binaryFile`` is how image/audio/video corpora enter the pipeline:
one row per file with (path, modificationTime, length, content) —
the decode step stays in operators/multimodal (Arrow-batched
mapInPandas).  At 100 TB the reader parallelizes per-file;
``pathGlobFilter`` prunes listings without reading payloads.

Avro ships as an *external* Spark module (``spark-avro``); this
container does not deploy it, so the reader raises a clear
RuntimeError instead of Spark's opaque ClassNotFound — the graceful
degradation is pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """One row per file: (path, modificationTime, length, content)."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — requires the spark-avro external module on the
    classpath; raises RuntimeError with deployment guidance if not."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # noqa: BLE001 — AnalysisException or Py4J
        if "avro" in str(e).lower():
            raise RuntimeError(
                "spark-avro is an external module: deploy with "
                "--packages org.apache.spark:spark-avro_2.13:<version> "
                "(not bundled in this environment)") from e
        raise
