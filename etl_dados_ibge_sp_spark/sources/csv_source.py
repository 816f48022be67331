"""CSV ingest with delimiter sniffing + error tolerance (SURVEY §2.1 S4-S5).

The reference tries ``;`` and falls back to ``,`` when the parse
produces <=1 column, with ``ignore_errors=True`` coercing bad cells to
null (reference pipeline.py:90-94, dags/etl_municipios.py:160-161).

The sniff reads only the header line (``limit(1)`` on a text read), so
it costs one tiny driver round-trip, not a data scan — safe at any
scale.  The actual data read is a normal parallel Spark CSV scan in
PERMISSIVE mode (bad cells -> null, the ignore_errors analogue).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _sniff_sep(spark: SparkSession, path: str,
               candidates: tuple[str, ...] = (";", ",")) -> str:
    header = spark.read.text(path).limit(1).collect()
    line = header[0].value if header else ""
    best = candidates[0]
    best_cols = 0
    for sep in candidates:
        ncols = len(line.split(sep))
        if ncols > best_cols:
            best, best_cols = sep, ncols
    return best


def read_csv_sniffed(spark: SparkSession, path: str,
                     header: bool = True,
                     infer_schema: bool = True,
                     sep: str | None = None) -> DataFrame:
    """Read a CSV whose delimiter may be ``;`` or ``,``."""
    if sep is None:
        sep = _sniff_sep(spark, path)
    return (
        spark.read
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("inferSchema", str(infer_schema).lower())
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
