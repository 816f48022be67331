"""CSV sink (SURVEY §2.9 K1): ``;``-separated with header.

``single_file=True`` coalesces to one partition for parity with the
reference's single-file output (pipeline_manual.py:125) — only for
small exports; at scale leave it False and let each task write its
shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, sep: str = ";",
              single_file: bool = False, mode: str = "overwrite") -> None:
    out = df.coalesce(1) if single_file else df
    (
        out.write
        .option("sep", sep)
        .option("header", "true")
        .mode(mode)
        .csv(path)
    )
