"""Fixed-width-file reader as a Spark 4 **Python DataSource**.

Government statistical agencies (the reference pipeline's domain —
IBGE census/municipality dumps) publish fixed-width layouts: every
record is one line, every column a byte slice, no delimiter at all.
Spark has no built-in reader for them; the pre-Spark-4 workaround
(`spark.read.text` + a stack of `substring` projections) forces every
layout to be wired by hand at every call site.  The Python DataSource
API (SPARK-44076, Spark 4.0+) lets the engine expose `format("fwf")`
instead, with the layout as an option — registered once per session
via :func:`register_fwf`.

Design for scale:

* one :class:`InputPartition` per file — a directory of dump files
  reads with file-level parallelism exactly like the built-in text
  source (single giant files should be split upstream; fixed-width
  dumps are shipped per-UF/per-year in practice);
* the reader yields rows straight off a streaming line iterator —
  no whole-file buffering, O(1) memory per partition;
* parsing is PERMISSIVE in the reference's spirit (pipeline.py's
  tolerant numeric repair): a slice that fails its declared type
  yields NULL, never a task failure, and short lines yield NULL for
  columns past the end.

Layout option (``colspec``): comma-separated ``name:start:end[:type]``
with 0-based, end-exclusive offsets — CHARACTER offsets on the decoded
line by default; pass ``offsets=byte`` for layouts specified in byte
positions (each field's bytes are then decoded independently, the
faithful mode for legacy single-byte-encoding dumps).  E.g.::

    spark.read.format("fwf")
         .option("colspec", "cod:0:7:int,nome:7:37:string,pop:37:46:int")
         .load("/data/municipios_fwf/")

Types: string (default) | int | bigint | double.  Unknown types are
rejected at schema time (fail fast on the driver, not per task).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

_TYPES = {
    "string": StringType(),
    "int": IntegerType(),
    "bigint": LongType(),
    "double": DoubleType(),
}


def _parse_colspec(spec: str) -> list[tuple[str, int, int, str]]:
    cols: list[tuple[str, int, int, str]] = []
    for part in spec.split(","):
        bits = part.strip().split(":")
        if len(bits) == 3:
            name, start, end = bits
            typ = "string"
        elif len(bits) == 4:
            name, start, end, typ = bits
        else:
            raise ValueError(
                f"fwf colspec entry {part!r}: want name:start:end[:type]")
        if typ not in _TYPES:
            raise ValueError(
                f"fwf colspec entry {part!r}: unknown type {typ!r} "
                f"(one of {sorted(_TYPES)})")
        s, e = int(start), int(end)
        if not (0 <= s < e):
            raise ValueError(
                f"fwf colspec entry {part!r}: need 0 <= start < end")
        cols.append((name, s, e, typ))
    if not cols:
        raise ValueError("fwf: empty colspec")
    return cols


_INT_MIN, _INT_MAX = -(2 ** 31), 2 ** 31 - 1
_LONG_MIN, _LONG_MAX = -(2 ** 63), 2 ** 63 - 1


def _convert(raw: str, typ: str):
    """PERMISSIVE slice -> value: strip padding; NULL on cast failure,
    empty slice, OR a numeric that overflows its declared type —
    Python ints are unbounded but Arrow enforces the schema, so an
    out-of-range value must become NULL here, never a task failure
    (mirrors the reference's tolerant numeric repair; a malformed
    record must not kill a 100-TB job)."""
    v = raw.strip()
    if not v:
        return None
    if typ == "string":
        return v
    try:
        if typ == "double":
            return float(v)
        n = int(v)
    except ValueError:
        return None
    lo, hi = (_INT_MIN, _INT_MAX) if typ == "int" else \
        (_LONG_MIN, _LONG_MAX)
    return n if lo <= n <= hi else None


class FwfReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("fwf: .load(path) is required")
        if "://" in path:
            # This reader walks the filesystem with os.listdir/open on
            # driver AND executors — it only works on a path visible to
            # every node (local[...] or a shared mount).  Rejecting
            # hdfs://, s3://, etc. here beats each task dying with a
            # confusing FileNotFoundError.
            raise ValueError(
                f"fwf: {path!r} — URI schemes are not supported; this "
                "source reads local/shared-filesystem paths only")
        self.path = path
        self.cols = _parse_colspec(options.get("colspec", ""))
        self.encoding = options.get("encoding", "utf-8")
        offsets = options.get("offsets", "char")
        if offsets not in ("char", "byte"):
            raise ValueError(
                f"fwf: offsets={offsets!r} (want 'char' or 'byte')")
        self.byte_offsets = offsets == "byte"

    def partitions(self):
        # One partition per file: directory dumps read in parallel,
        # and a lost task re-reads exactly one deterministic file.
        # Plain files only — nested directories are skipped, not
        # handed to open() to die with IsADirectoryError per task.
        if os.path.isdir(self.path):
            files = sorted(
                p for f in os.listdir(self.path)
                if not f.startswith((".", "_"))
                and os.path.isfile(p := os.path.join(self.path, f)))
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"fwf: no input files under {self.path}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        cols = self.cols
        if self.byte_offsets:
            # Slice raw bytes, decode each field independently — the
            # faithful mode for layouts specified in byte positions
            # over legacy single-byte encodings (latin-1 IBGE dumps)
            # that may still contain stray multibyte content.
            with open(partition.value, "rb") as fh:
                for bline in fh:
                    bline = bline.rstrip(b"\r\n")
                    yield tuple(
                        _convert(bline[s:e].decode(self.encoding,
                                                   errors="replace"), t)
                        for _, s, e, t in cols)
            return
        with open(partition.value, encoding=self.encoding,
                  errors="replace") as fh:
            for line in fh:
                line = line.rstrip("\r\n")
                yield tuple(_convert(line[s:e], t)
                            for _, s, e, t in cols)


class FwfDataSource(DataSource):
    """``format("fwf")`` — see module docstring for the contract."""

    @classmethod
    def name(cls) -> str:
        return "fwf"

    def schema(self) -> StructType:
        return StructType([
            StructField(name, _TYPES[typ], nullable=True)
            for name, _, _, typ in _parse_colspec(
                self.options.get("colspec", ""))
        ])

    def reader(self, schema: StructType) -> FwfReader:
        return FwfReader(dict(self.options))


def register_fwf(spark) -> None:
    """Register the fwf format on this session (idempotent)."""
    spark.dataSource.register(FwfDataSource)
