"""Laws for the fixed-width Python DataSource (sources/fwf_source):
typed slicing, PERMISSIVE nulls, per-file partitioning, and driver-side
fail-fast on bad layouts."""

from __future__ import annotations

import pytest

from etl_dados_ibge_sp_spark.sources.fwf_source import (_parse_colspec,
                                                        register_fwf)

SPEC = "cod:0:7:int,nome:7:17:string,pop:17:26:bigint,area:26:36:double"


def _line(cod: str, nome: str, pop: str, area: str) -> str:
    return f"{cod:<7.7}{nome:<10.10}{pop:<9.9}{area:<10.10}\n"


@pytest.fixture()
def fwf_dir(tmp_path):
    # Two files -> two partitions.  Lines exercise padding, short
    # lines, and malformed numerics.
    (tmp_path / "uf_35.txt").write_text(
        _line("3550308", "São Paulo", "12396372", "1521.11")
        + _line("3509502", "Campinas", "1213792", "794.43"))
    (tmp_path / "uf_33.txt").write_text(
        _line("3304557", "Rio", "6775561", "1200.33")
        + "33ABCDEBadCode   notanum\n"          # malformed + short line
    )
    return str(tmp_path)


def test_fwf_reads_typed_rows(spark, fwf_dir):
    register_fwf(spark)
    df = (spark.read.format("fwf").option("colspec", SPEC)
          .load(fwf_dir))
    assert [f.name for f in df.schema.fields] == \
        ["cod", "nome", "pop", "area"]
    assert [str(f.dataType) for f in df.schema.fields] == \
        ["IntegerType()", "StringType()", "LongType()", "DoubleType()"]
    rows = {r["cod"]: r for r in df.collect() if r["cod"] is not None}
    assert rows[3550308]["nome"] == "São Paulo"
    assert rows[3550308]["pop"] == 12396372
    assert rows[3509502]["area"] == pytest.approx(794.43)


def test_fwf_is_permissive_not_fatal(spark, fwf_dir):
    register_fwf(spark)
    df = (spark.read.format("fwf").option("colspec", SPEC)
          .load(fwf_dir))
    bad = [r for r in df.collect() if r["cod"] is None]
    # The malformed line survives as a row of NULLs where casts
    # failed / slices ran past the end — never a task failure.
    assert len(bad) == 1
    assert bad[0]["pop"] is None and bad[0]["area"] is None
    assert bad[0]["nome"] == "BadCode"


def test_fwf_partitions_per_file(spark, fwf_dir):
    register_fwf(spark)
    df = (spark.read.format("fwf").option("colspec", SPEC)
          .load(fwf_dir))
    assert df.rdd.getNumPartitions() == 2


def test_fwf_projection_composes(spark, fwf_dir):
    """The source composes with ordinary Catalyst projections and
    filters (Python sources don't push filters by default; pruning
    happens post-scan, which the row volume of fwf dumps tolerates)."""
    from pyspark.sql import functions as F

    register_fwf(spark)
    df = (spark.read.format("fwf").option("colspec", SPEC)
          .load(fwf_dir))
    out = (df.filter(F.col("pop") > 2_000_000)
           .select(F.lower("nome").alias("n")).collect())
    assert sorted(r["n"] for r in out) == ["rio", "são paulo"]


def test_fwf_overflow_yields_null_not_task_failure(spark, tmp_path):
    """An 11-digit value in an int column must become NULL (Python
    ints are unbounded; Arrow enforces the schema) — the PERMISSIVE
    contract says no task failure, ever."""
    (tmp_path / "x.txt").write_text("99999999999 ok\n123         ok\n")
    register_fwf(spark)
    df = (spark.read.format("fwf")
          .option("colspec", "n:0:12:int,tag:12:14:string")
          .load(str(tmp_path)))
    rows = sorted(df.collect(), key=lambda r: (r["n"] is None, r["n"]))
    assert rows[0]["n"] == 123
    assert rows[1]["n"] is None and rows[1]["tag"] == "ok"


def test_fwf_byte_offsets_mode(spark, tmp_path):
    """offsets=byte slices raw bytes before decoding — the faithful
    mode for layouts specified in byte positions: 'São' is 3 chars
    but 4 UTF-8 bytes, so char- and byte-mode disagree on where the
    next column starts."""
    (tmp_path / "b.txt").write_bytes("São42\n".encode("utf-8"))
    register_fwf(spark)
    byte_df = (spark.read.format("fwf")
               .option("colspec", "name:0:4:string,n:4:6:int")
               .option("offsets", "byte").load(str(tmp_path)))
    r = byte_df.collect()[0]
    assert r["name"] == "São" and r["n"] == 42
    char_df = (spark.read.format("fwf")
               .option("colspec", "name:0:3:string,n:3:5:int")
               .load(str(tmp_path)))
    r = char_df.collect()[0]
    assert r["name"] == "São" and r["n"] == 42


def test_fwf_never_raises_on_arbitrary_content(spark, tmp_path):
    """Fuzz the PERMISSIVE contract: arbitrary printable lines (runs
    generated from a seeded RNG — hypothesis' function-scoped health
    check dislikes session fixtures, so the corpus is pinned) must
    never kill a task; every line yields exactly one row."""
    import random
    import string

    rng = random.Random(20260814)
    alphabet = string.printable.replace("\n", "").replace("\r", "")
    lines = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randrange(0, 40)))
             for _ in range(200)]
    (tmp_path / "fuzz.txt").write_text(
        "\n".join(lines) + "\n", encoding="utf-8")
    register_fwf(spark)
    df = (spark.read.format("fwf")
          .option("colspec",
                  "a:0:5:int,b:5:12:string,c:12:20:double,d:20:33:bigint")
          .load(str(tmp_path)))
    rows = df.collect()
    assert len(rows) == len(lines)
    # String column round-trips the stripped slice exactly (compared
    # as multisets: row order across partitions is not guaranteed).
    got_b = sorted(r["b"] for r in rows if r["b"] is not None)
    want_b = sorted(s for s in (ln[5:12].strip() for ln in lines) if s)
    assert got_b == want_b


def test_fwf_bad_layout_fails_on_driver():
    with pytest.raises(ValueError, match="unknown type"):
        _parse_colspec("a:0:3:decimal")
    with pytest.raises(ValueError, match="start < end"):
        _parse_colspec("a:5:3:int")
    with pytest.raises(ValueError, match="name:start:end"):
        _parse_colspec("a:1")


def test_fwf_rejects_uri_schemes_on_driver(spark):
    """The reader walks the filesystem with os.listdir/open, so an
    hdfs:// or s3:// path must fail fast on the driver with a clear
    message (round-5 ADVICE), not die task-by-task with
    FileNotFoundError."""
    register_fwf(spark)
    with pytest.raises(Exception, match="URI schemes are not supported"):
        spark.read.format("fwf") \
            .option("colspec", "a:0:3:int") \
            .load("s3://bucket/data").collect()
