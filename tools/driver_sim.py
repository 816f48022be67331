#!/usr/bin/env python
"""Hostile driver simulation for /root/repo/__spark_entry__.py.

Session: local[8], America/Sao_Paulo timezone, ANSI on, imported from
/tmp so cwd != repo.  Compares every queries() entry against its
oracle_sql() on DuckDB views over the given sf dir (default sf0.01):
row count + sorted-column order-insensitive md5 over %.6g-formatted
rows.  Exits nonzero on any mismatch.
"""

import hashlib
import importlib.util
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def fmt(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "%.6g" % v
    s = str(v)
    if s.endswith(" 00:00:00"):
        s = s[:-9]
    return s


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    lines = sorted(
        "|".join(fmt(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("driver-sim")
             .config("spark.sql.session.timeZone", "America/Sao_Paulo")
             .config("spark.sql.ansi.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = mod.entry(spark).count()
    assert n > 0, "entry() returned 0 rows"
    print(f"entry() OK: {n} rows")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    failed = []
    zero = []
    for name, fn in queries.items():
        try:
            df = fn(spark, SF)
            pdf = df.toPandas()
            s_cols = list(pdf.columns)
            s_rows = [tuple(r) for r in pdf.itertuples(index=False)]
        except Exception as ex:
            failed.append((name, f"spark EXC {type(ex).__name__}: "
                                 f"{str(ex)[:200]}"))
            print(f"FAIL {name}: spark exception", flush=True)
            continue
        if name not in oracles:
            status = "no_oracle"
            print(f"ok   {name}: {len(s_rows)} rows ({status})",
                  flush=True)
            if len(s_rows) == 0:
                zero.append(name)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failed.append((name, f"oracle EXC {str(ex)[:200]}"))
            print(f"FAIL {name}: oracle exception", flush=True)
            continue
        o_cols = list(odf.columns)
        o_rows = [tuple(r) for r in odf.itertuples(index=False)]
        if len(s_rows) != len(o_rows):
            failed.append((name, f"rows {len(s_rows)} != {len(o_rows)}"))
            print(f"FAIL {name}: row count", flush=True)
            continue
        if sorted(c.lower() for c in s_cols) != \
                sorted(c.lower() for c in o_cols):
            failed.append((name, f"cols {sorted(s_cols)} != "
                                 f"{sorted(o_cols)}"))
            print(f"FAIL {name}: columns", flush=True)
            continue
        if table_hash(s_cols, s_rows) != table_hash(o_cols, o_rows):
            failed.append((name, "value hash mismatch"))
            print(f"FAIL {name}: hash", flush=True)
            continue
        if len(s_rows) == 0:
            zero.append(name)
        print(f"ok   {name}: {len(s_rows)} rows hash-match", flush=True)

    print(f"\n{len(queries)} queries, {len(failed)} failed")
    if zero:
        print(f"0-row (weak) queries: {zero}")
    for name, why in failed:
        print(f"  FAIL {name}: {why}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
