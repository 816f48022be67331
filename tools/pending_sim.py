#!/usr/bin/env python
"""Hostile-session parity sweep over the PENDING queue: the queries
that will register at round 6 and meet the driver's unknown session
(ANSI on, non-UTC timezone) for the first time."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .appName("pending-sim")
         .config("spark.sql.session.timeZone", "America/Sao_Paulo")
         .config("spark.sql.ansi.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from etl_dados_ibge_sp_spark import registry  # noqa: E402
from etl_dados_ibge_sp_spark import registry_pending as RP  # noqa: E402
from oracle_compare import compare, duckdb_run  # noqa: E402

registry.all_queries()  # load extensions so PENDING is complete
reg = set(registry.REGISTRY)
# Admission wraps every pending fn with session.tune_for_oracle (the
# register() decorator) before the driver ever calls it — apply the
# same wrapper here, or the sweep tests a session no pending query
# will ever actually run under.
from etl_dados_ibge_sp_spark.session import tune_for_oracle  # noqa: E402
failed = []
n = 0
queue = list(RP.PENDING) + [(nm, sql, fn)
                            for _minr, nm, sql, fn in RP.PENDING_GATED]
for name, sql, fn in queue:
    if name in reg:
        continue
    n += 1
    try:
        tune_for_oracle(spark)
        errs = compare(fn(spark, SF), duckdb_run(sql, SF), name=name)
    except Exception as ex:
        errs = [f"EXC {type(ex).__name__}: {str(ex)[:300]}"]
    if errs:
        failed.append((name, errs))
        print(f"FAIL {name}: {errs}", flush=True)
    else:
        print(f"ok   {name}", flush=True)
print(f"\n{n} pending queries, {len(failed)} failed")
sys.exit(1 if failed else 0)
