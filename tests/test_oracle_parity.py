"""Every registered query must match its DuckDB oracle — the local
mirror of the driver's CORRECTNESS gate (BASELINE.md)."""

from __future__ import annotations

import pytest

from etl_dados_ibge_sp_spark.registry import REGISTRY, all_queries, all_oracle_sql

from .oracle_compare import compare, duckdb_run

QUERIES = all_queries()
ORACLES = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df is not None
    if name not in ORACLES:
        # rows-only check, like the driver's weak gate
        assert df.count() >= 0
        return
    oracle = duckdb_run(ORACLES[name], sf_dir)
    errors = compare(df, oracle, name=name)
    assert not errors, "\n".join(errors)
