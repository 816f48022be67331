"""Engine-wide physical-plan hygiene: every registered AND pending
query must obey the global scale rules the per-query audits check by
hand.  This is the lint that keeps a 151st query from quietly shipping
a cartesian product or a row-at-a-time Python eval.

Rules:
* no ``CartesianProduct`` — a non-broadcast cross join is never
  acceptable at 100 TB (broadcast nested-loop joins of tiny
  single-row/statistics frames are fine and appear as
  BroadcastNestedLoopJoin);
* no ``BatchEvalPython`` — row-at-a-time Python UDFs are banned from
  every query path (Arrow-batched ``MapInPandas`` / ``ArrowEvalPython``
  / ``FlatMapGroupsInPandas`` are the sanctioned Python boundary);
* no ``RoundRobinPartitioning`` other than the documented
  ``ensure_parallelism`` fan-out, i.e. never as a mid-plan reshuffle.
"""

from __future__ import annotations

import pytest

from etl_dados_ibge_sp_spark.registry import all_queries_with_pending

QUERIES = all_queries_with_pending()

# Streaming queries execute a real availableNow run when the callable
# is invoked — they are covered by their own tests and their plan is
# the inner batch plan anyway; building them here would re-run streams
# ~10x for no new evidence.
_SKIP = tuple(n for n in QUERIES if n.startswith("stream_"))


@pytest.mark.parametrize("name",
                         sorted(n for n in QUERIES if n not in _SKIP))
def test_physical_plan_hygiene(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    assert "CartesianProduct" not in plan, \
        f"{name}: non-broadcast cartesian product\n{plan[:1500]}"
    # BatchEvalPythonUDTF is the (sanctioned) Spark-4 Python
    # table-function node — only the row-at-a-time scalar-UDF node
    # BatchEvalPython is banned.
    assert not re.search(r"BatchEvalPython(?!UDTF)", plan), \
        f"{name}: row-at-a-time Python UDF\n{plan[:1500]}"
    # RoundRobin may appear only via the scan fan-out (directly over a
    # file scan / project of one); any other occurrence is a mid-plan
    # blind reshuffle.  The fan-out exchange sits within 2 plan lines
    # of its FileScan in every legitimate use.
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "RoundRobinPartitioning" not in ln:
            continue
        below = "\n".join(lines[i:i + 4])
        assert "Scan parquet" in below or "LocalTableScan" in below \
            or "Scan ExistingRDD" in below, \
            f"{name}: RoundRobin reshuffle not at a scan:\n{below}"
