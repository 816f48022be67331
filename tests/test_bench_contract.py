"""Pin the bench evidence contract (bench.py): the driver keeps only
the last 2 000 characters of stdout, and round 4 lost its raw timings
when the per-query dict outgrew that window — so the compact line must
stay small no matter how many queries the suite grows to, and the full
detail must round-trip through BENCH_full.json."""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

import bench  # noqa: E402


def _full(n_queries: int, n_regressions: int) -> dict:
    timings = {f"some_rather_long_query_name_{i:04d}": 1.234
               for i in range(n_queries)}
    regs = sorted(timings)[:n_regressions]
    return {
        "metric": "suite_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(timings),
        "mean_query_sec": 1.234,
        "host_factor": 1.27,
        "methodology": "x" * 500,
        "notes": ["y" * 400],
        "queries": timings,
        "baseline_delta": {k: 1.01 for k in timings},
        "regressions": regs,
    }


def test_compact_line_fits_driver_tail_at_any_suite_size():
    """Even at 1000 queries with many flagged regressions, the stdout
    line stays far inside the 2 000-char capture window (the
    regression list is truncated to 8 entries by contract)."""
    for n, r in ((187, 0), (1000, 0), (1000, 50)):
        line = json.dumps(bench.compact_line(_full(n, r)))
        assert len(line) < 1500, (n, r, len(line))


def test_compact_line_carries_the_headline_fields():
    c = bench.compact_line(_full(187, 3))
    assert c["metric"] == "suite_wall_sec"
    assert c["n_queries"] == 187
    assert c["unit"] == "sec" and c["sf"] == 0.1
    assert c["n_regressions"] == 3 and len(c["regressions"]) == 3
    assert c["detail"] == "BENCH_full.json"
    # Per-query dicts must NOT leak into the compact line.
    assert "queries" not in c and "baseline_delta" not in c


def test_bench_full_json_is_committed_and_covers_the_suite():
    """BENCH_full.json is the raw-timings evidence; it must exist,
    parse, and carry per-query detail consistent with its own
    headline numbers."""
    path = os.path.join(HERE, "BENCH_full.json")
    with open(path) as fh:
        full = json.load(fh)
    assert full["n_queries"] == len(full["queries"])
    assert abs(sum(full["queries"].values()) - full["value"]) < 0.01
    assert set(full["regressions"]) <= set(full["queries"])
