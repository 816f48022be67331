#!/usr/bin/env python
"""Emit the OPTIMIZATION_r11.md per-query checklist table: every
benched query with before/after seconds and the action taken.

Usage: python tools/opt_checklist.py BEFORE.json AFTER.json
(reads the two BENCH_full-format files, prints markdown to stdout).
"""

from __future__ import annotations

import json
import re
import sys

# Queries that keep (or gained) an explicit fan_out=True load — the
# measured per-row-heavy set (OPTIMIZATION_r11.md §2).
KEPT_FANOUT = {
    "bootstrap_poisson_revenue", "embed_covariance_scaled",
    "embed_quantize_int8", "dedup_embed_neardup", "semantic_dedup",
    "hybrid_search_rrf", "kmv_distinct_by_type", "dedup_minhash_lsh",
    "dedup_containment", "dedup_incremental_load",
    "text_dup_ngram_spans", "text_token_stats", "text_language_id",
    "text_quality_score", "text_rolling_hash", "text_pii_redact",
    "text_repetition", "text_bm25_topk", "sanitized_json_scan",
    "json_extract", "pricing_summary", "rollup_hierarchy",
    "cube_hierarchy",
}


def action_for(name: str) -> str:
    if name.startswith("stream_"):
        return "left alone: availableNow startup-bound (state-partition sweep measured, <1 s for 8→2)"
    if name in ("lakehouse_incremental_loop", "vtable_sink_roundtrip"):
        return "bare-scan input → right-sized staged files (§6); loop legs untouched"
    if name in KEPT_FANOUT:
        return "kept fan_out=True (measured fan-out-positive); load memoized"
    if name in ("multimodal_avi_stats", "multimodal_png_roundtrip"):
        return "bare scan: fanned chained-codec shape measured an in-suite pathology (see §2)"
    if name in ("fuzzy_join_names", "fuzzy_join_names_k2"):
        return "left alone: dim inputs, operator-internal fan-out + SMJ scale pin"
    return "bare scan (fan-out Exchange removed); load memoized"


def main() -> None:
    before = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    print("| query | before s | after s | ratio | action |")
    print("|---|---|---|---|---|")
    tot_b = tot_a = 0.0
    for name in sorted(set(before) | set(after)):
        b, a = before.get(name), after.get(name)
        tot_b += b or 0.0
        tot_a += a or 0.0
        ratio = f"{a / b:.2f}x" if b and a else "—"
        bs = f"{b:.3f}" if b is not None else "—"
        as_ = f"{a:.3f}" if a is not None else "—"
        print(f"| `{name}` | {bs} | {as_} | {ratio} | {action_for(name)} |")
    print(f"| **total** | **{tot_b:.1f}** | **{tot_a:.1f}** | "
          f"**{tot_a / tot_b:.2f}x** | |")


if __name__ == "__main__":
    main()
