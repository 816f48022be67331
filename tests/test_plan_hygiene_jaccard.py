"""Law: jaccard_pairs verification never materializes per-doc token
arrays — the round-10 sf10.0 finding.

The collect_list verification (join each candidate side to a per-doc
token-array table, array_intersect per pair) fails both ways at the
100x curve point, measured via corpus_curate:

* static planner: Catalyst sizes the array projection from the scan's
  STRING stats — blind to the ~text-length x expansion — so it
  auto-broadcasts the O(corpus) array side and the BroadcastExchange
  build OOMs the 8g driver (the round-9 incremental-recheck failure,
  reproduced on a second site);
* pinning SMJ instead: the candidate side drags full arrays through
  two sort spills, |cand| x |doc| wide — a 450 MB sf3.0 input filled
  ~60 GB of /tmp before the executors died with SPILL_OUT_OF_MEMORY.

The fix is shape-level: verify candidates against the inverted index
itself (canonical PPJoin) — skinny (id, shingle) rows, a pair-keyed
count as the exact intersection, and NOTHING wide for the planner to
misestimate or the sorter to spill.  This law pins that shape: no
collect_list of shingles may appear anywhere in the verification
plan, and no BroadcastExchange may carry an array column.
"""

import contextlib
import io
import re


def test_jaccard_verify_materializes_no_token_arrays(spark, sf_dir):
    from etl_dados_ibge_sp_spark.operators.dedup import (
        jaccard_pairs, word_shingles)
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = jaccard_pairs(word_shingles(docs, "doc_id", "text", n=3),
                       "doc_id", threshold=0.8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # The prefix subtree legitimately collects the (df, shingle)
    # structs per doc to slice the rarest-first prefix IN-ROW — that
    # array lives inside one aggregate and is exploded immediately,
    # never joined or broadcast.  It is the only sanctioned
    # collect_list shape (it shows up partial+final on each prefix
    # self-join side); the verification path must contribute none.
    # A re-grown token-array table would collect BARE shingles.
    for m in re.finditer(r"collect_list\((\w+)", plan):
        assert m.group(1) == "struct", (
            "verification re-grew a token-array materialization "
            f"(collect_list({m.group(1)}...)):\n" + plan[:2000])
    bad = re.findall(
        r"\(\d+\) BroadcastExchange\s*\nInput \[\d+\]: \[[^\]]*__t\w+",
        plan)
    assert not bad, (
        "an array side is broadcast — the shape that OOMs at the "
        "100x point:\n" + plan[:2000])
    # The intersection count must come from the inverted index: the
    # plan joins (id, shingle) rows and aggregates per pair, so at
    # least one hash aggregate keys on BOTH pair ids.
    assert re.search(r"Keys \[2\]: \[id_a#\d+L?, id_b#\d+L?\]", plan), (
        "pair-keyed intersection count missing:\n" + plan[:2000])
