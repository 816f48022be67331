"""Laws from the round-10 sf10.0 finding: the jaccard_pairs /
connected_components join-strategy contract.

The failure chain, measured via corpus_curate at the 100x curve
point: (1) verifying candidates by joining collect_list token-array
tables fails both ways at scale — the static planner auto-broadcasts
the O(corpus) array side (string-stats estimate, blind to array
expansion) and OOMs the driver, while pinning SMJ instead drags
|cand| x |doc|-wide arrays through sort spills (~60 GB of /tmp from a
450 MB input); (2) even with skinny inverted-index verification, a
`Dataset.checkpoint`/`localCheckpoint` of the pair plan compiles it
STATICALLY — no AQE runtime demotion — so the aggregate-collapsed
size estimates (document frequency, prefix slices) become static
broadcasts of O(corpus) tables and OOM the driver anyway.

The contract pinned here:

* verification counts shared shingles from the skinny inverted index
  (pair-keyed aggregate), never via collected token arrays;
* ``pin_shuffle=True`` produces a fully shuffle-joined static plan —
  ZERO BroadcastExchange — for callers that must compile statically;
* connected_components cuts CALLER plans adaptively (persist+count,
  AQE applies) and unpersists its caches on exit, so one call leaves
  no cached-RDD residue.
"""

import contextlib
import io
import re


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_jaccard_verify_materializes_no_token_arrays(spark, sf_dir):
    from etl_dados_ibge_sp_spark.operators.dedup import (
        jaccard_pairs, word_shingles)
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(jaccard_pairs(
        word_shingles(docs, "doc_id", "text", n=3), "doc_id",
        threshold=0.8))
    # The prefix subtree legitimately collects the (df, shingle)
    # structs per doc to slice the rarest-first prefix IN-ROW — that
    # array lives inside one aggregate and is exploded immediately,
    # never joined or broadcast.  A re-grown token-array table would
    # collect BARE shingles.
    for m in re.finditer(r"collect_list\((\w+)", plan):
        assert m.group(1) == "struct", (
            "verification re-grew a token-array materialization "
            f"(collect_list({m.group(1)}...)):\n" + plan[:2000])
    # The intersection count must come from the inverted index: a
    # pair-keyed aggregate.
    assert re.search(r"Keys \[2\]: \[id_a#\d+L?, id_b#\d+L?\]", plan), (
        "pair-keyed intersection count missing:\n" + plan[:2000])


def test_jaccard_pinned_variant_has_zero_static_broadcasts(spark, sf_dir):
    from etl_dados_ibge_sp_spark.operators.dedup import (
        jaccard_pairs, word_shingles)
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(jaccard_pairs(
        word_shingles(docs, "doc_id", "text", n=3), "doc_id",
        threshold=0.8, pin_shuffle=True))
    assert not re.search(r"\(\d+\) BroadcastExchange", plan), (
        "pin_shuffle=True must yield a statically-safe plan with no "
        "broadcast exchanges:\n" + plan[:2000])
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) >= 6, (
        "expected all six joins pinned to sort-merge:\n" + plan[:2000])


def test_pinned_and_default_results_identical(spark, sf_dir):
    from etl_dados_ibge_sp_spark.operators.dedup import (
        jaccard_pairs, word_shingles)
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    docs = load_table(spark, sf_dir, "documents") \
        .filter("doc_id < 200")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    a = {tuple(r) for r in
         jaccard_pairs(sh, "doc_id", 0.8).collect()}
    b = {tuple(r) for r in
         jaccard_pairs(sh, "doc_id", 0.8, pin_shuffle=True).collect()}
    assert a == b and a, "join-strategy pinning changed results"


def test_cc_never_checkpoints_raw_caller_plans(spark, sf_dir,
                                               monkeypatch):
    """Interception law for the static-compile OOM: every DataFrame
    connected_components checkpoints must be either (a) an
    adaptive-cut frame — persisted, already materialized through AQE —
    or (b) a round plan whose only leaves are prior checkpoint RDDs.
    A raw caller plan (parquet scans, un-demoted joins) reaching a
    checkpoint is exactly the shape that compiled static corpus-scale
    broadcasts and OOM'd the driver at sf10.0."""
    from pyspark.sql import functions as F
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from etl_dados_ibge_sp_spark.operators.dedup import (
        connected_components, jaccard_pairs, word_shingles)
    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table

    violations = []
    orig = CDF.localCheckpoint

    def spying(self, eager=True):
        cached = self.storageLevel.useMemory or self.storageLevel.useDisk
        if not cached:
            plan = self._jdf.queryExecution().executedPlan().toString()
            if "Scan parquet" in plan:
                violations.append(plan[:800])
        return orig(self, eager)

    monkeypatch.setattr(CDF, "localCheckpoint", spying)

    docs = load_table(spark, sf_dir, "documents").filter("doc_id < 400")
    pairs = jaccard_pairs(word_shingles(docs, "doc_id", "text", n=3),
                          "doc_id", 0.8).select("id_a", "id_b")
    nodes = docs.select(F.col("doc_id").alias("node"))
    comp = connected_components(nodes, pairs, node_col="node")
    assert comp.count() > 0
    assert not violations, (
        "a raw caller plan reached a checkpoint (static compile — "
        "the sf10 OOM shape):\n" + violations[0])


def test_multiset_input_fails_loudly(spark):
    """ADVICE r10: a multiset (id, shingle) input inflates the PPJoin
    intersection count by the multiplicity product — silently, before
    the guard.  The guard turns the contract breach (e.g.
    char_shingles with its default distinct=False) into a runtime
    raise instead of >1.0 jaccard values."""
    import pytest

    from etl_dados_ibge_sp_spark.operators.dedup import jaccard_pairs

    rows = [(1, s) for s in ("aa", "aa", "aa", "bb")] \
        + [(2, s) for s in ("aa", "aa", "aa", "cc")]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    with pytest.raises(Exception, match="not DISTINCT"):
        jaccard_pairs(sh, "doc_id", 0.5).collect()
    # and the distinct projection of the same input still works
    # ({aa,bb} vs {aa,cc}: J = 1/3)
    got = {tuple(r)[:2] for r in
           jaccard_pairs(sh.distinct(), "doc_id", 0.3).collect()}
    assert got == {(1, 2)}
