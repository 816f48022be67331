"""Laws for the streaming near-dup arrival path
(streaming/windowed.streaming_neardup_load): cross-batch blocking,
replay idempotency, and crash healing — the state invariants a
batch-mode test can't see."""

from __future__ import annotations

import pytest

from etl_dados_ibge_sp_spark.streaming.windowed import (
    streaming_neardup_load)

SCHEMA = "doc_id bigint, text string"

_A = "the quick brown fox jumps over the lazy dog again and again"
_B = "completely different content about municipal statistics tables"
_D = "yet another unrelated sentence with its own unique vocabulary"
_W = "warehouse seed text that matches nothing else in this fixture"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _run(spark, src, wh, sig, ckpt):
    streaming_neardup_load(spark, src, SCHEMA, wh, sig, ckpt)


def _ids(spark, path):
    return sorted(r["doc_id"] for r in
                  spark.read.parquet(path).select("doc_id").collect())


def test_cross_batch_neardup_blocked_and_invariant(spark, tmp_path):
    """A later batch's near-duplicate of an earlier batch's doc must
    not load (whichever order the files are picked up, exactly one of
    the dup pair survives), fresh docs load, and every warehouse doc
    has exactly one stored signature."""
    src = str(tmp_path / "src")
    wh, sig = str(tmp_path / "wh"), str(tmp_path / "sig")
    _write_batch(spark, src, [(1, _A), (2, _B)])
    _write_batch(spark, src, [(3, _A), (4, _D)])  # 3 duplicates 1's text
    _run(spark, src, wh, sig, str(tmp_path / "ck1"))

    got = _ids(spark, wh)
    assert len(got) == 3
    assert 2 in got and 4 in got
    assert len({1, 3} & set(got)) == 1  # exactly one of the dup pair
    assert _ids(spark, sig) == got      # signature invariant


def test_replay_with_fresh_checkpoint_is_idempotent(spark, tmp_path):
    """Re-running the whole stream (lost checkpoint — the worst replay
    case) must add nothing: the exact-id anti-join is the natural
    dedup the reference's J2 load relies on."""
    src = str(tmp_path / "src")
    wh, sig = str(tmp_path / "wh"), str(tmp_path / "sig")
    _write_batch(spark, src, [(1, _A), (2, _B)])
    _write_batch(spark, src, [(4, _D)])
    _run(spark, src, wh, sig, str(tmp_path / "ck1"))
    before = _ids(spark, wh)

    _run(spark, src, wh, sig, str(tmp_path / "ck2"))  # fresh checkpoint
    assert _ids(spark, wh) == before
    assert _ids(spark, sig) == before


def test_crash_between_appends_heals_signatures(spark, tmp_path):
    """Simulated crash AFTER the doc append, BEFORE the signature
    append (warehouse has a doc with no signature): the replayed batch
    must not duplicate the doc row AND must restore its signature."""
    src = str(tmp_path / "src")
    wh, sig = str(tmp_path / "wh"), str(tmp_path / "sig")
    # Crash aftermath: doc 9 landed in the warehouse, no sig table yet.
    spark.createDataFrame([(9, _W)], SCHEMA).write.parquet(wh)

    _write_batch(spark, src, [(9, _W), (10, _B)])  # the replayed batch
    _run(spark, src, wh, sig, str(tmp_path / "ck1"))

    assert _ids(spark, wh) == [9, 10]   # 9 not duplicated
    assert _ids(spark, sig) == [9, 10]  # 9's signature healed


@pytest.mark.parametrize("bad", ["", " "])
def test_degenerate_text_still_loads_once(spark, tmp_path, bad):
    """Empty/whitespace docs produce a single padded shingle; two such
    docs are textually identical, so only the first loads — and the
    pipeline must not error on them (a malformed record must never
    kill a 100-TB load)."""
    src = str(tmp_path / "src")
    wh, sig = str(tmp_path / "wh"), str(tmp_path / "sig")
    _write_batch(spark, src, [(1, bad)])
    _write_batch(spark, src, [(2, bad), (3, _B)])
    _run(spark, src, wh, sig, str(tmp_path / "ck1"))
    got = _ids(spark, wh)
    assert 3 in got and len({1, 2} & set(got)) == 1
    assert _ids(spark, sig) == got
