"""Pending (round-budget-deferred) queries are fully tested from the
day they are written, independent of when registry_pending admits them
to the driver: oracle parity runs here, plus the decorrelation plan
law for the correlated-subquery shapes and the admission-budget
arithmetic itself."""

from __future__ import annotations

import pytest

from etl_dados_ibge_sp_spark import registry_pending as RP

from .oracle_compare import compare, duckdb_run

PENDING = {name: (sql, fn) for name, sql, fn in RP.PENDING}


@pytest.mark.parametrize("name", sorted(PENDING))
def test_pending_query_matches_oracle(name, spark, sf_dir):
    sql, fn = PENDING[name]
    df = fn(spark, sf_dir)
    assert df.count() > 0, f"{name}: empty result is a weak test"
    errors = compare(df, duckdb_run(sql, sf_dir), name=name)
    assert not errors, "\n".join(errors)


def test_correlated_plans_are_decorrelated(spark, sf_dir):
    """Catalyst must rewrite the correlated scalar subqueries into
    aggregate + join (no per-row subquery node survives in the
    physical plan)."""
    for name in ("correlated_small_qty_revenue",
                 "correlated_exists_orders"):
        df = PENDING[name][1](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Join" in plan, f"{name}: no join in plan"
        # In-plan subquery execution nodes would mean row-at-a-time
        # re-evaluation; decorrelation leaves none.
        assert "Subquery" not in plan, f"{name}: correlated subquery " \
            f"survived decorrelation:\n{plan[:2000]}"


def test_wav_codec_rejects_garbage(spark):
    from etl_dados_ibge_sp_spark.operators.multimodal import decode_wav

    df = spark.createDataFrame([(1, bytearray(b"not audio"))],
                               "doc_id bigint, payload binary")
    with pytest.raises(Exception, match="not a RIFF"):
        decode_wav(df).collect()


def test_wav_parser_handles_extra_chunks(spark):
    """The chunk walk must skip unknown chunks (LIST/INFO metadata is
    common in real WAVs) and still find fmt + data."""
    import struct

    import numpy as np

    samples = np.array([100, -200, 300, -32768], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    payload = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
               + junk
               + b"fmt " + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    from etl_dados_ibge_sp_spark.operators.multimodal import decode_wav
    df = spark.createDataFrame([(7, bytearray(payload))],
                               "doc_id bigint, payload binary")
    row = decode_wav(df).collect()[0]
    assert (row["n_samples"], row["sample_rate"], row["n_channels"]) == \
        (4, 8000, 1)
    assert row["sum_amp"] == int(samples.astype("int64").sum())
    assert row["sum_sq"] == int((samples.astype("int64") ** 2).sum())
    assert row["peak"] == 32768


def test_admission_budget_arithmetic():
    """admit() registers pending queries only up to the 50-row budget
    and is idempotent (an admitted query consumes its own slot)."""
    def fake_register(name, sql):
        def deco(fn):
            registry[name] = (sql, fn)
            return fn
        return deco

    # 49 queries, 1 verified -> 48 awaiting -> slack 2 of 3 pending.
    registry = {f"q{i}": None for i in range(49)}
    verified = {"q0"}
    admitted = RP.admit(registry, verified, fake_register)
    assert len(admitted) == 2
    assert admitted == [RP.PENDING[0][0], RP.PENDING[1][0]]

    # Second call: the two admitted queries are themselves unverified
    # now -> slack 0 -> nothing new, nothing duplicated.
    assert RP.admit(registry, verified, fake_register) == []

    # Next "round": everything verified -> the remaining pending
    # admit in list order.
    verified = set(registry)
    admitted = RP.admit(registry, verified, fake_register)
    assert admitted == [name for name, _, _ in RP.PENDING[2:]]

    # No slack at all -> no admission.
    registry2 = {f"q{i}": None for i in range(50)}
    assert RP.admit(registry2, set(), fake_register) == []


def test_wav_roundtrip_property(spark):
    """Property law: for arbitrary int16 sample vectors, a hand-built
    canonical WAV decodes to exactly numpy's stats (the codec is a
    parser, not an approximation)."""
    import struct

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_dados_ibge_sp_spark.operators.multimodal import (
        decode_wav, resample_wav)

    def wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
        data = samples.astype("<i2").tobytes()
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                        rate * 2, 2, 16)
                + b"data" + struct.pack("<I", len(data)) + data)

    @given(st.lists(st.integers(min_value=-32768, max_value=32767),
                    min_size=1, max_size=64))
    @settings(max_examples=12, deadline=None)
    def law(vals):
        a = np.array(vals, dtype=np.int64)
        df = spark.createDataFrame([(1, bytearray(wav_bytes(a)))],
                                   "doc_id bigint, payload binary")
        r = decode_wav(df).collect()[0]
        assert r["n_samples"] == len(a)
        assert r["sum_amp"] == int(a.sum())
        assert r["sum_sq"] == int((a * a).sum())
        assert r["peak"] == int(np.abs(a).max())
        r2 = resample_wav(df, factor=2).collect()[0]
        b = a[::2]
        assert r2["n_samples"] == len(b)
        assert r2["sum_amp"] == int(b.sum())
        assert r2["sample_rate"] == 4000

    law()
