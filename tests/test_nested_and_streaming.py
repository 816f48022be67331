"""U1 nested-document search + Structured Streaming dedup (the J2/K3
streaming restatement) + multimodal decode stub behavior."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_dados_ibge_sp_spark.operators.multimodal import (
    decode_real, decode_stub, with_binary_payload,
)
from etl_dados_ibge_sp_spark.operators.nested import (
    find_paths, search_json_udf, search_nested,
)


@pytest.fixture()
def nested_df(spark):
    return spark.createDataFrame([
        Row(id=1, doc=Row(Property="Ano",
                          children=[Row(Property="Mês", value=10)])),
        Row(id=2, doc=Row(Property="Outro",
                          children=[Row(Property="Ano", value=2025)])),
        Row(id=3, doc=Row(Property="Nada", children=[])),
    ])


def test_find_paths(nested_df):
    paths = find_paths(nested_df.schema["doc"].dataType, "Property")
    assert paths == ["Property", "children[].Property"]


def test_search_nested_typed(nested_df):
    out = search_nested(nested_df, "doc", "Property", "Ano")
    got = {(r["id"], r["match_path"]) for r in out.collect()}
    assert got == {(1, "doc.Property"), (2, "doc.children[].Property")}


def test_search_json_udf(spark):
    df = spark.createDataFrame([
        (1, '{"Property": "Ano", "nested": {"Property": "Ano"}}'),
        (2, '{"Property": "Outro", "items": [{"Property": "Ano"}]}'),
        (3, 'not json'),
        (4, '{"Property": "Nada"}'),
    ], ["id", "body"])
    out = search_json_udf(df, "body", "Property", "Ano")
    got = {r["id"]: sorted(r["match_paths"]) for r in out.collect()}
    assert got == {
        1: ["Property", "nested.Property"],
        2: ["items[0].Property"],
    }


def test_streaming_dedup_drops_duplicates(spark, sf_dir, tmp_path):
    # Stage the events file twice -> the stream sees every row twice;
    # dropDuplicatesWithinWatermark must restore the original count.
    import etl_dados_ibge_sp_spark.streaming.windowed as W

    stage = tmp_path / "dup_events"
    stage.mkdir()
    src = f"{sf_dir}/events.parquet"
    shutil.copy(src, stage / "a.parquet")
    shutil.copy(src, stage / "b.parquet")

    orig = W._events_stream

    def staged_stream(spark_, _sf, _label="events"):
        schema = spark_.read.parquet(src).schema
        s = spark_.readStream.schema(schema).parquet(str(stage))
        from etl_dados_ibge_sp_spark.sources.parquet_source import (
            normalize_ts,
        )
        return normalize_ts(s)

    W._events_stream = staged_stream
    try:
        out = W.streaming_dedup(spark, sf_dir)
        n_expected = spark.read.parquet(src).count()
        assert out.count() == n_expected
    finally:
        W._events_stream = orig


def test_streaming_incremental_load_upserts(spark, sf_dir, tmp_path):
    """foreachBatch incremental upsert (the J2+K3 restatement): the
    source stages the same events file twice, arriving as two
    micro-batches; the second batch's rows all anti-join away, so the
    warehouse ends exactly once per event."""
    from etl_dados_ibge_sp_spark.streaming.windowed import (
        streaming_incremental_load,
    )

    src = f"{sf_dir}/events.parquet"
    stage = tmp_path / "landing"
    stage.mkdir()
    shutil.copy(src, stage / "a.parquet")
    shutil.copy(src, stage / "b.parquet")
    warehouse = str(tmp_path / "warehouse")

    schema = spark.read.parquet(src).schema
    streaming_incremental_load(
        spark, str(stage), schema, warehouse,
        checkpoint_dir=str(tmp_path / "ckpt"), keys=["event_id"])

    n_src = spark.read.parquet(src).count()
    out = spark.read.parquet(warehouse)
    assert out.count() == n_src
    assert out.select("event_id").distinct().count() == n_src


def test_stream_sessionize_parity(spark, sf_dir):
    """Parity law for the applyInPandasWithState sessionizer: emitted
    sessions == batch 30-min-gap sessions closed by the final
    watermark (only sessions still open at end-of-stream are withheld,
    which is correct streaming semantics)."""
    from pyspark.sql import Window

    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    from etl_dados_ibge_sp_spark.streaming.windowed import (
        SESSION_GAP_US, stream_sessionize,
    )

    emitted = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in stream_sessionize(spark, sf_dir).collect()
    }

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = F.when(
        F.lag(us).over(w).isNull() |
        ((us - F.lag(us).over(w)) > SESSION_GAP_US),
        F.lit(1)).otherwise(F.lit(0))
    batch = (
        e.select("user_id", "ts", "event_id", us.alias("us"),
                 new_sess.alias("ns"))
        .withColumn("sid", F.sum("ns").over(ws))
        .groupBy("user_id", "sid")
        .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us"),
             F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    sessions = {(r["user_id"], r["start_us"], r["end_us"], r["n_events"])
                for r in batch}
    final_watermark = max(r["end_us"] for r in batch)
    closed = {s for s in sessions
              if s[2] + SESSION_GAP_US < final_watermark}
    assert emitted <= sessions
    assert emitted == closed


def test_decode_stub_and_real(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    out = decode_stub(with_binary_payload(docs)).collect()
    assert len(out) == 5
    for r in out:
        assert 1 <= r["width"] <= 1920
        assert 1 <= r["height"] <= 1080
        assert 1 <= r["n_frames"] <= 30
        assert len(r["checksum"]) == 32
    # decode_real graduated from a NotImplementedError placeholder to
    # the real mixed-format dispatcher in round 10; its per-format
    # parity laws live in tests/test_png_codec.py.  Here: text bytes
    # are not a known container, so the dispatch must refuse them
    # rather than emit garbage rows.
    with pytest.raises(Exception, match="unrecognized media magic"):
        decode_real(with_binary_payload(docs)).collect()


def test_stream_windowed_distinct_approx_parity(spark, sf_dir):
    """Streaming HLL distinct (bounded state: one sketch per window ×
    type, not one row per user) must equal the batch aggregate on the
    same finite source — HLL++ is a deterministic function of the
    value set, so availableNow parity is exact, not approximate."""
    from pyspark.sql import functions as F

    from etl_dados_ibge_sp_spark.sources.parquet_source import load_table
    from etl_dados_ibge_sp_spark.streaming.windowed import \
        stream_windowed_distinct_approx

    got = {(r["window_start_us"], r["event_type"]): r["approx_users"]
           for r in stream_windowed_distinct_approx(spark,
                                                    sf_dir).collect()}
    batch = (load_table(spark, sf_dir, "events")
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.approx_count_distinct("user_id", rsd=0.02)
                  .alias("approx_users"))
             .select(F.unix_micros(F.col("w.start"))
                     .alias("window_start_us"),
                     "event_type", "approx_users"))
    want = {(r["window_start_us"], r["event_type"]): r["approx_users"]
            for r in batch.collect()}
    assert got == want and got
    # And the estimate is a real count estimate: within the rsd-bound
    # neighborhood of the exact distinct per group.
    exact = {(r["window_start_us"], r["event_type"]): r["nd"]
             for r in (load_table(spark, sf_dir, "events")
                       .groupBy(F.window("ts", "1 hour").alias("w"),
                                "event_type")
                       .agg(F.countDistinct("user_id").alias("nd"))
                       .select(F.unix_micros(F.col("w.start"))
                               .alias("window_start_us"),
                               "event_type", "nd")).collect()}
    for key, est in got.items():
        assert abs(est - exact[key]) <= max(3, 0.1 * exact[key])
