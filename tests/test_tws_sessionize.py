"""Parity law for the transformWithStateInPandas sessionizer: the new
arbitrary-state API implementation must emit row-identical sessions to
the applyInPandasWithState form — proving the migration path Spark's
docs steer stateful pipelines toward.

The TWS driver worker speaks a protobuf control protocol, so the
parity run needs ``google.protobuf``; where the environment lacks it
(this container does) the law SKIPS with the dependency named and the
gate itself is asserted instead — the implementation is complete and
the first protobuf-equipped environment runs the full parity."""

from __future__ import annotations

import pytest

from etl_dados_ibge_sp_spark.streaming.windowed import (
    stream_sessionize, stream_sessionize_tws)

try:
    import google.protobuf  # noqa: F401
    _HAVE_PROTOBUF = True
except ImportError:
    _HAVE_PROTOBUF = False


@pytest.mark.skipif(not _HAVE_PROTOBUF,
                    reason="transformWithState needs google.protobuf "
                           "(not shipped in this container)")
def test_tws_sessionizer_matches_group_state_form(spark, sf_dir):
    old = sorted(tuple(r) for r in
                 stream_sessionize(spark, sf_dir).collect())
    new = sorted(tuple(r) for r in
                 stream_sessionize_tws(spark, sf_dir).collect())
    assert old, "no sessions emitted — weak fixture"
    assert new == old


@pytest.mark.skipif(_HAVE_PROTOBUF,
                    reason="protobuf present: the real parity law "
                           "above runs instead")
def test_tws_gate_names_the_dependency(spark, sf_dir):
    with pytest.raises(ImportError, match="protobuf"):
        stream_sessionize_tws(spark, sf_dir)
