"""Multimodal binary-column plumbing: schema, Arrow batch shape, decode
stub gating, frame-sampling arithmetic."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lswms_forage_etl_spark.operators.multimodal import (
    byte_histogram,
    decode_media,
    frame_index,
    media_stats,
    synth_media,
)


def _docs(spark):
    rows = [(i, "x" * (10 + i * 7), "en", "web", 10 + i * 7)
            for i in range(12)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_synth_media_schema_and_kinds(spark):
    m = synth_media(_docs(spark))
    assert [f.name for f in m.schema.fields] == \
        ["media_id", "kind", "payload", "meta"]
    assert m.schema["payload"].dataType.typeName() == "binary"
    kinds = {r["kind"] for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    # video rows get frames, audio rows get sample_rate, exclusively
    rows = m.collect()
    for r in rows:
        if r["kind"] == "video":
            assert r["meta"]["frames"] is not None
        else:
            assert r["meta"]["frames"] is None
        if r["kind"] == "audio":
            assert r["meta"]["sample_rate"] == 16000


def test_media_stats_payload_bytes(spark):
    got = {r["media_id"]: r for r in media_stats(synth_media(_docs(spark))).collect()}
    assert got[0]["n_bytes"] == 10  # "x"*10 in UTF-8
    assert got[1]["n_bytes"] == 17


def test_frame_index_sampling(spark):
    fi = frame_index(synth_media(_docs(spark)), every_n=10)
    rows = fi.collect()
    assert rows, "expected at least one video"
    for r in rows:
        assert r["frame_idx"] % 10 == 0
        assert 0 <= r["frame_idx"] < r["frames"]
    # exact count: ceil(frames / 10) per video
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frames"])
    m = {r["media_id"]: r["meta"]["frames"]
         for r in synth_media(_docs(spark)).where("kind = 'video'").collect()}
    for mid, frames in m.items():
        assert len(per[mid]) == (frames + 9) // 10


def test_byte_histogram_matches_numpy(spark):
    docs = _docs(spark)
    h = byte_histogram(synth_media(docs), bins=16)
    got = {r["media_id"]: r["features"] for r in h.collect()}
    assert len(got) == 12
    for mid, feats in got.items():
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-6
    # doc 0 = "x"*10: every byte is ord('x')=120 -> bin 120//16 = 7
    assert got[0][7] == 1.0


def test_decode_media_fake_and_gate(spark):
    m = synth_media(_docs(spark))
    out = decode_media(m, fake=True).collect()
    assert len(out) == 12
    byid = {r["media_id"]: r for r in out}
    # payload of doc 0 is all 'x' (120): mean intensity exactly 120
    assert byid[0]["mean_intensity"] == 120.0
    assert byid[0]["decoded_width"] == (10 * 7) % 1920 + 16
    with pytest.raises(NotImplementedError):
        decode_media(m, fake=False)
