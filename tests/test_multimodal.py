"""Multimodal plumbing: binary columns, Arrow batch shapes, stubs."""

from __future__ import annotations

import pytest

from covid_custom_sql_engine_spark.functions import multimodal as mm


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF")


def test_fake_decode_features_deterministic():
    f = mm.fake_decode_features(b"abc")
    assert f == {"n_bytes": 3, "byte_sum": 294, "byte_mean": 98.0, "head_hex": "616263"}
    assert mm.fake_decode_features(None)["n_bytes"] == 0


def test_extract_features_values(spark):
    df = spark.createDataFrame(
        [(1, "image", b"abc"), (2, "audio", b"\x00\xff")],
        "media_id long, media_type string, payload binary",
    )
    rows = {r.media_id: r for r in mm.extract_features(df).collect()}
    assert rows[1].n_bytes == 3 and rows[1].byte_sum == 294 and rows[1].head_hex == "616263"
    assert rows[2].n_bytes == 2 and rows[2].byte_sum == 255
    assert rows[2].byte_mean == pytest.approx(127.5)


def test_documents_as_media_roundtrip(spark, sf_dir):
    from covid_custom_sql_engine_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(10)
    media = mm.documents_as_media(d)
    assert [f.name for f in media.schema.fields] == [f.name for f in mm.MEDIA_SCHEMA.fields]
    feats = mm.extract_features(media)
    joined = feats.join(
        d.selectExpr("doc_id AS media_id", "n_chars"), "media_id"
    ).collect()
    for r in joined:
        assert r.n_bytes >= 1  # utf-8 bytes of non-empty text


def test_frame_sample_plan_counts(spark):
    df = spark.createDataFrame(
        [(1, "video", None, None, None, 3500), (2, "image", None, None, None, 0)],
        "media_id long, media_type string, payload binary, width int, height int, duration_ms long",
    )
    rows = mm.frame_sample_plan(df, every_ms=1000).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r.frame_ts_ms)
    assert sorted(by_id[1]) == [0, 1000, 2000]  # floor(3500/1000)=3 frames
    assert 2 not in by_id  # images don't fan out
