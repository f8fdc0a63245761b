"""Multimodal plumbing tests: mapInPandas feature extraction with the
deterministic fake decoder (schema, values, partition preservation), the
strict decoder's clear failure, and native frame sampling."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from reddit_big_data_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    byte_histogram_decoder,
    extract_features,
    frame_sample,
    strict_decoder,
    synth_media,
)


def test_synth_media_schema_and_determinism(spark):
    df = synth_media(spark, 30)
    assert {f.name for f in df.schema.fields} == {"media_id", "kind", "payload", "meta"}
    a = df.orderBy("media_id").collect()
    b = synth_media(spark, 30).orderBy("media_id").collect()
    assert a == b  # fully deterministic payloads
    assert isinstance(a[0]["payload"], bytearray | bytes)
    assert a[1]["meta"]["sample_rate"] == 16000


def test_extract_features_fake_decoder(spark):
    df = synth_media(spark, 24)
    out = extract_features(df)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 24
    src = {r["media_id"]: r for r in df.collect()}
    for mid, r in rows.items():
        want = byte_histogram_decoder(bytes(src[mid]["payload"]), r["kind"])
        assert r["features"] == pytest.approx(want)
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # L1-normalized
        assert r["n_bytes"] == len(src[mid]["payload"])


def test_extract_features_preserves_partitioning(spark):
    df = synth_media(spark, 40).repartition(5)
    out = extract_features(df)
    assert out.rdd.getNumPartitions() == 5  # mapInPandas is partition-local


def test_strict_decoder_is_clearly_stubbed(spark):
    with pytest.raises(NotImplementedError, match="media decoding"):
        strict_decoder(b"abc", "image")
    out = extract_features(synth_media(spark, 4), decoder=strict_decoder)
    with pytest.raises(Exception):  # surfaces from the executor too
        out.collect()


def test_frame_sample_native(spark):
    df = synth_media(spark, 12)
    frames = frame_sample(df, frame_bytes=16, every_n=2)
    rows = frames.collect()
    assert len(rows) > 0
    assert all(r["frame_idx"] % 2 == 0 for r in rows)
    # only video rows sampled
    kinds = {r["media_id"] for r in df.filter(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in rows} <= kinds
    # frame hex chunks are at most 2*frame_bytes chars
    assert all(len(r["frame_hex"]) <= 32 for r in rows)


def test_resize_images(spark):
    from reddit_big_data_spark.functions.multimodal import (
        byte_subsample_resizer,
        resize_images,
        strict_resizer,
    )

    df = synth_media(spark, 18)
    out = resize_images(df, target_w=8, target_h=4)
    assert out.schema == df.schema  # composes anywhere in a media pipeline
    rows = {r["media_id"]: r for r in out.collect()}
    src = {r["media_id"]: r for r in df.collect()}
    assert len(rows) == 18
    for mid, r in rows.items():
        if r["kind"] == "image":
            assert len(r["payload"]) == 8 * 4  # size set by TARGET only
            assert (r["meta"]["width"], r["meta"]["height"]) == (8, 4)
            assert bytes(r["payload"]) == byte_subsample_resizer(
                bytes(src[mid]["payload"]), 0, 0, 8, 4
            )
        else:  # non-image rows pass through untouched
            assert bytes(r["payload"]) == bytes(src[mid]["payload"])
            assert r["meta"] == src[mid]["meta"]


def test_strict_resizer_is_clearly_stubbed(spark):
    import pytest as _pytest

    from reddit_big_data_spark.functions.multimodal import (
        resize_images,
        strict_resizer,
    )

    with _pytest.raises(NotImplementedError, match="image resizing"):
        strict_resizer(b"abc", 1, 1, 2, 2)
    out = resize_images(synth_media(spark, 4), 2, 2, resizer=strict_resizer)
    with _pytest.raises(Exception):
        out.collect()
