"""Multimodal plumbing: schemas, Arrow batch shape, stub boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cargo_dupes_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    exact_media_dupes,
    extract_features,
    resize_stub,
    synthetic_media,
)


def test_feature_schema_and_determinism(spark):
    media = synthetic_media(spark, n=24)
    feats = extract_features(media, strict=False)
    assert feats.schema == FEATURE_SCHEMA
    rows1 = sorted((r.media_id, r.phash) for r in feats.collect())
    rows2 = sorted((r.media_id, r.phash) for r in extract_features(media).collect())
    assert rows1 == rows2
    dim = len(feats.first().feature)
    assert dim == 32


def test_planted_dupes_found(spark):
    media = synthetic_media(spark, n=48)
    dupes = exact_media_dupes(extract_features(media))
    got = {r.media_id for r in dupes.collect()}
    planted = {i for i in range(48) if i % 6 == 5} | {
        i - 3 for i in range(48) if i % 6 == 5
    }
    assert planted <= got


def test_strict_mode_raises(spark):
    media = synthetic_media(spark, n=6)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, strict=True).collect()


def test_resize_stub_shape(spark):
    media = synthetic_media(spark, n=9)
    resized = resize_stub(media, 32, 24)
    assert resized.schema == media.schema
    row = resized.first()
    assert row.meta.width == 32 and row.meta.height == 24
