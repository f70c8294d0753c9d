"""Multimodal plumbing tests: schema, Arrow batch shapes, deterministic
byte-level features, and the explicit NotImplementedError codec boundary."""

from __future__ import annotations

import hashlib

import pytest

from movie_recommendation_etl_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_media_features,
)
from movie_recommendation_etl_spark.sources.catalog import load_table


def test_media_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_fake_media(docs)
    feats = extract_media_features(media).collect()
    assert len(feats) == 50
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in feats:
        blob = (texts[r["doc_id"]] * 2).encode()
        assert r["n_bytes"] == len(blob)
        assert r["content_md5"] == hashlib.md5(blob).hexdigest()
        assert len(r["byte_histogram_head"]) == 8
        assert sum(r["byte_histogram_head"]) == min(len(blob), 4096)


def test_media_meta_schema(spark, sf_dir):
    media = attach_fake_media(load_table(spark, sf_dir, "documents").limit(5))
    field = dict(zip(media.schema.names, media.schema.fields))["media_meta"]
    assert [f.name for f in field.dataType.fields] == [
        "media_type",
        "n_bytes",
        "width",
        "height",
    ]
    assert media.schema["media_data"].dataType.typeName() == "binary"


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image/png")
