"""Multimodal binary-column plumbing: schema, Arrow batching, decode
stub gating."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    from fotmobdatapipeline_spark.multimodal import attach_binary_payload
    from fotmobdatapipeline_spark.sources.registry import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    return attach_binary_payload(docs).cache()


def test_payload_layout(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    row = media.first()
    assert row["meta"]["mime"] == "text/plain"
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_feature_extraction_with_fake_decoder(spark, media):
    from fotmobdatapipeline_spark.multimodal import extract_features, fake_decoder
    from fotmobdatapipeline_spark.sources.registry import read_table

    feats = extract_features(media, decoder=fake_decoder)
    rows = {r["doc_id"]: r for r in feats.collect()}
    docs = {r["doc_id"]: r["text"] for r in read_table(spark, SF_SMALL, "documents").collect()}
    assert set(rows) == set(docs)
    sample_id = min(rows)
    payload = docs[sample_id].encode()
    assert rows[sample_id]["n_bytes"] == len(payload)
    assert rows[sample_id]["header_hex"] == payload[:4].hex().upper()
    assert rows[sample_id]["feature"] == fake_decoder(payload)
    assert len(rows[sample_id]["feature"]) == 8


def test_stub_decoder_gates_clearly(media):
    from fotmobdatapipeline_spark.multimodal import extract_features

    feats = extract_features(media)  # default stub decoder
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        feats.collect()
