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


def test_resize_media_shape_and_meta(media):
    from fotmobdatapipeline_spark.multimodal import resize_media

    out = resize_media(media, width=16, height=4)
    assert [f.name for f in out.schema.fields] == ["doc_id", "payload", "meta"]
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r["payload"]) == 16 * 4
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 4
        assert r["meta"]["n_bytes"] == 64
        assert r["meta"]["mime"] == "image/raw"


def test_sample_frames_fanout_and_provenance(spark, media):
    from fotmobdatapipeline_spark.multimodal import fake_frame_splitter, sample_frames
    from fotmobdatapipeline_spark.sources.registry import read_table

    frames = sample_frames(media, every_n=4, max_frames=8)
    got = {}
    for r in frames.collect():
        got.setdefault(r["doc_id"], []).append((r["frame_idx"], bytes(r["frame"])))
    docs = {
        r["doc_id"]: r["text"].encode()
        for r in read_table(spark, SF_SMALL, "documents").collect()
    }
    assert set(got) <= set(docs)
    for did, text in list(docs.items())[:20]:
        want = fake_frame_splitter(text)[::4][:8]
        have = sorted(got.get(did, []))
        assert [f for _, f in have] == want
        assert [i for i, _ in have] == [k * 4 for k in range(len(want))]


def test_arrow_feature_extraction_matches_pandas_path(spark):
    """mapInArrow and mapInPandas feature extraction must be
    row-identical — same decoder, no pandas conversion in the former."""
    from fotmobdatapipeline_spark.multimodal.binary_ops import (
        attach_binary_payload,
        extract_features,
        extract_features_arrow,
        fake_decoder,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents").limit(100)
    media = attach_binary_payload(docs)
    a = sorted(extract_features_arrow(media, fake_decoder).collect())
    p = sorted(extract_features(media, fake_decoder).collect())
    assert a == p and len(a) == 100
