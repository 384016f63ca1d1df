"""Multimodal binary-column plumbing: schemas, Arrow batch shapes,
deterministic stub kernels, and the real-codec gate."""

import pytest

from raptor_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return MM.synth_media(docs).cache()


def test_synth_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,media_type:string,payload:binary,byte_len:int>"
    )
    rows = media.limit(5).collect()
    assert all(len(r.payload) == 64 and r.byte_len == 64 for r in rows)


def test_decode_metadata_deterministic(media):
    out = MM.decode_media(media)
    rows = out.collect()
    assert all(r.ok for r in rows)
    assert all(1 <= r.width <= 64 and 1 <= r.height <= 64 for r in rows)
    assert {r.channels for r in rows} == {1, 3}
    # rerun -> identical (deterministic across retries)
    again = {r.doc_id: (r.width, r.height) for r in MM.decode_media(media).collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_real_codec_gate(media):
    with pytest.raises(Exception) as ei:
        MM.decode_media(media, use_real_codec=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_real_codec_wiring(media, monkeypatch):
    # the use_real_codec flag must route every row through _decode_real —
    # proven with a fake codec so the stub can never silently diverge
    # from the real path's shape
    calls = {"n": 0}

    def fake(payload, media_type):
        calls["n"] += 1
        return {"width": 640, "height": 480, "channels": 4}

    monkeypatch.setattr(MM, "_decode_real", fake)
    rows = MM.decode_media(media.limit(20), use_real_codec=True).collect()
    assert rows and all(
        (r.width, r.height, r.channels) == (640, 480, 4) for r in rows
    )


def test_real_codec_pil_integration(spark):
    # end-to-end through an actual codec; runs wherever PIL exists
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    import io

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), len(buf.getvalue()))],
        "doc_id bigint, media_type string, payload binary, byte_len int",
    )
    row = MM.decode_media(media, use_real_codec=True).collect()[0]
    assert (row.width, row.height, row.channels) == (17, 9, 3)
    del PIL


def test_feature_shape(media):
    rows = MM.extract_features(media).limit(10).collect()
    for r in rows:
        assert len(r.feature) == MM.FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.feature)


def test_resize_rewrites_metadata(media):
    out = MM.resize_media(media, 224, 224).limit(5).collect()
    assert all(r.width == 224 and r.height == 224 for r in out)
    assert all(len(r.payload) == 64 for r in out)


def test_frame_sampling_only_video(media):
    frames = MM.sample_frames(media, every_n_bytes=16)
    rows = frames.collect()
    assert rows and all(r.frame_offset in (0, 16, 32, 48) for r in rows)
    assert all(len(r.frame) == 16 for r in rows)
    n_video = media.filter("media_type = 'video'").count()
    assert len(rows) == 4 * n_video
