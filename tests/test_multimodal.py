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


def test_parse_ppm_real_bytes():
    # hand-built P6 with known pixels: 2x2, values 0..11
    px = bytes(range(12))
    meta = MM._parse_ppm(b"P6\n2 2\n255\n" + px)
    assert (meta["width"], meta["height"], meta["channels"]) == (2, 2, 3)
    assert meta["px_mean"] == sum(range(12)) / 12
    assert (meta["px_min"], meta["px_max"]) == (0, 11)
    # comments + arbitrary whitespace in the header are legal PPM
    meta = MM._parse_ppm(b"P6 # comment\n 2\t2 # x\n255 " + px)
    assert (meta["width"], meta["height"]) == (2, 2)
    # truncated pixel data / wrong magic / bad maxval -> None
    assert MM._parse_ppm(b"P6\n2 2\n255\n" + px[:-1]) is None
    assert MM._parse_ppm(b"P5\n2 2\n255\n" + px) is None
    assert MM._parse_ppm(b"P6\n2 2\n65535\n" + px) is None


def test_parse_bmp_real_bytes():
    import struct

    hdr = b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
    hdr += struct.pack("<IiiHH", 40, 17, -9, 1, 24) + b"\x00" * 16
    meta = MM._parse_bmp(hdr)
    assert (meta["width"], meta["height"], meta["channels"]) == (17, 9, 3)
    assert MM._parse_bmp(b"XX" + hdr[2:]) is None


def test_parse_wav_real_bytes():
    # build a real WAV with the stdlib wave module -> independent bytes
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(b"\x01\x02\x03\x04" * 7)  # 7 frames of 2ch 16-bit
    w.close()
    meta = MM._parse_wav(buf.getvalue())
    assert meta == {"width": 7, "height": 8, "channels": 2}
    assert MM._parse_wav(b"RIFFxxxxNOPE") is None


def test_synth_media_real_decodes_for_real(spark):
    """The Spark-built PPM/WAV payloads are REAL container bytes: the
    pure-Python decoders parse them, the stdlib wave module agrees on
    the WAV fields, and decoded dims equal the synthesis arithmetic."""
    import io
    import wave

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = MM.synth_media_real(docs).collect()
    assert rows
    kinds = {r.media_type for r in rows}
    assert kinds == {"image", "audio", "video"}
    for r in rows:
        p = bytes(r.payload)
        assert r.byte_len == len(p)
        if r.media_type == "image":
            meta = MM._parse_ppm(p)
            assert meta is not None
            assert meta["width"] == r.doc_id % 13 + 2
            assert meta["height"] == r.doc_id % 7 + 2
            # pixel stats come from the actual md5-derived bytes
            body = p[p.index(b"255\n") + 4:]
            assert meta["px_mean"] == sum(body) / len(body)
        elif r.media_type == "audio":
            meta = MM._parse_wav(p)
            assert meta is not None
            assert meta["width"] == r.doc_id % 16 + 4
            assert meta["channels"] == r.doc_id % 2 + 1
            wf = wave.open(io.BytesIO(p))
            assert wf.getnframes() == meta["width"]
            assert wf.getnchannels() == meta["channels"]
            assert wf.getframerate() == 8000
            assert wf.getsampwidth() == 2
        else:
            assert len(p) == 64


def test_decode_media_auto_mixes_real_and_stub(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = MM.synth_media_real(docs)
    out = {r.doc_id: r for r in MM.decode_media(media, codec="auto").collect()}
    assert out and all(r.ok for r in out.values())
    for doc_id, r in out.items():
        if r.media_type == "image":
            assert (r.width, r.height, r.channels) == (
                doc_id % 13 + 2, doc_id % 7 + 2, 3
            )
        elif r.media_type == "audio":
            assert (r.width, r.height, r.channels) == (
                doc_id % 16 + 4, 8, doc_id % 2 + 1
            )
    # codec='real' must NOT silently fall back for video
    vid = media.filter("media_type = 'video'")
    with pytest.raises(Exception) as ei:
        MM.decode_media(vid, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


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


def test_malformed_containers_degrade_not_crash(spark):
    """Malformed container bytes must degrade per-row, never kill the
    Arrow batch: a PPM with non-numeric header tokens, a WAV whose fmt
    chunk claims 16 bytes but is truncated, and a sub-byte-width WAV
    are all 'not this format' (None), so codec='auto' falls back to the
    stub row instead of raising ValueError/struct.error/
    ZeroDivisionError through the decode stage."""
    import struct

    bad_ppm = b"P6\nab cd ef\n" + b"\x00" * 32
    trunc_wav = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVEfmt " + struct.pack(
        "<I", 16
    ) + b"\x01\x00"  # fmt body cut short
    subbyte_wav = (
        b"RIFF" + b"\x28\x00\x00\x00" + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 4000, 1, 4)  # bits=4
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    assert MM._parse_ppm(bad_ppm) is None
    assert MM._parse_wav(trunc_wav) is None
    assert MM._parse_wav(subbyte_wav) is None

    rows = [
        (1, "image", bytearray(bad_ppm), len(bad_ppm)),
        (2, "audio", bytearray(trunc_wav), len(trunc_wav)),
        (3, "audio", bytearray(subbyte_wav), len(subbyte_wav)),
    ]
    media = spark.createDataFrame(
        rows, "doc_id bigint, media_type string, payload binary, byte_len int"
    )
    out = {
        r.doc_id: r
        for r in MM.decode_media(media, codec="auto").collect()
    }
    assert set(out) == {1, 2, 3}
    # every row survived via the deterministic stub (ok=True, header-
    # derived dims), proving the fallback rather than a crash
    for r in out.values():
        assert r.ok and r.width is not None
