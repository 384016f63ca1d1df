"""Multimodal (image/audio/video) column operators.

Large-scale training pipelines carry media as opaque ``binary`` columns
plus typed metadata, and run decode / feature-extraction / resize /
frame-sampling as Arrow-batched Python stages. This module implements
that plumbing for real — schemas, partition-preserving ``mapInPandas``
stages, deterministic batching — while the actual codecs are STUBBED
(this container ships no image/audio libraries): ``_decode_stub`` derives
deterministic pixel metadata from the payload header bytes, and the
import-gated ``_decode_real`` raises NotImplementedError where PIL/ffmpeg
would plug in.

Everything here is deterministic and relationally reconstructible, so
the DuckDB oracle can verify the full decode -> feature path bit-for-bit
(see queries.q_media_decode / q_media_features).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, byte_len int"
)
DECODE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, width int, height int, "
    "channels int, ok boolean"
)
FEATURE_DIM = 8
FEATURE_SCHEMA = "doc_id bigint, feature array<float>"


def synth_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake binary payload to each document row:
    64 bytes = unhex(md5(text) * 4). Stands in for an image/audio blob;
    being md5-derived makes every downstream stage SQL-reconstructible."""
    payload_hex = F.repeat(F.md5(F.col("text")), 4)
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        F.unhex(payload_hex).alias("payload"),
        F.length(F.unhex(payload_hex)).cast("int").alias("byte_len"),
    )


def _decode_real(payload: bytes, media_type: str):
    """The real-codec seam. Images decode through PIL when it is
    importable (tests/test_multimodal.py carries a skip-marked
    integration test for that path); audio/video would go through
    soundfile / ffmpeg, which this container never ships, so those
    remain clearly-marked stubs."""
    if media_type == "image":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image codec requested but PIL is not installed"
            ) from e
        import io

        with Image.open(io.BytesIO(bytes(payload))) as im:
            return {
                "width": im.width,
                "height": im.height,
                "channels": len(im.getbands()),
            }
    raise NotImplementedError(
        "no %s codec in this environment" % media_type
    )


def _decode_stub(payload: bytes, media_type: str):
    """Deterministic fake decode: metadata from the header bytes.
    width/height from bytes 0/1, channels fixed per media type."""
    if len(payload) < 2:
        return None
    channels = {"image": 3, "audio": 1, "video": 3}.get(media_type, 0)
    return {
        "width": payload[0] % 64 + 1,
        "height": payload[1] % 64 + 1,
        "channels": channels,
    }


def decode_media(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """binary payload -> typed metadata, one Arrow batch at a time.

    The batch shape is the part that matters at 100 TB: payloads never
    leave the executor, the stage is map-only (no shuffle), and the
    output drops the binary column so downstream stages shuffle only
    metadata."""
    decode = _decode_real if use_real_codec else _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [m["width"] if m else None for m in metas],
                    "height": [m["height"] if m else None for m in metas],
                    "channels": [m["channels"] if m else None for m in metas],
                    "ok": [m is not None for m in metas],
                }
            )

    return media.mapInPandas(run, schema=DECODE_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """payload -> fixed-dim float feature vector (deterministic stand-in
    for an embedding model: bytes of sha256(hex(payload)) scaled to
    [0, 1); hashing the hex form keeps the value reconstructible by
    SQL engines whose sha256 is string-only)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [
                    b / 256.0
                    for b in hashlib.sha256(
                        bytes(p).hex().encode()
                    ).digest()[:FEATURE_DIM]
                ]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: passes payload through and rewrites the metadata —
    the real kernel would transform pixels; the Spark contract (map-only,
    binary in/binary out, metadata columns updated) is what is tested."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    schema = MEDIA_SCHEMA + ", width int, height int"
    src = media.withColumn("width", F.lit(0)).withColumn("height", F.lit(0))
    return src.mapInPandas(run, schema=schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per sampled
    'frame' (byte offset), exploding within the Python stage exactly the
    way a demuxer would emit frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, frames = [], [], []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "video":
                    continue
                for off in range(0, len(payload), every_n_bytes):
                    ids.append(doc_id)
                    offs.append(off)
                    frames.append(payload[off : off + every_n_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_offset": offs, "frame": frames}
            )

    return media.mapInPandas(
        run, schema="doc_id bigint, frame_offset int, frame binary"
    )
