"""Multimodal column plumbing: image/audio/video as opaque binary
columns + typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract (schemas, batch shapes, partitioning) is real
and tested; the codec step is STUBBED — image/audio libraries are not
available in this environment, so ``decode_image_meta`` parses only
formats with trivially parseable headers (PNG/GIF/fake-RAW) and
``extract_image_features`` computes deterministic fake features from
the bytes. Swapping in a real codec changes ONE function body and no
plan shape. Functions that would need a real codec raise
``NotImplementedError`` with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, n_frames int, sample_rate int"
)

IMAGE_META_SCHEMA = "media_id string, mime string, width int, height int, ok boolean"


def decode_image_meta(media: DataFrame) -> DataFrame:
    """Parse image dimensions from headers (PNG/GIF supported; others ->
    ok=false). Header parsing is pure byte math — no codec needed."""

    def batches(it):
        for pdf in it:
            ids, mimes, ws, hs, oks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                mime, w, h, ok = "application/octet-stream", 0, 0, False
                if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
                    w, h = struct.unpack(">II", b[16:24])
                    mime, ok = "image/png", True
                elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
                    w, h = struct.unpack("<HH", b[6:10])
                    mime, ok = "image/gif", True
                ids.append(mid)
                mimes.append(mime)
                ws.append(w)
                hs.append(h)
                oks.append(ok)
            yield pd.DataFrame({"media_id": ids, "mime": mimes, "width": ws, "height": hs, "ok": oks})

    return media.select("media_id", "payload").mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def decode_image_pixels(media: DataFrame) -> DataFrame:
    """Full pixel decode — requires a codec library not present here."""
    raise NotImplementedError(
        "Pixel decode needs an image codec (PIL/opencv), not available in "
        "this environment. Plug a decoder into extract_image_features()'s "
        "`_decode` seam; the Spark plan/schema around it is in place."
    )


FEATURE_SCHEMA = "media_id string, feature array<float>"


def extract_image_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic per-item feature vector.

    `_decode` is the codec seam: the stub derives a reproducible
    pseudo-feature from payload bytes so the distributed plumbing
    (Arrow batches, schema, downstream ANN joins) is fully exercised."""

    def _decode(b: bytes) -> np.ndarray:  # codec seam — replace with a real model/codec
        h = np.frombuffer(b, dtype=np.uint8)
        if len(h) == 0:
            return np.zeros(dim, dtype=np.float32)
        reps = int(np.ceil(dim / len(h)))
        v = np.tile(h, reps)[:dim].astype(np.float32)
        return v / 255.0

    def batches(it):
        for pdf in it:
            feats = [_decode(bytes(p) if p is not None else b"").tolist() for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.select("media_id", "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plan for video rows: emits (media_id, frame_idx)
    rows natively from n_frames metadata; the per-frame pixel fetch is
    the codec seam. Explode happens JVM-side — no Python."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))).alias("frame_idx"),
        )
    )


def make_synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture: valid PNG/GIF headers + fake video/audio."""
    rows = []
    for i in range(n):
        kind = ("image", "image", "video", "audio")[i % 4]
        if kind == "image" and i % 2 == 0:
            w, h = 16 + i % 7, 9 + i % 5
            payload = (
                b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" + b"IHDR"
                + struct.pack(">II", w, h) + bytes([i % 251]) * 32
            )
            rows.append((f"m{i}", kind, payload, "image/png", w, h, 0, 0))
        elif kind == "image":
            w, h = 20 + i % 11, 10 + i % 3
            payload = b"GIF89a" + struct.pack("<HH", w, h) + bytes([i % 251]) * 16
            rows.append((f"m{i}", kind, payload, "image/gif", w, h, 0, 0))
        elif kind == "video":
            rows.append((f"m{i}", kind, bytes([i % 251]) * 64, "video/fake", 0, 0, 30 + i, 0))
        else:
            rows.append((f"m{i}", kind, bytes([i % 251]) * 48, "audio/fake", 0, 0, 0, 16000))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
