"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample run
over ``mapInPandas`` so data moves in Arrow batches. Within a batch the
per-PAYLOAD work is a Python loop by necessity — each payload is an opaque
variable-size byte blob a real codec decodes one at a time — but the
numeric work per payload (pixel/sample math) is numpy-vectorized, and
nothing crosses the JVM/Python boundary per row (one Arrow crossing per
batch).

The container has no image/audio codecs (no PIL/ffmpeg/librosa), so the
REAL decode step is stubbed behind a clearly-marked NotImplementedError —
but the Spark-side plumbing is fully real and tested: schemas, Arrow batch
shapes, UDF signatures, partitioning, and a deterministic FAKE codec
(seeded synthetic payloads with a parseable header) that exercises every
byte path end to end. Swapping `_decode_fake_*` for a real codec changes
one function per modality and nothing else.

Payload formats of the deterministic fake codec (little-endian u32 fields):

    image: b"FIMG" w h      + w*h   uint8 gray pixels
    audio: b"FAUD" sr n     + n     int16 samples
    video: b"FVID" f w h    + f*w*h uint8 gray frame pixels
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

FEATURE_SCHEMA = "media_id long, kind string, features array<double>"
RESIZE_SCHEMA = (
    "media_id long, width int, height int, payload binary"
)
FRAME_SCHEMA = "media_id long, frame_idx int, width int, height int, payload binary"


# ---------------------------------------------------------------------------
# Deterministic fake codec (the container has no real media libraries)
# ---------------------------------------------------------------------------

def encode_fake_image(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h, dtype=np.uint8)
    return b"FIMG" + struct.pack("<II", w, h) + px.tobytes()


def encode_fake_audio(sr: int, n: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32767, size=n, dtype=np.int16)
    return b"FAUD" + struct.pack("<II", sr, n) + samples.tobytes()


def encode_fake_video(frames: int, w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=frames * w * h, dtype=np.uint8)
    return b"FVID" + struct.pack("<III", frames, w, h) + px.tobytes()


def _decode_fake_image(payload: bytes) -> np.ndarray:
    if payload[:4] != b"FIMG":
        # REAL decode would go here (PIL.Image.open) — not available in
        # this container; the stub is the documented boundary.
        raise NotImplementedError(
            "real image decode requires PIL/libjpeg — not present in this "
            "environment; only the FIMG fake codec is supported"
        )
    w, h = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload, np.uint8, count=w * h, offset=12).reshape(h, w)


def _decode_fake_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if payload[:4] != b"FAUD":
        raise NotImplementedError(
            "real audio decode requires ffmpeg/librosa — not present; only "
            "the FAUD fake codec is supported"
        )
    sr, n = struct.unpack("<II", payload[4:12])
    return sr, np.frombuffer(payload, np.int16, count=n, offset=12)


def _decode_fake_video(payload: bytes) -> np.ndarray:
    if payload[:4] != b"FVID":
        raise NotImplementedError(
            "real video decode requires ffmpeg — not present; only the "
            "FVID fake codec is supported"
        )
    f, w, h = struct.unpack("<III", payload[4:16])
    return np.frombuffer(payload, np.uint8, count=f * w * h, offset=16).reshape(f, h, w)


# ---------------------------------------------------------------------------
# Synthetic media table
# ---------------------------------------------------------------------------

def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table cycling image/audio/video rows."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            rows.append(
                (i, kind, bytearray(encode_fake_image(w, h, seed + i)),
                 (w, h, None, None, "image/x-fake"))
            )
        elif kind == "audio":
            sr, ns = 8000, 1000 + (i % 5) * 100
            rows.append(
                (i, kind, bytearray(encode_fake_audio(sr, ns, seed + i)),
                 (None, None, sr, None, "audio/x-fake"))
            )
        else:
            f, w, h = 4 + i % 3, 16, 16
            rows.append(
                (i, kind, bytearray(encode_fake_video(f, w, h, seed + i)),
                 (w, h, None, f, "video/x-fake"))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Vectorized media operators (mapInPandas — one numpy pass per Arrow batch)
# ---------------------------------------------------------------------------

def extract_features(media: DataFrame) -> DataFrame:
    """Per-item feature vector: [mean, std, min, max] + 8-bin histogram
    (pixels / samples / per-frame means). The feature math is numpy over
    each Arrow batch; a real pipeline swaps the decode call only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind == "image":
                    arr = _decode_fake_image(bytes(payload)).astype(np.float64)
                    hist = np.histogram(arr, bins=8, range=(0, 256))[0]
                elif kind == "audio":
                    _, samples = _decode_fake_audio(bytes(payload))
                    arr = samples.astype(np.float64)
                    hist = np.histogram(arr, bins=8, range=(-32768, 32768))[0]
                else:
                    vid = _decode_fake_video(bytes(payload)).astype(np.float64)
                    arr = vid.mean(axis=(1, 2))  # per-frame means
                    hist = np.histogram(vid, bins=8, range=(0, 256))[0]
                feats = [
                    float(arr.mean()), float(arr.std()),
                    float(arr.min()), float(arr.max()),
                    *[float(x) for x in hist],
                ]
                out.append({"media_id": int(mid), "kind": kind, "features": feats})
            yield pd.DataFrame(out, columns=["media_id", "kind", "features"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize for image rows (numpy index grid — the
    interpolation a real pipeline delegates to PIL/cv2)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image":
                    continue
                img = _decode_fake_image(bytes(payload))
                h, w = img.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = img[np.ix_(yi, xi)]
                out.append(
                    {
                        "media_id": int(mid),
                        "width": out_w,
                        "height": out_h,
                        "payload": encode_fake_image_from_array(small),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "payload"])

    return media.mapInPandas(run, RESIZE_SCHEMA)


def encode_fake_image_from_array(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return b"FIMG" + struct.pack("<II", w, h) + arr.astype(np.uint8).tobytes()


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Every-k-th frame of each video as an image payload row (the
    frame-sampling step of a video training pipeline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                vid = _decode_fake_video(bytes(payload))
                for idx in range(0, vid.shape[0], every):
                    frame = vid[idx]
                    out.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": idx,
                            "width": frame.shape[1],
                            "height": frame.shape[0],
                            "payload": encode_fake_image_from_array(frame),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "width", "height", "payload"]
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
