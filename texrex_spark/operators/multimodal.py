"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schema, partition-aware batching, Arrow-shaped UDF
signatures) real and the codec-dependent decode steps stubbed.

The interleaved docs table references media by ``media_ref`` (spans with
kind='media', BASELINE.json input_hint).  A media table carries the bytes:

    media(media_ref string, kind string, payload binary,
          meta struct<width:int, height:int, duration_ms:int, mime:string>)

Real pipelines decode/resize/frame-sample in ``mapInPandas`` over that
table; the image/audio libraries are not in this container, so the decode
kernel is a deterministic fake behind ``decode_stub`` (shape-checked and
tested; swap in PIL/av by replacing one function).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,mime:string>"
)


def synth_media_df(spark, cleaned: DataFrame) -> DataFrame:
    """Deterministic media table for every media span in a cleaned corpus:
    payload = repeatable bytes derived from the ref (stands in for the
    fetched object)."""
    refs = (
        cleaned.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([synth_media_row(ref) for ref in pdf["media_ref"]])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def synth_media_row(ref: str) -> dict:
    """Pure per-ref kernel behind synth_media_df (md5-seeded, so the
    payload is a deterministic function of the ref alone)."""
    seed = hashlib.md5(ref.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    payload = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
    return {
        "media_ref": ref,
        "kind": "image",
        "payload": payload,
        "meta": {"width": w, "height": h, "duration_ms": 0, "mime": "image/fake"},
    }


def decode_stub(payload: bytes, meta: dict) -> np.ndarray:
    """STUB decode: interprets the payload as a (h, w) uint8 grayscale
    array.  Replace with PIL.Image.open / av decoding in production —
    signature and batch shape stay identical."""
    w, h = meta["width"], meta["height"]
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) != w * h:
        raise ValueError("payload/meta size mismatch")
    return arr.reshape(h, w)


FEATURE_SCHEMA = (
    "media_ref string, width int, height int, mean_intensity double, "
    "std_intensity double, phash long"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode -> feature-extract per Arrow batch: mean/std intensity and a
    64-bit average-hash (pHash-style) over an 8x8 downsample.  The decode
    is the stub; the distribution plumbing (mapInPandas, batch columns,
    binary transfer) is the real thing."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    feature_row(ref, payload, meta)
                    for ref, payload, meta in zip(
                        pdf["media_ref"], pdf["payload"], pdf["meta"]
                    )
                ]
            )

    return media.mapInPandas(work, FEATURE_SCHEMA)


def feature_row(ref: str, payload: bytes, meta: dict) -> dict:
    """Pure per-object kernel behind extract_features."""
    img = decode_stub(payload, meta)
    h, w = img.shape
    ys = np.linspace(0, h - 1, 8).astype(int)
    xs = np.linspace(0, w - 1, 8).astype(int)
    tile = img[np.ix_(ys, xs)].astype(np.float64)
    bits = (tile > tile.mean()).flatten()
    phash = 0
    for i, b in enumerate(bits):
        if b:
            phash |= 1 << i
    return {
        "media_ref": ref,
        "width": w,
        "height": h,
        "mean_intensity": float(img.mean()),
        "std_intensity": float(img.std()),
        "phash": np.uint64(phash).astype(np.int64),
    }


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize through the stub decoder — the shape of a
    real resize stage (decode -> transform -> re-encode bytes)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, meta in zip(pdf["media_ref"], pdf["payload"], pdf["meta"]):
                img = decode_stub(payload, meta)
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                out = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": "image",
                        "payload": out.tobytes(),
                        "meta": {"width": width, "height": height,
                                 "duration_ms": 0, "mime": "image/fake"},
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(work, MEDIA_SCHEMA)
