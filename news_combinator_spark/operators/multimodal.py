"""Multimodal (image/audio/video) column plumbing.

The reference stores pictures out-of-band (qiniu bucket) with typed
metadata rows (`news_picture`, reetsee_news.sql:48-58; upload+retry
crawler.php:66-114; GC clearpic.php:38-77). Here the binary payload is
a first-class `binary` column with typed metadata, and decode /
feature-extract steps are Arrow `mapInPandas` kernels.

Image/audio codec libraries are NOT in this container, so the decode
kernels are deterministic STUBS (clearly marked): they parse only the
tiny self-describing header our fixture writer emits. The Spark-side
contract — schema, batch iteration, partitioning, GC — is real and
tested; swapping in PIL/ffmpeg later changes one function body.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, abstract_id long, day_time int, kind string, "
    "payload binary, ext map<string,string>"
)

_MAGIC = b"NCIM"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fixture payload: 4-byte magic + w/h/seed ints +
    (w*h) pseudo-pixel bytes. Stand-in for a real JPEG."""
    head = _MAGIC + struct.pack("<iii", width, height, seed)
    body = bytes(((seed + i * 31) % 251) for i in range(width * height))
    return head + body


def decode_image_meta(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: reads the fixture header. A real implementation
    would call PIL.Image.open here; anything without our magic raises
    NotImplementedError exactly like an unsupported codec would."""
    if payload is None or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real image codecs unavailable in this container; "
            "only NCIM fixture payloads are decodable"
        )
    w, h, seed = struct.unpack("<iii", payload[4:16])
    return w, h, seed


def with_image_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode -> (width, height, mean_pixel). The batch
    shape is the real contract: bytes in, numeric features out, one
    Arrow record batch at a time, no driver involvement."""

    def _feat(batches):
        for pdf in batches:
            ws, hs, means = [], [], []
            for payload in pdf[payload_col]:
                w, h, seed = decode_image_meta(bytes(payload))
                body = bytes(payload)[16 : 16 + w * h]
                ws.append(w)
                hs.append(h)
                means.append(sum(body) / max(len(body), 1))
            out = pdf[[c for c in pdf.columns if c != payload_col]].copy()
            out["width"] = ws
            out["height"] = hs
            out["mean_pixel"] = means
            yield out

    keep = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != payload_col
    )
    return df.mapInPandas(
        _feat, schema=f"{keep}, width int, height int, mean_pixel double"
    )


def gc_old_media(media: DataFrame, today_day: int, keep_days: int = 5) -> DataFrame:
    """The clearpic GC as a filter: keep rows newer than the cutoff
    (clearpic.php:38-77 deletes day_time <= today-5d). On Iceberg this
    is a row-level DELETE; on parquet it is rewrite-by-filter."""
    cutoff = today_day - keep_days
    return media.filter(F.col("day_time") > cutoff)
