"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs.  The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition-size control — is real and tested; the actual codec work is
STUBBED: this container has no image/audio libraries, so ``decode_media``
uses a clearly-marked deterministic fake (derived from the bytes' md5) and
``decode_media_real`` raises NotImplementedError until Pillow/librosa are
importable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

MEDIA_META_DDL = (
    "media_md5 string, media_bytes bigint, format string, width int, height int, "
    "n_frames int, sample_rate int"
)

_FORMATS = ["jpeg", "png", "webp", "gif"]


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decode: metadata derived from content hash.
    CLEARLY A STUB — replace with PIL/ffprobe when libs are available."""
    h = hashlib.md5(payload or b"").hexdigest()
    v = int(h[:8], 16)
    return {
        "media_md5": h,
        "media_bytes": len(payload or b""),
        "format": _FORMATS[v % len(_FORMATS)],
        "width": 64 + v % 1920,
        "height": 64 + (v >> 8) % 1080,
        "n_frames": 1 + (v >> 16) % 32,
        "sample_rate": 8000 + (v >> 4) % 40000,
    }


def _try_real_decode(payload: bytes) -> dict:
    try:
        import io

        from PIL import Image  # noqa: F401  (not in this image)
    except ImportError as e:
        raise NotImplementedError(
            "real media decode needs Pillow/librosa; not present in this environment"
        ) from e
    img = Image.open(io.BytesIO(payload))
    return {
        "media_md5": hashlib.md5(payload).hexdigest(),
        "media_bytes": len(payload),
        "format": (img.format or "unknown").lower(),
        "width": img.width,
        "height": img.height,
        "n_frames": getattr(img, "n_frames", 1),
        "sample_rate": 0,
    }


def decode_media(df, binary_col: str = "html", id_cols: tuple[str, ...] = ("url",), real: bool = False):
    """binary column -> typed media-metadata struct via mapInPandas.

    Arrow-batched: each pandas batch is processed as a whole; the decode
    itself is per-cell (unavoidable for codecs) but stays inside the batch
    loop — the Spark surface is a single mapInPandas."""
    id_ddl = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols)
    schema = f"{id_ddl}, {MEDIA_META_DDL}"
    decode = _try_real_decode if real else _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(b if isinstance(b, (bytes, bytearray)) else bytes(b or b"")) for b in pdf[binary_col]]
            out = pd.DataFrame(metas)
            for c in reversed(id_cols):
                out.insert(0, c, pdf[c].to_numpy())
            yield out

    return df.mapInPandas(fn, schema=schema)


def frame_sample(df, binary_col: str = "html", every_n: int = 8, id_cols: tuple[str, ...] = ("url",)):
    """Frame-sampling plumbing: one output row per sampled frame index.
    Frame count comes from the (stub) decode; bytes are NOT duplicated —
    only (id, frame_idx) rows flow out, the real extractor would attach
    decoded frames here."""
    from pyspark.sql import functions as F

    meta = decode_media(df, binary_col, id_cols)
    return meta.select(
        *id_cols,
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
