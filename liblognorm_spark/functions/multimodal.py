"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata structs.  The
Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partition-size control — is real and tested.

Codec status in this container (no Pillow/ffmpeg):

* ``real=True`` REALLY decodes PNG (zlib inflate + scanline unfilter with
  exact pixel sums), GIF (block walk, true frame count), JPEG (SOF marker
  scan) and WAV (stdlib wave) via the pure-stdlib parsers in
  :mod:`liblognorm_spark.functions.codecs`; other formats fall back to
  Pillow when importable, else emit ``format='unknown'`` rows (never a
  silent drop).
* the default path keeps the deterministic md5-derived FAKE (clearly a
  stub) so the DuckDB-mirrored oracle for arbitrary binary stays exact.
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


REAL_MEDIA_META_DDL = (
    "media_md5 string, media_bytes bigint, format string, width int, height int, "
    "bit_depth int, channels int, n_frames int, sample_rate int, "
    "px_sum bigint, n_px int"
)

_REAL_UNKNOWN = {
    "format": "unknown", "width": None, "height": None, "bit_depth": None,
    "channels": None, "n_frames": None, "sample_rate": None,
    "px_sum": None, "n_px": None,
}


def _try_real_decode(payload: bytes) -> dict:
    """Actual decode: stdlib codecs first (PNG/GIF/JPEG/WAV — real in this
    container), Pillow for anything else when importable, 'unknown' rows
    otherwise."""
    from liblognorm_spark.functions.codecs import sniff_decode

    base = {
        "media_md5": hashlib.md5(payload or b"").hexdigest(),
        "media_bytes": len(payload or b""),
    }
    meta = sniff_decode(payload)
    if meta is not None:
        return {**base, **meta}
    try:
        import io

        from PIL import Image
    except ImportError:
        return {**base, **_REAL_UNKNOWN}
    try:
        img = Image.open(io.BytesIO(payload))
    except Exception:
        return {**base, **_REAL_UNKNOWN}
    return {
        **base,
        "format": (img.format or "unknown").lower(),
        "width": img.width,
        "height": img.height,
        "bit_depth": 8,
        "channels": len(img.getbands()),
        "n_frames": getattr(img, "n_frames", 1),
        "sample_rate": 0,
        "px_sum": None,
        "n_px": None,
    }


def decode_media(df, binary_col: str = "html", id_cols: tuple[str, ...] = ("url",), real: bool = False):
    """binary column -> typed media-metadata struct via mapInPandas.

    Arrow-batched: each pandas batch is processed as a whole; the decode
    itself is per-cell (unavoidable for codecs) but stays inside the batch
    loop — the Spark surface is a single mapInPandas."""
    id_ddl = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols)
    schema = f"{id_ddl}, {REAL_MEDIA_META_DDL if real else MEDIA_META_DDL}"
    decode = _try_real_decode if real else _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(b if isinstance(b, (bytes, bytearray)) else bytes(b or b"")) for b in pdf[binary_col]]
            out = pd.DataFrame(metas)
            for c in reversed(id_cols):
                out.insert(0, c, pdf[c].to_numpy())
            yield out

    return df.mapInPandas(fn, schema=schema)


def frame_sample(df, binary_col: str = "html", every_n: int = 8, id_cols: tuple[str, ...] = ("url",), real: bool = False):
    """Frame-sampling plumbing: one output row per sampled frame index.
    With ``real=True`` the frame count comes from a REAL container walk
    (GIF block structure via the stdlib codec); the stub decode otherwise.
    Bytes are NOT duplicated — only (id, frame_idx) rows flow out, the
    frame extractor would attach decoded frames here.

    With ``real=True`` rows whose format could not be decoded (``n_frames``
    NULL) produce no frames; per the module's no-silent-drop convention use
    :func:`frame_sample_dropped` on the same input to get exactly those
    rows as a diagnostic output (the two results partition the input).
    """
    from pyspark.sql import functions as F

    meta = decode_media(df, binary_col, id_cols, real=real)
    if real:
        meta = meta.where(F.col("n_frames").isNotNull())
    return meta.select(
        *id_cols,
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def frame_sample_dropped(df, binary_col: str = "html", id_cols: tuple[str, ...] = ("url",)):
    """Diagnostic twin of ``frame_sample(real=True)``: the rows it drops
    (undecodable format -> no frame count), with the sniffed format string.
    Route these to a quarantine sink so undecodable media are visible, not
    silently vanished."""
    from pyspark.sql import functions as F

    meta = decode_media(df, binary_col, id_cols, real=True)
    return meta.where(F.col("n_frames").isNull()).select(*id_cols, "format")


def synth_png_col(df, id_col: str = "doc_id", out_col: str = "png"):
    """Append a column of REAL deterministic PNGs derived from an id column
    (width = 1 + id%16, height = 1 + id%9, pixel[i] = (id+i) % 256).

    Exists so the real-decode path can be verified end-to-end without any
    external media: encode with known parameters, decode with the stdlib
    codec, and let an independent oracle recompute the parameters from the
    id alone (see __spark_entry__ media_decode_real)."""
    from liblognorm_spark.functions.codecs import png_encode

    in_schema = df.schema
    in_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema.fields)
    schema = f"{in_ddl}, `{out_col}` binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pngs = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 1 + did % 16, 1 + did % 9
                pixels = bytes((did + i) % 256 for i in range(w * h))
                pngs.append(png_encode(pixels, w, h))
            out = pdf.copy()
            out[out_col] = pngs
            yield out

    return df.mapInPandas(fn, schema=schema)
