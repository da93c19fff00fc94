"""Pure-stdlib media codecs: real decode for the formats whose containers
are parseable without native libraries.

This container has no Pillow/ffmpeg, but PNG (zlib + per-scanline filters),
GIF (block structure), JPEG (marker scan) and WAV (stdlib ``wave``) are all
decodable/parseable with the standard library — so ``decode_media``'s real
path genuinely decodes these instead of stubbing.  ``png_encode`` exists so
tests and oracles can build deterministic real PNGs and verify the full
encode -> decode roundtrip against independently computed ground truth.

Everything here is per-cell work that runs inside mapInPandas Arrow
batches; nothing touches Spark.
"""

from __future__ import annotations

import io
import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (PNG spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _crc_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (filter 0 scanlines)."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _PNG_SIG
        + _crc_chunk(b"IHDR", ihdr)
        + _crc_chunk(b"IDAT", zlib.compress(raw))
        + _crc_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo PNG scanline filters 0-4 (spec 9.2).  bpp = bytes per pixel."""
    stride = width * bpp
    out = bytearray(stride * height)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        o = y * stride
        po = o - stride  # previous line offset
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (line[i] + a) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                b = out[po + i] if y > 0 else 0
                out[o + i] = (line[i] + b) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = out[po + i] if y > 0 else 0
                out[o + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = out[po + i] if y > 0 else 0
                c = out[po + i - bpp] if (y > 0 and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[o + i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def png_meta(b: bytes) -> dict | None:
    """Real PNG decode: IHDR metadata always; for 8-bit gray/RGB/RGBA also
    inflate + unfilter the pixel data and report exact pixel sums."""
    if not b.startswith(_PNG_SIG):
        return None
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    n = len(b)
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        return None
    meta = {
        "format": "png",
        "width": int(width),
        "height": int(height),
        "bit_depth": int(bit_depth),
        "channels": _PNG_CHANNELS.get(color_type, 0),
        "n_frames": 1,
        "sample_rate": 0,
        "px_sum": None,
        "n_px": None,
    }
    # pixel stats only for images whose decode cost is bounded by the
    # CLAIMED dimensions: a crafted IHDR can claim multi-TB dimensions in a
    # 100-byte file, and a zlib bomb can inflate ~1000x — so cap the
    # inflate at the expected raw size (+1 to detect oversize) instead of
    # decompressing first and checking after
    MAX_PX = 64 * 1024 * 1024
    if bit_depth == 8 and color_type in (0, 2, 6) and idat and width * height <= MAX_PX:
        bpp = _PNG_CHANNELS[color_type]
        expected = (width * bpp + 1) * height
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
        if len(raw) == expected:
            pixels = _png_unfilter(raw, width, height, bpp)
            meta["px_sum"] = int(sum(pixels))
            meta["n_px"] = len(pixels)
    return meta


def gif_meta(b: bytes) -> dict | None:
    """GIF87a/89a block walk: logical-screen size + real frame count."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    if len(b) < 13:
        return None
    width, height = struct.unpack("<HH", b[6:10])
    flags = b[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    frames = 0
    n = len(b)

    def skip_subblocks(p: int) -> int:
        while p < n and b[p] != 0:
            p += 1 + b[p]
        return p + 1

    while pos < n:
        tag = b[pos]
        if tag == 0x3B:  # trailer
            break
        if tag == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif tag == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > n:
                break
            lflags = b[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos = skip_subblocks(pos + 1)  # LZW min code size + data
        else:
            break  # corrupt
    return {
        "format": "gif",
        "width": int(width),
        "height": int(height),
        "bit_depth": 8,
        "channels": 3,
        "n_frames": max(frames, 1),
        "sample_rate": 0,
        "px_sum": None,
        "n_px": None,
    }


def jpeg_meta(b: bytes) -> dict | None:
    """JPEG marker scan for the SOF frame header (dimensions/components)."""
    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker == 0x00:  # stuffed 0xFF00 data byte, not a marker
            pos += 2
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            # EOI (standalone, no length) / SOS: SOF precedes SOS in any
            # decodable JPEG, so reaching either without an SOF means the
            # stream has no readable frame header
            return None
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 10 > n:  # reads through b[pos+9] (ncomp)
                return None
            precision = b[pos + 4]
            height, width = struct.unpack(">HH", b[pos + 5 : pos + 9])
            ncomp = b[pos + 9]
            return {
                "format": "jpeg",
                "width": int(width),
                "height": int(height),
                "bit_depth": int(precision),
                "channels": int(ncomp),
                "n_frames": 1,
                "sample_rate": 0,
                "px_sum": None,
                "n_px": None,
            }
        pos += 2 + seglen
    return None


def wav_meta(b: bytes) -> dict | None:
    """WAV via the stdlib wave module: channels / rate / frame count."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    import wave

    try:
        with wave.open(io.BytesIO(b)) as w:
            return {
                "format": "wav",
                "width": 0,
                "height": 0,
                "bit_depth": w.getsampwidth() * 8,
                "channels": w.getnchannels(),
                "n_frames": w.getnframes(),
                "sample_rate": w.getframerate(),
                "px_sum": None,
                "n_px": None,
            }
    except wave.Error:
        return None


def sniff_decode(b: bytes) -> dict | None:
    """Dispatch on magic bytes; None when no stdlib codec applies OR the
    payload is malformed past its magic (zlib errors, truncated chunks,
    bad filter bytes) — a decode task must degrade, never die, on hostile
    bytes."""
    if not b:
        return None
    for fn in (png_meta, gif_meta, jpeg_meta, wav_meta):
        try:
            meta = fn(b)
        except Exception:
            return None
        if meta is not None:
            return meta
    return None


def gif_encode(width: int, height: int, n_frames: int) -> bytes:
    """Minimal structurally-valid GIF89a with ``n_frames`` frames (each a
    1-sub-block LZW payload).  Exists so frame-sampling can be verified on
    real container structure: gif_meta must walk the blocks to count
    frames."""
    if n_frames < 1:
        raise ValueError("n_frames >= 1")
    hdr = b"GIF89a" + struct.pack("<HH", width, height) + bytes([0x00, 0, 0])
    # image descriptor + LZW-min-code-size + one 2-byte data sub-block + end
    frame = (
        b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        + bytes([2, 2, 0x4C, 0x01, 0x00])
    )
    return hdr + frame * n_frames + b"\x3b"
