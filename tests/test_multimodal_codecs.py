"""Pure-stdlib media codecs: real PNG/GIF/JPEG/WAV parsing with no
external libraries, plus the Spark-side real-decode path."""

import io
import struct
import wave
import zlib

from liblognorm_spark.functions import codecs as C


def test_png_roundtrip_gray():
    px = bytes((3 * i + 7) % 256 for i in range(16 * 9))
    b = C.png_encode(px, 16, 9)
    m = C.png_meta(b)
    assert (m["format"], m["width"], m["height"], m["bit_depth"], m["channels"]) == (
        "png", 16, 9, 8, 1,
    )
    assert m["px_sum"] == sum(px) and m["n_px"] == 144


def test_png_all_filter_types_rgb():
    """Hand-filter one scanline per PNG filter type (0-4) in RGB and check
    the decoder unfilters back to the original pixels exactly."""
    w, h, bpp = 5, 5, 3
    pix = bytes((i * 17 + j * 3) % 256 for i in range(h) for j in range(w * bpp))
    lines = [pix[y * w * bpp : (y + 1) * w * bpp] for y in range(h)]
    raw = bytearray()
    prev = bytes(w * bpp)
    for ft, line in zip([0, 1, 2, 3, 4], lines):
        raw.append(ft)
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b_ = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = line[i]
            elif ft == 1:
                f = (line[i] - a) & 0xFF
            elif ft == 2:
                f = (line[i] - b_) & 0xFF
            elif ft == 3:
                f = (line[i] - ((a + b_) >> 1)) & 0xFF
            else:
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                f = (line[i] - pred) & 0xFF
            raw.append(f)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        C._PNG_SIG
        + C._crc_chunk(b"IHDR", ihdr)
        + C._crc_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._crc_chunk(b"IEND", b"")
    )
    m = C.png_meta(png)
    assert m["channels"] == 3 and m["px_sum"] == sum(pix) and m["n_px"] == len(pix)


def test_gif_frame_count():
    frame = b"\x2c" + struct.pack("<HHHH", 0, 0, 13, 7) + bytes([0x00, 2, 1, 0x00, 0])
    gif = b"GIF89a" + struct.pack("<HH", 13, 7) + bytes([0x00, 0, 0]) + frame * 2 + b"\x3b"
    g = C.gif_meta(gif)
    assert (g["width"], g["height"], g["n_frames"]) == (13, 7, 2)


def test_jpeg_sof_scan():
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 33, 44) + bytes([3]) + b"\x00" * 3
    )
    jpg = b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00" + sof + b"\xff\xd9"
    j = C.jpeg_meta(jpg)
    assert (j["width"], j["height"], j["channels"], j["bit_depth"]) == (44, 33, 3, 8)


def test_jpeg_standalone_markers_and_sos_stop():
    """Standalone markers carry no length field: stuffed 0xFF00 bytes and a
    thumbnail EOI must not trigger a bogus seglen read, and a scan that
    reaches SOS/EOI without an SOF has no frame header to return."""
    sof = (
        b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 33, 44) + bytes([3]) + b"\x00" * 3
    )
    # stuffed 0xFF00 data bytes before the SOF: previously parsed as a
    # marker with a garbage length that could jump past the real SOF
    jpg = b"\xff\xd8" + b"\xff\x00" + b"\xff\x00" + sof + b"\xff\xd9"
    j = C.jpeg_meta(jpg)
    assert j is not None and (j["width"], j["height"]) == (44, 33)
    # SOS before any SOF: stop (SOF precedes SOS in any decodable JPEG)
    sos_first = b"\xff\xd8" + b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00" + sof
    assert C.jpeg_meta(sos_first) is None
    # EOI before any SOF: stop rather than reading a length past it
    eoi_first = b"\xff\xd8" + b"\xff\xd9" + sof
    assert C.jpeg_meta(eoi_first) is None


def test_wav_meta():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(b"\x01\x02" * 2 * 100)
    m = C.wav_meta(buf.getvalue())
    assert (m["channels"], m["sample_rate"], m["n_frames"], m["bit_depth"]) == (2, 16000, 100, 16)


def test_sniff_unknown():
    assert C.sniff_decode(b"not media at all") is None
    assert C.sniff_decode(b"") is None


def test_spark_real_decode_roundtrip(spark):
    """decode_media(real=True) over synthesized PNG + WAV + junk in one
    binary column: per-format metadata is exact, junk degrades to
    'unknown' rows (no silent drop)."""
    from pyspark.sql import functions as F

    from liblognorm_spark.functions.multimodal import decode_media

    px = bytes(range(100))
    png = C.png_encode(px, 10, 10)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(b"\x00\x01" * 50)
    rows = [("png", bytearray(png)), ("wav", bytearray(buf.getvalue())), ("junk", bytearray(b"hello"))]
    df = spark.createDataFrame(rows, "name string, payload binary")
    out = {r["name"]: r for r in decode_media(df, binary_col="payload", id_cols=("name",), real=True).collect()}
    assert out["png"]["format"] == "png" and out["png"]["px_sum"] == sum(px)
    assert out["wav"]["format"] == "wav" and out["wav"]["sample_rate"] == 8000
    assert out["junk"]["format"] == "unknown" and out["junk"]["media_bytes"] == 5
    _ = F


def test_frame_sample_dropped_partitions_input(spark):
    """frame_sample(real=True) + frame_sample_dropped partition the input:
    decodable rows emit frames, undecodable rows land in the diagnostic
    output with format='unknown' — no silent drop."""
    from liblognorm_spark.functions.multimodal import (
        frame_sample,
        frame_sample_dropped,
        synth_png_col,
    )

    good = synth_png_col(
        spark.range(3).selectExpr("id AS doc_id", "concat('u', id) AS url"),
        out_col="media",
    ).select("url", "media")
    bad = spark.createDataFrame(
        [("ubad", bytearray(b"not media at all"))], "url string, media binary"
    )
    df = good.union(bad)
    frames = frame_sample(df, binary_col="media", real=True)
    dropped = frame_sample_dropped(df, binary_col="media")
    assert set(r["url"] for r in frames.collect()) == {"u0", "u1", "u2"}
    drows = dropped.collect()
    assert [(r["url"], r["format"]) for r in drows] == [("ubad", "unknown")]


def test_bpe_token_count_splits(spark):
    """The BPE pre-tokenizer counts pieces, not words: contractions,
    digits and punctuation split off."""
    from liblognorm_spark.functions.text import bpe_token_count, token_count

    df = spark.createDataFrame(
        [("it's 2024, isn't it?!",), ("plain words only",)], "text string"
    )
    rows = df.select(
        token_count("text").alias("ws"), bpe_token_count("text").alias("bpe")
    ).collect()
    # "it"+"'s"+" 2024"+","+" isn"+"'t"+" it"+"?!" = 8 pieces vs 4 ws tokens
    assert (rows[0]["ws"], rows[0]["bpe"]) == (4, 8)
    assert (rows[1]["ws"], rows[1]["bpe"]) == (3, 3)


def test_malformed_media_never_raises():
    """Hostile bytes with valid magic prefixes must degrade (None /
    header-only), never raise — a decode task dies otherwise."""
    import struct

    bad_png = (
        C._PNG_SIG + struct.pack(">I", 13) + b"IHDR" + b"A" * 13 + b"\0" * 4
        + struct.pack(">I", 5) + b"IDAT" + b"xxxxx" + b"\0" * 4
    )
    truncated_jpg = b"\xff\xd8\xff\xc0\x00\x07\x08\x00\x21\x00\x2c"
    bad_wav = b"RIFF\x00\x00\x00\x00WAVEjunk"
    for payload in (bad_png, truncated_jpg, bad_wav, b"GIF89a", b"\x89PNG\r\n\x1a\n"):
        C.sniff_decode(payload)  # must not raise
    assert C.jpeg_meta(truncated_jpg) is None


def test_scrub_pii_nul_safe(spark):
    """A pre-existing NUL in scraped text must not be counted or rewritten
    as a PII hit (regression: the old sentinel-based counter did both)."""
    from liblognorm_spark.functions.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "abc\x00def no pii"), (2, "mail a@b.com end")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["scrubbed"] == "abc\x00def no pii" and rows[1]["n_email"] == 0
    assert rows[2]["scrubbed"] == "mail <EMAIL> end" and rows[2]["n_email"] == 1


def test_strtol_hex_prefix():
    """C strtol skips an optional 0x/0X prefix for base 16 (and parses
    just the '0' of a bare '0x')."""
    from liblognorm_spark.compiler.motifs import _strtol

    assert _strtol("0x1A", 16) == 26
    assert _strtol("-0X1a", 16) == -26
    assert _strtol("0x", 16) == 0
    assert _strtol("1A", 16) == 26


def test_png_zlib_bomb_capped():
    """A small PNG claiming small dims but carrying a huge-inflating IDAT
    must not allocate past the claimed size (decompress is capped)."""
    import struct
    import time
    import zlib

    bomb_idat = zlib.compress(b"\x00" * (20 * 1024 * 1024), 9)  # ~20k bytes
    png = (
        C._PNG_SIG
        + C._crc_chunk(b"IHDR", struct.pack(">IIBBBBB", 10, 10, 8, 0, 0, 0, 0))
        + C._crc_chunk(b"IDAT", bomb_idat)
        + C._crc_chunk(b"IEND", b"")
    )
    t0 = time.perf_counter()
    m = C.png_meta(png)
    assert time.perf_counter() - t0 < 1.0
    assert m["width"] == 10 and m["px_sum"] is None  # header-only, no stats


def test_recursive_guard_thread_local():
    """Concurrent normalizes on a recursive rulebase must not corrupt each
    other's reentry guard (it is thread-local)."""
    from concurrent.futures import ThreadPoolExecutor

    from liblognorm_spark.rulebase.loader import Rulebase
    from liblognorm_spark.runtime.matcher import normalize_strings

    rb = Rulebase.from_string("rule=:%word:word% %next:recursive%\nrule=:%word:word%\n")
    inputs = [" ".join(f"w{i}x{j}" for j in range(6)) for i in range(40)]

    def run(s):
        return normalize_strings(rb, [s])[0]

    with ThreadPoolExecutor(8) as ex:
        outs = list(ex.map(run, inputs))
    for s, o in zip(inputs, outs):
        # every word chained under 'next', none degraded to unparsed
        assert "unparsed-data" not in o, (s, o)
        depth = 0
        cur = o
        while "next" in cur:
            depth += 1
            cur = cur["next"]
        assert depth == 5, (s, o)
