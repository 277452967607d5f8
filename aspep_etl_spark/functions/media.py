"""[EXT] Stdlib media header codecs (SURVEY.md §2.11 multimodal).

Pure-Python (``struct``/``zlib`` only — PIL/ffmpeg are not in the container)
parsers for the headers of the common media containers, plus synthesizers
that emit structurally valid tiny files so the Spark-side multimodal
plumbing (``operators/multimodal.py``) decodes *real bytes* end-to-end.

Parsers read the real on-disk format structure:

- PNG   — 8-byte signature, IHDR width/height (big-endian u32).
- JPEG  — SOI then segment walk to the first SOF{0..15}\\{4,8,12} frame
          header (height/width big-endian u16, skipping fill bytes and
          zero-payload markers).
- GIF   — GIF87a/GIF89a logical screen descriptor (little-endian u16).
- BMP   — BITMAPINFOHEADER width/height (little-endian i32).
- WAV   — RIFF/WAVE chunk walk; ``fmt `` gives sample_rate/channels/
          byte_rate, ``data`` size / byte_rate gives duration.
- MP4   — ISO BMFF box walk; ``moov/mvhd`` duration÷timescale,
          ``moov/trak/tkhd`` 16.16-fixed width/height.

Decode failures never raise out of ``parse_media_header`` — at 100 TB a
single corrupt payload must not kill the job; callers get
``format="unknown"`` with null fields and can quarantine downstream.

No reference counterpart (the reference pipeline is tabular-only); this
module is part of the [EXT] training-data-pipeline mandate.
"""

from __future__ import annotations

import struct
import zlib

_NULL_FEATURES = {
    "format": "unknown",
    "width": None,
    "height": None,
    "duration_ms": None,
    "sample_rate": None,
    "channels": None,
}

#: formats whose payloads are still images (no time axis)
IMAGE_FORMATS = frozenset({"png", "jpeg", "gif", "bmp"})
AUDIO_FORMATS = frozenset({"wav"})
VIDEO_FORMATS = frozenset({"mp4"})


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------


def _parse_png(b: bytes) -> dict:
    # signature (8) + IHDR length (4) + b"IHDR" (4) + width/height u32be
    if b[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    width, height = struct.unpack(">II", b[16:24])
    return {"format": "png", "width": width, "height": height}


_JPEG_NO_PAYLOAD = frozenset({0x01, 0xD8} | set(range(0xD0, 0xD8)))
_JPEG_NOT_SOF = frozenset({0xC4, 0xC8, 0xCC})  # DHT / JPG / DAC


def _parse_jpeg(b: bytes) -> dict:
    i = 2  # past SOI
    n = len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            raise ValueError(f"JPEG segment desync at {i}")
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in _JPEG_NO_PAYLOAD:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > n:
            break
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NOT_SOF:
            height, width = struct.unpack(">HH", b[i + 5 : i + 9])
            return {"format": "jpeg", "width": width, "height": height}
        if marker == 0xDA:  # SOS — entropy data follows; SOF must precede it
            break
        i += 2 + seglen
    raise ValueError("JPEG has no SOF frame header")


def _parse_gif(b: bytes) -> dict:
    width, height = struct.unpack("<HH", b[6:10])
    return {"format": "gif", "width": width, "height": height}


def _parse_bmp(b: bytes) -> dict:
    (dib_size,) = struct.unpack("<I", b[14:18])
    if dib_size < 40:  # BITMAPCOREHEADER uses u16 fields
        width, height = struct.unpack("<HH", b[18:22])
    else:
        width, height = struct.unpack("<ii", b[18:26])
    return {"format": "bmp", "width": abs(width), "height": abs(height)}


def _parse_wav(b: bytes) -> dict:
    out: dict = {"format": "wav"}
    byte_rate = data_size = None
    i, n = 12, len(b)  # past RIFF size WAVE
    while i + 8 <= n:
        tag = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if tag == b"fmt ":
            channels, sample_rate, byte_rate = struct.unpack(
                "<HII", b[i + 10 : i + 20]
            )
            out["channels"] = channels
            out["sample_rate"] = sample_rate
        elif tag == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are padded to even offsets
    if byte_rate and data_size is not None:
        out["duration_ms"] = round(data_size * 1000 / byte_rate)
    return out


def _parse_mp4(b: bytes) -> dict:
    out: dict = {"format": "mp4"}

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        i = lo
        while i + 8 <= hi and depth < 8:
            (size,) = struct.unpack(">I", b[i : i + 4])
            tag = b[i + 4 : i + 8]
            if size < 8:  # size 0/1 (to-eof / 64-bit) unsupported here
                return
            body = i + 8
            if tag in (b"moov", b"trak"):
                walk(body, min(i + size, hi), depth + 1)
            elif tag == b"mvhd":
                version = b[body]
                if version == 0:
                    timescale, duration = struct.unpack(
                        ">II", b[body + 12 : body + 20]
                    )
                else:
                    timescale, duration = struct.unpack(
                        ">IQ", b[body + 20 : body + 32]
                    )
                if timescale:
                    out["duration_ms"] = round(duration * 1000 / timescale)
            elif tag == b"tkhd" and "width" not in out:
                version = b[body]
                # width/height are the trailing 16.16-fixed u32 pair
                end = i + size
                w_fix, h_fix = struct.unpack(">II", b[end - 8 : end])
                if w_fix and h_fix:
                    out["width"] = w_fix >> 16
                    out["height"] = h_fix >> 16
            i += size

    walk(0, len(b))
    return out


def sniff_format(b: bytes) -> str | None:
    """Identify the container from magic bytes alone (never trusts a
    caller-supplied modality label — mislabelled payloads are routine in a
    crawled corpus)."""
    if len(b) < 12:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:2] == b"\xff\xd8":
        return "jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:2] == b"BM":
        return "bmp"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[4:8] == b"ftyp":
        return "mp4"
    return None


_PARSERS = {
    "png": _parse_png,
    "jpeg": _parse_jpeg,
    "gif": _parse_gif,
    "bmp": _parse_bmp,
    "wav": _parse_wav,
    "mp4": _parse_mp4,
}


def parse_media_header(payload: bytes | None) -> dict:
    """Decode header metadata from real media bytes.

    Returns ``{format, width, height, duration_ms, sample_rate, channels}``
    with nulls for fields the format lacks; ``format="unknown"`` (all-null
    fields) for unrecognized or corrupt payloads instead of raising.
    """
    out = dict(_NULL_FEATURES)
    if not payload:
        return out
    fmt = sniff_format(bytes(payload))
    if fmt is None:
        return out
    try:
        out.update(_PARSERS[fmt](bytes(payload)))
    except (ValueError, struct.error, IndexError):
        return dict(_NULL_FEATURES)
    return out


# ---------------------------------------------------------------------------
# synthesizers — structurally valid tiny files for fixtures/testdata
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def make_png(width: int, height: int, fill: int = 0) -> bytes:
    """Fully valid 8-bit grayscale PNG (zlib-compressed scanlines, real
    CRCs) — decodable by any PNG reader, not just ours."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes([(fill + y) % 256]) * width for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_jpeg(width: int, height: int) -> bytes:
    """Header-valid JPEG: SOI + APP0/JFIF + SOF0 (grayscale) + EOI.  The
    entropy-coded scan is omitted (a real encoder needs Huffman tables);
    every field a header scanner reads is real."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
        + b"\xff\xd9"
    )


def make_gif(width: int, height: int) -> bytes:
    """GIF89a with a real logical screen descriptor, 2-entry color table,
    and a minimal single-color image block."""
    lsd = struct.pack("<HH", width, height) + bytes([0x80, 0, 0])
    gct = b"\x00\x00\x00\xff\xff\xff"
    img_desc = b"," + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    # LZW min code size 2; data sub-block: clear(4), one pixel(0), eoi(5)
    lzw = b"\x02\x02\x44\x01\x00"
    return b"GIF89a" + lsd + gct + img_desc + lzw + b";"


def make_bmp(width: int, height: int) -> bytes:
    """Fully valid 24-bit BMP (BITMAPINFOHEADER + padded pixel rows)."""
    row = (width * 3 + 3) & ~3
    pixels = bytes(row) * height
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return hdr + dib + pixels


def make_wav(duration_ms: int, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Fully valid 8-bit PCM WAV of the requested duration."""
    byte_rate = sample_rate * channels  # 1 byte/sample
    data_size = round(byte_rate * duration_ms / 1000)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size) + bytes(data_size)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_mp4(duration_ms: int, width: int = 0, height: int = 0) -> bytes:
    """Minimal ISO BMFF: ftyp + moov{mvhd, trak{tkhd}} with real box sizes,
    version-0 mvhd timescale/duration, and 16.16-fixed tkhd dimensions."""

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    timescale = 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version/flags
        + struct.pack(">II", 0, 0)  # ctime/mtime
        + struct.pack(">II", timescale, duration_ms)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + b"\x01\x00\x00\x00"  # volume + reserved
        + bytes(8)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime/mtime/track/reserved
        + struct.pack(">I", duration_ms)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/altgroup/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov
