"""Multimodal (image/audio/video) column handling.

Media payloads are opaque BINARY columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each Python worker touches whole record
batches, never single rows.

Decoding routes by container magic bytes: genuine PNG and BMP payloads go
through REAL pure-Python decoders (``decode_png`` / ``decode_bmp`` —
chunk walk, zlib inflate, scanline unfilter; no native deps), JPEG —
the dominant crawl image format — through a REAL segment walk for
metadata (``parse_jpeg``: SOF0/SOF2 frame header, JFIF detection,
per-scan entropy skipping; header-only, O(segments)) plus a REAL
baseline Huffman+IDCT pixel decode (``decode_jpeg``) where pixels are
consumed; everything else falls back to a deterministic hash-derived
stub (``_fake_decode``) so the pipeline stays runnable in containers
without codec libraries and so corrupt/unknown payloads degrade instead
of failing the job.  Exotic image formats (GIF, WebP) decode through
``_real_decode`` when PIL is installed; audio/video metadata still needs
ffmpeg and uses the stub.

At 100 TB: binaries dominate row size, so operators repartition by byte
budget (``target_partition_bytes``), select only the binary + key columns
(column pruning keeps metadata scans cheap), and emit features WITHOUT the
payload so downstream stages never reshuffle gigabytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<source:string, declared_format:string>"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, sha_prefix string, "
    "width int, height int, n_frames int, duration_ms int"
)

HAVE_REAL_CODECS = False
try:  # real decoders are optional; the container ships none
    import PIL  # noqa: F401

    HAVE_REAL_CODECS = True
except ImportError:
    HAVE_REAL_CODECS = False


def _fake_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic stand-in for a codec: metadata derived from the
    payload hash.  Replace with PIL/soundfile/pyav in production."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] * 4
    height = 64 + digest[1] * 4
    n_frames = 1 if media_type == "image" else 1 + digest[2]
    duration_ms = 0 if media_type == "image" else (1 + digest[3]) * 250
    return {
        "n_bytes": len(payload),
        "sha_prefix": hashlib.sha256(payload).hexdigest()[:12],
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_ms": duration_ms,
    }


def _real_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """PIL-backed metadata decode for containers the pure-Python decoders
    don't cover (JPEG/GIF/WebP/...).  Only called when ``HAVE_REAL_CODECS``
    and only as a fallback AFTER the native PNG/BMP path — installing PIL
    widens the decodable set, it never replaces the existing chain.
    Raises on undecodable payloads; :func:`decode_media` degrades to the
    hash stub.  Audio/video still need ffmpeg — those fall through to the
    stub regardless."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        width, height = img.size
        n_frames = int(getattr(img, "n_frames", 1))
    return {
        "n_bytes": len(payload),
        "sha_prefix": hashlib.sha256(payload).hexdigest()[:12],
        "width": int(width),
        "height": int(height),
        "n_frames": n_frames,
        "duration_ms": 0,
    }


# A NULL payload degrades per-record like a corrupt one, but with NULL
# metadata all the way down (matching the oracle's md5(NULL)/
# octet_length(NULL) semantics) rather than hash-of-empty-bytes.
_NULL_FEATURES: dict[str, Any] = {
    "n_bytes": None,
    "sha_prefix": None,
    "width": None,
    "height": None,
    "n_frames": None,
    "duration_ms": None,
}

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel by PNG color type (bit depth 8 assumed)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Decoded-pixel allocation cap: header dims are UNTRUSTED, so every
# allocation derived from them is bounded before it happens (a 60-byte
# crafted payload claiming 2^20 x 2^20 pixels must degrade per record,
# not OOM the task).
MAX_DECODED_BYTES = 256 * 1024 * 1024

# Everything a corrupt/hostile image payload can legitimately raise while
# decoding; callers degrade to the hash stub on ANY of these.
DECODE_ERRORS = (ValueError, IndexError, struct.error, zlib.error, MemoryError)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _parse_png_ihdr(data: bytes) -> tuple[int, int, int]:
    """Validated (width, height, channels) from a PNG's IHDR (always the
    first chunk per spec) — the ONE header parser shared by the full
    decoder and the header-only metadata path, so the two can't drift.
    Raises ``ValueError`` for anything outside the supported envelope
    (bit depth 8, known color type, non-interlaced, positive dims)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    if data[12:16] != b"IHDR" or len(data) < 29:
        raise ValueError("IHDR not first chunk")
    width, height, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    if width <= 0 or height <= 0:
        raise ValueError("non-positive PNG dimensions")
    return width, height, _PNG_CHANNELS[color]


def _parse_bmp_header(data: bytes) -> tuple[int, int, int, int, bool, int]:
    """Validated (pixel_off, width, height, channels, top_down,
    row_padded) from a BMP's file+info headers, shared by the full
    decoder and the header-only path.  Proves the claimed pixel data fits
    the payload BEFORE any caller allocates from these dims."""
    if data[:2] != b"BM" or len(data) <= 34:
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    width, height_raw = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    top_down = height_raw < 0
    height = abs(height_raw)
    channels = bpp // 8
    if width <= 0 or height <= 0:
        raise ValueError("non-positive BMP dimensions")
    row_bytes = width * channels
    row_padded = (row_bytes + 3) & ~3
    if pixel_off + (height - 1) * row_padded + row_bytes > len(data):
        raise ValueError("BMP pixel data exceeds payload")
    return pixel_off, width, height, channels, top_down, row_padded


def decode_png(data: bytes) -> tuple[int, int, bytearray, int]:
    """Pure-Python PNG decode: chunk walk, IHDR parse, concatenated-IDAT
    zlib inflate, per-scanline unfilter (filter types 0-4 including
    Paeth).  Supports bit depth 8, color types 0/2/3/4/6, non-interlaced
    — the overwhelmingly common archive shape; anything else raises
    ``ValueError`` (callers fall back to the hash stub).

    Returns ``(width, height, raw_samples, channels)`` where
    ``raw_samples`` is the unfiltered bottom-up-free scanline bytes
    (``height * width * channels`` values) — real pixels, so callers can
    compute channel statistics.
    """
    width, height, channels = _parse_png_ihdr(data)
    pos = 8
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if not idat:
        raise ValueError("missing IDAT")
    stride = width * channels
    expected = height * (stride + 1)
    if expected > MAX_DECODED_BYTES:
        # dims come from an untrusted header; bound the allocation BEFORE
        # inflating (a tiny zip-bomb payload must not OOM the task)
        raise ValueError(f"decoded size {expected} over cap")
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("pixel data size mismatch")
    out = bytearray(height * stride)
    prev_start = None
    for y in range(height):
        fstart = y * (stride + 1)
        ftype = raw[fstart]
        line = bytearray(raw[fstart + 1 : fstart + 1 + stride])
        ostart = y * stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start is not None:
                for i in range(stride):
                    line[i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start is not None else 0
                line[i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start is not None else 0
                ul = (
                    out[prev_start + i - channels]
                    if prev_start is not None and i >= channels
                    else 0
                )
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out[ostart : ostart + stride] = line
        prev_start = ostart
    return width, height, out, channels


def decode_bmp(data: bytes) -> tuple[int, int, bytearray, int]:
    """Pure-Python BMP decode: BITMAPFILEHEADER + BITMAPINFOHEADER,
    uncompressed 24/32-bpp, bottom-up or top-down row order.  Returns
    ``(width, height, raw_samples, channels)`` with rows re-ordered
    top-down and samples in BGR(A) order as stored."""
    pixel_off, width, height, channels, top_down, row_padded = (
        _parse_bmp_header(data)
    )
    row_bytes = width * channels
    if height * row_bytes > MAX_DECODED_BYTES:
        raise ValueError("decoded size over cap")
    out = bytearray(height * row_bytes)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        start = pixel_off + src_row * row_padded
        row = data[start : start + row_bytes]
        if len(row) != row_bytes:
            raise ValueError("truncated BMP pixel data")
        out[y * row_bytes : (y + 1) * row_bytes] = row
    return width, height, out, channels


JPEG_SOI = b"\xff\xd8"

# Frame-header (SOFn) markers: C0-CF minus DHT (C4), JPG (C8), DAC (CC).
_JPEG_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)

JPEG_META_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, "
    "n_components int, precision int, progressive boolean, "
    "has_jfif boolean, n_scans int, n_entropy_bytes long"
)


def _jpeg_skip_entropy(data: bytes, pos: int) -> tuple[int, int | None]:
    """Scan entropy-coded bytes from ``pos`` to the next segment marker.
    Byte-stuffed 0xFF00 and restart markers (FFD0-FFD7) belong to the
    scan; returns ``(end_pos, marker)`` with ``end_pos`` at the marker's
    0xFF, or ``(len(data), None)`` when the payload is cut mid-scan
    (crawl payloads routinely are)."""
    while pos < len(data):
        i = data.find(b"\xff", pos)
        if i < 0 or i + 1 >= len(data):
            return len(data), None
        m = data[i + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            pos = i + 2
        elif m == 0xFF:  # fill byte run
            pos = i + 1
        else:
            return i, m
    return len(data), None


def parse_jpeg(data: bytes) -> dict[str, Any] | None:
    """Segment-walking JPEG metadata parse (no codec): SOI, marker
    segments with big-endian lengths, the SOF0/SOF2 frame header
    (precision, dimensions, component count, baseline-vs-progressive),
    JFIF APP0 detection, per-scan entropy skipping with 0xFF00
    byte-stuffing and restart markers honored.  Header-only — dims over a
    100 TB archive must be O(segments), never O(pixels); no allocation is
    derived from the untrusted dims.

    Mid-stream degradation mirrors :func:`audio.parse_mp3`: once a frame
    header AND at least one scan have been parsed, any structural defect
    (lost marker alignment, truncated segment, missing EOI) ends the walk
    and returns what was parsed, with ``n_entropy_bytes`` counting only
    the entropy bytes actually seen.  The same defect earlier returns
    ``None`` and the caller degrades per-record."""
    if len(data) < 4 or data[:2] != JPEG_SOI:
        return None
    pos = 2
    width = height = ncomp = precision = None
    progressive: bool | None = None
    has_jfif = False
    n_scans = 0
    entropy_bytes = 0

    def result() -> dict[str, Any] | None:
        if width is None or n_scans == 0:
            return None
        return {
            "width": width,
            "height": height,
            "n_components": ncomp,
            "precision": precision,
            "progressive": progressive,
            "has_jfif": has_jfif,
            "n_scans": n_scans,
            "n_entropy_bytes": entropy_bytes,
        }

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return result()  # lost marker alignment
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if pos + 2 > len(data):
            return result()
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > len(data):
            return result()  # truncated segment
        body = data[pos + 2 : pos + seglen]
        if marker in _JPEG_SOF_MARKERS:
            if len(body) < 6:
                return result()
            precision = body[0]
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if (
                width == 0
                or height == 0
                or not 1 <= ncomp <= 4
                or len(body) < 6 + 3 * ncomp
            ):
                width = None
                return None  # malformed frame header: whole record degrades
            progressive = marker == 0xC2
        elif marker == 0xE0 and body[:5] == b"JFIF\x00":
            has_jfif = True
        pos += seglen
        if marker == 0xDA:  # SOS — entropy-coded scan follows
            if width is None:
                return None  # scan before any frame header
            n_scans += 1
            end, _nxt = _jpeg_skip_entropy(data, pos)
            entropy_bytes += end - pos
            pos = end
    return result()


def build_jpeg(
    body: bytes,
    width: int,
    height: int,
    n_components: int = 3,
    progressive: bool = False,
    jfif: bool = True,
) -> bytes:
    """Spec-correct JPEG byte stream for the synthesis/round-trip path:
    SOI, optional JFIF APP0, one DQT (exercises unknown-segment
    skipping), an SOF0 (baseline) or SOF2 (progressive) frame header with
    real big-endian dims, then one scan (two for progressive — each with
    its own SOS header), entropy bytes byte-stuffed (0xFF -> 0xFF00) per
    spec, and EOI.  The entropy bytes are the caller's ``body`` verbatim
    — not a valid Huffman stream, but every structure a header walk
    touches is genuine."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"dims {width}x{height} outside JPEG 16-bit fields")
    if not 1 <= n_components <= 4:
        raise ValueError(f"n_components {n_components} outside 1-4")
    out = bytearray(JPEG_SOI)
    if jfif:
        app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    dqt = bytes([0]) + bytes([16]) * 64
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([n_components])
    for c in range(n_components):
        sof += bytes([c + 1, 0x11, 0])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof
    chunks = (
        [body[: len(body) // 2], body[len(body) // 2 :]]
        if progressive
        else [body]
    )
    for chunk in chunks:
        sos = bytes([n_components])
        for c in range(n_components):
            sos += bytes([c + 1, 0])
        sos += bytes([0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += chunk.replace(b"\xff", b"\xff\x00")
    out += b"\xff\xd9"
    return bytes(out)


def text_as_jpeg(payload: bytes) -> bytes:
    """Deterministic JPEG synthesis from an opaque payload (the image
    sibling of ``audio.text_as_wav``): frame parameters come from md5
    bytes of the payload, the payload bytes stand in for the entropy-coded
    scan data — so a SQL oracle recomputes every metadata field from
    md5/length alone (utf-8 text contains no 0xFF, so byte-stuffing adds
    nothing) while the engine-side bytes round-trip through the real
    segment walk."""
    d = hashlib.md5(payload).digest()
    return build_jpeg(
        payload,
        width=16 + d[0] * 4,
        height=16 + d[1] * 4,
        n_components=3 if d[2] % 2 == 0 else 1,
        progressive=d[3] % 2 == 0,
        jfif=d[4] % 2 == 0,
    )


# ---------------------------------------------------------------------------
# GIF container walk (GIF87a/89a block structure).  Header-only like the
# JPEG segment walk: logical screen descriptor, global/local color table
# skipping, extension blocks (graphic control, application, comment) via
# the shared data-sub-block grammar, per-frame image descriptors.  No LZW
# decode — metadata extraction over a 100 TB archive is O(blocks), and
# GIF's animation metadata (frame count, aggregate delay) lives entirely
# in the block structure.

GIF_MAGIC_87 = b"GIF87a"
GIF_MAGIC_89 = b"GIF89a"

GIF_META_SCHEMA = (
    "media_id long, n_bytes long, width int, height int, n_frames int, "
    "has_gct boolean, gct_colors int, n_extensions int, "
    "duration_ms long, n_data_bytes long, version string"
)


def _gif_subblocks(data: bytes, pos: int) -> tuple[int, int]:
    """Walk GIF data sub-blocks (length byte + payload, 0x00 terminator)
    from ``pos``; returns ``(pos_after_terminator, n_payload_bytes)``.
    A payload cut mid-block counts the bytes actually present — the same
    mid-stream truncation tolerance as the JPEG entropy skip."""
    total = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n == 0:
            return pos, total
        total += min(n, len(data) - pos)
        pos += n
    return pos, total


def parse_gif(data: bytes) -> dict[str, Any] | None:
    """Real GIF87a/89a block walk: screen dims from the logical screen
    descriptor, global/local color tables skipped by their packed size
    fields, every extension (0x21) skipped through the sub-block grammar
    with graphic-control delays accumulated into ``duration_ms``, frames
    counted at their image descriptors (0x2C), LZW payload bytes summed
    without decoding.  ``None`` for anything that is not a GIF;
    truncation mid-walk keeps what was parsed (per-record degrade)."""
    if len(data) < 13 or data[:6] not in (GIF_MAGIC_87, GIF_MAGIC_89):
        return None
    version = data[3:6].decode("ascii")
    width, height = struct.unpack("<HH", data[6:10])
    packed = data[10]
    has_gct = bool(packed & 0x80)
    gct_colors = 2 ** ((packed & 0x07) + 1) if has_gct else 0
    pos = 13 + (3 * gct_colors if has_gct else 0)
    n_frames = n_ext = 0
    duration_ms = n_data = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte, then sub-blocks
            n_ext += 1
            if pos >= len(data):
                break
            label = data[pos]
            pos += 1
            if label == 0xF9 and pos + 4 <= len(data) and data[pos] == 4:
                # graphic control: size(4), packed, delay u16le, index
                duration_ms += (
                    struct.unpack("<H", data[pos + 2 : pos + 4])[0] * 10
                )
            pos, _ = _gif_subblocks(data, pos)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                break
            desc = data[pos : pos + 9]
            pos += 9
            if desc[8] & 0x80:  # local color table
                pos += 3 * (2 ** ((desc[8] & 0x07) + 1))
            pos += 1  # LZW minimum code size
            pos, nb = _gif_subblocks(data, pos)
            n_frames += 1
            n_data += nb
        else:  # unrecognized block type: the stream cannot be resynced
            break
    return {
        "n_bytes": len(data),
        "width": int(width),
        "height": int(height),
        "n_frames": n_frames,
        "has_gct": has_gct,
        "gct_colors": gct_colors,
        "n_extensions": n_ext,
        "duration_ms": duration_ms,
        "n_data_bytes": n_data,
        "version": version,
    }


def build_gif(
    frames: list[bytes],
    width: int,
    height: int,
    gct_bits: int | None = None,
    delay_cs: int = 0,
    loop: int | None = None,
    comment: bytes | None = b"gif",
) -> bytes:
    """Spec-correct GIF89a byte stream for the synthesis/round-trip path:
    header, logical screen descriptor (optional global color table of
    ``2^(gct_bits+1)`` entries), a comment extension (exercises
    unknown-extension skipping), an optional NETSCAPE2.0 loop extension,
    then per frame a graphic-control extension + image descriptor + LZW
    code size + the frame body as 255-byte data sub-blocks, and the
    trailer.  Frame bodies are the caller's bytes verbatim — not valid
    LZW, but every structure a block walk touches is genuine."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"dims {width}x{height} outside GIF 16-bit fields")
    if gct_bits is not None and not 0 <= gct_bits <= 7:
        raise ValueError(f"gct_bits {gct_bits} outside 0-7")
    if not 0 <= delay_cs <= 0xFFFF:
        raise ValueError(f"delay_cs {delay_cs} outside u16")
    out = bytearray(GIF_MAGIC_89)
    packed = 0x80 | (7 << 4) | gct_bits if gct_bits is not None else 0
    out += struct.pack("<HH", width, height) + bytes([packed, 0, 0])
    if gct_bits is not None:
        out += bytes(3 * (2 ** (gct_bits + 1)))
    if comment is not None:
        out += b"\x21\xfe" + bytes([len(comment)]) + comment + b"\x00"
    if loop is not None:
        out += (
            b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
            + struct.pack("<H", loop)
            + b"\x00"
        )
    for body in frames:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += bytes([8])  # LZW minimum code size
        for i in range(0, len(body), 255):
            chunk = body[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def text_as_gif(payload: bytes) -> bytes:
    """Deterministic GIF synthesis from an opaque payload (the animation
    sibling of ``text_as_jpeg``): screen dims, frame count, color-table
    presence/size and per-frame delay come from md5 bytes, the payload
    splits evenly across the frames as their LZW-stand-in bodies — so a
    SQL oracle recomputes every metadata field from md5/length alone
    while the engine-side bytes round-trip through the real block walk."""
    d = hashlib.md5(payload).digest()
    n_frames = 1 + d[2] % 4
    q, r = divmod(len(payload), n_frames)
    frames, off = [], 0
    for i in range(n_frames):
        ln = q + (1 if i < r else 0)
        frames.append(payload[off : off + ln])
        off += ln
    return build_gif(
        frames,
        width=16 + d[0] * 4,
        height=16 + d[1] * 4,
        gct_bits=(d[4] % 3) if d[3] % 2 == 0 else None,
        delay_cs=d[5],
        loop=0 if n_frames > 1 else None,
    )


def gif_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    synthesize: bool = False,
) -> DataFrame:
    """Per-record GIF block-structure extraction over a binary payload
    column (same Arrow-batched, shuffle-free shape as jpeg_metadata).
    Corrupt/non-GIF/NULL records yield null metadata fields, never a
    stage failure."""

    meta_keys = (
        "width",
        "height",
        "n_frames",
        "has_gct",
        "gct_colors",
        "n_extensions",
        "duration_ms",
        "n_data_bytes",
        "version",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    meta, gif = None, None
                else:
                    raw = bytes(p)
                    gif = text_as_gif(raw) if synthesize else raw
                    meta = parse_gif(gif)
                row: dict[str, Any] = {
                    "media_id": mid,
                    "n_bytes": len(gif) if gif is not None else None,
                }
                for k in meta_keys:
                    row[k] = meta[k] if meta is not None else None
                rows.append(row)
            yield pd.DataFrame(rows)

    pruned = media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    )
    return pruned.mapInPandas(batches, schema=GIF_META_SCHEMA)


# ---------------------------------------------------------------------------
# Baseline JPEG pixel decode (ITU T.81 sequential DCT, Huffman coding).
# Pure Python + numpy — no codec libraries — so the m1/m3 pixel consumers
# work on the dominant crawl format in codec-less containers.  Progressive
# (SOF2) and arithmetic-coded streams stay header-only and degrade to
# geometry-with-null-digest.  Per-block numpy IDCT is the fixture/test-scale
# path; a production fleet swaps in libjpeg-turbo behind the same
# ``try_decode_image`` routing without touching any consumer.

# Zigzag scan order: zigzag index k -> natural (row-major) coefficient index.
_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)
_ZZ_NP = np.array(_ZIGZAG)

# Orthonormal DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
# IDCT: pixels = A.T @ F @ A; FDCT: F = A @ pixels @ A.T.
_DCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _huff_canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2 canonical code assignment: symbol -> (code, length)."""
    if len(bits) != 16 or sum(bits) != len(vals):
        raise ValueError("malformed Huffman table")
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= 1 << length:
                raise ValueError("Huffman code overflow")
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for bit-serial decoding."""
    return {(ln, c): sym for sym, (c, ln) in _huff_canonical(bits, vals).items()}


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; any non-stuffing marker mid-read is a hard error
    (truncated/corrupt scan) except restart markers, which are consumed
    only at :meth:`sync_restart` boundaries."""

    __slots__ = ("data", "pos", "buf", "n")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _next_byte(self) -> int:
        data, p = self.data, self.pos
        if p >= len(data):
            raise ValueError("JPEG entropy data truncated")
        b = data[p]
        if b == 0xFF:
            if p + 1 >= len(data):
                raise ValueError("JPEG entropy data truncated")
            if data[p + 1] != 0x00:
                raise ValueError("marker inside entropy-coded segment")
            self.pos = p + 2
            return 0xFF
        self.pos = p + 1
        return b

    def read_bit(self) -> int:
        if self.n == 0:
            self.buf = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, idx: int) -> None:
        """Byte-align and consume the expected RSTm marker (m = idx mod 8)."""
        self.n = 0
        data, p = self.data, self.pos
        if (
            p + 2 > len(data)
            or data[p] != 0xFF
            or data[p + 1] != 0xD0 + (idx & 7)
        ):
            raise ValueError("missing/misnumbered JPEG restart marker")
        self.pos = p + 2


def _huff_decode_symbol(r: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude field to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_block(
    r: _JpegBitReader,
    dc_tab: dict,
    ac_tab: dict,
    qtab: list[int],
    pred: int,
) -> tuple[np.ndarray, int]:
    """One 8x8 block: DC diff + AC run-lengths -> dequantized
    natural-order coefficient matrix, and the updated DC predictor."""
    zz = [0] * 64
    s = _huff_decode_symbol(r, dc_tab)
    if s > 11:
        raise ValueError("DC category out of range")
    pred += _extend(r.read_bits(s), s) if s else 0
    zz[0] = pred * qtab[0]
    k = 1
    while k < 64:
        rs = _huff_decode_symbol(r, ac_tab)
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _extend(r.read_bits(size), size) * qtab[k]
        k += 1
    coefs = np.zeros(64)
    coefs[_ZZ_NP] = zz
    return coefs.reshape(8, 8), pred


def decode_jpeg(data: bytes) -> tuple[int, int, bytearray, int]:
    """Baseline-sequential JPEG pixel decode (T.81 SOF0/SOF1, Huffman):
    DQT (8/16-bit), DHT, DRI/restart markers, one interleaved scan,
    sampling factors up to 4:2:0/4:2:2, grayscale and YCbCr->RGB output.
    Returns ``(width, height, interleaved_samples, channels)`` like
    :func:`decode_png` / :func:`decode_bmp`.  Raises ``ValueError`` on
    progressive/arithmetic/multi-scan streams and on any structural or
    entropy defect — callers degrade per record, never fail the stage.
    Allocation is bounded by ``MAX_DECODED_BYTES`` BEFORE any plane is
    built (header dims are untrusted)."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame = None  # (precision, height, width, [(cid, h, v, tq), ...])
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("lost JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:
            raise ValueError("EOI before scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated segment")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker in _JPEG_SOF_MARKERS:
            if marker not in (0xC0, 0xC1):
                raise ValueError(
                    "unsupported JPEG coding process (progressive/arithmetic)"
                )
            if len(body) < 6:
                raise ValueError("truncated frame header")
            precision = body[0]
            height = int.from_bytes(body[1:3], "big")
            width = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            if width == 0 or height == 0 or ncomp not in (1, 3):
                raise ValueError("unsupported frame geometry")
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated component specs")
            comps = []
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, body[8 + 3 * i]))
            frame = (precision, height, width, comps)
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                n = 128 if pq else 64
                if i + 1 + n > len(body):
                    raise ValueError("truncated DQT")
                if pq:
                    tab = [
                        int.from_bytes(body[i + 1 + 2 * j : i + 3 + 2 * j], "big")
                        for j in range(64)
                    ]
                else:
                    tab = list(body[i + 1 : i + 65])
                qt[tq] = tab
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                if i + 17 + n > len(body):
                    raise ValueError("truncated DHT")
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _huff_decoder(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI")
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("scan before frame header")
            return _decode_scan(
                data, pos, frame, body, qt, huff, restart_interval
            )
    raise ValueError("no scan data")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: tuple,
    sos: bytes,
    qt: dict[int, list[int]],
    huff: dict[tuple[int, int], dict],
    restart_interval: int,
) -> tuple[int, int, bytearray, int]:
    _prec, height, width, comps = frame
    if len(sos) < 1 or sos[0] != len(comps):
        # per-component (non-interleaved) baseline scans are rare enough
        # that the header-geometry degrade path is the right trade
        raise ValueError("only single interleaved scans supported")
    ncomp = len(comps)
    if len(sos) < 1 + 2 * ncomp + 3:
        raise ValueError("truncated SOS header")
    if sos[1 + 2 * ncomp] != 0 or sos[2 + 2 * ncomp] != 63:
        raise ValueError("non-baseline spectral selection")
    tables = {}
    for i in range(ncomp):
        cs, tt = sos[1 + 2 * i], sos[2 + 2 * i]
        tables[cs] = (tt >> 4, tt & 15)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("unsupported sampling factors")
    out_ch = 3 if ncomp == 3 else 1
    if width * height * out_ch > MAX_DECODED_BYTES:
        raise ValueError("decoded image exceeds allocation cap")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = []
    specs = []  # (h, v, qtab, dc_table, ac_table)
    for cid, h, v, tq in comps:
        if h not in (1, 2) or v not in (1, 2) or hmax % h or vmax % v:
            raise ValueError("unsupported sampling factors")
        if tq not in qt or cid not in tables:
            raise ValueError("missing quantization table / scan component")
        tdc, tac = tables[cid]
        if (0, tdc) not in huff or (1, tac) not in huff:
            raise ValueError("missing Huffman table")
        planes.append(np.zeros((mcus_y * v * 8, mcus_x * h * 8)))
        specs.append((h, v, qt[tq], huff[(0, tdc)], huff[(1, tac)]))
    reader = _JpegBitReader(data, pos)
    preds = [0] * ncomp
    n_restarts = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            reader.sync_restart(n_restarts)
            n_restarts += 1
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (h, v, qtab, dct, act) in enumerate(specs):
            for by in range(v):
                for bx in range(h):
                    coefs, preds[ci] = _decode_block(
                        reader, dct, act, qtab, preds[ci]
                    )
                    px = _DCT_A.T @ coefs @ _DCT_A + 128.0
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    full = []
    for (h, v, _q, _d, _a), plane in zip(specs, planes):
        if h != hmax or v != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1
            )
        full.append(plane[:height, :width])
    if ncomp == 1:
        rgb = full[0][..., None]
    else:
        y, cb, cr = full
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
    samples = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return width, height, bytearray(samples.tobytes()), out_ch


# Encoder-side Huffman tables: trivially valid canonical tables (12 DC
# categories at 5 bits, all 162 AC symbols at 8 bits).  Spec-correct and
# decodable by ANY baseline decoder via the DHT segments the encoder
# emits; optimal compression is a non-goal for fixture synthesis.
_ENC_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


class _JpegBitWriter:
    __slots__ = ("out", "buf", "n")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _dc_category(v: int) -> int:
    a, s = abs(v), 0
    while a:
        s += 1
        a >>= 1
    return s


def encode_jpeg_baseline(
    samples: bytes | bytearray,
    width: int,
    height: int,
    channels: int = 3,
    quant: int = 2,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Real baseline JPEG encoder (T.81 SOF0): RGB/gray samples ->
    YCbCr, 8x8 FDCT, flat-``quant`` quantization, canonical Huffman
    entropy coding with spec-correct DQT/DHT/SOS segments, optional
    4:2:0 chroma subsampling and DRI restart markers.  Exists so tests
    and fixture synthesis can produce GENUINE decodable streams (the
    md5-derived :func:`text_as_jpeg` containers carry arbitrary entropy
    bytes on purpose — their oracle is codec-free); round-trips through
    :func:`decode_jpeg` within quantization error."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(samples) != width * height * channels:
        raise ValueError("sample buffer does not match geometry")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("dims outside JPEG 16-bit fields")
    if not 1 <= quant <= 255:
        raise ValueError("quant outside 8-bit DQT range")
    arr = (
        np.frombuffer(bytes(samples), dtype=np.uint8)
        .astype(np.float64)
        .reshape(height, width, channels)
    )
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:
        planes = [arr[..., 0]]
        samp = [(1, 1)]
        subsample = False
    if subsample:
        for i in (1, 2):
            p = planes[i]
            if p.shape[0] % 2:
                p = np.vstack([p, p[-1:]])
            if p.shape[1] % 2:
                p = np.hstack([p, p[:, -1:]])
            planes[i] = (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            ) / 4.0
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    padded = []
    for (h, v), p in zip(samp, planes):
        th, tw = mcus_y * v * 8, mcus_x * h * 8
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        padded.append(p - 128.0)

    dc_codes = _huff_canonical(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _huff_canonical(_ENC_AC_BITS, _ENC_AC_VALS)
    qtab = [quant] * 64
    bw = _JpegBitWriter()
    preds = [0] * len(planes)
    entropy_parts: list[bytes] = []
    n_restarts = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            entropy_parts.append(bytes(bw.out))
            entropy_parts.append(bytes([0xFF, 0xD0 + (n_restarts & 7)]))
            bw = _JpegBitWriter()
            n_restarts += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci, ((h, v), plane) in enumerate(zip(samp, padded)):
            for by in range(v):
                for bx in range(h):
                    y0 = (my * v + by) * 8
                    x0 = (mx * h + bx) * 8
                    block = plane[y0 : y0 + 8, x0 : x0 + 8]
                    coefs = _DCT_A @ block @ _DCT_A.T
                    zq = np.rint(coefs / quant).astype(int).ravel()[_ZZ_NP]
                    diff = int(zq[0]) - preds[ci]
                    preds[ci] = int(zq[0])
                    s = _dc_category(diff)
                    code, ln = dc_codes[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                    run = 0
                    for k in range(1, 64):
                        v_ac = int(zq[k])
                        if v_ac == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_codes[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        s = _dc_category(v_ac)
                        code, ln = ac_codes[(run << 4) | s]
                        bw.write(code, ln)
                        bw.write(v_ac if v_ac >= 0 else v_ac + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, ln = ac_codes[0x00]
                        bw.write(code, ln)
    bw.flush()
    entropy_parts.append(bytes(bw.out))

    out = bytearray(JPEG_SOI)
    app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    dqt = bytes([0]) + bytes(qtab[k] for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (h, v) in enumerate(samp):
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, bits, vals in (
        (0, _ENC_DC_BITS, _ENC_DC_VALS),
        (1, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        dht = bytes([tc << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    for part in entropy_parts:
        out += part
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    synthesize: bool = False,
) -> DataFrame:
    """Per-record JPEG frame-header extraction over a binary payload
    column (same Arrow-batched, shuffle-free shape as the audio family).
    Corrupt/non-JPEG/NULL records yield null metadata fields, never a
    stage failure."""

    meta_keys = (
        "width",
        "height",
        "n_components",
        "precision",
        "progressive",
        "has_jfif",
        "n_scans",
        "n_entropy_bytes",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    meta, jpg = None, None
                else:
                    raw = bytes(p)
                    jpg = text_as_jpeg(raw) if synthesize else raw
                    meta = parse_jpeg(jpg)
                row: dict[str, Any] = {
                    "media_id": mid,
                    "n_bytes": len(jpg) if jpg is not None else None,
                }
                for k in meta_keys:
                    row[k] = meta[k] if meta is not None else None
                rows.append(row)
            yield pd.DataFrame(rows)

    pruned = media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    )
    return pruned.mapInPandas(batches, schema=JPEG_META_SCHEMA)


def _image_features(payload: bytes, width: int, height: int) -> dict[str, Any]:
    return {
        "n_bytes": len(payload),
        "sha_prefix": hashlib.sha256(payload).hexdigest()[:12],
        "width": width,
        "height": height,
        "n_frames": 1,
        "duration_ms": 0,
    }


def image_header_dims(payload: bytes) -> tuple[int, int] | None:
    """Header-only dims of a PNG/BMP/JPEG payload, ``None`` for anything
    that is not a supported image container.  For PNG/BMP it validates
    the SAME support envelope as the full decoders (bit depth 8, known
    color type, non-interlaced; uncompressed 24/32-bpp BMP whose claimed
    pixel data fits the payload) so "has dims" and "is decodable" stay
    one notion; JPEG stays header-only HERE by design (dims, components
    and the progressive flag come from the real SOF0/SOF2 segment walk —
    baseline streams additionally pixel-decode via :func:`decode_jpeg`
    where pixels are consumed, while progressive/undecodable streams
    keep geometry-with-null-digest).  Never inflates or unfilters pixels:
    metadata extraction over a 100 TB archive must be O(header), not
    O(pixels)."""
    try:
        if payload[:8] == PNG_MAGIC:
            w, h, _ch = _parse_png_ihdr(payload)
            return w, h
        if payload[:2] == b"BM" and len(payload) > 34:
            _off, w, h, _ch, _td, _rp = _parse_bmp_header(payload)
            return w, h
        if payload[:2] == JPEG_SOI:
            meta = parse_jpeg(payload)
            if meta is not None:
                return meta["width"], meta["height"]
        if payload[:6] in (GIF_MAGIC_87, GIF_MAGIC_89):
            meta = parse_gif(payload)
            if meta is not None:
                return meta["width"], meta["height"]
    except DECODE_ERRORS:
        pass
    return None


def try_decode_image(
    payload: bytes,
) -> tuple[int, int, bytearray, int] | None:
    """Full magic-byte-routed pixel decode, ``None`` when the payload is
    not a decodable image (unknown container, corrupt bytes, hostile
    headers) — the single shared routing/degrade point for every consumer
    that needs actual pixels."""
    try:
        if payload[:8] == PNG_MAGIC:
            return decode_png(payload)
        if payload[:2] == b"BM" and len(payload) > 34:
            return decode_bmp(payload)
        if payload[:2] == JPEG_SOI:
            return decode_jpeg(payload)
    except DECODE_ERRORS:
        pass
    return None


def decode_media(payload: bytes, media_type: str) -> dict[str, Any]:
    """Magic-byte-routed metadata decode: real PNG/BMP/JPEG header parsing
    when the payload is a genuine image container, the deterministic hash stub
    otherwise (unknown formats AND corrupt image bytes — a 100 TB scan
    must degrade per-record, never fail the stage on one bad file).
    Feature extraction reads ONLY the header — the per-pixel unfilter
    loop runs solely where pixels are consumed (:func:`resize_media`)."""
    dims = image_header_dims(payload)
    if dims is not None:
        return _image_features(payload, dims[0], dims[1])
    if HAVE_REAL_CODECS and media_type == "image":
        # Image payloads only: PIL happily "opens" text-ish containers
        # (PPM, XBM) that an audio/video column may coincidentally match,
        # and audio/video need ffmpeg anyway — those hit the stub
        # regardless, keeping the decode deterministic per media_type.
        try:
            return _real_decode(payload, media_type)
        except Exception:  # noqa: BLE001 — any undecodable payload degrades
            pass
    return _fake_decode(payload, media_type)


def extract_media_features(
    media: DataFrame,
    target_partition_bytes: int = 128 * 1024 * 1024,
    approx_row_bytes: int = 1 * 1024 * 1024,
) -> DataFrame:
    """Decode + feature-extract a media table via mapInPandas.

    Input follows MEDIA_SCHEMA; output follows FEATURE_SCHEMA (payload
    dropped).  For parquet-backed media, partition byte budget is enforced
    by ``spark.sql.files.maxPartitionBytes`` at scan time; the arguments
    document the intended budget for non-file sources (set
    ``maxRecordsPerBatch`` accordingly when wiring a stream).
    """
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _NULL_FEATURES if p is None else decode_media(bytes(p), t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    pruned = media.select("media_id", "payload", "media_type")
    return pruned.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_nth: int = 2
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    Frame *extraction* is stubbed (needs a codec); frame indices come from
    the decoded n_frames, so the explode shape — the part that matters for
    partitioning — is real.
    """
    # NULL n_frames (NULL-payload records) means "no frames", not frame 0:
    # greatest(NULL - 1, 0) would otherwise resolve to 0 and emit one row.
    feats = extract_media_features(media).where(F.col("n_frames").isNotNull())
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth)
            )
        ).alias("frame_index"),
        "width",
        "height",
    )


def text_as_media(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    media_type: str = "image",
) -> DataFrame:
    """Adapter used by tests/bench: treats utf-8 text bytes as an opaque
    payload so the media pipeline can run against the documents table.
    ``media_type`` selects the fake-decode branch ('image' is single
    frame; 'video'/'audio' derive frame count and duration from the
    payload hash)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            F.lit("documents").alias("source"),
            F.lit("txt").alias("declared_format"),
        ).alias("meta"),
    )


def resize_nearest(
    samples: bytes | bytearray,
    width: int,
    height: int,
    channels: int,
    out_w: int,
    out_h: int,
) -> bytearray:
    """Nearest-neighbor downsample of raw interleaved samples — the
    pure-Python resize kernel behind :func:`resize_media` (no PIL in the
    container).  Index math only; verified against real decoded PNG/BMP
    pixels in tests."""
    out = bytearray(out_w * out_h * channels)
    for y in range(out_h):
        sy = y * height // out_h
        row = sy * width * channels
        orow = y * out_w * channels
        for x in range(out_w):
            sx = x * width // out_w
            s = row + sx * channels
            o = orow + x * channels
            out[o : o + channels] = samples[s : s + channels]
    return out


def fit_within(width: int, height: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving downscale-only fit: the (out_w, out_h) a
    thumbnailer produces for a ``max_dim`` bounding box.  Pure integer /
    IEEE-double arithmetic so the SQL oracle reproduces it exactly."""
    m = max(width, height)
    if m <= max_dim:
        return width, height
    return (
        max(1, int(width * float(max_dim) / m)),
        max(1, int(height * float(max_dim) / m)),
    )


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Thumbnail-resize plumbing over a media table: decode dims (real
    PNG/BMP or the deterministic stub), compute the aspect-preserving
    ``max_dim`` fit, and report input/output geometry + output payload
    size.  Decodable payloads additionally carry ``thumb_sha`` — a
    digest of the ACTUAL resized pixel bytes (the artifact a real
    thumbnail job ships; verified against known fixtures in tests).
    Header-parsable but pixel-undecodable payloads (over the decode cap,
    corrupt pixel data) keep their real header geometry with a null
    digest; only headerless payloads degrade to the hash stub —
    per-record, never failing the stage.

    Same Arrow ``mapInPandas`` shape as :func:`extract_media_features`:
    payload column dropped from the output so downstream stages never
    shuffle the binaries.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                payload = bytes(payload)
                decoded = try_decode_image(payload)
                thumb_sha = None
                if decoded is not None:
                    w, h, px, ch = decoded
                    ow, oh = fit_within(w, h, max_dim)
                    resized = resize_nearest(px, w, h, ch, ow, oh)
                    n_out = len(resized)
                    thumb_sha = hashlib.sha256(bytes(resized)).hexdigest()[:12]
                else:
                    # header-parsable but pixel-undecodable (over the
                    # decode cap, corrupt IDAT): geometry from the REAL
                    # header so this operator and decode_media agree on
                    # the same payload's dims; only headerless payloads
                    # fall to the hash stub
                    dims = image_header_dims(payload)
                    if dims is not None:
                        w, h = dims
                        ch = 3
                    else:
                        d = _fake_decode(payload, str(mtype))
                        w, h, ch = d["width"], d["height"], 3
                    ow, oh = fit_within(w, h, max_dim)
                    n_out = ow * oh * ch
                rows.append((mid, w, h, ow, oh, n_out, thumb_sha))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "out_width",
                    "out_height",
                    "n_out_bytes",
                    "thumb_sha",
                ],
            )

    pruned = media.select("media_id", "payload", "media_type")
    return pruned.mapInPandas(
        batches,
        schema="media_id long, width int, height int, "
        "out_width int, out_height int, n_out_bytes long, thumb_sha string",
    )
