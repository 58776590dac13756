"""Audio-container plumbing: real RIFF/WAV construction and parsing.

Extends the multimodal family (``operators/multimodal.py`` — PNG/BMP)
to audio: the Spark-side plumbing (schema, Arrow batching, per-record
degrade) wraps a genuine WAV codec — ``build_wav`` emits a spec-correct
RIFF container and ``parse_wav`` walks its chunks with proper word
alignment, exactly what a 100 TB crawl-audio scan does before routing
payloads to transcode/feature workers.  Like the image path, payload
synthesis derives its parameters from md5 so a SQL oracle can recompute
the expected metadata without a codec.

Scale shape: both stages are Arrow-batched ``mapInPandas`` over a
pruned (id, payload) projection — embarrassingly parallel, no shuffle;
a corrupt payload degrades to null fields for that record, never
failing the stage.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WAV_META_SCHEMA = (
    "media_id long, n_bytes long, sample_rate int, n_channels int, "
    "bits_per_sample int, n_data_bytes long, n_samples long, "
    "duration_ms long"
)


def build_wav(
    pcm: bytes,
    sample_rate: int,
    n_channels: int,
    bits_per_sample: int,
    extra_chunk: bool = False,
) -> bytes:
    """Spec-correct PCM WAV container: RIFF size, fmt fields, and the
    odd-length data-chunk pad byte are all real.  ``extra_chunk``
    inserts a LIST chunk between fmt and data so parsers that assume
    data immediately follows fmt are caught by tests."""
    block_align = n_channels * bits_per_sample // 8
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align,
        bits_per_sample,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        info = b"INFOfake"
        chunks += b"LIST" + struct.pack("<I", len(info)) + info
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) % 2:
        chunks += b"\x00"  # RIFF chunks are word-aligned
    body = b"WAVE" + chunks
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(data: bytes) -> dict[str, Any] | None:
    """Chunk-walking WAV metadata parse (no audio libs): validates the
    RIFF/WAVE magic, honors word alignment, tolerates unknown chunks
    (LIST/INFO/id3), and requires both fmt and data chunks.  Returns
    None for anything malformed — the caller degrades per-record."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if cid == b"fmt " and clen >= 16:
            _fmt_tag, ch, rate, _br, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if ch == 0 or rate == 0 or block_align == 0:
                return None
            fmt = (ch, rate, block_align, bits)
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen % 2)
    if fmt is None or data_len is None:
        return None
    ch, rate, block_align, bits = fmt
    n_samples = data_len // block_align
    return {
        "sample_rate": rate,
        "n_channels": ch,
        "bits_per_sample": bits,
        "n_data_bytes": data_len,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // rate,
    }


def text_as_wav(payload: bytes) -> bytes:
    """Deterministic WAV synthesis from an opaque payload (the audio
    sibling of multimodal.text_as_media): format parameters come from
    md5 bytes of the payload, PCM data IS the payload bytes — so a SQL
    oracle recomputes every metadata field from md5/length alone while
    the engine-side bytes round-trip through the real codec."""
    d = hashlib.md5(payload).digest()
    sample_rate = 8000 + d[0] * 100
    n_channels = 1 + (d[1] % 2)
    bits = 8 + 8 * (d[2] % 2)
    return build_wav(
        payload, sample_rate, n_channels, bits, extra_chunk=d[3] % 2 == 0
    )


FLAC_META_SCHEMA = (
    "media_id long, n_bytes long, sample_rate int, n_channels int, "
    "bits_per_sample int, total_samples long, duration_ms long, "
    "n_meta_blocks int, n_frame_bytes long, md5_prefix string"
)


def build_flac(
    frames: bytes,
    sample_rate: int,
    n_channels: int,
    bits_per_sample: int,
    total_samples: int,
    audio_md5: bytes,
    extra_padding: bool = False,
) -> bytes:
    """Spec-correct FLAC container head: ``fLaC`` magic, a 34-byte
    STREAMINFO metadata block (big-endian bit-packed rate/channels/bits/
    total-samples per the public FLAC format spec), optionally a PADDING
    block, then the frame bytes.  ``audio_md5`` is STREAMINFO's 128-bit
    unencoded-audio MD5 field.

    Spec ranges are asserted up front: out-of-range params would
    otherwise bleed into adjacent bit fields via the OR-packing (channels
    > 8, bits > 32) or overflow ``to_bytes(8)`` (rate >= 2^20), silently
    producing a corrupt container."""
    if not 0 < sample_rate < (1 << 20):
        raise ValueError(f"sample_rate {sample_rate} outside FLAC 20-bit field")
    if not 1 <= n_channels <= 8:
        raise ValueError(f"n_channels {n_channels} outside FLAC range 1-8")
    if not 4 <= bits_per_sample <= 32:
        raise ValueError(f"bits_per_sample {bits_per_sample} outside FLAC range 4-32")
    packed = (
        (sample_rate << 44)
        | ((n_channels - 1) << 41)
        | ((bits_per_sample - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    si = (
        struct.pack(">HH", 4096, 4096)  # min/max block size
        + (0).to_bytes(3, "big")  # min frame size (0 = unknown)
        + (0).to_bytes(3, "big")  # max frame size
        + packed.to_bytes(8, "big")
        + audio_md5
    )
    # block header: bit7 = last-metadata-block flag, bits 0-6 = type
    blocks = bytes([0x00 if extra_padding else 0x80]) + len(si).to_bytes(
        3, "big"
    ) + si
    if extra_padding:
        pad = b"\x00" * 16
        blocks += bytes([0x80 | 0x01]) + len(pad).to_bytes(3, "big") + pad
    return b"fLaC" + blocks + frames


def parse_flac(data: bytes) -> dict[str, Any] | None:
    """Metadata-block-walking FLAC parse (no audio libs): validates the
    fLaC magic, requires STREAMINFO as the first block (per spec),
    tolerates any other block types, and stops at the last-block flag.
    Returns None for anything malformed — the caller degrades
    per-record."""
    if len(data) < 4 or data[:4] != b"fLaC":
        return None
    pos, si, n_blocks = 4, None, 0
    while True:
        if pos + 4 > len(data):
            return None  # ran out before the last-block flag
        hdr = data[pos]
        blen = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + blen]
        if len(body) < blen:
            return None  # truncated block
        if n_blocks == 0:
            if hdr & 0x7F != 0 or blen != 34:
                return None  # spec: first block must be STREAMINFO
            si = body
        n_blocks += 1
        pos += 4 + blen
        if hdr & 0x80:
            break
    packed = int.from_bytes(si[10:18], "big")
    rate = packed >> 44
    ch = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        return None
    return {
        "sample_rate": rate,
        "n_channels": ch,
        "bits_per_sample": bits,
        "total_samples": total,
        "duration_ms": total * 1000 // rate,
        "n_meta_blocks": n_blocks,
        "n_frame_bytes": len(data) - pos,
        "md5_prefix": si[18:34].hex()[:12],
    }


def text_as_flac(payload: bytes) -> bytes:
    """Deterministic FLAC synthesis from an opaque payload (the FLAC
    sibling of :func:`text_as_wav`): stream parameters come from md5
    bytes of the payload, the payload bytes stand in for the frame
    section, and STREAMINFO's audio-MD5 field IS md5(payload) — so a SQL
    oracle recomputes every metadata field from md5/length alone while
    the engine-side bytes round-trip through the real container walk."""
    d = hashlib.md5(payload).digest()
    sample_rate = 8000 + d[0] * 100
    n_channels = 1 + (d[1] % 2)
    bits = 8 + 8 * (d[2] % 2)
    block_align = n_channels * bits // 8
    return build_flac(
        payload,
        sample_rate,
        n_channels,
        bits,
        total_samples=len(payload) // block_align,
        audio_md5=d,
        extra_padding=d[3] % 2 == 0,
    )


def flac_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    synthesize: bool = False,
) -> DataFrame:
    """Per-record FLAC STREAMINFO extraction over a binary payload column
    (same Arrow-batched, shuffle-free shape as :func:`audio_metadata`).
    Corrupt/non-FLAC/NULL records yield null metadata fields, never a
    stage failure."""

    meta_keys = (
        "sample_rate",
        "n_channels",
        "bits_per_sample",
        "total_samples",
        "duration_ms",
        "n_meta_blocks",
        "n_frame_bytes",
        "md5_prefix",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    meta, flac = None, None
                else:
                    raw = bytes(p)
                    flac = text_as_flac(raw) if synthesize else raw
                    meta = parse_flac(flac)
                row = {
                    "media_id": mid,
                    "n_bytes": len(flac) if flac is not None else None,
                }
                for k in meta_keys:
                    row[k] = meta[k] if meta is not None else None
                rows.append(row)
            yield pd.DataFrame(rows)

    pruned = media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    )
    return pruned.mapInPandas(batches, schema=FLAC_META_SCHEMA)


# MPEG-1 Layer III bitrate table (kbps), index 1-14; 0 = free, 15 = bad.
MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
MP3_SAMPLE_RATES = (44100, 48000, 32000)  # MPEG-1 sample-rate index 0-2
MP3_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III

MP3_META_SCHEMA = (
    "media_id long, n_bytes long, sample_rate int, n_channels int, "
    "bitrate_kbps int, n_frames int, duration_ms long, has_id3 boolean, "
    "is_vbr boolean, n_audio_bytes long"
)


def build_mp3(
    payload: bytes,
    bitrate_index: int,
    samplerate_index: int,
    channel_mode: int,
    id3_body: bytes | None = None,
) -> bytes:
    """Spec-correct MPEG-1 Layer III (CBR, no CRC) byte stream: an
    optional ID3v2 tag (real syncsafe size field), then fixed-length
    frames whose 4-byte headers carry genuine sync/version/layer/bitrate/
    samplerate/channel bits.  Frame bodies are consecutive payload
    slices, the last zero-padded to the frame length (CBR frames are
    fixed-size).  Ranges are asserted so misuse fails loudly instead of
    emitting a stream with reserved field values."""
    if not 1 <= bitrate_index <= 14:
        raise ValueError(f"bitrate_index {bitrate_index} outside 1-14")
    if not 0 <= samplerate_index <= 2:
        raise ValueError(f"samplerate_index {samplerate_index} outside 0-2")
    if not 0 <= channel_mode <= 3:
        raise ValueError(f"channel_mode {channel_mode} outside 0-3")
    out = b""
    if id3_body is not None:
        size = len(id3_body)
        syncsafe = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + syncsafe + id3_body
    bitrate = MP3_BITRATES[bitrate_index]
    rate = MP3_SAMPLE_RATES[samplerate_index]
    frame_len = 144_000 * bitrate // rate  # padding bit 0
    hdr = bytes(
        [
            0xFF,
            0xFB,  # sync(11) + MPEG-1(11) + Layer III(01) + no-CRC(1)
            (bitrate_index << 4) | (samplerate_index << 2),
            channel_mode << 6,
        ]
    )
    body_len = frame_len - 4
    n_frames = max(1, -(-len(payload) // body_len))
    for i in range(n_frames):
        body = payload[i * body_len : (i + 1) * body_len]
        out += hdr + body + b"\x00" * (body_len - len(body))
    return out


def parse_mp3(data: bytes) -> dict[str, Any] | None:
    """Frame-header-walking MP3 scan (no audio libs): skips a leading
    ID3v2 tag (validating its syncsafe size), then walks MPEG-1 Layer III
    frame headers — sync pattern, version/layer bits, bitrate and
    sample-rate table lookups, padding bit — summing frames and detecting
    bitrate changes (VBR).  A truncated final frame still counts (crawl
    payloads are routinely cut mid-frame).  Mid-stream degradation is
    uniform: ANY invalid header at a frame boundary after >=1 valid
    frame — lost sync, non-MPEG1-LayerIII bits, free/bad bitrate,
    reserved sample rate — ends the walk and returns the frames parsed
    so far, with ``n_audio_bytes`` counting only through the end of the
    last valid frame (trailing garbage is excluded).  The same defect at
    the FIRST header returns None and the caller degrades per-record."""
    pos, has_id3 = 0, False
    if data[:3] == b"ID3":
        if len(data) < 10:
            return None
        b6, b7, b8, b9 = data[6], data[7], data[8], data[9]
        if (b6 | b7 | b8 | b9) & 0x80:
            return None  # syncsafe bytes must have bit 7 clear
        pos = 10 + ((b6 << 21) | (b7 << 14) | (b8 << 7) | b9)
        has_id3 = True
    n_frames = 0
    bitrates: set[int] = set()
    rate = channels = None
    audio_start = audio_end = pos
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if (
            b0 != 0xFF
            or (b1 & 0xE0) != 0xE0  # lost sync
            or (b1 >> 3) & 0x3 != 0x3  # not MPEG-1
            or (b1 >> 1) & 0x3 != 0x1  # not Layer III
        ):
            break
        bidx, sidx = b2 >> 4, (b2 >> 2) & 0x3
        if bidx in (0, 15) or sidx == 3:
            break  # free/bad bitrate, reserved sample rate
        bitrate = MP3_BITRATES[bidx]
        rate = MP3_SAMPLE_RATES[sidx]
        channels = 1 if (b3 >> 6) == 3 else 2
        bitrates.add(bitrate)
        n_frames += 1
        pos += 144_000 * bitrate // rate + ((b2 >> 1) & 0x1)
        audio_end = min(pos, len(data))  # truncated final frame: cap
    if n_frames == 0:
        return None
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "bitrate_kbps": min(bitrates),
        "n_frames": n_frames,
        "duration_ms": n_frames * MP3_SAMPLES_PER_FRAME * 1000 // rate,
        "has_id3": has_id3,
        "is_vbr": len(bitrates) > 1,
        "n_audio_bytes": audio_end - audio_start,
    }


def text_as_mp3(payload: bytes) -> bytes:
    """Deterministic MP3 synthesis from an opaque payload (the MP3
    sibling of :func:`text_as_wav`): stream parameters come from md5
    bytes of the payload, frame bodies are the payload bytes — so a SQL
    oracle recomputes every metadata field from md5/length alone while
    the engine-side bytes round-trip through the real frame walk."""
    d = hashlib.md5(payload).digest()
    return build_mp3(
        payload,
        bitrate_index=1 + d[0] % 14,
        samplerate_index=d[1] % 3,
        channel_mode=3 if d[2] % 2 else 0,
        id3_body=b"\x00" * 32 if d[3] % 2 == 0 else None,
    )


def mp3_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    synthesize: bool = False,
) -> DataFrame:
    """Per-record MP3 frame-header scan over a binary payload column
    (same Arrow-batched, shuffle-free shape as :func:`audio_metadata`).
    Corrupt/non-MP3/NULL records yield null metadata fields, never a
    stage failure."""

    meta_keys = (
        "sample_rate",
        "n_channels",
        "bitrate_kbps",
        "n_frames",
        "duration_ms",
        "has_id3",
        "is_vbr",
        "n_audio_bytes",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    meta, mp3 = None, None
                else:
                    raw = bytes(p)
                    mp3 = text_as_mp3(raw) if synthesize else raw
                    meta = parse_mp3(mp3)
                row = {
                    "media_id": mid,
                    "n_bytes": len(mp3) if mp3 is not None else None,
                }
                for k in meta_keys:
                    row[k] = meta[k] if meta is not None else None
                rows.append(row)
            yield pd.DataFrame(rows)

    pruned = media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    )
    return pruned.mapInPandas(batches, schema=MP3_META_SCHEMA)


def audio_metadata(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    synthesize: bool = False,
) -> DataFrame:
    """Per-record WAV metadata extraction over a binary payload column.

    With ``synthesize=True`` the payload is first wrapped into a WAV
    container via :func:`text_as_wav` (test/bench path over the
    documents table); production points this at a real audio payload
    column.  Corrupt/non-WAV records yield null metadata fields, never
    a stage failure.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    # NULL payload: degrade per-record with NULL metadata
                    # (md5(NULL)/octet_length(NULL) are NULL oracle-side),
                    # never bytes(None) -> stage failure.
                    meta, wav = None, None
                else:
                    raw = bytes(p)
                    wav = text_as_wav(raw) if synthesize else raw
                    meta = parse_wav(wav)
                row = {
                    "media_id": mid,
                    "n_bytes": len(wav) if wav is not None else None,
                }
                for k in (
                    "sample_rate",
                    "n_channels",
                    "bits_per_sample",
                    "n_data_bytes",
                    "n_samples",
                    "duration_ms",
                ):
                    row[k] = meta[k] if meta is not None else None
                rows.append(row)
            yield pd.DataFrame(rows)

    pruned = media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    )
    return pruned.mapInPandas(batches, schema=WAV_META_SCHEMA)
