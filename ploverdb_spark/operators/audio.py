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
    unencoded-audio MD5 field."""
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
