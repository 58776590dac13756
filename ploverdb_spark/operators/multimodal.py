"""Multimodal (image/audio/video) column handling.

Media payloads are opaque BINARY columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each Python worker touches whole record
batches, never single rows.

The actual codec calls are STUBBED (no image/audio libraries in this
container): ``decode_media`` routes to a deterministic fake decoder that
derives plausible metadata (dims, duration, channel stats) from the bytes'
md5 — the Spark-side plumbing (schema contract, batch iteration,
partition sizing) is real and tested, and swapping in PIL/ffmpeg later
only replaces ``_fake_decode``.

At 100 TB: binaries dominate row size, so operators repartition by byte
budget (``target_partition_bytes``), select only the binary + key columns
(column pruning keeps metadata scans cheap), and emit features WITHOUT the
payload so downstream stages never reshuffle gigabytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

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
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not present in this "
        "container; _fake_decode provides the deterministic test path"
    )


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
    decode = _real_decode if HAVE_REAL_CODECS else _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode(bytes(p), t)
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
    feats = extract_media_features(media)
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
