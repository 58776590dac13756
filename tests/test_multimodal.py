"""Real PNG/BMP decoding behind the media seam (VERDICT r3 #7): the
fixtures below are genuine container bytes built with struct/zlib, so the
decoders are verified against real pixels, filter reconstruction and all.
Non-image payloads must keep the deterministic hash stub (the m1/m2
oracles depend on it)."""

from __future__ import annotations

import struct
import zlib

import pytest

from ploverdb_spark.operators.multimodal import (
    _fake_decode,
    decode_bmp,
    decode_media,
    decode_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def make_png(width, height, pixels, color_type=2, filters=None) -> bytes:
    """Encode genuine PNG bytes (8-bit, non-interlaced) applying the given
    per-row filter types — the encoder side of the decoder's unfilter
    math, so a round trip proves each filter's reconstruction."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(pixels[y * stride : (y + 1) * stride])
        f = filters[y]
        enc = bytearray(line)
        for i in range(stride):
            left = line[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            if f == 1:
                enc[i] = (line[i] - left) & 0xFF
            elif f == 2:
                enc[i] = (line[i] - up) & 0xFF
            elif f == 3:
                enc[i] = (line[i] - (left + up) // 2) & 0xFF
            elif f == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def make_bmp(width, height, bgr_rows_topdown, bpp=24) -> bytes:
    """Encode genuine bottom-up 24/32-bpp BMP bytes with row padding."""
    channels = bpp // 8
    row_bytes = width * channels
    row_padded = (row_bytes + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bgr_rows_topdown[y * row_bytes : (y + 1) * row_bytes]
        body += row + b"\x00" * (row_padded - row_bytes)
    pixel_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(body), 0, 0, 0, 0
        )
    )
    return bytes(header) + bytes(body)


PIXELS_3x2_RGB = bytes(
    [10, 20, 30, 40, 50, 60, 70, 80, 90, 15, 25, 35, 45, 55, 65, 75, 85, 95]
)


@pytest.mark.parametrize("filters", [[0, 0], [1, 1], [2, 2], [3, 3], [4, 4], [0, 4]])
def test_decode_png_roundtrip_all_filters(filters):
    png = make_png(3, 2, PIXELS_3x2_RGB, color_type=2, filters=filters)
    w, h, samples, ch = decode_png(png)
    assert (w, h, ch) == (3, 2, 3)
    assert bytes(samples) == PIXELS_3x2_RGB


def test_decode_png_grayscale_and_rgba():
    gray = bytes(range(12))
    w, h, s, ch = decode_png(make_png(4, 3, gray, color_type=0))
    assert (w, h, ch) == (4, 3, 1) and bytes(s) == gray
    rgba = bytes(range(2 * 2 * 4))
    w, h, s, ch = decode_png(make_png(2, 2, rgba, color_type=6, filters=[1, 4]))
    assert (w, h, ch) == (2, 2, 4) and bytes(s) == rgba


def test_decode_bmp_roundtrip():
    bgr = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18])
    bmp = make_bmp(3, 2, bgr)
    w, h, samples, ch = decode_bmp(bmp)
    assert (w, h, ch) == (3, 2, 3)
    assert bytes(samples) == bgr  # rows back in top-down order


def test_decode_media_routes_by_magic():
    png = make_png(3, 2, PIXELS_3x2_RGB)
    feats = decode_media(png, "image")
    assert (feats["width"], feats["height"]) == (3, 2)  # REAL dims
    assert feats["n_frames"] == 1 and feats["duration_ms"] == 0
    assert feats["n_bytes"] == len(png)
    # non-image payloads keep the deterministic hash stub (oracle parity)
    text = "some document text".encode()
    assert decode_media(text, "image") == _fake_decode(text, "image")
    # corrupt PNG (magic intact, body truncated) degrades to the stub
    corrupt = png[:20]
    assert decode_media(corrupt, "image") == _fake_decode(corrupt, "image")
    # interlaced PNGs are out of scope -> stub, not a crash
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 1)
    interlaced = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    )
    assert decode_media(interlaced, "image") == _fake_decode(interlaced, "image")


def test_extract_media_features_real_dims_through_spark(spark):
    """The mapInPandas pipeline reports decoded dimensions for genuine
    image payloads, hash-stub dimensions for opaque ones — in one batch."""
    from ploverdb_spark.operators.multimodal import extract_media_features

    png = make_png(5, 4, bytes(range(5 * 4 * 3)))
    bmp = make_bmp(6, 2, bytes(range(36)))
    media = spark.createDataFrame(
        [
            (1, bytearray(png), "image", ("t", "png")),
            (2, bytearray(bmp), "image", ("t", "bmp")),
            (3, bytearray(b"plain text payload"), "image", ("t", "txt")),
        ],
        "media_id long, payload binary, media_type string, "
        "meta struct<source:string, declared_format:string>",
    )
    rows = {r.media_id: r for r in extract_media_features(media).collect()}
    assert (rows[1].width, rows[1].height) == (5, 4)
    assert (rows[2].width, rows[2].height) == (6, 2)
    stub = _fake_decode(b"plain text payload", "image")
    assert (rows[3].width, rows[3].height) == (stub["width"], stub["height"])


def test_fit_within_geometry():
    from ploverdb_spark.operators.multimodal import fit_within

    assert fit_within(128, 64, 64) == (64, 32)
    assert fit_within(64, 128, 64) == (32, 64)
    assert fit_within(50, 40, 64) == (50, 40)  # downscale-only
    assert fit_within(1000, 3, 64) == (64, 1)  # floor + min-1 guard
    assert fit_within(3, 1000, 64) == (1, 64)


def test_resize_nearest_on_decoded_png():
    """The resize kernel verified on REAL decoded pixels: a 4x2 RGB PNG
    downsampled to 2x1 must keep exactly the nearest-neighbor picks."""
    from ploverdb_spark.operators.multimodal import decode_png, resize_nearest

    # rows: (r0 r1 r2 r3) / (r4 r5 r6 r7), each pixel one distinct red value
    pixels = bytes(
        v for i in range(8) for v in (i * 10, 0, 0)
    )
    png = make_png(4, 2, pixels, color_type=2)
    w, h, samples, ch = decode_png(png)
    assert (w, h, ch) == (4, 2, 3)
    out = resize_nearest(samples, w, h, ch, 2, 1)
    # sx = x*4//2 -> pixels 0 and 2 of source row 0 (sy = 0*2//1 = 0)
    assert bytes(out) == bytes([0, 0, 0, 20, 0, 0])


def test_hostile_bmp_header_degrades_not_oom():
    """A 60-byte payload claiming 2^20 x 2^20 pixels must degrade to the
    hash stub per record — never allocate terabytes / kill the task."""
    import struct as _s

    from ploverdb_spark.operators.multimodal import (
        decode_media,
        image_header_dims,
        try_decode_image,
    )

    hdr = bytearray(60)
    hdr[0:2] = b"BM"
    hdr[10:14] = _s.pack("<I", 54)          # pixel offset
    hdr[18:26] = _s.pack("<ii", 1 << 20, 1 << 20)
    hdr[28:30] = _s.pack("<H", 24)
    hdr[30:34] = _s.pack("<I", 0)
    payload = bytes(hdr)
    assert image_header_dims(payload) is None
    assert try_decode_image(payload) is None
    d = decode_media(payload, "image")
    assert d == _fake_decode(payload, "image")


def test_png_bomb_header_degrades():
    """A tiny PNG claiming enormous dims is rejected BEFORE inflating."""
    from ploverdb_spark.operators.multimodal import decode_png, decode_media

    ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="over cap"):
        decode_png(png)
    # metadata extraction is O(header): it reports the claimed dims
    # WITHOUT allocating pixel buffers (the cap protects pixel consumers)
    assert decode_media(png, "image")["width"] == 1 << 16
    from ploverdb_spark.operators.multimodal import try_decode_image

    assert try_decode_image(png) is None  # pixel path refuses the bomb


def test_decode_media_header_only_reports_real_dims():
    """Feature extraction is O(header): real dims come out without the
    pixel loop, and sha/n_bytes still describe the payload."""
    from ploverdb_spark.operators.multimodal import decode_media

    png = make_png(6, 3, bytes(range(6 * 3 * 3)), color_type=2)
    d = decode_media(png, "image")
    assert (d["width"], d["height"]) == (6, 3)
    assert d["n_bytes"] == len(png)


def test_zero_dim_png_degrades():
    """width=0 / height=0 PNGs must be rejected by header AND decoder —
    previously they decoded to empty pixels and produced corrupt resize
    geometry."""
    from ploverdb_spark.operators.multimodal import (
        decode_media,
        decode_png,
        image_header_dims,
        try_decode_image,
    )

    ihdr = struct.pack(">IIBBBBB", 0, 100, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + _chunk(b"IEND", b"")
    )
    assert image_header_dims(png) is None
    assert try_decode_image(png) is None
    with pytest.raises(ValueError, match="non-positive"):
        decode_png(png)
    assert decode_media(png, "image") == _fake_decode(png, "image")


def test_resize_media_thumb_sha_through_spark(spark):
    """Decodable payloads carry a digest of the actual resized pixels;
    header-parsable-but-undecodable and stub payloads carry null."""
    import hashlib

    from ploverdb_spark.operators.multimodal import (
        decode_png,
        fit_within,
        resize_media,
        resize_nearest,
    )

    png = make_png(8, 4, bytes(range(8 * 4 * 3)))
    media = spark.createDataFrame(
        [
            (1, bytearray(png), "image", ("t", "png")),
            (2, bytearray(b"opaque payload"), "image", ("t", "txt")),
        ],
        "media_id long, payload binary, media_type string, "
        "meta struct<source:string, declared_format:string>",
    )
    rows = {r.media_id: r for r in resize_media(media, max_dim=4).collect()}
    w, h, px, ch = decode_png(png)
    ow, oh = fit_within(w, h, 4)
    expect = hashlib.sha256(
        bytes(resize_nearest(px, w, h, ch, ow, oh))
    ).hexdigest()[:12]
    assert rows[1].thumb_sha == expect
    assert (rows[1].out_width, rows[1].out_height) == (ow, oh)
    assert rows[2].thumb_sha is None


def test_pil_presence_widens_not_replaces_decode(monkeypatch):
    """Round-4 verdict defect 3: with HAVE_REAL_CODECS=True the old code
    routed EVERY payload to _real_decode (which raised) — installing PIL
    broke m1 instead of improving it.  Now the native PNG/BMP path runs
    first, a fake PIL handles what it can, and everything else still
    degrades to the hash stub."""
    import io
    import sys
    import types

    from ploverdb_spark.operators import multimodal as mm

    class FakeImage:
        size = (40, 30)
        n_frames = 1

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    fake_pil_image = types.ModuleType("PIL.Image")

    def fake_open(fp):
        data = fp.read() if isinstance(fp, io.BytesIO) else bytes(fp)
        if data[:5] == b"\xff\xd8JPG":  # pretend-JPEG magic for the test
            return FakeImage()
        raise OSError("cannot identify image file")

    fake_pil_image.open = fake_open
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_pil_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_pil_image)
    monkeypatch.setattr(mm, "HAVE_REAL_CODECS", True)

    # 1. genuine PNG: still the native decoder (real dims), PIL not consulted
    png = make_png(3, 2, PIXELS_3x2_RGB)
    feats = mm.decode_media(png, "image")
    assert (feats["width"], feats["height"]) == (3, 2)
    # 2. PIL-decodable format: PIL dims, not the stub, not a raise
    jpg = b"\xff\xd8JPG" + b"payload-bytes"
    feats = mm.decode_media(jpg, "image")
    assert (feats["width"], feats["height"]) == (40, 30)
    assert feats["n_bytes"] == len(jpg)
    # 3. opaque payload: PIL raises -> hash stub, never a stage failure
    text = b"some document text"
    assert mm.decode_media(text, "image") == mm._fake_decode(text, "image")
    # 4. audio/video payloads NEVER consult PIL even when it could "open"
    # them (PIL accepts text-ish containers like PPM/XBM): they hit the
    # deterministic stub regardless, per the _real_decode contract
    assert mm.decode_media(jpg, "video") == mm._fake_decode(jpg, "video")
    assert mm.decode_media(jpg, "audio") == mm._fake_decode(jpg, "audio")


def test_null_payload_degrades_to_null_metadata(spark):
    """A NULL payload must degrade per-record with NULL metadata fields —
    never ``bytes(None)`` crashing the stage (the documented contract at
    audio.py `audio_metadata` / multimodal.py `extract_media_features`).
    Mirrors the oracle's md5(NULL)/octet_length(NULL) -> NULL semantics."""
    from ploverdb_spark.operators.audio import audio_metadata
    from ploverdb_spark.operators.multimodal import (
        extract_media_features,
        sample_frames,
    )

    media = spark.createDataFrame(
        [
            (1, bytearray(b"plain text payload"), "image", ("t", "txt")),
            (2, None, "image", ("t", "txt")),
            (3, None, "audio", ("t", "wav")),
        ],
        "media_id long, payload binary, media_type string, "
        "meta struct<source:string, declared_format:string>",
    )

    # m1: feature extraction — null row yields null features, others intact
    feats = {r.media_id: r for r in extract_media_features(media).collect()}
    assert feats[1].n_bytes == 18 and feats[1].width is not None
    for mid in (2, 3):
        r = feats[mid]
        assert (
            r.n_bytes is None
            and r.sha_prefix is None
            and r.width is None
            and r.height is None
            and r.n_frames is None
            and r.duration_ms is None
        )

    # m2: frame sampling — NULL n_frames means no frames, not frame 0
    frames = sample_frames(media).collect()
    assert {r.media_id for r in frames} == {1}

    # m4: WAV metadata — same degrade contract on the audio walk
    audio = media.select("media_id", "payload")
    rows = {r.media_id: r for r in audio_metadata(audio, synthesize=True).collect()}
    assert rows[1].n_bytes is not None and rows[1].sample_rate is not None
    for mid in (2, 3):
        r = rows[mid]
        assert r.n_bytes is None and r.sample_rate is None and r.duration_ms is None

    # m5: FLAC metadata — same degrade contract on the FLAC walk
    from ploverdb_spark.operators.audio import flac_metadata

    rows = {r.media_id: r for r in flac_metadata(audio, synthesize=True).collect()}
    assert rows[1].sample_rate is not None and rows[1].md5_prefix is not None
    for mid in (2, 3):
        r = rows[mid]
        assert r.n_bytes is None and r.sample_rate is None and r.md5_prefix is None


def test_flac_container_roundtrip():
    """build_flac emits a spec-correct container that parse_flac walks
    back exactly; the synthesis path's parameters match the m5 oracle's
    md5-derived math (queries/media.py)."""
    import hashlib

    from ploverdb_spark.operators.audio import (
        build_flac,
        parse_flac,
        text_as_flac,
    )

    payload = b"the quick brown fox jumps over the lazy dog" * 7
    d = hashlib.md5(payload).digest()
    flac = text_as_flac(payload)
    meta = parse_flac(flac)
    assert meta is not None
    assert meta["sample_rate"] == 8000 + d[0] * 100
    assert meta["n_channels"] == 1 + (d[1] % 2)
    assert meta["bits_per_sample"] == 8 + 8 * (d[2] % 2)
    block_align = meta["n_channels"] * meta["bits_per_sample"] // 8
    assert meta["total_samples"] == len(payload) // block_align
    assert meta["duration_ms"] == meta["total_samples"] * 1000 // meta["sample_rate"]
    assert meta["n_meta_blocks"] == (2 if d[3] % 2 == 0 else 1)
    assert meta["n_frame_bytes"] == len(payload)
    assert meta["md5_prefix"] == d.hex()[:12]
    # oracle n_bytes math: magic + STREAMINFO block + optional PADDING + frames
    pad = 20 if d[3] % 2 == 0 else 0
    assert len(flac) == 4 + 4 + 34 + pad + len(payload)

    # explicit both-variants coverage (padding block present and absent)
    for extra in (False, True):
        f = build_flac(b"xy" * 10, 44100, 2, 16, 5, d, extra_padding=extra)
        m = parse_flac(f)
        assert m and m["sample_rate"] == 44100 and m["n_channels"] == 2
        assert m["n_meta_blocks"] == (2 if extra else 1)
        assert m["n_frame_bytes"] == 20


def test_flac_corrupt_payloads_degrade():
    """Every malformed-container class returns None (per-record degrade),
    never raises: bad magic, truncated STREAMINFO, a non-STREAMINFO first
    block, a truncated later block, and a missing last-block flag."""
    import hashlib

    from ploverdb_spark.operators.audio import build_flac, parse_flac

    d = hashlib.md5(b"seed").digest()
    good = build_flac(b"frames", 16000, 1, 16, 3, d, extra_padding=True)
    assert parse_flac(good) is not None

    assert parse_flac(b"") is None
    assert parse_flac(b"flaC" + good[4:]) is None  # wrong magic case
    assert parse_flac(b"RIFF" + good[4:]) is None  # WAV magic, FLAC parser
    assert parse_flac(good[:20]) is None  # truncated STREAMINFO body
    # first block is PADDING instead of STREAMINFO -> spec violation
    bad_first = b"fLaC" + bytes([0x81]) + (4).to_bytes(3, "big") + b"\x00" * 4
    assert parse_flac(bad_first) is None
    # STREAMINFO not last, second block header truncated
    not_last = bytearray(good)
    not_last[4] = 0x00  # clear last-flag on STREAMINFO
    assert parse_flac(bytes(not_last[: 4 + 4 + 34 + 2])) is None
    # zero sample rate inside an otherwise-valid STREAMINFO: build_flac
    # refuses out-of-spec params now, so zero the 20 rate bits by hand
    # (packed field = si[10:18], abs offset 18; rate = top 20 bits)
    zero_rate = bytearray(build_flac(b"", 16000, 1, 16, 0, d))
    zero_rate[18] = zero_rate[19] = 0
    zero_rate[20] &= 0x0F
    assert parse_flac(bytes(zero_rate)) is None


def test_build_flac_rejects_out_of_spec_params():
    """Out-of-range params fail loudly instead of OR-bleeding into
    adjacent STREAMINFO bit fields (channels > 8, bits > 32) or
    overflowing the 8-byte pack (rate >= 2^20)."""
    import hashlib

    import pytest

    from ploverdb_spark.operators.audio import build_flac

    d = hashlib.md5(b"seed").digest()
    for kwargs in (
        {"sample_rate": 0},
        {"sample_rate": 1 << 20},
        {"n_channels": 0},
        {"n_channels": 9},
        {"bits_per_sample": 3},
        {"bits_per_sample": 33},
    ):
        params = {
            "sample_rate": 16000,
            "n_channels": 1,
            "bits_per_sample": 16,
            **kwargs,
        }
        with pytest.raises(ValueError):
            build_flac(b"frames", total_samples=3, audio_md5=d, **params)


def test_mp3_container_roundtrip():
    """build_mp3 emits spec-correct MPEG-1 Layer III frames that
    parse_mp3 walks back exactly; the synthesis path's parameters match
    the m6 oracle's md5-derived math (queries/media.py)."""
    import hashlib

    from ploverdb_spark.operators.audio import (
        MP3_BITRATES,
        MP3_SAMPLE_RATES,
        build_mp3,
        parse_mp3,
        text_as_mp3,
    )

    payload = b"the quick brown fox jumps over the lazy dog" * 31
    d = hashlib.md5(payload).digest()
    mp3 = text_as_mp3(payload)
    meta = parse_mp3(mp3)
    assert meta is not None
    bitrate = MP3_BITRATES[1 + d[0] % 14]
    rate = MP3_SAMPLE_RATES[d[1] % 3]
    frame_len = 144_000 * bitrate // rate
    n_frames = max(1, -(-len(payload) // (frame_len - 4)))
    assert meta["bitrate_kbps"] == bitrate
    assert meta["sample_rate"] == rate
    assert meta["n_channels"] == (1 if d[2] % 2 else 2)
    assert meta["n_frames"] == n_frames
    assert meta["duration_ms"] == n_frames * 1152 * 1000 // rate
    assert meta["has_id3"] == (d[3] % 2 == 0)
    assert meta["is_vbr"] is False
    assert meta["n_audio_bytes"] == n_frames * frame_len
    id3_total = 42 if d[3] % 2 == 0 else 0
    assert len(mp3) == id3_total + n_frames * frame_len

    # ID3 both present and absent; mono and stereo
    with_id3 = build_mp3(b"x" * 500, 9, 1, 3, id3_body=b"\x00" * 100)
    m = parse_mp3(with_id3)
    assert m and m["has_id3"] and m["n_channels"] == 1
    assert m["n_audio_bytes"] == len(with_id3) - 110
    no_id3 = build_mp3(b"x" * 500, 9, 1, 0)
    m = parse_mp3(no_id3)
    assert m and not m["has_id3"] and m["n_channels"] == 2

    # VBR detection: two CBR streams at different bitrates concatenated
    vbr = build_mp3(b"a" * 300, 5, 0, 0) + build_mp3(b"b" * 300, 11, 0, 0)
    m = parse_mp3(vbr)
    assert m and m["is_vbr"] and m["bitrate_kbps"] == MP3_BITRATES[5]

    # truncated final frame still counts (crawl payloads cut mid-frame)
    whole = build_mp3(b"z" * 2000, 9, 1, 0)
    m_whole = parse_mp3(whole)
    m_cut = parse_mp3(whole[:-50])
    assert m_cut and m_cut["n_frames"] == m_whole["n_frames"]


def test_mp3_corrupt_payloads_degrade():
    """Every malformed-stream class returns None (per-record degrade),
    never raises: no sync, free/bad bitrate index, reserved sample-rate
    index, non-MPEG1-LayerIII version bits, bad ID3 syncsafe size."""
    from ploverdb_spark.operators.audio import build_mp3, parse_mp3

    good = build_mp3(b"payload" * 40, 9, 1, 0)
    assert parse_mp3(good) is not None

    assert parse_mp3(b"") is None
    assert parse_mp3(b"not an mp3 stream at all") is None
    bad = bytearray(good)
    bad[2] = 0x00 | (bad[2] & 0x0F)  # bitrate index 0 = free -> reject
    assert parse_mp3(bytes(bad)) is None
    bad = bytearray(good)
    bad[2] = 0xF0 | (bad[2] & 0x0F)  # bitrate index 15 = bad
    assert parse_mp3(bytes(bad)) is None
    bad = bytearray(good)
    bad[2] = (bad[2] & 0xF0) | 0x0C  # sample-rate index 3 = reserved
    assert parse_mp3(bytes(bad)) is None
    bad = bytearray(good)
    bad[1] = 0xF3  # MPEG-2 version bits, not MPEG-1
    assert parse_mp3(bytes(bad)) is None
    # ID3 tag with a non-syncsafe size byte (bit 7 set)
    assert parse_mp3(b"ID3\x04\x00\x00\x80\x00\x00\x00" + good) is None
    # ID3 header truncated before its 10 bytes end
    assert parse_mp3(b"ID3\x04\x00") is None


def test_mp3_metadata_degrade_through_spark(spark):
    """m6's Spark seam: NULL payloads and (synthesize=False) garbage both
    degrade to null metadata rows, real payloads parse."""
    from ploverdb_spark.operators.audio import mp3_metadata, text_as_mp3

    rows_in = [
        (1, text_as_mp3(b"real audio payload")),
        (2, b"garbage bytes, no sync"),
        (3, None),
    ]
    media = spark.createDataFrame(rows_in, "media_id long, payload binary")
    out = {r.media_id: r for r in mp3_metadata(media).collect()}
    assert out[1].sample_rate is not None and out[1].n_frames >= 1
    for mid in (2, 3):
        assert out[mid].sample_rate is None and out[mid].duration_ms is None
    assert out[3].n_bytes is None and out[2].n_bytes == len(rows_in[1][1])


def test_mp3_midstream_degrades_to_partial():
    """Mid-stream degradation is uniform (crawl payloads splice junk
    between valid frames): ANY invalid header at a frame boundary after
    >=1 valid frame — lost sync, wrong version/layer bits, free/bad
    bitrate, reserved sample rate — returns the frames parsed so far,
    and n_audio_bytes counts only through the last valid frame."""
    from ploverdb_spark.operators.audio import build_mp3, parse_mp3

    good = build_mp3(b"q" * 2000, 9, 1, 0)
    n_good = parse_mp3(good)["n_frames"]
    assert n_good >= 2

    for junk in (
        b"\x00garbage after the last valid frame",  # lost sync
        b"\xff\xf3\x90\x00",  # sync but MPEG-2 version bits
        b"\xff\xfb\x00\x00",  # sync but free bitrate (index 0)
        b"\xff\xfb\xf0\x00",  # sync but bad bitrate (index 15)
        b"\xff\xfb\x9c\x00",  # sync but reserved sample-rate index
    ):
        m = parse_mp3(good + junk)
        assert m is not None, junk
        assert m["n_frames"] == n_good
        assert m["n_audio_bytes"] == len(good)  # junk excluded

    # same defects at the FIRST header still return None (pinned by
    # test_mp3_corrupt_payloads_degrade); partial only after >=1 frame
    assert parse_mp3(b"\xff\xfb\x00\x00" + good) is None

    # ID3 + mid-stream junk: n_audio_bytes still excludes both the tag
    # and the junk
    with_id3 = build_mp3(b"q" * 2000, 9, 1, 0, id3_body=b"\x00" * 64)
    m = parse_mp3(with_id3 + b"\x00junk")
    assert m["n_frames"] == n_good and m["has_id3"]
    assert m["n_audio_bytes"] == len(with_id3) - 74


def test_jpeg_container_roundtrip():
    """build_jpeg emits a spec-correct segment stream that parse_jpeg
    walks back exactly; the synthesis path's md5-derived parameters match
    the m7 oracle's formulas (queries/media.py)."""
    import hashlib

    from ploverdb_spark.operators.multimodal import (
        build_jpeg,
        parse_jpeg,
        text_as_jpeg,
    )

    payload = b"the quick brown fox jumps over the lazy dog" * 9
    d = hashlib.md5(payload).digest()
    jpg = text_as_jpeg(payload)
    meta = parse_jpeg(jpg)
    assert meta is not None
    assert meta["width"] == 16 + d[0] * 4
    assert meta["height"] == 16 + d[1] * 4
    ncomp = 3 if d[2] % 2 == 0 else 1
    progressive = d[3] % 2 == 0
    jfif = d[4] % 2 == 0
    assert meta["n_components"] == ncomp
    assert meta["precision"] == 8
    assert meta["progressive"] is progressive
    assert meta["has_jfif"] is jfif
    n_scans = 2 if progressive else 1
    assert meta["n_scans"] == n_scans
    assert meta["n_entropy_bytes"] == len(payload)
    # the oracle's n_bytes formula, byte-for-byte
    assert len(jpg) == (
        2 + (18 if jfif else 0) + 69 + (10 + 3 * ncomp)
        + n_scans * (8 + 2 * ncomp) + len(payload) + 2
    )

    # all four flag combinations parse back to what was built
    for prog in (False, True):
        for jf in (False, True):
            for nc in (1, 3, 4):
                j = build_jpeg(
                    b"x" * 301, 640, 480, nc, progressive=prog, jfif=jf
                )
                m = parse_jpeg(j)
                assert (m["width"], m["height"]) == (640, 480)
                assert m["n_components"] == nc
                assert m["progressive"] is prog
                assert m["has_jfif"] is jf
                assert m["n_scans"] == (2 if prog else 1)
                assert m["n_entropy_bytes"] == 301

    # 0xFF bytes in the entropy data are byte-stuffed per spec: the walk
    # must treat FF00 as data, count the stuffed length, and still find
    # the real EOI
    binary = bytes(range(256)) * 3  # contains 0xFF
    j = build_jpeg(binary, 10, 10, 1, progressive=False, jfif=False)
    m = parse_jpeg(j)
    assert m is not None and m["width"] == 10
    assert m["n_entropy_bytes"] == len(binary) + binary.count(0xFF)


def test_jpeg_corrupt_payloads_degrade():
    """parse_jpeg returns None (never raises) for anything that is not a
    walkable JPEG — the Spark caller degrades per-record."""
    from ploverdb_spark.operators.multimodal import build_jpeg, parse_jpeg

    good = build_jpeg(b"entropy" * 50, 320, 240, 3)
    assert parse_jpeg(good) is not None

    assert parse_jpeg(b"") is None
    assert parse_jpeg(b"\xff\xd8") is None  # SOI alone, no frame header
    assert parse_jpeg(b"not a jpeg at all") is None
    assert parse_jpeg(b"\x89PNG\r\n\x1a\n rest") is None
    # truncated inside the SOF segment (before any scan): whole record
    assert parse_jpeg(good[:12]) is None
    # zero dims / bad component count in the frame header
    bad_dims = build_jpeg(b"e" * 10, 1, 1, 1)
    b = bytearray(bad_dims)
    sof = bad_dims.find(b"\xff\xc0")
    b[sof + 5 : sof + 7] = b"\x00\x00"  # height := 0
    assert parse_jpeg(bytes(b)) is None
    b = bytearray(bad_dims)
    b[sof + 9] = 5  # n_components := 5 (outside 1-4)
    assert parse_jpeg(bytes(b)) is None
    # a scan (SOS) appearing before any SOF frame header
    no_sof = (
        b"\xff\xd8" + b"\xff\xda\x00\x06\x01\x01\x00\x00" + b"data\xff\xd9"
    )
    assert parse_jpeg(no_sof) is None


def test_jpeg_midstream_degrades_to_partial():
    """Truncation tolerance mirrors parse_mp3: a payload cut mid-scan
    (after the frame header and >=1 SOS) returns the metadata parsed so
    far with n_entropy_bytes counting only what was seen."""
    from ploverdb_spark.operators.multimodal import build_jpeg, parse_jpeg

    good = build_jpeg(b"entropy-data" * 40, 800, 600, 3, jfif=True)
    whole = parse_jpeg(good)
    # cut mid-entropy: dims survive, entropy bytes shrink, EOI missing
    cut = parse_jpeg(good[:-100])
    assert cut is not None
    assert (cut["width"], cut["height"]) == (800, 600)
    assert cut["n_scans"] == 1
    assert cut["n_entropy_bytes"] == whole["n_entropy_bytes"] - 98
    # progressive cut after the first scan's data keeps scan 1 only
    prog = build_jpeg(b"entropy-data" * 40, 800, 600, 3, progressive=True)
    first_scan_end = prog.find(b"\xff\xda", prog.find(b"\xff\xda") + 2)
    p = parse_jpeg(prog[:first_scan_end])
    assert p is not None and p["n_scans"] == 1 and p["progressive"] is True


def test_jpeg_metadata_degrade_through_spark(spark):
    """m7's Spark seam: NULL payloads and (synthesize=False) garbage both
    degrade to null metadata rows, real payloads parse."""
    from ploverdb_spark.operators.multimodal import jpeg_metadata, text_as_jpeg

    rows_in = [
        (1, text_as_jpeg(b"real image payload")),
        (2, b"garbage bytes, no SOI"),
        (3, None),
    ]
    media = spark.createDataFrame(rows_in, "media_id long, payload binary")
    out = {r.media_id: r for r in jpeg_metadata(media).collect()}
    assert out[1].width is not None and out[1].n_scans >= 1
    for mid in (2, 3):
        assert out[mid].width is None and out[mid].n_entropy_bytes is None
    assert out[3].n_bytes is None and out[2].n_bytes == len(rows_in[1][1])


def test_jpeg_header_dims_route_into_image_family():
    """image_header_dims / decode_media / resize_media treat a genuine
    JPEG like PNG/BMP: real header dims (no PIL), geometry-only resize
    with a null thumb digest for non-baseline-decodable streams (the
    synthesis containers carry arbitrary entropy bytes and no DHT on
    purpose), stub only for corrupt bytes."""
    from ploverdb_spark.operators.multimodal import (
        _fake_decode,
        build_jpeg,
        decode_media,
        fit_within,
        image_header_dims,
    )

    jpg = build_jpeg(b"scan" * 100, 1920, 1080, 3)
    assert image_header_dims(jpg) == (1920, 1080)
    feats = decode_media(jpg, "image")
    assert (feats["width"], feats["height"]) == (1920, 1080)
    assert feats["n_frames"] == 1 and feats["duration_ms"] == 0
    assert fit_within(1920, 1080, 64) == (64, 36)
    # corrupt JPEG (SOI intact, truncated before the frame header)
    corrupt = jpg[:8]
    assert image_header_dims(corrupt) is None
    assert decode_media(corrupt, "image") == _fake_decode(corrupt, "image")


def _grad_pixels(w, h, ch):
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    return np.stack(
        [(base + 40 * c) % 256 for c in range(ch)], axis=-1
    ).astype(np.uint8)


def test_jpeg_pixel_roundtrip():
    """decode_jpeg recovers encode_jpeg_baseline's pixels within
    quantization error: flat blocks are DC-only so they round-trip
    EXACTLY; gradients stay within a couple of levels.  Covers
    grayscale, 4:4:4 and 4:2:0 color, non-multiple-of-8 dims, and DRI
    restart markers (byte realignment + DC predictor reset)."""
    import numpy as np

    from ploverdb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_baseline,
        parse_jpeg,
    )

    for w, h, ch, sub, ri, flat, tol in [
        (16, 16, 1, False, 0, True, 0),
        (16, 16, 3, False, 0, True, 0),
        (16, 16, 3, True, 0, True, 0),
        (24, 17, 3, False, 0, False, 2),
        (24, 17, 3, True, 0, False, 2),
        (33, 9, 1, False, 2, False, 2),
    ]:
        px = (
            np.full((h, w, ch), 130, dtype=np.uint8)
            if flat
            else _grad_pixels(w, h, ch)
        )
        data = encode_jpeg_baseline(
            px.tobytes(), w, h, ch, subsample=sub, restart_interval=ri
        )
        # the stream's own metadata walk agrees with the encoder
        meta = parse_jpeg(data)
        assert (meta["width"], meta["height"]) == (w, h)
        assert meta["progressive"] is False
        ow, oh, samples, oc = decode_jpeg(data)
        assert (ow, oh, oc) == (w, h, ch)
        out = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(h, w, ch)
        err = np.abs(out.astype(int) - px.astype(int)).max()
        assert err <= tol, f"{w}x{h} ch={ch} sub={sub} ri={ri}: err {err}"


def test_jpeg_pixel_decode_degrades_not_oom():
    """Non-baseline-decodable JPEG streams degrade per record through
    try_decode_image, never raise out of it: progressive containers,
    synthesis containers (no DHT, arbitrary entropy bytes), truncated
    entropy data, and hostile headers claiming cap-busting dims (the
    allocation bound fires BEFORE any plane is built)."""
    import numpy as np

    from ploverdb_spark.operators.multimodal import (
        MAX_DECODED_BYTES,
        build_jpeg,
        decode_jpeg,
        encode_jpeg_baseline,
        text_as_jpeg,
        try_decode_image,
    )

    assert try_decode_image(build_jpeg(b"x" * 64, 32, 32, progressive=True)) is None
    assert try_decode_image(text_as_jpeg(b"some document text")) is None

    good = encode_jpeg_baseline(
        _grad_pixels(16, 16, 3).tobytes(), 16, 16, 3
    )
    assert try_decode_image(good) is not None
    # truncate mid-entropy: the scan runs out of bits
    assert try_decode_image(good[: len(good) - 40]) is None
    # hostile dims: patch the SOF0 height/width fields to 65535x65535
    # (12.9 GB decoded) — must refuse via the allocation cap, fast
    sof_at = good.find(b"\xff\xc0")
    assert sof_at > 0
    hostile = bytearray(good)
    hostile[sof_at + 5 : sof_at + 9] = b"\xff\xff\xff\xff"
    assert 65535 * 65535 * 3 > MAX_DECODED_BYTES
    with pytest.raises(ValueError, match="allocation cap"):
        decode_jpeg(bytes(hostile))
    assert try_decode_image(bytes(hostile)) is None


def test_jpeg_resize_media_real_pixels_through_spark(spark):
    """m3 on real JPEG pixels: a genuine baseline JPEG payload gets a
    thumb_sha computed from ACTUAL decoded+resized pixels (same contract
    as PNG/BMP); a progressive JPEG keeps its real header geometry with
    a null digest."""
    import hashlib

    from ploverdb_spark.operators.multimodal import (
        build_jpeg,
        decode_jpeg,
        encode_jpeg_baseline,
        fit_within,
        resize_media,
        resize_nearest,
    )

    px = _grad_pixels(24, 16, 3)
    jpg = encode_jpeg_baseline(px.tobytes(), 24, 16, 3)
    prog = build_jpeg(b"scan" * 50, 640, 480, 3, progressive=True)
    media = spark.createDataFrame(
        [
            (1, bytearray(jpg), "image", ("t", "jpg")),
            (2, bytearray(prog), "image", ("t", "jpg")),
        ],
        "media_id long, payload binary, media_type string, "
        "meta struct<source:string, declared_format:string>",
    )
    rows = {r.media_id: r for r in resize_media(media, max_dim=8).collect()}
    w, h, samples, ch = decode_jpeg(jpg)
    ow, oh = fit_within(w, h, 8)
    expect = hashlib.sha256(
        bytes(resize_nearest(samples, w, h, ch, ow, oh))
    ).hexdigest()[:12]
    assert (rows[1].width, rows[1].height) == (24, 16)
    assert rows[1].thumb_sha == expect
    assert (rows[1].out_width, rows[1].out_height) == (ow, oh)
    # progressive: real header geometry, null digest
    assert (rows[2].width, rows[2].height) == (640, 480)
    assert rows[2].thumb_sha is None
    assert (rows[2].out_width, rows[2].out_height) == fit_within(640, 480, 8)


def test_gif_container_roundtrip():
    """m8: deterministic GIF synthesis round-trips through the real block
    walk across every branch (frame count, color table presence/size,
    loop extension, multi-block frames)."""
    import hashlib

    from ploverdb_spark.operators.multimodal import parse_gif, text_as_gif

    for payload in (
        b"short",
        b"",
        b"x" * 700,  # forces multiple 255-byte sub-blocks
        b"vary the digest to hit other frame-count/color-table branches",
        bytes(range(256)) * 2,  # every byte value incl. 0xFF and 0x00
    ):
        gif = text_as_gif(payload)
        d = hashlib.md5(payload).digest()
        m = parse_gif(gif)
        nf = 1 + d[2] % 4
        assert (m["width"], m["height"]) == (16 + d[0] * 4, 16 + d[1] * 4)
        assert m["n_frames"] == nf
        assert m["n_data_bytes"] == len(payload)
        assert m["has_gct"] == (d[3] % 2 == 0)
        assert m["gct_colors"] == (
            2 ** ((d[4] % 3) + 1) if d[3] % 2 == 0 else 0
        )
        # comment + one GCE per frame + loop ext iff animated
        assert m["n_extensions"] == 1 + nf + (1 if nf > 1 else 0)
        assert m["duration_ms"] == nf * d[5] * 10
        assert m["n_bytes"] == len(gif)
        assert m["version"] == "89a"


def test_gif_corrupt_and_truncated_degrade():
    """Non-GIF and short payloads return None; mid-stream truncation
    keeps what was parsed (per-record degrade, like JPEG/MP3)."""
    from ploverdb_spark.operators.multimodal import parse_gif, text_as_gif

    assert parse_gif(b"") is None
    assert parse_gif(b"NOTAGIF........") is None
    assert parse_gif(b"GIF89a") is None  # header only, no screen desc
    gif = text_as_gif(b"a payload long enough to truncate mid-blocks" * 4)
    full = parse_gif(gif)
    part = parse_gif(gif[: len(gif) // 2])
    assert part is not None
    assert part["n_frames"] <= full["n_frames"]
    assert part["n_data_bytes"] <= full["n_data_bytes"]
    assert (part["width"], part["height"]) == (full["width"], full["height"])


def test_gif_local_color_table_skipped():
    """A frame carrying a local color table (the builder never emits one)
    is walked correctly: the LCT's 3*2^(n+1) bytes are skipped by the
    descriptor's packed field, not misread as sub-blocks."""
    import struct

    from ploverdb_spark.operators.multimodal import parse_gif

    gif = (
        b"GIF89a"
        + struct.pack("<HH", 4, 4)
        + bytes([0, 0, 0])  # no GCT
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, 4, 4)
        + bytes([0x80 | 1])  # LCT flag, 4 entries -> 12 bytes
        + bytes(12)
        + bytes([8])  # LZW code size
        + bytes([3])
        + b"abc"
        + b"\x00"
        + b"\x3b"
    )
    m = parse_gif(gif)
    assert m["n_frames"] == 1
    assert m["n_data_bytes"] == 3
    assert m["has_gct"] is False and m["gct_colors"] == 0


def test_gif_metadata_degrade_through_spark(spark):
    """m8's Spark seam: NULL payloads and (synthesize=False) garbage both
    degrade to null metadata rows, real payloads parse."""
    from ploverdb_spark.operators.multimodal import gif_metadata, text_as_gif

    rows_in = [
        (1, text_as_gif(b"real animation payload")),
        (2, b"garbage bytes, wrong magic"),
        (3, None),
    ]
    media = spark.createDataFrame(rows_in, "media_id long, payload binary")
    out = {r.media_id: r for r in gif_metadata(media).collect()}
    assert out[1].width is not None and out[1].n_frames >= 1
    for mid in (2, 3):
        assert out[mid].width is None and out[mid].n_data_bytes is None
    assert out[3].n_bytes is None and out[2].n_bytes == len(rows_in[1][1])


def test_gif_header_dims_route_into_image_family():
    """image_header_dims recognizes both GIF87a and GIF89a screens."""
    from ploverdb_spark.operators.multimodal import (
        build_gif,
        image_header_dims,
        parse_gif,
    )

    gif = build_gif([b"frame"], 320, 240)
    assert image_header_dims(gif) == (320, 240)
    g87 = b"GIF87a" + gif[6:]
    assert image_header_dims(g87) == (320, 240)
    assert parse_gif(g87)["version"] == "87a"
