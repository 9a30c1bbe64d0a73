"""The multimodal decode stage is a genuine header parser (r4/r5 advice:
no NotImplementedError on any reachable path). These tests pin it against
real-world header bytes — not just our own synthesizer — plus the
synthesizer round-trip and the loud-failure contract."""

from __future__ import annotations

import zlib

import pytest

from toymapreduce_go_spark.multimodal.binary import (
    JPEG_OVERHEAD, PNG_OVERHEAD, parse_image_header, synthesize_jpeg,
    synthesize_png)

# A complete, genuinely valid 1x1 gray PNG (color type 0, bit depth 8),
# IDAT is a real zlib stream — viewers open this file.
REAL_PNG_1x1 = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108000000003a7e9b55"
) + (lambda d: (len(d)).to_bytes(4, "big") + b"IDAT" + d
     + (zlib.crc32(b"IDAT" + d)).to_bytes(4, "big"))(
         zlib.compress(b"\x00\x80")) + bytes.fromhex(
    "0000000049454e44ae426082")


def test_parses_genuinely_valid_png():
    fmt, w, h, ch = parse_image_header(REAL_PNG_1x1)
    assert (fmt, w, h, ch) == ("png", 1, 1, 1)  # grayscale -> 1 channel


def test_parses_rgba_png_channels():
    # color type 6 (truecolor+alpha) -> 4 channels
    import struct
    ihdr = struct.pack(">IIBBBBB", 320, 200, 8, 6, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n"
           + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr
           + zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big"))
    assert parse_image_header(png) == ("png", 320, 200, 4)


def test_parses_jpeg_with_extra_segments_before_sof():
    # real cameras put APP1/EXIF, comments, quant tables before SOF0 —
    # the marker scan must skip them by their length fields
    import struct
    app1 = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00\x01\x02"
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes(65)
    sof2 = (b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x01" + b"\x01\x11\x00")
    jpeg = b"\xff\xd8" + app1 + com + dqt + sof2 + b"\xff\xd9"
    assert parse_image_header(jpeg) == ("jpeg", 640, 480, 1)


def test_synthesized_containers_round_trip():
    body = "some document text".encode()
    png = synthesize_png(body, 123, 456)
    jpg = synthesize_jpeg(body, 123, 456)
    assert parse_image_header(png) == ("png", 123, 456, 3)
    assert parse_image_header(jpg) == ("jpeg", 123, 456, 3)
    assert len(png) == len(body) + PNG_OVERHEAD
    assert len(jpg) == len(body) + JPEG_OVERHEAD


def test_garbage_fails_loudly():
    for bad in (b"", b"GIF89a\x01\x00", b"\x89PNG\r\n\x1a\x00rest",
                b"\xff\xd8\xff\xd9"):  # JPEG with no SOF
        with pytest.raises(ValueError):
            parse_image_header(bad)


def test_truncated_jpeg_fails_loudly():
    """Real-world truncated JPEGs must raise ValueError, never IndexError
    (r6 advice): SOF cut mid-dimensions, a final segment shorter than its
    declared length, and a <2-byte length slice."""
    import struct
    full_sof = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
                + struct.pack(">HH", 480, 640) + b"\x03" + bytes(3))
    jpeg = b"\xff\xd8" + full_sof
    assert parse_image_header(jpeg) == ("jpeg", 640, 480, 3)
    # every truncation point before the 10 SOF bytes the parser needs
    # (marker+len+precision+dims+ncomp ends at offset 12)
    for cut in range(4, 12):
        with pytest.raises(ValueError):
            parse_image_header(jpeg[:cut])
    # declared segment length runs past the payload end
    overlong = b"\xff\xd8" + b"\xff\xfe" + struct.pack(">H", 500) + b"x"
    with pytest.raises(ValueError):
        parse_image_header(overlong)
    # bogus <2 length field
    with pytest.raises(ValueError):
        parse_image_header(b"\xff\xd8" + b"\xff\xfe\x00\x01")


def test_png_pixel_decode_roundtrip_all_filters():
    """real_decode_pixels (round 7): forward-filter rows with every PNG
    filter type (None/Sub/Up/Average/Paeth), zlib-compress, decode, and
    require the exact original samples back — pure stdlib, no PIL."""
    import random

    from toymapreduce_go_spark.multimodal.binary import (
        real_decode_pixels, synthesize_png_pixels)

    rng = random.Random(42)
    w, h = 7, 10  # 10 rows cycle through filters 0..4 twice
    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
        png = synthesize_png_pixels(pixels, w, h, color_type,
                                    filters=[y % 5 for y in range(h)])
        got = real_decode_pixels(png)
        assert got == (w, h, ch, pixels), (color_type, got[:3])


def test_png_pixel_decode_real_world_file():
    """The genuinely-valid 1x1 gray PNG above (real zlib IDAT, filter 0,
    sample 0x80) must decode to its one pixel — checksum-pinned."""
    import hashlib

    from toymapreduce_go_spark.multimodal.binary import real_decode_pixels

    w, h, ch, pixels = real_decode_pixels(REAL_PNG_1x1)
    assert (w, h, ch) == (1, 1, 1)
    assert pixels == b"\x80"
    assert hashlib.sha256(pixels).hexdigest().startswith("76be8b528d")


def test_png_pixel_decode_fails_loudly():
    """Corrupt CRC, truncated chunks, the synthesizer's raw-text IDAT
    (not a zlib stream), and JPEG must all raise — never return garbage
    pixels."""
    import pytest

    from toymapreduce_go_spark.multimodal.binary import (
        real_decode_pixels, synthesize_jpeg, synthesize_png,
        synthesize_png_pixels)

    good = synthesize_png_pixels(bytes(4), 2, 2, 0)
    corrupt = good[:20] + bytes([good[20] ^ 0xFF]) + good[21:]
    with pytest.raises(ValueError, match="CRC"):
        real_decode_pixels(corrupt)
    with pytest.raises(Exception):  # zlib error or ValueError
        real_decode_pixels(synthesize_png(b"plain text", 3, 3))
    with pytest.raises(NotImplementedError, match="JPEG"):
        real_decode_pixels(synthesize_jpeg(b"x", 3, 3))
    with pytest.raises(ValueError):
        real_decode_pixels(b"GIF89a")


def test_decode_query_counts_both_formats(spark):
    from conftest import SF_DIR

    from toymapreduce_go_spark.multimodal.binary import decode_meta_query
    from toymapreduce_go_spark.sources.registry import load_table

    out = decode_meta_query(load_table(spark, SF_DIR, "documents")).collect()
    assert sum(r.n_png for r in out) > 0
    assert sum(r.n_jpeg for r in out) > 0
    assert all(r.n_png + r.n_jpeg == r.n_items for r in out)


def test_staged_pipeline_equals_fused(spark):
    """The declared query runs the fused single-stage plan; the staged
    4-stage form is built from the same functions and must agree row for
    row."""
    from conftest import SF_DIR

    from toymapreduce_go_spark.multimodal.binary import (
        multimodal_pipeline_query)
    from toymapreduce_go_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    fused = [tuple(r) for r in multimodal_pipeline_query(docs).collect()]
    staged = [tuple(r) for r in
              multimodal_pipeline_query(docs, staged=True).collect()]
    assert fused == staged
