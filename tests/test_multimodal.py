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
