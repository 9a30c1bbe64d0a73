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
    """Corrupt CRC, truncated chunks, and the synthesizers' raw-text
    bodies (not zlib/Huffman streams) must all raise — never return
    garbage pixels."""
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
    with pytest.raises(ValueError):  # raw payload is not a scan
        real_decode_pixels(synthesize_jpeg(b"some document text", 3, 3))
    with pytest.raises(ValueError):
        real_decode_pixels(b"GIF89a")


def test_jpeg_baseline_codec_round_trip():
    """The pure-stdlib baseline JPEG codec (round 7): encode gradients
    and worst-case noise in grayscale and RGB 4:4:4, decode through
    real_decode_pixels, and require near-lossless recovery (bounded by
    quantization error) with exact dimensions. Deterministic output is
    checksum-pinned."""
    import hashlib
    import random

    from toymapreduce_go_spark.multimodal.binary import (
        parse_image_header, real_decode_pixels)
    from toymapreduce_go_spark.multimodal.jpeg import encode_baseline

    w, h = 24, 17  # exercises edge-block padding (not multiples of 8)
    gray = bytes(min(255, (x * 3 + y * 5) % 256)
                 for y in range(h) for x in range(w))
    jpg = encode_baseline(gray, w, h, 1, quality=90)
    # the header parser agrees with the full decoder
    assert parse_image_header(jpg) == ("jpeg", w, h, 1)
    W, H, C, pix = real_decode_pixels(jpg)
    assert (W, H, C) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(gray, pix)) <= 4
    assert encode_baseline(gray, w, h, 1, quality=90) == jpg  # determinism
    assert hashlib.sha256(jpg).hexdigest().startswith("a4b9ca001ad1")

    rgb = bytes(((x * 7) % 256 if c == 0 else (y * 11) % 256 if c == 1
                 else ((x + y) * 5) % 256)
                for y in range(h) for x in range(w) for c in range(3))
    jpg3 = encode_baseline(rgb, w, h, 3, quality=90)
    assert parse_image_header(jpg3) == ("jpeg", w, h, 3)
    W, H, C, pix3 = real_decode_pixels(jpg3)
    assert (W, H, C) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(rgb, pix3)) <= 6

    rng = random.Random(1)
    noise = bytes(rng.randrange(256) for _ in range(w * h))
    _, _, _, pn = real_decode_pixels(
        encode_baseline(noise, w, h, 1, quality=95))
    assert max(abs(a - b) for a, b in zip(noise, pn)) <= 8


def test_pixel_stats_pipeline_distributed_equals_local(spark):
    """The real-pixel tier runs the FULL decoders (PNG inflate+unfilter,
    JPEG Huffman+DCT) inside a fused mapInPandas stage on executors; the
    per-(source, format) rollup must equal a driver-side recomputation
    with the same codecs over the same rows — proving the distributed
    plumbing (schema, Arrow batches, partitioning) around genuine pixel
    work."""
    from collections import defaultdict

    import pandas as pd

    from conftest import SF_DIR

    from toymapreduce_go_spark.multimodal.binary import (
        decode_pixel_stats, pixel_stats_query, synthesize_real_image)
    from toymapreduce_go_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 40")
    got = [(r.source, r.format, r.n_images, r.sum_width, r.sum_height,
            r.avg_mean_pixel)
           for r in pixel_stats_query(docs).collect()]

    local = docs.select("doc_id", "source", "text").toPandas()
    decoded = pd.concat(decode_pixel_stats(
        synthesize_real_image(iter([local]))))
    agg = defaultdict(lambda: [0, 0, 0, 0.0])
    for r in decoded.itertuples(index=False):
        a = agg[(r.source, r.format)]
        a[0] += 1
        a[1] += r.width
        a[2] += r.height
        a[3] += r.mean_pixel
    want = sorted((s, f, n, sw, sh, round(mp / n, 4))
                  for (s, f), (n, sw, sh, mp) in agg.items())
    assert sorted(got) == want and len(want) > 2


def test_jpeg_decodes_real_camera_file_matches_jvm_decoder(spark):
    """Interop proof: decode a real 4:2:0 baseline camera JPEG (shipped
    in Spark's own mllib data directory) and compare pixel-for-pixel
    against the JVM's independent decoder (the `image` datasource /
    ImageIO). Agreement must be within ±1 per sample — IDCT rounding,
    nothing more."""
    import os

    import pytest

    from toymapreduce_go_spark.multimodal.jpeg import decode_baseline

    p = ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
         "kittens/54893.jpg")
    if not os.path.exists(p):
        pytest.skip("mllib sample images not present")
    row = spark.read.format("image").load(p).select("image.*").collect()[0]
    w, h, c, mine = decode_baseline(open(p, "rb").read())
    assert (w, h, c) == (row.width, row.height, 3)
    theirs = bytes(row.data)  # BGR byte order
    n = w * h
    total = 0
    worst = 0
    for i in range(n):
        for ch in range(3):
            d = abs(mine[3 * i + ch] - theirs[3 * i + (2 - ch)])
            total += d
            worst = max(worst, d)
    assert worst <= 2 and total / (3 * n) < 0.5, (worst, total / (3 * n))


def test_jpeg_decoder_rejects_out_of_envelope():
    """Truncated entropy data, progressive SOF markers, and a frame
    header whose sampling factors promise more blocks than the stream
    carries all raise ValueError with a reason, never garbage."""
    import pytest

    from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                       encode_baseline)

    good = encode_baseline(bytes(range(64)), 8, 8, 1)
    with pytest.raises(ValueError):
        decode_baseline(good[:len(good) - 12])  # cut inside entropy data
    # flip SOF0 -> SOF2 (progressive)
    sof = good.index(b"\xff\xc0")
    prog = good[:sof + 1] + b"\xc2" + good[sof + 2:]
    with pytest.raises(ValueError, match="baseline"):
        decode_baseline(prog)
    # 2x2 sampling is SUPPORTED now (the real camera files use it) —
    # but claiming it here promises 4 luma blocks where the stream has
    # 1, which must fail loudly, not decode garbage
    sub = bytearray(good)
    sub[sof + 11] = 0x22  # component 1 sampling factors
    with pytest.raises(ValueError):
        decode_baseline(bytes(sub))


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


def test_progressive_jpeg_detected_and_decoded(spark):
    """r7 verdict item (routing) + r9 item 8 (decoding): progressive
    (SOF2) payloads are detected declaratively and now DECODED by the
    progressive tier — decode_pixel_stats emits real pixel statistics
    under format='jpeg_progressive'. decode_baseline keeps rejecting
    them (each decoder strict about its own envelope), and a corrupt
    'progressive' stream (baseline entropy under a flipped SOF marker)
    fails loudly instead of decoding garbage."""
    import pandas as pd

    from toymapreduce_go_spark.multimodal.binary import decode_pixel_stats
    from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                       decode_progressive,
                                                       encode_baseline,
                                                       encode_progressive,
                                                       is_progressive)

    pix = bytes(range(64))
    good = encode_baseline(pix, 8, 8, 1)
    prog = encode_progressive(pix, 8, 8, 1)
    assert not is_progressive(good)
    assert is_progressive(prog)
    with pytest.raises(ValueError, match="baseline"):
        decode_baseline(prog)
    with pytest.raises(ValueError, match="progressive"):
        decode_progressive(good)
    # a flipped SOF0->SOF2 marker over baseline entropy is CORRUPT, not
    # progressive: the 0..63 "DC" band must be rejected
    sof = good.index(b"\xff\xc0")
    corrupt = good[:sof + 1] + b"\xc2" + good[sof + 2:]
    assert is_progressive(corrupt)
    with pytest.raises(ValueError, match="spectral band"):
        decode_progressive(corrupt)
    # the routing tier: one baseline + one progressive payload in a
    # batch, both fully decoded — identical coefficients, identical stats
    pdf = pd.DataFrame({"doc_id": [1, 2], "source": ["a", "a"],
                        "payload": [good, prog]})
    out = next(decode_pixel_stats(iter([pdf])))
    by_id = {int(r.doc_id): r for r in out.itertuples()}
    assert by_id[1].format == "jpeg"
    assert by_id[2].format == "jpeg_progressive"
    assert (by_id[2].width, by_id[2].height) == (8, 8)
    assert by_id[2].mean_pixel == by_id[1].mean_pixel


def test_progressive_codec_matches_baseline_exactly():
    """The decisive contract: encode_progressive delivers the SAME
    quantized coefficients as encode_baseline over the full scan
    protocol (interleaved DC first/refine, spectral-split AC first,
    AC successive-approximation refinement, per-scan Huffman tables),
    so decoding either container yields BIT-IDENTICAL pixels."""
    import numpy as np

    from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                       decode_progressive,
                                                       encode_baseline,
                                                       encode_progressive)

    rng = np.random.default_rng(7)
    for (w, h, ch) in [(8, 8, 1), (23, 17, 1), (16, 16, 3), (21, 13, 3)]:
        pix = rng.integers(0, 256, size=w * h * ch,
                           dtype=np.uint8).tobytes()
        assert decode_progressive(encode_progressive(pix, w, h, ch)) \
            == decode_baseline(encode_baseline(pix, w, h, ch)), (w, h, ch)
    # EOB-heavy (smooth gradient), ZRL-heavy (sparse spikes), flat
    g = (np.add.outer(np.arange(32), np.arange(40)) * 3 % 256) \
        .astype(np.uint8)
    sp = np.zeros((32, 40), np.uint8)
    sp[::7, ::11] = 255
    for img in (g, sp, np.full((32, 40), 128, np.uint8)):
        pix = img.tobytes()
        assert decode_progressive(encode_progressive(pix, 40, 32, 1)) \
            == decode_baseline(encode_baseline(pix, 40, 32, 1))


def test_progressive_scan_scripts_agree():
    """Scan-script independence: spectral-selection-only, a deep Al=3
    successive-approximation ladder, and the default script must all
    reconstruct the same pixels (the coefficients are scan-order
    invariant), at coarse and fine quality."""
    import numpy as np

    from toymapreduce_go_spark.multimodal.jpeg import (decode_progressive,
                                                       encode_progressive)

    rng = np.random.default_rng(11)
    w, h = 40, 32
    noise = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
    spectral = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0),
                ([0], 6, 20, 0, 0), ([0], 21, 63, 0, 0)]
    ladder = [([0], 0, 0, 0, 3), ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1),
              ([0], 0, 0, 1, 0), ([0], 1, 2, 0, 3), ([0], 3, 63, 0, 3),
              ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)]
    for q in (30, 85):
        want = decode_progressive(encode_progressive(noise, w, h, 1,
                                                     quality=q))
        for script in (spectral, ladder):
            got = decode_progressive(encode_progressive(
                noise, w, h, 1, quality=q, script=script))
            assert got == want, (q, script[0])
    # color: interleaved DC + per-component AC ladders
    cpix = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    deep = ([([0, 1, 2], 0, 0, 0, 2)]
            + [([c], 1, 63, 0, 2) for c in range(3)]
            + [([c], 1, 63, 2, 1) for c in range(3)]
            + [([c], 1, 63, 1, 0) for c in range(3)]
            + [([0, 1, 2], 0, 0, 2, 1), ([0, 1, 2], 0, 0, 1, 0)])
    want = decode_progressive(encode_progressive(cpix, w, h, 3,
                                                 quality=30))
    got = decode_progressive(encode_progressive(cpix, w, h, 3,
                                                quality=30, script=deep))
    assert got == want


def test_is_progressive_skips_ff_fill_bytes():
    """r8 advice (low): JPEG B.1.1.2 allows any number of 0xFF fill
    bytes before a marker. A padded SOF2 must still classify as
    progressive (and a padded baseline as not), or a valid padded file
    would be routed to decode_baseline and fail loudly mid-batch."""
    from toymapreduce_go_spark.multimodal.jpeg import (encode_baseline,
                                                      is_progressive)

    good = encode_baseline(bytes(range(64)), 8, 8, 1)
    sof = good.index(b"\xff\xc0")
    prog = good[:sof + 1] + b"\xc2" + good[sof + 2:]

    def pad(payload: bytes, at: int, n: int = 3) -> bytes:
        return payload[:at] + b"\xff" * n + payload[at:]

    # fill bytes directly before the SOF marker
    assert is_progressive(pad(prog, sof))
    assert not is_progressive(pad(good, sof))
    # fill bytes before an EARLIER segment (the DQT right after SOI):
    # seg_len must be read from the true segment start or the walk
    # desyncs before it ever reaches the frame header
    assert is_progressive(pad(prog, 2))
    assert not is_progressive(pad(good, 2))


def test_decoders_skip_fill_bytes_and_fail_closed_on_trailing_fill():
    """The decoders share is_progressive's B.1.1.2 handling: a padded
    valid file round-trips bit-identically, and a payload that ENDS in
    fill bytes (no marker left to read) raises the contract ValueError,
    never IndexError."""
    import pytest

    from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                       decode_progressive,
                                                       encode_baseline,
                                                       encode_progressive)

    pix = bytes(range(64))
    base = encode_baseline(pix, 8, 8, 1)
    prog = encode_progressive(pix, 8, 8, 1)
    # fill bytes before the first segment: both decoders skip them
    assert decode_baseline(base[:2] + b"\xff" * 3 + base[2:]) \
        == decode_baseline(base)
    assert decode_progressive(prog[:2] + b"\xff" * 3 + prog[2:]) \
        == decode_progressive(prog)
    # payload ending in fill bytes: ValueError, not IndexError
    with pytest.raises(ValueError):
        decode_progressive(b"\xff\xd8\xff\xff")
    with pytest.raises(ValueError):
        decode_baseline(b"\xff\xd8\xff\xff\xff\xff")


def test_progressive_decodes_real_jdk_420_file_matches_jvm(spark):
    """Interop + coverage for the paths our own encoder cannot produce:
    the JDK's ImageIO JPEG writer in progressive mode emits a REAL
    multi-scan SOF2 stream with 4:2:0 chroma subsampling (luma 0x22)
    and its own successive-approximation scan script — exercising the
    interleaved 2x2-luma DC MCUs and the non-interleaved ceil-grid AC
    scans over subsampled chroma. decode_progressive must agree with
    the JVM's own decoder within upsampling tolerance on a smooth
    gradient (replication vs fancy chroma upsampling differ only at
    chroma edges)."""
    import os

    from toymapreduce_go_spark.multimodal.jpeg import (decode_progressive,
                                                       is_progressive)

    jvm = spark._jvm
    w, h = 48, 40
    BI = jvm.java.awt.image.BufferedImage
    bi = BI(w, h, BI.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r = x * 255 // (w - 1)
            g = y * 255 // (h - 1)
            b = (x + y) * 255 // (w + h - 2)
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpeg").next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    param.setCompressionMode(jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.7)
    path = "/tmp/jdk_progressive_interop.jpg"
    f = jvm.java.io.File(path)
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(f)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
    ios.close()
    payload = open(path, "rb").read()
    os.remove(path)
    assert is_progressive(payload)
    # the coverage this test exists for: the luma really is 2x2
    i = payload.index(b"\xff\xc2")
    assert payload[i + 11] == 0x22, hex(payload[i + 11])
    dw, dh, dc_, pix = decode_progressive(payload)
    assert (dw, dh, dc_) == (w, h, 3)
    # JVM oracle read (write again for the datasource, then clean up)
    with open(path, "wb") as fh:
        fh.write(payload)
    row = (spark.read.format("image").load(f"file://{path}")
           .select("image.*").collect()[0])
    os.remove(path)
    theirs = bytes(row.data)  # BGR byte order
    worst = 0
    total = 0
    for j in range(w * h):
        for ch in range(3):
            d = abs(pix[3 * j + ch] - theirs[3 * j + (2 - ch)])
            worst = max(worst, d)
            total += d
    # replication upsampling reconstructs chroma half a sample off vs
    # the JDK's triangular filter: on this gradient (chroma step ~3 per
    # pixel) that bounds the difference at ~half-step + quantization;
    # luma (not upsampled) stays within IDCT rounding
    assert worst <= 8 and total / (3 * w * h) < 2.0, (worst, total)


def test_progressive_restart_markers_roundtrip():
    """DRI/RSTn coverage for the progressive tier: encode with restart
    intervals of 1, 2, and 7 (DC predictors reset, streams byte-aligned
    at each marker) and require bit-identical pixels vs the baseline
    container — in gray and 4:4:4 color."""
    import numpy as np

    from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                       decode_progressive,
                                                       encode_baseline,
                                                       encode_progressive)

    rng = np.random.default_rng(5)
    for dri in (1, 2, 7):
        for (w, h, ch) in [(40, 32, 1), (24, 24, 3)]:
            pix = rng.integers(0, 256, size=w * h * ch,
                               dtype=np.uint8).tobytes()
            prog = encode_progressive(pix, w, h, ch,
                                      restart_interval=dri)
            assert b"\xff\xdd" in prog and b"\xff\xd0" in prog
            assert decode_progressive(prog) == \
                decode_baseline(encode_baseline(pix, w, h, ch)), \
                (dri, w, h, ch)
