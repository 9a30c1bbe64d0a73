"""Pure-Python/numpy baseline JPEG codec — the final piece of the
multimodal decode story: with this, `real_decode_pixels` covers BOTH
container formats end-to-end without PIL/libvips.

Scope (honest and tested, not a full libjpeg):
- **Decoder**: baseline sequential DCT (SOF0), 8-bit, 1 or 3
  components, ANY sampling factors ≤ 4 (4:4:4, 4:2:2, 4:2:0 — chroma
  upsampled by replication), restart markers (DRI/RSTn) supported.
  Huffman and quantization tables are read from the stream's own
  DHT/DQT segments (canonical-code reconstruction), so it decodes
  real-world camera/libjpeg baseline files — verified in pytest against
  the baseline 4:2:0 photographs shipped in Spark's own mllib data
  directory. Round 9: progressive DCT (SOF2) decodes too
  (``decode_progressive`` — spectral selection, successive
  approximation, EOB runs, per-scan table redefinition); each decoder
  stays strict about its own envelope and ``is_progressive`` remains
  the declarative routing column.
- **Encoder**: same envelope, two-pass — pass 1 collects the run/size
  symbol census, pass 2 emits fixed-length canonical Huffman codes
  built from it (valid per the JPEG prefix rules: one code length L
  with n ≤ 2^L − 1 symbols keeps the all-ones code unused, as Annex C
  requires). Compression is modest vs the Annex K tables; determinism
  and round-trip exactness of the *container* are what the fixtures
  need.

Performance (round 8): the per-sample hot paths are numpy batch ops —
all of an image's 8×8 blocks go through the (I)DCT as two matmuls over
an (nblocks, 8, 8) tensor, color conversion / upsampling / block
(dis)assembly are array reshapes, and Huffman decoding uses per-table
prefix LUTs instead of a bit-at-a-time tree walk. Only the entropy
coder's symbol loop remains per-symbol Python — that loop is
O(nonzero coefficients), not O(samples). This retired the measured
8×/decade growth of the video tier (SCALE.md): cost per decoded sample
dropped ~20× while producing byte-identical containers (the encoder is
still deterministic) and pixel output within the same rounding contract
(np.rint == Python banker's round; summation order inside the matmul
may flip an exact .5 boundary on pathological inputs, which the ±1
decode tolerance absorbs).

Quantization tables are the Annex K defaults scaled by the libjpeg
quality formula, which every JPEG tool ships publicly.
"""

from __future__ import annotations

import math
import struct
from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------------------
# Tables

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_ZZ = np.array(ZIGZAG)
_IZZ = np.argsort(_ZZ)  # natural position -> zigzag index

# Annex K base quantization tables (public in every JPEG spec copy)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# DCT basis: _M[v, y] = C[v]/2 · cos((2y+1)vπ/16), so an 8×8 block of
# samples S has coefficients F = _M · S · _Mᵀ and pixels S = _Mᵀ · F · _M
# (both including the spec's 1/4 normalization).
_C = [1 / math.sqrt(2)] + [1.0] * 7
_M = np.array([[0.5 * _C[v] * math.cos((2 * y + 1) * v * math.pi / 16)
                for y in range(8)] for v in range(8)])


@lru_cache(maxsize=64)
def _scaled_quant_cached(base: tuple, quality: int) -> tuple:
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return tuple(max(1, min(255, (b * scale + 50) // 100)) for b in base)


def _scaled_quant(base: list[int], quality: int) -> tuple:
    """libjpeg quality scaling: 1..100 → table multiplier (cached —
    frame-per-frame encoders like the MJPEG synthesizer reuse it)."""
    return _scaled_quant_cached(tuple(base), quality)


# ---------------------------------------------------------------------------
# Forward path (encoder)


def _fdct_quant_batch(blocks: np.ndarray, qt: list[int]) -> np.ndarray:
    """Batched 8×8 DCT-II + quantize: (n, 8, 8) level-shifted samples →
    (n, 64) int32 coefficients in zigzag order."""
    coefs = _M @ blocks @ _M.T                     # (n, 8, 8)
    zz = coefs.reshape(-1, 64)[:, _ZZ] / np.asarray(qt, dtype=np.float64)
    return np.rint(zz).astype(np.int32)


def _bit_size(v: int) -> int:
    return v.bit_length() if v > 0 else (-v).bit_length() if v < 0 else 0


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = self.n = 0
        return bytes(self.buf)


def _amplitude_bits(v: int) -> tuple[int, int]:
    """(size, raw bits) per JPEG F.1.2.1: negatives store v-1's low bits."""
    size = _bit_size(v)
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _block_symbols(coefs: list[int]) -> list[tuple[int, int, int]]:
    """(symbol, extra_value, extra_size) triples for one block's AC run."""
    syms = []
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coefs[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if coefs[i] == 0:
            run += 1
            continue
        while run > 15:
            syms.append((0xF0, 0, 0))  # ZRL
            run -= 16
        size, bits = _amplitude_bits(coefs[i])
        syms.append(((run << 4) | size, bits, size))
        run = 0
    if last_nz < 63:
        syms.append((0x00, 0, 0))  # EOB
    return syms


def _fixed_length_huffman(symbols: set[int]) -> tuple[list[int], list[int]]:
    """bits/vals for a canonical table giving every used symbol the same
    code length L, with n ≤ 2^L − 1 so the all-ones code stays unused
    (JPEG Annex C requirement)."""
    n = max(1, len(symbols))
    L = max(2, (n + 1 - 1).bit_length())  # smallest L with 2^L - 1 >= n
    while (1 << L) - 1 < n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    return bits, sorted(symbols)


def _encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _prep_planes(pixels: bytes, width: int, height: int,
                 channels: int, quality: int):
    """Shared encoder front half (baseline AND progressive): validate,
    RGB→YCbCr (or passthrough gray), per-plane quant tables, then the
    padded batched DCT+quantize per plane. Returns (plane_zz, qts,
    plane_qt) with plane_zz as (nblocks, 64) int lists."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError(f"need {width * height * channels} samples, "
                         f"got {len(pixels)}")
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if channels == 1:
        planes = [arr.reshape(height, width)]
        qts = [_scaled_quant(QUANT_LUMA, quality)]
        plane_qt = [0]
    else:
        rgb = arr.reshape(height, width, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        qts = [_scaled_quant(QUANT_LUMA, quality),
               _scaled_quant(QUANT_CHROMA, quality)]
        plane_qt = [0, 1, 1]
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    plane_zz = []
    for pi, plane in enumerate(planes):
        padded = np.pad(plane, ((0, bh * 8 - height), (0, bw * 8 - width)),
                        mode="edge") - 128.0
        blocks = (padded.reshape(bh, 8, bw, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        plane_zz.append(_fdct_quant_batch(blocks, qts[plane_qt[pi]])
                        .tolist())
    return plane_zz, qts, plane_qt


def encode_baseline(pixels: bytes, width: int, height: int,
                    channels: int = 1, quality: int = 85) -> bytes:
    """A real baseline JPEG from 8-bit samples (1 = grayscale, 3 = RGB,
    4:4:4). Deterministic: same input → identical bytes."""
    blocks_py, qts, plane_qt = _prep_planes(pixels, width, height,
                                            channels, quality)
    return _emit_jpeg(blocks_py, qts, plane_qt, width, height, channels)


def encode_baseline_gray_batch(frames: "np.ndarray",
                               quality: int = 85) -> list[bytes]:
    """Encode a (n_frames, height, width) uint8 stack to n independent
    grayscale baseline JPEGs — byte-identical to calling
    ``encode_baseline`` per frame, but the DCT/quantize pass runs ONCE
    over every frame's blocks, amortizing the numpy dispatch overhead
    that dominates tiny frames (the MJPEG synthesizer's case)."""
    n, height, width = frames.shape
    qt = _scaled_quant(QUANT_LUMA, quality)
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    padded = np.pad(frames.astype(np.float64),
                    ((0, 0), (0, bh * 8 - height), (0, bw * 8 - width)),
                    mode="edge") - 128.0
    blocks = (padded.reshape(n, bh, 8, bw, 8)
              .transpose(0, 1, 3, 2, 4).reshape(-1, 8, 8))
    all_zz = _fdct_quant_batch(blocks, qt).reshape(n, bh * bw, 64).tolist()
    return [_emit_jpeg([frame_zz], [qt], [0], width, height, 1)
            for frame_zz in all_zz]


def _emit_jpeg(blocks_py: list, qts: list, plane_qt: list[int],
               width: int, height: int, channels: int) -> bytes:
    """Symbol census → canonical tables → entropy pass → container, over
    per-plane quantized zigzag blocks (Python int lists)."""
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    block_syms: list[list[list[tuple[int, int, int]]]] = []
    for ci, rows in enumerate(blocks_py):
        tcls = 0 if plane_qt[ci] == 0 else 1
        pred = 0
        syms_ci = []
        for coefs in rows:
            diff = coefs[0] - pred
            pred = coefs[0]
            dc_syms[tcls].add(_bit_size(diff))
            syms = _block_symbols(coefs)
            syms_ci.append(syms)
            for sym, _, _ in syms:
                ac_syms[tcls].add(sym)
        block_syms.append(syms_ci)

    ncls = 1 if channels == 1 else 2
    dc_tabs = [_fixed_length_huffman(dc_syms[c]) for c in range(ncls)]
    ac_tabs = [_fixed_length_huffman(ac_syms[c]) for c in range(ncls)]
    dc_codes = [_encode_table(*t) for t in dc_tabs]
    ac_codes = [_encode_table(*t) for t in ac_tabs]

    # pass 2: entropy-coded data (MCU order = block raster order; 4:4:4
    # interleaves one block per component per MCU)
    w = _BitWriter()
    nplanes = len(blocks_py)
    preds = [0] * nplanes
    nblocks = len(blocks_py[0])
    for bi in range(nblocks):
        for ci in range(nplanes):
            tcls = 0 if plane_qt[ci] == 0 else 1
            coefs = blocks_py[ci][bi]
            diff = coefs[0] - preds[ci]
            preds[ci] = coefs[0]
            size, bits_v = _amplitude_bits(diff)
            code, length = dc_codes[tcls][size]
            # code and amplitude are MSB-first-adjacent: one combined
            # write halves the per-symbol call count
            w.write((code << size) | bits_v, length + size)
            for sym, extra, esz in block_syms[ci][bi]:
                code, length = ac_codes[tcls][sym]
                w.write((code << esz) | extra, length + esz)
    entropy = w.flush()

    # segments
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00" + bytes((1, 1, 0))
               + struct.pack(">HH", 72, 72) + b"\x00\x00")
    for ti in range(len(qts)):
        out += seg(0xDB, bytes([ti]) + bytes(qts[ti]))
    comp = b"".join(bytes([i + 1, 0x11, plane_qt[i]])
                    for i in range(channels))
    out += seg(0xC0, b"\x08" + struct.pack(">HH", height, width)
               + bytes([channels]) + comp)
    for c in range(ncls):
        b_, v_ = dc_tabs[c]
        out += seg(0xC4, bytes([0x00 | c]) + bytes(b_) + bytes(v_))
        b_, v_ = ac_tabs[c]
        out += seg(0xC4, bytes([0x10 | c]) + bytes(b_) + bytes(v_))
    sos_comp = b"".join(
        bytes([i + 1, ((0 if plane_qt[i] == 0 else 1) << 4)
               | (0 if plane_qt[i] == 0 else 1)])
        for i in range(channels))
    out += seg(0xDA, bytes([channels]) + sos_comp + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Inverse path (decoder)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    destuffing. ``peek`` supports bounded lookahead for the Huffman LUT:
    it stops (without consuming) at any real marker or at end-of-data
    and pads the lookahead with 1-bits — the same virtual padding the
    encoder's flush wrote, so a legitimate final symbol decodes while a
    genuinely truncated stream still raises on consumption."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill_soft(self) -> bool:
        """Pull one entropy byte into the accumulator; False when the
        next bytes are a marker or the data ends (nothing consumed)."""
        pos, data = self.pos, self.data
        if pos >= len(data):
            return False
        b = data[pos]
        if b == 0xFF:
            if pos + 1 >= len(data):
                return False
            nxt = data[pos + 1]
            if nxt != 0x00:
                return False  # a real marker terminates entropy data
            self.pos = pos + 2  # stuffed byte
        else:
            self.pos = pos + 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        while self.n < k:
            if not self._fill_soft():
                raise ValueError("truncated JPEG entropy stream")
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def peek(self, k: int) -> int:
        while self.n < k:
            if not self._fill_soft():
                # virtual 1-padding past the end / next marker
                short = k - self.n
                return ((self.acc << short) | ((1 << short) - 1)) \
                    & ((1 << k) - 1)
        return (self.acc >> (self.n - k)) & ((1 << k) - 1)

    def consume(self, k: int) -> None:
        if self.n < k:
            raise ValueError("truncated JPEG entropy stream")
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def restart(self) -> None:
        """Consume the byte-alignment padding and an RSTn marker
        (JPEG E.2.4): called every `restart_interval` MCUs."""
        self.acc = self.n = 0  # discard bits to the byte boundary
        if self.pos + 2 > len(self.data) \
                or self.data[self.pos] != 0xFF \
                or not 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _decode_table(bits: list[int], vals: list[int]) -> tuple[list, int]:
    """Prefix LUT for one Huffman table: (lut, maxlen) where
    ``lut[peek(maxlen)]`` is ``(symbol, code_length)`` or None for an
    invalid prefix. Built once per table per image (canonical-code walk,
    same order as the encoder's), replacing the bit-at-a-time tree walk
    with one peek + one list index per symbol."""
    maxlen = max((length for length in range(1, 17) if bits[length - 1]),
                 default=1)
    lut: list = [None] * (1 << maxlen)
    code = 0
    k = 0
    for length in range(1, maxlen + 1):
        for _ in range(bits[length - 1]):
            base = code << (maxlen - length)
            entry = (vals[k], length)
            for j in range(1 << (maxlen - length)):
                lut[base | j] = entry
            code += 1
            k += 1
        code <<= 1
    return lut, maxlen


def _read_symbol(br: _BitReader, table: tuple[list, int]) -> int:
    lut, maxlen = table
    entry = lut[br.peek(maxlen)]
    if entry is None:
        raise ValueError("invalid Huffman code in JPEG entropy stream")
    sym, length = entry
    br.consume(length)
    return sym


def _extend(v: int, size: int) -> int:
    """JPEG F.2.2.1 sign extension."""
    return v if size == 0 or v >= (1 << (size - 1)) \
        else v - (1 << size) + 1


_MASK = [(1 << i) - 1 for i in range(33)]


def _read_sym_extra(data: bytes, L: int, pos: int, acc: int, n: int,
                    lut: list, maxlen: int, is_dc: bool
                    ) -> tuple[int, int, int, int, int]:
    """Fused per-coefficient read — Huffman symbol (LUT peek) plus its
    amplitude bits plus sign extension in ONE Python call, carrying the
    bit-reader state (pos, acc, n) through the return value instead of
    attribute round-trips. This is the decoder's per-symbol hot path;
    the ``_BitReader`` methods remain the readable reference
    implementation (and serve ``restart``). Same padding contract as
    ``_BitReader.peek``: lookahead past a marker/end pads with 1-bits,
    consumption past real bits raises."""
    while n < maxlen:
        if pos >= L:
            break
        b = data[pos]
        if b == 0xFF:
            if pos + 1 >= L or data[pos + 1] != 0x00:
                break  # a real marker terminates entropy data
            pos += 2
        else:
            pos += 1
        acc = (acc << 8) | b
        n += 8
    if n >= maxlen:
        idx = (acc >> (n - maxlen)) & _MASK[maxlen]
    else:
        short = maxlen - n
        idx = ((acc << short) | _MASK[short]) & _MASK[maxlen]
    entry = lut[idx]
    if entry is None:
        raise ValueError("invalid Huffman code in JPEG entropy stream")
    sym, length = entry
    if n < length:
        raise ValueError("truncated JPEG entropy stream")
    n -= length
    acc &= _MASK[n] if n < 33 else (1 << n) - 1
    size = sym if is_dc else (0 if sym == 0x00 or sym == 0xF0
                              else sym & 0x0F)
    if size == 0:
        return sym, 0, pos, acc, n
    while n < size:
        if pos >= L:
            raise ValueError("truncated JPEG entropy stream")
        b = data[pos]
        if b == 0xFF:
            if pos + 1 >= L or data[pos + 1] != 0x00:
                raise ValueError("truncated JPEG entropy stream")
            pos += 2
        else:
            pos += 1
        acc = (acc << 8) | b
        n += 8
    n -= size
    v = (acc >> n) & _MASK[size]
    acc &= _MASK[n] if n < 33 else (1 << n) - 1
    if v < (1 << (size - 1)):
        v = v - (1 << size) + 1
    return sym, v, pos, acc, n


def is_progressive(payload: bytes) -> bool:
    """Declarative routing predicate: True when the stream's frame
    header is progressive DCT (SOF2). A 100 TB corpus run computes this
    as a column (inside the same Arrow stage) and routes SOF2 payloads
    to a native-codec tier instead of erroring mid-job; this module's
    ``decode_baseline`` keeps rejecting them loudly."""
    if payload[:2] != b"\xff\xd8":
        return False
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            return False
        # B.1.1.2: any number of 0xFF fill bytes may pad a marker; skip
        # them so seg_len is read from the true segment start
        while i + 4 <= len(payload) and payload[i + 1] == 0xFF:
            i += 1
        if i + 4 > len(payload):
            return False
        marker = payload[i + 1]
        if marker == 0xD9 or marker == 0xDA:
            return False
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xC2:
            return True
        if marker in (0xC0, 0xC1, 0xC3):
            return False
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if seg_len < 2:
            return False
        i += 2 + seg_len
    return False


def decode_baseline(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) from a baseline JPEG within the
    module's envelope (SOF0, 8-bit, sampling ≤ 4). Raises ValueError on
    anything else — including the raw-payload containers
    `binary.synthesize_jpeg` builds, whose entropy data is not a valid
    Huffman stream (fail loudly, never return garbage pixels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], tuple[list, int]] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        while i + 2 <= len(payload) and payload[i + 1] == 0xFF:
            i += 1  # B.1.1.2 fill bytes
        if i + 2 > len(payload):
            raise ValueError("truncated JPEG segment")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if i + 4 > len(payload):
            raise ValueError("truncated JPEG segment")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > len(payload):
            raise ValueError("truncated JPEG segment")
        data = payload[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(data):
                prec, tid = data[j] >> 4, data[j] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qts[tid] = list(data[j + 1:j + 65])
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(data):
                tcls, tid = data[j] >> 4, data[j] & 0x0F
                bits = list(data[j + 1:j + 17])
                n = sum(bits)
                vals = list(data[j + 17:j + 17 + n])
                huff[(tcls, tid)] = _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC0:
            prec = data[0]
            h, w = struct.unpack(">HH", data[1:5])
            nc = data[5]
            comps = []
            for c in range(nc):
                cid, sampling, qid = data[6 + 3 * c:9 + 3 * c]
                sh, sv = sampling >> 4, sampling & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"bad sampling factors {sh}x{sv}")
                comps.append((cid, sh, sv, qid))
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", data[:2])[0]
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            nc = data[0]
            scan = []
            for c in range(nc):
                cid, tabs = data[1 + 2 * c], data[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            return _decode_scan(payload[i + 2 + seg_len:], frame, scan,
                                qts, huff, restart_interval)
        i += 2 + seg_len
    raise ValueError("JPEG has no scan data")


def _decode_block(br: _BitReader, dc_tab, ac_tab) -> list[int]:
    """One block's zigzag coefficients (DC still differential). Runs on
    the fused ``_read_sym_extra`` reader with locally-carried bit state
    (one Python call per coefficient)."""
    data = br.data
    L = len(data)
    pos, acc, n = br.pos, br.acc, br.n
    zz = [0] * 64
    _sym, zz[0], pos, acc, n = _read_sym_extra(
        data, L, pos, acc, n, dc_tab[0], dc_tab[1], True)
    ac_lut, ac_maxlen = ac_tab
    k = 1
    while k < 64:
        sym, val, pos, acc, n = _read_sym_extra(
            data, L, pos, acc, n, ac_lut, ac_maxlen, False)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        if k > 63 or (sym & 0x0F) == 0:
            raise ValueError("corrupt JPEG AC coefficients")
        zz[k] = val
        k += 1
    br.pos, br.acc, br.n = pos, acc, n
    return zz


def _idct_plane(zz_rows, qt, grows: int, gcols: int) -> "np.ndarray":
    """Batched dequantize + IDCT + block assembly for one component:
    (grows·gcols, 64) zigzag coefficients → (grows·8, gcols·8) samples."""
    qt_nat = np.asarray(qt, dtype=np.float64)[_IZZ]
    nat = np.asarray(zz_rows)[:, _IZZ] * qt_nat
    pix = _M.T @ nat.reshape(-1, 8, 8) @ _M
    pix = np.clip(np.rint(pix) + 128, 0, 255)
    return (pix.reshape(grows, gcols, 8, 8)
            .transpose(0, 2, 1, 3).reshape(grows * 8, gcols * 8))


def _finish_planes(width: int, height: int, samplings, planes
                   ) -> tuple[int, int, int, bytes]:
    """Shared decoder tail (baseline AND progressive): replication
    upsampling to full resolution, then YCbCr→RGB (or gray
    passthrough). ``samplings`` = [(sh, sv)] per component in frame
    order; ``planes`` the assembled component sample grids."""
    hmax = max(sh for sh, _ in samplings)
    vmax = max(sv for _, sv in samplings)
    full = []
    for (sh, sv), plane in zip(samplings, planes):
        rows = (np.arange(height) * sv) // vmax
        cols = (np.arange(width) * sh) // hmax
        full.append(plane[np.ix_(rows, cols)])
    if len(full) == 1:
        return width, height, 1, full[0].astype(np.uint8).tobytes()
    yv = full[0]
    cb = full[1] - 128.0
    cr = full[2] - 128.0
    r = np.clip(np.rint(yv + 1.402 * cr), 0, 255)
    g = np.clip(np.rint(yv - 0.344136 * cb - 0.714136 * cr), 0, 255)
    b = np.clip(np.rint(yv + 1.772 * cb), 0, 255)
    out = np.stack([r, g, b], axis=-1).astype(np.uint8).tobytes()
    return width, height, 3, out


def _decode_scan(data: bytes, frame, scan, qts, huff,
                 restart_interval: int = 0) -> tuple[int, int, int, bytes]:
    """MCU-interleaved scan decode with general sampling factors: the
    MCU covers 8·Hmax × 8·Vmax source pixels, each component contributes
    its h×v blocks per MCU. The Huffman pass collects every block's
    zigzag coefficients into one (nblocks, 64) array per component;
    dequantize → IDCT → plane assembly → replication upsampling → color
    conversion then all run as numpy batch ops."""
    width, height, comps = frame
    nc = len(comps)
    comp_info = {cid: (sh, sv, qid) for cid, sh, sv, qid in comps}
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcu_cols = (width + 8 * hmax - 1) // (8 * hmax)
    mcu_rows = (height + 8 * vmax - 1) // (8 * vmax)
    # per scan component: coefficient grid sized to its own block grid
    meta = []
    coef_grids = []
    for cid, dc_id, ac_id in scan:
        sh, sv, qid = comp_info[cid]
        dc_tab, ac_tab, qt = huff.get((0, dc_id)), huff.get((1, ac_id)), \
            qts.get(qid)
        if dc_tab is None or ac_tab is None or qt is None:
            raise ValueError("JPEG scan references missing table")
        gcols = mcu_cols * sh
        meta.append((sh, sv, dc_tab, ac_tab, qt, gcols))
        coef_grids.append(np.zeros((mcu_rows * sv * gcols, 64),
                                   dtype=np.int32))
    br = _BitReader(data)
    preds = [0] * nc
    mcus_done = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if restart_interval and mcus_done \
                    and mcus_done % restart_interval == 0:
                br.restart()
                preds = [0] * nc
            for ci in range(nc):
                sh, sv, dc_tab, ac_tab, _qt, gcols = meta[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = _decode_block(br, dc_tab, ac_tab)
                        preds[ci] += zz[0]
                        zz[0] = preds[ci]
                        gi = (mr * sv + by) * gcols + (mc * sh + bx)
                        coef_grids[ci][gi] = zz
            mcus_done += 1

    # batched dequantize + IDCT + assemble + upsample + color convert
    planes = [_idct_plane(coef_grids[ci], meta[ci][4],
                          mcu_rows * meta[ci][1], meta[ci][5])
              for ci in range(nc)]
    return _finish_planes(width, height,
                          [(m[0], m[1]) for m in meta], planes)


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2) — round 9
#
# The successive-approximation + spectral-selection scan protocol from
# the public JPEG spec (ITU-T T.81 Annex G; the control flow below is
# the standard published algorithm every progressive codec implements):
# DC and AC coefficients arrive over MULTIPLE scans — each scan carries
# one spectral band (Ss..Se) at one bit precision (Ah→Al), AC bands are
# single-component, and EOB-run symbols amortize trailing zeros across
# blocks. Coefficients accumulate in per-component full-frame grids;
# once every scan is applied, dequantize + IDCT + upsample + color
# convert are the SAME batched numpy tail the baseline decoder uses.


def _prog_comp_dims(frame, cid):
    """((block_rows, block_cols) for non-interleaved scans — ceil of the
    component's own sample grid, NOT MCU-padded — plus the padded grid
    column stride blocks are stored under)."""
    width, height, comps = frame
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    sh, sv = next((s, v) for c, s, v, _ in comps if c == cid)
    comp_w = (width * sh + hmax - 1) // hmax
    comp_h = (height * sv + vmax - 1) // vmax
    mcu_cols = (width + 8 * hmax - 1) // (8 * hmax)
    return ((comp_h + 7) // 8, (comp_w + 7) // 8, mcu_cols * sh)


def _dc_first_block(br, dc_tab, pred, Al):
    sym = _read_symbol(br, dc_tab)
    diff = _extend(br.bits(sym), sym) if sym else 0
    pred += diff
    return pred, pred << Al


def _ac_first_block(br, ac_tab, zz, Ss, Se, Al, eobrun):
    """T.81 G.1.2.2 / the standard decode_mcu_AC_first control flow."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        sym = _read_symbol(br, ac_tab)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > Se:
                raise ValueError("corrupt progressive AC band")
            zz[k] = _extend(br.bits(s), s) << Al
            k += 1
        else:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                return eobrun - 1  # this block is part of the run
            k += 16  # ZRL
    return 0


def _ac_refine_block(br, ac_tab, zz, Ss, Se, Al, eobrun):
    """T.81 G.1.2.3 AC successive-approximation refinement: correction
    bits for every already-nonzero coefficient crossed, new ±2^Al
    coefficients placed at run ends."""
    p1 = 1 << Al
    m1 = -p1
    k = Ss
    if eobrun == 0:
        while k <= Se:
            sym = _read_symbol(br, ac_tab)
            r, s = sym >> 4, sym & 0x0F
            if s:
                if s != 1:
                    raise ValueError("bad AC refinement symbol")
                s = p1 if br.bits(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                break  # drop to the EOB-run correction sweep
            while k <= Se:
                if zz[k]:
                    if br.bits(1) and not (zz[k] & p1):
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= Se:
                zz[k] = s
            k += 1
    if eobrun > 0:
        while k <= Se:
            if zz[k] and br.bits(1) and not (zz[k] & p1):
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(br, frame, scan, Ss, Se, Ah, Al, huff, coef,
                      restart_interval):
    """Apply ONE progressive scan to the coefficient grids. ``coef``
    maps cid → list of per-block zigzag lists (padded MCU grid)."""
    width, height, comps = frame
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcu_cols = (width + 8 * hmax - 1) // (8 * hmax)
    mcu_rows = (height + 8 * vmax - 1) // (8 * vmax)
    is_dc = Ss == 0

    def tab(kind, tid):
        t = huff.get((kind, tid))
        if t is None:
            raise ValueError("JPEG scan references missing table")
        return t

    if len(scan) == 1:
        cid, dc_id, ac_id = scan[0]
        brows, bcols, stride = _prog_comp_dims(frame, cid)
        grid = coef[cid]
        pred = 0
        eobrun = 0
        done = 0
        for row in range(brows):
            for col in range(bcols):
                if restart_interval and done \
                        and done % restart_interval == 0:
                    br.restart()
                    pred = 0
                    eobrun = 0
                zz = grid[row * stride + col]
                if is_dc:
                    if Ah == 0:
                        pred, zz[0] = _dc_first_block(
                            br, tab(0, dc_id), pred, Al)
                    elif br.bits(1):
                        zz[0] |= 1 << Al
                elif Ah == 0:
                    eobrun = _ac_first_block(
                        br, tab(1, ac_id), zz, Ss, Se, Al, eobrun)
                else:
                    eobrun = _ac_refine_block(
                        br, tab(1, ac_id), zz, Ss, Se, Al, eobrun)
                done += 1
        return

    if not is_dc:
        raise ValueError("progressive AC scans must be single-component")
    comp_info = {c: (s, v) for c, s, v, _ in comps}
    preds = {cid: 0 for cid, _, _ in scan}
    done = 0
    for mr in range(mcu_rows):
        for mc in range(mcu_cols):
            if restart_interval and done \
                    and done % restart_interval == 0:
                br.restart()
                preds = {cid: 0 for cid, _, _ in scan}
            for cid, dc_id, _ac in scan:
                sh, sv = comp_info[cid]
                stride = mcu_cols * sh
                for by in range(sv):
                    for bx in range(sh):
                        zz = coef[cid][(mr * sv + by) * stride
                                       + (mc * sh + bx)]
                        if Ah == 0:
                            preds[cid], zz[0] = _dc_first_block(
                                br, tab(0, dc_id), preds[cid], Al)
                        elif br.bits(1):
                            zz[0] |= 1 << Al
            done += 1


def decode_progressive(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) from a progressive (SOF2) JPEG
    within the module's envelope (8-bit, 1 or 3 components, sampling
    ≤ 4, DRI/RSTn). Raises ValueError on baseline input — routing is
    ``is_progressive``'s job, each decoder stays strict."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], tuple[list, int]] = {}
    frame = None
    coef: dict[int, list[list[int]]] = {}
    restart_interval = 0
    saw_scan = False
    i = 2
    L = len(payload)
    while i + 2 <= L:
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        while i + 2 <= L and payload[i + 1] == 0xFF:
            i += 1  # B.1.1.2 fill bytes
        if i + 2 > L:  # payload ends in fill bytes: no marker to read
            raise ValueError("truncated JPEG segment")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if i + 4 > L:
            raise ValueError("truncated JPEG segment")
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > L:
            raise ValueError("truncated JPEG segment")
        data = payload[i + 4:i + 2 + seg_len]
        if marker == 0xDB:
            j = 0
            while j < len(data):
                prec, tid = data[j] >> 4, data[j] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qts[tid] = list(data[j + 1:j + 65])
                j += 65
        elif marker == 0xC4:
            j = 0
            while j < len(data):
                tcls, tid = data[j] >> 4, data[j] & 0x0F
                bits = list(data[j + 1:j + 17])
                n = sum(bits)
                vals = list(data[j + 17:j + 17 + n])
                huff[(tcls, tid)] = _decode_table(bits, vals)
                j += 17 + n
        elif marker == 0xC2:
            prec = data[0]
            h, w = struct.unpack(">HH", data[1:5])
            nc = data[5]
            comps = []
            for c in range(nc):
                cid, sampling, qid = data[6 + 3 * c:9 + 3 * c]
                sh, sv = sampling >> 4, sampling & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"bad sampling factors {sh}x{sv}")
                comps.append((cid, sh, sv, qid))
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component JPEG unsupported")
            frame = (w, h, comps)
            hmax = max(sh for _, sh, _, _ in comps)
            vmax = max(sv for _, _, sv, _ in comps)
            mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
            mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, sh, sv, _q in comps:
                coef[cid] = [[0] * 64
                             for _ in range(mcu_rows * sv * mcu_cols * sh)]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not a progressive (SOF2) JPEG")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", data[:2])[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            nc = data[0]
            scan = []
            for c in range(nc):
                cid, tabs = data[1 + 2 * c], data[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            Ss, Se, AhAl = data[1 + 2 * nc:4 + 2 * nc]
            Ah, Al = AhAl >> 4, AhAl & 0x0F
            # G.1.1.1.1: a DC scan is exactly the 0..0 band; a
            # baseline-style 0..63 scan inside an SOF2 stream is corrupt
            if (Ss == 0) != (Se == 0) or Se > 63 or Ss > Se:
                raise ValueError("invalid progressive spectral band")
            br = _BitReader(payload[i + 2 + seg_len:])
            _decode_prog_scan(br, frame, scan, Ss, Se, Ah, Al, huff,
                              coef, restart_interval)
            saw_scan = True
            # skip to the next marker after this scan's entropy data
            base = i + 2 + seg_len
            j = base + br.pos
            while j + 1 < L and not (payload[j] == 0xFF
                                     and payload[j + 1] != 0x00):
                j += 1
            i = j
            continue
        i += 2 + seg_len
    if frame is None or not saw_scan:
        raise ValueError("JPEG has no scan data")

    # shared batched tail: dequantize + IDCT + assemble + upsample
    width, height, comps = frame
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcu_cols = (width + 8 * hmax - 1) // (8 * hmax)
    mcu_rows = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cid, sh, sv, qid in comps:
        qt = qts.get(qid)
        if qt is None:
            raise ValueError("frame references missing quant table")
        planes.append(_idct_plane(
            np.asarray(coef[cid], dtype=np.int64),
            qt, mcu_rows * sv, mcu_cols * sh))
    return _finish_planes(width, height,
                          [(sh, sv) for _, sh, sv, _ in comps], planes)


# --- progressive encoder (test twin: exercises the full scan matrix) ------


def _default_scan_script(channels: int) -> list[tuple]:
    """(comp_indices, Ss, Se, Ah, Al) — a libjpeg-shaped script covering
    the whole protocol: interleaved DC first at Al=1, spectral-split AC
    first passes at Al=1, AC refinements to Al=0, DC refinement last."""
    comps = list(range(channels))
    script: list[tuple] = [(comps, 0, 0, 0, 1)]
    for c in comps:
        script += [([c], 1, 5, 0, 1), ([c], 6, 63, 0, 1)]
    for c in comps:
        script += [([c], 1, 63, 1, 0)]
    script += [(comps, 0, 0, 1, 0)]
    return script


def _enc_ac_first_syms(zz, Ss, Se, Al):
    """Per-block (symbol, extra, size) triples for an AC first scan
    (magnitudes point-transformed by >> Al, per-block EOB runs)."""
    out = []
    run = 0
    for k in range(Ss, Se + 1):
        v = zz[k]
        t = (abs(v) >> Al)
        if t == 0:
            run += 1
            continue
        while run > 15:
            out.append((0xF0, 0, 0))
            run -= 16
        tv = t if v >= 0 else -t
        size, bits = _amplitude_bits(tv)
        out.append(((run << 4) | size, bits, size))
        run = 0
    if run > 0:
        out.append((0x00, 0, 0))  # EOB (run of exactly this block)
    return out


def _enc_ac_refine_syms(zz, Ss, Se, Al):
    """Per-block triples + raw correction bits for an AC refinement scan
    — the encoder mirror of ``_ac_refine_block`` (newly-significant
    coefficients emit (run,1)+sign, history coefficients append their
    next magnitude bit after the following symbol / the EOB). Returns a
    list of ('sym', symbol, extra, size) and ('bits', bitlist) ops in
    emission order."""
    absval = [0] * (Se + 1)
    eob = Ss - 1
    for k in range(Ss, Se + 1):
        absval[k] = abs(zz[k]) >> Al
        if absval[k] == 1:
            eob = k
    ops = []
    run = 0
    pending: list[int] = []
    for k in range(Ss, Se + 1):
        t = absval[k]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            ops.append(("sym", 0xF0, 0, 0))
            ops.append(("bits", pending))
            pending = []
            run -= 16
        if t > 1:
            # history coefficient: correction bit rides with the next
            # emitted symbol
            pending.append(t & 1)
            continue
        sign = 1 if zz[k] >= 0 else 0
        ops.append(("sym", (run << 4) | 1, sign, 1))
        ops.append(("bits", pending))
        pending = []
        run = 0
    if run > 0 or pending:
        ops.append(("sym", 0x00, 0, 0))
        ops.append(("bits", pending))
    return ops


def encode_progressive(pixels: bytes, width: int, height: int,
                       channels: int = 1, quality: int = 85,
                       script: list[tuple] | None = None,
                       restart_interval: int = 0) -> bytes:
    """A real progressive (SOF2) JPEG from 8-bit samples — the test twin
    of ``decode_progressive``: same quantized coefficients as
    ``encode_baseline`` (so decoding either container yields identical
    pixels), delivered over a successive-approximation scan script.
    Deterministic; per-scan symbol census builds per-scan DHT segments
    (tables legally redefined between scans)."""
    plane_zz, qts, plane_qt = _prep_planes(pixels, width, height,
                                           channels, quality)
    nblocks = ((width + 7) // 8) * ((height + 7) // 8)

    def seg(marker: int, payload_: bytes) -> bytes:
        return bytes([0xFF, marker]) \
            + struct.pack(">H", len(payload_) + 2) + payload_

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00" + bytes((1, 1, 0))
               + struct.pack(">HH", 72, 72) + b"\x00\x00")
    for ti in range(len(qts)):
        out += seg(0xDB, bytes([ti]) + bytes(qts[ti]))
    comp = b"".join(bytes([i + 1, 0x11, plane_qt[i]])
                    for i in range(channels))
    out += seg(0xC2, b"\x08" + struct.pack(">HH", height, width)
               + bytes([channels]) + comp)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    for comps, Ss, Se, Ah, Al in (script or _default_scan_script(channels)):
        # build this scan's symbol stream per component
        scan_ops: list = []   # flat ops in MCU/raster order
        use_huff = not (Ss == 0 and Ah > 0)
        if Ss == 0:
            if Ah == 0:
                preds = {c: 0 for c in comps}
                for bi in range(nblocks):
                    if restart_interval and bi \
                            and bi % restart_interval == 0:
                        preds = {c: 0 for c in comps}  # E.2.4 reset
                    scan_ops.append(("unit",))
                    for c in comps:
                        dc = plane_zz[c][bi][0] >> Al
                        diff = dc - preds[c]
                        preds[c] = dc
                        size, bits = _amplitude_bits(diff)
                        scan_ops.append(("dc", c, size, bits))
            else:
                for bi in range(nblocks):
                    scan_ops.append(("unit",))
                    for c in comps:
                        scan_ops.append(
                            ("raw", (plane_zz[c][bi][0] >> Al) & 1))
        else:
            (c,) = comps
            for bi in range(nblocks):
                scan_ops.append(("unit",))
                zz = plane_zz[c][bi]
                if Ah == 0:
                    for sym, extra, size in _enc_ac_first_syms(
                            zz, Ss, Se, Al):
                        scan_ops.append(("ac", c, sym, extra, size))
                else:
                    for op in _enc_ac_refine_syms(zz, Ss, Se, Al):
                        if op[0] == "sym":
                            scan_ops.append(("ac", c, op[1], op[2], op[3]))
                        else:
                            scan_ops.append(("rawbits", op[1]))
        # per-scan Huffman tables from the census
        dc_syms = {size for op in scan_ops if op[0] == "dc"
                   for size in [op[2]]}
        ac_syms = {op[2] for op in scan_ops if op[0] == "ac"}
        dc_codes = ac_codes = None
        if use_huff and Ss == 0:
            bits_, vals_ = _fixed_length_huffman(dc_syms)
            out += seg(0xC4, bytes([0x00]) + bytes(bits_) + bytes(vals_))
            dc_codes = _encode_table(bits_, vals_)
        if Ss > 0:
            bits_, vals_ = _fixed_length_huffman(ac_syms)
            out += seg(0xC4, bytes([0x10]) + bytes(bits_) + bytes(vals_))
            ac_codes = _encode_table(bits_, vals_)
        sos_comp = b"".join(bytes([c + 1, 0x00]) for c in comps)
        out += seg(0xDA, bytes([len(comps)]) + sos_comp
                   + bytes([Ss, Se, (Ah << 4) | Al]))
        w = _BitWriter()
        entropy = bytearray()
        unit = 0
        for op in scan_ops:
            if op[0] == "unit":
                if restart_interval and unit \
                        and unit % restart_interval == 0:
                    entropy += w.flush()   # byte-align (1-padded)
                    m = (unit // restart_interval - 1) % 8
                    entropy += bytes([0xFF, 0xD0 + m])
                    w = _BitWriter()
                unit += 1
            elif op[0] == "dc":
                code, length = dc_codes[op[2]]
                w.write((code << op[2]) | op[3], length + op[2])
            elif op[0] == "raw":
                w.write(op[1], 1)
            elif op[0] == "ac":
                code, length = ac_codes[op[2]]
                w.write((code << op[4]) | op[3], length + op[4])
            else:  # rawbits
                for bit in op[1]:
                    w.write(bit, 1)
        entropy += w.flush()
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)
