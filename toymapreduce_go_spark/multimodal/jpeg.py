"""Pure-stdlib baseline JPEG codec (round 7) — the final piece of the
multimodal decode story: with this, `real_decode_pixels` covers BOTH
container formats end-to-end without PIL/libvips.

Scope (honest and tested, not a full libjpeg):
- **Decoder**: baseline sequential DCT (SOF0), 8-bit, 1 or 3
  components, ANY sampling factors ≤ 4 (4:4:4, 4:2:2, 4:2:0 — chroma
  upsampled by replication), restart markers (DRI/RSTn) supported;
  progressive is rejected. Huffman and quantization tables are read
  from the stream's own DHT/DQT segments (canonical-code
  reconstruction), so it decodes real-world camera/libjpeg baseline
  files — verified in pytest against the baseline 4:2:0 photographs
  shipped in Spark's own mllib data directory.
- **Encoder**: same envelope, two-pass — pass 1 collects the run/size
  symbol census, pass 2 emits fixed-length canonical Huffman codes
  built from it (valid per the JPEG prefix rules: one code length L
  with n ≤ 2^L − 1 symbols keeps the all-ones code unused, as Annex C
  requires). Compression is modest vs the Annex K tables; determinism
  and round-trip exactness of the *container* are what the fixtures
  need.

The DCT is the textbook O(64) per-coefficient form with a precomputed
cosine table — fine for fixture-sized images; a production pipeline
decodes with a vectorized library inside the same `mapInPandas`
plumbing (`multimodal.binary`), which is the part this repo owns.

Quantization tables are the Annex K defaults scaled by the libjpeg
quality formula, which every JPEG tool ships publicly.
"""

from __future__ import annotations

import math
import struct

# ---------------------------------------------------------------------------
# Tables

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

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

_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _scaled_quant(base: list[int], quality: int) -> list[int]:
    """libjpeg quality scaling: 1..100 → table multiplier."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return [max(1, min(255, (b * scale + 50) // 100)) for b in base]


# ---------------------------------------------------------------------------
# Forward path (encoder)


def _fdct_quant(block: list[float], qt: list[int]) -> list[int]:
    """8×8 DCT-II then quantize; input is level-shifted samples row-major,
    output in zigzag order."""
    out = [0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                cv = _COS[v][y]
                row = y * 8
                for x in range(8):
                    s += block[row + x] * _COS[u][x] * cv
            val = 0.25 * _C[u] * _C[v] * s
            zz = ZIGZAG.index(v * 8 + u)
            out[zz] = int(round(val / qt[zz]))
    return out


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


def _rgb_to_ycbcr(pixels: bytes, npix: int) -> tuple[list, list, list]:
    ys, cbs, crs = [0.0] * npix, [0.0] * npix, [0.0] * npix
    for i in range(npix):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        ys[i] = 0.299 * r + 0.587 * g + 0.114 * b
        cbs[i] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        crs[i] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return ys, cbs, crs


def encode_baseline(pixels: bytes, width: int, height: int,
                    channels: int = 1, quality: int = 85) -> bytes:
    """A real baseline JPEG from 8-bit samples (1 = grayscale, 3 = RGB,
    4:4:4). Deterministic: same input → identical bytes."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError(f"need {width * height * channels} samples, "
                         f"got {len(pixels)}")
    npix = width * height
    if channels == 1:
        planes = [[float(p) for p in pixels]]
        qts = [_scaled_quant(QUANT_LUMA, quality)]
        plane_qt = [0]
    else:
        planes = list(_rgb_to_ycbcr(pixels, npix))
        qts = [_scaled_quant(QUANT_LUMA, quality),
               _scaled_quant(QUANT_CHROMA, quality)]
        plane_qt = [0, 1, 1]

    bw = (width + 7) // 8
    bh = (height + 7) // 8

    def get_block(plane, bx, by):
        blk = [0.0] * 64
        for y in range(8):
            sy = min(by * 8 + y, height - 1)
            for x in range(8):
                sx = min(bx * 8 + x, width - 1)
                blk[y * 8 + x] = plane[sy * width + sx] - 128.0
        return blk

    # pass 1: quantized blocks + symbol census per (dc/ac, table class)
    blocks: list[list[list[int]]] = [[] for _ in planes]
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    preds = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            for ci, plane in enumerate(planes):
                tcls = 0 if plane_qt[ci] == 0 else 1
                coefs = _fdct_quant(get_block(plane, bx, by), qts[plane_qt[ci]])
                blocks[ci].append(coefs)
                diff = coefs[0] - preds[ci]
                preds[ci] = coefs[0]
                dc_syms[tcls].add(_bit_size(diff))
                for sym, _, _ in _block_symbols(coefs):
                    ac_syms[tcls].add(sym)

    ncls = 1 if channels == 1 else 2
    dc_tabs = [_fixed_length_huffman(dc_syms[c]) for c in range(ncls)]
    ac_tabs = [_fixed_length_huffman(ac_syms[c]) for c in range(ncls)]
    dc_codes = [_encode_table(*t) for t in dc_tabs]
    ac_codes = [_encode_table(*t) for t in ac_tabs]

    # pass 2: entropy-coded data
    w = _BitWriter()
    preds = [0] * len(planes)
    nblocks = bw * bh
    for bi in range(nblocks):
        for ci in range(len(planes)):
            tcls = 0 if plane_qt[ci] == 0 else 1
            coefs = blocks[ci][bi]
            diff = coefs[0] - preds[ci]
            preds[ci] = coefs[0]
            size, bits_v = _amplitude_bits(diff)
            code, length = dc_codes[tcls][size]
            w.write(code, length)
            w.write(bits_v, size)
            for sym, extra, esz in _block_symbols(coefs):
                code, length = ac_codes[tcls][sym]
                w.write(code, length)
                w.write(extra, esz)
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
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume the byte-alignment padding and an RSTn marker
        (JPEG E.2.4): called every `restart_interval` MCUs."""
        self.acc = self.n = 0  # discard bits to the byte boundary
        if self.pos + 2 > len(self.data) \
                or self.data[self.pos] != 0xFF \
                or not 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, canonical reconstruction (same walk as
    the encoder's)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG entropy stream")


def _extend(v: int, size: int) -> int:
    """JPEG F.2.2.1 sign extension."""
    return v if size == 0 or v >= (1 << (size - 1)) \
        else v - (1 << size) + 1


def _idct_block(zz: list[int], qt: list[int]) -> list[int]:
    coef = [0.0] * 64
    for i in range(64):
        coef[ZIGZAG[i]] = zz[i] * qt[i]
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = _C[v] * _COS[v][y]
                row = v * 8
                for u in range(8):
                    s += _C[u] * coef[row + u] * _COS[u][x] * cv
            val = int(round(s / 4.0)) + 128
            out[y * 8 + x] = 0 if val < 0 else 255 if val > 255 else val
    return out


def decode_baseline(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) from a baseline JPEG within the
    module's envelope (SOF0, 8-bit, 4:4:4, no restarts). Raises
    ValueError on anything else — including the raw-payload containers
    `binary.synthesize_jpeg` builds, whose entropy data is not a valid
    Huffman stream (fail loudly, never return garbage pixels)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[i + 1]
        if marker == 0xD9:
            break
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
    """One block's zigzag coefficients (DC still differential)."""
    zz = [0] * 64
    size = _read_symbol(br, dc_tab)
    zz[0] = _extend(br.bits(size), size)
    k = 1
    while k < 64:
        sym = _read_symbol(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        k += run
        if k > 63 or size == 0:
            raise ValueError("corrupt JPEG AC coefficients")
        zz[k] = _extend(br.bits(size), size)
        k += 1
    return zz


def _decode_scan(data: bytes, frame, scan, qts, huff,
                 restart_interval: int = 0) -> tuple[int, int, int, bytes]:
    """MCU-interleaved scan decode with general sampling factors: the
    MCU covers 8·Hmax × 8·Vmax source pixels, each component contributes
    its h×v blocks per MCU, and subsampled planes are upsampled by
    replication at the end (the JFIF nearest-neighbor convention)."""
    width, height, comps = frame
    nc = len(comps)
    comp_info = {cid: (sh, sv, qid) for cid, sh, sv, qid in comps}
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcu_cols = (width + 8 * hmax - 1) // (8 * hmax)
    mcu_rows = (height + 8 * vmax - 1) // (8 * vmax)
    # per scan component: plane sized to its own block grid
    meta = []
    planes = []
    for cid, dc_id, ac_id in scan:
        sh, sv, qid = comp_info[cid]
        dc_tab, ac_tab, qt = huff.get((0, dc_id)), huff.get((1, ac_id)), \
            qts.get(qid)
        if dc_tab is None or ac_tab is None or qt is None:
            raise ValueError("JPEG scan references missing table")
        stride = mcu_cols * sh * 8
        meta.append((sh, sv, dc_tab, ac_tab, qt, stride))
        planes.append([0] * (stride * mcu_rows * sv * 8))
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
                sh, sv, dc_tab, ac_tab, qt, stride = meta[ci]
                plane = planes[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = _decode_block(br, dc_tab, ac_tab)
                        preds[ci] += zz[0]
                        zz[0] = preds[ci]
                        block = _idct_block(zz, qt)
                        px = (mc * sh + bx) * 8
                        py = (mr * sv + by) * 8
                        for y in range(8):
                            row = (py + y) * stride + px
                            plane[row:row + 8] = block[y * 8:(y + 1) * 8]
            mcus_done += 1

    def sample(ci: int, x: int, y: int) -> int:
        sh, sv, _, _, _, stride = meta[ci]
        return planes[ci][(y * sv // vmax) * stride + (x * sh // hmax)]

    out = bytearray(width * height * nc)
    if nc == 1:
        for y in range(height):
            base = y * width
            for x in range(width):
                out[base + x] = sample(0, x, y)
    else:
        for y in range(height):
            for x in range(width):
                yv = sample(0, x, y)
                cb = sample(1, x, y) - 128
                cr = sample(2, x, y) - 128
                i3 = (y * width + x) * 3
                r = int(round(yv + 1.402 * cr))
                g = int(round(yv - 0.344136 * cb - 0.714136 * cr))
                b = int(round(yv + 1.772 * cb))
                out[i3] = 0 if r < 0 else 255 if r > 255 else r
                out[i3 + 1] = 0 if g < 0 else 255 if g > 255 else g
                out[i3 + 2] = 0 if b < 0 else 255 if b > 255 else b
    return width, height, nc, bytes(out)
