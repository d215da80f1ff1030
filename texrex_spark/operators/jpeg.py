"""Pure-stdlib/numpy baseline JPEG codec (ITU-T T.81 sequential DCT).

The reference corpus engine carries no media at all; this codec exists for
the brief's multimodal tier so ``image/jpeg`` payloads in the media table
decode like PNG/BMP/PNM do (operators/multimodal.py) instead of sitting in
the NotImplementedError stub tier.  Everything here derives from the
public JPEG specification (ITU-T T.81): Annex K quantization and Huffman
tables, the baseline entropy coding of F.1.2, and the 8x8 type-II/III DCT
pair expressed as orthonormal matrix products.

Scope (the honest tier ladder):
- decode: baseline sequential DCT (SOF0/1), grayscale or YCbCr, sampling
  factors 4:4:4 / 4:2:2 / 4:2:0 (any h,v in {1,2}), restart markers,
  multiple DQT/DHT segments; AND progressive DCT (SOF2, Annex G Huffman
  path) — spectral selection, successive approximation (DC + AC first
  and refinement scans, EOB runs), with a truncated-at-a-scan-boundary
  file rendering the coarse preview exactly as a browser would.
  Arithmetic coding and lossless/hierarchical modes raise
  NotImplementedError — they stay in the stub tier.
- encode: baseline (``encode_jpeg``) and progressive
  (``encode_progressive_jpeg``, the standard libjpeg scan script) fixture
  encoders sharing one quantizer, so the same image encodes to the same
  coefficients both ways and the two decodes are asserted BIT-IDENTICAL
  — the differential oracle that needs no codec library in the
  container.  Neither is a rate-optimized writer.

Throughput: the entropy decode is per-symbol Python over a 16-bit peek
table (one dict-free lookup per Huffman symbol); fine for the fixture
tier and honest about being the slow path — a production deployment swaps
libjpeg behind the same decode(payload) signature.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# Zigzag order (T.81 Figure 5): ZIGZAG[i] = raster index of the i-th
# zigzag coefficient.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 base quantization tables (luminance, chrominance), raster order.
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: forward 2-D DCT = A @ X @ A.T.
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_A *= np.sqrt(2.0 / 8.0)
_A[0, :] *= np.sqrt(0.5)


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(code, length) per symbol in HUFFVAL order (T.81 C.2)."""
    out = []
    code = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length))
            code += 1
        code <<= 1
    return out


class _HuffTable:
    """16-bit peek-table Huffman decoder: LOOKUP[peek16] = (symbol, bits).

    The tables are plain Python lists, not numpy arrays: the entropy
    decode is a per-symbol Python loop (Huffman decoding is sequential —
    each symbol's bit position depends on the previous symbol's length,
    so it cannot be data-parallel), and CPython list indexing returns
    ready ints several times faster than numpy scalar indexing."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.sym = [0] * (1 << 16)
        self.len = [0] * (1 << 16)
        for (code, length), v in zip(_canonical_codes(bits), vals):
            lo = code << (16 - length)
            n = 1 << (16 - length)
            self.sym[lo : lo + n] = [v] * n
            self.len[lo : lo + n] = [length] * n


# Peek-table construction costs ~1.5 ms per table; real-world JPEGs
# overwhelmingly ship the Annex K tables, so across a mapInPandas batch
# the same (bits, vals) recur for every image.  Decoders are read-only
# after construction, so sharing instances is safe.
_HUFF_CACHE: dict[tuple, _HuffTable] = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    key = (tuple(bits), tuple(vals))
    t = _HUFF_CACHE.get(key)
    if t is None:
        if len(_HUFF_CACHE) >= 16:  # bound worker memory on hostile input
            _HUFF_CACHE.clear()
        t = _HUFF_CACHE[key] = _HuffTable(bits, vals)
    return t


def _quant_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K base table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


# ---------------------------------------------------------------- encode
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # drop the emitted high bits — without this the accumulator grows
        # into a multi-megabit bignum and encoding turns quadratic
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, bits) of a DC diff / AC value (T.81 F.1.2.1-F.1.2.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(
    w: _BitWriter, block: np.ndarray, q: np.ndarray,
    dc: _HuffCodes, ac: _HuffCodes, pred: int,
) -> int:
    coeffs = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    qz = np.round(coeffs.reshape(-1)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
    cat, bits = _magnitude(int(qz[0]) - pred)
    w.write(dc.code[cat], dc.size[cat])
    if cat:
        w.write(bits, cat)
    run = 0
    nz = np.flatnonzero(qz[1:]) + 1
    last = 0
    for i in nz:
        run = int(i) - last - 1
        while run >= 16:
            w.write(ac.code[0xF0], ac.size[0xF0])
            run -= 16
        cat, bits = _magnitude(int(qz[i]))
        sym = (run << 4) | cat
        w.write(ac.code[sym], ac.size[sym])
        w.write(bits, cat)
        last = int(i)
    if last < 63:
        w.write(ac.code[0x00], ac.size[0x00])  # EOB
    return int(qz[0])


class _HuffCodes:
    """symbol -> (code, size) arrays for the encoder."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.code = np.zeros(256, dtype=np.int64)
        self.size = np.zeros(256, dtype=np.int64)
        for (code, length), v in zip(_canonical_codes(bits), vals):
            self.code[v] = code
            self.size[v] = length


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    pp[h:, :w] = p[-1:, :]  # edge-replicate pad
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _prepare_planes(img: np.ndarray, subsampling: str):
    """(gray, [Y(,Cb,Cr)] level-shifted planes, luma h=v factor): the RGB
    -> YCbCr transform + optional 4:2:0 box-average shared by the baseline
    and progressive encoders."""
    gray = img.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, width = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    planes = [np.clip(np.round(p), 0, 255) for p in planes]
    sub = subsampling == "420" and not gray
    lum_hv = 2 if sub else 1
    if sub:
        # box-average chroma down 2x2 (pad odd dims by edge replication)
        ch, cw = (h + 1) // 2, (width + 1) // 2
        for ci in (1, 2):
            p = _pad_edge(planes[ci], ch * 2, cw * 2)
            planes[ci] = (
                p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2]
            ) / 4.0
    return gray, planes, lum_hv


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes for a (h, w) gray or (h, w, 3) RGB uint8 array.

    subsampling: "444" (none) or "420" (2x2 luma sampling, box-averaged
    chroma — the common web layout).  Annex K tables at the given
    quality.  Exists as the in-container fixture writer for the decoder;
    deterministic."""
    gray, planes, lum_hv = _prepare_planes(img, subsampling)
    h, width = img.shape[:2]
    qlum = _quant_scaled(QUANT_LUM, quality)
    qchrom = _quant_scaled(QUANT_CHROM, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, qlum),) + (() if gray else ((1, qchrom),)):
        zz = q[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, width, ncomp)
    for cid in range(1, ncomp + 1):
        hv = (lum_hv << 4) | lum_hv if cid == 1 else 0x11
        sof += bytes([cid, hv, 0 if cid == 1 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht_segment(0x10, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += _dht_segment(0x01, DC_CHROM_BITS, DC_CHROM_VALS)
        out += _dht_segment(0x11, AC_CHROM_BITS, AC_CHROM_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_l, ac_l = _HuffCodes(DC_LUM_BITS, DC_LUM_VALS), _HuffCodes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c, ac_c = _HuffCodes(DC_CHROM_BITS, DC_CHROM_VALS), _HuffCodes(AC_CHROM_BITS, AC_CHROM_VALS)
    comps = []
    mcuw, mcuh = 8 * lum_hv, 8 * lum_hv
    mcux, mcuy = (width + mcuw - 1) // mcuw, (h + mcuh - 1) // mcuh
    for ci in range(ncomp):
        chv = lum_hv if ci == 0 else 1
        comps.append({
            "plane": _pad_edge(planes[ci], mcuy * 8 * chv, mcux * 8 * chv),
            "hv": chv,
            "q": qlum if ci == 0 else qchrom,
            "dc": dc_l if ci == 0 else dc_c,
            "ac": ac_l if ci == 0 else ac_c,
        })
    w = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            w.flush()
            out += w.out + bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            w = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["hv"]):
                for bx in range(c["hv"]):
                    y0 = (my * c["hv"] + by) * 8
                    x0 = (mx * c["hv"] + bx) * 8
                    block = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                    preds[ci] = _encode_block(
                        w, block, c["q"], c["dc"], c["ac"], preds[ci]
                    )
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode
class _BitReader:
    """MSB-first reader over unstuffed entropy bytes with a 16-bit peek."""

    def __init__(self, data: bytes):
        # pad so peek16 near the end never indexes out of range
        self.d = data + b"\x00\x00\x00"
        self.bitpos = 0

    def peek16(self) -> int:
        byte, off = divmod(self.bitpos, 8)
        w = (self.d[byte] << 16) | (self.d[byte + 1] << 8) | self.d[byte + 2]
        return (w >> (8 - off)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.bitpos += n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.bitpos += n
        return v


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the received magnitude bits to a value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes -> (h, w) uint8 gray or (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    coefs = None  # progressive: per-component zigzag coefficient store
    restart_interval = 0
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2: 0xFF fill bytes before a marker
        if pos + 1 >= n:
            break
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > n:
            raise ValueError("corrupt JPEG: truncated segment header")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            raise ValueError("corrupt JPEG: truncated segment")
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq:  # 16-bit table
                    tbl = np.frombuffer(seg[i + 1 : i + 129], dtype=">u2").astype(np.int64)
                    i += 129
                else:
                    tbl = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int64)
                    i += 65
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tbl
                qt[tq] = raster
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("corrupt JPEG: truncated DHT")
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                if i + 17 + nv > len(seg):
                    raise ValueError("corrupt JPEG: truncated DHT values")
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _huff_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if len(seg) < 6:
                raise ValueError("corrupt JPEG: short SOF")
            prec, h, w_, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if h == 0 or w_ == 0 or nc == 0 or len(seg) < 6 + 3 * nc:
                raise ValueError("corrupt JPEG: bad SOF dimensions")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("corrupt JPEG: bad sampling factors")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"h": h, "w": w_, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) Huffman "
                "JPEG are supported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("corrupt JPEG: short DRI")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if not seg or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("corrupt JPEG: short SOS")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                comp = next((c for c in frame["comps"] if c["id"] == cs), None)
                td, ta = tdta >> 4, tdta & 0x0F
                if comp is None or comp["tq"] not in qt:
                    raise ValueError("corrupt JPEG: scan references missing "
                                     "component or table")
                scan.append((comp, td, ta))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            try:
                if frame.get("progressive"):
                    if coefs is None:
                        coefs = _alloc_coefs(frame)
                    pos = _decode_progressive_scan(
                        payload, pos, frame, scan, huff_dc, huff_ac,
                        coefs, ss, se, ah, al, restart_interval,
                    )
                    continue
                for comp, td, ta in scan:
                    if td not in huff_dc or ta not in huff_ac:
                        raise ValueError(
                            "corrupt JPEG: scan references missing table"
                        )
                if len(scan) < len(frame["comps"]):
                    # spec-legal but rare: per-component scans in baseline
                    # mode use component raster order, not the interleaved
                    # MCU walk below — decoding the first scan as if it
                    # covered the frame would return scrambled data
                    raise NotImplementedError(
                        "multi-scan (non-interleaved) baseline JPEG is "
                        "not supported"
                    )
                return _decode_scan(
                    payload, pos, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            except IndexError as e:
                # untrusted input: an exhausted bitstream or mid-entropy
                # truncation surfaces as a clean decode error
                raise ValueError(f"corrupt JPEG: entropy data exhausted ({e})")
        # APPn / COM / others: skipped
    if coefs is not None:
        return _reconstruct_progressive(frame, qt, coefs)
    raise ValueError("corrupt JPEG: no scan data")


def _split_entropy(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuffed entropy segments (split at RST markers) + the position of
    the marker that ended the scan."""
    segments = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        # bulk-copy up to the next 0xFF (C-speed find instead of a
        # per-byte Python walk)
        j = payload.find(b"\xff", i)
        if j == -1:
            cur += payload[i:]
            i = n
            break
        cur += payload[i:j]
        nxt = payload[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i = j + 2
            continue
        if 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i = j + 2
            continue
        i = j
        break  # EOI or next marker ends the scan
    segments.append(bytes(cur))
    return segments, i


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    """Baseline scan: one tight Python-int entropy loop over all MCUs
    collecting (flat position, value) of the nonzero quantized
    coefficients, then BATCHED numpy dequantization, IDCT (broadcast
    8x8 matmuls over all blocks at once) and block scatter.

    Huffman decoding is inherently sequential (each symbol's bit offset
    depends on the previous symbol's length), so the symbol loop stays
    Python — but on a plain-int bit reservoir with list peek tables it
    runs ~10x the old per-block _BitReader/numpy path, and everything
    after the symbol stream is vectorized."""
    h, w = frame["h"], frame["w"]
    if len(scan) == 1:
        # T.81 A.2.2: a non-interleaved (single-component) scan walks the
        # component's data units in plain raster order — sampling factors
        # do not group blocks into MCUs
        c0, td0, ta0 = scan[0]
        scan = [(dict(c0, h=1, v=1), td0, ta0)]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    segments, _ = _split_entropy(payload, pos)

    total_mcus = mcux * mcuy
    per_seg = restart_interval if restart_interval else total_mcus
    ncomp = len(scan)
    # per-MCU block pattern: component index + its peek tables, one entry
    # per data unit in interleave order (T.81 A.2.3: by outer, bx inner)
    pattern = []
    for ci, (comp, td, ta) in enumerate(scan):
        dct, act = huff_dc[td], huff_ac[ta]
        for _ in range(comp["h"] * comp["v"]):
            pattern.append((ci, dct.sym, dct.len, act.sym, act.len))
    bpm = len(pattern)
    n_blocks = total_mcus * bpm

    nz_pos: list[int] = []
    nz_val: list[int] = []
    app_p = nz_pos.append
    app_v = nz_val.append
    preds = [0] * ncomp
    seg_idx = 0
    data = segments[0] + b"\x00\x00\x00\x00"
    dpos = 0
    bitbuf = 0  # MSB-first reservoir: low `bitcnt` bits are unread stream
    bitcnt = 0
    base = 0
    for m in range(total_mcus):
        if m and m % per_seg == 0 and seg_idx + 1 < len(segments):
            seg_idx += 1
            data = segments[seg_idx] + b"\x00\x00\x00\x00"
            dpos = 0
            bitbuf = 0
            bitcnt = 0
            preds = [0] * ncomp
        for ci, dsym, dlen, asym, alen in pattern:
            # ---- DC: symbol + magnitude bits consumed together
            while bitcnt < 16:
                bitbuf = (bitbuf << 8) | data[dpos]
                dpos += 1
                bitcnt += 8
            p16 = (bitbuf >> (bitcnt - 16)) & 0xFFFF
            cat = dsym[p16]
            if cat > 15:
                raise ValueError("corrupt JPEG: bad DC category")
            need = dlen[p16] + cat
            while bitcnt < need:
                bitbuf = (bitbuf << 8) | data[dpos]
                dpos += 1
                bitcnt += 8
            bitcnt -= need
            if cat:
                v = (bitbuf >> bitcnt) & ((1 << cat) - 1)
                pred = preds[ci] + (
                    v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
                )
            else:
                pred = preds[ci]
            preds[ci] = pred
            if pred:
                app_p(base)
                app_v(pred)
            bitbuf &= (1 << bitcnt) - 1
            # ---- AC run-length loop
            k = 1
            while k < 64:
                while bitcnt < 16:
                    bitbuf = (bitbuf << 8) | data[dpos]
                    dpos += 1
                    bitcnt += 8
                p16 = (bitbuf >> (bitcnt - 16)) & 0xFFFF
                sym = asym[p16]
                cat = sym & 0x0F
                need = alen[p16] + cat
                while bitcnt < need:
                    bitbuf = (bitbuf << 8) | data[dpos]
                    dpos += 1
                    bitcnt += 8
                bitcnt -= need
                if cat == 0:
                    bitbuf &= (1 << bitcnt) - 1
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += sym >> 4
                if k > 63:
                    raise ValueError("corrupt JPEG: AC index past block end")
                v = (bitbuf >> bitcnt) & ((1 << cat) - 1)
                bitbuf &= (1 << bitcnt) - 1
                app_p(base + k)
                app_v(v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1)
                k += 1
            base += 64

    zz = np.zeros(n_blocks * 64, dtype=np.int64)
    if nz_pos:
        zz[np.array(nz_pos, dtype=np.int64)] = np.array(nz_val, dtype=np.int64)
    zz = zz.reshape(n_blocks, 64)

    # batched dequant + IDCT + scatter, per component
    pat_ci = np.array([p[0] for p in pattern])
    block_ci = np.tile(pat_ci, total_mcus)
    ms = np.arange(total_mcus)
    mys, mxs = np.divmod(ms, mcux)
    planes = []
    for ci, (comp, _, _) in enumerate(scan):
        hh, vv = comp["h"], comp["v"]
        zzc = zz[block_ci == ci]  # MCU-major, by-outer bx-inner order
        q = qt[comp["tq"]]
        coeffs = np.zeros((len(zzc), 64), dtype=np.float64)
        # zz is zigzag-ordered, q raster-ordered: the i-th zigzag
        # coefficient dequantizes by q[ZIGZAG[i]] (T.81 F.2.1.4)
        coeffs[:, ZIGZAG] = zzc * q[ZIGZAG]
        blocks = _A.T @ coeffs.reshape(-1, 8, 8) @ _A
        plane = np.zeros((mcuy * 8 * vv, mcux * 8 * hh), dtype=np.float64)
        pv = plane.reshape(mcuy * vv, 8, mcux * hh, 8)
        by = np.repeat(np.arange(vv), hh)
        bx = np.tile(np.arange(hh), vv)
        rows = np.repeat(mys, vv * hh) * vv + np.tile(by, total_mcus)
        cols = np.repeat(mxs, vv * hh) * hh + np.tile(bx, total_mcus)
        pv[rows, :, cols, :] = blocks
        planes.append(plane)

    return _assemble([c for c, _, _ in scan], planes, h, w, hmax, vmax)


def _assemble(comps, planes, h, w, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full resolution, crop, level-shift,
    and color-convert (shared by the baseline and progressive paths)."""
    full = []
    for comp, p in zip(comps, planes):
        if comp["h"] < hmax or comp["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive (SOF2)
# T.81 Annex G Huffman path: spectral selection + successive
# approximation.  Scans accumulate quantized coefficients (zigzag order)
# per component; dequantization + IDCT happen once, at EOI, so a
# progressive file of the same quantized coefficients reconstructs
# BIT-IDENTICALLY to its baseline twin — the differential oracle the
# tests pin.


def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _comp_blocks(frame, comp):
    """Non-interleaved block-grid dims (bh, bw) of one component
    (T.81 A.1.1: component samples = ceil(dim * sampling / max))."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = (frame["w"] * comp["h"] + hmax - 1) // hmax
    ch = (frame["h"] * comp["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _alloc_coefs(frame):
    """Per-component coefficient store: one 64-list per block, raster
    block order.  Plain Python lists, not numpy — progressive refinement
    reads and writes individual coefficients in a sequential Python loop,
    where list element access is several times faster than numpy scalar
    indexing; the store becomes an ndarray once, at reconstruction."""
    _, _, mcux, mcuy = _frame_geometry(frame)
    return {
        c["id"]: {
            "bh": mcuy * c["v"],
            "bw": mcux * c["h"],
            "blocks": [
                [0] * 64 for _ in range(mcuy * c["v"] * mcux * c["h"])
            ],
        }
        for c in frame["comps"]
    }


def _decode_progressive_scan(
    payload, pos, frame, scan, huff_dc, huff_ac, coefs, ss, se, ah, al,
    restart_interval,
):
    """One SOF2 scan into the coefficient store; returns the position of
    the marker that ended the scan's entropy data."""
    if not (0 <= ss <= se <= 63 and al <= 13):
        raise ValueError("corrupt JPEG: bad spectral selection bounds")
    if ss == 0 and se != 0:
        raise ValueError("corrupt JPEG: DC scan must have Se=0")
    if ss > 0 and len(scan) != 1:
        raise ValueError("corrupt JPEG: AC scans are single-component")
    segments, endpos = _split_entropy(payload, pos)
    _, _, mcux, mcuy = _frame_geometry(frame)

    dc_tabs = []
    ac_tab = None
    if ss == 0 and ah == 0:
        for _, td, _ in scan:
            if td not in huff_dc:
                raise ValueError("corrupt JPEG: scan references missing table")
            dc_tabs.append(huff_dc[td])
    if ss > 0:
        ta = scan[0][2]
        if ta not in huff_ac:
            raise ValueError("corrupt JPEG: scan references missing table")
        ac_tab = huff_ac[ta]

    # unit list: (scan comp index, block list) in scan order — binding the
    # block's Python list directly avoids all per-unit indexing
    units = []
    if len(scan) > 1:  # interleaved DC scan: MCU order
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (comp, _, _) in enumerate(scan):
                st = coefs[comp["id"]]
                bw = st["bw"]
                blocks = st["blocks"]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        units.append(
                            (ci, blocks[(my * comp["v"] + by) * bw
                                        + mx * comp["h"] + bx])
                        )
        per_seg_units = restart_interval * sum(
            c["h"] * c["v"] for c, _, _ in scan
        ) if restart_interval else 0
    else:  # single component: its own block raster
        comp = scan[0][0]
        bh, bw = _comp_blocks(frame, comp)
        st = coefs[comp["id"]]
        full_bw = st["bw"]
        blocks = st["blocks"]
        for by in range(bh):
            for bx in range(bw):
                units.append((0, blocks[by * full_bw + bx]))
        per_seg_units = restart_interval if restart_interval else 0

    # the same plain-int MSB-first reservoir as the baseline scan loop
    dc_sym = [t.sym for t in dc_tabs]
    dc_len = [t.len for t in dc_tabs]
    a_sym = ac_tab.sym if ac_tab is not None else None
    a_len = ac_tab.len if ac_tab is not None else None
    seg_idx = 0
    data = segments[0] + b"\x00\x00\x00\x00"
    dpos = 0
    bitbuf = 0
    bitcnt = 0
    preds = [0] * len(scan)
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al
    for ui, (ci, block) in enumerate(units):
        if per_seg_units and ui and ui % per_seg_units == 0 \
                and seg_idx + 1 < len(segments):
            seg_idx += 1
            data = segments[seg_idx] + b"\x00\x00\x00\x00"
            dpos = 0
            bitbuf = 0
            bitcnt = 0
            preds = [0] * len(scan)
            eobrun = 0
        if ss == 0:
            if ah == 0:  # DC first
                while bitcnt < 16:
                    bitbuf = (bitbuf << 8) | data[dpos]
                    dpos += 1
                    bitcnt += 8
                p16 = (bitbuf >> (bitcnt - 16)) & 0xFFFF
                cat = dc_sym[ci][p16]
                if cat > 15:
                    raise ValueError("corrupt JPEG: bad DC category")
                need = dc_len[ci][p16] + cat
                while bitcnt < need:
                    bitbuf = (bitbuf << 8) | data[dpos]
                    dpos += 1
                    bitcnt += 8
                bitcnt -= need
                if cat:
                    v = (bitbuf >> bitcnt) & ((1 << cat) - 1)
                    preds[ci] += (
                        v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
                    )
                bitbuf &= (1 << bitcnt) - 1
                block[0] = preds[ci] << al
            else:  # DC refinement: one bit per block
                if not bitcnt:
                    bitbuf = data[dpos]
                    dpos += 1
                    bitcnt = 8
                bitcnt -= 1
                if (bitbuf >> bitcnt) & 1:
                    block[0] |= p1
                bitbuf &= (1 << bitcnt) - 1
        elif ah == 0:
            # ---- T.81 G.1.2.2 first AC scan: EOB runs + shifted values
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                while bitcnt < 16:
                    bitbuf = (bitbuf << 8) | data[dpos]
                    dpos += 1
                    bitcnt += 8
                p16 = (bitbuf >> (bitcnt - 16)) & 0xFFFF
                sym = a_sym[p16]
                cat = sym & 0x0F
                run = sym >> 4
                if cat == 0:
                    if run < 15:  # EOBn: run-length of all-done blocks
                        need = a_len[p16] + run
                        while bitcnt < need:
                            bitbuf = (bitbuf << 8) | data[dpos]
                            dpos += 1
                            bitcnt += 8
                        bitcnt -= need
                        ext = (bitbuf >> bitcnt) & ((1 << run) - 1) if run else 0
                        bitbuf &= (1 << bitcnt) - 1
                        eobrun = (1 << run) - 1 + ext
                        break
                    bitcnt -= a_len[p16]  # ZRL
                    bitbuf &= (1 << bitcnt) - 1
                    k += 16
                    continue
                need = a_len[p16] + cat
                while bitcnt < need:
                    bitbuf = (bitbuf << 8) | data[dpos]
                    dpos += 1
                    bitcnt += 8
                bitcnt -= need
                k += run
                if k > se:
                    raise ValueError("corrupt JPEG: AC index past band end")
                v = (bitbuf >> bitcnt) & ((1 << cat) - 1)
                bitbuf &= (1 << bitcnt) - 1
                block[k] = (
                    v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1
                ) << al
                k += 1
        else:
            # ---- T.81 G.1.2.3 AC refinement: one correction bit per
            # already-nonzero coefficient, new ±1<<Al as run/1 symbols
            k = ss
            if eobrun == 0:
                while k <= se:
                    while bitcnt < 16:
                        bitbuf = (bitbuf << 8) | data[dpos]
                        dpos += 1
                        bitcnt += 8
                    p16 = (bitbuf >> (bitcnt - 16)) & 0xFFFF
                    sym = a_sym[p16]
                    cat = sym & 0x0F
                    run = sym >> 4
                    bitcnt -= a_len[p16]
                    bitbuf &= (1 << bitcnt) - 1
                    if cat == 0:
                        if run < 15:
                            if run:
                                while bitcnt < run:
                                    bitbuf = (bitbuf << 8) | data[dpos]
                                    dpos += 1
                                    bitcnt += 8
                                bitcnt -= run
                                ext = (bitbuf >> bitcnt) & ((1 << run) - 1)
                                bitbuf &= (1 << bitcnt) - 1
                            else:
                                ext = 0
                            eobrun = (1 << run) + ext
                            break
                        val = 0  # ZRL: skip 16 zero-history coefficients
                    elif cat == 1:
                        if not bitcnt:
                            bitbuf = data[dpos]
                            dpos += 1
                            bitcnt = 8
                        bitcnt -= 1
                        val = p1 if (bitbuf >> bitcnt) & 1 else m1
                        bitbuf &= (1 << bitcnt) - 1
                    else:
                        raise ValueError("corrupt JPEG: bad refinement category")
                    while k <= se:
                        bk = block[k]
                        if bk:
                            if not bitcnt:
                                bitbuf = data[dpos]
                                dpos += 1
                                bitcnt = 8
                            bitcnt -= 1
                            b = (bitbuf >> bitcnt) & 1
                            bitbuf &= (1 << bitcnt) - 1
                            if b and (bk & p1) == 0:
                                block[k] = bk + (p1 if bk >= 0 else m1)
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if cat and k <= se:
                        block[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    bk = block[k]
                    if bk:
                        if not bitcnt:
                            bitbuf = data[dpos]
                            dpos += 1
                            bitcnt = 8
                        bitcnt -= 1
                        b = (bitbuf >> bitcnt) & 1
                        bitbuf &= (1 << bitcnt) - 1
                        if b and (bk & p1) == 0:
                            block[k] = bk + (p1 if bk >= 0 else m1)
                    k += 1
                eobrun -= 1
    return endpos


def _reconstruct_progressive(frame, qt, coefs):
    """Dequantize + IDCT every component's accumulated coefficients
    (vectorized over all blocks), then assemble like the baseline path."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    planes = []
    for comp in frame["comps"]:
        if comp["tq"] not in qt:
            raise ValueError("corrupt JPEG: missing quantization table")
        q = qt[comp["tq"]]  # raster order
        st = coefs[comp["id"]]
        bh, bw = st["bh"], st["bw"]
        zz = np.array(st["blocks"], dtype=np.int64).reshape(bh, bw, 64)
        raster = np.zeros((bh, bw, 64), dtype=np.float64)
        raster[..., ZIGZAG] = zz
        raster *= q
        blocks = raster.reshape(bh, bw, 8, 8)
        # IDCT: A.T @ X @ A per block — broadcast matmul keeps the exact
        # float association of the baseline per-block expression, so a
        # progressive file reconstructs bit-identically to its baseline twin
        spatial = (_A.T @ blocks) @ _A
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        planes.append(plane)
    return _assemble(frame["comps"], planes, frame["h"], frame["w"], hmax, vmax)


def _quantize_component(plane, q, bh, bw):
    """(bh, bw, 64) zigzag-order quantized coefficients of a padded plane
    — vectorized over all blocks, same np.round quantizer as the baseline
    encoder so a progressive file carries IDENTICAL coefficients."""
    p = _pad_edge(plane, bh * 8, bw * 8)
    blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    # broadcast matmul keeps the float association of the baseline
    # encoder's per-block `_A @ X @ _A.T`, so boundary values quantize
    # identically in both encoders
    coeffs = (_A @ blocks) @ _A.T
    flat = coeffs.reshape(bh, bw, 64)
    return np.round(flat[..., ZIGZAG] / q[ZIGZAG]).astype(np.int64)


def _prog_units(comps, mcux, mcuy):
    """(comp_pos, by, bx) block order of a progressive scan — MCU order
    when interleaved, component-raster order for single-component scans
    (mirrors the decoder's unit list exactly)."""
    units = []
    if len(comps) > 1:
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for i, c in enumerate(comps):
                for by in range(c["hv"]):
                    for bx in range(c["hv"]):
                        units.append((i, my * c["hv"] + by, mx * c["hv"] + bx))
    else:
        for by in range(comps[0]["bh"]):
            for bx in range(comps[0]["bw"]):
                units.append((0, by, bx))
    return units


def _scan_dc_first(comps, mcux, mcuy, al):
    w = _BitWriter()
    preds = [0] * len(comps)
    for i, by, bx in _prog_units(comps, mcux, mcuy):
        c = comps[i]
        dc = int(c["coef"][by, bx, 0]) >> al  # arithmetic point transform
        cat, bits = _magnitude(dc - preds[i])
        w.write(c["dc"].code[cat], c["dc"].size[cat])
        if cat:
            w.write(bits, cat)
        preds[i] = dc
    w.flush()
    return bytes(w.out)


def _scan_dc_refine(comps, mcux, mcuy, al):
    w = _BitWriter()
    for i, by, bx in _prog_units(comps, mcux, mcuy):
        w.write((int(comps[i]["coef"][by, bx, 0]) >> al) & 1, 1)
    w.flush()
    return bytes(w.out)


def _scan_ac_first(c, ss, se, al):
    """First scan of an AC band: runs + EOB per block (EOB runs are kept
    at length 1 because the Annex K tables carry no EOBn>0 symbols; the
    decoder handles full EOBn for foreign files)."""
    w = _BitWriter()
    ac = c["ac"]
    for _, by, bx in _prog_units([c], 0, 0):
        band = c["coef"][by, bx]
        run = 0
        for k in range(ss, se + 1):
            v = int(band[k])
            t = abs(v) >> al
            if t == 0:
                run += 1
                continue
            while run >= 16:
                w.write(ac.code[0xF0], ac.size[0xF0])
                run -= 16
            sv = t if v > 0 else -t
            cat, bits = _magnitude(sv)
            sym = (run << 4) | cat
            w.write(ac.code[sym], ac.size[sym])
            w.write(bits, cat)
            run = 0
        if run > 0:
            w.write(ac.code[0x00], ac.size[0x00])  # EOB
    w.flush()
    return bytes(w.out)


def _scan_ac_refine(c, ss, se, al):
    """Refinement scan of an AC band (T.81 G.1.2.3): new significances as
    run/1 symbols + sign, one buffered correction bit per already-nonzero
    coefficient, flushed after each symbol; trailing state folds into a
    per-block EOB.  Control flow mirrors the public libjpeg encoder."""
    w = _BitWriter()
    ac = c["ac"]
    for _, by, bx in _prog_units([c], 0, 0):
        band = c["coef"][by, bx]
        tvals = [abs(int(band[k])) >> al for k in range(ss, se + 1)]
        eob_k = ss - 1
        for off, t in enumerate(tvals):
            if t == 1:
                eob_k = ss + off
        run = 0
        br: list[int] = []
        for off, t in enumerate(tvals):
            k = ss + off
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob_k:
                w.write(ac.code[0xF0], ac.size[0xF0])
                run -= 16
                for b in br:
                    w.write(b, 1)
                br = []
            if t > 1:  # already significant: buffer the correction bit
                br.append(t & 1)
                continue
            sym = (run << 4) | 1
            w.write(ac.code[sym], ac.size[sym])
            w.write(1 if int(band[k]) > 0 else 0, 1)
            for b in br:
                w.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            w.write(ac.code[0x00], ac.size[0x00])  # EOB
            for b in br:
                w.write(b, 1)
    w.flush()
    return bytes(w.out)


def encode_progressive_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """Progressive (SOF2) JFIF bytes for a gray or RGB uint8 array, using
    the standard spectral-selection + successive-approximation script
    (DC Al=1 -> coarse AC bands -> AC refinements -> DC refinement), the
    same Annex K tables and quantizer as ``encode_jpeg`` — so both
    encodings decode to bit-identical pixels."""
    gray, planes, lum_hv = _prepare_planes(img, subsampling)
    h, width = img.shape[:2]
    qlum = _quant_scaled(QUANT_LUM, quality)
    qchrom = _quant_scaled(QUANT_CHROM, quality)
    ncomp = 1 if gray else 3
    hmax = lum_hv
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * hmax - 1) // (8 * hmax)
    dc_l, ac_l = _HuffCodes(DC_LUM_BITS, DC_LUM_VALS), _HuffCodes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c, ac_c = _HuffCodes(DC_CHROM_BITS, DC_CHROM_VALS), _HuffCodes(AC_CHROM_BITS, AC_CHROM_VALS)
    comps = []
    for ci in range(ncomp):
        chv = lum_hv if ci == 0 else 1
        cw = (width * chv + hmax - 1) // hmax
        chh = (h * chv + hmax - 1) // hmax
        comps.append({
            "cid": ci + 1, "hv": chv,
            "coef": _quantize_component(
                planes[ci], qlum if ci == 0 else qchrom, mcuy * chv, mcux * chv
            ),
            "bh": (chh + 7) // 8, "bw": (cw + 7) // 8,
            "dc": dc_l if ci == 0 else dc_c,
            "ac": ac_l if ci == 0 else ac_c,
        })

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, qlum),) + (() if gray else ((1, qchrom),)):
        zz = q[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = struct.pack(">BHHB", 8, h, width, ncomp)
    for c in comps:
        sof += bytes([c["cid"], (c["hv"] << 4) | c["hv"], 0 if c["cid"] == 1 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, DC_LUM_BITS, DC_LUM_VALS)
    out += _dht_segment(0x10, AC_LUM_BITS, AC_LUM_VALS)
    if not gray:
        out += _dht_segment(0x01, DC_CHROM_BITS, DC_CHROM_VALS)
        out += _dht_segment(0x11, AC_CHROM_BITS, AC_CHROM_VALS)

    def sos(scan_comps, ss, se, ah, al, data):
        hdr = bytes([len(scan_comps)])
        for c in scan_comps:
            td = 0 if c["cid"] == 1 else 1
            ta = 0 if c["cid"] == 1 else 1
            hdr += bytes([c["cid"], (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(hdr) + 2) + hdr + data

    y = comps[0]
    out += sos(comps, 0, 0, 0, 1, _scan_dc_first(comps, mcux, mcuy, 1))
    out += sos([y], 1, 5, 0, 2, _scan_ac_first(y, 1, 5, 2))
    if not gray:
        cb, cr = comps[1], comps[2]
        out += sos([cb], 1, 63, 0, 1, _scan_ac_first(cb, 1, 63, 1))
        out += sos([cr], 1, 63, 0, 1, _scan_ac_first(cr, 1, 63, 1))
    out += sos([y], 6, 63, 0, 2, _scan_ac_first(y, 6, 63, 2))
    out += sos([y], 1, 63, 2, 1, _scan_ac_refine(y, 1, 63, 1))
    out += sos(comps, 0, 0, 1, 0, _scan_dc_refine(comps, mcux, mcuy, 0))
    if not gray:
        out += sos([cb], 1, 63, 1, 0, _scan_ac_refine(cb, 1, 63, 0))
        out += sos([cr], 1, 63, 1, 0, _scan_ac_refine(cr, 1, 63, 0))
    out += sos([y], 1, 63, 1, 0, _scan_ac_refine(y, 1, 63, 0))
    out += b"\xff\xd9"
    return bytes(out)
