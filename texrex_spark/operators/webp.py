"""Pure-stdlib WebP lossless (VP8L) codec.

Spec sources: the public WebP container spec (RIFF framing) and the
WebP Lossless Bitstream Specification (RFC 9649).  Like the PNG
(multimodal.py), JPEG (jpeg.py), and GIF (gif.py) codecs, everything
here derives from the published format — no codec libraries exist in
this container, and the reference corpus tool has no media at all, so
this is brief-relative scope (multimodal columns for a training-data
pipeline; WebP is the most common crawl image format that was still
stubbed).

Supported decode: the full VP8L lossless feature set — all four
transforms (predictor with the 14 spatial modes, cross-channel color
transform, subtract-green, color-indexing with sub-byte pixel packing),
LZ77 backward references through the 120-entry distance neighbor map,
color cache, meta prefix codes (entropy-image group selection), and
both simple and code-length-coded canonical prefix codes.  The encoder
emits real VP8L streams over the same feature set (single-mode
transform blocks, dist-1 run LZ77, optional color cache / meta groups)
so every decoder path round-trips without external libraries.

Animation: the extended container (VP8X + ANIM + ANMF) decodes and
encodes too — per-frame rectangles, alpha-blend vs overwrite, and
dispose-to-background compositing (decode_webp_frames /
encode_webp_frames, the twins of gif.decode_gif_frames /
encode_gif_frames); decode_webp on an animation composites only frame
0 (the gif.py early-stop lesson).

Stub: lossy WebP (a ``VP8 `` chunk) raises NotImplementedError — the
DCT tier needs libwebp; a production deployment swaps it in behind the
same ``decode_webp(payload)`` signature.

Untrusted-payload posture mirrors gif.py: header-claimed dimensions are
capped (MAX_PIXELS) before any allocation, every bit read is
bounds-checked, and malformed structure raises ``WebpError`` (a
``ValueError``) — pinned by test_codec_fuzz.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np


class WebpError(ValueError):
    pass


# Same untrusted-input cap as gif.py: far above any real web image,
# far below the 16384x16384 (~1 GiB RGBA) a crafted header may claim.
MAX_PIXELS = 64_000_000

# Code-length-code read order (RFC 9649; identical role to DEFLATE's).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

_HASH_MUL = 0x1E35A7BD  # color-cache multiplicative hash (spec constant)


def _make_plane_codes() -> list[tuple[int, int]]:
    """The 120-entry (dx, dy) neighbor map behind distance codes 1..120,
    generated from its ordering rule rather than transcribed: all pixels
    with dy in 0..7, dx in -7..8 that precede the current one in scan
    order, sorted by squared Euclidean distance, ties broken by larger
    dy then larger dx.  The spec's literal head entries are pinned in
    tests/test_webp.py."""
    pairs = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return pairs


PLANE_CODES = _make_plane_codes()


def _plane_to_dist(code: int, w: int) -> int:
    """Distance code (1-based, after prefix decoding) -> pixel distance."""
    if code < 1:
        raise WebpError("distance code underflow")
    if code > 120:
        return code - 120
    dx, dy = PLANE_CODES[code - 1]
    return max(1, dy * w + dx)


def _dist_to_code(dist: int, w: int) -> int:
    """Inverse of _plane_to_dist for the encoder (first matching plane
    entry wins, mirroring the decoder's max(1, .) collapse)."""
    for i, (dx, dy) in enumerate(PLANE_CODES):
        if max(1, dy * w + dx) == dist:
            return i + 1
    return dist + 120


# ------------------------------------------------------------- bit I/O
class _Bits:
    """LSB-first bit reader with an int reservoir (same idiom as the GIF
    LZW reservoir); every refill is bounds-checked."""

    __slots__ = ("data", "n", "pos", "buf", "cnt")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.n = len(data)
        self.pos = byte_pos
        self.buf = 0
        self.cnt = 0

    def read(self, nbits: int) -> int:
        while self.cnt < nbits:
            if self.pos >= self.n:
                raise WebpError("VP8L bitstream exhausted")
            self.buf |= self.data[self.pos] << self.cnt
            self.pos += 1
            self.cnt += 8
        v = self.buf & ((1 << nbits) - 1)
        self.buf >>= nbits
        self.cnt -= nbits
        return v


class _BitWriter:
    """LSB-first bit writer (mirror of _Bits)."""

    __slots__ = ("out", "acc", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc |= val << self.cnt
        self.cnt += nbits
        while self.cnt >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.cnt -= 8

    def getvalue(self) -> bytes:
        if self.cnt:
            return bytes(self.out) + bytes([self.acc & 0xFF])
        return bytes(self.out)


def _revbits(code: int, nbits: int) -> int:
    r = 0
    for _ in range(nbits):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


# ------------------------------------------------- canonical prefix codes
class _Code:
    """Decoder side of one canonical prefix code: a flat peek table of
    packed (symbol << 4) | length entries, or a 0-bit single-symbol
    code (the incomplete-but-legal case simple codes rely on)."""

    __slots__ = ("nbits", "mask", "table", "single")

    def __init__(self, table=None, nbits=0, single=-1):
        self.table = table
        self.nbits = nbits
        self.mask = (1 << nbits) - 1
        self.single = single

    def decode(self, br: _Bits) -> int:
        if self.nbits == 0:
            return self.single
        while br.cnt < self.nbits and br.pos < br.n:
            br.buf |= br.data[br.pos] << br.cnt
            br.pos += 1
            br.cnt += 8
        e = self.table[br.buf & self.mask]
        ln = e & 15
        if br.cnt < ln:
            raise WebpError("VP8L bitstream exhausted")
        br.buf >>= ln
        br.cnt -= ln
        return e >> 4


def _build_code(lengths: list[int]) -> _Code:
    """Code lengths -> decode table.  DEFLATE-canonical (codes of equal
    length ordered by symbol), codes stored bit-reversed because the
    reservoir is LSB-first.  A single used symbol is a legal 0-bit code
    (that is how simple 1-symbol codes land here); anything else must
    satisfy Kraft exactly."""
    nz = [(ln, s) for s, ln in enumerate(lengths) if ln]
    if not nz:
        raise WebpError("empty prefix code")
    if len(nz) == 1:
        return _Code(single=nz[0][1])
    max_len = max(ln for ln, _ in nz)
    if max_len > 15:
        raise WebpError("prefix code length > 15")
    if sum(1 << (max_len - ln) for ln, _ in nz) != 1 << max_len:
        raise WebpError("prefix code is not complete (Kraft)")
    nz.sort()
    table = [0] * (1 << max_len)
    code = 0
    prev = nz[0][0]
    for ln, s in nz:
        code <<= ln - prev
        prev = ln
        entry = (s << 4) | ln
        rev = _revbits(code, ln)
        step = 1 << ln
        for k in range(rev, 1 << max_len, step):
            table[k] = entry
        code += 1
    return _Code(table=table, nbits=max_len)


def _read_code(br: _Bits, alphabet_size: int) -> _Code:
    """Read one prefix code description (simple or code-length-coded)."""
    if br.read(1):  # simple
        n_sym = br.read(1) + 1
        s0 = br.read(8) if br.read(1) else br.read(1)
        lengths = [0] * alphabet_size
        if s0 >= alphabet_size:
            raise WebpError("simple-code symbol out of alphabet")
        lengths[s0] = 1
        if n_sym == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise WebpError("simple-code symbol out of alphabet")
            lengths[s1] = 1
        return _build_code(lengths)
    num_codes = br.read(4) + 4
    clc_len = [0] * 19
    for i in range(num_codes):
        clc_len[_CLC_ORDER[i]] = br.read(3)
    clc = _build_code(clc_len)
    if br.read(1):  # bounded symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet_size:
            raise WebpError("max_symbol beyond alphabet")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym = 0
    prev = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        c = clc.decode(br)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev = c
        else:
            if c == 16:
                rep, val = 3 + br.read(2), prev
            elif c == 17:
                rep, val = 3 + br.read(3), 0
            else:
                rep, val = 11 + br.read(7), 0
            if sym + rep > alphabet_size:
                raise WebpError("code-length repeat overruns alphabet")
            if val:
                for _ in range(rep):
                    lengths[sym] = val
                    sym += 1
            else:
                sym += rep
    return _build_code(lengths)


# ----------------------------------------------- LZ77 prefix value coding
def _prefix_val(br: _Bits, sym: int) -> int:
    """LZ77 length/distance prefix symbol (+ extra bits) -> value."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_sym(value: int) -> tuple[int, int, int]:
    """value -> (prefix symbol, n extra bits, extra value)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    k = v.bit_length() - 1
    second = (v >> (k - 1)) & 1
    return 2 * k + second, k - 1, v - ((2 + second) << (k - 1))


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ------------------------------------------------------------ predictors
def _avg2(a: int, b: int) -> int:
    # exact per-byte floor average, no cross-byte carries
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _add_px(a: int, b: int) -> int:
    rb = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    ag = (((a >> 8) & 0x00FF00FF) + ((b >> 8) & 0x00FF00FF)) & 0x00FF00FF
    return (ag << 8) | rb


def _sub_px(a: int, b: int) -> int:
    rb = ((a & 0x00FF00FF) + 0x01000100 - (b & 0x00FF00FF)) & 0x00FF00FF
    ag = (
        ((a >> 8) & 0x00FF00FF) + 0x01000100 - ((b >> 8) & 0x00FF00FF)
    ) & 0x00FF00FF
    return (ag << 8) | rb


def _select(L: int, T: int, TL: int) -> int:
    # RFC 9649 Select: Manhattan distance of L and T to the per-channel
    # gradient estimate L+T-TL; |est - L| per channel reduces to |Tc-TLc|.
    pL = pT = 0
    for sh in (24, 16, 8, 0):
        lc, tc, tlc = (L >> sh) & 0xFF, (T >> sh) & 0xFF, (TL >> sh) & 0xFF
        pL += abs(tc - tlc)
        pT += abs(lc - tlc)
    return L if pL < pT else T


def _clamp_full(L: int, T: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_half(L: int, T: int, TL: int) -> int:
    a = _avg2(L, T)
    out = 0
    for sh in (24, 16, 8, 0):
        ac, bc = (a >> sh) & 0xFF, (TL >> sh) & 0xFF
        d = ac - bc
        # C-truncating division by 2 (RFC pseudocode is C semantics)
        v = ac + (d // 2 if d >= 0 else -((-d) // 2))
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        return _select(L, T, TL)
    if mode == 12:
        return _clamp_full(L, T, TL)
    if mode == 13:
        return _clamp_half(L, T, TL)
    raise WebpError(f"predictor mode {mode} out of range")


def _sx8(x: np.ndarray) -> np.ndarray:
    """uint channel values -> signed int8 semantics in int32."""
    return (((x & 0xFF) ^ 0x80) - 0x80).astype(np.int32)


# ------------------------------------------------------ inverse transforms
def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> np.uint32(8)) & np.uint32(0xFF)
    r = (((argb >> np.uint32(16)) & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    b = ((argb & np.uint32(0xFF)) + g) & np.uint32(0xFF)
    return (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _inv_color_transform(
    argb: np.ndarray, w: int, h: int, bits: int, sub: np.ndarray, sub_w: int
) -> np.ndarray:
    """Per-block cross-channel inverse (RFC 9649 color transform): the
    sub-image carries (red_to_blue, green_to_blue, green_to_red) in its
    red/green/blue channels as signed 8-bit multipliers."""
    bx = (np.arange(w) >> bits).astype(np.int64)
    by = (np.arange(h) >> bits).astype(np.int64)
    m = sub[(by[:, None] * sub_w + bx[None, :])].ravel()
    g2r = _sx8(m & 0xFF)
    g2b = _sx8((m >> np.uint32(8)) & 0xFF)
    r2b = _sx8((m >> np.uint32(16)) & 0xFF)
    green = _sx8((argb >> np.uint32(8)) & np.uint32(0xFF))
    red = ((argb >> np.uint32(16)) & np.uint32(0xFF)).astype(np.int32)
    red = (red + ((g2r * green) >> 5)) & 0xFF
    blue = (argb & np.uint32(0xFF)).astype(np.int32)
    blue = (blue + ((g2b * green) >> 5) + ((r2b * _sx8(red)) >> 5)) & 0xFF
    return (
        (argb & np.uint32(0xFF00FF00))
        | (red.astype(np.uint32) << np.uint32(16))
        | blue.astype(np.uint32)
    )


def _inv_predictor(
    argb: np.ndarray, w: int, h: int, bits: int, sub: np.ndarray, sub_w: int
) -> np.ndarray:
    """Sequential spatial-prediction inverse: each pixel is residual +
    predicted(neighbors), per channel mod 256.  The top-right neighbor
    of a right-border pixel is the first pixel of the current row (the
    contiguous-buffer addressing the spec prescribes)."""
    out = argb.astype(np.int64).tolist()
    modes = ((sub >> np.uint32(8)) & np.uint32(0xFF)).astype(np.int64).tolist()
    if any(m > 13 for m in modes):
        raise WebpError("predictor mode out of range")
    pos = 0
    for y in range(h):
        row_modes = modes[(y >> bits) * sub_w:]
        for x in range(w):
            if y == 0:
                pred = 0xFF000000 if x == 0 else out[pos - 1]
            elif x == 0:
                pred = out[pos - w]
            else:
                mode = row_modes[x >> bits]
                if mode == 1:
                    pred = out[pos - 1]
                elif mode == 2:
                    pred = out[pos - w]
                else:
                    pred = _predict(
                        mode, out[pos - 1], out[pos - w],
                        out[pos - w - 1], out[pos - w + 1],
                    )
            out[pos] = _add_px(out[pos], pred)
            pos += 1
    return np.array(out, dtype=np.uint32)


def _inv_color_index(
    argb: np.ndarray, packed_w: int, h: int, orig_w: int,
    width_bits: int, palette: np.ndarray,
) -> np.ndarray:
    greens = ((argb >> np.uint32(8)) & np.uint32(0xFF)).reshape(h, packed_w)
    if width_bits:
        bpp = 8 >> width_bits
        per = 1 << width_bits
        xs = np.arange(orig_w)
        src = greens[:, xs >> width_bits]
        shift = ((xs & (per - 1)) * bpp).astype(np.uint32)
        idx = (src >> shift[None, :]) & np.uint32((1 << bpp) - 1)
    else:
        idx = greens
    if int(idx.max()) >= len(palette):
        raise WebpError("palette index out of range")
    return palette[idx.astype(np.int64)].ravel()


def _delta_decode_palette(pal: np.ndarray) -> np.ndarray:
    """Palette entries are stored as per-channel deltas from the
    previous entry (mod 256)."""
    ch = np.stack(
        [
            (pal >> np.uint32(24)) & np.uint32(0xFF),
            (pal >> np.uint32(16)) & np.uint32(0xFF),
            (pal >> np.uint32(8)) & np.uint32(0xFF),
            pal & np.uint32(0xFF),
        ]
    ).astype(np.uint64)
    cum = np.cumsum(ch, axis=1) & 0xFF
    return (
        (cum[0] << 24) | (cum[1] << 16) | (cum[2] << 8) | cum[3]
    ).astype(np.uint32)


# ---------------------------------------------------------------- decode
def _decode_pixels_single(
    br: _Bits, w: int, h: int, codes: list, cache_bits: int
) -> np.ndarray:
    """Hot path: one prefix-code group, reservoir and table lookups
    inlined into loop locals (the same constant-factor treatment the
    JPEG/GIF entropy loops got; ~2x over the method-call loop)."""
    gc, rc, bc, ac, dc = codes
    gnb, gmask, gtab, gsingle = gc.nbits, gc.mask, gc.table, gc.single
    rnb, rmask, rtab, rsingle = rc.nbits, rc.mask, rc.table, rc.single
    bnb, bmask, btab, bsingle = bc.nbits, bc.mask, bc.table, bc.single
    anb, amask, atab, asingle = ac.nbits, ac.mask, ac.table, ac.single
    data, dn = br.data, br.n
    buf, cnt, bpos = br.buf, br.cnt, br.pos
    n = w * h
    out = [0] * n
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cshift = 32 - cache_bits if cache_bits else 0
    pos = 0
    try:
        while pos < n:
            # one gulp refill per pixel: 4 codes consume at most 60 bits,
            # so topping the reservoir up past 60 lets every decode below
            # run check-free; near stream end the zero-padded peek plus
            # the cnt < ln guard keeps over-reads a clean WebpError
            if cnt < 60:
                if bpos + 8 <= dn:
                    buf |= int.from_bytes(data[bpos:bpos + 8], "little") << cnt
                    bpos += 8
                    cnt += 64
                else:
                    while cnt < 60 and bpos < dn:
                        buf |= data[bpos] << cnt
                        bpos += 1
                        cnt += 8
            if gnb:
                e = gtab[buf & gmask]
                ln = e & 15
                if cnt < ln:
                    raise WebpError("VP8L bitstream exhausted")
                buf >>= ln
                cnt -= ln
                s = e >> 4
            else:
                s = gsingle
            if s < 256:
                if rnb:
                    e = rtab[buf & rmask]
                    ln = e & 15
                    if cnt < ln:
                        raise WebpError("VP8L bitstream exhausted")
                    buf >>= ln
                    cnt -= ln
                    r = e >> 4
                else:
                    r = rsingle
                if bnb:
                    e = btab[buf & bmask]
                    ln = e & 15
                    if cnt < ln:
                        raise WebpError("VP8L bitstream exhausted")
                    buf >>= ln
                    cnt -= ln
                    b = e >> 4
                else:
                    b = bsingle
                if anb:
                    e = atab[buf & amask]
                    ln = e & 15
                    if cnt < ln:
                        raise WebpError("VP8L bitstream exhausted")
                    buf >>= ln
                    cnt -= ln
                    a = e >> 4
                else:
                    a = asingle
                px = (a << 24) | (r << 16) | (s << 8) | b
                out[pos] = px
                if cache is not None:
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> cshift] = px
                pos += 1
            elif s < 280:
                # slow symbols: sync the reservoir and use the shared
                # helpers, then re-load locals
                br.buf, br.cnt, br.pos = buf, cnt, bpos
                length = _prefix_val(br, s - 256)
                dist = _plane_to_dist(_prefix_val(br, dc.decode(br)), w)
                buf, cnt, bpos = br.buf, br.cnt, br.pos
                if dist > pos or pos + length > n:
                    raise WebpError("backward reference out of range")
                if cache is not None:
                    for _ in range(length):
                        px = out[pos - dist]
                        out[pos] = px
                        cache[(_HASH_MUL * px & 0xFFFFFFFF) >> cshift] = px
                        pos += 1
                else:
                    for _ in range(length):
                        out[pos] = out[pos - dist]
                        pos += 1
            else:
                idx = s - 280
                if cache is None or idx >= len(cache):
                    raise WebpError("color-cache reference without/beyond cache")
                out[pos] = cache[idx]
                pos += 1
    finally:
        br.buf, br.cnt, br.pos = buf, cnt, bpos
    return np.array(out, dtype=np.uint32)


def _decode_pixels(
    br: _Bits, w: int, h: int, groups: list, meta, hb: int, mw: int,
    cache_bits: int,
) -> np.ndarray:
    if len(groups) == 1:
        return _decode_pixels_single(br, w, h, groups[0], cache_bits)
    n = w * h
    out = [0] * n
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cshift = 32 - cache_bits if cache_bits else 0
    single = False
    gc, rc, bc, ac, dc = groups[0]
    pos = 0
    x = y = 0
    while pos < n:
        if not single:
            gc, rc, bc, ac, dc = groups[meta[(y >> hb) * mw + (x >> hb)]]
        s = gc.decode(br)
        if s < 256:
            # wire order is green, red, blue, alpha (RFC 9649)
            r = rc.decode(br)
            b = bc.decode(br)
            px = (ac.decode(br) << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> cshift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 280:
            length = _prefix_val(br, s - 256)
            dist = _plane_to_dist(_prefix_val(br, dc.decode(br)), w)
            if dist > pos or pos + length > n:
                raise WebpError("backward reference out of range")
            if cache is not None:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> cshift] = px
                    pos += 1
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
            x = pos % w
            y = pos // w
        else:
            idx = s - 280
            if cache is None or idx >= len(cache):
                raise WebpError("color-cache reference without/beyond cache")
            out[pos] = cache[idx]
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return np.array(out, dtype=np.uint32)


def _decode_image_stream(
    br: _Bits, w: int, h: int, level0: bool
) -> np.ndarray:
    """One VP8L entropy-coded image (transforms + meta codes only at the
    top level).  Returns the flat uint32 ARGB array at w*h — the
    caller's original w even when color-indexing packed the coded
    width."""
    orig_w = w
    transforms = []  # (type, params, w_at_read)
    if level0:
        seen = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise WebpError("duplicate transform")
            seen.add(t)
            if t in (0, 1):  # predictor / color
                bits = br.read(3) + 2
                sub_w, sub_h = _subsample(w, bits), _subsample(h, bits)
                sub = _decode_image_stream(br, sub_w, sub_h, False)
                transforms.append((t, (bits, sub, sub_w), w))
            elif t == 2:  # subtract green
                transforms.append((2, None, w))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _delta_decode_palette(
                    _decode_image_stream(br, n_colors, 1, False)
                )
                width_bits = (
                    3 if n_colors <= 2 else 2 if n_colors <= 4
                    else 1 if n_colors <= 16 else 0
                )
                transforms.append((3, (width_bits, pal), w))
                if width_bits:
                    w = _subsample(w, width_bits)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError(f"color cache bits {cache_bits} out of range")
    meta = None
    hb = mw = 0
    n_groups = 1
    if level0 and br.read(1):
        hb = br.read(3) + 2
        mw, mh = _subsample(w, hb), _subsample(h, hb)
        meta_img = _decode_image_stream(br, mw, mh, False)
        meta = (
            ((meta_img >> np.uint32(8)) & np.uint32(0xFFFF))
            .astype(np.int64)
            .tolist()
        )
        n_groups = max(meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [
        [
            _read_code(br, 256 + 24 + cache_size),
            _read_code(br, 256),
            _read_code(br, 256),
            _read_code(br, 256),
            _read_code(br, 40),
        ]
        for _ in range(n_groups)
    ]
    argb = _decode_pixels(br, w, h, groups, meta, hb, mw, cache_bits)
    for t, params, w_read in reversed(transforms):
        if t == 3:
            width_bits, pal = params
            argb = _inv_color_index(argb, w, h, w_read, width_bits, pal)
            w = w_read
        elif t == 2:
            argb = _inv_subtract_green(argb)
        elif t == 1:
            bits, sub, sub_w = params
            argb = _inv_color_transform(argb, w, h, bits, sub, sub_w)
        else:
            bits, sub, sub_w = params
            argb = _inv_predictor(argb, w, h, bits, sub, sub_w)
    if w != orig_w:
        raise WebpError("transform width bookkeeping failed")
    return argb


def _decode_vp8l(vp8l: bytes) -> tuple[np.ndarray, int, int]:
    """One VP8L bitstream (chunk payload) -> (flat uint32 ARGB, w, h)."""
    if not vp8l or vp8l[0] != 0x2F:
        raise WebpError("bad VP8L signature byte")
    br = _Bits(vp8l, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise WebpError("unsupported VP8L version")
    if w * h > MAX_PIXELS:
        raise WebpError("WebP image too large")
    return _decode_image_stream(br, w, h, True), w, h


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload) over a RIFF chunk run, bounds-checked."""
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_end = pos + 8 + size
        if body_end > end:
            raise WebpError("WEBP chunk overruns file")
        yield tag, data[pos + 8:body_end]
        pos = body_end + (size & 1)


def _parse_container(payload: bytes) -> dict:
    """RIFF walk -> {'vp8l': bytes|None, 'canvas': (w, h)|None,
    'anim': (bg_rgba, loop)|None, 'frames': [anmf payloads]}."""
    payload = bytes(payload)
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise WebpError("not a RIFF/WEBP payload")
    out = {"vp8l": None, "canvas": None, "anim": None, "frames": []}
    for tag, body in _walk_chunks(payload, 12, len(payload)):
        if tag == b"VP8L" and out["vp8l"] is None:
            out["vp8l"] = body
        elif tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8) needs libwebp; only VP8L decodes here"
            )
        elif tag == b"VP8X":
            if len(body) < 10:
                raise WebpError("short VP8X chunk")
            cw = int.from_bytes(body[4:7], "little") + 1
            ch = int.from_bytes(body[7:10], "little") + 1
            out["canvas"] = (cw, ch)
        elif tag == b"ANIM":
            if len(body) < 6:
                raise WebpError("short ANIM chunk")
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]  # BGRA
            out["anim"] = ((r_, g_, b_, a_),
                           struct.unpack_from("<H", body, 4)[0])
        elif tag == b"ANMF":
            if len(body) < 16:
                raise WebpError("short ANMF chunk")
            out["frames"].append(body)
    return out


def decode_webp_frames(
    payload: bytes, every_k: int = 1, max_frames: int | None = None
) -> list:
    """Composited RGBA frames [(frame_no, duration_ms, (h, w, 4) uint8),
    ...] taking every k-th frame — the animation twin of
    gif.decode_gif_frames, over the VP8X/ANIM/ANMF container.  Blending
    method 0 alpha-composites the frame onto the canvas, 1 overwrites
    its rectangle; disposal 1 fills the rectangle with the ANIM
    background color afterwards (container-spec semantics; the canvas
    starts transparent black).  ``max_frames`` bounds the number of
    frames DECODED, not just returned."""
    info = _parse_container(payload)
    if not info["frames"]:
        argb, w, h = _decode_vp8l(_require_vp8l(info))
        return [(0, 0, _argb_to_rgba(argb, w, h))]
    if info["canvas"] is None:
        raise WebpError("ANMF frames without a VP8X canvas")
    cw, ch = info["canvas"]
    if cw * ch > MAX_PIXELS:
        raise WebpError("WebP canvas too large")
    bg = np.array(
        info["anim"][0] if info["anim"] else (0, 0, 0, 0), np.uint8
    )
    canvas = np.zeros((ch, cw, 4), np.uint8)  # spec: transparent black
    out = []
    for no, body in enumerate(info["frames"]):
        if max_frames is not None and no >= max_frames:
            break
        fx = int.from_bytes(body[0:3], "little") * 2
        fy = int.from_bytes(body[3:6], "little") * 2
        fw = int.from_bytes(body[6:9], "little") + 1
        fh = int.from_bytes(body[9:12], "little") + 1
        dur = int.from_bytes(body[12:15], "little")
        flags = body[15]
        if fx + fw > cw or fy + fh > ch:
            raise WebpError("ANMF frame rectangle outside canvas")
        sub = None
        for tag, sbody in _walk_chunks(body, 16, len(body)):
            if tag == b"VP8L":
                sub = sbody
                break
            if tag == b"VP8 ":
                raise NotImplementedError(
                    "lossy WebP (VP8) needs libwebp; only VP8L decodes here"
                )
        if sub is None:
            raise WebpError("ANMF frame without a VP8L bitstream")
        argb, w, h = _decode_vp8l(sub)
        if (w, h) != (fw, fh):
            raise WebpError("ANMF frame dims disagree with its bitstream")
        rgba = _argb_to_rgba(argb, w, h)
        rect = canvas[fy:fy + fh, fx:fx + fw]
        if flags & 0x02:  # do not blend: overwrite the rectangle
            rect[:] = rgba
        else:  # alpha-blend src-over (container-spec formula, int math)
            sa = rgba[..., 3:4].astype(np.uint32)
            da = rect[..., 3:4].astype(np.uint32)
            ao255 = sa * 255 + da * (255 - sa)  # = a_out * 255
            num = (rgba[..., :3] * sa * 255
                   + rect[..., :3] * da * (255 - sa))
            rect[..., :3] = np.where(
                ao255 > 0, num // np.maximum(ao255, 1), 0
            ).astype(np.uint8)
            rect[..., 3:4] = (ao255 // 255).astype(np.uint8)
        if no % every_k == 0:
            out.append((no, dur, canvas.copy()))
        if flags & 0x01:  # dispose to background color
            canvas[fy:fy + fh, fx:fx + fw] = bg
    return out


def _require_vp8l(info: dict) -> bytes:
    if info["vp8l"] is None:
        raise WebpError("no VP8L chunk in WEBP container")
    return info["vp8l"]


def _argb_to_rgba(argb: np.ndarray, w: int, h: int) -> np.ndarray:
    a2 = argb.reshape(h, w)
    return np.stack(
        [
            (a2 >> np.uint32(16)) & np.uint32(0xFF),
            (a2 >> np.uint32(8)) & np.uint32(0xFF),
            a2 & np.uint32(0xFF),
            (a2 >> np.uint32(24)) & np.uint32(0xFF),
        ],
        axis=-1,
    ).astype(np.uint8)


def decode_webp_argb(payload: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WEBP payload -> (flat uint32 ARGB, width, height) of the
    still image (or, for an animation, the composited first frame)."""
    info = _parse_container(payload)
    if info["frames"]:
        _, _, rgba = decode_webp_frames(payload, max_frames=1)[0]
        h, w = rgba.shape[:2]
        argb = (
            (rgba[..., 3].astype(np.uint32) << 24)
            | (rgba[..., 0].astype(np.uint32) << 16)
            | (rgba[..., 1].astype(np.uint32) << 8)
            | rgba[..., 2].astype(np.uint32)
        ).ravel()
        return argb, w, h
    return _decode_vp8l(_require_vp8l(info))


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP lossless payload -> (h, w, 4) RGBA uint8 (animations:
    the composited first frame, decoding only frame 0)."""
    argb, w, h = decode_webp_argb(payload)
    return _argb_to_rgba(argb, w, h)


# ---------------------------------------------------------------- encode
def _huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Frequencies -> canonical code lengths capped at max_len.  Depth
    limiting by iterative frequency halving: once all weights reach 1
    the tree depth is ceil(log2(n)) <= 9 for every VP8L alphabet, so the
    loop terminates well inside the cap."""
    lengths = [0] * len(freqs)
    used = [s for s, f in enumerate(freqs) if f > 0]
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    f = {s: freqs[s] for s in used}
    while True:
        heap = [(f[s], s, (s,)) for s in sorted(f)]
        heapq.heapify(heap)
        depth = dict.fromkeys(f, 0)
        while len(heap) > 1:
            fa, ta, sa = heapq.heappop(heap)
            fb, tb, sb = heapq.heappop(heap)
            for s in sa + sb:
                depth[s] += 1
            heapq.heappush(heap, (fa + fb, min(ta, tb), sa + sb))
        if max(depth.values()) <= max_len:
            for s, d in depth.items():
                lengths[s] = d
            return lengths
        f = {s: (v + 1) // 2 for s, v in f.items()}


def _canon_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Code lengths -> {symbol: (bit-reversed code, length)} for the
    LSB-first writer; single-symbol codes cost zero bits."""
    nz = sorted((ln, s) for s, ln in enumerate(lengths) if ln)
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}
    out = {}
    code = 0
    prev = nz[0][0]
    for ln, s in nz:
        code <<= ln - prev
        prev = ln
        out[s] = (_revbits(code, ln), ln)
        code += 1
    return out


def _write_code(bw: _BitWriter, lengths: list[int]) -> dict:
    """Emit one prefix-code description; returns the writer codebook."""
    nz = [s for s, ln in enumerate(lengths) if ln]
    if 1 <= len(nz) <= 2 and all(s <= 255 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        s0 = nz[0]
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return _canon_codes(lengths)
    bw.write(0, 1)  # code-length-coded
    last_nz = max(nz)
    syms: list[tuple[int, int, int]] = []  # (clc symbol, extra val, extra bits)
    i = 0
    while i <= last_nz:
        ln = lengths[i]
        if ln == 0:
            run = 1
            while i + run <= last_nz and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                k = min(run, 138)
                syms.append((18, k - 11, 7))
                run -= k
            while run >= 3:
                k = min(run, 10)
                syms.append((17, k - 3, 3))
                run -= k
            syms.extend((0, 0, 0) for _ in range(run))
        else:
            syms.append((ln, 0, 0))
            run = 0
            while i + 1 + run <= last_nz and lengths[i + 1 + run] == ln:
                run += 1
            i += 1 + run
            while run >= 3:
                k = min(run, 6)
                syms.append((16, k - 3, 2))
                run -= k
            syms.extend((ln, 0, 0) for _ in range(run))
    while len(syms) < 2:  # max_symbol field stores count-2
        syms.append((0, 0, 0))
    clc_freq = [0] * 19
    for s, _, _ in syms:
        clc_freq[s] += 1
    clc_len = _huffman_lengths(clc_freq, 7)
    num_codes = max(
        4,
        1 + max(i for i, o in enumerate(_CLC_ORDER) if clc_len[o]),
    )
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(clc_len[_CLC_ORDER[i]], 3)
    # bound the symbol count (also exercises that decoder branch)
    bw.write(1, 1)
    nbits = 2
    while (len(syms) - 2) >> nbits:
        nbits += 2
    bw.write((nbits - 2) // 2, 3)
    bw.write(len(syms) - 2, nbits)
    clc_codes = _canon_codes(clc_len)
    for s, extra, ebits in syms:
        bw.write(*clc_codes[s])
        if ebits:
            bw.write(extra, ebits)
    return _canon_codes(lengths)


def _tokenize(
    px: list[int], w: int, use_lz77: bool, cache_bits: int
) -> list[tuple]:
    """Pixel stream -> (kind, ...) tokens mirroring the decoder's cache
    update discipline exactly: literals and backref-copied pixels insert
    into the cache; cache hits do not."""
    tokens = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cshift = 32 - cache_bits if cache_bits else 0
    n = len(px)
    i = 0
    while i < n:
        v = px[i]
        if use_lz77 and i > 0 and v == px[i - 1]:
            run = 1
            while i + run < n and run < 4096 and px[i + run] == v:
                run += 1
            if run >= 3:
                tokens.append(("R", run, 1))
                if cache is not None:
                    cache[(_HASH_MUL * v & 0xFFFFFFFF) >> cshift] = v
                i += run
                continue
        if cache is not None:
            hidx = (_HASH_MUL * v & 0xFFFFFFFF) >> cshift
            if cache[hidx] == v:
                tokens.append(("C", hidx))
                i += 1
                continue
            cache[hidx] = v
        tokens.append(("L", v))
        i += 1
    return tokens


def _write_entropy_image(
    bw: _BitWriter, px: list[int], w: int, h: int, level0: bool,
    use_lz77: bool = False, cache_bits: int = 0, use_meta: bool = False,
) -> None:
    """One entropy-coded image body: color-cache field, meta-code field
    (top level only), the five prefix codes, then the token stream."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        if use_meta:
            bw.write(1, 1)
            hb = 9  # largest blocks: a tiny all-zero entropy image
            bw.write(hb - 2, 3)
            mw, mh = _subsample(w, hb), _subsample(h, hb)
            _write_entropy_image(bw, [0xFF000000] * (mw * mh), mw, mh, False)
        else:
            bw.write(0, 1)
    tokens = _tokenize(px, w, use_lz77, cache_bits)
    cache_size = (1 << cache_bits) if cache_bits else 0
    hists = [
        [0] * (256 + 24 + cache_size), [0] * 256, [0] * 256, [0] * 256,
        [0] * 40,
    ]
    for tok in tokens:
        if tok[0] == "L":
            v = tok[1]
            hists[0][(v >> 8) & 0xFF] += 1
            hists[1][(v >> 16) & 0xFF] += 1
            hists[2][v & 0xFF] += 1
            hists[3][v >> 24] += 1
        elif tok[0] == "R":
            hists[0][256 + _prefix_sym(tok[1])[0]] += 1
            hists[4][_prefix_sym(_dist_to_code(tok[2], w))[0]] += 1
        else:
            hists[0][280 + tok[1]] += 1
    books = []
    for hist in hists:
        if not any(hist):
            hist[0] = 1  # never-read code must still be present and valid
        books.append(_write_code(bw, _huffman_lengths(hist, 15)))
    green, red, blue, alpha, dist = books
    for tok in tokens:
        if tok[0] == "L":
            v = tok[1]
            bw.write(*green[(v >> 8) & 0xFF])
            bw.write(*red[(v >> 16) & 0xFF])
            bw.write(*blue[v & 0xFF])
            bw.write(*alpha[v >> 24])
        elif tok[0] == "R":
            sym, ebits, extra = _prefix_sym(tok[1])
            bw.write(*green[256 + sym])
            if ebits:
                bw.write(extra, ebits)
            sym, ebits, extra = _prefix_sym(_dist_to_code(tok[2], w))
            bw.write(*dist[sym])
            if ebits:
                bw.write(extra, ebits)
        else:
            bw.write(*green[280 + tok[1]])


def _to_argb(img: np.ndarray) -> tuple[np.ndarray, int, int, bool]:
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("encode_webp wants (h,w), (h,w,3) or (h,w,4)")
    h, w = img.shape[:2]
    img = img.astype(np.uint32)
    alpha = img[..., 3] if img.shape[2] == 4 else np.full((h, w), 255, np.uint32)
    argb = (
        (alpha << np.uint32(24)) | (img[..., 0] << np.uint32(16))
        | (img[..., 1] << np.uint32(8)) | img[..., 2]
    ).ravel()
    return argb, w, h, bool((alpha != 255).any())


def _fwd_predictor(px: list[int], w: int, h: int, mode: int) -> list[int]:
    """Residuals for a uniform predictor mode, using original pixels as
    neighbor context (the decoder reconstructs them progressively)."""
    out = [0] * len(px)
    pos = 0
    for y in range(h):
        for x in range(w):
            if y == 0:
                pred = 0xFF000000 if x == 0 else px[pos - 1]
            elif x == 0:
                pred = px[pos - w]
            else:
                pred = _predict(
                    mode, px[pos - 1], px[pos - w],
                    px[pos - w - 1], px[pos - w + 1],
                )
            out[pos] = _sub_px(px[pos], pred)
            pos += 1
    return out


def encode_webp(
    img: np.ndarray,
    *,
    subtract_green: bool = True,
    predictor: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool | str = "auto",
    use_lz77: bool = True,
    cache_bits: int = 0,
    use_meta: bool = False,
) -> bytes:
    """Image -> RIFF/WEBP with a real VP8L lossless stream.

    ``palette`` (True / "auto" with <= 256 distinct colors) takes the
    color-indexing path, including sub-byte packing for small palettes;
    otherwise the literal path runs with optional uniform-mode predictor
    blocks, a uniform color transform, subtract-green, dist-1-run LZ77,
    a color cache, and/or a trivial meta-code group — each a distinct
    decoder path, all byte-exact on round-trip."""
    argb, w, h, alpha_used = _to_argb(img)
    if w > 16384 or h > 16384:
        raise ValueError("image too large for WebP (16384 max per side)")
    if not 0 <= cache_bits <= 11:
        raise ValueError("cache_bits out of range")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)  # version
    colors = np.unique(argb)
    if palette is True or (palette == "auto" and len(colors) <= 256):
        if len(colors) > 256:
            raise ValueError("palette requested but > 256 distinct colors")
        n = len(colors)
        lut = {int(c): i for i, c in enumerate(colors)}
        idx = np.array([lut[int(v)] for v in argb], np.uint32).reshape(h, w)
        bw.write(1, 1)
        bw.write(3, 2)  # color-indexing transform
        bw.write(n - 1, 8)
        deltas = [int(colors[0])] + [
            _sub_px(int(colors[i]), int(colors[i - 1])) for i in range(1, n)
        ]
        _write_entropy_image(bw, deltas, n, 1, False)
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if width_bits:
            per = 1 << width_bits
            bpp = 8 >> width_bits
            pw = _subsample(w, width_bits)
            packed = np.zeros((h, pw), np.uint32)
            for k in range(per):
                cols = idx[:, k::per]
                packed[:, : cols.shape[1]] |= cols << np.uint32(k * bpp)
            spatial = (packed << np.uint32(8)).ravel().tolist()
            w_coded = pw
        else:
            spatial = (idx << np.uint32(8)).ravel().tolist()
            w_coded = w
        bw.write(0, 1)  # end of transforms
        _write_entropy_image(
            bw, spatial, w_coded, h, True,
            use_lz77=use_lz77, cache_bits=cache_bits, use_meta=use_meta,
        )
    else:
        px = argb.tolist()
        if predictor is not None:
            if not 0 <= predictor <= 13:
                raise ValueError("predictor mode out of range")
            bw.write(1, 1)
            bw.write(0, 2)
            bits = 9  # largest blocks; the mode image stays tiny
            bw.write(bits - 2, 3)
            mw, mh = _subsample(w, bits), _subsample(h, bits)
            _write_entropy_image(
                bw, [0xFF000000 | (predictor << 8)] * (mw * mh), mw, mh, False
            )
            px = _fwd_predictor(px, w, h, predictor)
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            bw.write(1, 1)
            bw.write(1, 2)
            bits = 9
            bw.write(bits - 2, 3)
            mw, mh = _subsample(w, bits), _subsample(h, bits)
            cpx = (
                0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8)
                | (g2r & 0xFF)
            )
            _write_entropy_image(bw, [cpx] * (mw * mh), mw, mh, False)
            a = np.array(px, np.uint32)
            green = _sx8((a >> np.uint32(8)) & np.uint32(0xFF))
            red0 = ((a >> np.uint32(16)) & np.uint32(0xFF)).astype(np.int32)
            red = (red0 - ((np.int32(_s8(g2r)) * green) >> 5)) & 0xFF
            blue = (a & np.uint32(0xFF)).astype(np.int32)
            blue = (
                blue - ((np.int32(_s8(g2b)) * green) >> 5)
                - ((np.int32(_s8(r2b)) * _sx8(red0)) >> 5)
            ) & 0xFF
            px = (
                (a & np.uint32(0xFF00FF00))
                | (red.astype(np.uint32) << np.uint32(16))
                | blue.astype(np.uint32)
            ).tolist()
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            a = np.array(px, np.uint32)
            g = (a >> np.uint32(8)) & np.uint32(0xFF)
            r = (((a >> np.uint32(16)) & np.uint32(0xFF)) - g) & np.uint32(0xFF)
            b = ((a & np.uint32(0xFF)) - g) & np.uint32(0xFF)
            px = ((a & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b).tolist()
        bw.write(0, 1)  # end of transforms
        _write_entropy_image(
            bw, px, w, h, True,
            use_lz77=use_lz77, cache_bits=cache_bits, use_meta=use_meta,
        )
    vp8l = bytes([0x2F]) + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _s8(v: int) -> int:
    """Clamp an int to signed-8 semantics (encoder-side multipliers)."""
    return ((v & 0xFF) ^ 0x80) - 0x80


def _vp8l_chunk(img: np.ndarray, **enc_opts) -> bytes:
    """Encode one frame and return its VP8L chunk (fourcc+size+pad)."""
    still = encode_webp(img, **enc_opts)
    info = _parse_container(still)
    vp8l = info["vp8l"]
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return chunk


def encode_webp_frames(
    frames: list,
    duration_ms: int = 100,
    *,
    offsets: list | None = None,
    canvas: tuple[int, int] | None = None,
    blend: list | None = None,
    dispose: list | None = None,
    background: tuple[int, int, int, int] = (0, 0, 0, 0),
    loop: int = 0,
    **enc_opts,
) -> bytes:
    """Frame list -> animated WebP (VP8X + ANIM + one ANMF per frame,
    each carrying a real VP8L bitstream) — the animation twin of
    gif.encode_gif_frames.  ``offsets`` places each frame's rectangle
    (x, y must be even; default full-canvas at origin); ``blend``/
    ``dispose`` are per-frame booleans (alpha-blend vs overwrite,
    dispose-to-background vs none).  A single frame with no explicit
    canvas falls back to a plain still VP8L file."""
    if not frames:
        raise ValueError("need at least one frame")
    if not 0 <= int(duration_ms) < 1 << 24:
        raise ValueError("duration_ms out of uint24 range")
    if not 0 <= loop <= 0xFFFF:
        raise ValueError("loop count out of uint16 range")
    for name, lst in (("offsets", offsets), ("blend", blend),
                      ("dispose", dispose)):
        if lst is not None and len(lst) != len(frames):
            raise ValueError(f"{name} must have one entry per frame")
    norm = [np.asarray(f) for f in frames]
    dims = [(f.shape[1], f.shape[0]) for f in norm]
    offsets = offsets or [(0, 0)] * len(norm)
    if canvas is None:
        canvas = (
            max(x + w for (x, _), (w, _) in zip(offsets, dims)),
            max(y + h for (_, y), (_, h) in zip(offsets, dims)),
        )
    cw, ch = canvas
    if len(norm) == 1 and offsets == [(0, 0)] and dims[0] == (cw, ch):
        return encode_webp(norm[0], **enc_opts)
    if cw > 16384 or ch > 16384:
        raise ValueError("canvas too large for WebP")
    chunks = []
    for i, (img, (fx, fy), (fw, fh)) in enumerate(zip(norm, offsets, dims)):
        if fx % 2 or fy % 2:
            raise ValueError("ANMF frame offsets must be even")
        if fx + fw > cw or fy + fh > ch:
            raise ValueError("frame rectangle outside canvas")
        flags = 0
        if blend is not None and not blend[i]:
            flags |= 0x02  # do not blend
        if dispose is not None and dispose[i]:
            flags |= 0x01  # dispose to background
        body = (
            (fx // 2).to_bytes(3, "little")
            + (fy // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(duration_ms).to_bytes(3, "little")
            + bytes([flags])
            + _vp8l_chunk(img, **enc_opts)
        )
        anmf = b"ANMF" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            anmf += b"\x00"
        chunks.append(anmf)
    r, g, b, a = background
    anim = b"ANIM" + struct.pack("<I", 6) + bytes([b, g, r, a]) + struct.pack(
        "<H", loop
    )
    vp8x_body = (
        bytes([0x02]) + b"\x00\x00\x00"  # animation flag
        + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    )
    vp8x = b"VP8X" + struct.pack("<I", 10) + vp8x_body
    payload = vp8x + anim + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload
