"""Pure-stdlib FLAC codec (16-bit PCM, the web's lossless audio tier).

Everything derives from the public FLAC format specification (RFC
9639): the fLaC metadata-block framing, STREAMINFO, frame headers with
the UTF-8-style coded frame number and CRC-8, constant / verbatim /
fixed-predictor / LPC subframes with wasted bits, Rice-coded residual
partitions (both 4- and 5-bit parameter methods, incl. the raw-bits
escape), the four stereo decorrelation modes, and the CRC-16 frame
footer.  Like the image codecs this is brief-relative multimodal scope
(the reference corpus tool has no media) and there are no codec
libraries in this container, so the encoder is the fixture source and
the decoder is the crawl-facing parser.

Supported decode: 16-bit mono/stereo, all subframe types (LPC up to
order 32), all channel assignments (independent, left/side, right/side,
mid/side), all block-size/sample-rate header codes.  The encoder writes
16-bit streams with per-channel fixed predictors (order 0-2 chosen by
residual cost) and single-partition Rice residuals — simple but fully
conformant, and byte-level round-trippable against the decoder.

Untrusted-payload posture mirrors the other codecs: sample counts are
capped before allocation, every bit read is bounds-checked, CRC
mismatches and malformed structure raise ``FlacError`` (a
``ValueError``) — pinned by test_codec_fuzz.
"""

from __future__ import annotations

import struct

import numpy as np


class FlacError(ValueError):
    pass


MAX_SAMPLES = 100_000_000  # ~35 min of stereo 48 kHz; far past any fixture

_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608, 8: 256, 9: 512, 10: 1024,
    11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_DEPTH_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _make_crc_tables():
    t8, t16 = [], []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t8.append(c)
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t16.append(c)
    return t8, t16


_CRC8_TAB, _CRC16_TAB = _make_crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8+x^2+x+1 (0x07), init 0 (table-driven:
    CRCs run over every frame byte, so the per-bit loop was a third of
    decode time)."""
    crc = 0
    tab = _CRC8_TAB
    for b in data:
        crc = tab[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16+x^15+x^2+1 (0x8005), init 0."""
    crc = 0
    tab = _CRC16_TAB
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tab[(crc >> 8) ^ b]
    return crc


class _Bits:
    """MSB-first bit reader (FLAC packs big-endian); bounds-checked."""

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
                raise FlacError("FLAC bitstream exhausted")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.cnt += 8
        v = (self.buf >> (self.cnt - nbits)) & ((1 << nbits) - 1)
        self.cnt -= nbits
        self.buf &= (1 << self.cnt) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def unary(self, cap: int = 1 << 20) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > cap:
                raise FlacError("runaway unary code")
        return q

    def align(self) -> None:
        self.cnt -= self.cnt % 8
        self.buf &= (1 << self.cnt) - 1

    def byte_pos(self) -> int:
        return self.pos - self.cnt // 8


class _BitWriter:
    __slots__ = ("out", "acc", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.cnt += nbits
        while self.cnt >= 8:
            self.out.append((self.acc >> (self.cnt - 8)) & 0xFF)
            self.cnt -= 8
            self.acc &= (1 << self.cnt) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.cnt:
            self.write(0, 8 - self.cnt)

    def getvalue(self) -> bytes:
        assert self.cnt == 0
        return bytes(self.out)


def _read_coded_number(br: _Bits) -> int:
    """The UTF-8-style variable-length frame/sample number."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise FlacError("bad coded frame number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("bad coded-number continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # UTF-8-style: n total bytes carry (7 - n) + 6*(n - 1) payload bits
    for n in range(2, 8):
        if v < (1 << ((7 - n) + 6 * (n - 1))):
            break
    else:
        raise ValueError("coded number out of range")
    bw.write(((0xFF00 >> n) & 0xFF) | (v >> (6 * (n - 1))), 8)
    for k in range(n - 2, -1, -1):
        bw.write(0x80 | ((v >> (6 * k)) & 0x3F), 8)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if blocksize % n_part:
        raise FlacError("partition order does not divide block size")
    out = []
    for p in range(n_part):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("first partition shorter than predictor order")
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw) if raw else 0)
            continue
        # Rice hot loop, reservoir inlined (the per-bit unary read was
        # the decode bottleneck): leading zeros come from bit_length in
        # O(1) instead of one read(1) call per quotient bit
        data, dn = br.data, br.n
        buf, cnt, pos = br.buf, br.cnt, br.pos
        try:
            for _ in range(n):
                q = 0
                while buf == 0:
                    q += cnt
                    if pos >= dn:
                        raise FlacError("FLAC bitstream exhausted")
                    if q > 1 << 20:
                        raise FlacError("runaway unary code")
                    buf = data[pos]
                    pos += 1
                    cnt = 8
                top = buf.bit_length()
                q += cnt - top
                cnt = top - 1
                buf ^= 1 << cnt  # consume the terminating 1 bit
                while cnt < param:
                    if pos >= dn:
                        raise FlacError("FLAC bitstream exhausted")
                    buf = (buf << 8) | data[pos]
                    pos += 1
                    cnt += 8
                if param:
                    cnt -= param
                    v = (q << param) | (buf >> cnt)
                    buf &= (1 << cnt) - 1
                else:
                    v = q
                out.append((v >> 1) ^ -(v & 1))
        finally:
            br.buf, br.cnt, br.pos = buf, cnt, pos
    return out


def _predict(warmup: list[int], coeffs: list[int], shift: int,
             residual: list[int]) -> list[int]:
    data = list(warmup)
    order = len(coeffs)
    for r in residual:
        acc = 0
        for j, c in enumerate(coeffs):
            acc += c * data[-1 - j]
        data.append(r + (acc >> shift))
    return data


def _read_subframe(br: _Bits, blocksize: int, depth: int) -> list[int]:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = depth - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample depth")
    if t == 0:  # constant
        samples = [br.read_signed(eff)] * blocksize
    elif t == 1:  # verbatim
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # fixed predictor
        order = t - 8
        if order > blocksize:
            raise FlacError("predictor order exceeds block size")
        warmup = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        samples = _predict(warmup, _FIXED_COEFFS[order], 0, res)
    elif t >= 32:  # LPC
        order = t - 31
        if order > blocksize:
            raise FlacError("LPC order exceeds block size")
        warmup = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coeffs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        samples = _predict(warmup, coeffs, shift, res)
    else:
        raise FlacError(f"reserved subframe type {t}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC payload -> ((n_samples, channels) int16 array, sample_rate)
    — the same shape contract as multimodal.decode_wav."""
    payload = bytes(payload)
    if payload[:4] != b"fLaC":
        raise FlacError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise FlacError("metadata blocks overrun file")
        hdr = payload[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        if pos + 4 + blen > len(payload):
            raise FlacError("metadata block overruns file")
        if btype == 0:
            if blen < 34:
                raise FlacError("short STREAMINFO")
            br = _Bits(body)
            br.read(80)  # min/max block size (16+16) + frame size (24+24)
            rate = br.read(20)
            channels = br.read(3) + 1
            depth = br.read(5) + 1
            total = br.read(36)
            info = (rate, channels, depth, total)
        pos += 4 + blen
        if hdr & 0x80:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    rate, channels, depth, total = info
    if depth != 16:
        raise NotImplementedError(f"{depth}-bit FLAC (16-bit tier only)")
    if channels > 2:
        raise NotImplementedError("more than 2 FLAC channels")
    if not 1 <= rate <= 655350:
        raise FlacError("sample rate out of range")
    if total * channels > MAX_SAMPLES:
        raise FlacError("FLAC stream too large")
    out: list[list[int]] = []
    n_done = 0
    while pos < len(payload) and (total == 0 or n_done < total):
        br = _Bits(payload, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError("bad frame sync code")
        if br.read(1):
            raise FlacError("reserved frame-header bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        depth_code = br.read(3)
        if br.read(1):
            raise FlacError("reserved frame-header bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise FlacError("reserved block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code == 15:
            raise FlacError("invalid sample rate code")
        hdr_end = br.byte_pos()
        if _crc8(payload[pos:hdr_end]) != br.read(8):
            raise FlacError("frame header CRC-8 mismatch")
        if depth_code and _DEPTH_CODE.get(depth_code) != depth:
            raise FlacError("frame sample depth disagrees with STREAMINFO")
        if n_done + blocksize > MAX_SAMPLES:
            raise FlacError("FLAC frames overrun sample cap")
        if chan_code < 8:
            if chan_code + 1 != channels:
                raise FlacError("frame channel count disagrees")
            chans = [_read_subframe(br, blocksize, depth)
                     for _ in range(channels)]
        elif chan_code in (8, 9, 10):
            if channels != 2:
                raise FlacError("stereo decorrelation in a mono stream")
            # the side channel carries one extra bit
            if chan_code == 8:  # left/side
                left = _read_subframe(br, blocksize, depth)
                side = _read_subframe(br, blocksize, depth + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif chan_code == 9:  # right/side
                side = _read_subframe(br, blocksize, depth + 1)
                right = _read_subframe(br, blocksize, depth)
                chans = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _read_subframe(br, blocksize, depth)
                side = _read_subframe(br, blocksize, depth + 1)
                chans = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    chans[0].append((m + s) >> 1)
                    chans[1].append((m - s) >> 1)
        else:
            raise FlacError("reserved channel assignment")
        br.align()
        foot_end = br.byte_pos()
        crc = struct.unpack_from(">H", payload, foot_end)[0] \
            if foot_end + 2 <= len(payload) else None
        if crc is None or _crc16(payload[pos:foot_end]) != crc:
            raise FlacError("frame CRC-16 mismatch")
        pos = foot_end + 2
        out.append(chans)
        n_done += blocksize
    if total and n_done < total:
        raise FlacError("FLAC stream ended before STREAMINFO total")
    samples = np.concatenate(
        [np.array(chans, np.int64).T for chans in out]
    ) if out else np.zeros((0, channels), np.int64)
    if total:
        samples = samples[:total]
    if samples.size and (samples.max() > 32767 or samples.min() < -32768):
        raise FlacError("decoded samples exceed 16-bit range")
    return samples.astype(np.int16), rate


# --------------------------------------------------------------- encode
def _write_residual(bw: _BitWriter, res: list[int]) -> None:
    """Single-partition Rice residual with a per-frame parameter."""
    zz = [_zigzag_encode(int(r)) for r in res]
    mean = (sum(zz) // max(len(zz), 1)) + 1
    param = min(max(mean.bit_length() - 1, 0), 14)
    bw.write(0, 2)  # 4-bit Rice method
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for v in zz:
        bw.unary(v >> param)
        if param:
            bw.write(v & ((1 << param) - 1), param)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def encode_flac(samples: np.ndarray, rate: int, block: int = 4096) -> bytes:
    """(n, channels) or (n,) int16 -> FLAC bytes.  Per channel and
    frame, the cheapest of fixed predictor orders 0-2 (by absolute
    residual sum), constant subframes for flat blocks, Rice residuals."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    if x.ndim != 2 or x.shape[1] not in (1, 2):
        raise ValueError("encode_flac wants (n,) mono or (n, 1|2)")
    if x.dtype != np.int16:
        raise ValueError("encode_flac wants int16 samples")
    if not 1 <= rate <= 655350:
        raise ValueError("sample rate out of range")
    n, channels = x.shape
    if n * channels > MAX_SAMPLES:
        raise ValueError("too many samples")
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(15, 5)  # 16-bit
    si.write(n, 36)
    body = si.getvalue() + b"\x00" * 16  # MD5 unset (spec-legal)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    frame_no = 0
    for start in range(0, max(n, 1), block):
        blk = x[start:start + block]
        bs = len(blk)
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed block size
        bw.write(7, 4)  # 16-bit explicit block size follows
        bw.write(0, 4)  # rate from STREAMINFO
        bw.write(channels - 1, 4)
        bw.write(4, 3)  # 16-bit
        bw.write(0, 1)
        _write_coded_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.align()
        hdr = bw.getvalue()
        bw2 = _BitWriter()
        for c in range(channels):
            col = blk[:, c].astype(np.int64)
            bw2.write(0, 1)
            if bs > 1 and (col == col[0]).all():
                bw2.write(0, 6)  # constant
                bw2.write(0, 1)
                bw2.write(int(col[0]), 16)
                continue
            best, best_cost = 0, None
            for order in range(min(3, bs)):
                cost = int(np.abs(_fixed_residual(col, order)).sum())
                if best_cost is None or cost < best_cost:
                    best, best_cost = order, cost
            bw2.write(8 + best, 6)
            bw2.write(0, 1)  # no wasted bits
            for v in col[:best]:
                bw2.write(int(v), 16)
            _write_residual(bw2, _fixed_residual(col, best).tolist())
        bw2.align()
        frame = hdr + bw2.getvalue()
        # header CRC-8 sits between header and subframes: rebuild
        frame = hdr + bytes([_crc8(hdr)]) + bw2.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)
