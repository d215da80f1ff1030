"""FLAC codec: CRC pins, exact roundtrips, and hand-assembled frames
for the decoder paths the encoder never emits (LPC subframes, stereo
decorrelation, multi-partition and escaped Rice residuals)."""

import struct

import numpy as np
import pytest

from texrex_spark.operators.flac import (
    FlacError,
    _BitWriter,
    _Bits,
    _crc8,
    _crc16,
    _read_coded_number,
    _write_coded_number,
    _zigzag_encode,
    decode_flac,
    encode_flac,
)


def _rng(seed=6):
    return np.random.default_rng(seed)


# ---------------------------------------------------------- spec pins
def test_crc_pins():
    """Known check values: CRC-8/0x07('123456789') = 0xF4 and
    CRC-16/0x8005 msb-first ('BUYPASS') = 0xFEE8."""
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_coded_number_roundtrip():
    for v in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10FFFF,
              2 ** 30, 2 ** 35]:
        bw = _BitWriter()
        _write_coded_number(bw, v)
        bw.align()
        assert _read_coded_number(_Bits(bw.getvalue())) == v


# ---------------------------------------------------------- roundtrips
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_roundtrip_noise(seed):
    rng = _rng(seed)
    mono = rng.integers(-32768, 32767, 5000).astype(np.int16)
    stereo = rng.integers(-32768, 32767, (7000, 2)).astype(np.int16)
    for s in (mono, stereo):
        out, rate = decode_flac(encode_flac(s, 44100))
        want = s[:, None] if s.ndim == 1 else s
        assert rate == 44100 and (out == want).all()


def test_roundtrip_compresses_smooth_audio():
    s = (3000 * np.sin(np.linspace(0, 100, 9000))).astype(np.int16)
    p = encode_flac(s, 8000)
    out, _ = decode_flac(p)
    assert (out[:, 0] == s).all()
    assert len(p) < s.size * 2 // 4  # fixed predictor + Rice really helps


def test_roundtrip_constant_and_short():
    out, _ = decode_flac(encode_flac(np.full(500, 1234, np.int16), 8000))
    assert (out == 1234).all()
    out, _ = decode_flac(encode_flac(np.zeros((1, 2), np.int16), 8000))
    assert out.shape == (1, 2)


def test_multi_frame_stream():
    s = _rng(4).integers(-100, 100, 10000, dtype=np.int16)
    out, _ = decode_flac(encode_flac(s, 16000, block=1024))
    assert (out[:, 0] == s).all()


# ------------------------------------------- hand-assembled decoder paths
def _hand_frame(channels_code: int, blocksize: int, total: int,
                write_subframes) -> bytes:
    """Build a full single-frame FLAC file; write_subframes(bw) emits
    the subframe bits."""
    hdr = _BitWriter()
    hdr.write(0x3FFE, 14)
    hdr.write(0, 2)
    hdr.write(7, 4)  # 16-bit explicit block size
    hdr.write(0, 4)
    hdr.write(channels_code, 4)
    hdr.write(4, 3)  # 16-bit
    hdr.write(0, 1)
    _write_coded_number(hdr, 0)
    hdr.write(blocksize - 1, 16)
    hdr.align()
    hbytes = hdr.getvalue()
    bw = _BitWriter()
    write_subframes(bw)
    bw.align()
    frame = hbytes + bytes([_crc8(hbytes)]) + bw.getvalue()
    frame += struct.pack(">H", _crc16(frame))
    nch = 2 if channels_code in (1, 8, 9, 10) else 1
    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(nch - 1, 3)
    si.write(15, 5)
    si.write(total, 36)
    body = si.getvalue() + b"\x00" * 16
    return (b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
            + frame)


def _constant(bw, value, bits=16):
    bw.write(0, 1)
    bw.write(0, 6)
    bw.write(0, 1)
    bw.write(value & ((1 << bits) - 1), bits)


def test_lpc_subframe():
    """Order-2 LPC with coefficients (2, -1) and shift 0 — numerically
    the fixed order-2 predictor, but through the LPC decode path
    (precision/shift/coeff fields)."""
    x = [100, 103, 106, 109, 112, 115, 118, 121]  # perfectly linear

    def sub(bw):
        bw.write(0, 1)
        bw.write(32 + 1, 6)  # LPC, order 2 (type = 31 + order)
        bw.write(0, 1)
        for v in x[:2]:
            bw.write(v, 16)
        bw.write(14, 4)  # precision 15 bits
        bw.write(0, 5)  # shift 0
        bw.write(2, 15)  # coeff a1 = 2
        bw.write((-1) & 0x7FFF, 15)  # coeff a2 = -1
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # one partition
        bw.write(0, 4)  # param 0: residuals all zero -> unary 1-bits
        for _ in range(6):
            bw.write(1, 1)  # zigzag(0) quotient 0

    out, rate = decode_flac(_hand_frame(0, 8, 8, sub))
    assert out[:, 0].tolist() == x


def test_left_side_and_mid_side():
    """Constant stereo frame (L=1000, R=600) through all three
    decorrelation modes; the side channel carries 17 bits."""
    L, R = 1000, 600
    side, mid = L - R, (L + R) >> 1

    def ls(bw):  # left/side (code 8)
        _constant(bw, L, 16)
        _constant(bw, side, 17)

    def rs(bw):  # right/side (code 9)
        _constant(bw, side, 17)
        _constant(bw, R, 16)

    def ms(bw):  # mid/side (code 10)
        _constant(bw, mid, 16)
        _constant(bw, side, 17)

    for code, fn in ((8, ls), (9, rs), (10, ms)):
        out, _ = decode_flac(_hand_frame(code, 4, 4, fn))
        assert out.tolist() == [[L, R]] * 4, code


def test_multi_partition_and_escaped_residual():
    """Fixed order-0 subframe, partition order 1: first partition Rice
    param 0 (zeros), second partition the 5-bit raw escape."""
    def sub(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # fixed order 0
        bw.write(0, 1)
        bw.write(0, 2)  # method 0 (4-bit params, escape 15)
        bw.write(1, 4)  # partition order 1 -> two partitions of 4
        bw.write(0, 4)
        for _ in range(4):
            bw.write(1, 1)  # zigzag(0)
        bw.write(15, 4)  # escape
        bw.write(7, 5)  # raw 7-bit residuals
        for v in (5, -5, 63, -64):
            bw.write(v & 0x7F, 7)

    out, _ = decode_flac(_hand_frame(0, 8, 8, sub))
    assert out[:, 0].tolist() == [0, 0, 0, 0, 5, -5, 63, -64]


def test_wasted_bits():
    """A verbatim subframe with 2 wasted bits: samples shift left."""
    def sub(bw):
        bw.write(0, 1)
        bw.write(1, 6)  # verbatim
        bw.write(1, 1)  # wasted-bits flag
        bw.write(1, 2)  # unary 1 -> k = 2 wasted bits
        for v in (1, -1, 100, -100):
            bw.write(v & 0x3FFF, 14)  # 16 - 2 effective bits

    out, _ = decode_flac(_hand_frame(0, 4, 4, sub))
    assert out[:, 0].tolist() == [4, -4, 400, -400]


# ------------------------------------------------------------- hardening
def test_crc_mismatch_rejected():
    p = bytearray(encode_flac(_rng(7).integers(-99, 99, 600, dtype=np.int16),
                              8000))
    p[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(FlacError, match="CRC"):
        decode_flac(bytes(p))


def test_malformed_rejected():
    with pytest.raises(FlacError):
        decode_flac(b"fLaX" + b"\x00" * 60)
    payload = encode_flac(_rng(8).integers(-99, 99, 600, dtype=np.int16), 8000)
    for cut in range(0, len(payload), max(len(payload) // 50, 1)):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_flac(payload[:cut])


def test_sample_cap():
    """A STREAMINFO claiming 2^36-1 samples dies on the cap before any
    frame decode."""
    p = bytearray(encode_flac(np.zeros(10, np.int16), 8000))
    # total_samples is the last 36 bits of the 34-byte STREAMINFO body
    # (bytes 8..17 hold rate/channels/depth/total); set them to all-ones
    p[21] |= 0x0F
    p[22:26] = b"\xff\xff\xff\xff"
    with pytest.raises(FlacError, match="too large"):
        decode_flac(bytes(p))


def test_encoder_contract():
    with pytest.raises(ValueError):
        encode_flac(np.zeros(10, np.float64), 8000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros((10, 3), np.int16), 8000)
    with pytest.raises(ValueError):
        encode_flac(np.zeros(10, np.int16), 0)
