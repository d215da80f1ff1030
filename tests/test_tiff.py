"""TIFF 6.0 codec: spec pins + exact roundtrips.

The TIFF-LZW hand vector and the hand-assembled big-endian / palette /
WhiteIsZero files are laid out from the public spec, independent of the
encoder, so the decoder cannot pass by bug-cancellation alone."""

import struct

import numpy as np
import pytest

from texrex_spark.operators.tiff import (
    MAX_PIXELS,
    TiffError,
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    parse_tiff,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


# ---------------------------------------------------------- spec pins
def test_lzw_hand_vector():
    """Encoding the single byte 0x45: Clear(256), 0x45, EOI(257) as
    9-bit MSB-first codes = 100000000 001000101 100000001 + pad."""
    assert lzw_encode(b"\x45") == b"\x80\x11\x60\x20"
    assert lzw_decode(b"\x80\x11\x60\x20", 1) == b"\x45"


def test_lzw_early_change_width_bump():
    """A low-entropy blob long enough to cross the 9->10->11->12 bit
    boundaries and force a dictionary reset; any off-by-one in the
    early-change rule desynchronizes reader and writer exactly at a
    boundary and corrupts everything after it."""
    rng = _rng(1)
    blob = rng.integers(0, 4, 120_000, dtype=np.uint8).tobytes()
    assert lzw_decode(lzw_encode(blob), len(blob)) == blob
    rep = b"abcabcabd" * 8000  # deep dictionary chains + reset
    assert lzw_decode(lzw_encode(rep), len(rep)) == rep


def test_packbits_spec_semantics():
    # literal run: n-1 then bytes; repeat: 257-n then byte; 128 no-op
    assert packbits_decode(b"\x02abc", 3) == b"abc"
    assert packbits_decode(b"\xfeZ", 3) == b"ZZZ"
    assert packbits_decode(b"\x80\x00a", 1) == b"a"
    rng = _rng(2)
    blob = bytes(rng.integers(0, 4, 5000, dtype=np.uint8))
    assert packbits_decode(packbits_encode(blob), len(blob)) == blob


def test_hand_assembled_big_endian_tiff():
    """A 3x2 grayscale MM (big-endian) file laid out byte by byte —
    the encoder only writes II, so this is the byte-order coverage."""
    pixels = bytes([10, 20, 30, 40, 50, 60])
    ifd_off = 8
    entries = [
        (256, 3, 1, 3 << 16),   # width 3 (SHORT packs in the high half)
        (257, 3, 1, 2 << 16),   # height 2
        (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16),   # uncompressed
        (262, 3, 1, 1 << 16),   # BlackIsZero
        (273, 4, 1, 0),         # strip offset patched below
        (277, 3, 1, 1 << 16),
        (278, 3, 1, 2 << 16),
        (279, 4, 1, 6),
    ]
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    body = struct.pack(">2sHI", b"MM", 42, ifd_off)
    body += struct.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        body += struct.pack(">HHII", tag, typ, count, val)
    body += struct.pack(">I", 0) + pixels
    out = decode_tiff(body)
    assert out.shape == (2, 3)
    assert out.tolist() == [[10, 20, 30], [40, 50, 60]]


def test_hand_assembled_palette_and_white_is_zero():
    """Photometric 3 resolves indices through the 16-bit ColorMap;
    photometric 0 inverts grayscale."""
    # palette: 2x1 image, indices 0 and 255
    cmap = [0] * 768
    cmap[0], cmap[256], cmap[512] = 65535, 32896, 0  # idx 0 -> (255,128,0)
    cmap[255], cmap[511], cmap[767] = 257, 514, 771  # idx 255 -> (1,2,3)
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, 1),
        (279, 4, 1, 2), (320, 3, 768, 0),
    ]
    ifd_size = 2 + 12 * len(entries) + 4
    cmap_off = 8 + ifd_size
    data_off = cmap_off + 768 * 2
    body = struct.pack("<2sHI", b"II", 42, 8)
    body += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        if tag == 273:
            val = data_off
        if tag == 320:
            val = cmap_off
        body += struct.pack("<HHII", tag, typ, count, val)
    body += struct.pack("<I", 0)
    body += struct.pack("<768H", *cmap)
    body += bytes([0, 255])
    out = decode_tiff(body)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [255, 128, 0]
    assert out[0, 1].tolist() == [1, 2, 3]
    # WhiteIsZero: same layout, photometric 0, no colormap
    inv = encode_tiff(np.array([[5, 250]], np.uint8), compression="none")
    inv = bytearray(inv)
    # patch photometric (tag 262) from 1 to 0 in the II IFD
    n = struct.unpack_from("<H", inv, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", inv, off)[0] == 262:
            struct.pack_into("<I", inv, off + 8, 0)
    out = decode_tiff(bytes(inv))
    assert out.tolist() == [[250, 5]]


# ---------------------------------------------------------- roundtrips
@pytest.mark.parametrize("compression", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("shape", [(24, 31), (24, 31, 3), (13, 17, 4)])
def test_roundtrip(compression, shape):
    img = _rng(sum(shape)).integers(0, 256, shape, np.uint8)
    out = decode_tiff(encode_tiff(img, compression=compression))
    assert out.shape == img.shape and (out == img).all()


def test_roundtrip_predictor_and_strips():
    rng = _rng(3)
    img = rng.integers(0, 256, (50, 23, 3), np.uint8)
    for rps in (1, 7, 32, 1000):
        p = encode_tiff(img, compression="lzw", predictor=True,
                        rows_per_strip=rps)
        out = decode_tiff(p)
        assert (out == img).all()
    # predictor helps on smooth content
    smooth = np.clip(
        np.linspace(0, 255, 64)[None, :, None] + np.zeros((64, 64, 3)),
        0, 255,
    ).astype(np.uint8)
    assert len(encode_tiff(smooth, predictor=True)) < len(encode_tiff(smooth))


def test_parse_tiff_reports_layout():
    img = _rng(4).integers(0, 256, (40, 30, 3), np.uint8)
    info = parse_tiff(encode_tiff(img, rows_per_strip=16))
    assert (info["width"], info["height"]) == (30, 40)
    assert info["samples"] == 3 and info["compression"] == 5
    assert len(info["strips"]) == 3  # ceil(40/16)


# ------------------------------------------------------------- hardening
def test_malformed_rejected():
    with pytest.raises(TiffError):
        decode_tiff(b"XX" + b"\x00" * 16)
    with pytest.raises(TiffError):
        decode_tiff(b"II" + struct.pack("<HI", 41, 8) + b"\x00" * 8)
    with pytest.raises(TiffError):  # IFD offset out of range
        decode_tiff(b"II" + struct.pack("<HI", 42, 9999))
    payload = encode_tiff(_rng(5).integers(0, 256, (8, 8), np.uint8))
    for cut in range(0, len(payload), max(len(payload) // 50, 1)):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_tiff(payload[:cut])


def test_dimension_bomb_rejected():
    """A header claiming 65535x65535 (4.3 G pixels) dies on the
    MAX_PIXELS cap before any strip allocation."""
    payload = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
    n = struct.unpack_from("<H", payload, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", payload, off)[0] in (256, 257):
            struct.pack_into("<HII", payload, off + 2, 4, 1, 65535)
    assert 65535 * 65535 > MAX_PIXELS
    with pytest.raises(TiffError, match="dimensions"):
        decode_tiff(bytes(payload))


def test_honest_stubs():
    payload = bytearray(encode_tiff(np.zeros((2, 2), np.uint8),
                                    compression="none"))
    n = struct.unpack_from("<H", payload, 8)[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack_from("<H", payload, off)[0] == 259:
            struct.pack_into("<I", payload, off + 8, 7)  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(payload))
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((2, 2), np.uint8), compression="zip")
    with pytest.raises(ValueError):
        encode_tiff(np.zeros((2, 2), np.uint8), compression="packbits",
                    predictor=True)
