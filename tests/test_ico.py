"""ICO (favicon) codec: hand-assembled DIB/PNG entries + roundtrips.

The 1-bpp fixture is laid out byte by byte from the format description
(bottom-up rows, big-endian bits, XOR + AND stacking), independent of
the encoder."""

import struct

import numpy as np
import pytest

from texrex_spark.operators.ico import (
    IcoError,
    _decode_dib,
    decode_ico,
    encode_ico,
    ico_frames,
)
from texrex_spark.operators import multimodal as mm


def _rng(seed=8):
    return np.random.default_rng(seed)


def test_roundtrip_32bpp_with_alpha():
    img = _rng().integers(0, 256, (32, 32, 4), np.uint8)
    img[0:4, 0:4, 3] = 0  # transparent corner -> a real AND mask
    out = decode_ico(encode_ico(img))
    assert out.shape == (32, 32, 4) and (out == img).all()


def test_multi_image_picks_largest():
    rng = _rng(1)
    small = rng.integers(0, 256, (16, 16, 3), np.uint8)
    big = rng.integers(0, 256, (48, 48, 4), np.uint8)
    p = encode_ico([small, big])
    frames = ico_frames(p)
    assert [(w, h) for w, h, _ in frames] == [(16, 16), (48, 48)]
    assert (frames[0][2][..., :3] == small).all()
    assert (frames[0][2][..., 3] == 255).all()
    assert (decode_ico(p) == big).all()


def test_png_entry_routes_through_png_codec():
    rng = _rng(2)
    img = rng.integers(0, 256, (20, 24, 3), np.uint8)
    png = mm.encode_png(img)
    payload = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 24, 20, 0, 0, 1, 32, len(png), 22)
        + png
    )
    out = decode_ico(payload)
    assert out.shape == (20, 24, 4)
    assert (out[..., :3] == img).all() and (out[..., 3] == 255).all()


def test_hand_assembled_1bpp_dib():
    """2x2, 1-bpp palette [black, white], bottom-up rows: stored XOR
    rows 10 / 01 (bottom first) and an AND mask marking the top-left
    pixel transparent."""
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])
    xor_rows = bytes([0b10000000, 0, 0, 0]) + bytes([0b01000000, 0, 0, 0])
    and_rows = bytes([0, 0, 0, 0]) + bytes([0b10000000, 0, 0, 0])
    dib = (
        struct.pack("<IiihhIIiiII", 40, 2, 4, 1, 1, 0, 0, 0, 0, 0, 0)
        + pal + xor_rows + and_rows
    )
    img = _decode_dib(dib)
    assert img[0, 0].tolist() == [0, 0, 0, 0]          # masked transparent
    assert img[0, 1].tolist() == [255, 255, 255, 255]
    assert img[1, 0].tolist() == [255, 255, 255, 255]
    assert img[1, 1].tolist() == [0, 0, 0, 255]


def test_legacy_32bpp_zero_alpha_uses_and_mask():
    """Old writers leave the 32-bpp alpha channel all-zero and rely on
    the AND mask; the decoder must not return a fully transparent
    image."""
    img = _rng(3).integers(0, 256, (8, 8, 4), np.uint8)
    img[..., 3] = 255
    img[0, 0, 3] = 0
    p = bytearray(encode_ico(img))
    # zero the alpha bytes inside the XOR bitmap (offset 22 dir + 40 hdr)
    xor_off = 22 + 40
    for i in range(8 * 8):
        p[xor_off + 4 * i + 3] = 0
    out = decode_ico(bytes(p))
    assert (out[..., 3] == img[..., 3]).all()  # alpha rebuilt from mask
    assert (out[..., :3] == img[..., :3]).all()


def test_malformed_rejected():
    with pytest.raises(IcoError):
        decode_ico(b"\x00\x00\x03\x00\x01\x00" + b"\x00" * 16)  # bad type
    with pytest.raises(IcoError):
        decode_ico(struct.pack("<HHH", 0, 1, 300))  # implausible count
    payload = encode_ico(_rng(4).integers(0, 256, (16, 16, 3), np.uint8))
    for cut in range(0, len(payload), max(len(payload) // 50, 1)):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_ico(payload[:cut])
    # compressed DIB is an honest stub
    p = bytearray(payload)
    struct.pack_into("<I", p, 22 + 16, 1)  # biCompression = RLE
    with pytest.raises(NotImplementedError):
        decode_ico(bytes(p))


def test_encoder_contract():
    with pytest.raises(ValueError):
        encode_ico(np.zeros((300, 10, 3), np.uint8))  # > 256 px
    with pytest.raises(ValueError):
        encode_ico([])
    with pytest.raises(ValueError):
        encode_ico(np.zeros((4, 4, 2), np.uint8))


def test_dispatcher_and_fixture():
    """m/3 hashes to the ICO sub-pick; the payload must decode through
    the public dispatcher to the meta dimensions."""
    row = mm.synth_real_media_row("m/3")
    assert row["meta"]["mime"] == "image/x-icon"
    img = mm.decode(bytes(row["payload"]), row["meta"])
    assert img.shape == (row["meta"]["height"], row["meta"]["width"])
