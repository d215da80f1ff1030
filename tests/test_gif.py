"""GIF87a/89a codec (operators/gif.py): LZW round-trips, interlacing,
animation compositing (transparency + disposal), palette quantization,
and the multimodal dispatcher/resize wiring."""

import struct

import numpy as np
import pytest

from texrex_spark.operators import gif as G
from texrex_spark.operators import multimodal as mm
from texrex_spark.operators.gif import (
    GifError,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
    parse_gif,
)


def _limited(h, w, seed=7, levels=6):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, levels, (h, w, 3)) * (255 // (levels - 1))).astype(
        np.uint8
    )


def test_roundtrip_exact_palette():
    img = _limited(20, 31)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_gray_input():
    g = np.arange(9 * 13, dtype=np.uint8).reshape(9, 13) % 250
    assert np.array_equal(decode_gif(encode_gif(g)), np.stack([g] * 3, -1))


def test_single_color_and_two_color():
    one = np.full((7, 5, 3), 99, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(one)), one)
    two = one.copy()
    two[::2] = 30
    assert np.array_equal(decode_gif(encode_gif(two)), two)


def test_quantized_roundtrip_bounded_error():
    """>256 distinct colors takes the 3-3-2 cube; nearest-level rounding
    bounds the per-channel error at half a level."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = decode_gif(encode_gif(img))
    err = np.abs(out.astype(int) - img.astype(int))
    assert err[..., 0].max() <= 19 and err[..., 1].max() <= 19
    assert err[..., 2].max() <= 43


def test_lzw_table_reset():
    """Noise at 128x128 overflows the 4096-code table, forcing the
    encoder's mid-stream clear; decode must still be exact per-index."""
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    img = palette[rng.integers(0, 200, (128, 128))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_animation_roundtrip_and_sampling():
    img = _limited(18, 25)
    frames = [np.roll(img, 3 * i, axis=1) for i in range(5)]
    payload = encode_gif_frames(frames, delay_cs=8)
    dec = decode_gif_frames(payload)
    assert [n for n, _, _ in dec] == list(range(5))
    for (n, delay, arr), want in zip(dec, frames):
        assert delay == 8
        assert np.array_equal(arr, want)
    assert [n for n, _, _ in decode_gif_frames(payload, every_k=2)] == [0, 2, 4]


def test_interlaced_decode():
    """Hand-build an interlaced GIF (encoder emits sequential rows) and
    check the four-pass 8/8/4/2 reorder reconstructs the image."""
    img = _limited(23, 16, seed=5)
    idx, pal = G._palettize(img)
    tbl, sf = G._color_table_bytes(pal)
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | sf | 0x40)
    out += tbl
    mc = max(2, sf + 1)
    out.append(mc)
    order = np.concatenate(
        [np.arange(s, h, st) for s, st in G._INTERLACE_PASSES]
    )
    lzw = G._lzw_encode(idx[order].reshape(-1), mc)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    assert np.array_equal(decode_gif(bytes(out)), pal[idx])


def test_transparency_composites_over_previous_frame():
    """Frame 2 paints only a sub-rect with a transparent index; the
    canvas must keep frame 1 underneath."""
    f1 = np.full((10, 10, 3), 10, np.uint8)
    p = bytearray(encode_gif(f1)[:-1])  # drop the trailer, append frame 2
    # 4x4 patch at (2,3): palette [red, green], index 1 transparent
    patch = np.zeros((4, 4), np.uint8)
    patch[::2, ::2] = 1
    p += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 5, 1) + b"\x00"
    p += struct.pack("<BHHHHB", 0x2C, 3, 2, 4, 4, 0x80)  # 2-entry table
    p += bytes([200, 0, 0, 0, 200, 0])
    p.append(2)
    lzw = G._lzw_encode(patch.reshape(-1), 2)
    p.append(len(lzw))
    p += lzw
    p.append(0)
    p.append(0x3B)
    frames = decode_gif_frames(bytes(p))
    assert len(frames) == 2
    last = frames[1][2]
    # patch origin (x=3, y=2): patch[0,0] is index 1 = transparent, so
    # canvas (2,3) keeps frame 1; patch[0,1] is index 0 = opaque red
    assert tuple(last[2, 3]) == (10, 10, 10)
    assert tuple(last[2, 4]) == (200, 0, 0)


def _patch_block(x, y, patch, rgb0, rgb1, disposal, transparent=None):
    """One GCE + image-descriptor block: 2-entry local table [rgb0, rgb1],
    2-bit LZW over ``patch`` (uint8 indices), placed at (x, y)."""
    gflags = (disposal & 0x07) << 2
    t_idx = 0
    if transparent is not None:
        gflags |= 0x01
        t_idx = transparent
    out = bytearray()
    out += b"\x21\xf9\x04" + struct.pack("<BHB", gflags, 5, t_idx) + b"\x00"
    out += struct.pack("<BHHHHB", 0x2C, x, y, patch.shape[1], patch.shape[0], 0x80)
    out += bytes(rgb0) + bytes(rgb1)
    out.append(2)
    lzw = G._lzw_encode(patch.reshape(-1), 2)
    out.append(len(lzw))
    out += lzw
    out.append(0)
    return out


def _screen_header(w, h, bg_rgb):
    """GIF89a header with a 2-entry global table [bg_rgb, white], bg=0."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x00, 0, 0)  # GCT, 2 entries
    out += bytes(bg_rgb) + bytes((255, 255, 255))
    return out


def test_disposal_restore_background():
    """Disposal 2: after a frame is composited, its rect reverts to the
    background color before the next frame draws."""
    red, green, bg = (200, 0, 0), (0, 200, 0), (0, 0, 99)
    p = _screen_header(6, 6, bg)
    # frame 1: full-screen red, disposal 2
    p += _patch_block(0, 0, np.zeros((6, 6), np.uint8), red, green, disposal=2)
    # frame 2: 2x2 green patch at (1,1), disposal 0
    p += _patch_block(1, 1, np.ones((2, 2), np.uint8), red, green, disposal=0)
    p.append(0x3B)
    frames = decode_gif_frames(bytes(p))
    assert len(frames) == 2
    f1, f2 = frames[0][2], frames[1][2]
    assert tuple(f1[0, 0]) == red and tuple(f1[5, 5]) == red
    # frame 1's rect (the whole screen) restored to background, then the
    # 2x2 patch drew green
    assert tuple(f2[1, 1]) == green and tuple(f2[2, 2]) == green
    assert tuple(f2[0, 0]) == bg and tuple(f2[5, 5]) == bg


def test_disposal_restore_previous():
    """Disposal 3: after the frame is composited, the canvas reverts to
    its pre-frame state — frame 3 must not see frame 2's pixels."""
    red, green, bg = (200, 0, 0), (0, 200, 0), (0, 0, 99)
    p = _screen_header(6, 6, bg)
    # frame 1: full-screen red, left in place
    p += _patch_block(0, 0, np.zeros((6, 6), np.uint8), red, green, disposal=0)
    # frame 2: green patch at (0,0), disposal 3 (restore previous)
    p += _patch_block(0, 0, np.ones((2, 2), np.uint8), red, green, disposal=3)
    # frame 3: green patch at (4,4)
    p += _patch_block(4, 4, np.ones((2, 2), np.uint8), red, green, disposal=0)
    p.append(0x3B)
    frames = decode_gif_frames(bytes(p))
    assert len(frames) == 3
    f2, f3 = frames[1][2], frames[2][2]
    assert tuple(f2[0, 0]) == green  # frame 2 shows its own patch
    # frame 3: frame 2's patch is gone (restored to red), new patch shows
    assert tuple(f3[0, 0]) == red
    assert tuple(f3[4, 4]) == green


def test_decode_gif_stops_after_first_frame():
    """decode_gif must not parse or LZW-decode the animation tail: a GIF
    whose second frame is garbage still yields frame 1 under max_frames=1
    (proving the tail is never touched)."""
    red, green, bg = (200, 0, 0), (0, 200, 0), (0, 0, 99)
    p = _screen_header(4, 4, bg)
    p += _patch_block(0, 0, np.zeros((4, 4), np.uint8), red, green, disposal=0)
    p += b"\xaa\xbb\xcc"  # invalid block type where frame 2 would start
    with pytest.raises(GifError):  # full parse must reject the garbage
        parse_gif(bytes(p))
    g = parse_gif(bytes(p), max_frames=1)
    assert len(g["frames"]) == 1
    assert np.array_equal(
        decode_gif_frames(bytes(p), max_frames=1)[0][2][0, 0], np.array(red)
    )


def test_pixel_cap_rejects_decompression_bomb():
    """A complete few-KB GIF claiming huge dimensions must fail fast (no
    multi-GB allocation) on both the screen and the LZW fail-fast path."""
    # screen-level cap
    p = bytearray(b"GIF89a") + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
    with pytest.raises(GifError, match="pixel cap"):
        parse_gif(bytes(p))
    # LZW fail-fast: legitimate small screen, stream far too short
    with pytest.raises(GifError, match="too short"):
        G._lzw_decode(b"\x00\x01", 2, 10_000_000)


def test_encode_rejects_oversized_frame():
    big = np.zeros((1, 70000, 3), np.uint8)
    with pytest.raises(ValueError, match="too large"):
        encode_gif(big)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: b"JIF89a" + p[6:],
        lambda p: p[:10],
        lambda p: p[:-1],  # missing trailer
        lambda p: p[:30],
    ],
)
def test_malformed_raises_gif_error(mutate):
    # full decode (no max_frames early-stop, which legitimately never
    # reaches a missing trailer on a complete first frame)
    payload = encode_gif(_limited(12, 12))
    with pytest.raises(ValueError):
        decode_gif_frames(mutate(payload))


def test_dispatcher_first_frame_luma():
    img = _limited(14, 19)
    payload = encode_gif_frames([img, np.roll(img, 5, 0)], delay_cs=3)
    out = mm.decode(payload, {"mime": "image/gif"})
    want = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).astype(np.uint8)
    assert np.array_equal(out, want)


def test_synth_fixture_emits_gif():
    """m/8 hashes to the GIF sub-pick; the synthesized payload must be
    a decodable GIF whose meta matches the decoded first frame."""
    row = mm.synth_real_media_row("m/8")
    assert row["meta"]["mime"] == "image/gif"
    img = decode_gif(bytes(row["payload"]))
    assert img.shape == (row["meta"]["height"], row["meta"]["width"], 3)
    feats = mm.feature_row(row["media_ref"], row["payload"], row["meta"])
    assert feats["width"] == row["meta"]["width"]


def test_resize_reencodes_gif(spark):
    from pyspark.sql import Row

    img = _limited(20, 20)
    media = spark.createDataFrame(
        [
            Row(
                media_ref="g1",
                kind="image",
                payload=bytearray(encode_gif(img)),
                meta=Row(width=20, height=20, duration_ms=0, mime="image/gif"),
            )
        ],
        mm.MEDIA_SCHEMA,
    )
    out = mm.resize_images(media, 8, 8).collect()
    assert len(out) == 1 and out[0].meta["mime"] == "image/gif"
    dec = decode_gif(bytes(out[0].payload))
    assert dec.shape == (8, 8, 3)
