"""WebP lossless (VP8L) codec: spec pins + exact roundtrips.

The distance neighbor map and the predictor/color-transform arithmetic
are pinned against hand-evaluated values from the public spec (RFC
9649), independent of the implementation, so an encoder/decoder pair
that merely agrees with itself cannot pass."""

import struct

import numpy as np
import pytest

from texrex_spark.operators.webp import (
    MAX_PIXELS,
    PLANE_CODES,
    WebpError,
    _BitWriter,
    _clamp_full,
    _clamp_half,
    _plane_to_dist,
    _prefix_sym,
    _prefix_val,
    _Bits,
    _select,
    decode_webp,
    encode_webp,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


# ---------------------------------------------------------- spec pins
def test_plane_code_table_matches_spec():
    """Head of the 120-entry (dx, dy) map, literal from RFC 9649."""
    spec_head = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert PLANE_CODES[:24] == spec_head
    assert len(PLANE_CODES) == 120
    assert len(set(PLANE_CODES)) == 120
    assert PLANE_CODES[34] == (0, 5)  # start of the d^2=25 tie group
    assert PLANE_CODES[96] == (8, 0)  # the only dx=8, dy=0 entry
    assert PLANE_CODES[119] == (8, 7)


def test_plane_to_dist():
    assert _plane_to_dist(1, 10) == 10  # (0,1) one row up
    assert _plane_to_dist(2, 10) == 1  # (1,0) previous pixel
    assert _plane_to_dist(4, 10) == 9  # (-1,1)
    assert _plane_to_dist(121, 10) == 1  # beyond the map: code-120
    assert _plane_to_dist(4, 1) == 1  # (-1,1) at w=1 clamps to 1


def test_lz77_prefix_coding_roundtrip():
    """Spec examples plus an exhaustive low range and spot checks."""
    # sym < 4 encodes value sym+1 with no extra bits
    assert _prefix_sym(1) == (0, 0, 0)
    assert _prefix_sym(4) == (3, 0, 0)
    assert _prefix_sym(5) == (4, 1, 0)
    for v in list(range(1, 5000)) + [2 ** 16, 2 ** 20 - 7, 2 ** 20]:
        sym, ebits, extra = _prefix_sym(v)
        assert sym < 40 and extra < (1 << ebits if ebits else 1)
        bw = _BitWriter()
        bw.write(extra, ebits)
        br = _Bits(bw.getvalue() + b"\x00\x00\x00")
        assert _prefix_val(br, sym) == v


def test_select_predictor_spec_values():
    # L=(255,40,0,10), T=(255,42,0,12), TL=(255,41,0,11) as ARGB ints:
    # estimate L+T-TL; |est-L| = |T-TL| per channel = 1+0+1 = 2,
    # |est-T| = |L-TL| = 1+0+1 = 2 -> tie goes to T (pL < pT is false)
    L = (255 << 24) | (40 << 16) | (0 << 8) | 10
    T = (255 << 24) | (42 << 16) | (0 << 8) | 12
    TL = (255 << 24) | (41 << 16) | (0 << 8) | 11
    assert _select(L, T, TL) == T
    # make L strictly closer: TL == T so pL = 0
    assert _select(L, T, T) == L


def test_clamp_add_subtract_spec_values():
    px = lambda a, r, g, b: (a << 24) | (r << 16) | (g << 8) | b
    # full: per channel clamp(L + T - TL)
    out = _clamp_full(px(255, 250, 10, 0), px(255, 20, 10, 0), px(255, 5, 15, 200))
    assert out == px(255, 255, 5, 0)  # 265 clamps to 255, 5, -200 to 0
    # half: a = avg2(L, T) per channel, then clamp(a + (a - TL)/2) with
    # C-truncating division
    out = _clamp_half(px(255, 100, 0, 0), px(255, 102, 0, 0), px(255, 104, 0, 0))
    # avg=101, d=-3, trunc(-3/2)=-1 -> 100
    assert (out >> 16) & 0xFF == 100


def test_color_transform_delta_semantics():
    """g2r=0x80 is int8 -128; green=0xff is int8 -1; the delta is
    ((-128 * -1) >> 5) = 4 added to red mod 256."""
    img = np.zeros((1, 1, 3), np.uint8)
    img[0, 0] = [10, 255, 20]  # r, g, b
    p = encode_webp(
        img, palette=False, subtract_green=False, color_transform=(0x80, 0, 0)
    )
    assert (decode_webp(p)[0, 0, :3] == [10, 255, 20]).all()


# ---------------------------------------------------------- roundtrips
def _check(img, **opts):
    out = decode_webp(encode_webp(img, **opts))
    if img.ndim == 2:
        assert all((out[..., c] == img).all() for c in range(3))
        assert (out[..., 3] == 255).all()
    elif img.shape[2] == 3:
        assert (out[..., :3] == img).all() and (out[..., 3] == 255).all()
    else:
        assert (out == img).all()


@pytest.mark.parametrize("mode", range(14))
def test_roundtrip_every_predictor_mode(mode):
    _check(_rng(mode).integers(0, 256, (13, 17, 3), np.uint8),
           palette=False, predictor=mode)


@pytest.mark.parametrize(
    "opts",
    [
        dict(subtract_green=False, use_lz77=False, palette=False),
        dict(subtract_green=True, use_lz77=True, palette=False),
        dict(subtract_green=True, use_lz77=True, cache_bits=4, palette=False),
        dict(palette=False, use_meta=True),
        dict(palette=False, color_transform=(10, -20, 3)),
        dict(palette=False, color_transform=(-128, 127, -1)),
        dict(palette=False, predictor=11, color_transform=(-5, 5, 120),
             subtract_green=True, use_lz77=True, cache_bits=5, use_meta=True),
    ],
)
def test_roundtrip_rgba(opts):
    rng = _rng(11)
    img = rng.integers(0, 256, (13, 17, 4), np.uint8)
    _check(img, **opts)
    _check(rng.integers(0, 256, (9, 40), np.uint8), **opts)  # gray input


@pytest.mark.parametrize("n_colors", [1, 2, 4, 16, 200])
def test_roundtrip_palette_packing_widths(n_colors):
    """Every sub-byte packing width (8/4/2 px per byte + unpacked)."""
    rng = _rng(n_colors)
    img = (rng.integers(0, n_colors, (21, 19), np.uint8)
           * (255 // max(n_colors - 1, 1))).astype(np.uint8)
    _check(img, palette=True)
    _check(img, palette=True, use_lz77=True, cache_bits=3)


def test_roundtrip_edge_shapes():
    rng = _rng(2)
    _check(np.array([[[1, 2, 3]]], np.uint8), palette=False)  # 1x1
    _check(rng.integers(0, 256, (1, 130, 3), np.uint8), palette=False,
           predictor=5)  # single row exercises top-row L fallback
    _check(rng.integers(0, 256, (130, 1, 3), np.uint8), palette=False,
           predictor=12)  # single column exercises left-column T fallback
    _check(np.full((40, 40, 3), 9, np.uint8))  # solid: one long backref


def test_two_symbol_simple_code_path():
    """A two-value image without palette forces 2-symbol simple codes."""
    rng = _rng(3)
    img = (rng.integers(0, 2, (16, 16), np.uint8) * 200).astype(np.uint8)
    _check(img, palette=False, subtract_green=False, use_lz77=False)


def test_auto_palette_engages():
    img = (_rng(4).integers(0, 6, (32, 32), np.uint8) * 40).astype(np.uint8)
    auto = encode_webp(img)  # default palette="auto"
    off = encode_webp(img, palette=False, subtract_green=False)
    assert len(auto) < len(off)
    _check(img)


# ------------------------------------------------------------- hardening
def test_bad_container_rejected():
    with pytest.raises(WebpError):
        decode_webp(b"RIFX" + b"\x00" * 30)
    with pytest.raises(WebpError):
        decode_webp(b"RIFF" + struct.pack("<I", 20) + b"WAVE" + b"\x00" * 12)
    with pytest.raises(WebpError):  # chunk overruns file
        decode_webp(
            b"RIFF" + struct.pack("<I", 100) + b"WEBP"
            + b"VP8L" + struct.pack("<I", 1000) + b"\x2f" * 8
        )


def test_lossy_vp8_is_honest_stub():
    payload = (
        b"RIFF" + struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_webp(payload)


def test_dimension_bomb_rejected_before_allocation():
    """A 16384x16384 claim (1 GiB RGBA) must die on the MAX_PIXELS cap,
    not allocate."""
    bw = _BitWriter()
    bw.write(16383, 14)
    bw.write(16383, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    vp8l = b"\x2f" + bw.getvalue() + b"\x00" * 8
    payload = (
        b"RIFF" + struct.pack("<I", 12 + len(vp8l)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    )
    assert 16384 * 16384 > MAX_PIXELS
    with pytest.raises(WebpError, match="too large"):
        decode_webp(payload)


def test_bad_version_and_signature():
    bw = _BitWriter()
    bw.write(0, 14)
    bw.write(0, 14)
    bw.write(0, 1)
    bw.write(5, 3)  # version must be 0
    vp8l = b"\x2f" + bw.getvalue() + b"\x00" * 4
    payload = (
        b"RIFF" + struct.pack("<I", 12 + len(vp8l)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    )
    with pytest.raises(WebpError, match="version"):
        decode_webp(payload)
    bad_sig = payload.replace(b"\x2f", b"\x30", 1)
    with pytest.raises(WebpError, match="signature"):
        decode_webp(bad_sig)


def test_encoder_input_contract():
    with pytest.raises(ValueError):
        encode_webp(np.zeros((1, 16385, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_webp(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_webp(np.zeros((4, 4, 3), np.uint8), cache_bits=12)
    with pytest.raises(ValueError):
        encode_webp(
            _rng(9).integers(0, 256, (32, 32, 3), np.uint8), palette=True
        )


def test_truncation_never_escapes():
    payload = encode_webp(_rng(5).integers(0, 256, (24, 32, 3), np.uint8),
                          palette=False, use_lz77=True, cache_bits=4)
    for cut in range(0, len(payload), max(len(payload) // 60, 1)):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_webp(payload[:cut])


# ------------------------------------------------------------- animation
def test_animation_roundtrip_full_canvas():
    from texrex_spark.operators.webp import decode_webp_frames, encode_webp_frames

    rng = _rng(9)
    frames = [rng.integers(0, 256, (20, 24, 3), np.uint8) for _ in range(3)]
    p = encode_webp_frames(frames, duration_ms=40, blend=[False] * 3)
    got = decode_webp_frames(p)
    assert [n for n, _, _ in got] == [0, 1, 2]
    assert all(d == 40 for _, d, _ in got)
    for (_, _, canvas), f in zip(got, frames):
        assert (canvas[..., :3] == f).all() and (canvas[..., 3] == 255).all()
    # the still decoder composites exactly frame 0
    assert (decode_webp(p)[..., :3] == frames[0]).all()
    # every_k / max_frames mirror gif.decode_gif_frames
    assert [n for n, _, _ in decode_webp_frames(p, every_k=2)] == [0, 2]
    assert len(decode_webp_frames(p, max_frames=1)) == 1


def test_animation_subrect_blend_and_dispose():
    """A patch frame overwrites only its rectangle; disposal 1 then
    restores that rectangle to the ANIM background color."""
    from texrex_spark.operators.webp import decode_webp_frames, encode_webp_frames

    rng = _rng(10)
    base = rng.integers(0, 256, (16, 16, 3), np.uint8)
    patch = rng.integers(0, 256, (8, 8, 3), np.uint8)
    last = rng.integers(0, 256, (2, 2, 3), np.uint8)
    p = encode_webp_frames(
        [base, patch, last],
        offsets=[(0, 0), (2, 4), (0, 0)],
        canvas=(16, 16),
        blend=[False, False, False],
        dispose=[False, True, False],
        background=(9, 8, 7, 255),
    )
    f0, f1, f2 = decode_webp_frames(p)
    assert (f0[2][..., :3] == base).all()
    assert (f1[2][4:12, 2:10, :3] == patch).all()
    assert (f1[2][0:4, :, :3] == base[0:4, :]).all()  # outside rect untouched
    # frame 2 sees the disposed rect filled with the ANIM background
    assert (f2[2][4:12, 4:10] == np.array([9, 8, 7, 255], np.uint8)).all()


def test_animation_alpha_blend_semantics():
    """Blend method 0: a half-transparent red frame over opaque blue via
    the container-spec src-over formula."""
    from texrex_spark.operators.webp import decode_webp_frames, encode_webp_frames

    blue = np.zeros((4, 4, 4), np.uint8)
    blue[...] = (0, 0, 255, 255)
    red = np.zeros((4, 4, 4), np.uint8)
    red[...] = (255, 0, 0, 128)
    p = encode_webp_frames([blue, red], blend=[False, True])
    _, f1 = decode_webp_frames(p)
    px = f1[2][0, 0]
    # a_out*255 = 128*255 + 255*127 = 65025, i.e. semi-transparent over
    # opaque composites back to fully opaque; r = 255*128*255 // (a_out*255)
    ao255 = 128 * 255 + 255 * 127
    assert px[3] == ao255 // 255 == 255
    assert px[0] == (255 * 128 * 255) // ao255
    assert px[2] == (255 * 255 * 127) // ao255


def test_animation_malformed_rejected():
    from texrex_spark.operators.webp import encode_webp_frames

    rng = _rng(11)
    frames = [rng.integers(0, 256, (8, 8, 3), np.uint8) for _ in range(2)]
    with pytest.raises(ValueError):  # odd offsets are unrepresentable
        encode_webp_frames(frames, offsets=[(0, 0), (1, 0)], canvas=(9, 8))
    with pytest.raises(ValueError):  # rect outside canvas
        encode_webp_frames(frames, offsets=[(0, 0), (4, 0)], canvas=(8, 8))
    with pytest.raises(ValueError):  # per-frame list length mismatch
        encode_webp_frames(frames, blend=[False])
    with pytest.raises(ValueError):
        encode_webp_frames(frames, duration_ms=1 << 24)
    with pytest.raises(ValueError):
        encode_webp_frames(frames, loop=70000)
    p = encode_webp_frames(frames, blend=[False, False])
    for cut in range(12, len(p), max(len(p) // 40, 1)):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_webp(p[:cut])


def test_hand_assembled_vp8l_stream():
    """A VP8L bitstream laid out bit-by-bit from the spec (NOT via the
    encoder), decoding to known pixels — breaks encoder/decoder
    bug-cancellation for the header, simple-code, and canonical-order
    paths.  2x1 image, no transforms/cache/meta: green uses a 2-symbol
    simple code (symbols 30 and 10 — read order reversed vs canonical
    order, so code 0 must go to the SMALLER symbol, 10), red/blue/alpha
    are 1-symbol codes costing zero bits per pixel."""
    bw = _BitWriter()
    bw.write(1, 14)   # width - 1  -> w = 2
    bw.write(0, 14)   # height - 1 -> h = 1
    bw.write(0, 1)    # alpha hint
    bw.write(0, 3)    # version
    bw.write(0, 1)    # no transforms
    bw.write(0, 1)    # no color cache
    bw.write(0, 1)    # no meta prefix codes
    # green code: simple, 2 symbols, first as 8 bits: 30 then 10
    bw.write(1, 1)    # simple
    bw.write(1, 1)    # num_symbols - 1 = 1
    bw.write(1, 1)    # first symbol is 8 bits
    bw.write(30, 8)
    bw.write(10, 8)
    # red = 7, blue = 3, alpha = 255: simple 1-symbol codes
    for sym in (7, 3, 255):
        bw.write(1, 1)   # simple
        bw.write(0, 1)   # one symbol
        bw.write(1, 1)   # 8-bit symbol
        bw.write(sym, 8)
    # distance code: simple 1-symbol (never read)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(0, 1)    # 1-bit symbol
    bw.write(0, 1)
    # pixels: canonical order assigns code 0 to symbol 10 (the smaller),
    # code 1 to symbol 30 — emit green 30 then green 10
    bw.write(1, 1)    # -> green 30
    bw.write(0, 1)    # -> green 10
    vp8l = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    out = decode_webp(payload)
    assert out.shape == (1, 2, 4)
    assert (out[0, 0] == [7, 30, 3, 255]).all()
    assert (out[0, 1] == [7, 10, 3, 255]).all()


def test_hand_assembled_multi_group_meta_stream():
    """Two REAL prefix-code groups selected by the entropy image — the
    encoder only ever emits a trivial one-group meta image, so this
    hand-built stream is the only coverage of per-block group dispatch.
    8x1 image, meta precision hb=2 (4-pixel blocks, so 2 blocks): the
    entropy image's two pixels carry meta indices 0 and 1; both groups
    use 0-bit single-symbol codes, so the pixel section is empty and
    the decoded colors depend entirely on picking the right group."""
    bw = _BitWriter()
    bw.write(7, 14)   # w = 8
    bw.write(0, 14)   # h = 1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)    # no transforms
    bw.write(0, 1)    # no color cache
    bw.write(1, 1)    # meta prefix codes present
    bw.write(0, 3)    # hb - 2 = 0 -> blocks of 4 -> entropy image is 2x1
    # --- entropy image (level0=False: no transforms/meta field) ---
    bw.write(0, 1)    # no color cache
    # green: simple 2-symbol code {0, 1} (canonical: code 0 -> symbol 0)
    bw.write(1, 1)
    bw.write(1, 1)
    bw.write(0, 1)    # first symbol in 1 bit
    bw.write(0, 1)    # symbol 0
    bw.write(1, 8)    # symbol 1
    for sym in (0, 0, 0):  # red/blue/alpha: 1-symbol codes, 0 bits/px
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(sym, 1)
    bw.write(1, 1)    # distance: 1-symbol code
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)    # entropy pixel 0: green 0 -> meta index 0
    bw.write(1, 1)    # entropy pixel 1: green 1 -> meta index 1
    # --- two groups, every code single-symbol (zero pixel bits) ---
    for r, g, b in ((1, 100, 2), (3, 200, 4)):
        for sym in (g, r, b, 255):
            bw.write(1, 1)  # simple
            bw.write(0, 1)  # one symbol
            bw.write(1, 1)  # 8-bit
            bw.write(sym, 8)
        bw.write(1, 1)      # distance: 1-symbol
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
    vp8l = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    out = decode_webp(
        b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    )
    assert out.shape == (1, 8, 4)
    assert (out[0, :4] == [1, 100, 2, 255]).all()   # block 0 -> group 0
    assert (out[0, 4:] == [3, 200, 4, 255]).all()   # block 1 -> group 1


def test_backref_distance_beyond_plane_map():
    """Distance codes > 120 mean a literal distance of code-120 — the
    encoder only emits dist-1 runs, so pin the integrated path with a
    stream whose backref reaches 72 pixels back (for w=8 the plane map
    tops out at 7*8+8 = 64, forcing code 72+120).  The green code mixes
    two literal symbols with a length symbol, so this also exercises a
    code-length-coded green alphabet with a symbol above 255."""
    from texrex_spark.operators.webp import _prefix_sym, _write_code

    w, h = 8, 12
    greens = [(1 if (i % 7) < 3 else 0) for i in range(80)]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)    # no transforms
    bw.write(0, 1)    # no color cache
    bw.write(0, 1)    # no meta
    # green: lengths {0:1, 1:2, 256+len_sym(16):2} (Kraft exact); the
    # code-description bytes come from the encoder's writer, which the
    # hand-assembled 2x1 stream already pins independently
    len_sym, len_ebits, len_extra = _prefix_sym(16)
    glens = [0] * 280
    glens[0], glens[1], glens[256 + len_sym] = 1, 2, 2
    green = _write_code(bw, glens)
    for sym in (0, 0, 0):  # red/blue/alpha single-symbol
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(sym, 1)
    # distance: single-symbol code for prefix_sym(72 + 120)
    dist_sym, dist_ebits, dist_extra = _prefix_sym(72 + 120)
    bw.write(1, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(dist_sym, 8)
    for g in greens:  # 80 literals
        bw.write(*green[g])
    bw.write(*green[256 + len_sym])  # backref: length 16 ...
    bw.write(len_extra, len_ebits)
    bw.write(dist_extra, dist_ebits)  # ... distance code 192 -> dist 72
    vp8l = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    out = decode_webp(
        b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    )
    expect = greens + greens[8:24]  # out[80+i] = out[80+i-72]
    assert out.shape == (12, 8, 4)
    assert out[..., 1].ravel().tolist() == expect


def test_sample_frames_over_animated_webp_and_gif(spark):
    """The frame-sampling stage explodes animated WebP and GIF payloads
    into per-frame PPM rows, same contract as MP4/PNM streams."""
    import pandas as pd
    from texrex_spark.operators.gif import encode_gif_frames
    from texrex_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_ppm, sample_frames)
    from texrex_spark.operators.webp import encode_webp_frames

    rng = _rng(12)
    wframes = [rng.integers(0, 256, (10, 12, 3), np.uint8) for _ in range(5)]
    gframes = [(rng.integers(0, 4, (10, 12, 3)) * 80).astype(np.uint8)
               for _ in range(4)]
    rows = [
        {"media_ref": "aw/0", "kind": "image",
         "payload": encode_webp_frames(wframes, blend=[False] * 5),
         "meta": {"width": 12, "height": 10, "duration_ms": 500,
                  "mime": "image/webp"}},
        {"media_ref": "ag/0", "kind": "image",
         "payload": encode_gif_frames(gframes, delay_cs=4),
         "meta": {"width": 12, "height": 10, "duration_ms": 160,
                  "mime": "image/gif"}},
    ]
    media = spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in sample_frames(media, every_k=2).collect()}
    assert sorted(out) == ["ag/0#0", "ag/0#2", "aw/0#0", "aw/0#2", "aw/0#4"]
    for i in (0, 2, 4):
        got = decode_ppm(bytes(out[f"aw/0#{i}"]["payload"]))
        assert (got == wframes[i]).all()
    for i in (0, 2):
        got = decode_ppm(bytes(out[f"ag/0#{i}"]["payload"]))
        assert (got == gframes[i]).all()
