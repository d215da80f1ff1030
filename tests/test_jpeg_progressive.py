"""Progressive JPEG (SOF2, T.81 Annex G Huffman path): the progressive
and baseline encoders share one quantizer, so the two encodings of any
image must decode BIT-IDENTICALLY — the in-container differential oracle.
Plus partial-scan preview rendering and malformed-scan hardening."""

import re

import numpy as np
import pytest

from texrex_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_progressive_jpeg,
)


def _noise(h, w, ch=3, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w, ch) if ch else (h, w)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def _smooth(h, w):
    yy = np.linspace(0, 6, h)[:, None]
    xx = np.linspace(0, 6, w)[None, :]
    g = np.clip(128 + 90 * np.sin(yy) * np.cos(xx), 0, 255).astype(np.uint8)
    return np.stack([g, np.roll(g, 2, 0), np.roll(g, 2, 1)], -1)


@pytest.mark.parametrize("size", [(8, 8), (16, 24), (33, 47), (64, 40)])
@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("quality", [35, 85])
def test_progressive_decodes_identical_to_baseline(size, sub, quality):
    img = _noise(*size, seed=size[0] * 100 + quality)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    prog = decode_jpeg(
        encode_progressive_jpeg(img, quality=quality, subsampling=sub)
    )
    assert np.array_equal(base, prog)


def test_progressive_gray_identical():
    g = _noise(29, 13, ch=0, seed=7)
    base = decode_jpeg(encode_jpeg(g, quality=85))
    prog = decode_jpeg(encode_progressive_jpeg(g, quality=85))
    assert np.array_equal(base, prog)


def test_smooth_field_long_eob_runs():
    """Smooth content: most AC bands are all-zero, driving the EOB path
    in every scan of the script."""
    img = _smooth(40, 56)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(encode_progressive_jpeg(img, quality=85))
    assert np.array_equal(base, prog)


def test_sparse_spikes_zrl_path():
    """Isolated bright pixels on flat gray: long zero runs inside blocks
    exercise ZRL emission in both first and refinement AC scans."""
    img = np.full((48, 48, 3), 128, np.uint8)
    rng = np.random.default_rng(3)
    for _ in range(12):
        img[rng.integers(0, 48), rng.integers(0, 48)] = rng.integers(0, 256, 3)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    prog = decode_jpeg(encode_progressive_jpeg(img, quality=90))
    assert np.array_equal(base, prog)


def test_partial_scan_renders_coarse_preview():
    """A progressive file truncated at a scan boundary (plus EOI) still
    decodes — to the coarse approximation accumulated so far, exactly the
    browser preview behavior progressive JPEG exists for."""
    img = _smooth(40, 56)
    payload = encode_progressive_jpeg(img, quality=85)
    scans = [m.start() for m in re.finditer(b"\xff\xda", payload)]
    assert len(scans) == 10  # the standard 3-component script
    coarse = decode_jpeg(payload[: scans[2]] + b"\xff\xd9")
    full = decode_jpeg(payload)
    assert coarse.shape == full.shape
    err = np.abs(coarse.astype(int) - full.astype(int)).mean()
    assert 0 < err < 16  # recognizable approximation, not the final image


def test_later_scans_strictly_refine():
    """Mean error vs the final image must not increase as scans accrue."""
    img = _noise(32, 32, seed=5)
    payload = encode_progressive_jpeg(img, quality=85)
    scans = [m.start() for m in re.finditer(b"\xff\xda", payload)]
    full = decode_jpeg(payload).astype(int)
    errs = []
    for cut in (2, 5, 7, 10):
        part = payload[: scans[cut]] + b"\xff\xd9" if cut < len(scans) else payload
        errs.append(np.abs(decode_jpeg(part).astype(int) - full).mean())
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] == 0


def test_malformed_progressive_raises():
    img = _noise(16, 16, seed=1)
    payload = bytearray(encode_progressive_jpeg(img, quality=85))
    # corrupt a scan header: DC scan claiming a spectral band (Ss>0 with
    # 3 components) must be rejected
    sos = payload.find(b"\xff\xda")
    ln = (payload[sos + 2] << 8) | payload[sos + 3]
    payload[sos + 2 + ln - 3] = 1  # Ss: 0 -> 1 on the interleaved DC scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    # truncation mid-entropy in a later scan: clean ValueError, no crash
    good = encode_progressive_jpeg(img, quality=85)
    scans = [m.start() for m in re.finditer(b"\xff\xda", good)]
    with pytest.raises(ValueError):
        decode_jpeg(good[: scans[4] + 20])


def test_synth_progressive_fixture_branch():
    """The media fixture's m/1 ref is a progressive JPEG and must
    decode through the public dispatcher."""
    from texrex_spark.operators import multimodal as mm

    row = mm.synth_real_media_row("m/1")
    assert row["meta"]["mime"] == "image/jpeg"
    assert row["payload"].find(b"\xff\xc2") > 0  # SOF2 present
    img = mm.decode(bytes(row["payload"]), row["meta"])
    assert img.shape == (row["meta"]["height"], row["meta"]["width"])
