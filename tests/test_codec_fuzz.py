"""Corruption fuzz over every real decoder: byte flips, truncations, and
splices of valid payloads must decode or fail with a clean ValueError /
NotImplementedError — never an unhandled IndexError/struct.error/zlib
error, and never an unbounded allocation.  These are the payload parsers
a 100 TB crawl feeds with arbitrary attacker-controlled bytes, so "raises
cleanly" is a load-bearing property, not a nicety (same hardening bar the
JPEG decoder already pins in test_multimodal_codecs)."""

import numpy as np
import pytest

from texrex_spark.operators import multimodal as mm
from texrex_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_progressive_jpeg,
)
from texrex_spark.operators.gif import (
    decode_gif,
    encode_gif,
    encode_gif_frames,
)
from texrex_spark.operators.mp4 import encode_mjpeg_mp4, parse_mp4
from texrex_spark.operators.flac import decode_flac, encode_flac
from texrex_spark.operators.ico import decode_ico, encode_ico
from texrex_spark.operators.tiff import decode_tiff, encode_tiff
from texrex_spark.operators.webp import (
    decode_webp,
    encode_webp,
    encode_webp_frames,
)

OK = (ValueError, NotImplementedError)


def _img(h=24, w=32):
    rng = np.random.default_rng(5)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _payloads():
    img = _img()
    gray = img[..., 0]
    frames = [np.roll(img, i, 0) for i in range(3)]
    samples = np.random.default_rng(5).integers(-20000, 20000, 800, dtype=np.int16)
    return {
        "pgm": (mm.encode_pgm(gray), mm.decode_pgm),
        "ppm": (mm.encode_ppm(img), mm.decode_ppm),
        "bmp": (mm.encode_bmp(img), mm.decode_bmp),
        "png": (mm.encode_png(img), mm.decode_png),
        "jpeg": (encode_jpeg(img, quality=85), decode_jpeg),
        "jpeg-prog": (encode_progressive_jpeg(img, quality=85), decode_jpeg),
        "wav": (mm.encode_wav(samples, 8000), mm.decode_wav),
        "mp4": (encode_mjpeg_mp4(frames, fps=10), parse_mp4),
        "pnm-stream": (mm.encode_pnm_stream(frames), mm.decode_pnm_stream),
        "gif": (encode_gif(img), decode_gif),
        "gif-anim": (encode_gif_frames(frames, delay_cs=4), decode_gif),
        "webp": (
            encode_webp(img, palette=False, use_lz77=True, cache_bits=4),
            decode_webp,
        ),
        "webp-pal": (
            encode_webp((gray // 32 * 32), palette=True),
            decode_webp,
        ),
        "webp-anim": (
            encode_webp_frames(frames, duration_ms=4, blend=[False] * 3),
            decode_webp,
        ),
        "tiff-lzw": (
            encode_tiff(img, compression="lzw", predictor=True,
                        rows_per_strip=8),
            decode_tiff,
        ),
        "tiff-packbits": (encode_tiff(gray, compression="packbits"),
                          decode_tiff),
        "ico": (encode_ico([img[:16, :16], img]), decode_ico),
        "flac": (encode_flac(samples, 8000), decode_flac),
    }


@pytest.mark.parametrize("name", list(_payloads()))
def test_byte_flips_fail_cleanly(name):
    payload, decode = _payloads()[name]
    rng = np.random.default_rng(hash(name) % 2**32)
    buf = bytearray(payload)
    for trial in range(60):
        mutated = bytearray(buf)
        for _ in range(int(rng.integers(1, 4))):
            mutated[int(rng.integers(0, len(mutated)))] = int(rng.integers(0, 256))
        try:
            decode(bytes(mutated))
        except OK:
            pass  # clean rejection is the contract


@pytest.mark.parametrize("name", list(_payloads()))
def test_truncations_fail_cleanly(name):
    payload, decode = _payloads()[name]
    # dense small cuts (header-parse window: magic + fixed-offset fields
    # live in the first ~64 bytes, where struct.unpack_from would throw)
    # plus a coarse stride over the body
    cuts = set(range(0, min(64, len(payload)))) | set(
        range(0, len(payload), max(len(payload) // 40, 1))
    )
    for cut in sorted(cuts):
        try:
            decode(payload[:cut])
        except OK:
            pass


@pytest.mark.parametrize("name", list(_payloads()))
def test_splices_fail_cleanly(name):
    """Swap random slices of the payload with slices of another format's
    payload — cross-format confusion must not escape the parser."""
    payloads = _payloads()
    payload, decode = payloads[name]
    donor = payloads["png" if name != "png" else "bmp"][0]
    rng = np.random.default_rng(1 + hash(name) % 2**32)
    for trial in range(30):
        a = int(rng.integers(0, len(payload)))
        b = min(a + int(rng.integers(1, 64)), len(payload))
        c = int(rng.integers(0, max(len(donor) - (b - a), 1)))
        mutated = payload[:a] + donor[c : c + (b - a)] + payload[b:]
        try:
            decode(mutated)
        except OK:
            pass
