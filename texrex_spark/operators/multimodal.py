"""Multimodal columns: opaque binary payloads + typed metadata.

The interleaved docs table references media by ``media_ref`` (spans with
kind='media', BASELINE.json input_hint).  A media table carries the bytes:

    media(media_ref string, kind string, payload binary,
          meta struct<width:int, height:int, duration_ms:int, mime:string>)

Decode support is tiered by what the container allows:

- **Real decoders** (pure numpy/stdlib, no external libs): binary PGM (P5)
  and PPM (P6), uncompressed 24-bit BMP, 8-bit PNG (stdlib ``zlib`` +
  all five scanline filters), baseline JPEG incl. 4:2:0 and restart
  markers, plus progressive JPEG — SOF2 spectral selection + successive
  approximation, decoding bit-identically to the baseline twin
  (operators/jpeg.py) — GIF87a/89a with LZW, interlacing, and animation
  compositing (operators/gif.py), and 8/16-bit PCM WAV (stdlib
  ``wave``).  These are genuine byte-level codecs with encode
  round-trips, so the decode -> feature -> resize -> re-encode pipeline
  is real end to end, covering the four most common compressed web
  image formats (PNG, JPEG, GIF, and lossless WebP — the full VP8L
  feature set: all four transforms, LZ77 over the 120-entry distance
  map, color cache, meta prefix codes, plus VP8X/ANMF animation with
  blend/dispose compositing; operators/webp.py).  Video:
  MJPEG-in-MP4 — a full ISO BMFF box/sample-table parser + writer
  (operators/mp4.py) over the baseline JPEG codec — and concatenated-PPM
  streams, both driving the ``sample_frames`` frame-sampling stage.
  Audio: 8/16-bit PCM WAV plus lossless FLAC (operators/flac.py —
  fixed/LPC predictors, Rice residuals, stereo decorrelation, CRC
  checks), sniffed by container magic in ``decode_audio``.
- **Stub** for the remaining compressed tier (arithmetic-coded/lossless
  JPEG, lossy VP8 WebP, and inter-frame video codecs like H.264 need
  PIL/av/libwebp, absent here): ``decode`` raises
  ``NotImplementedError`` for their mimes, and
  the deterministic ``image/fake`` payload keeps distribution tests
  hermetic.

All kernels run per Arrow batch inside ``mapInPandas``; swapping in PIL/av
for the compressed tier replaces one dispatcher branch.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, "
    "meta struct<width:int,height:int,duration_ms:int,mime:string>"
)


def synth_media_df(spark, cleaned: DataFrame) -> DataFrame:
    """Deterministic media table for every media span in a cleaned corpus:
    payload = repeatable bytes derived from the ref (stands in for the
    fetched object)."""
    refs = (
        cleaned.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([synth_media_row(ref) for ref in pdf["media_ref"]])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def synth_media_row(ref: str) -> dict:
    """Pure per-ref kernel behind synth_media_df (md5-seeded, so the
    payload is a deterministic function of the ref alone)."""
    seed = hashlib.md5(ref.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    payload = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
    return {
        "media_ref": ref,
        "kind": "image",
        "payload": payload,
        "meta": {"width": w, "height": h, "duration_ms": 0, "mime": "image/fake"},
    }


def decode_stub(payload: bytes, meta: dict) -> np.ndarray:
    """STUB decode: interprets the payload as a (h, w) uint8 grayscale
    array.  Replace with PIL.Image.open / av decoding in production —
    signature and batch shape stay identical."""
    w, h = meta["width"], meta["height"]
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) != w * h:
        raise ValueError("payload/meta size mismatch")
    return arr.reshape(h, w)


# --- Real codecs (pure numpy/stdlib; no external libraries) -------------


def encode_pgm(img: np.ndarray) -> bytes:
    """Binary PGM (P5), 8-bit grayscale."""
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6), 8-bit RGB (h, w, 3)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _parse_pnm_header(payload: bytes) -> tuple[bytes, int, int, int]:
    """Magic, width, height, data offset.  Netpbm allows '#' comments and
    any whitespace between the three header tokens."""
    magic = payload[:2]
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    if tokens[2] != 255:
        raise ValueError(f"only maxval 255 supported, got {tokens[2]}")
    return magic, tokens[0], tokens[1], i + 1  # single whitespace after maxval


def decode_pgm(payload: bytes) -> np.ndarray:
    """(h, w) uint8 from binary PGM."""
    magic, w, h, off = _parse_pnm_header(payload)
    if magic != b"P5":
        raise ValueError(f"not P5: {magic!r}")
    return np.frombuffer(payload, np.uint8, w * h, off).reshape(h, w)


def decode_ppm(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from binary PPM."""
    magic, w, h, off = _parse_pnm_header(payload)
    if magic != b"P6":
        raise ValueError(f"not P6: {magic!r}")
    return np.frombuffer(payload, np.uint8, w * h * 3, off).reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up, BGR,
    4-byte-aligned rows) from (h, w, 3) RGB."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    size = 54 + stride * h
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return head + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from an uncompressed 24-bit BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(payload) < 34:  # 14-byte file header + first 20 info-header bytes
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_sz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})")
    flip = h > 0  # negative height = top-down
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if w <= 0 or h == 0 or off + stride * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray) -> bytes:
    """8-bit PNG from (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) RGBA —
    pure stdlib (zlib + struct).  Scanlines use filter 0 (None); any
    spec-compliant reader accepts that, and decode_png below handles all
    five filters."""
    import zlib

    h, w = img.shape[:2]
    if img.ndim == 2:
        color = 0
    else:
        ch = img.shape[2]
        # color type per channel count (PNG spec 11.2.2): 2=RGB, 4=gray+A,
        # 6=RGBA — a hardcoded 2 corrupted re-encoded RGBA images (IHDR
        # said RGB while scanlines carried 4 bytes/pixel)
        color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
        if color is None:
            raise ValueError(f"unsupported channel count {ch}")
    raw = img.astype(np.uint8).reshape(h, -1)
    scan = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """(h, w [, ch]) uint8 from an 8-bit non-interlaced PNG (gray, RGB,
    or RGBA; palette/16-bit/interlaced raise).  Pure stdlib: chunk walk
    with CRC checks, zlib inflate, per-scanline unfilter (all five spec
    filters — None/Sub/Up/Average/Paeth; Sub vectorizes to a per-lane
    prefix sum, Up to a row add; Average/Paeth need the serial scan)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off, idat, ihdr = 8, [], None
    while off + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, off)
        if off + 12 + ln > len(payload):
            raise ValueError(f"truncated {typ!r} chunk")
        data = payload[off + 8 : off + 8 + ln]
        crc = struct.unpack_from(">I", payload, off + 8 + ln)[0]
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            if len(data) < 13:
                raise ValueError("short IHDR")
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        off += 12 + ln
    if ihdr is None:
        raise ValueError("no IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced PNG supported "
            f"(depth={depth}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if ch is None:
        raise ValueError(f"unsupported color type {color} (palette needs PLTE)")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        # a corrupt-but-CRC-consistent IDAT stream (the CRC only covers
        # the chunk bytes as stored, not their deflate validity)
        raise ValueError(f"corrupt PNG: bad IDAT stream ({e})")
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("inflated size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    for y in range(h):
        f = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: prefix sum per byte lane of the pixel
            rec = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride)
        elif f == 2:  # Up
            rec = line + prior
        elif f == 3:  # Average (serial: left is the reconstructed byte)
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - ch] & 255 if x >= ch else 0
                rec[x] = line[x] + ((left + prior[x]) >> 1)
        elif f == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - ch] & 255 if x >= ch else 0
                b = prior[x]
                c = int(out[y - 1, x - ch]) if (x >= ch and y) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = line[x] + pred
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = rec & 255
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM WAV from int16 samples shaped (n,) or (n, channels)."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples (n, channels) int16, sample_rate) from 8/16-bit PCM WAV.

    Untrusted input: stdlib ``wave`` raises wave.Error/EOFError on
    malformed RIFF structure — normalized to ValueError here so every
    codec in the tier shares one failure contract."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            nch, width, rate, n = (
                f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes()
            )
            raw = f.readframes(n)
    except (wave.Error, EOFError, struct.error, RuntimeError) as e:
        # RuntimeError: stdlib chunk.py raises it for unreadable sizes
        raise ValueError(f"corrupt WAV: {e}")
    if nch < 1 or rate < 1:
        raise ValueError("corrupt WAV: zero channels or rate")
    raw = raw[: len(raw) - len(raw) % (width * nch)] if width * nch else raw
    if width == 2:
        s = np.frombuffer(raw, "<i2")
    elif width == 1:  # 8-bit WAV is unsigned
        s = (np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got width {width}")
    return s.reshape(-1, nch), rate


def decode(payload: bytes, meta: dict) -> np.ndarray:
    """Mime-dispatched decode to a grayscale (h, w) uint8 array (color
    decodes to ITU-R 601 luma so every image feature kernel sees one
    shape).  Compressed codecs raise NotImplementedError — their
    libraries are not in this container."""
    mime = meta["mime"]
    if mime == "image/x-portable-graymap":
        return decode_pgm(payload)
    if mime in ("image/x-portable-pixmap", "image/bmp"):
        rgb = decode_ppm(payload) if mime.endswith("pixmap") else decode_bmp(payload)
        return _luma(rgb)
    if mime == "image/png":
        return _to_luma(decode_png(payload))
    if mime == "image/jpeg":
        from .jpeg import decode_jpeg

        return _to_luma(decode_jpeg(payload))
    if mime == "image/gif":
        from .gif import decode_gif

        return _to_luma(decode_gif(payload))
    if mime == "image/webp":
        from .webp import decode_webp

        return _to_luma(decode_webp(payload))
    if mime == "image/tiff":
        from .tiff import decode_tiff

        return _to_luma(decode_tiff(payload))
    if mime == "image/x-icon":
        from .ico import decode_ico

        return _to_luma(decode_ico(payload))
    if mime == "image/fake":
        return decode_stub(payload, meta)
    raise NotImplementedError(
        f"no codec for {mime} in this container (needs PIL/av)"
    )


def _luma(rgb: np.ndarray) -> np.ndarray:
    return (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.uint8)


def _to_luma(img: np.ndarray) -> np.ndarray:
    """Any decoded shape -> (h, w) luma: gray passes through, gray+alpha
    (PNG color type 4) keeps the gray channel, RGB/RGBA take ITU-R 601
    luma over the first three channels."""
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:
        return img[..., 0]
    return _luma(img[..., :3])


FEATURE_SCHEMA = (
    "media_ref string, width int, height int, mean_intensity double, "
    "std_intensity double, phash long"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode -> feature-extract per Arrow batch: mean/std intensity and a
    64-bit average-hash (pHash-style) over an 8x8 downsample.  The decode
    is the stub; the distribution plumbing (mapInPandas, batch columns,
    binary transfer) is the real thing."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    feature_row(ref, payload, meta)
                    for ref, payload, meta in zip(
                        pdf["media_ref"], pdf["payload"], pdf["meta"]
                    )
                ]
            )

    return media.mapInPandas(work, FEATURE_SCHEMA)


def feature_row(ref: str, payload: bytes, meta: dict) -> dict:
    """Pure per-object kernel behind extract_features (any decodable
    image mime; color → luma via the dispatcher)."""
    img = decode(payload, meta)
    h, w = img.shape
    ys = np.linspace(0, h - 1, 8).astype(int)
    xs = np.linspace(0, w - 1, 8).astype(int)
    tile = img[np.ix_(ys, xs)].astype(np.float64)
    bits = (tile > tile.mean()).flatten()
    phash = 0
    for i, b in enumerate(bits):
        if b:
            phash |= 1 << i
    return {
        "media_ref": ref,
        "width": w,
        "height": h,
        "mean_intensity": float(img.mean()),
        "std_intensity": float(img.std()),
        "phash": np.uint64(phash).astype(np.int64),
    }


def synth_real_media_row(ref: str) -> dict:
    """Deterministic REAL-format payload for a ref: cycles PGM / PPM /
    BMP / PNG / JPEG / GIF / WebP / WAV / MJPEG-MP4 by ref hash, every
    byte produced by the matching encoder, so the decode tier is
    exercised end to end with no codec libraries."""
    seed = hashlib.md5(ref.encode()).digest()
    rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
    pick = seed[8] % 9
    if pick == 8:
        from .tiff import encode_tiff

        w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if seed[9] % 2 == 0:
            # smooth ramp: LZW + horizontal-differencing predictor
            img = np.clip(
                img // 4 + np.linspace(0, 192, w)[None, :, None], 0, 255
            ).astype(np.uint8)
            payload = encode_tiff(img, compression="lzw", predictor=True,
                                  rows_per_strip=16)
        else:
            payload = encode_tiff(img, compression="packbits")
        return {
            "media_ref": ref, "kind": "image", "payload": payload,
            "meta": {"width": w, "height": h, "duration_ms": 0,
                     "mime": "image/tiff"},
        }
    if pick == 7:
        from .webp import encode_webp

        w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
        if seed[9] % 2 == 0:
            # limited palette: the color-indexing + packing path
            pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
            img = pal[rng.integers(0, 8, (h, w))]
            payload = encode_webp(img, palette=True, use_lz77=True)
        else:
            # smooth gradient: literal path with subtract-green + LZ77;
            # 1-3 frames so the VP8X/ANMF animation compositor is on the
            # fixture path too (like the GIF sub-pick)
            from .webp import encode_webp_frames

            yy = np.linspace(0, 3 * np.pi, h)[:, None]
            xx = np.linspace(0, 3 * np.pi, w)[None, :]
            base = 128 + 100 * np.sin(yy) * np.cos(xx * rng.uniform(0.5, 1.5))
            img = np.clip(
                np.stack([base, np.roll(base, 2, 0), np.roll(base, 2, 1)], -1),
                0, 255,
            ).astype(np.uint8)
            n_frames = int(rng.integers(1, 4))
            frames = [np.roll(img, 2 * i, axis=1) for i in range(n_frames)]
            payload = encode_webp_frames(
                frames, duration_ms=60, blend=[False] * n_frames,
                palette=False, subtract_green=True, use_lz77=True,
                cache_bits=6,
            )
        return {
            "media_ref": ref, "kind": "image", "payload": payload,
            "meta": {"width": w, "height": h, "duration_ms": 0,
                     "mime": "image/webp"},
        }
    if pick == 6:
        from .mp4 import encode_mjpeg_mp4

        w, h = int(rng.integers(16, 48)), int(rng.integers(16, 48))
        fps = int(rng.choice([5, 10, 25]))
        n_frames = int(rng.integers(3, 8))
        yy = np.linspace(0, 4 * np.pi, h)[:, None]
        xx = np.linspace(0, 4 * np.pi, w)[None, :]
        phase = rng.uniform(0, np.pi)
        frames = []
        for i in range(n_frames):
            base = 128 + 90 * np.sin(yy + phase + 0.4 * i) * np.cos(xx)
            frames.append(
                np.clip(
                    np.stack([base, np.roll(base, 3, 0), np.roll(base, 3, 1)], -1),
                    0, 255,
                ).astype(np.uint8)
            )
        return {
            "media_ref": ref, "kind": "video",
            "payload": encode_mjpeg_mp4(frames, fps=fps, quality=90),
            "meta": {"width": w, "height": h,
                     "duration_ms": max(1000 // fps, 1) * n_frames,
                     "mime": "video/mp4"},
        }
    if pick == 3:
        rate = int(rng.choice([8000, 16000]))
        n = int(rng.integers(400, 4000))
        samples = rng.integers(-(2**14), 2**14, n, dtype=np.int16)
        if seed[9] % 2 == 0:
            # FLAC sub-pick: a tonal signal so the fixed predictors and
            # Rice coding actually compress (operators/flac.py)
            from .flac import encode_flac

            t = np.arange(n)
            samples = (
                6000 * np.sin(2 * np.pi * 440 * t / rate)
                + rng.integers(-200, 200, n)
            ).astype(np.int16)
            return {
                "media_ref": ref, "kind": "audio",
                "payload": encode_flac(samples, rate),
                "meta": {"width": 0, "height": 0,
                         "duration_ms": int(n * 1000 / rate),
                         "mime": "audio/flac"},
            }
        return {
            "media_ref": ref, "kind": "audio",
            "payload": encode_wav(samples, rate),
            "meta": {"width": 0, "height": 0,
                     "duration_ms": int(n * 1000 / rate), "mime": "audio/wav"},
        }
    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    if pick == 0:
        if seed[9] % 2 == 0:
            # GIF sub-pick: limited palette (LZW-friendly), 1-3 frames so
            # the animation compositor is on the fixture path too
            from .gif import encode_gif_frames

            base = rng.integers(0, 8, (h, w, 3), dtype=np.uint8) * 36
            n_frames = int(rng.integers(1, 4))
            frames = [np.roll(base, 2 * i, axis=1) for i in range(n_frames)]
            payload = encode_gif_frames(frames, delay_cs=6)
            mime = "image/gif"
        else:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            payload, mime = encode_pgm(img), "image/x-portable-graymap"
    elif pick == 1:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload, mime = encode_ppm(img), "image/x-portable-pixmap"
    elif pick == 2:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if seed[9] % 2 == 0:
            # ICO sub-pick: a two-size favicon (the dominant crawl case),
            # alpha-holed so the AND mask is on the fixture path
            from .ico import encode_ico

            w = h = int(rng.integers(16, 49))
            rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
            rgba[..., 3] = 255
            rgba[0:2, 0:2, 3] = 0
            payload = encode_ico([rgba[::2, ::2], rgba])
            mime = "image/x-icon"
        else:
            payload, mime = encode_bmp(img), "image/bmp"
    elif pick == 4:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload, mime = encode_png(img), "image/png"
    else:
        from .jpeg import encode_jpeg

        # smooth field, not white noise: JPEG is a transform codec, and
        # the fixture should look like the photographs it exists for
        yy = np.linspace(0, 4 * np.pi, h)[:, None]
        xx = np.linspace(0, 4 * np.pi, w)[None, :]
        base = 128 + 90 * np.sin(yy + rng.uniform(0, np.pi)) * np.cos(
            xx * rng.uniform(0.5, 1.5)
        )
        img = np.clip(
            np.stack([base, np.roll(base, 3, 0), np.roll(base, 3, 1)], -1),
            0, 255,
        ).astype(np.uint8)
        sub = "420" if seed[9] % 2 else "444"
        if seed[10] % 2:  # progressive (SOF2): decodes identically to baseline
            from .jpeg import encode_progressive_jpeg

            payload = encode_progressive_jpeg(img, quality=90, subsampling=sub)
        else:
            payload = encode_jpeg(img, quality=90, subsampling=sub)
        mime = "image/jpeg"
    return {
        "media_ref": ref, "kind": "image", "payload": payload,
        "meta": {"width": w, "height": h, "duration_ms": 0, "mime": mime},
    }


def synth_real_media_df(spark, cleaned: DataFrame) -> DataFrame:
    """Media table with real-format payloads (PGM/PPM/BMP/WAV) for every
    media span in a cleaned corpus."""
    refs = (
        cleaned.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([synth_real_media_row(r) for r in pdf["media_ref"]])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_ref string, sample_rate int, n_samples int, channels int, "
    "duration_ms int, rms double, zero_crossings int"
)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Container-sniffed audio decode: FLAC (fLaC magic,
    operators/flac.py) or PCM WAV (RIFF) -> ((n, channels) int16,
    rate)."""
    payload = bytes(payload)
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(payload)
    return decode_wav(payload)


def audio_feature_row(ref: str, payload: bytes) -> dict:
    """Pure per-object kernel behind extract_audio_features."""
    samples, rate = decode_audio(payload)
    mono = samples.mean(axis=1)
    n = samples.shape[0]
    return {
        "media_ref": ref,
        "sample_rate": rate,
        "n_samples": n,
        "channels": samples.shape[1],
        "duration_ms": int(n * 1000 / rate),
        "rms": float(np.sqrt(np.mean(mono**2))),
        "zero_crossings": int(np.count_nonzero(np.diff(np.signbit(mono)))),
    }


def extract_audio_features(media: DataFrame) -> DataFrame:
    """WAV decode -> per-clip features (duration, RMS, zero-crossing
    count) per Arrow batch — the audio twin of extract_features."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sel = pdf[pdf["kind"] == "audio"]
            yield pd.DataFrame(
                [audio_feature_row(r, p) for r, p in zip(sel["media_ref"], sel["payload"])],
                columns=[c.split(" ")[0] for c in AUDIO_FEATURE_SCHEMA.split(", ")],
            )

    return media.mapInPandas(work, AUDIO_FEATURE_SCHEMA)


VIDEO_FEATURE_SCHEMA = (
    "media_ref string, codec string, n_frames int, width int, height int, "
    "duration_ms int, mean_intensity double"
)


def video_feature_row(ref: str, payload: bytes) -> dict:
    """Pure per-object kernel behind extract_video_features: container
    metadata from the sample tables plus mean luma over every 2nd frame
    (the frame-sample path, operators/mp4.py)."""
    from .mp4 import decode_mjpeg_frames, video_track

    track = video_track(bytes(payload))
    sampled = decode_mjpeg_frames(bytes(payload), every_k=2)
    if not sampled:
        # a structurally valid moov with an empty sample table is not a
        # decodable clip; fail like the rest of the tier, not with a
        # nan mean over an empty list
        raise ValueError(f"MP4 video track has no samples in {ref!r}")
    lumas = [_to_luma(a) for _, _, a in sampled]
    return {
        "media_ref": ref,
        "codec": track["codec"],
        "n_frames": track["n_samples"],
        "width": track["width"],
        "height": track["height"],
        "duration_ms": track["duration_ms"],
        "mean_intensity": float(np.mean([f.mean() for f in lumas])),
    }


def extract_video_features(media: DataFrame) -> DataFrame:
    """MP4 sample-table parse -> every-2nd-frame MJPEG decode -> per-clip
    features, per Arrow batch — the video twin of extract_features."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sel = pdf[pdf["kind"] == "video"]
            yield pd.DataFrame(
                [video_feature_row(r, p) for r, p in zip(sel["media_ref"], sel["payload"])],
                columns=[c.split(" ")[0] for c in VIDEO_FEATURE_SCHEMA.split(", ")],
            )

    return media.mapInPandas(work, VIDEO_FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of every decodable image, re-encoded in
    its ORIGINAL format (PGM stays PGM, PPM/BMP keep color) — a real
    decode -> transform -> encode stage for the uncompressed tier."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, meta in zip(pdf["media_ref"], pdf["payload"], pdf["meta"]):
                mime = meta["mime"]
                if mime == "image/x-portable-graymap":
                    img, enc = decode_pgm(payload), encode_pgm
                elif mime == "image/x-portable-pixmap":
                    img, enc = decode_ppm(payload), encode_ppm
                elif mime == "image/bmp":
                    img, enc = decode_bmp(payload), encode_bmp
                elif mime == "image/png":
                    img, enc = decode_png(payload), encode_png
                elif mime == "image/jpeg":
                    from .jpeg import decode_jpeg, encode_jpeg

                    img, enc = decode_jpeg(payload), encode_jpeg
                elif mime == "image/gif":
                    from .gif import decode_gif, encode_gif

                    img, enc = decode_gif(payload), encode_gif
                elif mime == "image/webp":
                    from .webp import decode_webp, encode_webp

                    img, enc = decode_webp(payload), encode_webp
                elif mime == "image/tiff":
                    from .tiff import decode_tiff, encode_tiff

                    img, enc = decode_tiff(payload), encode_tiff
                elif mime == "image/x-icon":
                    from .ico import decode_ico, encode_ico

                    img, enc = decode_ico(payload), encode_ico
                else:
                    continue  # audio / video: passed through elsewhere
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                rows.append(
                    {
                        "media_ref": ref, "kind": "image",
                        "payload": enc(img[np.ix_(ys, xs)]),
                        "meta": {"width": width, "height": height,
                                 "duration_ms": 0, "mime": mime},
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "kind", "payload", "meta"]
            )

    return media.mapInPandas(work, MEDIA_SCHEMA)


def encode_pnm_stream(frames: list[np.ndarray]) -> bytes:
    """Concatenated binary PPM frames (a netpbm stream — the classic
    uncompressed video interchange format, e.g. ffmpeg's image2pipe
    ppm output)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_pnm_stream(payload: bytes) -> list[np.ndarray]:
    """All frames of a concatenated-PPM stream."""
    frames = []
    off = 0
    while off < len(payload):
        _, w, h, data = _parse_pnm_header(payload[off:])
        end = data + w * h * 3
        frames.append(decode_ppm(payload[off : off + end]))
        off += end
    return frames


def sample_frames(media: DataFrame, every_k: int) -> DataFrame:
    """Frame-sampling stage for multi-frame payloads: decode the stream,
    keep every k-th frame, and emit each kept frame as its own
    single-image media row (``media_ref#<frame_idx>``) so the whole
    image pipeline (features, resize, near-dup) applies downstream.
    Four real container formats: concatenated-PPM streams
    (byte-concatenation grammar), MJPEG-in-MP4 (full ISO BMFF
    sample-table walk, operators/mp4.py), and animated GIF / WebP
    (composited frames with disposal/blend semantics, operators/gif.py
    and webp.py — both decode only the frames the stride keeps);
    inter-frame codecs (H.264 etc.) would slot into the same kernel via
    av."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import decode_mjpeg_frames

        for pdf in batches:
            rows = []
            for ref, payload, meta in zip(pdf["media_ref"], pdf["payload"], pdf["meta"]):
                if meta["mime"] == "video/mp4":
                    frames = [a for _, _, a in
                              decode_mjpeg_frames(bytes(payload), every_k)]
                    idxs = range(0, every_k * len(frames), every_k)
                elif meta["mime"] == "video/x-pnm-stream":
                    all_frames = decode_pnm_stream(bytes(payload))
                    idxs = range(0, len(all_frames), every_k)
                    frames = [all_frames[i] for i in idxs]
                elif meta["mime"] == "image/gif":
                    from .gif import decode_gif_frames

                    frames = [a for _, _, a in
                              decode_gif_frames(bytes(payload), every_k)]
                    idxs = range(0, every_k * len(frames), every_k)
                elif meta["mime"] == "image/webp":
                    from .webp import decode_webp_frames

                    frames = [a[..., :3] for _, _, a in
                              decode_webp_frames(bytes(payload), every_k)]
                    idxs = range(0, every_k * len(frames), every_k)
                else:
                    continue
                for i, frame in zip(idxs, frames):
                    h, w, _ = frame.shape
                    rows.append(
                        {
                            "media_ref": f"{ref}#{i}", "kind": "image",
                            "payload": encode_ppm(frame),
                            "meta": {"width": w, "height": h, "duration_ms": 0,
                                     "mime": "image/x-portable-pixmap"},
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "payload", "meta"])

    return media.mapInPandas(work, MEDIA_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize through the stub decoder — the shape of a
    real resize stage (decode -> transform -> re-encode bytes)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload, meta in zip(pdf["media_ref"], pdf["payload"], pdf["meta"]):
                img = decode_stub(payload, meta)
                ys = np.linspace(0, img.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, width).astype(int)
                out = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": "image",
                        "payload": out.tobytes(),
                        "meta": {"width": width, "height": height,
                                 "duration_ms": 0, "mime": "image/fake"},
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(work, MEDIA_SCHEMA)
