"""Pure-stdlib ICO (favicon) codec.

Derives from the public Windows ICO format: an ICONDIR header, one
ICONDIRENTRY per image, and per-image payloads that are either a PNG
stream or a BMP DIB — a BITMAPINFOHEADER whose biHeight covers BOTH the
XOR (color) bitmap and the 1-bit AND (transparency) mask stacked
bottom-up.  Favicons are among the most-fetched objects in any web
crawl, which is why this sits in the brief's multimodal tier next to
PNG/JPEG/GIF/WebP/TIFF (the reference corpus tool has no media).

Supported: 32-bpp BGRA (alpha from the pixel data), 24/8/4/1-bpp with
palette and the AND mask as alpha, PNG-compressed entries (routed
through the in-repo PNG codec), multi-image files (``decode_ico``
returns the largest, ``ico_frames`` returns all).  The encoder writes
32-bpp DIB entries with a real AND mask.  Compressed DIBs other than
PNG raise NotImplementedError.

Untrusted-payload posture mirrors the other codecs: dimension caps
before allocation, bounds-checked offsets, ``IcoError`` (a
``ValueError``) on malformed structure — pinned by test_codec_fuzz.
"""

from __future__ import annotations

import struct

import numpy as np


class IcoError(ValueError):
    pass


MAX_PIXELS = 64_000_000
MAX_IMAGES = 256  # the count field is 16-bit; real files hold < 20

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_dib(data: bytes) -> np.ndarray:
    """One ICO DIB (BITMAPINFOHEADER + palette + XOR + AND) -> (h, w, 4)
    RGBA uint8."""
    if len(data) < 40:
        raise IcoError("short DIB header")
    (hdr_size, w, h2, planes, bpp, compression) = struct.unpack_from(
        "<IiihhI", data, 0
    )
    if hdr_size != 40:
        raise IcoError(f"unsupported DIB header size {hdr_size}")
    if compression != 0:
        raise NotImplementedError(
            f"compressed ICO DIB (biCompression={compression})"
        )
    if h2 <= 0 or h2 % 2 or w <= 0:
        raise IcoError("ICO DIB height must be positive and even (XOR+AND)")
    h = h2 // 2
    if w * h > MAX_PIXELS:
        raise IcoError("ICO image too large")
    if bpp not in (1, 4, 8, 24, 32):
        raise NotImplementedError(f"{bpp}-bpp ICO DIB")
    pos = hdr_size
    palette = None
    if bpp <= 8:
        n_colors = 1 << bpp
        if pos + 4 * n_colors > len(data):
            raise IcoError("ICO palette overruns entry")
        pal = np.frombuffer(data, np.uint8, 4 * n_colors, pos).reshape(-1, 4)
        palette = pal[:, [2, 1, 0]]  # BGRX -> RGB
        pos += 4 * n_colors
    # XOR bitmap: rows padded to 32 bits, stored bottom-up
    xor_stride = ((w * bpp + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    if pos + h * xor_stride + h * and_stride > len(data):
        raise IcoError("ICO bitmap data overruns entry")
    xor = np.frombuffer(data, np.uint8, h * xor_stride, pos).reshape(
        h, xor_stride
    )[::-1]
    pos += h * xor_stride
    anded = np.frombuffer(data, np.uint8, h * and_stride, pos).reshape(
        h, and_stride
    )[::-1]
    mask_bits = np.unpackbits(anded, axis=1)[:, :w]  # 1 = transparent
    if bpp == 32:
        px = xor.reshape(h, xor_stride // 4, 4)[:, :w]
        rgba = px[..., [2, 1, 0, 3]].copy()
        if not rgba[..., 3].any():
            # legacy 32-bpp files with an all-zero alpha channel rely on
            # the AND mask instead
            rgba[..., 3] = np.where(mask_bits == 1, 0, 255)
        return rgba
    if bpp == 24:
        px = xor[:, : w * 3].reshape(h, w, 3)
        rgb = px[..., [2, 1, 0]]
    else:
        if bpp == 8:
            idx = xor[:, :w]
        else:
            per = 8 // bpp
            bits = np.unpackbits(xor, axis=1).reshape(h, -1, 8)
            # big-endian packing within each byte: leftmost pixel first
            vals = np.zeros((h, bits.shape[1] * per), np.uint8)
            for k in range(per):
                chunk = bits[:, :, k * bpp:(k + 1) * bpp]
                v = np.zeros((h, bits.shape[1]), np.uint8)
                for b in range(bpp):
                    v = (v << 1) | chunk[:, :, b]
                vals[:, k::per] = v
            idx = vals[:, :w]
        if int(idx.max()) >= len(palette):
            raise IcoError("ICO palette index out of range")
        rgb = palette[idx.astype(np.int64)]
    alpha = np.where(mask_bits == 1, 0, 255).astype(np.uint8)
    return np.concatenate([rgb, alpha[..., None]], axis=-1)


def ico_frames(payload: bytes) -> list:
    """ICO payload -> [(width, height, (h, w, 4) RGBA uint8), ...] in
    directory order."""
    payload = bytes(payload)
    if len(payload) < 6:
        raise IcoError("short ICO header")
    reserved, ico_type, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or ico_type not in (1, 2):
        raise IcoError("not an ICO/CUR payload")
    if not 1 <= count <= MAX_IMAGES:
        raise IcoError("implausible ICO image count")
    if 6 + 16 * count > len(payload):
        raise IcoError("ICO directory overruns file")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        size, data_off = struct.unpack_from("<II", payload, off + 8)
        if data_off + size > len(payload):
            raise IcoError("ICO image data overruns file")
        data = payload[data_off:data_off + size]
        if data[:8] == _PNG_MAGIC:
            from .multimodal import decode_png

            img = decode_png(data)
            if img.ndim == 2:
                img = np.stack([img] * 3 + [np.full_like(img, 255)], -1)
            elif img.shape[2] == 2:  # gray + alpha
                img = np.stack(
                    [img[..., 0]] * 3 + [img[..., 1]], -1
                )
            elif img.shape[2] == 3:
                img = np.concatenate(
                    [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], -1
                )
            rgba = img
        else:
            rgba = _decode_dib(data)
        out.append((rgba.shape[1], rgba.shape[0], rgba))
    return out


def decode_ico(payload: bytes) -> np.ndarray:
    """ICO payload -> the largest image as (h, w, 4) RGBA uint8 (the
    variant a crawl pipeline would feature-extract)."""
    frames = ico_frames(payload)
    return max(frames, key=lambda f: f[0] * f[1])[2]


def encode_ico(images: list | np.ndarray) -> bytes:
    """Image or list of images -> ICO with 32-bpp DIB entries (BGRA XOR
    bitmap + a real AND mask derived from zero-alpha pixels)."""
    if isinstance(images, np.ndarray):
        images = [images]
    if not 1 <= len(images) <= MAX_IMAGES:
        raise ValueError("ICO holds 1..256 images")
    entries = []
    for img in images:
        img = np.asarray(img, np.uint8)
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if img.ndim != 3 or img.shape[2] not in (3, 4):
            raise ValueError("encode_ico wants (h,w), (h,w,3) or (h,w,4)")
        h, w = img.shape[:2]
        if w > 256 or h > 256:
            raise ValueError("ICO images are at most 256x256")
        if img.shape[2] == 3:
            img = np.concatenate(
                [img, np.full((h, w, 1), 255, np.uint8)], -1
            )
        bgra = img[..., [2, 1, 0, 3]]
        xor = bgra[::-1].reshape(h, w * 4).tobytes()
        and_stride = ((w + 31) // 32) * 4
        mask = (img[..., 3] == 0).astype(np.uint8)[::-1]
        packed = np.packbits(mask, axis=1)
        rows = np.zeros((h, and_stride), np.uint8)
        rows[:, :packed.shape[1]] = packed
        header = struct.pack("<IiihhIIiiII", 40, w, 2 * h, 1, 32, 0,
                             len(xor) + h * and_stride, 0, 0, 0, 0)
        entries.append((w, h, header + xor + rows.tobytes()))
    out = struct.pack("<HHH", 0, 1, len(entries))
    data_off = 6 + 16 * len(entries)
    dir_part = b""
    blob = b""
    for w, h, data in entries:
        dir_part += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(data),
            data_off + len(blob),
        )
        blob += data
    return out + dir_part + blob
