"""Pure-stdlib GIF87a/89a codec (LZW + palette), the last common web
image format in the real-decode tier.

Like the PNG (multimodal.py) and JPEG (jpeg.py) codecs, everything here
derives from the public specification (GIF89a, CompuServe 1990; LZW per
Welch 1984 as profiled by the GIF spec's variable-width variant) — no
codec libraries exist in this container, and the reference corpus tool
has no media at all, so this is brief-relative scope (multimodal columns
for a training-data pipeline).

Supported: global/local color tables, interlaced images (the 8/8/4/2
four-pass row order), animation (multiple image descriptors with Graphic
Control Extensions: per-frame delay, transparency index, disposal
methods 0-3), LZW minimum code sizes 2-8.  The encoder emits a real
variable-width LZW stream (table reset at 4096 codes) over an adaptive
palette (exact if <= 256 distinct colors, else a 3-3-2 uniform cube).

Malformed input raises ``GifError`` (a ``ValueError``) — the same
untrusted-payload contract the other codecs pin in test_codec_fuzz.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


_GIF87 = b"GIF87a"
_GIF89 = b"GIF89a"

# Untrusted-payload posture: a GIF header may claim up to 65535x65535
# (~4.3 G pixels) and LZW's quadratic amplification lets a few-MB
# payload legitimately fill it — a memory-DoS, not a parse error.  Cap
# the decoded pixel count per frame (and the logical screen) well above
# any real web image but far below the bomb range.  64 MP RGB is
# ~192 MB per frame.
MAX_PIXELS = 64_000_000


# ---------------------------------------------------------------- LZW
def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW -> uint8 index array of length n_pixels.

    r06: decoding runs through the shared vectorized kernel
    (operators/lzw.py); ``_lzw_decode_scalar`` is the original loop, kept
    as the differential reference (tests/test_lzw_vec.py)."""
    from .lzw import lzw_decode_vec

    if not (2 <= min_code_size <= 8):
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    max_codes = (len(data) * 8) // (min_code_size + 1)
    if n_pixels > max_codes * (max_codes + 1) // 2:
        raise GifError("LZW stream too short for claimed image size")
    out = lzw_decode_vec(
        data,
        n_pixels,
        base_roots=1 << min_code_size,
        first_width=min_code_size + 1,
        max_width=12,
        early_delta=0,
        lsb_first=True,
        err_cls=GifError,
        msg_exhausted="LZW stream exhausted before image was complete",
        msg_first="LZW: first code after clear is not a root",
        msg_short="LZW stream ended before image was complete",
    )
    return np.frombuffer(out, dtype=np.uint8).copy()


def _lzw_decode_scalar(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Original per-code Python loop (differential reference for the
    vectorized kernel)."""
    if not (2 <= min_code_size <= 8):
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    max_codes = (len(data) * 8) // (min_code_size + 1)
    if n_pixels > max_codes * (max_codes + 1) // 2:
        raise GifError("LZW stream too short for claimed image size")
    clear = 1 << min_code_size
    eoi = clear + 1
    # LSB-first plain-int bit reservoir over the sub-block-joined stream:
    # decoding is sequential (each code's width depends on table growth),
    # so the loop stays Python — but on int ops and bytes concatenation it
    # runs ~10x the old per-bit numpy walk
    pos = 0
    dlen = len(data)
    bitbuf = 0
    bitcnt = 0

    out = bytearray()
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    code_size = min_code_size + 1
    mask = (1 << code_size) - 1
    prev: bytes | None = None

    while len(out) < n_pixels:
        while bitcnt < code_size:
            if pos >= dlen:
                raise GifError("LZW stream exhausted before image was complete")
            bitbuf |= data[pos] << bitcnt
            pos += 1
            bitcnt += 8
        code = bitbuf & mask
        bitbuf >>= code_size
        bitcnt -= code_size
        if code == clear:
            table = list(roots)
            code_size = min_code_size + 1
            mask = (1 << code_size) - 1
            prev = None
            continue
        if code == eoi:
            break
        n_table = len(table)
        if prev is None:
            if code >= n_table:
                raise GifError("LZW: first code after clear is not a root")
            entry = table[code]
        elif code < n_table:
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == n_table:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("LZW: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
            mask = (1 << code_size) - 1
    if len(out) < n_pixels:
        raise GifError("LZW stream ended before image was complete")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8).copy()


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array -> GIF variable-width LZW bytes (LSB-first)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    data = indices.tobytes()
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        if next_code == 4096:
            emit(clear, code_size)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        else:
            table[wc] = next_code
            # GIF quirk: the width bump happens when next_code EXCEEDS the
            # current width's range (decoder adds the entry before reading)
            if next_code == (1 << code_size):
                code_size += 1
            next_code += 1
        w = c
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode
def _read_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; returns (data,
    position after the 0-terminator)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise GifError("truncated sub-block chain")
        sz = payload[pos]
        pos += 1
        if sz == 0:
            return b"".join(chunks), pos
        if pos + sz > n:
            raise GifError("truncated sub-block")
        chunks.append(payload[pos : pos + sz])
        pos += sz


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def parse_gif(payload: bytes, max_frames: int | None = None) -> dict:
    """Structural parse: screen descriptor + per-frame raw indices.

    Returns {"width", "height", "background_rgb", "frames": [{"x", "y",
    "w", "h", "indices", "palette", "transparent", "delay_cs",
    "disposal"}, ...], "loop": bool}.

    ``max_frames`` stops both parsing AND LZW decoding after that many
    frames — single-frame consumers (decode_gif) don't pay for decoding
    a long animation's tail.
    """
    if payload[:6] not in (_GIF87, _GIF89):
        raise GifError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise GifError("truncated GIF header")
    w, h, flags, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise GifError("zero-sized GIF screen")
    if w * h > MAX_PIXELS:
        raise GifError("GIF logical screen exceeds decoder pixel cap")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(payload):
            raise GifError("truncated global color table")
        gct = (
            np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3).copy()
        )
        pos += 3 * n
    bg_rgb = (
        tuple(int(v) for v in gct[bg_idx])
        if gct is not None and bg_idx < len(gct)
        else (0, 0, 0)
    )

    frames = []
    loop = False
    transparent = None
    delay_cs = 0
    disposal = 0
    n_bytes = len(payload)
    while True:
        if pos >= n_bytes:
            raise GifError("GIF ended without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n_bytes:
                raise GifError("truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # Graphic Control
                gflags, delay_cs, t_idx = struct.unpack_from("<BHB", data, 0)
                transparent = t_idx if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
            elif label == 0xFF and data[:11] == b"NETSCAPE2.0":
                loop = True
            continue
        if block != 0x2C:  # image descriptor
            raise GifError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n_bytes:
            raise GifError("truncated image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if iw == 0 or ih == 0 or ix + iw > w or iy + ih > h:
            raise GifError("image descriptor outside the logical screen")
        if iw * ih > MAX_PIXELS:
            raise GifError("GIF frame exceeds decoder pixel cap")
        palette = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > n_bytes:
                raise GifError("truncated local color table")
            palette = (
                np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3).copy()
            )
            pos += 3 * n
        if palette is None:
            raise GifError("image has no color table")
        if pos >= n_bytes:
            raise GifError("truncated image data")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_blocks(payload, pos)
        idx = _lzw_decode(data, min_code, iw * ih).reshape(ih, iw)
        if int(idx.max(initial=0)) >= len(palette):
            raise GifError("pixel index beyond color table")
        if iflags & 0x40:
            idx = _deinterlace(idx)
        frames.append(
            {
                "x": ix, "y": iy, "w": iw, "h": ih,
                "indices": idx, "palette": palette,
                "transparent": transparent,
                "delay_cs": delay_cs, "disposal": disposal,
            }
        )
        transparent = None
        delay_cs = 0
        disposal = 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise GifError("GIF has no image data")
    return {
        "width": w, "height": h, "background_rgb": bg_rgb,
        "frames": frames, "loop": loop,
    }


def decode_gif_frames(
    payload: bytes, every_k: int = 1, max_frames: int | None = None
) -> list:
    """Composited RGB frames [(frame_no, delay_cs, (h, w, 3) uint8), ...]
    taking every k-th frame — the animation twin of mp4.decode_mjpeg_frames.
    Disposal methods: 0/1 leave the canvas, 2 restores the frame rect to
    the background color, 3 restores the previous canvas.  ``max_frames``
    bounds the number of frames DECODED (not just returned) — compositing
    frame i never needs frames past i, so callers wanting only the first
    frame skip the animation tail entirely."""
    g = parse_gif(payload, max_frames=max_frames)
    h, w = g["height"], g["width"]
    canvas = np.empty((h, w, 3), np.uint8)
    canvas[:] = g["background_rgb"]
    out = []
    for i, fr in enumerate(g["frames"]):
        before = canvas.copy() if fr["disposal"] == 3 else None
        sl = canvas[fr["y"] : fr["y"] + fr["h"], fr["x"] : fr["x"] + fr["w"]]
        rgb = fr["palette"][fr["indices"]]
        if fr["transparent"] is not None:
            opaque = fr["indices"] != fr["transparent"]
            sl[opaque] = rgb[opaque]
        else:
            sl[:] = rgb
        if i % every_k == 0:
            out.append((i, fr["delay_cs"], canvas.copy()))
        if fr["disposal"] == 2:
            sl[:] = g["background_rgb"]
        elif fr["disposal"] == 3 and before is not None:
            canvas = before
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB — only frame 0 is
    LZW-decoded, however long the animation."""
    return decode_gif_frames(payload, max_frames=1)[0][2]


# ---------------------------------------------------------------- encode
def _palettize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(indices uint8 (h, w), palette (n, 3)): exact palette when the
    image has <= 256 distinct colors, else a 3-3-2 uniform cube."""
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return inverse.reshape(h, w).astype(np.uint8), colors.astype(np.uint8)
    # nearest-level 3-3-2 (rounding halves the truncation error: max
    # per-channel error 255/14 resp. 255/6 instead of a full level)
    f = flat.astype(np.uint16)
    r3 = (f[:, 0] * 7 + 127) // 255
    g3 = (f[:, 1] * 7 + 127) // 255
    b2 = (f[:, 2] * 3 + 127) // 255
    idx = ((r3 << 5) | (g3 << 2) | b2).astype(np.uint8)
    lv = np.arange(256, dtype=np.uint16)
    pal = np.stack(
        [
            ((lv >> 5) * 255 + 3) // 7,
            (((lv >> 2) & 0x07) * 255 + 3) // 7,
            ((lv & 0x03) * 255 + 1) // 3,
        ],
        axis=1,
    ).astype(np.uint8)
    return idx.reshape(h, w), pal


def _color_table_bytes(palette: np.ndarray) -> tuple[bytes, int]:
    """Padded-to-power-of-two table bytes + the descriptor size field."""
    n = len(palette)
    size_field = max(1, (max(n, 2) - 1).bit_length() - 1)
    padded = 2 << size_field
    tbl = np.zeros((padded, 3), np.uint8)
    tbl[:n] = palette
    return tbl.tobytes(), size_field


def encode_gif_frames(
    frames: list, delay_cs: int = 10, loop: bool = True
) -> bytes:
    """(h, w, 3) uint8 frames -> animated GIF89a (or single-frame when
    len(frames) == 1).  Every frame carries its own local color table, so
    frames may use disjoint palettes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if w > 65535 or h > 65535:
        raise ValueError("frame too large for GIF")
    out = bytearray(_GIF89)
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global table
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for img in frames:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        if img.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        indices, palette = _palettize(img)
        tbl, size_field = _color_table_bytes(palette)
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | size_field)
        out += tbl
        min_code = max(2, size_field + 1)
        out.append(min_code)
        lzw = _lzw_encode(indices.reshape(-1), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Single-frame GIF89a from (h, w, 3) RGB or (h, w) gray uint8."""
    return encode_gif_frames([img])
