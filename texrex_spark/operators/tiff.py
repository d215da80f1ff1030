"""Pure-stdlib TIFF 6.0 codec (baseline + LZW + PackBits).

Everything here derives from the public TIFF 6.0 specification (Adobe,
1992): the II/MM header, IFD entry grammar, strip organisation, the
PackBits RLE of section 9, the TIFF variant of LZW from section 13
(MSB-first code packing, 9-bit initial width, the "early change" width
bump one code before the table fills), and the horizontal-differencing
predictor (tag 317) of section 14.  Like the PNG/JPEG/GIF/WebP codecs
this is brief-relative scope — the reference corpus tool has no media —
and no codec libraries exist in this container, so the encoder is the
fixture source and the decoder is the crawl-facing parser.

Supported: 8-bit grayscale, RGB, RGBA, and palette-color images,
chunky planar configuration, multi-strip files, both byte orders on
decode, compression none (1) / LZW (5) / PackBits (32773), predictor 2
for LZW.  Honest stubs: other bit depths, planar configuration 2, and
the JPEG-in-TIFF / CCITT fax compressions raise NotImplementedError.

Untrusted-payload posture mirrors gif.py/webp.py: claimed dimensions
are capped (MAX_PIXELS) before allocation, every offset is
bounds-checked, decompressors are output-bounded, and malformed
structure raises ``TiffError`` (a ``ValueError``) — pinned by
test_codec_fuzz.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


MAX_PIXELS = 64_000_000  # same cap as gif.py / webp.py
MAX_IFD_ENTRIES = 4096  # a real IFD has ~10-30 entries

# IFD value types -> (struct code, size)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


# ------------------------------------------------------------- PackBits
def packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF section 9 RLE; output exactly ``expected`` bytes."""
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected:
        if i >= n:
            raise TiffError("PackBits stream exhausted")
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1 bytes
            if i + c + 1 > n:
                raise TiffError("PackBits literal overruns stream")
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= n:
                raise TiffError("PackBits repeat overruns stream")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # c == 128: no-op per spec
    if len(out) > expected:
        raise TiffError("PackBits run overruns strip")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        j = i + 1
        while (
            j < n and j - i < 128
            and not (j + 1 < n and data[j] == data[j + 1])
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ----------------------------------------------------------- TIFF LZW
# Section 13: MSB-first packing, codes 0..255 literal, 256 Clear,
# 257 EOI, table starts at 258, width starts at 9 and bumps one code
# EARLY (at table size 511/1023/2047), max width 12.
_CLEAR, _EOI = 256, 257


def lzw_decode(data: bytes, expected: int) -> bytes:
    """MSB-first TIFF LZW -> exactly ``expected`` bytes.

    r06: decoding runs through the shared vectorized kernel
    (operators/lzw.py — numpy code gather + prefix-chain walk, no Python
    per-code loop); ``lzw_decode_scalar`` below is the original loop,
    kept as the differential reference (tests/test_lzw_vec.py)."""
    from .lzw import lzw_decode_vec

    return lzw_decode_vec(
        data,
        expected,
        base_roots=256,
        first_width=9,
        max_width=12,
        early_delta=2,
        lsb_first=False,
        err_cls=TiffError,
        msg_exhausted="LZW stream exhausted before strip complete",
        msg_first="LZW: first code after clear is not a literal",
        msg_short="LZW strip ended before expected size",
    )


def lzw_decode_scalar(data: bytes, expected: int) -> bytes:
    out = bytearray()
    buf = 0
    cnt = 0
    pos = 0
    n = len(data)
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def reset():
        nonlocal width, table, prev
        width = 9
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        prev = None

    reset()
    while len(out) < expected:
        while cnt < width:
            if pos >= n:
                raise TiffError("LZW stream exhausted before strip complete")
            buf = (buf << 8) | data[pos]
            pos += 1
            cnt += 8
        code = (buf >> (cnt - width)) & ((1 << width) - 1)
        cnt -= width
        buf &= (1 << cnt) - 1  # drop consumed high bits (keep buf small)
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            break
        n_table = len(table)
        if prev is None:
            if code >= 256:
                raise TiffError("LZW: first code after clear is not a literal")
            entry = table[code]
        elif code < n_table:
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == n_table:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError("LZW: code beyond table")
        out += entry
        prev = entry
        # "early change": the reader's table lags the writer's by one
        # entry at the same code index (the first code after a clear
        # adds nothing), so the reader bumps at 2^w - 2 (510/1022/2046)
        # where the writer bumps at 2^w - 1 — the well-known TIFF quirk
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise TiffError("LZW strip ended before expected size")
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8
            acc &= (1 << accbits) - 1

    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_CLEAR, width)
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change, mirroring the decoder: the decoder adds its
        # table entry while READING the code we emit next, so the bump
        # happens when the table is one short of full
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4093:  # leave room, then restart the dictionary
            emit(_CLEAR, width)
            width = 9
            table = {bytes([j]): j for j in range(256)}
            next_code = 258
        w = c
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------- decode
def _read_ifd_value(data: bytes, entry_off: int, fmt: str) -> list[int]:
    typ, count = struct.unpack_from(fmt + "HI", data, entry_off + 2)
    if typ not in _TYPES:
        return []  # RATIONAL etc: not needed for any supported tag
    code, size = _TYPES[typ]
    total = size * count
    if count > MAX_IFD_ENTRIES:
        raise TiffError("IFD value count implausible")
    if total <= 4:
        off = entry_off + 8
    else:
        off = struct.unpack_from(fmt + "I", data, entry_off + 8)[0]
    if off + total > len(data):
        raise TiffError("IFD value overruns file")
    return list(struct.unpack_from(fmt + code * count, data, off))


def parse_tiff(payload: bytes) -> dict:
    """Header + first IFD -> {'width', 'height', 'samples', 'bits',
    'photometric', 'compression', 'predictor', 'strips': [(off, size)],
    'rows_per_strip', 'colormap'}."""
    payload = bytes(payload)
    if len(payload) < 8:
        raise TiffError("short TIFF header")
    if payload[:2] == b"II":
        fmt = "<"
    elif payload[:2] == b"MM":
        fmt = ">"
    else:
        raise TiffError("not a TIFF payload (no II/MM byte order)")
    magic, ifd_off = struct.unpack_from(fmt + "HI", payload, 2)
    if magic != 42:
        raise TiffError("bad TIFF magic")
    if ifd_off + 2 > len(payload):
        raise TiffError("IFD offset overruns file")
    n_entries = struct.unpack_from(fmt + "H", payload, ifd_off)[0]
    if n_entries == 0 or n_entries > MAX_IFD_ENTRIES:
        raise TiffError("implausible IFD entry count")
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise TiffError("IFD overruns file")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from(fmt + "H", payload, off)[0]
        tags[tag] = _read_ifd_value(payload, off, fmt)
    def one(tag, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise TiffError(f"required TIFF tag {tag} missing")
            return default
        return v[0]
    w = one(256)
    h = one(257)
    if w < 1 or h < 1 or w * h > MAX_PIXELS:
        raise TiffError("TIFF dimensions out of range")
    samples = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8-bit TIFF samples supported")
    if len(bits) not in (1, samples):
        raise TiffError("BitsPerSample count disagrees with samples")
    compression = one(259, 1)
    if compression not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} needs external codecs"
        )
    if one(284, 1) != 1:
        raise NotImplementedError("planar TIFF (PlanarConfiguration=2)")
    photometric = one(262)
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise TiffError(f"unknown TIFF predictor {predictor}")
    offs = tags.get(273)
    sizes = tags.get(279)
    if not offs or not sizes or len(offs) != len(sizes):
        raise TiffError("strip offsets/sizes missing or mismatched")
    for o, s in zip(offs, sizes):
        if o + s > len(payload):
            raise TiffError("strip overruns file")
    colormap = None
    if photometric == 3:
        cm = tags.get(320)
        if not cm or len(cm) != 3 * 256:
            raise TiffError("palette TIFF without a 256-entry ColorMap")
        colormap = np.array(cm, np.uint32).reshape(3, 256)
    elif photometric not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photometric}")
    return {
        "width": w, "height": h, "samples": samples, "bits": 8,
        "photometric": photometric, "compression": compression,
        "predictor": predictor,
        "strips": list(zip(offs, sizes)),
        "rows_per_strip": one(278, h),
        "colormap": colormap,
    }


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF payload -> (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA
    uint8 (palette images resolve through their ColorMap; photometric 0
    inverts to the usual black-is-zero convention)."""
    info = parse_tiff(payload)
    w, h, samples = info["width"], info["height"], info["samples"]
    rps = max(info["rows_per_strip"], 1)
    row_bytes = w * samples
    raw = bytearray()
    rows_done = 0
    for off, size in info["strips"]:
        rows = min(rps, h - rows_done)
        if rows <= 0:
            break
        expected = rows * row_bytes
        chunk = bytes(payload[off:off + size])
        if info["compression"] == 1:
            if len(chunk) < expected:
                raise TiffError("uncompressed strip shorter than expected")
            chunk = chunk[:expected]
        elif info["compression"] == 5:
            chunk = lzw_decode(chunk, expected)
        else:
            chunk = packbits_decode(chunk, expected)
        raw += chunk
        rows_done += rows
    if rows_done < h:
        raise TiffError("TIFF strips cover fewer rows than ImageLength")
    img = np.frombuffer(bytes(raw), np.uint8).reshape(h, w * samples)
    if info["predictor"] == 2:
        img = np.cumsum(
            img.reshape(h, w, samples).astype(np.uint32), axis=1,
            dtype=np.uint32,
        ).astype(np.uint8).reshape(h, w * samples)
    img = img.reshape(h, w, samples) if samples > 1 else img.reshape(h, w)
    if info["photometric"] == 0:  # WhiteIsZero
        img = (255 - img.astype(np.uint32)).astype(np.uint8)
    if info["colormap"] is not None:
        if samples != 1:
            raise TiffError("palette TIFF with multiple samples")
        # ColorMap entries are 16-bit; 8-bit writers scale by 257
        cm8 = (info["colormap"] // 257).astype(np.uint8)
        return np.stack([cm8[c][img] for c in range(3)], axis=-1)
    if samples in (3, 4):
        return img
    if samples == 1:
        return img
    raise NotImplementedError(f"{samples}-sample TIFF")


# --------------------------------------------------------------- encode
def encode_tiff(
    img: np.ndarray,
    *,
    compression: str = "lzw",
    predictor: bool = False,
    rows_per_strip: int = 32,
) -> bytes:
    """(h, w[, 3|4]) uint8 -> little-endian TIFF with one IFD and
    real strips; compression in {'none', 'lzw', 'packbits'}; predictor
    applies TIFF horizontal differencing (LZW only, per the spec)."""
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        samples, photometric = 1, 1
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        samples, photometric = img.shape[2], 2
    else:
        raise ValueError("encode_tiff wants (h,w), (h,w,3) or (h,w,4)")
    comp_id = {"none": 1, "lzw": 5, "packbits": 32773}.get(compression)
    if comp_id is None:
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and comp_id != 5:
        raise ValueError("predictor 2 is specified for LZW compression")
    h, w = img.shape[:2]
    data = img.reshape(h, w, samples)
    if predictor:
        d = data.astype(np.int16)
        data = np.concatenate(
            [d[:, :1], (d[:, 1:] - d[:, :-1]) & 0xFF], axis=1
        ).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = data[y0:y0 + rows_per_strip].tobytes()
        if comp_id == 5:
            strips.append(lzw_encode(raw))
        elif comp_id == 32773:
            strips.append(packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)

    entries = []  # (tag, type, count, value_or_bytes)
    def short(tag, *vals):
        entries.append((tag, 3, vals))
    def long_(tag, *vals):
        entries.append((tag, 4, vals))
    short(256, w)
    short(257, h)
    short(258, *([8] * samples))
    short(259, comp_id)
    short(262, photometric)
    long_(273, *[0] * n_strips)  # patched below
    short(277, samples)
    short(278, rows_per_strip)
    long_(279, *[len(s) for s in strips])
    if samples == 4:
        short(338, 2)  # unassociated alpha
    if predictor:
        short(317, 2)
    entries.sort(key=lambda e: e[0])

    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd_size = 2 + 12 * len(entries) + 4
    # overflow area for values wider than 4 bytes, then strip data
    overflow_off = 8 + ifd_size
    overflow = bytearray()
    packed = []
    for tag, typ, vals in entries:
        size = _TYPES[typ][1] * len(vals)
        blob = struct.pack("<" + _TYPES[typ][0] * len(vals), *vals)
        if size <= 4:
            packed.append((tag, typ, len(vals), blob.ljust(4, b"\x00"), None))
        else:
            packed.append((tag, typ, len(vals),
                           struct.pack("<I", overflow_off + len(overflow)),
                           len(overflow)))
            overflow += blob
    data_off = overflow_off + len(overflow)
    offs = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    # patch StripOffsets (tag 273) now that layout is known
    out = bytearray(header)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val4, ovf in packed:
        if tag == 273:
            blob = struct.pack("<" + "I" * n_strips, *offs)
            if len(blob) <= 4:
                val4 = blob.ljust(4, b"\x00")
            else:
                overflow[ovf:ovf + len(blob)] = blob
        out += struct.pack("<HHI", tag, typ, count) + val4
    out += struct.pack("<I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
