"""ISO BMFF (MP4) container: pure-stdlib box parser + MJPEG-in-MP4 writer.

The reference corpus engine has no media tier at all; this module exists
for the training-data-pipeline mandate (multimodal columns: video as an
opaque ``binary`` column with typed metadata, frame-sample as a Pandas
UDF stage).  Everything here is the public ISO/IEC 14496-12 box grammar:

- ``parse_mp4`` walks the box tree (``moov``/``trak``/``mdia``/``minf``/
  ``stbl``) and materializes per-track metadata plus the full sample
  table — codec fourcc from ``stsd``, sizes from ``stsz``, chunk offsets
  from ``stco``/``co64``, chunk→sample mapping from ``stsc``, timestamps
  from ``stts`` — resolved to absolute ``(offset, size, t_ms)`` triples.
- ``encode_mjpeg_mp4`` writes a valid single-track MJPEG movie (codec
  fourcc ``jpeg`` — Motion-JPEG stored one baseline-JPEG per sample, the
  classic QuickTime layout) using the in-repo baseline JPEG encoder, so
  the whole container round-trips with zero third-party libraries.
- ``decode_mjpeg_frames`` is the real frame-sample kernel: sample table →
  byte ranges → per-frame baseline-JPEG decode.  Compressed inter-frame
  codecs (H.264 etc.) remain the documented NotImplementedError tier.

Scale note: the parser only ever slices the payload by (offset, size);
on a cluster the same sample-table walk drives range reads against the
object store, so frame-sampling a 100 TB video corpus never materializes
more than the ``moov`` header plus the kept frames per task.

Hardening mirrors the JPEG decoder's: every read is bounds-checked, all
table counts are validated against the payload length, and malformed
input raises ``ValueError`` — never an unbounded allocation.
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf"}
# any single sample table larger than this is a corrupt/hostile header,
# not a real movie this engine would frame-sample in one task
MAX_SAMPLES = 1_000_000


class Mp4Error(ValueError):
    pass


def _u32(buf: bytes, off: int) -> int:
    if off + 4 > len(buf):
        raise Mp4Error("mp4: truncated u32")
    return struct.unpack_from(">I", buf, off)[0]


def _u64(buf: bytes, off: int) -> int:
    if off + 8 > len(buf):
        raise Mp4Error("mp4: truncated u64")
    return struct.unpack_from(">Q", buf, off)[0]


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end)."""
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4Error("mp4: truncated box header")
        size = _u32(buf, off)
        typ = buf[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            size = _u64(buf, off + 8)
            body = off + 16
        elif size == 0:  # box extends to the end of the enclosing space
            size = end - off
        if size < body - off or off + size > end:
            raise Mp4Error(f"mp4: box {typ!r} size {size} escapes its parent")
        yield typ, body, off + size
        off += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for typ, b, e in _walk(buf, start, end):
        if typ == fourcc:
            return b, e
    return None


def _fullbox(buf: bytes, off: int) -> tuple[int, int]:
    """(version, body offset past the version/flags word)."""
    if off + 4 > len(buf):
        raise Mp4Error("mp4: truncated fullbox")
    return buf[off], off + 4


def _parse_stsd(buf: bytes, b: int, e: int) -> dict:
    _, off = _fullbox(buf, b)
    n = _u32(buf, off)
    if n < 1:
        return {"codec": "", "width": 0, "height": 0}
    entry = off + 4
    size = _u32(buf, entry)
    if size < 16 or entry + size > e:
        raise Mp4Error("mp4: bad stsd entry")
    codec = buf[entry + 4 : entry + 8].decode("latin-1").strip()
    width = height = 0
    if size >= 36:
        # VisualSampleEntry: 8 box hdr + 6 reserved + 2 dref idx +
        # 2+2+12 pre_defined/reserved, then width/height u16
        width = struct.unpack_from(">H", buf, entry + 32)[0]
        height = struct.unpack_from(">H", buf, entry + 34)[0]
    return {"codec": codec, "width": width, "height": height}


def _parse_table(buf: bytes, b: int, per_entry: int) -> tuple[int, int]:
    """(entry count, offset of first entry) with a sanity cap."""
    _, off = _fullbox(buf, b)
    n = _u32(buf, off)
    if n > MAX_SAMPLES or off + 4 + n * per_entry > len(buf):
        raise Mp4Error("mp4: sample table escapes payload")
    return n, off + 4


def _parse_track(buf: bytes, b: int, e: int, mvhd_timescale: int) -> dict:
    info: dict = {"kind": "", "codec": "", "width": 0, "height": 0,
                  "timescale": 1, "duration_ms": 0}
    tkhd = _find(buf, b, e, b"tkhd")
    if tkhd:
        ver, off = _fullbox(buf, tkhd[0])
        # width/height are the LAST two 16.16 words of the box
        info["width"] = _u32(buf, tkhd[1] - 8) >> 16
        info["height"] = _u32(buf, tkhd[1] - 4) >> 16
    mdia = _find(buf, b, e, b"mdia")
    if not mdia:
        return info
    mdhd = _find(buf, mdia[0], mdia[1], b"mdhd")
    if mdhd:
        ver, off = _fullbox(buf, mdhd[0])
        if ver == 1:
            ts, dur = _u32(buf, off + 16), _u64(buf, off + 20)
        else:
            ts, dur = _u32(buf, off + 8), _u32(buf, off + 12)
        info["timescale"] = max(ts, 1)
        info["duration_ms"] = int(dur * 1000 / max(ts, 1))
    hdlr = _find(buf, mdia[0], mdia[1], b"hdlr")
    if hdlr:
        _, off = _fullbox(buf, hdlr[0])
        info["kind"] = {b"vide": "video", b"soun": "audio"}.get(
            buf[off + 4 : off + 8], buf[off + 4 : off + 8].decode("latin-1")
        )
    minf = _find(buf, mdia[0], mdia[1], b"minf")
    stbl = minf and _find(buf, minf[0], minf[1], b"stbl")
    if not stbl:
        return info
    sb, se = stbl

    stsd = _find(buf, sb, se, b"stsd")
    if stsd:
        d = _parse_stsd(buf, *stsd)
        info["codec"] = d["codec"]
        info["width"] = info["width"] or d["width"]
        info["height"] = info["height"] or d["height"]

    # sample sizes
    sizes: list[int] = []
    stsz = _find(buf, sb, se, b"stsz")
    if stsz:
        _, off = _fullbox(buf, stsz[0])
        fixed = _u32(buf, off)
        n = _u32(buf, off + 4)
        if n > MAX_SAMPLES:
            raise Mp4Error("mp4: stsz count escapes payload")
        if fixed:
            sizes = [fixed] * n
        else:
            if off + 8 + n * 4 > len(buf):
                raise Mp4Error("mp4: stsz table escapes payload")
            sizes = [_u32(buf, off + 8 + 4 * i) for i in range(n)]

    # chunk offsets (stco 32-bit or co64 64-bit)
    chunks: list[int] = []
    stco = _find(buf, sb, se, b"stco")
    co64 = _find(buf, sb, se, b"co64")
    if stco:
        n, off = _parse_table(buf, stco[0], 4)
        chunks = [_u32(buf, off + 4 * i) for i in range(n)]
    elif co64:
        n, off = _parse_table(buf, co64[0], 8)
        chunks = [_u64(buf, off + 8 * i) for i in range(n)]

    # chunk -> samples-per-chunk runs
    stsc_entries: list[tuple[int, int]] = []
    stsc = _find(buf, sb, se, b"stsc")
    if stsc:
        n, off = _parse_table(buf, stsc[0], 12)
        stsc_entries = [
            (_u32(buf, off + 12 * i), _u32(buf, off + 12 * i + 4))
            for i in range(n)
        ]

    # decode timestamps
    deltas: list[int] = []
    stts = _find(buf, sb, se, b"stts")
    if stts:
        n, off = _parse_table(buf, stts[0], 8)
        for i in range(n):
            cnt = _u32(buf, off + 8 * i)
            delta = _u32(buf, off + 8 * i + 4)
            if len(deltas) + cnt > MAX_SAMPLES:
                raise Mp4Error("mp4: stts count escapes payload")
            deltas.extend([delta] * cnt)

    # resolve absolute (offset, size, t_ms) per sample
    samples: list[tuple[int, int, int]] = []
    si = 0
    t = 0
    for ci, chunk_off in enumerate(chunks):
        per = 1
        for first, count in stsc_entries:
            if ci + 1 >= first:
                per = count
        off = chunk_off
        for _ in range(per):
            if si >= len(sizes):
                break
            size = sizes[si]
            if off + size > len(buf):
                raise Mp4Error("mp4: sample escapes payload")
            t_ms = int(t * 1000 / info["timescale"])
            samples.append((off, size, t_ms))
            t += deltas[si] if si < len(deltas) else 0
            off += size
            si += 1
    info["n_samples"] = len(samples)
    info["samples"] = samples
    return info


def parse_mp4(payload: bytes) -> dict:
    """Container metadata + resolved sample tables for every track."""
    moov = _find(payload, 0, len(payload), b"moov")
    if not moov:
        raise Mp4Error("mp4: no moov box")
    out: dict = {"timescale": 1000, "duration_ms": 0, "tracks": []}
    mvhd = _find(payload, moov[0], moov[1], b"mvhd")
    if mvhd:
        ver, off = _fullbox(payload, mvhd[0])
        if ver == 1:
            ts, dur = _u32(payload, off + 16), _u64(payload, off + 20)
        else:
            ts, dur = _u32(payload, off + 8), _u32(payload, off + 12)
        out["timescale"] = max(ts, 1)
        out["duration_ms"] = int(dur * 1000 / max(ts, 1))
    for typ, b, e in _walk(payload, moov[0], moov[1]):
        if typ == b"trak":
            out["tracks"].append(
                _parse_track(payload, b, e, out["timescale"])
            )
    return out


# --------------------------------------------------------------------------
# writer: single-track MJPEG movie
# --------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mjpeg_mp4(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """A valid single-track MJPEG ``.mp4``: one baseline JPEG per sample
    in ``mdat``, full ``moov`` sample tables (one chunk per sample), movie
    and media timescale 1000, constant frame duration 1000//fps ms."""
    from .jpeg import encode_jpeg

    if not frames:
        raise Mp4Error("mp4: no frames")
    jpegs = [encode_jpeg(f, quality=quality, subsampling=subsampling) for f in frames]
    h, w = frames[0].shape[:2]
    delta = max(1000 // fps, 1)
    duration = delta * len(jpegs)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    mdat = _box(b"mdat", b"".join(jpegs))
    base = len(ftyp) + 8  # first sample starts right after the mdat header
    offsets = []
    off = base
    for j in jpegs:
        offsets.append(off)
        off += len(j)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\0" * 8 + _MATRIX + b"\0" * 24 + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\0" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\0" * 12 + b"VideoHandler\0",
    )
    entry = (
        b"\0" * 6 + struct.pack(">H", 1)  # data_reference_index
        + b"\0" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + b"\0" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, len(jpegs), delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(jpegs))
        + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def video_track(payload: bytes) -> dict:
    """First video track of an MP4, or Mp4Error."""
    info = parse_mp4(payload)
    for t in info["tracks"]:
        if t.get("kind") == "video":
            t = dict(t)
            t["container_duration_ms"] = info["duration_ms"]
            return t
    raise Mp4Error("mp4: no video track")


def decode_mjpeg_frames(
    payload: bytes, every_k: int = 1
) -> list[tuple[int, int, np.ndarray]]:
    """Frame-sample kernel: every k-th sample of the first video track,
    decoded to RGB via the in-repo baseline JPEG decoder.  Returns
    ``(frame_index, t_ms, array)`` triples.  Non-MJPEG codecs raise
    NotImplementedError (the H.264/H.265 tier needs libav, absent
    here)."""
    from .jpeg import decode_jpeg

    track = video_track(payload)
    if track.get("codec") not in ("jpeg", "mjpa", "mjpb"):
        raise NotImplementedError(
            f"no decoder for MP4 codec {track.get('codec')!r} in this "
            "container (needs av); frame-sampling supports MJPEG"
        )
    out = []
    for i, (off, size, t_ms) in enumerate(track["samples"]):
        if i % every_k:
            continue
        out.append((i, t_ms, decode_jpeg(payload[off : off + size])))
    return out
