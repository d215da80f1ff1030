"""Vectorized variable-width LZW decoding shared by the GIF and TIFF
codecs (r06; guide §1.2 "per-task work" / §4.2 vectorize-inside-the-UDF).

The scalar decoders walked the code stream byte-by-byte in Python and
materialized every table entry as a bytes object.  This module decodes in
numpy passes instead, exploiting two structural facts:

1. **Code widths are a deterministic schedule.**  Within one clear-to-
   clear segment the table grows by exactly one entry per code after the
   first, so the width-bump positions depend only on the code *index* —
   codes can be gathered for the whole segment in one vectorized pass
   (3-byte windows + shifts), then cut at the first Clear/EOI actually
   found.

2. **Entries are prefix chains.**  Entry ``base + n - 1`` created while
   reading code ``n`` is ``entry(code[n-1]) + first_byte(entry(code[n]))``,
   so ``prefix[base+n-1] = code[n-1]`` is one vectorized assignment and
   the first/last bytes fall out of a pointer walk over ``prefix`` — no
   bytes concatenation ever happens.  Output bytes are written by walking
   every emitted code's chain simultaneously (one numpy pass per chain
   level).

Semantics are bit-identical to the scalar loops (differentially tested in
tests/test_lzw_vec.py): same early-change quirk, same "first code after a
clear must be a root" and "code beyond table" errors raised only if the
offending code is actually reached before the output is complete, same
stop-as-soon-as-expected-bytes behaviour, same truncation.
"""

from __future__ import annotations

import numpy as np


def _width_pieces(base: int, first_width: int, early_delta: int, max_width: int):
    """(start_code_index, width) pieces for one clear-to-clear segment.

    Reading code ``n`` (0-based, n >= 1) appends one table entry, making
    the table size ``base + n``; the scalar loops bump the width after the
    append that reaches ``(1 << w) - early_delta``."""
    pieces = [(0, first_width)]
    w = first_width
    while w < max_width:
        n = (1 << w) - early_delta - base
        pieces.append((n + 1, w + 1))
        w += 1
    return pieces


def _extract_codes(
    d: np.ndarray, start_bit: int, pieces, max_codes: int,
    total_bits: int, lsb_first: bool,
):
    """Gather up to ``max_codes`` codes from ``start_bit`` following the
    width schedule.  Returns (codes, ends) with ends[n] = bit offset just
    past code n; stops at the last code that fully fits in total_bits."""
    widths = np.empty(max_codes, dtype=np.int64)
    bounds = [p[0] for p in pieces] + [max_codes]
    for (n0, w), n1 in zip(pieces, bounds[1:]):
        if n0 >= max_codes:
            break
        widths[n0:min(n1, max_codes)] = w
    ends = start_bit + np.cumsum(widths)
    n_fit = int(np.searchsorted(ends, total_bits, side="right"))
    if n_fit == 0:
        return ends[:0], ends[:0]
    widths = widths[:n_fit]
    ends = ends[:n_fit]
    offs = ends - widths
    b = (offs >> 3).astype(np.int64)
    r = (offs & 7).astype(np.int64)
    if lsb_first:
        # bit i of the stream is (data[i>>3] >> (i&7)) & 1, code bits are
        # least-significant first -> little-endian 3-byte window >> r
        val24 = d[b] | (d[b + 1] << 8) | (d[b + 2] << 16)
        codes = (val24 >> r) & ((np.int64(1) << widths) - 1)
    else:
        val24 = (d[b] << 16) | (d[b + 1] << 8) | d[b + 2]
        codes = (val24 >> (24 - r - widths)) & ((np.int64(1) << widths) - 1)
    return codes, ends


def lzw_decode_vec(
    data: bytes,
    expected: int,
    *,
    base_roots: int,
    first_width: int,
    max_width: int,
    early_delta: int,
    lsb_first: bool,
    err_cls: type[Exception],
    msg_exhausted: str,
    msg_first: str,
    msg_short: str,
) -> bytes:
    """Decode an LZW stream to exactly ``expected`` bytes.

    base_roots: number of literal root codes (256 for TIFF, 1 << mcs for
    GIF); Clear = base_roots, EOI = base_roots + 1, new entries start at
    base_roots + 2.  early_delta: 2 for TIFF's early change, 0 for GIF.
    """
    clear = base_roots
    eoi = base_roots + 1
    base = base_roots + 2
    pieces = _width_pieces(base, first_width, early_delta, max_width)
    d = np.frombuffer(data + b"\x00\x00", dtype=np.uint8).astype(np.int64)
    total_bits = len(data) * 8
    out = np.empty(max(expected, 0), dtype=np.uint8)
    produced = 0
    bitpos = 0

    while produced < expected:
        need = expected - produced + 1
        codes, ends = _extract_codes(d, bitpos, pieces, need, total_bits, lsb_first)
        # cut the segment at the first Clear / EOI
        stop = np.flatnonzero((codes == clear) | (codes == eoi))
        if stop.size:
            k = int(stop[0])
            seg = codes[:k]
            bitpos = int(ends[k])  # past the Clear/EOI code itself
            ended_by = "eoi" if codes[k] == eoi else "clear"
        else:
            seg = codes
            if ends.size:
                bitpos = int(ends[-1])
            ended_by = "bits"
        n = seg.size
        if n == 0:
            if ended_by == "clear":
                continue
            raise err_cls(msg_exhausted if ended_by == "bits" else msg_short)
        # --- deferred validation: find the first ill-formed code; codes at
        # or past it are only an error if the output actually needs them
        # (the scalar loop reads one code at a time and stops as soon as
        # the output is complete)
        pending_err = None
        if seg[0] >= base_roots:
            raise err_cls(msg_first)  # reached immediately: output incomplete here
        if n > 1:
            limit = base + np.arange(n - 1, dtype=np.int64)  # max legal for code i+1
            bad = np.flatnonzero(seg[1:] > limit)
            if bad.size:
                n = int(bad[0]) + 1  # keep codes 0 .. bad-1
                seg = seg[:n]
                pending_err = err_cls("LZW: code beyond table")
        # --- prefix links (vectorized): entry base+i-1 has prefix seg[i-1]
        prefix = np.full(base + max(n - 1, 0), -1, dtype=np.int64)
        if n > 1:
            prefix[base: base + n - 1] = seg[:-1]
        # --- depth + root literal of every emitted code via pointer walk
        depth = np.ones(n, dtype=np.int64)
        root = seg.copy()
        active = np.flatnonzero(root >= base)
        while active.size:
            root[active] = prefix[root[active]]
            depth[active] += 1
            active = active[root[active] >= base]
        # suffix byte of entry base+i-1 = first (root) byte of entry(seg[i])
        suffix = np.full(prefix.size, -1, dtype=np.int64)
        suffix[:base_roots] = np.arange(base_roots, dtype=np.int64)
        if n > 1:
            suffix[base: base + n - 1] = root[1:]
        # --- output offsets; stop at the first code that completes it
        ends_out = produced + np.cumsum(depth)
        n_keep = min(int(np.searchsorted(ends_out, expected, side="left")) + 1, n)
        seg_k = seg[:n_keep]
        ends_k = ends_out[:n_keep]
        # --- write walk: each chain writes its deepest byte first (at the
        # entry's last position), then follows prefix links backwards
        cur = seg_k.copy()
        pos = ends_k - 1
        active = np.arange(n_keep, dtype=np.int64)
        while active.size:
            p = pos[active]
            ok = p < expected  # only the final truncated entry can exceed
            wa = active[ok]
            out[pos[wa]] = suffix[cur[wa]]
            cur[active] = prefix[cur[active]]
            pos[active] -= 1
            active = active[cur[active] >= 0]
        produced = min(int(ends_k[-1]), expected)
        if produced >= expected:
            break
        if pending_err is not None:
            raise pending_err  # output still incomplete at the bad code
        if ended_by == "bits":
            raise err_cls(msg_exhausted)
        if ended_by == "eoi":
            break
    if produced < expected:
        raise err_cls(msg_short)
    return out.tobytes()
