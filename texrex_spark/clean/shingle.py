"""MinHash shingler (/root/reference/src/units/trshingler.pas:97-150).

5-token n-grams concatenated (no separator), left-padded with spaces to at
least 9 chars (PadLeft, :127-129), hashed under the first 100 deterministic
Rabin polynomials; fingerprint[i] = min over n-grams of hash_i.

Vectorized: all n-grams of a document hash under all 100 polynomials in
length-grouped numpy passes (functions/rabin.py), then a column-min.
"""

from __future__ import annotations

import numpy as np

from ..functions.rabin import get_provider

NGRAM_SIZE = 5
HASHES_NUMBER = 100
_PAD_TO = 9


def shingles(tokens: list[str], ngram_size: int = NGRAM_SIZE) -> list[bytes]:
    n = len(tokens) - ngram_size + 1
    if n < 1:
        return []
    out = []
    for i in range(n):
        g = "".join(tokens[i : i + ngram_size])
        if len(g) < _PAD_TO:
            g = g.rjust(_PAD_TO)
        out.append(g.encode("utf-8"))
    return out


def fingerprint(
    tokens: list[str], ngram_size: int = NGRAM_SIZE, hashes: int = HASHES_NUMBER
) -> np.ndarray | None:
    """(hashes,) uint64 MinHash fingerprint, or None if too few tokens."""
    grams = shingles(tokens, ngram_size)
    if not grams:
        return None
    provider = get_provider(hashes)
    all_hashes = provider.hash_batch(grams)  # (n_grams, hashes)
    return all_hashes.min(axis=0)


def fingerprint_signed(tokens: list[str], **kw) -> list[int] | None:
    """Signed-int64 bit-cast for Spark LongType columns."""
    fp = fingerprint(tokens, **kw)
    if fp is None:
        return None
    return fp.view(np.int64).tolist()


# Per-process scratch for the (total_grams, hashes) hash matrix: glibc
# munmaps blocks this size on every free, so without reuse each Arrow
# batch re-faults ~50 MB of pages (pathologically slow on some
# virtualized hosts).  Workers are single-threaded; bounded at 256 MB so
# one monster batch can't pin unbounded memory.
_SCRATCH: dict[str, np.ndarray] = {}
_SCRATCH_CAP_BYTES = 256 * 1024 * 1024


def _gram_scratch(total: int, hashes: int) -> np.ndarray:
    nbytes = total * hashes * 8
    if nbytes > _SCRATCH_CAP_BYTES:
        return np.empty((total, hashes), dtype=np.uint64)
    cur = _SCRATCH.get("h")
    if cur is None or cur.shape[0] < total or cur.shape[1] != hashes:
        cur = np.empty((total, hashes), dtype=np.uint64)
        _SCRATCH["h"] = cur
    return cur[:total]


def fingerprint_batch_signed(
    tokens_per_doc: list[list[str]],
    ngram_size: int = NGRAM_SIZE,
    hashes: int = HASHES_NUMBER,
) -> list[list[int] | None]:
    """Fingerprints for a whole Arrow batch of documents in one pass.

    Per-doc hashing leaves tiny length groups (a doc has ~10² shingles
    spread over ~30 distinct byte lengths, so the numpy kernel runs on
    n≈5 slivers); flattening the batch makes groups ~batch-size larger.
    Bit-identical to per-doc fingerprint_signed: the same shingle bytes
    hash under the same polynomials, and min is order-independent —
    segment-reduced per doc with np.minimum.reduceat.

    Gram bytes are never materialized as Python objects: each token is
    UTF-8-encoded once into a single batch buffer, each gram is an index
    frame (start, byte length, pad) into it, and equal-effective-length
    frames gather into one (n, L) uint8 matrix per group.  PadLeft(9)
    semantics (trshingler.pas:127-129) count CHARACTERS — the frame's pad
    is 9 - char-length while the hash runs over the UTF-8 bytes — and the
    padded positions all index one shared space byte appended to the
    buffer.  No gram-level dedup: measured dup rate on cleaned streams is
    ~5% (div-dedup upstream already removed repeated boilerplate, which
    is where gram repetition lives), far under the ~20% where a sort-based
    unique would pay for itself against the hash kernel."""
    n_docs = len(tokens_per_doc)
    out: list[list[int] | None] = [None] * n_docs
    doc_tok_counts = np.fromiter(
        map(len, tokens_per_doc), dtype=np.int64, count=n_docs
    )
    gram_counts = np.maximum(doc_tok_counts - (ngram_size - 1), 0)
    total = int(gram_counts.sum())
    if total == 0:
        return out
    flat_toks = [t for toks in tokens_per_doc for t in toks]
    n_toks = len(flat_toks)
    clens = np.fromiter(map(len, flat_toks), dtype=np.int64, count=n_toks)
    # byte lengths == char lengths for ASCII docs (the common case); only
    # non-ASCII docs pay per-token encodes for their byte lengths
    doc_strs = ["".join(toks) for toks in tokens_per_doc]
    blens = clens.copy()
    pos = 0
    for d, toks in enumerate(tokens_per_doc):
        k = len(toks)
        if k and not doc_strs[d].isascii():
            blens[pos : pos + k] = [len(t.encode("utf-8")) for t in toks]
        pos += k
    bcum = np.concatenate(([0], np.cumsum(blens)))
    ccum = np.concatenate(([0], np.cumsum(clens)))
    # first-token index of every gram, batch-wide (ragged arange; grams
    # never cross a doc boundary by construction of the counts)
    doc_tok_starts = np.concatenate(([0], np.cumsum(doc_tok_counts)[:-1]))
    nonempty = np.flatnonzero(gram_counts)
    ne_counts = gram_counts[nonempty]
    g0 = np.repeat(doc_tok_starts[nonempty], ne_counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(
            np.concatenate(([0], np.cumsum(ne_counts)[:-1])), ne_counts
        )
    )
    bstarts = bcum[g0]
    gclen = ccum[g0 + ngram_size] - ccum[g0]
    pads = np.maximum(_PAD_TO - gclen, 0)
    efflens = (bcum[g0 + ngram_size] - bstarts) + pads
    buf = np.frombuffer(("".join(doc_strs) + " ").encode("utf-8"), dtype=np.uint8)
    space_pos = len(buf) - 1
    provider = get_provider(hashes)
    all_hashes = _gram_scratch(total, hashes)
    # int32 frame indices unless the batch buffer is past 2 GiB (Arrow
    # batches are ~MBs); gathers run in row chunks so the index matrix and
    # gathered rows stay L2-resident instead of materializing (n, L)
    # temps per group — large fresh temps are also pathologically slow to
    # first-touch under concurrent executors on some hosts.
    idt = np.int32 if len(buf) < 2**31 else np.int64
    chunk = 8192
    for length in np.unique(efflens):
        rows = np.flatnonzero(efflens == length)
        cols = np.arange(length, dtype=idt)[None, :]
        for s in range(0, len(rows), chunk):
            r = rows[s : s + chunk]
            pad_g = pads[r][:, None].astype(idt)
            idx = bstarts[r][:, None].astype(idt) + cols - pad_g
            if pad_g.any():
                idx = np.where(cols < pad_g, idt(space_pos), idx)
            all_hashes[r] = provider.hash_matrix(buf[idx])
    starts = np.concatenate(([0], np.cumsum(ne_counts)[:-1]))
    mins = np.minimum.reduceat(all_hashes, starts, axis=0)  # (docs+, hashes)
    signed_rows = mins.view(np.int64).tolist()  # one C pass, not per-doc
    for row, doc_i in enumerate(nonempty):
        out[int(doc_i)] = signed_rows[row]
    return out
