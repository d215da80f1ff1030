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
    segment-reduced per doc with np.minimum.reduceat."""
    grams_per_doc = [shingles(t, ngram_size) for t in tokens_per_doc]
    counts = np.fromiter((len(g) for g in grams_per_doc), dtype=np.int64,
                         count=len(grams_per_doc))
    flat = [g for grams in grams_per_doc for g in grams]
    out: list[list[int] | None] = [None] * len(grams_per_doc)
    if not flat:
        return out
    provider = get_provider(hashes)
    all_hashes = provider.hash_batch(flat)  # (total_grams, hashes)
    nonempty = np.flatnonzero(counts > 0)
    starts = np.concatenate(([0], np.cumsum(counts[nonempty])[:-1]))
    mins = np.minimum.reduceat(all_hashes, starts, axis=0)  # (docs+, hashes)
    signed = mins.view(np.int64)
    for row, doc_i in enumerate(nonempty):
        out[int(doc_i)] = signed[row].tolist()
    return out
