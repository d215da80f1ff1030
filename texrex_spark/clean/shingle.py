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
