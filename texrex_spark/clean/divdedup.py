"""In-document div deduplication
(/root/reference/src/units/trdivdeduplicator.pas:148-216).

Rabin-64 hash (the DEFAULT polynomial 0xE5FE94D7ABBF88A1, not the
provider's first — trdivdeduplicator uses TTrRabin64.Create without args,
trrabinhash.pas:118-121) of each div's text; a later div with an identical
hash gets ``dup_of = first_index``.  Divs below the character threshold are
skipped.  Documents with < 2 divs are skipped entirely (:188-189).
"""

from __future__ import annotations

from ..functions.rabin import Rabin64

DEFAULT_POLY = 0xE5FE94D7ABBF88A1
CHARACTER_THRESHOLD = 3

_rabin: Rabin64 | None = None


def _hasher() -> Rabin64:
    global _rabin
    if _rabin is None:
        _rabin = Rabin64(DEFAULT_POLY)
    return _rabin


def dedupe_divs(divs, character_threshold: int = CHARACTER_THRESHOLD) -> None:
    if len(divs) < 2:
        return
    h = _hasher()
    seen: dict[int, int] = {}
    for i, d in enumerate(divs):
        if len(d.text) < character_threshold:
            continue
        hv = h.hash(d.text.encode("utf-8"))
        if hv in seen:
            d.dup_of = seen[hv]
        else:
            seen[hv] = i
