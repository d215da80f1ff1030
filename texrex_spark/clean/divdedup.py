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

# text -> hash memo across documents in the same task: boilerplate divs
# (nav bars, footers) repeat across most pages of a host, and the hash is
# a pure function of the text.  Bounded by entry count AND by per-entry
# length: keys are the div texts themselves, so without the length cap a
# corpus of large unique divs could pin multi-GB of strings per Python
# worker (boilerplate lives in short divs; long divs gain nothing from
# the memo and just pay one Rabin pass).
_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_MAX = 200_000
_HASH_CACHE_MAX_TEXT = 4096


def _hasher() -> Rabin64:
    global _rabin
    if _rabin is None:
        _rabin = Rabin64(DEFAULT_POLY)
    return _rabin


def dedupe_divs(divs, character_threshold: int = CHARACTER_THRESHOLD) -> None:
    if len(divs) < 2:
        return
    h = _hasher()
    # One vectorized Rabin pass over the document's cache-miss divs
    # (rabin.hash_batch, bit-identical to the scalar kernel) instead of a
    # per-div Python block loop — the div hash was 17% of clean-chain CPU
    # in bench/profile_chain.py before batching.
    eligible = [
        (i, d) for i, d in enumerate(divs) if len(d.text) >= character_threshold
    ]
    local: dict[str, int] = {}
    misses = list(
        dict.fromkeys(
            d.text for _, d in eligible if d.text not in _HASH_CACHE
        )
    )
    if misses:
        for text, hv in zip(misses, h.hash_batch([t.encode("utf-8") for t in misses])):
            local[text] = hv
            if len(text) <= _HASH_CACHE_MAX_TEXT:
                if len(_HASH_CACHE) >= _HASH_CACHE_MAX:
                    _HASH_CACHE.clear()
                _HASH_CACHE[text] = hv
    seen: dict[int, int] = {}
    for i, d in eligible:
        hv = _HASH_CACHE.get(d.text)
        if hv is None:
            hv = local[d.text]
        if hv in seen:
            d.dup_of = seen[hv]
        else:
            seen[hv] = i
