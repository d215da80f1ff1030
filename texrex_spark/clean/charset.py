"""Charset conversion (/root/reference/src/units/trcharsetconverter.pas).

- header/declared charset wins; when absent or unknown, detect on the
  first 32 KB only (:96, 106-114)
- declared ISO-8859-1 is treated as Windows-1252 (:120-129) — the web's
  de-facto rule
- output is UTF-8 (Python str)

Detection uses charset_normalizer when importable, else falls back to
cp1252 (the reference's most common correction target).  The synthetic
corpus is UTF-8 end to end; this stage is exercised by unit tests over
crafted byte strings.
"""

from __future__ import annotations

_DETECT_CLAMP = 32 * 1024

try:
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover
    _cn_from_bytes = None

_ISO_TO_WIN = {"iso-8859-1", "iso8859-1", "latin-1", "latin1"}


def resolve_charset(declared: str | None, raw: bytes) -> str:
    if declared:
        cs = declared.strip().lower()
        if cs in _ISO_TO_WIN:
            return "cp1252"
        try:
            b"".decode(cs)
            return cs
        except LookupError:
            pass
    if _cn_from_bytes is not None:
        best = _cn_from_bytes(raw[:_DETECT_CLAMP]).best()
        if best is not None and best.encoding:
            enc = best.encoding.lower()
            return "cp1252" if enc in _ISO_TO_WIN else enc
    return "cp1252"


def to_utf8(raw: bytes, declared: str | None = None) -> tuple[str, str]:
    """Decode raw bytes -> (text, charset_used); undecodable bytes are
    replaced (the reference converts div-wise and invalidates failures —
    our validator stage catches replacement-heavy divs downstream)."""
    cs = resolve_charset(declared, raw)
    try:
        return raw.decode(cs, errors="replace"), cs
    except LookupError:
        return raw.decode("cp1252", errors="replace"), "cp1252"
