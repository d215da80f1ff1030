"""HTML-entity conversion with the reference's scanner semantics
(/root/reference/src/units/trentityconverters.pas).

``html.unescape`` is NOT equivalent (SURVEY.md §2.4): the reference scanner
has a minimum hypothesis length (>2 incl. '&'), a length cap (content
abandoned past 8 chars after '&'), a restricted entity alphabet
[#A-Za-z0-9], hex capped at 4 digits, unknown entities left verbatim,
results '' / ' ' skipped, and — critically — numeric entities in the
Win-1252 range $80-$9F remapped to the real codepoints (rogue CP1252
documents, trentityconverters.pas:473-508).

Named entities: the reference ships the HTML4 table (254 entries,
trentityconverters.pas:84-343); Python's ``html.entities.name2codepoint``
is the same public HTML4 set and is used here.  (The reference table has a
typo making '&diams;' unconvertible; we convert it — divergence noted.)
"""

from __future__ import annotations

import re
from html.entities import name2codepoint

_ENTITY_CHARS = set("#abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
_HEX_RE = re.compile(r"&#[xX]([0-9a-fA-F]{1,4});")
_DEC_RE = re.compile(r"&#([0-9]+);")

WIN1252_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


def convert_entity(entity: str) -> str:
    """Convert one '&...;' hypothesis (trentityconverters.pas:434-508).

    Falls back to a space (codepoint 32) exactly like StrToIntDef(..., 32),
    which the scanner then treats as "skip the replacement"."""
    m = _HEX_RE.search(entity)
    if m:
        cp = int(m.group(1), 16)
    else:
        name = entity[1:-1] if entity.startswith("&") and entity.endswith(";") else ""
        if name in name2codepoint:
            cp = name2codepoint[name]
        else:
            d = _DEC_RE.search(entity)
            cp = int(d.group(1)) if d else 32
    cp = WIN1252_REMAP.get(cp, cp)
    try:
        return chr(cp)
    except ValueError:
        return " "


def convert_string(s: str) -> str:
    """Scanner parity with ConvertString (trentityconverters.pas:345-434):
    hypotheses start at '&', grow over [#A-Za-z0-9] to at most 8 chars
    after '&', convert on ';' when length > 2; '' or ' ' results leave the
    original text untouched."""
    if "&" not in s:
        return s
    out = []
    i = 0
    n = len(s)
    any_converted = False
    while i < n:
        # bulk-copy the run up to the next '&' (identical to the per-char
        # copy loop; a failed hypothesis below consumes its failing char —
        # even another '&' — so the resume point is always correct)
        amp = s.find("&", i)
        if amp < 0:
            out.append(s[i:])
            break
        if amp > i:
            out.append(s[i:amp])
        i = amp
        # hypothesis: scan forward.  On failure the scanner consumes up to
        # and including the failing char — it is never reconsidered as a
        # new '&' start (HypoReset + Inc(LPos) in the same iteration,
        # trentityconverters.pas:404-430).
        j = i + 1
        length = 1
        converted = None
        failed_through = None
        while j < n:
            cj = s[j]
            if cj == ";":
                if length > 2:
                    ent = s[i : j + 1]
                    rep = convert_entity(ent)
                    if rep not in ("", " "):
                        converted = (rep, j + 1)
                if converted is None:
                    failed_through = j
                break
            elif cj not in _ENTITY_CHARS or length > 7:
                failed_through = j
                break
            else:
                length += 1
                j += 1
        if converted is not None:
            out.append(converted[0])
            i = converted[1]
            any_converted = True
        elif failed_through is not None:
            out.append(s[i : failed_through + 1])
            i = failed_through + 1
        else:  # ran off the end mid-hypothesis
            out.append(s[i:])
            i = n
    # Return the ORIGINAL object when nothing converted: the scan is a
    # pure function of the text, so an unchanged result is a fixpoint —
    # callers (second_pass double wash) use the identity to skip a rescan.
    return "".join(out) if any_converted else s
