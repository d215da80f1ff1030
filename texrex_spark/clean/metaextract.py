"""Meta extraction from the raw HTML header
(/root/reference/src/units/trmetaextractor.pas:101-179): title, keywords,
author, description, robots meta, via case-insensitive regexes over the
text before <body>."""

from __future__ import annotations

import re

_PATTERNS = {
    "title": re.compile(r"<title[^>]*>([^<]*)</title", re.IGNORECASE | re.DOTALL),
    "keywords": re.compile(
        r'<meta[^>]+name=["\']?keywords["\']?[^>]+content=["\']([^"\']*)["\']',
        re.IGNORECASE,
    ),
    "author": re.compile(
        r'<meta[^>]+name=["\']?author["\']?[^>]+content=["\']([^"\']*)["\']',
        re.IGNORECASE,
    ),
    "description": re.compile(
        r'<meta[^>]+name=["\']?description["\']?[^>]+content=["\']([^"\']*)["\']',
        re.IGNORECASE,
    ),
    "robots_meta": re.compile(
        r'<meta[^>]+name=["\']?robots["\']?[^>]+content=["\']([^"\']*)["\']',
        re.IGNORECASE,
    ),
}


def extract_meta(raw_header: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for key, pat in _PATTERNS.items():
        m = pat.search(raw_header)
        if m:
            out[key] = " ".join(m.group(1).split())
    return out
