"""Second pass: entity conversion (double-wash) + tag/email/URI/hashtag
blanking with per-div counts (/root/reference/src/units/trsecondpass.pas).

Regexes are the reference's quasi-constants (trsecondpass.pas:131-138),
compiled with the ``regex`` module for \\p{L}/\\p{N} parity with ICU.
Double-wash = the converter applied twice, catching '&amp;acirc;'
(trsecondpass.pas:251-253).  Empty divs are invalidated (:278-280).
"""

from __future__ import annotations

import regex

from .entities import convert_string
from .stripper import Div

MATCH_TAG = regex.compile(r" *<[A-Za-z!?/][^>]*> *", regex.IGNORECASE)
MATCH_EMAIL = regex.compile(
    r" *[\p{L}0-9._-]+\@[\p{L}0-9._-]+\.[\p{L}]{2,8} *", regex.IGNORECASE
)
MATCH_URI = regex.compile(
    r" *\p{L}{2,6}://[\p{L}\p{N}_/%$&,=?~#.+:;-]+[\p{L}\p{N}_/%$=?~#-] *"
    r"| *www\.[\p{L}\p{N}_/%$&,=?~#.+:;-]+[\p{L}\p{N}_/%$=?~#-] *",
    regex.IGNORECASE,
)
MATCH_HASHTAG = regex.compile(r" *#[\p{L}\p{N}]*[\p{L}][\p{L}\p{N}]* *", regex.IGNORECASE)

# cheap URI-gate probe: same truth value as ('://' in text or 'www.' in
# text.lower()) but without allocating a lowercased copy of every div
_URI_PROBE = regex.compile(r"://|www\.", regex.IGNORECASE)


class SecondPassConfig:
    cleanse_tags = True
    cleanse_email = True
    cleanse_uri = True
    cleanse_hashtag = True
    double_wash_entities = True
    email_replacer = " "
    uri_replacer = " "
    hashtag_replacer = " "


def cleanse(
    text: str, cfg: SecondPassConfig | None = None
) -> tuple[str, int, int, int, int]:
    """Single-scan variant: subn replaces findall+sub (one regex pass
    instead of two, identical non-overlapping match count), and each
    pattern runs only when its cheap necessary substring is present —
    most div texts contain no '<', '@', '://' or '#', so the common case
    is four memchr probes and zero regex scans."""
    cfg = cfg or SecondPassConfig()
    tags = emails = uris = hashtags = 0
    if cfg.cleanse_tags and "<" in text:
        text, tags = MATCH_TAG.subn(" ", text)
    if cfg.cleanse_email and "@" in text:
        text, emails = MATCH_EMAIL.subn(cfg.email_replacer, text)
    if cfg.cleanse_uri and _URI_PROBE.search(text) is not None:
        text, uris = MATCH_URI.subn(cfg.uri_replacer, text)
    if cfg.cleanse_hashtag and "#" in text:
        text, hashtags = MATCH_HASHTAG.subn(cfg.hashtag_replacer, text)
    return text, tags, emails, uris, hashtags


def second_pass(divs: list[Div], cfg: SecondPassConfig | None = None) -> None:
    cfg = cfg or SecondPassConfig()
    for d in divs:
        if d.valid:
            washed = convert_string(d.text)
            # double wash catches '&amp;acirc;' (trsecondpass.pas:251-253);
            # identity return means no conversion happened, and an
            # unconverted text is a fixpoint — the rescan is a no-op
            if cfg.double_wash_entities and washed is not d.text:
                washed = convert_string(washed)
            d.text = washed
            d.text, d.cleansed_tags, d.cleansed_emails, d.cleansed_uris, \
                d.cleansed_hashtags = cleanse(d.text, cfg)
        if d.text == "":
            d.valid = False
