"""Frozen round-3 char-machine stripper, kept verbatim as the differential
ORACLE for the tokenizer-based stripper (texrex_spark/clean/stripper.py).

This is the per-call advance_to_next_tag() implementation that the master-
regex tokenizer replaced; it was itself fuzz-pinned against the round-1
per-character state machine (commit c393b03), so equality against this
module is transitive equality against the original reference semantics
(/root/reference/src/units/trhtmlstripper.pas).

Imported only by tests/test_stripper_fuzz.py.  Not part of the package.
"""

from __future__ import annotations

from texrex_spark.clean.stripper import (
    _ATTR_DELIM,
    _ENCODING_RE,
    _HREF_RE,
    _HTML4_RE,
    _HTML5_RE,
    _SRC_RE,
    _TAG_NAME,
    _XHTML_RE,
    BREAK_TAGS,
    CONTAINER_TYPES,
    DOCUMENT_CONTAINERS,
    DROP_CONTAINERS,
    TAG_START_CHARS,
    WHITESPACE,
    Div,
    StripperConfig,
    StripResult,
    _WS_RUN,
)
from texrex_spark.functions import urlnorm


def strip_document(raw: str, url: str, config: StripperConfig | None = None) -> StripResult:
    cfg = config or StripperConfig()
    res = StripResult()
    n = len(raw)
    pos = 0  # 0-based cursor (reference is 1-based)
    reading = "outside"  # outside | text | markup(drop)
    drop_close = ""
    doc_close = ""
    cur: Div | None = None
    skipped = 0

    def write_char(ch: str) -> None:
        nonlocal cur
        if cur is None:
            return
        if ch not in WHITESPACE:
            cur.text += ch
        else:
            if cur.text and cur.text[-1] not in WHITESPACE:
                cur.text += " "

    def write_text(chunk: str) -> None:
        nonlocal cur
        if cur is None or not chunk:
            return
        s = _WS_RUN.sub(" ", chunk)
        if s[0] == " " and (not cur.text or cur.text[-1] == " "):
            s = s[1:]
        if s:
            cur.text += s

    def new_div(tag: str) -> None:
        nonlocal cur, skipped
        if cur is None:
            cur = Div()
            res.divs.append(cur)
            skipped = 0
        if len(cur.text) > 0:
            cur.last_raw = pos
            cur.skipped_divs = skipped
            res.events.append(("div", cur))
            for m in cur.media_after:
                res.events.append(("media", m))
            cur = Div()
            res.divs.append(cur)
            skipped = 0
        else:
            skipped += 1
        cur.first_raw = pos
        if tag.startswith("/"):
            raw_tag = tag[1:]
            cur.closing_start = True
        else:
            raw_tag = tag
            cur.closing_start = False
        if raw_tag in CONTAINER_TYPES:
            cur.container = CONTAINER_TYPES[raw_tag]

    def advance_to_next_tag() -> str:
        nonlocal pos, cur
        tag = ""
        anchor_start = -1
        done = False
        while pos < n and not done:
            idx = raw.find("<", pos)
            if idx < 0:
                if reading == "text":
                    write_text(raw[pos:])
                pos = n
                break
            if reading == "text" and idx > pos:
                write_text(raw[pos:idx])
            pos = idx + 1
            tag = ""
            ch0 = raw[pos] if pos < n else ""
            if ch0 == "!":
                if raw.startswith("!--", pos):
                    end = raw.find("-->", pos + 3)
                    pos = (n - 1 if end < 0 else end + 2) + 1
                    tag = "!--"
                    done = True
                    continue
                if raw[pos : pos + 8].lower() == "![cdata[":
                    tag = raw[pos : pos + 8]
                    end = raw.find("]]>", pos + 8)
                    pos = (n - 1 if end < 0 else end + 2) + 1
                    done = True
                    continue
            if ch0 and ch0 not in TAG_START_CHARS and ch0 != " " and ch0 != ">":
                if reading == "text":
                    write_char(raw[pos - 1])
                    write_char(ch0)
                pos += 1
                continue
            tag = _TAG_NAME.match(raw, pos).group(0)
            pos += len(tag)
            if pos >= n:
                break
            ch = raw[pos]
            if ch == " ":
                if tag in ("a", "img"):
                    anchor_start = pos
                pos += 1
                quot = None
                while pos < n:
                    if quot is not None:
                        q = raw.find(quot, pos)
                        if q < 0:
                            pos = n
                            break
                        pos = q + 1
                        quot = None
                        continue
                    m = _ATTR_DELIM.search(raw, pos)
                    if m is None:
                        pos = n
                        break
                    c = m.group(0)
                    if c == ">":
                        gt = m.start()
                        if cfg.extract_anchors and tag == "a" and anchor_start >= 0:
                            _extract_link(raw[anchor_start:gt])
                        if cfg.extract_media and tag == "img" and reading == "text":
                            _extract_media(
                                raw[anchor_start if anchor_start >= 0 else gt:gt]
                            )
                        pos = gt + 1
                        break
                    quot = c
                    pos = m.start() + 1
                done = True
            else:
                pos += 1
                done = True

        tag = tag.lower()
        if cur is not None and len(tag) > 0:
            if tag[0] == "/":
                cur.close_tags += 1
            else:
                cur.open_tags += 1
            if tag[0] == "a":
                cur.anchors += 1
        if tag in ("br", "br/"):
            write_char(" ")
        return tag

    def _extract_link(attr_text: str) -> None:
        if cur is None:
            return
        m = _HREF_RE.search(attr_text)
        if not m:
            return
        link = m.group(1).split()[0] if m.group(1).split() else ""
        if not (cfg.minimal_link_length <= len(link) <= cfg.maximal_link_length):
            return
        if len(link) >= len(attr_text):
            return
        resolved, rel = urlnorm.link_relation(url, link)
        if (
            (rel == urlnorm.SAME_FULL_HOST and cfg.keep_same_virtual_host_links)
            or (rel == urlnorm.SAME_NON_VIRTUAL_HOST and cfg.keep_same_host_links)
            or (rel == urlnorm.DIFFERENT_HOSTS and cfg.keep_external_links)
        ):
            res.links.append((resolved, rel))

    def _extract_media(attr_text: str) -> None:
        m = _SRC_RE.search(attr_text)
        if not m:
            return
        if cur is not None and cur.text:
            cur.media_after.append(m.group(1))
        else:
            res.events.append(("media", m.group(1)))

    while pos < n and reading == "outside":
        tag = advance_to_next_tag()
        if tag in DOCUMENT_CONTAINERS:
            reading = "text"
            doc_close = "/" + tag
            res.raw_header = raw[:pos]
            m = _ENCODING_RE.search(res.raw_header)
            if m:
                res.source_charset = m.group(1)
            if _XHTML_RE.search(res.raw_header):
                res.doctype = "xhtml"
            elif _HTML4_RE.search(res.raw_header):
                res.doctype = "html4"
            elif _HTML5_RE.search(res.raw_header):
                res.doctype = "html5"
            new_div(tag)

    while pos < n and reading != "outside":
        tag = advance_to_next_tag()
        if tag == doc_close:
            reading = "outside"
        elif tag in DOCUMENT_CONTAINERS:
            reading = "outside"
        elif drop_close == "" and tag in DROP_CONTAINERS:
            reading = "markup"
            drop_close = "/" + tag
        elif drop_close == tag:
            reading = "text"
            drop_close = ""
        elif reading == "text" and tag in BREAK_TAGS:
            new_div(tag)

    new_div("")
    return res
