"""HTML stripper: a faithful re-statement of the reference's single-pass
character state machine (/root/reference/src/units/trhtmlstripper.pas).

Semantics preserved (§ = trhtmlstripper.pas lines):

- document body starts at <body> (§178, 623-646); header text before it is
  kept for charset/doctype meta extraction (§566-591)
- drop subtrees: script style head form applet code audio video (§179-180)
- 26 break tags split divs (§181-184); a break tag with nothing written
  since the last one counts as a "skipped potential div" (§500-530)
- comments <!-- --> and <![CDATA[ ]]> fast-forwarded (§270-298)
- a '<' not followed by [a-zA-Z/!?] is literal text (revert, §315-329)
- attributes skipped quote-aware (§344-441)
- href extracted from <a ...> via the same regex, length 16..1024, first
  whitespace-split token, link-relation filtered (§370-414)
- <br> and <br/> become a space (§463-466)
- whitespace collapsed, never written at div start (§473-497)
- per-div counters: open/close tags, anchors ('a*'-prefixed tag names —
  including 'article', a faithful quirk, §452-461), skipped divs,
  container type + closing-start flag (§534-563)

Extension for the interleaved text+media payload (BASELINE.json
input_hint): <img src=...> inside the body emits a media span in document
order; the reference has no media notion, so this is additive and does not
disturb div semantics.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions import urlnorm

DOCUMENT_CONTAINERS = {"body"}
DROP_CONTAINERS = {"script", "style", "head", "form", "applet", "code", "audio", "video"}
BREAK_TAGS = {
    "div", "/div", "p", "/p", "li", "/li", "h1", "/h1", "h2", "/h2", "h3",
    "/h3", "h4", "/h4", "h5", "/h5", "h6", "/h6", "blockquote",
    "/blockquote", "td", "/td", "article", "/article", "section", "/section",
}
CONTAINER_TYPES = {
    "article": "article", "section": "section", "div": "div", "p": "p",
    "h1": "h", "h2": "h", "h3": "h", "h4": "h", "h5": "h", "h6": "h",
    "blockquote": "block", "td": "td", "li": "li",
}
TAG_START_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ/!?")
WHITESPACE = {"\t", "\n", "\r", " "}

_WS_RUN = re.compile(r"[\t\n\r ]+")
_ATTR_DELIM = re.compile(r"[>'\"]")
_TAG_NAME = re.compile(r"[^ >]*")  # the char machine stops ONLY at ' ' / '>'
_HREF_RE = re.compile(r'href=["\']([^"\' ]+)["\']', re.IGNORECASE)
_SRC_RE = re.compile(r'src=["\']([^"\' ]+)["\']', re.IGNORECASE)
_ENCODING_RE = re.compile(r'<meta[^<]+charset=([^ ">/]+)[ ">/]', re.IGNORECASE)
_HTML5_RE = re.compile(r"<!doctype +html *>", re.IGNORECASE)
_HTML4_RE = re.compile(r"<!doctype.*html 4", re.IGNORECASE)
_XHTML_RE = re.compile(r"<!doctype.*xhtml 1", re.IGNORECASE)


@dataclass(slots=True)
class Div:
    text: str = ""
    container: str = ""
    closing_start: bool = False
    open_tags: int = 0
    close_tags: int = 0
    anchors: int = 0
    skipped_divs: int = 0
    first_raw: int = 0
    last_raw: int = 0
    valid: bool = True
    boilerplate_score: float = 0.0
    dup_of: int = -1
    cleansed_tags: int = 0
    cleansed_emails: int = 0
    cleansed_uris: int = 0
    cleansed_hashtags: int = 0
    media_after: list[str] = field(default_factory=list)


@dataclass
class StripResult:
    divs: list[Div] = field(default_factory=list)
    # document-order stream: ('div', Div) | ('media', ref).  A media ref
    # seen while the current div is still empty precedes that div's text;
    # one seen mid-div follows it (divs are atomic in the span model).
    events: list[tuple[str, object]] = field(default_factory=list)
    links: list[tuple[str, str]] = field(default_factory=list)  # (url, relation)
    raw_header: str = ""
    source_charset: str = ""
    doctype: str = ""


class StripperConfig:
    extract_anchors = True
    keep_same_host_links = True
    keep_same_virtual_host_links = True
    keep_external_links = True
    minimal_link_length = 16
    maximal_link_length = 1024
    extract_media = True


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
        """Bulk equivalent of write_char over a tag-free text chunk:
        whitespace runs collapse to single spaces, and a leading run is
        dropped when the div is empty or already ends in a space (write_char
        only ever emits ' ' as whitespace, so endswith-' ' is the full
        invariant)."""
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
        """Scan to the end of the next tag, writing text chars on the way.

        Returns the lowercased tag name ('' at EOF).

        Structured as three bulk jumps instead of a per-character loop
        (the round-1 char state machine is the semantic oracle; the
        golden-corpus tests gate this rewrite):
        - SEARCH: str.find('<') + chunked whitespace-collapse write
        - READ:   per-char only across the (short) tag name
        - SKIP:   attribute scan jumping between quote/'>' delimiters
        """
        nonlocal pos, cur
        tag = ""
        anchor_start = -1
        done = False
        while pos < n and not done:
            # -- SEARCH: bulk-jump to the next '<', writing the text chunk
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
            # -- READ: the tag name in one regex match instead of the
            # round-1 per-char accumulate (same stops: ' ' / '>' / EOF;
            # the char machine remains the semantic oracle via the golden
            # corpus tests).  Specials first, exactly as the char machine
            # orders them: comment when the accumulated name is exactly
            # '!--', CDATA when it is exactly '![cdata[' case-folded.
            ch0 = raw[pos] if pos < n else ""
            if ch0 == "!":  # one-char guard: comment/CDATA probes cost a
                # slice+lower each, and almost no tag starts with '!'
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
                # literal '<' revert (§315-329)
                if reading == "text":
                    write_char(raw[pos - 1])
                    write_char(ch0)
                pos += 1
                continue
            tag = _TAG_NAME.match(raw, pos).group(0)
            pos += len(tag)
            if pos >= n:
                break  # EOF mid-tag: fall through with the partial tag
            ch = raw[pos]
            if ch == " ":
                if tag in ("a", "img"):
                    anchor_start = pos
                pos += 1
                # -- SKIP: quote-aware attribute scan, jump-based
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
            else:  # ch == ">" (the name regex stops only at ' ' or '>')
                pos += 1
                done = True

        # media needs the attribute text even when anchor_start wasn't set
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

    # ---- move to document start (<body>) ------------------------------
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

    # ---- main body loop -------------------------------------------------
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

    # close any open paragraph (§701-702)
    new_div("")
    return res


def result_spans(res: StripResult) -> list[dict]:
    """Interleave text divs and media refs into the spans array
    (kind, text, media_ref, offset) in document order, dropping
    empty/invalid divs."""
    spans: list[dict] = []
    offset = 0
    for kind, payload in res.events:
        if kind == "div":
            d = payload
            if d.valid and d.text:
                spans.append(
                    {"kind": "text", "text": d.text, "media_ref": None, "offset": offset}
                )
                offset += 1
        else:
            spans.append(
                {"kind": "media", "text": "", "media_ref": payload, "offset": offset}
            )
            offset += 1
    return spans
