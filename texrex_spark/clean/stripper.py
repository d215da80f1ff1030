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
# One-pass document tokenizer: each alternative is a faithful transcription
# of a char-machine case (ordered exactly as the machine probes them).
# Tokenization is state-independent — comments, CDATA, quote-aware
# attribute skips, and literal-'<' reverts behave identically in text,
# drop-subtree, and pre-body modes — so the whole document can be lexed by
# the regex engine in C and only per-TAG dispatch stays in Python.
#   alt 1: comment   — '<!--' fast-forwarded to '-->' or EOF (§270-283)
#   alt 2: CDATA     — '<![CDATA[' (case-folded) to ']]>' or EOF (§284-298)
#   alt 3: tag       — name [^ >]* (stops ONLY at ' '/'>', §330-343); then
#          '>' | ' ' + quote-aware attribute scan (§344-441; an
#          unterminated quote or missing '>' consumes to EOF) | EOF mid-name
#   alt 4: literal   — '<' + any char outside [a-zA-Z/!?> ] is TEXT, and the
#          consumed char can never start a tag (§315-329) — hence a
#          two-char match, not a lookahead
_MASTER = re.compile(
    r"<!--(?:.*?-->|.*)"
    r"|<!\[[Cc][Dd][Aa][Tt][Aa]\[(?:.*?\]\]>|.*)"
    r"|<(?=[a-zA-Z/!?> ])([^ >]*)"
    r"(?:(>)|[ ]((?:[^>'\"]+|\"[^\"]*\"|'[^']*')*)(>|\"[^\"]*$|'[^']*$|$)|$)"
    r"|<[^a-zA-Z/!?> ]",
    re.DOTALL,
)
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

    # ---- single tokenizer pass + state machine --------------------------
    # _MASTER lexes the whole document in the regex engine; Python touches
    # one event per tag.  Literal-'<' reverts (alt 4) are text, not tags:
    # they stay inside the pending gap and the consumed char can never
    # start a tag — exactly the char machine's resume rule (§315-329).
    # The per-call advance_to_next_tag() machine this replaces is pinned
    # by the golden corpus tests and a 4k-doc differential fuzz.
    gap_start = 0
    last_end = 0  # end of the furthest match (literal pairs included)
    stopped = False
    for m in _MASTER.finditer(raw):
        name = m.group(1)
        if name is None:
            s0 = m.group(0)
            if s0[1] != "!":
                last_end = m.end()
                continue  # literal revert: text, stays in the gap
            tag = "!--" if s0.startswith("<!--", 0, 4) else "![cdata["
        else:
            tag = None
        ms = m.start()
        if reading == "text" and ms > gap_start:
            write_text(raw[gap_start:ms])
        pos = m.end()
        gap_start = pos
        last_end = pos
        if tag is None:
            # attribute-terminated-by-'>' tags are the only link/media
            # source (an EOF-truncated attribute scan never extracts)
            if m.group(4) == ">" and (name == "a" or name == "img"):
                attr_text = raw[m.end(1) : pos - 1]
                if cfg.extract_anchors and name == "a":
                    _extract_link(attr_text)
                if cfg.extract_media and name == "img" and reading == "text":
                    _extract_media(attr_text)
            tag = name.lower()
        if cur is not None and tag:
            if tag[0] == "/":
                cur.close_tags += 1
            else:
                cur.open_tags += 1
            if tag[0] == "a":
                cur.anchors += 1
        if tag == "br" or tag == "br/":
            write_char(" ")
        if reading == "outside":
            # pre-body: only a document container transitions (§623-646)
            if tag in DOCUMENT_CONTAINERS:
                reading = "text"
                doc_close = "/" + tag
                res.raw_header = raw[:pos]
                hm = _ENCODING_RE.search(res.raw_header)
                if hm:
                    res.source_charset = hm.group(1)
                if _XHTML_RE.search(res.raw_header):
                    res.doctype = "xhtml"
                elif _HTML4_RE.search(res.raw_header):
                    res.doctype = "html4"
                elif _HTML5_RE.search(res.raw_header):
                    res.doctype = "html5"
                new_div(tag)
        elif tag == doc_close or tag in DOCUMENT_CONTAINERS:
            stopped = True  # document over: the machine stops scanning
            break
        elif drop_close == "" and tag in DROP_CONTAINERS:
            reading = "markup"
            drop_close = "/" + tag
        elif drop_close == tag:
            reading = "text"
            drop_close = ""
        elif reading == "text" and tag in BREAK_TAGS:
            new_div(tag)
    if not stopped:
        if reading == "text" and gap_start < n:
            tail = raw[gap_start:]
            if tail[-1] == "<" and last_end < n:
                # a lone UNCONSUMED '<' as the final char is dropped
                # (SEARCH steps past it and hits EOF); a trailing '<'
                # inside a literal-revert pair (last_end == n) is text
                tail = tail[:-1]
            write_text(tail)
        pos = n

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
