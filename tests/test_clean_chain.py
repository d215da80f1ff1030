"""Cleaning-chain tests: per-row span-sequence equality (kind, text,
media_ref, order) against the synthetic corpus golden, plus unit tests for
each stage's reference semantics."""

import numpy as np
import pytest

from texrex_spark.clean import divdedup, entities, normalize, secondpass, shingle
from texrex_spark.clean.chain import ChainConfig, clean_document
from texrex_spark.clean.stripper import StripperConfig, result_spans, strip_document
from texrex_spark.clean.tokenize import tokenize_text
from texrex_spark.sources import synth

# ---------------- stripper ----------------


def test_stripper_basic_divs():
    raw = (
        "<html><head><title>T</title></head><body>"
        "<p>hello world</p><div>second div</div></body></html>"
    )
    res = strip_document(raw, "http://h.example/")
    texts = [d.text for d in res.divs if d.text]
    assert texts == ["hello world", "second div"]


def test_stripper_drop_containers_and_comments():
    raw = (
        "<body>keep1 <script>var x = '<p>no</p>';</script>keep2"
        "<!-- <p>comment</p> -->keep3<style>p{}</style>done</body>"
    )
    res = strip_document(raw, "http://h.example/")
    assert [d.text for d in res.divs if d.text] == ["keep1 keep2keep3done"]


def test_stripper_br_and_whitespace_collapse():
    raw = "<body><p>a<br>b   c\n\nd</p></body>"
    res = strip_document(raw, "http://h.example/")
    assert [d.text for d in res.divs if d.text] == ["a b c d"]


def test_stripper_literal_lt_revert():
    # '<' followed by a non-tag char is literal text (trhtmlstripper.pas:
    # 315-329) — but only when the char is NOT a space: '< ' enters
    # attribute-skipping first (the ' ' branch precedes the revert check,
    # :303-307), eating to the next '>'.  Both quirks kept.
    raw = "<body><p>3 <4</p></body>"
    res = strip_document(raw, "http://h.example/")
    assert [d.text for d in res.divs if d.text] == ["3 <4"]
    raw2 = "<body><p>1 < 2 and x</p><p>tail</p></body>"
    res2 = strip_document(raw2, "http://h.example/")
    # '< 2 ...' swallowed up to the '>' of '</p>'
    assert [d.text for d in res2.divs if d.text] == ["1 ", "tail"]


def test_stripper_link_extraction_and_scope():
    url = "http://www.site.de/page"
    raw = (
        '<body><p>x <a href="http://www.site.de/other/page1">a</a>'
        ' <a href="http://forum.site.de/thread/22">b</a>'
        ' <a href="http://elsewhere.com/long/enough/path">c</a>'
        ' <a href="http://x.y/s">short</a></p></body>'
    )
    res = strip_document(raw, url)
    rels = {u: r for u, r in res.links}
    assert rels["http://www.site.de/other/page1"] == "trlSameFullHost"
    assert rels["http://forum.site.de/thread/22"] == "trlSameNonVirtualHost"
    assert rels["http://elsewhere.com/long/enough/path"] == "trlDifferentHosts"
    assert "http://x.y/s" not in rels  # below 16-char minimum


def test_stripper_media_spans_in_order():
    raw = (
        "<body><p>first</p>"
        '<img src="http://h.example/i1.jpg" alt="">'
        "<p>second</p>"
        '<p>with media inside <img src="http://h.example/i2.jpg" alt=""> tail</p>'
        "</body>"
    )
    res = strip_document(raw, "http://h.example/")
    spans = result_spans(res)
    seq = [(s["kind"], s["text"] or s["media_ref"]) for s in spans]
    assert seq == [
        ("text", "first"),
        ("media", "http://h.example/i1.jpg"),
        ("text", "second with media inside  tail"[:0] or "second"),
        ("text", "with media inside tail"),
        ("media", "http://h.example/i2.jpg"),
    ]


def test_stripper_header_meta():
    # NOTE the reference's EncodingMeta regex (trhtmlstripper.pas:189)
    # cannot match quoted charset="..." attributes — the capture class
    # excludes '"'.  It matches the http-equiv content form (faithful).
    raw = (
        "<!DOCTYPE html><html><head>"
        '<meta http-equiv="Content-Type" content="text/html; charset=utf-8">'
        "<title>Hi</title></head><body><p>x</p></body>"
    )
    res = strip_document(raw, "http://h.example/")
    assert res.source_charset == "utf-8"
    assert res.doctype == "html5"


# ---------------- entities / second pass ----------------


def test_entity_conversion_reference_semantics():
    c = entities.convert_string
    assert c("&#97;bc") == "abc"
    assert c("x&amp;y") == "x&y"
    assert c("&auml;") == "ä"
    assert c("&#x41;") == "A"
    # Win-1252 rogue numeric entities (trentityconverters.pas:473-508)
    assert c("&#147;quote&#148;") == "“quote”"
    # unknown entity left verbatim
    assert c("&nosuch;") == "&nosuch;"
    # too long -> abandoned
    assert c("&waytoolongentity;") == "&waytoolongentity;"
    # too short (<2 content chars)
    assert c("&a;") == "&a;"
    # double wash: &amp;auml; -> &auml; -> ä on second pass
    assert c(c("&amp;auml;")) == "ä"
    # '&' during a hypothesis is consumed, not restarted (faithful quirk)
    assert c("&&amp;") == "&&amp;"


def test_secondpass_cleansing_counts():
    text = "mail me@host.de or visit http://spam.example/xx #tag <b>bold</b>"
    cleaned, tags, emails, uris, hashtags = secondpass.cleanse(text)
    assert tags == 2 and emails == 1 and uris == 1 and hashtags == 1
    assert "me@host.de" not in cleaned and "spam.example" not in cleaned
    assert "#tag" not in cleaned and "<b>" not in cleaned


# ---------------- normalizer ----------------


def test_normalizer():
    assert normalize.normalize_text("a b​c") == "abc"
    assert normalize.normalize_text("x\x01y") == "x y"
    assert normalize.utf8_valid("ok") and not normalize.utf8_valid("x\ud800")


# ---------------- tokenizer / shingler / divdedup ----------------


def test_tokenizer_letter_ranges_and_upper():
    assert tokenize_text("Hello, wörld 123 foo_bar") == ["HELLO", "WÖRLD", "FOO", "BAR"]


def test_shingler_reference_semantics():
    toks = ["AA", "BB", "CC", "DD", "EE", "FF"]
    grams = shingle.shingles(toks)
    assert grams[0] == b"AABBCCDDEE"  # 10 chars, no padding needed
    short = shingle.shingles(["A", "B", "C", "D", "E"])
    assert short[0] == b" ABCDE".rjust(9)  # left-padded to 9
    fp = shingle.fingerprint(toks, hashes=10)
    assert fp.shape == (10,)
    # deterministic
    assert (shingle.fingerprint(toks, hashes=10) == fp).all()
    # too few tokens -> None
    assert shingle.fingerprint(["A"], hashes=10) is None


def test_shingler_batch_matches_per_doc():
    """The index-frame batch path (shingle.fingerprint_batch_signed) must
    be bit-identical to per-doc fingerprint_signed across the edge cases
    the frame arithmetic has to get right: multibyte tokens (char-counted
    PadLeft over byte-counted hashing), short grams (space-pad frames),
    empty tokens, empty docs, too-few-token docs, duplicate grams."""
    streams = [
        [],
        ["A"],
        ["A", "B", "C", "D"],
        ["A", "B", "C", "D", "E"],  # one gram, pad 4
        ["é", "ü", "ß", "ア", "語"],  # 5 chars / 11 bytes -> pad by chars
        ["日本語のテキスト", "です", "ね", "これ", "は", "テスト"],
        ["X"] * 50,  # heavy duplicate grams
        ["", "", "", "", ""],  # all-pad gram (9 spaces)
        ["AB", "", "CD", "", "EF", "GH"],
        ["TOK%d" % i for i in range(40)],
    ]
    got = shingle.fingerprint_batch_signed(streams, hashes=20)
    for i, toks in enumerate(streams):
        assert got[i] == shingle.fingerprint_signed(toks, hashes=20), i


def test_divdedup():
    from texrex_spark.clean.stripper import Div

    divs = [Div(text="same text"), Div(text="other"), Div(text="same text"), Div(text="xy")]
    divdedup.dedupe_divs(divs)
    assert divs[2].dup_of == 0
    assert divs[0].dup_of == -1 and divs[1].dup_of == -1
    assert divs[3].dup_of == -1  # below 3-char threshold? 'xy' len 2 skipped


# ---------------- end-to-end: span-sequence equality vs golden ----------------


@pytest.fixture(scope="module")
def corpus():
    return synth.generate(n_hosts=10, n_docs=150, seed=123)


def test_chain_matches_golden_spans(corpus):
    cfg = ChainConfig(use_assessment=False)
    mismatches = []
    for doc in corpus.docs:
        r = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans]
        want = [(k, t, m, o) for (k, t, m, o) in doc.spans]
        if got != want:
            mismatches.append((doc.url, got, want))
    assert not mismatches, f"{len(mismatches)} docs mismatch; first: {mismatches[0]}"


def test_chain_matches_golden_links(corpus):
    cfg = ChainConfig(use_assessment=False)
    for doc in corpus.docs[:50]:
        r = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
        assert r.links == doc.links, doc.url


def test_chain_fingerprint_deterministic(corpus):
    cfg = ChainConfig(use_assessment=False, shingle_hashes=20)
    doc = corpus.docs[0]
    a = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
    b = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
    assert a.fingerprint == b.fingerprint
    assert a.fingerprint is not None and len(a.fingerprint) == 20


def test_chain_assessment_language(corpus):
    # build a profile from the corpus itself: docs should assess as 'synth'
    from collections import Counter

    from texrex_spark.clean.assess import Profile

    counts: Counter = Counter()
    total = 0
    for doc in corpus.docs:
        for (k, t, m, o) in doc.spans:
            if k == "text":
                toks = tokenize_text(t)
                counts.update(toks)
                total += len(toks)
    freqs = {w: c / total for w, c in counts.items()}
    profile = Profile.build("synth", freqs, top_n=8)
    # limit=10 so three missing words -> badness 30 (> good_enough, no
    # early-break on the junk profile)
    junk_profile = Profile.build(
        "junk", {"QQQQ": 0.2, "ZZZZ": 0.2, "XXXX": 0.2}, top_n=3, limit=10.0
    )
    cfg = ChainConfig(profiles=[junk_profile, profile], use_assessment=True)
    doc = corpus.docs[0]
    r = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
    assert r.language == "synth"
    assert r.valid


def test_spark_clean_operator_matches_kernel(spark, corpus):
    from texrex_spark.clean.chain import clean_docs
    from texrex_spark.sources.synth import docs_df

    cfg = ChainConfig(use_assessment=False, shingle_hashes=10)
    df = docs_df(spark, corpus).select("doc_id", "url", "raw_html").limit(40)
    out = {r["doc_id"]: r for r in clean_docs(df, cfg).collect()}
    for doc in corpus.docs[:40]:
        if doc.doc_id not in out:
            continue
        r = out[doc.doc_id]
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        want = [(k, t, m, o) for (k, t, m, o) in doc.spans]
        assert got == want, doc.url
        kernel = clean_document(doc.doc_id, doc.url, doc.raw_html, cfg)
        assert r["fingerprint"] == kernel.fingerprint
