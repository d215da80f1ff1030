"""Differential fuzz: tokenizer stripper vs the frozen char-machine oracle.

The master-regex tokenizer (clean/stripper.py:_MASTER) must be observably
identical to the round-3 per-call char machine it replaced
(tests/oracle_stripper_charmachine.py), which was itself fuzz-pinned
against the round-1 per-character machine — making this a standing,
transitive pin on the original trhtmlstripper.pas semantics.

Three corpora: hand-picked edge cases (every tokenizer alternative and
resume rule), seeded random tag soup (markup-dense, quote-unbalanced,
EOF-truncated), and a sample of the synthetic HTML corpus (realistic
attribute/entity/media density).
"""

from __future__ import annotations

import random

import pytest

from texrex_spark.clean import stripper as new_mod
from texrex_spark.sources import synth

import oracle_stripper_charmachine as old_mod


def _snapshot(mod, raw: str, url: str):
    r = mod.strip_document(raw, url)
    return (
        [
            (
                d.text,
                d.container,
                d.closing_start,
                d.open_tags,
                d.close_tags,
                d.anchors,
                d.skipped_divs,
                d.first_raw,
                d.last_raw,
                tuple(d.media_after),
            )
            for d in r.divs
        ],
        [(k, (p.text if isinstance(p, new_mod.Div) else p)) for k, p in r.events],
        r.links,
        r.raw_header,
        r.source_charset,
        r.doctype,
    )


def _assert_same(raw: str, url: str = "http://example.com/a/b") -> None:
    assert _snapshot(old_mod, raw, url) == _snapshot(new_mod, raw, url), repr(raw[:300])


EDGES = [
    "",
    "<",
    "x<",
    "<body>",
    "<body",
    "<body>abc",
    "<body>a<",  # lone trailing '<' is consumed silently
    "<body>a<<a>",  # literal-revert consumes the second '<': no tag
    "<body>t<!-->x",  # comment without terminator runs to EOF
    "<body>t<!---->x",
    "<body><![CDATA[zz]]>y",
    "<body><![cdata[zz",  # case-folded CDATA, unterminated
    "<body>a<5b>c",  # literal revert: digit can't start a tag
    "<body>a< b>c",  # '< ' -> empty name + attribute scan
    "<body>a<>c",  # '<>' -> empty tag
    "<body>a<\nb>c",  # literal revert on whitespace ch0
    "<body><script>a<b>c</script>after",  # tags inside dropped subtree count
    '<body><a href="http://other.example.com/long/enough/link">t</a>',
    '<body><A href="http://other.example.com/long/enough/link">t</A>',  # case quirk
    "<body><img src=\"pic.png\">x<img src='q.png'>",
    "<body>x<br>y<br/>z<BR>w",
    "<body><a href='http://other.example.com/path/x'  title='a>b'>t</a>",
    '<body><a href="http://e.com/unterminated',  # EOF inside attrs: no link
    "<body><a href='http://other.example.com/pp/qq' t=\"oops",  # unterminated quote
    "<head><meta charset=utf-8></head><body>x</body>",
    "<!doctype html><body>x</body>",
    "<body>x</body><p>never</p>",  # machine stops at </body>
    "<body>x<body>y",  # second <body> also stops the machine
    "<body><form><a href='http://other.example.com/drop/it'>z</a></form>q",
    "<body>a<b",  # EOF mid-name: partial tag is still counted
    "<body>a<b ",  # EOF right after the attribute space
    "<body>a<b x=1",  # EOF inside attrs
    "<body><p> <p> <p>x",  # skipped potential divs
    "<body><div>x<article>y<li>z",
    "<body>t<![CDATA[a]]b]]>u",
    "<body>lone & <& and <\x00odd",
    "<body><p art='1'>x",
]


@pytest.mark.parametrize("raw", EDGES, ids=range(len(EDGES)))
def test_edges(raw):
    _assert_same(raw)


def test_random_tag_soup():
    random.seed(20260817)
    atoms = list("<>/!?abPp \t\n'\"=-[]CDATAscript&;#x0") + [
        "<body>", "</body>", "<p>", "</p>", "<div>", "<script>", "</script>",
        "<!--", "-->", "<![CDATA[", "]]>", "<br>", "<img src='x.png'>",
        '<a href="http://other.example.com/qqqq">',
    ]
    for _ in range(2500):
        raw = "".join(random.choice(atoms) for _ in range(random.randint(1, 60)))
        if random.random() < 0.7:
            raw = "<body>" + raw
        _assert_same(raw)


def test_synth_corpus_sample():
    corpus = synth.generate(n_hosts=30, n_docs=400, seed=31337)
    for d in corpus.docs:
        _assert_same(d.raw_html, d.url)
