"""ARC/WARC reader segmentation tests (trreader.pas semantics)."""

import gzip

import pytest

from texrex_spark.sources import synth
from texrex_spark.sources.warc import (
    corpus_to_warc,
    parse_arc,
    parse_warc,
    read_warc,
)


@pytest.fixture(scope="module")
def corpus():
    return synth.generate(n_hosts=4, n_docs=25, seed=77)


def test_parse_warc_roundtrip(corpus):
    blob = corpus_to_warc(corpus)
    docs = parse_warc(blob, min_size=10, max_size=1_000_000)
    assert len(docs) == len(corpus.docs)
    by_url = {d["url"]: d for d in docs}
    src = corpus.docs[0]
    got = by_url[src.url]
    assert got["raw_html"].strip() == src.raw_html.strip()
    assert got["ip"] == src.ip
    assert got["charset"] == "utf-8"


def test_parse_warc_gzip_and_size_window(corpus):
    blob = corpus_to_warc(corpus, gzip_out=True)
    assert blob[:2] == b"\x1f\x8b"
    docs = parse_warc(blob, min_size=10, max_size=1_000_000)
    assert len(docs) == len(corpus.docs)
    # size window drops everything when impossible
    assert parse_warc(blob, min_size=10_000_000, max_size=20_000_000) == []


def test_parse_arc():
    body = "<html><body><p>" + "x" * 50 + "</p></body></html>"
    arc = (
        f"http://a.example/page 1.2.3.4 20240101000000 text/html {len(body)}\n"
        f"{body}\n"
        f"http://b.example/page 5.6.7.8 20240101000001 text/html {len(body)}\n"
        f"{body}\n"
    ).encode()
    docs = parse_arc(arc, min_size=10, max_size=10_000)
    assert [d["url"] for d in docs] == ["http://a.example/page", "http://b.example/page"]
    assert docs[0]["ip"] == "1.2.3.4"


def test_read_warc_spark(spark, corpus, tmp_path):
    p = tmp_path / "test.warc"
    p.write_bytes(corpus_to_warc(corpus))
    df = read_warc(spark, str(p), min_size=10, max_size=1_000_000)
    rows = df.collect()
    assert len(rows) == len(corpus.docs)
    assert all(r["source_file"].endswith("test.warc") for r in rows)
    # the read feeds straight into the cleaning chain
    from texrex_spark.clean.chain import ChainConfig, clean_docs
    from texrex_spark.functions.urlnorm import doc_id_col

    from pyspark.sql import functions as F

    docs = df.select(
        doc_id_col(F.col("url")).alias("doc_id"), "url", "raw_html"
    )
    cleaned = clean_docs(docs, ChainConfig(use_assessment=False, use_shingler=False))
    assert cleaned.where(F.col("valid")).count() > 0
