"""URL canonicalization, robots parsing, and politeness formula tests,
including Python-vs-Catalyst agreement for the dual implementations."""

import pytest

from texrex_spark.functions import urlnorm
from texrex_spark.operators import robots as robots_mod
from texrex_spark.operators.politeness import HostState, seconds_until_retrieval


# ---------- canonicalization (pure python) ----------

CANON_CASES = [
    ("HTTP://Example.COM/Path?q=1#frag", "http://example.com/Path?q=1"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://User@host.de/x", "https://host.de/x"),
    ("ftp://example.com/x", ""),
    ("not a url", ""),
    ("  http://ws.example/  ", "http://ws.example/"),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize(raw, expected):
    assert urlnorm.canonicalize(raw) == expected


def test_host_tld_path():
    assert urlnorm.extract_host("http://WWW.Example.co.uk:81/a/b") == "www.example.co.uk"
    assert urlnorm.extract_tld("www.example.co.uk") == "uk"  # trutilities.pas:402-405
    assert urlnorm.extract_tld("localhost") == "localhost"
    assert urlnorm.extract_path("http://h.example") == "/"
    assert urlnorm.extract_path("http://h.example/a/b?q=1") == "/a/b"


def test_link_relation():
    u = "http://www.blog.site.de/article/1"
    r = urlnorm.link_relation
    assert r(u, "http://www.blog.site.de/other")[1] == urlnorm.SAME_FULL_HOST
    assert r(u, "http://forum.site.de/x")[1] == urlnorm.SAME_NON_VIRTUAL_HOST
    assert r(u, "http://other.example/x")[1] == urlnorm.DIFFERENT_HOSTS
    resolved, rel = r(u, "../2")
    assert resolved == "http://www.blog.site.de/2"
    assert rel == urlnorm.SAME_FULL_HOST
    assert r(u, "http://")[1] == urlnorm.MALFORMED


def test_canonicalize_col_agrees_with_python(spark):
    raws = [c[0] for c in CANON_CASES] + [
        "http://a.b.c.example.com/deep/path/x.html?a=b&c=d",
        "HTTPS://UPPER.example/UPPER?Q#F",
        "http://host.example:443/x",
    ]
    df = spark.createDataFrame([(r,) for r in raws], ["url"])
    got = [
        row[0]
        for row in df.select(urlnorm.canonicalize_col("url")).collect()
    ]
    want = [urlnorm.canonicalize(r) for r in raws]
    assert got == want
    # host/path/tld column variants agree too (on canonical URLs)
    canon = [w for w in want if w]
    df2 = spark.createDataFrame([(c,) for c in canon], ["url"])
    rows = df2.select(
        urlnorm.extract_host_col("url").alias("h"),
        urlnorm.extract_path_col("url").alias("p"),
    ).collect()
    for c, row in zip(canon, rows):
        assert row["h"] == urlnorm.extract_host(c)
        assert row["p"] == urlnorm.extract_path(c)


# ---------- robots parsing (trpoliteness.pas:164-285) ----------

ROBOTS_BODY = """# global comment
User-agent: megabot
Disallow: /mega

User-agent: tex
Disallow: /private
Disallow: /tmp  # trailing comment
Crawl-delay: 7

User-agent: *
Disallow: /
"""


def test_robots_prefix_section_precedence():
    r = robots_mod.parse_robots("h.example", ROBOTS_BODY, "texrex")
    # "tex" is a prefix of... no: section content must start with our UA prefix.
    # UA prefix "texrex": "tex" does NOT start with "texrex" -> falls to '*'
    assert r.disallow_prefixes == ["/"]

    r2 = robots_mod.parse_robots("h.example", ROBOTS_BODY, "tex")
    # exact match "tex" wins immediately
    assert r2.disallow_prefixes == ["/private", "/tmp"]
    assert r2.crawl_delay == 7


def test_robots_prefix_match_and_star_fallback():
    body = "User-agent: texrex-crawler/1.0\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    r = robots_mod.parse_robots("h", body, "texrex")
    assert r.disallow_prefixes == ["/a"]  # prefix match beats '*'
    r2 = robots_mod.parse_robots("h", body, "otherbot")
    assert r2.disallow_prefixes == ["/b"]


def test_robots_no_section_means_no_robots():
    body = "User-agent: megabot\nDisallow: /x\n"
    r = robots_mod.parse_robots("h", body, "texrex")
    assert not r.has_robots
    assert robots_mod.path_allowed(r, "/x")


def test_robots_missing_file():
    r = robots_mod.parse_robots("h", None, "texrex")
    assert not r.has_robots
    assert robots_mod.path_allowed(r, "/anything")


def test_path_allowed_prefix_semantics():
    r = robots_mod.RobotsRules("h", True, ["/private", "/tmp"], -1)
    assert not robots_mod.path_allowed(r, "/private/x")
    assert not robots_mod.path_allowed(r, "/tmpfile")  # string prefix, not dir
    assert robots_mod.path_allowed(r, "/public")


def test_allowed_col_agrees_with_python(spark):
    rules = robots_mod.RobotsRules("h", True, ["/private", "/tmp"], -1)
    paths = ["/private/x", "/tmpfile", "/public", "/", "/priv"]
    df = spark.createDataFrame([(p,) for p in paths], ["path"])
    from pyspark.sql import functions as F

    got = [
        row[0]
        for row in df.select(
            robots_mod.allowed_col(
                F.col("path"),
                F.array(*[F.lit(x) for x in rules.disallow_prefixes]),
                F.lit(True),
            )
        ).collect()
    ]
    assert got == [robots_mod.path_allowed(rules, p) for p in paths]


# ---------- politeness formula (trpoliteness.pas:320-362) ----------

def test_politeness_formula():
    # robots-forbidden -> -1
    assert seconds_until_retrieval(100, 5, 10, 200, allowed=False) == -1
    # never accessed -> 0
    assert seconds_until_retrieval(-1, 5, 10, 200) == 0
    # under delay -> remainder; effective delay = max(crawl_delay, min_pol)
    assert seconds_until_retrieval(195, 20, 10, 200) == 15
    assert seconds_until_retrieval(195, 5, 10, 200) == 5
    # past delay -> 0
    assert seconds_until_retrieval(100, 5, 10, 200) == 0


def test_host_state():
    hs = HostState(min_politeness=10)
    assert hs.wait("a.example", now=50) == 0
    hs.retrieved("a.example", now=50)
    assert hs.wait("a.example", now=55) == 5
    assert hs.wait("a.example", now=60) == 0
    hs.crawl_delay["a.example"] = 30
    assert hs.wait("a.example", now=60) == 20


def test_canonicalize_idempotent_property():
    """Canonicalization must be idempotent — the seen-set contract: a
    URL harvested from a page and one re-harvested from the crawl log
    (already canonical) must map to the same seen-set key.  Checked with
    hypothesis over structured URL-ish inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from texrex_spark.functions.urlnorm import canonicalize

    label = st.text("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-", min_size=1, max_size=8)
    host = st.builds(".".join, st.lists(label, min_size=1, max_size=4))
    path_seg = st.text("abcdefghijklmnopqrstuvwxyz0123456789._~%-", max_size=8)
    path = st.builds(lambda segs: "/" + "/".join(segs), st.lists(path_seg, max_size=4))
    query = st.one_of(st.just(""), st.builds("?{}".format, st.text("abcdefghijklmnopqrstuvwxyz0123456789=&:/#", max_size=12)))
    port = st.one_of(st.just(""), st.builds(":{}".format, st.integers(0, 70000)))
    scheme = st.sampled_from(["http", "https", "HTTP", "ftp", "htt p", ""])
    url = st.builds(
        lambda s, h, p, pa, q: f"{s}://{h}{p}{pa}{q}" if s else f"{h}{p}{pa}{q}",
        scheme, host, port, path, query,
    )

    @settings(max_examples=300, deadline=None)
    @given(url)
    def check(u):
        c = canonicalize(u)
        assert canonicalize(c) == c, (u, c)
        if c:
            # canonical form structural invariants the scheduler relies on
            assert c.startswith(("http://", "https://"))
            after = c.split("://", 1)[1]
            assert "/" in after  # path always rooted
            assert c == c.strip()

    check()


def test_canonicalize_col_parity_on_generated_corpus(spark):
    """Catalyst twin == Python twin over a structured 300-URL corpus
    (ports, default ports, queries with delimiters, fragments, empty
    paths, mixed case) — one Spark job, not per-example."""
    from pyspark.sql import functions as F

    from texrex_spark.functions.urlnorm import canonicalize, canonicalize_col

    hosts = ["a.com", "WWW.Ex.AMPLE.org", "x.y.z.co", "h-1.net"]
    ports = ["", ":80", ":443", ":8080", ":65535"]
    paths = ["", "/", "/p", "/a/b/c", "/p%20q", "/x.html"]
    queries = ["", "?q=1", "?a=1&b=2", "?u=http://other.com/x", "?"]
    frags = ["", "#f", "#x?y"]
    schemes = ["http", "https", "HTTP"]
    corpus = [
        f"{s}://{h}{po}{pa}{q}{fr}"
        for s, h, po, pa, q, fr in zip(
            schemes * 100, hosts * 75, ports * 60, paths * 50, queries * 60, frags * 100
        )
    ][:300]
    expected = [canonicalize(u) for u in corpus]
    df = spark.createDataFrame([(u,) for u in corpus], "url string")
    got = [r[0] for r in df.select(canonicalize_col(F.col("url")).alias("c")).collect()]
    assert got == expected
