"""Deterministic synthetic web corpus: the crawl substrate for tests/bench.

The sandbox has no network, so "fetching" is a join against a docs table
(SURVEY.md §2.1: HTTP fetch -> equi-join frontier↔docs).  This module
generates that table plus seeds and robots rules, fully seeded — same seed,
same corpus, in-process or on disk.

Schema (BASELINE.json input_hint — interleaved text+media documents):

  docs(doc_id string, url string, host string, ip string, charset string,
       raw_html string,
       spans array<struct<kind string, text string, media_ref string,
                          offset int>>,            -- golden cleaned output
       links array<struct<url string, relation string>>)  -- golden hrefs

  seeds(seed_idx int, url string)
  robots(host string, has_robots boolean, disallow_prefixes array<string>,
         crawl_delay int)

Host sizes are Zipf-distributed (hot-host skew is part of the politeness /
salting story), link targets mix same-host, same-non-virtual-host and
cross-host edges per the reference's relation classes
(trutilities.pas:420-471), and the HTML exercises the stripper semantics:
<script>/<style> subtree drops, break-tag div splitting, <br> -> space,
entities (incl. the Win-1252 rogue numeric range), anchors, and <img>
media spans.
"""

from __future__ import annotations

import html
from dataclasses import dataclass, field

import numpy as np

from ..functions import urlnorm

TLDS = ["com", "de", "org", "net", "example"]

# Deterministic token pool for div text (letters only; tokenizer-friendly).
WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu wasser himmel strasse leben zeit woche markt "
    "blume garten fenster spiegel wolke regen sturm sonne mond stern fluss"
).split()

BOILER_TEXT = "home contact imprint privacy terms login register sitemap"


@dataclass
class SynthDoc:
    doc_id: str
    url: str
    host: str
    ip: str
    charset: str
    raw_html: str
    spans: list[tuple[str, str, str | None, int]]  # (kind, text, media_ref, offset)
    links: list[tuple[str, str]]  # (absolute url, trl* relation)


@dataclass
class SynthCorpus:
    docs: list[SynthDoc]
    seeds: list[str]
    robots: list[dict]
    config: dict = field(default_factory=dict)

    def doc_by_url(self) -> dict[str, SynthDoc]:
        return {d.url: d for d in self.docs}


def _zipf_sizes(rng: np.random.Generator, n_hosts: int, n_docs: int) -> list[int]:
    """Zipf-ish page counts per host, summing to n_docs, each >= 1."""
    weights = 1.0 / np.arange(1, n_hosts + 1)
    weights /= weights.sum()
    sizes = np.maximum(1, np.floor(weights * n_docs).astype(int))
    i = 0
    while sizes.sum() < n_docs:
        sizes[i % n_hosts] += 1
        i += 1
    while sizes.sum() > n_docs:
        j = int(np.argmax(sizes))
        if sizes[j] > 1:
            sizes[j] -= 1
    return sizes.tolist()


def generate(
    n_hosts: int = 20,
    n_docs: int = 400,
    seed: int = 42,
    n_seeds: int = 30,
    links_per_doc: int = 6,
    robots_fraction: float = 0.4,
    crawl_delay_fraction: float = 0.3,
    media_fraction: float = 0.35,
    entity_fraction: float = 0.5,
    virtual_host_fraction: float = 0.25,
) -> SynthCorpus:
    rng = np.random.default_rng(seed)

    # --- hosts ---------------------------------------------------------
    hosts: list[str] = []
    for h in range(n_hosts):
        tld = TLDS[int(rng.integers(0, len(TLDS)))]
        base = f"site{h}.{tld}"
        if rng.random() < virtual_host_fraction:
            hosts.append(f"www.{base}")  # virtual-host prefix for relation tests
        else:
            hosts.append(base)
    sizes = _zipf_sizes(rng, n_hosts, n_docs)

    urls: list[str] = []
    url_host: dict[str, str] = {}
    for host, size in zip(hosts, sizes):
        for p in range(size):
            u = f"http://{host}/p/{p}"
            urls.append(u)
            url_host[u] = host

    # --- robots --------------------------------------------------------
    robots_rows = []
    disallowed: dict[str, list[str]] = {}
    delays: dict[str, int] = {}
    for host in hosts:
        has = bool(rng.random() < robots_fraction)
        prefixes: list[str] = []
        delay = -1
        if has:
            if rng.random() < 0.5:
                prefixes.append("/private")
            if rng.random() < 0.3:
                prefixes.append(f"/p/{int(rng.integers(0, 4))}")
            if rng.random() < crawl_delay_fraction:
                delay = int(rng.integers(2, 9))
        robots_rows.append(
            {
                "host": host,
                "has_robots": has,
                "disallow_prefixes": prefixes,
                "crawl_delay": delay,
            }
        )
        disallowed[host] = prefixes
        delays[host] = delay

    # --- documents -----------------------------------------------------
    docs: list[SynthDoc] = []
    for u in urls:
        host = url_host[u]
        n_divs = int(rng.integers(3, 9))
        spans: list[tuple[str, str, str | None, int]] = []
        links: list[tuple[str, str]] = []
        body_parts: list[str] = []
        offset = 0

        # boilerplate nav (kept as a text span; boilerplate scoring is a
        # later pipeline stage, not a stripper drop)
        body_parts.append(f"<div class=nav>{BOILER_TEXT}</div>")
        spans.append(("text", BOILER_TEXT, None, offset))
        offset += 1

        # a dropped subtree the stripper must skip entirely
        body_parts.append("<script>var x = '<p>not text</p>';</script>")

        for d in range(n_divs):
            n_words = int(rng.integers(8, 25))
            words = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(n_words)]
            text = " ".join(words)
            if rng.random() < entity_fraction:
                # entity-encode pieces; golden span text is the decoded form
                # (&nbsp; deliberately absent: the normalizer deletes NBSP,
                # trnormalizer.pas:167-171, which would join words)
                text_html = text.replace("a", "&#97;", 1).replace("o", "&ocirc;", 1)
                text_plain = text.replace("o", "ô", 1)
            else:
                text_html, text_plain = text, text

            want_link = rng.random() < 0.8 and links_per_doc > 0
            anchor_html = ""
            if want_link:
                kind_draw = rng.random()
                if kind_draw < 0.45:  # same full host
                    tgt = f"http://{host}/p/{int(rng.integers(0, 50))}"
                elif kind_draw < 0.6 and host.startswith("www."):
                    tgt = f"http://forum.{host[4:]}/p/{int(rng.integers(0, 20))}"
                else:  # different host
                    other = hosts[int(rng.integers(0, len(hosts)))]
                    tgt = f"http://{other}/p/{int(rng.integers(0, 50))}"
                resolved, rel = urlnorm.link_relation(u, tgt)
                links.append((resolved, rel))
                anchor_html = f' <a href="{tgt}">more</a>'

            tag = ["p", "div", "li", "td", "h1"][int(rng.integers(0, 5))]
            body_parts.append(f"<{tag}>{text_html}{anchor_html}</{tag}>")
            spans.append(("text", text_plain + (" more" if anchor_html else ""), None, offset))
            offset += 1

            if rng.random() < media_fraction:
                ref = f"http://{host}/img/{int(rng.integers(0, 1000))}.jpg"
                body_parts.append(f'<img src="{ref}" alt="">')
                spans.append(("media", "", ref, offset))
                offset += 1

        title = f"Page {u.split('/')[-1]} of {host}"
        raw_html = (
            "<!DOCTYPE html><html><head>"
            f"<title>{html.escape(title)}</title>"
            '<meta charset="utf-8"></head><body>'
            + "".join(body_parts)
            + "</body></html>"
        )
        docs.append(
            SynthDoc(
                doc_id=urlnorm.doc_id(u),
                url=u,
                host=host,
                ip=f"{int(rng.integers(1, 224))}.{int(rng.integers(0, 256))}."
                f"{int(rng.integers(0, 256))}.{int(rng.integers(1, 255))}",
                charset="utf-8",
                raw_html=raw_html,
                spans=spans,
                links=links,
            )
        )

    # --- seeds: existing, robots-allowed URLs --------------------------
    candidates = [
        u
        for u in urls
        if not any(
            urlnorm.extract_path(u).startswith(p) for p in disallowed[url_host[u]]
        )
    ]
    pick = rng.permutation(len(candidates))[: min(n_seeds, len(candidates))]
    seeds = [candidates[int(i)] for i in pick]

    return SynthCorpus(
        docs=docs,
        seeds=seeds,
        robots=robots_rows,
        config={
            "seed": seed,
            "n_hosts": n_hosts,
            "n_docs": n_docs,
            "n_seeds": len(seeds),
        },
    )


# ---------------------------------------------------------------------------
# Spark adapters
# ---------------------------------------------------------------------------

DOCS_SCHEMA = (
    "doc_id string, url string, host string, ip string, charset string, "
    "raw_html string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "links array<struct<url:string,relation:string>>"
)


def docs_df(spark, corpus: SynthCorpus):
    rows = [
        (
            d.doc_id,
            d.url,
            d.host,
            d.ip,
            d.charset,
            d.raw_html,
            [(k, t, m, o) for (k, t, m, o) in d.spans],
            [(lu, rel) for (lu, rel) in d.links],
        )
        for d in corpus.docs
    ]
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def seeds_df(spark, corpus: SynthCorpus):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(corpus.seeds)], "seed_idx int, url string"
    )


def robots_df(spark, corpus: SynthCorpus):
    return spark.createDataFrame(
        [
            (r["host"], r["has_robots"], r["disallow_prefixes"], r["crawl_delay"])
            for r in corpus.robots
        ],
        "host string, has_robots boolean, disallow_prefixes array<string>, "
        "crawl_delay int",
    )


def write_parquet(spark, corpus: SynthCorpus, out_dir: str) -> None:
    docs_df(spark, corpus).write.mode("overwrite").parquet(f"{out_dir}/docs.parquet")
    seeds_df(spark, corpus).write.mode("overwrite").parquet(f"{out_dir}/seeds.parquet")
    robots_df(spark, corpus).write.mode("overwrite").parquet(
        f"{out_dir}/robots.parquet"
    )


def synthetic_frontier_df(spark, n_urls: int, n_hosts: int, seed: int = 42):
    """A large frontier generated JVM-side with spark.range — never
    materialized on the driver.  This is the bench input: hash-derived URLs
    over a Zipf-ish host distribution (pmod of a power of the row id biases
    low host ids, giving hot hosts).  Duplicate URLs appear naturally when
    n_urls exceeds the key space — exactly what the dedup stage is for.
    """
    from pyspark.sql import functions as F

    base = spark.range(n_urls)
    host_id = F.pmod(
        F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(n_hosts * 37)),
        F.lit(n_hosts),
    )
    # bias toward low host ids: square the uniform draw
    host_id = F.floor(F.pow(host_id.cast("double") / n_hosts, F.lit(2.0)) * n_hosts)
    page_id = F.pmod(F.xxhash64(F.col("id") * 31 + F.lit(seed)), F.lit(max(n_urls // n_hosts, 1)))
    return base.select(
        F.concat(
            F.lit("http://bench"),
            host_id.cast("string"),
            F.lit(".example/p/"),
            page_id.cast("string"),
        ).alias("url"),
        F.col("id").alias("priority"),
    )
