"""Single-process reference crawl: the oracle the Spark job must match.

Runs the shared walk protocol (operators/walkstate.py) sequentially over an
in-memory corpus — fetch is a dict lookup, exactly the semantics the Spark
superstep expresses as a DataFrame join.  Since the reference binary seeds
``Randomize`` non-reproducibly (SURVEY.md §4.3), *this* is the executable
definition of "the reference's crawl ordering" under the pinned RNG
protocol; pytest asserts the Spark runner reproduces it row-for-row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..clean.simplefilter import doc_valid
from ..operators.walkstate import (
    LogRow,
    WalkConfig,
    WalkerState,
    partition_seeds,
    robots_map,
)
from ..sources.synth import SynthCorpus


@dataclass
class CrawlResult:
    log: list[LogRow] = field(default_factory=list)
    emitted: list[tuple[int, int, str, str]] = field(default_factory=list)
    # (walker_id, seq, canon_url, doc_id)
    walkers: list[WalkerState] = field(default_factory=list)

    def seen_urls(self) -> set[str]:
        return {u for (_, _, u, _) in self.emitted}

    def ordered_log(self) -> list[tuple]:
        return sorted(
            (
                (r.walker_id, r.seq, r.clock, r.follow, r.url, r.host, r.wait,
                 r.http, r.process, r.seen, r.links_found, r.stack_size)
                for r in self.log
            )
        )


def crawl(
    corpus: SynthCorpus, config: WalkConfig, clean_config=None
) -> CrawlResult:
    """clean_config=None: fetch resolves against the corpus's golden
    spans/links.  With a ChainConfig, every fetched page runs the full
    cleaning chain (the same kernel the Spark runner ships to executors in
    chain mode) — links and validity come from the chain output."""
    from ..functions import urlnorm

    docs = {urlnorm.canonicalize(d.url): d for d in corpus.docs}
    robots = robots_map(corpus.robots)
    seed_parts = partition_seeds(corpus.seeds, config.n_walkers)

    result = CrawlResult()
    for wid in range(config.n_walkers):
        w = WalkerState(wid, config, seed_parts[wid], robots)
        while True:
            url = w.run_until_fetch()
            if url is None:
                break
            doc = docs.get(url)
            if doc is None:
                w.deliver_fetch(found=False, valid=False, links=[])
            elif clean_config is not None:
                from ..clean.chain import clean_document

                r = clean_document(doc.doc_id, doc.url, doc.raw_html, clean_config)
                span_tuples = [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r.spans
                ]
                w.deliver_fetch(
                    found=True,
                    valid=r.valid and doc_valid(span_tuples),
                    links=list(r.links),
                    doc_id=doc.doc_id,
                )
            else:
                w.deliver_fetch(
                    found=True,
                    valid=doc_valid(doc.spans),
                    links=doc.links,
                    doc_id=doc.doc_id,
                )
        result.log.extend(w.drain_log())
        result.emitted.extend(
            (wid, seq, u, did) for (seq, u, did) in w.drain_emitted()
        )
        result.walkers.append(w)
    return result
