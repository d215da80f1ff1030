"""The ClaraX random-walk protocol, exactly once.

This module is the *ordering contract* (SURVEY.md §4.3): a deterministic
re-statement of TTrWalker.Walk (/root/reference/src/units/trwalkers.pas:
859-997) with every wall-clock and RNG dependency pinned:

- per-walker ``numpy.random.Generator`` seeded ``PCG64(seed * 1_000_003 +
  walker_id)``; draw order identical to the reference's Random() calls:
  jump draw, then seed-pool index or link-pop index (trwalkers.pas:940-951,
  426-435, 595-606).
- logical clock instead of wall clock: politeness wait advances the
  walker's private clock; each successful fetch costs ``fetch_cost``
  logical seconds.  The reference's AddRandomWaitUpTo extra sleep
  (trwalkers.pas:639-640) is a pure wall-clock artifact and is fixed to 0.
- the seen-set is the walker's own deterministic scaling bloom filter
  keyed by the canonical URL (the reference keys the raw URL string,
  trwalkers.pas:831-845; canonicalization-first is this rebuild's mandate).
- host politeness state is walker-private, as in the single-threaded
  reference (trwalkers.pas:484).

The same ``WalkerState`` + ``run_until_fetch``/``deliver_fetch`` pair is
driven two ways: sequentially by ``texrex_spark.oracle`` (fetch = dict
lookup) and in supersteps by ``texrex_spark.operators.walker`` (fetch =
DataFrame join, state advance in applyInPandas).  Crawl order and seen set
must agree row-for-row between the two — that is the parity test.

Walk-loop semantics preserved precisely (trwalkers.pas:926-997):

- ``Step(FetchSeed)`` before the loop.
- loop while ``len(stack) < max_steps and (len(stack) > 0 or not
  backtrack_on_dead_end)``.
- each iteration: random-jump draw first; else pop a uniform random link
  from the *top* stack entry; empty link -> forced jump (immediate Step) /
  backtrack (pop) / break, per config flags.
- a failed fetch (robots -1, or URL not in the corpus) pushes nothing.
- cache hits skip politeness and fetch entirely and re-push a fresh step
  with the full link list (trwalkers.pas:881-894; cache FIFO :346-396).
- seed starvation terminates the walk (FetchSeed raises, :595-601).
"""

from __future__ import annotations

import pickle
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..functions import urlnorm
from ..functions.bloom import ScalingBloomFilter
from .politeness import HostState
from .robots import RobotsRules, path_allowed

SAFETY_EVENT_CAP = 100_000  # identical in both harnesses; guards non-termination


@dataclass
class WalkConfig:
    seed: int = 42
    n_walkers: int = 4
    max_steps: int = 40  # stack-height target per walker (trwalkers.pas:934)
    random_jump_probability: float = 0.05
    allow_random_jumps: bool = True
    jump_on_dead_end: bool = True
    backtrack_on_dead_end: bool = False
    min_politeness: int = 2
    respect_robots: bool = True
    cache_size: int = 50
    bloom_error_rate: float = 1e-4  # reference crawler: 1e-6 (trwalkers.pas:486)
    bloom_max_memory_mb: int = 64
    use_external_links: bool = True
    use_same_host_links: bool = True  # trlSameNonVirtualHost
    use_same_virtual_host_links: bool = True  # trlSameFullHost
    fetch_cost: int = 1
    min_link_len: int = 16  # trhtmlstripper.pas:150-153
    max_link_len: int = 1024


@dataclass
class WalkStep:
    url: str
    host: str
    doc_id: str
    access_time: int
    links: list[str] = field(default_factory=list)
    max_link_number: int = 0

    def pop_random_link(self, rng: np.random.Generator) -> str:
        """trwalkers.pas:426-435 — uniform index, removed from the list."""
        if len(self.links) < 1:
            return ""
        i = int(rng.integers(0, len(self.links)))
        link = self.links[i]
        del self.links[i]
        return link


@dataclass
class LogRow:
    walker_id: int
    seq: int
    clock: int
    follow: str  # seed|step|randomjump|forcedjump|backtrack|exhausted
    url: str
    host: str
    wait: int
    http: str  # ok|cached|error|robots|-
    process: str  # valid|invalid|unknown|-
    seen: int  # 1|0|-1 (n/a)
    links_found: int
    stack_size: int


class WalkerState:
    def __init__(
        self,
        walker_id: int,
        config: WalkConfig,
        seeds: list[str],
        robots: dict[str, RobotsRules],
    ):
        self.walker_id = walker_id
        self.config = config
        self.rng = np.random.default_rng(config.seed * 1_000_003 + walker_id)
        self.seeds = list(seeds)
        self.robots = robots
        self.stack: list[WalkStep] = []
        self.hosts = HostState(min_politeness=config.min_politeness)
        self.bloom = ScalingBloomFilter(
            config.bloom_error_rate, config.bloom_max_memory_mb
        )
        self.cache: OrderedDict[str, WalkStep] = OrderedDict()
        self.clock = 0
        self.seq = 0
        self.events = 0
        self.done = False
        self.done_reason = ""
        self.started = False
        # in-flight fetch: (url, canon, host, follow_kind)
        self.pending: Optional[tuple[str, str, str, str]] = None
        self.emitted: list[tuple[int, str, str]] = []  # (seq, canon_url, doc_id)
        self.log: list[LogRow] = []

    # -- pickling for the Spark state column --------------------------------
    def dumps(self) -> bytes:
        return pickle.dumps(self)

    @staticmethod
    def loads(b: bytes) -> "WalkerState":
        return pickle.loads(b)

    # -- internals -----------------------------------------------------------

    def _log(self, follow, url, host, wait, http, process, seen, links, stack):
        self.log.append(
            LogRow(
                self.walker_id,
                self.seq,
                self.clock,
                follow,
                url,
                host,
                wait,
                http,
                process,
                seen,
                links,
                stack,
            )
        )
        self.seq += 1

    def _fetch_seed(self) -> Optional[str]:
        """trwalkers.pas:595-606; None = starvation (walk over)."""
        if len(self.seeds) < 1:
            self.done = True
            self.done_reason = "seed-starvation"
            return None
        i = int(self.rng.integers(0, len(self.seeds)))
        url = self.seeds[i]
        del self.seeds[i]
        return url

    def _robots_allowed(self, host: str, path: str) -> bool:
        if not self.config.respect_robots:
            return True
        rules = self.robots.get(host)
        if rules is None:
            return True
        return path_allowed(rules, path)

    def _push_from_cache(self, follow: str, url: str, cached: WalkStep) -> None:
        step = WalkStep(
            url=cached.url,
            host=cached.host,
            doc_id=cached.doc_id,
            access_time=self.clock,
            links=list(cached.links),
            max_link_number=cached.max_link_number,
        )
        self.stack.append(step)
        self._log(
            follow, url, step.host, 0, "cached", "valid", -1,
            step.max_link_number, len(self.stack),
        )

    def _begin_step(self, follow: str, url: str) -> None:
        """Step(url) up to the fetch boundary (trwalkers.pas:867-924)."""
        canon = urlnorm.canonicalize(url)
        if not canon:
            self._log(follow, url, "", 0, "error", "unknown", -1, 0, len(self.stack))
            return
        host = urlnorm.extract_host(canon)

        cached = self.cache.get(canon)
        if cached is not None:
            self._push_from_cache(follow, url, cached)
            return

        allowed = self._robots_allowed(host, urlnorm.extract_path(canon))
        wait = self.hosts.wait(host, self.clock, allowed)
        if wait < 0:
            # robots-forbidden: fetch returns false (trpoliteness.pas:347-349)
            self._log(follow, url, host, wait, "robots", "unknown", -1, 0, len(self.stack))
            return
        self.clock += wait
        self.pending = (url, canon, host, follow)
        self._pending_wait = wait

    def deliver_fetch(
        self,
        found: bool,
        valid: bool,
        links: list[tuple[str, str]],
        doc_id: str = "",
    ) -> None:
        """Complete the in-flight Step with the fetch-join result.

        links: golden/extracted (absolute_url, trl_relation) pairs of the
        fetched document; scope filtering happens here (MakeStep,
        trwalkers.pas:774-823).
        """
        assert self.pending is not None, "no fetch in flight"
        url, canon, host, follow = self.pending
        wait = self._pending_wait
        self.pending = None

        if not found:
            self._log(follow, url, host, wait, "error", "unknown", -1, 0, len(self.stack))
            return

        self.hosts.retrieved(host, self.clock)
        self.clock += self.config.fetch_cost

        if not valid:
            self._log(follow, url, host, wait, "ok", "invalid", -1, 0, len(self.stack))
            return

        # Finalize: bloom-gated output emission (trwalkers.pas:826-845).
        newly = self.bloom.add(canon.encode("utf-8"))
        if newly:
            self.emitted.append((self.seq, canon, doc_id))

        # MakeStep: scope-filter links (trwalkers.pas:774-823).
        cfg = self.config
        kept: list[str] = []
        for link_url, relation in links:
            if relation == urlnorm.DIFFERENT_HOSTS and not cfg.use_external_links:
                continue
            if relation == urlnorm.SAME_FULL_HOST and not cfg.use_same_virtual_host_links:
                continue
            if relation == urlnorm.SAME_NON_VIRTUAL_HOST and not cfg.use_same_host_links:
                continue
            if relation == urlnorm.MALFORMED:
                continue
            if not (cfg.min_link_len <= len(link_url) <= cfg.max_link_len):
                continue
            lc = urlnorm.canonicalize(link_url)
            if not lc:
                continue
            kept.append(link_url)

        step = WalkStep(
            url=url,
            host=host,
            doc_id=doc_id,
            access_time=self.clock,
            links=kept,
            max_link_number=len(kept),
        )
        self.stack.append(step)
        self._log(
            follow, url, host, wait, "ok", "valid", 0 if newly else 1,
            step.max_link_number, len(self.stack),
        )

        # Document cache (Finalize tail, trwalkers.pas:849-855).
        if cfg.cache_size > 0:
            if canon not in self.cache and len(self.cache) >= cfg.cache_size:
                self.cache.popitem(last=False)  # FIFO eviction
            self.cache[canon] = WalkStep(
                url=url, host=host, doc_id=doc_id, access_time=self.clock,
                links=list(kept), max_link_number=len(kept),
            )

    def run_until_fetch(self) -> Optional[str]:
        """Advance the walk until a fetch is required or the walk ends.

        Returns the canonical URL to fetch, or None when the walker is done.
        """
        cfg = self.config
        while not self.done and self.pending is None:
            self.events += 1
            if self.events > SAFETY_EVENT_CAP:
                self.done, self.done_reason = True, "event-cap"
                break

            if not self.started:
                self.started = True
                seed_url = self._fetch_seed()
                if seed_url is None:
                    break
                self._begin_step("seed", seed_url)
                continue

            # loop guard (trwalkers.pas:934-935)
            if len(self.stack) >= cfg.max_steps:
                self.done, self.done_reason = True, "max-steps"
                break
            if len(self.stack) == 0 and cfg.backtrack_on_dead_end:
                self.done, self.done_reason = True, "stack-exhausted"
                break

            follow = "step"
            next_link = ""
            if cfg.allow_random_jumps and self.rng.random() < cfg.random_jump_probability:
                follow = "randomjump"
                seed_url = self._fetch_seed()
                if seed_url is None:
                    break
                next_link = seed_url
            elif self.stack:
                next_link = self.stack[-1].pop_random_link(self.rng)

            if next_link == "":
                if cfg.jump_on_dead_end:
                    seed_url = self._fetch_seed()
                    if seed_url is None:
                        break
                    self._begin_step("forcedjump", seed_url)
                elif cfg.backtrack_on_dead_end:
                    popped = self.stack.pop()
                    self._log(
                        "backtrack", popped.url, popped.host, 0, "-", "-", -1,
                        len(popped.links), len(self.stack),
                    )
                else:
                    self.done, self.done_reason = True, "exhausted"
                    self._log("exhausted", "", "", 0, "-", "-", -1, 0, len(self.stack))
                break_outer = self.done
                if break_outer:
                    break
            else:
                self._begin_step(follow, next_link)

        if self.done or self.pending is None:
            return None
        return self.pending[1]

    def drain_log(self) -> list[LogRow]:
        rows, self.log = self.log, []
        return rows

    def drain_emitted(self) -> list[tuple[int, str, str]]:
        rows, self.emitted = self.emitted, []
        return rows


def partition_seeds(seeds: list[str], n_walkers: int) -> list[list[str]]:
    """Round-robin seed assignment, order-preserving per walker."""
    out: list[list[str]] = [[] for _ in range(n_walkers)]
    for i, s in enumerate(seeds):
        out[i % n_walkers].append(s)
    return out


def robots_map(robots_rows: list[dict]) -> dict[str, RobotsRules]:
    return {
        r["host"]: RobotsRules(
            host=r["host"],
            has_robots=bool(r["has_robots"]),
            disallow_prefixes=list(r["disallow_prefixes"]),
            crawl_delay=int(r["crawl_delay"]),
        )
        for r in robots_rows
    }
