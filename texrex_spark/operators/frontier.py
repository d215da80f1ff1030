"""The URL-frontier fetch scheduler — the north-rule core at 10^10 scale.

Where operators/walker.py reproduces the reference's *ordering* with K
sequential walkers, this scheduler is the throughput path: a batch
superstep loop in which the frontier is a DataFrame priority queue and
every stage is a distributed operator:

    frontier ──canonicalize (Catalyst)──▶ candidates
      ──probe partitioned bloom (mapInPandas, read-only)──▶ unseen
      ──robots gate (broadcast join + exists())──▶ allowed
      ──politeness admit (salted two-stage window rank)──▶ admitted
      ──"fetch": equi-join docs table──▶ fetched docs
      ──link harvest (explode + scope filters, Catalyst)──▶ candidates'
      ──bloom check-and-add on fetched──▶ seen-set grows
      frontier' = deferred ∪ new links  (top-k by priority = TakeOrdered)

Scale design decisions, each explicit:

- **dedup before politeness** so seen URLs never consume host budget;
  bloom *add* happens only after fetch (matching Finalize semantics,
  trwalkers.pas:826-845) so politeness-deferred URLs survive rounds.
- **skew**: politeness ranking salts hot hosts (operators/politeness.py);
  AQE handles residual join skew.
- **priority queue** = (depth, discovery priority); the frontier cap is a
  bucket-ranked approximate top-k (``cap_by_priority``) — never a global
  sort+limit, which would assemble cap rows on the driver.
- **resume**: frontier/host-state parquet snapshots + the seen-set's bucket
  bitmaps and manifest; per-round metrics carry per-partition lineage.
- the docs join broadcasts nothing (both sides big); it is a plain
  shuffled hash join on url_norm, co-partitioned with the bloom bucketing
  when the docs table is bucketed by the same hash.

At bench scale the heavy stages are all JVM-side except the bloom probe
(Arrow-batched numpy).  Throughput metric: URLs scheduled+deduped per
second (BASELINE.json `metric`).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import urlnorm
from .politeness import admit, advance_host_state
from .robots import gate_frontier
from .seenset import PartitionedSeenSet
from .snapshots import SnapshotCatalog


def cap_by_priority(
    df: DataFrame, cap: int, buckets: int = 256, priority_col: str = "priority",
    tie_col: str = "url_norm",
) -> DataFrame:
    """Scale-safe frontier cap: an approximate distributed top-``cap``.

    ``orderBy().limit(cap)`` compiles to TakeOrderedAndProject, which
    assembles all ``cap`` rows **on the driver** — tolerable at 10^5, fatal
    at the 10^8 a 10^10-URL frontier implies.  Instead, rank inside hash
    buckets of the URL and keep ``ceil(cap/buckets)`` per bucket.  The hash
    is independent of priority, so each bucket's top slice is a uniform
    stratum of the global top-cap: the kept set differs from the exact
    top-cap only at the priority boundary (relative error ~ sqrt(buckets/
    cap)) and its size by < ``buckets`` rows.  The cap is back-pressure —
    the reference's walk stack has no cap at all (trwalkers.pas:859-997) —
    so boundary fuzz is acceptable; a driver-side top-k at scale is not.

    One shuffle on the bucket key; each reducer sorts ~N/buckets rows
    (spillable window sort), nothing is ever globally ordered.
    """
    per_bucket = max(1, math.ceil(cap / buckets))
    w = Window.partitionBy("_cap_b").orderBy(priority_col, tie_col)
    return (
        df.withColumn("_cap_b", F.pmod(F.xxhash64(tie_col), F.lit(buckets)))
        .withColumn("_cap_r", F.row_number().over(w))
        .where(F.col("_cap_r") <= per_bucket)
        .drop("_cap_b", "_cap_r")
    )


@dataclass
class FrontierConfig:
    seen_partitions: int = 32
    bloom_error_rate: float = 1e-6
    min_politeness: int = 2
    round_seconds: int = 60
    frontier_cap: int = 1_000_000
    cap_buckets: int = 256
    max_depth: int = 6
    snapshot_every: int = 0  # 0 = off; N = atomic snapshot every N rounds
    min_link_len: int = 16
    max_link_len: int = 1024
    use_external_links: bool = True
    use_same_host_links: bool = True
    use_same_virtual_host_links: bool = True
    # "bloom" (reference parity, scaling) or "cuckoo" (deletable:
    # seen.retract() un-sees URLs whose fetch died before commit)
    seen_filter: str = "bloom"
    cuckoo_capacity_per_bucket: int = 2_000_000
    # Broadcast the robots rule table in gate_frontier.  True is right up
    # to ~10^7 hosts; at 10^8 hosts with disallow-prefix arrays the table
    # outgrows broadcast limits — set False and AQE picks the join.
    robots_broadcast: bool = True


@dataclass
class FrontierScheduler:
    spark: SparkSession
    config: FrontierConfig
    work_dir: str
    metrics: list[dict] = field(default_factory=list)

    def __post_init__(self):
        os.makedirs(self.work_dir, exist_ok=True)
        self.seen = PartitionedSeenSet(
            os.path.join(self.work_dir, "seen"),
            partitions=self.config.seen_partitions,
            error_rate=self.config.bloom_error_rate,
            filter_kind=self.config.seen_filter,
            cuckoo_capacity_per_bucket=self.config.cuckoo_capacity_per_bucket,
        )
        self.catalog: SnapshotCatalog | None = (
            SnapshotCatalog(os.path.join(self.work_dir, "snapshots"))
            if self.config.snapshot_every > 0
            else None
        )

    def resume(self) -> dict | None:
        """Resume from the latest committed snapshot: restores the
        seen-set's bucket bitmaps to the pinned round and returns the
        carried state, or None when no snapshot exists.  Pass the returned
        pieces to ``run(resume_frontier=..., host_state=..., now=...,
        start_round=...)``."""
        if self.catalog is None or self.catalog.latest_id() is None:
            return None
        m = self.catalog.manifest()
        self.catalog.restore_seen(None, self.seen.dir)
        return {
            "frontier": self.catalog.read(self.spark, "frontier"),
            "host_state": self.catalog.read(self.spark, "host_state"),
            "now": m["extra"]["now"],
            "start_round": m["extra"]["next_round"],
        }

    # -- stage builders ---------------------------------------------------

    def candidates_from(self, urls: DataFrame, depth_col=None) -> DataFrame:
        """Canonicalize raw URLs into frontier rows — a pure, map-only
        projection (no shuffle).  Exact-duplicate URLs survive here on
        purpose: the seen-set probe dedups them inside its own bucket
        shuffle (dedup_round), saving a whole groupBy exchange per round.
        Rows stay NARROW (url_norm, priority, depth): host/path are
        recomputed after the probe so the bloom shuffle moves ~40% fewer
        bytes."""
        depth = depth_col if depth_col is not None else F.lit(0)
        canon = urlnorm.canonicalize_col(F.col("url"))
        # r06: route the canonical form through explode(array(...)) so it
        # becomes a generator-output ATTRIBUTE before the != '' filter.
        # Otherwise the filter is pushed below the projection and the
        # whole canonicalize expression tree is evaluated twice per row
        # (same §4.4-style duplication as for UDFs, measured 5.3 s ->
        # 2.0 s on the 2M-URL canonicalize stage); a 1-element explode is
        # codegen'd and never drops rows.
        return urls.select(
            F.explode(F.array(canon)).alias("url_norm"),
            F.col("priority").cast("long").alias("priority"),
            depth.cast("int").alias("depth"),
        ).where(F.col("url_norm") != "")

    @staticmethod
    def with_host_path(df: DataFrame) -> DataFrame:
        return df.select(
            "*",
            urlnorm.extract_host_col(F.col("url_norm")).alias("host"),
            urlnorm.extract_path_col(F.col("url_norm")).alias("path"),
        )

    def prepare_docs(self, docs: DataFrame) -> DataFrame:
        """Fetch table keyed by canonical URL, with harvested links."""
        # same attribute barrier as candidates_from: one canonicalize
        # evaluation per row despite the != '' filter
        return docs.select(
            F.explode(F.array(urlnorm.canonicalize_col(F.col("url")))).alias(
                "url_norm"
            ),
            F.col("doc_id"),
            F.col("host").alias("doc_host"),
            F.col("links"),
        ).where(F.col("url_norm") != "")

    # optional (host, rank_pos) table set via set_host_ranks(): hosts with
    # a better (lower) PageRank position schedule earlier within a round
    host_rank_pos: DataFrame | None = None

    def set_host_ranks(self, ranks: DataFrame) -> None:
        """ranks: (node, rank) from operators/linkgraph.pagerank over a
        prior crawl's link graph.  Converted to an integer band with a
        windowless monotone map (band = min(999, floor(1000 / (1 + rank)))
        — higher rank -> lower band -> scheduled earlier), so the mapping
        is a map-only stage even at 10^7+ hosts; a global row_number here
        would funnel the host table through one task."""
        self.host_rank_pos = (
            ranks.select(
                F.col("node").alias("link_host"),
                F.least(
                    F.lit(999),
                    F.floor(F.lit(1000.0) / (F.lit(1.0) + F.col("rank"))),
                ).cast("int").alias("rank_pos"),
            )
            .localCheckpoint(eager=False)
        )

    def harvest_links(self, fetched: DataFrame, next_priority_base) -> DataFrame:
        """Explode fetched docs' links, apply the reference's scope filters
        (trwalkers.pas:802-817, link length trhtmlstripper.pas:150-153),
        and emit new candidate URLs.  All Catalyst.

        With host ranks set (set_host_ranks), priority = base +
        rank_pos * 1e6 + hash%1e6 — the PageRank band dominates, the hash
        breaks ties inside a band; unranked hosts sort after ranked ones."""
        cfg = self.config
        allowed_relations = [
            rel
            for rel, on in [
                (urlnorm.DIFFERENT_HOSTS, cfg.use_external_links),
                (urlnorm.SAME_FULL_HOST, cfg.use_same_virtual_host_links),
                (urlnorm.SAME_NON_VIRTUAL_HOST, cfg.use_same_host_links),
            ]
            if on
        ]
        links = fetched.select(
            F.col("depth"),
            F.col("priority").alias("parent_priority"),
            F.explode("links").alias("l"),
        )
        out = (
            links.where(F.col("l.relation").isin(allowed_relations))
            .where(F.length("l.url").between(cfg.min_link_len, cfg.max_link_len))
            .select(
                F.col("l.url").alias("url"),
                (F.col("depth") + 1).alias("depth"),
            )
            .where(F.col("depth") <= cfg.max_depth)
        )
        if self.host_rank_pos is not None:
            # No broadcast hint: host_rank_pos has one row per ranked host
            # (10^7-10^8 hosts at design scale = multi-GB) — AQE picks a
            # broadcast join on its own when the table is actually small.
            # Pinned by test_harvest_no_forced_rank_broadcast.
            out = out.withColumn(
                "link_host", urlnorm.extract_host_col(urlnorm.canonicalize_col(F.col("url")))
            ).join(self.host_rank_pos, "link_host", "left")
            prio = (
                F.lit(next_priority_base)
                + F.coalesce(F.col("rank_pos"), F.lit(1000)).cast("long")
                * F.lit(1_000_000)
                + F.abs(F.xxhash64("url")) % F.lit(1_000_000)
            )
            return out.select("url", prio.alias("priority"), "depth")
        return out.select(
            "url",
            (
                F.lit(next_priority_base)
                + F.abs(F.xxhash64("url")) % F.lit(1_000_000_000)
            ).alias("priority"),
            "depth",
        )

    # -- the superstep loop ------------------------------------------------

    def run(
        self,
        seeds: DataFrame,  # (url string, priority long)
        docs: DataFrame,
        robots: DataFrame,
        rounds: int = 5,
        collect_fetched: bool = True,
        host_state: DataFrame | None = None,
        now: int = 0,
        resume_frontier: DataFrame | None = None,
        start_round: int = 0,
    ) -> dict[str, DataFrame]:
        """host_state/now allow re-entering the loop with carried politeness
        state (checkpoint resume; the streaming foreachBatch driver);
        resume_frontier/start_round re-enter mid-crawl from a snapshot
        (``resume()``) — the frontier is already canonicalized then."""
        cfg = self.config
        fetch_table = self.prepare_docs(docs).persist()
        fetch_table.count()

        # localCheckpoint (not persist) everywhere the loop feeds a DataFrame
        # back into itself: it truncates lineage, otherwise the plan tree
        # doubles per round and the planner itself OOMs.  On a cluster with
        # reliable checkpointing requirements this becomes a parquet/Iceberg
        # snapshot write per round (same shape as _snapshot()).
        if resume_frontier is not None:
            frontier = resume_frontier.localCheckpoint(eager=True)
        else:
            frontier = self.candidates_from(seeds).localCheckpoint(eager=True)
        if host_state is None:
            host_state = self.spark.createDataFrame(
                [], "host string, last_access long, crawl_delay int"
            )
        robots_delays = robots.select(
            "host", F.col("crawl_delay").alias("robots_delay")
        )
        fetched_parts: list[DataFrame] = []

        for rnd in range(start_round, start_round + rounds):
            t0 = time.time()

            unseen = self.seen.probe(frontier, dedup_round=True).where(
                ~F.col("seen")
            ).drop("seen", "bloom_scalings", "bloom_bucket")
            gated = gate_frontier(
                self.with_host_path(unseen), robots,
                broadcast_hint=cfg.robots_broadcast,
            )

            # host state enriched with robots crawl-delay for the formula
            hs = (
                host_state.join(robots_delays, "host", "full")
                .select(
                    "host",
                    F.coalesce("last_access", F.lit(-1)).alias("last_access"),
                    F.coalesce("robots_delay", F.lit(-1)).alias("crawl_delay"),
                )
            )
            admitted = admit(
                gated,
                hs,
                min_politeness=cfg.min_politeness,
                round_seconds=cfg.round_seconds,
                now=now,
            ).localCheckpoint(eager=True)

            fetched = admitted.join(fetch_table, "url_norm", "inner").localCheckpoint(
                eager=True
            )

            # authoritative seen-set update: only fetched URLs are "written
            # out" (Finalize semantics); returns lineage columns.  The add
            # mutates bucket bitmaps, so it must be evaluated exactly once —
            # localCheckpoint materializes it before any downstream action
            # can re-trigger the mapInPandas.
            marked = self.seen.check_and_add(
                fetched.select("url_norm", "priority", "depth", "doc_id", "links")
            ).localCheckpoint(eager=True)
            new_docs = marked.where(~F.col("seen"))

            links = self.harvest_links(
                new_docs, next_priority_base=(rnd + 1) * 10_000_000_000
            )
            deferred = gated.join(
                admitted.select("url_norm"), "url_norm", "left_anti"
            ).select("url_norm", "priority", "depth")

            # priority-queue cap = bucket-ranked approximate top-k (never a
            # driver-side TakeOrdered); exact duplicate urls are NOT merged
            # here — next round's probe dedups them inside its bucket shuffle.
            next_frontier = cap_by_priority(
                self.candidates_from(links, depth_col=F.col("depth")).unionByName(
                    deferred
                ),
                cfg.frontier_cap,
                cfg.cap_buckets,
            ).localCheckpoint(eager=True)

            n_frontier = frontier.count()
            n_admitted = admitted.count()
            n_fetched = fetched.count()
            n_next = next_frontier.count()
            elapsed = time.time() - t0
            self.metrics.append(
                {
                    "round": rnd,
                    "frontier": n_frontier,
                    "admitted": n_admitted,
                    "fetched": n_fetched,
                    "next_frontier": n_next,
                    "elapsed_sec": round(elapsed, 3),
                    "urls_per_sec": round(n_frontier / elapsed, 1) if elapsed else 0.0,
                }
            )

            if collect_fetched:
                fetched_parts.append(
                    new_docs.select(
                        F.lit(rnd).alias("round"),
                        "url_norm",
                        "doc_id",
                        "depth",
                        "bloom_bucket",
                        "bloom_scalings",
                    ).localCheckpoint(eager=True)
                )

            host_state = advance_host_state(
                hs.select("host", "last_access", "crawl_delay"), admitted
            ).localCheckpoint(eager=True)

            frontier = next_frontier
            now += cfg.round_seconds

            self.seen.commit_round(rnd, {"metrics": self.metrics})
            if self.catalog is not None and (rnd + 1) % cfg.snapshot_every == 0:
                self.catalog.commit(
                    {"frontier": frontier, "host_state": host_state},
                    round_no=rnd,
                    extra={"now": now, "next_round": rnd + 1},
                    seen_dir=self.seen.dir,
                )
            if n_frontier == 0:
                break

        out: dict[str, DataFrame] = {
            "frontier": frontier,
            "host_state": host_state,
            "now": now,
        }
        if fetched_parts:
            all_fetched = fetched_parts[0]
            for p in fetched_parts[1:]:
                all_fetched = all_fetched.unionByName(p)
            out["fetched"] = all_fetched
        fetch_table.unpersist()
        return out

    def write_metrics(self) -> str:
        path = os.path.join(self.work_dir, "metrics.json")
        with open(path, "w") as f:
            json.dump(self.metrics, f, indent=1)
        return path
