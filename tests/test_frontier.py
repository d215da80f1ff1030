"""Frontier scheduler + partitioned seen-set tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from texrex_spark.operators.frontier import FrontierConfig, FrontierScheduler
from texrex_spark.operators.seenset import PartitionedSeenSet, bucket_of
from texrex_spark.sources import synth


@pytest.fixture(scope="module")
def corpus():
    return synth.generate(n_hosts=10, n_docs=120, seed=42, n_seeds=20)


def test_seenset_probe_and_add(spark, tmp_path):
    s = PartitionedSeenSet(str(tmp_path / "seen"), partitions=4, error_rate=1e-4)
    urls = [f"http://h{i % 7}.example/p/{i}" for i in range(50)]
    df = spark.createDataFrame([(u,) for u in urls], ["url_norm"])

    probed = s.probe(df)
    assert probed.where(F.col("seen")).count() == 0  # nothing seen yet

    added = s.check_and_add(df).where(~F.col("seen")).count()
    assert added == 50

    probed2 = s.probe(df)
    assert probed2.where(~F.col("seen")).count() == 0  # now all seen

    # duplicates inside one batch: only first occurrence is new
    dup = spark.createDataFrame(
        [("http://new.example/only-once",)] * 3, ["url_norm"]
    )
    res = s.check_and_add(dup)
    assert res.where(~F.col("seen")).count() == 1

    st = s.stats()
    assert st["adds"] == 51
    assert st["buckets"] >= 1


def test_seenset_bucket_parity_with_oracle(spark, tmp_path):
    """Spark-side bucket assignment must equal the oracle's Rabin bucket."""
    s = PartitionedSeenSet(str(tmp_path / "seen2"), partitions=8)
    urls = [f"http://host{i}.example/x/{i*7}" for i in range(40)]
    df = s.with_bucket(spark.createDataFrame([(u,) for u in urls], ["url_norm"]))
    got = {r["url_norm"]: r["bloom_bucket"] for r in df.collect()}
    for u in urls:
        assert got[u] == bucket_of(u, 8), u


def test_seenset_persistence(spark, tmp_path):
    d = str(tmp_path / "seen3")
    s1 = PartitionedSeenSet(d, partitions=2)
    df = spark.createDataFrame([(f"http://p.example/{i}",) for i in range(20)], ["url_norm"])
    s1.check_and_add(df).count()
    # a new instance over the same dir sees the same membership
    s2 = PartitionedSeenSet(d, partitions=2)
    assert s2.probe(df).where(~F.col("seen")).count() == 0


def test_frontier_scheduler_end_to_end(spark, corpus, tmp_path):
    cfg = FrontierConfig(
        seen_partitions=4,
        bloom_error_rate=1e-4,
        min_politeness=2,
        round_seconds=100,
        frontier_cap=10_000,
        max_depth=5,
    )
    sched = FrontierScheduler(spark, cfg, str(tmp_path / "work"))
    docs = synth.docs_df(spark, corpus)
    robots = synth.robots_df(spark, corpus)
    seeds = synth.seeds_df(spark, corpus).select(
        F.col("url"), F.col("seed_idx").cast("long").alias("priority")
    )

    out = sched.run(seeds, docs, robots, rounds=4)
    fetched = out["fetched"].collect()
    assert len(fetched) > 10

    # 1. no URL fetched twice (partitioned-bloom dedup)
    urls = [r["url_norm"] for r in fetched]
    assert len(urls) == len(set(urls))

    # 2. robots: no fetched URL under a disallow prefix
    from texrex_spark.functions import urlnorm
    from texrex_spark.operators.robots import path_allowed
    from texrex_spark.operators.walkstate import robots_map

    rmap = robots_map(corpus.robots)
    for u in urls:
        host = urlnorm.extract_host(u)
        if host in rmap:
            assert path_allowed(rmap[host], urlnorm.extract_path(u)), u

    # 3. politeness: per (round, host) the admitted count respects budget
    # round_seconds=100, max crawl_delay 8 -> budget >= 12; just check the
    # metrics are recorded and fetches happened over multiple rounds
    assert len(sched.metrics) >= 2
    assert sched.metrics[0]["fetched"] > 0

    # 4. depth increases across rounds (links harvested)
    depths = {r["depth"] for r in fetched}
    assert max(depths) >= 1

    # 5. lineage columns present
    assert {"bloom_bucket", "bloom_scalings"} <= set(out["fetched"].columns)


def test_frontier_politeness_budget(spark, corpus, tmp_path):
    """One host, tight budget: only round_seconds/delay URLs admitted/round."""
    from texrex_spark.operators.politeness import admit

    rows = [(f"http://hot.example/p/{i}", "hot.example", f"/p/{i}", i) for i in range(50)]
    frontier = spark.createDataFrame(rows, ["url_norm", "host", "path", "priority"])
    hs = spark.createDataFrame(
        [("hot.example", -1, 10)], ["host", "last_access", "crawl_delay"]
    )
    admitted = admit(frontier, hs, min_politeness=2, round_seconds=50, now=0)
    got = admitted.orderBy("priority").collect()
    # budget = 50 logical seconds / delay 10 = 5 fetches
    assert len(got) == 5
    # admitted in priority order with spaced fetch times
    assert [r["priority"] for r in got] == [0, 1, 2, 3, 4]
    assert [r["fetch_time"] for r in got] == [0, 10, 20, 30, 40]


def test_snapshot_resume_equivalence(spark, corpus, tmp_path):
    """Kill-and-resume (north rule: 'resumable from snapshot checkpoints'):
    a 4-round crawl must equal 2 rounds + snapshot + resume + 2 rounds —
    identical fetched set, frontier, host state, and seen-set stats."""
    docs = synth.docs_df(spark, corpus)
    robots = synth.robots_df(spark, corpus)
    seeds = synth.seeds_df(spark, corpus).select(
        F.col("url"), F.col("seed_idx").cast("long").alias("priority")
    )
    cfg = lambda: FrontierConfig(  # noqa: E731
        seen_partitions=4, bloom_error_rate=1e-4, round_seconds=100,
        frontier_cap=10_000, snapshot_every=1,
    )

    ref = FrontierScheduler(spark, cfg(), str(tmp_path / "ref"))
    ref_out = ref.run(seeds, docs, robots, rounds=4)
    ref_fetched = sorted(
        (r["round"], r["url_norm"]) for r in ref_out["fetched"].collect()
    )
    ref_frontier = sorted(r["url_norm"] for r in ref_out["frontier"].collect())
    ref_hosts = sorted(
        (r["host"], r["last_access"]) for r in ref_out["host_state"].collect()
    )

    # run 2 rounds, "crash", resume in a NEW scheduler over the same dirs
    first = FrontierScheduler(spark, cfg(), str(tmp_path / "res"))
    first.run(seeds, docs, robots, rounds=2)
    assert first.catalog.latest_id() == 2

    second = FrontierScheduler(spark, cfg(), str(tmp_path / "res"))
    state = second.resume()
    assert state is not None and state["start_round"] == 2
    out2 = second.run(
        seeds=None, docs=docs, robots=robots, rounds=2,
        resume_frontier=state["frontier"], host_state=state["host_state"],
        now=state["now"], start_round=state["start_round"],
    )
    res_fetched = sorted(
        (r["round"], r["url_norm"]) for r in out2["fetched"].collect()
    )
    ref_tail = [x for x in ref_fetched if x[0] >= 2]
    assert res_fetched == ref_tail
    assert sorted(r["url_norm"] for r in out2["frontier"].collect()) == ref_frontier
    assert (
        sorted((r["host"], r["last_access"]) for r in out2["host_state"].collect())
        == ref_hosts
    )
    # seen-set adds identical across the two histories
    assert second.seen.stats()["adds"] == ref.seen.stats()["adds"]

    # time travel: snapshot 2's manifest still addressable after 4 commits
    m2 = second.catalog.manifest(2)
    assert m2["round"] == 1 and m2["extra"]["next_round"] == 2


def test_rank_weighted_harvest_priorities(spark, corpus, tmp_path):
    """set_host_ranks: links to higher-PageRank hosts get strictly lower
    (earlier) priorities than links to lower-ranked or unranked hosts."""
    from pyspark.sql import functions as F

    from texrex_spark.operators.frontier import FrontierConfig, FrontierScheduler
    from texrex_spark.operators.linkgraph import pagerank

    sched = FrontierScheduler(
        spark, FrontierConfig(seen_partitions=2), str(tmp_path / "w")
    )
    docs = synth.docs_df(spark, corpus)
    fetch = sched.prepare_docs(docs)
    fetched = fetch.select(
        "url_norm", F.lit(0).alias("priority"), F.lit(0).alias("depth"),
        "doc_id", "links",
    ).limit(40)

    edges = (
        fetch.select(F.col("doc_host").alias("src"), F.explode("links").alias("l"))
        .select("src", F.regexp_extract("l.url", r"https?://([^/]+)/", 1).alias("dst"))
        .where(F.col("dst") != "")
    )
    ranks = pagerank(edges, iterations=2)
    sched.set_host_ranks(ranks)
    out = sched.harvest_links(fetched, next_priority_base=0)
    assert out.count() > 0
    with_host = out.withColumn(
        "host", F.regexp_extract("url", r"https?://([^/]+)/", 1)
    ).join(ranks.select(F.col("node").alias("host"), "rank"), "host", "left")
    rows = with_host.select("rank", "priority").collect()
    banded = sorted((r["priority"] // 1_000_000, -(r["rank"] or 0)) for r in rows)
    # bands must be monotone: as priority band increases, rank never increases
    best_rank_by_band = {}
    for band, negrank in banded:
        best_rank_by_band.setdefault(band, -negrank)
    bands = sorted(best_rank_by_band)
    ranks_seq = [best_rank_by_band[b] for b in bands]
    assert all(a >= b - 1e-9 for a, b in zip(ranks_seq, ranks_seq[1:]))
