"""Physical-plan audits: the plans we want, not just the first that passes.

Guards the scale-critical properties: filter pushdown + column pruning at
the scan, map-side partial aggregation, broadcast joins on small dims,
distributed top-k, and no accidental cartesian products in the near-dup
pipeline."""

import pytest

from texrex_spark.plans.queries import EXTRA_QUERIES, QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_agg_pricing_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(QUERIES["q_agg_pricing"](spark, sf_dir))
    # filter reaches the parquet scan
    assert "DataFilters: [isnotnull(l_shipdate" in plan
    # column pruning: l_comment is never read
    assert "l_comment" not in plan
    # map-side combine before the exchange
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("HashAggregate")


def test_join_topk_broadcast_and_takeordered(spark, sf_dir):
    plan = _plan(EXTRA_QUERIES["q_join_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # nation dim broadcast
    assert "TakeOrderedAndProject" in plan  # sort+limit is a top-k, not a sort


def test_neardup_no_cartesian(spark, sf_dir):
    plan = _plan(QUERIES["q_neardup_pairs"](spark, sf_dir))
    # no shuffled cartesian anywhere; the only nested loop allowed is the
    # broadcast of the 8-row hash-function index (BuildRight)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    if "BroadcastNestedLoopJoin" in plan:
        assert "BroadcastNestedLoopJoin BuildRight" in plan


def test_frontier_dedup_bloom_probe(spark, sf_dir):
    # q_frontier_dedup routes dedup through the partitioned scaling-bloom
    # seen set (cf3d58c): membership is a MapInPandas probe over url-hash
    # buckets plus a `seen` filter — no join at all, which is the point:
    # at 10^10 URLs this replaces the anti-join's full-frontier shuffle
    # with a bitmap probe shuffled only on the bucket key.
    plan = _plan(QUERIES["q_frontier_dedup"](spark, sf_dir))
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    # the final projection prunes the probe's lineage columns and the
    # synthetic url back down to the two output columns
    assert "Filter (isnotnull(seen" in plan


def test_robots_gate_broadcast(spark, sf_dir):
    plan = _plan(QUERIES["q_robots_gate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    # for a 100-row interval dim the BNLJ IS the right plan for the
    # Catalyst twin; the driver-verified q_range_join runs clean/geo.py's
    # searchsorted kernel (one map-only Python stage, no join at all)
    plan = _plan(EXTRA_QUERIES["q_range_join_catalyst"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    engine_plan = _plan(QUERIES["q_range_join"](spark, sf_dir))
    assert "Join" not in engine_plan.replace("MapInPandas", "")


def test_embedding_neardup_lsh_no_cross_join(spark, sf_dir):
    """q_embedding_neardup routes through the sign-LSH pruning path
    (similarity.lsh_neardup): candidates come from equi-joined
    (band, signature) buckets — the plan must contain no all-pairs
    product of any kind (VERDICT r04 #3)."""
    plan = _plan(QUERIES["q_embedding_neardup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_clean_chain_single_python_stage(spark, sf_dir):
    plan = _plan(QUERIES["q_clean_chain"](spark, sf_dir))
    # exactly one Python boundary (the chain mapInPandas), not a chain of them
    assert plan.count("MapInPandas") == 1
    # the scan reads only the columns the chain needs
    assert "n_chars" not in plan


# ---------------- round-2 scale audits (VERDICT r01 weak plans) ----------------


def test_frontier_cap_no_driver_topk(spark):
    """The frontier cap must never compile to TakeOrderedAndProject (a
    driver-side top-k assembly): cap_by_priority ranks inside URL-hash
    buckets instead, and its kept set approximates the exact top-cap."""
    from pyspark.sql import functions as F

    from texrex_spark.operators.frontier import cap_by_priority

    df = spark.range(0, 50_000).select(
        F.concat(
            F.lit("http://h"),
            (F.col("id") % 97).cast("string"),
            F.lit(".ex/p/"),
            F.col("id").cast("string"),
        ).alias("url_norm"),
        F.col("id").alias("priority"),
    )
    capped = cap_by_priority(df, cap=1000, buckets=16)
    plan = _plan(capped)
    assert "TakeOrderedAndProject" not in plan
    assert "Window" in plan  # bucket-rank, shuffled + spillable
    n = capped.count()
    assert 1000 <= n <= 1000 + 16  # ceil(cap/buckets) rounding only
    # stratified sampling property: the kept set hugs the true top-cap
    mx = capped.agg(F.max("priority")).first()[0]
    assert mx < 2500, f"bucket cap kept far-from-top rows (max priority {mx})"


def test_admit_no_forced_host_broadcast(spark):
    """politeness.admit must not hint broadcast on host_state (10^7-10^8
    rows at 10^10-URL scale); AQE decides at runtime instead."""
    from pyspark.sql import functions as F

    from texrex_spark.operators.politeness import admit

    frontier = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("url_norm"),
        F.concat(F.lit("h"), (F.col("id") % 10).cast("string")).alias("host"),
        F.col("id").alias("priority"),
    )
    hs = spark.createDataFrame(
        [(f"h{i}", -1, 3) for i in range(10)],
        "host string, last_access long, crawl_delay int",
    )
    adm = admit(frontier, hs, min_politeness=1, round_seconds=60, now=0)
    analyzed = adm._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    assert adm.count() > 0


def test_seenset_sizing_guardrail(tmp_path):
    """Bucket count must scale with the expected URL count so one bucket's
    bitmap fits a task: 10^10 URLs at e=1e-6 is ~36 GB of bitmap."""
    import pytest as _pytest

    from texrex_spark.operators.seenset import PartitionedSeenSet

    need = PartitionedSeenSet.partitions_for(10**10, 1e-6, 256)
    assert 100 <= need <= 400  # ~141 by the Broder-Mitzenmacher formula
    with _pytest.raises(ValueError, match="buckets"):
        PartitionedSeenSet(
            str(tmp_path / "s1"), partitions=32, error_rate=1e-6,
            expected_urls=10**10,
        )
    # correctly sized construction passes
    PartitionedSeenSet(
        str(tmp_path / "s2"), partitions=need, error_rate=1e-6,
        expected_urls=10**10,
    )


def test_tecl_no_forced_blacklist_broadcast(spark):
    """tecl must not hint broadcast on the near-dup blacklist — at 100 TB
    a crawl loses 30-50% of docs to near-dup, so the blacklist is
    10^8-10^9 ids; AQE decides at runtime instead."""
    from pyspark.sql import functions as F

    from texrex_spark.operators.neardup import tecl

    corpus = spark.range(0, 1000).select(F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    bl = spark.range(0, 100, 3).select(F.col("id").alias("doc_id"))
    out = tecl(corpus, bl)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    assert out.count() == 1000 - 34


def test_pagerank_no_forced_outdeg_broadcast(spark):
    """pagerank must not hint broadcast on the out-degree table (one row
    per linking host — 10^7-10^8 at the north rule's scale, multi-GB per
    iteration if forced); AQE decides at runtime instead."""
    from pyspark.sql import functions as F

    from texrex_spark.operators.linkgraph import pagerank

    edges = spark.range(0, 200).select(
        F.concat(F.lit("h"), (F.col("id") % 11).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("id") * 7) % 13).cast("string")).alias("dst"),
    )
    ranks = pagerank(edges, iterations=2, checkpoint=False)
    analyzed = ranks._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    assert ranks.count() == 13


def test_flagship_queries_inside_driver_window():
    """The correctness driver verifies the FIRST 50 registered queries;
    the BASELINE flagship gates must stay inside that window and every
    registered query must carry an oracle."""
    from texrex_spark.plans.queries import ORACLE_SQL, QUERIES

    from texrex_spark.plans.queries import EXTRA_ORACLE_SQL

    assert len(QUERIES) <= 50, "driver verifies only the first 50"
    for flagship in (
        "q_crawl_order", "q_host_metrics", "q_pagerank", "q_link_indegree",
        "q_media_decode", "q_embed_quantize", "q_pq_codes", "q_tarc_sink",
        "q_simhash_neardup", "q_dedup_stream", "q_sessionize",
        # the three operators whose only driver gate was demoted in r03:
        "q_range_join",  # engine geolocate kernel (clean/geo.py)
        "q_simple_filter", "q_nfc_normalize",
        # brief-mandated dedup family, each directly driver-verified:
        "q_dedup_exact", "q_neardup_pairs", "q_ngram_jaccard",
        "q_embedding_neardup", "q_doc_fingerprint",
    ):
        assert flagship in QUERIES, flagship
    assert set(QUERIES) == set(ORACLE_SQL), "every query needs an oracle"
    assert set(EXTRA_QUERIES) == set(EXTRA_ORACLE_SQL)
    assert not (set(QUERIES) & set(EXTRA_QUERIES))


def test_harvest_no_forced_rank_broadcast(spark, tmp_path):
    """harvest_links must not hint broadcast on host_rank_pos (one row per
    ranked host — 10^7-10^8 at the north rule's scale, multi-GB if forced);
    AQE decides at runtime instead.  Same bug class as politeness/tecl/
    pagerank outdeg, each already pinned."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from texrex_spark.operators.frontier import FrontierConfig, FrontierScheduler

    sched = FrontierScheduler(
        spark, FrontierConfig(seen_partitions=2), str(tmp_path / "w")
    )
    link_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("relation", T.StringType()),
            ]
        )
    )
    fetched = spark.range(0, 50).select(
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("priority"),
        F.array(
            F.struct(
                F.concat(
                    F.lit("http://h"), (F.col("id") % 7).cast("string"),
                    F.lit(".example.org/page/"), F.col("id").cast("string"),
                    F.lit("/deep/enough/path"),
                ).alias("url"),
                F.lit("trlDifferentHosts").alias("relation"),
            )
        ).cast(link_t).alias("links"),
    )
    ranks = spark.range(0, 7).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".example.org")).alias("node"),
        (F.lit(1.0) / (F.col("id") + 1)).alias("rank"),
    )
    sched.set_host_ranks(ranks)
    out = sched.harvest_links(fetched, next_priority_base=0)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    assert out.count() == 50


def test_robots_gate_broadcast_hint_both_paths(spark):
    """gate_frontier's broadcast_hint parameter: hinted -> ResolvedHint in
    the analyzed plan; unhinted -> no hint, AQE decides (the 10^8-host
    escape hatch the docstring promises)."""
    from pyspark.sql import functions as F

    from texrex_spark.operators.robots import gate_frontier

    frontier = spark.range(0, 100).select(
        F.concat(F.lit("h"), (F.col("id") % 5).cast("string")).alias("host"),
        F.concat(F.lit("/p/"), F.col("id").cast("string")).alias("path"),
    )
    robots = spark.range(0, 5).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.lit(True).alias("has_robots"),
        F.array(F.lit("/admin")).alias("disallow_prefixes"),
    )
    hinted = gate_frontier(frontier, robots, broadcast_hint=True)
    unhinted = gate_frontier(frontier, robots, broadcast_hint=False)
    a_hint = hinted._jdf.queryExecution().analyzed().toString()
    a_nohint = unhinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in a_hint
    assert "ResolvedHint" not in a_nohint and "UnresolvedHint" not in a_nohint
    assert hinted.count() == 100 and unhinted.count() == 100
