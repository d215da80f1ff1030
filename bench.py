#!/usr/bin/env python3
"""Benchmark harness: headline queries + frontier scheduling throughput.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "frontier": {"urls": N, "sec": s, "urls_per_sec": r}}

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_FRONTIER_URLS (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Default engine paths: these sum into the headline total — what a user
# of the engine actually pays.
HEADLINE = [
    "q_agg_pricing",
    "q_join_topk",
    "q_window_running",
    "q_dedup_exact",
    "q_minhash_signature",
    "q_neardup_pairs",
    "q_neardup_survivors",
    "q_token_stats",
    "q_top_tokens",
    "q_quality_score",
    "q_ann_topk",
    "q_range_join",
    "q_simhash_neardup",
    "q_sessionize",
    "q_ann_ivf",
    "q_pagerank",
]
# Parity twins: second formulations kept for oracle/plan comparison.
# Timed and reported under "twins" but excluded from the headline total
# (VERDICT r03 #8: the total tracks the engine users get).
TWINS = [
    "q_sessionize_kernel",
    "q_range_join_catalyst",
]


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("texrex_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def warm(spark, sf_dir: str) -> None:
    """One tiny JVM aggregation + one tiny Arrow/pandas-UDF round trip."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()

    @pandas_udf("long")
    def _echo(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_echo(F.col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()


def _wait_quiet(gate: float = 4.0, timeout: float = 180.0) -> None:
    """Bounded wait for the 1-min loadavg to decay below the gate before a
    timed run.  Our own 32-core phases push loadavg to ~10; exp(-t/60)
    decay from 10 to 4 needs ~55 s, so 180 s also absorbs a moderate
    external wave (decay from ~25 clears in ~110 s) without stalling the
    driver's per-round bench run."""
    t0 = time.time()
    while os.getloadavg()[0] >= gate and time.time() - t0 < timeout:
        time.sleep(5)


def bench_queries(spark, sf_dir: str, names=None) -> dict[str, float]:
    from texrex_spark.plans.queries import EXTRA_QUERIES, QUERIES

    registry = {**QUERIES, **EXTRA_QUERIES}
    out: dict[str, float] = {}
    for _ in range(2):  # two passes, per-query min: one load wave can't poison a query
        for name in (names or HEADLINE):
            q = registry[name]
            t0 = time.time()
            # full materialization without driver transfer
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            out[name] = min(out.get(name, dt), dt)
    return out


def bench_clean_chain(spark, n_docs: int = 24000) -> dict:
    """Cleaning-chain throughput (docs/s) — the reference's own
    self-metric (statswatcher docs read/written per second,
    trtexrex.pas statswatcher.inc:110-120)."""
    from texrex_spark.clean.chain import ChainConfig, clean_docs
    from texrex_spark.sources import synth

    corpus = synth.generate(
        n_hosts=max(n_docs // 50, 4), n_docs=n_docs, seed=1234
    )
    df = synth.docs_df(spark, corpus).select("doc_id", "url", "raw_html").persist()
    df.count()
    cfg = ChainConfig(use_assessment=False, shingle_hashes=100)
    # Discarded FULL-SIZE warm-up (same methodology as the frontier
    # warm-up in main()): the first chain run pays python-worker spin-up,
    # per-worker Rabin position-table builds, AND first-touch page faults
    # for the batch-sized arrays (pathologically slow on this host, see
    # BENCH.md) — all one-time process state, not chain throughput.  Full
    # size so the allocator high-water covers the measured runs.
    clean_docs(df, cfg).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(2):  # min of 2: one external host-load wave can't poison it
        _wait_quiet()
        t0 = time.time()
        clean_docs(df, cfg).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    elapsed = min(times)
    df.unpersist()
    return {
        "docs": n_docs,
        "sec": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "runs_sec": [round(t, 3) for t in times],
    }


def bench_frontier(spark, n_urls: int, work_dir: str) -> dict:
    """One scheduler round over a synthetic n-URL frontier: canonicalize ->
    partitioned-bloom dedup -> robots gate -> politeness admit.  The
    BASELINE.json metric is URLs scheduled+deduped per second."""
    from pyspark.sql import functions as F

    from texrex_spark.operators.frontier import FrontierConfig, FrontierScheduler
    from texrex_spark.operators.politeness import admit
    from texrex_spark.operators.robots import gate_frontier
    from texrex_spark.sources.synth import synthetic_frontier_df

    n_hosts = max(n_urls // 2000, 16)
    cfg = FrontierConfig(seen_partitions=32, bloom_error_rate=1e-6)
    sched = FrontierScheduler(spark, cfg, work_dir)

    raw = synthetic_frontier_df(spark, n_urls, n_hosts)
    robots = spark.range(n_hosts).select(
        F.concat(F.lit("bench"), F.col("id").cast("string"), F.lit(".example")).alias(
            "host"
        ),
        (F.col("id") % 5 == 0).alias("has_robots"),
        F.when(F.col("id") % 5 == 0, F.array(F.lit("/p/1")))
        .otherwise(F.array().cast("array<string>"))
        .alias("disallow_prefixes"),
    )
    host_state = spark.createDataFrame(
        [], "host string, last_access long, crawl_delay int"
    )

    t0 = time.time()
    cand = sched.candidates_from(raw)
    unseen = sched.seen.check_and_add(cand).where(~F.col("seen")).drop(
        "seen", "bloom_scalings", "bloom_bucket"
    )
    gated = gate_frontier(sched.with_host_path(unseen), robots)
    admitted = admit(
        gated, host_state, min_politeness=1, round_seconds=60, now=0
    )
    n_admitted = admitted.count()
    elapsed = time.time() - t0
    return {
        "urls": n_urls,
        "admitted": n_admitted,
        "sec": round(elapsed, 3),
        "urls_per_sec": round(n_urls / elapsed, 1),
    }


def main() -> None:
    import shutil
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_urls = int(os.environ.get("BENCH_FRONTIER_URLS", "2000000"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        # Discarded warm-up (same methodology as bench/scaling.py): pay
        # JVM start, codegen, Arrow + Python-worker-pool spin-up once so
        # the timed numbers measure the operators, not process bootstrap.
        # The throwaway 100k frontier round warms the full mapInPandas
        # worker pool (32 python workers) and the seen-set code path.
        warm(spark, sf_dir)
        warm_dir = tempfile.mkdtemp(prefix="texrex-bench-warm-")
        bench_frontier(spark, 100_000, warm_dir)
        shutil.rmtree(warm_dir, ignore_errors=True)
        per_query = bench_queries(spark, sf_dir)
        twins = bench_queries(spark, sf_dir, names=TWINS)
        # Frontier: min of 2 independent rounds (fresh seen-set each — a
        # reused work dir would see all URLs as duplicates), each behind a
        # short quiet gate so a single external host-load wave (BENCH.md)
        # can't poison the one number the driver records.
        runs = []
        for _ in range(2):
            _wait_quiet()
            fdir = tempfile.mkdtemp(prefix="texrex-bench-frontier-")
            try:
                runs.append(bench_frontier(spark, n_urls, fdir))
            finally:
                shutil.rmtree(fdir, ignore_errors=True)
        frontier = min(runs, key=lambda r: r["sec"])
        frontier["runs_sec"] = [r["sec"] for r in runs]
        clean = bench_clean_chain(spark)
        # Sum of timed sections (not wall): gate waits and the discarded
        # second frontier run are measurement overhead, not engine time.
        total = round(
            sum(per_query.values()) + frontier["sec"] + clean["sec"], 3
        )
        print(
            json.dumps(
                {
                    "metric": "headline queries + frontier schedule+dedup + clean chain, total timed sec",
                    "value": total,
                    "unit": "sec",
                    "queries": per_query,
                    "twins": twins,
                    "sf": sf,
                    "frontier": frontier,
                    "clean_chain": clean,
                    "cpus": cpus,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
