#!/usr/bin/env python3
"""Walker-fleet scaling bench (VERDICT r04 #7): round wall-time vs fleet
size K.

Runs the SAME corpus + seed list through the distributed superstep runner
(operators/walker.py) at K=1,000 and K=10,000 walkers in parquet round-file
mode, and reports wall seconds per round at each K.  What this certifies:

- the K-row fetch-request broadcast (walker.py requests side of the corpus
  join) survives a 10x fleet,
- the K-group applyInPandas advance scales with cores, not with K
  serially,
- nothing but the active-walker COUNT crosses the driver per round
  (parquet mode keeps states and logs distributed by construction).

Walker blooms are sized small (1e-3, the fleet-bench posture) — fleet
scaling is about the shuffle/group plumbing, not seen-set capacity; the
10^10-URL seen-set path is operators/frontier.py and has its own
harness (bench/scaling.py).

Usage: python3 bench/walkers.py            # prints one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FLEETS = [int(k) for k in os.environ.get("WALKER_FLEETS", "1000,10000").split(",")]
ROUNDS = int(os.environ.get("WALKER_ROUNDS", "6"))


def wait_quiet(gate: float = 4.0, timeout: float = 300.0) -> float:
    t0 = time.time()
    load = os.getloadavg()[0]
    while load >= gate and time.time() - t0 < timeout:
        time.sleep(10)
        load = os.getloadavg()[0]
    return round(load, 2)


def main() -> None:
    from pyspark.sql import SparkSession

    from texrex_spark.operators.walker import SparkCrawl
    from texrex_spark.operators.walkstate import WalkConfig
    from texrex_spark.sources import synth

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("texrex-walker-fleet")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("WALKER_DRIVER_MEM", "28g")
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # One corpus + seed list for every fleet size: only K varies.  Seeds
    # are round-robined over walkers (partition_seeds), so K=1,000 gets
    # 10 seeds/walker and K=10,000 gets 1 — every walker starts live.
    corpus = synth.generate(
        n_hosts=256, n_docs=20_000, seed=7, n_seeds=max(FLEETS)
    )
    docs = synth.docs_df(spark, corpus).persist()
    docs.count()

    results = {}
    for k in FLEETS:
        cfg = WalkConfig(
            seed=13,
            n_walkers=k,
            max_steps=12,
            bloom_error_rate=1e-3,
            bloom_max_memory_mb=4,
        )
        ckpt = tempfile.mkdtemp(prefix=f"texrex-fleet-{k}-", dir="/dev/shm")
        try:
            # warm-up: 1 round, discarded (python-worker spin-up + codegen)
            SparkCrawl(spark, cfg, checkpoint_dir=ckpt).run(
                docs, corpus.seeds, corpus.robots, max_rounds=1
            )
            load_before = wait_quiet()
            sc = SparkCrawl(spark, cfg, checkpoint_dir=ckpt)
            t0 = time.time()
            out = sc.run(docs, corpus.seeds, corpus.robots, max_rounds=ROUNDS)
            # one action on the distributed log table so the run is fully
            # materialized end-to-end (parquet logs -> table)
            n_log = out["crawl_log"].count()
            elapsed = time.time() - t0
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
        results[str(k)] = {
            "walkers": k,
            "rounds": sc.rounds_run,
            "sec_total": round(elapsed, 2),
            "sec_per_round": round(elapsed / max(sc.rounds_run, 1), 3),
            "log_rows": n_log,
            "active_last_round": sc.metrics[-1]["active_walkers"],
            "load_before": load_before,
            "load_after": round(os.getloadavg()[0], 2),
        }

    ks = [str(k) for k in FLEETS]
    ratio = round(
        results[ks[-1]]["sec_per_round"] / results[ks[0]]["sec_per_round"], 2
    )
    print(
        json.dumps(
            {
                "metric": "walker-fleet round wall-time vs K (parquet mode)",
                "fleets": results,
                "round_time_ratio_10x_walkers": ratio,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
