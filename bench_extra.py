#!/usr/bin/env python3
"""Round-6 optimization harness (bench.py is FROZEN for the driver's
measurement; everything exploratory lives here, per the optimization
brief).

Times individual registry queries through the same noop-sink methodology
as bench.py, optionally dumping .explain("formatted") per query, plus the
frontier / clean-chain / media sections on demand.

Usage:
  python bench_extra.py queries q_a,q_b [--repeat 3] [--plans plans/r06 --suffix before]
  python bench_extra.py frontier [--urls 2000000]
  python bench_extra.py chain
  python bench_extra.py media tiff,webp,gif
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as benchmod  # reuse build_spark/warm/sections; bench.py stays unmodified


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = benchmod.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_queries(names, sf_dir, repeat, plans_dir=None, suffix=None):
    from texrex_spark.plans.queries import EXTRA_QUERIES, QUERIES

    registry = {**QUERIES, **EXTRA_QUERIES}
    spark = _spark()
    benchmod.warm(spark, sf_dir)
    out = {}
    for name in names:
        q = registry[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = q(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        times = []
        for _ in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[name] = {"min": min(times), "samples": times}
        print(name, json.dumps(out[name]), flush=True)
    spark.stop()
    print(json.dumps(out))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    args = sys.argv[2:]
    opts = {}
    pos = []
    i = 0
    while i < len(args):
        if args[i].startswith("--"):
            opts[args[i][2:]] = args[i + 1]
            i += 2
        else:
            pos.append(args[i])
            i += 1
    if mode == "queries":
        names = pos[0].split(",") if pos else benchmod.HEADLINE
        run_queries(
            names,
            sf_dir,
            int(opts.get("repeat", "3")),
            opts.get("plans"),
            opts.get("suffix", "now"),
        )
    elif mode == "frontier":
        import shutil
        import tempfile

        spark = _spark()
        benchmod.warm(spark, sf_dir)
        n = int(opts.get("urls", "2000000"))
        wd = tempfile.mkdtemp(prefix="texrex-bx-warm-")
        benchmod.bench_frontier(spark, 100_000, wd)
        shutil.rmtree(wd, ignore_errors=True)
        for _ in range(int(opts.get("repeat", "2"))):
            fd = tempfile.mkdtemp(prefix="texrex-bx-frontier-")
            try:
                print(json.dumps(benchmod.bench_frontier(spark, n, fd)), flush=True)
            finally:
                shutil.rmtree(fd, ignore_errors=True)
        spark.stop()
    elif mode == "chain":
        spark = _spark()
        benchmod.warm(spark, sf_dir)
        print(json.dumps(benchmod.bench_clean_chain(spark)))
        spark.stop()
    elif mode == "media":
        only = set(pos[0].split(",")) if pos else None
        saved = benchmod.MEDIA_CODECS
        if only:
            benchmod.MEDIA_CODECS = [(c, n) for c, n in saved if c in only]
        spark = _spark()
        benchmod.warm(spark, sf_dir)
        print(json.dumps(benchmod.bench_media(spark)))
        spark.stop()
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
