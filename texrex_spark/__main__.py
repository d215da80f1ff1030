"""Command-line face of the engine — the reference's binaries as
spark-submit-able subcommands, configured by the reference's own INI
job files (texrex_spark/config.py).

    python -m texrex_spark clean   --ini texrex.ini --input docs.parquet \
        --output out/ [--input-format parquet|warc|arc] [--xml] [--cpus N]
    python -m texrex_spark tender  --input cleaned/ --output blacklist/
    python -m texrex_spark tecl    --input cleaned/ --blacklist blacklist/ \
        --output survivors/ [--white] [--uniqids]
    python -m texrex_spark cowinterleave --input cleaned/ --output flat/
    python -m texrex_spark cowsplit --input flat/ --output parts/ \
        --max-records 100000

Mapping to the reference binaries: ``clean`` = texrex itself
(src/programs/texrex.pas job loop), ``tender``/``tecl`` =
trtenderapplication/trteclapplication, ``cowinterleave``/``cowsplit`` =
trcow*application.  Output is parquet; ``--xml`` additionally writes the
XML corpus lines (trwritetools.pas:81-271 sink) as text part-files.
"""

from __future__ import annotations

import argparse
import os
import sys


def _spark(cpus: int):
    """Reuse an active session when embedded (tests, notebooks); create
    and own one when run standalone.  Returns (spark, owns)."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("texrex_spark-cli")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    ), True


def _read_docs(spark, path: str, fmt: str):
    from .sources import warc as warcmod

    if fmt == "warc":
        return warcmod.read_warc(spark, path)
    if fmt == "arc":
        return warcmod.read_arc(spark, path)
    return spark.read.parquet(path)


def cmd_clean(args) -> int:
    from .clean.chain import ChainConfig, clean_docs
    from .config import chain_config_from_ini
    from .operators.export import xml_corpus

    spark, owns = _spark(args.cpus)
    cfg = ChainConfig()
    if args.ini:
        job = chain_config_from_ini(args.ini, args.data_dir)
        cfg = job.chain
        if job.ignored_keys and not args.quiet:
            print(
                f"[texrex_spark] {len(job.ignored_keys)} scheduler-only INI "
                "keys ignored (Spark schedules tasks itself)",
                file=sys.stderr,
            )
    docs = _read_docs(spark, args.input, args.input_format)
    cleaned = clean_docs(docs.select("doc_id", "url", "raw_html"), cfg)
    cleaned.write.mode("overwrite").parquet(os.path.join(args.output, "docs"))
    if args.xml:
        out = spark.read.parquet(os.path.join(args.output, "docs"))
        xml_corpus(out).select("xml").write.mode("overwrite").text(
            os.path.join(args.output, "xml")
        )
    if owns:
        spark.stop()
    return 0


def cmd_tender(args) -> int:
    from .operators.neardup import tender

    spark, owns = _spark(args.cpus)
    docs = spark.read.parquet(args.input)
    if "doc_size" not in docs.columns:
        from pyspark.sql import functions as F

        docs = docs.withColumn("doc_size", F.col("token_count"))
    bl = tender(
        docs.select("doc_id", "fingerprint", "doc_size"),
        min_shared=args.min_shared,
        max_redundancy=args.max_redundancy,
    )
    bl.write.mode("overwrite").parquet(args.output)
    if owns:
        spark.stop()
    return 0


def cmd_tecl(args) -> int:
    from .operators.neardup import tecl

    spark, owns = _spark(args.cpus)
    corpus = spark.read.parquet(args.input)
    bl = spark.read.parquet(args.blacklist).select("doc_id")
    out = tecl(corpus, bl, white=args.white, uniq_ids=args.uniqids)
    out.write.mode("overwrite").parquet(args.output)
    if owns:
        spark.stop()
    return 0


def cmd_cowinterleave(args) -> int:
    from .operators.export import cowinterleave

    spark, owns = _spark(args.cpus)
    cowinterleave(spark.read.parquet(args.input)).write.mode(
        "overwrite"
    ).parquet(args.output)
    if owns:
        spark.stop()
    return 0


def cmd_cowsplit(args) -> int:
    from .operators.export import cowsplit_write

    spark, owns = _spark(args.cpus)
    cowsplit_write(
        spark.read.parquet(args.input), args.output, args.max_records
    )
    if owns:
        spark.stop()
    return 0


def cmd_hydra(args) -> int:
    """De-hyphenation over a text column (the hydra binary,
    src/programs/hydra.pas): unigram-probability decisions per line."""
    from pyspark.sql import functions as F

    from .clean.hydra import Unigrams, hydra_udf

    spark, owns = _spark(args.cpus)
    with open(args.unigrams, encoding="utf-8", errors="replace") as f:
        uni = Unigrams.parse(f.read())
    bc = spark.sparkContext.broadcast(uni)
    df = spark.read.parquet(args.input)
    out = df.withColumn(args.text_col, hydra_udf(bc, args.german)(F.col(args.text_col)))
    out.write.mode("overwrite").parquet(args.output)
    if owns:
        spark.stop()
    return 0


def cmd_rofl(args) -> int:
    """Run-together-token fixing (the rofl binary,
    src/programs/rofl.pas): greedy longest-known-word resplit with
    prefix/suffix ignore lists."""
    from pyspark.sql import functions as F

    from . import refdata
    from .clean.rofl import rofl_udf

    spark, owns = _spark(args.cpus)
    words = refdata.load_words(args.words, args.data_dir)
    pre = refdata.load_words("prefixes.ignore", args.data_dir)
    suf = refdata.load_words("suffixes.ignore", args.data_dir)
    sc = spark.sparkContext
    df = spark.read.parquet(args.input)
    out = df.withColumn(
        args.text_col,
        rofl_udf(sc.broadcast(set(words)), sc.broadcast(set(pre)),
                 sc.broadcast(set(suf)))(F.col(args.text_col)),
    )
    out.write.mode("overwrite").parquet(args.output)
    if owns:
        spark.stop()
    return 0


def cmd_arcxi(args) -> int:
    """Random-access extraction from a TARC table (the arcxi binary,
    src/programs/arcxi.pas): on columnar storage the offset bookkeeping
    becomes a pushed-down filter + select."""
    from pyspark.sql import functions as F

    spark, owns = _spark(args.cpus)
    df = spark.read.parquet(args.input)
    if args.ids:
        wanted = [s.strip() for s in args.ids.split(",") if s.strip()]
        df = df.where(F.col("doc_id").cast("string").isin(wanted))
    if args.url_like:
        df = df.where(F.col("url").like(args.url_like))
    out = df.select(
        "doc_id", "url", F.decode(F.col("raw"), "UTF-8").alias("html")
    )
    out.write.mode("overwrite").parquet(args.output)
    if owns:
        spark.stop()
    return 0


def cmd_status(args) -> int:
    """Crawl monitoring (the texcomm binary, src/programs/texcomm.pas):
    texcomm attaches to a RUNNING texrex over IPC and prints its
    statswatcher counters; the batch counterpart reads the work dir's
    snapshot catalog and per-round metrics — same numbers, no IPC,
    no Spark session."""
    import json as _json

    from .operators.snapshots import SnapshotCatalog

    metrics_path = os.path.join(args.work_dir, "metrics.json")
    if os.path.exists(metrics_path):
        with open(metrics_path, encoding="utf-8") as f:
            rounds = _json.load(f)
        tot_fetched = sum(r["fetched"] for r in rounds)
        tot_sec = sum(r["elapsed_sec"] for r in rounds)
        print(f"rounds completed : {len(rounds)}")
        print(f"urls fetched     : {tot_fetched}")
        if tot_sec:
            print(f"mean throughput  : {sum(r['frontier'] for r in rounds) / tot_sec:,.0f} urls/s scheduled+deduped")
        for r in (rounds[-args.tail:] if args.tail > 0 else []):
            print(f"  round {r['round']}: frontier={r['frontier']} admitted={r['admitted']} "
                  f"fetched={r['fetched']} next={r['next_frontier']} "
                  f"({r['elapsed_sec']}s, {r['urls_per_sec']:,} urls/s)")
    else:
        print("no metrics.json (crawl not run or still in round 0)")
    cat = SnapshotCatalog(os.path.join(args.work_dir, "snapshots"))
    sid = cat.latest_id()
    if sid is None:
        print("snapshots        : none")
        return 0
    m = cat.manifest(sid)
    print(f"snapshot         : id={sid} round={m['round']} "
          f"(resume point: next_round={m.get('extra', {}).get('next_round')})")
    for name, t in m.get("tables", {}).items():
        print(f"  {name}: {t['rows']} rows")
    if "seen" in m:
        print(f"  seen-set: {m['seen']['buckets']} bucket bitmaps")
    return 0


def cmd_tenet(args) -> int:
    """Boilerplate-net training (the tenet binary, src/programs/tenet.pas):
    iRPROP- on a FANN .dat file, FANN_FLO_2.1 output loadable by the clean
    chain's --net (and by libfann).  Local numpy by design — training data
    is driver-sized; inference is the distributed path."""
    import numpy as np

    from .train.tenet import TrainData, to_fann_text, train_net

    with open(args.data, encoding="utf-8") as f:
        data = TrainData.parse(f.read())
    if args.symmetric_targets:
        data.y = data.y * 2.0 - 1.0  # 0/1 labels -> the symmetric output range
    hidden = tuple(int(h) for h in args.hidden.split(",") if int(h) > 0)
    net, trace = train_net(
        data, hidden=hidden, epochs=args.epochs,
        desired_error=args.error, seed=args.seed,
    )
    with open(args.output, "w", encoding="utf-8") as f:
        f.write(to_fann_text(net))
    # decision threshold: 0 in the symmetric [-1,1] range, 0.5 for raw 0/1
    thr = 0.0 if args.symmetric_targets else 0.5
    acc = float(np.mean((net.run(data.x) > thr) == (data.y[:, 0] > thr)))
    print(f"mse {trace[0]:.4f} -> {trace[-1]:.4f} over {len(trace)} reports; "
          f"train acc {acc:.3f}; net -> {args.output}")
    return 0


def cmd_synth(args) -> int:
    from .sources import synth

    spark, owns = _spark(args.cpus)
    corpus = synth.generate(
        n_hosts=args.hosts, n_docs=args.docs, seed=args.seed, n_seeds=args.seeds
    )
    synth.write_parquet(spark, corpus, args.output)
    if owns:
        spark.stop()
    return 0


def cmd_crawl(args) -> int:
    """The north-rule job: frontier scheduler rounds over a docs table,
    resumable from the work dir's snapshot catalog."""
    from pyspark.sql import functions as F

    from .operators.frontier import FrontierConfig, FrontierScheduler

    spark, owns = _spark(args.cpus)
    cfg = FrontierConfig(
        seen_partitions=args.seen_partitions,
        min_politeness=args.min_politeness,
        frontier_cap=args.frontier_cap,
        max_depth=args.max_depth,
        snapshot_every=args.snapshot_every,
        seen_filter=args.seen_filter,
    )
    sched = FrontierScheduler(spark, cfg, args.work_dir)

    docs = spark.read.parquet(args.docs)
    robots = spark.read.parquet(args.robots) if args.robots else spark.createDataFrame(
        [], "host string, has_robots boolean, disallow_prefixes array<string>, "
        "crawl_delay int"
    )
    seeds = spark.read.parquet(args.seeds)
    if "priority" not in seeds.columns:
        seeds = seeds.select(
            "url", (F.abs(F.xxhash64("url")) % F.lit(1_000_000_000)).alias("priority")
        )
    else:
        seeds = seeds.select("url", "priority")

    carried = sched.resume() if args.resume else None
    if carried is not None:
        out = sched.run(
            seeds, docs, robots, rounds=args.rounds,
            host_state=carried["host_state"], now=carried["now"],
            resume_frontier=carried["frontier"],
            start_round=carried["start_round"],
        )
    else:
        out = sched.run(seeds, docs, robots, rounds=args.rounds)
    out["fetched"].write.mode("overwrite").parquet(
        os.path.join(args.work_dir, "fetched")
    )
    metrics = sched.write_metrics()
    if not args.quiet:
        n = spark.read.parquet(os.path.join(args.work_dir, "fetched")).count()
        print(f"[texrex_spark] fetched {n} urls over {args.rounds} rounds; "
              f"metrics at {metrics}", file=sys.stderr)
    if owns:
        spark.stop()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="texrex_spark")
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("clean", help="run the cleaning chain (the texrex binary)")
    c.add_argument("--ini", help="texrex INI job file (reference format)")
    c.add_argument("--data-dir", help="artifact dir for FannFile/ProfileFile/ReplacementFile")
    c.add_argument("--input", required=True)
    c.add_argument("--input-format", choices=["parquet", "warc", "arc"], default="parquet")
    c.add_argument("--output", required=True)
    c.add_argument("--xml", action="store_true", help="also write the XML corpus sink")
    c.add_argument("--quiet", action="store_true")
    c.set_defaults(fn=cmd_clean)

    t = sub.add_parser("tender", help="near-duplicate blacklist generation")
    t.add_argument("--input", required=True)
    t.add_argument("--output", required=True)
    t.add_argument("--min-shared", type=int, default=5)
    t.add_argument("--max-redundancy", type=int, default=200)
    t.set_defaults(fn=cmd_tender)

    e = sub.add_parser("tecl", help="apply a blacklist (or whitelist) to a corpus")
    e.add_argument("--input", required=True)
    e.add_argument("--blacklist", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--white", action="store_true")
    e.add_argument("--uniqids", action="store_true")
    e.set_defaults(fn=cmd_tecl)

    ci = sub.add_parser("cowinterleave", help="flatten spans to one row per div")
    ci.add_argument("--input", required=True)
    ci.add_argument("--output", required=True)
    ci.set_defaults(fn=cmd_cowinterleave)

    cs = sub.add_parser("cowsplit", help="split output, never splitting a doc")
    cs.add_argument("--input", required=True)
    cs.add_argument("--output", required=True)
    cs.add_argument("--max-records", type=int, default=100_000)
    cs.set_defaults(fn=cmd_cowsplit)

    hy = sub.add_parser("hydra", help="de-hyphenate a text column (hydra binary)")
    hy.add_argument("--input", required=True)
    hy.add_argument("--output", required=True)
    hy.add_argument("--unigrams", required=True, help="unigram count file")
    hy.add_argument("--text-col", default="text")
    hy.add_argument("--german", action="store_true")
    hy.set_defaults(fn=cmd_hydra)

    ro = sub.add_parser("rofl", help="fix run-together tokens (rofl binary)")
    ro.add_argument("--input", required=True)
    ro.add_argument("--output", required=True)
    ro.add_argument("--words", default="en.words")
    ro.add_argument("--data-dir", help="dir with word/ignore lists")
    ro.add_argument("--text-col", default="text")
    ro.set_defaults(fn=cmd_rofl)

    ax = sub.add_parser("arcxi", help="extract docs from a TARC table (arcxi binary)")
    ax.add_argument("--input", required=True)
    ax.add_argument("--output", required=True)
    ax.add_argument("--ids", help="comma-separated doc ids")
    ax.add_argument("--url-like", help="SQL LIKE pattern on url")
    ax.set_defaults(fn=cmd_arcxi)

    st = sub.add_parser("status", help="crawl progress/metrics (the texcomm console)")
    st.add_argument("--work-dir", required=True)
    st.add_argument("--tail", type=int, default=5, help="show the last N rounds")
    st.set_defaults(fn=cmd_status)

    tn = sub.add_parser("tenet", help="train a boilerplate net (the tenet binary)")
    tn.add_argument("--data", required=True, help="FANN .dat training file")
    tn.add_argument("--output", required=True, help="FANN_FLO_2.1 .net output")
    tn.add_argument("--hidden", default="18", help="comma-separated hidden sizes")
    tn.add_argument("--epochs", type=int, default=50_000)
    tn.add_argument("--error", type=float, default=1e-4, help="target MSE")
    tn.add_argument("--seed", type=int, default=7)
    tn.add_argument("--symmetric-targets", action="store_true",
                    help="map 0/1 labels to -1/1 (the shipped .dat files)")
    tn.set_defaults(fn=cmd_tenet)

    sy = sub.add_parser("synth", help="generate a deterministic synthetic web")
    sy.add_argument("--output", required=True)
    sy.add_argument("--hosts", type=int, default=12)
    sy.add_argument("--docs", type=int, default=300)
    sy.add_argument("--seeds", type=int, default=24)
    sy.add_argument("--seed", type=int, default=42)
    sy.set_defaults(fn=cmd_synth)

    cr = sub.add_parser("crawl", help="frontier scheduler rounds (resumable)")
    cr.add_argument("--work-dir", required=True)
    cr.add_argument("--seeds", required=True, help="parquet (url[, priority])")
    cr.add_argument("--docs", required=True, help="parquet (doc_id, url, host, links)")
    cr.add_argument("--robots", help="parquet robots table")
    cr.add_argument("--rounds", type=int, default=5)
    cr.add_argument("--seen-partitions", type=int, default=32)
    cr.add_argument("--min-politeness", type=int, default=2)
    cr.add_argument("--frontier-cap", type=int, default=1_000_000)
    cr.add_argument("--max-depth", type=int, default=6)
    cr.add_argument("--snapshot-every", type=int, default=0)
    cr.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom")
    cr.add_argument("--resume", action="store_true")
    cr.add_argument("--quiet", action="store_true")
    cr.set_defaults(fn=cmd_crawl)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
