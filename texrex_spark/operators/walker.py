"""Spark superstep runner for the ClaraX random walk.

Distribution model (SURVEY.md §3.2): K independent walkers advance in
lockstep rounds.  Each round is

    states ──applyInPandas(advance)──▶ fetch requests (≤1 per walker)
    requests ⋈ docs table  ("the network" — broadcast-hash equi-join,
                            requests side broadcast: K rows vs the corpus)
    results fed back into the next advance

The per-walker sequential semantics live in operators/walkstate.py (shared
with the single-process oracle); this module owns only the distributed
plumbing: state serialization, the fetch join, log/emission extraction,
lineage truncation, and parquet snapshot checkpoints with per-round
metrics.  Crawl order is decided exclusively by (walker_id, seq) from the
pinned RNG protocol — never by task scheduling — so the output is invariant
under partitioning (SURVEY.md §7.4).

Scale notes: walkers scale horizontally (each is one group in the
applyInPandas shuffle); the corpus join is the heavy stage and uses the
docs table's own partitioning.  Walker state (bloom + cache + stack)
travels through the shuffle, so per-walker blooms are sized for
ordering-parity crawls (10^5..10^7 URLs/walker); the 10^10-frontier path is
operators/frontier.py, where the seen-set is a partitioned bloom instead.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..clean.simplefilter import valid_col
from ..functions.urlnorm import canonicalize_col
from ..operators.walkstate import WalkConfig, WalkerState, partition_seeds, robots_map

ADVANCE_SCHEMA = (
    "walker_id int, state binary, fetch_url string, done boolean, "
    "log_json string, emitted_json string"
)

LOG_TABLE_SCHEMA = (
    "round int, walker_id int, seq int, clock int, follow string, url string, "
    "host string, wait int, http string, process string, seen int, "
    "links_found int, stack_size int"
)

EMITTED_TABLE_SCHEMA = (
    "round int, walker_id int, partition_id int, seq int, url string, "
    "doc_id string"
)


def _advance(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel over a BUCKET of walkers: for each walker row,
    deliver the round's fetch result, walk to the next fetch boundary, and
    drain logs/emissions.

    Grouping is by ``walker_id % n_buckets``, not by walker_id: one pandas
    frame per walker costs a fixed per-group Arrow/pandas toll that makes
    round wall time grow with K instead of with work (measured 27x the
    round time for 10x the walkers at K=10,000 before bucketing).  Each
    walker is still advanced independently from its own pickled state, so
    the result is row-identical for any bucket count (test_walk_parity
    pins partition invariance; q_crawl_order pins the sequential oracle)."""
    cols = {
        "walker_id": [], "state": [], "fetch_url": [], "done": [],
        "log_json": [], "emitted_json": [],
    }
    advanced: set = set()
    for row in pdf.itertuples(index=False):
        if row.walker_id in advanced:
            # one advance per walker per round (the old per-walker group
            # collapsed duplicate fetch-join rows with iloc[0])
            continue
        advanced.add(row.walker_id)
        st = WalkerState.loads(row.state)
        if st.pending is not None:
            links_json = row.links_json
            links = [
                (l["url"], l["relation"]) for l in json.loads(links_json)
            ] if isinstance(links_json, str) and links_json else []
            st.deliver_fetch(
                found=bool(row.found) if pd.notna(row.found) else False,
                valid=bool(row.valid) if pd.notna(row.valid) else False,
                links=links,
                doc_id=row.doc_id if pd.notna(row.doc_id) else "",
            )
        url = st.run_until_fetch()
        log_rows = [vars(r) for r in st.drain_log()]
        emitted = [
            {"seq": seq, "url": u, "doc_id": did}
            for (seq, u, did) in st.drain_emitted()
        ]
        cols["walker_id"].append(st.walker_id)
        cols["state"].append(st.dumps())
        cols["fetch_url"].append(url)
        cols["done"].append(st.done)
        cols["log_json"].append(json.dumps(log_rows))
        cols["emitted_json"].append(json.dumps(emitted))
    return pd.DataFrame(cols)


@dataclass
class SparkCrawl:
    """Distributed crawl session over a docs DataFrame."""

    spark: SparkSession
    config: WalkConfig
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0  # rounds; 0 = only on finish
    clean_config: object | None = None  # ChainConfig -> fetch via clean chain
    metrics: list[dict] = field(default_factory=list)
    rounds_run: int = 0

    def prepare_fetch_table(
        self, docs: DataFrame, clean_config=None
    ) -> DataFrame:
        """The synthetic 'network': canonical-URL-keyed fetch results.

        Two modes:
        - golden mode (default): validity + link lists come from the docs
          table's own columns, computed once JVM-side at scan time.
        - chain mode (clean_config given): raw_html runs through the FULL
          cleaning chain (clean.chain.clean_docs) exactly as the reference
          walker processes each fetched page (trwalkers.pas:700-771); links
          and validity are the chain's outputs.  The oracle uses the same
          kernel, so ordering parity is preserved by construction.
        """
        if clean_config is not None:
            from ..clean.chain import clean_docs

            cleaned = clean_docs(
                docs.select("doc_id", "url", "raw_html"), clean_config
            )
            return cleaned.select(
                canonicalize_col(F.col("url")).alias("url_canon"),
                F.col("doc_id"),
                (F.col("valid") & valid_col(F.col("spans"))).alias("valid"),
                F.to_json(F.col("links")).alias("links_json"),
            ).where(F.col("url_canon") != "")
        return (
            docs.select(
                canonicalize_col(F.col("url")).alias("url_canon"),
                F.col("doc_id"),
                valid_col(F.col("spans")).alias("valid"),
                F.to_json(F.col("links")).alias("links_json"),
            )
            .where(F.col("url_canon") != "")
        )

    def init_states(self, seeds: list[str], robots_rows: list[dict]) -> DataFrame:
        parts = partition_seeds(seeds, self.config.n_walkers)
        rmap = robots_map(robots_rows)
        rows = [
            (wid, WalkerState(wid, self.config, parts[wid], rmap).dumps())
            for wid in range(self.config.n_walkers)
        ]
        return self.spark.createDataFrame(rows, "walker_id int, state binary")

    def run(
        self,
        docs: DataFrame,
        seeds: list[str],
        robots_rows: list[dict],
        max_rounds: int = 10_000,
        states: DataFrame | None = None,
    ) -> dict[str, DataFrame]:
        fetch_df = self.prepare_fetch_table(docs, self.clean_config).persist()
        fetch_df.count()  # materialize once; every round joins against it

        if states is None:
            states = self.init_states(seeds, robots_rows)
        if "fetch_url" not in states.columns:
            # fresh start: nothing in flight.  A resumed snapshot carries the
            # in-flight fetch_url and MUST keep it — the pickled state still
            # has that fetch pending, and round 1 must feed it the join
            # result, not a synthetic failure.
            states = states.withColumn("fetch_url", F.lit(None).cast("string"))
        states = states.select("walker_id", "state", "fetch_url")

        # State carry between rounds.  Chained localCheckpoints degrade
        # super-linearly in long loops (measured: x2.5/round past ~18
        # rounds on Spark 4.1), so state round-trips through storage
        # instead: through the driver for small fleets (default; K x
        # ~250 KB per round), or through a parquet round file when a
        # checkpoint_dir is set (fully distributed; the round file doubles
        # as the resumable snapshot).
        if self.checkpoint_dir is None and self.config.n_walkers > 100:
            # Driver round-trips are bounded (K x ~250 KB/round) but stop
            # being the right default past ~100 walkers; flip to the
            # distributed parquet round files automatically.
            self.checkpoint_dir = self._auto_checkpoint_dir()
            self._auto_ckpt = self.checkpoint_dir
        parquet_mode = bool(self.checkpoint_dir)
        states_rows: list[tuple] = []
        if parquet_mode:
            # Per-run scratch subdir: a resumed run in the same
            # checkpoint_dir must not read a previous run's round files
            # back into its log tables.
            import uuid

            self._rounds_base = os.path.join(
                self.checkpoint_dir, "rounds", f"run-{uuid.uuid4().hex[:8]}"
            )
            states = self._write_round_states(states, 0)
        else:
            states_rows = [
                (r["walker_id"], bytearray(r["state"]), r["fetch_url"])
                for r in states.collect()
            ]

        # Log/emission rows: in parquet_mode they stay distributed — each
        # round file already carries log_json/emitted_json, and the log
        # tables are parsed out of those files at the end (or at snapshot
        # time) without ever crossing the driver.  The driver lists below
        # are used only by the small-fleet default, where they are bounded
        # (K x O(events) per round).
        log_rows: list[tuple] = []
        emitted_rows: list[tuple] = []
        state_schema = "walker_id int, state binary, fetch_url string"

        for rnd in range(max_rounds):
            if not parquet_mode:
                states = self.spark.createDataFrame(states_rows, state_schema)

            requests = states.where(F.col("fetch_url").isNotNull()).select(
                "walker_id", "fetch_url"
            )
            fetched = F.broadcast(requests).join(
                fetch_df, requests.fetch_url == fetch_df.url_canon, "inner"
            ).select(
                "walker_id",
                F.lit(True).alias("found"),
                "valid",
                "links_json",
                "doc_id",
            )
            inp = states.join(fetched, "walker_id", "left").select(
                "walker_id", "state", "found", "valid", "links_json", "doc_id"
            )
            # Bucketed advance: ~4 groups per core, NOT one group per
            # walker — per-group Arrow overhead at K groups made round
            # time scale with K (see _advance docstring).  Bucket count is
            # capped at K so tiny fleets keep one walker per group.
            n_buckets = min(
                self.config.n_walkers,
                4 * self.spark.sparkContext.defaultParallelism,
            )
            out = (
                inp.withColumn(
                    "_bucket", F.pmod(F.col("walker_id"), F.lit(n_buckets))
                )
                .groupBy("_bucket")
                .applyInPandas(_advance, ADVANCE_SCHEMA)
            )

            if parquet_mode:
                states = self._write_round_states(out, rnd + 1)
                # Logs stay in the round file; the only driver transfer is
                # the active-walker count (column-pruned K-row scan).
                n_active = states.where(F.col("fetch_url").isNotNull()).count()
            else:
                round_meta = out.collect()
                states_rows = [
                    (r["walker_id"], bytearray(r["state"]), r["fetch_url"])
                    for r in round_meta
                ]
                n_active = 0
                for row in round_meta:
                    if row["fetch_url"] is not None:
                        n_active += 1
                    for r in json.loads(row["log_json"]):
                        log_rows.append(
                            (
                                rnd, r["walker_id"], r["seq"], r["clock"], r["follow"],
                                r["url"], r["host"], r["wait"], r["http"], r["process"],
                                r["seen"], r["links_found"], r["stack_size"],
                            )
                        )
                    for e in json.loads(row["emitted_json"]):
                        emitted_rows.append(
                            (rnd, row["walker_id"], 0, e["seq"], e["url"], e["doc_id"])
                        )

            self.metrics.append(
                {"round": rnd, "active_walkers": n_active, "rounds_total": rnd + 1}
            )
            self.rounds_run = rnd + 1

            if parquet_mode and (
                n_active == 0
                or (self.checkpoint_every and (rnd + 1) % self.checkpoint_every == 0)
            ):
                self._snapshot(states.select("walker_id", "state", "fetch_url"), rnd)
            if n_active == 0:
                break

        if not parquet_mode:
            states = self.spark.createDataFrame(states_rows, state_schema)
            crawl_log = self.spark.createDataFrame(log_rows, LOG_TABLE_SCHEMA)
            emitted = self.spark.createDataFrame(emitted_rows, EMITTED_TABLE_SCHEMA)
        else:
            states = states.select("walker_id", "state", "fetch_url")
            crawl_log, emitted = self._logs_from_rounds()

        if getattr(self, "_auto_ckpt", None):
            # The auto round dir is rmtree'd below; every returned
            # DataFrame still reads from its parquet files, so cut the
            # file lineage first (eager localCheckpoint materializes the
            # blocks) or the caller's first action on states/logs would
            # hit path-does-not-exist.
            states = states.localCheckpoint(eager=True)
            crawl_log = crawl_log.localCheckpoint(eager=True)
            emitted = emitted.localCheckpoint(eager=True)

        result = {
            "crawl_log": crawl_log.orderBy("walker_id", "seq"),
            "emitted": emitted.orderBy("walker_id", "seq"),
            "states": states,
        }
        fetch_df.unpersist()
        self._cleanup_auto_checkpoint()
        return result

    def _auto_checkpoint_dir(self) -> str:
        """Resolve a cluster-visible directory for the automatic
        >100-walker flip.  Preference order: spark.texrex.work.dir
        (explicit job work dir), then the RDD checkpoint dir if the job
        set one (a shared filesystem on a real cluster), then a
        driver-local tempdir — the last is valid ONLY under local[N],
        where driver and executors share /tmp, so any other master
        raises instead of silently writing round files executors can't
        read."""
        import tempfile
        import uuid

        base = self.spark.conf.get("spark.texrex.work.dir", None)
        if not base:
            try:
                base = self.spark.sparkContext.getCheckpointDir()
            except Exception:
                base = None
        if base:
            return os.path.join(base, f"walk-ckpt-{uuid.uuid4().hex[:8]}")
        if not self.spark.sparkContext.master.startswith("local"):
            raise ValueError(
                "n_walkers > 100 needs a cluster-visible checkpoint dir: "
                "pass checkpoint_dir=, or set spark.texrex.work.dir / "
                "sparkContext.setCheckpointDir"
            )
        return tempfile.mkdtemp(prefix="texrex-walk-ckpt-")

    def _cleanup_auto_checkpoint(self) -> None:
        """Remove an auto-created checkpoint dir after a completed run —
        the caller never saw the path, so its round files are garbage
        (explicitly passed checkpoint_dirs are the resumable snapshot and
        are never touched).  Only local paths are removed here; a shared
        base from spark.texrex.work.dir keeps its files for inspection."""
        import shutil

        auto = getattr(self, "_auto_ckpt", None)
        if auto and os.path.isdir(auto):
            shutil.rmtree(auto, ignore_errors=True)
        if auto:
            self._auto_ckpt = None
            self.checkpoint_dir = None

    def _write_round_states(self, df: DataFrame, rnd: int) -> DataFrame:
        """Parquet round-trip: persist this round's full advance output and
        read it back (lineage fully cut; survives driver restarts).

        The file for round ``rnd`` carries the logs drained while
        advancing round ``rnd - 1`` (the initial round-0 file has none),
        stamped as ``_round`` so the distributed log tables can be parsed
        straight out of the round files (``_logs_from_rounds``) without a
        per-round driver collect."""
        path = os.path.join(self._rounds_base, f"round-{rnd:06d}")
        cols = set(df.columns)
        full = df
        for name in ("log_json", "emitted_json"):
            if name not in cols:
                full = full.withColumn(name, F.lit("[]"))
        full = full.withColumn("_round", F.lit(rnd - 1)).withColumn(
            "_partition_id", F.spark_partition_id()
        )
        full.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    _LOG_JSON_SCHEMA = (
        "array<struct<walker_id:int,seq:int,clock:int,follow:string,"
        "url:string,host:string,wait:int,http:string,process:string,"
        "seen:int,links_found:int,stack_size:int>>"
    )
    _EMITTED_JSON_SCHEMA = "array<struct<seq:int,url:string,doc_id:string>>"

    def _logs_from_rounds(self) -> tuple[DataFrame, DataFrame]:
        """Parse the crawl-log and emission tables out of this run's round
        files — a distributed parquet scan + from_json + explode, never a
        driver list (VERDICT r03 #3).  Round-0 is the initial state write
        (``_round`` = -1, no logs) and is filtered at the scan."""
        df = (
            self.spark.read.option("recursiveFileLookup", "true")
            .parquet(self._rounds_base)
            .where(F.col("_round") >= 0)
        )
        crawl_log = (
            df.select(
                F.col("_round").alias("round"),
                F.explode(
                    F.from_json("log_json", self._LOG_JSON_SCHEMA)
                ).alias("r"),
            )
            .select("round", "r.*")
        )
        emitted = (
            df.select(
                F.col("_round").alias("round"),
                F.col("walker_id"),
                F.col("_partition_id").alias("partition_id"),
                F.explode(
                    F.from_json("emitted_json", self._EMITTED_JSON_SCHEMA)
                ).alias("e"),
            )
            .select("round", "walker_id", "partition_id", "e.seq", "e.url", "e.doc_id")
        )
        return crawl_log, emitted

    # -- snapshot checkpoints (Iceberg-style: data + manifest commit) -------

    def _snapshot(self, states, rnd: int) -> None:
        snap = os.path.join(self.checkpoint_dir, f"snap-{rnd + 1:06d}")
        states.write.mode("overwrite").parquet(os.path.join(snap, "states"))
        crawl_log, emitted = self._logs_from_rounds()
        crawl_log.write.mode("overwrite").parquet(os.path.join(snap, "crawl_log"))
        emitted.write.mode("overwrite").parquet(os.path.join(snap, "emitted"))
        manifest = {
            "round": rnd + 1,
            "metrics": self.metrics,
            "config_seed": self.config.seed,
            "n_walkers": self.config.n_walkers,
        }
        tmp = os.path.join(self.checkpoint_dir, f".manifest-{rnd + 1:06d}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(snap, "manifest.json"))

    @staticmethod
    def latest_snapshot(checkpoint_dir: str) -> str | None:
        if not os.path.isdir(checkpoint_dir):
            return None
        snaps = sorted(
            d
            for d in os.listdir(checkpoint_dir)
            if d.startswith("snap-")
            and os.path.exists(os.path.join(checkpoint_dir, d, "manifest.json"))
        )
        return os.path.join(checkpoint_dir, snaps[-1]) if snaps else None

    def resume_states(self, snapshot_path: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(snapshot_path, "states"))
