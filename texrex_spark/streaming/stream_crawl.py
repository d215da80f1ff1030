"""Structured-Streaming face of the crawl (SURVEY.md §2.7 streaming).

The reference has no streaming concepts — its crawl loop is a synchronous
superstep (§3.2) — but the frontier loop maps naturally onto a
rate-limited stream: a rate source ticks rounds, ``foreachBatch`` runs one
scheduler round per tick against shared frontier/host-state storage, and
crawl metrics aggregate under an event-time watermark.

Two deliverables:

- ``fetch_metrics_stream``: watermarked tumbling-window aggregation over a
  stream of fetch events (url, host, fetched_at, bytes) — the streaming
  twin of the per-round metrics table; late events beyond the watermark
  are dropped by Spark, matching at-most-once metric accounting.
- ``run_streaming_crawl``: rate-source-driven superstep loop via
  foreachBatch (one frontier round per trigger), demonstrating the
  streaming execution of the SAME round logic used by the batch scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fetch_metrics_stream(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming DataFrame of fetch events -> windowed per-host metrics.

    events: streaming DF with (host string, fetched_at timestamp,
    bytes long, valid boolean)."""
    return (
        events.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window).alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("fetches"),
            F.sum(F.col("bytes")).alias("bytes"),
            F.sum(F.when(F.col("valid"), 1).otherwise(0)).alias("valid_docs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "fetches",
            "bytes",
            "valid_docs",
        )
    )


def run_streaming_crawl(
    spark: SparkSession,
    scheduler,
    seeds: DataFrame,
    docs: DataFrame,
    robots: DataFrame,
    rounds: int,
    rows_per_second: int = 1,
    timeout_sec: int = 300,
):
    """Drive scheduler rounds from a rate stream via foreachBatch.

    Each micro-batch advances one superstep round (batch semantics reused
    verbatim — foreachBatch hands us a batch DataFrame and we ignore its
    payload, using the tick purely as the round clock).  Returns the
    scheduler's metrics list."""
    state = {"round": 0, "frontier": None, "host_state": None, "now": 0}

    def tick(batch_df, batch_id: int) -> None:
        if state["round"] >= rounds:
            return
        if state["frontier"] is None:
            out = scheduler.run(seeds, docs, robots, rounds=1)
        else:
            # continue from the previous tick: carried frontier, politeness
            # host state, and logical clock all re-enter run()
            frontier = state["frontier"]
            out = scheduler.run(
                frontier.select(
                    F.col("url_norm").alias("url"), F.col("priority")
                ),
                docs,
                robots,
                rounds=1,
                host_state=state["host_state"],
                now=state["now"],
            )
        state["frontier"] = out["frontier"]
        state["host_state"] = out["host_state"].localCheckpoint(eager=True)
        state["now"] = out["now"]
        state["round"] += 1

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    query = stream.writeStream.foreachBatch(tick).trigger(
        processingTime="1 second"
    ).start()
    try:
        import time

        t0 = time.time()
        while state["round"] < rounds and time.time() - t0 < timeout_sec:
            time.sleep(0.5)
    finally:
        query.stop()
    return scheduler.metrics
