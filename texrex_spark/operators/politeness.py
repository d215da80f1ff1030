"""Per-host politeness: the reference's wait formula + the Spark admission op.

Formula parity (/root/reference/src/units/trpoliteness.pas:320-362):

    robots-forbidden                  -> -1
    never accessed                    ->  0   (and mark accessed)
    else  wait = max(max(robots_crawl_delay, min_politeness) - elapsed, 0)

The reference sleeps on a wall clock; a distributed, deterministic rebuild
replaces that with a *logical clock*: integer time units that each walker /
each scheduler round advances explicitly.  The formula is unchanged.

Two consumers:

- ``HostState`` — the sequential per-walker politeness map used by the
  random-walk walker and the oracle (the reference is single-threaded, so
  host state is walker-private there too; trwalkers.pas:484).
- ``admit`` — the batch scheduler's politeness operator: given a candidate
  frontier and per-host state, admit at most ``ceil(budget window / delay)``
  URLs per host per round via a rank over a window partitioned by host.
  Hot hosts are a classic skew source, so ranking salts the host key first
  (Zipf hosts otherwise serialize one reducer at 10^10 scale) and takes the
  global per-host rank in a second, now-tiny aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def seconds_until_retrieval(
    last_access: int,
    crawl_delay: int,
    min_politeness: int,
    now: int,
    allowed: bool = True,
) -> int:
    """trpoliteness.pas:320-362 on a logical clock."""
    if not allowed:
        return -1
    if last_access == -1:
        return 0
    elapsed = now - last_access
    return max(max(crawl_delay, min_politeness) - elapsed, 0)


@dataclass
class HostState:
    """Walker-private host-access map (TTrPolitenessManager, sequential)."""

    min_politeness: int
    last_access: dict[str, int] = field(default_factory=dict)
    crawl_delay: dict[str, int] = field(default_factory=dict)

    def wait(self, host: str, now: int, allowed: bool = True) -> int:
        return seconds_until_retrieval(
            self.last_access.get(host, -1),
            self.crawl_delay.get(host, -1),
            self.min_politeness,
            now,
            allowed,
        )

    def retrieved(self, host: str, now: int) -> None:
        self.last_access[host] = now


def effective_delay_col(crawl_delay, min_politeness: int):
    delay = F.coalesce(crawl_delay, F.lit(-1))
    return F.greatest(delay, F.lit(min_politeness))


def admit(
    frontier: DataFrame,
    host_state: DataFrame,
    min_politeness: int,
    round_seconds: int,
    now: int,
    salt_buckets: int = 64,
) -> DataFrame:
    """Politeness admission for one scheduler round.

    frontier:    candidate fetches with (url_norm, host, priority) —
                 lower priority value = fetched earlier.
    host_state:  (host, last_access, crawl_delay); hosts absent from it are
                 fresh (last_access = -1, crawl_delay = -1).
    Admits per host the URLs that fit into ``round_seconds`` logical seconds
    given the host's effective delay, assigning each a ``fetch_time``.
    Returns the admitted subset with (fetch_time, host_rank) columns.

    Physical shape: the rank is computed in two stages to kill host skew —
    stage 1 ranks within (host, salt) buckets after a shuffle on the salted
    key, stage 2 merges the per-bucket ranks with a window over buckets,
    which touches only ``salt_buckets`` rows per host, not the raw URLs.
    """
    delay = effective_delay_col(F.col("crawl_delay"), min_politeness)
    first_free = F.when(
        F.coalesce(F.col("last_access"), F.lit(-1)) == -1, F.lit(now)
    ).otherwise(F.greatest(F.col("last_access") + delay, F.lit(now)))

    # NO forced broadcast of host_state: at 10^10 URLs the host table is
    # 10^7-10^8 rows, far past broadcast limits, and a hardcoded hint would
    # bypass AQE's size check.  Left un-hinted, AQE broadcasts it while it
    # is small and falls back to a shuffled hash join when it is not.
    cand = frontier.join(host_state, "host", "left").withColumn(
        "_salt", F.pmod(F.xxhash64("url_norm"), F.lit(salt_buckets))
    )

    bucket_w = Window.partitionBy("host", "_salt").orderBy("priority", "url_norm")
    ranked = cand.withColumn("_bucket_rank", F.row_number().over(bucket_w))

    # Per-host budget: how many fetches fit in this round at the host's delay.
    budget = F.greatest(
        (F.lit(round_seconds) / F.greatest(delay, F.lit(1))).cast("long"), F.lit(1)
    )

    # Cheap pre-trim: a bucket never contributes more than the full budget.
    ranked = ranked.where(F.col("_bucket_rank") <= budget)

    # Merge bucket ranks into a global per-host rank.  After the pre-trim the
    # per-host row count is <= salt_buckets * budget, so this window is small.
    host_w = Window.partitionBy("host").orderBy("priority", "url_norm")
    admitted = (
        ranked.withColumn("host_rank", F.row_number().over(host_w))
        .where(F.col("host_rank") <= budget)
        .withColumn(
            "fetch_time", first_free + (F.col("host_rank") - 1) * F.greatest(delay, F.lit(1))
        )
        .where(F.col("fetch_time") < F.lit(now + round_seconds))
        .drop("_salt", "_bucket_rank")
    )
    return admitted


def advance_host_state(host_state: DataFrame, admitted: DataFrame) -> DataFrame:
    """Fold a round's admitted fetches back into (host, last_access, crawl_delay)."""
    last = admitted.groupBy("host").agg(F.max("fetch_time").alias("new_last_access"))
    return (
        host_state.join(last, "host", "full")
        .select(
            "host",
            F.greatest(
                F.coalesce(F.col("last_access"), F.lit(-1)),
                F.coalesce(F.col("new_last_access"), F.lit(-1)),
            ).alias("last_access"),
            F.coalesce(F.col("crawl_delay"), F.lit(-1)).alias("crawl_delay"),
        )
    )
