"""Event sessionization: per-user session assembly under an inactivity gap.

The training-data primitive the reference's per-host crawl bookkeeping
(trwalkers host visit streams) generalizes to: group a user/host event
stream into "visits" separated by more than ``gap_sec`` of silence, and
emit one row per session with its span and event count.

Batch engine (``sessionize``): ONE shuffle on the natural key (user_id),
then a vectorized numpy kernel per group inside ``applyInPandas`` — sort
by timestamp, diff against the gap, cumulative-sum the break flags.  No
per-row Python.  At 10^10 events this is the minimal-shuffle plan: the
groupBy key is the session key, everything after the exchange is map-side.

Streaming twin (streaming/sessionize.py): the same gap rule kept as
per-user state in ``applyInPandasWithState``; closed sessions emit per
micro-batch.  tests/test_sessionize.py pins batch == stream equivalence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id bigint, session_id int, n_events int, start_s bigint, end_s bigint"
)


def sessionize_pdf(pdf: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    """Vectorized gap-rule kernel for one user's events (epoch-second
    column ``ts_s``).  Sessions are numbered 1..n in time order, exactly
    the lag/cumsum SQL derivation — the oracle twin in plans/queries.py."""
    if len(pdf) == 0:
        return pd.DataFrame(
            columns=["user_id", "session_id", "n_events", "start_s", "end_s"]
        )
    ts = np.sort(pdf["ts_s"].to_numpy(dtype=np.int64))
    breaks = np.ones(len(ts), dtype=np.int32)
    breaks[1:] = np.diff(ts) > gap_sec
    sid = np.cumsum(breaks, dtype=np.int32)
    starts = np.flatnonzero(breaks)
    ends = np.concatenate((starts[1:], [len(ts)])) - 1
    return pd.DataFrame(
        {
            "user_id": np.int64(pdf["user_id"].iloc[0]),
            "session_id": sid[starts],
            "n_events": (ends - starts + 1).astype(np.int32),
            "start_s": ts[starts],
            "end_s": ts[ends],
        }
    )


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization: (user_id, session_id, n_events, start_s,
    end_s), one row per session, sessions numbered per user in time
    order."""
    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).alias("ts_s"),
    )

    def work(pdf: pd.DataFrame) -> pd.DataFrame:
        return sessionize_pdf(pdf, gap_sec)

    return src.groupBy("user_id").applyInPandas(work, SESSION_SCHEMA)


def sessionize_catalyst(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Pure-Catalyst twin of ``sessionize``: lag -> break flag -> running
    sum -> groupBy, identical output.  Whole-stage-codegen end to end (no
    Python boundary), and still exactly ONE shuffle: the window's
    HashPartitioning(user_id) satisfies the groupBy(user_id, session_id)
    clustering requirement, so Catalyst reuses the exchange.  Preferred
    at scale when only the batch shape is needed; the applyInPandas
    engine above is the pattern the applyInPandasWithState streaming
    twin builds on."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_s")
    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).alias("ts_s"),
    )
    brk = F.when(
        F.lag("ts_s").over(w).isNull()
        | (F.col("ts_s") - F.lag("ts_s").over(w) > gap_sec),
        1,
    ).otherwise(0)
    return (
        src.withColumn("session_id", F.sum(brk).over(w).cast("int"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
        )
    )
