"""Stateful streaming sessionization — the applyInPandasWithState twin of
operators/sessionize.sessionize.

Per-user state carries the open session (start, last-seen, count, session
ordinal) plus any pending event timestamps across micro-batches; closed
sessions emit as soon as a later event proves the gap, and the final
open session emits on state timeout (or on the terminal empty batch when
driven with availableNow).

Semantics match the batch kernel exactly WHEN events arrive in
non-decreasing time order per user across batches (the crawl-log case:
per-host fetch streams are monotonic by construction).  Out-of-order
arrivals WITHIN one micro-batch are sorted before folding; arrivals that
time-travel behind an already-closed session are counted into a fresh
session (at-most-once accounting, the same policy as the watermarked
metrics stream in stream_crawl.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sessionize import SESSION_SCHEMA

# state: (next_session_id, open_start_s, open_last_s, open_count);
# start_s == _NO_OPEN means "no open session, but keep the ordinal" — set
# after a timeout emit so a returning user continues per-user 1..n
# numbering instead of restarting at 1 (which would duplicate
# (user_id, session_id) keys and diverge from the batch kernel).
STATE_SCHEMA = "next_sid int, start_s bigint, last_s bigint, n int"
_NO_OPEN = -1
# GC horizon for the ordinal-only state: after this many gaps with no new
# events the ordinal is dropped (bounded state; a user returning later
# than this restarts at 1, the same horizon trade the watermarked dedup
# stream makes).
_ORDINAL_GC_GAPS = 10


def _fold(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_sec: int,
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    if state.hasTimedOut:
        next_sid, start_s, last_s, n = state.get
        if start_s == _NO_OPEN:
            state.remove()  # ordinal-only state past the GC horizon
            return
        # carry the ordinal forward instead of remove(): a later event
        # for this user numbers its session next_sid + 1
        state.update((next_sid + 1, _NO_OPEN, _NO_OPEN, 0))
        state.setTimeoutDuration(gap_sec * 1000 * _ORDINAL_GC_GAPS)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_id": next_sid,
                    "n_events": n,
                    "start_s": start_s,
                    "end_s": last_s,
                }
            ]
        )
        return

    if state.exists:
        next_sid, start_s, last_s, n = state.get
        if start_s == _NO_OPEN:
            start_s, last_s, n = None, None, 0
    else:
        next_sid, start_s, last_s, n = 1, None, None, 0

    ts_all: list[int] = []
    for pdf in pdfs:
        ts_all.extend(int(t) for t in pdf["ts_s"])
    ts_all.sort()

    closed: list[dict[str, Any]] = []
    for t in ts_all:
        if start_s is None:
            start_s, last_s, n = t, t, 1
        elif t - last_s > gap_sec:
            closed.append(
                {
                    "user_id": user_id,
                    "session_id": next_sid,
                    "n_events": n,
                    "start_s": start_s,
                    "end_s": last_s,
                }
            )
            next_sid += 1
            start_s, last_s, n = t, t, 1
        else:
            last_s, n = max(last_s, t), n + 1

    if start_s is not None:
        state.update((next_sid, start_s, last_s, n))
        state.setTimeoutDuration(gap_sec * 1000)
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming events -> closed-session rows (same schema as the batch
    sessionize); the open tail session emits on the gap timeout."""
    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).alias("ts_s"),
    )

    def fold(key, pdfs, state):
        return _fold(key, pdfs, state, gap_sec)

    return src.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
