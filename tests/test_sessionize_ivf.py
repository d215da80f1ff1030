"""Sessionization (batch + applyInPandasWithState stream) and IVF ANN.

- batch sessionize vs the SQL lag/cumsum twin is pinned by
  tests/test_queries_oracle.py (q_sessionize); here we pin the STREAMING
  path equal to the batch path, and the IVF index's recall contract
  against the exact brute-force baseline.
"""

import os

import pytest
from pyspark.sql import functions as F

from texrex_spark.operators.sessionize import sessionize
from texrex_spark.operators.similarity import cosine_topk, ivf_topk
from texrex_spark.streaming.sessionize import sessionize_stream


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_stream_sessionize_matches_batch_closed_sessions(spark, sf_dir, tmp_path):
    """Single availableNow batch: the stream emits every session the gap
    rule has CLOSED — i.e. the batch result minus each user's final
    (still-open) session."""
    ev = _events(spark, sf_dir).where(F.col("user_id") < 50)
    src_dir = str(tmp_path / "events_src")
    ev.select("user_id", "ts").coalesce(1).write.parquet(src_dir)

    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src_dir)
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        tuple(r)
        for r in spark.table("sess_stream")
        .select("user_id", "session_id", "n_events", "start_s", "end_s")
        .collect()
    }
    batch = sessionize(ev, gap_sec=1800)
    last = batch.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
    expected = {
        tuple(r)
        for r in batch.join(last, "user_id")
        .where(F.col("session_id") != F.col("last_sid"))
        .select("user_id", "session_id", "n_events", "start_s", "end_s")
        .collect()
    }
    assert got == expected
    assert len(expected) > 0


def test_stream_sessionize_multi_batch_monotonic(spark, tmp_path):
    """Two micro-batches split at a time boundary: sessions spanning the
    split stay merged; the state carries (sid, start, last, n) across."""
    import time

    rows1 = [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00"),
             (2, "2024-01-01 09:00:00")]
    rows2 = [(1, "2024-01-01 10:20:00"),  # same session as batch 1 tail
             (1, "2024-01-01 12:00:00"),  # new session -> closes sid 1
             (2, "2024-01-01 09:20:00"), (2, "2024-01-01 11:00:00")]
    src = str(tmp_path / "src")
    os.makedirs(src)
    df1 = spark.createDataFrame(rows1, "user_id bigint, ts_str string").select(
        "user_id", F.to_timestamp("ts_str").alias("ts")
    )
    df1.coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes => file source ordering batch1 < batch2
    df2 = spark.createDataFrame(rows2, "user_id bigint, ts_str string").select(
        "user_id", F.to_timestamp("ts_str").alias("ts")
    )
    df2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_sec=1800)
        .writeStream.format("memory")
        .queryName("sess_stream2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.table("sess_stream2")
        .select("user_id", "session_id", "n_events")
        .collect()
    }
    # user 1: session 1 = 10:00-10:20 (3 events, merged across the split);
    # user 2: session 1 = 09:00-09:20 (2 events).  The 12:00 / 11:00
    # sessions stay open (no later event closes them).
    assert got == {(1, 1, 3), (2, 1, 2)}


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ivf_full_probe_matches_bruteforce_ids(emb):
    """Probing every cell degrades IVF to exact search: the returned
    neighbour sets must equal the brute-force top-k per query."""
    queries = emb.where(F.col("vec_id") < 3)
    ivf = ivf_topk(emb, queries, n_cells=8, n_probe=8, k=5)
    exact = cosine_topk(emb, queries, k=5)
    got = {(r.query_id, r.vec_id) for r in ivf.collect()}
    want = {(r.query_id, r.vec_id) for r in exact.collect()}
    assert got == want


def test_ivf_partial_probe_recall(emb):
    """ANN contract: probing half the cells keeps recall@5 >= 0.6 on the
    synthetic table (deterministic input => deterministic recall)."""
    queries = emb.where(F.col("vec_id") < 8)
    ivf = ivf_topk(emb, queries, n_cells=8, n_probe=4, k=5)
    exact = cosine_topk(emb, queries, k=5)
    got = {(r.query_id, r.vec_id) for r in ivf.collect()}
    want = {(r.query_id, r.vec_id) for r in exact.collect()}
    assert len(got & want) / len(want) >= 0.6


def test_ivf_plan_no_cartesian_on_candidates(emb):
    """The candidate join must be an equi-join on cell (hash/broadcast),
    never a cartesian; centroid scoring is the only BNLJ and its build
    side is the broadcast centroid table."""
    queries = emb.where(F.col("vec_id") < 3)
    plan = ivf_topk(emb, queries, n_cells=8, n_probe=4, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_sessionize_catalyst_equals_engine(spark, sf_dir):
    """The default (pure-Catalyst lag -> running sum -> groupBy) must
    emit exactly the Arrow kernel's sessions, with ONE exchange and zero
    Python boundaries in its physical plan."""
    from texrex_spark.operators.sessionize import sessionize_kernel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cols = ["user_id", "session_id", "n_events", "start_s", "end_s"]
    a = sorted(tuple(r) for r in sessionize_kernel(ev).select(cols).collect())
    b = sorted(tuple(r) for r in sessionize(ev).select(cols).collect())
    assert a == b
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "InPandas" not in plan


def test_sessionize_plan_prunes_scan(spark, sf_dir):
    """The events scan under sessionize must read ONLY (user_id, ts) —
    the pandas exchange is the narrow projection, never the full row."""
    from texrex_spark.operators.sessionize import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    assert "user_id" in scan[0] and "ts" in scan[0]
    for unwanted in ("event_type", "props", "value"):
        assert unwanted not in scan[0]


def test_stream_fold_continues_numbering_after_timeout():
    """A ProcessingTimeTimeout emit must carry the session ordinal in
    state (start_s = _NO_OPEN sentinel), so a returning user's next
    session numbers next_sid + 1 instead of restarting at 1 — matching
    the batch kernel's per-user 1..n numbering on a long-running stream."""
    import pandas as pd

    from texrex_spark.streaming.sessionize import _NO_OPEN, _fold

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.timeout_ms = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    st = FakeState()
    gap = 1800

    def feed(ts_list):
        return list(_fold((7,), iter([pd.DataFrame({"ts_s": ts_list})]), st, gap))

    # batch 1: one open session
    assert feed([1000, 1500]) == []
    assert st.get == (1, 1000, 1500, 2)
    # timeout fires: session 1 emits, ordinal carried with the sentinel
    st.hasTimedOut = True
    out = list(_fold((7,), iter([]), st, gap))
    assert len(out) == 1 and out[0].iloc[0]["session_id"] == 1
    assert st.get == (2, _NO_OPEN, _NO_OPEN, 0)
    st.hasTimedOut = False
    # the user returns: new open session numbers 2, and closing it via a
    # later gap emits (7, 2, ...) — no duplicate (user, session) key
    assert feed([10_000]) == []
    assert st.get == (2, 10_000, 10_000, 1)
    out = feed([20_000])
    assert out[0].iloc[0]["session_id"] == 2
    assert st.get == (3, 20_000, 20_000, 1)
    # a second timeout on ordinal-only state GCs it silently
    st.hasTimedOut = True
    out = list(_fold((7,), iter([]), st, gap))
    assert len(out) == 1 and out[0].iloc[0]["session_id"] == 3
    st.hasTimedOut = True
    assert list(_fold((7,), iter([]), st, gap)) == []
    assert not st.exists
