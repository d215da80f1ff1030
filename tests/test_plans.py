"""Physical-plan audits: the plans we want, not just the first that passes.

Guards the scale-critical properties: filter pushdown + column pruning at
the scan, map-side partial aggregation, broadcast joins on small dims,
distributed top-k, and no accidental cartesian products in the near-dup
pipeline."""

import pytest

from texrex_spark.plans.queries import QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_agg_pricing_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(QUERIES["q_agg_pricing"](spark, sf_dir))
    # filter reaches the parquet scan
    assert "DataFilters: [isnotnull(l_shipdate" in plan
    # column pruning: l_comment is never read
    assert "l_comment" not in plan
    # map-side combine before the exchange
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("HashAggregate")


def test_join_topk_broadcast_and_takeordered(spark, sf_dir):
    plan = _plan(QUERIES["q_join_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # nation dim broadcast
    assert "TakeOrderedAndProject" in plan  # sort+limit is a top-k, not a sort


def test_neardup_no_cartesian(spark, sf_dir):
    plan = _plan(QUERIES["q_neardup_pairs"](spark, sf_dir))
    # no shuffled cartesian anywhere; the only nested loop allowed is the
    # broadcast of the 8-row hash-function index (BuildRight)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    if "BroadcastNestedLoopJoin" in plan:
        assert "BroadcastNestedLoopJoin BuildRight" in plan


def test_frontier_dedup_anti_join(spark, sf_dir):
    plan = _plan(QUERIES["q_frontier_dedup"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_robots_gate_broadcast(spark, sf_dir):
    plan = _plan(QUERIES["q_robots_gate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_range_join_is_broadcast_nested_loop(spark, sf_dir):
    # for a 100-row interval dim the BNLJ IS the right plan; the big-data
    # path is clean/geo.py's searchsorted
    plan = _plan(QUERIES["q_range_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_clean_chain_single_python_stage(spark, sf_dir):
    plan = _plan(QUERIES["q_clean_chain"](spark, sf_dir))
    # exactly one Python boundary (the chain mapInPandas), not a chain of them
    assert plan.count("MapInPandas") == 1
    # the scan reads only the columns the chain needs
    assert "n_chars" not in plan
