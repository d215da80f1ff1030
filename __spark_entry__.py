"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (tender/tecl near-dup pipeline) at sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2),
                implemented in texrex_spark/plans/queries.py.
oracle_sql()  — matching ANSI SQL for DuckDB over the same parquet views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from texrex_spark.plans.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full near-duplicate pipeline (shingle -> minhash ->
    pair-gen -> blacklist -> anti-join survivors) on sf0.001 documents —
    the reference's tender+tecl batch re-expressed in four DataFrame ops
    (SURVEY.md §2.5, §3.3)."""
    return QUERIES["q_neardup_survivors"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
