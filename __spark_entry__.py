"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All registrations live in ``adampro_spark.oracle_suite`` — one
(Spark callable, DuckDB SQL) pair per implemented operator from
SURVEY.md §2 plus the LLM-data-pipeline operators.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from adampro_spark import oracle_suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: filtered top-k kNN.

    Combined Boolean + 20-NN Manhattan scan over ``embeddings`` — the
    reference's core query shape (BooleanFilterScanExpression ∘
    SequentialScanExpression, QueryOp.scala:56-69).
    """
    return oracle_suite.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(oracle_suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for non-SQL ops)."""
    return dict(oracle_suite.ORACLES)
