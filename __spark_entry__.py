"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``bm25_index_tool_spark.surface``, which defines every query
as BOTH a Spark callable and a DuckDB-runnable oracle SQL string with
aligned column names/types (see tools/parity.py for the local twin of the
driver's compare).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: conjunctive BM25 top-20 over documents at sf0.001."""
    from bm25_index_tool_spark import surface

    return surface.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bm25_index_tool_spark import surface

    return surface.queries()


def oracle_sql() -> dict[str, str]:
    from bm25_index_tool_spark import surface

    return surface.oracle_sql()
