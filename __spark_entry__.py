"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query (pricing summary) on sf0.001.
- queries(): one entry per implemented operator (SURVEY.md §2 +
  training-data pipeline operators).
- oracle_sql(): DuckDB-equivalent SQL per query; omitted only for
  non-SQL-expressible ops (streaming/mapInPandas/approximate LSH).

Implementations live in voter_gateway_spark.queries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from voter_gateway_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
