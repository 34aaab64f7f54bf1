"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``cryptocurrency_data_pipeline_spark.queries`` — the named
query registry where each Spark query is defined next to its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cryptocurrency_data_pipeline_spark.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    ordered_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (latest-per-key dedup + daily rollup) on sf0.001."""
    return QUERIES["flagship_daily_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Least-externally-verified first — a mechanical rotation computed from
    # the driver's own CORRECTNESS_r*.json artifacts (never-checked queries
    # lead), so every registered query cycles through the external check
    # window over rounds.  Independently, tests/test_oracle_parity.py
    # replays the driver's exact comparison for EVERY oracle-backed query
    # on every pytest run.
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
