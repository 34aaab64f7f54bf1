"""Parquet table loaders (S4) with type normalization.

The testdata's ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's
vectorized reader rejects outright; we flip the legacy nanos-as-long read
path (runtime-settable) and rebuild a proper ``TimestampType`` column by
integer-truncating ns→µs — the same truncation DuckDB applies, so oracle
comparisons agree.  Everything else reads as-is: explicit parquet scans keep
column pruning + predicate pushdown intact (verified via .explain:
PushedFilters / ReadSchema reach the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nanosecond timestamps."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
