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

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


@contextmanager
def partition_inference_off(spark: SparkSession):
    """Scope in which ``spark.read.parquet`` surfaces Hive partition
    values as their EXACT directory strings instead of re-inferred types
    (a string column with numeric-looking values must not come back as
    int).  Partition discovery happens eagerly at read time, so a frame
    created inside the scope keeps the raw strings after exit.

    The flip is session-global for its duration: a concurrent read
    planned in the same SparkSession inside the window would also see
    inference off — keep the scope to the single read it protects."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@contextmanager
def dynamic_partition_overwrite(spark: SparkSession):
    """Scope in which ``mode("overwrite").partitionBy(...)`` replaces
    ONLY the partitions present in the written frame instead of the
    whole table — the one conf flip every partial-refresh writer shares
    (same session-global caveat as :func:`partition_inference_off`:
    keep the scope to the single write it protects)."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


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
