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


def read_drifted(spark: SparkSession, path: str) -> DataFrame:
    """Schema-drift-tolerant parquet scan for a MULTI-FILE table whose
    part files were written over time with evolving schemas (columns
    added, dropped, or reordered between writers — the normal state of
    a bronze layer at 100 TB).

    ``mergeSchema`` unions the part schemas BY NAME at planning time:
    rows from parts lacking a column surface it as NULL, and part-local
    column order is irrelevant.  The merge reads only footers (one
    metadata pass, no data), and pruning/pushdown still reach each part
    scan.  Incompatible drift (the same column name at two unmergeable
    types) fails loudly at plan time — the correct behavior; silently
    picking one file's schema (the mergeSchema=false default) drops the
    other writers' columns with NO error.  DuckDB mirror:
    ``read_parquet('<dir>/*.parquet', union_by_name=true)``."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nanosecond timestamps.

    A table that is a DIRECTORY of part files (the sfdrift scale point;
    any real bronze layer) reads through :func:`read_drifted` so schema
    drift across parts unions by name instead of silently projecting to
    one part's schema; single-file tables keep the plain scan."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_drifted(spark, path) if os.path.isdir(path) else spark.read.parquet(path)
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
