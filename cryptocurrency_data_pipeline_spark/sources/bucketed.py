"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of fact⋈fact joins (lineitem⋈orders by
orderkey) is the shuffle.  Writing both sides bucketed by the join key into
the warehouse lets every subsequent join run map-side: Spark aligns bucket
files 1:1 and the physical plan contains NO Exchange on either side.

This is the storage-layout counterpart of the reference's
``partitionBy(update_date)`` (time pruning); bucketing adds key-space
pruning/co-location.  Partition + bucket compose: partition by date,
bucket by key within each date.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (optionally sorted + partitioned) catalog table.

    Sorting within buckets upgrades shuffle-free hash joins to
    shuffle-free *and* sort-free merge joins.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — planned without any Exchange."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
