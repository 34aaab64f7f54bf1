"""Scale-safe global consecutive id assignment.

Assigning ``row_number() OVER (ORDER BY ...)`` ids naively compiles to a
single-partition Window — every row of the table through one task, the
classic 100 TB scale-killer. This module implements the distributed
equivalent (the DataFrame rendering of ``RDD.zipWithIndex``):

1. range-repartition + sort within partitions on the order key, so
   partition *p* holds a contiguous, disjoint key range;
2. tag each row with ``monotonically_increasing_id()`` — whose contract is
   *consecutive from 0 within each partition* (partition id in the high
   bits) — evaluated above the sort, so local id order == key order with
   no per-partition Window and no extra exchange;
3. one tiny aggregation computes per-partition (row count, min local id);
   exclusive prefix offsets come from a window over that O(#partitions)
   frame — the only unpartitioned window in the plan runs over ~32 count
   rows, never the table;
4. each row's id = (local id − partition's min local id) + partition's
   prefix offset, attached by broadcast join on partition id.

The single full-data shuffle is the range exchange; a naive
rank-then-offset formulation pays a second full-data hash exchange
because Catalyst cannot see that range partitions are already
partition-id-clustered. The table is scanned twice (stats pass + id
pass) — the same cost ``zipWithIndex`` pays; there is no one-pass
distributed consecutive-id algorithm without a prior ordering. Ids are
exactly the global rank by ``order_cols`` regardless of where the range
partitioner places its boundaries, provided ``order_cols`` is a total
order (include a unique key as the last column).

No counterpart in the reference (its 100-row frames never need one); this
is the operation a training-data pipeline needs to give every document a
stable dense id before sharding.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_consecutive_ids(
    df: DataFrame,
    order_cols: Sequence[str],
    id_name: str = "rid",
    start: int = 1,
) -> DataFrame:
    """Add a dense consecutive id column: ``start`` + global rank by
    ``order_cols`` (which must be a total order — no duplicate keys)."""
    # ``parts`` is referenced twice (stats pass + id pass) and
    # repartitionByRange picks its boundaries by SAMPLING — two independent
    # instantiations of the subtree could disagree on boundaries and local
    # ids, corrupting the ranks. persist() collapses both references onto
    # one InMemoryRelation, so the range exchange is evaluated exactly once
    # (and the second pass reads cache instead of rescanning the table —
    # the same materialization RDD.zipWithIndex pays). The cache spills to
    # disk at scale and is released by the ContextCleaner when the result
    # is garbage-collected; callers that loop should unpersist explicitly.
    parts = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    stats = parts.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__mid0")
    )
    # Exclusive prefix sum over partition ids: O(#shuffle-partitions) rows,
    # so the unpartitioned window here is a driver-sized frame by design.
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.select(
        "__pid",
        "__mid0",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        parts.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_name,
            (F.col("__mid") - F.col("__mid0") + F.col("__off") + F.lit(start)).cast(
                "long"
            ),
        )
        .drop("__pid", "__mid", "__mid0", "__off")
    )
