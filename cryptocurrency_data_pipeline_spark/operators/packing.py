"""Sequence packing: assign documents to fixed-capacity training bins.

LLM pre-training concatenates documents into fixed-length context windows;
the shuffle-time question is which documents share a window. The exact
bin-packing problem is NP-hard and inherently sequential, so pipelines use
a deterministic greedy approximation that parallelizes: hash documents
into independent buckets, order within each bucket, and cut bins wherever
the running token count crosses a capacity multiple.

Scale shape: ONE properly-partitioned Window (partitionBy bucket) — each
bucket's running sum is independent, so 100 TB spreads over as many tasks
as there are buckets; no global sort, no single-partition window. A
document that straddles a capacity boundary goes to the bin its *starting*
offset falls in (bins may overflow by at most one document — the standard
"pack then truncate/pad" training regime absorbs this).

No counterpart in the reference; part of the training-data surface
(SURVEY.md north-star extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def greedy_pack(
    df: DataFrame,
    size_col: str | Column,
    bucket_col: str | Column,
    order_cols: Sequence[str],
    capacity: int,
    bin_name: str = "bin_id",
) -> DataFrame:
    """Add ``bin_name``: the 0-based bin index within each bucket, where a
    row's bin is ``floor(exclusive-running-sum(size) / capacity)`` in
    ``order_cols`` order."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    w = (
        Window.partitionBy(bucket)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum(size).over(w), F.lit(0))
    return df.withColumn(bin_name, F.floor(pre / F.lit(capacity)))
