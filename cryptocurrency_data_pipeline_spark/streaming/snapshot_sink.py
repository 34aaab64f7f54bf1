"""Streaming sink into a versioned copy-on-write snapshot table.

The missing half of the table-format story for streams: ``foreachBatch``
sinks either append (at-least-once duplicates on replay) or need an
epoch-partitioned layout (``pipeline.process_micro_batch_exactly_once``).
This sink instead maintains a KEYED CURRENT-STATE table — latest row per
key, the reference's DynamoDB ``put_item`` upsert semantics
(streaming/consumer.py's per-record table writes) rendered as a
lakehouse table:

* the table is partitioned by a KEY-DERIVED hash bucket, so a key lives
  in one partition forever — partitioning current state by event date
  would strand a stale row in yesterday's partition every time a key's
  newest record crosses a day boundary (merge only reads the partitions
  the batch touches);
* each micro-batch is reduced to its latest row per key (one in-batch
  window, deterministic tiebreak), rows OLDER than the stored state are
  discarded (late files cannot regress a key), then the rest row-level
  MERGE into the current snapshot
  (:func:`maintenance.merge_into_snapshot`) — only touched buckets
  rewritten, everything else inherited by reference;
* replays are version-stable: equal-or-newer replay rows re-merge to
  identical content and ``skip_unchanged=True`` withdraws the publish,
  so a crash between sink write and checkpoint commit does not mint
  duplicate versions (and never duplicates ROWS — merge is idempotent
  by key);
* every published version remains time-travel readable, so a downstream
  consumer can diff consecutive versions (``snapshot_changes``) instead
  of re-reading the table — a change feed OVER a stream sink.

Scale shape: the merge reads only touched buckets of the current version
(partition-pruned), the in-batch dedup shuffles one micro-batch, and
manifest work is O(partitions) on the driver.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import maintenance, silver


def key_bucket(keys: Sequence[str], n_buckets: int = 16):
    """Stable partition for a key: ``pmod(xxhash64(keys), n)``.  The
    same expression on any engine/day puts the key in the same bucket."""
    return F.pmod(F.xxhash64(*keys), F.lit(n_buckets)).cast("int")


def merge_batch_into_snapshot(
    batch: DataFrame,
    table_path: str,
    keys: Sequence[str],
    part_col: str,
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> int:
    """One micro-batch → at most one new snapshot version.

    Reduces the batch to its latest row per ``keys`` (``tiebreak``
    breaks ``order_col`` ties deterministically — pass one or a replayed
    tied batch may flip winners and mint a spurious version), drops rows
    older than the key's stored state, seeds the table on first contact,
    then MERGEs.  ``part_col`` must be key-derived (see
    :func:`key_bucket`): a key must never move between partitions.
    Returns the table's current version after the call."""
    latest = silver.dedup_latest(batch, keys, order_col, tiebreak).persist()
    try:
        if latest.isEmpty():
            man = maintenance._load_manifest(table_path)
            return man["current"]
        if not os.path.exists(os.path.join(table_path, "_versions.json")):
            return maintenance.write_snapshot(
                latest, table_path, part_col=part_col
            )
        # Late-data guard: a delayed file must not regress a key to older
        # state.  Current rows for the touched partitions only
        # (partition-pruned scan), keyed lookup of the stored order.
        touched = [
            r[0]
            for r in latest.select(
                F.col(part_col).cast("string").alias("p")
            ).distinct().collect()
        ]
        spark = latest.sparkSession
        current = maintenance.read_snapshot(spark, table_path)
        stored = (
            current.where(F.col(part_col).cast("string").isin(touched))
            .select(*keys, F.col(order_col).alias("__stored_ord"))
        )
        fresh = (
            latest.join(stored, list(keys), "left")
            .where(
                F.col("__stored_ord").isNull()
                | (F.col(order_col) >= F.col("__stored_ord"))
            )
            .drop("__stored_ord")
            .select(*latest.columns)
        )
        if fresh.isEmpty():
            return maintenance._load_manifest(table_path)["current"]
        return maintenance.merge_into_snapshot(
            fresh, table_path, keys, skip_unchanged=True
        )
    finally:
        latest.unpersist()


def stream_ticks_to_snapshot(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
    n_buckets: int = 16,
):
    """Wire the tick file-harness source into the snapshot-table sink:
    current state keyed by ``coin_id``, partitioned by key bucket."""
    from cryptocurrency_data_pipeline_spark.streaming.pipeline import (
        read_tick_stream,
    )

    def body(batch: DataFrame, _epoch: int) -> None:
        ticks = batch.filter(F.col("coin_id").isNotNull()).withColumn(
            "bucket", key_bucket(["coin_id"], n_buckets)
        )
        merge_batch_into_snapshot(
            ticks,
            table_path,
            ["coin_id"],
            part_col="bucket",
            order_col="event_time",
            tiebreak=["raw_data"],
        )

    writer = (
        read_tick_stream(spark, source_dir)
        .writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(checkpoint, "snap-sink"))
        .foreachBatch(body)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
