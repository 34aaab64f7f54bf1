"""Streaming sink into a versioned copy-on-write snapshot table.

The missing half of the table-format story for streams: ``foreachBatch``
sinks either append (at-least-once duplicates on replay) or need an
epoch-partitioned layout (``pipeline.process_micro_batch_exactly_once``).
This sink instead maintains a KEYED CURRENT-STATE table — latest row per
key, the reference's DynamoDB ``put_item`` upsert semantics
(streaming/consumer.py's per-record table writes) rendered as a
lakehouse table:

* each micro-batch is reduced to its latest row per key (one in-batch
  window), then row-level MERGEd into the current snapshot
  (:func:`maintenance.merge_into_snapshot`) — only the partitions the
  batch touches are rewritten, everything else inherited by reference;
* replays are version-stable: ``skip_unchanged=True`` withdraws the
  publish when a retried batch re-merges to identical content, so a
  crash between sink write and checkpoint commit does not mint duplicate
  versions (and never duplicates ROWS — merge is idempotent by key);
* every published version remains time-travel readable, so a downstream
  consumer can diff consecutive versions (``snapshot_changes``) instead
  of re-reading the table — a change feed OVER a stream sink.

Scale shape: the merge reads only touched partitions of the current
version (partition-pruned), the in-batch dedup shuffles one micro-batch,
and manifest work is O(partitions) on the driver.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import maintenance, silver


def merge_batch_into_snapshot(
    batch: DataFrame,
    table_path: str,
    keys: Sequence[str],
    part_col: str,
    order_col: str,
) -> int:
    """One micro-batch → one (at most) new snapshot version.

    Reduces the batch to its latest row per ``keys`` (ties broken by the
    engine's standard dedup), seeds the table on first contact, then
    MERGEs.  Returns the table's current version after the call."""
    latest = silver.dedup_latest(batch, keys, order_col)
    if latest.isEmpty():
        man = maintenance._load_manifest(table_path)
        return man["current"]
    if not os.path.exists(os.path.join(table_path, "_versions.json")):
        return maintenance.write_snapshot(latest, table_path, part_col=part_col)
    return maintenance.merge_into_snapshot(
        latest, table_path, keys, skip_unchanged=True
    )


def stream_ticks_to_snapshot(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Wire the tick file-harness source into the snapshot-table sink:
    current state keyed by ``coin_id``, partitioned by event date."""
    from cryptocurrency_data_pipeline_spark.streaming.pipeline import (
        read_tick_stream,
    )

    def body(batch: DataFrame, _epoch: int) -> None:
        ticks = batch.filter(F.col("coin_id").isNotNull()).withColumn(
            "dt", F.date_format("event_time", "yyyy-MM-dd")
        )
        merge_batch_into_snapshot(
            ticks, table_path, ["coin_id"], part_col="dt", order_col="event_time"
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
