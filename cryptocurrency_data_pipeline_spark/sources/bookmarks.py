"""Incremental batch ingest: a processed-files ledger (Glue job-bookmark
parity, SURVEY §2.1 S3 / §4 "Incremental scan").

The reference gets incrementality from Glue's ``transformation_ctx``
bookmark (glue/data_transform_s3.py:52) — opaque, AWS-only.  Here it is an
explicit ledger: a tiny parquet table of file paths already processed.
``new_files`` anti-joins the current listing against the ledger;
``commit`` appends the batch just processed.  The Structured Streaming file
source (streaming/pipeline.py) is the preferred path; this exists for
plain-batch jobs that need resumability without a streaming runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _ledger(spark: SparkSession, ledger_path: str) -> DataFrame | None:
    """The ledger, or None ONLY when it genuinely does not exist yet.
    Any other read failure (corrupt footer from a crashed commit,
    permission error) must propagate: mapping it to 'no ledger' would
    silently reprocess the entire input history and append duplicates
    downstream."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(ledger_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e):
            return None
        raise


def new_files(
    spark: SparkSession,
    input_dir: str,
    ledger_path: str,
    max_batch_files: int = 100_000,
) -> list[str]:
    """Paths under ``input_dir`` not yet recorded in the ledger, at most
    ``max_batch_files`` of them.

    The listing is driver-side (os.walk) — file *names* are metadata, not
    data; even a million-file listing is MBs.  The anti-join against the
    ledger runs in Spark so the ledger itself can grow unbounded.

    The RETURNED batch is bounded: a backlogged source (an outage, a
    bulk backfill) can hold millions of fresh paths, and collecting them
    all would put an unbounded list on the driver AND make the single
    process-then-commit unit arbitrarily large — one failure reprocesses
    the whole backlog under the at-least-once contract.  Instead the
    fresh set is drained in deterministic lexicographic batches
    (date-partitioned layouts sort chronologically, so oldest data
    drains first); callers already loop ``read_incremental``/``commit``
    until the batch comes back empty, and each committed batch shrinks
    the next anti-join.  The cap is a TakeOrderedAndProject in-plan —
    the full fresh set is never materialized on the driver.
    """
    if max_batch_files < 1:
        raise ValueError("need max_batch_files >= 1")
    listed = []
    for root, dirs, files in os.walk(input_dir):
        # Prune hidden/underscore DIRECTORIES too: a concurrent Spark
        # writer's in-flight rows live under _temporary/.staging, and
        # their part-file basenames pass the name check — ingesting them
        # reads torn files AND double-processes the data when the writer
        # commits it to its final (different-path) location.
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        for f in sorted(files):
            if not f.startswith((".", "_")):
                listed.append(os.path.join(root, f))
    if not listed:
        return []
    listed_df = spark.createDataFrame([(p,) for p in listed], "path string")
    ledger = _ledger(spark, ledger_path)
    if ledger is None:
        fresh = listed_df
    else:
        fresh = listed_df.join(ledger, "path", "left_anti")
    return [r.path for r in fresh.orderBy("path").limit(max_batch_files).collect()]


def commit(spark: SparkSession, paths: list[str], ledger_path: str) -> None:
    """Record ``paths`` as processed (append; idempotent via later anti-join)."""
    if not paths:
        return
    df = spark.createDataFrame([(p,) for p in paths], "path string").withColumn(
        "committed_at", F.current_timestamp()
    )
    df.coalesce(1).write.mode("append").parquet(ledger_path)


def read_incremental(
    spark: SparkSession, input_dir: str, ledger_path: str, fmt: str = "json"
) -> tuple[DataFrame | None, list[str]]:
    """(new-data DataFrame | None, the file batch to commit after success).

    Caller processes the frame, then calls ``commit`` — commit-after-write
    gives at-least-once (same as Glue bookmarks on job failure).
    """
    batch = new_files(spark, input_dir, ledger_path)
    if not batch:
        return None, []
    return spark.read.format(fmt).load(batch), batch
