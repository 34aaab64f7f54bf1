"""Continuous corpus ingestion — the streaming leg of plans/corpus.py.

A growing training corpus does not arrive as one batch: documents land as
files (crawl dumps, vendor drops) and the pipeline keeps up incrementally.
Structured Streaming expresses that with the file source + availableNow:
every invocation processes exactly the files the checkpoint has not seen
(the Glue job-bookmark semantics, sources/bookmarks.py, but engine-native
and exactly-once).

Stage mapping, all on unbounded input:

* **quality gate** — the same map-only ``text.quality_score`` predicate
  as the batch plan; rejects (and, on streams, docs with a null event
  time that cannot participate in watermarked dedup) land in a parquet
  DLQ with the silver envelope (raw payload + reason) via a SECOND
  exactly-once file-sink query — never silently discarded.  The DLQ
  query re-reads the source files (the price of keeping BOTH sinks
  exactly-once: a foreachBatch split-write is at-least-once on retry);
  at scale the reject scan is the same file listing and prunes to the
  reject predicate immediately.
* **near-dup guard** — ``dropDuplicatesWithinWatermark`` on the md5
  content fingerprint: state per fingerprint is BOUNDED by the watermark
  horizon (contrast a global dropDuplicates, which grows forever on a
  stream).  This is the streaming stand-in for the batch MinHash pass:
  exact-content dups die here cheaply; periodic batch SemDeDup/MinHash
  sweeps (semantic_dedup_incremental) catch the fuzzy tail.
* **split + token accounting** — pure projections (md5 split buckets,
  token_count), safe on streams.
* **sink** — append parquet partitioned by split, checkpointed: each
  input file is counted exactly once across restarts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from cryptocurrency_data_pipeline_spark.operators import sampling, text

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("source", StringType(), True),
        StructField("ingested_at", TimestampType(), True),
    ]
)


def _latest_offset_state(
    spark: SparkSession, offsets_dir: str
) -> tuple[int, int] | None:
    """(highest batch id, newest offset-file mtime millis) under a
    checkpoint's ``offsets/`` directory, or None when the directory is
    absent or holds no batch files.

    Probed through Spark's Hadoop ``FileSystem`` so the answer is
    correct for ANY checkpoint URI (HDFS, S3A, file:) — an ``os.path``
    probe is always False off the local filesystem, which silently
    misclassifies an existing remote checkpoint as fresh.  Offset files
    are named by integer batch id; Spark's own ``HDFSMetadataLog``
    temp files (``.<id>.tmp`` etc.) are skipped by the isdigit gate.
    The mtime is the RAN-LAST signal: batch ids restart at 0 after an
    intentional checkpoint reset, so id order alone cannot rank a fresh
    layout against a stale copy of the old one."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(offsets_dir)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    best = None
    newest = None
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.isdigit():
            b = int(name)
            if best is None or b > best:
                best = b
            mt = st.getModificationTime()
            if newest is None or mt > newest:
                newest = mt
    if best is None:
        return None
    return best, newest


def _latest_batch_id(spark: SparkSession, offsets_dir: str) -> int | None:
    """Highest batch id only (see :func:`_latest_offset_state`)."""
    state = _latest_offset_state(spark, offsets_dir)
    return None if state is None else state[0]


def _pick_accepted_checkpoint(spark: SparkSession, checkpoint: str) -> str:
    """Which layout the ACCEPTED query resumes: the bare ``checkpoint``
    (current deployments) or its grandfathered ``accepted/`` sub-path.

    When both hold batches the one that RAN LAST wins, ranked by newest
    offset-file mtime — batch ids restart at 0 after an intentional
    checkpoint reset, so a freshly-reset bare layout at batch 0 must
    beat a stale ``accepted/`` copy at batch N (id order alone would
    silently resume the stale state and never re-ingest).  Equal mtimes
    (a byte-preserving copy) fall back to the batch-id comparison;
    equal on both signals fails loudly for the operator to resolve."""
    bare = _latest_offset_state(spark, os.path.join(checkpoint, "offsets"))
    sub = _latest_offset_state(
        spark, os.path.join(checkpoint, "accepted", "offsets")
    )
    if sub is None:
        return checkpoint
    if bare is None:
        return os.path.join(checkpoint, "accepted")
    bare_id, bare_mt = bare
    sub_id, sub_mt = sub
    if sub_mt != bare_mt:
        if (sub_mt > bare_mt) != (sub_id > bare_id):
            import logging

            logging.getLogger(__name__).warning(
                "checkpoint layouts disagree: ran-last (mtime) picks %s "
                "but batch ids order the other way (bare=%d, "
                "accepted=%d) — trusting ran-last (batch ids restart "
                "after a reset)",
                "accepted/" if sub_mt > bare_mt else "bare",
                bare_id,
                sub_id,
            )
        return (
            os.path.join(checkpoint, "accepted")
            if sub_mt > bare_mt
            else checkpoint
        )
    if sub_id > bare_id:
        return os.path.join(checkpoint, "accepted")
    if sub_id == bare_id:
        raise RuntimeError(
            f"both {checkpoint!r} and its accepted/ sub-path hold "
            f"checkpoints at the same batch id ({bare_id}) and "
            f"modification time — cannot tell which ran last; delete "
            f"the stale one (keep the layout whose commits/ matches "
            f"the sink's _spark_metadata) and re-run"
        )
    return checkpoint


def read_doc_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source JSON doc stream with the explicit schema (never
    inferred — inference is an extra full pass and unstable on streams)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(path)
    )


def reject_reason(docs: DataFrame, min_quality: float = 0.25):
    """NULL for accepted docs, else the reason string.

    ``null_event_time`` only applies to streaming frames carrying
    ``ingested_at``: a null event time fails the watermark predicate
    inside ``dropDuplicatesWithinWatermark``, so without this routing
    the row would be SILENTLY dropped from the stream while the batch
    path kept it — a stream/batch divergence and silent row loss."""
    reason = F.when(
        text.quality_score("text") < min_quality, F.lit("low_quality")
    )
    if docs.isStreaming and "ingested_at" in docs.columns:
        reason = reason.when(
            F.col("ingested_at").isNull(), F.lit("null_event_time")
        )
    return reason


def prepare_doc_stream(
    docs: DataFrame, min_quality: float = 0.25
) -> tuple[DataFrame, DataFrame]:
    """(accepted, rejects): gate + fingerprint-dedup + split + token
    accounting, stream-safe.  ``rejects`` carries the silver DLQ
    envelope (``raw`` payload JSON + ``error_reason``).

    On a stream the dedup keeps the FIRST-arrived row per content
    fingerprint (watermark-bounded state); the batch path refines that to
    the DETERMINISTIC lowest-doc_id row — same keep-one-per-fingerprint
    semantics, but replayable bit-for-bit for the correctness oracle
    (a bare ``dropDuplicates`` keeps whichever task wins the shuffle)."""
    reason = reject_reason(docs, min_quality)
    rejects = docs.filter(reason.isNotNull()).select(
        F.to_json(F.struct(*[F.col(c) for c in docs.columns])).alias("raw"),
        reason.alias("error_reason"),
    )
    gated = docs.filter(reason.isNull())
    fingerprinted = gated.withColumn("content_fp", F.md5(F.col("text")))
    if fingerprinted.isStreaming:
        deduped = fingerprinted.withWatermark(
            "ingested_at", "10 minutes"
        ).dropDuplicatesWithinWatermark(["content_fp"])
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("content_fp").orderBy("doc_id")
        deduped = (
            fingerprinted.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    accepted = deduped.withColumn(
        "split", sampling.split_assignment("doc_id")
    ).withColumn("n_tokens", text.token_count("text"))
    return accepted, rejects


def run_corpus_ingest(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    min_quality: float = 0.25,
    dlq_path: str | None = None,
) -> None:
    """One availableNow pass: new files only, exactly-once, partitioned
    append by split; rejects land at ``dlq_path`` (default
    ``out_path + '_dlq'``) via a second exactly-once file-sink query
    with its own checkpoint (see module docstring for the two-query
    trade).

    Checkpoint layout compatibility: the ACCEPTED query keeps the
    original bare ``checkpoint`` path (pre-DLQ deployments restart
    against their existing offsets/batch-ids; moving it would silently
    re-ingest everything into the same ``out_path`` and clash with the
    sink's ``_spark_metadata``); only the later-added DLQ query uses the
    ``/dlq`` sub-path — which nests cleanly, Spark's checkpoint dirs
    (``offsets/``, ``commits/``, ``sources/``...) never collide with a
    literal ``dlq/`` entry.  A deployment that ran the brief
    intermediate revision (accepted query at ``checkpoint/accepted``)
    is grandfathered.  Both probes go through Spark's Hadoop
    ``FileSystem`` (an ``os.path`` check is always False on HDFS/S3
    checkpoints and would silently restart from scratch, re-ingesting
    committed input as duplicate rows — an exactly-once violation).
    When BOTH layouts hold batches, the one that RAN LAST wins, ranked
    by the newest offset-file modification time (batch ids restart at 0
    after an intentional checkpoint reset, so a freshly-reset bare
    layout at batch 0 must still beat a stale accepted/ copy at batch
    N — id order alone would silently resume the stale state and never
    re-ingest).  Equal mtimes (a byte-preserving copy) fall back to the
    batch-id comparison; equal on both signals is genuinely ambiguous
    and fails loudly for the operator to resolve rather than
    guessing."""
    if dlq_path is None:
        dlq_path = out_path.rstrip("/") + "_dlq"
    accepted_ckpt = _pick_accepted_checkpoint(spark, checkpoint)
    accepted, rejects = prepare_doc_stream(
        read_doc_stream(spark, in_path), min_quality
    )
    (
        accepted.drop("ingested_at")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", accepted_ckpt)
        .partitionBy("split")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    (
        rejects.writeStream.format("parquet")
        .option("path", dlq_path)
        .option("checkpointLocation", f"{checkpoint}/dlq")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
