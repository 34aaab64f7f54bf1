"""Continuous corpus ingestion — the streaming leg of plans/corpus.py.

A growing training corpus does not arrive as one batch: documents land as
files (crawl dumps, vendor drops) and the pipeline keeps up incrementally.
Structured Streaming expresses that with the file source + availableNow:
every invocation processes exactly the files the checkpoint has not seen
(the Glue job-bookmark semantics, sources/bookmarks.py, but engine-native
and exactly-once).

Stage mapping, all on unbounded input:

* **quality gate** — the same map-only ``text.quality_score`` predicate
  as the batch plan; rejects flow to a parquet DLQ via the same
  ``foreachBatch`` split-write the tick pipeline uses (S9/S10 shape).
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


def read_doc_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source JSON doc stream with the explicit schema (never
    inferred — inference is an extra full pass and unstable on streams)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(path)
    )


def prepare_doc_stream(docs: DataFrame, min_quality: float = 0.25) -> DataFrame:
    """Gate + fingerprint-dedup + split + token accounting, stream-safe.

    On a stream the dedup keeps the FIRST-arrived row per content
    fingerprint (watermark-bounded state); the batch path refines that to
    the DETERMINISTIC lowest-doc_id row — same keep-one-per-fingerprint
    semantics, but replayable bit-for-bit for the correctness oracle
    (a bare ``dropDuplicates`` keeps whichever task wins the shuffle)."""
    gated = docs.filter(text.quality_score("text") >= min_quality)
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
    return deduped.withColumn(
        "split", sampling.split_assignment("doc_id")
    ).withColumn("n_tokens", text.token_count("text"))


def run_corpus_ingest(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    min_quality: float = 0.25,
) -> None:
    """One availableNow pass: new files only, exactly-once, partitioned
    append by split."""
    prepared = prepare_doc_stream(read_doc_stream(spark, in_path), min_quality)
    (
        prepared.drop("ingested_at")
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("split")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
