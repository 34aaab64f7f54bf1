"""Training-corpus preparation as a staged plan — the LLM-data analogue
of the reference's 4-stage batch ETL (plans/etl.py).

Where etl.py composes the reference's medallion stages (Step
Function/crypto-etl-pipeline.asl.json:5-76), this plan composes the
engine's training-data operators into the canonical corpus flow:

    quality gate -> near-dup removal -> split -> pack -> shard

Each stage is DataFrame-native and individually oracle-verified through
its query-registry counterpart (gopher/quality: text.quality_score;
dedup: dedup.minhash_near_dups / docs_exact_dedup; split:
sampling.assign_split / train_val_test_split; pack: packing.greedy_pack /
pack_docs_for_training; shard: shards.write_training_shards /
training_shard_layout).  The plan contributes the Step-Function
semantics on top: per-stage catch + notification, empty-input
short-circuit, and a manifest as the terminal artifact.

Scale shape: stages chain lazily — Catalyst sees quality-filter +
dedup-anti-join + split projection + packing window as ONE lineage, so
the corpus is scanned once and shuffled only where an operator requires
it (the dedup band keys, the packing bucket window, the shard
repartition).  Only the rejected-docs DLQ and the final shards touch
disk.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import dedup, packing, sampling, text
from cryptocurrency_data_pipeline_spark.plans.runner import SKIP, Pipeline
from cryptocurrency_data_pipeline_spark.sources import shards


@dataclass
class CorpusPaths:
    rejected: str   # quality-gate DLQ (parquet, with reject reason)
    shards: str     # terminal split=/shard= layout + manifest


def build_corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    paths: CorpusPaths,
    min_quality: float = 0.25,
    dup_threshold: float = 0.5,
    capacity: int = 512,
    n_shards: int = 4,
    notifier=None,
    classifier_weights: DataFrame | None = None,
    classifier_buckets: int = 64,
    max_boilerplate: float | None = None,
) -> Pipeline:
    """Compose the corpus-prep stages over a ``documents``-shaped frame
    (doc_id, text, ...).  Returns a ready-to-``run()`` Pipeline; the
    terminal stage output is the shard manifest dict.

    Optional gates (each individually oracle-verified via its registry
    query) slot in after the heuristic quality gate:

    - ``classifier_weights``: the model-based filter
      (classifier.score_documents / quality_classifier_scores) — docs
      whose integer weight sum is <= 0 go to the DLQ with reason
      ``classifier_reject``;
    - ``max_boilerplate``: the cross-document segment filter
      (dedup.segment_boilerplate / boilerplate_segment_stats) — docs
      whose shared-segment fraction exceeds the cap are dropped as
      templated/boilerplate-heavy.
    """

    def quality_gate(_):
        if docs.isEmpty():
            return SKIP
        scored = docs.withColumn("__q", text.quality_score("text"))
        rejected = scored.filter(F.col("__q") < min_quality).select(
            "doc_id",
            F.round("__q", 6).alias("quality_score"),
            F.lit("below_min_quality").alias("reject_reason"),
        )
        # Each gate owns one Hive-style partition directory under
        # ``paths.rejected`` and overwrites only that directory, so
        # re-running the pipeline is idempotent for every gate (a plain
        # append would duplicate the classifier DLQ rows on re-run).
        # Written as an explicit ``reject_reason=`` path rather than
        # ``partitionBy`` so an empty reject set still lands a
        # schema-bearing parquet file and the root stays readable.
        (
            rejected.drop("reject_reason")
            .write.mode("overwrite")
            .parquet(f"{paths.rejected}/reject_reason=below_min_quality")
        )
        return scored.filter(F.col("__q") >= min_quality).drop("__q")

    def model_gate(kept: DataFrame):
        from cryptocurrency_data_pipeline_spark.operators import classifier

        scored = classifier.score_documents(
            kept, classifier_weights, classifier_buckets
        ).select("doc_id", "score", "keep")
        rejects = (
            kept.join(scored.filter(~F.col("keep")), "doc_id")
            .select(
                "doc_id",
                F.col("score").alias("quality_score"),
                F.lit("classifier_reject").alias("reject_reason"),
            )
        )
        (
            rejects.drop("reject_reason")
            .write.mode("overwrite")
            .parquet(f"{paths.rejected}/reject_reason=classifier_reject")
        )
        return kept.join(
            scored.filter(F.col("keep")).select("doc_id"), "doc_id"
        )

    def boilerplate_gate(kept: DataFrame):
        frac = dedup.segment_boilerplate(kept).select(
            "doc_id", "boilerplate_frac"
        )
        # docs too short to segment have no row -> pass (nothing measured)
        flagged = frac.filter(F.col("boilerplate_frac") > max_boilerplate)
        return kept.join(flagged.select("doc_id"), "doc_id", "left_anti")

    def dedup_stage(kept: DataFrame):
        pairs = dedup.minhash_near_dups(kept, threshold=dup_threshold)
        losers = pairs.select(F.col("b_id").alias("doc_id")).distinct()
        return kept.join(losers, "doc_id", "left_anti")

    def split_stage(deduped: DataFrame):
        return sampling.assign_split(deduped, "doc_id")

    def pack_stage(split_df: DataFrame):
        sized = split_df.withColumn(
            "n_tokens", text.token_count("text")
        ).withColumn(
            "pack_bucket",
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3),
        )
        return packing.greedy_pack(
            sized, "n_tokens", "pack_bucket", ["doc_id"], capacity=capacity
        )

    def shard_stage(packed: DataFrame):
        return shards.write_training_shards(
            packed.select("doc_id", "split", "n_tokens", "bin_id", "text"),
            paths.shards,
            n_shards=n_shards,
            token_col="n_tokens",
        )

    p = Pipeline(notifier=notifier).add("quality_gate", quality_gate)
    if classifier_weights is not None:
        p = p.add("model_gate", model_gate)
    if max_boilerplate is not None:
        p = p.add("boilerplate_gate", boilerplate_gate)
    return (
        p.add("near_dup_removal", dedup_stage)
        .add("split_assignment", split_stage)
        .add("sequence_packing", pack_stage)
        .add("shard_write", shard_stage)
    )
