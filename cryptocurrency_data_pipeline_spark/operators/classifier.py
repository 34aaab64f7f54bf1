"""Model-based quality filtering: a hashed linear text classifier.

The CCNet / GPT-3 / LLaMA corpus recipes all include a *model-based*
quality gate — a cheap linear classifier (fastText-style) scoring every
document, with a keep/drop threshold.  This module implements the serving
side of that gate the way it actually runs at 100 TB:

- the model is a **weight table** (feature bucket -> weight), broadcast
  to every executor and applied with a hash join — never a per-row
  Python call into a model object;
- features are **hashed bag-of-words** buckets (the hashing trick), so
  the feature space is fixed-width regardless of vocabulary size and the
  bucket id is a pure expression on the token;
- scoring is one explode + one broadcast join + one partial-agged
  groupBy per document — all JVM-side, whole-stage-codegen'd.

The engine ships a deterministic arithmetic weight set (a stand-in for
exported training artifacts) so correctness is oracle-checkable; swapping
in real learned weights is a DataFrame replacement, nothing else changes.
The keep decision compares the INTEGER weight sum to zero, so the
boundary is exact on every engine; only the reported sigmoid score
involves floats (rounded).

Reference semantics: the reference pipeline gates records with static
rule thresholds (reference: glue/data_transform_s3.py:94-118); the
engine adds the learned-model analogue as a first-class operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.text import tokens

#: Knuth multiplicative constant — spreads bucket ids over the weight
#: range; any fixed odd multiplier works, both engines compute it exactly.
_MIX = 2654435761
#: Weight denominator (prime): integer weights live in
#: [-(_DEN - 1) // 2, _DEN // 2], so the sum over a doc is exact.
_DEN = 10007


def hashed_bucket(col, n_buckets: int):
    """Feature-hashing bucket for a token: first 8 md5 hex digits mod D.

    Pure column expression — replayable in any engine with md5 (the
    DuckDB oracle uses the identical formula)."""
    h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    return (h % F.lit(n_buckets)).alias("bucket")


def demo_weight_table(spark: SparkSession, n_buckets: int) -> DataFrame:
    """Deterministic stand-in for an exported linear model: integer
    weight ``(b * MIX) % DEN - DEN // 2`` per bucket — centered, exactly
    reproducible arithmetic on both engines.  A real deployment replaces
    this DataFrame with the trained weights parquet; the scoring plan is
    unchanged."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(_MIX)) % F.lit(_DEN) - F.lit(_DEN // 2))
        .cast("long")
        .alias("weight"),
    )


def score_documents(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the broadcast linear model.

    Output: ``id_col, n_tokens, weight_sum, score, keep`` where
    ``score = sigmoid(weight_sum / (DEN * n_tokens))`` (mean feature
    weight squashed to (0,1)) and ``keep`` is the exact integer test
    ``weight_sum > 0``.

    Plan: explode tokens -> hashed bucket -> broadcast-join the weight
    table -> partial-agged groupBy(id).  One shuffle, keyed by the doc
    id; the model never leaves the executors after the broadcast.

    "Every document" is literal: explode_outer keeps zero-token docs
    (blank/null text) as a single null-bucket row, and the weight join
    is a LEFT join with weight-0 backfill — a real exported model
    parquet stores only its nonzero buckets, and the old inner join
    silently dropped unmatched tokens (deflating the sigmoid
    denominator) and erased fully-unmatched docs from the output.
    Zero-token docs come out as (n_tokens=0, weight_sum=0, score=0.5,
    keep=false) — sigmoid of zero evidence, not a NULL and not a
    missing row.

    Key-uniqueness contract: exactly one output row per distinct
    ``id_col``; rows sharing an id POOL their tokens into one evidence
    set (the groupBy).  For exact duplicates the pooled score equals the
    single-copy score (mean feature weight is scale-invariant);
    conflicting same-id texts score their merged token multiset."""
    toks = df.select(
        F.col(id_col),
        F.explode_outer(tokens(text_col)).alias("tok"),
    ).select(id_col, hashed_bucket(F.col("tok"), n_buckets))
    scored = (
        toks.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            # count(bucket): real tokens only, never the explode_outer
            # phantom row (its bucket is null).
            F.count(F.col("bucket")).alias("n_tokens"),
            F.coalesce(
                F.sum(
                    F.when(F.col("bucket").isNotNull(),
                           F.coalesce(F.col("weight"), F.lit(0)))
                ),
                F.lit(0),
            ).alias("weight_sum"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "weight_sum",
        F.when(F.col("n_tokens") == 0, F.lit(0.5))
        .otherwise(
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -F.col("weight_sum")
                        / (F.lit(float(_DEN)) * F.col("n_tokens"))
                    )
                ),
                6,
            )
        )
        .alias("score"),
        (F.col("weight_sum") > 0).alias("keep"),
    )
