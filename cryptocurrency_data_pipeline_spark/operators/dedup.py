"""Document deduplication family for the LLM-data-pipeline surface.

Scale design notes (the point of each variant at 100 TB):

* **Exact** — fingerprint groupBy: one shuffle on a 32-char hash, minimal.
* **MinHash + LSH** — shingle → k salted-md5 minhashes → b bands → band-key
  groupBy → candidate pairs only within buckets → verified Jaccard on
  candidates.  Cost is O(docs × shingles × k) map-side + one shuffle per
  band on short band keys; the quadratic pair space is never materialized.
  The minhash here is the *lexicographic-min of salted md5 hex digests* —
  mathematically a valid MinHash family (md5 as the random permutation),
  chosen deliberately so the whole construction stays inside built-in JVM
  expressions AND is reproducible in ANSI SQL for the correctness oracle.
* **SimHash** — 64-bit weighted-bit signature via a vectorized Pandas UDF
  (Arrow-batched; the per-token bit loop is genuinely imperative), then
  exact-match or small-Hamming grouping on the signature.
* **Embedding near-dup** — cosine over ``array<float>`` columns with an
  LSH/blocking key to bound pairs (see ``similarity.py``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cryptocurrency_data_pipeline_spark.operators.text import fingerprint, shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per normalized fingerprint (hash-groupBy)."""
    return (
        df.withColumn("__fp", fingerprint(text_col))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__fp")
    )


def minhash_signature(text_col: str | Column = "text", k: int = 8, n: int = 3) -> Column:
    """k-element MinHash signature over word-n-gram shingles.

    Element i = min over shingles of md5(i || '|' || shingle) — each salt is
    an independent pseudo-random permutation of shingle space.
    """
    sh = shingles(text_col, n)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}|"), s)))
            )
            for i in range(k)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any full band of the
    signature.  Returns distinct (a_id, b_id) with a < b.

    rows-per-band = k/bands; collision prob ≈ jaccard^(k/bands) per band.
    """
    rows = k // bands
    sig = df.select(
        F.col(id_col).alias("id"), minhash_signature(text_col, k, n).alias("sig")
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|", F.lit(str(b)), *[F.col("sig")[b * rows + r] for r in range(rows)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    ).distinct()
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )


def jaccard(a_tokens: Column, b_tokens: Column) -> Column:
    """Set Jaccard over two token/shingle arrays (duplicates ignored)."""
    inter = F.size(F.array_intersect(a_tokens, b_tokens))
    union = F.size(F.array_union(a_tokens, b_tokens))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    k: int = 8,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verification.

    Output: (a_id, b_id, jaccard_sim) for pairs above ``threshold``.
    """
    pairs = lsh_candidate_pairs(df, text_col, id_col, k, bands, n)
    sh = df.select(
        F.col(id_col).alias("id"), F.array_distinct(shingles(text_col, n)).alias("sh")
    )
    return (
        pairs.join(sh.withColumnRenamed("id", "a_id").withColumnRenamed("sh", "a_sh"), "a_id")
        .join(sh.withColumnRenamed("id", "b_id").withColumnRenamed("sh", "b_sh"), "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("a_sh"), F.col("b_sh")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


@pandas_udf("long")
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow-batched Pandas UDF).

    Per doc: for each token, md5 → 64 bits; accumulate +1/−1 per bit;
    signature bit = sign.  Token weight = term frequency (repeat adds).
    """
    import hashlib

    out = []
    for text in texts:
        if text is None:
            out.append(None)
            continue
        acc = [0] * 64
        for tok in str(text).lower().split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        sig = 0
        for bit in range(64):
            if acc[bit] > 0:
                sig |= 1 << bit
        # Interpret as signed 64-bit for Spark LongType.
        out.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    return pd.Series(out, dtype="object")


def simhash_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical 64-bit SimHash signature (near-dup at
    Hamming distance 0; banding the signature extends to distance>0)."""
    sigs = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    return (
        sigs.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )
