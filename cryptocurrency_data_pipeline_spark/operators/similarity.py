"""Similarity search over embedding columns (``array<float>``).

* **Brute-force cosine top-k** — exact baseline: broadcast the (small) query
  set against the corpus, JVM-side dot product via ``zip_with`` +
  ``aggregate``, per-query top-k via window row_number.  At scale the
  corpus side stays partition-parallel; only k rows per query shuffle.
* **SRP-LSH bucketed ANN** — the scale path: sign-random-projection bucket
  key (deterministic md5-derived ±1 projections so results are reproducible
  anywhere), candidates = bucket collisions (multi-probe via per-table
  repeated projections), exact cosine re-rank on candidates only.  Turns
  O(N·Q) into O(N + collisions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches).

    Output: (query_id, neighbor_id, cosine_sim), k rows per query.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("__sim", 6).alias("cosine_sim"))
    )


def srp_sign(vec: Column, proj_id: int, dim: int) -> Column:
    """Sign of a deterministic ±1 random projection.

    Projection component (proj_id, i) = +1 if the first hex digit of
    md5('proj_id_i') is 0-7 else −1 — reproducible in any engine with md5.
    """
    import hashlib

    signs = [
        1 if int(hashlib.md5(f"{proj_id}_{i}".encode()).hexdigest()[0], 16) < 8 else -1
        for i in range(dim)
    ]
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(s)) for s in signs]),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj >= 0).cast("int")


def srp_bucket(vec: Column, n_bits: int, dim: int) -> Column:
    """n_bits-bit SRP bucket key as a string like '0110'."""
    return F.concat(*[srp_sign(vec, b, dim).cast("string") for b in range(n_bits)])


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: SRP bucket join, exact cosine re-rank in-bucket.

    Recall is tunable via ``n_bits`` (fewer bits → bigger buckets → higher
    recall, more compute).  Self-matches excluded.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("c_vec"),
    ).withColumn("bucket", srp_bucket(F.col("c_vec"), n_bits, dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("bucket", srp_bucket(F.col("q_vec"), n_bits, dim))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.round("__sim", 6).alias("cosine_sim"))
    )
