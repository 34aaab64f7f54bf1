"""Lloyd's k-means over an embedding column — the iterative-algorithm
pattern done Spark-style.

Each iteration is a fresh two-stage job, exactly the Spark MLlib design:

* **Assignment (map-side).** The k current centers live on the DRIVER as
  k × dim doubles and enter the plan as folded literal arrays — at most a
  few thousand values, the same sketch-size regime as the bloom bitset.
  Every row computes its squared L2 distance to each center inside
  whole-stage codegen (``zip_with`` + ``aggregate`` against a constant
  array) and takes the argmin via ``array_min`` over (distance, id)
  structs — ties to the lowest center id, reproducible in SQL.
* **Update (one shuffle).** New centers are the element-wise mean of each
  cluster: ``posexplode`` to (cluster, dim, value), one partial-agg'd
  ``groupBy(cluster, dim).avg`` — the shuffle carries k × dim partials
  per map task, never vectors — then k × dim rows collect back to the
  driver for the next round's literals.

Because every iteration re-plans from the corpus scan plus new literals,
lineage does NOT grow with iteration count — no checkpointing needed
(contrast ``graph.connected_components``, whose frontier is itself
distributed).  Driver state is O(k · dim); data never leaves executors
except the k × dim means.

Seeds reuse the md5-deterministic ``similarity.ivf_centroids`` sample, so
a fixed-iteration fit replays exactly in DuckDB (unrolled CTEs) — no RNG.

Reference counterpart: none (its Glue jobs do no ML); this extends the
IVF coarse quantizer (similarity.py) into a full refinement loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.similarity import (
    as_double,
    ivf_centroids,
)


def _sq_dist_to(vec: Column, center: list[float]) -> Column:
    """Squared L2 distance to a constant center (folded literal array)."""
    lit_center = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(vec, lit_center, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_clusters(
    corpus: DataFrame,
    centers: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cluster_id): nearest center by squared L2, ties to the
    lowest center id."""
    vec = as_double(F.col(vec_col))
    staged = corpus.select(F.col(id_col), vec.alias("__v"))
    if not centers:
        # empty corpus -> empty seed sample: emit the output schema with
        # zero rows instead of building an empty struct array (VOID type)
        return staged.select(
            id_col,
            F.col("__v").alias(vec_col),
            F.lit(None).cast("int").alias("cluster_id"),
            F.lit(None).cast("double").alias("sq_dist"),
        ).limit(0)
    entries = [
        F.struct(
            _sq_dist_to(F.col("__v"), c).alias("d"), F.lit(cid).alias("c")
        )
        for cid, c in centers
    ]
    best = staged.select(
        id_col, "__v", F.array_min(F.array(*entries)).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__v").alias(vec_col),
        F.col("__best")["c"].alias("cluster_id"),
        F.col("__best")["d"].alias("sq_dist"),
    )


def _updated_centers(assigned: DataFrame, vec_col: str) -> dict[int, list[float]]:
    """Element-wise cluster means; k x dim scalar rows to the driver,
    never data (one dimension-parallel agg, map-side partials)."""
    rows = (
        assigned.select("cluster_id", F.posexplode(vec_col).alias("i", "x"))
        .groupBy("cluster_id", "i")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    centers: dict[int, dict[int, float]] = {}
    for r in rows:
        centers.setdefault(r.cluster_id, {})[r.i] = r.m
    return {
        cid: [dims[i] for i in sorted(dims)] for cid, dims in centers.items()
    }


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Run ``iters`` Lloyd rounds from the md5-deterministic seed sample.

    Returns (centers, final assignment DataFrame).  Empty clusters keep
    their previous center (no re-seeding — deterministic).
    """
    # Corrupt vectors (NULL / NULL-component, collapsed by as_double)
    # neither seed, train, nor appear in the assignment — mirrored by
    # the oracle's v-equality join, which NULL never satisfies (sfnull).
    corpus = corpus.filter(as_double(F.col(vec_col)).isNotNull())
    seeds = ivf_centroids(corpus, nlist=k, id_col=id_col, vec_col=vec_col)
    centers = sorted(
        (r.centroid_id, list(r.centroid)) for r in seeds.collect()
    )
    assigned = assign_clusters(corpus, centers, id_col, vec_col)
    for _ in range(iters):
        updated = _updated_centers(assigned, vec_col)
        centers = [(cid, updated.get(cid, c)) for cid, c in centers]
        assigned = assign_clusters(corpus, centers, id_col, vec_col)
    return centers, assigned
