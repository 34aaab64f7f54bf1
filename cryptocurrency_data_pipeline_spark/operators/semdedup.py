"""SemDeDup — semantic deduplication over an embedding column.

Public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication"): cluster the corpus embeddings
with a cheap coarse quantizer, then, *within each cluster only*, drop
every vector that sits inside the epsilon-ball (cosine >= tau) of a kept
exemplar.  The clustering is what makes it tractable — the pair space is
per-cluster, never corpus x corpus.

Spark shape, stage by stage:

* **Coarse clustering — map-only.**  Centers come from the deterministic
  md5-seeded IVF quantizer (``similarity.ivf_centroids``,
  TakeOrderedAndProject — no single-task collapse) and enter the plan as
  k x dim folded literals; every row picks its nearest center inside
  whole-stage codegen (``clustering.assign_clusters``).  No shuffle.
* **Within-cluster pairs — ONE equi-join shuffle on ``cluster_id``.**
  Pairs are restricted to ``id_a < id_b`` and scored with the JVM-side
  ``zip_with``/``aggregate`` cosine.  Because the join key is a plain
  equi-key, AQE's skew-join splitting applies if one cluster is hot.
* **Keep rule — deterministic lowest-id exemplar.**  A vector is DROPPED
  iff some *lower-id* vector in the same cluster has cosine >= tau; the
  surviving set is exactly "one exemplar per epsilon-ball, ties to the
  smallest id", reproducible in any engine (no RNG, no float ranking).
* **Flagging — one aggregation keyed on the id.**  The dropped-id set is
  deduped and left-joined back as a boolean, so callers can either filter
  (``is_kept``) or audit per-cluster retention.

At 100 TB: driver state is O(nlist x dim) literals (same regime as the
bloom bitset and k-means centers); cluster sizes are an nlist tuning knob
exactly as IVF list lengths are; nothing materializes the cross-corpus
pair space.

Reference counterpart: none (the Glue jobs do no ML); extends the
dedup family (exact / MinHash / SimHash / winnowing / substring) with the
embedding-space member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.clustering import assign_clusters
from cryptocurrency_data_pipeline_spark.operators.similarity import (
    dot,
    ivf_centroids,
)


def _self_dot(v):
    """Sequential-fold self dot product (same order as DuckDB's
    list_dot_product, so sqrt(self_dot) replays exactly)."""
    return dot(v, v)


def semantic_dedup(
    corpus: DataFrame,
    nlist: int = 8,
    tau: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Flag semantic near-duplicates: (id, cluster_id, is_kept).

    ``is_kept`` is False iff a lower-id vector in the same coarse cluster
    has cosine similarity >= ``tau``.  Deterministic end to end (md5
    seeds, lowest-id exemplars); filter on ``is_kept`` for the deduped
    corpus or aggregate per cluster for a retention audit.
    """
    seeds = ivf_centroids(corpus, nlist=nlist, id_col=id_col, vec_col=vec_col)
    centers = sorted((r.centroid_id, list(r.centroid)) for r in seeds.collect())
    # Three consumers (both pair sides + the flag join) would each rescan
    # the corpus and recompute the k x dim assignment; persist collapses
    # them onto one scan + cache reads (spills to disk at scale, reclaimed
    # by the ContextCleaner — the MLlib caching discipline).  Vectors are
    # L2-normalized HERE, once per row, so every within-cluster pair pays
    # a single dot-product fold instead of dot + two norms — the pair
    # space is the quadratic term, the normalization is linear.  (Oracles
    # must normalize-then-dot the same way: the fold order matters.)
    assigned = (
        assign_clusters(corpus, centers, id_col=id_col, vec_col=vec_col)
        # norm in its OWN column first: inside the transform lambda it
        # would re-fold the whole vector once per element (O(dim^2)/row)
        .withColumn("__norm", F.sqrt(_self_dot(F.col(vec_col))))
        .withColumn(
            "__nv",
            F.transform(F.col(vec_col), lambda x: x / F.col("__norm")),
        )
        .drop("__norm")
        .persist()
    )

    a = assigned.select(
        F.col(id_col).alias("__id_a"),
        F.col("cluster_id"),
        F.col("__nv").alias("__v_a"),
    )
    b = assigned.select(
        F.col(id_col).alias("__id_b"),
        F.col("cluster_id"),
        F.col("__nv").alias("__v_b"),
    )
    dropped = (
        a.join(b, "cluster_id")
        .filter(F.col("__id_a") < F.col("__id_b"))
        .filter(dot(F.col("__v_a"), F.col("__v_b")) >= F.lit(float(tau)))
        .select(F.col("__id_b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    # The flag join never needs the vectors — shuffle (id, cluster) only.
    slim = assigned.select(id_col, "cluster_id")
    return (
        slim.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("is_kept"),
        )
    )
