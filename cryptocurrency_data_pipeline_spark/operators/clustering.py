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


#: How many centers fit comfortably as folded plan literals.  Each center
#: is O(dim) expression nodes inside a zip_with/aggregate fold, so 256
#: centers x 64 dims is ~16k nodes — fast to codegen and the quickest
#: assignment at that size.  Past the cap the plan itself becomes the
#: bottleneck (compile time + code size grow linearly in nlist), so
#: :func:`assign_clusters_auto` switches to the Arrow-batched numpy path,
#: whose per-batch cost is one matmul regardless of plan size.
LITERAL_CENTER_CAP = 256


def _make_l2_assign_udf(centers: list[tuple[int, list[float]]], chunk: int = 4096):
    """Arrow-vectorized nearest-center-by-squared-L2 assignment (built
    lazily — pandas UDF return-type parsing needs an active session).

    Semantics are EXACTLY :func:`assign_clusters`'s, edge cases included
    (pinned by tests/test_clustering.py):

    * well-formed vector (non-NULL, length == dim): argmin of squared L2,
      ties to the lowest center id;
    * NaN distances rank ABOVE everything (Spark double ordering), so a
      real +inf distance beats a NaN one and an all-NaN row falls back to
      the lowest center id with ``sq_dist = NaN``;
    * malformed vector (NULL after ``as_double``, or wrong length — the
      literal path's zip_with pads with NULLs and the fold nulls out):
      lowest center id, ``sq_dist`` NULL.

    Cost: one ``(batch x K_chunk)`` numpy matmul per Arrow batch per
    center chunk — O(batch x nlist x dim) FLOPs, O(batch x chunk) live
    doubles (the center axis is chunked precisely so a million-center
    quantizer never materializes batch x nlist).  The centers ride to
    executors inside the serialized UDF, O(nlist x dim) doubles — the
    same broadcast-sketch regime as any IVF codebook.

    The squared distance uses the expanded form ||v||^2 - 2v.c + ||c||^2
    (the matmul identity), which can differ from the literal fold's
    sequential (v_i - c_i)^2 sum in the last float ulps — assignment can
    only differ on EXACT distance ties between two centers, where both
    paths break to the lower id anyway unless the tie itself is an
    artifact of summation order (measure-zero on real embeddings; the
    equality test pins integer-valued vectors where both forms are
    exact).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ordered = sorted(centers)  # ascending cid: chunk order IS tie order
    cid_arr = np.asarray([c for c, _ in ordered], dtype="int64")
    mat = np.asarray([v for _, v in ordered], dtype="float64")
    dim = mat.shape[1]
    lowest = int(cid_arr[0])

    # no type hints: the lazily-imported pd can't resolve string
    # annotations at decoration time; the returnType drives eval type
    @pandas_udf("struct<cluster_id: int, sq_dist: double>")
    def assign(vecs):
        n = len(vecs)
        out_c = np.full(n, lowest, dtype="int64")
        out_d = np.full(n, np.nan, dtype="float64")
        well = np.zeros(n, dtype=bool)  # sq_dist non-NULL (may be NaN/inf)
        ok = [
            i
            for i, v in enumerate(vecs)
            if v is not None and len(v) == dim
        ]
        if ok:
            v = np.stack(
                [np.asarray(vecs.iloc[i], dtype="float64") for i in ok]
            )
            vsq = (v * v).sum(axis=1)
            vfin = np.isfinite(v).all(axis=1)
            rows = np.arange(v.shape[0])

            def direct(a, b):
                # exact (x - c)^2 fold form, row-sliced to bound the
                # 3-D temporary; only the (rare) non-finite rows/centers
                # take this path, where the matmul identity corrupts
                # (inf * 0 = NaN where the fold gives inf)
                out = np.empty((a.shape[0], b.shape[0]))
                for r0 in range(0, a.shape[0], 128):
                    blk = a[r0 : r0 + 128]
                    out[r0 : r0 + 128] = (
                        (blk[:, None, :] - b[None, :, :]) ** 2
                    ).sum(axis=2)
                return out

            best_d = best_c = best_nan = None
            for s in range(0, mat.shape[0], chunk):
                m = mat[s : s + chunk]
                mfin = np.isfinite(m).all(axis=1)
                if vfin.all() and mfin.all():
                    d = (
                        vsq[:, None]
                        - 2.0 * (v @ m.T)
                        + (m * m).sum(axis=1)[None, :]
                    )
                else:
                    d = np.empty((v.shape[0], m.shape[0]))
                    vf = np.where(vfin)[0]
                    mf = np.where(mfin)[0]
                    if vf.size and mf.size:
                        d[np.ix_(vf, mf)] = (
                            vsq[vf, None]
                            - 2.0 * (v[vf] @ m[mf].T)
                            + (m[mf] * m[mf]).sum(axis=1)[None, :]
                        )
                    if vf.size < v.shape[0]:
                        d[~vfin, :] = direct(v[~vfin], m)
                    if mf.size < m.shape[0] and vf.size:
                        d[np.ix_(vf, ~mfin)] = direct(v[vf], m[~mfin])
                isn = np.isnan(d)
                d_cmp = np.where(isn, np.inf, d)
                j = np.argmin(d_cmp, axis=1)  # first min = lowest cid
                # rows whose best comparison key is +inf: a REAL +inf
                # distance must beat a NaN one (NaN is the largest double
                # in Spark's ordering, +inf only second-largest)
                realinf = d == np.inf
                fix = (d_cmp[rows, j] == np.inf) & realinf.any(axis=1)
                j = np.where(fix, np.argmax(realinf, axis=1), j)
                cand_d = d[rows, j]
                cand_nan = isn[rows, j]
                cand_c = cid_arr[s + j]
                if best_d is None:
                    best_d, best_c, best_nan = cand_d, cand_c, cand_nan
                else:
                    bk = np.where(best_nan, np.inf, best_d)
                    ck = np.where(cand_nan, np.inf, cand_d)
                    # strict improvement only — ties keep the earlier
                    # (lower-cid) chunk; a non-NaN +inf displaces a NaN
                    better = (ck < bk) | (~cand_nan & best_nan & (ck == bk))
                    best_d = np.where(better, cand_d, best_d)
                    best_c = np.where(better, cand_c, best_c)
                    best_nan = np.where(better, cand_nan, best_nan)
            oki = np.asarray(ok)
            out_c[oki] = best_c
            out_d[oki] = best_d
            well[oki] = True
        # masked FloatingArray: masked slots -> SQL NULL while unmasked
        # NaN SURVIVES as NaN — a plain float64 column loses the
        # distinction (Arrow's from_pandas turns NaN into null)
        sq = pd.arrays.FloatingArray(out_d, ~well)
        return pd.DataFrame(
            {"cluster_id": out_c.astype("int32"), "sq_dist": sq}
        )

    return assign


def assign_clusters_arrow(
    corpus: DataFrame,
    centers: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`assign_clusters` semantics via the Arrow-batched numpy
    matmul instead of folded plan literals — the large-``nlist`` path
    (see :data:`LITERAL_CENTER_CAP`).  Map-only: no shuffle, no
    per-row Python."""
    if not centers:
        return assign_clusters(corpus, centers, id_col=id_col, vec_col=vec_col)
    vec = as_double(F.col(vec_col))
    staged = corpus.select(F.col(id_col), vec.alias("__v"))
    assign = _make_l2_assign_udf(centers)
    return staged.withColumn("__a", assign(F.col("__v"))).select(
        id_col,
        F.col("__v").alias(vec_col),
        F.col("__a")["cluster_id"].alias("cluster_id"),
        F.col("__a")["sq_dist"].alias("sq_dist"),
    )


def assign_clusters_auto(
    corpus: DataFrame,
    centers: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    literal_cap: int | None = None,
) -> DataFrame:
    """Dispatch assignment by center count: folded literals up to
    :data:`LITERAL_CENTER_CAP` (fastest, whole-stage codegen), the
    Arrow-batched numpy path beyond (plan size stays O(1) in nlist).
    Same output, bit-for-bit, on well-formed data — the r14 seam test
    pins equality across the cap."""
    cap = LITERAL_CENTER_CAP if literal_cap is None else literal_cap
    if len(centers) <= cap:
        return assign_clusters(corpus, centers, id_col=id_col, vec_col=vec_col)
    return assign_clusters_arrow(corpus, centers, id_col=id_col, vec_col=vec_col)


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
    # _auto: literal fold at the usual k <= LITERAL_CENTER_CAP, Arrow
    # matmul past it — a k=4096 fit stops paying O(k x dim) plan nodes
    # PER ITERATION (r14; identical results at every checked k)
    assigned = assign_clusters_auto(corpus, centers, id_col, vec_col)
    for _ in range(iters):
        updated = _updated_centers(assigned, vec_col)
        centers = [(cid, updated.get(cid, c)) for cid, c in centers]
        assigned = assign_clusters_auto(corpus, centers, id_col, vec_col)
    return centers, assigned
