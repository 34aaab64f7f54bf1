"""Lloyd's k-means over an embedding column — the iterative-algorithm
pattern done Spark-style.

Each iteration is a fresh two-stage job, exactly the Spark MLlib design:

* **Assignment (map-side).** The k current centers live on the DRIVER as
  k × dim doubles — at most a few thousand values, the same sketch-size
  regime as the bloom bitset — and ship to executors inside the
  Arrow-batched assignment UDF (one numpy matmul per batch,
  ``assign_clusters_auto``; r14 measured the folded-literal
  ``zip_with``/``aggregate`` fold to be INTERPRETED — higher-order
  functions never enter whole-stage codegen — and slower at every size).
  The literal fold remains available (``assign_clusters`` /
  ``literal_cap``) as the fold-order-exact arithmetic reference: nearest
  center by squared L2, ties to the lowest center id, reproducible in
  SQL — the semantics BOTH paths implement and the seam tests pin equal.
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


#: Default literal-assignment budget for :func:`assign_clusters_auto`.
#: ZERO — i.e. the Arrow-batched numpy path is the default at EVERY
#: center count — because the folded-literal fold is built from
#: higher-order functions (zip_with/aggregate), which Spark evaluates
#: INTERPRETED, outside whole-stage codegen: O(nlist x dim) interpreted
#: expression steps per row.  Measured r14 (warmed 3-pass medians of the
#: full semantic_dedup audit, same data, same session): 2k rows x 8
#: centers — literal 1.51 s vs Arrow 1.12 s; 64k rows x 250 centers —
#: literal 18.8 s vs Arrow 2.03 s (x9.3; BASELINE.md r14).  The Arrow
#: kernel is the SAME sequential (v-c)^2 accumulation as the fold
#: (bit-identical on every input — see :func:`_make_l2_assign_udf`), so
#: there is no arithmetic trade-off; the literal path stays available
#: via an explicit ``literal_cap`` as the plan-level reference
#: implementation and for environments without Python workers.
LITERAL_CENTER_CAP = 0


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

    Cost: ``dim`` vectorized accumulation steps over a ``(batch x
    K_chunk)`` buffer per Arrow batch per center chunk — O(batch x nlist
    x dim) FLOPs, O(batch x chunk) live doubles (the center axis is
    chunked precisely so a million-center quantizer never materializes
    batch x nlist).  The centers ride to executors inside the serialized
    UDF, O(nlist x dim) doubles — the same broadcast-sketch regime as
    any IVF codebook.

    The squared distance is computed as a SEQUENTIAL per-dimension
    accumulation ``acc += (v_i - c_i)^2`` — the exact IEEE operation
    sequence of the literal path's zip_with/aggregate fold (and of a SQL
    engine's list fold), so the two paths are bit-identical on EVERY
    input: same rounding, same inf/NaN propagation, same engineered
    near-ties.  The tempting matmul identity ||v||^2 - 2v.c + ||c||^2 is
    NOT used: its error is relative to ||v||^2 rather than to the
    distance, which is catastrophic cancellation when vectors are huge
    and close (the sfedge matrix point caught it producing 1e231 where
    the fold gives 0.011 — a real wrong answer, not a tie artifact).
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
            rows = np.arange(v.shape[0])
            best_d = best_c = best_nan = None
            for s in range(0, mat.shape[0], chunk):
                m = mat[s : s + chunk]
                # sequential fold, vectorized across (rows x centers):
                # bit-identical to aggregate(zip_with(v, c, (x,y) ->
                # (x-y)*(x-y)), 0.0, acc + t) — same op order, same
                # rounding, same inf/NaN propagation
                d = np.zeros((v.shape[0], m.shape[0]))
                for i in range(dim):
                    t = v[:, i][:, None] - m[:, i][None, :]
                    d += t * t
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

    # asNondeterministic (guide §4.4): callers filter/join on the struct
    # fields (`__a.cluster_id`), and a pushed-down isnotnull over the
    # UDF column duplicates the ArrowEvalPython — every row then pays
    # the Python boundary twice (the r15 winnow/ivf_ann profile
    # signature).  Pure function; the marker only forbids cloning.
    return assign.asNondeterministic()


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
    """Dispatch assignment by center count against ``literal_cap``
    (default :data:`LITERAL_CENTER_CAP` = 0, i.e. the Arrow-batched
    numpy matmul everywhere — the measured winner at every size; see
    the constant's note).  Pass a positive ``literal_cap`` to take the
    folded-literal fold up to that many centers (fold-order-exact
    arithmetic, zero Python).  Same output either way — the r14 seam
    tests pin equality across the dispatch, edge vectors included."""
    cap = LITERAL_CENTER_CAP if literal_cap is None else literal_cap
    if len(centers) <= cap or not centers:
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
    # _auto: the Arrow matmul assignment (r14) — the folded-literal fold
    # is interpreted (higher-order functions) and paid O(k x dim)
    # interpreted steps per row PER ITERATION; identical results pinned
    # at every checked k (seam tests + the unrolled DuckDB oracle)
    assigned = assign_clusters_auto(corpus, centers, id_col, vec_col)
    for _ in range(iters):
        updated = _updated_centers(assigned, vec_col)
        centers = [(cid, updated.get(cid, c)) for cid, c in centers]
        assigned = assign_clusters_auto(corpus, centers, id_col, vec_col)
    return centers, assigned
