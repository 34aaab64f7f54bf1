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
* **IVF-flat ANN** — FAISS-style inverted lists: deterministic seeded
  coarse quantizer, Arrow-vectorized numpy assignment (map-only over the
  corpus), multi-probe queries, exact re-rank within probed lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    """Float64 view of an embedding, with the ELEMENT-COMPLETENESS
    contract: a vector containing any NULL component is corrupt (a
    failed upstream decode / partial join, routine at 100 TB) and
    collapses to a NULL vector here, at the single entry point every
    similarity/ANN/PQ/clustering operator routes through.  Downstream
    the NULL vector takes the same already-guarded path as the zero
    vector (NULL dot -> non-positive denom -> sim 0.0), identically on
    both engines — whereas raw NULL elements DIVERGE: Spark's lambda
    arithmetic null-propagates silently while DuckDB's
    ``list_dot_product`` hard-errors on NULL components (sfnull class).
    Mirrored by ``_fragments.vec_sql``.  Map-only, short-circuits."""
    return F.when(
        F.forall(col, lambda x: x.isNotNull()), col.cast("array<double>")
    )


def dot(a: Column, b: Column) -> Column:
    """Element-order dot product via the ``zip_with`` + ``aggregate``
    fold.  Measured note (r14): Spark evaluates higher-order functions
    outside whole-stage codegen, but the interpreted fold is tight JVM
    code — an unrolled codegen'd sum measured only ~1.5x faster per row
    while costing ~2 s of py4j expression-building per query at dim 64,
    a net loss at every bench shape.  Bulk distance compute that IS
    fold-bound goes through the Arrow kernels
    (``clustering._make_l2_assign_udf``) instead."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-norm guard: a zero vector scores
    0.0 against everything (CASE evaluates lazily, so the division
    never runs — under ANSI mode an unguarded zero norm raises
    divide-by-zero, and at corpus scale zero embeddings DO occur)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


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
    # Round before the sign test so engines whose float summation order
    # differs (sequential fold here, hash-agg elsewhere) bucket identically.
    return (F.round(proj, 9) >= 0).cast("int")


def srp_bucket(vec: Column, n_bits: int, dim: int) -> Column:
    """n_bits-bit SRP bucket key as a string like '0110'."""
    return F.concat(*[srp_sign(vec, b, dim).cast("string") for b in range(n_bits)])


def ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: ``nlist`` seed centroids.

    Seeds are the corpus vectors with the smallest ``md5(id)`` — a
    reproducible pseudo-random sample any engine can replay (no RNG state).
    The top-``nlist`` selection is ``orderBy().limit()``, which compiles to
    ``TakeOrderedAndProject``: each task keeps its local nlist smallest and
    only those survivors reach the driver-side merge — no partition ever
    holds more than nlist rows, so the seed scan stays fully parallel at
    100 TB.  The row_number that assigns ``centroid_id`` runs *after* the
    limit, over exactly nlist rows.  Output: (centroid_id 1..nlist,
    centroid array<double>).
    """
    seeds = (
        corpus.select(
            F.col(id_col).alias("__seed_id"), as_double(F.col(vec_col)).alias("centroid")
        )
        # corrupt vectors (NULL / NULL-component, collapsed by as_double)
        # cannot seed a centroid: seeds are the nlist smallest md5(id)
        # among COMPLETE vectors, on both engines (sfnull class)
        .where(F.col("centroid").isNotNull())
        .withColumn("__ord", F.md5(F.col("__seed_id").cast("string")))
        .orderBy("__ord", "__seed_id")
        .limit(nlist)
    )
    w = Window.orderBy("__ord", "__seed_id")  # over nlist rows only
    return (
        seeds.withColumn("centroid_id", F.row_number().over(w))
        .select("centroid_id", "centroid")
    )


def _make_probe_udf(cent_mat, nprobe: int):
    """Arrow-vectorized nearest-centroid assignment (built lazily — pandas
    UDF return-type parsing needs an active session).

    One numpy matmul per Arrow batch against the broadcast centroid matrix:
    O(batch × nlist × dim) FLOPs with no per-row Python.  Similarities are
    rounded to 9 dp before ranking so the choice is reproducible across
    engines whose summation order differs (numpy pairwise vs sequential);
    ties break toward the lower centroid_id (stable argsort).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(cent_mat, dtype="float64")  # (nlist, dim), centroid_id order
    norms = np.sqrt((mat * mat).sum(axis=1))

    @pandas_udf("array<int>")
    def probes(vecs):
        import pandas as pd

        v = np.stack(vecs.to_numpy())  # (batch, dim) float64
        sims = (v @ mat.T) / (np.sqrt((v * v).sum(axis=1))[:, None] * norms[None, :])
        order = np.argsort(np.round(-sims, 9), axis=1, kind="stable")[:, :nprobe]
        return pd.Series([(row + 1).tolist() for row in order])

    # asNondeterministic (guide §4.4): the corpus side projects
    # `probes(v)[0]` and the downstream centroid_id equi-join infers
    # `isnotnull(probes(v)[0])`, which the optimizer pushes BELOW the
    # projection — duplicating the ArrowEvalPython so every corpus row
    # paid the Python boundary twice (r14 ivf_ann_topk plan: nodes 3 and
    # 7 are the same UDF; the −19% r14 regression).  The function is
    # pure; the marker only forbids cloning/reordering.
    return probes.asNondeterministic()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into ``nlist`` inverted
    lists, probe the ``nprobe`` nearest lists per query, exact cosine
    re-rank on candidates only.

    The corpus side never shuffles on vectors: assignment is a map-only
    pandas UDF, and the candidate join shuffles on the int ``centroid_id``
    (or broadcasts the query side, as here).  Recall tunes via
    ``nprobe``/``nlist`` exactly as in FAISS-style IVF.
    """
    cents = ivf_centroids(corpus, nlist, id_col, vec_col)
    cent_rows = cents.orderBy("centroid_id").collect()
    cent_mat = [r.centroid for r in cent_rows]
    if not cent_mat:
        # Empty corpus: zero seed centroids means zero inverted lists
        # and zero candidates — an empty top-k, not a numpy shape crash
        # in the assignment UDF (the new-tenant/first-run input class).
        return queries.limit(0).select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("cosine_sim"),
        )

    assign1 = _make_probe_udf(cent_mat, 1)
    assignp = _make_probe_udf(cent_mat, nprobe)
    # Corrupt vectors (collapsed to NULL by as_double) are excluded from
    # the index and the probe set: they belong to no inverted list (the
    # numpy assignment batch needs rectangular input), matching the
    # oracle, whose NULL-v rows fall out of the cluster equi-join.
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
        )
        .where(F.col("c_vec").isNotNull())
        .withColumn("centroid_id", assign1(F.col("c_vec"))[0])
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
        )
        .where(F.col("q_vec").isNotNull())
        .withColumn("centroid_id", F.explode(assignp(F.col("q_vec"))))
    )

    scored = (
        c.join(F.broadcast(q), "centroid_id")
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


# --------------------------------------------------------------------------
# int8 scalar quantization — the bandwidth lever for embedding columns.
# --------------------------------------------------------------------------

def vec_finite(vec: Column) -> Column:
    """True iff every component is a finite double — the vector-level
    analog of ``quantize.finite``.  A corrupt embedding (one NaN/±Inf
    component — real at 100 TB: overflowed encoders, bad casts upstream)
    makes the int8 scale non-finite, every code NaN-derived, and DuckDB
    refuses the code cast outright, so quantized search EXCLUDES such
    vectors by contract (the exact-cosine path still scores them: NaN
    similarity orders deterministically below any real match on both
    engines).  Map-only, short-circuits per row."""
    return F.forall(
        vec,
        lambda x: (~F.isnan(x))
        & (x > F.lit(float("-inf")))
        & (x < F.lit(float("inf"))),
    )


def int8_scale(vec: Column) -> Column:
    """Per-vector symmetric quantization scale: ``max(|v_i|) / 127``.

    Symmetric (no zero-point) so the quantized dot product needs no
    cross-term correction: ``cos(a, b)`` over the int codes equals
    ``cos(deq(a), deq(b))`` exactly — the scales cancel.
    """
    return F.array_max(F.transform(vec, lambda x: F.abs(x))) / F.lit(127.0)


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Quantize to int codes in [-127, 127]: ``floor(v/scale + 0.5)``.

    Explicit ``floor(x + 0.5)`` (round-half-up) instead of an engine
    ``round()``/int-cast because those disagree across engines (Spark's
    double→int cast truncates, DuckDB's rounds) — this form replays
    bit-for-bit anywhere.  ``scale`` must be a *staged column*, not an
    inline expression: Catalyst does no CSE inside HOF lambdas, so an
    inline ``array_max`` scale would re-reduce the vector once per
    element, O(d²).

    At 100 TB the point is shuffle/IO mass: 64-dim float32 embeddings are
    256 B/row, the int8 codes 64 B — a 4× cut on every exchange, cache,
    and scan downstream, with ranking error bounded by the quantization
    step.  Zero-vector rows (scale 0) quantize to all-zero codes.
    """
    half = F.lit(0.5)
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.when(scale > 0, F.floor(x / scale + half).cast("int")).otherwise(
                    F.lit(0)
                ),
            ),
        ),
    )


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-over-codes top-k: cosine on int8 codes (integer dot products).

    Same plan shape as ``cosine_topk`` (broadcast queries, corpus stays
    partition-parallel, per-query top-k via window), but all arithmetic
    until the final normalization is INTEGER — exact, associative, no
    float summation-order sensitivity — and the vectors crossing the
    broadcast/shuffle are 4× smaller.  Output is the quantized cosine, so
    the whole operator replays bit-for-bit in any engine with md5-free
    deterministic math.
    """
    vec = as_double(F.col(vec_col))
    # Corrupt-vector guard: any non-finite component poisons the scale
    # and every downstream code (see vec_finite) — excluded on both the
    # corpus and query sides, mirrored by the oracle's isfinite filter.
    q = (
        queries.select(F.col(id_col).alias("query_id"), vec.alias("v"))
        .filter(vec_finite(F.col("v")))
        .withColumn("scale", int8_scale(F.col("v")))
        .select(
            "query_id", quantize_int8(F.col("v"), F.col("scale")).alias("q_codes")
        )
    )
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), vec.alias("v"))
        .filter(vec_finite(F.col("v")))
        .withColumn("scale", int8_scale(F.col("v")))
        .select(
            "neighbor_id", quantize_int8(F.col("v"), F.col("scale")).alias("c_codes")
        )
    )
    idot = F.aggregate(
        F.zip_with(
            F.col("c_codes"), F.col("q_codes"), lambda x, y: (x * y).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    def inorm(codes: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(codes, lambda x: (x * x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
        )

    # Zero-norm guard, same as cosine(): an all-zero embedding quantizes
    # to all-zero codes, and the unguarded division raises DIVIDE_BY_ZERO
    # under ANSI mode (default on) — zero vectors DO occur at corpus
    # scale and must score 0.0, not kill the job.
    denom = inorm(F.col("c_codes")) * inorm(F.col("q_codes"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(denom > 0, idot / denom).otherwise(F.lit(0.0)).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("q_cosine_sim"))
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    most-similar corpus vectors carrying a DIFFERENT label — near the
    decision boundary, which is exactly what a contrastive loss wants.

    Same scale shape as :func:`cosine_topk`: the (small) query set is
    broadcast against the corpus scan, similarity is a JVM ``zip_with`` /
    ``aggregate`` fold, and per-query top-k resolves as a WindowGroupLimit
    (partial group-limit below the query-keyed exchange, never a global
    sort). The label predicate prunes pairs BEFORE the similarity fold, so
    mismatched-label work is the only work done.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("q_label"),
        as_double(F.col(vec_col)).alias("q_vec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        as_double(F.col(vec_col)).alias("c_vec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_label") != F.col("q_label"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("n_label").alias("neg_label"),
            cosine(F.col("q_vec"), F.col("c_vec")).alias("__sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", "neg_label",
            F.round("__sim", 6).alias("cosine_sim"),
        )
    )
