"""Product quantization (PQ) for embedding search at corpus scale.

IVF prunes *candidates*; PQ shrinks *memory*: a 64-dim float vector
(256 B) becomes M=8 one-byte codes by quantizing each 8-dim subvector to
its nearest codebook centroid — a 32× compression that lets a
100 TB embedding corpus fit executor memory for approximate scoring.
Queries are answered with asymmetric distance computation (ADC): the
query builds an M×K lookup table of exact subvector-to-centroid
distances once, and every corpus vector scores as the SUM of M table
lookups — no float vector ever leaves storage (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Engine mapping:

- the **codebook is a table** (``m, code, centroid``), broadcast to the
  encode and scoring joins — the same exported-artifact pattern as the
  classifier weight table; a real deployment trains it with
  ``operators/clustering`` per subspace and swaps the DataFrame;
- **encode** is explode-by-subspace → broadcast codebook join →
  per-(vector, subspace) argmin via a rank window — all JVM expressions
  (``zip_with`` + ``aggregate`` in element order, so distances are
  bit-identical on any engine);
- **ADC** is one broadcast lookup-table join + a partial-agged sum, then
  the standard per-query top-k window.

Reference semantics: the reference has no vector search at all; this is
part of the engine's training-data surface (SURVEY.md §2 similarity
family) alongside exact/SRP/IVF/int8 search.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.similarity import as_double


def is_missing_artifact(e: Exception) -> bool:
    """True iff ``e`` means "the artifact simply isn't there" — a missing
    path or a present-but-fileless directory.  Everything else (corrupt
    footers, permission errors, schema mismatches) is a real failure the
    caller must surface: silently retraining over it would mask a storage
    problem AND burn the training cost (ADVICE r6)."""
    if not isinstance(e, AnalysisException):
        return False
    get = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
    cond = (get() if get is not None else None) or ""
    return cond.startswith("PATH_NOT_FOUND") or cond.startswith(
        "UNABLE_TO_INFER_SCHEMA"
    )


def demo_codebook(
    spark: SparkSession, m: int = 8, k: int = 16, subdim: int = 8
) -> DataFrame:
    """Deterministic stand-in for trained PQ codebooks: centroid
    component ``c[m][j][d] = ((7j + 3d + 11m) % 17 - 8) / 8`` — exact
    integer arithmetic over a [-1, 1] grid, replayable in any engine.
    O(m·k) literal rows, the size of a real exported codebook."""
    rows = [
        (
            mi,
            j,
            [((7 * j + 3 * d + 11 * mi) % 17 - 8) / 8.0 for d in range(subdim)],
        )
        for mi in range(m)
        for j in range(k)
    ]
    return codebook_frame(spark, rows)


def _sql_double(x: float) -> str:
    """Exact SQL double literal: shortest-repr decimals with an exponent
    marker (plain decimals parse as DECIMAL in Spark SQL) — both engines
    use correctly-rounded IEEE parse, so the value round-trips bit-for-
    bit, inf/NaN included."""
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if x == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    r = repr(float(x))
    return r if ("e" in r or "E" in r) else r + "E0"


def codebook_frame(spark: SparkSession, rows) -> DataFrame:
    """``(m, code, centroid)`` frame from driver-side rows WITHOUT a
    Python-pickled RDD: ``createDataFrame(rows)`` plans as a Scan
    ExistingRDD whose every materialization (each broadcast build, each
    Lloyd-round action) spawns a default-parallelism-task Python-worker
    stage — measured ~0.2 s of pure scheduler/worker overhead per task
    and the dominant cost of the whole PQ family at bench scale.  A SQL
    ``VALUES`` inline table resolves to a ``LocalRelation`` at analysis
    (physical plan: one ``LocalTableScan``, broadcast built driver-side,
    no Python anywhere) — measured 0.17 s vs 0.49 s per action at
    m=8, k=16.  One ``spark.sql`` call, not O(m·k·dim) py4j calls (an
    ``F.lit``-per-component builder spent ~2 s/frame in py4j alone)."""
    if not rows:  # zero-row VALUES is unsyntactic — keep the (cheap,
        # empty) RDD path for the sfempty corpus class
        return spark.createDataFrame(
            [], "m int, code int, centroid array<double>"
        )
    vals = ", ".join(
        f"(CAST({int(mi)} AS INT), CAST({int(j)} AS INT), "
        f"array({', '.join(_sql_double(x) for x in cent)}))"
        for mi, j, cent in rows
    )
    return spark.sql(
        f"SELECT m, code, centroid FROM VALUES {vals} AS t(m, code, centroid)"
    )


def _sub_dist(subdim: int | None = None) -> "F.Column":
    """Squared L2 between the ``sub`` and ``centroid`` arrays, folded in
    ELEMENT ORDER (``zip_with`` + ``aggregate``) so the doubles — and
    everything derived from them — are engine-exact.

    With ``subdim`` given, the common full-length case runs as an
    UNROLLED left-associated sum (``0.0 + t1 + t2 + ...`` — the exact
    IEEE op sequence of the fold, including the leading ``0.0 + t1``),
    which whole-stage codegen compiles, where higher-order functions
    stay interpreted (the r14 literal-vs-Arrow crossover measurement).
    Short/long arrays fall back to the fold via the size guard, so
    zip_with's pad-with-NULL semantics are preserved bit-for-bit."""
    fold = F.aggregate(
        F.zip_with(F.col("sub"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if subdim is None:
        return fold
    acc = F.lit(0.0)
    for i in range(1, subdim + 1):
        d = F.element_at(F.col("sub"), i) - F.element_at(F.col("centroid"), i)
        acc = acc + d * d
    return F.when(
        (F.size(F.col("sub")) == subdim)
        & (F.size(F.col("centroid")) == subdim),
        acc,
    ).otherwise(fold)


def _make_code_assign_udf(book: dict, subdim: int):
    """Arrow-batched nearest-code assignment for DRIVER-HELD codebooks —
    the Lloyd-round replacement for ``broadcast(codebook) join`` +
    ``_sub_dist`` + ``min_by`` (r15, guide §4.2): one pandas UDF
    ``(m, sub) → code`` per batch, numpy per subspace, no broadcast
    build, no 16× row explode, no argmin shuffle per round.

    Semantics are EXACTLY the join path's (pinned by the seam test in
    tests/test_pq.py):

    * distance is the SEQUENTIAL per-dimension accumulation
      ``acc += (x_i - y_i)^2`` from ``acc = 0`` — the same IEEE op order
      as ``_sub_dist``'s unrolled ``0.0 + t1 + t2 + …``, so every
      comparison (and therefore every argmin and tie) is bit-identical;
    * ties break to the LOWEST code (min_by over ``struct(dist, code)``);
    * NaN distances rank ABOVE everything (Spark double ordering), so a
      REAL +inf distance beats a NaN one and an all-NaN row falls back
      to the lowest code;
    * a sub of the wrong length (zip_with's pad-NULL → NULL dist for
      every code) falls back to the lowest code, matching the join
      path's NULLS-FIRST struct ordering.

    The codebook rides to executors inside the serialized UDF —
    O(m·k·subdim) doubles, the broadcast-sketch regime."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mats = {}
    for mi, codes in book.items():
        cs = sorted(codes)
        mats[int(mi)] = (
            np.asarray(cs, dtype="int64"),
            np.asarray([codes[c] for c in cs], dtype="float64"),
        )

    @pandas_udf("int")
    def assign(ms, subs):
        n = len(ms)
        out = np.zeros(n, dtype="int64")
        m_arr = ms.to_numpy()
        vals = subs.to_numpy()  # object array of per-row numpy arrays
        lens = np.fromiter(
            (0 if r is None else len(r) for r in vals), dtype="int64", count=n
        )
        ok_all = lens == subdim
        # One C-loop stack for the whole batch (no per-element iloc —
        # the first cut spent its time in pandas indexing, not numpy).
        if ok_all.any():
            stacked = np.stack(vals[ok_all]).astype("float64", copy=False)
        pos = np.cumsum(ok_all) - 1  # row -> index into `stacked`
        for mi, (cids, mat) in mats.items():
            idx = np.flatnonzero(m_arr == mi)
            if idx.size == 0:
                continue
            ok = ok_all[idx]
            out[idx] = int(cids[0])  # malformed rows: lowest code
            oki = idx[ok]
            if oki.size:
                v = stacked[pos[oki]]
                d = np.zeros((v.shape[0], mat.shape[0]))
                for i in range(subdim):
                    t = v[:, i][:, None] - mat[:, i][None, :]
                    d += t * t
                key = np.where(np.isnan(d), np.inf, d)
                j = np.argmin(key, axis=1)  # first min = lowest code
                rr = np.arange(v.shape[0])
                realinf = d == np.inf
                fix = (key[rr, j] == np.inf) & realinf.any(axis=1)
                j = np.where(fix, np.argmax(realinf, axis=1), j)
                out[oki] = cids[j]
        return pd.Series(out.astype("int32"))

    # asNondeterministic (guide §4.4): forbid the optimizer cloning the
    # ArrowEvalPython around pushed-down filters; the function is pure.
    return assign.asNondeterministic()


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    m: int = 8,
    subdim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sub: DataFrame | None = None,
) -> DataFrame:
    """Encode vectors to PQ codes: ``(id, m, code)``, one row per
    subspace.

    On the Arrow kernel (r15): a codebook is O(m·k) rows by
    construction, so it collects to the driver (one tiny job —
    LocalTableScan for a trained frame, a single-file read for a
    persisted one) and encoding becomes ONE map-only ArrowEvalPython
    ``(m, sub) → code`` — no broadcast build, no K× explode join, no
    min_by exchange.  The kernel's argmin is bit-identical to the
    join path's ``min_by(code, struct(dist, code))`` (same sequential
    fold arithmetic, same ties/NaN/inf/short-sub handling — the seam
    test in tests/test_pq.py pins both paths equal on engineered edge
    vectors).  A codebook whose centroids are not all ``subdim`` long
    (a foreign artifact) falls back to the join + ``_sub_dist`` path,
    whose size guard preserves zip_with's pad-NULL semantics.

    Pass a cached ``sub`` frame (from ``_subvectors``) to share the
    explode with training."""
    if sub is None:
        sub = _subvectors(df, m, subdim, id_col, vec_col)
    cb_rows = codebook.collect()
    if all(len(r.centroid) == subdim for r in cb_rows):
        book: dict[int, dict[int, list[float]]] = {}
        for r in cb_rows:
            book.setdefault(int(r.m), {})[int(r.code)] = list(r.centroid)
        if book:
            assign = _make_code_assign_udf(book, subdim)
            # The inner join DROPPED rows whose subspace has no codebook
            # entry (a mismatched-m artifact); mirror it exactly.
            return sub.where(F.col("m").isin(sorted(book))).select(
                id_col, "m", assign(F.col("m"), F.col("sub")).alias("code")
            )
        # Empty codebook (sfempty corpus class): the join path yields the
        # same empty (id, m, code) frame the inner join always produced.
    return (
        sub.join(F.broadcast(codebook), "m")
        .select(id_col, "m", "code", _sub_dist(subdim).alias("dist"))
        .groupBy(id_col, "m")
        .agg(
            F.min_by("code", F.struct("dist", "code")).alias("code")
        )
    )


def adc_lut(
    queries: DataFrame,
    codebook: DataFrame,
    subdim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query ADC lookup table: exact distance from each query
    subvector to each codebook centroid — O(|queries|·m·k) rows,
    broadcast-sized by construction."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).where(F.col("qv").isNotNull())  # corrupt queries have no LUT (sfnull)
    dist = F.aggregate(
        F.zip_with(
            F.slice(F.col("qv"), F.col("m") * subdim + 1, subdim),
            F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return q.crossJoin(codebook).select(
        "query_id", "m", "code", dist.alias("lut_dist")
    )


def pq_adc_topk(
    codes: DataFrame,
    lut: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k per query by asymmetric PQ distance.

    One broadcast join of the (query, m, code) lookup table onto the
    codes, one partial-agged sum over the M subspaces, one per-query
    top-k window ordered ``(rounded distance, id)`` — the rounding
    absorbs float summation-order noise so ranking is engine-stable.
    Self-matches are excluded like every other search operator."""
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("lut_dist"), 6).alias("adc_dist"))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", id_col)
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "adc_dist",
            F.col("rn").alias("rank"),
        )
    )


def exact_l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k (the ground truth PQ approximates):
    broadcast queries, element-order fold, per-query window."""
    # Corrupt vectors (collapsed to NULL by as_double) are excluded on
    # both sides: a NULL distance would rank NULLS-FIRST on Spark and
    # NULLS-LAST on DuckDB (sfnull class).
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).where(F.col("qv").isNotNull())
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).where(F.col("cv").isNotNull())
    dist = F.aggregate(
        F.zip_with(F.col("cv"), F.col("qv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy("l2_dist", "neighbor_id")
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(dist, 6).alias("l2_dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "l2_dist")
    )


def _subvectors(
    df: DataFrame, m: int, subdim: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, m, sub) — one row per (vector, subspace), map-side explode.

    Measured NOT to want spread_small_scan (r14): parallelizing the
    small cached frame to 32 partitions cost more in per-task overhead
    across the many downstream Lloyd/encode stages than the serial map
    cost (pq_adc_topk 2.7-3.0 s unspread vs 3.8-4.5 spread)."""
    return df.select(
        F.col(id_col),
        as_double(F.col(vec_col)).alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("m"),
    ).where(F.col("v").isNotNull()).select(  # corrupt vectors never encode

        id_col,
        "m",
        F.slice(F.col("v"), F.col("m") * subdim + 1, subdim).alias("sub"),
    )


def save_codebook(codebook: DataFrame, path: str) -> None:
    """Persist a trained codebook as a single parquet file — an exported
    model artifact (O(m·k) rows), written once by the training job and
    broadcast by every serving query thereafter."""
    codebook.coalesce(1).write.mode("overwrite").parquet(path)


def load_codebook(spark: SparkSession, path: str) -> DataFrame:
    """Read a persisted codebook.  Raises if absent — serving callers that
    want train-on-miss should use :func:`train_or_load_codebook`."""
    return spark.read.parquet(path).select("m", "code", "centroid")


def train_or_load_codebook(
    df: DataFrame,
    path: str,
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serving-side codebook access: load the persisted parquet if
    present, else train once (the ~2·iters driver-scheduled Lloyd jobs)
    and persist.  Splits the one-time training cost out of the serving
    path: a warm serving query is scan → broadcast codebook → ADC, one
    job.  Training is deterministic (9-dp rounded means, md5 seeding),
    so the round-tripped codebook — and every ADC result derived from it
    — is bit-identical to the train-inline path."""
    spark = df.sparkSession
    try:
        cb = load_codebook(spark, path)
        if cb.head(1):  # zero-row artifact = aborted write: retrain
            return cb
    except Exception as e:
        # Retrain ONLY on artifact-absent; a corrupt-but-present dir or a
        # transient storage error must raise, not silently retrain.
        if not is_missing_artifact(e):
            raise
    cb = train_codebook(
        df, m=m, k=k, subdim=subdim, iters=iters, id_col=id_col, vec_col=vec_col
    )
    save_codebook(cb, path)
    return load_codebook(spark, path)


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    nlist: int = 8,
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build and persist the full IVFPQ index — the FAISS
    index-on-disk shape rendered as parquet directories:

    * ``codebook/``  — trained PQ codebooks (O(m·k) rows);
    * ``centroids/`` — IVF coarse centroids (O(nlist) rows);
    * ``codes/``     — the corpus encoded to PQ codes (O(n·m) rows,
      the 32×-compressed index payload);
    * ``assign/``    — per-vector coarse-list assignment (O(n) rows).

    Build cost is the training + encode jobs paid ONCE; serving
    (:func:`load_ivfpq_index` + the ADC pipeline) is then scan-free of
    the raw float vectors except for the probe set.
    """
    from cryptocurrency_data_pipeline_spark.operators import similarity
    from cryptocurrency_data_pipeline_spark.operators.similarity import cosine

    if df.isEmpty():
        # Fail at BUILD time with the real cause: writing zero-row
        # artifacts would trip the serve path's aborted-build fail-fast
        # later with a misleading message (FAISS likewise refuses to
        # train on zero points).  Callers with a may-be-empty corpus
        # guard before building.
        raise ValueError(
            "cannot build an IVFPQ index over an empty corpus — "
            "nothing to train codebooks or coarse centroids on"
        )
    sub = _subvectors(df, m, subdim, id_col, vec_col)
    cb = train_codebook(
        df, m=m, k=k, subdim=subdim, iters=iters, id_col=id_col,
        vec_col=vec_col, sub=sub,
    )
    save_codebook(cb, f"{path}/codebook")
    cb = load_codebook(df.sparkSession, f"{path}/codebook")
    codes = pq_encode(df, cb, m=m, subdim=subdim, id_col=id_col,
                      vec_col=vec_col, sub=sub)
    codes.write.mode("overwrite").parquet(f"{path}/codes")

    cents = similarity.ivf_centroids(df, nlist=nlist, id_col=id_col, vec_col=vec_col)
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    cents = df.sparkSession.read.parquet(f"{path}/centroids")
    # Project as_double once per row BEFORE the per-centroid cosine (the
    # unrolled dot references its operands 2·dim times — an inline
    # as_double would copy its interpreted forall() per element).
    simr = F.round(cosine(F.col("__vd"), F.col("centroid")), 9)
    assign = (
        df.select(id_col, as_double(F.col(vec_col)).alias("__vd"))
        .crossJoin(F.broadcast(cents))
        .select(id_col, "centroid_id", simr.alias("simr"))
        .groupBy(id_col)
        .agg(
            F.max_by(
                "centroid_id", F.struct(F.col("simr"), -F.col("centroid_id"))
            ).alias("centroid_id")
        )
    )
    assign.write.mode("overwrite").parquet(f"{path}/assign")
    df.sparkSession.createDataFrame(
        [(nlist, m, k, subdim)], "nlist int, m int, k int, subdim int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


class IvfPqIndex:
    """Loaded IVFPQ index artifacts (parquet-backed frames + the build
    params the serve path must agree on)."""

    def __init__(self, codebook, centroids, codes, assign, subdim: int):
        self.codebook, self.centroids = codebook, centroids
        self.codes, self.assign = codes, assign
        self.subdim = subdim


def load_ivfpq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    """Open a persisted IVFPQ index.  Raises if any component is absent
    or zero-row (the aborted-write signature — an empty params or
    codebook artifact means the build never finished and the index must
    be rebuilt, not served)."""
    params_rows = spark.read.parquet(f"{path}/params").head(1)
    if not params_rows:
        raise ValueError(
            f"partial IVFPQ index at {path!r}: params artifact is empty "
            f"(aborted build) — rebuild with build_ivfpq_index"
        )
    idx = IvfPqIndex(
        load_codebook(spark, f"{path}/codebook"),
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/codes"),
        spark.read.parquet(f"{path}/assign"),
        subdim=int(params_rows[0].subdim),
    )
    # Force reads: a corrupt/partial component must raise here, not serve.
    if not idx.codebook.head(1) or not idx.centroids.head(1):
        raise ValueError(
            f"partial IVFPQ index at {path!r}: empty codebook/centroids "
            f"artifact (aborted build) — rebuild with build_ivfpq_index"
        )
    return idx


def ivfpq_search(
    index: IvfPqIndex,
    probes: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Serve top-k from a loaded IVFPQ index: probe-to-centroid cosine
    picks ``nprobe`` coarse lists, candidates come from the persisted
    assignment (an equi-join, never a pair space), ADC scores them from
    the persisted codes — raw float vectors are touched ONLY for the
    probe set."""
    from cryptocurrency_data_pipeline_spark.operators.similarity import cosine

    simr = F.round(cosine(F.col("__vd"), F.col("centroid")), 9)
    w = Window.partitionBy("query_id").orderBy(F.col("simr").desc(), "centroid_id")
    probe_lists = (
        probes.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("__vd"),
        )
        .crossJoin(F.broadcast(index.centroids))
        .select("query_id", "centroid_id", simr.alias("simr"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "centroid_id")
    )
    cand = index.assign.join(probe_lists, "centroid_id").select("query_id", id_col)
    lut = adc_lut(
        probes, index.codebook, subdim=index.subdim, id_col=id_col, vec_col=vec_col
    )
    scored = (
        index.codes.join(cand, id_col)
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("lut_dist"), 6).alias("adc_dist"))
    )
    wk = Window.partitionBy("query_id").orderBy("adc_dist", id_col)
    return (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "adc_dist",
            F.col("rn").cast("int").alias("rank"),
        )
    )


def train_codebook(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    subdim: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sub: DataFrame | None = None,
) -> DataFrame:
    """Train PQ codebooks: per-subspace Lloyd's k-means, fully
    deterministic and engine-replayable.

    - Seeds: the k vectors ranked first by ``(md5(id), id)`` — the same
      deterministic seeding as ``clustering.kmeans_fit``; seed m's
      centroid is that vector's m-th subvector, so all M subspaces
      share one seed scan.
    - Each round: argmin assignment (ties break ``(dist, code)``), then
      per-(m, code, dim) means ROUNDED TO 9 DP — the rounding absorbs
      float summation-order differences so the centroids, and therefore
      the trained codebook, are bit-identical on any engine (the
      property every PQ oracle below leans on).  Empty clusters keep
      their previous centroid.
    - Driver state: O(m·k·subdim) scalar literals per round (the
      ``clustering.py`` contract), never data rows.

    Returns ``(m, code, centroid array<double>)``.  Pass a cached
    ``sub`` frame to share the subvector explode across rounds and with
    the subsequent encode (the flagship query does).
    """
    spark = df.sparkSession
    seed_rows = (
        df.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
        # corrupt vectors cannot seed a codebook centroid (sfnull class)
        .where(F.col("v").isNotNull())
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    # codebook[m][code] -> centroid list
    book: dict[int, dict[int, list[float]]] = {
        mi: {
            j: list(seed_rows[j].v[mi * subdim : (mi + 1) * subdim])
            for j in range(len(seed_rows))
        }
        for mi in range(m)
    }

    def as_frame(b) -> DataFrame:
        rows = [
            (mi, j, b[mi][j]) for mi in sorted(b) for j in sorted(b[mi])
        ]
        return codebook_frame(spark, rows)

    if not seed_rows:
        # Empty corpus: no seeds, no rounds — the empty codebook frame,
        # exactly what the join-path loop produced via empty joins.
        return as_frame(book)
    if sub is None:
        sub = _subvectors(df, m, subdim, id_col, vec_col)
    # Lloyd rounds on the Arrow kernel (r15, the r14 verdict's ask #3):
    # the per-round broadcast-codebook join evaluated K codegen'd
    # distance expressions per (row, subspace) behind a fresh VALUES
    # broadcast and a min_by exchange EVERY round; the kernel is one
    # map-only ArrowEvalPython over (m, sub) with the argmin done in
    # numpy — same arithmetic, same ties (see _make_code_assign_udf).
    # The means aggregate (and its collect) is unchanged: 9-dp rounding
    # keeps centroids engine-exact.
    for _ in range(iters):
        assign = _make_code_assign_udf(book, subdim)
        # STAGE the UDF in its own projection BELOW the posexplode: in a
        # single select, ExtractPythonUDFs placed the ArrowEvalPython
        # ABOVE the Generate, running the kernel once per (row, dim) —
        # 8x the rows across the Python boundary (r15 profile).
        assigned = sub.select(
            "m", assign(F.col("m"), F.col("sub")).alias("code"), "sub"
        )
        means = (
            assigned.select("m", "code", F.posexplode("sub").alias("i", "x"))
            .groupBy("m", "code", "i")
            .agg(F.round(F.avg("x"), 9).alias("c"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            upd.setdefault((r.m, r.code), {})[r.i] = r.c
        for (mi, j), dims in upd.items():
            book[mi][j] = [dims[i] for i in sorted(dims)]
    return as_frame(book)
