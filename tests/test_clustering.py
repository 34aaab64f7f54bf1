"""k-means (operators/clustering.py): determinism, assignment totality,
empty-cluster center retention, and the scale-shape of each iteration.

The numeric end-to-end answer is oracle-checked (``kmeans_embedding_clusters``
vs an unrolled-CTE DuckDB replay); these tests pin the operator contract.
"""

from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)
from cryptocurrency_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_assignment_total_and_deterministic(spark):
    corpus = load_table(spark, SF, "embeddings")
    n = corpus.count()

    centers_a, assigned_a = kmeans_fit(corpus, k=4, iters=2)
    centers_b, assigned_b = kmeans_fit(corpus, k=4, iters=2)

    # Every input vector gets exactly one cluster, ids from the seed set.
    assert assigned_a.count() == n
    ids = {cid for cid, _ in centers_a}
    got = {
        r.cluster_id
        for r in assigned_a.select("cluster_id").distinct().collect()
    }
    assert got <= ids

    # Bit-for-bit deterministic across fits (md5 seeds, fixed iterations).
    assert centers_a == centers_b
    rows_a = sorted(
        (r.vec_id, r.cluster_id)
        for r in assigned_a.select("vec_id", "cluster_id").collect()
    )
    rows_b = sorted(
        (r.vec_id, r.cluster_id)
        for r in assigned_b.select("vec_id", "cluster_id").collect()
    )
    assert rows_a == rows_b


def test_kmeans_empty_cluster_keeps_previous_center(spark):
    # Two identical far-apart groups, k=3: at least one seed ends up owning
    # nothing after the first reassignment; its center must carry over
    # unchanged instead of going NaN/absent.
    rows = [(i, [0.0, 0.0]) for i in range(5)] + [
        (i, [100.0, 100.0]) for i in range(5, 10)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centers, assigned = kmeans_fit(corpus, k=3, iters=3)
    assert len(centers) == 3
    assert all(
        all(x == x for x in vec) for _, vec in centers
    )  # no NaN centers
    # Non-empty clusters converge exactly to the two true means; any
    # carried-over empty-cluster center must equal one of the seeds, which
    # here are corpus points, so every center is one of the two means.
    means = {tuple(round(x, 6) for x in vec) for _, vec in centers}
    assert means == {(0.0, 0.0), (100.0, 100.0)}
    assert assigned.count() == 10


def test_kmeans_assignment_is_map_side_only(spark):
    # Assignment against literal centers must not shuffle the corpus: a
    # single scan, no Exchange in the plan.
    corpus = load_table(spark, SF, "embeddings")
    assigned = assign_clusters(
        corpus, [(1, [0.0] * 64), (2, [1.0] * 64)]
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# r14: the literal/Arrow assignment seam (assign_clusters_auto dispatches to
# the numpy-matmul pandas UDF past LITERAL_CENTER_CAP centers, so the
# auto-scaled SemDeDup cluster count can grow past the folded-literal plan).
# ---------------------------------------------------------------------------

EDGE_ROWS = [
    (1, [1.0, 2.0]),            # well-formed
    (2, None),                  # NULL vector
    (3, [1.0, None]),           # NULL component -> as_double collapses
    (4, []),                    # empty
    (5, [0.0, 0.0]),            # zero vector (exactly on center 1)
    (6, [1.0]),                 # too short
    (7, [1.0, 2.0, 3.0]),       # too long
    (8, [float("nan"), 1.0]),   # NaN component: every distance NaN
    (9, [float("inf"), 1.0]),   # inf component: every distance inf
    (10, [3.0, 4.0]),           # well-formed, nearest center 3
]
EDGE_CENTERS = [(1, [0.0, 0.0]), (2, [1.0, 2.0]), (3, [5.0, 5.0])]


def _rows(df):
    def norm(v):
        # NaN != NaN, so compare on repr; None stays None
        return None if v is None else repr(v)

    return sorted(
        (r.vec_id, r.cluster_id, norm(r.sq_dist)) for r in df.collect()
    )


def test_arrow_assignment_matches_literal_on_edge_vectors(spark):
    """assign_clusters_arrow must replicate the literal path bit-for-bit:
    malformed vectors -> lowest cid + NULL sq_dist, NaN distances rank
    above +inf, ties to the lowest cid, well-formed rows exact (integer-
    valued components keep both summation orders exact)."""
    from cryptocurrency_data_pipeline_spark.operators.clustering import (
        assign_clusters,
        assign_clusters_arrow,
    )

    df = spark.createDataFrame(
        EDGE_ROWS, "vec_id long, embedding array<double>"
    )
    lit = _rows(assign_clusters(df, EDGE_CENTERS))
    arr = _rows(assign_clusters_arrow(df, EDGE_CENTERS))
    assert arr == lit
    # spot-pin the semantics themselves (guards against both paths being
    # wrong the same way)
    by_id = {i: (c, d) for i, c, d in arr}
    assert by_id[1] == (2, repr(0.0))        # exact hit on center 2
    assert by_id[2] == (1, None)             # NULL vector -> lowest cid
    assert by_id[6] == (1, None)             # wrong length -> lowest cid
    assert by_id[8][0] == 1 and by_id[8][1] == repr(float("nan"))
    assert by_id[9][0] == 1 and by_id[9][1] == repr(float("inf"))
    assert by_id[10] == (3, repr(5.0))       # (3-5)^2+(4-5)^2


def test_arrow_assignment_center_chunking_preserves_ties(spark):
    """Cross-chunk merge: ties keep the lower cid, NaN loses to a real
    +inf even when they land in different center chunks."""
    from cryptocurrency_data_pipeline_spark.operators.clustering import (
        _make_l2_assign_udf,
        assign_clusters,
        assign_clusters_arrow,
    )

    # 10 centers, chunk=3 -> 4 chunks; duplicate centers force exact ties
    centers = [(i, [float(i % 4), float(i % 4)]) for i in range(1, 11)]
    rows = [(i, [float(i % 5), float((i * 3) % 5)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    import cryptocurrency_data_pipeline_spark.operators.clustering as cl

    orig = cl._make_l2_assign_udf

    def chunked(cs, chunk=4096):
        return orig(cs, chunk=3)

    cl._make_l2_assign_udf = chunked
    try:
        arr = _rows(assign_clusters_arrow(df, centers))
    finally:
        cl._make_l2_assign_udf = orig
    lit = _rows(assign_clusters(df, centers))
    assert arr == lit


def test_assign_auto_dispatches_on_literal_cap(spark):
    """Default: the Arrow matmul at ANY center count (the r14 crossover
    measurement found the interpreted higher-order-function fold loses
    at every size — x1.6 at 8 centers, x13 at 250); an explicit
    literal_cap takes the fold-order-exact literal path.  Map-only
    either way, never row-wise Python."""
    from cryptocurrency_data_pipeline_spark.operators.clustering import (
        assign_clusters_auto,
    )

    corpus = load_table(spark, SF, "embeddings")
    small = [(i, [float(i)] * 64) for i in range(1, 4)]
    big = [(i, [float(i)] * 64) for i in range(1, 302)]

    plan_default = (
        assign_clusters_auto(corpus, small)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan_default
    assert "BatchEvalPython" not in plan_default  # never row-wise Python
    assert "Exchange" not in plan_default

    plan_literal = (
        assign_clusters_auto(corpus, small, literal_cap=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan_literal
    assert "Exchange" not in plan_literal

    plan_big = (
        assign_clusters_auto(corpus, big, literal_cap=256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan_big  # past the explicit cap: Arrow
    assert "Exchange" not in plan_big


def test_semantic_dedup_identical_across_the_dispatch_seam(spark):
    """The default (Arrow) and the forced-literal path (literal_cap
    raised via the module constant) must produce the same
    semantic_dedup answer on the corpus — the seam is an implementation
    dispatch, not a semantic one."""
    import cryptocurrency_data_pipeline_spark.operators.clustering as cl
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup,
    )

    emb = load_table(spark, SF, "embeddings")
    base = sorted(
        tuple(r) for r in semantic_dedup(emb, tau=0.45).collect()
    )
    orig = cl.LITERAL_CENTER_CAP
    cl.LITERAL_CENTER_CAP = 10**9  # force the folded-literal path
    try:
        forced = sorted(
            tuple(r) for r in semantic_dedup(emb, tau=0.45).collect()
        )
    finally:
        cl.LITERAL_CENTER_CAP = orig
    assert forced == base
