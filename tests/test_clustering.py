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
