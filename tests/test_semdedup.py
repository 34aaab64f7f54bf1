"""SemDeDup: deterministic epsilon-ball pruning within coarse clusters."""

import pytest
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.semdedup import semantic_dedup
from cryptocurrency_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_identical_vectors_keep_lowest_id(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),   # exact dup of 1 -> dropped
        (3, [0.0, 1.0, 0.0]),   # orthogonal -> kept
        (4, [0.99, 0.01, 0.0]),  # near-dup of 1 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.is_kept for r in semantic_dedup(df, nlist=1, tau=0.9).collect()}
    assert out == {1: True, 2: False, 3: True, 4: False}


def test_below_threshold_pairs_survive(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, nlist=1, tau=0.5)
    assert all(r.is_kept for r in out.collect())


def test_dedup_is_deterministic_on_corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    kept1 = sorted(
        r.vec_id for r in semantic_dedup(emb, nlist=4, tau=0.45)
        .filter("is_kept").collect()
    )
    kept2 = sorted(
        r.vec_id for r in semantic_dedup(emb, nlist=4, tau=0.45)
        .filter("is_kept").collect()
    )
    assert kept1 == kept2
    assert 0 < len(kept1) <= emb.count()


def test_pair_space_is_equi_join_not_cartesian(spark):
    # The within-cluster self-join must be a plain equi-join on cluster_id
    # (AQE-skew-splittable), never a cartesian/nested-loop product.
    emb = load_table(spark, SF, "embeddings")
    plan = (
        semantic_dedup(emb, nlist=4, tau=0.45)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dropped_rows_have_a_kept_exemplar(spark):
    # Every dropped vector must actually be within tau of some KEPT
    # lower-id vector in its cluster, else the greedy rule mis-fired.
    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
            for i in range(1, 10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, nlist=1, tau=0.99).collect()
    kept = {r.vec_id for r in out if r.is_kept}
    # axis e_k appears 3x; only the lowest id of each axis group is kept
    assert kept == {1, 2, 3}


def test_assignment_computed_once_and_flag_join_is_slim(spark):
    emb = load_table(spark, SF, "embeddings")
    out = semantic_dedup(emb, nlist=4, tau=0.45)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one cache fill feeds all three consumers ("Scan parquet" still
    # prints inside each InMemoryRelation description, but executes only
    # on cache fill — cache scans are the signal)
    assert plan.count("InMemoryTableScan") == 3


def test_empty_corpus_yields_empty_result(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(empty, nlist=4, tau=0.5)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cluster_id", "is_kept"]


def test_single_row_is_kept(spark):
    one = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    assert [(r.vec_id, r.is_kept) for r in semantic_dedup(one, nlist=4, tau=0.5).collect()] == [(1, True)]


def test_incremental_dedup_against_existing_and_within_batch(spark):
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup_incremental,
    )

    existing = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (10, [1.0, 0.01]),   # dup of existing 1
            (11, [-1.0, 0.0]),   # novel (opposite direction)
            (12, [-1.0, 0.01]),  # dup of 11 within batch
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.dup_of_existing, r.dup_within_batch, r.is_kept)
        for r in semantic_dedup_incremental(
            existing, batch, nlist=1, tau=0.9
        ).collect()
    }
    assert out[10] == (True, False, False)
    assert out[11] == (False, False, True)
    assert out[12] == (False, True, False)


def test_incremental_existing_rows_never_flagged(spark):
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup_incremental,
    )

    existing = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 5)],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(10, [9.0, 9.0])], "vec_id long, embedding array<double>"
    )
    out = semantic_dedup_incremental(existing, batch, nlist=2, tau=0.99)
    # output contains batch ids only
    assert sorted(r.vec_id for r in out.collect()) == [10]


def test_auto_nlist_scales_linearly_with_corpus():
    """The pair space is n x cluster_size / 2, so cluster count must grow
    with the corpus: ceil(n/256), floor 8, UNCAPPED (r14) — any cap
    re-creates the r13-measured quadratic (x23 wall at x10 data) at the
    cap boundary; assignment dispatches off plan literals instead."""
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        auto_nlist,
    )

    assert auto_nlist(0) == 8          # empty corpus: floor
    assert auto_nlist(200) == 8        # sf0.01: unchanged vs the old pin
    assert auto_nlist(2_000) == 8      # sf0.1 bench point: unchanged
    assert auto_nlist(20_000) == 79    # the 10x slope point
    assert auto_nlist(256 * 256) == 256
    assert auto_nlist(256 * 256 + 1) == 257   # past the old cap: keeps growing
    assert auto_nlist(10_000_000) == 39_063   # linear all the way up
    assert auto_nlist(10_000_000, cap=256) == 256  # explicit pin still honored
    assert auto_nlist(2_000, target_rows=100) == 20


def test_auto_nlist_default_matches_explicit_at_small_n(spark):
    """At n <= 2048 complete vectors the auto default resolves to the old
    nlist=8 pin, so results are IDENTICAL — the invariant that keeps
    every existing scale-point oracle green after the default change.
    Incomplete (NULL-component) vectors must not count: they cannot
    seed a centroid on either engine."""
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup,
    )

    rows = [(i, [float(i % 7), 1.0]) for i in range(40)]
    rows.append((99, [None, 1.0]))  # incomplete: excluded from the count
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    auto = semantic_dedup(df, tau=0.9).orderBy("vec_id").collect()
    pinned = semantic_dedup(df, nlist=8, tau=0.9).orderBy("vec_id").collect()
    assert [tuple(r) for r in auto] == [tuple(r) for r in pinned]


def test_incremental_retrains_when_batch_outgrows_corpus(spark):
    """Auto mode (nlist=None) must re-seed the quantizer from the union
    when batch > existing — the retrain-when-doubled dispatch that keeps
    the batch x batch half linear (the r13 slope instrument read x12 on
    a 400-row corpus quantizing a 19,600-row batch).  Pinned
    behaviorally: a 1-vector corpus can seed at most ONE cluster, so
    without retraining every batch row lands in cluster 1; with the
    dispatch the union provides 8+ seeds and the batch spreads."""
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup_incremental,
    )

    existing = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        [(i, [float(i), float(-i)]) for i in range(1, 10)],
        "vec_id long, embedding array<double>",
    )

    pinned = semantic_dedup_incremental(
        existing, batch, tau=0.99, retrain_on_large_batch=False
    )
    assert {r.cluster_id for r in pinned.collect()} == {1}

    auto = semantic_dedup_incremental(existing, batch, tau=0.99).collect()
    assert sorted(r.vec_id for r in auto) == list(range(1, 10))  # batch only
    assert len({r.cluster_id for r in auto}) > 1  # union-seeded quantizer

    # an explicit nlist pins the existing-corpus quantizer regardless
    explicit = semantic_dedup_incremental(existing, batch, nlist=4, tau=0.99)
    assert {r.cluster_id for r in explicit.collect()} == {1}


def test_incremental_steady_state_unchanged_by_dispatch(spark):
    """batch <= existing: the dispatch must be a no-op — same quantizer,
    same answer as retrain_on_large_batch=False."""
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup_incremental,
    )

    existing = spark.createDataFrame(
        [(i, [float(i % 5), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(100 + i, [float(i % 5), 1.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    a = sorted(
        tuple(r)
        for r in semantic_dedup_incremental(existing, batch, tau=0.9).collect()
    )
    b = sorted(
        tuple(r)
        for r in semantic_dedup_incremental(
            existing, batch, tau=0.9, retrain_on_large_batch=False
        ).collect()
    )
    assert a == b
