"""Connected-components operator: correctness on shapes label propagation
must handle — transitive chains, separate components, duplicate/reversed
edges, and a path long enough to need several propagation rounds."""

from cryptocurrency_data_pipeline_spark.operators.graph import connected_components


def cc(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = connected_components(df)
    return {r.node: r.cluster_id for r in out.collect()}


def test_chain_and_island(spark):
    got = cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_duplicate_and_reversed_edges(spark):
    got = cc(spark, [(5, 4), (4, 5), (4, 5), (6, 5)])
    assert got == {4: 4, 5: 4, 6: 4}


def test_long_path_converges(spark):
    # 12-node path with ids descending against the propagation direction:
    # worst case for min-label — needs multiple rounds, not one.
    n = 12
    edges = [(i + 1, i) for i in range(1, n)]
    got = cc(spark, edges)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_self_loop_singleton(spark):
    got = cc(spark, [(7, 7), (1, 2)])
    assert got == {7: 7, 1: 1, 2: 1}


def test_checkpoint_blocks_released_eagerly(spark):
    # Iterative localCheckpoints must not accumulate in the block manager:
    # each superseded round's blocks are unpersisted as soon as the next
    # generation materializes, so a multi-round run leaves at most ONE new
    # pinned RDD (the final labels) behind — not one per round.
    from cryptocurrency_data_pipeline_spark.operators.graph import (
        _persistent_rdd_ids,
    )

    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    n = 12  # long path → several propagation rounds, several checkpoints
    df = spark.createDataFrame([(i + 1, i) for i in range(1, n)], "src long, dst long")
    out = connected_components(df)
    assert {r.node: r.cluster_id for r in out.collect()} == {
        i: 1 for i in range(1, n + 1)
    }
    leaked = _persistent_rdd_ids(sc) - before
    assert len(leaked) <= 1, f"checkpoint blocks leaked: {leaked}"


def test_pagerank_triangle_uniform_and_hub_dominates(spark):
    from cryptocurrency_data_pipeline_spark.operators.graph import pagerank

    # Symmetric triangle: all nodes equivalent -> uniform 1/3 at any iter.
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    r = {x.node: x.rank for x in pagerank(tri, iters=4).collect()}
    for v in r.values():
        assert abs(v - 1.0 / 3) < 1e-12

    # Star: the hub out-ranks every leaf.
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = {x.node: x.rank for x in pagerank(star, iters=3).collect()}
    assert all(r[0] > r[i] for i in range(1, 6))
    # Ranks of a stochastic process stay a probability distribution.
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_release_checkpoints_explicit_and_context_guarded(spark):
    from cryptocurrency_data_pipeline_spark.operators import graph as g

    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    out = g.connected_components(edges)
    assert out.count() == 4
    sc = spark.sparkContext
    assert g._live_handles(sc), "final generation should be retained"
    g.release_checkpoints(spark)
    assert not g._live_handles(sc)
    # repeated release is a no-op, and the registry is keyed by THIS
    # context's identity (a fake context id never aliases the real one)
    g.release_checkpoints(spark)

    class FakeSC:  # different identity -> its own empty slot
        pass

    assert g._live_handles(FakeSC()) == []
    assert not g._live_handles(sc)


def test_held_result_survives_next_run_until_own_release(spark):
    # The caller-held handle contract: a result frame must stay fully
    # queryable across LATER connected_components invocations (the old
    # invalidation-on-next-call semantics made it unrecoverable), and die
    # only at its own release.
    from cryptocurrency_data_pipeline_spark.operators import graph as g

    first_edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    held, handle = g.connected_components(first_edges, with_handle=True)
    assert not handle.released

    # Two more runs on the same context — held must be untouched.
    for lo in (10, 20):
        other = spark.createDataFrame([(lo, lo + 1)], "src long, dst long")
        g.connected_components(other)
    assert {r.node: r.cluster_id for r in held.collect()} == {1: 1, 2: 1, 3: 1}

    handle.release()
    assert handle.released
    handle.release()  # idempotent
    # The handle's blocks are gone from the block manager.
    from cryptocurrency_data_pipeline_spark.operators.graph import (
        _persistent_rdd_ids,
    )

    assert handle._rid not in _persistent_rdd_ids(spark.sparkContext)
    g.release_checkpoints(spark)  # clean up the two unheld runs


def test_triangle_stats_known_graph(spark):
    from cryptocurrency_data_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    # K4 (4 triangles) + a pendant edge + a duplicate/reversed edge +
    # a self-loop: canonicalization must neutralize the junk.
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(3, 4), (1, 0), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_stats(df).collect()[0]
    assert row.n_nodes == 5 and row.n_edges == 7
    assert row.n_triangles == 4
    # wedges: degs are [3,3,3,4,1] -> 3+3+3+6+0 = 15
    assert row.n_wedges == 15
    assert row.global_clustering_coeff == round(12 / 15, 6)


def test_triangle_stats_triangle_free(spark):
    from cryptocurrency_data_pipeline_spark.operators.graph import (
        triangle_stats,
    )

    # A star has wedges but no triangles (and the hub's orientation
    # pushes enumeration to the leaves — the skew story).
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src long, dst long"
    )
    row = triangle_stats(df).collect()[0]
    assert row.n_triangles == 0 and row.n_wedges == 21
    assert row.global_clustering_coeff == 0.0


def test_connected_components_string_node_ids(spark):
    """Node ids need not be numeric: the convergence fingerprint hashes
    labels (a plain SUM(label) crashes with CAST_INVALID_INPUT on string
    ids under ANSI).  Two components over sha-like string ids."""
    df = spark.createDataFrame(
        [("aa", "bb"), ("bb", "cc"), ("xx", "yy")], "src string, dst string"
    )
    out = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert out == {"aa": "aa", "bb": "aa", "cc": "aa", "xx": "xx", "yy": "xx"}
