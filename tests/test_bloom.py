"""Bloom-filter semi-join pruning (operators/bloom.py): value parity with
the exact semi-join, bounded false-positive rate, shuffle-free probe."""

import pyspark.sql.functions as F
import pytest

from cryptocurrency_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)
from cryptocurrency_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
M_BITS = 1 << 14
K = 5


def test_matches_exact_semi_join(spark):
    orders = load_table(spark, SF, "orders")
    small = (
        load_table(spark, SF, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    exact = orders.join(
        small.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left_semi"
    )
    got = bloom_semi_join(orders, small, "o_custkey", "c_custkey", M_BITS, K)
    assert sorted(r.o_orderkey for r in got.collect()) == sorted(
        r.o_orderkey for r in exact.collect()
    )


def test_no_false_negatives_and_fp_rate_bounded(spark):
    build = spark.range(0, 1000).select(F.col("id").alias("key"))
    bloom = bloom_build(build, "key", M_BITS, K)

    # Every build key must probe positive (no false negatives).
    hits = bloom_prune(build, "key", bloom, M_BITS, K)
    assert hits.count() == 1000

    # Disjoint probe keys: n*k/m = 0.3 load → theoretical FP ~0.2%;
    # assert a loose 2% ceiling so the bound is stable, not flaky.
    probe = spark.range(100_000, 110_000).select(F.col("id").alias("key"))
    fp = bloom_prune(probe, "key", bloom, M_BITS, K).count()
    assert fp / 10_000 < 0.02


def test_probe_side_has_no_shuffle(spark):
    """The prune must happen in the probe scan stage: the only exchange in
    the plan is the broadcast of the one-row bitset."""
    orders = load_table(spark, SF, "orders")
    small = load_table(spark, SF, "customer").select("c_custkey")
    bloom = bloom_build(small, "c_custkey", M_BITS, K)
    plan = (
        bloom_prune(orders, "o_custkey", bloom, M_BITS, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    # Allowed exchanges: the bitset build's own (word-index hash + single
    # partition gather — O(m) sketch words, not data) and the broadcast of
    # the one-row array.  Forbidden: any exchange keyed on the probe
    # column — that would mean the big table is being shuffled, which is
    # exactly what the bloom prune exists to avoid.
    assert "hashpartitioning(o_custkey" not in plan


def test_deterministic_bitset(spark):
    build = spark.range(0, 500).select(F.col("id").alias("key"))
    w1 = bloom_build(build, "key", M_BITS, K).collect()[0].bloom_words
    w2 = bloom_build(build, "key", M_BITS, K).collect()[0].bloom_words
    assert w1 == w2
    assert len(w1) == M_BITS // 64
    assert any(w != 0 for w in w1)


def test_bloom_semi_join_rejects_key_dtype_mismatch(spark):
    """xxhash64 is type-sensitive: hashing an int build side against a
    long probe side produces false negatives — rows silently missing
    from an 'exact' semi-join.  The composition refuses instead."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import bloom

    big = spark.range(100).selectExpr("id AS k")                 # long
    small = spark.range(10).selectExpr("CAST(id AS INT) AS k")   # int
    with pytest.raises(ValueError, match="dtype mismatch"):
        bloom.bloom_semi_join(big, small, "k")
    # Aligned types: exact semi-join semantics hold.
    got = bloom.bloom_semi_join(big, small.selectExpr("CAST(k AS LONG) AS k"), "k")
    assert sorted(r.k for r in got.collect()) == list(range(10))


def test_bloom_semi_join_missing_key_is_a_clear_error(spark):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import bloom

    df = spark.range(5).selectExpr("id AS k")
    with pytest.raises(ValueError, match="key column missing: 'kk'"):
        bloom.bloom_semi_join(df, df, "kk")
