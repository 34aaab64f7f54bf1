"""Keyed pseudonymization: deterministic, null-safe, key-sensitive,
topology-preserving."""

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators.privacy import pseudonymize, token


def test_pseudonymize_deterministic_and_topology_preserving(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (1, "c"), (None, "d")], "uid int, payload string"
    )
    out = pseudonymize(df, ["uid"], key="k1")
    rows = out.collect()
    toks = {r.payload: r.uid for r in rows}
    # Same raw value → same token; different raw values → different tokens.
    assert toks["a"] == toks["c"] and toks["a"] != toks["b"]
    # Null stays null; other columns untouched; token is 64-char hex.
    assert toks["d"] is None
    assert len(toks["a"]) == 64 and int(toks["a"], 16) >= 0
    # Distinct cardinality preserved.
    assert out.select("uid").distinct().count() == df.select("uid").distinct().count()


def test_pseudonymize_key_rotation_unlinks(spark):
    df = spark.range(5).select(F.col("id").cast("int").alias("uid"))
    t1 = df.select(token("uid", "k1").alias("t")).collect()
    t2 = df.select(token("uid", "k2").alias("t")).collect()
    assert {r.t for r in t1}.isdisjoint({r.t for r in t2})


def test_pseudonymized_join_matches_raw_join(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    right = spark.createDataFrame([(1, 10), (1, 11), (3, 30)], "k int, n int")
    raw = left.join(right, "k").count()
    lt = pseudonymize(left, ["k"], "secret")
    rt = pseudonymize(right, ["k"], "secret")
    assert lt.join(rt, "k").count() == raw == 3


def test_laplace_noise_scale_and_determinism(spark):
    from cryptocurrency_data_pipeline_spark.operators.privacy import (
        laplace_noisy_counts,
    )

    df = spark.range(20000).select((F.col("id") % 500).alias("g"))
    rel = laplace_noisy_counts(df, ["g"], epsilon=0.5, seed="s")
    rows = rel.collect()
    assert len(rows) == 500
    noises = [abs(r.noisy_count - r.true_count) for r in rows]
    # Laplace(b=1/eps=2): E|noise| = b = 2; 500 samples → tight-ish.
    assert 1.4 < sum(noises) / len(noises) < 2.8
    assert max(noises) < 2 * 25  # |noise| <= b * ln(2^31) ≈ 43
    # Deterministic for the same seed; different for another seed.
    again = {r.g: r.noisy_count for r in laplace_noisy_counts(
        df, ["g"], epsilon=0.5, seed="s").collect()}
    other = {r.g: r.noisy_count for r in laplace_noisy_counts(
        df, ["g"], epsilon=0.5, seed="t").collect()}
    byg = {r.g: r.noisy_count for r in rows}
    assert again == byg and other != byg
    # Bigger epsilon → smaller noise.
    loose = laplace_noisy_counts(df, ["g"], epsilon=5.0, seed="s").collect()
    loose_mean = sum(abs(r.noisy_count - r.true_count) for r in loose) / len(loose)
    assert loose_mean < sum(noises) / len(noises) / 5


def test_laplace_noise_is_independent_across_colliding_key_shapes(spark):
    """(x, NULL) vs (NULL, x) and ('x|y','z') vs ('x','y|z') are DISTINCT
    groups and must draw DIFFERENT noise — a shared draw leaks the exact
    count difference, voiding the ε-DP guarantee."""
    from cryptocurrency_data_pipeline_spark.operators.privacy import (
        laplace_noisy_counts,
    )

    df = spark.createDataFrame(
        [("x", None), (None, "x"), ("x|y", "z"), ("x", "y|z")],
        "a string, b string",
    )
    rows = laplace_noisy_counts(df, ["a", "b"], epsilon=0.5, seed="s").collect()
    noise = [round(r.noisy_count - r.true_count, 4) for r in rows]
    assert len(set(noise)) == 4, noise
