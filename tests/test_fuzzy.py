"""Blocked fuzzy matching: q-gram candidates, levenshtein verify."""

from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.fuzzy import (
    fuzzy_self_pairs,
    qgrams,
)


def test_qgrams_basic_and_short_keys(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("aaaa",)], "s string")
    rows = df.select(qgrams("s", 3).alias("g")).collect()
    assert rows[0].g == ["abc", "bcd"]
    assert rows[1].g == []          # shorter than q -> no grams
    assert rows[2].g == ["aaa"]     # distinct collapses repeats


def test_fuzzy_pairs_find_close_names(spark):
    df = spark.createDataFrame(
        [("red anvil",), ("old anvil",), ("blue bolt",), ("red anvil",)],
        "name string",
    )
    out = fuzzy_self_pairs(df, "name", q=3, max_distance=2).collect()
    assert [(r.key_a, r.key_b, r.edit_distance) for r in out] == [
        ("old anvil", "red anvil", 2)
    ]


def test_no_shared_gram_means_no_pair(spark):
    # 'abc' vs 'xyz' are distance 3 apart AND share no gram: the blocking
    # contract says no candidate, regardless of the distance cap.
    df = spark.createDataFrame([("abc",), ("xyz",)], "name string")
    assert fuzzy_self_pairs(df, "name", q=3, max_distance=5).count() == 0


def test_stop_gram_pruning_drops_hot_gram_only_pairs(spark):
    # Every name shares the hot suffix ' anvil'; pruning grams seen in >2
    # keys removes those blocks, so only pairs sharing a rarer prefix
    # gram survive candidacy.
    df = spark.createDataFrame(
        [("red anvil",), ("ted anvil",), ("old anvil",), ("wed anvil",)],
        "name string",
    )
    unpruned = fuzzy_self_pairs(df, "name", q=3, max_distance=1)
    pruned = fuzzy_self_pairs(df, "name", q=3, max_distance=1, max_gram_df=2)
    assert unpruned.count() > pruned.count()
    # 'red'/'ted'/'wed' pairs share their 'ed ' gram (df=3 > 2) and the
    # anvil grams (df=4), so pruning leaves nothing.
    assert pruned.count() == 0


def test_candidate_join_is_equi_join(spark):
    df = spark.createDataFrame([(f"name {i}",) for i in range(50)], "name string")
    plan = (
        fuzzy_self_pairs(df, "name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gram_extraction_runs_once(spark):
    df = spark.createDataFrame([(f"name {i}",) for i in range(30)], "name string")
    out = fuzzy_self_pairs(df, "name")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both candidate sides read the cached gram frame
    assert plan.count("InMemoryTableScan") == 2


def test_flagship_df_cap_prunes_but_covers_every_key(spark):
    # The fuzzy_part_name_pairs query runs with max_gram_df=12 — assert on
    # the real corpus that (a) the cap actually prunes grams (the hottest
    # part-name grams exceed it) and (b) every distinct key still keeps at
    # least one un-pruned gram, so the recall bound survives the pruning.
    from cryptocurrency_data_pipeline_spark.sources.tables import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part")
    keys = part.select(F.col("p_name").alias("k")).distinct()
    grams = keys.select("k", F.explode(qgrams(F.col("k"), 3)).alias("g"))
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("d"))
    n_pruned = df_counts.filter(F.col("d") > 12).count()
    assert n_pruned > 0, "cap never fires on this corpus — pick a lower cap"
    kept_keys = (
        grams.join(df_counts.filter(F.col("d") <= 12), "g")
        .select("k")
        .distinct()
        .count()
    )
    assert kept_keys == keys.count()
