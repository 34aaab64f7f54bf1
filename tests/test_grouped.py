"""GROUPED_MAP pandas mode: per-key EWMA + bounded-group guard."""

import pytest
import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators.grouped import ewma_last_by_key


def test_ewma_matches_hand_rolled_recursion(spark):
    rows = [(1, i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    rows += [(2, 0, 5.0)]
    df = spark.createDataFrame(rows, "k int, seq int, v double")
    got = {
        r.k: (r.n_rows, r.ewma)
        for r in ewma_last_by_key(df, "k", ["seq"], "v", alpha=0.5).collect()
    }
    acc = 10.0
    for v in (20.0, 30.0, 40.0):
        acc = 0.5 * v + 0.5 * acc
    assert got[1] == (4, acc)
    assert got[2] == (1, 5.0)  # single row: y_0 = x_0


def test_ewma_order_is_by_order_cols_not_input(spark):
    # Same data, shuffled input order -> same result (sort inside group).
    rows = [(1, 2, 30.0), (1, 0, 10.0), (1, 1, 20.0)]
    df = spark.createDataFrame(rows, "k int, seq int, v double").repartition(3)
    (r,) = ewma_last_by_key(df, "k", ["seq"], "v", alpha=0.5).collect()
    assert r.ewma == 0.5 * 30.0 + 0.5 * (0.5 * 20.0 + 0.5 * 10.0)


def test_bounded_group_guard_raises_loudly(spark):
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(10)], "k int, seq int, v double"
    )
    with pytest.raises(Exception, match="max_group_rows"):
        ewma_last_by_key(df, "k", ["seq"], "v", max_group_rows=5).collect()


def test_ewma_skips_null_values_instead_of_nan_poison(spark):
    """One NULL observation must not turn the whole key's ewma into NaN;
    an all-null key gets ewma NULL (n_rows still counts every row)."""
    from cryptocurrency_data_pipeline_spark.operators.grouped import (
        ewma_last_by_key,
    )

    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, None), ("k", 3, 20.0),
         ("allnull", 1, None)],
        "key string, ts long, value double",
    )
    out = {r.key: (r.n_rows, r.ewma) for r in
           ewma_last_by_key(df, "key", ["ts"], "value").collect()}
    n, e = out["k"]
    assert n == 3
    assert e == pytest.approx(0.25 * 20.0 + 0.75 * 10.0)
    assert out["allnull"] == (1, None)


def test_with_grouped_ranks_keeps_null_group_rows(spark):
    """NULL is a legal group key: those rows must come back ranked, not
    be silently dropped by a null-unsafe join."""
    from cryptocurrency_data_pipeline_spark.operators.ids import (
        with_grouped_ranks,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 3), (None, 4), ("b", 5)],
        "g string, v long",
    )
    out = with_grouped_ranks(df, ["g"], ["v"], rank_name="rk",
                             count_name="cnt")
    rows = out.collect()
    assert len(rows) == 5
    nulls = sorted((r.v, r.rk) for r in rows if r.g is None)
    assert nulls == [(3, 1), (4, 2)]
    assert all(r.cnt == 2 for r in rows if r.g is None)


def test_score_documents_sparse_weights_and_blank_docs(spark):
    """A real exported model stores only nonzero buckets: unmatched
    tokens score weight 0 (not dropped from n_tokens), and zero-token
    docs still appear with keep=false / score 0.5."""
    from cryptocurrency_data_pipeline_spark.operators import classifier

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    full = classifier.demo_weight_table(spark, 32)
    dense = {r.doc_id: r for r in
             classifier.score_documents(df, full, 32).collect()}
    # Sparse table: keep only positive-weight buckets.
    sparse = full.filter(F.col("weight") > 0)
    out = {r.doc_id: r for r in
           classifier.score_documents(df, sparse, 32).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_tokens == dense[1].n_tokens == 3  # tokens never dropped
    for d in (2, 3):
        assert out[d].n_tokens == 0 and out[d].weight_sum == 0
        assert out[d].score == 0.5 and out[d].keep is False
