"""GROUPED_MAP pandas mode: per-key EWMA + bounded-group guard."""

import pytest

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
