"""RRF fusion: rank-only combination of heterogeneous retrieval lists."""

from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.retrieval import (
    ranked_topn,
    rrf_fuse,
)


def _ranked(spark, rows, rank_name):
    df = spark.createDataFrame(rows, "doc_id long, s double")
    return ranked_topn(df, "s", "doc_id", 10, rank_name)


def test_ranked_topn_orders_and_truncates(spark):
    df = spark.createDataFrame(
        [(i, float(i % 5)) for i in range(20)], "doc_id long, s double"
    )
    out = ranked_topn(df, "s", "doc_id", 3, "r")
    assert [(r.doc_id, r.r) for r in out.orderBy("r").collect()] == [
        (4, 1), (9, 2), (14, 3)  # score 4.0 desc, doc_id asc tiebreak
    ]


def test_rrf_prefers_doc_present_in_both_lists(spark):
    lex = _ranked(spark, [(1, 3.0), (2, 2.0), (3, 1.0)], "r_lex")
    dense = _ranked(spark, [(2, 9.0), (4, 8.0)], "r_dense")
    out = {
        r.doc_id: (r.r_lex, r.r_dense, r.rrf_score)
        for r in rrf_fuse([lex, dense], "doc_id", ["r_lex", "r_dense"]).collect()
    }
    # doc 2: rank 2 lexical + rank 1 dense -> two reciprocal terms
    assert out[2][0] == 2 and out[2][1] == 1
    assert out[2][2] > out[1][2]  # fused beats single-list rank-1
    # absent-list sentinel is 0, never null
    assert out[1][1] == 0 and out[4][0] == 0
    assert abs(out[2][2] - round(1 / 62 + 1 / 61, 6)) < 1e-9


def test_rrf_score_is_rank_only(spark):
    # Scaling one list's scores by 1000x must not change the fusion.
    lex_a = _ranked(spark, [(1, 3.0), (2, 2.0)], "r_lex")
    lex_b = _ranked(spark, [(1, 3000.0), (2, 2000.0)], "r_lex")
    dense = _ranked(spark, [(2, 0.9), (1, 0.8)], "r_dense")
    a = sorted(map(tuple, rrf_fuse([lex_a, dense], "doc_id", ["r_lex", "r_dense"]).collect()))
    b = sorted(map(tuple, rrf_fuse([lex_b, dense], "doc_id", ["r_lex", "r_dense"]).collect()))
    assert a == b


def test_topn_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, s double"
    )
    plan = (
        ranked_topn(df, "s", "doc_id", 5, "r")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
