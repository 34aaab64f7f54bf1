"""DSIR importance weighting: target docs outscore off-target docs."""

from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.dsir import (
    hashed_feature_bucket,
    importance_logweights,
)


def test_bucket_range_and_determinism(spark):
    df = spark.createDataFrame(
        [(w,) for w in ["alpha", "beta", "gamma", "alpha"]], "tok string"
    )
    rows = df.select(hashed_feature_bucket("tok", 64).alias("b")).collect()
    assert all(0 <= r.b < 64 for r in rows)
    assert rows[0].b == rows[3].b  # same token -> same bucket


def test_target_docs_score_higher(spark):
    # Target domain speaks 'spark'; off-target speaks 'duck'.  A held-out
    # doc from each vocabulary must be pulled toward its own domain.
    rows = [
        (1, "spark shuffle partition spark executor", True),
        (2, "spark codegen spark broadcast shuffle", True),
        (3, "duck pond feather duck quack", False),
        (4, "duck quack pond feather waddle", False),
        (5, "spark shuffle broadcast executor codegen", False),  # target-like
        (6, "duck feather quack waddle pond", False),            # off-target
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    w = {
        r.doc_id: r.log_weight
        for r in importance_logweights(df, F.col("is_t")).collect()
    }
    assert w[5] > w[6]
    assert w[1] > w[3] and w[2] > w[4]


def test_weight_is_deterministic(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} tok{i % 5}", i % 4 == 0) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    a = sorted(importance_logweights(df, F.col("is_t")).collect())
    b = sorted(importance_logweights(df, F.col("is_t")).collect())
    assert a == b


def test_every_doc_gets_a_weight(spark):
    rows = [(i, "only shared words here", i == 0) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = importance_logweights(df, F.col("is_t"))
    assert out.count() == 5
    assert out.filter(F.col("log_weight").isNull()).count() == 0


def test_corpus_is_tokenized_exactly_once(spark):
    # tf feeds both the distribution sketch and the scoring; the persist
    # must collapse them onto one exchange + cache reuse, not four
    # re-tokenizations of the corpus.
    rows = [(i, f"tok{i % 7} tok{i % 3}", i % 4 == 0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = importance_logweights(df, F.col("is_t"))
    out.count()  # materialize so the cache is live in the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    # Both consumers (distribution sketch via the broadcast ratio side,
    # final scoring) must read the CACHE, not re-derive the subtree.  The
    # tf exchange still prints once per InMemoryRelation description, but
    # it executes only on cache fill — cache scans are the signal.
    assert plan.count("InMemoryTableScan") == 2


def test_zero_token_docs_get_weight_zero_not_dropped(spark):
    """Blank/null-text docs keep a log_weight row (the empty sum = 0);
    a plain explode would silently erase them from the output, and their
    phantom null-bucket row must not perturb the bucket distributions."""
    from cryptocurrency_data_pipeline_spark.operators import dsir
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "alpha beta gamma", True), (2, "alpha beta delta", False),
         (3, "", False), (4, None, False)],
        "doc_id long, text string, is_tgt boolean",
    )
    out = {
        r.doc_id: r.log_weight
        for r in dsir.importance_logweights(df, F.col("is_tgt")).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[3] == 0.0 and out[4] == 0.0
    # Distributions unchanged by the phantom rows: weights for docs 1/2
    # equal those computed on the corpus without the blank docs.
    base = {
        r.doc_id: r.log_weight
        for r in dsir.importance_logweights(
            df.filter(F.col("doc_id") < 3), F.col("is_tgt")
        ).collect()
    }
    assert out[1] == base[1] and out[2] == base[2]
