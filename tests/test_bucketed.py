"""Bucketed co-located join: the physical plan must contain no shuffle
(Exchange) on either join side."""

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.sources import bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.range(0, 10_000).select(
        F.col("id").alias("orderkey"), (F.col("id") % 100).alias("qty")
    )
    orders = spark.range(0, 2_500).select(
        F.col("id").alias("orderkey"), (F.col("id") % 7).alias("status")
    )
    bucketed.write_bucketed(li, "li_b", ["orderkey"], n_buckets=8, sort_cols=["orderkey"])
    bucketed.write_bucketed(orders, "orders_b", ["orderkey"], n_buckets=8, sort_cols=["orderkey"])

    # Disable auto-broadcast: at real scale neither fact side broadcasts —
    # the point is the shuffle-free sort-merge join over aligned buckets.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed.bucketed_join(spark, "li_b", "orders_b", ["orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 2_500

        # Contrast: the same join on plain parquet shuffles both sides.
        li.write.mode("overwrite").parquet(str(tmp_path / "li_p"))
        orders.write.mode("overwrite").parquet(str(tmp_path / "o_p"))
        plain = spark.read.parquet(str(tmp_path / "li_p")).join(
            spark.read.parquet(str(tmp_path / "o_p")), ["orderkey"]
        )
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
