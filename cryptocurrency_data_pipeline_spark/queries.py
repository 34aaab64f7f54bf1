"""Named query registry — the engine's public query surface.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered next to
its DuckDB oracle SQL.  The driver harness compares both at sf=0.01
(row-count + schema + order-insensitive value-hash), so every computed
column is aliased identically on both sides, dates/timestamps are emitted
as strings, and float aggregates are rounded on both sides to absorb
summation-order differences.

Queries map 1:1 onto SURVEY.md §2 operators; reference citations are in
each docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import silver
from cryptocurrency_data_pipeline_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


t = load_table


# --------------------------------------------------------------------------
# Flagship: latest-record-per-key dedup + daily rollup (W1 + A2 + P6 + O1).
# The reference's two core moves composed: window dedup keep-latest
# (glue/data_transform_s3.py:133-136) then groupBy-count/agg
# (glue/data_aggregate_gold.py:50) over the `events` table.
# --------------------------------------------------------------------------

@query(
    "flagship_daily_rollup",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, CAST(ts AS DATE)
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(*) AS n_active_users,
           round(avg(value), 6) AS avg_value,
           round(sum(value), 4) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM ranked WHERE rn = 1
    GROUP BY day
    """,
)
def flagship_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    latest = silver.dedup_latest(ev, ["user_id", "day"], "ts", tiebreak=["event_id"])
    return latest.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n_active_users"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): the canonical multi-aggregate groupBy —
# exercises A2/A7 partial+final hash aggregation with map-side combine.
# --------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# --------------------------------------------------------------------------
# Star-schema revenue rollup: the join surface the reference's gold layer
# implies but never executes (SURVEY §2.3).  Dims are broadcast — at 100 TB
# the fact side streams through map-side hash joins with zero dim shuffle;
# only the lineitem⋈orders equi-join shuffles (AQE handles skew).
# --------------------------------------------------------------------------

@query(
    "star_revenue_by_nation",
    oracle="""
    SELECT r_name AS region_name, n_name AS nation_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def star_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    # Dim chain first (tiny), broadcast into orders, then one shuffle join
    # against the fact table.
    cust_dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    enriched_orders = orders.join(F.broadcast(cust_dim), orders.o_custkey == cust_dim.c_custkey)
    return (
        li.join(enriched_orders, li.l_orderkey == enriched_orders.o_orderkey)
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Top-k (O3): orderBy desc + limit → TakeOrderedAndProject (no global sort).
# Reference delegates top-100-by-market-cap to the API
# (glue/data_ingestion_s3.py:22); here it's a first-class operator.
# --------------------------------------------------------------------------

@query(
    "top_orders_by_value",
    oracle="""
    SELECT o_orderkey, c_name, round(o_totalprice, 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def top_orders_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select(
            "o_orderkey", "c_name", F.round("o_totalprice", 2).alias("total_price")
        )
    )
