"""CSV ingest + ORC round-trip: schema enforcement, pruning, pushdown."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cryptocurrency_data_pipeline_spark.sources.formats import (
    read_csv_enforced,
    read_orc,
    write_csv,
    write_orc,
)
from cryptocurrency_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

CSV_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def test_csv_corrupt_lines_route_to_dlq(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,0.5\n"
        "not_a_long,bob,0.7\n"       # bad id -> DLQ
        "3,carol,not_a_double\n"     # bad score -> DLQ
        "4,dave,1.25\n"
    )
    valid, dlq = read_csv_enforced(spark, str(p), CSV_SCHEMA)
    assert sorted(r.id for r in valid.collect()) == [1, 4]
    bad = dlq.collect()
    assert len(bad) == 2
    assert all(r.error_reason == "csv_schema_mismatch" for r in bad)
    assert any("not_a_long" in r.raw for r in bad)


def test_csv_round_trip_preserves_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", -3.25)], schema=CSV_SCHEMA
    )
    out = str(tmp_path / "out_csv")
    write_csv(df, out)
    back, dlq = read_csv_enforced(spark, out, CSV_SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert dlq.count() == 0


def test_orc_round_trip_matches_source(spark, tmp_path):
    src = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    out = str(tmp_path / "orders_orc")
    write_orc(src, out)
    back = read_orc(spark, out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_partition_pruning_and_pushdown(spark, tmp_path):
    src = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = str(tmp_path / "orders_orc_part")
    write_orc(src, out, partition_by=["o_orderpriority"])
    # one subdir per priority value
    parts = [d for d in os.listdir(out) if d.startswith("o_orderpriority=")]
    assert len(parts) == src.select("o_orderpriority").distinct().count()

    scan = read_orc(spark, out).filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 1000.0)
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes directories; value predicate reaches the scan
    assert "o_orderpriority" in plan.split("PartitionFilters")[1].split("]")[0]
    assert "o_totalprice" in plan.split("PushedFilters")[1].split("]")[0]
    expect = src.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 1000.0)
    ).count()
    assert scan.count() == expect
