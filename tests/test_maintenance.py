"""Compaction: many small files → few right-sized files, rows intact,
atomic swap (no leftover temp dir)."""

import glob
import os

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators.maintenance import compact_parquet
from cryptocurrency_data_pipeline_spark.sources.tables import load_table


def test_compact_shrinks_file_count_preserves_rows(spark, tmp_path):
    src = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_fragmented")
    src.repartition(64).write.parquet(path)  # simulate streaming small files
    assert len(glob.glob(f"{path}/part-*.parquet")) == 64
    before = src.count()
    checksum_before = (
        spark.read.parquet(path).agg(F.sum(F.hash("event_id"))).collect()[0][0]
    )

    n = compact_parquet(spark, path, target_file_bytes=1 << 20)

    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == n < 64
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    assert after_df.agg(F.sum(F.hash("event_id"))).collect()[0][0] == checksum_before
    # atomic swap left no temp dirs behind
    assert not [d for d in os.listdir(tmp_path) if "__compact_" in d]


def test_compact_with_sort_col_clusters(spark, tmp_path):
    src = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "li_fragmented")
    src.repartition(32).write.parquet(path)

    compact_parquet(spark, path, target_file_bytes=1 << 20, sort_col="l_shipdate")

    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        row = spark.read.parquet(f).agg(
            F.min("l_shipdate"), F.max("l_shipdate")
        ).collect()[0]
        spans.append((row[0], row[1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_zorder_key_matches_python_morton(spark):
    from cryptocurrency_data_pipeline_spark.operators.maintenance import zorder_key

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(rows, "su long, sv long")
    got = [
        r.z for r in df.select(zorder_key(["su", "sv"]).alias("z"))
        .orderBy("su", "sv").collect()
    ]
    want = [morton(x, y) for x, y in sorted(rows)]
    assert got == want
    # Locality: neighbors in both dims are closer in z than far points.
    assert abs(morton(10, 10) - morton(11, 10)) < abs(morton(10, 10) - morton(40000, 10))


def test_zorder_layout_is_range_partition_and_sorted(spark):
    from cryptocurrency_data_pipeline_spark.operators.maintenance import zorder_layout

    df = spark.range(1000).select(
        (F.col("id") % 100).alias("su"), (F.col("id") % 37).alias("sv")
    )
    out = zorder_layout(df, ["su", "sv"], n_files=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Sort [" in plan
    # Within every partition the morton key is non-decreasing.
    def check(it):
        prev = None
        for row in it:
            if prev is not None and row["__z"] < prev:
                yield row
            prev = row["__z"]
    bad = out.rdd.mapPartitions(lambda it: check(it)).count()
    assert bad == 0
