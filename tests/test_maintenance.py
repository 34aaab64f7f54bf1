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
