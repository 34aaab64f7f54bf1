"""Training-shard sink: deterministic placement, one file per shard,
manifest accounting (sources/shards.py)."""

import glob
import json
import os

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators.sampling import assign_split
from cryptocurrency_data_pipeline_spark.sources.shards import (
    shard_assignment,
    write_training_shards,
)
from cryptocurrency_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
N_SHARDS = 4


def _sharded_docs(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return assign_split(docs, "doc_id")


def test_one_file_per_shard_rows_intact(spark, tmp_path):
    docs = _sharded_docs(spark)
    path = str(tmp_path / "corpus")

    manifest = write_training_shards(
        docs, path, N_SHARDS, id_col="doc_id", token_col="n_chars"
    )

    # Exactly one parquet file per (split, shard) directory — the
    # repartition-on-partition-columns contract, not tasks × shards.
    shard_dirs = glob.glob(f"{path}/split=*/shard=*")
    assert shard_dirs
    for d in shard_dirs:
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1

    # No rows lost or duplicated, ids intact.
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert (
        back.agg(F.sum(F.hash("doc_id"))).collect()[0][0]
        == docs.agg(F.sum(F.hash("doc_id"))).collect()[0][0]
    )

    # Manifest matches the on-disk layout exactly.
    with open(os.path.join(path, "_manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk == manifest
    assert len(manifest["shards"]) == len(shard_dirs)
    assert sum(s["n_rows"] for s in manifest["shards"]) == docs.count()
    assert sum(s["n_tokens"] for s in manifest["shards"]) == (
        docs.agg(F.sum("n_chars")).collect()[0][0]
    )


def test_placement_deterministic_across_runs(spark, tmp_path):
    docs = _sharded_docs(spark)
    p1, p2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    write_training_shards(docs, p1, N_SHARDS, id_col="doc_id")
    write_training_shards(docs, p2, N_SHARDS, id_col="doc_id")

    a = {
        (r["split"], r["shard"], r["doc_id"])
        for r in spark.read.parquet(p1).select("split", "shard", "doc_id").collect()
    }
    b = {
        (r["split"], r["shard"], r["doc_id"])
        for r in spark.read.parquet(p2).select("split", "shard", "doc_id").collect()
    }
    assert a == b

    # And the partition-column shard agrees with a fresh recompute of the
    # md5 assignment expression.
    back = spark.read.parquet(p1).withColumn(
        "expect", shard_assignment("doc_id", N_SHARDS)
    )
    assert back.filter(F.col("shard") != F.col("expect")).count() == 0


def test_in_file_row_order_is_sorted(spark, tmp_path):
    docs = _sharded_docs(spark)
    path = str(tmp_path / "ordered")
    write_training_shards(docs, path, N_SHARDS, id_col="doc_id")

    one = glob.glob(f"{path}/split=*/shard=*/part-*.parquet")[0]
    ids = [r.doc_id for r in spark.read.parquet(one).select("doc_id").collect()]
    assert ids == sorted(ids)
