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


def test_rendezvous_reshard_moves_few_mod_moves_most(spark):
    import pyspark.sql.functions as F

    from cryptocurrency_data_pipeline_spark.sources.shards import (
        rendezvous_shard,
        shard_assignment,
    )

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    r = df.select(
        (rendezvous_shard("doc_id", 16) != rendezvous_shard("doc_id", 17))
        .cast("int").alias("rv"),
        (shard_assignment("doc_id", 16) != shard_assignment("doc_id", 17))
        .cast("int").alias("md"),
        rendezvous_shard("doc_id", 17).alias("s17"),
    )
    agg = r.agg(F.avg("rv"), F.avg("md")).collect()[0]
    rv_frac, mod_frac = agg[0], agg[1]
    # Rendezvous: ~1/17 ≈ 0.059 of ids move; mod: ~16/17 ≈ 0.94.
    assert rv_frac < 0.12, rv_frac
    assert mod_frac > 0.75, mod_frac
    # Every mover lands on the NEW shard (the defining rendezvous property).
    movers = df.select(
        rendezvous_shard("doc_id", 16).alias("a"),
        rendezvous_shard("doc_id", 17).alias("b"),
    ).where(F.col("a") != F.col("b"))
    assert movers.where(F.col("b") != 16).count() == 0
    # All 17 shards populated, roughly balanced (within 3x of uniform).
    sizes = [x[1] for x in r.groupBy("s17").count().collect()]
    assert len(sizes) == 17 and max(sizes) < 3 * (4000 / 17)
