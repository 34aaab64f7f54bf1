"""SparkSession factory.

The reference sets exactly two engine confs (dynamic partition overwrite at
glue/data_transform_s3.py:20 and glue/data_aggregate_gold.py:16); we keep
those and add the scale-oriented defaults a 1000-executor cluster wants:
AQE (runtime re-plan, skew-join splitting, partition coalescing) and
Arrow-batched Python↔JVM transfer for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cryptocurrency-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-safe defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local runs; on a
    real cluster the caller passes none and spark-submit supplies it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")

    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    conf = {
        # Reference parity (glue/data_transform_s3.py:20).
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # Runtime re-planning: partition coalescing, skew-join handling,
        # broadcast conversion after runtime stats.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Arrow for the Pandas-UDF operators (minhash/simhash/multimodal).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Local-run ergonomics; harmless on a cluster.
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.session.timeZone": "UTC",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
