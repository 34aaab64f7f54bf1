"""Bronze ingestion: REST → landing-zone JSON → typed DataFrame.

Reference: glue/data_ingestion_s3.py fetches CoinGecko
``/coins/markets?vs_currency=usd&order=market_cap_desc&per_page=100&page=1``
(:22-25), parallelizes the JSON list, and writes one timestamped JSON file
with ``coalesce(1)`` + ``mergeSchema`` (:27-36).

Engine version: the fetch stays a driver-side call (100 records — S1);
everything after is schema-explicit.  ``read_bronze`` reads the landing
zone recursively (S3 semantics) with the declared schema + corrupt-record
capture instead of inference — at scale, inference is a full extra pass.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.schemas import CRYPTO_MARKETS

COINGECKO_MARKETS_URL = (
    "https://api.coingecko.com/api/v3/coins/markets"
    "?vs_currency=usd&order=market_cap_desc&per_page={per_page}&page=1"
)


def fetch_markets(per_page: int = 100, timeout: int = 30) -> list[dict]:
    """S1: GET the markets endpoint (driver-side, tiny payload).

    Kept import-gated and injectable so tests pass fixture lists instead of
    hitting the network.
    """
    from urllib.request import urlopen  # stdlib only

    with urlopen(COINGECKO_MARKETS_URL.format(per_page=per_page), timeout=timeout) as r:
        return json.loads(r.read().decode())


def write_bronze(records: list[dict], landing_dir: str, run_id: str | None = None) -> str:
    """Land one ingest run as a timestamped JSON-lines file
    (data_ingestion_s3.py:27-36 layout, driver-side: the payload is ~100
    rows by contract, so a Spark job would be overhead)."""
    run_id = run_id or datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S")
    os.makedirs(landing_dir, exist_ok=True)
    path = os.path.join(landing_dir, f"crypto_data_{run_id}.json")
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    return path


def read_bronze(spark: SparkSession, landing_dir: str) -> DataFrame:
    """S3: recursive landing-zone scan with the declared schema.

    Text scan + ``from_json`` (the exact plumbing of the streaming source,
    so batch and streaming share corrupt-record semantics): a malformed
    line yields a null struct, surfaced as ``_corrupt_record`` carrying the
    raw payload — Glue's DynamicFrame choice types (P11) replaced by data,
    not exceptions.  Also sidesteps Spark's QUERY_ONLY_CORRUPT_RECORD
    restriction on native JSON-scan corrupt columns.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    # Copy, don't .add(): StructType.add mutates the receiver in place.
    schema = StructType(
        list(CRYPTO_MARKETS.fields) + [StructField("_corrupt_record", StringType(), True)]
    )
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(landing_dir)
        .filter(F.length(F.trim(F.col("value"))) > 0)  # blank lines aren't data
        .select(
            F.from_json(
                F.col("value"),
                schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
            ).alias("r")
        )
    )
    return raw.select("r.*")
