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


def read_bronze(
    spark: SparkSession,
    landing_dir: str,
    extra_fields: "list | None" = None,
    keep_raw: bool = False,
    track_new_fields: bool = False,
) -> DataFrame:
    """S3: recursive landing-zone scan with the declared schema, plus a
    land-then-enforce evolution regime.

    Text scan + ``from_json`` (the exact plumbing of the streaming source,
    so batch and streaming share corrupt-record semantics): a malformed
    line yields a null struct, surfaced as ``_corrupt_record`` carrying the
    raw payload — Glue's DynamicFrame choice types (P11) replaced by data,
    not exceptions.  Also sidesteps Spark's QUERY_ONLY_CORRUPT_RECORD
    restriction on native JSON-scan corrupt columns.

    Schema evolution (the reference lands evolving raw schemas via
    ``mergeSchema`` on write, glue/data_ingestion_s3.py:35): a new upstream
    field must never be silently dropped.

    * ``track_new_fields=True`` adds ``_new_fields`` — top-level JSON keys
      absent from the declared schema (``json_object_keys`` +
      ``array_except``, JVM-side, same scan) — so each batch can alert on
      drift before it's lost.
    * ``keep_raw=True`` carries the raw line as ``_raw``: the bronze tier
      retains the full payload, so a later promotion backfills from bronze
      instead of re-ingesting.
    * ``extra_fields=[StructField(...)]`` promotes discovered fields into
      the typed read — the "resolved" half of the regime
      (``new_field_report`` is the discovery half).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    # Copy, don't .add(): StructType.add mutates the receiver in place.
    declared = list(CRYPTO_MARKETS.fields) + list(extra_fields or [])
    schema = StructType(
        declared + [StructField("_corrupt_record", StringType(), True)]
    )
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(landing_dir)
        .filter(F.length(F.trim(F.col("value"))) > 0)  # blank lines aren't data
    )
    cols = [
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("r")
    ]
    if keep_raw:
        cols.append(F.col("value").alias("_raw"))
    if track_new_fields:
        known = F.array(*[F.lit(f.name) for f in declared])
        cols.append(
            F.array_except(F.json_object_keys(F.col("value")), known).alias(
                "_new_fields"
            )
        )
    out = raw.select(*cols)
    return out.select("r.*", *[c for c in ("_raw", "_new_fields") if c in out.columns])


def new_field_report(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Schema-drift discovery over the landing zone: one scan, JVM-side.

    Returns (field, n_rows) for every top-level key not in the declared
    schema — the operator review feed for promoting fields via
    ``read_bronze(extra_fields=...)``.  Unlike full JSON inference this
    never touches values, just key sets.
    """
    known = F.array(*[F.lit(f.name) for f in CRYPTO_MARKETS.fields])
    return (
        spark.read.option("recursiveFileLookup", "true")
        .text(landing_dir)
        .filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.explode(
                F.array_except(F.json_object_keys(F.col("value")), known)
            ).alias("field")
        )
        .groupBy("field")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def merge_schema_versions(versions):
    """Name-keyed union of schema versions — the read-side rendering of
    the reference's ``mergeSchema`` write (glue/data_ingestion_s3.py:35).
    Field order: first appearance; on a name collision the LATEST
    version's field (type/nullability) wins, matching parquet
    ``mergeSchema``'s last-writer-wins resolution for promoted types."""
    from pyspark.sql.types import StructType

    by_name: dict[str, object] = {}
    order: list[str] = []
    for v in versions:
        for f in v.fields:
            if f.name not in by_name:
                order.append(f.name)
            by_name[f.name] = f
    return StructType([by_name[n] for n in order])


def read_bronze_versioned(
    spark: SparkSession,
    landing_dir: str,
    versions,
    keep_raw: bool = False,
) -> DataFrame:
    """Versioned-schema bronze read: current ∪ previous schemas, with
    per-row provenance — the production-parity form of the reference's
    evolving landing zone (``mergeSchema``, glue/data_ingestion_s3.py:35),
    but schema-explicit (no inference pass) and drift-visible:

    * rows are parsed against the MERGED schema, so a field introduced by
      any version lands typed (older rows carry nulls for it) and Silver
      enforcement downstream sees one stable wide surface;
    * ``_schema_version`` = 1-based index of the EARLIEST version whose
      field set covers the row's keys (the version that batch was written
      under); NULL when no registered version covers it — i.e. genuinely
      novel drift;
    * ``_unknown_fields`` = top-level keys absent from every version —
      the alert feed for registering the next version.

    All JVM-side on the one text scan (``json_object_keys`` +
    ``array_except``); corrupt lines yield a null struct with
    ``_corrupt_record`` carrying the payload, as in :func:`read_bronze`.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    versions = list(versions)
    merged = merge_schema_versions(versions)
    schema = StructType(
        list(merged.fields) + [StructField("_corrupt_record", StringType(), True)]
    )
    raw = (
        spark.read.option("recursiveFileLookup", "true")
        .text(landing_dir)
        .filter(F.length(F.trim(F.col("value"))) > 0)
    )
    keys = F.json_object_keys(F.col("value"))
    covered = [
        F.when(
            F.size(
                F.array_except(keys, F.array(*[F.lit(f.name) for f in v.fields]))
            )
            == 0,
            F.lit(i + 1),
        )
        for i, v in enumerate(versions)
    ]
    merged_names = F.array(*[F.lit(f.name) for f in merged.fields])
    cols = [
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("r"),
        F.coalesce(*covered).alias("_schema_version"),
        F.array_except(keys, merged_names).alias("_unknown_fields"),
    ]
    if keep_raw:
        cols.append(F.col("value").alias("_raw"))
    out = raw.select(*cols)
    return out.select(
        "r.*",
        "_schema_version",
        "_unknown_fields",
        *(["_raw"] if keep_raw else []),
    )


def infer_bronze_schema(spark: SparkSession, landing_dir: str):
    """Full-inference fallback (the reference's inferred-then-resolved
    regime, data_ingestion_s3.py:35 ``mergeSchema``): one extra pass over
    the landing zone, so it's an explicit opt-in for backfills — steady
    state should promote fields via ``new_field_report`` instead."""
    return (
        spark.read.option("recursiveFileLookup", "true").json(landing_dir).schema
    )
