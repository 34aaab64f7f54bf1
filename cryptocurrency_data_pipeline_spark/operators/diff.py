"""Snapshot diff: Delta-style change detection between two table versions.

A 100 TB pipeline re-materializes derived tables constantly; the question
"what actually changed since the last run" gates incremental downstream
work (re-embed only changed docs, re-shard only touched splits) and is
the cheapest regression test a data pipeline has. Without a table format
that tracks versions, the diff is ONE full-outer join on the key with a
content-fingerprint compare — co-partitioned on the key, so at scale both
sides shuffle once (or zero times if both snapshots are bucketed by key,
see ``sources/bucketed.py``).

No counterpart in the reference (its DynamoDB upserts overwrite history —
streaming/consumer.py's put_item); this is the batch-auditable version of
the same "what's new" question its bookmark job answers for raw files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    fingerprint: str,
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, fingerprints differ),
    ``unchanged``. Returns (key, change_type, old_fingerprint,
    new_fingerprint).

    Presence is carried by explicit per-side markers, NOT inferred from
    fingerprint nullness: a row whose fingerprint VALUE is null (md5 of
    a null content column) would otherwise be misclassified — old-only
    with a null fingerprint read as "added", and a null-vs-value pair
    fell through the null-unsafe ``!=`` to "unchanged"."""
    o = old.select(
        F.col(key).alias("k"),
        F.col(fingerprint).alias("old_fingerprint"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key).alias("k"),
        F.col(fingerprint).alias("new_fingerprint"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, "k", "full_outer")
    return joined.select(
        F.col("k").alias(key),
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        "old_fingerprint",
        "new_fingerprint",
    )
