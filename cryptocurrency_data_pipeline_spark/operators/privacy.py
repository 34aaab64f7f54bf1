"""Pseudonymization: keyed deterministic tokenization of identifier columns.

Complements the audit side of the privacy surface (k-anonymity /
l-diversity / t-closeness queries) and the content side
(``text.redact_pii``) with the transformation a governed lake applies
before data leaves its trust boundary: replace an identifier with
``sha2(key || ':' || value)`` so the SAME (key, value) maps to the SAME
token everywhere.  Joins, group-bys, and distinct counts over the token
column therefore reproduce the raw column's topology exactly
(referential integrity across tables tokenized with the same key) while
the raw identifier never appears downstream.

The secret key matters: an UNkeyed hash of a small id space (user ids,
emails, SSNs) is reversible by dictionary attack — hash every possible
value, join.  With the key unknown the attacker cannot build the
dictionary.  Rotating the key unlinks new exports from old ones.

Pure JVM expressions (``sha2`` over concat), map-only, no shuffle, no
UDF — tokenization cost at 100 TB is the scan itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token(col: Column | str, key: str, bits: int = 256) -> Column:
    """The token expression: lowercase-hex ``sha2(key || ':' || value)``.
    Null values stay null (a null identifier carries no linkage)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.sha2(F.concat(F.lit(f"{key}:"), c.cast("string")), bits)
    )


def pseudonymize(
    df: DataFrame, cols: Sequence[str], key: str, bits: int = 256
) -> DataFrame:
    """Replace each of ``cols`` with its keyed token, in place (same
    column name, StringType).  All other columns pass through untouched."""
    out = df
    for c in cols:
        out = out.withColumn(c, token(c, key, bits))
    return out
