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


def laplace_noisy_counts(
    df: DataFrame, keys: Sequence[str], epsilon: float, seed: str
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism
    with SEEDED noise: count per ``keys`` plus Laplace(1/ε) noise derived
    by inverse-CDF from a uniform value hashed out of (seed, group key).

    Count queries have sensitivity 1 (one individual moves one group's
    count by one), so Laplace(1/ε) noise gives ε-DP — PROVIDED the noise
    is unpredictable.  The seed here is therefore part of the privacy
    boundary exactly like ``pseudonymize``'s key: with a SECRET seed the
    release is ε-DP to everyone who doesn't hold it; with a published
    seed the noise is recomputable and the mechanism is only a
    reproducible perturbation (useful for pipeline testing, not a
    privacy guarantee).  Seeding is what makes the operator deterministic
    enough to oracle-verify and replay; production keeps the seed in the
    same vault as the pseudonymization key.

    Noise math (one expression, map-side, both engines can replay it):
    ``u = (hash64(seed, key) + 0.5) / 2^32`` uniform in (0, 1), then the
    Laplace inverse CDF ``-(1/ε) · sign(u − ½) · ln(1 − 2|u − ½|)``.
    ``u`` can never hit 0, ½-adjacent, or 1 exactly, so the log argument
    stays in (0, 1] — no infinities under ANSI.

    The group key is hashed FIELD-BY-FIELD with a null marker before the
    seed hash: a plain separator-joined concat lets distinct groups
    collide (NULL fields are skipped by concat_ws; a field containing
    the separator shifts the boundaries), and two groups with identical
    noise leak their exact count difference — the ε-DP proof requires
    independent per-group draws.

    RELEASE CONTRACT: ``true_count`` is emitted for verification
    harnesses only.  A real ε-DP release must DROP it (and any other
    exact aggregate) — publishing the true counts next to the noisy ones
    voids the guarantee entirely."""
    grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    # Injective field framing: 1-byte null marker + md5 of the value.
    key_str = F.concat(
        *[
            F.concat(
                F.when(F.col(k).isNull(), F.lit("0")).otherwise(F.lit("1")),
                F.md5(F.coalesce(F.col(k).cast("string"), F.lit(""))),
            )
            for k in keys
        ]
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key_str)), 1, 8), 16, 10)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    noise = (
        -F.lit(1.0 / epsilon)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return grouped.select(
        *keys,
        F.col("__n").cast("long").alias("true_count"),
        F.round(F.col("__n") + noise, 4).alias("noisy_count"),
    )
