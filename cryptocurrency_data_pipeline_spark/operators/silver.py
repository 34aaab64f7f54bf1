"""Silver-layer operators: schema enforcement, projection/cast, dedup, rules.

Reference semantics reproduced here:

* **Schema-enforcement split** (P12) — glue/data_transform_s3.py:72-108 does a
  driver-side ``collect()`` loop marking rows invalid when a required field is
  null, building DLQ rows ``{raw_data, error_reason, timestamp,
  validation_type}``.  Rewritten as a fully distributed split: one null-check
  predicate over the required columns, two filters off a shared lineage — no
  rows ever touch the driver, so it scales to 100 TB.
* **Project/rename/cast** (P1) — glue/data_transform_s3.py:113-129.
* **Window dedup keep-latest** (W1) — glue/data_transform_s3.py:133-136.
* **Threshold validation + routing** (P13/T4) — streaming/consumer.py:21-24,
  47-57: per-record rules with a ``" | "``-joined multi-reason string.
  Vectorized: an ``array(when(cond, reason)...)`` + ``filter`` + ``array_join``
  — pure JVM expressions, no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def required_null_predicate(required: Sequence[str]) -> Column:
    """True iff any required column is null (the row is invalid)."""
    pred = F.lit(False)
    for c in required:
        pred = pred | F.col(c).isNull()
    return pred


def missing_reasons(required: Sequence[str]) -> Column:
    """``" | "``-joined list of missing required fields for a row (the DLQ
    ``error_reason`` format, glue/data_transform_s3.py:86-88)."""
    return F.array_join(
        F.filter(
            F.array(
                *[
                    F.when(F.col(c).isNull(), F.lit(f"missing required field: {c}"))
                    for c in required
                ]
            ),
            lambda x: x.isNotNull(),
        ),
        " | ",
    )


def enforce_schema_split(
    df: DataFrame,
    required: Sequence[str],
    validation_type: str = "schema_enforcement",
    raw_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Distributed rewrite of the reference's collect()-loop validation.

    Returns ``(valid_df, dlq_df)``.  ``dlq_df`` carries the reference's DLQ
    envelope (glue/data_transform_s3.py:89-94): the offending row serialized
    as JSON plus per-row reasons naming every missing required field.

    ``raw_col`` names a column already holding the ORIGINAL serialized
    payload (the DLQ-replay path): the envelope then carries it verbatim
    — re-serializing from the parsed columns would drop any payload
    fields outside the declared schema — and ``valid_df`` drops it.
    This is the single definition of the DLQ envelope; first-pass and
    replay writes must not diverge.
    """
    reasons = missing_reasons(required)
    invalid = required_null_predicate(required)
    valid_df = df.filter(~invalid)
    if raw_col is not None:
        valid_df = valid_df.drop(raw_col)
        raw = F.col(raw_col)
    else:
        raw = F.to_json(F.struct(*df.columns))
    dlq_df = df.filter(invalid).select(
        raw.alias("raw_data"),
        reasons.alias("error_reason"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        F.lit(validation_type).alias("validation_type"),
    )
    return valid_df, dlq_df


def project_cast(df: DataFrame, spec: Sequence[tuple[str, str, str]]) -> DataFrame:
    """P1: one ``select`` applying (source_col, alias, cast_type) triples.

    Mirrors glue/data_transform_s3.py:113-129 (15-column select with alias +
    cast) as a reusable operator; a single Project node, fully codegen'd.
    """
    return df.select(*[F.col(src).cast(typ).alias(dst) for src, dst, typ in spec])


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """W1: keep the latest row per key (glue/data_transform_s3.py:133-136).

    ``Window.partitionBy(keys).orderBy(desc(order_col))`` + ``row_number == 1``.
    Extra ``tiebreak`` columns make the pick deterministic when ``order_col``
    ties (the reference is nondeterministic there — a real bug for golden
    tests).  One shuffle on the key columns; at scale this is the minimal
    cost for exact latest-per-key.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


#: Streaming validation thresholds (streaming/consumer.py:21-24).
MIN_PRICE = 0.01
MIN_MARKET_CAP = 1_000_000
MAX_PRICE_DROP_PCT = 15.0
ALERT_SURGE_PCT = 10.0


def validation_reasons(
    price: str = "current_price",
    market_cap: str = "market_cap",
    pct_change: str = "price_change_percentage_24h",
    decimal_thresholds: bool = False,
) -> Column:
    """P13: the consumer's rule chain (streaming/consumer.py:47-57) as one
    vectorized array-of-reasons expression.  Null checks mirror the
    reference's ``dict.get`` defaults: a null price/cap fails the rule.

    ``decimal_thresholds=True`` reproduces the reference's money-safe
    ``Decimal`` comparisons (streaming/consumer.py:21-24): thresholds
    become DecimalType literals, so against DecimalType money columns the
    comparison stays exact decimal arithmetic.  With the default float
    literals Spark would promote the decimal column to double, silently
    collapsing values within half-a-double-ulp of a threshold onto it
    (e.g. a cap of 999999.9999999999999999 rounds to double 1000000.0 and
    passes a gate it should fail).
    """
    if decimal_thresholds:
        from decimal import Decimal

        zero = F.lit(Decimal("0"))
        min_price = F.lit(Decimal("0.01"))
        min_cap = F.lit(Decimal("1000000"))
        neg_max_drop = F.lit(Decimal("-15.0"))
    else:
        zero = F.lit(0)
        min_price = F.lit(MIN_PRICE)
        min_cap = F.lit(MIN_MARKET_CAP)
        neg_max_drop = F.lit(-MAX_PRICE_DROP_PCT)
    rules = [
        (
            F.col(price).isNull() | (F.col(price) <= zero),
            "invalid price: <= 0",
        ),
        (
            F.col(price).isNotNull()
            & (F.col(price) > zero)
            & (F.col(price) < min_price),
            f"price below minimum threshold {MIN_PRICE}",
        ),
        (
            F.col(market_cap).isNull() | (F.col(market_cap) < min_cap),
            f"market cap below minimum {MIN_MARKET_CAP}",
        ),
        (
            F.col(pct_change).isNotNull()
            & (F.col(pct_change) < neg_max_drop),
            f"price drop exceeds {MAX_PRICE_DROP_PCT}%",
        ),
    ]
    return F.filter(
        F.array(*[F.when(cond, F.lit(reason)) for cond, reason in rules]),
        lambda x: x.isNotNull(),
    )


def route_by_rules(
    df: DataFrame,
    reasons: Column,
    pct_change: str = "price_change_percentage_24h",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """T4/T5 three-way routing: (good, bad, alert).

    ``bad`` rows carry ``error_reason`` (multi-reason, ``" | "``-joined —
    streaming/consumer.py:63); ``alert`` is the good-side surge filter
    (pct_change > 10, streaming/consumer.py:86).  ``pct_change`` names the
    surge column — configurable for the same reason it is in
    :func:`validation_reasons` (a caller that renamed it there would
    otherwise crash, or silently read the wrong column, here).
    """
    tagged = df.withColumn("__reasons", reasons)
    good = tagged.filter(F.size("__reasons") == 0).drop("__reasons")
    bad = tagged.filter(F.size("__reasons") > 0).withColumn(
        "error_reason", F.array_join("__reasons", " | ")
    ).drop("__reasons")
    alert = good.filter(F.col(pct_change) > ALERT_SURGE_PCT)
    return good, bad, alert
