"""Data-quality operators: profiling metrics + declarative constraints.

Rebuilds both reference DQ gates Spark-native:

* **PyDeequ gate** (glue/data_quality_pydeequ.py:42-59): 15 analyzers —
  Size, Completeness×5, Uniqueness, Mean×2, StandardDeviation, Min×2, Max×2,
  ApproxCountDistinct.  Deequ compiles these to several Spark jobs via py4j;
  here the whole profile is ONE wide aggregate — a single pass over the
  data, one job, partial+final hash agg (scale: one shuffle-free reduce).
  Uniqueness (fraction of key values occurring exactly once —
  Deequ semantics) needs a two-level aggregate and is computed in the same
  action via a groupBy on the key.
* **DQDL gate** (glue/data_quality_dqdl.py:67-106): dataset-level rules
  (RowCount / Completeness / Uniqueness thresholds) evaluated against the
  collected 1-row metrics (O(1) driver work), and row-level rules
  (ColumnValues, IsComplete, IsPrimaryKey) as native boolean columns — the
  reference's Python-lambda Filter + ThreadPool routing
  (glue/data_quality_dqdl.py:13-31) becomes two filters on one cached frame.
* **Verification contract** (glue/data_quality_pydeequ.py:101-133): any
  failed constraint → DLQ write + raise, mirrored by ``DQGateError``.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class DQGateError(Exception):
    """Raised when constraint verification fails (pydeequ.py:133 parity)."""


def completeness(col: str) -> Column:
    """Non-null ratio (Deequ Completeness): count(col)/count(*)."""
    return (F.count(F.col(col)) / F.count(F.lit(1))).cast("double")


def profile(
    df: DataFrame,
    completeness_cols: Sequence[str] = (),
    numeric_cols: Sequence[str] = (),
    unique_key: str | None = None,
    approx_distinct_col: str | None = None,
) -> dict[str, float]:
    """Single-pass profile: the full PyDeequ analyzer set in one job.

    Returns ``{metric_name: value}``; metric names follow
    ``<Analyzer>(<column>)`` so the long/wide forms stay self-describing.
    """
    aggs: list[Column] = [F.count(F.lit(1)).cast("double").alias("Size()")]
    for c in completeness_cols:
        aggs.append(completeness(c).alias(f"Completeness({c})"))
    for c in numeric_cols:
        aggs += [
            F.avg(c).alias(f"Mean({c})"),
            F.stddev_pop(c).alias(f"StandardDeviation({c})"),
            F.min(c).cast("double").alias(f"Minimum({c})"),
            F.max(c).cast("double").alias(f"Maximum({c})"),
        ]
    if approx_distinct_col:
        aggs.append(
            F.approx_count_distinct(approx_distinct_col)
            .cast("double")
            .alias(f"ApproxCountDistinct({approx_distinct_col})")
        )
    row = df.agg(*aggs).collect()[0].asDict()

    if unique_key:
        # Deequ Uniqueness: |values occurring exactly once| / |distinct values|.
        u = (
            df.groupBy(unique_key)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .agg(
                (
                    F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
                    / F.count(F.lit(1))
                ).alias("u")
            )
            .collect()[0]["u"]
        )
        row[f"Uniqueness({unique_key})"] = float(u) if u is not None else None
    return row


def profile_df(spark, metrics: dict[str, float]) -> DataFrame:
    """Long-form metrics table matching the reference's metrics sink shape
    (glue/data_quality_pydeequ.py:61-64): (entity, instance, name, value)."""
    rows = []
    for k, v in metrics.items():
        name, _, rest = k.partition("(")
        instance = rest.rstrip(")") or "*"
        entity = "Dataset" if name == "Size" else "Column"
        rows.append((entity, instance, name, float(v) if v is not None else None))
    return spark.createDataFrame(rows, "entity string, instance string, name string, value double")


@dataclass
class Constraint:
    """One declarative constraint: name + metric key + assertion on its value.

    Mirrors Deequ's Check API (glue/data_quality_pydeequ.py:72-84): e.g.
    ``Constraint("size between", "Size()", lambda v: 50 <= v <= 150)``.
    Assertions run driver-side on the single collected metrics row (O(1)) —
    the same shape as Deequ's lambda assertions (X2).
    """

    name: str
    metric: str
    assertion: Callable[[float], bool]


def verify(
    spark,
    metrics: dict[str, float],
    constraints: Sequence[Constraint],
    raise_on_failure: bool = False,
) -> DataFrame:
    """Evaluate constraints → result DataFrame (check_status per constraint).

    Matches the reference's constraint-result shape
    (glue/data_quality_pydeequ.py:91,117-120); with ``raise_on_failure``
    reproduces the job-abort contract (pydeequ.py:133).
    """
    rows = []
    for c in constraints:
        v = metrics.get(c.metric)
        ok = v is not None and bool(c.assertion(v))
        rows.append(
            (c.name, c.metric, float(v) if v is not None else None,
             "Success" if ok else "Failure")
        )
    result = spark.createDataFrame(
        rows, "constraint_name string, metric string, value double, constraint_status string"
    )
    if raise_on_failure:
        failed = [r[0] for r in rows if r[3] == "Failure"]
        if failed:
            raise DQGateError(f"DQ verification failed: {failed}")
    return result


def row_level_rules(
    df: DataFrame,
    complete_cols: Sequence[str] = (),
    positive_cols: Sequence[str] = (),
    primary_key: str | None = None,
) -> DataFrame:
    """DQDL row-level outcomes as native boolean columns + a combined verdict.

    IsComplete → ``isNotNull``; ColumnValues > 0 → comparison; IsPrimaryKey →
    window count over the key == 1 (W2).  ``dq_result`` is
    'Passed'/'Failed' like Glue DQ's DataQualityEvaluationResult
    (glue/data_quality_dqdl.py:89-106); routing is then two native filters
    on ``startswith`` (P8) — no Python lambdas, no thread pool.
    """
    checks: list[Column] = []
    for c in complete_cols:
        checks.append(F.col(c).isNotNull())
    for c in positive_cols:
        checks.append(F.col(c).isNotNull() & (F.col(c) > 0))
    if primary_key:
        w = Window.partitionBy(primary_key)
        checks.append(F.count(F.lit(1)).over(w) == 1)
    verdict = F.lit(True)
    for ch in checks:
        verdict = verdict & ch
    return df.withColumn(
        "dq_result", F.when(verdict, F.lit("Passed")).otherwise(F.lit("Failed"))
    )


def route_rows(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(passed, failed) split on ``dq_result`` — reference's ThreadPool filter
    pair (glue/data_quality_dqdl.py:110-126) as two filters."""
    return (
        df.filter(F.col("dq_result").startswith("Passed")).drop("dq_result"),
        df.filter(F.col("dq_result").startswith("Failed")).drop("dq_result"),
    )
