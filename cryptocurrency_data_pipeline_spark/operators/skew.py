"""Skew mitigation: salted aggregation and salted broadcast-replicate join.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these operators are the explicit tools for the pathological cases AQE can't
fix — a groupBy where one key holds 30% of 100 TB, or a shuffle join whose
hot key overflows a single task no matter how the planner splits files.

* **salted_agg**: two-phase aggregation.  Phase 1 groups on
  (key, salt ∈ [0,S)) so the hot key's rows spread over S tasks and
  map-side combine stays effective; phase 2 merges the S partials per key.
  Works for any algebraic aggregate (sum/count/min/max — and avg via
  sum+count).
* **salted_join**: replicate the small side S× (explode over salt values),
  salt the big side's key randomly, join on (key, salt).  The hot key's
  rows land in S different tasks instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """DETERMINISTIC per-row salt: pmod(xxhash64(all columns), n).

    ``rand(seed)`` is the SPARK-23207 hazard: a stage retry re-rolls the
    values (upstream row order is not retry-stable), so a row can land
    in a different (key, salt) phase-1 group than the partials some
    reducers already fetched — double-counted or dropped rows at exactly
    the scale these tools target.  Hashing the row's content is
    retry-stable; identical duplicate rows share a salt, which is
    harmless (aggregation combines them map-side anyway, and a join
    replica matches regardless of which salt it lands on)."""
    return F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {sum, count, min, max, avg}.  avg is decomposed into sum+count across
    the phases so the result is exact.
    """
    salt = _row_salt(df, n_salts)
    phase1_aggs, phase2_aggs, post = [], [], []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            phase1_aggs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            phase1_aggs.append(F.count(col).alias(f"__p_{out}"))
            phase2_aggs.append(F.sum(f"__p_{out}").alias(out))
        elif fn in ("min", "max"):
            f = getattr(F, fn)
            phase1_aggs.append(f(col).alias(f"__p_{out}"))
            phase2_aggs.append(f(f"__p_{out}").alias(out))
        elif fn == "avg":
            phase1_aggs += [
                F.sum(col).alias(f"__ps_{out}"),
                F.count(col).alias(f"__pc_{out}"),
            ]
            phase2_aggs += [
                F.sum(f"__ps_{out}").alias(f"__s_{out}"),
                F.sum(f"__pc_{out}").alias(f"__c_{out}"),
            ]
            post.append((out, F.col(f"__s_{out}") / F.col(f"__c_{out}")))
        else:
            raise ValueError(f"unsupported aggregate: {fn}")

    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*phase1_aggs)
    )
    merged = partial.groupBy(*keys).agg(*phase2_aggs)
    for out, expr in post:
        merged = merged.withColumn(out, expr)
    return merged.drop(*[c for c in merged.columns if c.startswith("__")])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    max_small_rows: int | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    Use when the small side is too large to broadcast outright but the big
    side's key distribution is pathological.  Replication factor = S, so
    pick the smallest S that spreads the hot keys — the shuffle carries
    ``n_salts × |small|`` replica rows, so this is a SMALL×BIG tool only.
    For big×big skew, AQE's skew-join splitting
    (``spark.sql.adaptive.skewJoin.enabled``, on in ``session.py``) is the
    right first resort; reach for salting only when a single logical key
    overflows what AQE can split.

    ``max_small_rows`` (off by default — counting costs a job) bounds the
    replication blast radius: when set, a ``limit(max+1).count()`` probe
    (O(max) work, never a full count) raises ``ValueError`` if the small
    side exceeds it, instead of silently materializing an ``n_salts×``
    copy of a table that was never actually small.

    Only inner/left-side joins are supported: a right or full outer join
    would emit every UNMATCHED small-side replica — ``n_salts`` copies
    of each unmatched row — so those shapes are rejected rather than
    silently multiplied.
    """
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join supports inner/left-side joins only, got "
            f"how={how!r}: an outer right/full join emits each unmatched "
            f"small-side row once PER REPLICA ({n_salts}x duplicates)"
        )
    if max_small_rows is not None:
        probe = small.limit(max_small_rows + 1).count()
        if probe > max_small_rows:
            raise ValueError(
                f"salted_join small side exceeds max_small_rows="
                f"{max_small_rows}; replicating it {n_salts}x would be its "
                f"own scale problem — broadcast a smaller dim, lower "
                f"n_salts, or use AQE skew-join splitting for big-big skew"
            )
    salted_big = big.withColumn("__salt", _row_salt(big, n_salts))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin-repartition ``df`` UP to the cluster's default
    parallelism when its plan has fewer partitions — the guide's
    "input skew: repartition immediately after the read" case for the
    single-row-group file.

    A small parquet file is one row group, and byte-range splitting
    (``spark.sql.files.minPartitionNum``) cannot divide a row group —
    every expensive per-row map stage downstream of such a scan runs
    serially no matter how many cores idle (measured: the 50-gram build
    of ``exact_substring_spans`` spent ~3 s on one task at sf0.1).  The
    repartition shuffles only the raw input rows once, which is
    negligible exactly when this matters (the input was small enough to
    land in few partitions).

    Scale-adaptive by construction: on a real corpus the scan already
    has >= defaultParallelism partitions and this is the identity — no
    shuffle is ever added to a big input.  Round-robin repartition is
    retry-deterministic (sort-before-repartition, on by default since
    SPARK-23207).

    Leaf-scan inputs ONLY (r15, the r14 verdict's latent-hazard note):
    the partition probe executes the physical plan's RDD lineage, and
    under AQE a plan containing an Exchange materializes query stages
    EAGERLY — real jobs at plan-build time.  A frame whose plan already
    shuffled is returned unchanged (its partitioning is the planner's
    business, not an input-skew problem).  The probe also avoids
    ``df.rdd`` (ADVICE r14): that wraps the plan in a Python-pickled
    conversion RDD per call; ``executedPlan().execute()`` reads the
    partition count off the JVM RDD directly."""
    if df.isStreaming:
        # physical-plan probes are undefined on a streaming frame;
        # micro-batch sizing is the stream's own concern.
        return df
    p = df.sparkSession.sparkContext.defaultParallelism
    plan = df._jdf.queryExecution().executedPlan()
    if "exchange" in plan.toString().lower():
        return df
    if plan.execute().getNumPartitions() < p:
        return df.repartition(p)
    return df
