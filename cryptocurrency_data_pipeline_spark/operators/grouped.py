"""Grouped-map pandas operators (``applyInPandas`` / GROUPED_MAP).

The one pandas execution mode the rest of the engine doesn't use:
``df.groupBy(k).applyInPandas(fn, schema)`` ships EVERY row of a group
into a single pandas DataFrame on one executor.  That is exactly right
for per-key algorithms that are genuinely recursive/imperative (EWMA,
Kalman-style filters, per-entity curve fitting) and exactly wrong for
anything a window function can express — a window streams; a grouped
map materializes.

Scale contract (the reason for the guard): group size is the failure
mode.  A 100 TB table with a hot key ships that key's entire history
into one task's memory.  Callers must pick group keys whose cardinality
profile they know; ``max_group_rows`` turns the silent OOM into a loud,
attributable error naming the offending key, so the fix (salt the key,
pre-aggregate, or bound the history) happens in code review, not in a
3 a.m. executor post-mortem.

Reference counterpart: none (the reference has no per-entity recursive
analytics); extends the X3 pandas-execution surface (SURVEY.md §2) with
the GROUPED_MAP member.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Sentinel for NULL timestamps crossing the Arrow/pandas boundary as
#: int64 micros.  An int64 column WITH nulls falls back to float64 in
#: pandas (NaN has no int64 encoding), silently rounding micros beyond
#: 2^53 (~year 2255 — exactly the year-9999 sentinel regime the int64
#: transport exists for) by up to ~32us: reconstructed event times
#: round-trip inexactly and sub-32us ties can invert under sort.
#: Mapping NULL -> int64 MAX keeps the column null-free (exact int64
#: end-to-end) and preserves the previous NaT/NaN ordering (sorts
#: last); the max valid timestamp (9999-12-31) is ~2.5e17 micros,
#: nowhere near 2^63-1, so the sentinel can never collide with data.
NULL_TS_US = (1 << 63) - 1


def ewma_last_by_key(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.25,
    max_group_rows: int = 5_000_000,
) -> DataFrame:
    """Per-key exponentially weighted moving average, final value.

    ``y_0 = x_0;  y_t = alpha * x_t + (1 - alpha) * y_{t-1}`` over the
    group's rows sorted by ``order_cols`` (pass a total order for
    determinism).  Output: (key, n_rows, ewma).  The recursion is the
    point — no Spark window frame expresses it, so this is the honest
    GROUPED_MAP case rather than a pandas detour around a built-in.

    The per-group loop is O(rows) python-scalar work; fine for the
    per-entity cardinalities this targets (thousands of rows per key).
    ``max_group_rows`` aborts loudly on hot keys (see module docstring).
    """
    a = float(alpha)
    b = 1.0 - a
    order = list(order_cols)

    # Timestamp order columns cross the Arrow boundary as exact int64
    # micros, NOT as timestamps: pandas' datetime64[ns] can only hold
    # 1677-09-21..2262-04-11, so a single year-1 or year-9999 row (epoch
    # sentinels, mis-parsed crawl dates — routine at corpus scale) would
    # abort the whole Arrow batch with an out-of-bounds cast.  unix_micros
    # is strictly monotone (order-preserving) and skips the per-row
    # datetime materialization entirely — strictly cheaper on the hot
    # path.  Found by the sftime fixture (tools/make_time_sf.py).
    # NULL timestamps become the NULL_TS_US sentinel, NOT a NULL long:
    # one NULL in an Arrow int64 column degrades the whole pandas column
    # to float64, rounding micros beyond 2^53 and inverting sub-32us
    # ties for every OTHER row in the batch (advisor r11 finding).  The
    # sentinel sorts last, exactly where NaT/NaN sorted before.
    ts_order = {
        c for c, dt in df.dtypes if c in order and dt.startswith("timestamp")
    }
    if ts_order:
        df = df.select(
            *[
                F.coalesce(
                    F.unix_micros(F.col(c).cast("timestamp")),
                    F.lit(NULL_TS_US),
                ).alias(c)
                if c in ts_order
                else F.col(c)
                for c in df.columns
            ]
        )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"group {pdf[key_col].iloc[0]!r} has {len(pdf)} rows "
                f"(max_group_rows={max_group_rows}); salt the key or "
                "pre-aggregate before the grouped map"
            )
        pdf = pdf.sort_values(order, kind="mergesort")
        acc = None
        # Skip missing observations (NULL value -> NaN after the Arrow
        # float64 conversion): one NaN would otherwise poison every
        # subsequent a*x + b*acc step, silently turning the key's ewma
        # into NaN.  n_rows still counts ALL rows; an all-null key's
        # ewma is NULL.
        for v in pdf[value_col].dropna().to_numpy():
            acc = float(v) if acc is None else a * float(v) + b * acc
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "n_rows": [len(pdf)], "ewma": [acc]}
        )

    out_schema = (
        f"{key_col} {dict(df.dtypes)[key_col]}, n_rows long, ewma double"
    )
    return df.groupBy(key_col).applyInPandas(fn, out_schema)
