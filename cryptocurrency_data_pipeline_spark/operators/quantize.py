"""Overflow-safe measure quantization: ``floor(x * scale)`` as int64.

Money and measure columns are compared cross-engine as integer cents
(``floor(x * 100)``) so double-summation order can never flip a driver
hash.  The raw pattern is a 100 TB job-killer under Spark 4's default
ANSI mode: a SINGLE ``NaN`` (or ``±Infinity``, or a magnitude whose
product overflows int64) in one row aborts the whole job at the
``floor``/cast.  Every quantization site therefore routes through
:func:`cents`, whose contract is:

* finite ``|x| < 2**62 / scale``  ->  ``floor(x * scale)`` as BIGINT
* ``NaN`` / ``±Infinity`` / larger magnitudes  ->  NULL (row degrades,
  job survives; NULLs then drop out of SUM/MIN/MAX like any other NULL)
* NULL -> NULL

``2**62`` (not ``2**63``) leaves a full bit of headroom so the double
rounding of ``x * scale`` can never cross the int64 boundary.  The
DuckDB oracle mirror is ``queries._fragments.cents_sql`` — both sides
compare ``abs(x)`` against the SAME double literal, so the NULL set is
bit-identical cross-engine (both engines order NaN above +Infinity, so
``abs(NaN) >= lim`` is uniformly true even before the explicit
``isnan`` guard).

Reference parity note: the reference pipeline loads prices via Glue
DynamicFrames and never quantizes (it has no cross-engine hash gate);
the cents convention is this repo's verification machinery, so the
guard has no reference counterpart to cite beyond the measure columns
themselves (reference/glue/data_transform_s3.py price fields).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: floor(x * scale) must stay strictly inside int64; see module docstring.
QUANTIZE_GUARD = float(2**62)


def quantize_limit(scale: int) -> float:
    """The magnitude bound for a given scale, as the exact double both
    engines compare against (embed with ``repr()`` in SQL)."""
    return QUANTIZE_GUARD / scale


def finite(col: Column | str) -> Column:
    """True iff the value is a finite double; NULL for NULL input (so a
    filter drops NULL, NaN, and ±Inf alike).  The engine-side mirror of
    DuckDB's ``isfinite`` — order statistics and moment aggregates
    (rank quantiles, stddev, z-scores, EWMA) compute over finite values
    ONLY: one corrupt measure in 100 TB must not poison a percentile or
    NaN-flood a stddev, and DuckDB's ``stddev`` hard-errors on
    non-finite input where Spark would propagate NaN — excluding them
    on both sides is the one contract both engines can express."""
    d = (F.col(col) if isinstance(col, str) else col).cast("double")
    return (
        (~F.isnan(d))
        & (d > F.lit(float("-inf")))
        & (d < F.lit(float("inf")))
    )


def cents(col: Column | str, scale: int = 100) -> Column:
    """``floor(x * scale)`` as LongType with the NaN/Inf/overflow -> NULL
    contract above.  ``scale=100`` is money cents; ``scale=10000`` the
    basis-point variant some rollups use."""
    d = (F.col(col) if isinstance(col, str) else col).cast("double")
    lim = F.lit(quantize_limit(scale))
    guarded = F.when(
        F.isnan(d) | (F.abs(d) >= lim), F.lit(None).cast("double")
    ).otherwise(d)
    return F.floor(guarded * F.lit(float(scale))).cast("long")


def epoch_sec(col: Column | str) -> Column:
    """Exact FLOORED epoch seconds of a timestamp, as BIGINT; NULL -> NULL.

    The naive ``unix_timestamp(ts)`` TRUNCATES sub-second timestamps
    toward zero, so a pre-1970 event at 23:59:59.5 lands in second 0
    instead of second -1 — one bucket late in every epoch-seconds
    bucketing (sessionization gaps, weekly cohorts, attribution
    lookbacks) and silently divergent from SQL ``floor(epoch(ts))``
    semantics.  Found by the sftime fixture (tools/make_time_sf.py).

    Construction: ``unix_seconds(date_trunc('second', ts))``.
    ``date_trunc`` FLOORS in the timestamp domain with exact JVM long
    micros (negative epochs included), after which the seconds
    extraction has no fractional part left to mis-round.  This also
    dodges the double-precision trap at the timestamp range maximum:
    any epoch math routed through a double (e.g. ``floor(epoch(ts))``
    with microseconds attached) is wrong at 9999-12-31 23:59:59.999999
    because 2.5e17 us exceeds 2^53.  Verified exactly equal to the
    DuckDB mirror (``queries._fragments.epoch_sec_sql``) at year 1,
    year 9999, and both signs of the epoch.

    ``date_trunc`` accepts TIMESTAMP_NTZ input (arrow-written parquet)
    and returns session-zoned TIMESTAMP, which satisfies the strict
    ``unix_seconds`` signature; the session timezone is pinned UTC, so
    NTZ-vs-zoned coercion is the identity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_seconds(F.date_trunc("second", c))
