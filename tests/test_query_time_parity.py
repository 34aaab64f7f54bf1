"""Oracle parity on CALENDAR/TIMESTAMP-EXTREME tables (``sftime``,
tools/make_time_sf.py).

Every table keeps its sf0.001 rows plus time-adversarial appends whose
ONLY adversity is the time axis: sub-second negative-epoch timestamps,
year 1 and 9999-12-31 23:59:59.999999 (the int64-micros range ends),
proleptic-Gregorian cutover-gap dates, ISO-week boundaries where the ISO
year differs from the calendar year, the leap day, epoch zero, a session
straddling the epoch sign flip, and identical microsecond timestamps on
one user.  Crawl and log corpora carry all of these (epoch-0 defaults,
"9999" never-expires sentinels, mis-parsed ancient dates) — the sixth
adversarial input class after sf0.01 / sfedge / sfempty / sfone / sfdup.

The round-11 sweep of all 201 queries over this scale point surfaced
three divergence classes, all fixed:

* **truncate-vs-floor epoch seconds** — ``unix_timestamp`` truncates a
  pre-1970 sub-second timestamp toward zero (23:59:59.5 -> second 0)
  while SQL ``floor(epoch(ts))`` floors (-> -1), shifting the row one
  bucket late in every epoch-seconds bucketing (sessionization gaps,
  weekly cohorts, attribution lookbacks, gap histograms).  Fixed by
  ``quantize.epoch_sec`` / ``_fragments.epoch_sec_sql``: both engines
  ``date_trunc('second')`` FIRST (exact integer-micros flooring), then
  extract seconds — which also dodges the double trap at year 9999,
  where any epoch math routed through a double is off by a second
  (2.5e17 us exceeds 2^53; DuckDB's bare ``floor(epoch(ts))`` rounds
  23:59:59.999999 UP).
* **Arrow/pandas ns-range aborts** — pandas' datetime64[ns] spans only
  1677..2262, so a timestamp column crossing ``applyInPandas`` /
  ``applyInPandasWithState`` kills the whole batch on one year-1 row.
  Timestamps now cross the boundary as exact int64 micros
  (``grouped.ewma_last_by_key`` order columns;
  ``stateful.stateful_price_deltas`` round-trips through
  ``unix_micros``/``timestamp_micros``).
* **five-digit-year string forms** — a DERIVED window end (start + 4h)
  passes year 9999 and Java's ``date_format`` prints "+10000-…" where
  DuckDB's strftime prints it bare; the one formatting site strips the
  ISO sign prefix.

This suite replays representatives on every pytest run; the full sweep
is ``python tools/make_time_sf.py /tmp/spark_graft_sftime`` then
``python tools/check_oracle.py /tmp/spark_graft_sftime``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_time_sf import build as build_time

#: One representative per sftime divergence class, plus the
#: time-bucketing / windowing / calendar shapes that must stay correct
#: across the extremes.
TIME_REPS = [
    "user_sessionization_stats",    # epoch_sec floor class (gap test)
    "event_gap_histogram",          # same class, gap widths at the epoch
    "cohort_retention_matrix",      # weekly floor-div over negative secs
    "purchase_attribution_report",  # 7-day lookback window arithmetic
    "grouped_ewma_user_value",      # Arrow ns-range class (grouped map)
    "stream_ohlc_replay",           # +10000 window-end string form
    "dim_date_calendar",            # ISO weeks / leap day / year 1+9999
    "session_windows",              # session straddling the epoch flip
    "tumbling_hourly_stats",        # hour buckets floor at negative epoch
    "sliding_window_activity",      # sliding splits across the extremes
    "flagship_daily_rollup",        # keep-latest under microsecond ties
    "asof_last_view",               # as-of join across extreme orderings
]


@pytest.fixture(scope="module")
def time_sf_dir():
    d = f"/tmp/spark_graft_sftime_{os.getpid()}"
    build_time(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def time_duck(time_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{time_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TIME_REPS)
def test_time_parity(spark, time_sf_dir, time_duck, name):
    sdf = QUERIES[name](spark, time_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = time_duck.sql(ORACLES[name])
    dcols, drows = rel.columns, rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows), (
        f"{name}: spark={len(srows)} duck={len(drows)}\n"
        f"spark rows: {sorted(srows, key=str)[:10]}\n"
        f"duck rows: {sorted(drows, key=str)[:10]}"
    )
    assert table_hash(scols, srows) == table_hash(dcols, drows), (
        f"{name}: value-hash mismatch\n"
        f"spark rows: {sorted(srows, key=str)[:10]}\n"
        f"duck rows: {sorted(drows, key=str)[:10]}"
    )


def test_epoch_sec_floors_exactly(spark):
    """The operator-level contract pin: floored (never truncated) epoch
    seconds, exact at both ends of the timestamp range — including the
    year-9999 sub-second instant where any double-routed epoch math is
    off by one second."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators.quantize import epoch_sec

    rows = [
        (0, dt.datetime(1969, 12, 31, 23, 59, 59, 500000), -1),
        (1, dt.datetime(1969, 12, 31, 23, 59, 58, 123456), -2),
        (2, dt.datetime(1970, 1, 1, 0, 0, 0, 500000), 0),
        (3, dt.datetime(9999, 12, 31, 23, 59, 59, 999999), 253402300799),
        (4, dt.datetime(1, 1, 1, 0, 0, 1), -62135596799),
        (5, None, None),
    ]
    df = spark.createDataFrame(
        [(i, ts) for i, ts, _ in rows], "id int, ts timestamp"
    )
    got = {
        r.id: r.sec
        for r in df.select("id", epoch_sec("ts").alias("sec")).collect()
    }
    assert got == {i: want for i, _, want in rows}
