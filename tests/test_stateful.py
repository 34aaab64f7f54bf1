"""applyInPandasWithState: per-coin price-delta tracking with cross-restart
state (the reference consumer alerts on a producer-computed pct; here the
engine remembers the previous price itself via the state store)."""

from datetime import datetime, timedelta, timezone

from cryptocurrency_data_pipeline_spark.streaming import pipeline, producer, stateful


def _run(spark, src, out, ckpt):
    ticks = pipeline.read_tick_stream(spark, src)
    deltas = stateful.stateful_price_deltas(ticks, alert_pct=10.0)
    q = (
        deltas.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_deltas_across_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

    # Run 1: two btc ticks (100 -> 125, +25% alert), one eth tick.
    producer.write_batch(
        src,
        [
            producer.make_tick("btc", 100.0, 10**9, ts=t0),
            producer.make_tick("btc", 125.0, 10**9, ts=t0 + timedelta(minutes=1)),
            producer.make_tick("eth", 10.0, 10**9, ts=t0),
        ],
    )
    _run(spark, src, out, ckpt)

    rows = {
        (r.coin_id, r.current_price): r
        for r in spark.read.parquet(out).collect()
    }
    assert len(rows) == 3
    assert rows[("btc", 100.0)].prev_price is None
    assert rows[("btc", 125.0)].prev_price == 100.0
    assert rows[("btc", 125.0)].price_change_pct == 25.0
    assert rows[("btc", 125.0)].is_alert is True
    assert rows[("eth", 10.0)].prev_price is None

    # Run 2 (restart, same checkpoint): state store must remember btc=125
    # and eth=10 — the new ticks' prev_price comes from the PREVIOUS run.
    producer.write_batch(
        src,
        [
            producer.make_tick("btc", 120.0, 10**9, ts=t0 + timedelta(minutes=2)),
            producer.make_tick("eth", 10.5, 10**9, ts=t0 + timedelta(minutes=2)),
        ],
    )
    _run(spark, src, out, ckpt)

    rows = {
        (r.coin_id, r.current_price): r
        for r in spark.read.parquet(out).collect()
    }
    assert len(rows) == 5
    assert rows[("btc", 120.0)].prev_price == 125.0
    assert rows[("btc", 120.0)].price_change_pct == -4.0
    assert rows[("btc", 120.0)].is_alert is False
    assert rows[("eth", 10.5)].prev_price == 10.0
    assert rows[("eth", 10.5)].is_alert is False  # +5% below threshold


def test_stateful_ordering_within_batch(spark, tmp_path):
    """Out-of-order arrival inside one batch is sorted by event time."""
    src, out, ckpt = (str(tmp_path / d) for d in ("s2", "o2", "c2"))
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    producer.write_batch(
        src,
        [
            producer.make_tick("btc", 200.0, 10**9, ts=t0 + timedelta(minutes=5)),
            producer.make_tick("btc", 100.0, 10**9, ts=t0),
        ],
    )
    _run(spark, src, out, ckpt)
    by_price = {r.current_price: r for r in spark.read.parquet(out).collect()}
    assert by_price[100.0].prev_price is None
    assert by_price[200.0].prev_price == 100.0
    assert by_price[200.0].price_change_pct == 100.0


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the tracker closure."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self.removed = True
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_tracker_nan_price_and_null_ts_do_not_poison_state():
    """A null tick (NaN price; NULL event time arrives as the
    NULL_TS_US int64 sentinel — NULL longs are banned from the Arrow
    transfer because one NaN degrades the whole column to float64,
    see grouped.NULL_TS_US) must be skipped, not stored: 'is None'
    checks pass for NaN, so the old guards stored NaN (poisoning every
    later delta)."""
    import numpy as np
    import pandas as pd

    from cryptocurrency_data_pipeline_spark.operators.grouped import NULL_TS_US

    track = stateful._make_tracker(alert_pct=10.0)
    st = _FakeState()
    pdf = pd.DataFrame(
        {
            "coin_id": ["btc"] * 3,
            # Null-free int64, exactly what the JVM-side coalesce hands
            # the tracker: the null tick carries the MAX sentinel.
            "event_time_us": np.array(
                [1704067200000000, NULL_TS_US, 1704067320000000],
                dtype="int64",
            ),
            "current_price": [100.0, float("nan"), 110.0],
        }
    )
    assert pdf["event_time_us"].dtype == "int64"
    [out] = list(track(("btc",), [pdf], st))
    # Sentinel (int64 MAX) sorts last — order is (100.0, 110.0, NaN-price).
    by_price = {
        None if pd.isna(p) else p: pct
        for p, pct in zip(out["current_price"], out["price_change_pct"])
    }
    assert pd.isna(by_price[100.0])          # first real tick: no prev
    assert round(by_price[110.0], 6) == 10.0  # 100 -> 110, NaN skipped
    assert pd.isna(by_price[None])           # null tick emits no pct
    assert st.get[0] == 110.0  # state holds the last REAL price, not NaN


def test_tracker_timeout_removes_state():
    import pandas as pd

    track = stateful._make_tracker(alert_pct=10.0, timeout_ms=60_000)
    st = _FakeState(value=(100.0, 0.0), timed_out=True)
    assert list(track(("btc",), [], st)) == []
    assert st.removed

    # With data, the timeout is re-armed after the state update.
    st2 = _FakeState()
    pdf = pd.DataFrame(
        {
            "coin_id": ["btc"],
            "event_time_us": [1704067200000000],
            "current_price": [5.0],
        }
    )
    list(track(("btc",), [pdf], st2))
    assert st2.get[0] == 5.0 and st2.timeout_set == 60_000


def test_timeout_conf_requires_duration(spark):
    import pytest

    ticks = spark.createDataFrame(
        [], "coin_id string, event_time timestamp, current_price double"
    )
    with pytest.raises(ValueError, match="timeout_ms"):
        stateful.stateful_price_deltas(ticks, timeout="ProcessingTimeTimeout")
    with pytest.raises(ValueError, match="only applies"):
        stateful.stateful_price_deltas(ticks, timeout_ms=1000)


def test_stateful_deltas_survive_sentinel_year_ticks(spark, tmp_path):
    """Year-1 and year-9999 event times — epoch-default and
    "never-expires" sentinels, routine in crawl-scale feeds — must flow
    through the stateful operator, not abort the Arrow batch: pandas'
    datetime64[ns] spans only 1677..2262, so shipping raw timestamps
    into applyInPandasWithState would kill the whole STREAMING query on
    one such tick.  Event time crosses as int64 micros and round-trips
    exactly (sftime input class, tools/make_time_sf.py)."""
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    lo = datetime(1, 1, 1, 0, 0, 1, tzinfo=timezone.utc)
    hi = datetime(9999, 12, 31, 23, 59, 59, 999999, tzinfo=timezone.utc)
    producer.write_batch(
        src,
        [
            producer.make_tick("btc", 100.0, 10**9, ts=lo),
            producer.make_tick("btc", 125.0, 10**9, ts=hi),
        ],
    )
    _run(spark, src, out, ckpt)

    # Collect epoch micros, not datetime objects: PySpark's OWN
    # TimestampType.fromInternal goes through datetime.fromtimestamp in
    # the driver's LOCAL timezone, which walks a year-1 instant into
    # year 0 (unrepresentable) whenever local time is west of UTC — a
    # py4j display limit, not an engine one.
    from pyspark.sql import functions as F

    rows = sorted(
        spark.read.parquet(out)
        .select(
            F.unix_micros("event_time").alias("us"),
            "current_price", "prev_price", "price_change_pct",
        )
        .collect(),
        key=lambda r: r.us,
    )
    assert [r.current_price for r in rows] == [100.0, 125.0]
    # Event-time order held across the sign/precision extremes, the
    # delta chained through state, and both timestamps round-tripped.
    assert rows[1].prev_price == 100.0 and rows[1].price_change_pct == 25.0
    # Exact integer micros via timedelta division — float .timestamp()
    # rounds the year-9999 sub-second instant UP a whole second (the
    # same 2^53 trap epoch_sec exists to dodge).
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    assert rows[0].us == (lo - epoch) // timedelta(microseconds=1)
    assert rows[1].us == (hi - epoch) // timedelta(microseconds=1)


def test_stateful_null_ts_mixed_with_year9999_stays_exact(spark, tmp_path):
    """A NULL event time in the SAME batch as a year-9999 tick — the
    advisor-r11 case: a NULL long would degrade the Arrow int64 micros
    column to float64, rounding the 2.5e17-micros year-9999 value by up
    to ~32us (inexact round-trip, invertible sub-32us ties).  With the
    JVM-side NULL_TS_US sentinel the column stays int64: the 9999 tick
    round-trips exactly, the NULL comes back as a NULL timestamp, and
    the null-ts row sorts last (where NaT sorted before)."""
    src, out, ckpt = (str(tmp_path / d) for d in ("s9", "o9", "c9"))
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    hi = datetime(9999, 12, 31, 23, 59, 59, 999999, tzinfo=timezone.utc)
    no_ts = producer.make_tick("btc", 110.0, 10**9)
    no_ts["timestamp"] = None
    producer.write_batch(
        src,
        [
            producer.make_tick("btc", 90.0, 10**9, ts=t0),
            producer.make_tick("btc", 100.0, 10**9, ts=hi),
            no_ts,
        ],
    )
    _run(spark, src, out, ckpt)

    from pyspark.sql import functions as F

    rows = spark.read.parquet(out).select(
        F.unix_micros("event_time").alias("us"),
        "current_price", "prev_price", "price_change_pct",
    ).collect()
    by_price = {r.current_price: r for r in rows}
    assert len(rows) == 3
    # Sentinel sorts last: chain is 90 (t0) -> 100 (9999) -> 110 (null).
    assert by_price[90.0].prev_price is None
    assert by_price[100.0].prev_price == 90.0
    assert by_price[110.0].prev_price == 100.0
    assert round(by_price[110.0].price_change_pct, 6) == 10.0
    # NULL round-trips as NULL — the sentinel never leaks to callers.
    assert by_price[110.0].us is None
    # Year-9999 micros are EXACT (float64 transport rounded them).
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    assert by_price[100.0].us == (hi - epoch) // timedelta(microseconds=1)
