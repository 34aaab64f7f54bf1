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
