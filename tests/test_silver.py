"""Silver operators: schema split, projection, dedup, threshold routing.

The routing test replays the reference producer's 8-real + 3-injected
pattern (streaming/producer.py:33-76) and asserts the consumer's expected
routing: 9 good, 2 bad, 1 alert (FIXTURES.md §3).
"""

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators import silver


def _markets(spark, rows):
    cols = "id string, symbol string, name string, current_price double, market_cap long"
    return spark.createDataFrame(rows, cols)


def test_enforce_schema_split(spark):
    df = _markets(
        spark,
        [
            ("btc", "btc", "Bitcoin", 50000.0, 10**12),
            (None, "eth", "Ethereum", 3000.0, 10**11),
            ("doge", None, None, 0.1, 10**10),
        ],
    )
    valid, dlq = silver.enforce_schema_split(df, ["id", "symbol", "name"])
    assert valid.count() == 1
    dlq_rows = {r.error_reason for r in dlq.collect()}
    assert dlq_rows == {
        "missing required field: id",
        "missing required field: symbol | missing required field: name",
    }
    assert set(dlq.columns) == {"raw_data", "error_reason", "timestamp", "validation_type"}
    # raw_data is replayable JSON of the original row
    assert '"symbol":"eth"' in [r.raw_data for r in dlq.collect() if "id" in r.error_reason][0]


def test_project_cast(spark):
    df = _markets(spark, [("btc", "btc", "Bitcoin", 50000.0, 10**12)])
    out = silver.project_cast(
        df, [("id", "coin_id", "string"), ("market_cap", "market_cap", "double")]
    )
    assert out.columns == ["coin_id", "market_cap"]
    assert dict(out.dtypes)["market_cap"] == "double"


def test_dedup_latest_deterministic(spark):
    df = spark.createDataFrame(
        [
            ("btc", "2024-01-01", 1, 100.0),
            ("btc", "2024-01-01", 2, 200.0),   # later ts wins
            ("btc", "2024-01-02", 3, 300.0),
            ("eth", "2024-01-01", 2, 10.0),
            ("eth", "2024-01-01", 2, 20.0),    # ts tie -> higher value wins (tiebreak)
        ],
        "coin_id string, update_date string, ts long, value double",
    )
    out = silver.dedup_latest(df, ["coin_id", "update_date"], "ts", tiebreak=["value"])
    got = {(r.coin_id, r.update_date): r.value for r in out.collect()}
    assert got == {
        ("btc", "2024-01-01"): 200.0,
        ("btc", "2024-01-02"): 300.0,
        ("eth", "2024-01-01"): 20.0,
    }


def test_stream_routing_8_plus_3(spark):
    """Producer fixture: 8 normal coins + tiny-cap + crashed + surge."""
    normal = [
        (f"coin-{i}", f"c{i}", f"Coin {i}", 100.0 + i, 5_000_000_000, 1.0, 2.0)
        for i in range(8)
    ]
    anomalies = [
        ("tiny-cap", "tny", "TinyCap", 5.0, 500_000, 0.0, 0.0),       # cap < 1e6 -> bad
        ("crashed", "crsh", "Crashed", 50.0, 5_000_000, -12.0, -18.5),  # drop < -15 -> bad
        ("surge", "srg", "Surge", 75.0, 8_000_000, 15.0, 25.0),       # pct > 10 -> alert
    ]
    df = spark.createDataFrame(
        normal + anomalies,
        "coin_id string, symbol string, name string, current_price double, "
        "market_cap long, price_change_24h double, price_change_percentage_24h double",
    )
    good, bad, alert = silver.route_by_rules(df, silver.validation_reasons())
    assert good.count() == 9
    assert bad.count() == 2
    assert alert.count() == 1
    reasons = {r.coin_id: r.error_reason for r in bad.collect()}
    assert "market cap below minimum 1000000" in reasons["tiny-cap"]
    assert "price drop exceeds 15.0%" in reasons["crashed"]
    assert alert.collect()[0].coin_id == "surge"


def test_multi_reason_join(spark):
    df = spark.createDataFrame(
        [("dead", "d", "Dead", -1.0, 100, -20.0, -99.0)],
        "coin_id string, symbol string, name string, current_price double, "
        "market_cap long, price_change_24h double, price_change_percentage_24h double",
    )
    _, bad, _ = silver.route_by_rules(df, silver.validation_reasons())
    reason = bad.collect()[0].error_reason
    assert reason.count(" | ") == 2  # price<=0, cap, drop all fire


def test_validation_decimal_thresholds_money_safe(spark):
    """The reference compares thresholds as Decimal (streaming/
    consumer.py:21-24). A decimal drop of -15.0000000000000001% sits past
    the -15.0 threshold, but rounds to double -15.0 exactly (within half
    an ulp), so the float-literal path passes it; decimal thresholds must
    flag it."""
    from decimal import Decimal

    from cryptocurrency_data_pipeline_spark.operators import silver

    df = spark.createDataFrame(
        [
            ("edge", Decimal("1.00"), Decimal("2000000"),
             Decimal("-15.0000000000000001")),
            ("ok", Decimal("1.00"), Decimal("2000000"),
             Decimal("-14.9999999999999999")),
        ],
        "coin_id string, current_price decimal(38,18), "
        "market_cap decimal(38,16), price_change_percentage_24h decimal(20,16)",
    )
    dec = df.select(
        "coin_id", silver.validation_reasons(decimal_thresholds=True).alias("r")
    ).collect()
    got = {r.coin_id: list(r.r) for r in dec}
    assert got["edge"] == ["price drop exceeds 15.0%"]
    assert got["ok"] == []

    # The float-literal path demonstrates the hazard this variant closes:
    # double promotion rounds the edge drop back onto the threshold.
    flt = df.select(
        "coin_id", silver.validation_reasons().alias("r")
    ).collect()
    assert {r.coin_id: list(r.r) for r in flt}["edge"] == []
