"""Time-series similarity operators (operators/timeseries.py)."""

from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import timeseries as T


def _series_df(spark, rows):
    return spark.createDataFrame(rows, "user_id long, series array<double>").withColumn(
        "n", F.size("series")
    )


def test_value_series_orders_and_filters(spark):
    from datetime import datetime

    rows = []
    for i in range(20):
        rows.append((1, datetime(2024, 1, 1, 0, i), 100 + i, float(i)))
    rows.append((2, datetime(2024, 1, 1), 1, 5.0))  # too short -> dropped
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = T.value_series(df, min_len=16).collect()
    assert len(got) == 1 and got[0].user_id == 1
    assert list(got[0].series) == [float(i) for i in range(20)]


def test_znorm_mean_zero_unit_var_and_constant_guard(spark):
    df = _series_df(
        spark,
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [7.0, 7.0, 7.0, 7.0])],
    )
    got = {r.user_id: list(r.z) for r in T.znorm_frame(df).collect()}
    z = got[1]
    assert abs(sum(z)) < 1e-9
    assert abs(sum(x * x for x in z) / len(z) - 1.0) < 1e-9
    assert got[2] == [0.0] * 4  # constant series -> zeros, not NaN


def test_paa_segment_means(spark):
    df = _series_df(spark, [(1, [float(i) for i in range(16)])])
    got = T.paa(F.col("series"), F.col("n"), 4)
    segs = df.select(got.alias("s")).collect()[0].s
    assert segs == [1.5, 5.5, 9.5, 13.5]  # means of 4-element quarters


def test_paa_short_series_yields_nulls_not_div_zero(spark):
    # n < segments makes some slice widths 0; those sketch elements must
    # come back NULL (not raise under ANSI, not poison with NaN).
    df = _series_df(spark, [(1, [1.0, 2.0, 3.0])])
    segs = df.select(T.paa(F.col("series"), F.col("n"), 8).alias("s")).collect()[0].s
    assert len(segs) == 8
    assert any(v is None for v in segs)
    present = [v for v in segs if v is not None]
    assert present and all(v == v for v in present)  # no NaN


def test_paa_topk_identical_series_rank_first(spark):
    base = [float(i % 5) for i in range(16)]
    other = [float((i * 3) % 7) for i in range(16)]
    df = _series_df(spark, [(1, base), (2, base), (3, other)])
    zf = T.znorm_frame(df)
    sk = zf.select("user_id", T.paa(F.col("z"), F.col("n"), 4).alias("sketch"))
    probes = sk.filter("user_id = 1")
    got = T.paa_topk(sk, probes, k=2, key_col="user_id").collect()
    assert got[0].neighbor_id == 2 and got[0].paa_dist == 0.0
    assert got[1].neighbor_id == 3 and got[1].paa_dist > 0.0


def test_sax_word_symbolization(spark):
    df = spark.createDataFrame(
        [(1, [-2.0, -0.3, 0.3, 2.0])], "user_id long, sketch array<double>"
    )
    got = df.select(T.sax_word(F.col("sketch")).alias("w")).collect()[0].w
    assert got == "abcd"
    # boundary values: breakpoints belong to the upper bucket
    df2 = spark.createDataFrame(
        [(1, [-0.6745, 0.0, 0.6745])], "user_id long, sketch array<double>"
    )
    assert df2.select(T.sax_word(F.col("sketch")).alias("w")).collect()[0].w == "bcd"


def test_user_value_trend_hand_fixture(spark):
    """Exact OLS on a known ramp: y = 100x cents => slope 100; flat and
    falling fixtures likewise."""
    import os
    import tempfile

    import duckdb
    import pandas as pd

    from cryptocurrency_data_pipeline_spark.queries import QUERIES

    rows = []
    base = pd.Timestamp("2026-01-01")
    # user 1: perfect ramp value = x (slope 100 cents/event)
    for x in range(5):
        rows.append((x, base + pd.Timedelta(minutes=x), 1, "a", float(x), None))
    # user 2: constant (slope 0)
    for x in range(4):
        rows.append((10 + x, base + pd.Timedelta(minutes=x), 2, "a", 7.5, None))
    # user 3: descending (slope -100)
    for x in range(3):
        rows.append((20 + x, base + pd.Timedelta(minutes=x), 3, "a", float(-x), None))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as td:
        duckdb.sql(
            "COPY (SELECT * FROM pdf) TO '"
            + os.path.join(td, "events.parquet") + "'"
        )
        got = {r.trend: r for r in QUERIES["user_value_trend"](spark, td).collect()}
    assert got["rising"].max_slope_cents == 100.0
    assert got["flat"].n_users == 1
    assert got["falling"].min_slope_cents == -100.0


def test_cusum_changepoint_hand_fixture(spark):
    """A level shift at index k maximizes |n*S_i - i*S_n| exactly at k."""
    import os
    import tempfile

    import duckdb
    import pandas as pd

    from cryptocurrency_data_pipeline_spark.queries import QUERIES

    rows = []
    base = pd.Timestamp("2026-01-01")
    # user 1: 6 zeros then 6 tens -> change point at i=6
    for x in range(12):
        rows.append(
            (x, base + pd.Timedelta(minutes=x), 1, "a",
             0.0 if x < 6 else 10.0, None)
        )
    # user 2: constant -> score 0 everywhere, change_index ties to 1
    for x in range(10):
        rows.append((100 + x, base + pd.Timedelta(minutes=x), 2, "a", 5.0, None))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    with tempfile.TemporaryDirectory() as td:
        duckdb.sql(
            "COPY (SELECT * FROM pdf) TO '"
            + os.path.join(td, "events.parquet") + "'"
        )
        got = {r.user_id: r for r in QUERIES["user_value_changepoint"](spark, td).collect()}
    assert got[1].change_index == 6
    # scaled score at the true break: |12*0 - 6*6000| = 36000
    assert got[1].cusum_score == 36000
    assert got[2].cusum_score == 0 and got[2].change_index == 1


def test_sax_word_null_segment_yields_null_word(spark):
    from cryptocurrency_data_pipeline_spark.operators import timeseries as ts

    df = spark.createDataFrame(
        [(1, [0.1, None, -0.9]), (2, [0.1, 0.8, -0.9])],
        "sid long, sketch array<double>",
    )
    out = {r.sid: r.w for r in df.select("sid", ts.sax_word(F.col("sketch")).alias("w")).collect()}
    # A null PAA segment must NOT silently symbolize as 'd' (top quartile).
    assert out[1] is None
    assert out[2] == "cda"


def test_paa_topk_excludes_null_distance_candidates(spark):
    from cryptocurrency_data_pipeline_spark.operators import timeseries as ts

    corpus = spark.createDataFrame(
        [("good", [1.0, 1.0]), ("poison", [None, 2.0]), ("q", [0.0, 0.0])],
        "user_id string, sketch array<double>",
    )
    probes = corpus.filter(F.col("user_id") == "q")
    out = ts.paa_topk(corpus, probes, k=2).collect()
    # Ascending sort would rank the NULL distance FIRST; it must instead
    # be excluded entirely.
    assert [r.neighbor_id for r in out] == ["good"]
