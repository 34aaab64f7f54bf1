"""Incremental materialized rollups: partial state merges losslessly,
refresh touches only its own partition, merged HLL == single-pass HLL."""

import glob
import os

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators import matview as mv
from cryptocurrency_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        load_table(spark, SF, "events")
        .where(F.col("value").isNotNull())
        .withColumn("day", F.to_date("ts"))
    )


def test_incremental_refresh_equals_full_build(spark, tmp_path):
    ev = _events(spark)
    last_day = ev.agg(F.max("day")).collect()[0][0]
    path = str(tmp_path / "partials")

    # Build WITHOUT the last day, then refresh it in incrementally.
    mv.write_partials(
        mv.build_partials(
            ev.where(F.col("day") < F.lit(last_day)),
            "day", ["event_type"], "value", "user_id",
        ),
        path, "day",
    )
    n = mv.refresh_partition(
        spark, path,
        ev.where(F.col("day") == F.lit(last_day)),
        "day", ["event_type"], "value", "user_id",
    )
    assert n == 1

    got = mv.merge_partials(spark.read.parquet(path), ["event_type"])
    want = mv.merge_partials(
        mv.build_partials(ev, "day", ["event_type"], "value", "user_id"),
        ["event_type"],
    )
    as_map = lambda df: {
        r.event_type: (r.n_rows, r.sum_cents, r.min_value, r.max_value, r.approx_distinct)
        for r in df.collect()
    }
    assert as_map(got) == as_map(want)


def test_refresh_leaves_other_partitions_untouched(spark, tmp_path):
    ev = _events(spark)
    last_day = ev.agg(F.max("day")).collect()[0][0]
    path = str(tmp_path / "partials")
    mv.write_partials(
        mv.build_partials(ev, "day", ["event_type"], "value", "user_id"),
        path, "day",
    )
    other = sorted(
        d for d in glob.glob(f"{path}/day=*") if f"day={last_day}" not in d
    )
    before = {f: os.path.getmtime(f) for d in other for f in glob.glob(f"{d}/*.parquet")}

    mv.refresh_partition(
        spark, path, ev.where(F.col("day") == F.lit(last_day)),
        "day", ["event_type"], "value", "user_id",
    )
    after = {f: os.path.getmtime(f) for d in other for f in glob.glob(f"{d}/*.parquet")}
    assert before and after == before  # dynamic overwrite: one partition rewritten


def test_merged_sketch_matches_single_pass_and_exact(spark):
    ev = _events(spark)
    merged = mv.merge_partials(
        mv.build_partials(ev, "day", ["event_type"], "value", "user_id"),
        ["event_type"],
    ).select("event_type", "approx_distinct")
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14)))
        .alias("direct_est"),
        F.countDistinct("user_id").alias("exact"),
    )
    rows = merged.join(direct, "event_type").collect()
    assert rows
    for r in rows:
        # Same lgConfigK ⇒ identical HLL registers whether built in one
        # pass or unioned from per-day sketches.
        assert r.approx_distinct == r.direct_est
        assert abs(r.approx_distinct - r.exact) <= 0.02 * r.exact + 1


def test_range_query_from_partials_matches_raw_scan(spark, tmp_path):
    ev = _events(spark)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    lo, hi = days[2], days[-3]
    partials = mv.build_partials(ev, "day", ["event_type"], "value", "user_id")
    got = mv.merge_partials(
        partials.where(F.col("day").between(F.lit(lo), F.lit(hi))),
        ["event_type"],
    )
    want = (
        ev.where(F.col("day").between(F.lit(lo), F.lit(hi)))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("sum_cents"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    g = {r.event_type: (r.n_rows, r.sum_cents, r.min_value, r.max_value)
         for r in got.collect()}
    w = {r.event_type: (r.n_rows, r.sum_cents, r.min_value, r.max_value)
         for r in want.collect()}
    assert g == w


def test_streaming_materialized_view_epochs_merge_and_compact(spark, tmp_path):
    """Stream → per-epoch partials → merged view == static aggregate;
    epoch replay is idempotent; compaction folds epochs losslessly."""
    ev = _events(spark).select("event_type", "value", "user_id")
    src = str(tmp_path / "src")
    half_a = ev.where(F.pmod(F.col("user_id"), F.lit(2)) == 0)
    half_b = ev.where(F.pmod(F.col("user_id"), F.lit(2)) == 1)
    half_a.coalesce(1).write.mode("append").json(src)
    half_b.coalesce(1).write.mode("append").json(src)

    view = str(tmp_path / "view")
    stream = (
        spark.readStream.schema("event_type string, value double, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            lambda b, e: mv.write_epoch_partials(
                b, e, view, ["event_type"], "value", "user_id"
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    epochs = spark.read.parquet(view).select("epoch").distinct().count()
    assert epochs == 2  # one file per micro-batch

    merged = mv.read_merged_partials(spark, view, ["event_type"])
    want = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("want_n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("want_cents"),
        F.countDistinct("user_id").alias("exact"),
    )
    rows = merged.join(want, "event_type").collect()
    assert rows
    for r in rows:
        assert (r.n_rows, r.sum_cents) == (r.want_n, r.want_cents)
        # cross-epoch distinct via sketch union, not per-batch sums
        assert abs(r.approx_distinct - r.exact) <= 0.02 * r.exact + 1
    before = {(r.event_type, r.n_rows, r.sum_cents) for r in merged.collect()}

    # Compaction folds all epochs into one partial row set, losslessly.
    mv.compact_partials(spark, view, ["event_type"])
    assert spark.read.parquet(view).select("epoch").distinct().count() == 1
    after_df = mv.read_merged_partials(spark, view, ["event_type"])
    assert {(r.event_type, r.n_rows, r.sum_cents) for r in after_df.collect()} == before


def test_epoch_partials_replay_is_idempotent(spark, tmp_path):
    ev = _events(spark).select("event_type", "value", "user_id")
    view = str(tmp_path / "view")
    a = ev.where(F.pmod(F.col("user_id"), F.lit(2)) == 0)
    b = ev.where(F.pmod(F.col("user_id"), F.lit(2)) == 1)
    mv.write_epoch_partials(a, 0, view, ["event_type"], "value", "user_id")
    mv.write_epoch_partials(b, 1, view, ["event_type"], "value", "user_id")
    want = {(r.event_type, r.n_rows, r.sum_cents, r.approx_distinct)
            for r in mv.read_merged_partials(spark, view, ["event_type"]).collect()}
    # Crash-replay of epoch 0 overwrites its own partition: no drift.
    mv.write_epoch_partials(a, 0, view, ["event_type"], "value", "user_id")
    got = {(r.event_type, r.n_rows, r.sum_cents, r.approx_distinct)
           for r in mv.read_merged_partials(spark, view, ["event_type"]).collect()}
    assert got == want


def test_histogram_quantiles_merge_and_error_bound(spark):
    """Split-merged histogram quantiles equal the single-pass ones and
    land within one bin width of the exact quantile."""
    ev = _events(spark)
    lo, hi, bins = 0.0, 1000.0, 50
    width = (hi - lo) / bins

    per_day = mv.build_histogram_partials(
        ev, "day", ["event_type"], "value", lo, hi, bins
    )
    single = mv.build_histogram_partials(
        ev.withColumn("one", F.lit(1)), "one", ["event_type"], "value", lo, hi, bins
    )
    q_day = mv.histogram_quantiles(per_day, ["event_type"], [0.5, 0.95], lo, hi, bins)
    q_one = mv.histogram_quantiles(single, ["event_type"], [0.5, 0.95], lo, hi, bins)
    m = lambda df: {r.event_type: (r.n_values, r.p50, r.p95) for r in df.collect()}
    assert m(q_day) == m(q_one)  # partition split is invisible after merge

    exact = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.95)").alias("e95"),
    )
    rows = q_day.join(exact, "event_type").collect()
    assert rows
    for r in rows:
        assert abs(r.p50 - r.e50) <= width + 1e-9, (r.event_type, r.p50, r.e50)
        assert abs(r.p95 - r.e95) <= width + 1e-9, (r.event_type, r.p95, r.e95)


def test_upsert_partition_folds_late_rows_additively(spark, tmp_path):
    """Late rows for an existing day fold INTO its partial state (counts
    add, sketches union); result equals the full rebuild; other
    partitions' files untouched."""
    ev = _events(spark)
    last_day = ev.agg(F.max("day")).collect()[0][0]
    path = str(tmp_path / "partials")
    late = ev.where(
        (F.col("day") == F.lit(last_day)) & (F.pmod("user_id", F.lit(3)) == 0)
    )
    ontime = ev.exceptAll(late)

    mv.write_partials(
        mv.build_partials(ontime, "day", ["event_type"], "value", "user_id"),
        path, "day",
    )
    other = sorted(
        d for d in glob.glob(f"{path}/day=*") if f"day={last_day}" not in d
    )
    before = {f: os.path.getmtime(f) for d in other for f in glob.glob(f"{d}/*.parquet")}

    n = mv.upsert_partition(
        spark, path, late, "day", ["event_type"], "value", "user_id"
    )
    assert n == 1
    after = {f: os.path.getmtime(f) for d in other for f in glob.glob(f"{d}/*.parquet")}
    assert after == before  # only the late day rewritten

    got = mv.merge_partials(spark.read.parquet(path), ["event_type"])
    want = mv.merge_partials(
        mv.build_partials(ev, "day", ["event_type"], "value", "user_id"),
        ["event_type"],
    )
    m = lambda df: {
        r.event_type: (r.n_rows, r.sum_cents, r.min_value, r.max_value, r.approx_distinct)
        for r in df.collect()
    }
    assert m(got) == m(want)


def test_histogram_quantile_labels_exact_and_collision_guarded(spark):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators.matview import _q_label

    assert _q_label(0.5) == "p50"
    assert _q_label(0.95) == "p95"
    assert _q_label(0.29) == "p29"      # int() truncation would say p28
    assert _q_label(0.999) == "p99_9"   # ...and would say p99
    assert _q_label(0.565) == "p56_5"
    df = spark.createDataFrame([(1, 0)], "bin int, n long").withColumn(
        "k", F.lit("a")
    )
    with pytest.raises(ValueError, match="collide"):
        mv.histogram_quantiles(df, ["k"], [0.5, 0.5], 0.0, 1.0, 10)


def test_upsert_partition_numeric_looking_string_partition(spark, tmp_path):
    """Partition discovery re-infers a string part_col with numeric-looking
    values as int on read-back; upsert must still fold against it (the
    read pins inference off and casts to the fresh side's type)."""
    schema = "day string, event_type string, value double, user_id long"
    base = spark.createDataFrame(
        [("20240101", "a", 1.0, 1), ("20240102", "a", 2.0, 2)], schema
    )
    path = str(tmp_path / "partials")
    mv.write_partials(
        mv.build_partials(base, "day", ["event_type"], "value", "user_id"),
        path, "day",
    )
    late = spark.createDataFrame([("20240101", "a", 3.0, 3)], schema)
    n = mv.upsert_partition(
        spark, path, late, "day", ["event_type"], "value", "user_id"
    )
    assert n == 1
    got = mv.merge_partials(
        spark.read.parquet(path), ["event_type"]
    ).collect()[0]
    assert got.n_rows == 3
    assert got.sum_cents == 600  # 100 + 200 + 300


def test_upsert_partition_null_partition_folds_not_replaces(spark, tmp_path):
    """Late rows for the NULL partition (__HIVE_DEFAULT_PARTITION__) must
    fold into its existing state — a plain-equality semi-join drops the
    null key and the dynamic overwrite would then silently replace the
    partition with only the fresh partials."""
    schema = "day string, event_type string, value double, user_id long"
    base = spark.createDataFrame(
        [(None, "a", 1.0, 1), (None, "a", 2.0, 2), ("d1", "a", 4.0, 3)], schema
    )
    path = str(tmp_path / "partials")
    mv.write_partials(
        mv.build_partials(base, "day", ["event_type"], "value", "user_id"),
        path, "day",
    )
    late = spark.createDataFrame([(None, "a", 3.0, 4)], schema)
    n = mv.upsert_partition(
        spark, path, late, "day", ["event_type"], "value", "user_id"
    )
    assert n == 1
    got = mv.merge_partials(spark.read.parquet(path), ["event_type"]).collect()[0]
    assert got.n_rows == 4          # 2 existing null-day + 1 late + 1 d1
    assert got.sum_cents == 1000    # 100 + 200 + 300 + 400


def test_compact_preserves_replay_idempotency(spark, tmp_path):
    """The compaction watermark keeps epoch replays no-ops AFTER their
    partitions were folded away: without it, a crash-replayed epoch
    re-lands beside the folded partition and double-counts."""
    from cryptocurrency_data_pipeline_spark.operators import matview as mv

    path = str(tmp_path / "epochs")

    def batch(ids):
        return spark.createDataFrame(
            [(i, float(i), f"u{i}") for i in ids], "k long, v double, u string"
        ).withColumn("g", F.lit("all"))

    for epoch, ids in enumerate([[1, 2], [3], [4, 5]]):
        mv.write_epoch_partials(batch(ids), epoch, path, ["g"], "v", "u")
    before = mv.read_merged_partials(spark, path, ["g"]).collect()[0]
    assert before.n_rows == 5

    assert mv.compact_partials(spark, path, ["g"]) >= 1
    assert mv.compacted_through(path) == 2
    # Replay of an already-folded epoch: a no-op, not a double count.
    mv.write_epoch_partials(batch([4, 5]), 2, path, ["g"], "v", "u")
    after = mv.read_merged_partials(spark, path, ["g"]).collect()[0]
    assert (after.n_rows, after.sum_cents) == (before.n_rows, before.sum_cents)
    # A genuinely NEW epoch still lands.
    mv.write_epoch_partials(batch([6]), 3, path, ["g"], "v", "u")
    assert mv.read_merged_partials(spark, path, ["g"]).collect()[0].n_rows == 6


def test_upsert_partition_bootstraps_missing_table(spark, tmp_path):
    from cryptocurrency_data_pipeline_spark.operators import matview as mv

    path = str(tmp_path / "fresh_upsert")
    rows = spark.createDataFrame(
        [("d1", 1.0, "u1"), ("d1", 2.0, "u2")], "day string, v double, u string"
    ).withColumn("g", F.lit("all"))
    # First-ever call on a nonexistent path must bootstrap, not crash.
    assert mv.upsert_partition(spark, path, rows, "day", ["g"], "v", "u") == 1
    got = mv.merge_partials(spark.read.parquet(path).drop("day"), ["g"]).collect()[0]
    assert got.n_rows == 2 and got.sum_cents == 300


def test_histogram_rejects_degenerate_bounds_and_excludes_nan(spark):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import matview as mv

    df = spark.createDataFrame(
        [("d", 1.0), ("d", float("nan")), ("d", 2.0), ("d", None)],
        "day string, v double",
    )
    with pytest.raises(ValueError, match="hi > lo"):
        mv.build_histogram_partials(df, "day", [], "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="n_bins"):
        mv.build_histogram_partials(df, "day", [], "v", lo=0.0, hi=1.0, n_bins=0)
    parts = mv.build_histogram_partials(df, "day", [], "v", lo=0.0, hi=4.0, n_bins=4)
    # NaN and null both excluded: 2 real values only.
    assert parts.agg(F.sum("n")).collect()[0][0] == 2
