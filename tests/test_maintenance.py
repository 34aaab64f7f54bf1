"""Compaction: many small files → few right-sized files, rows intact,
atomic swap (no leftover temp dir)."""

import glob
import os

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators.maintenance import compact_parquet
from cryptocurrency_data_pipeline_spark.sources.tables import load_table


def test_compact_shrinks_file_count_preserves_rows(spark, tmp_path):
    src = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_fragmented")
    src.repartition(64).write.parquet(path)  # simulate streaming small files
    assert len(glob.glob(f"{path}/part-*.parquet")) == 64
    before = src.count()
    checksum_before = (
        spark.read.parquet(path).agg(F.sum(F.hash("event_id"))).collect()[0][0]
    )

    n = compact_parquet(spark, path, target_file_bytes=1 << 20)

    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == n < 64
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    assert after_df.agg(F.sum(F.hash("event_id"))).collect()[0][0] == checksum_before
    # atomic swap left no temp dirs behind
    assert not [d for d in os.listdir(tmp_path) if "__compact_" in d]


def test_compact_with_sort_col_clusters(spark, tmp_path):
    src = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "li_fragmented")
    src.repartition(32).write.parquet(path)

    compact_parquet(spark, path, target_file_bytes=1 << 20, sort_col="l_shipdate")

    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        row = spark.read.parquet(f).agg(
            F.min("l_shipdate"), F.max("l_shipdate")
        ).collect()[0]
        spans.append((row[0], row[1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_zorder_key_matches_python_morton(spark):
    from cryptocurrency_data_pipeline_spark.operators.maintenance import zorder_key

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (255, 256)]
    df = spark.createDataFrame(rows, "su long, sv long")
    got = [
        r.z for r in df.select(zorder_key(["su", "sv"]).alias("z"))
        .orderBy("su", "sv").collect()
    ]
    want = [morton(x, y) for x, y in sorted(rows)]
    assert got == want
    # Locality: neighbors in both dims are closer in z than far points.
    assert abs(morton(10, 10) - morton(11, 10)) < abs(morton(10, 10) - morton(40000, 10))


def test_zorder_layout_is_range_partition_and_sorted(spark):
    from cryptocurrency_data_pipeline_spark.operators.maintenance import zorder_layout

    df = spark.range(1000).select(
        (F.col("id") % 100).alias("su"), (F.col("id") % 37).alias("sv")
    )
    out = zorder_layout(df, ["su", "sv"], n_files=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert "Sort [" in plan
    # Within every partition the morton key is non-decreasing.
    def check(it):
        prev = None
        for row in it:
            if prev is not None and row["__z"] < prev:
                yield row
            prev = row["__z"]
    bad = out.rdd.mapPartitions(lambda it: check(it)).count()
    assert bad == 0


def test_zorder_written_files_have_narrow_multi_dim_envelopes(spark, tmp_path):
    from cryptocurrency_data_pipeline_spark.operators.maintenance import zorder_layout

    # 64x64 grid scaled to the 16-bit domain: both dims uniform.
    df = spark.range(4096).select(
        ((F.col("id") % 64) * 1024).alias("su"),
        ((F.col("id") / 64).cast("long") * 1024).alias("sv"),
    )
    out = str(tmp_path / "zorded")
    zorder_layout(df, ["su", "sv"], n_files=4).write.parquet(out)

    files = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("su").alias("su0"), F.max("su").alias("su1"),
            F.min("sv").alias("sv0"), F.max("sv").alias("sv1"),
            F.min("__z").alias("z0"), F.max("__z").alias("z1"),
        )
        .collect()
    )
    assert len(files) == 4
    # Z-ranges across files are pairwise disjoint (range partitioning).
    zr = sorted((r.z0, r.z1) for r in files)
    for (a0, a1), (b0, b1) in zip(zr, zr[1:]):
        assert a1 < b0
    # The data-skipping claim: every file's envelope is narrower than the
    # full domain in BOTH dimensions simultaneously is impossible for a
    # linear order, but z-order keeps the AVERAGE per-file area far below
    # the full grid — a single-column sort pins one dim narrow and leaves
    # the other at full width (area ratio ~= 1/n_files only in one dim).
    full_area = (64 * 1024) ** 2
    areas = [
        (r.su1 - r.su0 + 1024) * (r.sv1 - r.sv0 + 1024) for r in files
    ]
    assert sum(areas) / len(areas) <= full_area / 2


def test_stats_manifest_prunes_files_and_result_is_exact(spark, tmp_path):
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    src = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_clustered")
    # Range-cluster on the stat column so per-file envelopes are narrow.
    src.repartitionByRange(8, "o_totalprice").sortWithinPartitions(
        "o_totalprice"
    ).write.parquet(path)

    n_indexed = mt.write_stats_manifest(spark, path, ["o_totalprice"])
    assert n_indexed == len(glob.glob(f"{path}/part-*.parquet")) == 8

    lo, hi = 1000.0, 20000.0
    df, report = mt.read_with_skipping(spark, path, {"o_totalprice": (lo, hi)})
    assert report["files_total"] == 8
    assert report["files_skipped"] >= 4  # selective range on clustered layout
    assert report["files_read"] + report["files_skipped"] == 8
    # The scan really plans only the surviving files.
    assert len(df.inputFiles()) == report["files_read"]
    # Exactness: identical to the unpruned filtered scan.
    want = src.where(
        (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    ).count()
    assert df.count() == want


def test_stats_skipping_half_open_empty_and_unindexed(spark, tmp_path):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    df.repartitionByRange(4, "v").write.parquet(path)
    mt.write_stats_manifest(spark, path, ["v"])

    # Half-open: only a lower bound.
    got, rep = mt.read_with_skipping(spark, path, {"v": (90.0, None)})
    assert got.count() == 10 and rep["files_skipped"] >= 2
    # Predicate outside the domain: every file pruned, empty frame, schema kept.
    got, rep = mt.read_with_skipping(spark, path, {"v": (1e9, None)})
    assert rep["files_read"] == 0 and got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "v"]
    with pytest.raises(ValueError, match="no stats recorded"):
        mt.read_with_skipping(spark, path, {"id": (0, 1)})


def test_snapshot_versioning_time_travel_and_vacuum(spark, tmp_path):
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "versioned")
    base = spark.range(10).selectExpr("id", "id * 2 AS v")
    assert mt.write_snapshot(base, table) == 1
    assert mt.write_snapshot(base.filter("id < 5"), table) == 2
    # Hold a reader on v1, then write v3: the held version is untouched.
    v1 = mt.read_snapshot(spark, table, 1)
    assert mt.write_snapshot(base.filter("id < 3"), table) == 3
    assert v1.count() == 10
    assert mt.read_snapshot(spark, table).count() == 3  # default: current
    snaps = mt.list_snapshots(table)
    assert [(s["version"], s["n_rows"], s["current"]) for s in snaps] == [
        (1, 10, False), (2, 5, False), (3, 3, True),
    ]

    dropped = mt.vacuum_snapshots(table, keep_last=2)
    assert dropped == [1]
    assert mt.read_snapshot(spark, table, 2).count() == 5
    import pytest

    with pytest.raises(ValueError, match="not available"):
        mt.read_snapshot(spark, table, 1)
    # Vacuum never drops the current version even with keep_last=1.
    assert mt.vacuum_snapshots(table, keep_last=1) == [2]
    assert mt.read_snapshot(spark, table).count() == 3


def test_zorder_layout_plus_multicolumn_stats_skipping(spark, tmp_path):
    """The two halves together: a z-ordered write gives every file a
    narrow envelope in BOTH dimensions, so a conjunctive 2-D range
    predicate prunes most files through the stats manifest — a
    single-column sort can only prune on its own column."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    # 64x64 grid scaled to the 16-bit domain, 16 files.
    df = spark.range(4096).select(
        ((F.col("id") % 64) * 1024).alias("su"),
        ((F.col("id") / 64).cast("long") * 1024).alias("sv"),
    )
    zpath = str(tmp_path / "z")
    mt.zorder_layout(df, ["su", "sv"], n_files=16).drop("__z").write.parquet(zpath)
    mt.write_stats_manifest(spark, zpath, ["su", "sv"])

    box = {"su": (0, 15 * 1024), "sv": (0, 15 * 1024)}  # 1/16 of the grid
    got, rep = mt.read_with_skipping(spark, zpath, box)
    assert got.count() == 16 * 16
    assert rep["files_total"] == 16
    # Z-order: the corner box intersects only a few z-runs.
    assert rep["files_skipped"] >= 12

    # Single-column sort baseline: same box prunes on su, but every
    # surviving file spans the FULL sv domain — strictly fewer skips.
    spath = str(tmp_path / "s")
    df.repartitionByRange(16, "su").sortWithinPartitions("su").write.parquet(spath)
    mt.write_stats_manifest(spark, spath, ["su", "sv"])
    got_s, rep_s = mt.read_with_skipping(spark, spath, box)
    assert got_s.count() == 16 * 16
    assert rep_s["files_skipped"] < rep["files_skipped"]


def test_stats_skipping_partitioned_tables_keep_partition_columns(spark, tmp_path):
    """Hive-partitioned layouts: the pruned by-file read goes through
    basePath, so dir-derived partition columns survive with the same
    values and types as the unpruned scan — and a range predicate on
    the partition column itself prunes through the same stats (each
    file's value is constant, min == max)."""
    import pytest

    import pyspark.sql.functions as F

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    path = str(tmp_path / "pt")
    df = spark.range(100).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v", "CAST(id % 4 AS INT) AS p"
    )
    # Cluster v within each partition so per-file envelopes are narrow.
    df.repartitionByRange(4, "v").write.partitionBy("p").parquet(path)
    n = mt.write_stats_manifest(spark, path, ["v", "p"])
    assert n >= 8  # 4 ranges x up to 4 partition dirs

    got, rep = mt.read_with_skipping(spark, path, {"v": (10.0, 20.0)})
    assert rep["files_skipped"] > 0
    want = spark.read.parquet(path).where(
        (F.col("v") >= 10.0) & (F.col("v") <= 20.0)
    )
    assert dict(got.dtypes) == dict(want.dtypes)  # p present, same type
    assert sorted(map(tuple, got.select("id", "v", "p").collect())) == sorted(
        map(tuple, want.select("id", "v", "p").collect())
    )

    # Range on the PARTITION column prunes whole partitions' files.
    got_p, rep_p = mt.read_with_skipping(spark, path, {"p": (2, 2)})
    assert rep_p["files_skipped"] >= rep_p["files_read"]
    assert {r.p for r in got_p.select("p").distinct().collect()} == {2}
    assert got_p.count() == 25

    # Freshness: a file appended into one partition dir AFTER indexing
    # makes the manifest stale — loud error, not silently-missing rows.
    spark.range(100, 110).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(path + "/p=3")
    with pytest.raises(ValueError, match="stale"):
        mt.read_with_skipping(spark, path, {"v": (10.0, 20.0)})


def test_snapshot_change_feed_applies_incrementally(spark, tmp_path):
    """insert/delete feed between versions; applying it to v_from
    reproduces v_to exactly (multiset semantics)."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cdc")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "c")], "id int, v string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "id int, v string"
    )
    mt.write_snapshot(v1, table)
    mt.write_snapshot(v2, table)

    feed = mt.snapshot_changes(spark, table, 1, 2)
    rows = {(r.id, r.v, r._change) for r in feed.collect()}
    # Update of id=2 appears as delete+insert; dup (3,c) loses ONE copy.
    assert rows == {
        (2, "B", "insert"), (4, "d", "insert"),
        (2, "b", "delete"), (3, "c", "delete"),
    }
    # Apply: v_from − deletes + inserts == v_to (as multisets).
    applied = (
        mt.read_snapshot(spark, table, 1)
        .exceptAll(feed.where("_change = 'delete'").drop("_change"))
        .unionByName(feed.where("_change = 'insert'").drop("_change"))
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, v2.collect())
    )


def test_stats_skipping_stale_manifest_and_typed_bounds(spark, tmp_path):
    import datetime

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v",
        "CAST(DATE '2024-01-01' + CAST(id AS INT) AS DATE) AS d",
    )
    df.repartitionByRange(4, "v").write.parquet(path)
    mt.write_stats_manifest(spark, path, ["v", "d"])

    # Date bounds as date objects: normalized to the manifest's ISO form.
    got, rep = mt.read_with_skipping(
        spark, path, {"d": (datetime.date(2024, 1, 1), datetime.date(2024, 1, 10))}
    )
    assert got.count() == 10 and rep["files_skipped"] >= 2
    # (None, None) = no constraint: nothing pruned, nothing filtered.
    got, rep = mt.read_with_skipping(spark, path, {"v": (None, None)})
    assert rep["files_skipped"] == 0 and got.count() == 100

    # Appending after indexing makes the manifest stale -> loud error,
    # not silently-missing rows.
    spark.range(100, 120).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v",
        "CAST(DATE '2024-01-01' + CAST(id AS INT) AS DATE) AS d",
    ).coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="stale"):
        mt.read_with_skipping(spark, path, {"v": (0.0, 50.0)})

    # Decimal stat columns refused at write time (lexical != numeric).
    dpath = str(tmp_path / "dec")
    spark.range(10).selectExpr("CAST(id AS DECIMAL(10,2)) AS m").write.parquet(dpath)
    with pytest.raises(ValueError, match="decimal"):
        mt.write_stats_manifest(spark, dpath, ["m"])


def test_partitioned_change_feed_prunes_to_changed_partitions(spark, tmp_path):
    """Snapshots written with part_col carry per-partition fingerprints;
    a one-partition edit diffs (and READS) only that partition — the
    scan file lists on both sides must exclude every unchanged
    partition's files."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cdcp")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame(
        [(i, f"d{i % 4}", f"v{i}") for i in range(40)], schema
    )
    # Edit ONLY day=d2: drop id=2, change id=6's value.
    v2 = spark.createDataFrame(
        [
            (i, f"d{i % 4}", "CHANGED" if i == 6 else f"v{i}")
            for i in range(40)
            if i != 2
        ],
        schema,
    )
    mt.write_snapshot(v1, table, part_col="day")
    mt.write_snapshot(v2, table, part_col="day")

    pc, changed = mt.changed_partitions(table, 1, 2)
    assert (pc, changed) == ("day", ["d2"])

    feed = mt.snapshot_changes(spark, table, 1, 2)
    rows = {(r.id, r.day, r.v, r._change) for r in feed.collect()}
    assert rows == {
        (6, "d2", "CHANGED", "insert"),
        (6, "d2", "v6", "delete"),
        (2, "d2", "v2", "delete"),
    }
    # The pruning pin: both scans carry a partition-only IN-filter on the
    # changed partition, so planning reads day=d2 alone on each side.
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        feed.explain("formatted")
    pf = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
    assert len(pf) == 4  # exceptAll x2 -> each snapshot scanned twice
    assert all("d2" in ln for ln in pf)
    assert not any("d0" in ln or "d1" in ln or "d3" in ln for ln in pf)


def test_partitioned_change_feed_identical_versions_and_part_add_drop(spark, tmp_path):
    """No content change → empty feed with zero files read; a partition
    present on only one side is all-insert (or all-delete)."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cdcp2")
    schema = "id int, day string, v string"
    base = [(i, f"d{i % 2}", f"v{i}") for i in range(10)]
    v1 = spark.createDataFrame(base, schema)
    mt.write_snapshot(v1, table, part_col="day")
    mt.write_snapshot(v1, table, part_col="day")  # identical content
    mt.write_snapshot(  # v3: drop d1 entirely, add d9
        spark.createDataFrame(
            [r for r in base if r[1] == "d0"] + [(99, "d9", "new")], schema
        ),
        table,
        part_col="day",
    )

    assert mt.changed_partitions(table, 1, 2) == ("day", [])
    empty = mt.snapshot_changes(spark, table, 1, 2)
    assert empty.count() == 0 and empty.inputFiles() == []

    pc, changed = mt.changed_partitions(table, 2, 3)
    assert (pc, set(changed)) == ("day", {"d1", "d9"})
    feed = mt.snapshot_changes(spark, table, 2, 3)
    got = {(r.id, r.day, r._change) for r in feed.collect()}
    want = {(i, "d1", "delete") for i in range(10) if i % 2 == 1}
    want.add((99, "d9", "insert"))
    assert got == want


def test_partitioned_change_feed_numeric_looking_string_partition(spark, tmp_path):
    """Partition values like '05' must prune by their directory string,
    not a re-inferred int form."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cdcp3")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame([(1, "05", "a"), (2, "06", "b")], schema)
    v2 = spark.createDataFrame([(1, "05", "A"), (2, "06", "b")], schema)
    mt.write_snapshot(v1, table, part_col="day")
    mt.write_snapshot(v2, table, part_col="day")
    assert mt.changed_partitions(table, 1, 2) == ("day", ["05"])
    feed = mt.snapshot_changes(spark, table, 1, 2)
    # read_snapshot restores the WRITER's partition dtype (part_type in
    # the manifest), so the string "05" survives the round trip — and the
    # feed's schema matches what read_snapshot gives consumers.
    assert dict(feed.dtypes)["day"] == dict(
        mt.read_snapshot(spark, table, 2).dtypes
    )["day"] == "string"
    assert {(r.id, r.day, r.v, r._change) for r in feed.collect()} == {
        (1, "05", "A", "insert"),
        (1, "05", "a", "delete"),
    }


def test_write_snapshot_failure_leaves_table_writable(spark, tmp_path):
    """A write that fails after creating its (uniquely-named) snapshot
    dir removes it; even if it did not, the next write could never
    collide — it stages under its own uuid name."""
    import os

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "wedge")
    ok = spark.createDataFrame([(1, "a")], "id int, v string")
    mt.write_snapshot(ok, table)
    v1_dir = mt.snapshot_dir(table, 1)
    # A frame whose job fails at write time (division by zero under ANSI).
    bad = ok.selectExpr("id", "1/(id - id) AS boom")
    with pytest.raises(Exception):
        mt.write_snapshot(bad, table)
    # The failed attempt left no directory behind: only v1's remains.
    dirs = os.listdir(os.path.join(table, "snapshots"))
    assert dirs == [os.path.basename(v1_dir)]
    # The table is NOT wedged: the next write takes version 2 cleanly.
    assert mt.write_snapshot(ok, table) == 2
    assert mt.read_snapshot(spark, table, 2).count() == 1


def test_snapshot_crash_between_write_and_commit_never_wedges(spark, tmp_path):
    """Hard-crash simulation (SIGKILL: no finally cleanup): an
    uncommitted data directory left on disk can never block future
    writes — directory names are unique per attempt and the manifest is
    the only commit point.  Vacuum reclaims it after the grace window
    (and spares it within the window, when it may be an in-flight
    writer)."""
    import os
    import time

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "crash")
    df = spark.createDataFrame([(1, "d0", "a")], "id int, day string, v string")
    mt.write_snapshot(df, table, part_col="day")

    # Simulate a writer killed after landing data, before committing.
    stale = os.path.join(table, "snapshots", "v2-deadbeef")
    os.makedirs(stale)
    # Future writes are unaffected: version 2 commits under its own name.
    assert mt.write_snapshot(df, table, part_col="day") == 2
    assert mt.read_snapshot(spark, table, 2).count() == 1

    # Within the grace window the unknown dir is spared (it might be an
    # in-flight writer about to commit)…
    mt.vacuum_snapshots(table, keep_last=5)
    assert os.path.isdir(stale)
    # …and reclaimed once clearly abandoned.
    old = time.time() - 2 * 86400
    os.utime(stale, (old, old))
    mt.vacuum_snapshots(table, keep_last=5)
    assert not os.path.isdir(stale)


def test_write_snapshot_empty_partitioned_version_round_trips(spark, tmp_path):
    """A zero-row partitioned snapshot (a version that deletes all rows)
    must stay readable and diffable — partitionBy writes no schema-bearing
    files, so the dir is rewritten as one empty typed file."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "emptysnap")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame([(1, "d0", "a"), (2, "d1", "b")], schema)
    mt.write_snapshot(v1, table, part_col="day")
    mt.write_snapshot(v1.limit(0), table, part_col="day")

    empty = mt.read_snapshot(spark, table, 2)
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "day", "v"}
    assert mt.changed_partitions(table, 1, 2) == ("day", ["d0", "d1"])
    feed = mt.snapshot_changes(spark, table, 1, 2)
    assert {(r.id, r.day, r._change) for r in feed.collect()} == {
        (1, "d0", "delete"),
        (2, "d1", "delete"),
    }


def test_partitioned_change_feed_keeps_consumer_facing_dtype(spark, tmp_path):
    """The pruned diff must return the partition column with the SAME
    type a plain read_snapshot gives consumers (int-like directory
    values re-infer as int), or applying the feed to a snapshot breaks."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cdctyped")
    schema = "id int, day int, v string"
    v1 = spark.createDataFrame([(1, 20240101, "a"), (2, 20240102, "b")], schema)
    v2 = spark.createDataFrame([(1, 20240101, "A"), (2, 20240102, "b")], schema)
    mt.write_snapshot(v1, table, part_col="day")
    mt.write_snapshot(v2, table, part_col="day")
    feed = mt.snapshot_changes(spark, table, 1, 2)
    snap = mt.read_snapshot(spark, table, 2)
    assert dict(feed.dtypes)["day"] == dict(snap.dtypes)["day"] == "int"
    # Applying the feed type-checks against the consumer's snapshot read.
    applied = (
        mt.read_snapshot(spark, table, 1)
        .exceptAll(feed.where("_change = 'delete'").drop("_change"))
        .unionByName(feed.where("_change = 'insert'").drop("_change"))
    )
    # Partition columns read back last; normalize the column order.
    assert sorted(map(tuple, applied.select("id", "day", "v").collect())) == sorted(
        map(tuple, v2.collect())
    )


def test_upsert_snapshot_copy_on_write_inherits_partitions(spark, tmp_path):
    """A one-partition upsert writes ONE partition's files; every other
    partition is inherited by manifest reference from the previous
    version's immutable directory — and reads back identically to a full
    rewrite."""
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cow")
    schema = "id int, day string, v string"
    base = [(i, f"d{i % 4}", f"v{i}") for i in range(40)]
    v1 = spark.createDataFrame(base, schema)
    mt.write_snapshot(v1, table, part_col="day")
    # Rewrite ONLY day=d2 (replace semantics): drop id=2, change id=6.
    d2_new = spark.createDataFrame(
        [(i, "d2", "CHANGED" if i == 6 else f"v{i}")
         for i in range(40) if i % 4 == 2 and i != 2],
        schema,
    )
    assert mt.upsert_snapshot(d2_new, table) == 2

    # Physically: v2's dir holds ONLY day=d2; d0/d1/d3 files live in v1.
    v2_dirs = sorted(os.listdir(mt.snapshot_dir(table, 2)))
    assert [d for d in v2_dirs if d.startswith("day=")] == ["day=d2"]

    # Logically: v2 == full expected table, v1 untouched.
    expected = {(i, f"d{i % 4}", "CHANGED" if i == 6 else f"v{i}")
                for i in range(40) if not (i % 4 == 2 and i == 2)} - {
        (2, "d2", "v2")
    }
    got = {tuple(r) for r in
           mt.read_snapshot(spark, table, 2).select("id", "day", "v").collect()}
    assert got == expected
    assert mt.read_snapshot(spark, table, 1).count() == 40

    # The change feed sees exactly the d2 edit, partition-pruned.
    pc, changed = mt.changed_partitions(table, 1, 2)
    assert (pc, changed) == ("day", ["d2"])
    feed = mt.snapshot_changes(spark, table, 1, 2)
    assert {(r.id, r.day, r.v, r._change) for r in feed.collect()} == {
        (6, "d2", "CHANGED", "insert"),
        (6, "d2", "v6", "delete"),
        (2, "d2", "v2", "delete"),
    }


def test_upsert_snapshot_drop_partitions_and_vacuum_keeps_referenced_dirs(
    spark, tmp_path
):
    """drop_partitions deletes a partition in the new version; vacuum
    expires old versions from the manifest but keeps any directory a
    retained version still inherits from."""
    import os

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cowvac")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame(
        [(1, "d0", "a"), (2, "d1", "b"), (3, "d2", "c")], schema
    )
    mt.write_snapshot(v1, table, part_col="day")
    mt.upsert_snapshot(
        spark.createDataFrame([(9, "d1", "B")], schema), table,
        drop_partitions=["d2"],
    )
    got = {tuple(r) for r in
           mt.read_snapshot(spark, table, 2).select("id", "day", "v").collect()}
    assert got == {(1, "d0", "a"), (9, "d1", "B")}

    # Vacuum to the newest version only: v1 expires from the manifest
    # but its DIRECTORY survives — v2 still inherits day=d0 from it.
    v1_dir, v2_dir = mt.snapshot_dir(table, 1), mt.snapshot_dir(table, 2)
    assert mt.vacuum_snapshots(table, keep_last=1) == [1]
    with pytest.raises(ValueError, match="not available"):
        mt.read_snapshot(spark, table, 1)
    assert os.path.isdir(v1_dir)
    got2 = {tuple(r) for r in
            mt.read_snapshot(spark, table, 2).select("id", "day", "v").collect()}
    assert got2 == got

    # A full rewrite then makes v1 truly orphaned: the next vacuum
    # deletes both old dirs (immediately — they were manifest-known,
    # not possibly-in-flight unknowns).
    mt.write_snapshot(mt.read_snapshot(spark, table, 2), table, part_col="day")
    assert mt.vacuum_snapshots(table, keep_last=1) == [2]
    assert not os.path.isdir(v1_dir)
    assert not os.path.isdir(v2_dir)
    assert mt.read_snapshot(spark, table).count() == 2


def test_upsert_snapshot_requires_partitioned_base_and_rejects_clash(
    spark, tmp_path
):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cowerr")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    mt.write_snapshot(df, table)  # unpartitioned seed
    with pytest.raises(ValueError, match="partitioned snapshot"):
        mt.upsert_snapshot(df, table)

    table2 = str(tmp_path / "cowerr2")
    mt.write_snapshot(df, table2, part_col="day")
    with pytest.raises(ValueError, match="rewritten and dropped"):
        mt.upsert_snapshot(df, table2, drop_partitions=["d0"])
    # The failed upsert left no orphan dir: version 2 still writable.
    assert mt.upsert_snapshot(
        spark.createDataFrame([(5, "d5", "e")], schema), table2
    ) == 2


def test_partitioned_reads_round_trip_writer_partition_type(spark, tmp_path):
    """part_type in the manifest restores the WRITER's dtype on read —
    a string '05' partition value stays '05', never a re-inferred 5."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "typed05")
    schema = "id int, day string, v string"
    mt.write_snapshot(
        spark.createDataFrame([(1, "05", "a"), (2, "06", "b")], schema),
        table, part_col="day",
    )
    snap = mt.read_snapshot(spark, table)
    assert dict(snap.dtypes)["day"] == "string"
    assert {r.day for r in snap.collect()} == {"05", "06"}


def test_merge_into_snapshot_update_insert_delete(spark, tmp_path):
    """Delta-MERGE semantics on the COW table: matched keys update,
    unmatched insert, delete-flagged keys vanish; untouched partitions
    are inherited by reference; a fully-deleted partition is dropped."""
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "merge")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame(
        [(1, "d0", "a"), (2, "d0", "b"), (3, "d1", "c"), (4, "d2", "x")], schema
    )
    mt.write_snapshot(v1, table, part_col="day")
    updates = spark.createDataFrame(
        [
            (2, "d0", "B", False),    # matched -> update
            (9, "d0", "new", False),  # unmatched -> insert
            (4, "d2", None, True),    # delete d2's only row
        ],
        "id int, day string, v string, _deleted boolean",
    )
    assert mt.merge_into_snapshot(updates, table, ["id"], delete_col="_deleted") == 2

    got = {tuple(r) for r in
           mt.read_snapshot(spark, table, 2).select("id", "day", "v").collect()}
    assert got == {(1, "d0", "a"), (2, "d0", "B"), (9, "d0", "new"), (3, "d1", "c")}
    # d1 was never touched: physically inherited from v1 (v2 holds only d0).
    v2_parts = [d for d in os.listdir(mt.snapshot_dir(table, 2))
                if d.startswith("day=")]
    assert v2_parts == ["day=d0"]
    # d2 (all rows deleted) is gone from the manifest, not inherited.
    pc, changed = mt.changed_partitions(table, 1, 2)
    assert (pc, set(changed)) == ("day", {"d0", "d2"})
    feed = mt.snapshot_changes(spark, table, 1, 2)
    assert {(r.id, r.day, r._change) for r in feed.collect()} == {
        (2, "d0", "insert"), (9, "d0", "insert"),
        (2, "d0", "delete"), (4, "d2", "delete"),
    }


def test_upsert_snapshot_schema_evolution_add_column(spark, tmp_path):
    """A column added by the new version surfaces as null on inherited
    partitions; older versions keep their own schema."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "evolve")
    v1 = spark.createDataFrame(
        [(1, "d0", "a"), (2, "d1", "b")], "id int, day string, v string"
    )
    mt.write_snapshot(v1, table, part_col="day")
    evolved = spark.createDataFrame(
        [(9, "d1", "B", 42)], "id int, day string, v string, score int"
    )
    mt.upsert_snapshot(evolved, table)

    v2 = mt.read_snapshot(spark, table, 2)
    assert v2.columns == ["id", "day", "v", "score"]
    got = {(r.id, r.day, r.v, r.score) for r in v2.collect()}
    assert got == {(1, "d0", "a", None), (9, "d1", "B", 42)}
    # v1 unchanged, pre-evolution schema.
    assert mt.read_snapshot(spark, table, 1).columns == ["id", "day", "v"]


def test_upsert_snapshot_skip_unchanged_withdraws_noop_publish(spark, tmp_path):
    """Replaying the same deterministic batch with skip_unchanged=True
    must not mint an identical new version."""
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "noop")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame([(1, "d0", "a"), (2, "d1", "b")], schema)
    mt.write_snapshot(v1, table, part_col="day")
    batch = spark.createDataFrame([(1, "d0", "a")], schema)  # same content
    assert mt.upsert_snapshot(batch, table, skip_unchanged=True) == 1
    assert [s["version"] for s in mt.list_snapshots(table)] == [1]
    # The withdrawn publish removed its own staged directory.
    assert os.listdir(os.path.join(table, "snapshots")) == [
        os.path.basename(mt.snapshot_dir(table, 1))
    ]
    # A REAL change still publishes.
    changed = spark.createDataFrame([(1, "d0", "A")], schema)
    assert mt.upsert_snapshot(changed, table, skip_unchanged=True) == 2
    assert {tuple(r) for r in
            mt.read_snapshot(spark, table, 2).select("id", "day", "v").collect()
            } == {(1, "d0", "A"), (2, "d1", "b")}


def test_compact_snapshot_partition_collapses_files_content_identical(
    spark, tmp_path
):
    """Compacting one partition publishes a content-identical new version
    (same fingerprint) with fewer files; other partitions inherited."""
    import glob
    import json
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "compact_cow")
    schema = "id int, day string, v string"
    df = spark.createDataFrame(
        [(i, f"d{i % 2}", f"v{i}") for i in range(64)], schema
    ).repartition(16)
    # The r14 REBALANCE-on-write coalesces small writers, so a plain
    # repartition(16) no longer fragments the version — force many tiny
    # output files explicitly to give compaction something to collapse.
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
    try:
        mt.write_snapshot(df, table, part_col="day")
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    v1_files = glob.glob(
        os.path.join(mt.snapshot_dir(table, 1), "day=d0", "*.parquet")
    )
    assert len(v1_files) > 4

    v = mt.compact_snapshot_partition(spark, table, "d0")
    assert v == 2
    v2_files = glob.glob(
        os.path.join(mt.snapshot_dir(table, 2), "day=d0", "*.parquet")
    )
    assert 1 <= len(v2_files) < len(v1_files)
    man = json.load(open(os.path.join(table, "_versions.json")))
    s1, s2 = man["snapshots"]["1"]["parts"], man["snapshots"]["2"]["parts"]
    # Content identical (fingerprints equal), d1 inherited from v1.
    assert (s1["d0"]["n"], s1["d0"]["fp"]) == (s2["d0"]["n"], s2["d0"]["fp"])
    assert s2["d1"]["src"] == 1
    assert mt.changed_partitions(table, 1, 2) == ("day", [])
    got = {tuple(r) for r in
           mt.read_snapshot(spark, table).select("id", "day", "v").collect()}
    assert got == {(i, f"d{i % 2}", f"v{i}") for i in range(64)}


def test_snapshot_as_of_timestamp(spark, tmp_path):
    """TIMESTAMP AS OF: the newest version committed at or before ts."""
    import time

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "asof")
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    t0 = time.time()
    mt.write_snapshot(df, table)
    time.sleep(0.05)
    t_between = time.time()
    time.sleep(0.05)
    mt.write_snapshot(df.withColumn("v", F.lit("b")), table)

    assert mt.snapshot_as_of(table, t_between) == 1
    assert mt.snapshot_as_of(table, time.time()) == 2
    with pytest.raises(ValueError, match="no retained version"):
        mt.snapshot_as_of(table, t0 - 10)
    v = mt.snapshot_as_of(table, t_between)
    assert mt.read_snapshot(spark, table, v).collect()[0].v == "a"


def test_vacuum_sweep_reruns_and_spares_inflight_writer_dir(spark, tmp_path):
    """The orphan sweep runs even when nothing newly expires (a crashed
    prior vacuum stays re-vacuumable), and spares a never-committed
    directory inside the grace window — that may be an in-flight
    writer's staged data, not an orphan."""
    import os
    import shutil
    import time

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "vacrerun")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame([(1, "d0", "a"), (2, "d1", "b")], schema)
    mt.write_snapshot(v1, table, part_col="day")
    mt.upsert_snapshot(spark.createDataFrame([(9, "d1", "B")], schema), table)
    v1_dir, v2_dir = mt.snapshot_dir(table, 1), mt.snapshot_dir(table, 2)
    mt.write_snapshot(v1, table, part_col="day")  # v3: full, orphans v1 refs

    # Simulate an in-flight writer: freshly-staged uncommitted dir.
    inflight = os.path.join(table, "snapshots", "v4-aaaa1111")
    os.makedirs(inflight)

    # First vacuum expires v1+v2; their manifest-known dirs are removed
    # immediately — the fresh unknown dir is spared by the grace window.
    assert mt.vacuum_snapshots(table, keep_last=1) == [1, 2]
    assert not os.path.isdir(v1_dir)
    assert not os.path.isdir(v2_dir)
    assert os.path.isdir(inflight)

    # Simulate a crash that left an abandoned staged dir behind (old
    # mtime): re-running vacuum with NOTHING new to expire still sweeps
    # it, while the fresh one stays spared.
    orphan = os.path.join(table, "snapshots", "v9-bbbb2222")
    os.makedirs(orphan)
    old = time.time() - 2 * 86400
    os.utime(orphan, (old, old))
    assert mt.vacuum_snapshots(table, keep_last=1) == []
    assert not os.path.isdir(orphan)
    assert os.path.isdir(inflight)
    shutil.rmtree(inflight)
    assert mt.read_snapshot(spark, table).count() == 2


def test_concurrent_snapshot_commit_detected_and_loser_preserves_winner(
    spark, tmp_path
):
    """Optimistic commit check: a writer whose base version moved under it
    raises instead of orphaning the winner's commit — and its cleanup
    must NOT delete the winner's committed directory."""
    import os

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cas")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    mt.write_snapshot(df, table, part_col="day")

    # Simulate a racing winner: bump the manifest AFTER this writer read
    # its base state, via a monkeypatched fingerprint step that commits a
    # competing v2 (with its own unique directory) mid-write.
    real_fp = mt._partition_fingerprints
    state = {"fired": False}
    winner_dir = os.path.join(table, "snapshots", "v2-feedc0de")

    def fp_with_race(frame, part_col, **kwargs):
        if not state["fired"]:
            state["fired"] = True
            os.makedirs(winner_dir)
            man = mt._load_manifest(table)
            man["current"] = 2
            man["snapshots"]["2"] = {"dir": "snapshots/v2-feedc0de", "n_rows": 0}
            import json
            with open(os.path.join(table, "_versions.json"), "w") as f:
                json.dump(man, f)
        return real_fp(frame, part_col, **kwargs)

    mt._partition_fingerprints = fp_with_race
    try:
        with pytest.raises(mt.ConcurrentSnapshotWriteError):
            mt.write_snapshot(
                spark.createDataFrame([(2, "d0", "b")], schema),
                table, part_col="day",
            )
    finally:
        mt._partition_fingerprints = real_fp
    # The loser cleaned up ONLY its own uniquely-named directory: the
    # winner's committed dir and v1's dir are the only ones left.
    assert os.path.isdir(winner_dir)
    left = sorted(os.listdir(os.path.join(table, "snapshots")))
    assert left == sorted(
        [os.path.basename(mt.snapshot_dir(table, 1)), "v2-feedc0de"]
    )
    # v1 remains readable.
    assert mt.read_snapshot(spark, table, 1).count() == 1


def test_commit_protocol_injected_failure_leaves_old_version(spark, tmp_path):
    """A commit protocol that dies mid-commit must leave the manifest at
    the old version; the staged data directory is unreferenced and
    sweepable — never half-visible state (VERDICT r7 ask #2)."""
    import os

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    class ExplodingCommit(mt.SnapshotCommit):
        def commit_manifest(self, table_path, mutate):
            mutate(mt._load_manifest(table_path))  # passes the CAS check…
            raise OSError("simulated publish failure (network/rename died)")

    table = str(tmp_path / "injfail")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    mt.write_snapshot(df, table, part_col="day")

    with pytest.raises(OSError, match="simulated publish"):
        mt.write_snapshot(df, table, part_col="day", commit=ExplodingCommit())
    # Manifest unchanged; reads see v1 only.
    assert mt._load_manifest(table)["current"] == 1
    assert [s["version"] for s in mt.list_snapshots(table)] == [1]
    # The failed attempt's dir was cleaned by its own finally; even a
    # hard crash would only leave an unreferenced unique dir (sweepable).
    assert os.listdir(os.path.join(table, "snapshots")) == [
        os.path.basename(mt.snapshot_dir(table, 1))
    ]
    # Upsert path honors the same protocol and cleanup.
    with pytest.raises(OSError, match="simulated publish"):
        mt.upsert_snapshot(df, table, commit=ExplodingCommit())
    assert mt._load_manifest(table)["current"] == 1
    # The table stays writable with the default protocol.
    assert mt.write_snapshot(df, table, part_col="day") == 2


def test_merge_validate_partition_rejects_cross_partition_move(spark, tmp_path):
    """validate_partition=True turns the silent insert-duplicate of a
    cross-partition key move into a fail-fast ValueError; the sanctioned
    move (explicit delete in the old partition + insert in the new)
    passes (VERDICT r7 ask #4)."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "valpart")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame(
        [(1, "d0", "a"), (2, "d1", "b"), (3, "d1", "c")], schema
    )
    mt.write_snapshot(v1, table, part_col="day")

    # Key 2 currently lives in d1; an update claiming d9 is a move.
    bad = spark.createDataFrame([(2, "d9", "MOVED")], schema)
    with pytest.raises(ValueError, match="cross-partition key move"):
        mt.merge_into_snapshot(bad, table, ["id"], validate_partition=True)
    # Nothing was published.
    assert mt._load_manifest(table)["current"] == 1

    # In-place update in the key's current partition: fine.
    ok = spark.createDataFrame([(2, "d1", "B")], schema)
    assert mt.merge_into_snapshot(ok, table, ["id"], validate_partition=True) == 2

    # Sanctioned move: delete-flagged row in the old partition + insert
    # row in the new one, same key — validation exempts it.
    move = spark.createDataFrame(
        [(3, "d1", None, True), (3, "d2", "c2", False)],
        "id int, day string, v string, _deleted boolean",
    )
    assert mt.merge_into_snapshot(
        move, table, ["id"], delete_col="_deleted", validate_partition=True
    ) == 3
    got = {tuple(r) for r in
           mt.read_snapshot(spark, table).select("id", "day", "v").collect()}
    assert got == {(1, "d0", "a"), (2, "d1", "B"), (3, "d2", "c2")}


def test_collapsed_change_feed_pairs_updates_by_key(spark, tmp_path):
    """snapshot_changes(collapse=True) re-tags an update's delete+insert
    pair as update_preimage/update_postimage using the keys recorded at
    MERGE time; pure inserts/deletes keep their tags — and an
    upsert-only diff contains zero bare deletes (VERDICT r7 ask #3)."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cdckeys")
    schema = "id int, day string, v string"
    v1 = spark.createDataFrame(
        [(1, "d0", "a"), (2, "d0", "b"), (3, "d1", "c")], schema
    )
    mt.write_snapshot(v1, table, part_col="day")
    updates = spark.createDataFrame(
        [
            (2, "d0", "B", False),    # update
            (9, "d0", "new", False),  # insert
            (3, "d1", None, True),    # delete
        ],
        "id int, day string, v string, _deleted boolean",
    )
    mt.merge_into_snapshot(updates, table, ["id"], delete_col="_deleted")
    # merge recorded its keys in the manifest.
    assert mt._load_manifest(table)["snapshots"]["2"]["keys"] == ["id"]

    feed = mt.snapshot_changes(spark, table, 1, 2, collapse=True)
    got = {(r.id, r.v, r._change) for r in feed.collect()}
    assert got == {
        (2, "B", "update_postimage"),
        (2, "b", "update_preimage"),
        (9, "new", "insert"),
        (3, "c", "delete"),
    }

    # Upsert-only batch → zero bare deletes in the collapsed feed.
    mt.merge_into_snapshot(
        spark.createDataFrame([(1, "d0", "A2"), (7, "d1", "x")], schema),
        table, ["id"],
    )
    feed2 = mt.snapshot_changes(spark, table, 2, 3, collapse=True)
    tags = {r._change for r in feed2.collect()}
    assert "delete" not in tags
    assert tags == {"update_preimage", "update_postimage", "insert"}


def test_collapsed_change_feed_explicit_keys_and_missing_keys_error(
    spark, tmp_path
):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "cdckeys2")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    v2 = spark.createDataFrame([(1, "A"), (3, "c")], "id int, v string")
    mt.write_snapshot(v1, table)
    mt.write_snapshot(v2, table)
    # No keys recorded anywhere → explicit keys required.
    with pytest.raises(ValueError, match="row-identity columns"):
        mt.snapshot_changes(spark, table, 1, 2, collapse=True)
    feed = mt.snapshot_changes(spark, table, 1, 2, collapse=True, keys=["id"])
    assert {(r.id, r.v, r._change) for r in feed.collect()} == {
        (1, "A", "update_postimage"),
        (1, "a", "update_preimage"),
        (3, "c", "insert"),
        (2, "b", "delete"),
    }
    # record_keys at write time also feeds the default.
    table2 = str(tmp_path / "cdckeys3")
    mt.write_snapshot(v1, table2, record_keys=["id"])
    mt.write_snapshot(v2, table2, record_keys=["id"])
    assert mt.snapshot_changes(spark, table2, 1, 2, collapse=True).count() == 4


def test_vacuum_retention_contract_for_readers(spark, tmp_path):
    """Ask #7: a reader holding a DataFrame over a RETAINED version
    survives a vacuum (its directories are never touched); a reader over
    an EXPIRED version fails at action time once the files are swept,
    and read_snapshot of the expired version fails fast."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "retention")
    df1 = spark.createDataFrame([(i, "x") for i in range(5)], "id int, v string")
    mt.write_snapshot(df1, table)
    mt.write_snapshot(df1.limit(3), table)
    mt.write_snapshot(df1.limit(1), table)

    held_retained = mt.read_snapshot(spark, table, 2)   # stays within keep_last
    held_expired = mt.read_snapshot(spark, table, 1)    # will be vacuumed
    assert held_expired.count() == 5  # action before vacuum: fine

    assert mt.vacuum_snapshots(table, keep_last=2) == [1]
    # Retained-version reader: unaffected.
    assert held_retained.count() == 3
    # Expired-version reader: the lazy frame's files are gone — the next
    # action raises (file-not-found under the hood), it does NOT return
    # partial/empty data silently.
    with pytest.raises(Exception):
        held_expired.count()
    # And a fresh read of the expired version is a clear, fast error.
    with pytest.raises(ValueError, match="not available"):
        mt.read_snapshot(spark, table, 1)


def test_partition_only_frame_rejected_with_clear_error(spark, tmp_path):
    """A frame whose ONLY column is the partition column cannot be
    Hive-partitioned (Spark: ALL_PARTITION_COLUMNS_NOT_ALLOWED) — the
    layer fails fast with a clear contract error instead of a mid-write
    AnalysisException (and the fingerprint step itself tolerates empty
    data-column lists via a constant-hash fallback)."""
    import pytest

    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "partonly")
    df = spark.createDataFrame([("d0",), ("d0",), ("d1",)], "day string")
    with pytest.raises(ValueError, match="only column is the partition"):
        mt.write_snapshot(df, table, part_col="day")
    # The fingerprint fallback: count-only fingerprints still distinguish
    # partitions by row count.
    fps = mt._partition_fingerprints(df, "day")
    assert fps["d0"]["n"] == 2 and fps["d1"]["n"] == 1
    assert fps["d0"]["fp"] != fps["d1"]["fp"]


def test_ambiguous_commit_does_not_delete_published_data(spark, tmp_path):
    """A commit whose publish LANDED but whose acknowledgement was lost
    (conditional put succeeds, response times out) raises back to the
    writer — failure cleanup must NOT delete the staged directory, which
    the manifest now references as the current version."""
    import os

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    class AmbiguousCommit(mt.SnapshotCommit):
        def commit_manifest(self, table_path, mutate):
            mt.PosixSnapshotCommit().commit_manifest(table_path, mutate)
            raise TimeoutError("response lost after successful publish")

    table = str(tmp_path / "ambig")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    mt.write_snapshot(df, table, part_col="day")

    with pytest.raises(TimeoutError):
        mt.write_snapshot(
            spark.createDataFrame([(2, "d0", "b")], schema),
            table, part_col="day", commit=AmbiguousCommit(),
        )
    # The publish actually landed: v2 is current, its data intact.
    assert mt._load_manifest(table)["current"] == 2
    assert os.path.isdir(mt.snapshot_dir(table, 2))
    assert {r.id for r in mt.read_snapshot(spark, table).collect()} == {2}

    # Same guarantee on the upsert path.
    with pytest.raises(TimeoutError):
        mt.upsert_snapshot(
            spark.createDataFrame([(3, "d1", "c")], schema),
            table, commit=AmbiguousCommit(),
        )
    assert mt._load_manifest(table)["current"] == 3
    assert {r.id for r in mt.read_snapshot(spark, table).collect()} == {2, 3}


def test_merge_validate_partition_rejects_wrong_partition_delete(spark, tmp_path):
    """A delete row naming any partition other than its key's CURRENT
    one would silently no-op (merge only touches the batch's partitions)
    and strand the old row — validate_partition rejects it, including
    the move-with-misplaced-delete shape."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "baddel")
    schema = "id int, day string, v string"
    mt.write_snapshot(
        spark.createDataFrame([(1, "d0", "a"), (3, "d1", "c")], schema),
        table, part_col="day",
    )
    # Attempted move with the delete row misplaced into the NEW partition.
    move = spark.createDataFrame(
        [(3, "d2", None, True), (3, "d2", "c2", False)],
        "id int, day string, v string, _deleted boolean",
    )
    with pytest.raises(ValueError, match="wrong partition"):
        mt.merge_into_snapshot(
            move, table, ["id"], delete_col="_deleted", validate_partition=True
        )
    # A lone misplaced delete row is equally rejected.
    lone = spark.createDataFrame(
        [(3, "d9", None, True)], "id int, day string, v string, _deleted boolean"
    )
    with pytest.raises(ValueError, match="wrong partition"):
        mt.merge_into_snapshot(
            lone, table, ["id"], delete_col="_deleted", validate_partition=True
        )
    assert mt._load_manifest(table)["current"] == 1  # nothing published


def test_concurrent_writers_race_flock_serializes_commits(spark, tmp_path):
    """Stress the commit protocol: several writer threads race
    write_snapshot with retry-on-conflict.  Every attempt must either
    commit a distinct consecutive version or raise
    ConcurrentSnapshotWriteError (never silently lose/overwrite a
    commit); the final table must hold exactly one entry per successful
    commit and every version must be readable."""
    import threading

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "race")
    n_threads, per_thread = 4, 3
    committed = []
    lock = threading.Lock()
    errors = []

    def writer(tid):
        for i in range(per_thread):
            df = spark.createDataFrame([(tid, i)], "tid int, attempt int")
            for _retry in range(40):
                try:
                    v = mt.write_snapshot(df, table)
                    with lock:
                        committed.append((v, tid, i))
                    break
                except mt.ConcurrentSnapshotWriteError:
                    continue
            else:
                with lock:
                    errors.append((tid, i, "retries exhausted"))

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    total = n_threads * per_thread
    versions = sorted(v for v, _, _ in committed)
    # Every commit got a DISTINCT consecutive version — no lost updates.
    assert versions == list(range(1, total + 1))
    man = mt._load_manifest(table)
    assert man["current"] == total
    assert len(man["snapshots"]) == total
    # Every version reads back as exactly its writer's row.
    by_version = {v: (tid, i) for v, tid, i in committed}
    for v in (1, total // 2, total):
        row = mt.read_snapshot(spark, table, v).collect()[0]
        assert (row.tid, row.attempt) == by_version[v]
    # No stray directories: one uniquely-named dir per committed version.
    import os

    dirs = os.listdir(os.path.join(table, "snapshots"))
    assert len(dirs) == total


def test_collapse_keeps_raw_tags_for_non_unique_keys(spark, tmp_path):
    """record_keys accepts arbitrary columns; a key with more than one
    row per side must NOT be mis-paired into unbalanced update images —
    it keeps raw insert/delete tags."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "nonuniq")
    v1 = spark.createDataFrame([(1, "a")], "id int, v string")
    v2 = spark.createDataFrame([(1, "A"), (1, "B")], "id int, v string")
    mt.write_snapshot(v1, table, record_keys=["id"])
    mt.write_snapshot(v2, table, record_keys=["id"])
    feed = mt.snapshot_changes(spark, table, 1, 2, collapse=True)
    got = {(r.id, r.v, r._change) for r in feed.collect()}
    # 2 inserts + 1 delete for id=1 -> no 1:1 pairing exists; raw tags.
    assert got == {
        (1, "A", "insert"), (1, "B", "insert"), (1, "a", "delete"),
    }
    # A clean single-pair key still collapses.
    v3 = spark.createDataFrame([(1, "A"), (1, "B"), (2, "x")], "id int, v string")
    mt.write_snapshot(v3, table, record_keys=["id"])
    feed2 = mt.snapshot_changes(spark, table, 2, 3, collapse=True)
    assert {(r.id, r.v, r._change) for r in feed2.collect()} == {(2, "x", "insert")}


def test_stats_skipping_partition_values_needing_url_encoding(spark, tmp_path):
    """Partition values with spaces/colons are percent-encoded by
    input_file_name() and Hive-escaped on disk; the freshness gate must
    still match them (decode once), and pruning must return them
    exactly."""
    import pyspark.sql.functions as F

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    path = str(tmp_path / "enc")
    df = spark.createDataFrame(
        [(i, float(i), f"a b:{i % 2}") for i in range(20)],
        "id int, v double, p string",
    )
    df.repartition(1).write.partitionBy("p").parquet(path)
    mt.write_stats_manifest(spark, path, ["v"])
    got, rep = mt.read_with_skipping(spark, path, {"v": (5.0, 9.0)})
    assert rep["files_total"] == 2
    want = df.where((F.col("v") >= 5.0) & (F.col("v") <= 9.0))
    assert sorted(map(tuple, got.select("id", "v", "p").collect())) == sorted(
        map(tuple, want.collect())
    )
    assert {r.p for r in got.select("p").distinct().collect()} <= {"a b:0", "a b:1"}


def test_commit_refuses_vanished_staged_dir(spark, tmp_path):
    """A writer whose staged directory was swept (stalled past vacuum's
    grace) must FAIL its commit, not publish a data-less version."""
    import shutil as sh

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "vanish")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    mt.write_snapshot(df, table, part_col="day")

    class SweepThenCommit(mt.SnapshotCommit):
        def commit_manifest(self, table_path, mutate):
            # Simulate the racing vacuum: the staged v2 dir disappears
            # between write completion and commit.
            import os as _os
            snaps = _os.path.join(table_path, "snapshots")
            for d in _os.listdir(snaps):
                if d.startswith("v2-"):
                    sh.rmtree(_os.path.join(snaps, d))
            return mt.PosixSnapshotCommit().commit_manifest(table_path, mutate)

    with pytest.raises(RuntimeError, match="vanished before commit"):
        mt.write_snapshot(df, table, part_col="day", commit=SweepThenCommit())
    assert mt._load_manifest(table)["current"] == 1
    assert mt.read_snapshot(spark, table).count() == 1


def test_empty_string_partition_keys_as_null_sentinel(spark, tmp_path):
    """Hive lands '' and null in the same __HIVE_DEFAULT_PARTITION__
    directory; the fingerprint keying must agree between the input-side
    pre-check and the landed read-back, so a replay with '' partitions
    is still withdrawn as a no-op."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "emptykey")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "", "a"), (2, "d1", "b")], schema)
    mt.write_snapshot(df, table, part_col="day")
    man = mt._load_manifest(table)
    assert set(man["snapshots"]["1"]["parts"]) == {mt._NULL_PART, "d1"}

    # Replaying the ''-partition row (which reads back as null) as its
    # read-back form must be a withdrawn no-op, not a minted version.
    import pyspark.sql.functions as F

    replay = mt.read_snapshot(spark, table).where(F.col("day").isNull())
    assert mt.upsert_snapshot(replay, table, skip_unchanged=True) == 1
    # Replaying the ORIGINAL ''-form is ALSO a withdrawn no-op: the
    # fingerprint hashes only non-partition columns ('' vs null in the
    # partition column is invisible to it, and both land in the same
    # sentinel directory anyway).
    original = spark.createDataFrame([(1, "", "a")], schema)
    assert mt.upsert_snapshot(original, table, skip_unchanged=True) == 1
    assert [s["version"] for s in mt.list_snapshots(table)] == [1]


def test_corrupt_manifest_raises_clear_error_not_fresh_table(spark, tmp_path):
    """A truncated/corrupt _versions.json must raise loudly — never fall
    back to the empty default (a writer would restart at v1 over
    existing data)."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "corrupt")
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    mt.write_snapshot(df, table)
    with open(mt._manifest_path(table), "w") as f:
        f.write('{"current": 1, "snap')  # simulated torn write
    with pytest.raises(RuntimeError, match="corrupt"):
        mt.read_snapshot(spark, table)
    with pytest.raises(RuntimeError, match="corrupt"):
        mt.write_snapshot(df, table)


def test_compact_snapshot_partition_with_clustering(spark, tmp_path):
    """OPTIMIZE-style compaction: sort_col range-clusters the rewritten
    partition so output files own disjoint spans (narrow footers =
    data skipping), content identical; zorder_cols path smoke-checked."""
    import glob as g

    import pyspark.sql.functions as F

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "optimize")
    df = spark.createDataFrame(
        [(i, f"d{i % 2}", i * 7 % 1000) for i in range(2000)],
        "id int, day string, metric int",
    ).repartition(16)
    mt.write_snapshot(df, table, part_col="day")

    v = mt.compact_snapshot_partition(
        spark, table, "d0", target_file_bytes=4 << 10, sort_col="metric"
    )
    files = g.glob(os.path.join(mt.snapshot_dir(table, v), "day=d0", "*.parquet"))
    assert len(files) >= 2
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("metric"), F.max("metric")).collect()[0]
        spans.append((r[0], r[1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint spans
    # Content identical: fingerprints unchanged.
    assert mt.changed_partitions(table, 1, v) == ("day", [])

    # Z-order path: runs, preserves content, drops the helper column.
    v2 = mt.compact_snapshot_partition(
        spark, table, "d1", target_file_bytes=4 << 10,
        zorder_cols=["id", "metric"],
    )
    assert mt.changed_partitions(table, v, v2) == ("day", [])
    assert "__z" not in mt.read_snapshot(spark, table).columns
    import pytest

    with pytest.raises(ValueError, match="not both"):
        mt.compact_snapshot_partition(
            spark, table, "d0", sort_col="metric", zorder_cols=["id"]
        )


def test_update_stats_manifest_incremental(spark, tmp_path):
    """Appended files are indexed by scanning ONLY them; files a
    compaction removed drop out of the manifest; read_with_skipping is
    fresh and exact again after the update."""
    import pyspark.sql.functions as F

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    path = str(tmp_path / "incr")
    spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v").repartitionByRange(
        4, "v"
    ).write.parquet(path)
    assert mt.write_stats_manifest(spark, path, ["v"]) == 4

    # Append a new value range: stale until updated.
    spark.range(100, 150).selectExpr(
        "id", "CAST(id AS DOUBLE) AS v"
    ).coalesce(1).write.mode("append").parquet(path)
    import pytest

    with pytest.raises(ValueError, match="stale"):
        mt.read_with_skipping(spark, path, {"v": (120.0, 130.0)})
    rep = mt.update_stats_manifest(spark, path)
    assert rep == {"added": 1, "removed": 0, "total": 5}

    got, prune = mt.read_with_skipping(spark, path, {"v": (120.0, 130.0)})
    assert prune["files_total"] == 5 and prune["files_skipped"] == 4
    assert got.count() == 11

    # Compaction rewrites everything: update drops the dead entries and
    # indexes the rewritten files.
    mt.compact_parquet(spark, path, target_file_bytes=1 << 30)
    rep2 = mt.update_stats_manifest(spark, path)
    assert rep2["removed"] == 5 and rep2["added"] == rep2["total"]
    got2, prune2 = mt.read_with_skipping(spark, path, {"v": (120.0, 130.0)})
    assert got2.count() == 11
    # Exactness against the unpruned scan.
    want = spark.read.parquet(path).where(
        (F.col("v") >= 120.0) & (F.col("v") <= 130.0)
    ).count()
    assert got2.count() == want


def test_update_stats_manifest_partitioned(spark, tmp_path):
    """Incremental update over a Hive-partitioned layout: a file added
    into one partition dir is indexed with partition columns intact."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    path = str(tmp_path / "incrp")
    spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(40)], "id int, v double, p int"
    ).repartition(1).write.partitionBy("p").parquet(path)
    mt.write_stats_manifest(spark, path, ["v", "p"])

    spark.createDataFrame(
        [(99, 999.0)], "id int, v double"
    ).coalesce(1).write.mode("append").parquet(path + "/p=1")
    rep = mt.update_stats_manifest(spark, path)
    assert rep["added"] == 1 and rep["removed"] == 0
    got, prune = mt.read_with_skipping(spark, path, {"v": (900.0, None)})
    assert prune["files_skipped"] >= 2
    rows = got.collect()
    assert [(r.id, r.v, r.p) for r in rows] == [(99, 999.0, 1)]


def test_stats_manifest_indexes_zero_row_files(spark, tmp_path):
    """A zero-row part file (empty micro-batch append, over-partitioned
    write) must still get a manifest entry — otherwise the indexers
    report success while the freshness gate reads the table as
    permanently stale (on_disk != indexed, forever)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    path = str(tmp_path / "zr")
    spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(
        2
    ).write.parquet(path)

    def add_empty(name):
        papq.write_table(
            pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.float64()),
                }
            ),
            os.path.join(path, name),
        )

    # Full index over a layout that already contains a zero-row file.
    add_empty("part-zero-a.parquet")
    n = mt.write_stats_manifest(spark, path, ["v"])
    assert n == 3  # 2 data files + the empty one
    got, rep = mt.read_with_skipping(spark, path, {"v": (10.0, 20.0)})
    assert got.count() == 11
    assert rep["files_total"] == 3
    # The zero-row file can satisfy no range predicate: pruned.
    assert rep["files_skipped"] >= 1

    # Incremental refresh discovers a NEW zero-row file and converges
    # (the regression: it returned added=0 and the gate stayed stale).
    add_empty("part-zero-b.parquet")
    out = mt.update_stats_manifest(spark, path)
    assert out["added"] == 1 and out["total"] == 4
    got, rep = mt.read_with_skipping(spark, path, {"v": (10.0, 20.0)})
    assert got.count() == 11 and rep["files_total"] == 4


def test_snapshot_partition_stats_skipping(spark, tmp_path):
    """Partition-granular min/max envelopes in the version manifest
    (recorded inside the fingerprint pass) let a range read drop whole
    partitions driver-side; results stay value-identical to filtering
    the full read, and upsert/merge keep envelopes current while
    inherited partitions keep theirs."""
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "pstats")
    # 4 partitions, v strictly increasing with p: p -> v in [100p, 100p+9]
    base = spark.range(40).selectExpr(
        "CAST(id % 4 AS INT) AS p", "CAST(id % 4 AS DOUBLE) * 100 + id AS v", "id"
    )
    assert mt.write_snapshot(base, table, part_col="p", stats_cols=["v"]) == 1

    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (200.0, 250.0)})
    want = base.filter("v >= 200.0 AND v <= 250.0")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in want.collect())
    assert rep == {"partitions_total": 4, "partitions_read": 1, "partitions_skipped": 3}

    # Every partition pruned: empty frame, schema kept.
    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (1e9, None)})
    assert got.count() == 0 and rep["partitions_read"] == 0
    assert set(got.columns) == {"p", "v", "id"}

    # Upsert rewrites partition 0 with OUT-OF-BAND values; its envelope
    # must follow, inherited partitions keep theirs.
    v2_rows = spark.range(5).selectExpr(
        "CAST(0 AS INT) AS p", "CAST(id AS DOUBLE) + 9000 AS v", "id + 1000 AS id"
    )
    assert mt.upsert_snapshot(v2_rows, table) == 2
    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (9000.0, None)})
    assert rep["partitions_read"] == 1 and got.count() == 5
    # The old envelope (0..39) no longer matches partition 0.
    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (0.0, 50.0)})
    assert rep["partitions_read"] == 0
    # Time travel: v1 still prunes with ITS envelopes.
    got, rep = mt.read_snapshot_with_stats_skipping(
        spark, table, {"v": (0.0, 50.0)}, version=1
    )
    assert rep["partitions_read"] == 1 and got.count() == 10


def test_snapshot_stats_validation_and_late_enable(spark, tmp_path):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "pstats2")
    base = spark.range(20).selectExpr(
        "CAST(id % 2 AS INT) AS p", "CAST(id AS DOUBLE) AS v", "id"
    )
    with pytest.raises(ValueError, match="requires part_col"):
        mt.write_snapshot(base, str(tmp_path / "x1"), stats_cols=["v"])
    with pytest.raises(ValueError, match="not in the frame"):
        mt.write_snapshot(base, str(tmp_path / "x2"), part_col="p", stats_cols=["nope"])
    with pytest.raises(ValueError, match="partition column"):
        mt.write_snapshot(base, str(tmp_path / "x3"), part_col="p", stats_cols=["p"])

    # Table created WITHOUT stats; reader refuses an unrecorded column.
    assert mt.write_snapshot(base, table, part_col="p") == 1
    with pytest.raises(ValueError, match="no partition stats recorded"):
        mt.read_snapshot_with_stats_skipping(spark, table, {"v": (0.0, 5.0)})

    # Enable stats via a later partial version: the rewritten partition
    # gets an envelope; the inherited one is conservatively kept.
    newer = spark.range(5).selectExpr(
        "CAST(0 AS INT) AS p", "CAST(id AS DOUBLE) + 500 AS v", "id + 100 AS id"
    )
    assert mt.upsert_snapshot(newer, table, stats_cols=["v"]) == 2
    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (0.0, 50.0)})
    # Partition 0's fresh envelope (500..504) prunes; partition 1 has no
    # envelope yet and must be read (conservative), then filtered.
    assert rep == {"partitions_total": 2, "partitions_read": 1, "partitions_skipped": 1}
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(20) if i % 2 == 1 and i <= 50
    ]


def test_snapshot_stats_survive_merge_and_noop_replay(spark, tmp_path):
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "pstats3")
    base = spark.range(30).selectExpr(
        "CAST(id % 3 AS INT) AS p", "CAST(id AS DOUBLE) AS v", "id AS k"
    )
    assert mt.write_snapshot(base, table, part_col="p", stats_cols=["v"]) == 1

    # MERGE bumps one key far out of band; the touched partition's
    # envelope must cover the new value afterwards.
    upd = spark.createDataFrame([(0, 7777.0, 0)], "p int, v double, k long")
    assert mt.merge_into_snapshot(upd, table, ["k"], skip_unchanged=True) == 2
    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (7000.0, None)})
    assert rep["partitions_read"] == 1 and got.count() == 1

    # Exact replay: no-op withdrawal still works with stats in the
    # precomputed fingerprints (version unchanged)...
    assert mt.merge_into_snapshot(upd, table, ["k"], skip_unchanged=True) == 2
    # ...and the envelopes survived untouched.
    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (7000.0, None)})
    assert rep["partitions_read"] == 1 and got.count() == 1


def test_snapshot_stats_reject_dtype_drift_and_validate_on_empty(spark, tmp_path):
    """A stat column whose dtype drifts between versions would mix
    envelope representations (double vs string) inside one version and
    crash pruning comparisons at read time — the upsert rejects it.  And
    a typo'd range column raises identically on an EMPTY version (the
    misconfiguration must not stay silent until data lands)."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "pstats4")
    base = spark.range(10).selectExpr(
        "CAST(id % 2 AS INT) AS p", "CAST(id AS DOUBLE) AS v", "id"
    )
    assert mt.write_snapshot(base, table, part_col="p", stats_cols=["v"]) == 1
    drifted = spark.range(3).selectExpr(
        "CAST(0 AS INT) AS p", "CAST(id AS STRING) AS v", "id + 50 AS id"
    )
    with pytest.raises(ValueError, match="dtype drifted"):
        mt.upsert_snapshot(drifted, table)
    # Inherited path also runs the decimal gate before any write.
    dec = spark.range(3).selectExpr(
        "CAST(0 AS INT) AS p", "CAST(id AS DECIMAL(10,2)) AS v", "id + 50 AS id"
    )
    with pytest.raises(ValueError, match="decimal"):
        mt.upsert_snapshot(dec, table)

    # Empty version: a typo'd range column still raises.
    empty_table = str(tmp_path / "pstats_empty")
    assert mt.write_snapshot(
        base.limit(0), empty_table, part_col="p", stats_cols=["v"]
    ) == 1
    with pytest.raises(ValueError, match="no partition stats recorded"):
        mt.read_snapshot_with_stats_skipping(spark, empty_table, {"vv": (0, 1)})
    got, rep = mt.read_snapshot_with_stats_skipping(spark, empty_table, {"v": (0, 1)})
    assert got.count() == 0 and rep["partitions_total"] == 0


def test_snapshot_stats_drift_gate_is_cumulative(spark, tmp_path):
    """A stat column that leaves stats_cols and re-enters later with a
    drifted dtype must still be rejected: inherited partitions can carry
    envelopes recorded under the old type many versions back.  A full
    write_snapshot rewrite (no inherited envelopes) is the sanctioned
    re-type path."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "pstats5")
    base = spark.range(10).selectExpr(
        "CAST(id % 2 AS INT) AS p", "CAST(id AS DOUBLE) AS v",
        "CAST(id AS DOUBLE) AS w", "id"
    )
    assert mt.write_snapshot(base, table, part_col="p", stats_cols=["v"]) == 1
    # v2 switches stats to w — v's history must survive the gap.
    v2 = spark.range(3).selectExpr(
        "CAST(0 AS INT) AS p", "CAST(id AS DOUBLE) AS v",
        "CAST(id AS DOUBLE) AS w", "id + 50 AS id"
    )
    assert mt.upsert_snapshot(v2, table, stats_cols=["w"]) == 2
    # v3 re-enables v with a DRIFTED dtype: rejected.
    v3 = spark.range(3).selectExpr(
        "CAST(1 AS INT) AS p", "CAST(id AS STRING) AS v",
        "CAST(id AS DOUBLE) AS w", "id + 90 AS id"
    )
    with pytest.raises(ValueError, match="dtype drifted"):
        mt.upsert_snapshot(v3, table, stats_cols=["v"])
    # Same dtype re-enable is fine.
    v3ok = spark.range(3).selectExpr(
        "CAST(1 AS INT) AS p", "CAST(id AS DOUBLE) + 900 AS v",
        "CAST(id AS DOUBLE) AS w", "id + 90 AS id"
    )
    assert mt.upsert_snapshot(v3ok, table, stats_cols=["v"]) == 3
    got, rep = mt.read_snapshot_with_stats_skipping(spark, table, {"v": (900.0, None)})
    # Partition 1 matches via its fresh v-envelope; partition 0 was last
    # rewritten while v was out of stats_cols (its meta has only a
    # w-envelope), so it is conservatively read and residual-filtered.
    assert rep["partitions_read"] == 2 and got.count() == 3
    # Full rewrite resets the history: re-typing v is now allowed.
    retyped = base.selectExpr("p", "CAST(v AS STRING) AS v", "w", "id")
    assert mt.write_snapshot(retyped, table, part_col="p", stats_cols=["v"]) == 4


# --------------------------------------------------------------------------
# Conditional-put SnapshotCommit (the object-store reference impl): the
# documented etag/if-match contract made executable, with a losing-writer
# contention test — VERDICT r8 ask #5.
# --------------------------------------------------------------------------


def test_conditional_put_commit_end_to_end(spark, tmp_path):
    """write -> merge -> read through the conditional-put protocol: the
    store copy is the truth, the local mirror tracks it, and the normal
    read path sees every committed version."""
    import json

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a"), (2, "d1", "b")], schema)

    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1
    upd = spark.createDataFrame([(2, "d1", "B"), (3, "d0", "c")], schema)
    assert mt.merge_into_snapshot(upd, table, ["id"], commit=commit) == 2

    # Store copy is the committed manifest; local mirror is identical.
    data, etag = store.get(commit._key(table))
    man = json.loads(data.decode())
    assert man["current"] == 2 and set(man["snapshots"]) == {"1", "2"}
    assert mt._load_manifest(table) == man
    assert int(etag) >= 2  # one successful put per commit
    # Normal read path (filesystem manifest + data dirs) sees v2.
    got = {
        (r.id, r.v) for r in mt.read_snapshot(spark, table, 2).collect()
    }
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # Time travel to v1 is intact.
    assert mt.read_snapshot(spark, table, 1).count() == 2


def test_conditional_put_losing_writer_raises_cleanly(spark, tmp_path):
    """Two writers race the SAME base version through the store: the one
    that loses the CAS retries against the fresh manifest, finds its
    base version gone, and raises ConcurrentSnapshotWriteError — no
    orphan manifest entries, no torn state, loser's staged dir cleaned."""
    import json
    import os

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit_a = mt.ConditionalPutSnapshotCommit(store)
    commit_b = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_race")
    schema = "id int, day string, v string"
    df_a = spark.createDataFrame([(1, "d0", "A-wrote")], schema)
    df_b = spark.createDataFrame([(9, "d0", "B-wrote")], schema)

    # Interleave a REMOTE writer (B, its own commit instance — a remote
    # host shares the store, not the flock) between A's manifest GET and
    # A's conditional PUT.  B lands v1 first; A's put hits 412, retries,
    # sees current == 1, and must lose cleanly.
    def remote_writer_wins(key):
        store.before_put = None  # B's own put must not re-trigger the hook
        mt.write_snapshot(df_b, table, part_col="day", commit=commit_b)

    store.before_put = remote_writer_wins
    with pytest.raises(mt.ConcurrentSnapshotWriteError):
        mt.write_snapshot(df_a, table, part_col="day", commit=commit_a)

    data, _ = store.get(commit_a._key(table))
    man = json.loads(data.decode())
    assert man["current"] == 1 and list(man["snapshots"]) == ["1"]
    assert mt._load_manifest(table) == man
    # Winner's data only; the loser cleaned its staged dir on failure.
    assert os.listdir(os.path.join(table, "snapshots")) == [
        os.path.basename(mt.snapshot_dir(table, 1))
    ]
    assert {r.v for r in mt.read_snapshot(spark, table).collect()} == {"B-wrote"}
    # The loser can retry against the new state and succeed as v2.
    assert mt.write_snapshot(df_a, table, part_col="day", commit=commit_a) == 2


def test_conditional_put_retry_succeeds_for_nonconflicting_mutate(tmp_path):
    """A mutate that doesn't assert a base version survives losing the
    CAS: the retry re-runs it against the fresh state and both writers'
    effects land (exactly once each)."""
    import json

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_merge")

    def add_tag(tag):
        def mutate(man):
            man.setdefault("tags", []).append(tag)
            return man
        return mutate

    def sneak_in_remote(key):
        store.before_put = None
        mt.ConditionalPutSnapshotCommit(store).commit_manifest(
            table, add_tag("remote")
        )

    store.before_put = sneak_in_remote
    man = commit.commit_manifest(table, add_tag("local"))
    # Remote landed first; local's retry re-applied onto it — once.
    assert man["tags"] == ["remote", "local"]
    data, _ = store.get(commit._key(table))
    assert json.loads(data.decode())["tags"] == ["remote", "local"]


def test_conditional_put_two_thread_contention(spark, tmp_path):
    """Two same-host threads race write_snapshot end-to-end: exactly one
    v1 lands, the other raises ConcurrentSnapshotWriteError, and the
    table is left clean and writable (one-must-lose, no orphans)."""
    import os
    import threading

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    table = str(tmp_path / "condput_threads")
    schema = "id int, day string, v string"
    outcomes = {}
    barrier = threading.Barrier(2)

    def writer(tag):
        df = spark.createDataFrame([(1, "d0", tag)], schema)
        commit = mt.ConditionalPutSnapshotCommit(store)
        barrier.wait()
        try:
            mt.write_snapshot(df, table, part_col="day", commit=commit)
            outcomes[tag] = "won"
        except mt.ConcurrentSnapshotWriteError:
            outcomes[tag] = "lost"

    threads = [threading.Thread(target=writer, args=(t,)) for t in ("t1", "t2")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert sorted(outcomes.values()) == ["lost", "won"]
    man = mt._load_manifest(table)
    assert man["current"] == 1 and list(man["snapshots"]) == ["1"]
    assert os.listdir(os.path.join(table, "snapshots")) == [
        os.path.basename(mt.snapshot_dir(table, 1))
    ]
    winner = [t for t, o in outcomes.items() if o == "won"][0]
    assert {r.v for r in mt.read_snapshot(spark, table).collect()} == {winner}
    # Table stays writable after the contention.
    df3 = spark.createDataFrame([(2, "d1", "after")], schema)
    assert (
        mt.write_snapshot(
            df3, table, part_col="day", commit=mt.ConditionalPutSnapshotCommit(store)
        )
        == 2
    )


def test_conditional_put_network_fault_leaves_old_version(spark, tmp_path):
    """A network fault mid-PUT (neither a 412 nor a success) propagates;
    the previously-committed manifest is untouched in the store AND the
    mirror, and the table stays writable."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_fault")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1

    def explode(key):
        store.before_put = None
        raise OSError("simulated store outage")

    store.before_put = explode
    with pytest.raises(OSError, match="simulated store outage"):
        mt.write_snapshot(df, table, part_col="day", commit=commit)
    assert mt._load_manifest(table)["current"] == 1
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 2


def test_conditional_put_sync_local_refreshes_reader_mirror(tmp_path):
    """A host that only reads pulls the store manifest down with
    sync_local; a deleted/stale mirror is restored byte-equal."""
    import json
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_sync")

    def mutate(man):
        man["current"] = 1
        man["snapshots"]["1"] = {"dir": "snapshots/v1-deadbeef"}
        return man

    committed = commit.commit_manifest(table, mutate)
    os.unlink(mt._manifest_path(table))  # simulate a fresh reader host
    got = commit.sync_local(table)
    assert got == committed
    with open(mt._manifest_path(table)) as f:
        assert json.load(f) == committed


# --------------------------------------------------------------------------
# Vacuum × partition-stats / time-travel interplay (VERDICT r8 ask #8):
# an expired version takes its envelopes with it; a retained version's
# envelopes keep pruning — even over partitions it inherits (COW) from
# an expired version's directory.
# --------------------------------------------------------------------------


def test_vacuum_expired_version_drops_envelopes_retained_still_prunes(
    spark, tmp_path
):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "vac_stats")
    # Partitions are contiguous v-blocks of 10, so each partition's
    # envelope is disjoint and a narrow range predicate prunes 3 of 4.
    mk = lambda lo: spark.range(lo, lo + 40).selectExpr(
        f"CAST((id - {lo}) DIV 10 AS INT) AS p", "CAST(id AS DOUBLE) AS v", "id"
    )
    assert mt.write_snapshot(mk(0), table, part_col="p", stats_cols=["v"]) == 1
    assert mt.write_snapshot(mk(1000), table, part_col="p", stats_cols=["v"]) == 2
    assert mt.write_snapshot(mk(2000), table, part_col="p", stats_cols=["v"]) == 3

    # Pre-vacuum: v3 prunes on its envelopes; capture the report.
    got, rep_before = mt.read_snapshot_with_stats_skipping(
        spark, table, {"v": (2010.0, 2011.0)}, version=3
    )
    assert rep_before["partitions_read"] < rep_before["partitions_total"]
    n_before = got.count()

    expired = mt.vacuum_snapshots(table, keep_last=2)
    assert expired == [1]

    # The expired version's envelopes are GONE from the manifest…
    man = mt._load_manifest(table)
    assert "1" not in man["snapshots"]
    assert all("parts" in m for m in man["snapshots"].values())
    # …and asking the stats reader for it fails fast, like any expired read.
    with pytest.raises(ValueError):
        mt.read_snapshot_with_stats_skipping(
            spark, table, {"v": (0.0, 1.0)}, version=1
        )
    # A retained version's envelopes still prune identically after vacuum.
    got2, rep_after = mt.read_snapshot_with_stats_skipping(
        spark, table, {"v": (2010.0, 2011.0)}, version=3
    )
    assert rep_after == rep_before
    assert got2.count() == n_before
    # And the other retained (non-current) version is stats-readable too.
    got_v2, rep_v2 = mt.read_snapshot_with_stats_skipping(
        spark, table, {"v": (1000.0, 1001.0)}, version=2
    )
    assert rep_v2["partitions_skipped"] > 0 and got_v2.count() == 2


def test_vacuum_keeps_inherited_dirs_and_stats_pruning_on_cow_partitions(
    spark, tmp_path
):
    """COW inheritance: v2 rewrites ONE partition of v1; after vacuum
    expires v1, v2's untouched partitions still live in v1's directory
    (src_dir references keep it alive) and stats-skipping over v2 reads
    them — pruning decisions AND row values both intact."""
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    table = str(tmp_path / "vac_cow_stats")
    base = spark.range(0, 40).selectExpr(
        "CAST(id % 4 AS INT) AS p", "CAST(id AS DOUBLE) AS v", "id"
    )
    assert mt.write_snapshot(base, table, part_col="p", stats_cols=["v"]) == 1
    v1_dir = mt.snapshot_dir(table, 1)
    # Rewrite only partition p=0 (keys 0 mod 4), inherit p=1..3 from v1.
    upd = spark.range(0, 10).selectExpr(
        "CAST(0 AS INT) AS p", "CAST(id + 5000 AS DOUBLE) AS v", "id * 4 AS id"
    )
    assert mt.merge_into_snapshot(upd, table, ["id"]) == 2

    expired = mt.vacuum_snapshots(table, keep_last=1)
    assert expired == [1]
    # v1's directory SURVIVES the vacuum: v2 inherits partitions from it.
    assert os.path.isdir(v1_dir)

    # Stats-skipping on v2: the rewritten partition's fresh envelope
    # prunes, and an inherited partition's envelope (computed at v1
    # write time, carried through the merge) prunes and reads correctly.
    got_new, rep_new = mt.read_snapshot_with_stats_skipping(
        spark, table, {"v": (5000.0, 5001.0)}
    )
    assert rep_new["partitions_read"] == 1 and got_new.count() == 2
    got_old, rep_old = mt.read_snapshot_with_stats_skipping(
        spark, table, {"v": (13.0, 13.0)}
    )
    # p=0's FRESH envelope (5000+) prunes it; the three inherited
    # partitions' v1-era envelopes all span [p, 36+p] and are read —
    # and the rows they serve come out of the expired version's dir.
    assert rep_old["partitions_skipped"] == 1
    assert rep_old["partitions_read"] == 3
    rows = got_old.collect()
    assert [r.v for r in rows] == [13.0]


def test_conditional_put_mirror_failure_never_destroys_committed_data(
    spark, tmp_path
):
    """A commit whose store PUT landed but whose local mirror write
    failed is a SUCCESSFUL commit: no exception, no staged-dir cleanup
    (the store manifest references it), and a later sync_local catches
    the mirror up (code-review finding: _is_published consulting the
    local mirror would have deleted store-referenced data)."""
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()

    class FlakyMirror(mt.ConditionalPutSnapshotCommit):
        fail_next_mirror = False

        def sync_local(self, table_path):
            if FlakyMirror.fail_next_mirror:
                FlakyMirror.fail_next_mirror = False
                raise OSError("simulated ENOSPC writing the mirror")
            return super().sync_local(table_path)

    commit = FlakyMirror(store)
    table = str(tmp_path / "condput_mirror")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)

    FlakyMirror.fail_next_mirror = True
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1
    # Store is the truth: v1 committed, its data directory intact.
    man = commit.manifest_for_publish_check(table)
    assert man["current"] == 1
    v1_dir = os.path.join(table, man["snapshots"]["1"]["dir"])
    assert os.path.isdir(v1_dir)
    # The mirror is stale (the write failed) until sync_local refreshes.
    assert mt._load_manifest(table)["current"] == 0
    commit.sync_local(table)
    assert mt._load_manifest(table) == man
    assert mt.read_snapshot(spark, table).count() == 1


def test_read_path_bootstraps_from_store_on_mirrorless_host(spark, tmp_path):
    """A host that never wrote the table (no local _versions.json at
    all) resolves reads through the STORE manifest and recreates the
    mirror as a cache — the round-10 object-store READ path."""
    import json
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_read")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a"), (2, "d1", "b")], schema)
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1
    upd = spark.createDataFrame([(2, "d1", "B"), (3, "d0", "c")], schema)
    assert mt.merge_into_snapshot(upd, table, ["id"], commit=commit) == 2

    # Simulate the fresh host: the data dirs are shared storage, the
    # manifest mirror is not.
    os.remove(os.path.join(table, "_versions.json"))

    got = {(r.id, r.v) for r in mt.read_snapshot(spark, table, commit=commit).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    # Mirror recreated byte-equal to the store manifest.
    data, _ = store.get(commit._key(table))
    assert mt._load_manifest(table) == json.loads(data.decode())
    # Time travel and listings resolve through the store too.
    os.remove(os.path.join(table, "_versions.json"))
    assert mt.read_snapshot(spark, table, 1, commit=commit).count() == 2
    os.remove(os.path.join(table, "_versions.json"))
    vers = mt.list_snapshots(table, commit=commit)
    assert [s["version"] for s in vers] == [1, 2]
    assert vers[-1]["current"]


def test_read_path_refreshes_stale_mirror(spark, tmp_path):
    """A mirror pinned at an OLDER committed state (another host merged
    v2 through the store) is detected and refreshed on the next read:
    the default-version read serves v2, not the stale mirror's v1."""
    import json
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_stale")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1
    v1_mirror = mt._load_manifest(table)

    upd = spark.createDataFrame([(1, "d0", "A2")], schema)
    assert mt.merge_into_snapshot(upd, table, ["id"], commit=commit) == 2
    # Regress the mirror to v1 (what a host that missed the v2 commit
    # would hold).
    mt.write_json_durable(os.path.join(table, "_versions.json"), v1_mirror)
    assert mt._load_manifest(table)["current"] == 1

    got = {(r.id, r.v) for r in mt.read_snapshot(spark, table, commit=commit).collect()}
    assert got == {(1, "A2")}
    data, _ = store.get(commit._key(table))
    assert mt._load_manifest(table) == json.loads(data.decode())

    # A CORRUPT mirror is repaired from the store the same way.
    with open(os.path.join(table, "_versions.json"), "w") as f:
        f.write("{ not json")
    assert mt.read_snapshot(spark, table, commit=commit).count() == 1
    assert mt._load_manifest(table)["current"] == 2


def test_read_path_store_outage_falls_back_to_mirror(spark, tmp_path):
    """When the store itself is unreachable the reader serves the local
    mirror (possibly stale) instead of failing — the cache inverts into
    the fallback, loudly."""
    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_outage")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1

    real_get = store.get
    store.get = lambda key: (_ for _ in ()).throw(OSError("store outage"))
    try:
        assert mt.read_snapshot(spark, table, commit=commit).count() == 1
        assert [s["version"] for s in mt.list_snapshots(table, commit=commit)] == [1]
    finally:
        store.get = real_get


def test_write_and_vacuum_planning_raise_on_store_outage(spark, tmp_path):
    """WRITE planning and vacuum use the STRICT resolution: a store
    outage raises up front instead of silently planning a staging write
    (or a deletion sweep) against a possibly-stale mirror.  Pure reads
    keep the mirror fallback (previous test)."""
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_strict")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1

    real_get = store.get
    store.get = lambda key: (_ for _ in ()).throw(OSError("store outage"))
    try:
        with pytest.raises(OSError, match="store outage"):
            mt.write_snapshot(df, table, part_col="day", commit=commit)
        with pytest.raises(OSError, match="store outage"):
            mt.merge_into_snapshot(df, table, ["id"], commit=commit)
        with pytest.raises(OSError, match="store outage"):
            mt.vacuum_snapshots(table, keep_last=1, commit=commit)
    finally:
        store.get = real_get
    # Store back: planning works again and the version chain is intact.
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 2


def test_writer_bootstraps_base_version_from_store(spark, tmp_path):
    """A WRITER on a mirror-less host plans its next version against
    the store state: without the bootstrap it would plan v1 over an
    existing v2 table and fail the commit CAS."""
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    store = mt.EtagObjectStore()
    commit = mt.ConditionalPutSnapshotCommit(store)
    table = str(tmp_path / "condput_wboot")
    schema = "id int, day string, v string"
    df = spark.createDataFrame([(1, "d0", "a")], schema)
    assert mt.write_snapshot(df, table, part_col="day", commit=commit) == 1
    assert (
        mt.merge_into_snapshot(
            spark.createDataFrame([(1, "d0", "A")], schema),
            table, ["id"], commit=commit,
        )
        == 2
    )
    os.remove(os.path.join(table, "_versions.json"))
    upd = spark.createDataFrame([(2, "d1", "new")], schema)
    assert mt.merge_into_snapshot(upd, table, ["id"], commit=commit) == 3
    assert mt.read_snapshot(spark, table, commit=commit).count() == 2


def test_conditional_put_multiwriter_soak_linear_history(tmp_path):
    """N >= 4 interleaved writers x k commits each over the lock-free
    CAS: every commit eventually lands, the version chain is linear
    (1..N*k, no gaps, no lost updates), each writer's sequence appears
    exactly once, and the store saw exactly one successful put per
    commit (final etag == N*k)."""
    import threading

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    n_writers, k = 5, 8
    store = mt.EtagObjectStore()
    table = str(tmp_path / "condput_soak")
    barrier = threading.Barrier(n_writers)
    errors = []

    def writer(tag):
        # Generous attempt budget: with 5 writers racing, a CAS loser
        # can lose repeatedly; the protocol's liveness claim is
        # eventual success, bounded only by pathological contention.
        commit = mt.ConditionalPutSnapshotCommit(store, max_attempts=500)
        barrier.wait()
        try:
            for seq in range(k):
                def mutate(man, tag=tag, seq=seq):
                    v = man["current"] + 1
                    man["snapshots"][str(v)] = {
                        "dir": f"snapshots/v{v}-{tag}-{seq}",
                        "writer": tag,
                        "seq": seq,
                    }
                    man["current"] = v
                    return man

                commit.commit_manifest(table, mutate)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append((tag, repr(e)))

    threads = [
        threading.Thread(target=writer, args=(f"w{i}",))
        for i in range(n_writers)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    total = n_writers * k
    data, etag = store.get(
        mt.ConditionalPutSnapshotCommit(store)._key(table)
    )
    man = mt._decode_manifest(data)
    # Linear chain: versions are exactly 1..total.
    assert man["current"] == total
    assert sorted(int(v) for v in man["snapshots"]) == list(range(1, total + 1))
    # No lost updates: every (writer, seq) pair present exactly once.
    seen = sorted(
        (e["writer"], e["seq"]) for e in man["snapshots"].values()
    )
    assert seen == sorted(
        (f"w{i}", s) for i in range(n_writers) for s in range(k)
    )
    # Exactly one successful put per commit — no silent double-puts.
    assert int(etag) == total
    # Per-writer sequences commit in order (a writer's seq i always
    # lands at a lower version than its seq i+1).
    by_writer = {}
    for v, e in man["snapshots"].items():
        by_writer.setdefault(e["writer"], []).append((int(v), e["seq"]))
    for tag, pairs in by_writer.items():
        pairs.sort()
        assert [s for _, s in pairs] == list(range(k)), tag
    # Mirror converged to the final store state.
    assert mt._load_manifest(table) == man


def test_current_umask_probe_reads_procfs_without_mutation(tmp_path):
    """_current_umask matches os.umask() without ever mutating it, and
    tracks a changed umask between calls."""
    import os

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    actual = os.umask(0o027)
    try:
        assert mt._current_umask() == 0o027
        os.umask(0o022)
        assert mt._current_umask() == 0o022
    finally:
        os.umask(actual)
    # Fresh manifests get mode 0666 & ~umask.
    import stat

    target = str(tmp_path / "fresh.json")
    mt.write_json_durable(target, {"x": 1})
    assert stat.S_IMODE(os.stat(target).st_mode) == 0o666 & ~mt._current_umask()
    # Where procfs is absent the probe reports "unknown" (None), and a
    # fresh write must NOT widen past mkstemp's 0600 (a guessed 0o022
    # against a real 0o077 umask would have).
    assert mt._current_umask(str(tmp_path / "no-procfs")) is None


def test_fresh_write_without_umask_probe_never_widens(tmp_path, monkeypatch):
    """With the umask unknowable, a FRESH file keeps mkstemp's 0600;
    an existing target's mode is still preserved exactly."""
    import os
    import stat

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    monkeypatch.setattr(mt, "_current_umask", lambda *a: None)
    fresh = str(tmp_path / "fresh.json")
    mt.write_json_durable(fresh, {"x": 1})
    assert stat.S_IMODE(os.stat(fresh).st_mode) == 0o600
    # Rewrite of an existing 0644 target preserves 0644 (no probe needed).
    os.chmod(fresh, 0o644)
    mt.write_json_durable(fresh, {"x": 2})
    assert stat.S_IMODE(os.stat(fresh).st_mode) == 0o644


def test_is_published_logs_expected_failures_and_raises_bugs(tmp_path, caplog):
    """Expected read failures -> published (never delete on
    uncertainty) with a WARNING; programming errors (AttributeError)
    propagate instead of silently disabling cleanup forever."""
    import logging

    import pytest

    from cryptocurrency_data_pipeline_spark.operators import maintenance as mt

    class FlakyCommit(mt.SnapshotCommit):
        def manifest_for_publish_check(self, table_path):
            raise OSError("store read failed")

    with caplog.at_level(logging.WARNING):
        assert mt._is_published(str(tmp_path), 1, "snapshots/v1-x", FlakyCommit())
    assert any("publish check" in r.message for r in caplog.records)

    class BuggyCommit(mt.SnapshotCommit):
        def manifest_for_publish_check(self, table_path):
            raise AttributeError("misconfigured commit object")

    with pytest.raises(AttributeError):
        mt._is_published(str(tmp_path), 1, "snapshots/v1-x", BuggyCommit())
