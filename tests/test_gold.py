"""Gold layer: calendar dim, key-deduped dim merge, idempotent fact merge
via dynamic partition overwrite (the reference rewrites the whole table —
glue/data_aggregate_gold.py:73-100)."""

import datetime

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators import gold


def test_build_dim_date(spark):
    df = spark.createDataFrame(
        [("2024-01-06",), ("2024-01-08",), ("2024-01-06",)], "d string"
    )
    dim = gold.build_dim_date(df, "d")
    rows = {r.date: r for r in dim.collect()}
    assert len(rows) == 2
    sat = rows[datetime.date(2024, 1, 6)]
    assert (sat.year, sat.month, sat.day, sat.quarter) == (2024, 1, 6, 1)
    assert sat.day_of_week == 7 and sat.is_weekend is True
    assert sat.month_name == "January" and sat.day_name == "Saturday"
    mon = rows[datetime.date(2024, 1, 8)]
    assert mon.is_weekend is False and mon.day_name == "Monday"


def test_merge_dim_key_dedup(spark):
    existing = spark.createDataFrame(
        [("btc", "btc", "Bitcoin"), ("eth", "eth", "Ethereum")],
        "coin_id string, symbol string, name string",
    )
    # btc renamed: reference's union+distinct would keep BOTH rows forever.
    new = spark.createDataFrame(
        [("btc", "btc", "Bitcoin Core"), ("sol", "sol", "Solana")],
        "coin_id string, symbol string, name string",
    )
    merged = gold.merge_dim(existing, new, ["coin_id"])
    got = {r.coin_id: r.name for r in merged.collect()}
    assert got == {"btc": "Bitcoin Core", "eth": "Ethereum", "sol": "Solana"}
    # Idempotent: merging the same frame again changes nothing.
    again = gold.merge_dim(merged, new, ["coin_id"])
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, merged.collect()))


def test_merge_fact_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "fact")
    day1 = spark.createDataFrame(
        [("btc", 100.0, "2024-01-01"), ("eth", 10.0, "2024-01-01")],
        "coin_id string, price double, date string",
    )
    day2 = spark.createDataFrame(
        [("btc", 110.0, "2024-01-02")], "coin_id string, price double, date string"
    )
    gold.merge_fact(day1, path)
    gold.merge_fact(day2, path)
    assert spark.read.parquet(path).count() == 3
    # Re-run day2 with corrected data: replaces ONLY that partition.
    day2_fix = spark.createDataFrame(
        [("btc", 111.0, "2024-01-02"), ("eth", 11.0, "2024-01-02")],
        "coin_id string, price double, date string",
    )
    gold.merge_fact(day2_fix, path)
    out = spark.read.parquet(path)
    assert out.count() == 4
    assert out.filter(F.col("date") == "2024-01-01").count() == 2
    assert {r.price for r in out.filter(F.col("date") == "2024-01-02").collect()} == {111.0, 11.0}


def test_build_fact_and_dim(spark):
    silver = spark.createDataFrame(
        [("btc", 1.0, "2024-01-01"), (None, 2.0, "2024-01-01"), ("btc", 1.0, "2024-01-01")],
        "coin_id string, price double, update_date string",
    )
    fact = gold.build_fact(silver)
    assert fact.columns == ["coin_id", "price", "date"]
    assert fact.count() == 2  # null key dropped (P4)
    dim = gold.build_dim(silver.filter(F.col("coin_id").isNotNull()), ["coin_id"])
    assert dim.count() == 1


def test_write_sorted_files_cover_disjoint_ranges(spark, tmp_path):
    """Range-clustered layout: per-file [min,max] spans must not overlap,
    and a range filter must prune row groups via footer stats."""
    import glob as _glob

    from cryptocurrency_data_pipeline_spark.operators.gold import write_sorted
    from cryptocurrency_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    out = str(tmp_path / "li_sorted")
    write_sorted(li, out, "l_shipdate", n_files=8)

    files = _glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 8
    spans = []
    for f in files:
        row = spark.read.parquet(f).agg(
            F.min("l_shipdate"), F.max("l_shipdate")
        ).collect()[0]
        spans.append((row[0], row[1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint: file i's max <= file i+1's min

    # Row count survives the layout rewrite exactly.
    assert spark.read.parquet(out).count() == li.count()


def test_scd2_merge_two_rounds(spark):
    """SCD2: changed attrs close the old version and open a new one;
    unchanged keys untouched; new keys appended; history preserved."""
    from cryptocurrency_data_pipeline_spark.operators.gold import scd2_merge

    d = datetime.date

    r1 = spark.createDataFrame(
        [("btc", "Bitcoin", d(2024, 1, 1)), ("eth", "Ethereum", d(2024, 1, 1))],
        "coin_id string, name string, effective_date date",
    )
    dim = scd2_merge(None, r1, "coin_id", ["name"])
    assert dim.count() == 2
    assert dim.filter("is_current").count() == 2

    r2 = spark.createDataFrame(
        [
            ("btc", "Bitcoin Core", d(2024, 2, 1)),   # changed -> new version
            ("eth", "Ethereum", d(2024, 2, 1)),       # unchanged -> no-op
            ("sol", "Solana", d(2024, 2, 1)),         # new key
        ],
        "coin_id string, name string, effective_date date",
    )
    dim2 = scd2_merge(dim, r2, "coin_id", ["name"])
    rows = {(r.coin_id, r.name): r for r in dim2.collect()}
    assert len(rows) == 4  # btc v1+v2, eth v1, sol v1

    closed = rows[("btc", "Bitcoin")]
    assert closed.is_current is False and closed.valid_to == d(2024, 2, 1)
    reopened = rows[("btc", "Bitcoin Core")]
    assert reopened.is_current is True and reopened.valid_from == d(2024, 2, 1)
    assert rows[("eth", "Ethereum")].is_current is True
    assert rows[("eth", "Ethereum")].valid_to is None
    assert rows[("sol", "Solana")].valid_from == d(2024, 2, 1)

    # Idempotence: re-merging the same batch changes nothing.
    dim3 = scd2_merge(dim2, r2, "coin_id", ["name"])
    assert dim3.count() == 4
    assert dim3.filter("is_current").count() == 3


def test_scd2_merge_multi_effective_dates_one_batch(spark):
    """A batch carrying several effective dates for one key must chain
    versions in date order with exactly ONE is_current row per key — the
    join-per-update formulation fanned out into one current row per date."""
    from cryptocurrency_data_pipeline_spark.operators.gold import scd2_merge

    d = datetime.date
    dim = scd2_merge(
        None,
        spark.createDataFrame(
            [("btc", "Bitcoin", d(2024, 1, 1))],
            "coin_id string, name string, effective_date date",
        ),
        "coin_id",
        ["name"],
    )
    batch = spark.createDataFrame(
        [
            ("btc", "Bitcoin Core", d(2024, 2, 1)),
            ("btc", "Bitcoin", d(2024, 3, 1)),      # reverts -> third version
            ("btc", "Bitcoin", d(2024, 4, 1)),      # no-op vs 3/1 -> collapses
            ("sol", "Solana", d(2024, 2, 1)),
            ("sol", "Solana SOL", d(2024, 3, 1)),
        ],
        "coin_id string, name string, effective_date date",
    )
    out = scd2_merge(dim, batch, "coin_id", ["name"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.coin_id, []).append(r)
    assert sum(1 for r in out if r.is_current) == 2  # one per key
    btc = sorted(by_key["btc"], key=lambda r: r.valid_from)
    assert [(r.name, r.valid_from, r.valid_to, r.is_current) for r in btc] == [
        ("Bitcoin", d(2024, 1, 1), d(2024, 2, 1), False),
        ("Bitcoin Core", d(2024, 2, 1), d(2024, 3, 1), False),
        ("Bitcoin", d(2024, 3, 1), None, True),
    ]
    sol = sorted(by_key["sol"], key=lambda r: r.valid_from)
    assert [(r.name, r.valid_to, r.is_current) for r in sol] == [
        ("Solana", d(2024, 3, 1), False),
        ("Solana SOL", None, True),
    ]
    # Multi-date FIRST load also chains (no fanout on bootstrap).
    first = scd2_merge(
        None,
        spark.createDataFrame(
            [("eth", "Ethereum", d(2024, 1, 1)), ("eth", "Ether", d(2024, 2, 1))],
            "coin_id string, name string, effective_date date",
        ),
        "coin_id",
        ["name"],
    ).collect()
    assert sum(1 for r in first if r.is_current) == 1
    assert len(first) == 2


def test_snapshot_diff_classifies_all_cases(spark):
    from cryptocurrency_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, f string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "CHANGED"), (4, "d")], "doc_id long, f string"
    )
    got = {
        r.doc_id: r.change_type
        for r in snapshot_diff(old, new, "doc_id", "f").collect()
    }
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_scd2_full_batch_replay_is_noop(spark):
    """Stale-update guard: replaying a batch whose dates predate the
    current row's valid_from must NOT re-insert versions that already
    live in history (the steady-state idempotence contract)."""
    from cryptocurrency_data_pipeline_spark.operators.gold import scd2_merge

    d = datetime.date
    batch = spark.createDataFrame(
        [
            ("btc", "Bitcoin", d(2024, 1, 1)),
            ("btc", "Bitcoin Core", d(2024, 2, 1)),
            ("btc", "Bitcoin", d(2024, 3, 1)),
        ],
        "coin_id string, name string, effective_date date",
    )
    dim = scd2_merge(None, batch, "coin_id", ["name"])
    assert dim.count() == 3  # three genuine versions

    # full replay: every date <= current valid_from -> all stale -> no-op
    replay = scd2_merge(dim, batch, "coin_id", ["name"])
    assert sorted(
        (r.coin_id, r.name, r.valid_from, r.valid_to, r.is_current)
        for r in replay.collect()
    ) == sorted(
        (r.coin_id, r.name, r.valid_from, r.valid_to, r.is_current)
        for r in dim.collect()
    )

    # a genuinely newer date still merges after the guard
    newer = spark.createDataFrame(
        [("btc", "Bitcoin XT", d(2024, 4, 1))],
        "coin_id string, name string, effective_date date",
    )
    dim2 = scd2_merge(dim, newer, "coin_id", ["name"])
    assert dim2.count() == 4
    assert dim2.filter("is_current").count() == 1


def test_snapshot_diff_null_fingerprints_classified_by_presence(spark):
    """Presence comes from per-side markers, not fingerprint nullness:
    a null fingerprint value must not flip removed->added or make a
    null-vs-value pair read as unchanged."""
    from cryptocurrency_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "aa"), (3, "bb"), (4, None)], "k long, fp string"
    )
    new = spark.createDataFrame(
        [(2, None), (3, "bb"), (4, None), (5, None)], "k long, fp string"
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, "k", "fp").collect()}
    assert out == {
        1: "removed",     # old-only, null fp: NOT 'added'
        2: "changed",     # value -> null: NOT 'unchanged'
        3: "unchanged",
        4: "unchanged",   # null == null under eqNullSafe
        5: "added",
    }
