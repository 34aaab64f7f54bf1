"""Skew-mitigation operators + incremental-ingest ledger + SQL-view surface."""

import json

import pyspark.sql.functions as F

from cryptocurrency_data_pipeline_spark.operators import skew
from cryptocurrency_data_pipeline_spark.sources import bookmarks, tables


def test_salted_agg_matches_naive(spark):
    # 'hot' holds 90% of rows — the pathological key.
    rows = [("hot", float(i % 7)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    salted = skew.salted_agg(
        df, ["k"],
        {"total": ("v", "sum"), "n": ("v", "count"),
         "lo": ("v", "min"), "hi": ("v", "max"), "mean": ("v", "avg")},
        n_salts=8,
    )
    naive = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("v").alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.avg("v").alias("mean"),
    )
    s = {r.k: (r.total, r.n, r.lo, r.hi, round(r.mean, 9)) for r in salted.collect()}
    n = {r.k: (r.total, r.n, r.lo, r.hi, round(r.mean, 9)) for r in naive.collect()}
    assert s == n


def test_salted_join_matches_naive(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("absent", "A")], "k string, tag string"
    )
    salted = skew.salted_join(big, small, "k", n_salts=4)
    naive = big.join(small, "k")
    assert salted.count() == naive.count() == 505
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, naive.collect()))


def test_bookmark_incremental_reads(spark, tmp_path):
    src, ledger = str(tmp_path / "in"), str(tmp_path / "ledger")
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "f1.json").write_text(json.dumps({"a": 1}) + "\n")

    df, batch, more = bookmarks.read_incremental(spark, src, ledger)
    assert df.count() == 1 and len(batch) == 1 and more is False
    bookmarks.commit(spark, batch, ledger)

    # Nothing new → no work.
    df2, batch2, more2 = bookmarks.read_incremental(spark, src, ledger)
    assert df2 is None and batch2 == [] and more2 is False

    # New file arrives → only it is read.
    (tmp_path / "in" / "f2.json").write_text(json.dumps({"a": 2}) + "\n")
    df3, batch3, more3 = bookmarks.read_incremental(spark, src, ledger)
    assert df3.count() == 1
    assert batch3 == [str(tmp_path / "in" / "f2.json")]
    assert more3 is False


def test_sql_views_surface(spark):
    """spark.sql over registered testdata views — the SQL half of the API."""
    tables.register_views(spark, "/root/testdata/sf0.001")
    out = spark.sql(
        """
        SELECT r_name, count(*) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    assert len(out) == 5 and all(r.n_nations == 5 for r in out)


def test_mixture_keep_rates_and_determinism(spark):
    import pyspark.sql.functions as F

    from cryptocurrency_data_pipeline_spark.operators.sampling import mixture_keep

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("source")
    )
    kept_all = df.filter(mixture_keep("doc_id", "source", F.lit(1.0))).count()
    kept_none = df.filter(mixture_keep("doc_id", "source", F.lit(0.0))).count()
    assert (kept_all, kept_none) == (4000, 0)
    k1 = df.filter(mixture_keep("doc_id", "source", F.lit(0.5))).count()
    k2 = df.filter(mixture_keep("doc_id", "source", F.lit(0.5))).count()
    assert k1 == k2  # hash-deterministic, not RNG
    assert abs(k1 / 4000 - 0.5) < 0.05
    # Different sources decorrelate: same ids, different keep set.
    other = df.withColumn("source", F.lit("books"))
    ka = {r.doc_id for r in df.filter(mixture_keep("doc_id", "source", F.lit(0.5))).collect()}
    kb = {r.doc_id for r in other.filter(mixture_keep("doc_id", "source", F.lit(0.5))).collect()}
    assert ka != kb


def test_salted_join_guards_replication_blast_radius(spark):
    """The optional small-side probe raises before materializing an
    n_salts-times copy of a 'small' side that is not actually small;
    under the bound the join proceeds and matches the naive result."""
    import pytest

    big = spark.createDataFrame([("hot", i) for i in range(50)], "k string, v long")
    small = spark.createDataFrame(
        [(f"k{i}", "t") for i in range(200)] + [("hot", "H")], "k string, tag string"
    )
    with pytest.raises(ValueError, match="max_small_rows"):
        skew.salted_join(big, small, "k", n_salts=4, max_small_rows=100)
    ok = skew.salted_join(big, small, "k", n_salts=4, max_small_rows=500)
    assert ok.count() == big.join(small, "k").count() == 50


def test_new_files_skips_inflight_temporary_dirs(spark, tmp_path):
    """A concurrent Spark writer's _temporary/.staging trees must be
    invisible to the ledger listing: their part files are torn, and the
    same data reappears at a different final path when the writer
    commits — double processing."""
    import os

    from cryptocurrency_data_pipeline_spark.sources import bookmarks

    src = tmp_path / "in"
    (src / "_temporary" / "0").mkdir(parents=True)
    (src / ".staging").mkdir()
    (src / "_temporary" / "0" / "part-00000.json").write_text('{"a": 1}\n')
    (src / ".staging" / "part-00001.json").write_text('{"a": 2}\n')
    (src / "part-00002.json").write_text('{"a": 3}\n')
    got = bookmarks.new_files(spark, str(src), str(tmp_path / "ledger"))
    assert got == [str(src / "part-00002.json")]


def test_ledger_corruption_propagates_not_reprocesses(spark, tmp_path):
    """Only PATH_NOT_FOUND maps to 'no ledger yet'; a corrupt ledger
    must raise, not silently mark the whole input as fresh."""
    import pytest

    from cryptocurrency_data_pipeline_spark.sources import bookmarks

    ledger = tmp_path / "ledger"
    ledger.mkdir()
    (ledger / "part-00000.parquet").write_bytes(b"not a parquet file")
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "f.json").write_text("{}\n")
    with pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        bookmarks.new_files(spark, str(tmp_path / "in"), str(ledger))


def test_salted_join_rejects_outer_shapes(spark):
    """A right/full outer salted join would emit every unmatched
    small-side replica n_salts times; the operator refuses those shapes
    instead of silently multiplying rows."""
    import pytest

    big = spark.createDataFrame([("a", 1)], "k string, v long")
    small = spark.createDataFrame([("a", "t"), ("b", "u")], "k string, tag string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="inner/left"):
            skew.salted_join(big, small, "k", how=how)
    # Left outer is fine: unmatched BIG rows appear once (they carry one salt).
    left = skew.salted_join(
        big.unionByName(spark.createDataFrame([("zz", 9)], "k string, v long")),
        small, "k", how="left",
    )
    assert left.count() == 2


def test_row_salt_is_content_deterministic(spark):
    """The per-row salt must be a pure function of row content, not
    rand(): a stage retry that re-rolls salts double-counts or drops
    rows (SPARK-23207).  Pin that identical content always lands on the
    same salt and re-evaluation is stable."""
    df = spark.createDataFrame(
        [("k", i % 10) for i in range(200)], "k string, v long"
    )
    salted = df.withColumn("s", skew._row_salt(df, 8))
    first = salted.groupBy("v", "s").count().collect()
    second = salted.groupBy("v", "s").count().collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    # Same content -> same salt: each distinct v maps to exactly one salt.
    per_v = salted.groupBy("v").agg(F.countDistinct("s").alias("n")).collect()
    assert all(r.n == 1 for r in per_v)


def test_split_assignment_validates_coverage_and_overlap(spark):
    import pytest

    from cryptocurrency_data_pipeline_spark.operators import sampling

    with pytest.raises(ValueError, match="uncovered"):
        sampling.split_assignment("id", (("train", "0123456789"), ("test", "abcde")))
    with pytest.raises(ValueError, match="both"):
        sampling.split_assignment("id", (("a", "0123456789ab"), ("b", "bcdef")))
    with pytest.raises(ValueError, match="hex"):
        sampling.split_assignment("id", (("a", "0123456789ABCDEF"),))


def test_mixture_keep_null_source_kept_at_full_rate(spark):
    """A NULL source must not silently drop rows: at rate 1.0 every row
    is kept (the un-framed md5(source || id) hash was NULL for NULL
    sources, and NULL < threshold filtered them at ANY rate)."""
    from cryptocurrency_data_pipeline_spark.operators.sampling import mixture_keep

    df = spark.createDataFrame(
        [(1, "web"), (2, None), (3, "books")], "doc_id long, source string"
    )
    assert df.filter(mixture_keep("doc_id", "source", F.lit(1.0))).count() == 3
    assert df.filter(mixture_keep("doc_id", "source", F.lit(0.0))).count() == 0


def test_new_files_batch_is_bounded_and_drains(spark, tmp_path):
    """A backlogged source (many fresh files) is drained in bounded,
    deterministic lexicographic batches — the driver never collects the
    full fresh set (at 100 TB a backlog can be millions of paths), and
    the commit-after-process loop converges to empty."""
    from cryptocurrency_data_pipeline_spark.sources import bookmarks

    src = tmp_path / "in"
    src.mkdir()
    for i in range(27):
        (src / f"f{i:03d}.json").write_text('{"v": %d}\n' % i)
    ledger = str(tmp_path / "ledger")

    batch1 = bookmarks.new_files(spark, str(src), ledger, max_batch_files=10)
    assert len(batch1) == 10
    assert batch1 == sorted(batch1)  # deterministic oldest-first order
    bookmarks.commit(spark, batch1, ledger)

    batch2 = bookmarks.new_files(spark, str(src), ledger, max_batch_files=10)
    assert len(batch2) == 10 and not set(batch1) & set(batch2)
    bookmarks.commit(spark, batch2, ledger)

    batch3 = bookmarks.new_files(spark, str(src), ledger, max_batch_files=10)
    assert len(batch3) == 7
    bookmarks.commit(spark, batch3, ledger)

    assert bookmarks.new_files(spark, str(src), ledger, max_batch_files=10) == []
    assert set(batch1) | set(batch2) | set(batch3) == {
        str(src / f"f{i:03d}.json") for i in range(27)
    }

    import pytest

    with pytest.raises(ValueError, match="max_batch_files"):
        bookmarks.new_files(spark, str(src), ledger, max_batch_files=0)


def test_new_files_listing_is_streamed_and_early_stopped(spark, tmp_path):
    """The driver never materializes the full backlog listing: the walk
    streams lazily and STOPS once the batch is overfull.  With 500
    fresh files, a 10-file batch at chunk_files=10 must touch ~21 paths
    (two chunks to detect has_more), not all 500 — the bounded-memory
    contract that makes a million-file backlog safe on the driver."""
    from cryptocurrency_data_pipeline_spark.sources import bookmarks

    src = tmp_path / "in"
    src.mkdir()
    for i in range(500):
        (src / f"f{i:04d}.json").write_text("{}\n")
    ledger = str(tmp_path / "ledger")

    walked: list[str] = []
    real_walk = bookmarks._walk_lex

    def counting_walk(d):
        for p in real_walk(d):
            walked.append(p)
            yield p

    orig = bookmarks._walk_lex
    bookmarks._walk_lex = counting_walk
    try:
        batch, has_more = bookmarks.new_files_batch(
            spark, str(src), ledger, max_batch_files=10, chunk_files=10
        )
    finally:
        bookmarks._walk_lex = orig

    assert len(batch) == 10 and has_more is True
    assert batch == [str(src / f"f{i:04d}.json") for i in range(10)]
    # Early stop: 10 (first chunk) + 10 (second chunk proves has_more);
    # the remaining 480 paths were never listed.
    assert len(walked) <= 20

    # Drain-to-empty still converges and flags the last batch correctly.
    bookmarks.commit(spark, batch, ledger)
    seen = set(batch)
    while has_more:
        batch, has_more = bookmarks.new_files_batch(
            spark, str(src), ledger, max_batch_files=128, chunk_files=32
        )
        assert not set(batch) & seen
        seen |= set(batch)
        bookmarks.commit(spark, batch, ledger)
    assert len(seen) == 500
    assert bookmarks.new_files(spark, str(src), ledger) == []


def test_walk_lex_exact_string_order_across_nesting(tmp_path):
    """_walk_lex must yield EXACT string-lexicographic order even in the
    dir-vs-file prefix corner: 'a.txt' (0x2E) sorts before 'a/x' (0x2F),
    and a subdirectory's descendants interleave with sibling files by
    full-path comparison — the property that makes the early-stopped
    batch equal the old global orderBy(path).limit(n) result."""
    from cryptocurrency_data_pipeline_spark.sources import bookmarks

    root = tmp_path / "in"
    (root / "a").mkdir(parents=True)
    (root / "a" / "x.json").write_text("{}")
    (root / "a.txt").write_text("{}")
    (root / "a0").mkdir()  # '0' (0x30) > '/' (0x2F): after a/ descendants
    (root / "a0" / "y.json").write_text("{}")
    (root / "b.json").write_text("{}")
    (root / "_staging").mkdir()
    (root / "_staging" / "part-0.json").write_text("{}")
    (root / ".hidden.json").write_text("{}")

    got = list(bookmarks._walk_lex(str(root)))
    assert got == sorted(got)  # exact global string order
    assert got == [
        str(root / "a.txt"),
        str(root / "a" / "x.json"),
        str(root / "a0" / "y.json"),
        str(root / "b.json"),
    ]


def test_walk_skips_symlinked_directories(spark, tmp_path):
    """A symlink to a DIRECTORY must be neither yielded as a file nor
    descended (the os.walk(followlinks=False) semantics the streamed
    walk replaced): classified as a file it would be 'ingested' as one
    committed ledger path and every file later added under it silently
    skipped (ADVICE r13).  A symlink to a regular FILE stays a file."""
    import os

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "sub" / "a.json").write_text("{}")
    real_file = tmp_path / "outside.json"
    real_file.write_text("{}")

    linked_tree = tmp_path / "tree"
    (linked_tree / "deep").mkdir(parents=True)
    (linked_tree / "deep" / "hidden.json").write_text("{}")

    os.symlink(linked_tree, src / "linkdir")          # dir symlink: skip
    os.symlink(real_file, src / "linkfile.json")      # file symlink: keep

    walked = list(bookmarks._walk_lex(str(src)))
    assert str(src / "linkfile.json") in walked
    assert str(src / "sub" / "a.json") in walked
    assert all("linkdir" not in p for p in walked)
    assert all("hidden.json" not in p for p in walked)
