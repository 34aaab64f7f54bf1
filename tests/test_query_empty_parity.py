"""Oracle parity on ALL-EMPTY tables (``sfempty``, tools/make_empty_sf.py).

Every table keeps its exact schema with ZERO rows — the first-run /
new-tenant / nothing-matched-the-predicate input class a 100 TB
pipeline hits constantly.  The round-9 sweep of all 196 queries over
this scale point surfaced 12 divergences in 7 classes, all fixed:

* ANSI divide-by-zero in the Deequ profile ratios (Completeness /
  Uniqueness / Distinctness -> ``try_divide``, Size coalesced to 0 in
  the keyed path where ``sum`` over an empty grouped frame is NULL);
* Spark emits NO grand-total row for rollup/cube/grouping-sets over an
  empty table where the SQL standard (and DuckDB) emit one — mirrored
  with a no-op-on-nonempty ``HAVING count(*) > 0``;
* a never-seeded snapshot-sink table has no version to read — lookups
  and final reads return typed empty frames instead of crashing;
* a file-less partials directory fails parquet schema inference —
  ``matview.read_partials`` pins the schema from the never-executed
  partials plan;
* IVF/IVFPQ training over zero vectors: ``ivf_topk`` returns the typed
  empty top-k, ``build_ivfpq_index`` refuses the empty corpus outright
  (instead of writing artifacts the serve path would later misreport
  as an aborted build);
* NULL-vs-0 seams where one engine's ``sum`` over empty is NULL and
  the other's ``count(*) FILTER`` is 0 (coalesced engine-side).

This suite replays one representative per class on every pytest run;
the full-registry sweep is
``python tools/check_oracle.py /tmp/spark_graft_sfempty`` after
``python tools/make_empty_sf.py``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_empty_sf import build

#: One representative per empty-input divergence class, plus a spread of
#: ordinary agg/window/join/text/stream queries that must no-op cleanly.
EMPTY_REPS = [
    "dq_profile_lineitem",          # try_divide completeness, NULL moments
    "dq_constraint_check",          # Size() coalesced to 0 in keyed path
    "rollup_returnflag_status",     # no grand-total row on empty (Spark)
    "grouping_sets_revenue",        # same, grouping-sets + joins upstream
    "mergeable_sketch_rollup",      # read_partials schema-pinned read
    "stream_snapshot_sink_replay",  # never-seeded sink -> typed empty
    "bucket_point_lookup",          # lookup against version-less table
    "ivf_ann_topk",                 # zero centroids -> empty top-k
    "ivfpq_topk_served",            # build refuses empty corpus; query guards
    "consistent_reshard_stability", # sum-NULL vs FILTER-0 coalesce
    # ordinary shapes that must pass through untouched:
    "flagship_daily_rollup",
    "tumbling_hourly_stats",
    "window_user_deltas",
    "minhash_near_dups",
    "merge_into_orders",
]


@pytest.fixture(scope="module")
def empty_sf_dir():
    d = f"/tmp/spark_graft_sfempty_{os.getpid()}"
    build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def empty_duck(empty_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{empty_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMPTY_REPS)
def test_empty_parity(spark, empty_sf_dir, empty_duck, name):
    sdf = QUERIES[name](spark, empty_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = empty_duck.sql(ORACLES[name])
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


def test_build_ivfpq_index_refuses_empty_corpus(spark, empty_sf_dir, tmp_path):
    """The build fails with the REAL cause (empty corpus) instead of
    writing zero-row artifacts the serve path would later misreport as
    an aborted build."""
    from cryptocurrency_data_pipeline_spark.operators import pq
    from cryptocurrency_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, empty_sf_dir, "embeddings")
    with pytest.raises(ValueError, match="empty corpus"):
        pq.build_ivfpq_index(emb, str(tmp_path / "idx"))
    assert not os.path.exists(str(tmp_path / "idx"))


def test_profile_on_empty_is_defined_not_dead(spark):
    """quality.profile over zero rows: Size 0, every ratio NULL (0/0 is
    undefined, not a job abort), moments NULL, in BOTH agg paths."""
    from cryptocurrency_data_pipeline_spark.operators import quality

    df = spark.createDataFrame([], "k bigint, v double")
    m = quality.profile(df, completeness_cols=["v"], numeric_cols=["v"])
    assert m["Size()"] == 0.0
    assert m["Completeness(v)"] is None and m["Mean(v)"] is None

    mk = quality.profile(
        df, completeness_cols=["v"], numeric_cols=["v"], unique_key="k"
    )
    assert mk["Size()"] == 0.0
    assert mk["Uniqueness(k)"] is None and mk["Distinctness(k)"] is None


#: Single-row representatives — a DISTINCT degenerate class from empty
#: (round-9 probe): constant dimensions must collapse, not divide by a
#: zero range; an absent cohort/arm/snapshot is NULL, never a number
#: smoothed out of nothing; an empty evolving upsert carries no new
#: column into the assembled read.
ONE_ROW_REPS = [
    "zorder_events_locality",   # umax==umin / vmax==vmin -> coordinate 0
    "ab_test_chi_square",       # empty arm -> NULL rate, not ANSI abort
    "token_drift_report",       # absent snapshot half -> NULL drift
    "schema_evolution_read",    # empty evolving upsert -> all-NULL tier
    "events_value_histogram",   # mx==mn constant-column bucket 0
    "flagship_daily_rollup",
]


@pytest.fixture(scope="module")
def one_row_sf_dir():
    d = f"/tmp/spark_graft_sfone_{os.getpid()}"
    build(d, n_rows=1)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", ONE_ROW_REPS)
def test_one_row_parity(spark, one_row_sf_dir, name):
    con = duckdb.connect()
    try:
        for tab in TABLES:
            con.execute(
                f"CREATE VIEW {tab} AS SELECT * FROM "
                f"read_parquet('{one_row_sf_dir}/{tab}.parquet')"
            )
        sdf = QUERIES[name](spark, one_row_sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(ORACLES[name])
        drows = rel.fetchall()
        assert len(srows) == len(drows), (
            f"{name}: spark={len(srows)} duck={len(drows)}\n"
            f"spark: {sorted(srows, key=str)[:8]}\nduck: {sorted(drows, key=str)[:8]}"
        )
        assert table_hash(sdf.columns, srows) == table_hash(rel.columns, drows)
    finally:
        con.close()
