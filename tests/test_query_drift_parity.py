"""Oracle parity on SCHEMA-DRIFTED multi-file tables (``sfdrift``,
tools/make_drift_sf.py).

The twelfth adversarial scale point: tables as DIRECTORIES of parquet
parts written with evolving schemas — columns added by later writers
(older parts lack them: events.props, documents.lang/source,
orders.o_orderpriority, customer.c_mktsegment), and columns reordered
between writers (lineitem, plus the last part of every drifted table).
At 100 TB this is the normal bronze-layer state; an engine that
projects every part onto the first file's schema (Spark's
mergeSchema=false default) silently DROPS later writers' columns.

Both engines union part schemas BY NAME: the engine via
``sources/tables.py:read_drifted`` (mergeSchema=true, metadata-only
footer merge), the oracle via ``read_parquet(dir/*.parquet,
union_by_name=true)``; pre-drift rows surface added columns as NULL
identically on both sides (the NULL-saturation semantics themselves
are sfnull's axis — here the seam is the multi-file read itself).

This suite replays representatives across every drifted table/seam per
pytest run; the full-registry sweep is
``python tools/check_oracle.py /tmp/spark_graft_sfdrift`` after
``python tools/make_drift_sf.py /tmp/spark_graft_sfdrift`` (or
``python tools/sweep_matrix.py drift``).
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_drift_sf import build

#: One representative per drifted table and consumer shape: the
#: added-column NULL seam (props/lang/source/o_orderpriority/
#: c_mktsegment consumers), the reorder-only seam (lineitem scans and
#: joins), and multi-table star joins crossing several drifted dirs.
DRIFT_REPS = [
    "flagship_daily_rollup",        # events dir: 3 parts, one w/o props
    "window_user_deltas",           # events window pass across parts
    "session_windows",              # event-time sessions across parts
    "props_json_extraction_stats",  # props NULL for the pre-drift third
    "pricing_summary",              # lineitem reorder-only seam
    "dq_profile_lineitem",          # profile over reordered parts
    "star_revenue_by_nation",       # joins across 3 drifted dirs
    "top_orders_per_customer",      # orders: priority-less first half
    "urgent_only_customers",        # semi-join on the NULLed priority
    "text_stats_docs",              # documents: lang/source-less third
    "dsir_source_weights",          # NULL source is a real key class
    "minhash_near_dups",            # doc text intact across parts
    "dim_date_calendar",            # orders dir through the dim build
    "uniqueness_custkey",           # customer dir through DQ uniqueness
]


@pytest.fixture(scope="module")
def drift_sf_dir():
    d = f"/tmp/spark_graft_sfdrift_{os.getpid()}"
    build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def drift_duck(drift_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        path = f"{drift_sf_dir}/{tab}.parquet"
        if os.path.isdir(path):
            src = f"read_parquet('{path}/*.parquet', union_by_name=true)"
        else:
            src = f"read_parquet('{path}')"
        con.execute(f"CREATE VIEW {tab} AS SELECT * FROM {src}")
    yield con
    con.close()


@pytest.mark.parametrize("name", DRIFT_REPS)
def test_drift_parity(spark, drift_sf_dir, drift_duck, name):
    sdf = QUERIES[name](spark, drift_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = drift_duck.sql(ORACLES[name])
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


def test_read_drifted_unions_by_name_with_null_fill(spark, tmp_path):
    """The seam in isolation: three parts (missing column / full /
    reversed order) read back as ONE by-name-aligned frame, missing
    column NULL-filled, no row lost, part order irrelevant."""
    from cryptocurrency_data_pipeline_spark.sources.tables import (
        read_drifted,
    )

    d = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, a double"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    spark.createDataFrame(
        [(3, 30.0, "x")], "id long, a double, b string"
    ).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(
        [("y", 40.0, 4)], "b string, a double, id long"
    ).coalesce(1).write.mode("append").parquet(d)

    got = read_drifted(spark, d)
    assert sorted(got.columns) == ["a", "b", "id"]
    rows = {r.id: (r.a, r.b) for r in got.collect()}
    assert rows == {
        1: (10.0, None),
        2: (20.0, None),
        3: (30.0, "x"),
        4: (40.0, "y"),
    }
