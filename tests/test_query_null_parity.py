"""Oracle parity on NULL-SATURATED inputs (``sfnull``,
tools/make_null_sf.py).

The tenth adversarial scale point: whole groups of NULL measures,
saturated NULL grouping keys, and — the class that motivated the
point — NULL components inside embedding vectors and whole-NULL
vectors, which no earlier fixture carried.  The first r12 sweep of all
205 queries surfaced 10 failures in 5 root-cause classes, all fixed:

* **NULL components vs list arithmetic** — DuckDB's
  ``list_dot_product`` hard-errors on NULL components; Spark's lambda
  arithmetic null-propagates silently.  Contract:
  ``similarity.as_double`` collapses any vector with a NULL component
  to a NULL vector at the single operator entry point (rides the
  existing zero-norm guard identically on both engines); oracles
  mirror via ``_fragments.vec_sql`` (registry lint pins every site).
* **numpy assignment paths need rectangular input** — IVF probe
  assignment, kmeans training, and the PQ family now EXCLUDE corrupt
  (NULL-collapsed) vectors from seeds, training, encoding, and
  queries; oracles drop them through the guarded cast's equi-joins.
* **NULL-key as-of matching** — the window-based as-of join grouped
  NULL keys into one partition and cross-filled unrelated anonymous
  rows; SQL/DuckDB ASOF semantics say NULL keys never match.
  ``joins.asof_join`` now drops NULL-key right rows and masks NULL-key
  left rows to NULL as-of values.
* **NULL-key equi-join drops a real group** — the time-travel version
  diff lost the NULL-priority group ("all added"); the DSIR oracle
  zeroed NULL-source weights.  Both now join null-safely
  (``eqNullSafe`` / ``IS NOT DISTINCT FROM``).
* **NULL ordering defaults differ** — Spark sorts NULLS FIRST
  ascending, DuckDB NULLS LAST: the RFM ntile keys divergence; the
  oracle now states NULLS FIRST explicitly.  Plus version-by-keyset:
  ``to_json(struct)`` drops NULL fields, so an odd-key row with NULL
  priority presents the v1 key set — the schema-drift oracle now
  encodes that rule instead of raw key parity.

This suite replays representatives of every class each pytest run;
the full-registry sweep is ``python tools/check_oracle.py
/tmp/spark_graft_sfnull`` after ``python tools/make_null_sf.py
/tmp/spark_graft_sfnull``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_null_sf import build

NULL_REPS = [
    "asof_last_view",            # NULL keys never as-of match
    "asof_next_purchase",        # forward variant
    "ivf_ann_topk",              # corrupt vectors out of the index
    "ann_recall_at_k",           # recall over the guarded index
    "kmeans_embedding_clusters", # corrupt vectors out of training
    "pq_recall_at_10",           # PQ family exclusion
    "quantized_cosine_topk",     # int8 path exclusion
    "rfm_customer_segments",     # ntile NULL-key ordering contract
    "dsir_source_weights",       # null-safe weight join
    "schema_drift_report",       # version-by-keyset with NULL fields
    "table_time_travel_diff",    # null-safe version diff join
    # already-correct null-sensitive shapes that must stay so:
    "cosine_topk",               # NULL vector scores 0 via the guard
    "ann_srp_topk",              # SRP buckets over NULL projections
    "semantic_dedup_keep",       # corrupt vectors in semantic dedup
    "flagship_daily_rollup",     # keep-latest over null-key saturation
    "session_windows",           # sessions over a null-user population
]


@pytest.fixture(scope="module")
def null_sf_dir():
    d = f"/tmp/spark_graft_sfnull_{os.getpid()}"
    build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{null_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NULL_REPS)
def test_null_parity(spark, null_sf_dir, null_duck, name):
    sdf = QUERIES[name](spark, null_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = null_duck.sql(ORACLES[name])
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


def test_as_double_collapses_incomplete_vectors(spark):
    """The element-completeness contract, pinned engine-side: a NULL
    component or NULL vector collapses to NULL; complete vectors cast
    through untouched."""
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators.similarity import as_double

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, None]), (3, None)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.v
        for r in df.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        ).collect()
    }
    assert got[1] == [1.0, 2.0]
    assert got[2] is None
    assert got[3] is None


def test_asof_join_null_keys_never_match(spark):
    """SQL/DuckDB ASOF semantics: a NULL-key left row keeps NULL as-of
    values even when NULL-key right rows exist at earlier timestamps,
    and NULL-key right rows never fill anyone."""
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(None, "2024-01-01 10:00:00"), (7, "2024-01-01 10:00:00")],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(None, "2024-01-01 09:00:00", 1.0), (7, "2024-01-01 09:00:00", 2.0)],
        "user_id long, ts string, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {
        (r.user_id,): r.asof_value
        for r in asof_join(left, right, "user_id").collect()
    }
    assert out[(7,)] == 2.0
    assert out[(None,)] is None
