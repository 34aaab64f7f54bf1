"""Oracle parity on FLOAT/NUMERIC-EXTREME inputs (``sfnum``,
tools/make_num_sf.py).

The ninth adversarial scale point: both infinity signs in every
measure family, NaN, negative zero, double denormals (5e-324) and the
min-normal (2.2e-308), float32 overflow/underflow magnitudes and
non-finite COMPONENTS inside embedding vectors, and int64-extreme ids
(snowflake scale) — the routine residue of ingesting floats and ids
you didn't produce.  The first r12 sweep of all 204 queries over this
fixture surfaced 11 failures in 5 root-cause classes (plus one
fixture-design lesson), all fixed:

* **session-gap boundary** — Spark's ``session_window`` MERGES an
  event landing exactly ``gap`` after its predecessor; the
  gaps-and-islands oracle split on ``>= INTERVAL 5 MINUTE``.  Latent
  on every earlier fixture (none planted an exact-gap pair); the
  oracle boundary is now strict ``>``.
* **int64 range arithmetic** — ``umax - umin`` over ids spanning
  [I64_MIN, I64_MAX] overflows BIGINT (ANSI Spark aborts, DuckDB
  raises); z-order scaling now subtracts as DOUBLE on both engines.
* **int64 id sums** — one ~9.2e18 orderkey overflows ``sum(BIGINT)``
  (DuckDB silently widens to HUGEINT, ANSI Spark aborts); id sums are
  now DECIMAL(38,0) on both engines.
* **non-finite bucket casts** — ``CAST(floor(inf/1000) AS BIGINT)``:
  DuckDB refuses, Spark's floor saturates silently.  The privacy
  audits' balance band now maps non-finite to the NULL band on both
  engines (isfinite CASE / ``quantize.finite`` gate).
* **corrupt embedding components** — one NaN/±Inf component poisons
  the int8 scale and every quantized code (DuckDB refuses the code
  cast).  ``quantized_cosine_topk`` now EXCLUDES non-all-finite
  vectors on both sides (``similarity.vec_finite``); the exact-cosine
  path still scores them (NaN orders deterministically).
* **fixture lesson (not an engine bug)** — a finite 1e15 measure makes
  every sum it reaches order-unstable at round(,4) (ULP 0.125); the
  sfedge ≥1e16 display guard was too loose.  sfnum caps finite
  magnitudes at 2^20 and takes overflow coverage from ±inf.

This suite replays representatives of every class on each pytest run;
the full-registry sweep is ``python tools/check_oracle.py
/tmp/spark_graft_sfnum`` after ``python tools/make_num_sf.py
/tmp/spark_graft_sfnum``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_num_sf import build

#: One representative per divergence class found by the first sfnum
#: sweep, plus numeric-sensitive shapes that were already correct and
#: must stay so (NaN top-k ordering, inf sum propagation, cents
#: degradation, finite-gated moments, zero/-0.0-norm vectors).
NUM_REPS = [
    "session_windows",          # inclusive exact-gap session merge
    "zorder_events_locality",   # id range subtraction in double
    "cdc_apply_reconstruction", # decimal(38,0) id sums
    "l_diversity_audit",        # NULL band for non-finite sensitive
    "t_closeness_audit",        # same band contract, TV arithmetic
    "quantized_cosine_topk",    # corrupt-vector exclusion
    # already-correct numeric-sensitive shapes:
    "cosine_topk",              # NaN sims order deterministically
    "hard_negative_mining",     # NaN sims in contrastive ranking
    "pricing_summary",          # ±inf propagates through sums
    "cube_event_stats",         # NaN global totals (both inf signs meet)
    "tumbling_hourly_stats",    # cents guard degrades non-finite
    "dq_profile_lineitem",      # finite-gated mean/stddev
    "semantic_dedup_keep",      # -0.0 / zero-norm normalization
    "ann_srp_topk",             # SRP buckets over corrupt components
    "user_value_trend",         # integer OLS over quantized extremes
    "event_gap_histogram",      # gap buckets under extreme ids
]


@pytest.fixture(scope="module")
def num_sf_dir():
    d = f"/tmp/spark_graft_sfnum_{os.getpid()}"
    build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def num_duck(num_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{num_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", NUM_REPS)
def test_num_parity(spark, num_sf_dir, num_duck, name):
    sdf = QUERIES[name](spark, num_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = num_duck.sql(ORACLES[name])
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


def test_session_window_merges_exact_gap(spark):
    """Pin the OBSERVED Spark semantics the oracle now mirrors: two
    events exactly gap apart form ONE session (the session end
    start+gap is mergeable, not past-the-end).  If a Spark upgrade
    flips this, fail here loudly instead of in a sweep."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:05:00"),
         (1, "2024-01-01 10:10:00.000001")],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    out = df.groupBy(F.session_window("ts", "5 minutes"), "user_id").count()
    rows = out.collect()
    # 10:00 and 10:05 merge; 10:10:00.000001 is strictly past the end.
    assert sorted(r["count"] for r in rows) == [1, 2]


def test_vec_finite_contract(spark):
    """vec_finite excludes exactly the non-all-finite vectors: a single
    NaN or ±Inf component disqualifies; float32 extremes (3e38, 1e-45)
    and -0.0 are finite and stay."""
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators.similarity import (
        as_double,
        vec_finite,
    )

    rows = [
        (1, [float("nan"), 1.0], False),
        (2, [1.0, float("inf")], False),
        (3, [float("-inf"), 1.0], False),
        (4, [3e38, 3e38], True),
        (5, [1e-45, 1e-45], True),
        (6, [-0.0, 0.0], True),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: r.ok
        for r in df.select(
            "vec_id", vec_finite(as_double(F.col("embedding"))).alias("ok")
        ).collect()
    }
    assert got == {i: keep for i, _, keep in rows}
