"""Oracle parity on CROSS-CLASS COMPOSED inputs (``sfmix``,
tools/make_mix_sf.py).

The eleventh adversarial scale point: rows where several verified
adversity axes CO-OCCUR — window-order ties whose tiebreak measures
are NaN, year-9999 sessions for a NULL user, duplicated vectors whose
shared payload is corrupt, case-fold traps inside duplicated NULL-lang
documents, a lineitem carrying NaN qty + inf price + NULL discount +
-0.0 tax + a year-9999 shipdate at once.  The ten per-axis points
prove each axis alone; this point proves the fixes COMPOSE.

The first full-registry sweep surfaced exactly ONE divergence:

* **no-op updates in the change feed** (`keyed_change_feed`) — a
  swept 1-URGENT key whose price is NULL rewrites to identical
  content (NULL + 7 = NULL), which a STATE-DIFF change feed cannot
  see by construction; the oracle counted every swept key.  The
  oracle now excludes no-op pairs, mirroring the version-diff
  contract.

Everything else held — the composition evidence the per-axis gates
cannot give.  Full sweep: ``python tools/check_oracle.py
/tmp/spark_graft_sfmix`` after ``python tools/make_mix_sf.py
/tmp/spark_graft_sfmix``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_mix_sf import build

MIX_REPS = [
    "keyed_change_feed",         # the one sfmix divergence (no-op updates)
    "cdc_apply_reconstruction",  # same merge family, reconstruction side
    # composed shapes that must stay green:
    "flagship_daily_rollup",     # keep-latest ties x NaN measures
    "session_windows",           # exact-gap boundary x denormals; 9999 x null key
    "cube_event_stats",          # (+inf) + (-inf) day totals -> NaN (det)
    "quantized_cosine_topk",     # duplicated corrupt vectors both excluded
    "cosine_topk",               # NaN-sim ties break by id deterministically
    "semantic_dedup_keep",       # dup pairs with corrupt shared payload
    "docs_exact_dedup",          # fold-trap text x tripled dup x NULL lang
    "minhash_near_dups",         # shingles over composed unicode dups
    "asof_last_view",            # null keys x extreme timestamps
    "pricing_summary",           # the everything-at-once lineitem
]


@pytest.fixture(scope="module")
def mix_sf_dir():
    d = f"/tmp/spark_graft_sfmix_{os.getpid()}"
    build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def mix_duck(mix_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{mix_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", MIX_REPS)
def test_mix_parity(spark, mix_sf_dir, mix_duck, name):
    sdf = QUERIES[name](spark, mix_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = mix_duck.sql(ORACLES[name])
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
