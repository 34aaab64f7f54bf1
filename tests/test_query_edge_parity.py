"""Oracle parity on ADVERSARIAL fixture data.

The driver's testdata exercises the common-case distribution; these
tests replay the driver's exact Spark-vs-DuckDB comparison on the
``sfedge`` dataset (tools/make_edge_sf.py): every sf0.001 table plus
hand-built edge rows — NULLs in each nullable column, empty/multibyte/
oversized/whitespace-led text, exact value ties at top-k boundaries,
orphan foreign keys, zero vectors, duplicate documents.

The round-8 sweep of all 196 queries over this dataset surfaced ~60
latent divergences (ANSI divide-by-zero and cast-overflow job-killers,
NULL groups silently dropped by inner joins, phantom ''-token features,
opposite NULL sort ends, str(None) leaking into byte containers,
null-unsafe edit predicates).  Fixture v4 (round 9) added NaN and ±Inf
MEASURE rows — written via raw pyarrow, since pandas would silently
turn NaN into NULL — which surfaced 13 more: the floor-cents ANSI
abort class (now ``quantize.cents``/``cents_sql`` guards), NaN-poisoned
percentile/stddev/EWMA/histogram statistics (now computed over finite
values only on both sides, ``quantize.finite``/``finite_sql``).  This
suite replays one representative per bug class on every pytest run; the
full-registry edge sweep is
``python tools/check_oracle.py /tmp/spark_graft_sfedge`` after
``python tools/make_edge_sf.py``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_edge_sf import build

#: One representative per divergence class found by the round-8 sweep.
EDGE_REPS = [
    "doc_char_entropy",          # sequence(1,0) descending-array trap
    "jpeg_meta_rollup",          # 2-byte length-field overflow + NULL container
    "text_stats_docs",           # blank-doc ratio/score guards
    "vocab_top_terms",           # phantom '' token in the vocabulary
    "bpe_apply_token_stats",     # ANSI divide-by-zero on a blank group
    "window_user_deltas",        # NULL sort key: ASC NULLS FIRST vs LAST
    "tumbling_hourly_stats",     # F.window() drops NULL event times
    "sax_motif_groups",          # NULL-ts point shifting a value series
    "hll_weekly_users",          # NULL group lost by an inner join
    "mergeable_sketch_rollup",   # NULL day lost between partial predicates
    "histogram_quantile_rollup", # clamp-before-cast overflow
    "props_json_extraction_stats",  # malformed JSON must be NULL, not error
    "merge_into_orders",         # null-safe MERGE edit predicates
    "partition_change_feed",     # null-safe version filters (Spark side!)
    "cow_snapshot_upsert",       # IS DISTINCT FROM partition predicate
    "warc_record_rollup",        # str(None) leaked into container bytes
    "wav_decode_rollup",         # NULL payload inputs -> (NULL,...) group
    "semantic_dedup_keep",       # zero-norm embedding normalization guard
    "label_centroids",           # int64 overflow in centroid quantization
    "doc_nearest_ngram",         # undefined 0/0 Jaccard of empty shingle sets
    "dataset_version_diff",      # presence by key, not fingerprint nullness
    "scd2_customer_priority_history",  # null-safe change test, rn first-row
    "dp_noisy_segment_counts",   # per-field framed noise key incl. NULL group
    "simhash_signatures",        # NULL text -> NULL sig; zero tokens -> 0
    "dsir_source_weights",       # explode_outer keeps zero-token docs
    "minhash_near_dups",         # shared sig-fragment token mirror
    "quality_classifier_scores", # every-doc contract via LEFT JOIN
    "unimax_language_budgets",   # try_divide epochs on zero-token language
    "monthly_revenue_growth",    # NULL month out of the MoM lag chain
    "docs_consecutive_ids",      # NULLS FIRST rank order
    # round-9 sweep (fixture v4: NaN/±Inf measure rows) — one per class:
    "rfm_customer_segments",     # cents guard: NaN/Inf/overflow -> NULL, no ANSI abort
    "order_price_percentiles",   # percentiles over finite measures only
    "dq_profile_lineitem",       # profile moments finite-only; Min/Max raw
    "salted_event_type_stats",   # count(*) vs count(cents-NULL) undercount
    "grouped_ewma_user_value",   # EWMA fold over finite observed points
    "events_value_histogram",    # NaN would poison both histogram bounds
]


@pytest.fixture(scope="module")
def edge_sf_dir():
    d = f"/tmp/spark_graft_sfedge_{os.getpid()}"
    build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{edge_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_REPS)
def test_edge_parity(spark, edge_sf_dir, edge_duck, name):
    sdf = QUERIES[name](spark, edge_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = edge_duck.sql(ORACLES[name])
    dcols, drows = rel.columns, rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    # key=str: rows can mix None with ints, which plain sorted() rejects.
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


def test_entropy_skips_empty_and_null_docs(spark, edge_sf_dir):
    out = {r["doc_id"]: r for r in QUERIES["doc_char_entropy"](spark, edge_sf_dir).collect()}
    assert 500 not in out and 501 not in out  # empty + NULL text excluded
    assert out[502]["n_chars"] == 70_000 and out[502]["char_entropy"] == 0.0


def test_jpeg_meta_survives_oversized_com_payload(spark, edge_sf_dir):
    rows = QUERIES["jpeg_meta_rollup"](spark, edge_sf_dir).collect()
    # doc 502: width = 100 + 70000 % 200 = 100, height = 50 + 502 % 100
    # = 52 — the truncated COM payload must not desync the SOF0 parse.
    assert any(r["width"] == 100 and r["height"] == 52 for r in rows)


#: Cents-only display queries: hash-stable even with finite magnitudes
#: past the cents-overflow bound (raw-double displays are NOT — Spark's
#: BigDecimal round() is the identity at 1e17 while DuckDB's loses ULPs,
#: and double sum order differences exceed any rounding tolerance — so
#: the overflow rows live in THIS dedicated fixture, not sfedge).
OVERFLOW_REPS = [
    "exact_rank_quantiles_by_type",  # NULL cents must never reach ORDER BY
    "value_concentration_gini",      # NULL per-user cents sum excluded
    "rfm_customer_segments",         # NULL monetary sum excluded from ntile
    "salted_event_type_stats",       # count(*) vs NULL-cents count
    "tumbling_hourly_stats",         # scale-10000 overflow -> NULL both
]


@pytest.fixture(scope="module")
def overflow_sf_dir(edge_sf_dir):
    """sfedge + finite cents-overflow measures (1e17 event value and
    order price): quantizes to NULL on both engines, and a NULL rank
    key lands on OPPOSITE ends per engine if it ever reaches a sort."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = f"/tmp/spark_graft_sfovf_{os.getpid()}"
    shutil.rmtree(d, ignore_errors=True)
    shutil.copytree(edge_sf_dir, d)

    def append(name, rows):
        src = pq.read_table(f"{d}/{name}.parquet")
        cols = [
            pa.array([r[i] for r in rows], type=f.type)
            for i, f in enumerate(src.schema)
        ]
        pq.write_table(
            pa.concat_tables([src, pa.Table.from_arrays(cols, schema=src.schema)]),
            f"{d}/{name}.parquet",
        )

    ts = pd.Timestamp
    append("events", [(1011, ts("2024-01-19 15:00:00"), 12, "view", 1e17, "{}")])
    append("orders", [(1515, 12, "O", 1e17, ts("1997-11-11"), "2-HIGH")])
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("name", OVERFLOW_REPS)
def test_cents_overflow_rank_parity(spark, overflow_sf_dir, name):
    con = duckdb.connect()
    try:
        for tab in TABLES:
            con.execute(
                f"CREATE VIEW {tab} AS SELECT * FROM "
                f"read_parquet('{overflow_sf_dir}/{tab}.parquet')"
            )
        sdf = QUERIES[name](spark, overflow_sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        rel = con.sql(ORACLES[name])
        drows = rel.fetchall()
        assert len(srows) == len(drows), (
            f"{name}: spark={len(srows)} duck={len(drows)}"
        )
        assert table_hash(sdf.columns, srows) == table_hash(rel.columns, drows), (
            f"{name}: value-hash mismatch\n"
            f"spark: {sorted(srows, key=str)[:8]}\nduck:  {sorted(drows, key=str)[:8]}"
        )
    finally:
        con.close()
