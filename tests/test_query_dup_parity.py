"""Oracle parity on DUPLICATE-SATURATED tables (``sfdup``,
tools/make_empty_sf.py build_dup).

Every table row appears ×3 verbatim, events all land on one hot key
with hour-floored timestamp ties, documents collapse onto 50 donor
texts and embeddings onto 25 donor vectors — the crawl-corpus
mirror/boilerplate/re-ingest reality where duplicated ids are the
NORM, not an edge.  The round-11 sweep of all 199 queries over this
scale point surfaced 11 divergences in 5 classes, all fixed:

* violated DISTINCT-set preconditions — ``jaccard_self_join`` /
  ``containment_join`` sized sets with ``count(*)`` while verifying
  against the set, driving ``union_sz`` NEGATIVE (jaccard −3.0); the
  operators now collapse ``(id, elem)`` themselves on the shuffle they
  already pay;
* per-id pipelines fanned out by duplicated ids — ``semantic_dedup``
  (+ incremental) now collapses to one deterministic min-vector row
  per id, mirrored by ``min(v) .. GROUP BY vec_id`` in the oracles;
* attribute-lookup joins multiplying a per-doc rollup back out
  (``exact_substring_doc_stats``, ``boilerplate_segment_stats``) —
  one deterministic ``min`` row per id on both sides;
* pooled-evidence operators whose oracles re-multiplied the pooled row
  through the raw table (``dsir_source_weights``,
  ``quality_classifier_scores``) — one output row per distinct key,
  duplicate rows POOL their tokens;
* multiset/row-level semantics the oracle had collapsed per id:
  ``kmeans_embedding_clusters`` (full multiset Lloyd via DISTINCT
  (id, vec) argmin rejoined on both columns),
  ``consistent_reshard_stability`` (per-row movement accounting),
  ``ann_recall_at_k`` (recall over DISTINCT pair sets),
  ``keyed_change_feed`` (collapse refuses to mis-pair duplicated keys
  — they keep raw insert/delete tags), ``media_ingest_report`` (one
  file per key — idempotent names).

This suite replays one representative per class on every pytest run;
the full-registry sweep is
``python tools/check_oracle.py /tmp/spark_graft_sfdup`` after
``python tools/make_empty_sf.py /tmp/spark_graft_sfdup dup``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_empty_sf import build_dup

#: One representative per duplicate-input divergence class, plus a
#: spread of dup-sensitive shapes that must stay correct: window dedup
#: under total ties, MinHash/winnow/exact dedup, CC clustering, salted
#: aggs on the one hot key, ANN top-k under identical-vector ties.
DUP_REPS = [
    "jaccard_shingle_pairs",         # DISTINCT-(id, elem) precondition
    "containment_shingle_pairs",     # same family, asymmetric form
    "semantic_dedup_keep",           # min-vector collapse per vec_id
    "semantic_dedup_incremental",    # both sides carry the contract
    "exact_substring_doc_stats",     # attribute-lookup join, not fan-out
    "boilerplate_segment_stats",     # same + deterministic min(source)
    "dsir_source_weights",           # pooled tokens, one row per key
    "quality_classifier_scores",     # pooled evidence, one row per id
    "kmeans_embedding_clusters",     # multiset Lloyd
    "consistent_reshard_stability",  # per-row movement accounting
    "ann_recall_at_k",               # DISTINCT pair-set recall
    "keyed_change_feed",             # no mis-paired update pre/post
    "media_ingest_report",           # idempotent file-per-key writes
    "ivf_ann_topk",                  # (vec_id, v) rejoin in the oracle
    # dup-sensitive shapes that were already correct and must stay so:
    "docs_exact_dedup",
    "minhash_near_dups",
    "flagship_daily_rollup",         # keep-latest under total ties
    "dup_clusters",                  # connected components over copies
    "salted_event_type_stats",       # every row on ONE key
    "cosine_topk",                   # top-k under identical-vector ties
]


@pytest.fixture(scope="module")
def dup_sf_dir():
    d = f"/tmp/spark_graft_sfdup_{os.getpid()}"
    build_dup(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def dup_duck(dup_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{dup_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", DUP_REPS)
def test_dup_parity(spark, dup_sf_dir, dup_duck, name):
    sdf = QUERIES[name](spark, dup_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = dup_duck.sql(ORACLES[name])
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


def test_jaccard_self_join_enforces_set_precondition(spark):
    """Duplicate (id, elem) rows — within one id or from a duplicated
    id — are collapsed by the operator itself: union_sz can never go
    negative and exact-duplicate ids pair at jaccard 1.0."""
    from cryptocurrency_data_pipeline_spark.operators.setjoin import (
        jaccard_self_join,
    )

    rows = [(i, e) for i in (1, 2) for e in ("a", "b", "c")] * 3
    tok = spark.createDataFrame(rows, "id int, elem string")
    got = {
        (r.id_a, r.id_b): (r.inter, r.union_sz, r.jaccard)
        for r in jaccard_self_join(tok, num=1, den=2).collect()
    }
    assert got == {(1, 2): (3, 3, 1.0)}


def test_semantic_dedup_one_row_per_duplicated_id(spark):
    """A ×3-duplicated corpus yields exactly one flag row per distinct
    id, identical to the single-copy run."""
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup,
    )

    base = [(i, [float(i % 4), 1.0]) for i in range(12)]
    single = spark.createDataFrame(base, "vec_id int, embedding array<double>")
    tripled = spark.createDataFrame(
        base * 3, "vec_id int, embedding array<double>"
    )
    one = sorted(tuple(r) for r in semantic_dedup(single, nlist=4).collect())
    three = sorted(tuple(r) for r in semantic_dedup(tripled, nlist=4).collect())
    assert one == three
    assert len(three) == 12
