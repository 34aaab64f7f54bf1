"""Oracle parity on GIANT-ROW / HOT-KEY tables (``sfbig``,
tools/make_big_sf.py).

The seventh adversarial input class: ~150 KB documents (high-entropy, a
giant near-duplicate pair, one 60,000-char single token, saturated
boilerplate), 21,000 events on three hot users, and 2,000 extra lines on
one order — individual-row size and key saturation pathologies that are
ROUTINE at crawl scale, with every value contract-respecting.

The round-11 sweep of all 203 queries over this scale point surfaced two
divergence/scale classes, both fixed:

* **ulp-fragile percentile boundaries** — `winsorized_event_stats`
  compared values STRICTLY against builtin percentiles
  (`F.percentile` vs DuckDB `quantile_cont`), whose internal
  interpolation differs in the last ulp; with thousands of grid-tied
  values at the boundary the clamp count drifted (106 vs 109).  The
  bounds now come from order statistics with ONE interpolation
  expression mirrored verbatim on both sides — IEEE ops are
  deterministic, so identical expression trees are bit-identical.
* **wide-parent explode quadratics** — `posexplode(sequence(1,
  length)) … substring(_t, p, …)` copies the FULL parent text onto
  every exploded row (O(n²) bytes): ~200 s per gram/char query on the
  150 KB docs.  `duplicated_gram_positions` now builds hashes in-row,
  size-dispatched between a substring form (small docs, codegen-fast)
  and a once-split codepoint-array form (giant docs, O(n·k), ×30);
  `doc_char_entropy` and the BPE pair count explode a once-built char
  array (`text.char_array`, whose `(?s)(?<=.)` split is
  codepoint-exact — the DOTALL flag matters: without it newlines fuse
  with their neighbors, caught by the sfedge newline doc).

This suite replays representatives at scale=1/3 (same shape, DuckDB
all-pairs/substring oracles stay in suite budget) on every pytest run;
the full-size sweep is ``python tools/make_big_sf.py /tmp/spark_graft_sfbig``
then ``python tools/check_oracle.py /tmp/spark_graft_sfbig``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_big_sf import build as build_big

#: One representative per sfbig divergence class, plus the giant-set /
#: hot-key shapes that must stay correct at saturation.
BIG_REPS = [
    "winsorized_event_stats",      # ulp-fragile percentile boundary
    "doc_char_entropy",            # wide-parent explode -> char_array
    "exact_substring_spans",       # hybrid gram build, giant dup pair
    "exact_substring_doc_stats",   # same operator, per-doc rollup
    "bpe_pair_merge_candidates",   # degenerate 20K-char single token
    "jaccard_shingle_pairs",       # PPJoin at maximal set size
    "minhash_near_dups",           # banding on the giant near-dup pair
    "winnow_near_dups",            # winnowing at maximal fingerprints
    "user_sessionization_stats",   # sessions thousands of events long
    "grouped_ewma_user_value",     # grouped-map histories in thousands
    "salted_event_type_stats",     # hot-key salted aggregation
    "pricing_summary",             # hot-order lineitem aggregation
]


@pytest.fixture(scope="module")
def big_sf_dir():
    d = f"/tmp/spark_graft_sfbig_{os.getpid()}"
    build_big(d, scale=1 / 3)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def big_duck(big_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{big_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", BIG_REPS)
def test_big_parity(spark, big_sf_dir, big_duck, name):
    sdf = QUERIES[name](spark, big_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = big_duck.sql(ORACLES[name])
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


def test_char_array_matches_substring_semantics(spark):
    """The codepoint-split contract behind the linearized text pipelines:
    element-for-element equal to the per-position substring loop on
    ASCII, CJK, astral (surrogate-pair), combining-mark, newline/CRLF,
    and empty inputs."""
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators.text import char_array

    cases = [
        "a\U0001f30db", "你好", "x", "héllo \U0001f30d", "é",
        "   \t  \n ", "\n\nhello\nworld or not\n", "a\r\nb", "", "\x0b\f",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id int, t string"
    )
    rows = df.select(
        "id",
        char_array("t").alias("chars"),
        F.expr(
            "transform(sequence(1, length(t)), p -> substring(t, p, 1))"
        ).alias("sub"),
    ).collect()
    for r in rows:
        want = r.sub if cases[r.id] else []
        assert r.chars == want, (r.id, cases[r.id], r.chars, want)
