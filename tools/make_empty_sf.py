"""Build the ALL-EMPTY scale point: ``sfempty``.

Every table keeps its exact sf0.001 parquet schema but holds ZERO rows.
Running the full oracle registry against this directory probes the
degenerate-input seams the row-ful fixtures never reach:

* driver-side ``collect()[0][0]`` reads of 1-row aggregates (None
  propagation when the aggregate itself is NULL-on-empty),
* agg-on-empty semantics (``count`` -> 0 row vs ``sum``/``min``/``max``
  -> NULL vs grouped aggregates -> zero GROUPS),
* window/rank passes over empty frames,
* snapshot/MERGE/CDC fixtures seeded from an empty base table,
* division by zero-count denominators that only a zero-row input makes
  reachable.

A 100 TB pipeline hits this constantly — a partition predicate that
matches nothing, a new tenant with no data yet, the first run of a
day — and "empty in, empty (not crashed) out" is the contract both
engines must share.

``build(out_dir, n_rows=1)`` (CLI: second arg) builds the SINGLE-ROW
sibling ``sfone`` instead — one row per table: degenerate statistics
(zero ranges, one-arm experiments, absent split halves), which the
round-9 probe showed are a distinct divergence class from zero rows
(constant-dimension scalings ANSI-divide by a zero range, absent
cohorts must be NULL not smoothed, empty evolving upserts carry no new
column).

``build_dup(out_dir, k=3)`` (CLI: second arg ``dup``) builds the
DUPLICATE-SATURATION sibling ``sfdup`` — the round-10 fifth adversarial
scale point.  Every table is k EXACT full-row copies of sf0.001 (no
key is unique anywhere: multiset semantics, join fan-out x k^2,
dedup/rank over identical rows), and before copying:

* ``events`` puts ALL rows on a SINGLE key (``user_id = 7``) and floors
  ``ts`` to the hour — one giant window partition full of order-column
  ties (W1 keep-latest tie-break determinism, skew-salt correctness,
  sessionization under maximal skew);
* ``orders`` floors ``o_orderdate`` to the month — heavy ties on every
  date-ordered window/rank;
* ``documents`` collapses ``text`` onto 50 donor texts (``doc_id %
  50``), ``n_chars`` recomputed — identical-content groups of ~30 docs
  saturate MinHash/LSH banding, shingle joins, and exact dedup;
* ``embeddings`` collapses vectors onto 25 donors (``vec_id % 25``) —
  identical vectors force cosine-distance TIES in every top-k, so any
  ANN ordering without a deterministic id tie-break diverges.

At 100 TB this is the crawl-corpus reality (boilerplate pages, mirror
sites, re-posted embeddings); an engine whose dedup, rank, or top-k is
only deterministic on distinct inputs silently disagrees with itself
across runs there.

Usage: python tools/make_empty_sf.py [out_dir] [n_rows|dup]
       (defaults /tmp/spark_graft_sfempty 0)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build(out_dir: str, n_rows: int = 0) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for name in TABLES:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(src.slice(0, n_rows), f"{out_dir}/{name}.parquet")
    print(f"sf ({n_rows} rows/table) written to {out_dir}")


def _dup_transform(name: str, t):
    """Pre-copy treatment (see module docstring).  Deterministic, pure
    pyarrow — the fixture must be byte-reproducible across builds."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if name == "events":
        t = t.set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            pa.array([7] * t.num_rows, type=pa.int64()),
        )
        t = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            pc.floor_temporal(t["ts"], unit="hour"),
        )
    elif name == "orders":
        t = t.set_column(
            t.schema.get_field_index("o_orderdate"),
            "o_orderdate",
            pc.floor_temporal(t["o_orderdate"], unit="month"),
        )
    elif name == "documents":
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_pylist()
        by_id = dict(zip(ids, texts))
        # Collapse onto the doc whose id is (doc_id % 50); ids with no
        # such donor keep their own text (still duplicated x k later).
        new_text = [by_id.get(i % 50, texts[j]) for j, i in enumerate(ids)]
        t = t.set_column(
            t.schema.get_field_index("text"), "text", pa.array(new_text)
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array(
                [None if x is None else len(x) for x in new_text],
                type=pa.int64(),
            ),
        )
    elif name == "embeddings":
        vecs = t["embedding"].to_pylist()
        ids = t["vec_id"].to_pylist()
        by_id = dict(zip(ids, vecs))
        new_vecs = [by_id.get(i % 25, vecs[j]) for j, i in enumerate(ids)]
        t = t.set_column(
            t.schema.get_field_index("embedding"),
            "embedding",
            pa.array(new_vecs, type=t.schema.field("embedding").type),
        )
    return t


def build_dup(out_dir: str, k: int = 3) -> None:
    """Duplicate-saturation scale point: k exact full-row copies of
    every (pre-treated) table — see module docstring."""
    import pyarrow as pa

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for name in TABLES:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        src = _dup_transform(name, src)
        pq.write_table(
            pa.concat_tables([src] * k), f"{out_dir}/{name}.parquet"
        )
    print(f"sfdup (x{k} duplicate-saturated) written to {out_dir}")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "dup":
        build_dup(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfdup")
    else:
        build(
            sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfempty",
            int(sys.argv[2]) if len(sys.argv) > 2 else 0,
        )
