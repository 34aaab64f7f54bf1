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

Usage: python tools/make_empty_sf.py [out_dir] [n_rows]
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


if __name__ == "__main__":
    build(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfempty",
        int(sys.argv[2]) if len(sys.argv) > 2 else 0,
    )
