"""Build the SCHEMA-DRIFT scale point: ``sfdrift``.

The twelfth adversarial input class (after sf0.01, sfedge, sfempty,
sfone, sfdup, sftime, sfbig, sfuni, sfnum, sfnull, sfmix): tables that
are DIRECTORIES of parquet part files written over time with evolving
schemas — columns added by later writers (older parts lack them),
columns reordered between writers, part boundaries falling anywhere in
the data.  At 100 TB this is the normal state of a bronze layer: no
production corpus was written by one writer with one schema, and an
engine that silently projects every part onto the first file's schema
(Spark's ``mergeSchema=false`` default) DROPS later writers' columns
with no error.

Both engines must union part schemas BY NAME — the engine through
``sources/tables.py:read_drifted`` (mergeSchema), the oracle through
``read_parquet(dir/*.parquet, union_by_name=true)`` — and rows from
pre-drift parts must surface the added columns as NULL, identically.

Shape (all from sf0.001, byte-deterministic, row order preserved):

* ``events`` → 3 parts: rows [0,1/3) WITHOUT ``props`` (an
  added-later column), rows [1/3,2/3) full schema, rows [2/3,n)
  full schema with columns REVERSED;
* ``documents`` → 3 parts: first third without ``lang``/``source``
  (early crawl writer), middle full, last reversed;
* ``orders`` → 2 parts: first half without ``o_orderpriority``,
  second half reversed;
* ``customer`` → 2 parts: first half without ``c_mktsegment``,
  second half full;
* ``lineitem`` → 2 parts, pure column reorder (no dropped columns —
  null saturation of the hot fact table is sfnull's axis; here the
  seam is by-name alignment on every scan);
* everything else copied verbatim as single files.

Usage: python tools/make_drift_sf.py [out_dir]
       (default /tmp/spark_graft_sfdrift)
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

#: table -> list of (drop_columns, reverse_order) per part; rows are
#: split into len(parts) contiguous, order-preserving slices.
DRIFT = {
    "events": [(["props"], False), ([], False), ([], True)],
    "documents": [(["lang", "source"], False), ([], False), ([], True)],
    "orders": [(["o_orderpriority"], False), ([], True)],
    "customer": [(["c_mktsegment"], False), ([], False)],
    "lineitem": [([], False), ([], True)],
}


def build(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        src_path = f"{SRC}/{name}.parquet"
        if name not in DRIFT:
            shutil.copyfile(src_path, f"{out_dir}/{name}.parquet")
            continue
        tbl = pq.read_table(src_path)
        parts = DRIFT[name]
        table_dir = f"{out_dir}/{name}.parquet"
        shutil.rmtree(table_dir, ignore_errors=True)
        os.makedirs(table_dir)
        n = tbl.num_rows
        k = len(parts)
        bounds = [round(i * n / k) for i in range(k + 1)]
        for i, (drop, reverse) in enumerate(parts):
            part = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
            cols = [c for c in part.column_names if c not in drop]
            if reverse:
                cols = list(reversed(cols))
            part = part.select(cols)
            pq.write_table(part, f"{table_dir}/part-{i:03d}.parquet")
        print(
            f"{name}: {n} rows -> {k} drifted parts "
            f"({', '.join('-' + c for p in parts for c in p[0]) or 'reorder only'})"
        )
    print(f"sfdrift ready at {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfdrift")
