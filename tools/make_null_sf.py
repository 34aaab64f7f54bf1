"""Build the NULL-SATURATION scale point: ``sfnull``.

Copies every sf0.001 table and appends rows whose ONLY adversity is
the null axis — the tenth adversarial input class, after sf0.01
(driver scale), sfedge (scattered NULLs/NaN/ties/orphans), sfempty,
sfone, sfdup, sftime, sfbig, sfuni, and sfnum.  sfedge plants a NULL
here and there; sfnull is the SATURATION complement: whole GROUPS
where every measure is NULL, whole populations of NULL grouping keys,
and — the class that motivated the point — NULL components INSIDE
embedding vectors and whole-NULL vectors, which no earlier fixture
carried at all.

Why each class is a REAL 100 TB input (a producer ships a release
that drops a field, a decode stage fails for one partition, a join
leg goes dark for a day — entire slices go null at once, not single
rows):

* **NULL embedding / NULL components**: a failed decode writes NULL,
  a malformed float writes a NULL element.  Raw NULL components
  DIVERGE hard: DuckDB's ``list_dot_product`` raises
  InvalidInputException outright while Spark's ``zip_with``/
  ``aggregate`` lambda arithmetic null-propagates silently.  The
  engine contract (``similarity.as_double``): any NULL component
  collapses the vector to NULL at the single operator entry point,
  after which it rides the existing zero-norm guard identically on
  both engines (NULL dot -> non-positive denom -> sim 0 / excluded).
  Oracles mirror via ``_fragments.vec_sql``; a registry lint pins
  that no unguarded embedding cast exists.  NULL-vector ids are kept
  UNIQUE here: a corrupt/clean duplicate pair under one id is
  id-collapse territory (min(vector) with a NULL competitor), governed
  by the dedup family's id-uniqueness contract, not this fixture.
* **All-NULL measure groups**: a whole day of NULL values, a user
  whose every event value is NULL, an order-priority class with only
  NULL totals.  sum/avg/stddev over the group -> NULL, count(col) ->
  0, count(*) -> n on BOTH engines; percentile/median over zero
  finite rows -> NULL.  Any engine-side coalesce(x, 0) that an oracle
  states as NULL (or vice versa) surfaces instantly.
* **NULL-key saturation**: many rows whose GROUPING key is NULL (null
  user_id, null event_type, null lang/source).  Both engines place
  all of them in ONE null group (SQL GROUP BY semantics); windows
  PARTITION BY a null key likewise form one partition — so ranks,
  lags, and session logic run over a genuinely large null partition
  instead of the single null row sfedge plants.
* **NULL in every column at once vs NULL in exactly one**: rows that
  keep keys but null every measure, and rows that null the keys but
  keep measures — the two halves of the routing/dedup/merge surface.

Determinism: NULLs are absorbing for sums and excluded from counts on
both engines, so no accumulation-order sensitivity exists anywhere in
this fixture; timestamps are fresh distinct micros inside the base
Jan-2024 range.

Usage: python tools/make_null_sf.py [out_dir]
(default /tmp/spark_graft_sfnull)
"""

from __future__ import annotations

import os
import shutil
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

EMB_DIM = 64


def _append(name: str, rows: list[tuple], out_dir: str) -> None:
    # Column-by-column pa.array (NOT via pandas): plain-list ingestion
    # keeps None -> null, including None ELEMENTS inside list columns.
    src = pq.read_table(f"{SRC}/{name}.parquet")
    cols = [
        pa.array([r[i] for r in rows], type=field.type)
        for i, field in enumerate(src.schema)
    ]
    extra = pa.Table.from_arrays(cols, schema=src.schema)
    pq.write_table(pa.concat_tables([src, extra]), f"{out_dir}/{name}.parquet")


def build(out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    ts = pd.Timestamp

    for verbatim in ("region", "nation"):
        _append(verbatim, [], out_dir)

    _append(
        "customer",
        [
            # one (nation, segment) class whose EVERY balance is NULL —
            # the privacy audits' sensitive attribute has exactly one
            # (NULL) band for this class:
            (170, "NullClass A", 11, None, "BUILDING"),
            (171, "NullClass B", 11, None, "BUILDING"),
            (172, "NullClass C", 11, None, "BUILDING"),
            # null-key saturation: NULL segment rows with live balances
            (173, "NoSeg One", 4, 100.5, None),
            (174, "NoSeg Two", 6, 200.25, None),
            (175, "NoSeg Three", 8, 300.75, None),
        ],
        out_dir,
    )
    _append(
        "supplier",
        [
            (14, "Null Nation Supp", None, 50.0),
            (15, "All Null Supp", None, None),
        ],
        out_dir,
    )
    _append(
        "part",
        [
            # NULL type AND NULL size together (sfedge nulls one at a time)
            (220, "null twins", "Brand#13", None, None, 25.0),
            (221, "null twins b", "Brand#13", None, None, 35.0),
        ],
        out_dir,
    )
    _append(
        "orders",
        [
            # a priority class whose EVERY total is NULL:
            (1700, 7, "O", None, ts("1997-06-01"), "6-NULLED"),
            (1701, 11, "F", None, ts("1997-06-02"), "6-NULLED"),
            (1702, 13, "O", None, ts("1997-06-03"), "6-NULLED"),
            # keys nulled, measure kept:
            (1703, None, None, 150.0, None, None),
        ],
        out_dir,
    )
    _append(
        "lineitem",
        [
            # every nullable measure NULL at once (keys live):
            (1700, 17, 3, 1, None, None, None, None, "N", "O", ts("1997-06-02")),
            (1700, 23, 4, 2, None, None, None, None, "A", "F", None),
            # measures live, date NULL (already an edge class — here it
            # co-occurs with the all-null order group):
            (1701, 31, 5, 1, 2.0, 80.0, 0.05, 0.01, "R", "F", None),
        ],
        out_dir,
    )
    # Null-KEY saturation: 8 NULL-user events across days/types (ranks,
    # lags, dedup and sessions must run over one large null partition),
    # a whole day (Jan 26) of NULL values, and one user (32) whose every
    # value is NULL.
    _append(
        "events",
        [
            (2100, ts("2024-01-26 09:00:00"), 30, "click", None, "{}"),
            (2101, ts("2024-01-26 10:00:00"), 30, "view", None, "{}"),
            (2102, ts("2024-01-26 11:00:00"), 31, "purchase", None, "{}"),
            (2103, ts("2024-01-26 12:00:00"), 31, "click", None, "{}"),
            (2104, ts("2024-01-26 13:00:00"), 32, "view", None, "{}"),
            (2105, ts("2024-01-27 09:00:00"), 32, "view", None, "{}"),
            (2106, ts("2024-01-27 10:00:00"), 32, "view", None, "{}"),
            (2110, ts("2024-01-27 11:00:00"), None, "click", 5.0, "{}"),
            (2111, ts("2024-01-27 11:05:00"), None, "click", 6.0, "{}"),
            (2112, ts("2024-01-27 11:20:00"), None, "view", 7.0, "{}"),
            (2113, ts("2024-01-27 12:00:00"), None, "purchase", 8.0, "{}"),
            (2114, ts("2024-01-28 09:00:00"), None, "view", 9.0, "{}"),
            (2115, ts("2024-01-28 09:03:00"), None, "click", 10.0, "{}"),
            (2116, ts("2024-01-28 10:00:00"), None, None, None, None),
            (2117, ts("2024-01-28 11:00:00"), None, None, None, None),
            # null type, live everything else:
            (2118, ts("2024-01-28 12:00:00"), 33, None, 11.5, "{}"),
            (2119, ts("2024-01-28 13:00:00"), 33, None, 12.5, "{}"),
        ],
        out_dir,
    )
    # Null-key saturation on documents: several NULL-lang and
    # NULL-source docs with live text (language rollups get a real null
    # group, not one stray row).
    _append(
        "documents",
        [
            (600, "null lang doc one common words", None, "src0", 30),
            (601, "null lang doc two common words", None, "src1", 30),
            (602, "null lang doc three common words", None, "src2", 32),
            (603, "null source doc alpha beta", "en", None, 26),
            (604, "null source doc gamma delta", "en", None, 27),
            (605, "both null here entirely", None, None, 23),
        ],
        out_dir,
    )
    half = [0.01 * ((i % 5) - 2) + 0.003 for i in range(EMB_DIM)]
    one_null = list(half)
    one_null[7] = None
    _append(
        "embeddings",
        [
            (700, None, 0),               # whole-NULL vector
            (701, one_null, 1),           # one NULL component
            (702, [None] * EMB_DIM, 2),   # every component NULL
            (703, half, None),            # live vector, NULL label
        ],
        out_dir,
    )

    # Build-time cross-engine assertion: DuckDB must place all NULL
    # user_ids in ONE group (the fixture's null-key saturation premise).
    import duckdb

    con = duckdb.connect()
    g = con.execute(
        f"SELECT count(*) FROM (SELECT user_id FROM "
        f"'{out_dir}/events.parquet' WHERE user_id IS NULL GROUP BY user_id)"
    ).fetchone()[0]
    assert g == 1, f"DuckDB NULL grouping drifted: {g} groups"
    print(f"sfnull written to {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfnull")
