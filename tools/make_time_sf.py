"""Build the CALENDAR/TIMESTAMP-EXTREMES scale point: ``sftime``.

Copies every sf0.001 table and appends rows whose ONLY adversity is the
time axis — the sixth adversarial input class, after sf0.01 (driver
scale), sfedge (NULL/NaN/ties/orphans), sfempty, sfone, and sfdup
(duplicate saturation).  Every other column stays contract-respecting
(unique keys, valid FKs, finite measures), so any divergence the sweep
finds is attributable to time semantics alone.

What the rows probe, and why each is a REAL 100 TB input class (crawl
and log corpora carry corrupted, ancient, and sentinel timestamps —
epoch-0 defaults, 9999-12-31 "never expires" sentinels, pre-1970
mis-parsed dates):

* **Sub-second NEGATIVE-epoch timestamps** (1969-12-31 23:59:59.5):
  the truncate-vs-floor seam.  Spark's ``unix_timestamp`` truncates
  toward zero (-0.5 s -> 0) while SQL ``floor(epoch(ts))`` floors
  (-> -1), so every epoch-seconds bucketing (sessionization gaps,
  weekly cohorts) silently shifts pre-1970 rows one bucket late unless
  the engine floors explicitly.  Found by this fixture; fixed by
  ``timeseries.epoch_sec`` (exact integer-micros flooring) and
  mirrored in the oracles.
* **Year-boundary extremes** (0001-01-01, 9999-12-31 23:59:59.999999):
  the int64-micros range ends.  Double-based epoch math loses
  microseconds here — DuckDB's ``floor(epoch(ts))`` rounds the 9999
  sub-second row UP a whole second (2.5e17 us exceeds double's 2^53
  integer range), which is why BOTH sides of the epoch-seconds
  contract compute in exact integer micros.
* **Proleptic-Gregorian gap dates** (1582-10-10): Spark 3+/4 and
  DuckDB both use the proleptic calendar, so the "nonexistent"
  historical cutover dates are ordinary — this row pins that neither
  engine applies Julian rebasing to arrow-written parquet.
* **ISO-week boundaries** (2021-01-01 = week 53 of 2020; 2024-12-30 =
  week 1 of 2025): ``weekofyear`` cross-engine agreement where the ISO
  year differs from the calendar year.
* **Leap day** (2000-02-29 — the 400-year exception), **epoch zero**
  (1970-01-01 00:00:00 exactly), and a **session straddling the epoch
  sign flip** (23:50 -> 00:10, one 20-min-gap session across negative
  and positive seconds).
* **Identical sub-second timestamps** on one user (two events at
  ...00.000001): window-order tie at microsecond resolution — dedup
  and sessionization tiebreaks must stay id-deterministic.

Usage: python tools/make_time_sf.py [out_dir]  (default /tmp/spark_graft_sftime)
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _append(name: str, rows: list[tuple], out_dir: str) -> None:
    # Column-by-column pa.array from plain lists (NOT pandas): pandas
    # Timestamps are ns-backed and cannot hold year 1 or year 9999;
    # datetime.datetime -> timestamp[us] covers the full parquet range.
    src = pq.read_table(f"{SRC}/{name}.parquet")
    if not rows:
        pq.write_table(src, f"{out_dir}/{name}.parquet")
        return
    cols = [
        pa.array([r[i] for r in rows], type=field.type)
        for i, field in enumerate(src.schema)
    ]
    extra = pa.Table.from_arrays(cols, schema=src.schema)
    pq.write_table(pa.concat_tables([src, extra]), f"{out_dir}/{name}.parquet")


def build(out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    d = dt.datetime

    for name in ["region", "nation", "customer", "supplier", "part",
                 "documents", "embeddings"]:
        _append(name, [], out_dir)  # no time columns — verbatim copy

    _append(
        "orders",
        [
            # (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            #  o_orderdate, o_orderpriority) — keys 1700+ are unique
            # above sf0.001's 0..1499; custkeys all exist.
            (1700, 7, "O", 100.0, d(1, 1, 1), "3-MEDIUM"),          # year one
            (1701, 11, "F", 200.0, d(9999, 12, 31), "1-URGENT"),    # year max
            (1702, 13, "O", 300.0, d(1582, 10, 10), "5-LOW"),       # cutover gap
            (1703, 3, "F", 400.0, d(1969, 12, 31), "2-HIGH"),       # negative epoch
            (1704, 5, "O", 500.0, d(2000, 2, 29), "4-NOT SPECIFIED"),  # leap day
            (1705, 9, "F", 600.0, d(2021, 1, 1), "3-MEDIUM"),       # ISO week 53
            (1706, 2, "O", 700.0, d(2024, 12, 30), "1-URGENT"),     # ISO week 1
        ],
        out_dir,
    )
    _append(
        "lineitem",
        [
            # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            #  l_extendedprice, l_discount, l_tax, l_returnflag,
            #  l_linestatus, l_shipdate)
            (1700, 17, 3, 1, 2.0, 100.0, 0.05, 0.01, "N", "O", d(1, 1, 2)),
            (1701, 23, 4, 1, 3.0, 200.0, 0.0, 0.0, "A", "F", d(9999, 12, 30)),
            (1702, 31, 5, 1, 1.0, 50.0, 0.1, 0.02, "R", "F", d(1582, 10, 20)),
            (1703, 42, 6, 1, 4.0, 75.0, 0.0, 0.01, "N", "O", d(1970, 1, 1)),
            (1704, 55, 7, 1, 5.0, 125.0, 0.02, 0.0, "N", "O", d(2000, 2, 29)),
        ],
        out_dir,
    )
    _append(
        "events",
        [
            # (event_id, ts, user_id, event_type, value, props) —
            # ids 1100+ unique above sf0.001's 0..999; users 3..9 exist.
            # Sub-second negative epoch: the truncate-vs-floor trigger.
            (1100, d(1969, 12, 31, 23, 59, 59, 500000), 3, "click", 1.0, "{}"),
            (1101, d(1969, 12, 31, 23, 59, 58, 123456), 3, "view", 2.0, "{}"),
            # Sub-second positive epoch (control: truncate == floor).
            (1102, d(1970, 1, 1, 0, 0, 0, 500000), 3, "purchase", 3.0, "{}"),
            (1103, d(1970, 1, 1), 4, "click", 1.5, "{}"),            # epoch zero
            # One session straddling the epoch sign flip (20-min gap).
            (1104, d(1969, 12, 31, 23, 50, 0), 5, "view", 1.0, "{}"),
            (1105, d(1970, 1, 1, 0, 10, 0), 5, "view", 1.0, "{}"),
            (1106, d(1, 1, 1, 0, 0, 1), 6, "signup", 1.0, "{}"),     # year one
            (1107, d(9999, 12, 31, 23, 59, 59, 999999), 6, "click", 2.0, "{}"),
            (1108, d(2021, 1, 1, 12, 0, 0), 7, "view", 1.0, "{}"),   # ISO wk 53
            (1109, d(2024, 12, 30, 12, 0, 0), 7, "click", 1.0, "{}"),  # ISO wk 1
            # Identical microsecond timestamps: window-order tie.
            (1110, d(2024, 3, 1, 0, 0, 0, 1), 8, "click", 1.0, "{}"),
            (1111, d(2024, 3, 1, 0, 0, 0, 1), 8, "view", 2.0, "{}"),
            (1112, d(2000, 2, 29, 12, 0, 0), 9, "purchase", 5.0, "{}"),
        ],
        out_dir,
    )
    print(f"sftime written to {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sftime")
