"""Build the ADVERSARIAL scale point: ``sfedge``.

Copies every sf0.001 table and appends hand-built edge rows — NULLs in
every nullable column, empty and multi-byte strings, oversized payloads,
exact value TIES at top-k boundaries, orphan foreign keys, zero vectors,
duplicate documents — the input classes the driver's generator never
emits.  Running the full oracle registry against this directory
(``python tools/check_oracle.py <out_dir>``) checks that the Spark and
DuckDB sides diverge on NONE of them: both engines' builtin-function
edge semantics (sequence vs generate_series, null ordering, division by
zero, …) are exercised on every query at once.

Contract-respecting by design: primary keys stay unique (MERGE contract),
order keys stay >= 0 (the -(k+1) synthetic-insert rule), embeddings stay
64-dim (ANN operators assume fixed dim).  Orphan FOREIGN keys are fair
game (joins must drop or null them identically on both sides).

Usage: python tools/make_edge_sf.py [out_dir]   (default /tmp/spark_graft_sfedge)
"""

from __future__ import annotations

import os
import shutil
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

# Value ties are planted at the CURRENT column maxima so they land on
# top-k boundaries (a missing tiebreak then flips the driver hash).
MAX_TOTALPRICE = 499705.05
MAX_ACCTBAL = 9916.12
MAX_RETAIL = 919.9

EMB_DIM = 64


def _append(name: str, rows: list[tuple], out_dir: str) -> None:
    # Column-by-column pa.array (NOT via pandas): pandas' NaN-as-null
    # convention would silently turn the v4 NaN measure rows into NULLs.
    # With plain-list ingestion, None -> null and float('nan') -> a real
    # NaN value, which is the whole point of the fixture.
    src = pa.parquet.read_table(f"{SRC}/{name}.parquet")
    cols = [
        pa.array([r[i] for r in rows], type=field.type)
        for i, field in enumerate(src.schema)
    ]
    extra_tab = pa.Table.from_arrays(cols, schema=src.schema)
    pq.write_table(pa.concat_tables([src, extra_tab]), f"{out_dir}/{name}.parquet")


def build(out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    ts = pd.Timestamp  # micros precision, matching the source physical type

    _append("region", [], out_dir)
    _append(
        "nation",
        [
            (25, "EDGELAND", None),   # orphan: NULL region key
            (26, "", 0),              # empty name
        ],
        out_dir,
    )
    _append(
        "customer",
        [
            (150, "", 3, None, "BUILDING"),              # empty name, NULL balance
            (151, "Null Nation", None, 1234.56, "MACHINERY"),  # NULL FK
            (152, "Orphan FK", 98, 777.77, "AUTOMOBILE"),      # dangling FK
            (153, "Tie One", 5, MAX_ACCTBAL, "FURNITURE"),     # balance tie at max
            (154, "Tie Two", 7, MAX_ACCTBAL, "HOUSEHOLD"),
            (155, "Ünïcødé 客户", 9, -500.0, None),            # NULL segment
        ],
        out_dir,
    )
    _append(
        "supplier",
        [
            (10, "NullBal Supplier", 4, None),
            (11, "Orphan Supplier", 98, 0.0),
        ],
        out_dir,
    )
    _append(
        "part",
        [
            (200, None, "Brand#13", "ECONOMY", None, MAX_RETAIL),  # NULL name, price tie
            (201, "", "Brand#5", "PROMO", 0, 0.0),                 # empty name, zero price
            (202, "größe wîdget", "Brand#19", "STANDARD", 1, MAX_RETAIL),
            (203, "cold widget", "Brand#1", "ECONOMY", 50, 100.0),  # duplicate name...
            (204, "cold widget", "Brand#2", "PROMO", 50, 100.0),    # ...twice (fuzzy ties)
        ],
        out_dir,
    )
    _append(
        "orders",
        [
            # three-way totalprice tie AT the current max: top-k boundary
            (1500, 7, "O", MAX_TOTALPRICE, ts("1997-03-04"), "2-HIGH"),
            (1501, 11, "F", MAX_TOTALPRICE, ts("1998-06-15"), "1-URGENT"),
            (1502, 13, "P", MAX_TOTALPRICE, ts("1996-01-02"), "5-LOW"),
            (1503, 3, "O", 0.0, ts("1995-01-01"), "3-MEDIUM"),
            (1504, 5, "F", None, ts("1999-12-31"), "4-NOT SPECIFIED"),  # NULL price
            (1505, 9, "O", 1234.5, None, "2-HIGH"),                     # NULL date
            (1506, 2, "F", 88.25, ts("2000-07-07"), None),              # NULL priority
            (1507, 4, "O", -42.5, ts("1997-07-07"), "5-LOW"),           # negative price
            # NULL priority on a key hit by the merge family's %7
            # delete sweep AND the COW %3 rewrite predicate — probes
            # null-safety of every priority-gated edit rule:
            (1512, 8, "F", 99.99, ts("1998-03-03"), None),
            # v4: non-finite measures — a single NaN/Inf price must
            # degrade (cents -> NULL) instead of ANSI-aborting the job:
            (1513, 6, "O", float("nan"), ts("1997-05-05"), "3-MEDIUM"),
            (1514, 10, "F", float("inf"), ts("1996-09-09"), "1-URGENT"),
        ],
        out_dir,
    )
    _append(
        "lineitem",
        [
            (1500, 17, 3, 1, 5.0, 100.0, None, 0.04, "N", "O", ts("1997-03-10")),  # NULL discount
            (1500, 23, 4, 2, 0.0, 0.0, 0.0, None, "A", "F", ts("1997-03-11")),     # zero qty, NULL tax
            (1501, 31, 5, 1, 3.0, 250.0, 0.1, 0.02, "R", "F", None),               # NULL shipdate
            # exact duplicate pair (same order, different linenumber, all
            # measures identical — grouping and dedup must count both):
            (1502, 42, 6, 1, 7.0, 777.0, 0.05, 0.01, "N", "O", ts("1996-01-09")),
            (1502, 42, 6, 2, 7.0, 777.0, 0.05, 0.01, "N", "O", ts("1996-01-09")),
            (1503, 55, 7, 1, 1e6, 1e9, 0.0, 0.0, "A", "O", ts("1995-01-05")),      # extreme values
            # v4: NaN revenue inputs (extendedprice, then discount) —
            # l_extendedprice * (1 - l_discount) is NaN either way and
            # must quantize to NULL, not kill the scan:
            (1503, 61, 8, 2, 2.0, float("nan"), 0.05, 0.01, "N", "O", ts("1995-02-01")),
            (1503, 62, 9, 3, 3.0, 150.0, float("nan"), 0.02, "R", "F", ts("1995-02-02")),
        ],
        out_dir,
    )
    _append(
        "events",
        [
            # identical (user, ts) pair, distinct event_id: window-order tie
            (1000, ts("2024-01-10 12:00:00"), 3, "click", 10.0, '{"k": 1}'),
            (1001, ts("2024-01-10 12:00:00"), 3, "view", 20.0, '{"k": 2}'),
            (1002, ts("2024-01-11 08:30:00"), 4, "purchase", None, '{"k": 3}'),   # NULL value
            (1003, ts("2024-01-12 09:00:00"), 5, None, 5.5, None),                # NULL type+props
            (1004, ts("2024-01-13 10:00:00"), None, "error", 1.0, "not-json"),    # NULL user, bad json
            (1005, ts("2024-01-14 11:00:00"), 6, "signup", 1e12, "{}"),           # extreme value
            (1006, None, 7, "click", 2.0, '{"k": 9}'),                            # NULL ts
            (1007, ts("2024-01-15 00:00:00"), 8, "view", -3.25, '{"k": 0}'),      # negative value
            # v4: non-finite values — every floor(value*scale) site and
            # every sum/min/max over value sees NaN (both engines order
            # NaN above +Inf, so comparisons stay cross-engine stable):
            (1008, ts("2024-01-16 12:00:00"), 9, "click", float("nan"), "{}"),
            (1009, ts("2024-01-17 13:00:00"), 10, "view", float("inf"), "{}"),
            (1010, ts("2024-01-18 14:00:00"), 11, "purchase", float("-inf"), "{}"),
            # NOTE deliberately NO finite cents-overflow magnitude
            # (e.g. 1e17) here: at |x| >= ~1e16 every RAW-double display
            # column becomes cross-engine hash-unstable for reasons that
            # are not pipeline bugs (Spark's BigDecimal round() is the
            # identity there while DuckDB's loses ULPs, and double SUM
            # order differences exceed any rounding tolerance).  The
            # finite-overflow -> NULL-cents rank class is pinned by
            # tests/test_query_edge_parity.py::test_cents_overflow_rank_parity
            # on a dedicated fixture over the cents-only queries.
        ],
        out_dir,
    )
    _append(
        "documents",
        [
            (500, "", "en", "src0", 0),                                 # empty text
            (501, None, None, None, None),                              # all-NULL
            (502, "a" * 70_000, "en", "src1", 70_000),                  # > COM segment max
            # 18 chars (code points) but 28 UTF-8 bytes:
            (503, "héllo \U0001f30d wörld ñ 你好", "zh", "src2", 18),
            # exact duplicate pair (dedup tie — cluster keeps are by len
            # then id, so equal lengths force the id tiebreak):
            (504, "the quick brown fox jumps over the lazy dog", "en", "src3", 44),
            (505, "the quick brown fox jumps over the lazy dog", "en", "src4", 44),
            (506, "   \t  \n ", "en", "src5", 8),                       # whitespace-only
            (507, "100% [sure]? (yes) 'q' \"dq\" back\\slash|pipe~tilde", "en", "src6", 49),
            (508, ("spam " * 500).strip(), "en", "src7", 2999),         # low entropy
            (509, "x", "de", "src8", 1),                                # single char
            (510, "\n\nhello\nworld or not\n", "en", "src9", 21),       # newline-led
            (511, "!!! ??? ... ;;; %%%", "en", "src10", 19),            # all punctuation
            # vertical tab + form feed separators: Java \s matches \x0B,
            # RE2's does not — probes the explicit WS_CLASS mirror
            (512, "alpha\x0bbeta\fgamma \x0b delta", "en", "src11", 24),
        ],
        out_dir,
    )
    base = [0.001 * (i - 31) for i in range(EMB_DIM)]
    _append(
        "embeddings",
        [
            (500, [0.0] * EMB_DIM, 0),          # zero vector: 0-norm cosine
            (501, base, 1),                     # identical pair: cosine tie
            (502, base, 1),
            (503, [1e18] * EMB_DIM, 2),         # float32 near-overflow magnitudes
            (504, [-1.0] * EMB_DIM, 3),
            (505, [0.5] * EMB_DIM, None),       # NULL label
        ],
        out_dir,
    )
    print(f"sfedge written to {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfedge")
