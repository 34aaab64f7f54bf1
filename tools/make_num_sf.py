"""Build the FLOAT/NUMERIC-EXTREMES scale point: ``sfnum``.

Copies every sf0.001 table and appends rows whose ONLY adversity is the
numeric axis — the ninth adversarial input class, after sf0.01 (driver
scale), sfedge (NULL/NaN/ties/orphans), sfempty, sfone, sfdup
(duplicate saturation), sftime (calendar extremes), sfbig (giant rows /
hot keys), and sfuni (unicode/encoding).  sfedge already plants NULLs,
a NaN/Inf measure apiece, zero vectors, and exact ties; sfnum is the
COMPLEMENT: both infinity signs in every measure family, negative
zero, double denormals (5e-324) and the min-normal (2.2e-308), float32
overflow/underflow magnitudes inside embedding vectors, non-finite
COMPONENTS inside otherwise-normal vectors, and int64-extreme ids.
Text columns stay boring so any divergence is attributable to numeric
semantics alone.

Why each class is a REAL 100 TB input (telemetry and scraped-feature
corpora are the canonical dirty-float source — every shape below
appears once your pipeline ingests floats you didn't produce):

* **±Inf measures**: sensor overflow, log(0) upstream, 1/0 in a
  producer.  Sums/avgs must propagate the SAME inf on both engines;
  quantization sites must degrade non-finite to NULL (the sfedge
  contract) rather than wrap on cast — DuckDB raises on
  ``CAST('inf' AS BIGINT)`` while non-ANSI Spark wraps, so any raw
  cast of a non-finite is an instant cross-engine divergence.
* **Mixed ±Inf in one summed population**: IEEE makes
  ``(+inf) + (-inf) = NaN`` in ANY accumulation order, so global sums
  stay deterministic — the fixture exploits that: each per-group
  population carries at most one infinity SIGN, while the global
  population carries both (sum = NaN on both engines regardless of
  partial-aggregation order).
* **NaN**: both engines group NaN with NaN and order NaN above +Inf —
  asserted at build time; any engine-side drift (e.g. a Python
  ``float('nan') ==`` somewhere) breaks the sweep instantly.
* **Negative zero**: ``-0.0 == 0.0`` but ``repr`` differs and
  IEEE division by it flips sign of inf.  Spark NORMALIZES -0.0 in
  grouping/join keys (SPARK-26021); DuckDB hashes it equal to +0.0 —
  both engines must land -0.0 and +0.0 rows in ONE group.
* **Denormals (5e-324) and DBL_MIN (2.225e-308)**: gradual-underflow
  territory; products underflow to 0, and the min-normal is the
  historical Java/PHP parse-hang constant (both engines parse it fine
  today — pinning that stays true).
* **Float32 extremes inside vectors**: parquet ``list<float>`` is
  binary32 — 3e38 components square to +inf IN FLOAT32 but 9e76 in
  float64, and 1e-45 components square to 0 in float32 but 1e-90 in
  float64.  Norm/cosine paths must agree on WHICH precision they
  accumulate in (the engine contract: accumulate in float64 after
  Arrow hands numpy float32 — upcast explicitly).
* **Non-finite vector COMPONENTS** (one NaN / one ±Inf among 63 normal
  values): a corrupt embedding must not poison ANN top-k ordering
  differently per engine (NaN similarity sorts consistently) nor
  crash PQ/IVF training (train paths filter non-finite vectors by
  contract).
* **Int64-extreme ids** (o_orderkey / user_id / vec_id near ±2^63):
  snowflake-style ids live at 9.2e18 in the wild.  Grouping, joins,
  windows, and modular sweeps must not do overflow-prone arithmetic
  (``-(k+1)``, ``id * prime``) — non-ANSI Spark wraps silently where
  DuckDB raises OUT_OF_RANGE, so any such site diverges or aborts the
  sweep loudly.

Display-stability guard (see make_edge_sf.py, the v4 note): finite
magnitudes ≥ ~1e16 in RAW-displayed double columns are cross-engine
hash-unstable for non-bug reasons (BigDecimal round identity vs ULP
loss, sum-order noise above the rounding tolerance) — and the first
sfnum sweep measured the SUM-display bound to be far tighter: a 1e15
row makes every group sum it reaches order-unstable at round(,4)
(ULP(1e15) = 0.125; ~200 accumulations drift by ~0.2, flipping
flagship/cube/sliding/gini hashes with no engine at fault).  Finite
magnitudes are therefore capped at 2^20 (ULP 2.4e-10 — sum drift
orders of magnitude under any displayed rounding), and overflow
coverage comes from ±inf (closed under rounding) and from float32
squaring INSIDE operators rather than from displayed finite giants.

Usage: python tools/make_num_sf.py [out_dir]
(default /tmp/spark_graft_sfnum)
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

INF = float("inf")
NAN = float("nan")
DENORM = 5e-324           # smallest positive double (subnormal)
DBL_MIN = 2.2250738585072014e-308  # smallest NORMAL double
I64_MAX = 9223372036854775807
I64_MIN = -9223372036854775808
F32_BIG = 3e38            # fits float32 (max 3.4e38); squares to inf in f32
F32_TINY = 1e-45          # float32 denormal; squares to 0 in f32


def _append(name: str, rows: list[tuple], out_dir: str) -> None:
    # Column-by-column pa.array (NOT via pandas): pandas' NaN-as-null
    # convention would silently turn NaN measures into NULLs; plain-list
    # ingestion keeps None -> null and float('nan') -> a real NaN.
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

    for verbatim in ("region", "nation", "documents"):
        _append(verbatim, [], out_dir)

    _append(
        "customer",
        [
            # c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
            (160, "Inf Balance", 3, INF, "BUILDING"),
            (161, "NegInf Balance", 5, -INF, "MACHINERY"),
            (162, "Denormal Balance", 7, DENORM, "AUTOMOBILE"),
            (163, "NegZero Balance", 9, -0.0, "FURNITURE"),
            (164, "PosZero Balance", 9, 0.0, "FURNITURE"),  # ±0 same group
        ],
        out_dir,
    )
    _append(
        "supplier",
        [
            # s_suppkey, s_name, s_nationkey, s_acctbal
            (12, "NaN Acct Supplier", 2, NAN),
            (13, "DblMin Supplier", 4, DBL_MIN),
        ],
        out_dir,
    )
    _append(
        "part",
        [
            # p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
            (210, "inf retail widget", "Brand#13", "ECONOMY", 5, INF),
            (211, "max size widget", "Brand#5", "PROMO", 2147483647, 10.0),
            (212, "denormal widget", "Brand#19", "STANDARD", 1, DENORM),
        ],
        out_dir,
    )
    _append(
        "orders",
        [
            # o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            # o_orderdate, o_orderpriority.
            # Parents for the sfnum lineitems (join paths keep them):
            (1600, 7, "O", 500.0, ts("1997-04-01"), "2-HIGH"),
            (1601, 11, "F", -0.0, ts("1998-02-02"), "1-URGENT"),
            (1602, 13, "P", DENORM, ts("1996-03-03"), "5-LOW"),
            # sfedge has +inf and NaN totalprice; -inf is the gap:
            (1603, 3, "O", -INF, ts("1995-04-04"), "3-MEDIUM"),
            # Snowflake-scale order id: any -(k+1)/k*prime arithmetic
            # overflows int64 here (Spark wraps, DuckDB raises) — kept
            # 807 BELOW int64 max so %7 delete sweeps and +small-offset
            # synthetic edits stay in range while k*2-style bugs still
            # trip:
            (I64_MAX - 807, 2, "F", 321.0, ts("1997-09-09"), "4-NOT SPECIFIED"),
        ],
        out_dir,
    )
    _append(
        "lineitem",
        [
            # l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            # l_extendedprice, l_discount, l_tax, l_returnflag,
            # l_linestatus, l_shipdate.
            # +inf price ("N","O" group sums -> +inf; cents -> NULL):
            (1600, 17, 3, 1, 2.0, INF, 0.10, 0.05, "N", "O", ts("1997-04-02")),
            # -0.0 discount: (1 - -0.0) == 1.0 exactly on both engines:
            (1600, 17, 3, 2, 3.0, 100.0, -0.0, 0.02, "N", "O", ts("1997-04-03")),
            # denormal price and denormal discount (1 - 5e-324 == 1.0):
            (1601, 23, 4, 1, 1.0, DENORM, 0.0, 0.0, "A", "F", ts("1998-02-03")),
            (1601, 23, 4, 2, 1.0, 100.0, DENORM, 0.01, "R", "F", ts("1998-02-04")),
            # -inf quantity: the ONLY infinite qty, so every qty sum it
            # reaches is -inf deterministically ("R","F" group):
            (1602, 31, 5, 1, -INF, 50.0, 0.10, 0.0, "R", "F", ts("1996-03-04")),
            # large-but-display-stable magnitude (2^20 sum-drift guard):
            (1602, 31, 5, 2, 1048576.0, 1.0, 0.20, 0.10, "A", "O", ts("1996-03-05")),
            # line under the snowflake order (join/window over giant key):
            (I64_MAX - 807, 42, 6, 1, 4.0, 200.0, 0.05, 0.01, "N", "O", ts("1997-09-10")),
        ],
        out_dir,
    )
    _append(
        "events",
        [
            # event_id, ts, user_id, event_type, value, props.
            # Snowflake-scale user id, twice (windows/sessions/lag over it):
            (2000, ts("2024-01-20 10:00:00"), I64_MAX, "click", 7.5, "{}"),
            (2001, ts("2024-01-20 10:05:00"), I64_MAX, "click", 2.5, "{}"),
            # int64-min user id (abs()/negation wrap bait):
            (2002, ts("2024-01-20 11:00:00"), I64_MIN, "view", 1.0, "{}"),
            # one infinity SIGN per (user, event_type) population; the
            # global value population carries both signs AND NaN, so
            # whole-table sums are NaN in any accumulation order:
            (2003, ts("2024-01-21 09:00:00"), 20, "click", INF, "{}"),
            (2004, ts("2024-01-21 10:00:00"), 21, "view", -INF, "{}"),
            (2005, ts("2024-01-21 11:00:00"), 22, "purchase", NAN, "{}"),
            # ±0.0 for the same user: one group, not two:
            (2006, ts("2024-01-22 09:00:00"), 23, "click", -0.0, "{}"),
            (2007, ts("2024-01-22 10:00:00"), 23, "click", 0.0, "{}"),
            # gradual underflow:
            (2008, ts("2024-01-23 09:00:00"), 24, "view", DENORM, "{}"),
            (2009, ts("2024-01-23 10:00:00"), 24, "view", -DENORM, "{}"),
            (2010, ts("2024-01-24 09:00:00"), 25, "purchase", DBL_MIN, "{}"),
            # display-stable finite extremes (2^20 sum-drift guard):
            (2011, ts("2024-01-24 10:00:00"), 25, "purchase", 1048576.25, "{}"),
            (2012, ts("2024-01-25 09:00:00"), 26, "signup", -1048576.25, "{}"),
            # JSON numeric overflow: 1e999 parses to +inf wherever props
            # numbers are extracted-and-cast:
            (2013, ts("2024-01-25 10:00:00"), 27, "click", 3.5, '{"k": 1e999}'),
        ],
        out_dir,
    )

    small = [0.01 * ((i % 7) - 3) + 0.005 for i in range(EMB_DIM)]
    nan_vec = list(small)
    nan_vec[0] = NAN
    posinf_vec = list(small)
    posinf_vec[1] = INF
    neginf_vec = list(small)
    neginf_vec[2] = -INF
    _append(
        "embeddings",
        [
            # vec_id, embedding(list<float> 64), label
            (600, nan_vec, 0),                # one NaN component
            (601, posinf_vec, 1),             # one +inf component
            (602, neginf_vec, 2),             # one -inf component
            (603, [F32_BIG] * EMB_DIM, 3),    # norm overflows IN FLOAT32 only
            (604, [F32_TINY] * EMB_DIM, 0),   # norm underflows IN FLOAT32 only
            (605, [-0.0] * EMB_DIM, 1),       # negative-zero vector (0-norm)
            (I64_MAX, small, 2),              # snowflake-scale vec id
        ],
        out_dir,
    )

    # Build-time cross-engine NaN discipline assertion (the fixture's
    # own contract): both engines must group NaN with NaN and order NaN
    # above +inf, or the whole scale point mismeasures.
    import duckdb

    con = duckdb.connect()
    g = con.execute(
        "SELECT count(*) FROM (SELECT value FROM "
        f"'{out_dir}/events.parquet' WHERE isnan(value) GROUP BY value)"
    ).fetchone()[0]
    assert g == 1, f"DuckDB NaN grouping drifted: {g} groups"
    top = con.execute(
        f"SELECT value FROM '{out_dir}/events.parquet' "
        "WHERE value IS NOT NULL ORDER BY value DESC LIMIT 1"
    ).fetchone()[0]
    assert top != top, f"DuckDB NaN-above-inf ordering drifted: top={top}"
    print(f"sfnum written to {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfnum")
