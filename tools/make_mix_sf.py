"""Build the CROSS-CLASS COMPOSITION scale point: ``sfmix``.

Copies every sf0.001 table and appends rows where SEVERAL verified
adversity axes co-occur in the same row or group — the eleventh
adversarial input class.  The ten existing points each isolate one
axis (NULLs, duplicates, calendar extremes, giant rows, unicode,
float extremes, ...) so that a divergence is attributable; their
pinned gates prove each axis alone.  What none of them proves is the
INTERACTIONS: a window-order tie whose tiebreak values are NaN, a
session straddling the year-9999 sentinel for a NULL user, a
duplicated vector whose shared payload is corrupt, a case-fold trap
inside a duplicated document with a NULL language.  Real corpora
compose failures exactly this way — the producer that ships NULLs is
the same one that ships NaN, on the same hot day.

Composition classes (fresh id ranges, disjoint from every per-axis
fixture so generators stay unionable for debugging):

* events 3000+: tied (user, ts) pairs with NaN measures (dup x num);
  year-9999 sentinel events for a NULL user (time x null x num);
  sub-second negative-epoch with -inf (time x num); a tripled exact
  duplicate with NULL value (dup x null); an EXACT 5-minute session
  gap whose values are denormal (boundary x num); a unicode event
  type with a 2^20 measure (uni x num).
* documents 9900+ (above sfuni's 9000-9020): a case-fold-trap text
  (Istanbul-dotted-I + final sigma) tripled with NULL lang
  (uni x dup x null); an astral-emoji pair with NULL source; a ~40 KB
  unicode doc with both keys NULL (big-ish x uni x null).
* embeddings 800+: an exact duplicate PAIR whose shared vector has a
  NaN component (dup x non-finite: quantized search must exclude
  BOTH, exact cosine ties NaN sims deterministically); a duplicate
  pair with a NULL component (dup x corrupt: both collapse under the
  as_double contract); a zero vector with NULL label; a clean
  duplicate pair as control.
* orders 1800+ / lineitem: extreme date x NULL price; NULL keys x
  +inf price; denormal price x negative-epoch date; a lineitem
  carrying NaN qty, inf price, NULL discount, -0.0 tax, and a
  year-9999 shipdate ALL AT ONCE; a duplicate lineitem pair priced
  at 5e-324.
* customers 180+: a case-fold-trap name duplicated across two rows
  holding +inf and -inf balances with NULL segments (their
  nation-level balance sum is (+inf) + (-inf) = NaN in ANY
  accumulation order — deterministic); a NULL-nation NaN-balance row.

Sum-determinism audit (the make_num_sf.py discipline): within every
(user), (type), (day), (nation), (flag, status) population, infinities
appear with at most one sign unless the population also determinism-
collapses to NaN via IEEE (inf + -inf = NaN in any order, NaN absorbs
everything after).  Finite magnitudes stay <= 2^20.

Usage: python tools/make_mix_sf.py [out_dir]
(default /tmp/spark_graft_sfmix)
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
DENORM = 5e-324


def _append(name: str, rows: list[tuple], out_dir: str) -> None:
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

    for verbatim in ("region", "nation", "supplier", "part"):
        _append(verbatim, [], out_dir)

    _append(
        "customer",
        [
            # fold-trap name duplicated; +inf / -inf balances; NULL
            # segments.  nation-12 balance sum: inf + -inf = NaN (det).
            (180, "İstanbul Müşteri ς", 12, INF, None),
            (181, "İstanbul Müşteri ς", 12, -INF, None),
            (182, "ヌル顧客", None, NAN, "BUILDING"),
        ],
        out_dir,
    )
    _append(
        "orders",
        [
            (1800, 7, "O", None, ts("9999-12-31"), "1-URGENT"),
            (1801, None, "F", INF, None, None),
            (1802, 11, "P", DENORM, ts("1969-12-31"), "5-LOW"),
        ],
        out_dir,
    )
    _append(
        "lineitem",
        [
            # everything at once: NaN qty, inf price, NULL discount,
            # -0.0 tax, year-9999 shipdate
            (1800, 17, 3, 1, NAN, INF, None, -0.0, "N", "O", ts("9999-12-31")),
            # -inf qty x NULL shipdate
            (1801, 23, 4, 1, -INF, 100.0, DENORM, None, "R", "F", None),
            # exact duplicate pair priced at a denormal
            (1802, 42, 6, 1, 1.0, DENORM, 0.0, 0.0, "A", "F", ts("1970-01-01")),
            (1802, 42, 6, 2, 1.0, DENORM, 0.0, 0.0, "A", "F", ts("1970-01-01")),
        ],
        out_dir,
    )
    _append(
        "events",
        [
            # window-order tie x NaN measures (distinct event ids)
            (3000, ts("2024-01-29 10:00:00"), 40, "click", NAN, "{}"),
            (3001, ts("2024-01-29 10:00:00"), 40, "view", NAN, '{"k": 2}'),
            # year-9999 sentinel day, NULL user: two events 90 min apart
            # (sessions over a null key at the calendar edge); inf value
            (3002, ts("9999-12-31 22:00:00"), None, "click", INF, "{}"),
            (3003, ts("9999-12-31 23:30:00"), None, "click", 3.0, "{}"),
            # sub-second negative epoch x -inf
            (3004, ts("1969-12-31 23:59:59.500"), 41, "view", -INF, "{}"),
            # tripled exact duplicate (same user/ts/type) x NULL value
            (3005, ts("2024-01-29 14:00:00"), 42, "purchase", None, "{}"),
            (3006, ts("2024-01-29 14:00:00"), 42, "purchase", None, "{}"),
            (3007, ts("2024-01-29 14:00:00"), 42, "purchase", None, "{}"),
            # EXACT 5-minute session gap x denormal values
            (3008, ts("2024-01-29 11:00:00"), 42, "purchase", DENORM, "{}"),
            (3009, ts("2024-01-29 11:05:00"), 42, "purchase", 2.0, "{}"),
            # unicode event type x 2^20 measure
            (3010, ts("2024-01-30 09:00:00"), 43, "クリック☘", 1048576.25, "{}"),
        ],
        out_dir,
    )
    fold_trap = "İstanbul ΟΔΟΣ Σίσυφος ς şehir"
    astral = "\U0001F600\U0001F9D1\U0001F3FD‍\U0001F4BB 漢字 mix"
    big_uni = ("pârágraph é́ 密度テスト \U0001D54A " * 800).strip()
    _append(
        "documents",
        [
            # fold trap x tripled duplicate x NULL lang
            (9900, fold_trap, None, "src0", len(fold_trap)),
            (9901, fold_trap, None, "src1", len(fold_trap)),
            (9902, fold_trap, None, "src2", len(fold_trap)),
            # astral duplicate pair x NULL source
            (9903, astral, "en", None, len(astral)),
            (9904, astral, "en", None, len(astral)),
            # ~40 KB unicode doc x both keys NULL
            (9905, big_uni, None, None, len(big_uni)),
        ],
        out_dir,
    )
    base = [0.01 * ((i % 9) - 4) + 0.002 for i in range(EMB_DIM)]
    nan_vec = list(base)
    nan_vec[3] = NAN
    null_vec = list(base)
    null_vec[1] = None
    _append(
        "embeddings",
        [
            # duplicate pair sharing a NaN component (dup x non-finite)
            (800, nan_vec, 5),
            (801, nan_vec, 5),
            # duplicate pair sharing a NULL component (dup x corrupt)
            (802, null_vec, 6),
            (803, null_vec, 6),
            # zero vector x NULL label
            (804, [0.0] * EMB_DIM, None),
            # clean duplicate control pair
            (805, base, 7),
            (806, base, 7),
        ],
        out_dir,
    )
    print(f"sfmix written to {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfmix")
