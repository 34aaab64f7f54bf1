"""Build the GIANT-ROW / HOT-KEY scale point: ``sfbig``.

The seventh adversarial input class (after sf0.01, sfedge, sfempty,
sfone, sfdup, sftime): rows whose INDIVIDUAL size or key saturation is
pathological, while every value stays contract-respecting.  At 100 TB
this is routine — a crawl has 10 MB pages next to 100-byte stubs, one
user or instrument dwarfs the rest, and a single order can carry
thousands of lines.  Operators that materialize per-row or per-key
state (collect_set shingle sets, PAA series arrays, grouped-map
histories, window partitions) meet their bounds here; both engines must
also stay EXACT on megabyte strings through tokenization, regex,
hashing, and n-gram pipelines.

Shape (all deterministic, seeded LCG — byte-reproducible):

* ``documents`` is REPLACED by 24 docs, not appended: the set-similarity
  oracles are all-pairs over per-doc element sets, so doc count must
  shrink as per-doc size grows to keep the DuckDB side feasible.
  - doc 0: ~150 KB high-entropy text (~21k 6-char words) — giant
    shingle/token sets through every text operator;
  - docs 1, 2: ~150 KB low-entropy near-duplicates differing only in a
    short tail — a giant near-dup pair for MinHash/winnowing/SimHash
    (banding probabilities at maximal set size);
  - doc 3: ONE 60,000-char token, no whitespace — the
    tokenizer/shingler degenerate case (token count 1, shingle count 0)
    and a single regex subject of maximal length;
  - doc 4: ~150 KB of one repeated paragraph — boilerplate/repetition
    detection at saturation;
  - docs 5..23: the first 19 sf0.001 docs verbatim (the normal tail
    that keeps distributions non-degenerate).
* ``events`` is REPLACED by 21,000 rows on THREE users (7,000 each,
  1-second cadence with a deterministic value walk): hot window
  partitions, sessions thousands of events long, grouped-map histories
  in the thousands.
* ``lineitem`` gains 2,000 extra lines on orderkey 0 (valid parts and
  suppliers, linenumbers continuing upward): one order fans every
  order-keyed join and window by three orders of magnitude.
* everything else is copied verbatim.

Usage: python tools/make_big_sf.py [out_dir]  (default /tmp/spark_graft_sfbig)
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


def _words(seed: int, n: int) -> list[str]:
    """n deterministic 6-char lowercase words from a 64-bit LCG."""
    x = seed & 0xFFFFFFFFFFFFFFFF
    out = []
    for _ in range(n):
        w = []
        for _ in range(6):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            w.append(chr(ord("a") + ((x >> 33) % 26)))
        out.append("".join(w))
    return out


def build(out_dir: str, scale: float = 1.0) -> None:
    """``scale`` shrinks every pathological dimension together (giant-doc
    word counts, events per hot user, extra lines on the hot order) while
    keeping the SHAPE — the per-pytest gate runs at scale=1/3 so the
    DuckDB substring/all-pairs oracles stay in test-suite budget, while
    the full sweep runs at 1.0."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    s = float(scale)

    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "embeddings"]:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{out_dir}/{name}.parquet"
        )

    # documents: replaced (see module docstring on oracle feasibility).
    src_docs = pq.read_table(f"{SRC}/documents.parquet")
    base = src_docs.slice(0, 19).to_pylist()
    hi = " ".join(_words(1, int(21_000 * s)))                   # ~150 KB, high entropy
    lo_core = " ".join(_words(2, int(20_000 * s)))              # shared ~140 KB core
    lo_a = lo_core + " " + " ".join(_words(3, 40))
    lo_b = lo_core + " " + " ".join(_words(4, 40))     # near-dup tail
    one_tok = "".join(_words(5, int(10_000 * s)))[: int(60_000 * s)]      # single giant token
    para = " ".join(_words(6, 120))                    # ~840-char paragraph
    boiler = " ".join([para] * max(int(180 * s), 2))                    # ~150 KB repetition
    giants = [
        (0, hi, "en", "big0", len(hi)),
        (1, lo_a, "en", "big1", len(lo_a)),
        (2, lo_b, "en", "big2", len(lo_b)),
        (3, one_tok, "en", "big3", len(one_tok)),
        (4, boiler, "en", "big4", len(boiler)),
    ]
    rows = [
        dict(zip(["doc_id", "text", "lang", "source", "n_chars"], g))
        for g in giants
    ] + [
        {**r, "doc_id": i + 5} for i, r in enumerate(base)
    ]
    cols = {
        f.name: pa.array([r[f.name] for r in rows], type=f.type)
        for f in src_docs.schema
    }
    pq.write_table(
        pa.Table.from_arrays(list(cols.values()), schema=src_docs.schema),
        f"{out_dir}/documents.parquet",
    )

    # events: replaced — three hot users, 7,000 rows each.
    src_ev = pq.read_table(f"{SRC}/events.parquet")
    t0 = dt.datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "signup"]
    ev_rows = []
    eid = 0
    x = 99
    for user in (1, 2, 3):
        for i in range(int(7_000 * s)):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            ev_rows.append(
                {
                    "event_id": eid,
                    "ts": t0 + dt.timedelta(seconds=i * 37 + user),
                    "user_id": user,
                    "event_type": types[(x >> 33) % 4],
                    "value": float((x >> 20) % 10_000) / 100.0,
                    "props": '{"k": %d}' % ((x >> 40) % 100),
                }
            )
            eid += 1
    ev_cols = {
        f.name: pa.array([r[f.name] for r in ev_rows], type=f.type)
        for f in src_ev.schema
    }
    pq.write_table(
        pa.Table.from_arrays(list(ev_cols.values()), schema=src_ev.schema),
        f"{out_dir}/events.parquet",
    )

    # lineitem: appended — 2,000 extra lines on orderkey 0.
    src_li = pq.read_table(f"{SRC}/lineitem.parquet")
    li_rows = []
    x = 7
    for i in range(int(2_000 * s)):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        li_rows.append(
            (
                0,                       # l_orderkey: the hot order
                (x >> 33) % 200,         # valid part range
                (x >> 40) % 10,          # valid supp range
                100 + i,                 # linenumber continues upward
                float(1 + (x >> 20) % 50),
                float(100 + (x >> 25) % 100_000) / 100.0,
                float((x >> 30) % 10) / 100.0,
                float((x >> 35) % 8) / 100.0,
                "N" if (x >> 45) % 2 else "A",
                "O" if (x >> 46) % 2 else "F",
                dt.datetime(1996, 1, 1) + dt.timedelta(days=(x >> 47) % 2000),
            )
        )
    li_cols = [
        pa.array([r[i] for r in li_rows], type=f.type)
        for i, f in enumerate(src_li.schema)
    ]
    extra = pa.Table.from_arrays(li_cols, schema=src_li.schema)
    pq.write_table(
        pa.concat_tables([src_li, extra]), f"{out_dir}/lineitem.parquet"
    )
    print(f"sfbig written to {out_dir}")


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sfbig")
