"""Build the SIZE-SCALING point: a ~10x sf0.1 (≈ sf1.0) via remapped-id
unions — the instrument the r12 verdict asked for.

Every earlier scale point tests an adversarial *shape* at one size; this
one tests SIZE itself.  ``tools/scaling_slopes.py`` runs the headline
set at sf0.1 and here and records time(10n)/time(n) slopes — both r11
quadratics (``exact_substring_spans`` 203 s, the email-regex 52 s) were
invisible at sf0.1 and found only by a hand-built giant-row fixture; a
slope table catches the next super-linear query mechanically.

Construction: K disjoint copies of sf0.1 (default 10), copy k remapping
every entity id by ``+ k * 10_000_000`` so each id space stays disjoint
and every join key resolves within its own copy.  The remap preserves
the distributional SHAPE that makes slopes interpretable:

* join fan-outs, group sizes, selectivities, and per-key history
  lengths are IDENTICAL per copy — groups/users/orders multiply x10,
  rows-per-group stay constant (more users, not longer histories:
  window partitions and grouped-map state must NOT grow with sf);
* ``region``/``nation`` stay fixed (TPC-H semantics: dims do not scale);
* ``documents`` copy k>0 gets a rot-k letter-substitution cipher on the
  text (length-, whitespace-, and case-preserving): within-copy
  duplicate/near-dup structure is preserved EXACTLY (so dup classes,
  shingle-set sizes, and pair counts scale x10 linearly), while
  cross-copy texts share no tokens — without this, every doc would gain
  9 exact twins and the pair-space of the dedup family would scale
  quadratically BY CONSTRUCTION, drowning any real quadratic;
* ``embeddings`` copy k>0 cyclically rolls each vector by k components:
  norms and within-copy pairwise geometry are exact, cross-copy cosines
  decorrelate (else SemDeDup/ANN would see 10-way exact-dup clusters);
* ``n_chars`` stays valid (rot preserves length); event timestamps are
  unchanged (x10 event density in the same window, same per-user
  cadence).

Byte-deterministic: no RNG anywhere — the transform is a pure function
of (row, k).

Usage: python tools/make_scale_sf.py [out_dir] [--copies K]
       (default /tmp/spark_graft_scale/sf1.0, K=10)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

#: Id-space stride between copies — far above every sf0.1 max id
#: (l_orderkey tops out at 600k) and small enough that K copies stay
#: nowhere near int64 range.
STRIDE = 10_000_000

#: id columns to remap, per table.  Foreign keys shift by the SAME
#: stride as their parent, so copy k's lineitem joins copy k's orders/
#: part/supplier and nothing else.  nation/region keys are NOT remapped
#: anywhere (fixed dims).
ID_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

FIXED = ["region", "nation"]


def _rot_table(k: int) -> dict[int, int]:
    """Letter-substitution cipher for copy k: rot-k on a-z and A-Z,
    everything else untouched.  Preserves length, case shape,
    whitespace, digits, punctuation, and non-ASCII — so token counts,
    char entropy, and every per-doc size metric match copy 0 exactly,
    while no alphabetic token survives across copies."""
    t: dict[int, int] = {}
    for base in (ord("a"), ord("A")):
        for i in range(26):
            t[base + i] = base + (i + k) % 26
    return t


def _shift_ids(tbl: pa.Table, cols: list[str], k: int) -> pa.Table:
    for c in cols:
        shifted = pc.add(tbl[c], pa.scalar(k * STRIDE, type=pa.int64()))
        tbl = tbl.set_column(
            tbl.schema.get_field_index(c), tbl.schema.field(c), shifted
        )
    return tbl


def _copy_of(name: str, src_tbl: pa.Table, k: int) -> pa.Table:
    tbl = _shift_ids(src_tbl, ID_COLS[name], k)
    if name == "documents" and k > 0:
        rot = _rot_table(k)
        texts = pa.array(
            [None if s is None else s.translate(rot)
             for s in tbl["text"].to_pylist()],
            type=pa.string(),
        )
        tbl = tbl.set_column(
            tbl.schema.get_field_index("text"),
            tbl.schema.field("text"),
            texts,
        )
    if name == "embeddings" and k > 0:
        rolled = pa.array(
            [None if v is None else v[k % len(v):] + v[:k % len(v)]
             for v in tbl["embedding"].to_pylist()],
            type=src_tbl.schema.field("embedding").type,
        )
        tbl = tbl.set_column(
            tbl.schema.get_field_index("embedding"),
            tbl.schema.field("embedding"),
            rolled,
        )
    return tbl


def build(out_dir: str, copies: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in FIXED:
        shutil.copyfile(
            f"{SRC}/{name}.parquet", f"{out_dir}/{name}.parquet"
        )
    for name in ID_COLS:
        src_tbl = pq.read_table(f"{SRC}/{name}.parquet")
        dest = f"{out_dir}/{name}.parquet"
        with pq.ParquetWriter(dest, src_tbl.schema) as w:
            # One copy per write_table call keeps peak memory at
            # O(one sf0.1 table), not O(K tables): lineitem x10 stays
            # a sequence of 600k-row row-group batches.
            for k in range(copies):
                w.write_table(_copy_of(name, src_tbl, k))
        n = pq.ParquetFile(dest).metadata.num_rows
        print(f"{name}: {src_tbl.num_rows} -> {n} rows")
    print(f"scale point ready at {out_dir} ({copies}x {SRC})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    copies = 10
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        del args[i:i + 2]
    out = args[0] if args else "/tmp/spark_graft_scale/sf1.0"
    build(out, copies)
