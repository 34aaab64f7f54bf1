"""Bloom-filter semi-join pruning: a compact bitset sketch of the build
side, broadcast to every probe task, filters the big side BEFORE its
shuffle.

Spark's own runtime bloom filter (``bloom_filter_agg`` /
``might_contain``) is an internal optimizer rewrite, not exposed to this
build's SQL surface — so this is the same idea composed from public
DataFrame ops:

* **Build** — k seeded ``xxhash64`` positions per key, exploded and
  OR-folded into ``m/64`` longs with one ``bit_or`` aggregation.
  Map-side partial aggregation means each executor ships at most one
  partial bitset word per group: the shuffle is O(m), never O(rows).
* **Broadcast** — the dense word array travels as a ONE-ROW frame
  through ``F.broadcast(...).crossJoin``; a BroadcastNestedLoopJoin
  against one row is a per-partition constant, not a join.
* **Probe** — each probe row re-hashes its key and bit-tests the array
  JVM-side (``get`` + ``bitwiseAND``); no Python, no shuffle, whole-stage
  codegen keeps it in the scan stage.

Why it matters at 100 TB: a shuffle semi-join moves every fact row to
its hash partition before the join can drop it. When the build side is
too large to broadcast *as rows* (tens of millions of keys) it still
fits as a *bitset* (2^27 bits = 16 MB covers 10^8 keys at ~3% FP with
k=5), so the bloom prune deletes the non-matching fact rows while they
are still columnar in the scan — the shuffle then carries only
candidates.  False positives are removed by the exact semi-join that
follows; false negatives are impossible (same xxhash64 both sides), so
``bloom_semi_join`` is value-identical to a plain semi-join and stays
fully oracle-checkable.

Reference counterpart: the Glue job's driver-side ``isin`` membership
prune (glue/data_transform_s3.py:72-108) — this is that membership test
made sketch-sized and executor-local.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 64

#: MASKS[b] == 1 << b as a signed 64-bit long (b == 63 wraps to the sign
#: bit); indexed per-row with F.get, so the bit shift needs no column-typed
#: shiftleft (PySpark's shiftleft takes only a literal count).
_MASK_VALUES = [(1 << b) if b < 63 else -(1 << 63) for b in range(WORD_BITS)]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k independent bit positions in [0, m_bits): seeded xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in range(k)
    ]


def bloom_build(df: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """One-row frame ``{bloom_words: array<long>}`` — the dense bitset.

    One explode + one two-level bit_or aggregation; the assembly of the
    dense array stays distributed (map lookup inside a transform over a
    static index sequence — attribute reference, so no per-element
    re-evaluation).
    """
    if m_bits % WORD_BITS:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // WORD_BITS
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / WORD_BITS).cast("long").alias("w"),
            F.get(
                F.array(*[F.lit(v) for v in _MASK_VALUES]),
                (F.col("pos") % WORD_BITS).cast("int"),
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return (
        words.groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("w"), F.col("bits")))
            ).alias("wm")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("wm"), i.cast("long")), F.lit(0).cast("long")
                ),
            ).alias("bloom_words")
        )
    )


def bloom_prune(
    big: DataFrame, key: str, bloom: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """Rows of ``big`` whose key MAY be in the filter (no false negatives).

    ``bloom`` is the one-row frame from :func:`bloom_build`; it rides a
    broadcast cross join, and the k bit tests run inside the probe scan.
    """
    masks = F.array(*[F.lit(v) for v in _MASK_VALUES])
    tests = [
        F.get(F.col("bloom_words"), (p / WORD_BITS).cast("int"))
        .bitwiseAND(F.get(masks, (p % WORD_BITS).cast("int")))
        != 0
        for p in _positions(F.col(key), m_bits, k)
    ]
    return (
        big.crossJoin(F.broadcast(bloom))
        .where(reduce(lambda a, b: a & b, tests))
        .drop("bloom_words")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Exact semi-join with a bloom pre-prune on the big side.

    Value-identical to ``big.join(small, on=key, how='left_semi')`` —
    the bloom pass only decides how few rows reach that join's shuffle.

    The two key columns must share one dtype: ``xxhash64`` is
    TYPE-sensitive (the same numeric value hashes differently as int vs
    long), so mismatched sides would produce bloom FALSE NEGATIVES —
    rows silently missing from an "exact" semi-join.  The plain join
    below would paper over it with an implicit coercion cast; refusing
    is the only honest option, so align the types explicitly upstream.
    """
    small_key = small_key or big_key
    big_types, small_types = dict(big.dtypes), dict(small.dtypes)
    if big_key not in big_types or small_key not in small_types:
        missing = [
            f"{k!r} (have: {sorted(t)})"
            for k, t in ((big_key, big_types), (small_key, small_types))
            if k not in t
        ]
        raise ValueError(f"bloom_semi_join key column missing: {missing[0]}")
    big_t, small_t = big_types[big_key], small_types[small_key]
    if big_t != small_t:
        raise ValueError(
            f"bloom_semi_join key dtype mismatch: {big_key!r} is {big_t} "
            f"but {small_key!r} is {small_t}; xxhash64 is type-sensitive, "
            f"so hashing mismatched sides drops matching rows (false "
            f"negatives) — cast one side first"
        )
    bloom = bloom_build(small, small_key, m_bits, k)
    candidates = bloom_prune(big, big_key, bloom, m_bits, k)
    return candidates.join(
        small.select(F.col(small_key).alias(big_key)).distinct(),
        on=big_key,
        how="left_semi",
    )
