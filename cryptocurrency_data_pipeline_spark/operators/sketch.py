"""Count-min sketch: fixed-size frequency estimation for unbounded key
domains.

Counting term frequencies over a 100 TB corpus with an exact
``groupBy(term)`` shuffles one row per distinct term — the state grows
with the vocabulary. A count-min sketch caps the state at ``depth ×
width`` cells no matter how many distinct keys exist: each key increments
one cell per depth row (an independent hash), and a key's estimate is the
MIN of its cells — an overestimate by construction (collisions only ever
add), never an underestimate, with error ≤ 2N/width at probability
1 − (1/2)^depth (Cormode & Muthukrishnan, J. Algorithms 2005).

Spark rendering: the sketch IS a DataFrame of ``(d, cell, cnt)`` rows —
``explode`` the per-key cell list, ``groupBy(d, cell)``. The groupBy's
map-side partial aggregation collapses every partition to ≤ depth×width
rows before the exchange, so the shuffle moves O(depth × width ×
partitions) rows regardless of corpus size — that bounded shuffle is the
whole point at scale. Estimation joins keys back on their cells and takes
``min(cnt)``.

Cells are md5-derived (cell = first ``hex_chars`` hex digits of
``md5("<d>_<key>")``), so the sketch replays bit-for-bit in any engine
with md5 — the same determinism regime as the SRP/IVF oracles
(``operators/similarity.py``).

No counterpart in the reference (its DQ layer counts exactly at 100-row
scale — ``glue/data_quality_pydeequ.py:74``); this is the
sketch-not-scan regime those metrics need at training-corpus scale,
complementing the HLL distinct-count path (``queries.hll_weekly_users``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default geometry: 4 independent hash rows × 16^3 cells.  Width uses
#: whole hex digits so the cell key is a plain md5 prefix (no hex→int
#: conversion, which keeps the DuckDB oracle trivial).
DEPTH = 4
HEX_CHARS = 3


def cell_key(key: Column, d: int, hex_chars: int = HEX_CHARS) -> Column:
    """Cell id of ``key`` in depth row ``d``: md5 prefix of ``"<d>_<key>"``."""
    return F.substring(
        F.md5(F.concat_ws("_", F.lit(str(d)), key.cast("string"))), 1, hex_chars
    )


def cms_build(
    keyed: DataFrame,
    key_col: str = "key",
    depth: int = DEPTH,
    hex_chars: int = HEX_CHARS,
) -> DataFrame:
    """Aggregate a key-per-row frame into sketch cells ``(d, cell, cnt)``.

    Output is at most ``depth × 16^hex_chars`` rows; the map-side combine
    bounds the shuffle to that many rows per input partition.
    """
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), cell_key(key, d, hex_chars).alias("cell"))
            for d in range(depth)
        ]
    )
    return (
        keyed.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = DEPTH,
    hex_chars: int = HEX_CHARS,
    est_name: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch: per key, ``min(cnt)`` over its depth cells.

    ``keys`` is expected to be small (the heavy-hitter candidates), so it
    broadcasts against the ≤ depth×16^hex_chars-row sketch; a key whose
    cells are all absent from the sketch was never counted → estimate 0.
    """
    key = F.col(key_col)
    probes = keys.withColumn(
        "__probe",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cell_key(key, d, hex_chars).alias("cell")
                    )
                    for d in range(depth)
                ]
            )
        ),
    )
    joined = probes.join(
        sketch,
        (probes["__probe.d"] == sketch["d"]) & (probes["__probe.cell"] == sketch["cell"]),
        "left",
    )
    group_cols = [c for c in keys.columns]
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_name)
    )
