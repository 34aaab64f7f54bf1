"""Distributed time-series similarity search (PAA over z-normalized
series) — the EDBT'19 "time-series similarity for streaming data" /
REPOSE-family capability mapped onto DataFrames.

Pipeline: per-key ordered value series → z-normalization → Piecewise
Aggregate Approximation (PAA, Keogh et al.) → top-k nearest series per
probe by squared-L2 over the PAA sketches.  PAA is the classic
dimensionality reduction that LOWER-BOUNDS true z-normalized Euclidean
distance, so the sketch-space top-k is the standard candidate stage for
an exact re-rank (compose with a full-series distance when needed).

Engine-exactness: every floating step is an ELEMENT-ORDER fold over a
deterministically ordered array (``array_sort`` of (ts, id, value)
structs, then slice/aggregate), so mean, stddev, z-scores, PAA
segments, and distances are bit-identical in any engine that folds
lists in order — no rounding is needed until the output column.  The
series itself is built with ONE per-key shuffle; probes broadcast.

Scale shape: series live as arrays inside rows (bounded by per-key
cardinality — cap with a length guard upstream for adversarial keys);
the sketch join is |corpus| × |probes| with probes broadcast, identical
to the cosine_topk pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def value_series(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    min_len: int = 16,
) -> DataFrame:
    """Per-key ordered value series: ``(key, series array<double>, n)``.

    Ordering is total — (ts, id) — so ``array_sort`` over structs gives
    every engine the same element order; keys shorter than ``min_len``
    are dropped (a z-norm over a near-constant two-point series is
    noise, and the guard also bounds skew from hot keys)."""
    packed = df.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(id_col).alias("i"),
                    F.col(val_col).cast("double").alias("v"),
                )
            )
        ).alias("pts")
    )
    return (
        packed.select(
            key_col,
            F.transform(F.col("pts"), lambda p: p["v"]).alias("series"),
        )
        .withColumn("n", F.size("series"))
        .filter(F.col("n") >= min_len)
    )


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def znorm_frame(
    df: DataFrame,
    series_col: str = "series",
    n_col: str = "n",
    out: str = "z",
) -> DataFrame:
    """Z-normalize ordered series with element-order folds, STAGED as
    columns: the mean and stddev are computed once per row and the HOF
    lambdas only reference them as plain column refs — a mean inlined
    into the lambda body would re-evaluate its O(n) fold per element
    (no CSE inside HOF lambdas; see the winnowing notes in text.py).
    Constant series map to all-zeros instead of dividing by zero."""
    series = F.col(series_col)
    mu, sd = F.col("__mu"), F.col("__sd")
    return (
        df.withColumn("__mu", _fold_sum(series) / F.col(n_col))
        .withColumn(
            "__sd",
            F.sqrt(
                _fold_sum(F.transform(series, lambda x: (x - mu) * (x - mu)))
                / F.col(n_col)
            ),
        )
        .withColumn(
            out,
            F.when(
                sd > 0, F.transform(series, lambda x: (x - mu) / sd)
            ).otherwise(F.transform(series, lambda x: x * F.lit(0.0))),
        )
        .drop("__mu", "__sd")
    )


def paa(series: Column, n: Column, segments: int = 8) -> Column:
    """Piecewise Aggregate Approximation: ``segments`` means over the
    classic boundaries ``[floor(j*n/s), floor((j+1)*n/s))`` — an
    element-order slice-and-fold per segment."""

    def seg(j: Column) -> Column:
        lo = F.floor(j * n / segments).cast("int")
        hi = F.floor((j + 1) * n / segments).cast("int")
        width = hi - lo
        piece = F.slice(series, lo + 1, width)
        # Series shorter than ``segments`` produce empty slices (width 0);
        # emit NULL for those sketch elements instead of dividing by zero
        # (ANSI mode would raise, non-ANSI would yield NaN poison).
        return F.when(width > 0, _fold_sum(piece) / width)

    return F.transform(F.sequence(F.lit(0), F.lit(segments - 1)), seg)


def paa_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    key_col: str = "user_id",
) -> DataFrame:
    """Top-k nearest series per probe by squared-L2 over PAA sketches
    (the lower-bound candidate stage).  Probes broadcast; per-probe
    top-k via the standard rank window with ``(distance, key)``
    tie-break.  Expects ``(key, sketch)`` frames from ``paa``."""
    q = probes.select(
        F.col(key_col).alias("probe_id"), F.col("sketch").alias("qs")
    )
    dist = F.aggregate(
        F.zip_with(F.col("sketch"), F.col("qs"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("probe_id").orderBy("paa_dist", key_col)
    return (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(key_col) != F.col("probe_id"))
        .select(key_col, "probe_id", F.round(dist, 6).alias("paa_dist"))
        # A NULL sketch element (paa's zero-width-segment marker, e.g. a
        # series shorter than `segments`) nulls the whole distance; the
        # ascending sort would rank those NULLs FIRST, so null-poisoned
        # series would displace real neighbors at rn=1.  Incomparable
        # candidates are excluded, not ranked.
        .filter(F.col("paa_dist").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "probe_id",
            F.col(key_col).alias("neighbor_id"),
            "paa_dist",
            F.col("rn").alias("rank"),
        )
    )


#: SAX breakpoints for alphabet size 4: the N(0,1) quartile boundaries
#: (Lin et al., "A Symbolic Representation of Time Series").  Literals,
#: so any engine replays the discretization exactly.
SAX4_BREAKPOINTS = (-0.6745, 0.0, 0.6745)


def sax_word(sketch: Column) -> Column:
    """Symbolize a PAA sketch into a SAX word over alphabet {a,b,c,d}:
    each segment mean maps to its N(0,1) quartile bucket.  Equal-width
    IN PROBABILITY under the z-norm, so symbols are used evenly — the
    property that makes SAX words good hash keys.

    A SAX word is the time-series analogue of an LSH bucket: series
    sharing a word are candidate motifs/near-matches, found with a
    plain groupBy instead of any pairwise scan.

    A sketch containing any NULL segment (paa's zero-width marker) maps
    to a NULL word: every ``when`` condition is NULL-false, so the
    otherwise branch would silently symbolize an undefined segment as
    'd' (top quartile) and group incomparable short series with
    genuinely-high ones as false motif candidates."""
    lo, mid, hi = SAX4_BREAKPOINTS
    word = F.array_join(
        F.transform(
            sketch,
            lambda x: F.when(x < lo, F.lit("a"))
            .when(x < mid, F.lit("b"))
            .when(x < hi, F.lit("c"))
            .otherwise(F.lit("d")),
        ),
        "",
    )
    return F.when(
        F.exists(sketch, lambda x: x.isNull()), F.lit(None).cast("string")
    ).otherwise(word)
