"""Deterministic dataset splitting for training pipelines.

``DataFrame.randomSplit``/``rand()`` are retry-unstable: a recomputed task
re-rolls its random numbers, so a row can land in *both* train and test
across stage retries — silent eval contamination at cluster scale. The
deterministic equivalent hashes a stable row key and buckets on hex
prefixes: pure projection (no shuffle, no RNG state), identical on every
retry, every engine, every run, and trivially oracle-able.

Same regime as the md5-stratified sampler (``queries.stratified_sample_docs``);
no counterpart in the reference (its 100-row frames are never split).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 12/2/2 first-hex-char buckets → 75% / 12.5% / 12.5% expected split.
DEFAULT_SPLITS: Sequence[tuple[str, str]] = (
    ("train", "0123456789ab"),
    ("val", "cd"),
    ("test", "ef"),
)


def split_assignment(
    id_col: str | Column,
    splits: Sequence[tuple[str, str]] = DEFAULT_SPLITS,
) -> Column:
    """Expression mapping a stable id to its split name via the first hex
    character of ``md5(id)``. ``splits`` is ``[(name, hex_chars), ...]``
    and must cover all 16 characters."""
    cid = F.col(id_col) if isinstance(id_col, str) else id_col
    # Validate the 16-char contract up front: an uncovered (or
    # uppercase — md5 output is lowercase) hex char would silently
    # assign split=NULL and drop those rows from every split's
    # accounting; an overlap would double-assign by declaration order.
    seen: dict[str, str] = {}
    for name, chars in splits:
        for ch in chars:
            if ch not in "0123456789abcdef":
                raise ValueError(
                    f"split {name!r}: {ch!r} is not a lowercase hex char"
                )
            if ch in seen:
                raise ValueError(
                    f"hex char {ch!r} assigned to both {seen[ch]!r} and {name!r}"
                )
            seen[ch] = name
    missing = set("0123456789abcdef") - set(seen)
    if missing:
        raise ValueError(
            f"splits leave hex chars uncovered (rows would get split=NULL): "
            f"{sorted(missing)}"
        )
    h = F.substring(F.md5(cid.cast("string")), 1, 1)
    expr: Column | None = None
    for name, chars in splits:
        cond = h.isin(*list(chars))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assert expr is not None
    return expr


def assign_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, str]] = DEFAULT_SPLITS,
    split_name: str = "split",
) -> DataFrame:
    """Add a deterministic ``split`` column keyed on ``id_col``."""
    return df.withColumn(split_name, split_assignment(id_col, splits))


# --------------------------------------------------------------------------
# Corpus mixture sampling — downsample each source to its mixture weight
# (the "how much web vs books vs code" knob of a training-data recipe).
# Same determinism regime as the splitter: the keep decision hashes
# (source, id), so it is retry-stable, reproducible across engines, and
# exactly oracle-able.  The thresholds are integers against a 16-bit hash
# bucket (rate quantized to 1/65536), so there is no float boundary to
# disagree on.  Pure projection + filter: runs inside the scan stage.
# --------------------------------------------------------------------------


def mixture_bucket(id_col: str | Column, source_col: str | Column) -> Column:
    """Uniform 16-bit bucket from a framed hash of (source, id).

    Each field is hashed separately with a null marker before the outer
    md5: the naive ``md5(source || '|' || id)`` (a) NULLs out for a NULL
    source, so those rows are silently dropped at ANY rate (NULL <
    threshold is NULL-false), and (b) lets ``('a|b','c')`` collide with
    ``('a','b|c')``, perfectly correlating keep decisions that should be
    independent draws.  Oracle SQL mirrors the framing:
    ``md5((CASE WHEN source IS NULL THEN '0' ELSE '1' END) ||
    md5(coalesce(source,'')) || '1' || md5(CAST(id AS VARCHAR)))``."""
    cid = F.col(id_col) if isinstance(id_col, str) else id_col
    src = F.col(source_col) if isinstance(source_col, str) else source_col

    def framed(c: Column) -> Column:
        return F.concat(
            F.when(c.isNull(), F.lit("0")).otherwise(F.lit("1")),
            F.md5(F.coalesce(c.cast("string"), F.lit(""))),
        )

    h = F.md5(F.concat(framed(src), framed(cid)))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long")


def mixture_keep(
    id_col: str | Column, source_col: str | Column, rate: Column
) -> Column:
    """True for rows kept at ``rate`` (a [0,1] Column, e.g. a per-source
    weight looked up from the source name).

    The threshold uses an explicit ``floor``: Spark's ``cast('long')``
    truncates but DuckDB's ``CAST(x AS BIGINT)`` ROUNDS, so any rate that
    is not an exact multiple of 1/65536 (e.g. 0.1 -> 6553 vs 6554) would
    silently disagree with a round-tripping oracle. ``floor`` pins the
    same semantics on both engines; oracle SQL must mirror it as
    ``CAST(floor(rate * 65536) AS BIGINT)``."""
    threshold = F.floor(rate * F.lit(1 << 16)).cast("long")
    return mixture_bucket(id_col, source_col) < threshold


def md5_uniform(id_col: str | Column) -> Column:
    """Deterministic uniform in (0, 1): the first 8 md5 hex digits of the
    id, midpoint-shifted so the value is never exactly 0 or 1 — retry-
    stable and replayable in any engine with md5."""
    cid = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(cid.cast("string")), 1, 8), 16, 10).cast("double")
    return (h + F.lit(0.5)) / F.lit(float(1 << 32))


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sample without replacement, Efraimidis–Spirtes A-ES.

    Each row draws the deterministic uniform ``u = md5_uniform(id)`` and
    scores ``key = ln(u) / w``; the k LARGEST keys (equivalently the
    classic ``u^(1/w)`` formulation, log-transformed so the comparison is
    overflow-safe) are the sample — inclusion probability proportional to
    weight, no RNG state, identical on every retry.

    The selection is ``orderBy(key desc).limit(k)`` = TakeOrderedAndProject:
    each task forwards at most k survivors, the classic distributed
    reservoir.  Zero-or-negative weights are excluded (they cannot be
    sampled under A-ES).
    """
    keyed = (
        df.filter(weight > 0)
        .withColumn("__w", weight.cast("double"))
        .withColumn(
            "sample_key", F.round(F.log(md5_uniform(id_col)) / F.col("__w"), 9)
        )
        .drop("__w")
    )
    return keyed.orderBy(F.col("sample_key").desc(), F.col(id_col)).limit(k)


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    weight: Column,
    alpha: float = 0.3,
    token_budget: int | None = None,
) -> DataFrame:
    """Temperature-scaled source mixture (the multilingual-sampling rule,
    Conneau & Lample-style): ``p_s = n_s^alpha / sum_t n_t^alpha``.

    ``alpha < 1`` flattens the natural distribution, upsampling
    low-resource sources — the standard knob for balancing a multi-source
    pretraining mix.  When ``token_budget`` is given, each source also
    gets its integer token allocation and the implied epoch count
    (allocation / available), making >1 epochs on small sources explicit.

    Scale shape: one partial-agged shuffle to the per-source rollup;
    the unpartitioned window for the normalizer runs on the O(#sources)
    aggregate, never on row data.  The ``+ 1e-6`` inside floor() absorbs
    last-ulp ``pow`` differences across engines; oracle SQL mirrors it.
    """
    per = df.groupBy(source_col).agg(weight.cast("double").alias("n_tokens"))
    w_all = Window.partitionBy()
    pw = F.pow(F.col("n_tokens"), F.lit(float(alpha)))
    out = per.withColumn("p_raw", pw / F.sum(pw).over(w_all))
    if token_budget is not None:
        alloc = F.floor(F.col("p_raw") * F.lit(float(token_budget)) + F.lit(1e-6))
        out = (
            out.withColumn("target_tokens", alloc.cast("long"))
            .withColumn(
                # try_divide: a zero-token source has undefined epochs —
                # NULL, not an ANSI divide-by-zero that kills the job.
                "epochs",
                F.round(
                    F.try_divide(F.col("target_tokens"), F.col("n_tokens")), 4
                ),
            )
        )
    return (
        out.withColumn("p", F.round("p_raw", 6))
        .withColumn("n_tokens", F.col("n_tokens").cast("long"))
        .drop("p_raw")
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    weight: Column,
    token_budget: Column | int,
    epoch_cap: int = 3,
) -> DataFrame:
    """UniMax budget allocation (Chung et al., ICLR'23): spread a total
    token budget as evenly as possible across groups (languages), capped
    at ``epoch_cap`` epochs of any group's available tokens — the
    water-filling answer to temperature sampling's "how flat is fair".

    Closed form instead of the paper's iterative loop: sort groups by
    capped supply ``s = epoch_cap * n_tokens`` ascending; a group is
    **capped** (gets all of ``s``) iff ``s * (#groups from here on) +
    (supply already granted to smaller groups) <= budget``; every
    uncapped group gets the equal share of what the capped ones left
    behind.  All arithmetic is integer (floor division at the end), so
    any engine replays the allocation exactly.

    Scale shape: the only data-sized shuffle is the per-group rollup;
    the two windows (running prefix + grand totals) run on the
    O(#groups) aggregate, never on row data.  ``token_budget`` may be a
    Column so the budget can itself be derived from the rollup (e.g.
    half the total supply) without a driver round-trip.
    """
    budget = (
        F.lit(int(token_budget)).cast("long")
        if isinstance(token_budget, int)
        else token_budget.cast("long")
    )
    per = df.groupBy(group_col).agg(weight.cast("long").alias("n_tokens"))
    s = per.withColumn(
        "supply", (F.lit(int(epoch_cap)) * F.col("n_tokens")).cast("long")
    )
    asc = Window.partitionBy().orderBy("supply", group_col)
    w_all = Window.partitionBy()
    ranked = (
        s.withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__idx", F.row_number().over(asc))
        .withColumn(
            "__cum_prev",
            F.coalesce(
                F.sum("supply").over(asc.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0).cast("long"),
            ),
        )
        .withColumn("__budget", budget)
    )
    flagged = ranked.withColumn(
        "capped",
        F.col("supply") * (F.col("__n") - F.col("__idx") + 1) + F.col("__cum_prev")
        <= F.col("__budget"),
    )
    totals = flagged.withColumn(
        "__capped_sum",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("supply"))).over(w_all),
            F.lit(0).cast("long"),
        ),
    ).withColumn(
        "__n_uncapped",
        F.sum(F.when(~F.col("capped"), 1).otherwise(0)).over(w_all),
    )
    # ``__n_uncapped`` is 0 when the budget covers every group's capped
    # supply; the share value is unused for capped rows, but ANSI mode
    # evaluates the division anyway — clamp the denominator to 1.
    share = F.floor(
        (F.col("__budget") - F.col("__capped_sum"))
        / F.greatest(F.col("__n_uncapped"), F.lit(1))
    ).cast("long")
    return (
        totals.withColumn(
            "alloc_tokens",
            F.when(F.col("capped"), F.col("supply")).otherwise(share),
        )
        .withColumn(
            # try_divide: a zero-token group (e.g. a language whose docs
            # are all blank) has undefined epochs — NULL, not an ANSI
            # divide-by-zero that kills the job.
            "epochs",
            F.round(F.try_divide(F.col("alloc_tokens"), F.col("n_tokens")), 4),
        )
        .select(
            group_col, "n_tokens", "supply", "capped", "alloc_tokens", "epochs"
        )
    )
