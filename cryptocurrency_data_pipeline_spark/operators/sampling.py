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

from pyspark.sql import Column, DataFrame
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
