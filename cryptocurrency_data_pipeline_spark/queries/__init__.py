"""Named query registry — the engine's public query surface.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered next to
its DuckDB oracle SQL.  The driver harness compares both at sf=0.01
(row-count + schema + order-insensitive value-hash), so every computed
column is aliased identically on both sides, dates/timestamps are emitted
as strings, and float aggregates are rounded on both sides to absorb
summation-order differences.

Queries map 1:1 onto SURVEY.md §2 operators; reference citations are in
each docstring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cryptocurrency_data_pipeline_spark.queries._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
    t,
)

# Part modules are imported in REGISTRATION ORDER — the mechanical
# driver-window sort (ordered_queries below) tie-breaks on registration
# index, so this sequence is part of the external contract.  Append new
# parts at the end; never reorder.  Pinned by tests/test_oracle_parity.py
# against tests/data_registry_order.json.
from cryptocurrency_data_pipeline_spark.queries import _part1  # noqa: E402,F401
from cryptocurrency_data_pipeline_spark.queries import _part2  # noqa: E402,F401
from cryptocurrency_data_pipeline_spark.queries import _part3  # noqa: E402,F401
from cryptocurrency_data_pipeline_spark.queries import _part4  # noqa: E402,F401
from cryptocurrency_data_pipeline_spark.queries import _part5  # noqa: E402,F401


# --------------------------------------------------------------------------
# Driver-harness ordering: least-externally-verified first.
#
# The external correctness gate hashes the first 50 ``queries()`` entries
# per round, while the registry holds far more — so ordering decides which
# queries get fresh external scrutiny each round.  The policy here is
# purely MECHANICAL and verification-maximizing: queries are sorted by
# (most recent driver-green round, number of driver-green rounds,
# registration order), computed from the CORRECTNESS_r*.json artifacts the
# driver itself writes.  Never-checked queries therefore always come
# first (their last round is 0, in registration order), then the
# longest-ago-checked — LEAST-RECENTLY-verified first, so no query's
# last external check can age indefinitely (the previous
# least-OFTEN-verified key let early-round core queries checked 3x in
# r1-r3 sit behind every count-2 query forever; recency is the staleness
# that matters).  Every query cycles through the external window over
# rounds, and nothing about the ordering depends on what any query is
# expected to score.
#
# Independently of the window, tests/test_oracle_parity.py replays the
# driver's exact rows/schema/hash comparison for EVERY oracle-backed
# query at sf0.001 on every pytest run, so each registered query carries
# a strict per-round correctness signal regardless of its position here.
# --------------------------------------------------------------------------


def _driver_green_history() -> dict[str, list[int]]:
    """Rounds in which each query was fully green (rows+schema+hash, no
    err) in the driver's own CORRECTNESS_r*.json artifacts.  Empty dict
    when no artifacts exist (fresh clone) — ordering then degrades to
    plain registration order."""
    import json
    import re
    from pathlib import Path

    hist: dict[str, list[int]] = {}
    # __init__.py lives at <repo>/cryptocurrency_data_pipeline_spark/queries/
    # — the artifacts sit at the repo root, three levels up.
    root = Path(__file__).resolve().parent.parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.stem)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                hist.setdefault(name, []).append(rnd)
    return hist


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry sorted least-RECENTLY-externally-verified first (see
    module note above): never-driver-checked queries lead in
    registration order (last round 0), then ascending (last checked
    round, times checked)."""
    hist = _driver_green_history()
    reg = {n: i for i, n in enumerate(QUERIES)}

    def key(name: str) -> tuple[int, int, int]:
        rounds = sorted(hist.get(name, []))
        return (rounds[-1] if rounds else 0, len(rounds), reg[name])

    return {n: QUERIES[n] for n in sorted(QUERIES, key=key)}
