"""Query/oracle registry primitives shared by every part module."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cryptocurrency_data_pipeline_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query and (optionally) its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


t = load_table


def _sweep_dead_fixture_dirs() -> None:
    """Reclaim temp fixture dirs left by DEAD driver sessions.

    Every fixture path in the registry is pid-scoped
    (``spark_graft_*_<pid>``, enforced by tests/test_registry_lint.py),
    which prevents cross-session races but means each session's own
    rmtree-at-query-start can never clean a PREDECESSOR's dirs — /tmp
    would grow by one orders-sized snapshot table per driver/bench run
    forever.  Sweeping at registry import caps that: any sibling dir
    whose pid suffix no longer names a live process is dead by
    construction (a live session's dirs are spared via os.kill(pid, 0)).

    The pid probe is only authoritative within ONE pid namespace: when
    /tmp is a volume shared across containers, a peer's live pid is
    invisible here and its fresh fixtures would read as dead.  The
    sweep therefore also requires the dir to be COLD — untouched for
    over an hour (any actively-used fixture dir's mtime is recent: the
    owner rmtree+recreates it at query start) — so a not-visible-but-
    live peer's working dirs survive; only genuinely abandoned ones go.
    """
    import os
    import re
    import shutil
    import tempfile
    import time

    root = tempfile.gettempdir()
    try:
        entries = os.listdir(root)
    except OSError:
        return
    now = time.time()
    for d in entries:
        m = re.fullmatch(r"spark_graft_.*_(\d+)", d)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            if now - os.stat(os.path.join(root, d)).st_mtime < 3600:
                continue  # warm: possibly a live peer in another pid ns
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        except Exception:
            # PermissionError: pid alive under another user.
            # OverflowError/ValueError: a foreign dir whose digit suffix
            # is not a real pid.  OSError from stat: dir vanished.
            # Either way: not provably dead — leave it, and never let
            # the sweep break the package import.
            pass


_sweep_dead_fixture_dirs()
