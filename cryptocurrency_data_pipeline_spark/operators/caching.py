"""Explicit cache-lifetime tracking for persisted intermediates.

Several operators ``persist()`` a multi-consumer intermediate (the
MinHash shingle frame, the SemDeDup normalized assignment, the DSIR tf
frame, the fuzzy q-gram frame).  For a one-shot query the ContextCleaner
reclaims those blocks at GC time, which is fine — but composed plans
(``plans/corpus.py``) and benchmark loops call these operators
repeatedly in one long-lived session, where lazily-reclaimed blocks
accumulate in the block manager.

This module is the eager-release discipline (the ``graph.py``
checkpoint-release pattern, generalized): operators register each
persisted frame via :func:`track`, and whoever owns the terminal action
calls :func:`release_all` afterwards.  Releasing is always SAFE —
``persist`` (unlike ``localCheckpoint``) keeps full lineage, so a
released frame silently recomputes if some caller re-uses it; the only
cost of over-releasing is recomputation, never a failure.

Entries are keyed by SparkContext *identity* so parallel sessions (or a
restarted context in tests) never release each other's blocks.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

#: (SparkContext, weakref-to-DataFrame) pairs whose ``persist()`` the
#: engine owns.  WEAK references on purpose: a strong module-global ref
#: would pin every tracked frame for the session lifetime, so a caller
#: that never invokes release_all could no longer rely on the
#: ContextCleaner-at-GC fallback — the module would worsen the very leak
#: it exists to fix.  A frame the caller dropped simply GCs (cleaner
#: reclaims its blocks) and its entry here goes dead.
_TRACKED: list[tuple[object, weakref.ReferenceType]] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted frame for later :func:`release_all`.

    Returns ``df`` unchanged so call sites stay one expression:
    ``track(frame.persist())``.
    """
    _TRACKED.append((df.sparkSession.sparkContext, weakref.ref(df)))
    return df


def release_all(spark=None) -> int:
    """Unpersist every tracked frame (non-blocking).

    With ``spark`` given, only frames belonging to that session's
    SparkContext are released (identity comparison); without it, all.
    Returns the number of frames released.  Frames whose context has
    already stopped are dropped from tracking without error.
    """
    target_sc = spark.sparkContext if spark is not None else None
    kept: list[tuple[object, weakref.ReferenceType]] = []
    released = 0
    for sc, ref in _TRACKED:
        if target_sc is not None and sc is not target_sc:
            kept.append((sc, ref))
            continue
        df = ref()
        if df is None:
            continue  # caller dropped it; ContextCleaner reclaimed at GC
        try:
            df.unpersist(False)
            released += 1
        except Exception:
            pass  # stopped context / already-released frame: nothing to free
    _TRACKED[:] = kept
    return released
