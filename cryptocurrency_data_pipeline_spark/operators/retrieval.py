"""Hybrid retrieval: reciprocal-rank fusion of ranked lists.

RRF (Cormack et al. 2009, the standard public fusion rule) merges any
number of ranked retrieval lists without score calibration:
``rrf(d) = sum_lists 1 / (k + rank_list(d))``, k=60 by default.  It is
the default hybrid (BM25 + dense) combiner in every public search stack
precisely because it only consumes *ranks* — the lexical and dense score
scales never need to agree.

Spark shape:

* Each input list arrives already truncated to its top-n (the producers
  use ``orderBy().limit()`` = TakeOrderedAndProject, so no global sort
  materializes; the rank window then runs over n rows only — the
  ivf-seeding pattern).
* Fusion is a FULL outer join on the doc key over lists of n rows each —
  broadcast-sized by construction — followed by a map-only score.
  Missing ranks contribute 0 (the document simply wasn't in that list's
  top-n); the emitted rank sentinel for "absent" is 0 so the output stays
  non-null integer on every engine.

Reference counterpart: none; composes the engine's own BM25
(text.bm25_rank) and cosine (similarity.cosine) rankers into the RAG
retrieval front-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_topn(
    scored: DataFrame, score_col: str, id_col: str, n: int, rank_name: str
) -> DataFrame:
    """(id, rank 1..n) of the top-n by (score desc, id asc).

    ``orderBy().limit(n)`` compiles to TakeOrderedAndProject; the
    row_number window then only ever sees n rows.  Scores should be
    pre-rounded by the caller so rank order is engine-reproducible.

    Key-uniqueness contract: ``scored`` must carry ONE row per id (it
    is a per-id scoring, normally the output of a groupBy) — a
    duplicated id would occupy multiple rank slots and crowd real
    results out of the top-n.  Every in-repo caller scores through an
    id-keyed aggregation, which enforces this by construction.
    """
    top = scored.orderBy(F.col(score_col).desc(), F.col(id_col).asc()).limit(n)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return top.withColumn(rank_name, F.row_number().over(w).cast("long")).select(
        id_col, rank_name
    )


def rrf_fuse(
    lists: list[DataFrame], id_col: str, rank_cols: list[str], k: int = 60
) -> DataFrame:
    """Fuse ranked lists by reciprocal-rank: id, each rank (0 = absent),
    and ``rrf_score`` rounded to 6 dp.

    Key-uniqueness contract: each list must carry one row per id (true
    for :func:`ranked_topn` outputs — a row_number can't repeat); a
    duplicated id would fan out through the full-outer join chain."""
    fused = lists[0]
    for nxt in lists[1:]:
        fused = fused.join(nxt, id_col, "full")
    score = None
    for rc in rank_cols:
        term = F.coalesce(1.0 / (F.lit(k) + F.col(rc)), F.lit(0.0))
        score = term if score is None else score + term
    return fused.select(
        id_col,
        *[F.coalesce(F.col(rc), F.lit(0)).cast("long").alias(rc) for rc in rank_cols],
        F.round(score, 6).alias("rrf_score"),
    )
