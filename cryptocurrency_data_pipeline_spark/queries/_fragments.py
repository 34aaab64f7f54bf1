"""Shared DuckDB oracle SQL fragments.

The MinHash truth construction (whitespace shingle 3-grams -> md5 "hash
family" -> 8-slot one-permutation signature -> 4 two-slot LSH bands ->
banded candidate pairs) verifies ONE Spark operator
(``operators/dedup.py:minhash_near_dups``) but is needed by five oracles
across three part files.  Keeping the CTE text here means an edit to the
minhash oracle semantics changes every consumer at once instead of
requiring five synchronized copies (the drift hazard the PQ family
already solved with its shared codes-CTE constant).

The ``tk``/``sig``/``bands``/``cand`` CTE names are parameters because
``simhash_recall`` embeds the block alongside its own ``sig``/``cand``
CTEs and needs non-colliding names.  NOTE: the intermediate ``sh`` and
``hs`` CTEs are NOT parameterized — a composing oracle must not define
CTEs with those names (and the fragment can appear at most once per
statement).  The fragments are used inside f-string oracles, so callers
compose e.g. ``f"WITH {minhash_sig_ctes()}, {minhash_bands_cte()} ..."``.
"""


def minhash_sig_ctes(tk="tk", sig="sig"):
    """CTE chain ``tk -> sh -> hs -> sig``: tokenized shingle sets plus
    the 8-slot one-permutation MinHash signature per document.  Exposes
    ``hs(doc_id, s, hh)`` (the exact shingle set, for truth Jaccard) and
    ``sig(doc_id, sg)``."""
    return SIG_TEMPLATE.format(tk=tk, sig=sig)


def minhash_bands_cte(bands="bands", sig="sig"):
    """CTE ``bands(doc_id, band_key)``: 4 two-slot LSH band keys per
    signature ('~' fills null slots of short docs)."""
    return BANDS_TEMPLATE.format(bands=bands, sig=sig)


def minhash_cand_cte(cand="cand", bands="bands"):
    """CTE ``cand(a_id, b_id)``: distinct ordered candidate pairs that
    share at least one band key."""
    return CAND_TEMPLATE.format(cand=cand, bands=bands)


SIG_TEMPLATE = r'''{tk} AS (
      SELECT doc_id,
             coalesce(list_filter(string_split_regex(replace(lower(replace(text, 'İ', 'I')), 'ς', 'σ'), '[ \t\n\x0B\f\r]+'),
                                  t -> t <> ''), []) AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                            i -> array_to_string(toks[i:i+2], ' ')) AS tg
      FROM {tk}
    ), hs AS (
      SELECT doc_id, list_distinct(tg) AS s,
             list_transform(list_distinct(tg), x -> md5(x)) AS hh
      FROM sh
    ), {sig} AS (
      SELECT doc_id,
        [list_aggregate(list_filter(hh, h -> h[1:1] IN ('0','1')), 'min'),
         list_aggregate(list_filter(hh, h -> h[1:1] IN ('2','3')), 'min'),
         list_aggregate(list_filter(hh, h -> h[1:1] IN ('4','5')), 'min'),
         list_aggregate(list_filter(hh, h -> h[1:1] IN ('6','7')), 'min'),
         list_aggregate(list_filter(hh, h -> h[1:1] IN ('8','9')), 'min'),
         list_aggregate(list_filter(hh, h -> h[1:1] IN ('a','b')), 'min'),
         list_aggregate(list_filter(hh, h -> h[1:1] IN ('c','d')), 'min'),
         list_aggregate(list_filter(hh, h -> h[1:1] IN ('e','f')), 'min')] AS sg
      FROM hs
    )'''

BANDS_TEMPLATE = r'''{bands} AS (
      SELECT DISTINCT doc_id, band_key FROM (
        SELECT doc_id, unnest([
          '0' || '|' || coalesce(sg[1], '~') || '|' || coalesce(sg[2], '~'),
          '1' || '|' || coalesce(sg[3], '~') || '|' || coalesce(sg[4], '~'),
          '2' || '|' || coalesce(sg[5], '~') || '|' || coalesce(sg[6], '~'),
          '3' || '|' || coalesce(sg[7], '~') || '|' || coalesce(sg[8], '~')]) AS band_key
        FROM {sig})
    )'''

CAND_TEMPLATE = r'''{cand} AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM {bands} a JOIN {bands} b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    )'''


def finite_sql(expr: str) -> str:
    """DuckDB mirror of ``operators/quantize.py:finite``: true iff
    finite, NULL for NULL — so ``WHERE {finite_sql(x)}`` drops NULL /
    NaN / ±Inf identically on both engines."""
    return f"isfinite({expr})"


def cents_sql(expr: str, scale: int = 100) -> str:
    """DuckDB mirror of ``operators/quantize.py:cents``: NaN / ±Inf /
    int64-overflow magnitudes -> NULL, else ``floor(expr * scale)`` as
    BIGINT.  Both engines compare ``abs(expr)`` against the SAME double
    literal (``repr`` round-trips exactly), so the NULL sets are
    bit-identical.  ``expr`` may be any numeric SQL expression; it is
    referenced three times, so side-effect-free only (always true of
    column refs / arithmetic).  Pinned by tests/test_registry_lint.py:
    every floor-cents site in an oracle must carry this guard.
    """
    from cryptocurrency_data_pipeline_spark.operators.quantize import quantize_limit

    lim = repr(quantize_limit(scale))
    return (
        f"CASE WHEN isnan({expr}) OR abs({expr}) >= {lim} THEN NULL "
        f"ELSE CAST(floor({expr} * {scale}) AS BIGINT) END"
    )


#: RE2 whitespace class matching Java's \s EXACTLY (RE2's own \s lacks
#: the vertical tab).  Every oracle tokenization/normalization regex
#: must use this text, never a bare \s — pinned by
#: tests/test_registry_lint.py::test_oracle_token_mirrors_are_canonical.
WS_CLASS_SQL = r"[ \t\n\x0B\f\r]"


def fold_lower_sql(expr: str) -> str:
    """DuckDB mirror of ``operators/text.py:fold_lower`` — the
    cross-engine deterministic lowercase.  Java's full case mappings
    (Spark) and utf8proc's simple mappings (DuckDB) disagree on exactly
    two points, found by the sfuni fixture: U+0130 İ (Java → i+U+0307,
    utf8proc → i) and word-final Σ (Java Final_Sigma → ς, utf8proc →
    σ).  Both engines apply the same replace-lower-replace sandwich:
    İ→I before lowering, ς→σ after (Unicode case folding maps both
    sigmas to σ).  Every corpus-text ``lower(`` in an oracle must be
    this form, never a bare ``lower(`` — pinned by
    tests/test_registry_lint.py."""
    return f"replace(lower(replace({expr}, 'İ', 'I')), 'ς', 'σ')"


def tokens_sql(col="text"):
    """DuckDB mirror of ``operators/text.py:tokens``: whitespace split,
    fold-lowercased, with empty fragments dropped — so null/blank/odd-
    whitespace docs tokenize identically on both sides (len(NULL
    list) is NULL; wrap in coalesce(..., 0) where a count is needed)."""
    return (
        f"list_filter(string_split_regex({fold_lower_sql(col)}, "
        f"'{WS_CLASS_SQL}+'), t -> t <> '')"
    )


def epoch_sec_sql(expr: str) -> str:
    """DuckDB mirror of ``operators/quantize.py:epoch_sec``: exact
    FLOORED epoch seconds as BIGINT.  ``date_trunc`` floors in exact
    integer micros first, so ``epoch``'s double result is a whole
    second <= 2.54e11 — exactly representable, and the BIGINT cast is
    lossless even at 9999-12-31 23:59:59.999999 (where a bare
    ``floor(epoch(ts))`` rounds UP a whole second: 2.5e17 us exceeds
    the 2^53 double-integer range)."""
    return f"CAST(epoch(date_trunc('second', {expr})) AS BIGINT)"


def vec_sql(col: str = "embedding") -> str:
    """DuckDB mirror of ``similarity.as_double``'s element-completeness
    contract: a vector containing any NULL component collapses to a
    NULL vector (corrupt-decode residue; raw NULL elements would
    hard-error DuckDB's ``list_dot_product`` while Spark's lambda
    arithmetic null-propagates silently — sfnull class).  The NULL
    vector then rides the zero-norm guard on both engines.  Every
    embedding cast in an oracle must be this expression; pinned by
    tests/test_registry_lint.py."""
    return (
        f"CASE WHEN len(list_filter({col}, x -> x IS NULL)) = 0 "
        f"THEN CAST({col} AS DOUBLE[]) END"
    )
