"""Text-analysis operators for the LLM-data-pipeline surface.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs: at 100 TB these run inside the
parquet scan stage with zero serialization cost.

Operators: tokenization, token/char stats, quality scoring (length/punct/
stopword ratios), marker-word language ID, md5 document fingerprinting,
word n-gram shingling (feeds the dedup family in ``dedup.py``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Marker words per language for the voting heuristic.  Real pipelines use
#: char-n-gram models; the interface is the same — a deterministic
#: text → lang expression.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "und", "das"),
    "es": ("el", "los", "y"),
    "zh": ("的", "是", "了"),
}

STOPWORDS = ("a", "the", "of", "and")


def _isin_any(values: tuple[str, ...]):
    """Closure factory for HOF predicates — a default-argument lambda is
    introspected by PySpark as a two-variable lambda and rejected."""

    def pred(x: Column) -> Column:
        return x.isin(*values)

    return pred


#: The EXPLICIT whitespace class shared by tokens() and its oracle
#: mirror.  Java's \s is [ \t\n\x0B\f\r] but RE2's (DuckDB) excludes
#: \x0B — a vertical tab (common in bad PDF extractions) would
#: tokenize differently per engine under a bare \s.  Spelling the class
#: out is semantics-preserving on the Java side and pins RE2 to it.
WS_CLASS = r"[ \t\n\x0B\f\r]+"


def fold_lower(col: str | Column) -> Column:
    """Cross-engine deterministic lowercase (the case-FOLD answer to
    the two code points where Java's full case mappings and utf8proc's
    simple mappings disagree — found by the sfuni fixture, which broke
    9 oracles through one ``lower('İstanbul')``):

    * **U+0130 İ**: Java (Spark, SpecialCasing.txt) lowers to
      ``i``+U+0307 (2 code points); utf8proc (DuckDB, UnicodeData
      simple map) lowers to plain ``i``.  Pre-translating İ→I makes
      both engines produce ``i``.
    * **word-final Σ**: Java applies the Final_Sigma condition (→ ς);
      utf8proc always gives σ.  Post-translating ς→σ converges both —
      and matches Unicode case folding, which maps BOTH sigmas to σ
      (so pre-existing lowercase ς in Greek text folds too, on both
      engines).

    Every other code point lowers via the same UnicodeData simple map
    in both engines.  Oracle mirror:
    ``queries/_fragments.py:fold_lower_sql`` — a replace-lower-replace
    sandwich, pinned by the sfuni parity gate.

    Engine-side this is ONE pre-lower translate, not the sandwich: Σ is
    the only code point Java lowers to ς (Final_Sigma) and nothing else
    lowers to İ/Σ/ς, so mapping all three before ``lower`` is exactly
    equivalent to İ-pre + ς-post — and saves a full O(n) pass over
    every tokenized string (the r12 two-translate form cost ×1.3–1.55
    on the text family; A/B in BASELINE.md r13).  Equivalence is pinned
    point-by-point in tests/test_query_uni_parity.py."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.translate(c, "İΣς", "Iσσ"))


def fold_lower_py(s: str) -> str:
    """Python twin of :func:`fold_lower` for Arrow-batch (pandas) code
    paths — Python ``str.lower`` uses the same full mappings as Java,
    so it needs the identical two-point fold."""
    return s.replace("İ", "I").lower().replace("ς", "σ")


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization (lowercased).

    Blank-safe for EVERY whitespace shape: null, empty, and
    whitespace-only text all yield ``[]``, and text with leading
    whitespace yields no phantom ``''`` first token.  ``trim`` strips
    only ASCII spaces, so the earlier trim-then-split form left ``['',
    '']`` for tab/newline-only docs and ``['', 'word', ...]`` for
    newline-led docs — phantom tokens that count, hash into real
    feature buckets, and give blank docs nonzero embeddings.  This IS
    split-then-drop-empties, literally: one split, then
    ``array_remove(…, '')`` — a single regex pass over the text
    (splitting on ``WS_CLASS`` can only mint ``''`` at the edges, so
    removing them equals edge-stripping first), O(tokens) cleanup, and
    the whole expression stays inside whole-stage codegen (an
    ``F.filter`` HOF lambda is CodegenFallback and would run this hot
    path interpreted; the round-8 strip-edges-regexp form paid a SECOND
    full-text regex pass — the round-9 bench diagnosis).  (DuckDB's
    ``string_split_regex`` has the same artifact; the oracle mirror is
    ``queries/_fragments.py:tokens_sql`` — both sides split on the
    explicit ``WS_CLASS``, never a bare ``\\s``, because Java's ``\\s``
    includes the vertical tab and RE2's does not.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNotNull(), F.array_remove(F.split(fold_lower(c), WS_CLASS), "")
    ).otherwise(F.array().cast("array<string>"))


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def bigrams(toks: Column) -> Column:
    """Adjacent-token bigrams ("a b") from an already-projected token array.

    Built with ``zip_with`` over two ``slice`` views so the token array
    never appears inside a lambda body — Catalyst does no CSE inside HOF
    lambdas, and a raw array expression referenced per-element degenerates
    to O(len²) (see the winnowing notes at ``_winnow_udf``). Takes a
    Column (stage ``tokens()`` into a select first) so the tokenization
    isn't re-inlined three times either.
    """
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_count(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def char_array(col: str | Column = "text") -> Column:
    """The text as an array of CODEPOINT strings, built once per row —
    the linear-time replacement for per-position ``substring`` scans.

    ``posexplode(sequence(1, length)) … substring(_t, p, 1)`` carries
    the FULL parent text on every exploded row (Generate copies parent
    columns into each output row), so a 150 KB document pays
    150k × 150 KB of row-copy churn — O(n²) bytes, measured at ~190 s
    for 24 such docs (sfbig, tools/make_big_sf.py) where the linear
    form takes seconds.  And substring-inside-transform is no better:
    ``UTF8String.substring`` seeks code points from the string start,
    so the in-row loop is O(n²) CPU.  Splitting once and exploding (or
    slicing) the small array is O(n).

    The split pattern ``(?s)(?<=.)`` cuts after every code point — Java
    regex ``.`` matches a full surrogate pair, so astral chars (🌍) and
    combining marks come out exactly as ``substring(text, p, 1)`` would
    produce them (verified element-equal including CJK/astral/combining
    inputs).  The ``(?s)`` DOTALL flag is load-bearing: without it ``.``
    skips line terminators, so a ``\\n`` never ends a lookbehind match
    and silently fuses with its neighbor (caught by the sfedge
    newline-led document).  Java's zero-width final match appends one
    trailing ``''``; the ``slice(…, 1, length)`` trims it, and doubles
    as the empty-text guard (slice of length 0 is an empty array, where
    bare split('') would yield [''])."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.split(c, r"(?s)(?<=.)"), F.lit(1), F.length(c))


def stopword_ratio(col: str | Column = "text") -> Column:
    """Fraction of tokens that are stopwords; 0.0 for blank docs (the
    unguarded 0/0 is null — a silent row-dropper in downstream filters —
    or DIVIDE_BY_ZERO under ANSI mode)."""
    toks = tokens(col)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: str | Column = "text") -> Column:
    """Fraction of characters that are punctuation; 0.0 for empty text
    (same zero-denominator guard as :func:`stopword_ratio`)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    return F.when(
        F.length(c) > 0, (F.length(c) - F.length(stripped)) / F.length(c)
    ).otherwise(F.lit(0.0))


def nonspace_chars(col: str | Column = "text") -> Column:
    """Total characters across tokens == length of the normalized text with
    all whitespace removed — one regexp instead of a per-token HOF pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(fold_lower(F.trim(c)), r"\s+", ""))


def avg_token_len(col: str | Column = "text") -> Column:
    n = F.size(tokens(col))
    return F.when(n > 0, nonspace_chars(col) / n).otherwise(F.lit(0.0))


def quality_score(col: str | Column = "text") -> Column:
    """Composite [0,1] quality score: long enough, low punctuation, sane
    stopword density — the standard cheap pre-filter for LLM corpora.
    Blank/null docs score 0.0 outright: letting the components run on a
    tokenless doc yields a misleading mid-range composite (and nulls
    that silently drop the row from ``score > x`` filters instead of
    scoring it low)."""
    length_ok = F.least(char_count(col) / F.lit(200.0), F.lit(1.0))
    punct_ok = 1.0 - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    stop = stopword_ratio(col)
    stop_ok = 1.0 - F.least(F.abs(stop - 0.1) * 2.0, F.lit(1.0))
    return F.when(
        F.size(tokens(col)) > 0, (length_ok + punct_ok + stop_ok) / 3.0
    ).otherwise(F.lit(0.0))


def lang_id(col: str | Column = "text", toks: Column | None = None) -> Column:
    """Marker-word vote: score = occurrences of each language's markers;
    highest score wins, ties broken by fixed language order ('en' first).
    Returns 'und' when no marker matches.  Pass ``toks`` to reuse an
    already-tokenized array column."""
    if toks is None:
        toks = tokens(col)
    # One struct per language, compared lexicographically by array_max:
    # score first, then -declaration-index (so ties go to the earliest
    # declared language, 'en' first).  Each score subtree appears exactly
    # once — the earlier chained-when formulation duplicated every score
    # O(langs) times and dominated codegen compile time.
    entries = []
    for i, (lang, markers) in enumerate(LANG_MARKERS.items()):
        score = F.size(F.filter(toks, _isin_any(markers)))
        entries.append(
            F.struct(score.alias("s"), F.lit(-i).alias("p"), F.lit(lang).alias("l"))
        )
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(col: str | Column = "text") -> Column:
    """Normalized md5 document fingerprint: lowercase, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(fold_lower(F.trim(c)), r"\s+", " "))


#: BPE-ish pre-tokenizer: English contraction suffixes, letter runs, digit
#: runs, punctuation runs — the GPT-2 pre-split shape, restricted to a
#: lookahead-free pattern so Java regex (Spark) and RE2 (DuckDB/oracle)
#: agree match-for-match.
#: The whitespace exclusion is the explicit WS_CLASS body, not \s —
#: see WS_CLASS (RE2's \s lacks \x0B, so the oracle twin must spell it).
BPE_SPLIT = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]+"


def bpe_token_count(col: str | Column = "text") -> Column:
    """Subword-ish token count via the BPE pre-split regex (F.regexp_count
    is JVM-side — no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(fold_lower(c), F.lit(BPE_SPLIT))


def normalize(col: str | Column = "text") -> Column:
    """Canonical text form shared by fingerprints: lowercase + collapsed
    whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(fold_lower(F.trim(c)), r"\s+", " ")


def winnow_fingerprints(
    df: DataFrame,
    col: str = "text",
    k: int = 8,
    w: int = 4,
    out: str = "fingerprints",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03) as a
    staged column pipeline.

    Char ``k``-grams of the normalized text are hashed with md5; each
    window of ``w`` consecutive gram hashes contributes its minimum, and
    the distinct minima are the document's fingerprint set.  Lexicographic
    min over hex digests keeps the whole construction in built-in JVM
    expressions and replayable in ANSI SQL (same trick as the OPH MinHash
    in ``dedup.py``).  Guarantees a shared fingerprint for any match of
    length ≥ w+k-1 — the local-sampling property that makes near-dup
    detection robust to position shifts, at ~1/w the hash volume.

    Implementation is an Arrow-batched pandas UDF, deliberately NOT nested
    JVM higher-order functions: an expression referenced inside a HOF
    lambda is re-evaluated PER ELEMENT (no CSE inside lambdas), and even
    when staged as columns the optimizer can re-inline the projection
    across a later Generate/explode — jstack showed the normalization
    regex running inside the gram transform, O(len²-len³) interpreted.
    Python md5/min over each text is deterministic, byte-identical to the
    SQL formulation (hex md5, lexicographic min), and map-only — the 100 TB
    plan is a pure scan→ArrowEval stage with no shuffle.
    """
    # Spread the scan BEFORE the UDF pass (re-measured r15 under the
    # cache-hermetic harness): the r14 removal A/B read "0.78 s unspread
    # vs 1.3 spread", but those timed passes never ran the UDF — the
    # warm-up's persisted fingerprint frame was substituted by
    # CacheManager plan equality.  Hermetically the UDF pass is ~4.5 s
    # SERIAL per winnow_near_dups pass at sf0.1 (md5 per gram position,
    # profile: 1-task stage, wall 4.6 s / JVM cpu 0.3 s); 32-way it is
    # embarrassingly parallel.  Identity on at-scale inputs.
    from cryptocurrency_data_pipeline_spark.operators.skew import (
        spread_small_scan,
    )

    # asNondeterministic (guide §4.4): callers explode the fingerprint
    # array, and InferFiltersFromGenerate infers `size(out) > 0 AND
    # isnotnull(out)` which the optimizer pushes below the spread
    # exchange — DUPLICATING the ArrowEvalPython so the whole md5 pass
    # ran twice, once serially below the repartition (r15 profile: a
    # 1-task 3.1 s stage with 0.15 s JVM cpu feeding the 32-task pass).
    # The function is pure; the marker only forbids the optimizer to
    # clone or reorder it.  Plan after: ONE ArrowEvalPython, above the
    # round-robin exchange.
    return spread_small_scan(df).withColumn(
        out, _winnow_udf(k, w).asNondeterministic()(F.col(col))
    )


def _winnow_udf(k: int, w: int):
    """Build the winnowing pandas UDF lazily (return-type parsing needs an
    active SparkSession)."""
    import hashlib
    import re as _re

    from pyspark.sql.functions import pandas_udf

    # ASCII \s + space-only strip, NOT Python defaults: Java/RE2 \s is
    # [ \t\n\x0B\f\r] and SQL trim() strips only spaces, while Python's
    # unicode-aware \s and str.strip() also eat U+00A0/U+2028/leading
    # tabs — a doc with any of those would fingerprint differently here
    # than in the SQL replay the docstring promises byte-identity with.
    ws = _re.compile(r"\s+", _re.ASCII)

    from collections import deque

    md5 = hashlib.md5

    @pandas_udf("array<string>")
    def fps(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            if txt is None:
                out.append([])
                continue
            norm = ws.sub(" ", fold_lower_py(txt.strip(" ")))
            # Slice CODEPOINTS (SQL substr semantics), encode per gram; min
            # over raw digests == min over hexdigests (hex preserves byte
            # order), so hex only the selected minima.
            hs = [
                md5(norm[i : i + k].encode()).digest()
                for i in range(len(norm) - k + 1)
            ]
            mins = set()
            dq: deque = deque()  # monotonic queue: O(n) sliding min
            for i, h in enumerate(hs):
                while dq and hs[dq[-1]] >= h:
                    dq.pop()
                dq.append(i)
                if dq[0] <= i - w:
                    dq.popleft()
                if i >= w - 1:
                    mins.add(hs[dq[0]])
            out.append(sorted(m.hex() for m in mins))
        return pd.Series(out)

    return fps


def shingles(
    col: str | Column = "text", n: int = 3, toks: Column | None = None
) -> Column:
    """Word n-gram shingles as an array<string> (input to MinHash/Jaccard).

    Pass ``toks`` as a *bound column* (stage it with ``withColumn`` first)
    on hot paths: a raw token-array expression referenced inside the HOF
    lambda would re-tokenize per element, O(len²).  The trailing slice
    drops incomplete windows (and yields [] for docs shorter than n —
    avoiding the sequence(1,0) descending-sequence trap).
    """
    if toks is None:
        toks = tokens(col)

    def sh(x: Column, i: Column) -> Column:
        # concat_ws skips nulls from get() past the end; those incomplete
        # trailing windows are cut off by the slice below.
        return F.concat_ws(" ", x, *[F.get(toks, i + j) for j in range(1, n)])

    return F.slice(
        F.transform(toks, sh), 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))
    )


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document stat columns.

    Staged projections materialize the token array and the two expensive
    ratios once, then derive the composite score from the stored columns —
    without this, every stat re-tokenizes and the quality score re-runs the
    regex pipeline (measured 3× slower at sf0.1).
    """
    from cryptocurrency_data_pipeline_spark.operators.skew import (
        spread_small_scan,
    )

    c = F.col(col)
    toks = F.col("__toks")
    # The tokenize+ratio map is the operator's whole cost: never run it
    # serially behind a single-row-group scan (identity on big inputs).
    staged = spread_small_scan(df).withColumn("__toks", tokens(col)).select(
        "*",
        F.size(toks).alias("n_tokens"),
        F.length(c).alias("n_chars_computed"),
        F.when(
            F.size(toks) > 0,
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))) / F.size(toks),
        ).otherwise(F.lit(0.0)).alias("__stop_ratio"),
        F.when(
            F.length(c) > 0,
            (F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", "")))
            / F.length(c),
        ).otherwise(F.lit(0.0)).alias("__punct_ratio"),
        lang_id(col, toks=toks).alias("lang_pred"),
        fingerprint(col).alias("fingerprint"),
    )
    length_ok = F.least(F.col("n_chars_computed") / F.lit(200.0), F.lit(1.0))
    punct_ok = 1.0 - F.least(F.col("__punct_ratio") * 5.0, F.lit(1.0))
    stop_ok = 1.0 - F.least(F.abs(F.col("__stop_ratio") - 0.1) * 2.0, F.lit(1.0))
    return staged.select(
        "*",
        F.round(
            F.when(
                F.col("n_tokens") > 0, nonspace_chars(col) / F.size(toks)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
        F.round(F.col("__stop_ratio"), 6).alias("stopword_ratio"),
        F.round(F.col("__punct_ratio"), 6).alias("punct_ratio"),
        # Blank/null docs score 0.0 — see quality_score().
        F.round(
            F.when(
                F.col("n_tokens") > 0, (length_ok + punct_ok + stop_ok) / 3.0
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("quality_score"),
    ).drop("__toks", "__stop_ratio", "__punct_ratio")


def term_doc_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-(doc, token) term frequencies: explode → two-level count.

    Scale shape: the (id, token) groupBy's partial aggregate collapses
    each document's repeats map-side BEFORE the shuffle (a doc's rows are
    map-local post-explode), so shuffle traffic is per-doc vocabulary,
    not raw token occurrences.  Measured NOT to want spread_small_scan
    (r15 interleaved hermetic A/B: tfidf 1.63 s unspread vs 1.82 spread,
    vocab 0.68 vs 0.85 — the tokenize explode is too cheap to pay the
    repartition; contrast the winnow md5 pass, where spread wins 3×).
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    return tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))


def vocab_stats(counts: DataFrame) -> DataFrame:
    """Corpus vocabulary from ``term_doc_counts`` output: one token-keyed
    shuffle producing term_freq (total occurrences) and doc_freq (docs
    containing the token — a plain count, no countDistinct expand, because
    the input is already one row per (doc, token))."""
    return counts.groupBy("token").agg(
        F.sum("tf").alias("term_freq"), F.count(F.lit(1)).alias("doc_freq")
    )


def tfidf(counts: DataFrame, n_docs_df: DataFrame) -> DataFrame:
    """Smoothed TF-IDF per (doc, token): tf · (ln((1+N)/(1+df)) + 1).

    ``n_docs_df`` is a 1-row frame with column ``n_docs`` (kept in-plan —
    broadcast into the fact instead of a driver-side collected constant).
    The vocab side of the token join is ≪ the counts side (distinct
    tokens vs doc×token rows); AQE broadcasts it when it fits.
    """
    df_stats = vocab_stats(counts).select("token", "doc_freq")
    return (
        counts.join(df_stats, "token")
        .crossJoin(F.broadcast(n_docs_df))
        .withColumn(
            "score",
            F.col("tf")
            * (
                F.log((1 + F.col("n_docs")) / (1 + F.col("doc_freq")))
                + F.lit(1.0)
            ),
        )
    )


# --------------------------------------------------------------------------
# PII redaction — regex scrub of emails / SSNs / phones / IPs before a
# corpus ships to training.  The SSN/phone/IP patterns are shared
# verbatim with the RE2 oracle; the email pattern opens with a CONSUMING
# boundary group ``(^|[^A-Za-z0-9._%+-])`` that is mirrored verbatim in
# the oracle (RE2 supports capture groups; it does NOT support
# lookbehind, and a Java-only lookbehind is not match-identical anyway:
# after a match ends, a second email starting at the very next offset —
# ``a@b.com_x@y.com`` — is visible to a plain scan but rejected by the
# lookbehind, which sees the PRIOR MATCH's trailing TLD letter).  With
# the same consumed-prefix pattern on both engines, Java and RE2 agree
# match-for-match by construction, and the replacement re-emits the
# boundary char via a backreference ($1 in Java, \1 in RE2).
#
# The boundary group also keeps Java linear on letter runs: the
# backtracking engine re-scans a run from every interior offset, and the
# greedy local-part ``+`` made each such start O(run) — O(run²) per run;
# the sfbig 60,000-char single token turned the whole query into 52 s of
# email-pattern churn where RE2 (linear) took 0.0 s.  With the boundary
# group every interior offset dies in one class test (the consumed char
# is itself in the local-part class).  The other patterns open with
# ``\d``/``\+`` and already fail interior-of-run starts in one
# comparison.  Parity across all scale points pins the equivalence.
#
# All patterns remain lookaround-free and anchored to literal structure,
# the whole pass is chained JVM regexp_replace — scan-stage, no UDF, no
# shuffle at any scale.  Counts are measured on the ORIGINAL text (one
# regexp_count per type); redaction applies the patterns in declaration
# order, which is chosen so no earlier replacement can create or destroy a
# later match (emails are consumed before their digit runs could feed the
# IP pattern, SSNs before the phone pattern's digit groups).
# --------------------------------------------------------------------------

#: (type, pattern, replacement), applied top-to-bottom.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     r"(^|[^A-Za-z0-9._%+-])[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "$1[EMAIL]"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "[SSN]"),
    ("phone", r"\+\d{1,2}[- ]\d{3}-\d{4}", "[PHONE]"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
)


def pii_counts(col: str | Column = "text") -> list[tuple[str, Column]]:
    """Per-type match counts on the un-redacted text."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        (name, F.regexp_count(c, F.lit(pat))) for name, pat, _ in PII_PATTERNS
    ]


def redact_pii(col: str | Column = "text") -> Column:
    """Text with every PII_PATTERNS match replaced by its placeholder."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


# --------------------------------------------------------------------------
# Fixed-window document chunking — the context-window preprocessing step:
# overlapping character spans of ``size`` every ``stride``.  Start
# positions come from one sequence() build per row (simple arithmetic
# expression — safe outside the HOF-lambda re-evaluation trap), then a
# single posexplode; the substring projection runs after the explode as a
# plain per-row expression.  Coverage invariant: the last start exceeds
# len - size, so every character lands in at least one chunk and the
# final chunk is the only one that may run short.
# --------------------------------------------------------------------------


def chunk_starts(col: str | Column, size: int, stride: int) -> Column:
    """1-based start positions: 1, 1+stride, ... up to
    max(len - (size - stride), 1)."""
    if not 0 < stride <= size:
        raise ValueError("need 0 < stride <= size")
    c = F.col(col) if isinstance(col, str) else col
    stop = F.greatest(F.length(c) - F.lit(size - stride), F.lit(1))
    return F.sequence(F.lit(1), stop, F.lit(stride))


def chunk_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 100,
    stride: int = 80,
    segment_chunks: int = 1024,
) -> DataFrame:
    """One row per (doc, chunk): ``id_col, pos, chunk`` with ``pos`` the
     1-based start offset (chunk index == (pos-1)/stride).

    Null text is treated as empty: the doc still emits its single
    (pos=1, chunk='') row.  Without the coalesce, chunk_starts(null) is
    null and the explode silently erases the document from the output —
    a no-silent-row-loss violation for any caller that joins chunks
    back against the corpus."""
    # Plan-shape note (sfbig, measured): an explode carries its parent
    # onto every generated row, so exploding chunk starts directly over
    # the full text copies n/stride × n chars — O(n²/stride) bytes per
    # doc.  Below ~1 MB/doc that memcpy-heavy whole-stage-codegen plan
    # beats both measured alternatives on the 150 KB sfbig giants
    # (in-row transform+substr: 7.9 s vs 2.8 s; once-split chars array:
    # 5.5 s) — but at 10 MB/doc the quadratic term is unusable, and r11
    # relied on an UNENFORCED "cap upstream" note.  The guard is now
    # structural: docs are first cut into overlapping SEGMENTS of
    # ``segment_chunks`` chunk-starts each (segment length
    # segment_chunks*stride + (size - stride), so every chunk is fully
    # contained in its segment), and the chunk explode runs over the
    # bounded segment.  Copy cost: O(n²/S) for the segment explode +
    # O(n·S/stride) for the chunk explode — linear in n for fixed
    # S = segment_chunks*stride (~84 MB per MB of text at the
    # defaults), no knee at any document size.  Docs that fit one
    # segment (every start ≤ S ⇔ n ≲ 82 KB at the defaults) keep the
    # EXACT r11 plan: one segment row carrying the original text, same
    # row count, same memcpy profile.  Global positions are exact:
    # pos = seg_idx*S + local_start reproduces 1, 1+stride, ... — the
    # identical arithmetic progression, just factored.
    if segment_chunks < 1:
        raise ValueError("need segment_chunks >= 1")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    seg_len = segment_chunks * stride  # S: stride-chars owned per segment
    # Last global start (1-based): the same stop chunk_starts computes.
    gstop = F.greatest(F.length(txt) - F.lit(size - stride), F.lit(1))
    # Segment j (0-based) owns global starts in (j*S, (j+1)*S].
    n_segs = ((gstop - F.lit(1)) / F.lit(seg_len)).cast("long")  # = ceil-1
    seg_base = F.col("__seg") * F.lit(seg_len)
    with_seg = df.select(
        F.col(id_col),
        txt.alias("__txt"),
        gstop.alias("__gstop"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_segs)).alias("__seg"),
    ).select(
        id_col,
        seg_base.alias("__base"),
        # Single-segment docs pass the original column through — no
        # extra copy, byte-identical plan cost to the r11 form.
        F.when(F.col("__gstop") <= F.lit(seg_len), F.col("__txt"))
        .otherwise(
            F.col("__txt").substr(
                (seg_base + F.lit(1)).cast("int"),
                F.lit(seg_len + size - stride),
            )
        )
        .alias("__segtxt"),
        # Local stop: the segment's share of gstop, capped at S.
        F.least(F.col("__gstop") - seg_base, F.lit(seg_len).cast("long"))
        .cast("int")
        .alias("__lstop"),
    )
    return with_seg.select(
        id_col,
        "__base",
        F.col("__segtxt"),
        F.explode(
            F.sequence(F.lit(1), F.col("__lstop"), F.lit(stride))
        ).alias("__local"),
    ).select(
        id_col,
        (F.col("__base") + F.col("__local")).cast("int").alias("pos"),
        F.col("__segtxt").substr(F.col("__local"), F.lit(size)).alias("chunk"),
    )


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 scores for a fixed term list: (id, score), matching
    docs only.

    Scale shape: ONE doc-keyed shuffle total.  The explode feeds a single
    ``groupBy(id)`` whose aggregates are the doc length plus one
    conditional-sum ``tf`` per query term (the pivot-as-conditional-agg
    trick — |terms| is query-sized, so the agg row stays narrow and the
    partials combine map-side).  Corpus stats (N, avgdl, per-term df) are
    a second tiny aggregate over those per-doc rows, kept in-plan as a
    1-row broadcast rather than a collected driver constant — no
    token-keyed shuffle and no join against a doc-frequency table, unlike
    the TF-IDF path (``tfidf``), because the term list is known up front.

    IDF is the Lucene/ES variant ``ln(1 + (N - df + .5)/(df + .5))``
    (always positive).  Deterministic: per-term contributions are summed
    in the fixed order of ``query_terms``.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    per_doc = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__dl"),
        *[
            F.sum(F.when(F.col("token") == term, 1).otherwise(0)).alias(
                f"__tf{i}"
            )
            for i, term in enumerate(query_terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )

    def contrib(i: int) -> Column:
        tf = F.col(f"__tf{i}").cast("double")
        idf = F.log(
            1.0
            + (F.col("__n") - F.col(f"__df{i}") + 0.5)
            / (F.col(f"__df{i}") + 0.5)
        )
        norm = tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        return F.when(tf > 0, idf * tf * (k1 + 1.0) / norm).otherwise(0.0)

    # F.lit(0.0) start value: Python sum() over an EMPTY generator
    # returns the int 0, and withColumn(score, 0) rejects the non-Column
    # — an empty term list must yield an empty result, not a crash.
    scored = per_doc.crossJoin(F.broadcast(stats)).withColumn(
        "score", sum((contrib(i) for i in range(len(query_terms))), F.lit(0.0))
    )
    return scored.filter(F.col("score") > 0).select(id_col, "score")


def normalize_unicode(col: str | Column, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) as an Arrow-batched
    pandas UDF — the multilingual-pipeline prerequisite (composed vs
    decomposed accents, fullwidth/compatibility variants) that Spark has
    no JVM builtin for, which makes this one of the few legitimately
    Python steps in the engine.  Vectorized ``pandas.Series.str.normalize``
    per Arrow batch; nulls pass through.  DuckDB replays NFC via
    ``nfc_normalize()`` when an oracle needs it."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    c = F.col(col) if isinstance(col, str) else col
    return norm(c)


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Serving-side BPE tokenization: apply a learned merge list with
    pure JVM string expressions — no Python in the loop.

    Encoding trick: the normalized text is space-doubled and padded so
    every token owns a private leading AND trailing space; merging pair
    ``(a, b)`` is then the LITERAL replace ``" a  b " -> " ab "``, whose
    left-to-right non-overlapping scan is exactly one BPE merge pass
    (adjacent candidates share no characters, and the replacement
    restores the invariant).  For a well-formed merge list — every
    merge's operands exist before it, and merged symbols are distinct
    from base vocabulary, the property real BPE merge tables have by
    construction — sequential passes in rank order equal the classic
    lowest-rank-first loop, property-tested against a pure-python
    reference in test_textops.py.

    Scale shape: a narrow map, whole-stage-codegen'd, zero shuffles,
    zero Python.  This inlined-literal form is for the O(10-100)-merge
    demo table; a production 32k-merge tokenizer runs the same greedy
    algorithm in an Arrow-batched pandas UDF with the merge table in a
    broadcast variable — the plumbing ``score_documents`` already
    demonstrates.

    Output: input columns + ``n_tokens_before``, ``bpe_tokens``,
    ``n_tokens_after``.
    """
    norm = F.regexp_replace(fold_lower(F.trim(F.col(text_col))), r"\s+", " ")
    # F.replace, not regexp_replace: the pattern is a literal space and
    # the literal-replace expression skips the regex engine entirely.
    s = F.concat(F.lit(" "), F.replace(norm, F.lit(" "), F.lit("  ")), F.lit(" "))
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    # The only whitespace left in `s` is literal spaces (norm replaced
    # every \s run), so split-on-space + array_remove('') IS the
    # collapse-trim-split — one trivial split instead of a second
    # full-string regexp_replace pass (same move as tokens()).  NULL
    # text must still come out [] so size() reads 0, not -1.
    toks_after = F.when(
        s.isNotNull(), F.array_remove(F.split(s, " "), "")
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.withColumn("n_tokens_before", F.size(tokens(text_col)))
        .withColumn("bpe_tokens", toks_after)
        .withColumn("n_tokens_after", F.size(toks_after))
    )


def hashed_doc_vectors(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashing vectorizer: documents → dense L2-normalized
    ``array<double>`` embeddings, entirely in JVM expressions.

    The hashing trick (sklearn ``HashingVectorizer`` semantics, md5
    buckets so any engine replays it): token → ``md5 % dim`` bucket,
    per-doc bucket counts, densified against the 0..dim-1 grid, then
    L2-normalized.  This is the bridge from the text stack to the
    vector stack — the output drops straight into cosine_topk /
    SRP / IVF / PQ, giving similarity search over corpora that ship no
    model embeddings.

    Scale shape: one explode + ONE partial-agged (doc, bucket) shuffle +
    one map-side densify per doc (map_from_entries + a sequence
    transform); the vector never exists in sparse-row form on the wire.
    Zero Python, zero driver state.

    Output: ``(id_col, embedding array<double>)`` — components rounded
    to 9 dp so downstream comparisons are engine-stable.  Measured NOT
    to want spread_small_scan (r15 interleaved hermetic A/B: 1.79 s
    unspread vs 1.90 spread — the tokenize/hash explode is too cheap to
    pay the repartition).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    counts = (
        toks.select(id_col, (h % F.lit(dim)).cast("int").alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    dense = (
        counts.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "c"))
            ).alias("m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.col("m")[i.cast("int")], F.lit(0.0)),
            ).alias("v"),
        )
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dense.select(
        id_col,
        F.transform(
            F.col("v"), lambda x: F.round(x / norm, 9)
        ).alias("embedding"),
    )
