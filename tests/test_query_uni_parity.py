"""Oracle parity on UNICODE/ENCODING-EXTREME documents (``sfuni``,
tools/make_uni_sf.py).

The eighth adversarial scale point: NFC/NFD pairs, astral-plane text
(emoji ZWJ sequences, math alphanumerics, CJK ext-B), zero-width
characters, exotic whitespace (NBSP, U+2028/9, U+3000, NEL), U+FFFD
decoder residue, embedded BOMs, case-fold traps (İ/ı, ß/ẞ, final
sigma), full-width forms, unicode digits, and combining-mark pileups —
the routine residue of a mixed-encoding web crawl.  The first r12
sweep of all 203 queries over this fixture surfaced 9 divergences in
2 root-cause classes, all fixed:

* **full-vs-simple case mapping** — Java (Spark) lowers U+0130 İ to
  ``i``+U+0307 and applies the Final_Sigma condition (Σ → ς
  word-finally) per SpecialCasing.txt, while utf8proc (DuckDB) uses
  the UnicodeData simple maps (İ → i, Σ → σ always).  One ``İstanbul``
  doc broke every tokenize/fingerprint consumer: lsh_band_tuning,
  quality_classifier_scores, bpe_token_counts, vocab_top_terms,
  text_stats_docs, dataset_version_diff, dsir_source_weights,
  token_drift_report.  Both engines now lower through the shared
  two-point case FOLD (``text.fold_lower`` /
  ``_fragments.fold_lower_sql``: İ→I before lowering, ς→σ after).
* **Python unicode-whitespace tokenization** — the SimHash Arrow UDF
  tokenized with argless ``str.split()``, which splits on U+00A0 /
  U+0085 / U+2028 etc., diverging from the engine-wide ASCII
  ``WS_CLASS`` contract (and used full-mapping ``str.lower``).  It now
  splits on the explicit WS_CLASS regex through ``fold_lower_py``.

This suite replays representatives of both classes plus a spread of
unicode-sensitive shapes on every pytest run; the full-registry sweep
is ``python tools/check_oracle.py /tmp/spark_graft_sfuni`` after
``python tools/make_uni_sf.py /tmp/spark_graft_sfuni``.
"""

import os
import shutil

import duckdb
import pytest

from cryptocurrency_data_pipeline_spark.queries import ORACLES, QUERIES
from tools.check_oracle import TABLES, table_hash
from tools.make_uni_sf import build

#: One representative per divergence class found by the first sfuni
#: sweep, plus unicode-sensitive shapes that were already correct and
#: must stay so (code-point counting, astral dedup, regex boundaries
#: against non-ASCII neighbors, chunking across multi-byte text).
UNI_REPS = [
    "vocab_top_terms",           # fold_lower: İ token identity
    "text_stats_docs",           # avg token len + normalized fingerprint
    "bpe_token_counts",          # BPE pre-split over folded text
    "simhash_signatures",        # Python UDF WS_CLASS + fold contract
    "dataset_version_diff",      # fingerprint consumer
    "dsir_source_weights",       # pooled token counts
    "token_drift_report",        # token distribution ratios
    "quality_classifier_scores", # bigram-LM over folded tokens
    "lsh_band_tuning",           # shingle counts over folded tokens
    # already-correct unicode-sensitive shapes:
    "pii_redaction_stats",       # email boundary vs non-ASCII neighbors
    "docs_exact_dedup",          # NFC/NFD stay distinct; astral dup pairs
    "minhash_near_dups",         # shingles over astral/ZWJ text
    "winnow_fingerprints",       # code-point char windows
    "doc_char_entropy",          # per-code-point frequencies
    "doc_chunk_inventory",       # substring chunking counts code points
    "gopher_quality_flags",      # rule battery over folded tokens
]


@pytest.fixture(scope="module")
def uni_sf_dir():
    d = f"/tmp/spark_graft_sfuni_{os.getpid()}"
    build(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def uni_duck(uni_sf_dir):
    con = duckdb.connect()
    for tab in TABLES:
        con.execute(
            f"CREATE VIEW {tab} AS SELECT * FROM "
            f"read_parquet('{uni_sf_dir}/{tab}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", UNI_REPS)
def test_uni_parity(spark, uni_sf_dir, uni_duck, name):
    sdf = QUERIES[name](spark, uni_sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = uni_duck.sql(ORACLES[name])
    dcols, drows = rel.columns, rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows), (
        f"{name}: spark={len(srows)} duck={len(drows)}\n"
        f"spark rows: {sorted(srows, key=str)[:10]}\n"
        f"duck rows: {sorted(drows, key=str)[:10]}"
    )
    assert table_hash(scols, srows) == table_hash(dcols, drows), (
        f"{name}: value-hash mismatch\n"
        f"spark rows: {sorted(srows, key=str)[:10]}\n"
        f"duck rows: {sorted(drows, key=str)[:10]}"
    )


def test_fold_lower_two_point_contract(spark):
    """The exact two divergence points, pinned engine-side: İ folds to
    plain i (not i+U+0307) and BOTH sigmas fold to σ — identical to
    what the oracle's replace-lower-replace sandwich produces."""
    from cryptocurrency_data_pipeline_spark.operators.text import (
        fold_lower,
        fold_lower_py,
    )

    df = spark.createDataFrame(
        [("İstanbul ΟΔΟΣ Σίσυφος ς STRASSE ẞ Crème",)], ["text"]
    )
    got = df.select(fold_lower("text").alias("f")).collect()[0].f
    expected = "istanbul οδοσ σίσυφοσ σ strasse ß crème"
    assert got == expected
    assert fold_lower_py("İstanbul ΟΔΟΣ Σίσυφος ς STRASSE ẞ Crème") == expected
    con = duckdb.connect()
    duck = con.execute(
        "SELECT replace(lower(replace(?, 'İ', 'I')), 'ς', 'σ')",
        ["İstanbul ΟΔΟΣ Σίσυφος ς STRASSE ẞ Crème"],
    ).fetchone()[0]
    assert duck == expected


def test_fold_lower_single_translate_equals_sandwich(spark):
    """The r13 one-pass form lower(translate(c,'İΣς','Iσσ')) must equal
    the r12 sandwich translate(lower(translate(c,'İ','I')),'ς','σ') on
    every adversarial shape: Σ word-final (Final_Sigma), Σ mid-word,
    pre-existing ς, İ, combining dot U+0307 in real text, and plain
    ASCII.  Valid because Σ is the ONLY code point Java lowers to ς and
    nothing lowers to İ/Σ/ς — if a future Unicode update broke that,
    this test breaks first."""
    from pyspark.sql import functions as F

    cases = [
        ("ΟΔΟΣ",),              # final sigma: Java lower → ς
        ("ΣΟΦΟΣ ΣΟΦΙΑ",),       # final + initial Σ
        ("Σ",),                  # lone Σ (Final_Sigma false: no before)
        ("abcΣ1",),              # Σ before a digit (cased-before, not after)
        ("ς σ Σ",),              # all three sigmas
        ("İstanbul i̇ I",),  # İ + literal i-with-combining-dot
        ("plain ascii TEXT",),
        ("",),
        (None,),
    ]
    df = spark.createDataFrame(cases, "text string")
    sandwich = F.translate(
        F.lower(F.translate(F.col("text"), "İ", "I")), "ς", "σ"
    )
    single = F.lower(F.translate(F.col("text"), "İΣς", "Iσσ"))
    rows = df.select(
        single.alias("one_pass"), sandwich.alias("sandwich")
    ).collect()
    for r in rows:
        assert r.one_pass == r.sandwich, (r.one_pass, r.sandwich)


def test_simhash_tokenizes_on_ascii_ws_only(spark):
    """NBSP / NEL / U+2028 are NOT token separators (engine-wide ASCII
    WS_CLASS contract): a doc whose words are joined by unicode
    whitespace hashes as ONE token, identically to the oracle."""
    from cryptocurrency_data_pipeline_spark.operators.dedup import simhash64
    from pyspark.sql import functions as F

    glued = "a\u00a0b\u0085c\u2028d"
    df = spark.createDataFrame([(1, glued), (2, "a b")], "doc_id long, text string")
    out = {r.doc_id: r.s for r in df.select(
        "doc_id", simhash64(F.col("text")).alias("s")).collect()}
    import hashlib

    def one_tok_sig(tok):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        return h - (1 << 64) if h >= (1 << 63) else h

    # One token -> signature IS that token's 64-bit hash (sign of ±1).
    assert out[1] == one_tok_sig(glued)
