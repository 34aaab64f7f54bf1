"""Text analysis + dedup family + similarity + as-of join unit tests."""

import pyspark.sql.functions as F
import pytest

from cryptocurrency_data_pipeline_spark.operators import dedup, joins, similarity, text


def test_text_stats_basic(spark):
    df = spark.createDataFrame([(1, "The cat and the dog of war!")], "doc_id long, text string")
    r = text.text_stats(df).collect()[0]
    assert r.n_tokens == 7
    assert r.n_chars_computed == 27
    assert r.lang_pred == "en"
    assert r.punct_ratio == pytest.approx(1 / 27, abs=1e-6)
    # 'the' x2, 'and', 'of' -> 4 stopwords of 7 tokens
    assert r.stopword_ratio == pytest.approx(4 / 7, abs=1e-6)
    assert len(r.fingerprint) == 32


def test_lang_id_tie_prefers_en(spark):
    df = spark.createDataFrame([(1, "the le der el 的",), (2, "xyz",)], "doc_id long, text string")
    out = {r.doc_id: r.lang for r in df.select("doc_id", text.lang_id("text").alias("lang")).collect()}
    assert out[1] == "en"   # all score 1 -> declaration order wins
    assert out[2] == "und"


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    r = df.select(text.shingles("text", 3).alias("s")).collect()[0].s
    assert r == ["a b c", "b c d"]


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_copies for r in dedup.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}  # normalization collapses 1 and 2


def test_minhash_near_dups_finds_近dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely unrelated words here nothing shared at all ok")],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_near_dups(df, threshold=0.5).collect()
    assert [(p.a_id, p.b_id) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard_sim > 0.8


def test_simhash_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "other words")],
        "doc_id long, text string",
    )
    out = dedup.simhash_dups(df).collect()
    assert len(out) == 1 and out[0].n_docs == 2 and out[0].keep_id == 1


def test_cosine_topk_exact(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r.neighbor_id for r in out] == [1, 2]
    assert out[0].cosine_sim > 0.99 and out[1].cosine_sim == 0.0


def test_ann_matches_bruteforce_on_easy_clusters(spark):
    # Two tight clusters; ANN with few bits must still find same-cluster nbrs.
    rows = [(i, [1.0 + 0.01 * i, 0.0]) for i in range(5)] + [
        (10 + i, [0.0, 1.0 + 0.01 * i]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    ann = {r.neighbor_id for r in similarity.ann_topk(df, q, k=4, n_bits=2, dim=2).collect()}
    exact = {r.neighbor_id for r in similarity.cosine_topk(df, q, k=4).collect()}
    assert ann == exact  # same-direction cluster shares every SRP bucket


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 25, "p2"), ("u2", 5, "p3")],
        "user_id string, ts long, name string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100.0), ("u1", 20, 200.0), ("u2", 7, 300.0)],
        "user_id string, ts long, value double",
    )
    out = {
        r.name: r.asof_value
        for r in joins.asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()
    }
    # p1: equal-ts right row visible (<=); p2: latest prior (ts=20); p3: none
    assert out == {"p1": 100.0, "p2": 200.0, "p3": None}


def test_ivf_topk_recall_on_clusters(spark):
    # Two tight clusters, nlist=2: each query must recover its own cluster.
    rows = [(i, [1.0 + 0.01 * i, 0.0]) for i in range(5)] + [
        (10 + i, [0.0, 1.0 + 0.01 * i]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    ivf = {r.neighbor_id for r in similarity.ivf_topk(df, q, k=4, nlist=2, nprobe=1).collect()}
    exact = {r.neighbor_id for r in similarity.cosine_topk(df, q, k=4).collect()}
    assert ivf == exact


def test_ivf_multiprobe_reaches_all_lists(spark):
    # nprobe == nlist degenerates to exact search (full coverage).
    rows = [(i, [float(i % 3 + 1), float((i * 7) % 5 + 1)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 2)
    ivf = similarity.ivf_topk(df, q, k=5, nlist=4, nprobe=4).collect()
    exact = similarity.cosine_topk(df, q, k=5).collect()
    key = lambda r: (r.query_id, r.neighbor_id, r.cosine_sim)
    assert sorted(map(key, ivf)) == sorted(map(key, exact))


def test_shingles_shorter_than_n_is_empty(spark):
    df = spark.createDataFrame([("one two",)], "text string")
    r = df.select(text.shingles("text", 3).alias("s")).collect()[0].s
    assert r == []


def test_winnow_shared_substring_shares_fingerprint(spark):
    # Winnowing guarantee: any shared run of length >= w+k-1 (= 11) chars
    # yields at least one common fingerprint, regardless of position.
    core = "zqxjkwvbnm pqrstuvwxy"
    a = "aaaa bbbb cccc dddd " + core + " eeee ffff gggg hhhh iiii jjjj"
    b = "1111 2222 3333 4444 5555 6666 " + core + " 7777 8888 9999 0000"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = {r.doc_id: set(r.fingerprints)
           for r in text.winnow_fingerprints(df, "text").collect()}
    assert out[1] & out[2]


def test_bpe_token_count_shape(spark):
    df = spark.createDataFrame([("Don't count 123 twice!!",)], "text string")
    # don | 't | count | 123 | twice | !!  -> 6
    assert df.select(text.bpe_token_count("text").alias("n")).collect()[0].n == 6


def test_redact_pii_known_strings(spark):
    from cryptocurrency_data_pipeline_spark.operators.text import (
        pii_counts,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            ("reach me at jo.doe+x@corp.example.org thanks",),
            ("ssn 123-45-6789 phone 555-0123 lacks country code",),
            ("+44 202-9999 from 192.168.0.1 and 10.0.0.7",),
            ("no pii here",),
            # Adjacent emails: the consuming boundary group means a match
            # ending flush against a local-part char does NOT restart there
            # — identical to the RE2 oracle pattern by construction (the
            # r11 lookbehind variant diverged on exactly this case).
            ("a@b.com_x@y.com",),
            ("a@b.com x@y.com",),
            ("a@b.com,x@y.com",),
        ],
        ["text"],
    )
    out = df.select(
        redact_pii("text").alias("clean"),
        *[c.alias(n) for n, c in pii_counts("text")],
    ).collect()
    assert out[0].clean == "reach me at [EMAIL] thanks"
    assert out[0].email == 1
    assert out[1].clean == "ssn [SSN] phone 555-0123 lacks country code"
    assert (out[1].ssn, out[1].phone) == (1, 0)  # no leading +NN -> not a phone match
    assert out[2].clean == "[PHONE] from [IP] and [IP]"
    assert (out[2].phone, out[2].ipv4) == (1, 2)
    assert out[3].clean == "no pii here"
    assert (out[4].email, out[4].clean) == (1, "[EMAIL]_x@y.com")
    assert (out[5].email, out[5].clean) == (2, "[EMAIL] [EMAIL]")
    assert (out[6].email, out[6].clean) == (2, "[EMAIL],[EMAIL]")


def test_chunk_docs_covers_every_char_and_short_docs(spark):
    from cryptocurrency_data_pipeline_spark.operators.text import chunk_docs

    rows = [(1, "a" * 250), (2, "b" * 100), (3, "c" * 7), (4, "d" * 101)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = chunk_docs(df, size=100, stride=80).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.chunk))
    # Short docs produce exactly one chunk equal to the text.
    assert by_doc[2] == [(1, "b" * 100)]
    assert by_doc[3] == [(1, "c" * 7)]
    # Every character position is covered by at least one chunk.
    for doc_id, text in rows:
        covered = set()
        for pos, chunk in by_doc[doc_id]:
            covered.update(range(pos, pos + len(chunk)))
        assert covered == set(range(1, len(text) + 1)), doc_id
    # Overlap structure: starts advance by the stride.
    assert [p for p, _ in sorted(by_doc[1])] == [1, 81, 161]


def test_unicode_normalization_forms(spark):
    from cryptocurrency_data_pipeline_spark.operators.text import normalize_unicode
    from pyspark.sql import functions as F

    composed = "café"              # é as one codepoint
    decomposed = "café"           # e + combining acute
    fullwidth = "ＡＢ"          # ＡＢ
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, fullwidth), (4, None)],
        "id long, s string",
    )
    out = {
        r.id: (r.nfc, r.nfkc)
        for r in df.select(
            "id",
            normalize_unicode("s", "NFC").alias("nfc"),
            normalize_unicode("s", "NFKC").alias("nfkc"),
        ).collect()
    }
    # NFC folds the decomposed form onto the composed one
    assert out[1][0] == out[2][0] == composed
    # NFKC additionally folds compatibility variants to ASCII
    assert out[3][1] == "AB"
    assert out[4] == (None, None)


def test_unicode_normalization_rejects_bad_form(spark):
    import pytest as _pytest

    from cryptocurrency_data_pipeline_spark.operators.text import normalize_unicode

    with _pytest.raises(ValueError):
        normalize_unicode("s", "NFX")


# ------------------------------------------------------------- BPE apply


def _ref_bpe(toks, merges):
    """Classic lowest-rank-first BPE apply (pure python reference)."""
    rank = {m: i for i, m in enumerate(merges)}
    toks = list(toks)
    while True:
        best, bi = None, -1
        for i in range(len(toks) - 1):
            r = rank.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            return toks
        toks = toks[:bi] + [toks[bi] + toks[bi + 1]] + toks[bi + 2 :]


def test_bpe_apply_matches_reference_on_crafted_cases(spark):
    from cryptocurrency_data_pipeline_spark.operators.text import bpe_apply

    merges = [("a", "b"), ("ab", "c"), ("x", "x"), ("ab", "ab")]
    cases = [
        "a b c",            # cascading: ab then abc
        "a b a b",          # adjacent merged symbols -> abab via rank-4
        "x x x",            # a==b overlap: leftmost pair wins
        "c a b c a b c",
        "a a b b",
        "q w e",            # no merges apply
        "a b c a b c x x",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bpe_apply(df, merges).collect()}
    for i, s in enumerate(cases):
        assert list(got[i].bpe_tokens) == _ref_bpe(s.split(), merges), s
        assert got[i].n_tokens_after == len(_ref_bpe(s.split(), merges))


def test_bpe_apply_matches_reference_randomized(spark):
    import random

    from cryptocurrency_data_pipeline_spark.operators.text import bpe_apply

    rng = random.Random(19)
    vocab = ["aa", "bb", "cc", "dd"]
    # well-formed merge list: operands exist before use, outputs unique
    merges = [("aa", "bb"), ("cc", "dd"), ("aabb", "cc"), ("aabb", "aabb")]
    cases = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 30)))
        or "aa"
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bpe_apply(df, merges).collect()}
    for i, s in enumerate(cases):
        assert list(got[i].bpe_tokens) == _ref_bpe(s.split(), merges), s


def test_bpe_apply_plan_has_no_shuffle_or_python(spark):
    from cryptocurrency_data_pipeline_spark.operators.text import bpe_apply

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        bpe_apply(df, [("a", "b")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM expressions


# ------------------------------------------------- hashing vectorizer


def test_hashed_doc_vectors_unit_norm_and_counts(spark):
    from cryptocurrency_data_pipeline_spark.operators.text import (
        hashed_doc_vectors,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma")], "doc_id long, text string"
    )
    got = {r.doc_id: list(r.embedding) for r in hashed_doc_vectors(docs, dim=16).collect()}
    for v in got.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-6  # L2-normalized
    # doc 1 has two distinct tokens with counts 2 and 1 -> component
    # ratio 2:1 (unless they collide into one bucket)
    nz = sorted(x for x in got[1] if x > 0)
    assert len(nz) in (1, 2)
    if len(nz) == 2:
        assert abs(nz[1] / nz[0] - 2.0) < 1e-6
    # doc 2: single token -> exactly one component = 1.0
    assert sorted(x for x in got[2] if x > 0) == [1.0]


def test_hashed_doc_vectors_plan_single_shuffle_no_python(spark):
    from cryptocurrency_data_pipeline_spark.operators.text import (
        hashed_doc_vectors,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1}") for i in range(20)], "doc_id long, text string"
    )
    plan = (
        hashed_doc_vectors(docs, dim=32)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "InPandas" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # (doc,bucket) + doc


def test_band_keys_rejects_non_divisor_bands(spark):
    """bands must divide the 8-element signature: a non-divisor silently
    drops trailing signature rows, and bands>8 gives zero rows per band
    (every doc shares every band key -> all-pairs candidate explosion)."""
    for bad in (0, -1, 3, 5, 16):
        with pytest.raises(ValueError, match="divisor"):
            dedup.band_keys(F.col("x"), bands=bad)


def test_zero_shingle_docs_never_pair(spark):
    """Docs shorter than the shingle width have an all-null signature;
    without the size guard every such doc shares every sentinel band key
    with every other -> C(n,2) junk candidates.  They must produce NO
    candidate pairs, while real near-dups still pair."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base + " extra")] + [(10 + i, "hi") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.a_id, r.b_id)
        for r in dedup.lsh_candidate_pairs(df, "text", "doc_id").collect()
    }
    assert (1, 2) in pairs
    assert all(a < 10 and b < 10 for a, b in pairs), pairs


def test_quantized_topk_survives_zero_vectors(spark):
    """An all-zero embedding quantizes to all-zero codes; the unguarded
    cosine denominator raises DIVIDE_BY_ZERO under ANSI.  Zero vectors
    must score 0.0 and never crash the job."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id").isin(1, 2))
    rows = similarity.quantized_cosine_topk(emb, q, k=2).collect()
    sims = {(r.query_id, r.neighbor_id): r.q_cosine_sim for r in rows}
    assert all(v == 0.0 for (a, b), v in sims.items() if 2 in (a, b))
    assert sims[(1, 3)] > 0.9


def test_blank_and_null_docs_score_zero_not_null(spark):
    """Blank/whitespace/null text: 0 tokens (not the phantom [''] of a
    raw split), all ratios 0.0, quality_score 0.0 — never null (nulls
    silently drop rows from score filters) and never DIVIDE_BY_ZERO."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real text here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.text_stats(df).collect()}
    for d in (1, 2, 3):
        r = out[d]
        assert r.n_tokens == 0
        assert r.stopword_ratio == 0.0 and r.punct_ratio == 0.0
        assert r.avg_token_len == 0.0 and r.quality_score == 0.0
    assert out[4].n_tokens == 3 and out[4].quality_score > 0.0
    # Standalone column helpers agree.
    cols = df.select(
        "doc_id",
        text.token_count("text").alias("n"),
        text.quality_score("text").alias("q"),
    ).collect()
    got = {r.doc_id: (r.n, r.q) for r in cols}
    assert got[1] == (0, 0.0) and got[2] == (0, 0.0) and got[3] == (0, 0.0)


def test_blank_docs_emit_no_term_rows_or_vectors(spark):
    """A tokenless doc contributes no (doc, token) rows and no feature
    buckets — before the tokens() guard an empty-string doc emitted a
    bogus '' token that hashed into a real bucket."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "a b a")], "doc_id long, text string"
    )
    tf = text.term_doc_counts(df).collect()
    assert {r.doc_id for r in tf} == {3}
    vecs = text.hashed_doc_vectors(df, dim=8).collect()
    assert {r.doc_id for r in vecs} == {3}


def test_chunk_docs_keeps_null_text_docs(spark):
    """Null text chunks as empty text: one (pos=1, chunk='') row, the
    doc never silently vanishes from the chunk table."""
    df = spark.createDataFrame(
        [(1, None), (2, "x" * 250)], "doc_id long, text string"
    )
    rows = text.chunk_docs(df, size=100, stride=80).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.chunk))
    assert by_doc[1] == [(1, "")]
    assert len(by_doc[2]) == 3  # starts 1, 81, 161 cover all 250 chars


def test_bm25_empty_query_terms_returns_empty(spark):
    df = spark.createDataFrame([(1, "some text")], "doc_id long, text string")
    assert text.bm25_rank(df, []).collect() == []


def test_winnow_normalization_matches_sql_semantics(spark):
    """The winnow UDF must normalize exactly like the JVM/SQL form it
    claims byte-identity with: trim strips SPACES only and \\s is ASCII.
    A leading tab therefore survives as a collapsed leading space, and
    U+00A0 is NOT whitespace — pin by comparing against the explicitly
    pre-normalized equivalents."""
    base = "the quick brown fox jumps over the dog"
    df = spark.createDataFrame(
        [
            (1, "\t" + base),      # tab: trim keeps it, \s+ collapses to ' '
            (2, " " + base),       # the SQL-normalized equivalent of 1
            (3, base.replace(" ", "\u00a0")),  # NBSP: not ASCII whitespace
            (4, base),
        ],
        "doc_id long, text string",
    )
    fps = {
        r.doc_id: tuple(r.fingerprints)
        for r in text.winnow_fingerprints(df).collect()
    }
    assert fps[1] == fps[2]       # tab == explicit leading space
    assert fps[3] != fps[4]       # NBSP-joined text is a DIFFERENT doc


def test_asof_join_carries_matched_rows_null_not_stale_value(spark):
    """DuckDB ASOF semantics: the matched right row's NULL value is the
    answer — not the last non-null value from an OLDER row.  And with
    several value_cols the result must come from ONE right row, never
    stitched across rows."""
    left = spark.createDataFrame([("k", 3), ("k", 10)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 1, 5.0, 9.0), ("k", 2, None, 7.0)],
        "key string, ts long, a double, b double",
    )
    out = {
        r.ts: (r.asof_a, r.asof_b)
        for r in joins.asof_join(
            left, right, "key", "ts", "ts", ["a", "b"]
        ).collect()
    }
    # Both left rows match the ts=2 right row: a=NULL (not the stale 5.0
    # from ts=1), b=7.0 — an atomic (None, 7.0), never (5.0, 7.0).
    assert out == {3: (None, 7.0), 10: (None, 7.0)}


def test_chunk_docs_correct_on_quarter_megabyte_doc(spark):
    """chunk_docs byte-correctness on a >256 KB multi-byte doc (astral +
    accented chars), pinned against Python code-point slicing — no
    oracle fixture carries a doc this large, and the operator's plan
    notes document the O(n²/stride) parent-copy bound this size probes."""
    from cryptocurrency_data_pipeline_spark.operators.text import chunk_docs

    big = ("wordé 🌍 " * 40_000)[: 262_144 + 500]
    small = big[:3_000]
    df = spark.createDataFrame(
        [(1, big), (2, small)], "doc_id long, text string"
    )
    out = chunk_docs(df, size=100, stride=80)
    rows = {(r.doc_id, r.pos): r.chunk for r in out.collect()}
    # reference: Python slicing over code points (== substr semantics)
    for doc_id, text in ((1, big), (2, small)):
        n = len(text)
        starts = list(range(1, max(n - 20, 1) + 1, 80)) or [1]
        for p in starts:
            assert rows[(doc_id, p)] == text[p - 1 : p - 1 + 100], (doc_id, p)
        assert len([k for k in rows if k[0] == doc_id]) == len(starts)


def test_chunk_docs_giant_doc_stays_linear_and_exact(spark):
    """The >knee guard is structural, not an upstream convention: a
    >1 MB doc routes through the segment explode (copy term linear in
    doc size — the r11 single-explode plan was O(n²/stride), ~12 GB of
    memcpy at 1 MB and unusable at 10 MB) and stays byte-exact,
    including the cross-SEGMENT boundary chunks and the short tail."""
    from cryptocurrency_data_pipeline_spark.operators.text import chunk_docs

    n = 1_200_000
    # Position-dependent text so any segment/offset slip shows up.
    text = "".join(chr(97 + ((i * 7) % 23)) for i in range(n)) + "ENDMARK"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        (r.pos, r.chunk)
        for r in chunk_docs(df, size=100, stride=80).collect()
    )
    stop = max(len(text) - 20, 1)
    expected_n = (stop - 1) // 80 + 1
    assert len(rows) == expected_n
    # Every chunk byte-exact vs python slicing (spot field + full scan).
    for pos, chunk in rows[:: max(1, expected_n // 500)]:
        assert chunk == text[pos - 1 : pos - 1 + 100], pos
    # The exact segment-boundary starts (S = 1024*80 chars per segment).
    seg = 1024 * 80
    for pos in (seg - 79, seg + 1, 2 * seg + 1):
        match = [c for p, c in rows if p == pos]
        assert match == [text[pos - 1 : pos - 1 + 100]], pos
    # Tail chunk runs short and ends at the document end.
    last_pos, last_chunk = rows[-1]
    assert last_chunk == text[last_pos - 1 :]
    assert last_chunk.endswith("ENDMARK")
