"""Training-data operators: consecutive ids, sequence packing, split
assignment, bigram construction — functional edge cases plus the
scale-shape assertion (the big window in the id plan is partitioned; the
only unpartitioned window runs over the tiny per-partition count frame).
"""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators import (
    ids,
    packing,
    sampling,
    similarity,
    sketch,
    text,
)


def test_consecutive_ids_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [(k, g) for g in ("b", "a") for k in (30, 10, 20)],
        "k long, g string",
    )
    out = ids.with_consecutive_ids(df, ["g", "k"], id_name="rid").collect()
    got = {(r.g, r.k): r.rid for r in out}
    # Dense 1..N in (g, k) order.
    assert got == {
        ("a", 10): 1, ("a", 20): 2, ("a", 30): 3,
        ("b", 10): 4, ("b", 20): 5, ("b", 30): 6,
    }


def test_consecutive_ids_custom_start(spark):
    df = spark.createDataFrame([(1,), (2,)], "k long")
    out = ids.with_consecutive_ids(df, ["k"], id_name="rid", start=100)
    assert sorted((r.k, r.rid) for r in out.collect()) == [(1, 100), (2, 101)]


def test_grouped_ranks_match_window_row_number(spark):
    import random

    from pyspark.sql import Window

    rng = random.Random(7)
    rows = [
        (rng.choice(["a", "b", "c"]), rng.randrange(50), i) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v long, uid long")
    got = {
        (r.g, r.uid): (r.r, r.n)
        for r in ids.with_grouped_ranks(
            df, ["g"], ["v", "uid"], rank_name="r", count_name="n"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "uid")
    wn = Window.partitionBy("g")
    want = {
        (r.g, r.uid): (r.r, r.n)
        for r in df.select(
            "g",
            "uid",
            F.row_number().over(w).alias("r"),
            F.count(F.lit(1)).over(wn).alias("n"),
        ).collect()
    }
    assert got == want


def test_ntile_from_rank_matches_ntile_window(spark):
    from pyspark.sql import Window

    for n in [1, 2, 3, 4, 5, 7, 8, 100, 101, 102, 103]:
        df = spark.range(1, n + 1).select(F.col("id").alias("i"))
        got = df.select(
            "i", ids.ntile_from_rank("i", F.lit(n), 4).alias("t")
        )
        want = df.select(
            "i", F.ntile(4).over(Window.orderBy("i")).alias("t")
        )
        g = {r.i: r.t for r in got.collect()}
        w = {r.i: r.t for r in want.collect()}
        assert g == w, f"n={n}: {g} != {w}"


def test_grouped_ranks_plan_windows_on_stats_only(spark):
    df = spark.range(1000).select(
        (F.col("id") % 4).cast("string").alias("g"), F.col("id").alias("k")
    )
    out = ids.with_grouped_ranks(df, ["g"], ["k"], count_name="n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    for ln in plan.splitlines():
        if "Window [" in ln:
            # stats-frame windows reference __pid (prefix offsets) or
            # __n (per-group totals); a data-sized window would not.
            assert "__pid" in ln or "__n" in ln, plan
    assert "Exchange rangepartitioning" in plan, plan


def test_consecutive_ids_plan_shape(spark):
    # Scale shape: the only Window in the plan is the prefix-sum over the
    # O(#partitions) stats frame — the table itself sees one range exchange
    # per pass and a broadcast join, never a table-sized window or a second
    # full-data hash exchange (a rank-window formulation pays one because
    # Catalyst can't see range partitions are already __pid-clustered).
    df = spark.range(1000).select(F.col("id").alias("k"))
    out = ids.with_consecutive_ids(df, ["k"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(win_lines) == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    # The lone hash exchange is the tiny stats aggregation on __pid.
    hash_ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(hash_ex) == 1 and "__pid" in hash_ex[0], plan


def test_greedy_pack_bins_by_exclusive_prefix(spark):
    df = spark.createDataFrame(
        [("x", 1, 300), ("x", 2, 300), ("x", 3, 300), ("x", 4, 50), ("y", 1, 600)],
        "b string, k long, n long",
    )
    out = packing.greedy_pack(df, "n", "b", ["k"], capacity=512).collect()
    got = {(r.b, r.k): r.bin_id for r in out}
    # x: pre-sums 0,300,600,900 → bins 0,0,1,1 ; y: pre-sum 0 → bin 0.
    assert got == {("x", 1): 0, ("x", 2): 0, ("x", 3): 1, ("x", 4): 1, ("y", 1): 0}


def test_assign_split_covers_and_is_deterministic(spark):
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    a = sampling.assign_split(df, "doc_id").collect()
    b = sampling.assign_split(df, "doc_id").collect()
    assert {r.split for r in a} == {"train", "val", "test"}
    assert sorted((r.doc_id, r.split) for r in a) == sorted(
        (r.doc_id, r.split) for r in b
    )
    # Majority bucket is train (12/16 of hex space).
    n_train = sum(1 for r in a if r.split == "train")
    assert n_train > len(a) / 2


def test_bigrams_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("solo",), ("",)], "text string"
    )
    out = (
        df.select(text.tokens("text").alias("t"))
        .select(text.bigrams(F.col("t")).alias("bg"))
        .collect()
    )
    assert out[0].bg == ["a b", "b c"]
    assert out[1].bg == []
    assert out[2].bg == []  # '' tokenizes to [''] → size 1 → no bigrams


def test_cms_never_underestimates_and_bounded(spark):
    rows = [(f"k{i % 7}",) for i in range(400)] + [("rare",)]
    df = spark.createDataFrame(rows, "key string")
    cms = sketch.cms_build(df, "key", depth=4, hex_chars=2)
    # Fixed-size state: at most depth * 16^hex_chars cells.
    assert cms.count() <= 4 * 16 * 16
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    est = sketch.cms_estimate(cms, exact, "key", depth=4, hex_chars=2)
    for r in est.collect():
        assert r.cms_est >= r.exact, r


def test_cms_unseen_key_estimates_zero_without_collisions(spark):
    df = spark.createDataFrame([("only",)], "key string")
    cms = sketch.cms_build(df, "key")
    probe = spark.createDataFrame([("never-counted",)], "key string")
    est = sketch.cms_estimate(cms, probe, "key").collect()
    # With one counted key and 4 independent rows, at least one of the
    # probe's cells is empty unless all four collide (md5-deterministic:
    # they don't for these literals).
    assert est[0].cms_est == 0


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = (
        df.withColumn("scale", similarity.int8_scale(F.col("embedding")))
        .withColumn("codes", similarity.quantize_int8(F.col("embedding"), F.col("scale")))
        .collect()
    )
    by_id = {r.vec_id: r.codes for r in out}
    # max-|v| component maps to ±127 exactly; all codes within [-127, 127].
    assert by_id[1] == [64, -127, 32, 0]
    assert by_id[2] == [0, 0, 0, 0]


def test_quantized_topk_recall_vs_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in similarity.quantized_cosine_topk(emb, q, k=10).collect()
    }
    # int8 codes preserve ranking almost perfectly on unit-ish vectors;
    # require >= 80% top-10 overlap across the 5 queries.
    assert len(exact & quant) >= 0.8 * len(exact)


def test_pack_query_buckets_on_three_hex_chars(spark):
    """pack_docs_for_training must partition its running-sum window on a
    3-hex-char bucket (4096-way parallelism), not 1 char (16-way ceiling
    at 100 TB).  Pins both the bucket cardinality shape and the window
    partitioning key in the physical plan."""
    from cryptocurrency_data_pipeline_spark.queries import QUERIES

    df = QUERIES["pack_docs_for_training"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window " in ln or "Window\n" in ln]
    assert any("pack_bucket" in ln for ln in win_lines), plan
    buckets = [r.pack_bucket for r in df.select("pack_bucket").distinct().collect()]
    assert all(len(b) == 3 for b in buckets), buckets[:5]


def test_exact_substring_spans_known_corpus(spark):
    from cryptocurrency_data_pipeline_spark.operators.dedup import exact_substring_spans

    # Shared run must not self-repeat its own k-grams, or the span grows
    # past the copied region (self-duplication IS duplication to Lee et
    # al.); aperiodic filler keeps the expectation exact.
    shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ1234"          # 30 chars, aperiodic
    docs = spark.createDataFrame(
        [
            (1, "quirk flange"[:10] + shared + "zesty mops"[:10]),  # 11..40
            (2, "wharf"[:5] + shared + "jumble quartz vexing dogs"[:25]),  # 6..35
            (3, "unique text with no repeats at all here ok"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in exact_substring_spans(docs, k=20).collect()
    }
    # Every 20-gram inside the shared 30-char run duplicates across docs
    # 1/2; the filler grams are unique, so spans stop at the copied region.
    assert spans[1] == (11, 40)
    assert spans[2] == (6, 35)
    assert 3 not in spans


def test_exact_substring_spans_merges_adjacent_islands(spark):
    from cryptocurrency_data_pipeline_spark.operators.dedup import exact_substring_spans

    # Two copies of the same doc: EVERY position duplicates, all k-gram
    # intervals chain into one maximal whole-doc span per doc.
    txt = "the quick brown fox jumps over the lazy dog!"
    docs = spark.createDataFrame(
        [(1, txt), (2, txt)], "doc_id long, text string"
    )
    rows = exact_substring_spans(docs, k=10).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in rows} == {
        (1, 1, len(txt)),
        (2, 1, len(txt)),
    }


def test_hard_negatives_excludes_same_label(spark):
    from cryptocurrency_data_pipeline_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.1], 0),   # same label as query: must never appear
        (3, [0.9, 0.2], 1),
        (4, [0.0, 1.0], 1),
        (5, [-1.0, 0.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives(df, df.where("vec_id = 1"), k=2).collect()
    got = [(r.neighbor_id, r.neg_label) for r in out]
    assert (2, 0) not in got
    # Nearest cross-label first: 3 (cos≈0.976) then 4 (cos=0).
    assert [n for n, _ in got] == [3, 4]


def test_char_entropy_bounds(spark):
    from cryptocurrency_data_pipeline_spark.queries import QUERIES
    import math

    out = QUERIES["doc_char_entropy"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        # 0 <= H <= log2(n_chars) (uniform over distinct chars is the max,
        # and there are at most n_chars distinct chars).
        assert -1e-9 <= r.char_entropy <= math.log2(r.n_chars) + 1e-9


def test_weighted_sample_favors_heavy_rows(spark):
    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )
    from pyspark.sql import functions as F

    # one giant weight among minnows: the heavy row must be sampled with
    # near-certainty (its key ln(u)/w is ~0 regardless of u)
    rows = [(i, 1) for i in range(1, 200)] + [(999, 10**9)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id for r in weighted_sample(df, F.col("w"), k=10).collect()}
    assert 999 in got
    assert len(got) == 10
    # deterministic across runs
    again = {r.doc_id for r in weighted_sample(df, F.col("w"), k=10).collect()}
    assert got == again


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 7)], "doc_id long, w long"
    )
    got = [r.doc_id for r in weighted_sample(df, F.col("w"), k=5).collect()]
    assert got == [3]


def test_weighted_sample_plan_is_take_ordered(spark):
    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, i) for i in range(1, 100)], "doc_id long, w long")
    plan = (
        weighted_sample(df, F.col("w"), k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------- temperature mixture


def test_temperature_mixture_alpha_one_is_proportional(spark):
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [("a", 900), ("b", 100)], "source string, n long"
    )
    got = {
        r.source: r
        for r in temperature_mixture(
            df, "source", F.sum("n"), alpha=1.0, token_budget=1000
        ).collect()
    }
    assert got["a"].p == 0.9 and got["b"].p == 0.1
    assert got["a"].target_tokens == 900 and got["b"].target_tokens == 100
    assert got["b"].epochs == 1.0


def test_temperature_mixture_flattens_and_upsamples(spark):
    from pyspark.sql import functions as F

    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        temperature_mixture,
    )

    df = spark.createDataFrame(
        [("big", 1_000_000), ("small", 1_000)], "source string, n long"
    )
    got = {
        r.source: r
        for r in temperature_mixture(
            df, "source", F.sum("n"), alpha=0.3, token_budget=100_000
        ).collect()
    }
    # alpha<1 flattens: small source gets far more than its natural share
    assert got["small"].p > 0.001
    assert abs(got["big"].p + got["small"].p - 1.0) < 1e-5
    # and the small source's allocation implies multiple epochs
    assert got["small"].epochs > 1.0


# ------------------------------------------------- hashed linear classifier


def test_classifier_keep_matches_sign_and_score_range(spark):
    from cryptocurrency_data_pipeline_spark.operators.classifier import (
        demo_weight_table,
        score_documents,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zip zap"), (3, "x")],
        "doc_id long, text string",
    )
    got = score_documents(docs, demo_weight_table(spark, 64), 64).collect()
    assert len(got) == 3
    for r in got:
        assert r.keep == (r.weight_sum > 0)
        assert 0.0 < r.score < 1.0


def test_classifier_weight_table_is_broadcast(spark):
    from cryptocurrency_data_pipeline_spark.operators.classifier import (
        demo_weight_table,
        score_documents,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1}") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        score_documents(docs, demo_weight_table(spark, 64), 64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_classifier_deterministic_weights_reproduce(spark):
    from cryptocurrency_data_pipeline_spark.operators.classifier import (
        demo_weight_table,
    )

    rows = {r.bucket: r.weight for r in demo_weight_table(spark, 8).collect()}
    assert rows == {
        b: (b * 2654435761) % 10007 - 5003 for b in range(8)
    }


# ------------------------------------------------- segment boilerplate


def test_segment_boilerplate_flags_shared_spans(spark):
    from cryptocurrency_data_pipeline_spark.operators.dedup import (
        segment_boilerplate,
    )

    shared = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, shared + " aa bb cc dd"),
            (2, shared + " ee ff gg hh"),
            (3, "ii jj kk ll mm nn oo pp"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in segment_boilerplate(docs, seg_len=4).collect()}
    assert got[1].n_segments == 2 and got[1].n_boilerplate == 1
    assert got[2].n_segments == 2 and got[2].n_boilerplate == 1
    assert got[3].n_segments == 2 and got[3].n_boilerplate == 0
    assert got[1].boilerplate_frac == 0.5


def test_segment_boilerplate_short_docs_have_no_rows(spark):
    from cryptocurrency_data_pipeline_spark.operators.dedup import (
        segment_boilerplate,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "p q r s t u v w")], "doc_id long, text string"
    )
    got = segment_boilerplate(docs, seg_len=4).collect()
    assert [r.doc_id for r in got] == [2]  # doc 1: < seg_len tokens


# ------------------------------------------------- equi-width histogram


def test_equi_width_histogram_buckets_and_bounds(spark):
    from cryptocurrency_data_pipeline_spark.operators.quality import (
        equi_width_histogram,
    )

    vals = [(float(v),) for v in range(0, 100)]
    got = {
        r.bucket: r
        for r in equi_width_histogram(
            spark.createDataFrame(vals, "v double"), "v", k=10
        ).collect()
    }
    assert set(got) == set(range(10))
    assert all(got[b].n == 10 for b in range(9))
    # max value folds into the last bucket via least()
    assert got[9].n == 10 and got[9].hi == 99.0


def test_equi_width_histogram_constant_column(spark):
    from cryptocurrency_data_pipeline_spark.operators.quality import (
        equi_width_histogram,
    )

    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "v double")
    got = equi_width_histogram(df, "v", k=20).collect()
    assert len(got) == 1 and got[0].bucket == 0 and got[0].n == 3


def test_unimax_water_filling_hand_computed(spark):
    # Supplies (cap=1): a=10, b=40, c=100; budget 100.
    # Water-filling: a capped (10*3=30 <= 100); b capped
    # (40*2+10=90 <= 100); c gets floor((100-50)/1)=50.
    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        unimax_allocation,
    )

    df = spark.createDataFrame(
        [("a", 10), ("b", 40), ("c", 100)], "lang string, n long"
    )
    got = {
        r.lang: r
        for r in unimax_allocation(
            df, "lang", F.sum("n"), 100, epoch_cap=1
        ).collect()
    }
    assert got["a"].capped and got["a"].alloc_tokens == 10
    assert got["b"].capped and got["b"].alloc_tokens == 40
    assert not got["c"].capped and got["c"].alloc_tokens == 50
    assert got["c"].epochs == 0.5


def test_unimax_budget_exceeds_supply_all_capped(spark):
    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        unimax_allocation,
    )

    df = spark.createDataFrame([("a", 5), ("b", 7)], "lang string, n long")
    rows = unimax_allocation(df, "lang", F.sum("n"), 10_000, epoch_cap=2).collect()
    assert all(r.capped for r in rows)
    assert {r.lang: r.alloc_tokens for r in rows} == {"a": 10, "b": 14}


def test_unimax_allocation_is_maximal_within_budget(spark):
    # Property: total allocation never exceeds the budget, and the
    # shortfall is only floor-division remainder (< #uncapped groups).
    from cryptocurrency_data_pipeline_spark.operators.sampling import (
        unimax_allocation,
    )

    df = spark.createDataFrame(
        [(f"l{i}", (i * 37) % 90 + 1) for i in range(12)], "lang string, n long"
    )
    rows = unimax_allocation(df, "lang", F.sum("n"), 700, epoch_cap=2).collect()
    total = sum(r.alloc_tokens for r in rows)
    n_uncapped = sum(0 if r.capped else 1 for r in rows)
    assert total <= 700
    assert 700 - total < max(n_uncapped, 1)
