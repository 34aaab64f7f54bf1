"""Product-quantization operator tests (operators/pq.py)."""

import pytest

from cryptocurrency_data_pipeline_spark.operators import pq


@pytest.fixture(scope="module")
def vecs(spark):
    # Two clear clusters per 2-dim subspace: around (0,0) and (5,5).
    rows = [
        (0, [0.0, 0.1, 5.0, 5.1]),
        (1, [0.1, 0.0, 5.1, 5.0]),
        (2, [5.0, 5.1, 0.0, 0.1]),
        (3, [5.1, 5.0, 0.1, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),
        (5, [5.0, 5.0, 5.0, 5.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_trained_codes_separate_clusters(vecs):
    cb = pq.train_codebook(vecs, m=2, k=2, subdim=2, iters=2)
    codes = pq.pq_encode(vecs, cb, m=2, subdim=2).collect()
    assert len(codes) == 6 * 2
    assert all(r.code in (0, 1) for r in codes)
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r.vec_id, {})[r.m] = r.code
    # sub-vectors near (0,0) share a code; near (5,5) share the other
    assert by_vec[0][0] == by_vec[1][0] == by_vec[4][0]
    assert by_vec[2][0] == by_vec[3][0] == by_vec[5][0]
    assert by_vec[0][0] != by_vec[2][0]
    # subspace 1 flips the membership for vectors 0-3
    assert by_vec[0][1] == by_vec[1][1] == by_vec[5][1]
    assert by_vec[2][1] == by_vec[3][1] == by_vec[4][1]


def test_adc_exact_when_vectors_sit_on_centroids(spark):
    # Vectors AT the centroids quantize losslessly: ADC == exact L2.
    rows = [
        (0, [0.0, 0.0, 1.0, 1.0]),
        (1, [1.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = spark.createDataFrame(
        [(m, j, [float(j), float(j)]) for m in (0, 1) for j in (0, 1)],
        "m int, code int, centroid array<double>",
    )
    codes = pq.pq_encode(df, cb, m=2, subdim=2)
    probes = df.filter("vec_id = 0")
    approx = {
        (r.query_id, r.neighbor_id): r.adc_dist
        for r in pq.pq_adc_topk(codes, pq.adc_lut(probes, cb, subdim=2), k=5).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.l2_dist
        for r in pq.exact_l2_topk(df, probes, k=5).collect()
    }
    assert approx == exact


def test_train_codebook_keeps_empty_cluster_centroids(spark):
    # k=3 seeds but only 2 distinct points: the never-assigned seed's
    # centroid must survive (coalesce path), not turn null/NaN.
    rows = [(i, [0.0, 0.0]) for i in range(3)] + [(i, [9.0, 9.0]) for i in range(3, 6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq.train_codebook(df, m=1, k=3, subdim=2, iters=2)
    got = cb.collect()
    assert len(got) == 3
    assert all(all(c == c for c in r.centroid) for r in got)  # no NaN
    cents = sorted(tuple(r.centroid) for r in got)
    assert (0.0, 0.0) in cents and (9.0, 9.0) in cents


def test_encode_plan_is_map_only_arrow(vecs):
    """Encode (r15): one map-only ArrowEvalPython over the subvector
    frame — no join, no exchange, no per-(row, code) explode.  The old
    broadcast-join form survives only as the wrong-length-codebook
    fallback (next test)."""
    cb = pq.demo_codebook(vecs.sparkSession, m=2, k=4, subdim=2)
    plan = (
        pq.pq_encode(vecs, cb, m=2, subdim=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "Join" not in plan and "Exchange" not in plan


def test_encode_falls_back_to_join_on_foreign_codebook(vecs):
    """A codebook whose centroids are not subdim long (foreign artifact)
    must take the join + size-guarded _sub_dist path, not the kernel."""
    from pyspark.sql import functions as F

    cb = pq.demo_codebook(vecs.sparkSession, m=2, k=4, subdim=3)  # wrong len
    plan = (
        pq.pq_encode(vecs, cb, m=2, subdim=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_codebook_parquet_round_trip_bit_identical(vecs, tmp_path):
    cb = pq.train_codebook(vecs, m=2, k=2, subdim=2, iters=2)
    path = str(tmp_path / "cb")
    pq.save_codebook(cb, path)
    loaded = pq.load_codebook(vecs.sparkSession, path)
    want = sorted((r.m, r.code, tuple(r.centroid)) for r in cb.collect())
    got = sorted((r.m, r.code, tuple(r.centroid)) for r in loaded.collect())
    assert got == want  # 9-dp-rounded doubles survive parquet exactly


def test_train_or_load_takes_load_path_when_persisted(vecs, tmp_path, monkeypatch):
    path = str(tmp_path / "cb")
    first = pq.train_or_load_codebook(vecs, path, m=2, k=2, subdim=2, iters=2)
    rows1 = sorted((r.m, r.code, tuple(r.centroid)) for r in first.collect())

    def boom(*a, **kw):  # serving must never retrain once the artifact exists
        raise AssertionError("train_codebook called on the serving path")

    monkeypatch.setattr(pq, "train_codebook", boom)
    second = pq.train_or_load_codebook(vecs, path, m=2, k=2, subdim=2, iters=2)
    rows2 = sorted((r.m, r.code, tuple(r.centroid)) for r in second.collect())
    assert rows1 == rows2


def test_ivfpq_index_build_load_serve_matches_inline(vecs, tmp_path):
    # The persisted-index serve path must reproduce the inline IVFPQ
    # pipeline exactly (build is deterministic, artifacts round-trip).
    path = str(tmp_path / "ivfpq")
    pq.build_ivfpq_index(vecs, path, nlist=2, m=2, k=2, subdim=2)
    index = pq.load_ivfpq_index(vecs.sparkSession, path)
    assert {"m", "code", "centroid"} <= set(index.codebook.columns)
    assert index.codes.count() == vecs.count() * 2
    assert index.assign.count() == vecs.count()
    probes = vecs.filter("vec_id < 2")
    got = pq.ivfpq_search(index, probes, k=3, nprobe=2).collect()
    assert {r.query_id for r in got} == {0, 1}
    for r in got:
        assert r.neighbor_id != r.query_id
    # rank is dense 1..k per query and distances are non-decreasing
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(a.adc_dist <= b.adc_dist for a, b in zip(rows, rows[1:]))


def test_train_or_load_raises_on_corrupt_artifact(vecs, tmp_path):
    """A corrupt-but-PRESENT codebook dir must surface the read error, not
    silently retrain over it (a transient storage fault would otherwise
    trigger an expensive rebuild and mask the problem)."""
    import os

    path = str(tmp_path / "cb")
    os.makedirs(path)
    garbage = os.path.join(path, "part-00000.parquet")
    with open(garbage, "wb") as f:
        f.write(b"definitely not a parquet footer")
    with pytest.raises(Exception):
        pq.train_or_load_codebook(vecs, path, m=2, k=2, subdim=2, iters=2)
    # ...and the broken artifact was NOT clobbered by a retrain.
    with open(garbage, "rb") as f:
        assert f.read() == b"definitely not a parquet footer"


def test_train_or_load_trains_when_artifact_absent(vecs, tmp_path):
    """Missing path and present-but-fileless dir both count as 'absent'
    and fall through to training."""
    import os

    missing = str(tmp_path / "never_written")
    cb = pq.train_or_load_codebook(vecs, missing, m=2, k=2, subdim=2, iters=2)
    assert cb.count() == 4  # m*k rows persisted + returned

    empty = str(tmp_path / "empty_dir")
    os.makedirs(empty)
    cb2 = pq.train_or_load_codebook(vecs, empty, m=2, k=2, subdim=2, iters=2)
    assert cb2.count() == 4


def test_codebook_frame_bit_identical_to_createDataFrame(spark):
    # The r14 VALUES/LocalRelation builder (codebook_frame) must produce
    # the exact frame createDataFrame did — doubles round-trip through
    # the shortest-repr SQL literal bit-for-bit, including negatives,
    # subnormals, huge magnitudes, inf and NaN.
    import math
    import struct as st

    rows = [
        (0, 0, [0.1, -0.5, 1.0 / 3.0, 5e-324]),
        (0, 1, [1.9e231, -0.0, float("inf"), float("-inf")]),
        (1, 0, [float("nan"), 2.0**-1074, 1.7976931348623157e308, 0.011]),
    ]
    built = {
        (r.m, r.code): list(r.centroid)
        for r in pq.codebook_frame(spark, rows).collect()
    }
    ref = {
        (r.m, r.code): list(r.centroid)
        for r in spark.createDataFrame(
            rows, "m int, code int, centroid array<double>"
        ).collect()
    }
    assert built.keys() == ref.keys()
    for k in ref:
        for a, b in zip(built[k], ref[k]):
            # bit-level comparison: NaN == NaN, -0.0 != +0.0
            assert st.pack("<d", a) == st.pack("<d", b), (k, a, b)
    assert math.isnan(built[(1, 0)][0])
    # plan shape: a LocalTableScan, no Python-RDD scan anywhere
    plan = pq.codebook_frame(spark, rows)._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan and "ExistingRDD" not in plan


def test_codebook_frame_empty(spark):
    df = pq.codebook_frame(spark, [])
    assert df.count() == 0
    assert df.schema.simpleString() == (
        "struct<m:int,code:int,centroid:array<double>>"
    )


def test_sub_dist_unrolled_matches_fold_on_edges(spark):
    # The codegen'd unrolled branch and the interpreted fold must agree
    # bit-for-bit on every input class: exact-length, short sub (falls
    # back to the fold's zip_with-pad-NULL semantics -> NULL), NaN and
    # inf components, huge-magnitude near-identical values (the sfedge
    # cancellation alphabet), and -0.0 terms.
    from pyspark.sql import functions as F

    cases = [
        ([1.0, 2.0, 3.0, 4.0], [1.5, 2.5, 3.5, 4.5]),
        ([1.0, 2.0], [1.5, 2.5, 3.5, 4.5]),          # short sub -> NULL
        ([1.0, 2.0, 3.0], [1.5, 2.5, 3.5, 4.5]),     # short sub -> NULL
        ([float("nan"), 2.0, 3.0, 4.0], [0.0, 0.0, 0.0, 0.0]),
        ([float("inf"), 2.0, 3.0, 4.0], [0.0, 0.0, 0.0, 0.0]),
        ([1.9e231, 1.0, 1.0, 1.0], [1.9e231, 1.0, 1.0, 1.0]),
        ([-0.0, 0.0, -0.0, 0.0], [0.0, -0.0, 0.0, -0.0]),
    ]
    df = spark.createDataFrame(
        [(i, s, c) for i, (s, c) in enumerate(cases)],
        "i int, sub array<double>, centroid array<double>",
    )
    out = (
        df.select(
            "i",
            pq._sub_dist(4).alias("unrolled"),
            pq._sub_dist(None).alias("fold"),
        )
        .orderBy("i")
        .collect()
    )
    import struct as st

    for r in out:
        if r.fold is None:
            assert r.unrolled is None, r
        else:
            assert r.unrolled is not None, r
            assert st.pack("<d", r.unrolled) == st.pack("<d", r.fold), r


def test_arrow_code_assign_matches_join_path_on_edges(spark):
    """The Lloyd-round Arrow kernel (r15) must agree bit-for-bit with the
    broadcast-join + _sub_dist + min_by reference on EVERY edge shape:
    near-ties, NaN components (all-NaN dists), +inf components, huge
    finite values that overflow to inf against far centroids only
    (mixed finite/inf), and wrong-length subs (all-NULL dists)."""
    from pyspark.sql import functions as F

    subdim = 4
    book = {
        0: {0: [0.0, 0.0, 0.0, 0.0], 1: [1.0, 0.0, 0.0, 0.0],
            2: [1e308, 0.0, 0.0, 0.0], 3: [float("nan"), 0.0, 0.0, 0.0]},
        1: {0: [2.0, 2.0, 2.0, 2.0], 1: [2.0, 2.0, 2.0, 2.0 + 1e-16]},
    }
    rows = [
        (1, 0, [0.5, 0.0, 0.0, 0.0]),          # plain near-tie vs codes 0/1
        (2, 0, [float("nan"), 1.0, 1.0, 1.0]),  # all-NaN dists -> code 0
        (3, 0, [float("inf"), 0.0, 0.0, 0.0]),  # inf vs code 3's NaN: real inf wins
        (4, 0, [-1e308, 0.0, 0.0, 0.0]),        # finite vs codes 0/1, inf vs 2
        (5, 0, [0.5, 0.5]),                     # wrong length -> NULL dists
        (6, 1, [2.0, 2.0, 2.0, 2.0]),           # exact tie tail -> lowest code
        (7, 1, [2.0, 2.0, 2.0, 2.0000000000000004]),
    ]
    sub = spark.createDataFrame(rows, "vec_id long, m int, sub array<double>")

    cb_rows = [(mi, c, v) for mi, cs in book.items() for c, v in cs.items()]
    cb = pq.codebook_frame(spark, cb_rows)
    joined = (
        sub.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "code", pq._sub_dist(subdim).alias("dist"))
        .groupBy("vec_id", "m")
        .agg(F.min_by("code", F.struct("dist", "code")).alias("code"))
    )
    ref = {(r.vec_id, r.m): r.code for r in joined.collect()}

    assign = pq._make_code_assign_udf(book, subdim)
    got_df = sub.select("vec_id", "m", assign(F.col("m"), F.col("sub")).alias("code"))
    got = {(r.vec_id, r.m): r.code for r in got_df.collect()}
    assert got == ref
