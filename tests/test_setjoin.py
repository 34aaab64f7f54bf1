"""Prefix-filtered exact Jaccard self-join (operators/setjoin.py):
no-miss guarantee vs brute force, threshold edge cases, and the
integer filter semantics."""

import itertools

from pyspark.sql import functions as F

from cryptocurrency_data_pipeline_spark.operators.setjoin import (
    jaccard_self_join,
)


def _tok_frame(spark, sets):
    rows = [(i, e) for i, s in sets.items() for e in s]
    return spark.createDataFrame(rows, "id long, elem string")


def _brute(sets, num, den):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * den >= union * num:
            out[(a, b)] = (inter, union)
    return out


def test_jaccard_join_hand_fixture(spark):
    sets = {
        1: {"a", "b", "c", "d"},
        2: {"a", "b", "c", "e"},   # J(1,2) = 3/5 >= 1/2
        3: {"x", "y", "z"},        # disjoint from all
        4: {"a", "b"},             # J(1,4) = 2/4 = 1/2 (boundary, kept)
    }
    got = {
        (r.id_a, r.id_b): (r.inter, r.union_sz)
        for r in jaccard_self_join(_tok_frame(spark, sets), 1, 2).collect()
    }
    assert got == _brute(sets, 1, 2)
    assert (1, 2) in got and got[(1, 2)] == (3, 5)
    assert (1, 4) in got  # exact-boundary pair is included


def test_jaccard_join_matches_brute_force_random(spark):
    # Seeded pseudo-random universe: 40 sets over 30 elements, sizes
    # 3..12 — every (threshold, pair) decision must match brute force.
    sets = {}
    for i in range(40):
        size = 3 + (i * 7) % 10
        sets[i] = {f"e{(i * 13 + j * j) % 30}" for j in range(size)}
    tok = _tok_frame(spark, sets)
    for num, den in [(1, 2), (3, 10), (4, 5)]:
        got = {
            (r.id_a, r.id_b): (r.inter, r.union_sz)
            for r in jaccard_self_join(tok, num, den).collect()
        }
        assert got == _brute(sets, num, den), (num, den)


def test_jaccard_join_rounded_ratio_column(spark):
    sets = {1: {"a", "b", "c"}, 2: {"a", "b", "d"}}
    rows = jaccard_self_join(_tok_frame(spark, sets), 1, 2).collect()
    assert len(rows) == 1
    assert rows[0].jaccard == 0.5  # 2/4


def _brute_containment(sets, num, den):
    out = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            if inter * den >= len(sets[a]) * num:
                out[(a, b)] = (inter, len(sets[a]))
    return out


def test_containment_join_hand_fixture(spark):
    from cryptocurrency_data_pipeline_spark.operators.setjoin import (
        containment_join,
    )

    sets = {
        1: {"a", "b"},                      # fully inside 2 and 3
        2: {"a", "b", "c", "d", "e"},       # superset of 1
        3: {"a", "b", "x", "y", "z", "w"},  # superset of 1, J(1,3) tiny
        4: {"p", "q", "r"},                 # disjoint
    }
    got = {
        (r.id_a, r.id_b): (r.inter, r.sz_a)
        for r in containment_join(_tok_frame(spark, sets), 4, 5).collect()
    }
    want = _brute_containment(sets, 4, 5)
    # Asymmetry is the point: (1 in 3) qualifies, (3 in 1) must not.
    assert (1, 3) in want and (3, 1) not in want
    assert got == want


def test_containment_join_matches_brute_force_random(spark):
    import random

    from cryptocurrency_data_pipeline_spark.operators.setjoin import (
        containment_join,
    )

    rng = random.Random(13)
    vocab = [f"e{i}" for i in range(30)]
    sets = {
        i: set(rng.sample(vocab, rng.randrange(2, 12))) for i in range(40)
    }
    # Plant subset duplicates: small sets embedded in larger hosts.
    sets[100] = set(list(sets[0])[:3])
    sets[101] = sets[1] | {"extra1", "extra2"}
    for num, den in [(4, 5), (1, 1), (1, 2)]:
        got = {
            (r.id_a, r.id_b): (r.inter, r.sz_a)
            for r in containment_join(_tok_frame(spark, sets), num, den).collect()
        }
        assert got == _brute_containment(sets, num, den), (num, den)
