"""A/B the case-fold cost on the text family (r12 verdict ask #2).

Three fold variants, swapped by monkeypatching ``text.fold_lower``
(every engine call site — ``tokens``, normalizers, shinglers — resolves
it through the module global at plan-build time, so one patch covers
the whole family):

* ``r11_bare``      — plain ``lower`` (the pre-sfuni form; WRONG on
  İ/final-Σ, kept only as the cost floor)
* ``r12_sandwich``  — translate-lower-translate (two O(n) passes)
* ``r13_single``    — one pre-lower translate (the shipped form;
  equivalence pinned in tests/test_query_uni_parity.py)

Method identical to the BASELINE.md ``as_double`` A/B: same JVM,
ALTERNATING variant passes (so host drift hits all variants equally),
median of 3, 1 untimed warm-up per (query, variant), calibration probes
at start/end.

Usage: python tools/ab_fold_lower.py [query ...]  (default: the five
queries the r12 verdict named)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Column  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _calibration_sec  # noqa: E402
from cryptocurrency_data_pipeline_spark.operators import text as textops  # noqa: E402
from cryptocurrency_data_pipeline_spark.queries import QUERIES  # noqa: E402
from cryptocurrency_data_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "text_stats_docs",
    "bpe_apply_token_stats",
    "vocab_top_terms",
    "tfidf_top_term_per_doc",
    "jaccard_shingle_pairs",
]


def _col(col):
    return F.col(col) if isinstance(col, str) else col


VARIANTS = {
    "r11_bare": lambda col: F.lower(_col(col)),
    "r12_sandwich": lambda col: F.translate(
        F.lower(F.translate(_col(col), "İ", "I")), "ς", "σ"
    ),
    "r13_single": lambda col: F.lower(F.translate(_col(col), "İΣς", "Iσσ")),
}


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-fold-lower")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    cal_start = _calibration_sec(spark)

    original = textops.fold_lower

    def run(name: str) -> None:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    try:
        for vname, fn in VARIANTS.items():  # warm-ups: codegen per variant
            textops.fold_lower = fn
            for name in names:
                run(name)
        raw = {v: {n: [] for n in names} for v in VARIANTS}
        for _ in range(3):
            for vname, fn in VARIANTS.items():  # alternate within a pass
                textops.fold_lower = fn
                for name in names:
                    t0 = time.perf_counter()
                    run(name)
                    raw[vname][name].append(
                        round(time.perf_counter() - t0, 3)
                    )
    finally:
        textops.fold_lower = original

    cal_end = _calibration_sec(spark)
    med = {
        v: {n: sorted(ts)[1] for n, ts in d.items()} for v, d in raw.items()
    }
    print("\n| query | r11_bare | r12_sandwich | r13_single | "
          "single/bare | single/sandwich |")
    print("|---|---|---|---|---|---|")
    for n in names:
        b, s2, s1 = (med["r11_bare"][n], med["r12_sandwich"][n],
                     med["r13_single"][n])
        print(f"| {n} | {b:.3f} | {s2:.3f} | {s1:.3f} "
              f"| x{s1 / b:.3f} | x{s1 / s2:.3f} |")
    print()
    print(json.dumps({
        "metric": "fold_lower variant A/B, median of 3 alternating",
        "sf_dir": sf_dir,
        "calibration_start_sec": cal_start,
        "calibration_end_sec": cal_end,
        "medians": med,
        "raw": raw,
    }))


if __name__ == "__main__":
    main()
