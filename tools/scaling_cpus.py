"""Compute-bound core-scaling evidence (r15, the r14 verdict's ask #9).

At sf0.1 every bench query is fixed-overhead-bound — the driver's 8-core
ratios all read ≈1, so data-parallel wins are invisible.  This tool
times the CHANGED-OPERATOR subset at the self-built ~10× point
(tools/make_scale_sf.py) on the CURRENT process's core count, so two
invocations (SPARK_GRAFT_CPUS=8 and =32) produce the ratio file where a
compute-bound query reads ≫1.

Method: hermetic (cache release after every execution, exactly as
bench.py), 1 untimed warm-up then --passes timed passes per query
(median + min), calibration probes at start/end.

Usage:
    SPARK_GRAFT_CPUS=32 python tools/scaling_cpus.py > SLOPES_CPUS_c32.json
    SPARK_GRAFT_CPUS=8  python tools/scaling_cpus.py > SLOPES_CPUS_c8.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _calibration_sec, _release_caches  # noqa: E402
from cryptocurrency_data_pipeline_spark.queries import QUERIES  # noqa: E402
from cryptocurrency_data_pipeline_spark.session import get_spark  # noqa: E402

#: The r15 changed-operator subset plus the compute-heavy text family —
#: the queries whose parallel behaviour the round's changes affect.
SUBSET = [
    "winnow_near_dups",
    "jaccard_shingle_pairs",
    "minhash_near_dups",
    "dup_clusters",
    "doc_graph_triangles",
    "pagerank_doc_graph",
    "pq_adc_topk",
    "ivfpq_topk",
    "ivf_ann_topk",
    "semantic_dedup_keep",
    "exact_substring_spans",
    "text_stats_docs",
    "bigram_logprob_docs",
    "hashed_vector_topk",
    "dsir_source_weights",
    "tfidf_top_term_per_doc",
    "boilerplate_segment_stats",
    "vocab_top_terms",
]

SCALED_DIR = os.environ.get(
    "SPARK_GRAFT_SCALED_DIR", "/tmp/spark_graft_scale/sf1.0"
)


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    if not os.path.isdir(SCALED_DIR):
        raise SystemExit(
            f"{SCALED_DIR} missing — run tools/make_scale_sf.py first"
        )
    spark = get_spark("scaling-cpus")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    cal_start = _calibration_sec(spark)
    raw: dict[str, list[float]] = {}
    for name in SUBSET:
        QUERIES[name](spark, SCALED_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        _release_caches(spark)
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            QUERIES[name](spark, SCALED_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
            _release_caches(spark)
        raw[name] = ts
    cal_end = _calibration_sec(spark)
    print(
        json.dumps(
            {
                "metric": "changed-operator subset at the 10x point, noop sink",
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "scaled_dir": SCALED_DIR,
                "calibration_start_sec": cal_start,
                "calibration_end_sec": cal_end,
                "median_sec": {
                    n: round(statistics.median(ts), 3) for n, ts in raw.items()
                },
                "min_sec": {n: min(ts) for n, ts in raw.items()},
                "passes": raw,
            }
        )
    )


if __name__ == "__main__":
    main()
