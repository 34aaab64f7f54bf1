"""Measure SemDeDup across the assignment paths and the old cap (r14).

The r13 clamp (`auto_nlist` capped at 256) kept the default
`semantic_dedup` linear only up to ~65k complete vectors — past the cap
cluster size grew n/256 and the within-cluster pair space re-quadratized
(O(n^2/256)).  r14 removed the cap; assignment runs the Arrow-batched
numpy matmul by default at every center count (the folded-literal
higher-order-function fold is INTERPRETED and measured slower at every
size — the crossover this probe also records).

This probe builds embeddings-ONLY fixtures straddling the old cap via
`make_scale_sf`'s structure-preserving copy transform (cyclic roll per
copy: within-copy geometry exact, cross-copy cosines decorrelated), then
times the registered retention-audit shape:

* 32 copies  -> 64k vectors,  nlist 250, default (Arrow) assignment
* 64k with the literal fold FORCED -> the interpreted-fold counterfactual
* 100 copies -> 200k vectors, nlist 782, default (Arrow)
* 200k with nlist=256 pinned  -> what the r13 CLAMPED default would do

A linear engine shows t(200k)/t(64k) near the 3.1x data ratio; the
clamped pin shows the quadratic the uncapping kills (pair space 78M vs
26M pairs at 200k); the forced-literal pin records the fold-vs-matmul
crossover evidence.  Note: with K > 64 copies the 64-dim cyclic roll
wraps (copy 64 == copy 0's vectors), adding exact cross-copy dup pairs —
harmless for timing (pairs are within-cluster either way).

Usage: python tools/cap_seam_probe.py [--passes 3]
Writes one JSON line; fixtures cached under /tmp/spark_graft_capseam/.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

ROOT = "/tmp/spark_graft_capseam"
SRC = "/root/testdata/sf0.1/embeddings.parquet"


def build_embeddings(copies: int) -> str:
    from make_scale_sf import _copy_of

    out = f"{ROOT}/x{copies}"
    dest = f"{out}/embeddings.parquet"
    if os.path.exists(dest):
        return out
    os.makedirs(out, exist_ok=True)
    src_tbl = pq.read_table(SRC)
    with pq.ParquetWriter(dest, src_tbl.schema) as w:
        for k in range(copies):
            w.write_table(_copy_of("embeddings", src_tbl, k))
    return out


def timed_audit(spark, sf_dir: str, passes: int, nlist=None, force_literal=False):
    import pyspark.sql.functions as F

    import cryptocurrency_data_pipeline_spark.operators.clustering as cl
    from cryptocurrency_data_pipeline_spark.operators.semdedup import (
        semantic_dedup,
    )
    from cryptocurrency_data_pipeline_spark.sources.tables import load_table

    ts = []
    n_clusters = None
    orig_cap = cl.LITERAL_CENTER_CAP
    if force_literal:
        cl.LITERAL_CENTER_CAP = 10**9
    try:
        for _ in range(passes):
            t0 = time.monotonic()
            flags = semantic_dedup(
                load_table(spark, sf_dir, "embeddings"), nlist=nlist, tau=0.45
            )
            audit = flags.groupBy("cluster_id").agg(
                F.count(F.lit(1)).alias("n_vecs"),
                F.sum(F.when(F.col("is_kept"), 1).otherwise(0)).alias("n_kept"),
            )
            rows = audit.collect()
            ts.append(time.monotonic() - t0)
            n_clusters = len(rows)
    finally:
        cl.LITERAL_CENTER_CAP = orig_cap
    return statistics.median(ts), n_clusters


def main() -> int:
    passes = 3
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    if passes % 2 == 0:
        passes += 1  # odd: median is a real sample, not the max of two

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("cap_seam_probe")
        .getOrCreate()
    )

    out = {"passes": passes, "points": []}
    for copies, label in ((32, "64k_default_arrow"), (100, "200k_default_arrow")):
        sf_dir = build_embeddings(copies)
        n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
        sec, k = timed_audit(spark, sf_dir, passes)
        out["points"].append(
            {"label": label, "copies": copies, "rows": n,
             "n_clusters": k, "sec": round(sec, 3)}
        )
    # counterfactual 1: the interpreted folded-literal fold at 64k
    sec, k = timed_audit(spark, f"{ROOT}/x32", passes, force_literal=True)
    out["points"].append(
        {"label": "64k_LITERAL_counterfactual", "copies": 32,
         "rows": 64_000, "n_clusters": k, "sec": round(sec, 3)}
    )
    # counterfactual 2: what the r13 clamped default would run at 200k
    sec, k = timed_audit(spark, f"{ROOT}/x100", passes, nlist=256)
    out["points"].append(
        {"label": "200k_CLAMPED_counterfactual", "copies": 100,
         "rows": 200_000, "n_clusters": k, "sec": round(sec, 3)}
    )

    a, b, lit, c = out["points"]
    out["data_ratio"] = round(b["rows"] / a["rows"], 2)
    out["time_ratio_64k_to_200k"] = round(b["sec"] / a["sec"], 2)
    out["arrow_vs_literal_at_64k"] = round(a["sec"] / lit["sec"], 2)
    out["arrow_vs_clamped_at_200k"] = round(b["sec"] / c["sec"], 2)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
