"""Size-scaling slope instrument: time(10n)/time(n) per headline query.

Runs the bench headline set at TWO sizes — sf0.1 and the self-built
~10x point from ``tools/make_scale_sf.py`` — in ONE JVM, and reports
the wall-time slope per query.  A linear operator lands well under x10
(fixed scheduling/codegen overhead amortizes); sort-heavy plans land
~x10-13; anything beyond its shuffle profile is a latent 100 TB killer
that no single-size bench can see (the r11 quadratics read fine at
sf0.1 and were 203 s at the next size).

Method: per size, 1 untimed warm-up then ``--passes`` timed passes per
query (median).  The scaled passes dominate wall-clock, so the default
is 2 there; calibration probes run at start/end exactly as bench.py so
a loaded host is visible in the artifact.  Slopes are ratios of
same-JVM, same-session medians — host speed divides out to first
order.

Output: a markdown table (for BASELINE.md) plus one JSON line.

Usage:
    python tools/make_scale_sf.py            # build the 10x point once
    python tools/scaling_slopes.py [query ...] [--passes N] [--flag T]
    python tools/scaling_slopes.py --all [--passes 1]   # full registry

``--all`` profiles every registered query, not just the bench headline
set — the full-registry sweep is how a quadratic hiding in a
non-headline query gets caught mechanically.  With ``--passes 1``
(1 warm-up + 1 timed pass per size) precision drops to ~±30%, which is
still far inside the gap between a linear slope (~x2-10) and a
quadratic one (~x20+).

``--flag`` sets the investigate threshold on the slope (default 13.0 —
x10 data plus a log factor plus noise headroom; write-path queries are
driver-job-bound and sit far below it).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    HEADLINE,
    WRITE_PATH,
    _calibration_sec,
    _release_caches,
)
from cryptocurrency_data_pipeline_spark.queries import QUERIES  # noqa: E402
from cryptocurrency_data_pipeline_spark.session import get_spark  # noqa: E402

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED_DIR = os.environ.get(
    "SPARK_GRAFT_SCALED_DIR", "/tmp/spark_graft_scale/sf1.0"
)


def _time_queries(
    spark, names: list[str], sf_dir: str, passes: int
) -> tuple[dict[str, float], dict[str, list[float]]]:
    for name in names:  # one untimed warm-up pass (codegen, JIT tiers)
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        _release_caches(spark)  # hermetic: timed passes recompute caches
    raw: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(passes):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            raw[name].append(round(time.perf_counter() - t0, 3))
            _release_caches(spark)  # outside the timed region
    # statistics.median, not sorted()[len//2]: with an even pass count
    # the latter is the UPPER of the middle pair — under the default
    # scaled passes=2 that made every "median" the slower of two runs
    # and biased every slope upward vs the 3-pass base side (ADVICE r13)
    import statistics

    return {n: round(statistics.median(ts), 3) for n, ts in raw.items()}, raw


def main() -> None:
    args = sys.argv[1:]
    passes, flag = 2, 13.0
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i:i + 2]
    if "--flag" in args:
        i = args.index("--flag")
        flag = float(args[i + 1])
        del args[i:i + 2]
    if "--all" in args:
        args.remove("--all")
        names = list(QUERIES)
    else:
        names = args if args else list(HEADLINE)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    if not os.path.isdir(SCALED_DIR):
        raise SystemExit(
            f"{SCALED_DIR} missing — run tools/make_scale_sf.py first"
        )

    spark = get_spark("scaling-slopes")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    cal_start = _calibration_sec(spark)

    base, base_raw = _time_queries(spark, names, BASE_DIR, max(passes, 3))
    scaled, scaled_raw = _time_queries(spark, names, SCALED_DIR, passes)
    cal_end = _calibration_sec(spark)

    rows = []
    for n in names:
        slope = round(scaled[n] / base[n], 2) if base[n] > 0 else None
        verdict = (
            "INVESTIGATE"
            if slope is not None and slope > flag
            else ("write-path" if n in WRITE_PATH else "ok")
        )
        rows.append((n, base[n], scaled[n], slope, verdict))
    rows.sort(key=lambda r: -(r[3] or 0))

    print("\n| query | t(n) s | t(10n) s | slope | verdict |")
    print("|---|---|---|---|---|")
    for n, b, s, sl, v in rows:
        print(f"| {n} | {b:.3f} | {s:.3f} | x{sl} | {v} |")
    print()
    print(
        json.dumps(
            {
                "metric": "size-scaling slope t(10n)/t(n), noop sink",
                "base_dir": BASE_DIR,
                "scaled_dir": SCALED_DIR,
                "flag_threshold": flag,
                "calibration_start_sec": cal_start,
                "calibration_end_sec": cal_end,
                "slopes": {n: sl for n, _, _, sl, _ in rows},
                "base_sec": base,
                "scaled_sec": scaled,
                "flagged": [n for n, *_, v in rows if v == "INVESTIGATE"],
            }
        )
    )
    sidecar = Path(__file__).resolve().parent.parent / "SLOPES_PASSES.json"
    with open(sidecar, "w") as f:
        json.dump({"base": base_raw, "scaled": scaled_raw}, f)


if __name__ == "__main__":
    main()
