"""Per-stage profile of one bench query via the local Spark UI REST API.

Runs the query (noop sink) after warm-ups, then pulls stage metrics from
http://localhost:<ui-port>/api/v1 so the time can be attributed to
specific exchanges/operators instead of guessed (guide §1.1/§7.1).

Usage: python tools/profile_query.py <query> [passes=1] [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from bench import _release_caches  # noqa: E402
from cryptocurrency_data_pipeline_spark.queries import QUERIES  # noqa: E402
from cryptocurrency_data_pipeline_spark.session import get_spark  # noqa: E402


def api(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}"
    ) as r:
        return json.loads(r.read())


def main() -> None:
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    app_id = spark.sparkContext.applicationId
    fn = QUERIES[name]

    def cal() -> float:
        import time as _t

        ts = []
        for _ in range(3):
            t0 = _t.perf_counter()
            spark.range(0, 50_000_000, 1, 32).selectExpr(
                "sum(id * 2 + 1) AS s"
            ).collect()
            ts.append(_t.perf_counter() - t0)
        return round(sorted(ts)[1], 4)

    for _ in range(2):  # warm-ups
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _release_caches(spark)  # hermetic: timed passes recompute caches
    cal_start = cal()
    # note job boundary: stages submitted after this moment are the run
    before_ids = {s["stageId"] for s in api(port, f"applications/{app_id}/stages")}
    ts = []
    for _ in range(passes):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
        _release_caches(spark)  # outside the timed region
    stages = api(port, f"applications/{app_id}/stages")
    fresh = [s for s in stages if s["stageId"] not in before_ids]
    fresh.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(
        f"query={name} passes={ts} median={sorted(ts)[len(ts)//2]} "
        f"min={min(ts)} cal_start={cal_start} cal_end={cal()}"
    )
    print(f"{len(fresh)} stages in timed passes; top by executorRunTime:")
    for s in fresh[:25]:
        dur = (s.get("executorRunTime") or 0) / 1000.0
        cpu = (s.get("executorCpuTime") or 0) / 1e9
        sr = (s.get("shuffleReadBytes") or 0) / 1e6
        sw = (s.get("shuffleWriteBytes") or 0) / 1e6
        inb = (s.get("inputBytes") or 0) / 1e6
        nm = s.get("name", "")[:90]
        print(
            f"  stage {s['stageId']:>4} run={dur:7.2f}s cpu={cpu:7.2f}s "
            f"tasks={s.get('numCompleteTasks', 0):>3} "
            f"in={inb:8.1f}MB sr={sr:8.1f}MB sw={sw:8.1f}MB  {nm}"
        )
    njobs = len(
        [
            j
            for j in api(port, f"applications/{app_id}/jobs")
            if all(sid not in before_ids for sid in j.get("stageIds", []))
        ]
    )
    print(f"jobs in timed passes: {njobs} ({njobs / max(passes,1):.1f}/pass)")


if __name__ == "__main__":
    main()
