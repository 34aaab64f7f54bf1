"""Run the full oracle registry across EVERY adversarial scale point.

The closing-sweep instrument: builds each fixture fresh from its
generator (so the matrix never runs on a stale /tmp dir) and runs
``tools/check_oracle.py`` over all registered queries at each point,
printing one tally line per point and a final matrix summary.  Any
mismatch drops full failure artifacts via check_oracle's artifact
capture (SPARK_GRAFT_ARTIFACTS to redirect).

Each point runs in a FRESH subprocess: one JVM per point costs ~6 s
but guarantees no cross-point session-state bleed (the same isolation
the driver has), and a crash in one point cannot take down the rest.

Points (12): sf0.01 (driver testdata, not rebuilt) plus the eleven
generated classes — edge, empty, one, dup, time, big, uni, num, null,
mix, drift.  ~10-12 min per point at local[32]; pass point names to restrict
(e.g. ``python tools/sweep_matrix.py num mix``), or query names after
``--`` to restrict the query set (forwarded to check_oracle).

Usage:
    python tools/sweep_matrix.py [point ...] [-- query ...]
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: point name -> (builder argv or None, sf_dir)
POINTS: dict[str, tuple[list[str] | None, str]] = {
    "sf0.01": (None, "/root/testdata/sf0.01"),
    "edge": (["tools/make_edge_sf.py"], "/tmp/spark_graft_matrix_edge"),
    "empty": (["tools/make_empty_sf.py"], "/tmp/spark_graft_matrix_empty"),
    "one": (["tools/make_empty_sf.py", None, "1"], "/tmp/spark_graft_matrix_one"),
    "dup": (["tools/make_empty_sf.py", None, "dup"], "/tmp/spark_graft_matrix_dup"),
    "time": (["tools/make_time_sf.py"], "/tmp/spark_graft_matrix_time"),
    "big": (["tools/make_big_sf.py"], "/tmp/spark_graft_matrix_big"),
    "uni": (["tools/make_uni_sf.py"], "/tmp/spark_graft_matrix_uni"),
    "num": (["tools/make_num_sf.py"], "/tmp/spark_graft_matrix_num"),
    "null": (["tools/make_null_sf.py"], "/tmp/spark_graft_matrix_null"),
    "mix": (["tools/make_mix_sf.py"], "/tmp/spark_graft_matrix_mix"),
    "drift": (["tools/make_drift_sf.py"], "/tmp/spark_graft_matrix_drift"),
}


def main(argv: list[str]) -> int:
    if "--" in argv:
        i = argv.index("--")
        point_args, query_args = argv[:i], argv[i + 1 :]
    else:
        point_args, query_args = argv, []
    names = point_args or list(POINTS)
    unknown = [n for n in names if n not in POINTS]
    if unknown:
        print(f"unknown points {unknown}; choose from {list(POINTS)}")
        return 2

    results: dict[str, str] = {}
    for name in names:
        builder, sf_dir = POINTS[name]
        if builder is not None:
            argv_b = [sys.executable] + [
                (sf_dir if a is None else a) for a in builder
            ]
            # builders take the out dir as argv[1]; splice it in when the
            # spec didn't already place it (single-element specs)
            if sf_dir not in argv_b:
                argv_b.insert(2, sf_dir)
            subprocess.run(argv_b, cwd=REPO, check=True, capture_output=True)
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", sf_dir, *query_args],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        tail = [
            ln
            for ln in proc.stdout.splitlines()
            if "passed" in ln or "FAILURES" in ln
        ]
        summary = tail[-1] if tail else f"NO OUTPUT (rc={proc.returncode})"
        results[name] = summary
        print(f"{name:8s} {time.monotonic() - t0:7.1f}s  {summary}", flush=True)

    bad = {n: s for n, s in results.items() if "FAILURES" in s or "NO OUTPUT" in s}
    print("\n=== matrix:", "ALL GREEN" if not bad else f"FAILURES in {list(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
