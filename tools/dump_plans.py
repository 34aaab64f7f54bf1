"""Dump `.explain("formatted")` for bench headline queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: "before" / "after" — file name suffix (plans/r14/<q>_<suffix>.txt)
  query:  optional subset; defaults to the full bench HEADLINE list.

Plans are captured at the bench scale factor (sf0.1) with the engine
session (AQE on), so the committed artifacts reflect exactly what the
bench times.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from bench import HEADLINE  # noqa: E402
from cryptocurrency_data_pipeline_spark.queries import QUERIES  # noqa: E402
from cryptocurrency_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = ROOT / "plans" / os.environ.get("SPARK_GRAFT_PLANS_DIR", "r15")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
